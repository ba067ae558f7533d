package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Scratch driver for one-off probes (see .claude/skills/verify). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // r12 probe: NULL text through the new span operators
    val docs = Seq((0L, "a b c d e f"), (1L, null.asInstanceOf[String]),
      (2L, "a b c d e zz")).toDF("doc_id", "text")
    println("=== exactSubstrDedup with a NULL-text doc:")
    TextOps.exactSubstrDedup(docs, k = 4).orderBy(col("doc_id"))
      .show(false)
    println("=== decontaminateSpans with NULL on both sides:")
    TextOps.decontaminateSpans(docs,
      Seq((9L, null.asInstanceOf[String]), (10L, "a b c d")).toDF("doc_id", "text"),
      k = 4).orderBy(col("doc_id")).show(false)
    spark.stop()
  }
}
