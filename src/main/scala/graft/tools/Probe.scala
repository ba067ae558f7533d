package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver for one-off plan/behavior probes (see .claude/skills). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("=== flatfieldReport on corpus4d (head) ===")
    val ff = graft.operators.OmeOps.flatfieldReport(
      graft.schema.Fixtures.corpus4d(spark))
    ff.orderBy(col("c"), col("pos")).show(6, truncate = false)
    println("=== flatfield plan (expect ObjectHashAggregate partial/final, no corpus-pixel shuffle) ===")
    ff.explain("formatted")

    println("=== nbDistillReport on sf0.01 documents ===")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val toks = graft.operators.TextOps.tokens(col("text"))
    val rep = graft.operators.TextOps.nbDistillReport(docs,
      array_contains(toks, "customer") && array_contains(toks, "vector"))
    rep.orderBy(col("y"), col("pred")).show(truncate = false)
    spark.stop()
  }
}
