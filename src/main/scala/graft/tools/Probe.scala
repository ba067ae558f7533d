package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.TextOps
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq(
      (0L, "   ", "en", "s", 3L),           // whitespace-only
      (1L, "single", "en", "s", 6L),        // one token
      (2L, "a b", "en", "s", 3L),           // fewer than k tokens
      (3L, "a b", "en", "s", 3L)            // duplicate of 2
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    println("nearDup pairs on degenerate docs:")
    TextOps.nearDupPairs(docs, threshold = 0.5).show(false)
    println("simhash pairs on degenerate docs:")
    TextOps.simhashPairs(docs, maxHamming = 2).show(false)
    spark.stop()
  }
}
