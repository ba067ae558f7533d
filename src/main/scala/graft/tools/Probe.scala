package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq((0L, ""), (1L, "  "), (2L, "a"), (3L, "it's 42%!"))
      .toDF("doc_id", "text")
    println("--- spark edge cases ---")
    TextOps.tokenCounts(docs.withColumn("n_chars", length(col("text")))).show(false)
    TextOps.fingerprintRolling(docs).show(false)
    spark.stop()
  }
}
