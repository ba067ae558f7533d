package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.OmeOps
import graft.schema.Fixtures

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bad = Fixtures.syntheticImages(spark, 1).withColumn("ome_arrow",
      col("ome_arrow").withField("planes", transform(col("ome_arrow.planes"),
        p => p.withField("z", p.getField("z") + 7))))
    println("--- toDense strict on out-of-range planes ---")
    try OmeOps.toDense(bad).collect()
    catch { case e: Throwable =>
      var c: Throwable = e; while (c.getCause != null && c.getCause != c) c = c.getCause
      println("error: " + c.getMessage.replaceAll("\n.*", "").take(120)) }
    println("--- lenient fallback ---")
    OmeOps.toDense(bad, strict = false)
      .select(aggregate(col("dense"), lit(0L), (a, b) => a + b).as("sum")).show()
    spark.stop()
  }
}
