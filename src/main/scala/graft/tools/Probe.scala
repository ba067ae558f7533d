package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.OmeOps
import graft.schema.Fixtures
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // heterogeneous stores: different shapes in one directory
    graft.sources.OmeZarr.write(
      Fixtures.syntheticImages(spark, 2, t = 1, c = 1, z = 3, sy = 8, sx = 8, prefix = "small"),
      "/tmp/het_zarr")
    graft.sources.OmeZarr.write(
      Fixtures.syntheticImages(spark, 2, t = 2, c = 2, z = 1, sy = 16, sx = 16, prefix = "widef"),
      "/tmp/het_zarr")
    // delete one chunk from one store -> must zero-fill
    new java.io.File("/tmp/het_zarr/small-0001.zarr/0/0.0.2.0.0").delete()
    val all = graft.sources.OmeZarr.readAll(spark, "/tmp/het_zarr")
    OmeOps.describe(all).orderBy("id").select(col("id"), col("summary")).show(false)
    val holeSum = OmeOps.explodePlanes(all.filter(col("ome_arrow.id") === "small-0001"))
      .filter(col("z") === 2)
      .select(aggregate(col("pixels"), lit(0L), (a, v) => a + v))
      .collect()(0).getLong(0)
    println("deleted chunk zero-filled: " + (holeSum == 0L))
    spark.stop()
  }
}
