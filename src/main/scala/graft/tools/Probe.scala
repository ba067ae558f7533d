package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.OmeOps
import graft.schema.Fixtures
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("--- cropPlanes beyond size_x ---")
    try OmeOps.cropPlanes(OmeOps.explodePlanes(Fixtures.corpus4d(spark)),
      0, 10, 0, 2).collect()
    catch { case e: Throwable =>
      var c: Throwable = e; while (c.getCause != null && c.getCause != c) c = c.getCause
      println("error: " + c.getMessage.replaceAll("\n.*", "").take(120)) }
    println("--- compact-JSON blosc store rejected ---")
    graft.sources.OmeZarr.write(
      Fixtures.corpus4d(spark).filter(org.apache.spark.sql.functions
        .col("ome_arrow.id") === "i4d-0000"), "/tmp/bloscz/i4d-0000.zarr")
    val za = java.nio.file.Paths.get("/tmp/bloscz/i4d-0000.zarr/0/.zarray")
    val orig = new String(java.nio.file.Files.readAllBytes(za), "UTF-8")
    java.nio.file.Files.write(za, orig.replace(
      """"compressor": {"id": "zlib", "level": 6}""",
      """"compressor":{"id":"blosc","cname":"zstd"}""").getBytes)
    try graft.sources.OmeZarr.read(spark, "/tmp/bloscz/i4d-0000.zarr").collect()
    catch { case e: Throwable =>
      var c: Throwable = e; while (c.getCause != null && c.getCause != c) c = c.getCause
      println("error: " + c.getMessage.replaceAll("\n.*", "").take(130)) }
    spark.stop()
  }
}
