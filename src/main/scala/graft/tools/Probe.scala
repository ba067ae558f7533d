package graft.tools
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("--- corrupted zarr chunk without CRC net ---")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/crctest/zarr/i4d-0000.zarr/0/0.0.0.0.0"),
      "garbage".getBytes)
    try graft.sources.OmeZarr.read(spark, "/tmp/crctest/zarr/i4d-0000.zarr").collect()
    catch { case e: Throwable =>
      var c: Throwable = e; while (c.getCause != null && c.getCause != c) c = c.getCause
      println("error: " + c.getClass.getSimpleName + ": " + c.getMessage.replaceAll("\n.*", "").take(120)) }
    println("--- truncated (valid zlib prefix? no: short raw) chunk ---")
    val good = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/tmp/crctest/zarr/i4d-0000.zarr/0/0.0.1.0.0"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/crctest/zarr/i4d-0000.zarr/0/0.0.1.0.0"),
      java.util.Arrays.copyOf(good, good.length / 2))
    try graft.sources.OmeZarr.read(spark, "/tmp/crctest/zarr/i4d-0000.zarr").collect()
    catch { case e: Throwable =>
      var c: Throwable = e; while (c.getCause != null && c.getCause != c) c = c.getCause
      println("error: " + c.getClass.getSimpleName + ": " + c.getMessage.replaceAll("\n.*", "").take(120)) }
    spark.stop()
  }
}
