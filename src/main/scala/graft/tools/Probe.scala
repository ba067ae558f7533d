package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sources.{OmeParquet, OmeStack, OmeTiff}

/** Error-path probes for the source layer. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("--- probe: non-TIFF bytes ---")
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/fake.tiff"),
      "not a tiff at all".getBytes)
    try OmeTiff.read(spark, "/tmp/fake.tiff").collect()
    catch { case e: Throwable => println("error: " + rootMsg(e)) }

    println("--- probe: pattern matching zero files ---")
    try OmeStack.readPattern(spark, "/tmp/nope_<0-3>.tif")
    catch { case e: Throwable => println("error: " + rootMsg(e)) }

    println("--- probe: strict read of non-OME parquet ---")
    try OmeParquet.read(spark, "/root/testdata/sf0.001/documents.parquet")
    catch { case e: Throwable => println("error: " + rootMsg(e)) }

    println("--- probe: truncated TIFF (half the bytes) ---")
    val good = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/tests/data/nviz-artificial-4d-dataset/E99_C111_ZS000.tif"))
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/trunc.tiff"),
      java.util.Arrays.copyOf(good, good.length / 2))
    try OmeTiff.read(spark, "/tmp/trunc.tiff").collect()
    catch { case e: Throwable => println("error: " + rootMsg(e)) }

    spark.stop()
  }
  private def rootMsg(e: Throwable): String = {
    var c = e; while (c.getCause != null && c.getCause != c) c = c.getCause
    c.getMessage.replaceAll("\n.*", "").take(160)
  }
}
