package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.OmeArrow
import graft.operators.OmeOps
import graft.schema.Fixtures

/** Zarr dispatch + error probes. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("--- dispatch: export how=zarr then read .zarr suffix ---")
    val one = Fixtures.corpus4d(spark).filter(col("ome_arrow.id") === "i4d-0001")
    OmeArrow.export(one, "ome_zarr", "/tmp/graft_p_disp/i4d-0001.zarr")
    val back = OmeArrow.read(spark, "/tmp/graft_p_disp/i4d-0001.zarr")
    OmeOps.describe(back).select(col("id"), col("summary")).show(false)

    println("--- probe: blosc compressor rejected ---")
    val za = java.nio.file.Paths.get("/tmp/graft_p_disp/i4d-0001.zarr/0/.zarray")
    val orig = new String(java.nio.file.Files.readAllBytes(za), "UTF-8")
    java.nio.file.Files.write(za, orig.replace(
      """"id": "zlib", "level": 6""", """"id": "blosc", "cname": "zstd"""").getBytes)
    try OmeArrow.read(spark, "/tmp/graft_p_disp/i4d-0001.zarr").collect()
    catch { case e: Throwable => println("error: " + e.getMessage.take(140)) }
    java.nio.file.Files.write(za, orig.getBytes)

    println("--- probe: not a zarr store ---")
    try OmeArrow.read(spark, "/tmp/definitely_missing.zarr")
    catch { case e: Throwable => println("error: " + e.getMessage.take(100)) }

    println("--- probe: corrupted chunk ---")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/graft_p_disp/i4d-0001.zarr/0/0.0.0.0.0"),
      "garbage".getBytes)
    try OmeArrow.read(spark, "/tmp/graft_p_disp/i4d-0001.zarr").collect()
    catch { case e: Throwable =>
      var c: Throwable = e; while (c.getCause != null && c.getCause != c) c = c.getCause
      println("error: " + c.getMessage.replaceAll("\n.*", "").take(140)) }
    spark.stop()
  }
}
