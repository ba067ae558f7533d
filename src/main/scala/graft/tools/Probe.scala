package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{OmeConstructors, OmeOps}
import graft.schema.Fixtures

/** Error-path probes for constructors. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("--- probe: fromDense bad dimOrder ---")
    try OmeConstructors.fromDense(OmeOps.toDense(Fixtures.corpus4d(spark)),
      dimOrder = "QYX", sizeY = 8, sizeX = 8)
    catch { case e: Throwable => println("error: " + e.getMessage.take(120)) }

    println("--- probe: fromDense missing Y ---")
    try OmeConstructors.fromDense(OmeOps.toDense(Fixtures.corpus4d(spark)),
      dimOrder = "TX", sizeY = 8, sizeX = 8)
    catch { case e: Throwable => println("error: " + e.getMessage.take(120)) }

    println("--- probe: fromDense wrong length (runtime) ---")
    try OmeConstructors.fromDense(OmeOps.toDense(Fixtures.corpus4d(spark)),
      sizeT = 3, sizeC = 2, sizeZ = 2, sizeY = 8, sizeX = 8).collect()
    catch { case e: Throwable =>
      var c: Throwable = e; while (c.getCause != null && c.getCause != c) c = c.getCause
      println("error: " + c.getMessage.replaceAll("\n.*", "").take(120)) }

    println("--- O1 constructor with overrides round-trips parquet ---")
    val custom = OmeConstructors.toOmeArrow(spark, imageId = "demo-1",
      sizeX = 4, sizeY = 2, sizeC = 1)
    graft.sources.OmeParquet.write(custom, "/tmp/graft_ctor")
    val back = graft.sources.OmeParquet.read(spark, "/tmp/graft_ctor")
    OmeOps.describe(back).select(col("id"), col("summary")).show(false)
    spark.stop()
  }
}
