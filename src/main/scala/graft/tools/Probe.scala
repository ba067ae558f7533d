package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.OmeOps
import graft.schema.Fixtures
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("--- cropPlanes invalid bounds ---")
    try OmeOps.cropPlanes(OmeOps.explodePlanes(Fixtures.corpus4d(spark)), 5, 5, 0, 8)
    catch { case e: Throwable => println("error: " + e.getMessage.take(100)) }
    spark.stop()
  }
}
