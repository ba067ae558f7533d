package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.OmeArrow
import graft.operators.OmeOps
import graft.schema.Fixtures
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def rootMsg(e: Throwable): String = {
      var c = e; while (c.getCause != null && c.getCause != c) c = c.getCause
      c.getMessage.replaceAll("\n.*", "").take(130)
    }
    println("--- regex pattern with backslash routes to pattern reader ---")
    val d = "/root/reference/tests/data/nviz-artificial-4d-dataset"
    val rx = OmeArrow.read(spark, s"$d/E99_C111_ZS0.*\\.tif")
    println("regex fallback rows: " + rx.count() + " (1 stacked record)")
    println("z-planes assembled: " + rx.select(size(col("ome_arrow.planes"))).collect()(0).getInt(0))
    println("--- bare glob still reads per-file ---")
    println("glob rows: " + OmeArrow.read(spark, s"$d/E99_C111_ZS00*.tif").count())
    println("--- zarr with filters rejected ---")
    graft.sources.OmeZarr.write(Fixtures.corpus4d(spark)
      .filter(col("ome_arrow.id") === "i4d-0000"), "/tmp/filt/i4d-0000.zarr")
    val za = java.nio.file.Paths.get("/tmp/filt/i4d-0000.zarr/0/.zarray")
    val orig = new String(java.nio.file.Files.readAllBytes(za), "UTF-8")
    java.nio.file.Files.write(za, orig.replace(
      """"filters": null""", """"filters": [{"id": "delta"}]""").getBytes)
    try graft.sources.OmeZarr.read(spark, "/tmp/filt/i4d-0000.zarr").collect()
    catch { case e: Throwable => println("error: " + rootMsg(e)) }
    java.nio.file.Files.write(za, orig.getBytes)
    println("--- conform short-circuit: canonical read plan has no ArrayTransform ---")
    graft.sources.OmeParquet.write(Fixtures.corpus4d(spark), "/tmp/conform_pq")
    val plan = graft.sources.OmeParquet.read(spark, "/tmp/conform_pq")
      .queryExecution.optimizedPlan.toString
    println("transform() in plan: " + plan.contains("transform("))
    println("--- scrambled order still conforms ---")
    val scr = graft.sources.OmeParquet.read(spark,
      "/root/repo/src/test/resources/scrambled_order.parquet")
    println("id: " + scr.select(col("ome_arrow.id")).collect()(0).getString(0))
    spark.stop()
  }
}
