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
    // native synth_ramp generator: first/last pixels of a known image
    // must follow v = (img*31 + t*13 + c*7 + z*3 + p) % 65536
    println("=== synth_ramp corpus values")
    val syn = Fixtures.syntheticImages(spark, 3, t = 2, c = 2, z = 2,
      sy = 9, sx = 7, prefix = "probe")
    val px = OmeOps.explodePlanes(syn)
      .filter(col("image_id") === "probe-0002" &&
        col("t") === 1 && col("c") === 1 && col("z") === 1)
      .select(element_at(col("pixels"), 1),
        element_at(col("pixels"), 63), size(col("pixels")))
      .collect()(0)
    val base = 2 * 31 + 1 * 13 + 1 * 7 + 1 * 3
    println(s"first=${px.getInt(0)} expect=$base " +
      s"last=${px.getInt(1)} expect=${base + 62} n=${px.getInt(2)} expect=63")
    assert(px.getInt(0) == base && px.getInt(1) == base + 62 &&
      px.getInt(2) == 63)
    // 65536 wrap: an image id big enough to push base+p past the modulus
    val wrap = Fixtures.syntheticImages(spark, 2200, t = 1, c = 1, z = 1,
      sy = 40, sx = 40, prefix = "wrap")
    val w = OmeOps.explodePlanes(wrap.filter(col("ome_arrow.id") === "wrap-2113"))
      .select(element_at(col("pixels"), 1), array_min(col("pixels")),
        array_max(col("pixels")))
      .collect()(0)
    // base = 2113*31 = 65503; pixels wrap to 0 at p = 33
    println(s"wrap first=${w.getInt(0)} expect=65503 min=${w.getInt(1)} " +
      s"expect=0 max=${w.getInt(2)} expect=65535")
    assert(w.getInt(0) == 65503 && w.getInt(1) == 0 && w.getInt(2) == 65535)
    println("=== probe OK")
    spark.stop()
  }
}
