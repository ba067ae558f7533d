package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.OmeOps
import graft.schema.Fixtures

/** Scratch driver: re-measures SCALE.md's "Measured scaling" table —
  * the crop+pyramid pipeline over the exploded form at growing corpus
  * sizes (7x3x5 planes of 64x64 per image), warm, local[32]. */
object ScalePoints {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(n: Int): Double = {
      val corpus = Fixtures.syntheticImages(spark, n, t = 7, c = 3, z = 5,
        sy = 64, sx = 64, prefix = "sc")
      graft.functions.ensureRegistered(spark)
      val pipeline = OmeOps.downscalePlanes(OmeOps.cropPlanes(
          OmeOps.explodePlanes(corpus), 8, 56, 8, 56))
        .select(col("image_id"),
          graft.functions.pixel_sum(col("pixels")).as("s"))
        .groupBy(col("image_id")).agg(sum(col("s")))
      pipeline.count() // warm-up: codegen + JIT
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        pipeline.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val sec = times(1) // median of 3
      println(f"n=$n%5d median=$sec%.2f (${times.map(t => f"$t%.2f").mkString(", ")})")
      sec
    }
    Seq(32, 128, 512, 1024).foreach(run)
    spark.stop()
  }
}
