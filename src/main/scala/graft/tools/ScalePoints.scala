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

    // r12: tracking scale points — objects grow with movie count
    // (50 frames x 40 straight-moving blobs per stack); the operator
    // is EAGER (collision check + CC), so the whole call is timed,
    // second rep reported (warm). Edge count ≈ objects, exercising the
    // driver union-find path the tracker is designed around.
    def runTrack(nImages: Int): Double = {
      val k = 40L; val t = 50L
      def objs = spark.range(nImages * t * k).select(
        format_string("trk-%06d", (col("id") / (t * k)).cast("int"))
          .as("image_id"),
        lit(0).as("c"), lit(0).as("z"),
        ((col("id") / k) % t).cast("int").as("t"),
        (col("id") % k).cast("int").as("label"),
        ((col("id") % k) * 10).cast("double").as("cy"),
        (((col("id") / k) % t) + (col("id") % k) % 7).cast("double")
          .as("cx"))
      def once(): Double = graft.operators.Caches.scoped {
        val t0 = System.nanoTime()
        // driverEdgeLimit raised for the r13 1024-movie point: 2 M
        // objects → ~2 M edges (still ≈ 32 MB of driver longs — the
        // union-find path holds one decade past the default cap)
        graft.operators.OmeOps.trackAssignments(objs, maxDisp = 3.0,
          driverEdgeLimit = 4000000L).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up rep (eager op: everything re-runs)
      val sec = once()
      println(f"track nImages=$nImages%4d objects=${nImages * t * k}%8d " +
        f"sec=$sec%.2f")
      sec
    }
    Seq(1, 8, 64, 256, 1024).foreach(runTrack)
    spark.stop()
  }
}
