package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.BenchMetrics

/**
 * The lineage-tracking family's decade measurement (VERDICT r14 #5 /
 * r15 #5): `trackLineage` / `trackMerges` / `trackEvents` on synthetic
 * movie corpora a decade apart (64 → 640 movies of 50 frames × 40
 * lanes ≈ 128 K → 1.26 M objects), with REAL division and merge events
 * so the has-primary windows and the event attachment joins do actual
 * work:
 *
 *  - every 8th lane DIVIDES at mid-movie: a child object appears one
 *    frame later within maxDisp of the parent (rank-2 successor whose
 *    own best predecessor is the parent — the division condition);
 *  - every (8th+4) lane MERGES at mid-movie: its final-frame object is
 *    placed within maxDisp of the neighbor lane's next-frame object
 *    (rank-2 predecessor whose own best successor is the survivor —
 *    the merge back-condition), then the lane ends.
 *
 * Each point reports wall seconds plus the deterministic counters
 * (shuffle-write bytes, jobs, summed task seconds — [[BenchMetrics]]),
 * warm (one untimed rep first; the operators are EAGER via their CC
 * call, so every rep re-runs everything). The 640-movie point runs
 * TWICE: once with the edge cap raised (driver union-find CC — the
 * same algorithm as the small point, the honest growth number) and
 * once with the default 1 M cap, which ~1.33 M edges exceed — the
 * star-contraction HANDOFF measured on a real track graph rather than
 * a crafted pair list.
 */
object TrackScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.ensureRegistered(spark)
    BenchMetrics.install(spark.sparkContext)

    val k = 40; val tF = 50; val half = tF / 2
    def corpus(nImages: Int) = {
      val base = spark.range(nImages.toLong * tF * k).select(
        format_string("trk-%06d", (col("id") / (tF * k)).cast("int"))
          .as("image_id"),
        lit(0).as("c"), lit(0).as("z"),
        ((col("id") / k) % tF).cast("int").as("t"),
        (col("id") % k).cast("int").as("lane"))
      // merge lanes end at mid-movie; their last object teleports next
      // to the surviving neighbor lane so it merges in
      val alive = base.filter(!(col("lane") % 8 === 4 &&
        col("t") >= half))
      val merging = col("lane") % 8 === 4 && col("t") === half - 1
      val positioned = alive.select(col("image_id"), col("c"), col("z"),
        col("t"), col("lane").as("label"),
        when(merging, (col("lane") - 1) * 10.0 + 2.0)
          .otherwise(col("lane") * 10.0).as("cy"),
        when(merging, col("t") + (col("lane") - 1) % 7 + 1.0)
          .otherwise((col("t") + col("lane") % 7).cast("double"))
          .as("cx"))
      // division children: appear at mid-movie within maxDisp of the
      // parent lane, then continue as their own track
      val children = base
        .filter(col("lane") % 8 === 0 && col("t") >= half)
        .select(col("image_id"), col("c"), col("z"), col("t"),
          (col("lane") + k).as("label"),
          (col("lane") * 10.0 + 1.0).as("cy"),
          (col("t") + col("lane") % 7).cast("double").as("cx"))
      positioned.unionByName(children)
    }

    val ops: Seq[(String, (org.apache.spark.sql.DataFrame, Long) =>
        org.apache.spark.sql.DataFrame)] = Seq(
      ("trackLineage", (d, lim) =>
        graft.operators.OmeOps.trackLineage(d, maxDisp = 3.0,
          driverEdgeLimit = lim)),
      ("trackMerges", (d, lim) =>
        graft.operators.OmeOps.trackMerges(d, maxDisp = 3.0,
          driverEdgeLimit = lim)),
      ("trackEvents", (d, lim) =>
        graft.operators.OmeOps.trackEvents(d, maxDisp = 3.0,
          driverEdgeLimit = lim)))

    // args mode: `TrackScale <nImages>` runs ONE star-CC point of
    // trackEvents at that size — for extending the distributed path's
    // growth curve without re-paying the full matrix
    val matrix: Seq[(Int, Long, String)] =
      if (args.nonEmpty) Seq((args(0).toInt, 1000000L, "star-cc"))
      else Seq(
        (64, 4000000L, "driver-cc"),
        (640, 4000000L, "driver-cc"),
        (640, 1000000L, "star-cc"))
    val opsToRun = if (args.nonEmpty) ops.filter(_._1 == "trackEvents")
      else ops
    for ((name, fn) <- opsToRun; (nImages, lim, tag) <- matrix) {
      def once() = BenchMetrics.timed(spark.sparkContext) {
        graft.operators.Caches.scoped {
          fn(corpus(nImages), lim).count(): Unit
        }
        spark.catalog.clearCache()
      }
      once() // warm-up
      val r = once()
      println(f"$name%-12s nImages=$nImages%4d objects=${nImages * tF * k}%8d " +
        f"cc=$tag%-9s sec=${r.sec}%6.2f shuffle_mb=${r.shuffleBytes / 1048576.0}%8.2f " +
        f"jobs=${r.jobs}%4d task_sec=${r.taskMs / 1e3}%7.2f")
    }
    spark.stop()
  }
}
