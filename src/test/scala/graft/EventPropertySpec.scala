package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps

/** Seeded randomized properties of the r9 event operators: the binned
  * range join against the direct non-equi join, the as-of join against
  * a brute-force scan, and SCD2's timeline-tiling invariants. */
class EventPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("rangeJoinBinned == direct non-equi join on random inputs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val binNs = Seq(3L, 7L, 10L, 64L)(rnd.nextInt(4))
      val intervals = (1 to 30).map { i =>
        val k = rnd.nextInt(5).toLong
        val s = rnd.nextInt(200).toLong
        (k, i.toLong, s, s + rnd.nextInt(40).toLong)
      }.toDF("user_id", "session_idx", "start_ts", "end_ts")
      val probes = (1 to 120).map { i =>
        (100L + i, rnd.nextInt(5).toLong, rnd.nextInt(260).toLong)
      }.toDF("event_id", "user_id", "ts")
      val got = EventOps.rangeJoinBinned(probes, intervals, binNs)
        .collect().map(r => (r.getLong(0), r.getLong(3))).sorted
      val want = probes.as("p").join(intervals.as("i"),
          col("p.user_id") === col("i.user_id") &&
          col("p.ts") >= col("i.start_ts") &&
          col("p.ts") <= col("i.end_ts"))
        .select(col("p.event_id"), col("i.session_idx"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq === want.toSeq, s"trial $trial binNs=$binNs")
    }
    spark.catalog.clearCache()
  }

  test("asofJoinWith == brute-force nearest scan on random inputs") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 60).map { i =>
      (i.toLong, rnd.nextInt(100).toLong, rnd.nextInt(4).toLong)
    }
    val right = (1 to 60).map { i =>
      (1000L + i, rnd.nextInt(100).toLong, rnd.nextInt(4).toLong)
    }
    val leftDf = left.toDF("event_id", "ts", "user_id")
    val rightDf = right.toDF("event_id", "ts", "user_id")
    def brute(dir: String, tol: Long): Map[Long, Option[Long]] =
      left.map { case (id, ts, u) =>
        val cands = right.filter(_._3 == u)
        // backward: latest ts' <= ts, tie -> HIGHEST id (last in order)
        val b = cands.filter(c => c._2 <= ts && (tol < 0 || ts - c._2 <= tol))
          .sortBy(c => (-c._2, -c._1)).headOption
        val f = cands.filter(c => c._2 >= ts && (tol < 0 || c._2 - ts <= tol))
          .sortBy(c => (c._2, c._1)).headOption
        val m = dir match {
          case "backward" => b
          case "forward" => f
          case "nearest" => (b, f) match {
            case (Some(bb), Some(ff)) =>
              if (ts - bb._2 <= ff._2 - ts) Some(bb) else Some(ff)
            case (x, y) => x.orElse(y)
          }
        }
        id -> m.map(_._1)
      }.toMap
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(-1L, 5L, 20L)) {
      val got = EventOps.asofJoinWith(leftDf, rightDf,
          direction = dir, toleranceNs = tol)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      assert(got === brute(dir, tol), s"dir=$dir tol=$tol")
    }
    spark.catalog.clearCache()
  }

  test("scd2Build tiles each key's timeline without gaps or repeats") {
    val rnd = new scala.util.Random(13)
    val ev = (1 to 200).map { i =>
      (i.toLong, rnd.nextInt(500).toLong, rnd.nextInt(6).toLong,
        s"s${rnd.nextInt(3)}", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val hist = EventOps.scd2Build(ev).collect()
      .map(r => (r.getLong(0), r.getInt(4), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)))
      .groupBy(_._1)
    hist.foreach { case (u, vs) =>
      val sorted = vs.sortBy(_._2)
      // versions are dense from 1
      assert(sorted.map(_._2).toSeq === (1 to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // contiguous: each version closes where the next opens
          assert(a._5 === b._4, s"gap for user $u: $a -> $b")
          // no consecutive equal attributes survive
          assert(a._3 !== b._3, s"uncollapsed state for user $u: $a -> $b")
        case _ =>
      }
      // the last version is open
      assert(sorted.last._5 === Long.MaxValue)
    }
    spark.catalog.clearCache()
  }
}
