package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, VectorOps}

/** Embedding drift + seasonality profile on hand-built corpora. */
class DriftSeasonSpec extends SparkSpec {

  test("embeddingDrift: identical corpora show cosine 1, L2 0") {
    import spark.implicits._
    val emb = Seq((0L, Seq(1f, 2f, 3f)), (1L, Seq(3f, 2f, 1f)))
      .toDF("vec_id", "embedding")
    val r = VectorOps.embeddingDrift(emb, emb).collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 2L)))
    assert(r.getDouble(4) === 1.0)
    assert(r.getDouble(5) === 0.0)
  }

  test("embeddingDrift: orthogonal centroids show cosine 0") {
    import spark.implicits._
    val a = Seq((0L, Seq(2f, 0f))).toDF("vec_id", "embedding")
    val b = Seq((1L, Seq(0f, 3f))).toDF("vec_id", "embedding")
    val r = VectorOps.embeddingDrift(a, b).collect().head
    assert(r.getDouble(2) === 2.0) // norm_a
    assert(r.getDouble(3) === 3.0) // norm_b
    assert(r.getDouble(4) === 0.0)
    assert(r.getDouble(5) === math.round(math.sqrt(13) * 1e6) / 1e6)
  }

  test("debounce: keeps depend on the LAST KEPT event, not the " +
      "previous row") {
    import spark.implicits._
    // ts 0, 5, 10, 25 with gap 10: 5 drops (gap from 0), 10 KEEPS
    // (gap from 0 is 10), 25 keeps (gap from 10 is 15). A naive
    // lag-based filter would wrongly keep ts=5's successor chain.
    val events = Seq(
      (1L, "c", 0L, 10L), (1L, "c", 5L, 11L), (1L, "c", 10L, 12L),
      (1L, "c", 25L, 13L), (2L, "c", 3L, 20L), (1L, "v", 1L, 30L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val kept = EventOps.debounce(events, minGap = 10L)
      .collect().map(_.getLong(3)).toSet
    assert(kept === Set(10L, 12L, 13L, 20L, 30L))
  }

  test("debounce: equal timestamps keep only the lowest event id") {
    import spark.implicits._
    val events = Seq(
      (1L, "c", 7L, 2L), (1L, "c", 7L, 1L), (1L, "c", 7L, 3L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val kept = EventOps.debounce(events, minGap = 5L).collect()
    assert(kept.map(_.getLong(3)).toSeq === Seq(1L))
  }

  test("botReport: metronomic gaps score zero variance; humans don't") {
    import spark.implicits._
    val s = 1000L * 1000 * 1000
    // bot: exactly 60 s apart, all inside hour 0
    val bot = (0 until 10).map(i =>
      (1L, i * 60L * s, "click", 0.0, i.toLong))
    // human: irregular gaps spread over hours
    val human = Seq(0L, 100L, 5000L, 9000L, 20000L).zipWithIndex.map {
      case (t, i) => (2L, t * s, "view", 0.0, 100L + i) }
    val events = (bot ++ human)
      .toDF("user_id", "ts", "event_type", "value", "event_id")
    val out = EventOps.botReport(events).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4),
        r.getDouble(6)))).toMap
    val (bMean, bStd, bShare) = out(1L)
    assert(bMean === 60.0 && bStd === 0.0 && bShare === 1.0)
    val (_, hStd, hShare) = out(2L)
    assert(hStd > 0.0 && hShare < 1.0)
  }

  test("cohortLtv: revenue accumulates per cohort at integer cents") {
    import spark.implicits._
    val d = 86400L * 1000 * 1000 * 1000
    val events = Seq(
      (1L, 0L * d, "purchase", 1.00, 1L),
      (1L, 2L * d + 5, "purchase", 2.50, 2L),
      (1L, 1L * d, "view", 0.0, 3L),
      (2L, 1L * d, "view", 9.99, 4L)) // never purchases
      .toDF("user_id", "ts", "event_type", "value", "event_id")
    val out = EventOps.cohortLtv(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out((0L, 0L)) === ((1L, 1.0, 1.0)))
    assert(out((0L, 2L)) === ((1L, 2.5, 3.5)))
    assert(out.size === 2)
  }

  test("compositeRgb: channels stretch independently then pack RRGG00") {
    import spark.implicits._
    val planes = Seq(
      ("i", 0, 0, 0, 2, 1, Seq(0, 10)),
      ("i", 0, 1, 0, 2, 1, Seq(10, 0)))
      .toDF("image_id", "t", "c", "z", "size_x", "size_y", "pixels")
    val r = graft.operators.OmeOps
      .compositeRgb(planes, 0, 1, pLo = 0, pHi = 100)
      .collect().head
    assert(r.getSeq[Int](5) === Seq(255 * 256, 255 * 65536))
  }

  test("seasonalityProfile: epoch day-of-week and hour cells are exact") {
    import spark.implicits._
    val h = 3600L * 1000 * 1000 * 1000
    // 1970-01-01 (Thursday=4) at 00 and 01; 1970-01-04 (Sunday=0) at 01
    val events = Seq(0L, 1L * h, 1L * h + 5, 3L * 24 * h + h)
      .toDF("ts")
    val out = EventOps.seasonalityProfile(events).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out((4, 0)) === ((1L, 0.25)))
    assert(out((4, 1)) === ((2L, 0.5)))
    assert(out((0, 1)) === ((1L, 0.25)))
    assert(out.size === 3)
  }
}
