package graft

import org.apache.spark.sql.functions._

import graft.operators.JoinOps

/** Point-in-time feature join: no future leakage, staleness, ties. */
class PitJoinSpec extends SparkSpec {

  private def labels = {
    import spark.implicits._
    Seq((100L, 1L, 50L), (101L, 1L, 10L), (102L, 2L, 50L))
      .toDF("event_id", "user_id", "ts")
  }

  test("pointInTimeJoin: picks the latest prior feature, never a " +
      "future one") {
    import spark.implicits._
    val feats = Seq(
      (1L, 1L, 20L, 1.5), (2L, 1L, 40L, 2.5), (3L, 1L, 60L, 9.9),
      (4L, 2L, 49L, 7.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = JoinOps.pointInTimeJoin(labels, feats,
      "user_id", "ts", "event_id", "value", "f")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)), Option(r.get(5))))).toMap
    // label 100 (u1, t50): feature 2 at t40 (NOT feature 3 at t60)
    assert(out(100L) === ((Some(40L), Some(2.5))))
    // label 101 (u1, t10): nothing prior -> NULLs
    assert(out(101L) === ((None, None)))
    // label 102 (u2, t50): feature 4 at t49
    assert(out(102L) === ((Some(49L), Some(7.0))))
  }

  test("pointInTimeJoin: staleness bound nulls out old features") {
    import spark.implicits._
    val feats = Seq((1L, 1L, 20L, 1.5)).toDF("event_id", "user_id", "ts",
      "value")
    val out = JoinOps.pointInTimeJoin(labels, feats,
      "user_id", "ts", "event_id", "value", "f", maxStalenessNs = 10L)
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out(100L) === None) // gap 30 > 10
    val ok = JoinOps.pointInTimeJoin(labels, feats,
      "user_id", "ts", "event_id", "value", "f", maxStalenessNs = 30L)
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(ok(100L) === Some(20L))
  }

  test("saltedJoin: result set is exactly the plain inner join") {
    import spark.implicits._
    val large = (0 until 500).map(i => (i % 7L, i.toLong))
      .toDF("k", "payload")
    val small = Seq((0L, "a"), (3L, "b"), (9L, "never-matches"))
      .toDF("k", "tag")
    val salted = JoinOps.saltedJoin(large, small, "k", salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    val plain = large.join(small, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    assert(salted.toSeq === plain.toSeq)
    assert(salted.nonEmpty)
  }

  test("pointInTimeJoin: same-ts feature is visible; equal-ts features " +
      "tie to the highest id — and ts/val stay consistent") {
    import spark.implicits._
    val feats = Seq((1L, 1L, 50L, 1.0), (2L, 1L, 50L, 2.0))
      .toDF("event_id", "user_id", "ts", "value")
    val r = JoinOps.pointInTimeJoin(labels, feats,
      "user_id", "ts", "event_id", "value", "f")
      .filter(col("label_id") === 100L).collect().head
    assert(r.getLong(3) === 50L)   // f_ts
    assert(r.getLong(4) === 2L)    // f_id: highest id at the tie
    assert(r.getDouble(5) === 2.0) // f_val from the SAME row
  }
}
