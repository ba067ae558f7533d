package graft

import org.apache.spark.sql.functions._

import graft.operators.OmeOps
import graft.schema.Fixtures

/** Plane translation kernel + cumulative drift correction. */
class DriftApplySpec extends SparkSpec {

  test("pixel_shift: translates with zero fill in every direction") {
    import spark.implicits._
    graft.functions.ensureRegistered(spark)
    // 2x3 plane [0,1,2 / 3,4,5]
    val px = Seq(0, 1, 2, 3, 4, 5)
    def shift(dy: Int, dx: Int): Seq[Int] =
      Seq((px, 3, dy, dx)).toDF("p", "w", "dy", "dx")
        .select(graft.functions.pixel_shift(col("p"), col("w"),
          col("dy"), col("dx")).as("o"))
        .collect().head.getSeq[Int](0)
    assert(shift(0, 0) === px)
    assert(shift(0, 1) === Seq(0, 0, 1, 0, 3, 4))  // right, left col fills
    assert(shift(1, 0) === Seq(0, 0, 0, 0, 1, 2))  // down, top row fills
    assert(shift(-1, -1) === Seq(4, 5, 0, 0, 0, 0)) // up-left
  }

  test("pixel_shift: zero/negative width yields NULL, not a crash") {
    import spark.implicits._
    graft.functions.ensureRegistered(spark)
    val rows = Seq((Seq(1, 2, 3), 0, 1, 1), (Seq(1, 2, 3), -2, 0, 0))
      .toDF("p", "w", "dy", "dx")
      .select(graft.functions.pixel_shift(col("p"), col("w"),
        col("dy"), col("dx")).as("o"))
      .collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("driftApply: anchors t=0 and shifts each frame by its pair's " +
      "measured drift") {
    val imgs = Fixtures.corpus4d(spark)
    val rep = OmeOps.driftReport(imgs).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) ->
        ((r.getInt(4), r.getInt(5)))).toMap
    val planes = OmeOps.explodePlanes(imgs)
      .select(col("image_id"), col("t"), col("c"), col("z"),
        col("size_x"), col("pixels"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)) ->
        r.getSeq[Int](5)).toMap
    val out = OmeOps.driftApply(imgs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val key = (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))
      val (ady, adx) = (r.getInt(6), r.getInt(7))
      val shifted = r.getSeq[Int](8)
      if (r.getInt(1) == 0) {
        assert((ady, adx) === ((0, 0)))
        assert(shifted === planes(key))
      } else {
        assert((ady, adx) ===
          rep((r.getString(0), r.getInt(2), r.getInt(3))))
        // manual translate of the original plane must match
        val orig = planes(key)
        val manual = (0 until 64).map { o =>
          val y = o / 8 - ady; val x = o % 8 - adx
          if (y >= 0 && y < 8 && x >= 0 && x < 8) orig(y * 8 + x) else 0
        }
        assert(shifted === manual)
      }
    }
  }
}
