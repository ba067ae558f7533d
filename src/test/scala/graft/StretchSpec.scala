package graft

import org.apache.spark.sql.functions._

import graft.operators.OmeOps

/** Percentile contrast stretch: hand-computed windows and rescales. */
class StretchSpec extends SparkSpec {

  private def stretch(px: Seq[Int], pLo: Int, pHi: Int) = {
    import spark.implicits._
    graft.functions.ensureRegistered(spark)
    val r = Seq(Tuple1(px)).toDF("px")
      .select(graft.functions.pixel_stretch(col("px"), pLo, pHi).as("s"))
      .select(col("s.lo"), col("s.hi"), col("s.pixels"))
      .collect().head
    (r.getInt(0), r.getInt(1), r.getSeq[Int](2))
  }

  test("stretch: full-range percentiles map min->0, max->255, " +
      "midpoint HALF_UP") {
    val (lo, hi, out) = stretch(Seq(10, 20, 30), 0, 100)
    assert((lo, hi) === ((10, 30)))
    // (20-10)*510 + 20 = 5120; 5120 / 40 = 128 (exact midpoint rounds up)
    assert(out === Seq(0, 128, 255))
  }

  test("stretch: percentile window clamps outliers") {
    // n=21, idx lo = 20*5/100 = 1, hi = 20*95/100 = 19
    val px = (0 to 20).map(_ * 10)
    val (lo, hi, out) = stretch(px, 5, 95)
    assert((lo, hi) === ((10, 190)))
    assert(out.head === 0)   // 0 clamps to lo
    assert(out.last === 255) // 200 clamps to hi
    assert(out(1) === 0 && out(19) === 255)
  }

  test("stretch: flat plane maps to all zeros") {
    val (lo, hi, out) = stretch(Seq.fill(6)(7), 5, 95)
    assert(lo === 7 && hi === 7)
    assert(out === Seq.fill(6)(0))
  }

  test("equalize: CDF map with HALF_UP; constant plane maps to zeros") {
    import spark.implicits._
    graft.functions.ensureRegistered(spark)
    def eq(px: Seq[Int]): Seq[Int] =
      Seq(Tuple1(px)).toDF("px")
        .select(graft.functions.pixel_equalize(col("px"), 256).as("o"))
        .collect().head.getSeq[Int](0)
    // n=4, min multiplicity 2 -> d=2; ranks 2,2,3,4
    // 20: (3-2)*255/2 = 127.5 -> 128 (HALF_UP); 30: 255
    assert(eq(Seq(10, 10, 20, 30)) === Seq(0, 0, 128, 255))
    assert(eq(Seq(7, 7, 7)) === Seq(0, 0, 0))
    // strictly increasing ramp spreads uniformly to the full range
    val ramp = eq(Seq(0, 1, 2, 3))
    assert(ramp.head === 0 && ramp.last === 255)
    assert(ramp === ramp.sorted)
  }

  test("quantileNormalize: planes get the channel's average sorted " +
      "profile; all same-channel histograms become identical") {
    import spark.implicits._
    val planes = Seq(
      ("a", 0, 0, 0, 2, 1, Seq(0, 10)),
      ("b", 0, 0, 0, 2, 1, Seq(4, 2)),
      ("a", 0, 1, 0, 2, 1, Seq(100, 200)))
      .toDF("image_id", "t", "c", "z", "size_x", "size_y", "pixels")
    val out = OmeOps.quantileNormalize(planes).collect()
      .map(r => (r.getString(0), r.getInt(2)) -> r.getSeq[Int](6)).toMap
    // c0 profile: rank0 mean(0,2)=1, rank1 mean(10,4)=7
    assert(out(("a", 0)) === Seq(1, 7))
    assert(out(("b", 0)) === Seq(7, 1)) // 4 is the larger -> rank 1
    // a single-plane channel maps to itself
    assert(out(("a", 1)) === Seq(100, 200))
    // defining property: same-channel sorted distributions identical
    assert(out(("a", 0)).sorted === out(("b", 0)).sorted)
  }

  test("focusStack: per-pixel sharpest z wins; ties take lowest z") {
    import spark.implicits._
    // two 4x1 planes; hand sharpness (squared 2nd diff):
    //   z0 [0,0,9,0]  -> x1: 81,    x2: 324
    //   z1 [0,50,0,0] -> x1: 10000, x2: 2500
    // borders tie at 0 -> z0
    val planes = Seq(
      ("img", 0, 0, 0, 4, 1, Seq(0, 0, 9, 0)),
      ("img", 0, 0, 1, 4, 1, Seq(0, 50, 0, 0)))
      .toDF("image_id", "t", "c", "z", "size_x", "size_y", "pixels")
    val r = OmeOps.focusStack(planes).collect().head
    assert(r.getSeq[Int](6) === Seq(0, 50, 0, 0)) // composite
    assert(r.getSeq[Int](7) === Seq(0, 1, 1, 0))  // zmap
    assert(r.getInt(5) === 2)                     // n_planes
  }

  test("contrastStretch: composes with re-aggregation; output is 8-bit") {
    import spark.implicits._
    val planes = OmeOps.explodePlanes(
      graft.schema.Fixtures.corpus4d(spark))
      .select(col("image_id"), col("t"), col("c"), col("z"),
        col("size_x"), col("size_y"), col("pixels"))
    val out = OmeOps.contrastStretch(planes, 5, 95)
    val bounds = out.select(
      min(array_min(col("pixels"))), max(array_max(col("pixels"))))
      .collect().head
    assert(bounds.getInt(0) >= 0 && bounds.getInt(1) <= 255)
    assert(out.count() === planes.count())
  }
}
