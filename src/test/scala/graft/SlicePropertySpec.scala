package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.OmeOps
import graft.schema.Fixtures

/** Algebraic properties of the slice operator (crop composition,
  * selection idempotence) over seeded random bounds. */
class SlicePropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def pixelChecksum(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
    df.select(col("ome_arrow.id").as("id"),
      aggregate(flatten(transform(col("ome_arrow.planes"), p => p.getField("pixels"))),
        lit(0L), (a, v) => a + v).as("s"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))

  private lazy val corpus =
    Fixtures.syntheticImages(spark, 2, t = 1, c = 1, z = 1, sy = 8, sx = 8)

  test("crop of a crop equals the composed crop (8 seeded cases)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 8) {
      val x0 = rnd.nextInt(4); val x1 = x0 + 2 + rnd.nextInt(8 - x0 - 2 + 1)
      val y0 = rnd.nextInt(4); val y1 = y0 + 2 + rnd.nextInt(8 - y0 - 2 + 1)
      val ix0 = rnd.nextInt(2); val iy0 = rnd.nextInt(2)
      val twice = OmeOps.sliceOmeArrow(
        OmeOps.sliceOmeArrow(corpus, x0, x1, y0, y1), ix0, x1 - x0, iy0, y1 - y0)
      val once = OmeOps.sliceOmeArrow(corpus, x0 + ix0, x1, y0 + iy0, y1)
      assert(pixelChecksum(twice) === pixelChecksum(once),
        s"crop mismatch at x[$x0,$x1) y[$y0,$y1) inner($ix0,$iy0)")
    }
  }

  test("selecting all indices explicitly is the identity") {
    val all = OmeOps.sliceOmeArrow(corpus, 0, 8, 0, 8,
      tIndices = Some(Seq(0)), cIndices = Some(Seq(0)), zIndices = Some(Seq(0)))
    assert(pixelChecksum(all) === pixelChecksum(corpus))
  }
}
