package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.OmeOps
import graft.schema.Fixtures

/** slice_ome_arrow semantics (reference: transform.py:14-182). */
class SliceSpec extends SparkSpec {

  private def fx: DataFrame = Fixtures.conftestDf(spark)

  private def planePixels(df: DataFrame): Seq[(Int, Int, Int, Seq[Int])] =
    df.select(explode(col("ome_arrow.planes")).as("p"))
      .select(col("p.t"), col("p.c").cast("int"), col("p.z"), col("p.pixels"))
      .collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getSeq[Int](3)))

  test("crop pixels exactly (half-open bounds)") {
    // conftest c=0 plane is 4x3: rows [0,1,2,3],[10,11,12,13],[20,21,22,23]
    val out = OmeOps.sliceOmeArrow(fx, xMin = 1, xMax = 3, yMin = 0, yMax = 2)
    val planes = planePixels(out)
    assert(planes.find(p => p._2 == 0).get._4 === Seq(1, 2, 11, 12))
    assert(planes.find(p => p._2 == 1).get._4 === Seq(101, 102, 111, 112))
  }

  test("sizes and channel metadata update after selection") {
    val out = OmeOps.sliceOmeArrow(fx, 0, 4, 0, 3, cIndices = Some(Seq(1)))
    val meta = out.select(
      col("ome_arrow.pixels_meta.size_c").cast("int"),
      col("ome_arrow.pixels_meta.size_x"),
      element_at(col("ome_arrow.pixels_meta.channels"), 1).getField("id"),
      element_at(col("ome_arrow.pixels_meta.channels"), 1).getField("name"))
      .collect()(0)
    assert(meta.getInt(0) === 1)
    assert(meta.getInt(1) === 4)
    assert(meta.getString(2) === "ch-0") // re-id'd to new dense index
    assert(meta.getString(3) === "Mito") // original name kept
  }

  test("selections deduplicate, sort and drop out-of-range") {
    val out = OmeOps.sliceOmeArrow(fx, 0, 4, 0, 3,
      cIndices = Some(Seq(1, 1, 0, 99, -3)))
    val planes = planePixels(out)
    assert(planes.map(_._2) === Seq(0, 1)) // reindexed dense, sorted
  }

  test("crop bounds beyond image raise") {
    val ex = intercept[Exception] {
      OmeOps.sliceOmeArrow(fx, 0, 5, 0, 3).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("crop bounds"))
  }

  test("empty selection after OOB-drop raises") {
    val ex = intercept[Exception] {
      OmeOps.sliceOmeArrow(fx, 0, 4, 0, 3, cIndices = Some(Seq(7, 8))).collect()
    }
    assert(ex.getMessage.contains("at least one index"))
  }

  test("invalid static bounds rejected eagerly") {
    intercept[IllegalArgumentException] {
      OmeOps.sliceOmeArrow(fx, 3, 3, 0, 2)
    }
    intercept[IllegalArgumentException] {
      OmeOps.sliceOmeArrow(fx, -1, 3, 0, 2)
    }
  }

  test("duplicate (t,c,z) source planes: last wins") {
    val dup = fx.withColumn("ome_arrow",
      col("ome_arrow").withField("planes",
        concat(col("ome_arrow.planes"), array(struct(
          lit(0).as("z"), lit(0).as("t"), lit(0).cast("short").as("c"),
          transform(element_at(col("ome_arrow.planes"), 1).getField("pixels"),
            p => p + 1000).as("pixels"))))))
    val planes = planePixels(OmeOps.sliceOmeArrow(dup, 0, 2, 0, 1))
    assert(planes.find(_._2 == 0).get._4 === Seq(1000, 1001))
  }

  test("fillMissing=true zero-fills, =false drops") {
    val holed = OmeOps.filterPlanes(Fixtures.syntheticImages(spark, 1),
      p => !(p.getField("t") === 1 && p.getField("c") === 1 && p.getField("z") === 1))
    val filled = OmeOps.sliceOmeArrow(holed, 0, 32, 0, 32)
    assert(filled.select(size(col("ome_arrow.planes"))).collect()(0).getInt(0) === 8)
    val holeSum = filled
      .select(aggregate(element_at(col("ome_arrow.planes"), 8).getField("pixels"),
        lit(0L), (a, b) => a + b)).collect()(0).getLong(0)
    assert(holeSum === 0L)
    val dropped = OmeOps.sliceOmeArrow(holed, 0, 32, 0, 32, fillMissing = false)
    assert(dropped.select(size(col("ome_arrow.planes"))).collect()(0).getInt(0) === 7)
  }

  test("plane with wrong pixel count raises") {
    val bad = fx.withColumn("ome_arrow",
      col("ome_arrow").withField("planes",
        transform(col("ome_arrow.planes"),
          p => p.withField("pixels", slice(p.getField("pixels"), 1, 5)))))
    val ex = intercept[Exception] {
      OmeOps.sliceOmeArrow(bad, 0, 2, 0, 2).collect()
    }
    assert(ex.getMessage.contains("pixels"))
  }
}
