package graft

import org.apache.spark.sql.functions._

import graft.operators.OmeOps

/** Connected-component labeling kernel + segmentObjects semantics. */
class SegmentSpec extends SparkSpec {

  /** run the kernel through a DataFrame (codegen path). */
  private def objects(mask: Seq[Int], w: Int): Seq[(Int, Int, Int, Int,
      Int, Int, Long, Long)] = {
    import spark.implicits._
    graft.functions.ensureRegistered(spark)
    Seq((mask, w)).toDF("m", "w")
      .select(explode(graft.functions.cc_objects(col("m"), col("w")))
        .as("o"))
      .select(col("o.label"), col("o.area"), col("o.y0"), col("o.x0"),
        col("o.y1"), col("o.x1"), col("o.sum_y"), col("o.sum_x"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getLong(6), r.getLong(7))).toSeq
  }

  test("CcObjects: U-shape forces a union merge into one component") {
    // 3x3:  1 0 1
    //       1 0 1
    //       1 1 1   -> one 7-px object labeled by min index 0
    val m = Seq(1, 0, 1, 1, 0, 1, 1, 1, 1)
    val out = objects(m, 3)
    assert(out === Seq((0, 7, 0, 0, 2, 2, 0 + 0 + 1 + 1 + 2 + 2 + 2L,
      0 + 2 + 0 + 2 + 0 + 1 + 2L)))
  }

  test("CcObjects: two diagonal pixels stay separate (4-connectivity)") {
    val m = Seq(1, 0, 0, 1) // 2x2 diagonal
    val out = objects(m, 2)
    assert(out.map(o => (o._1, o._2)) === Seq((0, 1), (3, 1)))
  }

  test("CcObjects: empty mask yields no objects; full mask yields one") {
    assert(objects(Seq(0, 0, 0, 0), 2).isEmpty)
    val full = objects(Seq(1, 1, 1, 1), 2)
    assert(full === Seq((0, 4, 0, 0, 1, 1, 2L, 2L)))
  }

  test("CcObjects: labels are ascending min indexes; eval matches codegen") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // 2 rows x 4: two horizontal runs separated by a gap
    val m = Seq(1, 1, 0, 1, 1, 1, 0, 1)
    val viaDf = objects(m, 4)
    assert(viaDf.map(_._1) === viaDf.map(_._1).sorted)
    val e = graft.functions.PixelCcObjects(
      Literal(new GenericArrayData(m.toArray),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType, containsNull = false)),
      Literal(4))
    val interp = e.eval(InternalRow.empty)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(interp.numElements() === viaDf.size)
    val first = interp.getStruct(0, 8)
    assert((first.getInt(0), first.getInt(1)) === (viaDf.head._1, viaDf.head._2))
  }

  test("segmentObjects: centroids and bboxes on a planted blob") {
    import spark.implicits._
    // one 6x4 plane; blob = 2x2 square at rows 1-2, cols 1-2 plus an
    // isolated pixel at (3, 5)... but sx=6: pixel idx = y*6+x
    val px = Array.fill(24)(0)
    for (y <- 1 to 2; x <- 1 to 2) px(y * 6 + x) = 9
    px(3 * 6 + 5) = 9
    val planes = Seq(("img", 0, 0, 0, 6, 4, px.toSeq))
      .toDF("image_id", "t", "c", "z", "size_x", "size_y", "pixels")
    val out = OmeOps.segmentObjects(planes,
      transform(col("pixels"), v => when(v >= 9, lit(1)).otherwise(lit(0))))
      .orderBy(col("label"))
      .collect().map(r => (r.getInt(4), r.getInt(5), r.getInt(6),
        r.getInt(7), r.getInt(8), r.getInt(9), r.getDouble(10),
        r.getDouble(11))).toSeq
    assert(out === Seq(
      (7, 4, 1, 1, 2, 2, 1.5, 1.5),   // the 2x2 blob, label = idx(1,1)
      (23, 1, 3, 5, 3, 5, 3.0, 5.0))) // the isolated pixel
  }
}
