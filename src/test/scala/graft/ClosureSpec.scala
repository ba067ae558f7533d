package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{OmeConstructors, OmeOps}
import graft.schema.Fixtures

/** Round-trip closure: `info()` (and pixel content) is invariant through
  * every implemented ingest∘export pair — the reference's backbone e2e
  * property (test_core.py:268-294), strengthened with content checksums
  * (the reference asserts shapes only). */
class ClosureSpec extends SparkSpec {

  private def describeKey(df: DataFrame): Seq[String] =
    OmeOps.describe(df).select(col("id"), col("summary"))
      .collect().toSeq.map(_.toString).sorted

  private def pixelKey(df: DataFrame): Seq[String] =
    OmeOps.explodePlanes(df).select(col("image_id"), col("t"), col("c"), col("z"),
      aggregate(col("pixels"), lit(0L), (a, v) => a + v),
      array_min(col("pixels")), array_max(col("pixels")))
      .collect().toSeq.map(_.toString).sorted

  private lazy val corpus = Fixtures.corpus4d(spark)
  private lazy val expectedInfo = describeKey(corpus)
  private lazy val expectedPixels = pixelKey(corpus)

  test("parquet round-trip preserves info and pixels") {
    graft.sources.OmeParquet.write(corpus, "/tmp/closure_pq")
    val back = graft.sources.OmeParquet.read(spark, "/tmp/closure_pq")
    assert(describeKey(back) === expectedInfo)
    assert(pixelKey(back) === expectedPixels)
  }

  test("tiff round-trip preserves info and pixels") {
    graft.sources.OmeTiff.write(corpus, "/tmp/closure_tiff")
    val back = graft.sources.OmeTiff.read(spark, "/tmp/closure_tiff")
    assert(describeKey(back) === expectedInfo)
    assert(pixelKey(back) === expectedPixels)
  }

  test("zarr round-trip preserves info and pixels") {
    graft.sources.OmeZarr.write(corpus, "/tmp/closure_zarr")
    val back = graft.sources.OmeZarr.readAll(spark, "/tmp/closure_zarr")
    assert(describeKey(back) === expectedInfo)
    assert(pixelKey(back) === expectedPixels)
  }

  test("dense bridge round-trip preserves info and pixels") {
    val back = OmeConstructors.fromDense(OmeOps.toDense(corpus),
      sizeT = 2, sizeC = 2, sizeZ = 2, sizeY = 8, sizeX = 8)
    assert(describeKey(back) === expectedInfo)
    assert(pixelKey(back) === expectedPixels)
  }

  test("explode-nest round-trip preserves info and pixels") {
    val back = OmeOps.nestPlanes(OmeOps.explodePlanes(corpus))
    assert(describeKey(back) === expectedInfo)
    assert(pixelKey(back) === expectedPixels)
  }

  test("cross-format chain: tiff -> parquet -> zarr -> back") {
    graft.sources.OmeTiff.write(corpus, "/tmp/closure_chain_t")
    val t = graft.sources.OmeTiff.read(spark, "/tmp/closure_chain_t")
    graft.sources.OmeParquet.write(t, "/tmp/closure_chain_p")
    val p = graft.sources.OmeParquet.read(spark, "/tmp/closure_chain_p")
    graft.sources.OmeZarr.write(p, "/tmp/closure_chain_z")
    val z = graft.sources.OmeZarr.readAll(spark, "/tmp/closure_chain_z")
    assert(describeKey(z) === expectedInfo)
    assert(pixelKey(z) === expectedPixels)
  }

  test("cross-container chain: tiled tiff -> zarr v3 blosc -> zarr v2 -> back") {
    graft.sources.OmeTiff.write(corpus, "/tmp/closure_chain2_t",
      compression = "packbits", tile = Some((16, 16)))
    val t = graft.sources.OmeTiff.read(spark, "/tmp/closure_chain2_t")
    graft.sources.OmeZarr.write(t, "/tmp/closure_chain2_v3",
      zarrFormat = 3, compressor = "blosc")
    val v3 = graft.sources.OmeZarr.readAll(spark, "/tmp/closure_chain2_v3")
    graft.sources.OmeZarr.write(v3, "/tmp/closure_chain2_v2")
    val v2 = graft.sources.OmeZarr.readAll(spark, "/tmp/closure_chain2_v2")
    assert(describeKey(v2) === expectedInfo)
    assert(pixelKey(v2) === expectedPixels)
  }
}
