package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.schema.Fixtures
import graft.sources.OmeTiff
import graft.sources.v2.OmeTiffScan

/** The `ometiff` DataSourceV2: parity with the binaryFile reader plus
  * nested-column pruning reaching the scan (metadata reads must not
  * decode pixels). */
class DataSourceV2Spec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("dsv2_tiff").toString
    OmeTiff.write(Fixtures.corpus4d(spark), d)
    d
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): OmeTiffScan =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b.scan }
      .get.asInstanceOf[OmeTiffScan]

  test("ometiff v2 source matches the binaryFile reader exactly") {
    val v2 = spark.read.format("ometiff").load(dir)
    val v1 = OmeTiff.read(spark, s"$dir/*.tiff")
    // nullability differs (encoder-derived v1 marks primitives non-null);
    // names and types must match exactly
    assert(v2.schema.catalogString === v1.schema.catalogString)
    val key = col("ome_arrow.id")
    val a = v2.orderBy(key).collect().map(_.toString)
    val b = v1.orderBy(key).collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("metadata query prunes pixels out of the scan schema") {
    val df = spark.read.format("ometiff").load(dir)
      .select(col("ome_arrow.id"), col("ome_arrow.pixels_meta.size_x"))
    val scanSchema = scanOf(df).readSchema()
    assert(!scanSchema.catalogString.contains("planes"),
      s"planes survived pruning: ${scanSchema.catalogString}")
    assert(df.collect().map(_.getInt(1)).forall(_ === 8))
  }

  test("plane-coordinate query prunes pixels but keeps plane coords") {
    // array-subfield extraction (GetArrayStructFields) prunes through to
    // the scan; explode-then-select does NOT re-prune generator input in
    // the v2 pushdown, so coordinate sweeps should use this shape
    val df = spark.read.format("ometiff").load(dir)
      .select(col("ome_arrow.planes.t").as("ts"),
        col("ome_arrow.planes.z").as("zs"))
    val scanSchema = scanOf(df).readSchema().catalogString
    assert(!scanSchema.contains("pixels:array"),
      s"pixels survived: $scanSchema")
    assert(df.select(explode(col("ts"))).count() === 4 * 2 * 2 * 2)
  }

  test("pixel query keeps pixels and decodes them correctly") {
    val df = spark.read.format("ometiff").load(dir)
      .select(col("ome_arrow.id").as("id"),
        explode(col("ome_arrow.planes")).as("p"))
      .select(col("id"), col("p.t"), col("p.c"), col("p.z"),
        aggregate(col("p.pixels"), lit(0L), (a, v) => a + v).as("px_sum"))
    assert(scanOf(df).readSchema().catalogString.contains("pixels"))
    // fixture formula: v = (img*31 + t*13 + c*7 + z*3 + p) % 65536 over 8x8
    val r = df.filter(col("id") === "i4d-0000" && col("t") === 0 &&
      col("c") === 0 && col("z") === 0).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("px_sum") === (0 until 64).map(_.toLong).sum)
  }

  test("count(*) over the corpus needs no record fields at all") {
    val df = spark.read.format("ometiff").load(dir)
    assert(df.count() === 4L)
  }

  // --- omezarr ---------------------------------------------------------

  private lazy val zdir: String = {
    val d = Files.createTempDirectory("dsv2_zarr").toString
    graft.sources.OmeZarr.write(Fixtures.corpus4d(spark), d)
    d
  }

  test("omezarr v2 source matches readAll exactly (incl. pixels)") {
    val v2 = spark.read.format("omezarr").load(zdir)
    val v1 = graft.sources.OmeZarr.readAll(spark, zdir)
    assert(v2.schema.catalogString === v1.schema.catalogString)
    val key = col("ome_arrow.id")
    assert(v2.orderBy(key).collect().map(_.toString).toSeq ===
      v1.orderBy(key).collect().map(_.toString).toSeq)
  }

  test("omezarr metadata + coordinate queries open zero chunk files") {
    // delete every chunk file; JSON metadata remains — both the metadata
    // projection AND the coordinate grid must still answer
    import scala.jdk.CollectionConverters._
    val d = Files.createTempDirectory("dsv2_zarr_meta").toString
    graft.sources.OmeZarr.write(Fixtures.corpus4d(spark), d)
    java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.getFileName.toString.matches("""\d+(\.\d+)*"""))
      .foreach(java.nio.file.Files.delete)
    val meta = spark.read.format("omezarr").load(d)
      .select(col("ome_arrow.id").as("id"),
        col("ome_arrow.pixels_meta.size_z").as("sz"))
    assert(meta.collect().map(_.getInt(1)).forall(_ === 2))
    val coords = spark.read.format("omezarr").load(d)
      .select(col("ome_arrow.id").as("id"),
        col("ome_arrow.planes.t").as("ts"))
    assert(coords.select(explode(col("ts"))).count() === 4 * 8)
  }

  test("v2 sources fail with clear errors on empty or missing inputs") {
    val empty = Files.createTempDirectory("dsv2_empty").toString
    val e1 = intercept[Exception] {
      spark.read.format("ometiff").load(empty).count()
    }
    assert(e1.getMessage.contains("no .tif"))
    val e2 = intercept[Exception] {
      spark.read.format("omezarr").load(empty).count()
    }
    assert(e2.getMessage.contains("No .zarr stores"))
    val e3 = intercept[Exception] {
      spark.read.format("ometiff").load("/nonexistent/path/xyz").count()
    }
    assert(e3.getMessage.contains("no files match"))
  }

  test("omezarr single store with level option reads the pyramid level") {
    val d = Files.createTempDirectory("dsv2_zarr_lvl").toString
    graft.sources.OmeZarr.write(
      Fixtures.corpus4d(spark).filter(col("ome_arrow.id") === "i4d-0001"),
      s"$d/img.zarr", multiscaleLevels = 2)
    val lvl1 = spark.read.format("omezarr").option("level", "1")
      .load(s"$d/img.zarr")
    val r = lvl1.select(col("ome_arrow.pixels_meta.size_x"),
      col("ome_arrow.pixels_meta.physical_size_x")).collect()(0)
    assert(r.getInt(0) === 4)       // 8 >> 1
    assert(r.getFloat(1) === 2.0f)  // level-1 transform: 2x base size
  }
}
