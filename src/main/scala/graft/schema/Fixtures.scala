package graft.schema

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic OME-Arrow records for tests, golden-oracle queries and
 * benchmarks.
 *
 * `conftestRecord` reproduces the reference's hand-written known-good
 * fixture verbatim (reference: tests/conftest.py:10-70): 4x3 px, 2 channels
 * (DNA / Mito), 1 z, 1 t, physical sizes 0.65/0.65/1.0 µm.
 *
 * `syntheticImages` generates an arbitrary-size corpus of valid records
 * entirely on executors (spark.range + higher-order functions, no driver
 * loop, no UDF) — pixel values follow a closed-form formula so that oracle
 * SQL can regenerate them independently.
 */
object Fixtures {

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  /** tests/conftest.py:10-70, field for field. */
  val conftestRecord: OmeArrowRecord = OmeArrowRecord(
    `type` = OmeSchema.TagType,
    version = "1.0.0",
    id = "img-0001",
    name = "Example image",
    acquisition_datetime = ts("2025-01-01T12:00:00Z"),
    pixels_meta = OmePixelsMeta(
      dimension_order = "XYCT", // Z==1, so XYCT (conftest.py:22)
      `type` = "uint16",
      size_x = 4,
      size_y = 3,
      size_z = 1,
      size_c = 2,
      size_t = 1,
      physical_size_x = Some(0.65f),
      physical_size_y = Some(0.65f),
      physical_size_z = Some(1.00f),
      physical_size_x_unit = Some("µm"),
      physical_size_y_unit = Some("µm"),
      physical_size_z_unit = Some("µm"),
      channels = Seq(
        OmeChannel("C0", "DNA", Some(0.46f), Some(0.40f),
          Some("Epifluorescence"), Some(0x0000FFFFL)),
        OmeChannel("C1", "Mito", Some(0.59f), Some(0.54f),
          Some("Epifluorescence"), Some(0xFF0000FFL))
      )
    ),
    planes = Seq(
      OmePlane(z = 0, t = 0, c = 0,
        pixels = Seq(0, 1, 2, 3, 10, 11, 12, 13, 20, 21, 22, 23)),
      OmePlane(z = 0, t = 0, c = 1,
        pixels = Seq(100, 101, 102, 103, 110, 111, 112, 113, 120, 121, 122, 123))
    )
  )

  /** Single-row DataFrame holding the conftest fixture under the default
    * `ome_arrow` column name. */
  def conftestDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(conftestRecord).toDF().select(
      struct(col("type"), col("version"), col("id"), col("name"),
        col("acquisition_datetime"), col("pixels_meta"), col("planes"))
        .as(OmeSchema.DefaultColumn))
  }

  /**
   * Synthetic corpus: `n` images of shape (T=t, C=c, Z=z, Y=sy, X=sx) with
   * pixel(img, tt, cc, zz, y, x) = (img*31 + tt*13 + cc*7 + zz*3 + y*sx + x) % 65536.
   *
   * Fully distributed: one `spark.range` task per image; planes and pixels
   * are materialized by `transform(sequence(...))` on executors, so the
   * corpus scales to arbitrary n without any driver memory. An oracle can
   * regenerate the same values from the closed form.
   */
  def syntheticImages(spark: SparkSession, n: Int,
      t: Int = 2, c: Int = 2, z: Int = 2,
      sy: Int = 32, sx: Int = 32, prefix: String = "img"): DataFrame = {
    graft.functions.ensureRegistered(spark)
    val img = col("id")
    // Native one-loop-per-plane ramp: same values as the column
    // formulation `transform(sequence(0, sy*sx-1), p => (base + p) %
    // 65536)` but without a boxed lambda eval per pixel — the generator
    // was the dominant (and GC-noisy) cost of the scale-pipeline bench.
    val pixelsFor = (tt: org.apache.spark.sql.Column,
                     cc: org.apache.spark.sql.Column,
                     zz: org.apache.spark.sql.Column) =>
      graft.functions.synth_ramp(
        (img * 31 + tt * 13 + cc * 7 + zz * 3).cast("long"),
        lit(sy * sx))
    // t-major, then c, then z plane order (reference ingest convention,
    // ingest.py:258-264).
    val planes = flatten(transform(sequence(lit(0), lit(t - 1)), tt =>
      flatten(transform(sequence(lit(0), lit(c - 1)), cc =>
        transform(sequence(lit(0), lit(z - 1)), zz =>
          struct(
            zz.cast("int").as("z"),
            tt.cast("int").as("t"),
            cc.cast("short").as("c"),
            pixelsFor(tt, cc, zz).as("pixels")))))))
    val channels = transform(sequence(lit(0), lit(c - 1)), i =>
      struct(
        concat(lit("ch-"), i).as("id"),
        concat(lit("C"), i).as("name"),
        lit(null).cast("float").as("emission_um"),
        lit(null).cast("float").as("excitation_um"),
        lit(null).cast("string").as("illumination"),
        lit(0xFFFFFFFFL).as("color_rgba")))
    val pixelsMeta = struct(
      lit(if (z > 1) "XYZCT" else "XYCT").as("dimension_order"),
      lit("uint16").as("type"),
      lit(sx).as("size_x"),
      lit(sy).as("size_y"),
      lit(z).as("size_z"),
      lit(c).cast("short").as("size_c"),
      lit(t).as("size_t"),
      lit(1.0f).as("physical_size_x"),
      lit(1.0f).as("physical_size_y"),
      lit(1.0f).as("physical_size_z"),
      lit("µm").as("physical_size_x_unit"),
      lit("µm").as("physical_size_y_unit"),
      lit("µm").as("physical_size_z_unit"),
      channels.as("channels"))
    spark.range(n).select(col("id").cast("int").as("id"))
      .select(struct(
        lit(OmeSchema.TagType).as("type"),
        lit(OmeSchema.Version).as("version"),
        format_string("%s-%04d", lit(prefix), img).as("id"),
        format_string("Synthetic image %d", img).as("name"),
        lit(ts("2025-01-01T00:00:00Z")).as("acquisition_datetime"),
        pixelsMeta.as("pixels_meta"),
        planes.as("planes")).as(OmeSchema.DefaultColumn))
  }

  /** Shape parameters of the four `mixedCorpus` families — one per
    * reference classification branch (utils.py:59-69). */
  val MixedFamilies: Seq[(String, Int, Int, Int)] = Seq(
    // (prefix, t, c, z); all 8x8 planes, 4 images each
    ("i2d", 1, 1, 1),
    ("i3d", 1, 2, 3),
    ("mov", 3, 1, 1),
    ("i4d", 2, 2, 2))

  /** 16-image corpus spanning all four (T,Z) classification branches and
    * both channel classes — the describe/slice oracle substrate. */
  def mixedCorpus(spark: SparkSession): DataFrame =
    MixedFamilies.map { case (p, t, c, z) =>
      syntheticImages(spark, 4, t = t, c = c, z = z, sy = 8, sx = 8, prefix = p)
    }.reduce(_ unionAll _)

  /** The `i4d` family alone (2x2x2 planes of 8x8) — substrate for the
    * pixel-level operator oracles. */
  def corpus4d(spark: SparkSession): DataFrame =
    syntheticImages(spark, 4, t = 2, c = 2, z = 2, sy = 8, sx = 8, prefix = "i4d")
}
