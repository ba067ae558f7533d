package graft.schema

import org.apache.spark.sql.types._

/**
 * Canonical Spark schema for the OME-Arrow record type.
 *
 * Mirrors the reference Arrow StructType `OME_ARROW_STRUCT`
 * (reference: src/ome_arrow/meta.py:18-90) with the documented Spark type
 * mapping (SURVEY.md §1.2):
 *
 *  - Arrow `uint16` pixels  -> Spark `IntegerType` (Spark has no unsigned;
 *    values stay in [0, 65535] by the clamp invariant, so round-trips are
 *    value-preserving).
 *  - Arrow `uint32` color_rgba -> Spark `LongType` (packed 0xRRGGBBAA).
 *  - Arrow `int16` size_c / plane c -> Spark `ShortType`.
 *  - Arrow `timestamp[us]` (tz-naive) -> Spark `TimestampType` with the
 *    session time zone pinned to UTC (build.sbt javaOptions).
 *  - Arrow `null`-typed `masks` (meta.py:88, reserved, always None) is
 *    OMITTED from the canonical Spark schema: Spark cannot write NullType
 *    to Parquet. The reference's reader matches struct columns by
 *    field-name set with `strict_schema=False` by default
 *    (ingest.py:872-912), so files without `masks` still load there; our
 *    reader likewise tolerates and drops a `masks` field when present.
 *
 * One value = one 5-D image (T x C x Z x Y x X); `planes[i].pixels` is the
 * flattened row-major Y*X intensity list with
 * `len(pixels) == size_x * size_y` (meta.py:81-83).
 */
object OmeSchema {

  /** Constant tag value of the `type` field (meta.py:9). */
  val TagType = "ome.arrow"

  /** Schema version we emit (reference package version, meta.py:10). */
  val Version = "1.0.0"

  /** Default struct column name used by the class-level API (core.py:158). */
  val DefaultColumn = "ome_arrow"

  /** Column name the reference's raw writer defaults to (export.py:380). */
  val RawWriterColumn = "image"

  val channelType: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("emission_um", FloatType),
    StructField("excitation_um", FloatType),
    StructField("illumination", StringType),
    StructField("color_rgba", LongType)
  ))

  val pixelsMetaType: StructType = StructType(Seq(
    StructField("dimension_order", StringType),
    StructField("type", StringType),
    StructField("size_x", IntegerType),
    StructField("size_y", IntegerType),
    StructField("size_z", IntegerType),
    StructField("size_c", ShortType),
    StructField("size_t", IntegerType),
    StructField("physical_size_x", FloatType),
    StructField("physical_size_y", FloatType),
    StructField("physical_size_z", FloatType),
    StructField("physical_size_x_unit", StringType),
    StructField("physical_size_y_unit", StringType),
    StructField("physical_size_z_unit", StringType),
    StructField("channels", ArrayType(channelType))
  ))

  val planeType: StructType = StructType(Seq(
    StructField("z", IntegerType),
    StructField("t", IntegerType),
    StructField("c", ShortType),
    StructField("pixels", ArrayType(IntegerType))
  ))

  /** The canonical OME-Arrow struct (masks omitted, see scaladoc above). */
  val omeArrowType: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("version", StringType),
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("acquisition_datetime", TimestampType),
    StructField("pixels_meta", pixelsMetaType),
    StructField("planes", ArrayType(planeType))
  ))

  /** Field-name set used for lenient auto-detection of an OME-Arrow struct
    * column, mirroring the reference's set-equality matcher
    * (ingest.py:872-875). `masks` is optional on both sides. */
  val fieldNameSet: Set[String] =
    omeArrowType.fieldNames.toSet

  /** True if `dt` is a struct whose field-name set matches the canonical
    * record (ignoring the optional `masks` placeholder). Lenient mode —
    * names only, like the reference's default `strict_schema=False`. */
  def fieldSetMatches(dt: DataType): Boolean = dt match {
    case s: StructType => (s.fieldNames.toSet - "masks") == fieldNameSet
    case _             => false
  }

  /** Strict conformance: field names AND Spark types must match the
    * canonical schema exactly (after dropping `masks`), ignoring
    * nullability — the analog of `strict_schema=True` (ingest.py:883-888). */
  def strictMatches(dt: DataType): Boolean = dt match {
    case s: StructType =>
      val trimmed = StructType(s.fields.filterNot(_.name == "masks"))
      sameTypeIgnoreNullability(trimmed, omeArrowType)
    case _ => false
  }

  private def sameTypeIgnoreNullability(a: DataType, b: DataType): Boolean =
    (a, b) match {
      case (x: StructType, y: StructType) =>
        x.length == y.length && x.fields.zip(y.fields).forall { case (f, g) =>
          f.name == g.name && sameTypeIgnoreNullability(f.dataType, g.dataType)
        }
      case (x: ArrayType, y: ArrayType) =>
        sameTypeIgnoreNullability(x.elementType, y.elementType)
      case _ => a == b
    }
}

/** Case-class bindings for Dataset[OmeArrowRecord] ergonomics. Field order
  * mirrors the canonical schema. */
case class OmeChannel(
    id: String,
    name: String,
    emission_um: Option[Float],
    excitation_um: Option[Float],
    illumination: Option[String],
    color_rgba: Option[Long])

case class OmePlane(z: Int, t: Int, c: Short, pixels: Seq[Int])

case class OmePixelsMeta(
    dimension_order: String,
    `type`: String,
    size_x: Int,
    size_y: Int,
    size_z: Int,
    size_c: Short,
    size_t: Int,
    physical_size_x: Option[Float],
    physical_size_y: Option[Float],
    physical_size_z: Option[Float],
    physical_size_x_unit: Option[String],
    physical_size_y_unit: Option[String],
    physical_size_z_unit: Option[String],
    channels: Seq[OmeChannel])

case class OmeArrowRecord(
    `type`: String,
    version: String,
    id: String,
    name: String,
    acquisition_datetime: java.sql.Timestamp,
    pixels_meta: OmePixelsMeta,
    planes: Seq[OmePlane])
