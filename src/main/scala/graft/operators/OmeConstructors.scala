package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema._

/**
 * Record constructors: the reference's `to_ome_arrow` defaults-filling
 * builder (O1, ingest.py:22-133) and `from_numpy` dense-array bridge
 * (O2, ingest.py:136-290) re-expressed for DataFrames.
 */
object OmeConstructors {

  /** Reference default channel (ingest.py:85-95). */
  val DefaultChannel: OmeChannel =
    OmeChannel("ch-0", "default", Some(0.0f), Some(0.0f),
      Some("Unknown"), Some(0xFFFFFFFFL))

  /**
   * O1: one validated record with the reference's defaults — id
   * "unnamed", name "unknown", 1x1x1x1x1, physical sizes 1.0 µm, one
   * default channel, one zero plane (ingest.py:22-133). The record rides
   * the canonical Spark schema, so it round-trips through OME-Parquet.
   */
  def toOmeArrow(spark: SparkSession,
      imageId: String = "unnamed",
      name: String = "unknown",
      acquisitionDatetime: Timestamp = Timestamp.from(java.time.Instant.now()),
      dimensionOrder: String = "XYZCT",
      dtype: String = "uint16",
      sizeX: Int = 1, sizeY: Int = 1, sizeZ: Int = 1,
      sizeC: Int = 1, sizeT: Int = 1,
      physicalSizeX: Float = 1.0f, physicalSizeY: Float = 1.0f,
      physicalSizeZ: Float = 1.0f, physicalSizeUnit: String = "µm",
      channels: Option[Seq[OmeChannel]] = None,
      planes: Option[Seq[OmePlane]] = None): DataFrame = {
    val sp = spark
    import sp.implicits._
    val record = OmeArrowRecord(
      `type` = OmeSchema.TagType,
      version = OmeSchema.Version,
      id = imageId,
      name = name,
      acquisition_datetime = acquisitionDatetime,
      pixels_meta = OmePixelsMeta(
        dimension_order = dimensionOrder,
        `type` = dtype,
        size_x = sizeX, size_y = sizeY, size_z = sizeZ,
        size_c = sizeC.toShort, size_t = sizeT,
        physical_size_x = Some(physicalSizeX),
        physical_size_y = Some(physicalSizeY),
        physical_size_z = Some(physicalSizeZ),
        physical_size_x_unit = Some(physicalSizeUnit),
        physical_size_y_unit = Some(physicalSizeUnit),
        physical_size_z_unit = Some(physicalSizeUnit),
        channels = channels.getOrElse(Seq(DefaultChannel))),
      planes = planes.getOrElse(
        Seq(OmePlane(0, 0, 0, Seq.fill(sizeX * sizeY)(0)))))
    Seq(record).toDF().select(
      struct(col("type"), col("version"), col("id"), col("name"),
        col("acquisition_datetime"), col("pixels_meta"), col("planes"))
        .as(OmeSchema.DefaultColumn))
  }

  /**
   * O2: dense flat array column -> canonical record column, the
   * `from_numpy` semantics (ingest.py:136-290) distributed over every row:
   *
   *  - `dimOrder` labels the INPUT layout (subset of "TCZYX" containing
   *    Y and X, e.g. "YX", "ZYX", "CZYX", "TCZYX"); absent axes have
   *    size 1;
   *  - planes come out in canonical t-major/c/z order regardless of the
   *    input layout (index arithmetic replaces np.transpose);
   *  - values are clamped to [0, 65535] (clamp_to_uint16 default);
   *  - metadata dimension_order is "XYCT" when Z is absent from
   *    `dimOrder`, else "XYZCT" (from_numpy Notes).
   *
   * Input: `df` with `idCol` (string) and `denseCol`
   * (array<int|long|double>, length = product of sizes). Sizes are
   * query constants, like the reference's array shape.
   */
  def fromDense(df: DataFrame, dimOrder: String = "TCZYX",
      sizeT: Int = 1, sizeC: Int = 1, sizeZ: Int = 1,
      sizeY: Int, sizeX: Int,
      idCol: String = "id", denseCol: String = "dense",
      name: Option[String] = None,
      channelNames: Seq[String] = Nil,
      clamp: Boolean = true,
      physicalSizeX: Float = 1.0f, physicalSizeY: Float = 1.0f,
      physicalSizeZ: Float = 1.0f): DataFrame = {
    val dims = dimOrder.toUpperCase
    require(dims.contains("Y") && dims.contains("X"),
      "dimOrder must include 'Y' and 'X' axes.")
    require(dims.forall("TCZYX".contains(_)) && dims.distinct == dims,
      s"dimOrder '$dimOrder' must be a subset of TCZYX without repeats")
    val sizeOf = Map('T' -> sizeT, 'C' -> sizeC, 'Z' -> sizeZ,
      'Y' -> sizeY, 'X' -> sizeX)
    // strides of the INPUT layout (row-major over dimOrder)
    val strides: Map[Char, Long] = {
      var acc = 1L
      dims.reverse.map { ax => val s = acc; acc *= sizeOf(ax); ax -> s }.toMap
    }
    def strideOf(ax: Char): Long = if (dims.contains(ax)) strides(ax) else 0L
    val total = dims.map(sizeOf(_).toLong).product

    val dense = col(denseCol)
    val checked = when(size(dense) =!= lit(total.toInt), raise_error(
      format_string(s"dense length %d != expected $total", size(dense))))
      .otherwise(dense)
    def pix(v: org.apache.spark.sql.Column) = {
      val c = v.cast("int")
      if (clamp) least(greatest(c, lit(0)), lit(65535)) else c
    }
    // planes in t-major, c, z order; per plane gather (y,x) via strides
    val planesExpr = flatten(transform(sequence(lit(0), lit(sizeT - 1)), t =>
      flatten(transform(sequence(lit(0), lit(sizeC - 1)), c =>
        transform(sequence(lit(0), lit(sizeZ - 1)), z => {
          val base = t.cast("long") * strideOf('T') +
            c.cast("long") * strideOf('C') + z.cast("long") * strideOf('Z')
          struct(
            z.cast("int").as("z"), t.cast("int").as("t"),
            c.cast("short").as("c"),
            transform(sequence(lit(0), lit(sizeY * sizeX - 1)), p => {
              val y = (p / sizeX).cast("long"); val x = (p % sizeX).cast("long")
              pix(get(checked,
                (base + y * strideOf('Y') + x * strideOf('X')).cast("int")))
            }).as("pixels"))
        })))))
    val names = if (channelNames.nonEmpty) channelNames
      else (0 until sizeC).map(i => s"C$i")
    val channelsExpr = array(names.zipWithIndex.map { case (n, i) =>
      struct(lit(s"ch-$i").as("id"), lit(n).as("name"),
        lit(0.0f).as("emission_um"), lit(0.0f).as("excitation_um"),
        lit("Unknown").as("illumination"), lit(0xFFFFFFFFL).as("color_rgba"))
    }: _*)
    val pmExpr = struct(
      lit(if (dims.contains('Z')) "XYZCT" else "XYCT").as("dimension_order"),
      lit("uint16").as("type"),
      lit(sizeX).as("size_x"), lit(sizeY).as("size_y"), lit(sizeZ).as("size_z"),
      lit(sizeC).cast("short").as("size_c"), lit(sizeT).as("size_t"),
      lit(physicalSizeX).as("physical_size_x"),
      lit(physicalSizeY).as("physical_size_y"),
      lit(physicalSizeZ).as("physical_size_z"),
      lit("µm").as("physical_size_x_unit"), lit("µm").as("physical_size_y_unit"),
      lit("µm").as("physical_size_z_unit"),
      channelsExpr.as("channels"))
    df.select(struct(
      lit(OmeSchema.TagType).as("type"),
      lit(OmeSchema.Version).as("version"),
      col(idCol).cast("string").as("id"),
      name.map(lit(_)).getOrElse(col(idCol).cast("string")).as("name"),
      lit(new Timestamp(0L)).as("acquisition_datetime"),
      pmExpr.as("pixels_meta"),
      planesExpr.as("planes")).as(OmeSchema.DefaultColumn))
  }
}
