package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.schema._
import graft.sources.{OmeStack, TiffCodec}

/**
 * Streaming acquisition ingest (SURVEY.md §7.6 — an extension; the
 * reference is fully batch): a microscope drops one single-plane TIFF per
 * (t,c,z) into a directory; a Structured Streaming query assembles
 * complete OME-Arrow records as planes arrive.
 *
 * Topology: `readStream(binaryFile)` -> per-file decode (narrow map) ->
 * `groupByKey(image_id)` -> `flatMapGroupsWithState` holding the partial
 * plane set per image; a record is emitted exactly once, when its
 * expected plane count is reached, or (zero-filled) when the inactivity
 * timeout fires first — the streaming analog of the batch zero-fill join.
 * State per key is bounded by one image's planes, so executor memory
 * scales with in-flight images, not stream length.
 */
object OmeStreamIngest {

  final case class PlaneEvent(image_id: String, t: Int, c: Int, z: Int,
      width: Int, height: Int, pixels: Seq[Int], modTime: Timestamp)

  final case class ImageState(planes: Seq[PlaneEvent])

  /**
   * Parse a filename like `E99_C111_ZS000.tif` into (t,c,z) using the
   * same bracket-pattern grammar as batch stack ingest: `pattern` is the
   * O4 pattern whose choices enumerate the expected coordinates.
   */
  def planeStream(spark: SparkSession, dir: String, pattern: String,
      imageId: String, mapSeriesTo: String = "T"): Dataset[PlaneEvent] = {
    val sp = spark
    import sp.implicits._
    val (template, phs0) = OmeStack.parseBracketPattern(pattern)
    val phs = phs0.map { p =>
      val d = if (p.dim == '?') 'C' else p.dim
      // series remaps like batch ingest (ingest.py:508-511)
      if (d == 'S') {
        require(mapSeriesTo.nonEmpty,
          "Encountered 'series' but mapSeriesTo is empty")
        p.copy(dim = mapSeriesTo.toUpperCase.head)
      } else p.copy(dim = d)
    }
    // filename -> (t,c,z): expand all combos once (driver, metadata-scale)
    val combos = phs.map(_.choices.zipWithIndex)
      .foldLeft(Seq(Seq.empty[(String, Int)])) { (acc, cs) =>
        acc.flatMap(prefix => cs.map(prefix :+ _))
      }
    val coordByName: Map[String, (Int, Int, Int)] = combos.map { combo =>
      val fname = combo.zipWithIndex.foldLeft(template) {
        case (acc, ((v, _), i)) => acc.replace(s"{$i}", v)
      }
      var t = 0; var c = 0; var z = 0
      phs.zip(combo).foreach { case (ph, (_, idx)) =>
        ph.dim match {
          case 'T' => t = idx; case 'C' => c = idx; case 'Z' => z = idx
          case _ => ()
        }
      }
      fname -> ((t, c, z))
    }.toMap
    val coordB = spark.sparkContext.broadcast(coordByName)
    val id = imageId
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.tif*")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .load(dir)
      .select(col("path"), col("modificationTime"), col("content"))
      .as[(String, Timestamp, Array[Byte])]
      .flatMap { case (p, ts, bytes) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        coordB.value.get(name).map { case (t, c, z) =>
          val page = TiffCodec.decode(bytes).head
          require(page.samples == 1, s"$p: multi-sample (RGB) pages are not " +
            "stackable by pattern — channels must come from the pattern's C axis")
          PlaneEvent(id, t, c, z, page.width, page.height,
            page.pixels.toSeq.map(v => math.min(math.max(v, 0), 65535)), ts)
        }
      }
  }

  /**
   * Assemble plane events into canonical records. Emits an image when
   * `expectedPlanes` have arrived; an inactivity timeout flushes partial
   * images zero-filled (missing-plane semantics shared with batch).
   */
  def assemble(planes: Dataset[PlaneEvent], expectedPlanes: Int,
      sizeT: Int, sizeC: Int, sizeZ: Int,
      timeout: String = "30 seconds"): Dataset[OmeArrowRecord] = {
    val sp = planes.sparkSession
    import sp.implicits._
    planes.groupByKey(_.image_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout) {
        (id: String, events: Iterator[PlaneEvent], state: GroupState[ImageState]) =>
          if (state.hasTimedOut) {
            val planes = state.getOption.map(_.planes).getOrElse(Nil)
            state.remove()
            if (planes.isEmpty) Iterator.empty
            else Iterator.single(buildRecord(id, planes, sizeT, sizeC, sizeZ))
          } else {
            val merged = state.getOption.map(_.planes).getOrElse(Nil) ++ events
            if (merged.size >= expectedPlanes) {
              state.remove()
              Iterator.single(buildRecord(id, merged, sizeT, sizeC, sizeZ))
            } else {
              state.update(ImageState(merged))
              state.setTimeoutDuration(timeout)
              Iterator.empty
            }
          }
      }
  }

  private[graft] def buildRecord(id: String, planes: Seq[PlaneEvent],
      sizeT: Int, sizeC: Int, sizeZ: Int): OmeArrowRecord = {
    val sx = planes.head.width
    val sy = planes.head.height
    val byCoord = planes.map(p => (p.t, p.c, p.z) -> p).toMap
    val zeros = Seq.fill(sx * sy)(0)
    val full = for {
      t <- 0 until sizeT; c <- 0 until sizeC; z <- 0 until sizeZ
    } yield OmePlane(z, t, c.toShort,
      byCoord.get((t, c, z)).map(_.pixels).getOrElse(zeros))
    OmeArrowRecord(
      `type` = OmeSchema.TagType, version = OmeSchema.Version,
      id = id, name = id,
      acquisition_datetime = planes.map(_.modTime).maxBy(_.getTime),
      pixels_meta = OmePixelsMeta(
        dimension_order = if (sizeZ == 1) "XYCT" else "XYZCT",
        `type` = "uint16",
        size_x = sx, size_y = sy, size_z = sizeZ,
        size_c = sizeC.toShort, size_t = sizeT,
        physical_size_x = Some(1.0f), physical_size_y = Some(1.0f),
        physical_size_z = Some(1.0f),
        physical_size_x_unit = Some("µm"), physical_size_y_unit = Some("µm"),
        physical_size_z_unit = Some("µm"),
        channels = graft.sources.OmeTiff.channelsFor(sizeC,
          (0 until sizeC).map(i => s"C$i"))),
      planes = full)
  }

  /** Canonical-column view of an assembled record stream. */
  def toOmeColumn(records: Dataset[OmeArrowRecord]): DataFrame =
    records.toDF().select(
      struct(col("type"), col("version"), col("id"), col("name"),
        col("acquisition_datetime"), col("pixels_meta"), col("planes"))
        .as(OmeSchema.DefaultColumn))
}
