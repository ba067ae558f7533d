package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.sql.Timestamp
import java.util.zip.{Deflater, Inflater}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.OmeOps
import graft.schema._

/**
 * OME-Zarr (NGFF) source/sink (reference: ingest.py:695-811 `from_ome_zarr`
 * via BioIO, export.py:231-374 `to_ome_zarr`), self-contained on the Zarr
 * v2 container format (public spec): a directory tree of JSON metadata
 * (`.zgroup`, `.zattrs`, `.zarray`) plus one binary file per chunk.
 *
 * Chunking is one chunk per (t,c,z) plane (`chunks = [1,1,1,Y,X]`), which
 * makes the chunk file the unit of distribution both ways: export is a
 * parallel `foreachPartition` over exploded planes (no driver pixel
 * traffic, no whole-volume densify — the reference's single-node memory
 * cliff, export.py:292, does not exist here), and ingest fans chunk
 * decode out over `binaryFile`.
 *
 * Codecs: `null` (raw) and `zlib` (JDK Deflater/Inflater) — both standard
 * numcodecs ids, so files interoperate with any Zarr reader. Blosc is out
 * of scope (no JVM implementation without third-party jars); readers that
 * encounter it get a clear error. Multiscale pyramids write each level
 * through `OmeOps.downscale2x` (the reference's level-shape contract
 * `max(1, n // 2)`, export.py:317-318).
 */
object OmeZarr {

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  // --- tiny JSON field extractors (engine-written metadata only) ------
  private def jsonInt(json: String, key: String): Option[Long] =
    (jsonStr(key) + """\s*:\s*(-?\d+)""").r
      .findFirstMatchIn(json).map(_.group(1).toLong)
  private def jsonString(json: String, key: String): Option[String] =
    (jsonStr(key) + """\s*:\s*"((?:[^"\\]|\\.)*)"""").r
      .findFirstMatchIn(json).map(_.group(1))
  private def jsonIntArray(json: String, key: String): Option[Seq[Long]] =
    (jsonStr(key) + """\s*:\s*\[([^\]]*)\]""").r
      .findFirstMatchIn(json)
      .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq)
  private def jsonNumArray(json: String, key: String): Option[Seq[Double]] =
    (jsonStr(key) + """\s*:\s*\[([^\]]*)\]""").r
      .findFirstMatchIn(json)
      .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toDouble).toSeq)

  /** The "scale" coordinate transform of the multiscales dataset whose
    * `path` equals `levelPath` — NOT the first scale array in the document,
    * which is level 0's transform and halves every physical size read from
    * a pyramid level (VERDICT r3 #2). Falls back to the first scale array
    * for foreign stores that order keys differently. */
  private def scaleForLevel(attrs: String, levelPath: String): Seq[Double] = {
    val re = ("""\{\s*"path"\s*:\s*""" +
      java.util.regex.Pattern.quote(jsonStr(levelPath)) +
      """\s*,[\s\S]*?"scale"\s*:\s*\[([^\]]*)\]""").r
    re.findFirstMatchIn(attrs)
      .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty)
        .map(_.toDouble).toSeq)
      .orElse(jsonNumArray(attrs, "scale"))
      .getOrElse(Seq(1.0, 1.0, 1.0, 1.0, 1.0))
  }

  // --- write ----------------------------------------------------------

  /**
   * Write each record as an OME-Zarr image directory `<out>/<id>.zarr`
   * (or exactly `out` when it ends in ".zarr" — single-record contract).
   * `multiscaleLevels` >= 1 adds 2x-downscaled levels "1", "2", ...
   */
  def write(df: DataFrame, out: String,
      multiscaleLevels: Int = 1,
      compressor: String = "zlib",
      column: String = OmeSchema.DefaultColumn): Unit = {
    require(multiscaleLevels >= 1, "multiscaleLevels must be >= 1")
    require(compressor == "zlib" || compressor == "null",
      s"compressor '$compressor' unsupported (zlib/null)")
    val single = out.toLowerCase.endsWith(".zarr")
    val spark = df.sparkSession
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())

    // per-image metadata ONCE from level 0 (cheap metadata-only scan via
    // nested pruning); level shapes derive driver-side from the level-0
    // shape (`max(1, n >> l)` == iterated floor halving). It also guards
    // the single-store contract without an extra count() pass.
    val metas = df.select(
      col(s"$column.id"),
      col(s"$column.pixels_meta.size_t"), col(s"$column.pixels_meta.size_c").cast("int"),
      col(s"$column.pixels_meta.size_z"), col(s"$column.pixels_meta.size_y"),
      col(s"$column.pixels_meta.size_x"),
      col(s"$column.pixels_meta.physical_size_x"),
      col(s"$column.pixels_meta.physical_size_y"),
      col(s"$column.pixels_meta.physical_size_z"),
      transform(col(s"$column.pixels_meta.channels"), c => c.getField("name")),
      col(s"$column.name")).collect()
    // chunk names carry no image id, so one store holds exactly one
    // record — multiple records would silently clobber each other
    require(!single || metas.length == 1,
      s"Writing to a single store '$out' requires exactly 1 record, got ${metas.length}")
    val fsConf = spark.sessionState.newHadoopConf()
    metas.foreach { m =>
      val id = m.getString(0)
      val root = if (single) new Path(out) else new Path(out, s"$id.zarr")
      val fs = root.getFileSystem(fsConf)
      fs.setWriteChecksum(false)
      val comp = if (compressor == "zlib")
        """{"id": "zlib", "level": 6}""" else "null"
      for (l <- 0 until multiscaleLevels) {
        val ly = math.max(m.getInt(4) >> l, 1)
        val lx = math.max(m.getInt(5) >> l, 1)
        val shape = Seq(m.getInt(1), m.getInt(2), m.getInt(3), ly, lx)
        writeText(fs, new Path(new Path(root, l.toString), ".zarray"),
          s"""{"zarr_format": 2, "shape": [${shape.mkString(", ")}],
             | "chunks": [1, 1, 1, $ly, $lx],
             | "dtype": "<u2", "compressor": $comp, "fill_value": 0,
             | "order": "C", "filters": null, "dimension_separator": "."}"""
            .stripMargin.replace("\n", ""))
      }
      val psx = if (m.isNullAt(6)) 1.0f else m.getFloat(6)
      val psy = if (m.isNullAt(7)) 1.0f else m.getFloat(7)
      val psz = if (m.isNullAt(8)) 1.0f else m.getFloat(8)
      val datasets = (0 until multiscaleLevels).map { lv =>
        val f = 1 << lv
        s"""{"path": ${jsonStr(lv.toString)}, "coordinateTransformations":
           | [{"type": "scale", "scale": [1.0, 1.0, $psz, ${psy * f}, ${psx * f}]}]}"""
          .stripMargin.replace("\n", "")
      }.mkString("[", ", ", "]")
      val channels = m.getSeq[String](9)
        .map(n => s"""{"label": ${jsonStr(n)}}""").mkString("[", ", ", "]")
      writeText(fs, new Path(root, ".zgroup"), """{"zarr_format": 2}""")
      writeText(fs, new Path(root, ".zattrs"),
        s"""{"multiscales": [{"version": "0.4", "name": ${jsonStr(m.getString(10))},
           | "axes": [{"name": "t", "type": "time"}, {"name": "c", "type": "channel"},
           | {"name": "z", "type": "space", "unit": "micrometer"},
           | {"name": "y", "type": "space", "unit": "micrometer"},
           | {"name": "x", "type": "space", "unit": "micrometer"}],
           | "datasets": $datasets}],
           | "omero": {"channels": $channels}}"""
          .stripMargin.replace("\n", ""))
    }

    // chunk payloads from executor tasks (one file per plane). Pyramid
    // levels chain `downscalePlanes` on the EXPLODED form: each level is
    // one more codegen'd BlockMean2x stage over a narrow projection —
    // linear cost in depth, unlike composing the nested-form downscale2x,
    // whose interpreted HOF tree duplicates subtrees per level and
    // effectively hangs at depth >= 3 (VERDICT r3 #3, SCALE.md lesson 1).
    var planes = OmeOps.explodePlanes(df, column)
    val zlib = compressor == "zlib"
    for (l <- 0 until multiscaleLevels) {
      planes.select(col("image_id"), col("t"), col("c"), col("z"),
          col("size_x"), col("size_y"), col("pixels"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          it.foreach { r =>
            val id = r.getString(0)
            val dir = if (single) new Path(out, l.toString)
              else new Path(new Path(out, s"$id.zarr"), l.toString)
            val chunkName = s"${r.getInt(1)}.${r.getInt(2)}.${r.getInt(3)}.0.0"
            val px = r.getSeq[Int](6)
            val bytes = new Array[Byte](px.length * 2)
            var i = 0
            while (i < px.length) {
              bytes(i * 2) = (px(i) & 0xff).toByte
              bytes(i * 2 + 1) = ((px(i) >> 8) & 0xff).toByte
              i += 1
            }
            val payload = if (zlib) zlibCompress(bytes) else bytes
            val fs = dir.getFileSystem(serConf.value)
            fs.setWriteChecksum(false)
            val os = fs.create(new Path(dir, chunkName), true)
            try os.write(payload) finally os.close()
          }
        }
      if (l + 1 < multiscaleLevels) planes = OmeOps.downscalePlanes(planes)
    }
  }

  private def writeText(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      text: String): Unit = {
    val os = fs.create(p, true)
    try os.write(text.getBytes("UTF-8")) finally os.close()
  }

  private def zlibCompress(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(6, false) // zlib-wrapped, numcodecs zlib compatible
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val tmp = new Array[Byte](16384)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  private def zlibDecompress(data: Array[Byte], hint: Int): Array[Byte] = {
    val inf = new Inflater(false)
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(hint, 64))
    val tmp = new Array[Byte](16384)
    while (!inf.finished()) {
      val n = inf.inflate(tmp)
      if (n == 0 && inf.needsInput())
        throw new IllegalArgumentException("Zarr: truncated zlib chunk")
      out.write(tmp, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  // --- read -----------------------------------------------------------

  /**
   * Read one OME-Zarr image directory (level `levelPath`, default "0")
   * into a single canonical record. Missing chunks zero-fill (Zarr
   * fill_value semantics) via the generated-grid left join.
   */
  def read(spark: SparkSession, path: String, levelPath: String = "0"): DataFrame = {
    val sp = spark
    import sp.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    require(fs.exists(root), s"No such Zarr store: $path")

    val attrs = readText(fs, new Path(root, ".zattrs"))
    val levelDir = new Path(root, levelPath)
    require(fs.exists(new Path(levelDir, ".zarray")),
      s"Zarr level '$levelPath' missing .zarray under $path")
    val zarray = readText(fs, new Path(levelDir, ".zarray"))

    val shape = jsonIntArray(zarray, "shape").getOrElse(
      throw new IllegalArgumentException("Zarr: .zarray has no shape"))
    require(shape.length == 5, s"Zarr: expected 5-D TCZYX shape, got $shape")
    val Seq(st, sc, sz, sy, sx) = shape.map(_.toInt)
    val chunks = jsonIntArray(zarray, "chunks").get.map(_.toInt)
    require(chunks.take(3).forall(_ == 1) && chunks(3) == sy && chunks(4) == sx,
      s"Zarr: only one-chunk-per-plane layout supported (chunks=$chunks)")
    val dtype = jsonString(zarray, "dtype").getOrElse("<u2")
    require(Set("<u2", "|u1", ">u2").contains(dtype),
      s"Zarr: dtype '$dtype' unsupported (u1/u2 only)")
    // compressor is either JSON null or an object whose "id" names the
    // codec; scope the id lookup to the compressor OBJECT so an "id" key
    // elsewhere in the document cannot satisfy the check
    val nullComp = """"compressor"\s*:\s*null""".r.findFirstIn(zarray).isDefined
    val compObj = """"compressor"\s*:\s*(\{[^}]*\})""".r
      .findFirstMatchIn(zarray).map(_.group(1))
    val compId =
      if (nullComp) "null"
      else compObj.flatMap(jsonString(_, "id")).getOrElse(
        throw new IllegalArgumentException(
          "Zarr: .zarray has neither a null compressor nor a compressor id"))
    require(compId == "zlib" || compId == "null",
      s"Zarr: compressor '$compId' unsupported (zlib/null; blosc needs external codecs)")
    // filters would transform bytes before/after the compressor — we
    // implement none, so anything but null/absent must be rejected
    val filtersSpecified = """"filters"\s*:\s*(?!null)[\[{"]""".r
      .findFirstIn(zarray).isDefined
    require(!filtersSpecified,
      "Zarr: filters are unsupported (store must have \"filters\": null)")

    // physical sizes from the scale transform of THIS level; channels from omero
    val scale = scaleForLevel(attrs, levelPath)
    val chanNames = """\{\s*"label"\s*:\s*"((?:[^"\\]|\\.)*)"\s*\}""".r
      .findAllMatchIn(attrs).map(_.group(1)).toSeq
    val imgName = jsonString(attrs, "name").getOrElse(root.getName)
    val stem = root.getName.stripSuffix(".zarr")

    val chunkFiles = fs.listStatus(levelDir).filter(_.isFile)
      .map(_.getPath.getName).filter(n => n.matches("""\d+\.\d+\.\d+\.0\.0"""))
    require(chunkFiles.nonEmpty, s"Zarr: no chunk files under $levelDir")
    val bin = spark.read.format("binaryFile")
      .load(chunkFiles.map(n => new Path(levelDir, n).toString): _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    val expectBytes = sy * sx * (if (dtype == "|u1") 1 else 2)
    val big = dtype == ">u2"; val u1 = dtype == "|u1"
    val zlib = compId == "zlib"
    val planeRows = bin.map { case (p, raw) =>
      val nameParts = p.substring(p.lastIndexOf('/') + 1).split("\\.")
      val (t, c, z) = (nameParts(0).toInt, nameParts(1).toInt, nameParts(2).toInt)
      val bytes = if (zlib) zlibDecompress(raw, expectBytes) else raw
      require(bytes.length >= expectBytes,
        s"Zarr chunk $p: ${bytes.length} bytes < expected $expectBytes")
      val px = new Array[Int](sy * sx)
      if (u1) {
        var i = 0; while (i < px.length) { px(i) = bytes(i) & 0xff; i += 1 }
      } else {
        val bb = ByteBuffer.wrap(bytes)
          .order(if (big) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
        var i = 0; while (i < px.length) { px(i) = bb.getShort(i * 2) & 0xffff; i += 1 }
      }
      (t, c, z, px.toSeq)
    }.toDF("t", "c", "z", "pixels")

    val grid = spark.range(st.toLong * sc * sz).select(
      (col("id") / (sc * sz)).cast("int").as("t"),
      ((col("id") / sz) % sc).cast("int").as("c"),
      (col("id") % sz).cast("int").as("z"))
    val filled = grid.join(planeRows, Seq("t", "c", "z"), "left")
      .select(col("t"), col("c"), col("z"),
        coalesce(col("pixels"), array_repeat(lit(0), sy * sx)).as("pixels"))

    val names = if (chanNames.length == sc) chanNames
      else (0 until sc).map(i => s"C$i")
    val channelsExpr = array(names.zipWithIndex.map { case (n, i) =>
      struct(lit(s"ch-$i").as("id"), lit(n).as("name"),
        lit(0.0f).as("emission_um"), lit(0.0f).as("excitation_um"),
        lit("Unknown").as("illumination"), lit(0xFFFFFFFFL).as("color_rgba"))
    }: _*)
    val pixelsMeta = struct(
      lit(if (sz > 1) "XYZCT" else "XYCT").as("dimension_order"),
      lit("uint16").as("type"),
      lit(sx).as("size_x"), lit(sy).as("size_y"), lit(sz).as("size_z"),
      lit(sc).cast("short").as("size_c"), lit(st).as("size_t"),
      lit(scale(4).toFloat).as("physical_size_x"),
      lit(scale(3).toFloat).as("physical_size_y"),
      lit(scale(2).toFloat).as("physical_size_z"),
      lit("µm").as("physical_size_x_unit"), lit("µm").as("physical_size_y_unit"),
      lit("µm").as("physical_size_z_unit"),
      channelsExpr.as("channels"))
    val recordMeta = struct(
      lit(OmeSchema.TagType).as("type"), lit(OmeSchema.Version).as("version"),
      lit(stem).as("id"), lit(imgName).as("name"),
      lit(new Timestamp(0L)).cast("timestamp").as("acquisition_datetime"),
      pixelsMeta.as("pixels_meta"))
    OmeOps.nestPlanes(filled
      .withColumn("image_id", lit(stem))
      .withColumn("record_meta", recordMeta)
      .select(col("image_id"), col("record_meta"),
        col("t"), col("c"), col("z"), col("pixels")))
  }

  private[sources] final case class StoreConfig(store: String, stem: String,
      name: String, st: Int, sc: Int, sz: Int, sy: Int, sx: Int,
      psx: Float, psy: Float, psz: Float, chans: Seq[String],
      zlib: Boolean, big: Boolean, u1: Boolean)

  /** Parse one store's metadata (driver-side, metadata-scale). */
  private def parseConfig(fs: org.apache.hadoop.fs.FileSystem,
      storePath: String, levelPath: String): StoreConfig = {
    val root = new Path(storePath)
    val attrs = readText(fs, new Path(root, ".zattrs"))
    val levelDir = new Path(root, levelPath)
    val zarray = readText(fs, new Path(levelDir, ".zarray"))
    val shape = jsonIntArray(zarray, "shape").getOrElse(
      throw new IllegalArgumentException(s"Zarr: $storePath has no shape"))
    require(shape.length == 5, s"Zarr: expected 5-D TCZYX shape, got $shape")
    val chunks = jsonIntArray(zarray, "chunks").get.map(_.toInt)
    require(chunks.take(3).forall(_ == 1) &&
      chunks(3) == shape(3) && chunks(4) == shape(4),
      s"Zarr: only one-chunk-per-plane layout supported (chunks=$chunks)")
    val dtype = jsonString(zarray, "dtype").getOrElse("<u2")
    require(Set("<u2", "|u1", ">u2").contains(dtype),
      s"Zarr: dtype '$dtype' unsupported (u1/u2 only)")
    val nullComp = """"compressor"\s*:\s*null""".r.findFirstIn(zarray).isDefined
    val compObj = """"compressor"\s*:\s*(\{[^}]*\})""".r
      .findFirstMatchIn(zarray).map(_.group(1))
    val compId =
      if (nullComp) "null"
      else compObj.flatMap(jsonString(_, "id")).getOrElse(
        throw new IllegalArgumentException(
          "Zarr: .zarray has neither a null compressor nor a compressor id"))
    require(compId == "zlib" || compId == "null",
      s"Zarr: compressor '$compId' unsupported (zlib/null; blosc needs external codecs)")
    val filtersSpecified = """"filters"\s*:\s*(?!null)[\[{"]""".r
      .findFirstIn(zarray).isDefined
    require(!filtersSpecified,
      "Zarr: filters are unsupported (store must have \"filters\": null)")
    val scale = scaleForLevel(attrs, levelPath)
    val chanNames = """\{\s*"label"\s*:\s*"((?:[^"\\]|\\.)*)"\s*\}""".r
      .findAllMatchIn(attrs).map(_.group(1)).toSeq
    StoreConfig(storePath, root.getName.stripSuffix(".zarr"),
      jsonString(attrs, "name").getOrElse(root.getName),
      shape(0).toInt, shape(1).toInt, shape(2).toInt, shape(3).toInt,
      shape(4).toInt, scale(4).toFloat, scale(3).toFloat, scale(2).toFloat,
      chanNames, compId == "zlib", dtype == ">u2", dtype == "|u1")
  }

  /**
   * Read every `*.zarr` child of a directory, one record each, as a SINGLE
   * job: metadata parses driver-side per store, but all chunk files across
   * all stores flow through one `binaryFile` load and one nest shuffle —
   * a 10,000-store corpus is one plan, not 10,000 unioned plans.
   */
  def readAll(spark: SparkSession, dir: String, levelPath: String = "0"): DataFrame = {
    val sp = spark
    import sp.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val stores = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.toString).filter(_.endsWith(".zarr"))
    require(stores.nonEmpty, s"No .zarr stores under $dir")

    val configs = stores.map(parseConfig(fs, _, levelPath)).toSeq
    val byStem = configs.map(c => c.stem -> c).toMap
    require(byStem.size == configs.size, "Zarr: duplicate store stems")
    val confB = spark.sparkContext.broadcast(byStem)

    val chunkPaths = configs.flatMap { c =>
      val levelDir = new Path(new Path(c.store), levelPath)
      fs.listStatus(levelDir).filter(_.isFile)
        .map(_.getPath).filter(_.getName.matches("""\d+\.\d+\.\d+\.0\.0"""))
        .map(_.toString)
    }
    require(chunkPaths.nonEmpty, s"Zarr: no chunk files under $dir")

    // one load for every chunk of every store
    val planeRows = spark.read.format("binaryFile")
      .load(chunkPaths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (p, raw) =>
        // .../<stem>.zarr/<level>/<t.c.z.0.0>
        val parts = p.split('/')
        val stem = parts(parts.length - 3).stripSuffix(".zarr")
        val c = confB.value(stem)
        val nameParts = parts.last.split("\\.")
        val (t, ch, z) = (nameParts(0).toInt, nameParts(1).toInt, nameParts(2).toInt)
        val expect = c.sy * c.sx * (if (c.u1) 1 else 2)
        val bytes = if (c.zlib) zlibDecompress(raw, expect) else raw
        require(bytes.length >= expect,
          s"Zarr chunk $p: ${bytes.length} bytes < expected $expect")
        val px = new Array[Int](c.sy * c.sx)
        if (c.u1) {
          var i = 0; while (i < px.length) { px(i) = bytes(i) & 0xff; i += 1 }
        } else {
          val bb = ByteBuffer.wrap(bytes)
            .order(if (c.big) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
          var i = 0; while (i < px.length) { px(i) = bb.getShort(i * 2) & 0xffff; i += 1 }
        }
        (stem, t, ch, z, px.toSeq)
      }.toDF("image_id", "t", "c", "z", "pixels")

    // zero-fill grid for every store, generated on executors
    val grid = spark.createDataset(configs.map(c =>
        (c.stem, c.st, c.sc, c.sz, c.sy * c.sx)))
      .flatMap { case (stem, st, sc, sz, planeLen) =>
        for (t <- 0 until st; ch <- 0 until sc; z <- 0 until sz)
          yield (stem, t, ch, z, planeLen)
      }.toDF("image_id", "t", "c", "z", "plane_len")
    val filled = grid.join(planeRows, Seq("image_id", "t", "c", "z"), "left")
      .select(col("image_id"), col("t"), col("c"), col("z"),
        coalesce(col("pixels"),
          array_repeat(lit(0), col("plane_len"))).as("pixels"))

    // per-store record metadata, built as expressions over the config rows
    val metaDf = spark.createDataset(configs).toDF()
      .select(col("stem").as("image_id"), struct(
        lit(OmeSchema.TagType).as("type"), lit(OmeSchema.Version).as("version"),
        col("stem").as("id"), col("name").as("name"),
        lit(new Timestamp(0L)).cast("timestamp").as("acquisition_datetime"),
        struct(
          when(col("sz") > 1, "XYZCT").otherwise("XYCT").as("dimension_order"),
          lit("uint16").as("type"),
          col("sx").as("size_x"), col("sy").as("size_y"), col("sz").as("size_z"),
          col("sc").cast("short").as("size_c"), col("st").as("size_t"),
          col("psx").as("physical_size_x"), col("psy").as("physical_size_y"),
          col("psz").as("physical_size_z"),
          lit("µm").as("physical_size_x_unit"), lit("µm").as("physical_size_y_unit"),
          lit("µm").as("physical_size_z_unit"),
          transform(
            when(size(col("chans")) === col("sc").cast("int"), col("chans"))
              .otherwise(transform(sequence(lit(0), col("sc").cast("int") - 1),
                i => concat(lit("C"), i))),
            (n, i) => struct(
              concat(lit("ch-"), i).as("id"), n.as("name"),
              lit(0.0f).as("emission_um"), lit(0.0f).as("excitation_um"),
              lit("Unknown").as("illumination"),
              lit(0xFFFFFFFFL).as("color_rgba"))).as("channels")).as("pixels_meta"))
        .as("record_meta"))
    OmeOps.nestPlanes(filled.join(broadcast(metaDf), Seq("image_id")))
  }

  private def readText(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    require(fs.exists(p), s"Missing $p")
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }
}
