package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.sql.Timestamp
import java.util.zip.{GZIPInputStream, GZIPOutputStream, Inflater}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.OmeOps
import graft.schema._

/**
 * OME-Zarr (NGFF) source/sink (reference: ingest.py:695-811 `from_ome_zarr`
 * via BioIO, export.py:231-374 `to_ome_zarr`), self-contained on the public
 * Zarr container formats:
 *
 *  - **v2** (NGFF 0.4): `.zgroup`/`.zattrs`/`.zarray` JSON + one binary
 *    file per chunk named `t.c.z.0.0`;
 *  - **v3** (NGFF 0.5 — the REFERENCE'S DEFAULT, export.py:242): per-node
 *    `zarr.json` metadata, chunk keys `c/t/c/z/y/x` (default encoding,
 *    "/" or "." separator), `bytes` + optional compression codecs.
 *
 * Chunking is one chunk per (t,c,z) plane (`chunks = [1,1,1,Y,X]`), which
 * makes the chunk file the unit of distribution both ways: export is a
 * parallel `foreachPartition` over exploded planes (no driver pixel
 * traffic, no whole-volume densify — the reference's single-node memory
 * cliff, export.py:292, does not exist here), and ingest fans chunk
 * decode out over `binaryFile`.
 *
 * Codecs: `null` (raw), `zlib` (JDK Inflater; v3 writes its `gzip`
 * codec), `zstd` (zstd-jni from Spark's own jars; raw frames, matching
 * numcodecs' v2 `{"id": "zstd"}` and the v3 `zstd` codec — the
 * REFERENCE'S DEFAULT compressor, export.py:265–289), and **Blosc**
 * decode/encode via [[BloscCodec]] (lz4/zlib/zstd/snappy payloads, byte-
 * and bit-shuffle) — numcodecs' default envelope, so reference-written
 * stores open without external jars. Multiscale pyramids build levels
 * with `OmeOps.downscalePlanes` on the exploded form (level-shape
 * contract `max(1, n >> l)`, export.py:317-318) — depth-safe, unlike
 * composing the nested-form downscale.
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

  /** The JSON value (object or array) of `key`'s first occurrence, found
    * by balanced-bracket scan with string awareness — the flat regex
    * extractors above cannot cross nested arrays (the sharding codec's
    * configuration holds arrays inside the codecs array). Returns the
    * exact value substring including its outer brackets. */
  private[sources] def jsonValue(json: String, key: String): Option[String] = {
    val m = (jsonStr(key) + """\s*:\s*""").r.findFirstMatchIn(json)
      .getOrElse(return None)
    val start = m.end
    if (start >= json.length || (json(start) != '[' && json(start) != '{'))
      return None
    var depth = 0; var i = start; var inStr = false; var esc = false
    while (i < json.length) {
      val ch = json(i)
      if (inStr) {
        if (esc) esc = false
        else if (ch == '\\') esc = true
        else if (ch == '"') inStr = false
      } else ch match {
        case '"' => inStr = true
        case '[' | '{' => depth += 1
        case ']' | '}' =>
          depth -= 1
          if (depth == 0) return Some(json.substring(start, i + 1))
        case _ =>
      }
      i += 1
    }
    None
  }

  /** Split a JSON array's body into its top-level element substrings. */
  private[sources] def jsonElements(arr: String): Seq[String] = {
    val body = arr.trim.stripPrefix("[").stripSuffix("]")
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr = false; var esc = false; var start = 0
    for (i <- body.indices) {
      val ch = body(i)
      if (inStr) {
        if (esc) esc = false
        else if (ch == '\\') esc = true
        else if (ch == '"') inStr = false
      } else ch match {
        case '"' => inStr = true
        case '[' | '{' => depth += 1
        case ']' | '}' => depth -= 1
        case ',' if depth == 0 =>
          out += body.substring(start, i); start = i + 1
        case _ =>
      }
    }
    if (body.trim.nonEmpty) out += body.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** The image name from a multiscales attrs document. The naive first
    * `"name"` match breaks on foreign stores that serialize `axes` before
    * the multiscale `name` (key order is free in JSON): axis objects are
    * `{"name": "t", "type": ...}`, so skip any name immediately followed
    * by a "type" key (and the v3 codec/grid `{"name": ..,
    * "configuration": ..}` shape likewise). */
  private def imageName(attrs: String): Option[String] =
    (""""name"\s*:\s*"((?:[^"\\]|\\.)*)"\s*(,\s*"(?:type|configuration)")?""").r
      .findAllMatchIn(attrs).find(_.group(2) == null).map(_.group(1))

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

  // --- chunk payload codecs -------------------------------------------

  private[sources] def encodeChunk(bytes: Array[Byte], comp: String): Array[Byte] =
    comp match {
      case "null" => bytes
      case "zlib" => zlibCompress(bytes)
      case "gzip" => gzipCompress(bytes)
      case "zstd" => com.github.luben.zstd.Zstd.compress(bytes, 3)
      case "blosc" => BloscCodec.compress(bytes, typesize = 2,
        cname = "zlib", shuffle = 1)
      case "blosclz" => BloscCodec.compress(bytes, typesize = 2,
        cname = "blosclz", shuffle = 1)
      case other => throw new IllegalArgumentException(
        s"Zarr: compressor '$other' unsupported")
    }

  /** `expect` is the exact chunk payload size (chunk shape × dtype) — it
    * both sizes buffers and CAPS decompression, so a hostile chunk can't
    * zip-bomb an executor (the expansion stops at the cap and errors). */
  private[sources] def decodeChunk(raw: Array[Byte], comp: String,
      expect: Int): Array[Byte] = comp match {
    case "null" => raw
    case "zlib" => zlibDecompress(raw, expect)
    case "gzip" => gzipDecompress(raw, expect)
    case "zstd" => zstdDecompress(raw, expect)
    case "blosc" => BloscCodec.decompress(raw, maxOut = boundedCap(expect))
    // numcodecs LZMA writes liblzma XZ streams (format 2 is the legacy
    // alone container — both sniffed); decode bounded by the chunk size
    case "lzma" => XzLzma.decode(raw, expect)
    case other => throw new IllegalArgumentException(
      s"Zarr: compressor '$other' unsupported")
  }

  /** Raw zstd frame (numcodecs v2 / zarr v3 codec). The destination
    * allocation is bounded by `expect` (or the unknown-size ceiling), so
    * a hostile chunk can't demand more — zstd-jni errors past the cap. */
  private def zstdDecompress(data: Array[Byte], expect: Int): Array[Byte] = {
    import com.github.luben.zstd.Zstd
    val cap = boundedCap(expect)
    val size =
      if (expect > 0) expect
      else {
        val hint = Zstd.decompressedSize(data)
        if (hint > 0 && hint <= cap) hint.toInt else cap
      }
    val dst = new Array[Byte](size)
    val rc = Zstd.decompressByteArray(dst, 0, size, data, 0, data.length)
    if (Zstd.isError(rc))
      throw new IllegalArgumentException(s"Zarr: zstd: ${Zstd.getErrorName(rc)}")
    if (rc == size) dst else java.util.Arrays.copyOf(dst, rc.toInt)
  }

  // zlib-wrapped, numcodecs zlib compatible
  private def zlibCompress(data: Array[Byte]): Array[Byte] = ZlibUtil.deflate(data)

  private def zlibDecompress(data: Array[Byte], expect: Int): Array[Byte] = {
    val cap = boundedCap(expect)
    val inf = new Inflater(false)
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(math.min(expect, cap), 64))
    val tmp = new Array[Byte](16384)
    while (!inf.finished()) {
      val n = inf.inflate(tmp)
      if (n == 0 && inf.needsInput())
        throw new IllegalArgumentException("Zarr: truncated zlib chunk")
      out.write(tmp, 0, n)
      require(out.size() <= cap,
        s"Zarr: zlib chunk inflates past $cap bytes (expected $expect)")
    }
    inf.end()
    out.toByteArray
  }

  /** Decompression cap: the exact expected size when known, else a sane
    * ceiling so unknown-size paths still can't expand unboundedly. */
  private def boundedCap(expect: Int): Int =
    if (expect > 0) expect else 1 << 28

  private def gzipCompress(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(data); gz.close()
    bos.toByteArray
  }

  private def gzipDecompress(data: Array[Byte], expect: Int): Array[Byte] = {
    val cap = boundedCap(expect)
    val gz = new GZIPInputStream(new java.io.ByteArrayInputStream(data))
    val out = new java.io.ByteArrayOutputStream(math.max(math.min(expect, cap), 64))
    val tmp = new Array[Byte](16384)
    var n = gz.read(tmp)
    while (n >= 0) {
      out.write(tmp, 0, n)
      require(out.size() <= cap,
        s"Zarr: gzip chunk inflates past $cap bytes (expected $expect)")
      n = gz.read(tmp)
    }
    gz.close()
    out.toByteArray
  }

  // --- write ----------------------------------------------------------

  /** One plane's pixel values as the store's uint16-LE chunk payload. */
  private def packU16LE(px: Seq[Int]): Array[Byte] = {
    val bytes = new Array[Byte](px.length * 2)
    var i = 0
    while (i < px.length) {
      bytes(i * 2) = (px(i) & 0xff).toByte
      bytes(i * 2 + 1) = ((px(i) >> 8) & 0xff).toByte
      i += 1
    }
    bytes
  }

  /**
   * Write each record as an OME-Zarr image directory `<out>/<id>.zarr`
   * (or exactly `out` when it ends in ".zarr" — single-record contract).
   * `multiscaleLevels` >= 1 adds 2x-downscaled levels "1", "2", ...
   * `zarrFormat` 2 writes NGFF 0.4 (`.zattrs`), 3 writes NGFF 0.5
   * (`zarr.json`, the reference's default container). `compressor`:
   * "zlib" (v3 writes its gzip codec), "zstd" (the reference's default
   * codec, raw frames), "blosc" (zlib payload, byte-shuffle) or "null".
   *
   * `shardZ` (v3 only; export.py:342-348 `shards` semantics) packs all z
   * planes of one (t, c) into a single `sharding_indexed` shard file with
   * one-plane inner chunks and a crc32c'd end index — at 100 TB this
   * collapses the file count by size_z without giving up per-plane
   * addressability (readers fetch one inner chunk via the index).
   */
  def write(df: DataFrame, out: String,
      multiscaleLevels: Int = 1,
      compressor: String = "zlib",
      zarrFormat: Int = 2,
      shardZ: Boolean = false,
      chunks: Option[Seq[Int]] = None,
      column: String = OmeSchema.DefaultColumn): Unit = {
    require(multiscaleLevels >= 1, "multiscaleLevels must be >= 1")
    require(Set("zlib", "null", "blosc", "blosclz", "zstd").contains(compressor),
      s"compressor '$compressor' unsupported (zlib/zstd/blosc/blosclz/null)")
    require(zarrFormat == 2 || zarrFormat == 3,
      s"zarrFormat must be 2 or 3, got $zarrFormat")
    require(!shardZ || zarrFormat == 3, "shardZ requires zarrFormat = 3")
    // arbitrary TCZYX chunk shapes (export.py:342-348 semantics): multi-
    // plane chunks batch t/c/z, sub-plane chunks split big Y×X planes
    chunks.foreach { ch =>
      require(ch.length == 5 && ch.forall(_ >= 1),
        s"chunks must be 5 positive extents (got $ch)")
      require(!shardZ, "chunks and shardZ are mutually exclusive")
    }
    val v3 = zarrFormat == 3
    // the v3 container has no zlib codec; deflate rides its gzip codec
    val chunkComp = if (v3 && compressor == "zlib") "gzip" else compressor
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
      for (l <- 0 until multiscaleLevels) {
        val ly = math.max(m.getInt(4) >> l, 1)
        val lx = math.max(m.getInt(5) >> l, 1)
        val shape = Seq(m.getInt(1), m.getInt(2), m.getInt(3), ly, lx)
        if (v3) {
          val inner = chunkComp match {
            case "gzip" =>
              """[{"name": "bytes", "configuration": {"endian": "little"}}, {"name": "gzip", "configuration": {"level": 6}}]"""
            case "blosc" =>
              """[{"name": "bytes", "configuration": {"endian": "little"}}, {"name": "blosc", "configuration": {"cname": "zlib", "clevel": 6, "shuffle": "shuffle", "typesize": 2, "blocksize": 0}}]"""
            case "blosclz" =>
              """[{"name": "bytes", "configuration": {"endian": "little"}}, {"name": "blosc", "configuration": {"cname": "blosclz", "clevel": 5, "shuffle": "shuffle", "typesize": 2, "blocksize": 0}}]"""
            case "zstd" =>
              """[{"name": "bytes", "configuration": {"endian": "little"}}, {"name": "zstd", "configuration": {"level": 3, "checksum": false}}]"""
            case _ =>
              """[{"name": "bytes", "configuration": {"endian": "little"}}]"""
          }
          val codecs =
            if (shardZ)
              s"""[{"name": "sharding_indexed", "configuration": {"chunk_shape": [1, 1, 1, $ly, $lx], "codecs": $inner, "index_codecs": [{"name": "bytes", "configuration": {"endian": "little"}}, {"name": "crc32c"}], "index_location": "end"}}]"""
            else inner
          val gridZ = if (shardZ) m.getInt(3) else 1
          val gridShape = chunks.map(_.mkString(", "))
            .getOrElse(s"1, 1, $gridZ, $ly, $lx")
          writeText(fs, new Path(new Path(root, l.toString), "zarr.json"),
            s"""{"zarr_format": 3, "node_type": "array",
               | "shape": [${shape.mkString(", ")}], "data_type": "uint16",
               | "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [$gridShape]}},
               | "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
               | "fill_value": 0, "codecs": $codecs,
               | "dimension_names": ["t", "c", "z", "y", "x"]}"""
              .stripMargin.replace("\n", ""))
        } else {
          val comp = chunkComp match {
            case "zlib" => """{"id": "zlib", "level": 6}"""
            case "blosc" =>
              """{"id": "blosc", "cname": "zlib", "clevel": 6, "shuffle": 1, "blocksize": 0}"""
            case "blosclz" =>
              """{"id": "blosc", "cname": "blosclz", "clevel": 5, "shuffle": 1, "blocksize": 0}"""
            case "zstd" => """{"id": "zstd", "level": 3}"""
            case _ => "null"
          }
          writeText(fs, new Path(new Path(root, l.toString), ".zarray"),
            s"""{"zarr_format": 2, "shape": [${shape.mkString(", ")}],
               | "chunks": [${chunks.map(_.mkString(", "))
                 .getOrElse(s"1, 1, 1, $ly, $lx")}],
               | "dtype": "<u2", "compressor": $comp, "fill_value": 0,
               | "order": "C", "filters": null, "dimension_separator": "."}"""
              .stripMargin.replace("\n", ""))
        }
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
      val axes =
        """[{"name": "t", "type": "time"}, {"name": "c", "type": "channel"},
          | {"name": "z", "type": "space", "unit": "micrometer"},
          | {"name": "y", "type": "space", "unit": "micrometer"},
          | {"name": "x", "type": "space", "unit": "micrometer"}]"""
          .stripMargin.replace("\n", "")
      if (v3) {
        writeText(fs, new Path(root, "zarr.json"),
          s"""{"zarr_format": 3, "node_type": "group", "attributes":
             | {"ome": {"version": "0.5",
             | "multiscales": [{"name": ${jsonStr(m.getString(10))},
             | "axes": $axes, "datasets": $datasets}],
             | "omero": {"channels": $channels}}}}"""
            .stripMargin.replace("\n", ""))
      } else {
        writeText(fs, new Path(root, ".zgroup"), """{"zarr_format": 2}""")
        writeText(fs, new Path(root, ".zattrs"),
          s"""{"multiscales": [{"version": "0.4", "name": ${jsonStr(m.getString(10))},
             | "axes": $axes,
             | "datasets": $datasets}],
             | "omero": {"channels": $channels}}"""
            .stripMargin.replace("\n", ""))
      }
    }

    // chunk payloads from executor tasks (one file per plane). Pyramid
    // levels chain `downscalePlanes` on the EXPLODED form: each level is
    // one more codegen'd BlockMean2x stage over a narrow projection —
    // linear cost in depth, unlike composing the nested-form downscale2x,
    // whose interpreted HOF tree duplicates subtrees per level and
    // effectively hangs at depth >= 3 (VERDICT r3 #3, SCALE.md lesson 1).
    val szById = spark.sparkContext.broadcast(
      metas.map(m => m.getString(0) -> m.getInt(3)).toMap)
    var planes = OmeOps.explodePlanes(df, column)
    for (l <- 0 until multiscaleLevels) {
      if (shardZ) {
        // one shard per (image, t, c): payload = concatenated encoded
        // planes, then the sz-entry u64-LE index + crc32c (end location).
        // The groupBy keeps the write distributed — shard assembly is one
        // z-run, never a whole image
        planes.select(col("image_id"), col("t"), col("c"), col("z"),
            col("pixels"))
          .groupBy(col("image_id"), col("t"), col("c"))
          .agg(sort_array(collect_list(struct(col("z"), col("pixels"))))
            .as("zs"))
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            it.foreach { r =>
              val id = r.getString(0)
              val dir = if (single) new Path(out, l.toString)
                else new Path(new Path(out, s"$id.zarr"), l.toString)
              val shardPath =
                new Path(dir, s"c/${r.getInt(1)}/${r.getInt(2)}/0/0/0")
              val sz = szById.value(id)
              val offs = Array.fill(sz)(-1L)
              val lens = Array.fill(sz)(-1L)
              val body = new java.io.ByteArrayOutputStream()
              r.getSeq[org.apache.spark.sql.Row](3).foreach { zp =>
                val z = zp.getInt(0)
                val payload = encodeChunk(packU16LE(zp.getSeq[Int](1)), chunkComp)
                offs(z) = body.size().toLong
                lens(z) = payload.length.toLong
                body.write(payload)
              }
              val idx = ByteBuffer.allocate(sz * 16 + 4)
                .order(ByteOrder.LITTLE_ENDIAN)
              for (z <- 0 until sz) { idx.putLong(offs(z)); idx.putLong(lens(z)) }
              val crc = new java.util.zip.CRC32C
              crc.update(idx.array(), 0, sz * 16)
              idx.putInt(crc.getValue.toInt)
              val fs = shardPath.getFileSystem(serConf.value)
              fs.setWriteChecksum(false)
              val os = fs.create(shardPath, true)
              try { os.write(body.toByteArray); os.write(idx.array()) }
              finally os.close()
            }
          }
      } else if (chunks.isEmpty) {
        planes.select(col("image_id"), col("t"), col("c"), col("z"),
            col("size_x"), col("size_y"), col("pixels"))
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            it.foreach { r =>
              val id = r.getString(0)
              val dir = if (single) new Path(out, l.toString)
                else new Path(new Path(out, s"$id.zarr"), l.toString)
              val chunkPath =
                if (v3) new Path(dir, s"c/${r.getInt(1)}/${r.getInt(2)}/${r.getInt(3)}/0/0")
                else new Path(dir, s"${r.getInt(1)}.${r.getInt(2)}.${r.getInt(3)}.0.0")
              val payload = encodeChunk(packU16LE(r.getSeq[Int](6)), chunkComp)
              val fs = chunkPath.getFileSystem(serConf.value)
              fs.setWriteChecksum(false)
              val os = fs.create(chunkPath, true)
              try os.write(payload) finally os.close()
            }
          }
      } else {
        // General chunk grid: each plane contributes one piece per
        // intersected (yg, xg) cell; pieces shuffle ONCE keyed by chunk
        // cell and each chunk file is assembled zero-padded in its
        // writing task. Distributed in the number of chunks — no task
        // ever holds more than one chunk's buffer, so huge-plane stores
        // (the 100 TB case sub-plane chunking exists for) write without
        // any whole-plane-sized allocation beyond the input row itself.
        val Seq(ct, cc2, cz, cy, cx) = chunks.get
        val sp2 = spark
        import sp2.implicits._
        planes.select(col("image_id"), col("t"), col("c"), col("z"),
            col("size_y"), col("size_x"), col("pixels"))
          .as[(String, Int, Int, Int, Int, Int, Seq[Int])]
          .flatMap { case (id, t, ch, z, sy, sx, px) =>
            val nyg = (sy + cy - 1) / cy
            val nxg = (sx + cx - 1) / cx
            val slot = ((t % ct) * cc2 + (ch % cc2)) * cz + (z % cz)
            for (yg <- 0 until nyg; xg <- 0 until nxg) yield {
              val gy = yg * cy; val gx = xg * cx
              val h = math.min(cy, sy - gy); val w = math.min(cx, sx - gx)
              val piece = new Array[Int](h * w)
              var r = 0
              while (r < h) {
                var q = 0
                while (q < w) { piece(r * w + q) = px((gy + r) * sx + gx + q); q += 1 }
                r += 1
              }
              (id, t / ct, ch / cc2, z / cz, yg, xg, slot, h, w, piece.toSeq)
            }
          }
          .toDF("image_id", "tg", "cg", "zg", "yg", "xg", "slot", "h", "w", "px")
          .groupBy(col("image_id"), col("tg"), col("cg"), col("zg"),
            col("yg"), col("xg"))
          .agg(collect_list(struct(col("slot"), col("h"), col("w"),
            col("px"))).as("pieces"))
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            it.foreach { r =>
              val id = r.getString(0)
              val dir = if (single) new Path(out, l.toString)
                else new Path(new Path(out, s"$id.zarr"), l.toString)
              val key = (1 to 5).map(r.getInt)
              val chunkPath =
                if (v3) new Path(dir, "c/" + key.mkString("/"))
                else new Path(dir, key.mkString("."))
              val buf = new Array[Byte](ct * cc2 * cz * cy * cx * 2)
              r.getSeq[org.apache.spark.sql.Row](6).foreach { pc =>
                val base = pc.getInt(0) * cy * cx
                val h = pc.getInt(1); val w = pc.getInt(2)
                val ppx = pc.getSeq[Int](3)
                var rr = 0
                while (rr < h) {
                  var q = 0
                  while (q < w) {
                    val v = ppx(rr * w + q)
                    val o = (base + rr * cx + q) * 2
                    buf(o) = (v & 0xff).toByte
                    buf(o + 1) = ((v >> 8) & 0xff).toByte
                    q += 1
                  }
                  rr += 1
                }
              }
              val payload = encodeChunk(buf, chunkComp)
              val fs = chunkPath.getFileSystem(serConf.value)
              fs.setWriteChecksum(false)
              val os = fs.create(chunkPath, true)
              try os.write(payload) finally os.close()
            }
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

  // --- read -----------------------------------------------------------

  /** `shardT/C/Z` > 0 marks a v3 `sharding_indexed` array: each chunk
    * file is a shard of shardT×shardC×shardZ one-plane inner chunks,
    * with a u64-LE (offset, nbytes) index per inner chunk (missing =
    * all-ones), optionally crc32c-suffixed, at the shard's end/start. */
  private[sources] final case class StoreConfig(store: String, stem: String,
      name: String, st: Int, sc: Int, sz: Int, sy: Int, sx: Int,
      psx: Float, psy: Float, psz: Float, chans: Seq[String],
      comp: String, big: Boolean, u1: Boolean, v3: Boolean, sep: String,
      shardT: Int = 0, shardC: Int = 0, shardZ: Int = 0,
      shardCrc: Boolean = false, shardIdxEnd: Boolean = true,
      shardIdxBig: Boolean = false,
      // chunk grid (arbitrary shapes supported on the non-sharded path);
      // chY/chX of 0 mean "whole plane" (the write default)
      chT: Int = 1, chC: Int = 1, chZ: Int = 1, chY: Int = 0, chX: Int = 0) {
    /** Effective per-axis chunk extents (0 -> whole plane). */
    def cT: Int = math.max(chT, 1)
    def cC: Int = math.max(chC, 1)
    def cZ: Int = math.max(chZ, 1)
    def cY: Int = if (chY <= 0) sy else chY
    def cX: Int = if (chX <= 0) sx else chX
    /** One chunk file = one whole plane (the fast path, no assembly). */
    def planeChunked: Boolean =
      cT == 1 && cC == 1 && cZ == 1 && cY == sy && cX == sx
    /** Chunk y/x extents differ from the plane's — both sub-plane splits
      * AND oversized (padded) extents route through the piece path: a
      * padded chunk's row stride is cX and its slab stride cY*cX, which
      * the whole-plane decoders (strides sx / sy*sx) would silently
      * mis-read. `decodeChunkPieces` handles both via h=min(cY,sy-gy),
      * w=min(cX,sx-gx) over cX-strided rows. */
    def subPlane: Boolean = cY != sy || cX != sx
  }

  /** Parse one store's metadata (driver-side, metadata-scale); detects
    * v3 (`zarr.json` present) vs v2 (`.zarray`/`.zattrs`). */
  private def parseConfig(fs: org.apache.hadoop.fs.FileSystem,
      storePath: String, levelPath: String): StoreConfig = {
    val root = new Path(storePath)
    val v3 = fs.exists(new Path(root, "zarr.json"))
    if (v3) parseConfigV3(fs, root, storePath, levelPath)
    else parseConfigV2(fs, root, storePath, levelPath)
  }

  private def parseConfigV2(fs: org.apache.hadoop.fs.FileSystem, root: Path,
      storePath: String, levelPath: String): StoreConfig = {
    val attrs = readText(fs, new Path(root, ".zattrs"))
    val levelDir = new Path(root, levelPath)
    val zarray = readText(fs, new Path(levelDir, ".zarray"))
    val shape = jsonIntArray(zarray, "shape").getOrElse(
      throw new IllegalArgumentException(s"Zarr: $storePath has no shape"))
    require(shape.length == 5, s"Zarr: expected 5-D TCZYX shape, got $shape")
    val chunks = jsonIntArray(zarray, "chunks").get.map(_.toInt)
    require(chunks.length == 5 && chunks.forall(_ >= 1),
      s"Zarr: chunks must be 5 positive extents (chunks=$chunks)")
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
    require(Set("zlib", "null", "blosc", "zstd", "lzma").contains(compId),
      s"Zarr: compressor '$compId' unsupported (zlib/zstd/blosc/lzma/null)")
    // filters would transform bytes before/after the compressor — we
    // implement none, so anything but null/absent must be rejected
    val filtersSpecified = """"filters"\s*:\s*(?!null)[\[{"]""".r
      .findFirstIn(zarray).isDefined
    require(!filtersSpecified,
      "Zarr: filters are unsupported (store must have \"filters\": null)")
    val scale = scaleForLevel(attrs, levelPath)
    val chanNames = """\{\s*"label"\s*:\s*"((?:[^"\\]|\\.)*)"\s*\}""".r
      .findAllMatchIn(attrs).map(_.group(1)).toSeq
    // zarr 2.11+ writers may nest chunks with "/" (dimension_separator);
    // absent means the spec default "."
    val sep = jsonString(zarray, "dimension_separator").getOrElse(".")
    require(sep == "." || sep == "/",
      s"Zarr: dimension_separator '$sep' unsupported")
    StoreConfig(storePath, root.getName.stripSuffix(".zarr"),
      imageName(attrs).getOrElse(root.getName),
      shape(0).toInt, shape(1).toInt, shape(2).toInt, shape(3).toInt,
      shape(4).toInt, scale(4).toFloat, scale(3).toFloat, scale(2).toFloat,
      chanNames, compId, dtype == ">u2", dtype == "|u1", v3 = false, sep = sep,
      chT = chunks(0), chC = chunks(1), chZ = chunks(2),
      chY = chunks(3), chX = chunks(4))
  }

  private def parseConfigV3(fs: org.apache.hadoop.fs.FileSystem, root: Path,
      storePath: String, levelPath: String): StoreConfig = {
    val attrs = readText(fs, new Path(root, "zarr.json"))
    val arrDoc = readText(fs, new Path(new Path(root, levelPath), "zarr.json"))
    val shape = jsonIntArray(arrDoc, "shape").getOrElse(
      throw new IllegalArgumentException(s"Zarr v3: $storePath has no shape"))
    require(shape.length == 5, s"Zarr: expected 5-D TCZYX shape, got $shape")
    // chunk_shape appears in BOTH the chunk_grid and a sharding codec's
    // configuration — scope the lookup to the chunk_grid object
    val gridObj = jsonValue(arrDoc, "chunk_grid").getOrElse(
      throw new IllegalArgumentException(
        s"Zarr v3: $storePath has no regular chunk_grid"))
    val chunks = jsonIntArray(gridObj, "chunk_shape").getOrElse(
      throw new IllegalArgumentException(
        s"Zarr v3: $storePath chunk_grid has no chunk_shape")).map(_.toInt)
    val dtype = jsonString(arrDoc, "data_type").getOrElse("uint16")
    require(dtype == "uint16" || dtype == "uint8",
      s"Zarr v3: data_type '$dtype' unsupported (uint8/uint16 only)")
    val codecsStr = jsonValue(arrDoc, "codecs").getOrElse(
      throw new IllegalArgumentException(s"Zarr v3: $storePath has no codecs"))
    // detect by the name VALUE, not the first "name" key: a foreign writer
    // may serialize "configuration" (whose inner codecs carry their own
    // "name" keys) before the codec's own "name" — key order is free
    val shardObj = jsonElements(codecsStr).find(_.contains("\"sharding_indexed\""))

    // the per-plane codec chain: the array's own codecs, or — sharded —
    // the sharding configuration's inner codecs
    def chainInfo(chain: String): (String, Boolean) = {
      val names = jsonElements(chain).flatMap(jsonString(_, "name"))
      require(names.contains("bytes"),
        s"Zarr v3: codecs $names lack the required 'bytes' codec")
      val unknown = names.filterNot(Set("bytes", "gzip", "blosc", "zstd"))
      require(unknown.isEmpty,
        s"Zarr v3: codecs ${unknown.mkString(",")} unsupported (bytes/gzip/zstd/blosc)")
      val comp =
        if (names.contains("gzip")) "gzip"
        else if (names.contains("blosc")) "blosc"
        else if (names.contains("zstd")) "zstd"
        else "null"
      (comp, jsonString(chain, "endian").contains("big"))
    }

    val (comp, big, shardDims, shardIdx) = shardObj match {
      case None =>
        require(chunks.length == 5 && chunks.forall(_ >= 1),
          s"Zarr: chunk_shape must be 5 positive extents (chunks=$chunks)")
        val (c, b) = chainInfo(codecsStr)
        (c, b, (0, 0, 0), (false, true, false))
      case Some(obj) =>
        val conf = jsonValue(obj, "configuration").getOrElse(
          throw new IllegalArgumentException(
            s"Zarr v3: sharding codec in $storePath has no configuration"))
        val inner = jsonIntArray(conf, "chunk_shape").getOrElse(
          throw new IllegalArgumentException(
            s"Zarr v3: sharding codec in $storePath has no chunk_shape"))
          .map(_.toInt)
        require(inner == Seq(1, 1, 1, shape(3).toInt, shape(4).toInt),
          s"Zarr: only one-plane inner chunks supported (inner=$inner)")
        require(chunks(3) == shape(3) && chunks(4) == shape(4) &&
          chunks.take(3).forall(_ >= 1),
          s"Zarr: shard shape must cover whole planes (chunks=$chunks)")
        val (c, b) = chainInfo(jsonValue(conf, "codecs").getOrElse(
          throw new IllegalArgumentException(
            s"Zarr v3: sharding codec in $storePath has no inner codecs")))
        val idxCodecs = jsonValue(conf, "index_codecs")
        val crc = idxCodecs.exists(_.contains("crc32c"))
        val idxBig = idxCodecs.exists(jsonString(_, "endian").contains("big"))
        val idxEnd =
          jsonString(conf, "index_location").forall(_ == "end")
        (c, b, (chunks(0), chunks(1), chunks(2)), (crc, idxEnd, idxBig))
    }
    val sep = jsonString(arrDoc, "separator").getOrElse("/")
    require(sep == "/" || sep == ".", s"Zarr v3: separator '$sep' unsupported")
    val scale = scaleForLevel(attrs, levelPath)
    val chanNames = """\{\s*"label"\s*:\s*"((?:[^"\\]|\\.)*)"\s*\}""".r
      .findAllMatchIn(attrs).map(_.group(1)).toSeq
    StoreConfig(storePath, root.getName.stripSuffix(".zarr"),
      imageName(attrs).getOrElse(root.getName),
      shape(0).toInt, shape(1).toInt, shape(2).toInt, shape(3).toInt,
      shape(4).toInt, scale(4).toFloat, scale(3).toFloat, scale(2).toFloat,
      chanNames, comp, big, dtype == "uint8", v3 = true, sep = sep,
      shardT = shardDims._1, shardC = shardDims._2, shardZ = shardDims._3,
      shardCrc = shardIdx._1, shardIdxEnd = shardIdx._2,
      shardIdxBig = shardIdx._3,
      chT = if (shardObj.isEmpty) chunks(0) else 1,
      chC = if (shardObj.isEmpty) chunks(1) else 1,
      chZ = if (shardObj.isEmpty) chunks(2) else 1,
      chY = if (shardObj.isEmpty) chunks(3) else 0,
      chX = if (shardObj.isEmpty) chunks(4) else 0)
  }

  /** All chunk file paths of one store's level (driver-side listing). */
  private def listChunks(fs: org.apache.hadoop.fs.FileSystem,
      c: StoreConfig, levelPath: String): Seq[String] = {
    val levelDir = new Path(new Path(c.store), levelPath)
    if (c.v3 && c.sep == "/") {
      val cDir = new Path(levelDir, "c")
      if (!fs.exists(cDir)) Seq.empty
      else {
        val it = fs.listFiles(cDir, true)
        val buf = Seq.newBuilder[String]
        while (it.hasNext) {
          val f = it.next()
          if (f.isFile) buf += f.getPath.toString
        }
        buf.result()
      }
    } else if (c.v3) { // "." separator: flat "c.t.c.z.y.x" files
      fs.listStatus(levelDir).filter(_.isFile)
        .map(_.getPath).filter(_.getName.matches("""c(\.\d+){5}"""))
        .map(_.toString).toSeq
    } else if (c.sep == "/") { // v2 nested "t/c/z/y/x" files (zarr 2.11+)
      if (!fs.exists(levelDir)) Seq.empty
      else {
        val it = fs.listFiles(levelDir, true)
        val buf = Seq.newBuilder[String]
        while (it.hasNext) {
          val f = it.next()
          // tail match avoids URI-qualification mismatches; recursion is
          // scoped to levelDir so 5 trailing numeric components can only
          // be a chunk key
          if (f.isFile && f.getPath.toString.matches(""".*/\d+(/\d+){4}"""))
            buf += f.getPath.toString
        }
        buf.result()
      }
    } else {
      fs.listStatus(levelDir).filter(_.isFile)
        .map(_.getPath).filter(_.getName.matches("""\d+(\.\d+){4}"""))
        .map(_.toString).toSeq
    }
  }

  /** Decode one chunk (or shard) FILE of store `c` into its
    * `(t, c, z, pixels)` planes — the executor-side kernel shared by the
    * DataFrame read path and the `omezarr` DataSourceV2 reader. */
  private[sources] def decodeChunkFile(c: StoreConfig, p: String,
      raw: Array[Byte]): Seq[(Int, Int, Int, Seq[Int])] = {
    val expect = c.sy * c.sx * (if (c.u1) 1 else 2)

    def toPixels(bytes: Array[Byte]): Seq[Int] = {
      require(bytes.length >= expect,
        s"Zarr chunk $p: ${bytes.length} bytes < expected $expect")
      val px = new Array[Int](c.sy * c.sx)
      if (c.u1) {
        var i = 0; while (i < px.length) { px(i) = bytes(i) & 0xff; i += 1 }
      } else {
        val bb = ByteBuffer.wrap(bytes)
          .order(if (c.big) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < px.length) { px(i) = bb.getShort(i * 2) & 0xffff; i += 1 }
      }
      px.toSeq
    }

    val (t0, c0, z0) = chunkCoords(p)
    if (c.shardT == 0) {
      if (c.planeChunked)
        Seq((t0, c0, z0, toPixels(decodeChunk(raw, c.comp, expect))))
      else {
        // multi-plane chunks with whole-plane y/x extents: slice each
        // contained full plane out of the C-order [t,c,z,y,x] buffer.
        // Sub-plane chunks route through decodeChunkPieces instead.
        require(!c.subPlane,
          s"Zarr chunk $p: sub-plane chunks require the piece path")
        val bpp = if (c.u1) 1 else 2
        val planeBytes = c.sy * c.sx * bpp
        val nSlabs = c.cT * c.cC * c.cZ
        val bytes = decodeChunk(raw, c.comp, nSlabs * planeBytes)
        require(bytes.length >= nSlabs * planeBytes,
          s"Zarr chunk $p: ${bytes.length} bytes < ${nSlabs * planeBytes}")
        for {
          dt <- 0 until c.cT
          dc <- 0 until c.cC
          dz <- 0 until c.cZ
          t = t0 * c.cT + dt
          ch = c0 * c.cC + dc
          z = z0 * c.cZ + dz
          if t < c.st && ch < c.sc && z < c.sz // edge-chunk padding
        } yield {
          val slab = (dt * c.cC + dc) * c.cZ + dz
          (t, ch, z, toPixels(java.util.Arrays.copyOfRange(bytes,
            slab * planeBytes, (slab + 1) * planeBytes)))
        }
      }
    } else {
      // shard file: (t0,c0,z0) are SHARD-grid coords; the index is n
      // u64-LE (offset, nbytes) pairs in t-major inner-grid order,
      // missing chunks all-ones, optionally crc32c'd, at end/start
      val n = c.shardT * c.shardC * c.shardZ
      val idxLen = n * 16 + (if (c.shardCrc) 4 else 0)
      require(raw.length >= idxLen, s"Zarr shard $p: no room for index")
      val idxOff = if (c.shardIdxEnd) raw.length - idxLen else 0
      val bb = ByteBuffer.wrap(raw).order(
        if (c.shardIdxBig) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
      if (c.shardCrc) {
        val crc = new java.util.zip.CRC32C
        crc.update(raw, idxOff, n * 16)
        val stored = bb.getInt(idxOff + n * 16) & 0xffffffffL
        require(crc.getValue == stored,
          s"Zarr shard $p: index crc32c mismatch")
      }
      (0 until n).flatMap { i =>
        val off = bb.getLong(idxOff + i * 16)
        val len = bb.getLong(idxOff + i * 16 + 8)
        if (off == -1L && len == -1L) Seq.empty // missing -> fill
        else {
          require(off >= 0 && len > 0 && off + len <= raw.length,
            s"Zarr shard $p: inner chunk $i out of bounds ($off+$len)")
          val t = t0 * c.shardT + i / (c.shardC * c.shardZ)
          val ch = c0 * c.shardC + (i / c.shardZ) % c.shardC
          val z = z0 * c.shardZ + i % c.shardZ
          if (t >= c.st || ch >= c.sc || z >= c.sz) Seq.empty // edge pad
          else {
            val chunk = java.util.Arrays.copyOfRange(
              raw, off.toInt, (off + len).toInt)
            Seq((t, ch, z, toPixels(decodeChunk(chunk, c.comp, expect))))
          }
        }
      }
    }
  }

  /** (t, c, z) from a chunk path, across both container layouts. */
  private[sources] def chunkCoords(path: String): (Int, Int, Int) = {
    val (t, c, z, _, _) = chunkCoords5(path)
    (t, c, z)
  }

  /** All five chunk-GRID indices from a chunk path. */
  private[sources] def chunkCoords5(path: String): (Int, Int, Int, Int, Int) = {
    val parts = path.split('/')
    val last = parts.last
    if (last.startsWith("c.")) { // v3 "." separator
      val n = last.split("\\.")
      (n(1).toInt, n(2).toInt, n(3).toInt, n(4).toInt, n(5).toInt)
    } else if (last.contains('.')) { // v2 "t.c.z.y.x"
      val n = last.split("\\.")
      (n(0).toInt, n(1).toInt, n(2).toInt, n(3).toInt, n(4).toInt)
    } else { // v3 "/" separator: .../c/<t>/<c>/<z>/<y>/<x>
      val L = parts.length
      (parts(L - 5).toInt, parts(L - 4).toInt, parts(L - 3).toInt,
        parts(L - 2).toInt, parts(L - 1).toInt)
    }
  }

  /**
   * Decode one SUB-PLANE-chunked file into plane pieces
   * `(t, c, z, gy, gx, h, w, pixels)` — `gy/gx` the piece's top-left in
   * the full plane, `pixels` row-major h×w. Planes are then assembled
   * across files by [[assemblePlane]] (distributed: a plane-keyed
   * aggregation in the DataFrame reader; local: per-store in the v2
   * partition reader).
   */
  private[sources] def decodeChunkPieces(c: StoreConfig, p: String,
      raw: Array[Byte]): Seq[(Int, Int, Int, Int, Int, Int, Int, Seq[Int])] = {
    require(c.shardT == 0, s"Zarr chunk $p: pieces only on the non-sharded path")
    val (t0, c0, z0, y0, x0) = chunkCoords5(p)
    val bpp = if (c.u1) 1 else 2
    val gy = y0 * c.cY; val gx = x0 * c.cX
    val h = math.min(c.cY, c.sy - gy)
    val w = math.min(c.cX, c.sx - gx)
    require(h > 0 && w > 0, s"Zarr chunk $p: grid cell outside array shape")
    val chunkPixels = c.cT * c.cC * c.cZ * c.cY * c.cX
    val bytes = decodeChunk(raw, c.comp, chunkPixels * bpp)
    require(bytes.length >= chunkPixels * bpp,
      s"Zarr chunk $p: ${bytes.length} bytes < ${chunkPixels * bpp}")
    val bb = ByteBuffer.wrap(bytes)
      .order(if (c.big) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    for {
      dt <- 0 until c.cT
      dc <- 0 until c.cC
      dz <- 0 until c.cZ
      t = t0 * c.cT + dt
      ch = c0 * c.cC + dc
      z = z0 * c.cZ + dz
      if t < c.st && ch < c.sc && z < c.sz // edge-chunk padding
    } yield {
      val slabBase = ((dt * c.cC + dc) * c.cZ + dz) * c.cY * c.cX
      val px = new Array[Int](h * w)
      var r = 0
      while (r < h) {
        var q = 0
        while (q < w) {
          val idx = slabBase + r * c.cX + q
          px(r * w + q) =
            if (c.u1) bytes(idx) & 0xff else bb.getShort(idx * 2) & 0xffff
          q += 1
        }
        r += 1
      }
      (t, ch, z, gy, gx, h, w, px.toSeq)
    }
  }

  /** Scatter one plane's pieces `(gy, gx, h, w, px)` into a
    * zero-initialized sy×sx plane (missing chunks stay fill_value 0). */
  private[sources] def assemblePlane(c: StoreConfig,
      pieces: Iterator[(Int, Int, Int, Int, Seq[Int])]): Seq[Int] = {
    val out = new Array[Int](c.sy * c.sx)
    pieces.foreach { case (gy, gx, h, w, px) =>
      var r = 0
      while (r < h) {
        var q = 0
        while (q < w) { out((gy + r) * c.sx + gx + q) = px(r * w + q); q += 1 }
        r += 1
      }
    }
    out.toSeq
  }

  /**
   * Shared read core: N stores -> N canonical records in a SINGLE job.
   * Metadata parses driver-side per store, but all chunk files across
   * all stores flow through one `binaryFile` load and one nest shuffle —
   * a 10,000-store corpus is one plan, not 10,000 unioned plans. Missing
   * chunks zero-fill (Zarr fill_value semantics) via the generated-grid
   * left join.
   */
  private def readStores(spark: SparkSession, configs: Seq[StoreConfig],
      chunkPaths: Seq[String]): DataFrame = {
    val sp = spark
    import sp.implicits._
    require(chunkPaths.nonEmpty,
      s"Zarr: no chunk files under ${configs.map(_.store).mkString(", ")}")
    val byStem = configs.map(c => c.stem -> c).toMap
    require(byStem.size == configs.size, "Zarr: duplicate store stems")
    val confB = spark.sparkContext.broadcast(byStem)
    // single-store reads may target a root that doesn't end in ".zarr",
    // where stem extraction from the chunk path can't work — resolve the
    // lone config directly instead
    val loneStem = if (configs.size == 1) configs.head.stem else null

    def stemOf(p: String): String =
      if (loneStem != null) loneStem
      else {
        val parts = p.split('/')
        parts(parts.lastIndexWhere(_.endsWith(".zarr"))).stripSuffix(".zarr")
      }
    val binRows = spark.read.format("binaryFile")
      .load(chunkPaths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    // Sub-plane-chunked stores need their planes assembled across chunk
    // files: one extra plane-keyed aggregation, taken ONLY when such a
    // store is present (known at plan time) so the common layouts keep
    // the single-shuffle plan.
    val anySub = configs.exists(c => c.shardT == 0 && c.subPlane)
    val planeRows =
      if (!anySub)
        binRows.flatMap { case (p, raw) =>
          val stem = stemOf(p)
          decodeChunkFile(confB.value(stem), p, raw)
            .map { case (t, ch, z, px) => (stem, t, ch, z, px) }
        }.toDF("image_id", "t", "c", "z", "pixels")
      else
        binRows.flatMap { case (p, raw) =>
          val stem = stemOf(p)
          val c = confB.value(stem)
          if (c.shardT > 0 || !c.subPlane)
            decodeChunkFile(c, p, raw).map { case (t, ch, z, px) =>
              (stem, t, ch, z, 0, 0, c.sy, c.sx, px)
            }
          else decodeChunkPieces(c, p, raw)
            .map { case (t, ch, z, gy, gx, h, w, px) =>
              (stem, t, ch, z, gy, gx, h, w, px)
            }
        }.groupByKey(r => (r._1, r._2, r._3, r._4))
          .mapGroups { (key, it) =>
            (key._1, key._2, key._3, key._4, assemblePlane(confB.value(key._1),
              it.map(r => (r._5, r._6, r._7, r._8, r._9))))
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

    OmeOps.nestPlanes(filled.join(broadcast(metaFrame(spark, configs)),
      Seq("image_id")))
  }

  /** Per-store (image_id, record_meta) rows, built as expressions over
    * the driver-parsed store configs — no chunk I/O of any kind. */
  private def metaFrame(spark: SparkSession,
      configs: Seq[StoreConfig]): DataFrame = {
    spark.createDataset(configs)(
      org.apache.spark.sql.Encoders.product[StoreConfig]).toDF()
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
  }

  /**
   * Read one OME-Zarr image directory (level `levelPath`, default "0")
   * into a single canonical record — v2 or v3, auto-detected.
   */
  def read(spark: SparkSession, path: String, levelPath: String = "0"): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    require(fs.exists(root), s"No such Zarr store: $path")
    val config = parseConfig(fs, path, levelPath)
    readStores(spark, Seq(config), listChunks(fs, config, levelPath))
  }

  /** Read every `*.zarr` child of a directory, one record each (see
    * [[readStores]] for the single-job layout). */
  def readAll(spark: SparkSession, dir: String, levelPath: String = "0"): DataFrame = {
    val configs = corpusConfigs(spark, dir, levelPath)
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    readStores(spark, configs, configs.flatMap(listChunks(fs, _, levelPath)))
  }

  /**
   * METADATA-ONLY corpus read: canonical records with correct id/name/
   * pixels_meta and EMPTY `planes`, from the stores' JSON documents alone
   * — zero chunk files opened (Zarr keeps metadata in sidecar JSON, so
   * "describe an image lake" needs no pixel I/O at all). The 100 TB
   * analog of the ometiff v2 source's pruned scan, for the container
   * where pruning is free by layout.
   */
  def readMeta(spark: SparkSession, dir: String,
      levelPath: String = "0"): DataFrame = {
    val configs = corpusConfigs(spark, dir, levelPath)
    metaFrame(spark, configs)
      .select(col("record_meta").withField("planes",
        array().cast(org.apache.spark.sql.types.ArrayType(OmeSchema.planeType)))
        .as(OmeSchema.DefaultColumn))
  }

  /** Configs for a path that is either one `.zarr` store or a corpus
    * directory of stores — the DataSourceV2 planning entry. */
  private[sources] def storeConfigs(spark: SparkSession, path: String,
      levelPath: String): Seq[StoreConfig] =
    if (path.toLowerCase.stripSuffix("/").endsWith(".zarr")) {
      val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
      require(fs.exists(new Path(path)), s"No such Zarr store: $path")
      Seq(parseConfig(fs, path, levelPath))
    } else corpusConfigs(spark, path, levelPath)

  /** Chunk/shard files of one store (driver-side listing). */
  private[sources] def chunkFiles(spark: SparkSession, c: StoreConfig,
      levelPath: String): Seq[String] = {
    val fs = new Path(c.store).getFileSystem(spark.sessionState.newHadoopConf())
    listChunks(fs, c, levelPath)
  }

  /**
   * Canonical record from a store config plus decoded planes, zero-
   * filling the full (t,c,z) grid, t-major — the `omezarr` DataSourceV2
   * row path. Metadata semantics MUST match [[metaFrame]] exactly
   * (pinned by the v2-vs-readAll parity test).
   */
  private[sources] def configToRecord(c: StoreConfig,
      decoded: Map[(Int, Int, Int), Seq[Int]],
      withPixels: Boolean): OmeArrowRecord = {
    val names =
      if (c.chans.length == c.sc) c.chans
      else (0 until c.sc).map(i => s"C$i")
    val channels = names.zipWithIndex.map { case (n, i) =>
      OmeChannel(s"ch-$i", n, Some(0.0f), Some(0.0f), Some("Unknown"),
        Some(0xFFFFFFFFL))
    }
    val zeros = Seq.fill(c.sy * c.sx)(0)
    val planes = for {
      t <- 0 until c.st; ch <- 0 until c.sc; z <- 0 until c.sz
    } yield OmePlane(z, t, ch.toShort,
      if (!withPixels) Seq.empty
      else decoded.getOrElse((t, ch, z), zeros))
    OmeArrowRecord(OmeSchema.TagType, OmeSchema.Version, c.stem, c.name,
      new Timestamp(0L),
      OmePixelsMeta(
        if (c.sz > 1) "XYZCT" else "XYCT", "uint16",
        c.sx, c.sy, c.sz, c.sc.toShort, c.st,
        Some(c.psx), Some(c.psy), Some(c.psz),
        Some("µm"), Some("µm"), Some("µm"), channels),
      planes)
  }

  private def corpusConfigs(spark: SparkSession, dir: String,
      levelPath: String): Seq[StoreConfig] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val stores = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.toString).filter(_.endsWith(".zarr"))
    require(stores.nonEmpty, s"No .zarr stores under $dir")
    stores.map(parseConfig(fs, _, levelPath)).toSeq
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
