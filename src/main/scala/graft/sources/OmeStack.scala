package graft.sources

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.OmeOps
import graft.schema._

/**
 * Filename-pattern stack ingest (reference: ingest.py:403-692
 * `from_stack_pattern_path`): a Bio-Formats-style pattern over a directory
 * of single-plane (or Z-stack) TIFFs assembles one OME-Arrow record.
 *
 * Grammar (faithful to the reference):
 *  - `<a-b[:step]>` numeric ranges, zero-padded to the wider endpoint
 *    (ingest.py:436-451); `<x,y,z>` comma alternation (438-440);
 *  - the dimension of a bracket comes from the letters immediately before
 *    it via the synonym table {C: c,ch,w,wavelength; T: t,tl,tp,timepoint;
 *    Z: z,zs,sec,fp,focal,focalplane; S: s,sp,series} (418-423), falling
 *    back to `defaultDim` (494-496); S remaps via `mapSeriesTo` (508-511);
 *  - coordinates are the POSITION of the matched choice, not its numeric
 *    value (503-516); sizes are max+1 over matched keys (534-536);
 *  - literal (non-numeric) channel alternations become channel names
 *    (519-524); missing (t,c,z) cells are zero-filled (584-589);
 *  - a non-bracket pattern is a filename regex; matches sort into Z
 *    (482-486, 527-529);
 *  - a matched file holding a Z-stack (T=C=1, multiple pages) expands in
 *    place and grows size_z (629-645); pages across T/C inside one file
 *    are rejected (646-655).
 *
 * Execution shape: pattern expansion and file listing are driver-side
 * metadata work; decoding fans out over executors via `binaryFile`; the
 * zero-fill is a generated-grid LEFT JOIN against decoded planes (the
 * reference's dict-probe loop as an actual outer join, SURVEY.md §7.3).
 */
object OmeStack {

  private val DimTokens: Map[Char, Set[String]] = Map(
    'C' -> Set("c", "ch", "w", "wavelength"),
    'T' -> Set("t", "tl", "tp", "timepoint"),
    'Z' -> Set("z", "zs", "sec", "fp", "focal", "focalplane"),
    'S' -> Set("s", "sp", "series"))

  private val NumRange = """^(\d+)-(\d+)(?::(\d+))?$""".r

  private[graft] final case class Placeholder(
      idx: Int, choices: Seq[String], dim: Char, isNumeric: Boolean)

  private[graft] def detectDim(before: String): Option[Char] =
    """([A-Za-z]+)$""".r.findFirstIn(before).flatMap { token =>
      val t = token.toLowerCase
      DimTokens.collectFirst { case (d, names) if names(t) => d }
    }

  private[graft] def expandRawToken(raw0: String): (Seq[String], Boolean) = {
    val raw = raw0.trim
    if (raw.contains(",") && NumRange.findFirstIn(raw).isEmpty) {
      val parts = raw.split(",", -1).map(_.trim).toSeq
      (parts, parts.forall(p => p.nonEmpty && p.forall(_.isDigit)))
    } else raw match {
      case NumRange(a, b, step) =>
        val st = Option(step).map(_.toInt).getOrElse(1)
        require(b.toInt >= a.toInt, s"Inverted range not supported: <$raw>")
        val width = math.max(a.length, b.length)
        val nums = (a.toInt to b.toInt by st)
          .map(v => v.toString.reverse.padTo(width, '0').reverse.mkString)
        (nums, true)
      case _ => (Seq(raw), raw.nonEmpty && raw.forall(_.isDigit))
    }
  }

  /** Pattern -> (template with {i} slots, placeholders). */
  private[graft] def parseBracketPattern(s: String): (String, Seq[Placeholder]) = {
    val out = new StringBuilder
    val phs = Seq.newBuilder[Placeholder]
    var i = 0; var phIdx = 0
    while (i < s.length) {
      if (s(i) == '<') {
        val j = s.indexOf('>', i + 1)
        require(j >= 0, "Unclosed '<' in pattern.")
        val (choices, isNum) = expandRawToken(s.substring(i + 1, j))
        val dim = detectDim(out.toString()).getOrElse('?')
        phs += Placeholder(phIdx, choices, dim, isNum)
        out.append(s"{$phIdx}")
        phIdx += 1
        i = j + 1
      } else { out.append(s(i)); i += 1 }
    }
    (out.toString(), phs.result())
  }

  private def fillTemplate(template: String, combo: Seq[String]): String =
    combo.zipWithIndex.foldLeft(template) { case (acc, (v, i)) =>
      acc.replace(s"{$i}", v)
    }

  /**
   * Assemble one record from a pattern path. Returns a single-row
   * DataFrame with the canonical `ome_arrow` column.
   */
  def readPattern(spark: SparkSession, patternPath: String,
      defaultDim: String = "C", mapSeriesTo: String = "T",
      channelNames: Seq[String] = Nil,
      imageId: Option[String] = None, name: Option[String] = None): DataFrame = {
    val sp = spark
    import sp.implicits._

    val lastSlash = patternPath.lastIndexOf('/')
    val folder = if (lastSlash >= 0) patternPath.substring(0, lastSlash) else "."
    val line = patternPath.substring(lastSlash + 1).trim
    require(line.nonEmpty, "Pattern path string is empty or malformed")

    val conf = spark.sessionState.newHadoopConf()
    val folderPath = new Path(folder)
    val fs = folderPath.getFileSystem(conf)
    val fileNames: Set[String] = fs.listStatus(folderPath)
      .filter(_.isFile).map(_.getPath.getName).toSet

    var literalChannelNames: Seq[String] = Nil
    val matched: Map[(Int, Int, Int), String] =
      if (line.contains("<") && line.contains(">")) {
        val (template, phs0) = parseBracketPattern(line)
        val phs = phs0.map(p =>
          if (p.dim == '?') p.copy(dim = defaultDim.toUpperCase.head) else p)
        literalChannelNames = phs.find { p =>
          val eff = if (p.dim == 'S') mapSeriesTo.toUpperCase.headOption.getOrElse('S')
                    else p.dim
          eff == 'C' && !p.isNumeric
        }.map(_.choices).getOrElse(Nil)
        val combos = phs.map(_.choices.zipWithIndex)
          .foldLeft(Seq(Seq.empty[(String, Int)])) { (acc, cs) =>
            acc.flatMap(prefix => cs.map(prefix :+ _))
          }
        combos.flatMap { combo =>
          val fname = fillTemplate(template, combo.map(_._1))
          if (!fileNames(fname)) None
          else {
            var t = 0; var c = 0; var z = 0
            phs.zip(combo).foreach { case (ph, (_, idx)) =>
              val dim = if (ph.dim == 'S') {
                require(mapSeriesTo.nonEmpty,
                  "Encountered 'series' but mapSeriesTo is empty")
                mapSeriesTo.toUpperCase.head
              } else ph.dim
              dim match {
                case 'T' => t = idx
                case 'C' => c = idx
                case 'Z' => z = idx
                case _ => ()
              }
            }
            Some((t, c, z) -> s"$folder/$fname")
          }
        }.toMap
      } else {
        val re = line.r
        fileNames.toSeq.filter(n => re.pattern.matcher(n).matches()).sorted
          .zipWithIndex.map { case (n, z) => (0, 0, z) -> s"$folder/$n" }.toMap
      }
    require(matched.nonEmpty, s"No files matched pattern: $patternPath")

    val sizeT = matched.keys.map(_._1).max + 1
    val sizeC = matched.keys.map(_._2).max + 1
    val sizeZ0 = matched.keys.map(_._3).max + 1
    require(channelNames.isEmpty || channelNames.length == sizeC,
      s"channelNames length ${channelNames.length} != size_c $sizeC")
    val chanNames =
      if (channelNames.nonEmpty) channelNames
      else if (literalChannelNames.nonEmpty) literalChannelNames
      else (0 until sizeC).map(i => s"C$i")

    // ---- distributed decode: (t,c,z,path) fan-out over binaryFile ----
    val coordByPath = matched.map { case (k, p) => normalize(fs, conf, p) -> k }
    val coordB = spark.sparkContext.broadcast(coordByPath)
    val bin = spark.read.format("binaryFile")
      .load(matched.values.toSeq.distinct: _*)
      .select(col("path"), col("modificationTime"), col("content"))
      .as[(String, Timestamp, Array[Byte])]
    // one file -> 1..n planes ((z grows for in-file Z-stacks, ingest.py:629-645)
    val planeRows = bin.flatMap { case (p, _, bytes) =>
      val (t, c, z) = coordB.value(p)
      val pages = TiffCodec.decode(bytes)
      val xml = pages.head.description.filter(OmeXml.looksLikeOme).flatMap(OmeXml.parse)
      val (pt, pc, pz) = xml.map(m => (m.sizeT max 1, m.sizeC max 1, m.sizeZ max 1))
        .getOrElse((1, 1, pages.length))
      if (pt > 1 || pc > 1) throw new IllegalArgumentException(
        s"$p contains multiple pages across T/C=($pt,$pc); only Z>1 with " +
          "T=C=1 is supported inside one file. Express T/C via the pattern.")
      pages.zipWithIndex.map { case (page, zi) =>
        require(page.samples == 1, s"$p: multi-sample (RGB) pages are not " +
          "stackable by pattern — channels must come from the pattern's C axis")
        (t, c, z + zi, page.width, page.height,
          page.pixels.toSeq.map(v => math.min(math.max(v, 0), 65535)))
      }
    }.toDF("t", "c", "z", "sx", "sy", "pixels")
      // the shape probe below and the final nest are separate actions;
      // persist so files are downloaded and decoded exactly once
      .transform(graft.operators.Caches.persist(_))

    val shapes = planeRows.select(col("sx"), col("sy"), col("z")).distinct().collect()
    val sx = shapes.map(_.getInt(0)).distinct
    val sy = shapes.map(_.getInt(1)).distinct
    require(sx.length == 1 && sy.length == 1,
      s"Shape mismatch across matched files: X=${sx.mkString(",")} Y=${sy.mkString(",")}")
    val sizeZ = math.max(sizeZ0, shapes.map(_.getInt(2)).max + 1)
    val (sizeX, sizeY) = (sx(0), sy(0))

    // physical sizes from the first matched file's OME-XML (probe,
    // ingest.py:545-571) — fall back to 1.0
    val samplePath = matched(matched.keys.min)
    val sampleXml = {
      val in = fs.open(new Path(samplePath))
      val bytes = try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](65536)
        var n = in.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toByteArray
      } finally in.close()
      TiffCodec.decode(bytes).head.description
        .filter(OmeXml.looksLikeOme).flatMap(OmeXml.parse)
    }
    val (psx, psy, psz) = (
      sampleXml.flatMap(_.physicalSizeX).getOrElse(1.0f),
      sampleXml.flatMap(_.physicalSizeY).getOrElse(1.0f),
      sampleXml.flatMap(_.physicalSizeZ).getOrElse(1.0f))

    // ---- zero-fill: generated grid LEFT JOIN decoded planes ----
    val grid = spark.range(sizeT.toLong * sizeC * sizeZ).select(
      (col("id") / (sizeC * sizeZ)).cast("int").as("t"),
      ((col("id") / sizeZ) % sizeC).cast("int").as("c"),
      (col("id") % sizeZ).cast("int").as("z"))
    val filled = grid.join(planeRows.select(col("t"), col("c"), col("z"), col("pixels")),
        Seq("t", "c", "z"), "left")
      .select(col("t"), col("c"), col("z"),
        coalesce(col("pixels"), array_repeat(lit(0), sizeX * sizeY)).as("pixels"))

    val stem = line.replaceAll("(?i)\\.ome\\.tiff?$|\\.tiff?$", "")
    val channelsExpr = array(chanNames.zipWithIndex.map { case (n, i) =>
      struct(lit(s"ch-$i").as("id"), lit(n).as("name"),
        lit(0.0f).as("emission_um"), lit(0.0f).as("excitation_um"),
        lit("Unknown").as("illumination"), lit(0xFFFFFFFFL).as("color_rgba"))
    }: _*)
    val pixelsMeta = struct(
      lit(if (sizeZ > 1) "XYZCT" else "XYCT").as("dimension_order"),
      lit("uint16").as("type"),
      lit(sizeX).as("size_x"), lit(sizeY).as("size_y"), lit(sizeZ).as("size_z"),
      lit(sizeC).cast("short").as("size_c"), lit(sizeT).as("size_t"),
      lit(psx).as("physical_size_x"), lit(psy).as("physical_size_y"),
      lit(psz).as("physical_size_z"),
      lit("µm").as("physical_size_x_unit"), lit("µm").as("physical_size_y_unit"),
      lit("µm").as("physical_size_z_unit"),
      channelsExpr.as("channels"))
    val recordMeta = struct(
      lit(OmeSchema.TagType).as("type"), lit(OmeSchema.Version).as("version"),
      lit(imageId.getOrElse(stem)).as("id"),
      lit(name.getOrElse(patternPath)).as("name"),
      lit(new Timestamp(0L)).cast("timestamp").as("acquisition_datetime"),
      pixelsMeta.as("pixels_meta"))
    // materialize the single assembled record eagerly so the cached
    // decoded planes can be released before returning (persist would
    // otherwise leak across calls in a long-lived session)
    val assembled = OmeOps.nestPlanes(filled
      .withColumn("image_id", lit(imageId.getOrElse(stem)))
      .withColumn("record_meta", recordMeta)
      .select(col("image_id"), col("record_meta"),
        col("t"), col("c"), col("z"), col("pixels")))
      .localCheckpoint()
    planeRows.unpersist()
    assembled
  }

  private def normalize(fs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration, p: String): String =
    fs.makeQualified(new Path(p)).toString
}
