package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

/**
 * Minimal self-contained TIFF codec (SURVEY.md §7.5) for the subset the
 * reference corpus needs (reference: ingest.py:293-400 reads via BioIO;
 * export.py:116-228 writes via tifffile with zlib default):
 *
 *  - classic TIFF (II/MM), strip-organized, grayscale 8/16-bit,
 *    1 sample/pixel, uncompressed or Deflate/zlib (codes 8 and 32946);
 *  - multi-page (IFD chain) -> multiple planes;
 *  - `ImageDescription` carried verbatim so OME-XML sizes can be parsed.
 *
 * Tiles, palettes, RGB, predictors and exotic codecs are out of scope.
 * Pure JVM (java.util.zip), no external libraries — usable inside
 * executor tasks.
 */
object TiffCodec {

  /** One decoded page: row-major pixel values (already widened to Int)
    * plus the page's ImageDescription if any. */
  final case class Page(width: Int, height: Int, bitsPerSample: Int,
      pixels: Array[Int], description: Option[String])

  private final case class IfdEntry(tag: Int, typ: Int, count: Long, valueOffset: Long)

  // --- decoding -------------------------------------------------------

  def decode(bytes: Array[Byte]): Seq[Page] = {
    require(bytes.length >= 8, "Not a TIFF: too short")
    val order = (bytes(0), bytes(1)) match {
      case (0x49, 0x49) => ByteOrder.LITTLE_ENDIAN
      case (0x4d, 0x4d) => ByteOrder.BIG_ENDIAN
      case _ => throw new IllegalArgumentException("Not a TIFF: bad byte-order mark")
    }
    val buf = ByteBuffer.wrap(bytes).order(order)
    require(buf.getShort(2) == 42, "Not a classic TIFF (magic != 42)")
    var ifdOffset = buf.getInt(4).toLong & 0xffffffffL
    val pages = Seq.newBuilder[Page]
    var guard = 0
    while (ifdOffset != 0 && guard < 65536) {
      val (page, next) = decodeIfd(buf, ifdOffset)
      pages += page
      ifdOffset = next
      guard += 1
    }
    pages.result()
  }

  private def entryValues(buf: ByteBuffer, e: IfdEntry): Array[Long] = {
    val elemSize = e.typ match {
      case 1 | 2 | 6 | 7 => 1 // BYTE/ASCII/SBYTE/UNDEFINED
      case 3 | 8 => 2         // SHORT/SSHORT
      case 4 | 9 | 11 => 4    // LONG/SLONG/FLOAT
      case 5 | 10 | 12 => 8   // RATIONAL/SRATIONAL/DOUBLE
      case t => throw new IllegalArgumentException(s"TIFF type $t unsupported")
    }
    val total = elemSize * e.count
    // a corrupt/hostile count field must not drive the allocation below:
    // out-of-line values have to fit inside the file (fuzz finding r4)
    require(total <= 4 || e.valueOffset + total <= buf.capacity(),
      s"TIFF: entry tag ${e.tag} claims $total value bytes past end of file")
    // values <= 4 bytes are stored inline in the value/offset field
    val base = if (total <= 4) -1L else e.valueOffset
    def at(i: Int): Long = {
      val off = if (base < 0) inlineOffset(e) + i * elemSize else base + i * elemSize
      elemSize match {
        case 1 => buf.get(off.toInt).toLong & 0xffL
        case 2 => buf.getShort(off.toInt).toLong & 0xffffL
        case 4 => buf.getInt(off.toInt).toLong & 0xffffffffL
        case 8 => buf.getInt(off.toInt).toLong & 0xffffffffL // rational numerator
      }
    }
    Array.tabulate(e.count.toInt)(at)
  }

  /** Offset of the inline value area of entry `e` (we stash it when parsing). */
  private def inlineOffset(e: IfdEntry): Long = e.valueOffset

  private def decodeIfd(buf: ByteBuffer, off: Long): (Page, Long) = {
    val n = buf.getShort(off.toInt).toInt & 0xffff
    var entries = Map.empty[Int, IfdEntry]
    var rawDesc: Option[String] = None
    for (i <- 0 until n) {
      val eo = off.toInt + 2 + i * 12
      val tag = buf.getShort(eo).toInt & 0xffff
      val typ = buf.getShort(eo + 2).toInt & 0xffff
      val count = buf.getInt(eo + 4).toLong & 0xffffffffL
      val elemSize = typ match {
        case 1 | 2 | 6 | 7 => 1
        case 3 | 8 => 2
        case 4 | 9 | 11 => 4
        case _ => 8
      }
      val inline = elemSize * count <= 4
      val valueOffset =
        if (inline) (eo + 8).toLong
        else buf.getInt(eo + 8).toLong & 0xffffffffL
      val e = IfdEntry(tag, typ, count, valueOffset)
      entries += tag -> e
      if (tag == 270) { // ImageDescription
        require(valueOffset + count <= buf.capacity(),
          s"TIFF: ImageDescription of $count bytes past end of file")
        val bytes = Array.tabulate(count.toInt)(j =>
          buf.get((valueOffset + j).toInt))
        rawDesc = Some(new String(bytes, "UTF-8").takeWhile(_ != '\u0000'))
      }
    }
    def one(tag: Int, default: => Long): Long =
      entries.get(tag).map(e => entryValues(buf, e)(0)).getOrElse(default)
    def all(tag: Int): Array[Long] =
      entries.get(tag).map(e => entryValues(buf, e)).getOrElse(Array.empty)

    val width = one(256, throw new IllegalArgumentException("TIFF: no ImageWidth")).toInt
    val height = one(257, throw new IllegalArgumentException("TIFF: no ImageLength")).toInt
    require(width > 0 && height > 0 && width.toLong * height <= (1L << 28),
      s"TIFF: implausible plane shape ${width}x$height")
    val bits = one(258, 1L).toInt
    val compression = one(259, 1L).toInt
    val samplesPerPx = one(277, 1L).toInt
    val sampleFormat = one(339, 1L).toInt // 1=unsigned, 2=signed two's complement
    require(samplesPerPx == 1, s"TIFF: only grayscale supported (got $samplesPerPx samples)")
    require(bits == 8 || bits == 16, s"TIFF: only 8/16-bit supported (got $bits)")
    require(compression == 1 || compression == 8 || compression == 32946 ||
      compression == 32773,
      s"TIFF: compression $compression unsupported (none/deflate/packbits only)")

    val stripOffsets = all(273)
    val stripCounts = all(279)
    require(stripOffsets.nonEmpty, "TIFF: no StripOffsets (tiled files unsupported)")
    val raw = new java.io.ByteArrayOutputStream()
    for (i <- stripOffsets.indices) {
      val so = stripOffsets(i).toInt
      val sc = stripCounts(i).toInt
      // copyOfRange would silently zero-pad past EOF -> corrupt pixels
      require(so >= 0 && so + sc <= buf.array().length,
        s"TIFF: strip $i [$so, ${so + sc}) exceeds file size ${buf.array().length} (truncated file?)")
      val strip = java.util.Arrays.copyOfRange(buf.array(), so, so + sc)
      raw.write(compression match {
        case 1 => strip
        case 32773 => unpackBits(strip)
        case _ => inflate(strip)
      })
    }
    val data = raw.toByteArray
    val expected = width * height * (bits / 8)
    require(data.length >= expected,
      s"TIFF: decoded ${data.length} bytes, expected >= $expected")
    val signed = sampleFormat == 2
    val px = new Array[Int](width * height)
    if (bits == 8) {
      var i = 0
      while (i < px.length) {
        px(i) = if (signed) data(i).toInt else data(i) & 0xff
        i += 1
      }
    } else {
      val order = buf.order()
      val db = ByteBuffer.wrap(data).order(order)
      var i = 0
      while (i < px.length) {
        val s = db.getShort(i * 2)
        px(i) = if (signed) s.toInt else s & 0xffff
        i += 1
      }
    }
    val next = buf.getInt(off.toInt + 2 + n * 12).toLong & 0xffffffffL
    (Page(width, height, bits, px, rawDesc), next)
  }

  /** PackBits (compression 32773): runs of literal or repeated bytes. */
  private def unpackBits(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2)
    var i = 0
    while (i < data.length) {
      val n = data(i).toInt
      i += 1
      if (n >= 0) { // n+1 literal bytes
        out.write(data, i, n + 1)
        i += n + 1
      } else if (n != -128) { // next byte repeated 1-n times
        val b = data(i); i += 1
        var k = 1 - n
        while (k > 0) { out.write(b); k -= 1 }
      } // -128: no-op
    }
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val tmp = new Array[Byte](16384)
    while (!inf.finished()) {
      val n = inf.inflate(tmp)
      if (n == 0 && inf.needsInput()) throw new IllegalArgumentException("TIFF: truncated deflate strip")
      out.write(tmp, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  // --- encoding -------------------------------------------------------

  /**
   * Encode grayscale 16-bit pages as a little-endian multi-page TIFF,
   * one Deflate-compressed strip per page, with `description` on the
   * first page (where OME-XML lives in OME-TIFF).
   */
  def encode(pages: Seq[(Int, Int, Array[Int])], description: Option[String] = None,
      deflate: Boolean = true): Array[Byte] = {
    require(pages.nonEmpty, "TIFF encode: no pages")
    val out = new java.io.ByteArrayOutputStream()
    def pad(): Unit = if (out.size() % 2 == 1) out.write(0)

    // header placeholder; patch IFD0 offset later
    out.write(Array[Byte](0x49, 0x49, 42, 0, 0, 0, 0, 0))

    final case class Prepared(width: Int, height: Int, dataOffset: Int,
      dataLen: Int, descOffset: Int, descLen: Int)
    val prepared = pages.zipWithIndex.map { case ((w, h, px), idx) =>
      require(px.length == w * h, s"page $idx: ${px.length} pixels != $w*$h")
      val bytes = new Array[Byte](px.length * 2)
      var i = 0
      while (i < px.length) {
        bytes(i * 2) = (px(i) & 0xff).toByte
        bytes(i * 2 + 1) = ((px(i) >> 8) & 0xff).toByte
        i += 1
      }
      val strip = if (deflate) deflateBytes(bytes) else bytes
      pad()
      val dataOffset = out.size()
      out.write(strip)
      val (descOffset, descLen) = if (idx == 0 && description.isDefined) {
        pad()
        val d = (description.get + "\u0000").getBytes("UTF-8")
        val o = out.size()
        out.write(d)
        (o, d.length)
      } else (0, 0)
      Prepared(w, h, dataOffset, strip.length, descOffset, descLen)
    }

    // IFD chain
    var ifdOffsets = Vector.empty[Int]
    prepared.foreach { p =>
      pad()
      ifdOffsets :+= out.size()
      val nEntries = if (p.descLen > 0) 9 else 8
      val ifd = ByteBuffer.allocate(2 + nEntries * 12 + 4).order(ByteOrder.LITTLE_ENDIAN)
      ifd.putShort(nEntries.toShort)
      def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
        ifd.putShort(tag.toShort); ifd.putShort(typ.toShort)
        ifd.putInt(count)
        if (typ == 3 && count == 1) { ifd.putShort(value.toShort); ifd.putShort(0) }
        else ifd.putInt(value)
      }
      entry(256, 4, 1, p.width)                       // ImageWidth
      entry(257, 4, 1, p.height)                      // ImageLength
      entry(258, 3, 1, 16)                            // BitsPerSample
      entry(259, 3, 1, if (deflate) 8 else 1)         // Compression
      entry(262, 3, 1, 1)                             // Photometric: BlackIsZero
      if (p.descLen > 0) entry(270, 2, p.descLen, p.descOffset) // ImageDescription
      entry(273, 4, 1, p.dataOffset)                  // StripOffsets
      entry(278, 4, 1, p.height)                      // RowsPerStrip
      entry(279, 4, 1, p.dataLen)                     // StripByteCounts
      ifd.putInt(0) // next-IFD placeholder, patched below
      out.write(ifd.array())
    }

    val bytes = out.toByteArray
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, ifdOffsets.head)
    // patch next-IFD pointers
    for (i <- ifdOffsets.indices.dropRight(1)) {
      val off = ifdOffsets(i)
      val n = bb.getShort(off).toInt & 0xffff
      bb.putInt(off + 2 + n * 12, ifdOffsets(i + 1))
    }
    bytes
  }

  private def deflateBytes(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(6)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val tmp = new Array[Byte](16384)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }
}
