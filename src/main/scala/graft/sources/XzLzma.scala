package graft.sources

/**
 * Pure-JVM XZ / LZMA decoder for TIFF compression 34925 (what
 * tifffile/imagecodecs emit via liblzma — an XZ stream of LZMA2 chunks)
 * and the legacy 13-byte-header "LZMA alone" container. Decode only —
 * the library never writes lzma (matching the reference, whose export
 * is a tifffile passthrough, export.py:123).
 *
 * Written from the public format specifications: the LZMA range-coder
 * and state machine follow the 7-Zip reference description (LzmaSpec,
 * public domain), LZMA2's chunk framing and the XZ stream/block layout
 * follow the published .xz file-format spec. Golden-tested byte-exact
 * against streams produced by liblzma (python stdlib `lzma`), checked
 * in under src/test/resources/lzma.
 *
 * Scale/robustness notes: every decode takes an explicit `maxOut`
 * bound derived from the caller's geometry (TIFF strip size), so a
 * hostile stream cannot over-allocate; all integer arithmetic is
 * uint32-faithful (wrapping Int ops + unsigned compares). Integrity
 * checks (CRC32/CRC64/SHA-256 trailers) are SKIPPED by length — the
 * pixel-level oracles downstream are the integrity check this library
 * actually relies on.
 */
object XzLzma {

  /** Sniff the container (XZ magic vs alone header) and decode. */
  def decode(src: Array[Byte], maxOut: Int): Array[Byte] =
    if (src.length >= 6 && (src(0) & 0xff) == 0xfd && src(1) == '7' &&
        src(2) == 'z' && src(3) == 'X' && src(4) == 'Z' && src(5) == 0)
      decodeXz(src, maxOut)
    else decodeAlone(src, maxOut)

  // ---- XZ container ---------------------------------------------------

  def decodeXz(src: Array[Byte], maxOut: Int): Array[Byte] = {
    require(src.length >= 12, "xz: truncated stream header")
    require((src(0) & 0xff) == 0xfd && src(1) == '7' && src(2) == 'z' &&
      src(3) == 'X' && src(4) == 'Z' && src(5) == 0, "xz: bad magic")
    val checkId = src(7) & 0x0f
    val checkSize = checkId match {
      case 0 => 0
      case 1 => 4   // CRC32
      case 4 => 8   // CRC64
      case 10 => 32 // SHA-256
      case c => throw new IllegalArgumentException(s"xz: check id $c unsupported")
    }
    val out = new java.io.ByteArrayOutputStream(math.min(maxOut, 1 << 20))
    var p = 12
    var done = false
    while (!done) {
      require(p < src.length, "xz: truncated before index")
      val hs = src(p) & 0xff
      if (hs == 0) done = true // index indicator: all blocks decoded
      else {
        val headerSize = (hs + 1) * 4
        val blockStart = p
        var q = p + 1
        val flags = src(q) & 0xff; q += 1
        val numFilters = (flags & 3) + 1
        def varint(): Long = {
          var v = 0L; var shift = 0; var b = 0x80
          while ((b & 0x80) != 0) {
            require(q < src.length, "xz: truncated varint")
            b = src(q) & 0xff; q += 1
            v |= (b & 0x7fL) << shift; shift += 7
            require(shift <= 63, "xz: varint overflow")
          }
          v
        }
        if ((flags & 0x40) != 0) varint() // compressed size (unused)
        if ((flags & 0x80) != 0) varint() // uncompressed size (unused)
        for (_ <- 0 until numFilters) {
          val id = varint()
          val propsSize = varint()
          require(id == 0x21,
            s"xz: filter 0x${id.toHexString} unsupported (LZMA2 only — " +
              "BCJ/delta chains do not appear in TIFF strips)")
          q += propsSize.toInt // dict-size byte: window is the full output
        }
        require(q <= blockStart + headerSize, "xz: block header overflow")
        p = blockStart + headerSize // skips padding + header CRC32
        val (consumed) = decodeLzma2(src, p, out, maxOut)
        p += consumed
        p += (4 - (consumed % 4)) % 4 // block padding
        p += checkSize
      }
    }
    out.toByteArray
  }

  // ---- LZMA2 chunk layer ----------------------------------------------

  /** Decode an LZMA2 chunk sequence starting at `off`; returns bytes
    * consumed (through the 0x00 end marker). Output appends to `out`. */
  private def decodeLzma2(src: Array[Byte], off: Int,
      out: java.io.ByteArrayOutputStream, maxOut: Int): Int = {
    var p = off
    // the dictionary is the whole decoded block; dictStart tracks the
    // most recent dict reset so position contexts match the spec
    val window = new java.io.ByteArrayOutputStream(math.min(maxOut, 1 << 20))
    var dictStart = 0
    var dec: LzmaDecoder = null
    var needReset = false // spec: LZMA state must reset after an uncompressed chunk
    var done = false
    def u16(i: Int): Int = ((src(i) & 0xff) << 8) | (src(i + 1) & 0xff)
    while (!done) {
      require(p < src.length, "lzma2: truncated chunk stream")
      val control = src(p) & 0xff; p += 1
      if (control == 0x00) done = true
      else if (control == 0x01 || control == 0x02) {
        // uncompressed chunk (0x01 = with dict reset)
        val size = u16(p) + 1; p += 2
        require(p + size <= src.length, "lzma2: truncated uncompressed chunk")
        require(window.size() + size <= maxOut,
          s"lzma2: output exceeds bound $maxOut")
        if (control == 0x01) dictStart = window.size()
        window.write(src, p, size)
        p += size
        needReset = true
      } else {
        require(control >= 0x80, s"lzma2: bad control byte $control")
        val unpackSize = ((control & 0x1f) << 16) + u16(p) + 1; p += 2
        val packSize = u16(p) + 1; p += 2
        val mode = (control >> 5) & 3
        if (mode >= 2) { // new props byte
          val props = src(p) & 0xff; p += 1
          require(props < 9 * 5 * 5, s"lzma2: bad props $props")
          val lc = props % 9
          val lp = (props / 9) % 5
          val pb = props / 45
          dec = new LzmaDecoder(lc, lp, pb)
        } else if (mode == 1) {
          require(dec != null, "lzma2: state reset before any props")
          dec = new LzmaDecoder(dec.lc, dec.lp, dec.pb)
        } else {
          require(dec != null && !needReset,
            "lzma2: chunk continues a state the spec requires reset")
        }
        needReset = false
        if (mode == 3) dictStart = window.size()
        require(p + packSize <= src.length, "lzma2: truncated chunk data")
        require(window.size() + unpackSize <= maxOut,
          s"lzma2: output exceeds bound $maxOut")
        dec.decodeChunk(src, p, packSize, window, dictStart, unpackSize)
        p += packSize
      }
    }
    out.write(window.toByteArray)
    p - off
  }

  // ---- LZMA alone container -------------------------------------------

  /** 13-byte-header legacy container: props, dictSize u32le, size u64le
    * (-1 = unknown, terminated by the end marker). */
  def decodeAlone(src: Array[Byte], maxOut: Int): Array[Byte] = {
    require(src.length >= 13, "lzma: truncated alone header")
    val props = src(0) & 0xff
    require(props < 9 * 5 * 5, s"lzma: bad props byte $props")
    var size = 0L
    for (i <- 0 until 8) size |= (src(5 + i) & 0xffL) << (8 * i)
    val known = size != -1L
    require(!known || size <= maxOut,
      s"lzma: declared size $size exceeds bound $maxOut")
    val limit = if (known) size.toInt else maxOut
    val dec = new LzmaDecoder(props % 9, (props / 9) % 5, props / 45)
    val window = new java.io.ByteArrayOutputStream(math.min(limit, 1 << 20))
    dec.decodeStream(src, 13, src.length - 13, window, limit,
      stopAtMarker = !known)
    window.toByteArray
  }

  // ---- core LZMA ------------------------------------------------------

  /**
   * One LZMA probability-model + state-machine instance. uint32
   * semantics ride on wrapping Int arithmetic with unsigned compares.
   * The range coder re-initializes per LZMA2 chunk; the model persists
   * until an explicit reset (a fresh instance).
   */
  private final class LzmaDecoder(val lc: Int, val lp: Int, val pb: Int) {
    private val pbMask = (1 << pb) - 1
    private val lpMask = (1 << lp) - 1

    private def probs(n: Int) = Array.fill(n)(1024)
    private val isMatch = probs(12 << 4)
    private val isRep = probs(12)
    private val isRepG0 = probs(12)
    private val isRepG1 = probs(12)
    private val isRepG2 = probs(12)
    private val isRep0Long = probs(12 << 4)
    private val posSlot = Array.fill(4)(probs(64))
    private val specPos = probs(115)
    private val align = probs(16)
    private val literal = probs(0x300 << (lc + lp))
    // len decoders: choice, choice2, low[16][8], mid[16][8], high[256]
    private val lenChoice = probs(2)
    private val lenLow = Array.fill(16)(probs(8))
    private val lenMid = Array.fill(16)(probs(8))
    private val lenHigh = probs(256)
    private val repChoice = probs(2)
    private val repLow = Array.fill(16)(probs(8))
    private val repMid = Array.fill(16)(probs(8))
    private val repHigh = probs(256)

    private var state = 0
    private var rep0 = 0
    private var rep1 = 0
    private var rep2 = 0
    private var rep3 = 0

    // range decoder (re-initialized per chunk)
    private var range = 0
    private var code = 0
    private var pos = 0
    private var end = 0
    private var data: Array[Byte] = _

    private def initRange(src: Array[Byte], off: Int, len: Int): Unit = {
      data = src; pos = off; end = off + len
      require(len >= 5 && src(off) == 0, "lzma: bad range-coder header")
      range = 0xffffffff
      code = 0
      var i = 1
      while (i <= 4) { code = (code << 8) | (data(off + i) & 0xff); i += 1 }
      pos = off + 5
    }

    private def nextByte(): Int = {
      require(pos < end, "lzma: truncated chunk")
      val b = data(pos) & 0xff; pos += 1; b
    }

    private def normalize(): Unit =
      if (Integer.compareUnsigned(range, 1 << 24) < 0) {
        range = range << 8
        code = (code << 8) | nextByte()
      }

    private def bit(p: Array[Int], i: Int): Int = {
      val prob = p(i)
      val bound = (range >>> 11) * prob // wraps like uint32 by design
      if (Integer.compareUnsigned(code, bound) < 0) {
        range = bound
        p(i) = prob + ((2048 - prob) >> 5)
        normalize(); 0
      } else {
        range = range - bound
        code = code - bound
        p(i) = prob - (prob >> 5)
        normalize(); 1
      }
    }

    private def directBits(n: Int): Int = {
      var res = 0
      var i = n
      while (i > 0) {
        range = range >>> 1
        code = code - range
        val t = 0 - (code >>> 31) // all-ones when the subtract borrowed
        code = code + (range & t)
        normalize()
        res = (res << 1) + t + 1
        i -= 1
      }
      res
    }

    private def bitTree(p: Array[Int], nbits: Int): Int = {
      var m = 1
      var i = 0
      while (i < nbits) { m = (m << 1) + bit(p, m); i += 1 }
      m - (1 << nbits)
    }

    private def bitTreeReverse(p: Array[Int], base: Int, nbits: Int): Int = {
      var m = 1
      var sym = 0
      var i = 0
      while (i < nbits) {
        val b = bit(p, base + m)
        m = (m << 1) + b
        sym |= b << i
        i += 1
      }
      sym
    }

    private def lenDecode(choice: Array[Int], low: Array[Array[Int]],
        mid: Array[Array[Int]], high: Array[Int], posState: Int): Int =
      if (bit(choice, 0) == 0) bitTree(low(posState), 3)
      else if (bit(choice, 1) == 0) 8 + bitTree(mid(posState), 3)
      else 16 + bitTree(high, 8)

    /** dist for a new match; 0xFFFFFFFF (as Int -1) is the end marker. */
    private def decodeDistance(lenValue: Int): Int = {
      val lenState = math.min(lenValue, 3)
      val slot = bitTree(posSlot(lenState), 6)
      if (slot < 4) slot
      else {
        val nd = (slot >> 1) - 1
        var dist = (2 | (slot & 1)) << nd
        if (slot < 14) dist += bitTreeReverse(specPos, dist - slot, nd)
        else {
          dist += directBits(nd - 4) << 4
          dist += bitTreeReverse(align, 0, 4)
        }
        dist
      }
    }

    /** Decode exactly `unpackLen` bytes into `window` (LZMA2 chunk —
      * markerless). */
    def decodeChunk(src: Array[Byte], off: Int, len: Int,
        window: java.io.ByteArrayOutputStream, dictStart: Int,
        unpackLen: Int): Unit =
      run(src, off, len, window, dictStart, unpackLen, stopAtMarker = false)

    /** Decode up to `limit` bytes or the end marker (alone format). */
    def decodeStream(src: Array[Byte], off: Int, len: Int,
        window: java.io.ByteArrayOutputStream, limit: Int,
        stopAtMarker: Boolean): Unit =
      run(src, off, len, window, 0, limit, stopAtMarker)

    private def run(src: Array[Byte], off: Int, len: Int,
        winStream: java.io.ByteArrayOutputStream, dictStart: Int,
        unpackLen: Int, stopAtMarker: Boolean): Unit = {
      initRange(src, off, len)
      // window access needs random reads: keep a growing array view
      var win = winStream.toByteArray
      var wpos = win.length
      val target = wpos + unpackLen
      val buf = new Array[Byte](unpackLen)
      var bpos = 0
      def wByte(i: Int): Int =
        (if (i >= win.length) buf(i - win.length) else win(i)) & 0xff
      def put(b: Int): Unit = { buf(bpos) = b.toByte; bpos += 1; wpos += 1 }
      var done = false
      while (!done && wpos < target) {
        val posState = (wpos - dictStart) & pbMask
        if (bit(isMatch, (state << 4) + posState) == 0) {
          // literal
          val prev = if (wpos > dictStart) wByte(wpos - 1) else 0
          val litState =
            (((wpos - dictStart) & lpMask) << lc) + (prev >>> (8 - lc))
          val base = 0x300 * litState
          var sym = 1
          if (state >= 7) {
            var matchByte = wByte(wpos - rep0 - 1)
            var break = false
            while (!break && sym < 0x100) {
              val matchBit = (matchByte >> 7) & 1
              matchByte = (matchByte << 1) & 0xff
              val b = bit(literal, base + ((1 + matchBit) << 8) + sym)
              sym = (sym << 1) | b
              if (matchBit != b) break = true
            }
          }
          while (sym < 0x100) sym = (sym << 1) | bit(literal, base + sym)
          put(sym & 0xff)
          state = if (state < 4) 0 else if (state < 10) state - 3 else state - 6
        } else {
          var len0 = 0
          if (bit(isRep, state) == 0) { // new match
            rep3 = rep2; rep2 = rep1; rep1 = rep0
            len0 = lenDecode(lenChoice, lenLow, lenMid, lenHigh, posState)
            state = if (state < 7) 7 else 10
            val dist = decodeDistance(len0)
            if (dist == -1) { // 0xFFFFFFFF: end marker
              require(stopAtMarker, "lzma: unexpected end marker")
              done = true
            } else {
              rep0 = dist
              require(Integer.compareUnsigned(rep0, wpos - dictStart) < 0,
                "lzma: match distance reaches before dictionary start")
            }
          } else { // rep match
            if (bit(isRepG0, state) == 0) {
              if (bit(isRep0Long, (state << 4) + posState) == 0) {
                // short rep: single byte at rep0
                state = if (state < 7) 9 else 11
                put(wByte(wpos - rep0 - 1))
                len0 = -1 // handled
              }
            } else {
              val dist =
                if (bit(isRepG1, state) == 0) rep1
                else if (bit(isRepG2, state) == 0) { val d = rep2; rep2 = rep1; d }
                else { val d = rep3; rep3 = rep2; rep2 = rep1; d }
              rep1 = rep0
              rep0 = dist
            }
            if (len0 == 0) { // full rep match (not short rep)
              len0 = lenDecode(repChoice, repLow, repMid, repHigh, posState)
              state = if (state < 7) 8 else 11
            }
          }
          if (!done && len0 >= 0) {
            val matchLen = len0 + 2
            require(wpos + matchLen <= target,
              "lzma: match overruns declared output size")
            require(Integer.compareUnsigned(rep0, wpos - dictStart) < 0,
              "lzma: rep distance reaches before dictionary start")
            var i = 0
            while (i < matchLen) { put(wByte(wpos - rep0 - 1)); i += 1 }
          }
        }
        if (wpos == target && stopAtMarker) done = true
      }
      winStream.write(buf, 0, bpos)
      win = null
    }
  }
}
