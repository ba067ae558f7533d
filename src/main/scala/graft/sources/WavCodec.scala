package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Minimal RIFF/WAVE codec — pure JVM, no external dependencies, in the
 * same hand-rolled style as [[TiffCodec]]. Replaces the r8 audio STUB:
 * the multimodal audio path now decodes real WAV bytes.
 *
 * Format reference: the public RIFF/WAVE layout (Microsoft/IBM 1991
 * multimedia programming interface spec; canonical chunk walk):
 * `RIFF <size> WAVE` followed by chunks, each `<4cc> <u32 size> <data>`
 * with odd sizes padded by one byte. Decoding requires a `fmt ` chunk
 * (PCM integer format 1: 8/16/24/32-bit; 8-bit is unsigned by spec,
 * recentred to signed here) before the `data` chunk; unknown chunks
 * (LIST, fact, cue …) are skipped. WAVE_FORMAT_EXTENSIBLE and
 * float/compressed streams are rejected loudly — honest scope, not a
 * silent wrong decode.
 *
 * Samples are de-interleaved to `channels(ch)(frame)` signed ints.
 */
object WavCodec {

  final case class Wav(sampleRate: Int, bitsPerSample: Int,
      channels: Array[Array[Int]]) {
    def nChannels: Int = channels.length
    def nFrames: Int = if (channels.isEmpty) 0 else channels(0).length
  }

  /** Encode PCM16 little-endian WAV from per-channel signed samples
    * (values clamped to the int16 range; all channels must share a
    * frame count). */
  def encode(sampleRate: Int, channels: Array[Array[Int]]): Array[Byte] = {
    require(channels.nonEmpty, "WavCodec.encode: no channels")
    val nFrames = channels(0).length
    require(channels.forall(_.length == nFrames),
      "WavCodec.encode: ragged channel lengths")
    val nCh = channels.length
    val dataBytes = nFrames * nCh * 2
    val buf = ByteBuffer.allocate(44 + dataBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1.toShort)                      // PCM
    buf.putShort(nCh.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * nCh * 2)             // byte rate
    buf.putShort((nCh * 2).toShort)              // block align
    buf.putShort(16.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < nCh) {
        val v = math.max(-32768, math.min(32767, channels(c)(f)))
        buf.putShort(v.toShort)
        c += 1
      }
      f += 1
    }
    buf.array()
  }

  /** Decode a PCM WAV (8/16/24/32-bit int). Loud errors on anything
    * that is not integer PCM or is structurally truncated. */
  def decode(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 12, "WavCodec: truncated RIFF header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourCC() == "RIFF", "WavCodec: not a RIFF stream")
    buf.getInt // declared RIFF size; trust actual bounds instead
    require(fourCC() == "WAVE", "WavCodec: RIFF stream is not WAVE")

    var audioFormat = -1
    var nCh = 0
    var sampleRate = 0
    var bits = 0
    var data: Array[Byte] = null
    while (buf.remaining() >= 8 && data == null) {
      val id = fourCC()
      val size = buf.getInt
      require(size >= 0 && size <= buf.remaining(),
        s"WavCodec: chunk '$id' declares $size bytes, " +
          s"${buf.remaining()} remain")
      id match {
        case "fmt " =>
          require(size >= 16, s"WavCodec: fmt chunk too small ($size)")
          val start = buf.position()
          audioFormat = buf.getShort & 0xffff
          nCh = buf.getShort & 0xffff
          sampleRate = buf.getInt
          buf.getInt   // byte rate (derived)
          buf.getShort // block align (derived)
          bits = buf.getShort & 0xffff
          buf.position(start + size + (size & 1))
        case "data" =>
          require(audioFormat != -1, "WavCodec: data chunk before fmt ")
          data = new Array[Byte](size)
          buf.get(data)
        case _ => // LIST, fact, cue, bext … — skip, with odd padding
          buf.position(buf.position() + size + (size & 1))
      }
    }
    require(audioFormat == 1,
      s"WavCodec: unsupported audio format $audioFormat " +
        "(only integer PCM, format 1, is supported)")
    require(Set(8, 16, 24, 32).contains(bits),
      s"WavCodec: unsupported bit depth $bits")
    require(nCh > 0, "WavCodec: zero channels")
    require(data != null, "WavCodec: no data chunk")
    val bytesPerSample = bits / 8
    val frameBytes = bytesPerSample * nCh
    require(data.length % frameBytes == 0,
      s"WavCodec: data length ${data.length} not a multiple of " +
        s"frame size $frameBytes")
    val nFrames = data.length / frameBytes
    val channels = Array.fill(nCh)(new Array[Int](nFrames))
    var f = 0
    var off = 0
    while (f < nFrames) {
      var c = 0
      while (c < nCh) {
        channels(c)(f) = bits match {
          case 8  => (data(off) & 0xff) - 128 // 8-bit WAV is unsigned
          case 16 => ((data(off) & 0xff) | (data(off + 1) << 8)).toShort.toInt
          case 24 =>
            ((data(off) & 0xff) | ((data(off + 1) & 0xff) << 8) |
              (data(off + 2) << 16)) << 8 >> 8
          case 32 =>
            (data(off) & 0xff) | ((data(off + 1) & 0xff) << 8) |
              ((data(off + 2) & 0xff) << 16) | (data(off + 3) << 24)
        }
        off += bytesPerSample
        c += 1
      }
      f += 1
    }
    Wav(sampleRate, bits, channels)
  }
}
