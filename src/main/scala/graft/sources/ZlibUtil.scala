package graft.sources

import java.util.zip.Deflater

/** Shared zlib-wrapped deflate (level 6) used by the TIFF, Zarr and
  * Blosc writers — one implementation instead of three copies. */
private[sources] object ZlibUtil {
  def deflate(data: Array[Byte], level: Int = 6): Array[Byte] = {
    val d = new Deflater(level, false)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val tmp = new Array[Byte](16384)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }
}
