package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.XzLzma

/**
 * Golden tests for the pure-JVM XZ/LZMA decoder against streams
 * produced by REAL liblzma (python stdlib `lzma`, fixtures checked in
 * under src/test/resources/lzma) — a true third-party golden, unlike a
 * round-trip through our own code.
 */
class LzmaSpec extends AnyFunSuite {

  private val dir = "/root/repo/src/test/resources/lzma"

  private def bytes(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(dir, name))

  private val cases =
    Seq("empty", "run", "text", "random", "pixels", "repeats", "big")

  test("xz streams from liblzma decode byte-exact") {
    cases.foreach { name =>
      val raw = bytes(s"$name.raw")
      val out = XzLzma.decode(bytes(s"$name.xz"), math.max(raw.length, 1))
      assert(out.toSeq === raw.toSeq, name)
    }
  }

  test("lzma-alone streams from liblzma decode byte-exact") {
    cases.foreach { name =>
      val raw = bytes(s"$name.raw")
      // alone declares unknown size -> decode runs to the end marker
      // under the caller's bound
      val out = XzLzma.decode(bytes(s"$name.alone"), raw.length)
      assert(out.toSeq === raw.toSeq, name)
    }
  }

  test("non-default lc/lp/pb properties decode (lc=0 lp=2 pb=1)") {
    val raw = bytes("props_lp2.raw")
    assert(XzLzma.decode(bytes("props_lp2.xz"), raw.length).toSeq
      === raw.toSeq)
  }

  test("all liblzma check types are skipped by length (none/sha256)") {
    val raw = bytes("check_none.raw")
    assert(XzLzma.decode(bytes("check_none.xz"), raw.length).toSeq
      === raw.toSeq)
    assert(XzLzma.decode(bytes("check_sha256.xz"), raw.length).toSeq
      === raw.toSeq)
  }

  test("output bound is enforced against over-long streams") {
    val ex = intercept[IllegalArgumentException] {
      XzLzma.decode(bytes("text.xz"), 10)
    }
    assert(ex.getMessage.contains("bound"))
  }

  test("hostile/garbage bytes terminate with a clean error") {
    val rnd = new scala.util.Random(7L)
    for (n <- Seq(0, 5, 13, 64, 500)) {
      val junk = new Array[Byte](n)
      rnd.nextBytes(junk)
      intercept[IllegalArgumentException] {
        XzLzma.decode(junk, 1 << 16)
      }
      // with a valid XZ magic but corrupted body
      if (n >= 20) {
        val x = bytes("text.xz").clone()
        for (_ <- 0 until 8) x(12 + rnd.nextInt(x.length - 24)) =
          rnd.nextInt(256).toByte
        try { XzLzma.decode(x, 1 << 20); () }
        catch {
          case _: IllegalArgumentException => ()
          case _: ArrayIndexOutOfBoundsException => ()
          case _: NegativeArraySizeException => ()
        }
      }
    }
  }

  test("a numcodecs-style lzma Zarr v2 store decodes (liblzma chunk)") {
    // fixture chunk is real liblzma XZ output; needs a Spark session
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    val df = graft.sources.OmeZarr.read(spark,
      "/root/repo/src/test/resources/lzma_zarr/pad.zarr")
    val px = df.select(org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.col("ome_arrow.planes"), 1)
        .getField("pixels"))
      .collect()(0).getSeq[Int](0)
    assert(px === (0 until 24).map(_ * 31))
  }

  test("a real LZMA-compressed TIFF (compression 34925) decodes") {
    val tif = bytes("gray16_lzma.tif")
    val raw = bytes("gray16_lzma.raw")
    val pages = graft.sources.TiffCodec.decode(tif)
    assert(pages.length === 1)
    val p = pages.head
    assert(p.width === 64 && p.height === 48 && p.bitsPerSample === 16)
    val expected = Array.tabulate(64 * 48)(i =>
      ((raw(i * 2) & 0xff) | ((raw(i * 2 + 1) & 0xff) << 8)))
    assert(p.pixels.toSeq === expected.toSeq)
  }
}
