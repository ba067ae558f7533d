package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.sources.{BloscCodec, OmeXml, TiffCodec}

/** ScalaCheck properties for the pure-JVM codec layer (no Spark). */
object CodecPropertySpec extends Properties("codecs") {

  private val pageGen: Gen[(Int, Int, Array[Int])] = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 40)
    px <- Gen.containerOfN[Array, Int](w * h, Gen.choose(0, 65535))
  } yield (w, h, px)

  property("tiff encode/decode round-trips any page stack") =
    Prop.forAll(Gen.nonEmptyListOf(pageGen).map(_.take(6)),
        Gen.oneOf("zlib", "none", "packbits"),
        Gen.oneOf(Option.empty[(Int, Int)], Some((16, 16)), Some((32, 16)))) {
      (pages0, compression, tile) =>
      // all pages of one file share a shape (codec requirement)
      val (w, h, _) = pages0.head
      val pages = pages0.map { case (_, _, px) =>
        (w, h, java.util.Arrays.copyOf(px, w * h))
      }
      val decoded = TiffCodec.decode(
        TiffCodec.encode(pages, compression = compression, tile = tile))
      decoded.length == pages.length &&
        decoded.zip(pages).forall { case (d, (pw, ph, px)) =>
          d.width == pw && d.height == ph && d.pixels.sameElements(px)
        }
    }

  property("tiff decode of arbitrary bytes terminates with a clean error") =
    Prop.forAll(Gen.containerOf[Array, Byte](Gen.choose(
        Byte.MinValue, Byte.MaxValue))) { bytes =>
      try { TiffCodec.decode(bytes); true }
      catch {
        case _: IllegalArgumentException => true
        case _: IndexOutOfBoundsException => true // truncated header reads
        case _: Exception => false // anything else (hang handled by timeout)
      }
    }

  property("tiff decode of a corrupted valid file never succeeds silently") =
    Prop.forAll(pageGen, Gen.choose(0, 1000), Gen.choose(Byte.MinValue, Byte.MaxValue)) {
      case ((w, h, px), pos, b) =>
        val good = TiffCodec.encode(Seq((w, h, px)))
        val bad = good.clone()
        val idx = pos % good.length
        val orig = bad(idx)
        bad(idx) = b
        if (b == orig) Prop.passed // no-op corruption
        else try {
          val pages = TiffCodec.decode(bad)
          // flipping pixel-data or description bytes legitimately decodes;
          // shape must still be sane when it does
          Prop.collect("decoded")(pages.head.width == w && pages.head.height == h ||
            pages.head.pixels.length == pages.head.width * pages.head.height)
        } catch {
          case _: Exception => Prop.collect("rejected")(true)
        }
    }

  property("pageCoords is a bijection over the TCZ grid for any order") = {
    val orderGen = Gen.oneOf("XYZCT", "XYZTC", "XYCZT", "XYCTZ", "XYTZC", "XYTCZ")
    Prop.forAll(orderGen, Gen.choose(1, 4), Gen.choose(1, 4), Gen.choose(1, 4)) {
      (order, sz, sc, st) =>
        val coords = (0 until sz * sc * st)
          .map(p => OmeXml.pageCoords(order, sz, sc, st, p))
        coords.distinct.length == coords.length &&
          coords.forall { case (t, c, z) => t < st && c < sc && z < sz }
    }
  }

  property("blosc compress/decompress round-trips any payload") =
    Prop.forAll(
      Gen.choose(0, 5000).flatMap(n =>
        Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue))),
      Gen.choose(1, 8),
      Gen.oneOf("zlib", "lz4"),
      Gen.oneOf(0, 1, 2)) { (data, typesize, cname, shuffle) =>
      val back = BloscCodec.decompress(
        BloscCodec.compress(data, typesize, cname, shuffle))
      back.sameElements(data)
    }

  property("blosc decode of arbitrary bytes terminates with a clean error") =
    Prop.forAll(Gen.choose(0, 200).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue)))) {
      bytes =>
        try { BloscCodec.decompress(bytes, maxOut = 1 << 20); true }
        catch {
          case _: IllegalArgumentException => true
          case _: ArrayIndexOutOfBoundsException => true
          case _: java.util.zip.DataFormatException => true
        }
    }
}
