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
        Gen.oneOf("zlib", "none", "packbits", "lzw"),
        Gen.oneOf(Option.empty[(Int, Int)], Some((16, 16)), Some((32, 16))),
        Gen.oneOf(true, false)) {
      (pages0, compression, tile, predictor0) =>
      // all pages of one file share a shape (codec requirement);
      // predictor 2 is strip-only by contract
      val predictor = predictor0 && tile.isEmpty
      val (w, h, _) = pages0.head
      val pages = pages0.map { case (_, _, px) =>
        (w, h, java.util.Arrays.copyOf(px, w * h))
      }
      val decoded = TiffCodec.decode(
        TiffCodec.encode(pages, compression = compression, tile = tile,
          predictor = predictor))
      decoded.length == pages.length &&
        decoded.zip(pages).forall { case (d, (pw, ph, px)) =>
          d.width == pw && d.height == ph && d.pixels.sameElements(px)
        }
    }

  property("lzw round-trips any byte stream (width growth + table clears)") =
    Prop.forAll(for {
      // up to 32 KiB: random bytes add a table entry ~every 2 input
      // bytes, so streams past ~8 KiB exercise all three width bumps
      // AND the clear-at-4094 path several times over
      n <- Gen.choose(0, 32 * 1024)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
      structured <- Gen.oneOf(true, false)
    } yield {
      val rnd = new scala.util.Random(seed)
      val a = new Array[Byte](n)
      if (structured) { // runs + repeats: deep dictionary strings
        var i = 0
        while (i < n) {
          val b = rnd.nextInt(4).toByte; val run = math.min(n - i, rnd.nextInt(50) + 1)
          java.util.Arrays.fill(a, i, i + run, b); i += run
        }
      } else rnd.nextBytes(a)
      a
    }) { data =>
      TiffCodec.lzwDecode(TiffCodec.lzwEncode(data)).sameElements(data)
    }

  property("lzw decodes the TIFF 6.0 spec worked example (external golden)") =
    Prop {
      // Spec §13 example: input 7 7 7 8 8 7 7 6 6 encodes to codes
      // <Clear> 7 258 8 8 258 6 6 <EOI>, MSB-packed at 9 bits — the
      // byte stream below is derived from the published code sequence,
      // NOT from our encoder, so it pins cross-implementation layout
      // (and the KwKwK code-258 case)
      val golden = Array(0x80, 0x01, 0xe0, 0x40, 0x80, 0x44, 0x08, 0x0c,
        0x06, 0x80, 0x80).map(_.toByte)
      TiffCodec.lzwDecode(golden)
        .sameElements(Array[Byte](7, 7, 7, 8, 8, 7, 7, 6, 6))
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

  property("rgb(a) tiff decodes to sample-planar channel planes") =
    Prop.forAll(for {
      w <- Gen.choose(1, 33)
      h <- Gen.choose(1, 33)
      samples <- Gen.oneOf(3, 4)
      planar <- Gen.oneOf(1, 2)
      bits <- Gen.oneOf(8, 16)
      tiled <- Gen.oneOf(Option.empty[(Int, Int)], Some((16, 16)))
      deflate <- Gen.oneOf(true, false)
      predictor0 <- Gen.oneOf(true, false)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (w, h, samples, planar, bits, tiled, deflate, predictor0,
        seed)) {
      case (w, h, samples, planar, bits, tiled, deflate, predictor0, seed) =>
        val predictor = predictor0 && tiled.isEmpty // strip-only contract
        val rnd = new scala.util.Random(seed)
        val vals = Array.fill(samples, h * w)(rnd.nextInt(1 << bits))
        val bytes = graft.schema.Fixtures.rgbTiffBytes(w, h,
          (s, y, x) => vals(s)(y * w + x), samples, planar, bits, tiled,
          deflate, predictor)
        val page = TiffCodec.decode(bytes).head
        page.samples == samples && page.width == w && page.height == h &&
          page.bitsPerSample == bits &&
          (0 until samples).forall(s =>
            page.samplePlane(s).sameElements(vals(s)))
    }

  property("palette tiff expands indices through the 16-bit colormap") =
    Prop.forAll(for {
      w <- Gen.choose(1, 25)
      h <- Gen.choose(1, 25)
      deflate <- Gen.oneOf(true, false)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (w, h, deflate, seed)) { case (w, h, deflate, seed) =>
      val rnd = new scala.util.Random(seed)
      val idx = Array.fill(h * w)(rnd.nextInt(256))
      val cmap = Array.fill(256, 3)(rnd.nextInt(65536))
      val bytes = graft.schema.Fixtures.paletteTiffBytes(w, h,
        (y, x) => idx(y * w + x), i => (cmap(i)(0), cmap(i)(1), cmap(i)(2)),
        deflate)
      val page = TiffCodec.decode(bytes).head
      page.samples == 3 && page.bitsPerSample == 16 &&
        (0 until 3).forall { s =>
          page.samplePlane(s).sameElements(idx.map(i => cmap(i)(s)))
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
