package graft

import graft.operators.{Jpeg, Multimodal, Tiff}
import graft.operators.Multimodal.{Bmp, Gif, Png, Ppm, Qoi, Wav}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Property-based verification of the six pure-JVM codecs, on two axes
  * the example-based suites cannot cover exhaustively:
  *
  *  1. ROUNDTRIP IDENTITY over GENERATED rasters — random and
  *     low-entropy (low-entropy inputs drive the compressors' run/index
  *     paths: QOI's RUN/INDEX/DIFF/LUMA ops, RLE8's encoded runs, LZW's
  *     growing code table — exactly the paths a fixed fixture exercises
  *     only at one point each);
  *  2. TOTALITY — every decoder is an `Array[Byte] => Option[_]` and
  *     must never THROW: arbitrary byte salads and bit-flipped /
  *     truncated valid encodings must decode to None or to a valid
  *     image, never to an exception (the S8 malformed-payload rule
  *     stated as a property over the whole input space, not a list of
  *     hand-picked corruptions).
  *
  * Deterministic: fixed scalacheck seed, so a failure reproduces. */
class CodecPropertySpec extends AnyFunSuite {

  // SPARK_GRAFT_FUZZ_SEED explores a fresh seed family on demand (the
  // StreamScheduleFuzzSpec knob); default stays deterministic
  private val SeedBase: Long =
    sys.env.get("SPARK_GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(0L)

  private def check(name: String, p: Prop, n: Int = 120): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(0xC0DECL ^ SeedBase))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  // dims small enough to keep 120 cases fast, large enough to cross the
  // codecs' structural boundaries (BMP stride 0..3, PNG/GIF interlace
  // passes, QOI run caps via the low-entropy generator)
  private val genDims: Gen[(Int, Int)] =
    for { w <- Gen.choose(1, 17); h <- Gen.choose(1, 12) } yield (w, h)

  private def bytesOf(n: Int, gen: Gen[Int]): Gen[Array[Byte]] =
    Gen.containerOfN[Array, Byte](n, gen.map(_.toByte))

  /** Random vs low-entropy rasters: the latter draw from ≤ 4 values, so
    * runs and palette hits dominate. */
  private def genRaster(n: Int): Gen[Array[Byte]] =
    Gen.oneOf(
      bytesOf(n, Gen.choose(0, 255)),
      Gen.choose(1, 4).flatMap(k =>
        Gen.listOfN(k, Gen.choose(0, 255)).flatMap(pal =>
          bytesOf(n, Gen.oneOf(pal)))))

  // ---- roundtrips -----------------------------------------------------

  test("PPM P6 roundtrip identity (with and without comment)") {
    check("ppm", Prop.forAll(genDims, Gen.option(Gen.alphaNumStr.map(_.take(20)))) {
      (dims, comment) =>
        val (w, h) = dims
        Prop.forAll(genRaster(w * h * 3)) { px =>
          val img = Ppm.decode(Ppm.encodeP6(w, h, 255, px, comment))
          img.exists(i => i.width == w && i.height == h &&
            java.util.Arrays.equals(i.pixels, px))
        }
    })
  }

  test("WAV PCM-16 roundtrip identity (incl. the pre-fmt junk-chunk walk)") {
    val genSamples = Gen.choose(1, 400).flatMap(n =>
      Gen.containerOfN[Array, Short](n, Gen.choose(Short.MinValue, Short.MaxValue)))
    val genJunk = Gen.option(Gen.choose(0, 9).flatMap(n =>
      bytesOf(n, Gen.choose(0, 255)))) // odd sizes exercise word alignment
    check("wav", Prop.forAll(Gen.oneOf(8000, 16000, 44100), Gen.choose(1, 2),
      genSamples, genJunk) { (rate, ch, samples, junk) =>
        // frame-align: sample count must be a multiple of the channels
        val aligned = samples.take(samples.length - samples.length % ch)
        (aligned.nonEmpty) ==> {
          val a = Wav.decode(Wav.encodePcm16(rate, ch, aligned, junk))
          a.exists(d => d.sampleRate == rate && d.channels == ch &&
            d.bitsPerSample == 16 && java.util.Arrays.equals(d.samples, aligned))
        }
    })
  }

  test("QOI roundtrip identity (random and run/index-heavy rasters)") {
    check("qoi", Prop.forAll(genDims) { case (w, h) =>
      Prop.forAll(genRaster(w * h * 3)) { px =>
        Qoi.decode(Qoi.encode(w, h, px))
          .exists(i => java.util.Arrays.equals(i.pixels, px))
      }
    })
  }

  test("PNG roundtrip identity, straight and Adam7, same raster") {
    check("png", Prop.forAll(genDims) { case (w, h) =>
      Prop.forAll(genRaster(w * h * 3)) { px =>
        val straight = Png.decode(Png.encode(w, h, px))
        val adam7 = Png.decode(Png.encodeAdam7(w, h, px))
        straight.exists(i => java.util.Arrays.equals(i.pixels, px)) &&
          adam7.exists(i => java.util.Arrays.equals(i.pixels, px))
      }
    })
  }

  test("GIF roundtrip identity, straight and interlaced, same indices") {
    check("gif", Prop.forAll(genDims) { case (w, h) =>
      Prop.forAll(genRaster(w * h)) { idx =>
        val straight = Gif.decode(Gif.encode(w, h, idx))
        val inter = Gif.decode(Gif.encode(w, h, idx, interlaced = true))
        straight.exists(i => java.util.Arrays.equals(i.indices, idx)) &&
          inter.exists(i => java.util.Arrays.equals(i.indices, idx))
      }
    })
  }

  test("TIFF roundtrip identity across byte order, PackBits, strip geometry") {
    val genCfg = for {
      be <- Gen.oneOf(false, true)
      pb <- Gen.oneOf(false, true)
      rps <- Gen.oneOf(1, 2, 3, Int.MaxValue)
    } yield (be, pb, rps)
    check("tiff-gray", Prop.forAll(genDims, genCfg) { case ((w, h), (be, pb, rps)) =>
      Prop.forAll(genRaster(w * h)) { px =>
        Tiff.decode(Tiff.encodeGray(w, h, px, be, rps, pb))
          .exists(i => i.width == w && i.height == h && i.samplesPerPixel == 1 &&
            java.util.Arrays.equals(i.pixels, px))
      }
    }, 60)
    check("tiff-rgb", Prop.forAll(genDims, genCfg) { case ((w, h), (be, pb, rps)) =>
      Prop.forAll(genRaster(w * h * 3)) { px =>
        Tiff.decode(Tiff.encodeRgb(w, h, px, be, rps, pb))
          .exists(i => i.samplesPerPixel == 3 &&
            java.util.Arrays.equals(i.pixels, px))
      }
    }, 60)
  }

  test("BMP roundtrip identity across all four wire layouts") {
    check("bmp", Prop.forAll(genDims) { case (w, h) =>
      Prop.forAll(genRaster(w * h * 3)) { px =>
        val b24 = Bmp.decode(Bmp.encode24(w, h, px))
        val b24td = Bmp.decode(Bmp.encode24(w, h, px, topDown = true))
        // 8-bit layouts need <= 256 distinct colors; 17*12 = 204 pixels
        // can never exceed that, so every generated raster encodes
        val b8 = Bmp.decode(Bmp.encode8(w, h, px))
        val rle = Bmp.decode(Bmp.encodeRle8(w, h, px))
        Seq(b24, b24td, b8, rle).forall(
          _.exists(i => java.util.Arrays.equals(i.pixels, px)))
      }
    })
  }

  test("JPEG: block-constant rasters roundtrip EXACTLY; arbitrary rasters within the DCT round-off bound") {
    // block-constant: the q122/q123 oracle premise as a property — any
    // per-8×8-block-constant raster survives the lossy pipeline intact
    // under flat quantization (DC-only spectrum, exact-integer DC)
    val genBlockDims = for { bw <- Gen.choose(1, 4); bh <- Gen.choose(1, 3) } yield (bw, bh)
    check("jpeg-flat", Prop.forAll(genBlockDims) { case (bw, bh) =>
      Prop.forAll(genRaster(bw * bh)) { blocks =>
        val (w, h) = (bw * 8, bh * 8)
        val gray = Array.tabulate[Byte](w * h)(i =>
          blocks((i / w / 8) * bw + (i % w / 8)))
        val g = Jpeg.decode(Jpeg.encodeGray(w, h, gray))
        val gp = Jpeg.decode(Jpeg.encodeGrayProgressive(w, h, gray))
        val cw = (w + 1) / 2
        val flat = Array.fill[Byte](cw * ((h + 1) / 2))(128.toByte)
        val c = Jpeg.decode(Jpeg.encodeYcc420(w, h, gray, flat, flat))
        val cp = Jpeg.decode(Jpeg.encodeYcc420Progressive(w, h, gray, flat, flat))
        def grayOk(r: Option[Jpeg.Image]) =
          r.exists(i => i.nComponents == 1 && java.util.Arrays.equals(i.pixels, gray))
        def colorOk(r: Option[Jpeg.Image]) =
          r.exists(i => i.nComponents == 3 && (0 until w * h).forall(p =>
            i.pixels(3 * p) == gray(p) && i.pixels(3 * p + 1) == gray(p) &&
              i.pixels(3 * p + 2) == gray(p)))
        grayOk(g) && grayOk(gp) && colorOk(c) && colorOk(cp)
      }
    }, 60)
    // arbitrary rasters: flat-quant round-off is bounded — each zigzag
    // coefficient rounds by ≤ 0.5, so |pixel error| ≤ 0.125·(1/√2+7)²+0.5
    // < 8.5; assert ≤ 9 (a Huffman/zigzag/dequant bug blows far past it)
    check("jpeg-lossy-bound", Prop.forAll(genDims) { case (w, h) =>
      Prop.forAll(genRaster(w * h)) { px =>
        Jpeg.decode(Jpeg.encodeGray(w, h, px)).exists { i =>
          i.width == w && i.height == h &&
            px.indices.forall(p => math.abs((i.pixels(p) & 0xFF) - (px(p) & 0xFF)) <= 9)
        }
      }
    }, 60)
  }

  // ---- totality (fuzz): decoders never throw --------------------------

  private val decoders: Seq[(String, Array[Byte] => Option[Any])] = Seq(
    "ppm" -> (b => Ppm.decode(b)),
    "wav" -> (b => Wav.decode(b)),
    "qoi" -> (b => Qoi.decode(b)),
    "png" -> (b => Png.decode(b)),
    "gif" -> (b => Gif.decode(b)),
    "gif-frames" -> (b => Gif.decodeFrames(b)),
    "gif-composited" -> (b => Gif.decodeComposited(b)),
    "bmp" -> (b => Bmp.decode(b)),
    "jpeg" -> (b => Jpeg.decode(b)),
    "tiff" -> (b => Tiff.decode(b)))

  private def neverThrows(name: String, f: Array[Byte] => Option[Any],
      bytes: Array[Byte]): Prop =
    try { f(bytes); Prop.passed } catch {
      case e: Throwable => Prop.exception(new AssertionError(
        s"$name threw ${e.getClass.getSimpleName}: ${e.getMessage} on " +
          s"${bytes.length} bytes ${bytes.take(32).mkString("[", ",", "...]")}", e))
    }

  test("decoders are total on arbitrary byte salads") {
    val genSalad = Gen.choose(0, 600).flatMap(n => bytesOf(n, Gen.choose(0, 255)))
    decoders.foreach { case (name, f) =>
      check(s"salad:$name", Prop.forAll(genSalad)(b => neverThrows(name, f, b)), 200)
    }
  }

  test("decoders are total under bit flips and truncations of valid encodings") {
    val seeds: Seq[(String, Array[Byte] => Option[Any], Array[Byte])] = {
      val px = Array.tabulate(9 * 7 * 3)(i => ((i * 31 + 7) % 251).toByte)
      val idx = px.take(9 * 7)
      Seq(
        ("ppm", b => Ppm.decode(b), Ppm.encodeP6(9, 7, 255, px)),
        ("wav", b => Wav.decode(b),
          Wav.encodePcm16(8000, 1, px.map(_.toShort))),
        ("qoi", b => Qoi.decode(b), Qoi.encode(9, 7, px)),
        ("png", b => Png.decode(b), Png.encode(9, 7, px)),
        ("png-adam7", b => Png.decode(b), Png.encodeAdam7(9, 7, px)),
        ("gif", b => Gif.decode(b), Gif.encode(9, 7, idx)),
        ("gif-interlaced", b => Gif.decode(b),
          Gif.encode(9, 7, idx, interlaced = true)),
        ("bmp24", b => Bmp.decode(b), Bmp.encode24(9, 7, px)),
        ("bmp8", b => Bmp.decode(b), Bmp.encode8(9, 7, px)),
        ("bmp-rle8", b => Bmp.decode(b), Bmp.encodeRle8(9, 7, px)),
        ("tiff-ii", b => Tiff.decode(b),
          Tiff.encodeGray(9, 7, idx, bigEndian = false, rowsPerStrip = 2)),
        ("tiff-mm-packbits", b => Tiff.decode(b),
          Tiff.encodeRgb(9, 7, px, bigEndian = true, rowsPerStrip = 3,
            packBits = true))) ++ {
        val gray = Array.tabulate(24 * 16)(i => ((i * 37 + 11) % 251).toByte)
        val cro = Array.tabulate(12 * 8)(i => ((i * 53 + 5) % 251).toByte)
        Seq[(String, Array[Byte] => Option[Any], Array[Byte])](
          ("jpeg", b => Jpeg.decode(b), Jpeg.encodeGray(24, 16, gray)),
          ("jpeg-rst", b => Jpeg.decode(b),
            Jpeg.encodeGray(24, 16, gray, restartInterval = 2)),
          ("jpeg-420", b => Jpeg.decode(b),
            Jpeg.encodeYcc420(24, 16, gray, cro, cro)),
          ("jpeg-prog", b => Jpeg.decode(b),
            Jpeg.encodeGrayProgressive(24, 16, gray)),
          ("jpeg-prog-420", b => Jpeg.decode(b),
            Jpeg.encodeYcc420Progressive(24, 16, gray, cro, cro)),
          ("jpeg-prog-acsa", b => Jpeg.decode(b),
            Jpeg.encodeGrayProgressive(Multimodal.JpegW, Multimodal.JpegH,
              Multimodal.acSaBlockGray(
                Array.tabulate[Byte](35)(i => (i * 37 + 1).toByte)),
              quant = Multimodal.QuantAcSa, acSa = true)))
      }
    }
    seeds.foreach { case (name, f, valid) =>
      val genCorrupt: Gen[Array[Byte]] = Gen.oneOf(
        // 1..3 random byte flips
        for {
          k <- Gen.choose(1, 3)
          flips <- Gen.listOfN(k,
            Gen.zip(Gen.choose(0, valid.length - 1), Gen.choose(0, 255)))
        } yield {
          val b = valid.clone()
          flips.foreach { case (at, v) => b(at) = v.toByte }
          b
        },
        // truncation at any point
        Gen.choose(0, valid.length - 1).map(valid.take),
        // trailing garbage
        Gen.choose(1, 16).flatMap(n =>
          bytesOf(n, Gen.choose(0, 255)).map(valid ++ _)))
      check(s"corrupt:$name",
        Prop.forAll(genCorrupt)(b => neverThrows(name, f, b)), 200)
    }
  }
}
