package graft

import graft.operators.Multimodal.Png
import org.scalatest.funsuite.AnyFunSuite

/** The PNG codec against the spec: a hand-built stream (filters computed
  * by hand, deflated + chunked in the test) decodes to known pixels, so
  * the de-filter arithmetic is checked against the SPEC rather than our
  * own encoder; roundtrips exercise all five filters (the encoder
  * rotates per row) including mod-256 wraps; malformed payloads → None
  * (bad signature, corrupt CRC, non-RGB8 header, bad filter byte,
  * truncated stream). */
class PngSpec extends AnyFunSuite {

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  private def u32be(v: Long): Array[Byte] =
    Array(((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
      ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val td = ctype.getBytes("US-ASCII") ++ data
    val c = new java.util.zip.CRC32; c.update(td)
    u32be(data.length.toLong) ++ td ++ u32be(c.getValue)
  }

  private val sig = Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)

  private def png(w: Int, h: Int, raw: Array[Byte], colorType: Byte = 2): Array[Byte] =
    sig ++ chunk("IHDR", u32be(w.toLong) ++ u32be(h.toLong) ++
      Array[Byte](8, colorType, 0, 0, 0)) ++
      chunk("IDAT", deflate(raw)) ++ chunk("IEND", Array.empty[Byte])

  test("golden vector: Sub and Up filters de-filter to hand-computed pixels") {
    // 2×2 RGB: row0 filter 1 (Sub): deltas (10,20,30),(5,6,7)
    //   → px (10,20,30), (15,26,37)
    // row1 filter 2 (Up): deltas (1,2,3),(4,5,6)
    //   → px (11,22,33), (19,31,43)
    val raw = Array[Byte](1, 10, 20, 30, 5, 6, 7, 2, 1, 2, 3, 4, 5, 6)
    val img = Png.decode(png(2, 2, raw)).get
    assert(img.width === 2 && img.height === 2)
    assert(img.pixels.toSeq === Seq[Byte](10, 20, 30, 15, 26, 37, 11, 22, 33, 19, 31, 43))
  }

  test("golden vector: Average and Paeth filters") {
    // 2×2: row0 filter 0 (None): px (100,100,100),(40,60,80)
    // row1 filter 3 (Average): delta (4,5,6) → px0 = (4+100/2, ...) =
    //   (54,55,56); delta (7,8,9) → px1 = (7+(54+40)/2, 8+(55+60)/2,
    //   9+(56+80)/2) = (54,65,77)
    val rawAvg = Array[Byte](0, 100, 100, 100, 40, 60, 80, 3, 4, 5, 6, 7, 8, 9)
    val avg = Png.decode(png(2, 2, rawAvg)).get
    assert(avg.pixels.toSeq === Seq[Byte](100, 100, 100, 40, 60, 80, 54, 55, 56, 54, 65, 77))
    // row1 filter 4 (Paeth): first pixel a=0,c=0 → pred=b=(100,100,100);
    // second pixel a=(103,104,105), b=(40,60,80), c=(100,100,100):
    //   p=a+b-c=(43,64,85); |p-a|=(60,40,20) |p-b|=(3,4,5) |p-c|=(57,36,15)
    //   → pred=b for ch0,ch1 (pb<=pc, pa>pb), ch2: pa=20,pb=5,pc=15 → b
    // deltas (3,4,5) → px0=(103,104,105); deltas (1,2,3) → px1=(41,62,83)
    val rawPaeth = Array[Byte](0, 100, 100, 100, 40, 60, 80, 4, 3, 4, 5, 1, 2, 3)
    val pa = Png.decode(png(2, 2, rawPaeth)).get
    assert(pa.pixels.toSeq === Seq[Byte](100, 100, 100, 40, 60, 80, 103, 104, 105, 41, 62, 83))
  }

  test("roundtrip identity: all five filters load-bearing, wrap-safe") {
    def raster(n: Int)(f: Int => (Int, Int, Int)): Array[Byte] =
      (0 until n).flatMap { i => val (r, g, b) = f(i); Seq(r.toByte, g.toByte, b.toByte) }.toArray
    val cases = Seq(
      ("textish", 8, 5, java.util.Arrays.copyOf(
        "the quick brown fox jumps over the lazy dog and then naps".getBytes("US-ASCII"), 120)),
      ("wrap", 4, 5, raster(20)(i => ((i * 129) & 0xFF, (255 - i * 7) & 0xFF, (i * i) & 0xFF))),
      ("flat", 6, 5, raster(30)(_ => (200, 10, 90))))
    cases.foreach { case (name, w, h, px) =>
      val dec = Png.decode(Png.encode(w, h, px))
      assert(dec.nonEmpty, s"$name: decode failed")
      assert(dec.get.pixels.toSeq === px.toSeq, s"$name: pixel mismatch")
    }
  }

  test("Adam7: interlaced roundtrip equals the straight raster (8×5: all seven passes populated)") {
    val px = (0 until 120).map(i => ((i * 37 + 11) & 0xFF).toByte).toArray
    val straight = Png.encode(8, 5, px)
    val inter = Png.encodeAdam7(8, 5, px)
    assert(inter(28) === 1.toByte, "IHDR interlace flag not set")
    assert(!java.util.Arrays.equals(inter, straight),
      "interlaced stream identical to straight — pass extraction vacuous")
    val dec = Png.decode(inter)
    assert(dec.nonEmpty, "interlaced decode failed")
    assert(dec.get.width === 8 && dec.get.height === 5)
    assert(dec.get.pixels.toSeq === px.toSeq, "de-interlaced pixels diverged")
    assert(Png.decode(straight).get.pixels.toSeq === dec.get.pixels.toSeq)
  }

  test("Adam7: degenerate dimensions skip empty passes and still roundtrip exactly") {
    for ((w, h) <- Seq((1, 1), (2, 2), (3, 1), (1, 7), (8, 1), (16, 16))) {
      val px = (0 until w * h * 3).map(i => ((i * 29 + w + h) & 0xFF).toByte).toArray
      val dec = Png.decode(Png.encodeAdam7(w, h, px))
      assert(dec.nonEmpty, s"${w}x$h: interlaced decode failed")
      assert(dec.get.pixels.toSeq === px.toSeq, s"${w}x$h: pixel mismatch")
    }
  }

  test("Adam7: malformed interlaced payloads decode to None") {
    val px = Array.fill(120)(42.toByte)
    val good = Png.encodeAdam7(8, 5, px)
    assert(Png.decode(good).nonEmpty)
    // unknown interlace method 2: rejected, not mis-decoded
    val raw = Array[Byte](0, 1, 2, 3, 4, 5, 6)
    val inter2 = sig ++ chunk("IHDR", u32be(2L) ++ u32be(2L) ++
      Array[Byte](8, 2, 0, 0, 2)) ++
      chunk("IDAT", deflate(raw ++ raw)) ++ chunk("IEND", Array.empty[Byte])
    assert(Png.decode(inter2).isEmpty, "interlace method 2 must be refused")
    // interlaced stream whose inflate payload is one pass short
    val shortRaw = Array[Byte](0, 9, 9, 9) // pass 1 (1×1) only, of 11 scanlines
    val short = sig ++ chunk("IHDR", u32be(8L) ++ u32be(5L) ++
      Array[Byte](8, 2, 0, 0, 1)) ++
      chunk("IDAT", deflate(shortRaw)) ++ chunk("IEND", Array.empty[Byte])
    assert(Png.decode(short).isEmpty, "interlaced raster shortfall must be refused")
  }

  test("malformed payloads decode to None (S8 skip policy)") {
    val good = Png.encode(4, 5, Array.fill(60)(7.toByte))
    assert(Png.decode(good).nonEmpty)
    assert(Png.decode("notapng!".getBytes ++ good.drop(8)).isEmpty, "bad signature")
    val corrupt = good.clone()
    // byte 17 sits inside IHDR's width field (data starts at offset 16):
    // flipping it without recomputing the chunk CRC must fail validation
    corrupt(17) = (corrupt(17) ^ 0x55).toByte
    assert(Png.decode(corrupt).isEmpty, "corrupt IHDR must fail its CRC")
    assert(Png.decode(good.dropRight(6)).isEmpty, "truncated stream")
    assert(Png.decode(png(2, 2, Array.fill(14)(0.toByte), colorType = 6)).isEmpty,
      "RGBA header rejected (RGB-8-only library)")
    // valid chunks, invalid filter byte
    val badFilter = Array[Byte](7, 1, 2, 3, 4, 5, 6) ++ Array[Byte](0, 0, 0, 0, 0, 0, 0)
    assert(Png.decode(png(2, 2, badFilter)).isEmpty, "filter byte 7 rejected")
    // header claims more rows than the stream carries
    val short = png(2, 4, Array[Byte](0, 1, 2, 3, 4, 5, 6))
    assert(Png.decode(short).isEmpty, "raster shortfall")
  }

  test("hostile header whose w*h overflows a Long is rejected without allocating") {
    // w=0xFFFFFFFF, h=0x80000001: the unsigned product ≈ 9.2e18 wraps a
    // signed Long negative, slipping past a product-only guard — the
    // per-dimension clamp must refuse it (None, no multi-GB allocation)
    val hostile = png(0xFFFFFFFF, 0x80000001, Array[Byte](0, 1, 2, 3, 4, 5, 6))
    assert(Png.decode(hostile).isEmpty, "Long-overflow dimensions rejected")
  }

  test("zlib FDICT header terminates with None instead of spinning the inflate loop") {
    // CMF=0x78, FLG=0x20: FDICT set, (0x78*256+0x20) % 31 == 0 so the
    // header itself is valid zlib — Inflater then returns 0 forever with
    // needsInput()==false until a preset dictionary is supplied; the
    // decoder must treat the zero-progress round as malformed
    val fdictIdat = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 9, 9, 9, 9)
    val stream = sig ++ chunk("IHDR", u32be(2L) ++ u32be(2L) ++
      Array[Byte](8, 2, 0, 0, 0)) ++
      chunk("IDAT", fdictIdat) ++ chunk("IEND", Array.empty[Byte])
    assert(Png.decode(stream).isEmpty, "FDICT stream must be refused, not hung")
  }
}
