package graft

import graft.operators.Multimodal.Qoi
import org.scalatest.funsuite.AnyFunSuite

/** The QOI codec against the public spec (qoiformat.org): hand-built
  * golden byte vectors decode to known pixels (so the decoder is checked
  * against the SPEC, not just against our own encoder), roundtrip
  * identity over rasters crafted to force every op (INDEX, DIFF, LUMA,
  * RGB, RUN incl. the 62 cap), and malformed payloads → None (S8). */
class QoiSpec extends AnyFunSuite {

  private def header(w: Int, h: Int): Array[Byte] =
    Array[Byte]('q', 'o', 'i', 'f',
      0, 0, 0, w.toByte, 0, 0, 0, h.toByte, 3, 0)
  private val marker = Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)

  test("golden vector: RGB op + RUN op") {
    // 3×1: explicit RGB(10,20,30), then run of 2 → three identical pixels
    val bytes = header(3, 1) ++
      Array[Byte](0xFE.toByte, 10, 20, 30, (0xC0 | 1).toByte) ++ marker
    val img = Qoi.decode(bytes).get
    assert(img.width === 3 && img.height === 1)
    assert(img.pixels.toSeq === Seq[Byte](10, 20, 30, 10, 20, 30, 10, 20, 30))
  }

  test("golden vector: DIFF, LUMA and INDEX ops") {
    // px0 = RGB(100,100,100); px1 = DIFF(+1,-2,+1) = (101,98,101)
    //   (note hash(px0) == hash(px1) == 17 — px1 overwrites px0's slot,
    //   itself a useful property to pin);
    // px2 = LUMA dg=+10, dr-dg=-8, db-dg=+7 = (101+10-8, 98+10, 101+10+7)
    //     = (103,108,118), stored in slot hash(103,108,118) = 0;
    // px3 = INDEX(17) → the slot's CURRENT occupant, px1 (not px0)
    assert((100 * 3 + 100 * 5 + 100 * 7 + 255 * 11) % 64 ===
      (101 * 3 + 98 * 5 + 101 * 7 + 255 * 11) % 64)
    val bytes = header(4, 1) ++ Array[Byte](
      0xFE.toByte, 100, 100, 100,
      (0x40 | ((1 + 2) << 4) | ((-2 + 2) << 2) | (1 + 2)).toByte,
      (0x80 | (10 + 32)).toByte, (((-8 + 8) << 4) | (7 + 8)).toByte,
      17.toByte) ++ marker
    val img = Qoi.decode(bytes).get
    assert(img.pixels.toSeq === Seq[Byte](
      100, 100, 100, 101, 98, 101, 103, 108, 118, 101, 98, 101))
  }

  test("roundtrip identity over op-forcing rasters") {
    def raster(n: Int)(f: Int => (Int, Int, Int)): Array[Byte] =
      (0 until n).flatMap { i => val (r, g, b) = f(i); Seq(r.toByte, g.toByte, b.toByte) }.toArray
    val cases: Seq[(String, Int, Int, Array[Byte])] = Seq(
      // 130 identical pixels: forces RUN at the 62 cap, twice, plus tail
      ("long run", 13, 10, raster(130)(_ => (7, 7, 7))),
      // wrapping deltas: 255→0 transitions exercise DIFF/LUMA mod-256 math
      ("wrap", 8, 4, raster(32)(i => ((i * 255) & 0xFF, (254 + i) & 0xFF, (i * 37) & 0xFF))),
      // alternating pair: second occurrence of each color is an INDEX hit
      ("index", 8, 2, raster(16)(i => if (i % 2 == 0) (200, 10, 60) else (15, 220, 90))),
      // big jumps: every pixel out of DIFF/LUMA range → RGB ops
      ("rgb jumps", 4, 2, raster(8)(i => ((i * 111) & 0xFF, (i * 191) & 0xFF, (i * 83) & 0xFF))),
      // leading black: prev starts (0,0,0) so this opens with a RUN; a
      // virgin index slot must NOT index-match black (the alpha-packing rule)
      ("black open", 4, 2, raster(8)(i => if (i < 3) (0, 0, 0) else (50, 0, 0))),
      // text-shaped: ASCII bytes as pixels, the q91 synthesis shape
      ("textish", 8, 4, java.util.Arrays.copyOf(
        ("the quick brown fox jumps over the lazy dog, twice over. " +
          "the quick brown fox").getBytes("US-ASCII"), 96)))
    cases.foreach { case (name, w, h, px) =>
      val enc = Qoi.encode(w, h, px)
      val dec = Qoi.decode(enc)
      assert(dec.nonEmpty, s"$name: decode failed")
      assert(dec.get.width === w && dec.get.height === h, s"$name: dims")
      assert(dec.get.pixels.toSeq === px.toSeq, s"$name: pixel mismatch")
    }
  }

  test("op coverage: the encoder actually emits every op class on mixed input") {
    // one raster touching all five op classes, verified from the stream
    val px = Array.concat(
      Array[Byte](100, 100, 100), Array[Byte](101, 98, 101), // DIFF
      Array[Byte](111, 108, 118), // LUMA
      Array[Byte](0, 200.toByte, 0), // RGB jump
      Array[Byte](100, 100, 100), // INDEX (repeat of px0)
      Array.fill(9)(100.toByte)) // RUN ×3 of (100,100,100)
    val enc = Qoi.encode(2, 4, px).drop(14).dropRight(8).map(_ & 0xFF)
    assert(enc.contains(0xFE), "no RGB op")
    assert(enc.exists(b => (b >> 6) == 1), "no DIFF op")
    assert(enc.exists(b => (b >> 6) == 2), "no LUMA op")
    assert(enc.exists(b => (b >> 6) == 0), "no INDEX op")
    assert(enc.exists(b => (b >> 6) == 3 && b != 0xFE && b != 0xFF), "no RUN op")
    assert(Qoi.decode(Qoi.encode(2, 4, px)).get.pixels.toSeq === px.toSeq)
  }

  test("malformed payloads decode to None (S8 skip policy)") {
    val good = Qoi.encode(2, 2, Array.fill(12)(42.toByte))
    assert(Qoi.decode(good).nonEmpty)
    assert(Qoi.decode("noqoi".getBytes).isEmpty, "bad magic")
    assert(Qoi.decode(good.take(10)).isEmpty, "truncated header")
    assert(Qoi.decode(good.dropRight(1)).isEmpty, "missing end marker byte")
    assert(Qoi.decode(good.dropRight(9) ++ Array.fill[Byte](8)(0)).isEmpty,
      "corrupt end marker")
    val rgba = good.clone(); rgba(12) = 4
    assert(Qoi.decode(rgba).isEmpty, "channels=4 rejected (RGB-only library)")
    // stream that runs dry before the raster fills
    val short = header(4, 4) ++ Array[Byte](0xFE.toByte, 1, 2, 3) ++ marker
    assert(Qoi.decode(short).isEmpty, "raster shortfall")
  }

  test("hostile header whose w*h overflows a Long is rejected without allocating") {
    // w=0xFFFFFFFF, h=0x80000001: unsigned 32-bit fields whose product
    // ≈ 9.2e18 wraps a signed Long negative, slipping past a product-only
    // guard — the per-dimension clamp must refuse it before allocation
    val hostile = Array[Byte]('q', 'o', 'i', 'f',
      0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, // w = 0xFFFFFFFF
      0x80.toByte, 0, 0, 1, // h = 0x80000001
      3, 0) ++
      Array[Byte](0xFE.toByte, 1, 2, 3) ++ marker
    assert(Qoi.decode(hostile).isEmpty, "Long-overflow dimensions rejected")
  }
}
