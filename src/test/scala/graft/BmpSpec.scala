package graft

import graft.operators.Multimodal.Bmp
import org.scalatest.funsuite.AnyFunSuite

/** The BMP codec against the published DIB layout: a hand-built 24-bit
  * file (headers, BGR order, bottom-up rows, stride padding written out
  * by hand) decodes to known pixels, so the wire walk is checked against
  * the SPEC rather than our own encoder; roundtrips cover all three
  * layouts (24-bit bottom-up/top-down, 8-bit uncompressed, RLE8) with
  * the padding and the run/absolute/EOL/EOB opcodes load-bearing;
  * malformed payloads → None (bad magic, V5 header, bad bitcount or
  * compression combos, short pixel arrays, runs crossing a row, partial
  * rows at EOL, the delta opcode, out-of-palette indexes, missing EOB,
  * trailing bytes), never wrong pixels. */
class BmpSpec extends AnyFunSuite {

  private def rgb(vals: Int*): Array[Byte] = vals.map(_.toByte).toArray

  private def raster(w: Int, h: Int, seed: Int = 7): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) { px(i) = ((i * 31 + seed * 17) % 251).toByte; i += 1 }
    px
  }

  // ---- golden vector: hand-built 2×2 24-bit file --------------------

  test("hand-built 24-bit file decodes to spec pixels (BGR, bottom-up, padding)") {
    // pixels (top-down RGB): row0 = (1,2,3),(4,5,6); row1 = (7,8,9),(10,11,12)
    // file rows are BOTTOM-UP and BGR: row1 first, each 2*3=6 bytes + 2 pad
    val stride = 8
    val b = new java.io.ByteArrayOutputStream()
    def w16(v: Int) = { b.write(v & 0xFF); b.write((v >>> 8) & 0xFF) }
    def w32(v: Int) = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    b.write('B'); b.write('M'); w32(54 + stride * 2); w16(0); w16(0); w32(54)
    w32(40); w32(2); w32(2); w16(1); w16(24); w32(0)
    w32(stride * 2); w32(2835); w32(2835); w32(0); w32(0)
    Seq(Seq(9, 8, 7, 12, 11, 10), Seq(3, 2, 1, 6, 5, 4)).foreach { row =>
      row.foreach(b.write); b.write(0); b.write(0)
    }
    val img = Bmp.decode(b.toByteArray).get
    assert(img.width === 2 && img.height === 2)
    assert(img.pixels.toSeq === rgb(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12).toSeq)
  }

  // ---- roundtrips ----------------------------------------------------

  test("24-bit roundtrip identity across widths (stride padding 0..3)") {
    for (w <- 1 to 9; h <- Seq(1, 2, 5)) {
      val px = raster(w, h)
      val img = Bmp.decode(Bmp.encode24(w, h, px)).get
      assert(img.width === w && img.height === h, s"dims at $w x $h")
      assert(img.pixels.toSeq === px.toSeq, s"pixels at $w x $h")
    }
  }

  test("top-down 24-bit decodes to the same raster, different wire bytes") {
    val px = raster(7, 5)
    val bottomUp = Bmp.encode24(7, 5, px)
    val topDown = Bmp.encode24(7, 5, px, topDown = true)
    assert(!java.util.Arrays.equals(bottomUp, topDown))
    assert(Bmp.decode(topDown).get.pixels.toSeq === px.toSeq)
  }

  test("8-bit uncompressed roundtrip identity (palette + row stride)") {
    for (w <- Seq(1, 3, 4, 7)) {
      val px = raster(w, 5)
      assert(Bmp.decode(Bmp.encode8(w, 5, px)).get.pixels.toSeq === px.toSeq)
    }
  }

  test("RLE8 roundtrip identity: literals, runs, and the padded tail") {
    // text-like head (distinct colors → absolute blocks / count-1 runs)
    // and a zero tail (encoded runs), the q119 shape
    val px = java.util.Arrays.copyOf(
      "The quick brown fox jumps over the lazy dog".getBytes("UTF-8"), 7 * 5 * 3)
    assert(Bmp.decode(Bmp.encodeRle8(7, 5, px)).get.pixels.toSeq === px.toSeq)
  }

  test("RLE8 roundtrip on adversarial rasters (all-same, all-distinct, alternating)") {
    val w = 11; val h = 3
    val allSame = Array.fill[Byte](w * h * 3)(42)
    val allDistinct = raster(w, h)
    val alternating = {
      val px = new Array[Byte](w * h * 3)
      var p = 0
      while (p < w * h) { px(p * 3) = (p % 2).toByte; p += 1 }
      px
    }
    Seq(allSame, allDistinct, alternating).foreach { px =>
      assert(Bmp.decode(Bmp.encodeRle8(w, h, px)).get.pixels.toSeq === px.toSeq)
    }
  }

  test("RLE8 run splitting at the 255 count cap (601-wide single color)") {
    val w = 601
    val px = Array.fill[Byte](w * 3)(9)
    assert(Bmp.decode(Bmp.encodeRle8(w, 1, px)).get.pixels.toSeq === px.toSeq)
  }

  test("RLE8 absolute blocks split at 255 literals (300 distinct colors in a row... capped palette)") {
    // 256 distinct colors is the palette ceiling; a 256-wide all-distinct
    // row forces a 255-literal absolute block plus a 1-literal remainder
    val w = 256
    val px = new Array[Byte](w * 3)
    var x = 0
    while (x < w) { px(x * 3) = x.toByte; x += 1 }
    assert(Bmp.decode(Bmp.encodeRle8(w, 1, px)).get.pixels.toSeq === px.toSeq)
  }

  test("encodeRle8 refuses a raster with more than 256 distinct colors") {
    val w = 257
    val px = new Array[Byte](w * 3)
    var x = 0
    while (x < w) { px(x * 3) = x.toByte; px(x * 3 + 1) = (x >> 8).toByte; x += 1 }
    assertThrows[IllegalArgumentException](Bmp.encodeRle8(w, 1, px))
  }

  // ---- refusals (S8: None, never wrong pixels) -----------------------

  private val good24 = Bmp.encode24(7, 5, raster(7, 5))
  private val goodRle = Bmp.encodeRle8(7, 5, raster(7, 5))

  private def patched(src: Array[Byte], at: Int, v: Int): Array[Byte] = {
    val b = src.clone(); b(at) = v.toByte; b
  }

  test("malformed 24-bit payloads refuse") {
    assert(Bmp.decode(Array.empty[Byte]).isEmpty)
    assert(Bmp.decode(patched(good24, 0, 'b')).isEmpty, "bad magic")
    assert(Bmp.decode(good24.dropRight(1)).isEmpty, "short pixel array + fileSize mismatch")
    assert(Bmp.decode(good24 :+ 0.toByte).isEmpty, "trailing byte")
    assert(Bmp.decode(patched(good24, 14, 124)).isEmpty, "BITMAPV5 header size")
    assert(Bmp.decode(patched(good24, 28, 16)).isEmpty, "16-bit depth")
    assert(Bmp.decode(patched(good24, 26, 2)).isEmpty, "planes != 1")
    assert(Bmp.decode(patched(good24, 30, 1)).isEmpty, "RLE on 24-bit")
    // width 7→9 changes the stride (24→28) so the pixel array no longer
    // fills the file; 7→8 would NOT be detectable — stride stays 24 and
    // the padding bytes legally become pixels of a valid 8-wide image
    assert(Bmp.decode(patched(good24, 18, 9)).isEmpty, "width lies about the array")
    assert(Bmp.decode(patched(good24, 18, 8)).exists(_.width == 8),
      "width 8 reinterprets the padding as pixels — self-consistent, must decode")
    // hostile dims: width beyond the clamp must refuse before allocating
    val hostile = patched(patched(good24, 20, 0x7F), 21, 0x7F)
    assert(Bmp.decode(hostile).isEmpty)
  }

  test("malformed RLE8 payloads refuse") {
    val off = goodRle.length - 2 // the EOB opcode
    assert((goodRle(off) & 0xFF) === 0 && (goodRle(off + 1) & 0xFF) === 1)
    assert(Bmp.decode(goodRle.dropRight(2)).isEmpty, "missing EOB (fileSize catches)")
    val noEob = goodRle.dropRight(2) // re-sign the size so the WALKER refuses
    noEob(2) = (noEob.length & 0xFF).toByte
    noEob(3) = ((noEob.length >>> 8) & 0xFF).toByte
    assert(Bmp.decode(noEob).isEmpty, "missing EOB (walker hits stream end)")
    assert(Bmp.decode(goodRle ++ Array[Byte](0, 1)).isEmpty, "bytes after EOB (fileSize catches)")
    assert(Bmp.decode(patched(goodRle, off + 1, 2)).isEmpty, "delta opcode")
    // run crossing the row boundary: first opcode of a 7-wide row gets count 8
    val palBytes = goodRle.length - 54 - ru32(goodRle, 34) // 34 = biSizeImage
    assert(palBytes % 4 === 0)
    val firstOp = 54 + palBytes
    val overRun = goodRle.clone()
    if ((overRun(firstOp) & 0xFF) > 0) overRun(firstOp) = 8
    else { overRun(firstOp) = 8; overRun(firstOp + 1) = 0 }
    assert(Bmp.decode(overRun).isEmpty, "run crossing row boundary")
    // out-of-palette index in an encoded run
    val badIdx = goodRle.clone()
    if ((badIdx(firstOp) & 0xFF) > 0) badIdx(firstOp + 1) = 255.toByte
    else badIdx(firstOp + 2) = 255.toByte
    assert(Bmp.decode(badIdx).isEmpty, "palette index past the table")
  }

  private def ru32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) |
      ((b(o + 3) & 0xFF) << 24)

  test("hostile RLE8 dims refuse before allocation (payload cannot cover the raster)") {
    // header claims 4096×4096 (16.7M pixels) but carries 8 bytes of RLE
    // data; every 2-byte opcode paints at most 255 pixels, so 8 bytes cap
    // out at 1020 — the walker must refuse on that bound BEFORE touching
    // the raster, not allocate 50 MB and fail mid-walk
    val b = new java.io.ByteArrayOutputStream()
    def w16(v: Int) = { b.write(v & 0xFF); b.write((v >>> 8) & 0xFF) }
    def w32(v: Int) = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    val rle = Array[Byte](255.toByte, 0, 255.toByte, 0, 255.toByte, 0, 0, 1)
    b.write('B'); b.write('M'); w32(54 + 4 + rle.length); w16(0); w16(0); w32(54 + 4)
    w32(40); w32(4096); w32(4096); w16(1); w16(8); w32(1)
    w32(rle.length); w32(2835); w32(2835); w32(1); w32(0)
    b.write(0); b.write(0); b.write(0); b.write(0)
    rle.foreach(b.write(_))
    assert(Bmp.decode(b.toByteArray).isEmpty)
  }

  test("RLE8 partial row at EOL refuses (undefined pixels are never guessed)") {
    // hand-build: 2×2, palette {0}, row encodes only 1 of 2 pixels then EOL
    val b = new java.io.ByteArrayOutputStream()
    def w16(v: Int) = { b.write(v & 0xFF); b.write((v >>> 8) & 0xFF) }
    def w32(v: Int) = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    val rle = Array[Byte](1, 0, 0, 0, 2, 0, 0, 1) // 1px, EOL, full row, EOB
    b.write('B'); b.write('M'); w32(54 + 4 + rle.length); w16(0); w16(0); w32(54 + 4)
    w32(40); w32(2); w32(2); w16(1); w16(8); w32(1)
    w32(rle.length); w32(2835); w32(2835); w32(1); w32(0)
    b.write(0); b.write(0); b.write(0); b.write(0) // palette: one black entry
    rle.foreach(b.write(_))
    assert(Bmp.decode(b.toByteArray).isEmpty)
  }

  test("q118/q119 stats agree with each other and with the raw raster") {
    import graft.operators.Multimodal
    val doc = (5L, "hello bmp world, padded with zeros".getBytes("UTF-8"))
    val s24 = Multimodal.decodeBmpStats(Multimodal.synthesizeBmp(Iterator(doc))).toSeq
    val sRle = Multimodal.decodeBmpStats(Multimodal.synthesizeBmpRle(Iterator(doc))).toSeq
    assert(s24 === sRle)
    val px = java.util.Arrays.copyOf(doc._2, Multimodal.BmpW * Multimodal.BmpH * 3)
    val n = Multimodal.BmpW * Multimodal.BmpH
    val meanR = px.indices.filter(_ % 3 == 0).map(px(_) & 0xFF).sum.toDouble / n
    assert(s24.head.mean_r === meanR)
  }
}
