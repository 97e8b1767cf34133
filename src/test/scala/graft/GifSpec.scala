package graft

import graft.operators.Multimodal.Gif
import org.scalatest.funsuite.AnyFunSuite

/** The GIF/LZW codec: a hand-packed stream (codes laid out bit-by-bit in
  * the test) decodes to known pixels, so the variable-width LZW read path
  * is checked against the FORMAT rather than our own encoder; roundtrips
  * cover the code-width growth schedule (9→12 bits needs thousands of
  * distinct phrases), the table-full clear-and-reset path, the KwKwK
  * self-reference, and runs; malformed payloads → None (bad signature,
  * no global table, interlace flag, out-of-range code, truncated data,
  * pixel overflow). */
class GifSpec extends AnyFunSuite {

  private def rt(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    val img = Gif.decode(Gif.encode(w, h, px))
    assert(img.isDefined, "roundtrip decode failed")
    assert(img.get.width === w && img.get.height === h)
    img.get.indices
  }

  test("roundtrip: runs, KwKwK shapes, and every byte value") {
    // aaa...a forces the KwKwK code immediately (classic ababab too)
    assert(rt(8, 4, Array.fill(32)(7.toByte)).toSeq === Seq.fill(32)(7.toByte))
    val abab = Array.tabulate(32)(i => (if (i % 2 == 0) 65 else 66).toByte)
    assert(rt(8, 4, abab).toSeq === abab.toSeq)
    val all = Array.tabulate(256)(_.toByte)
    assert(rt(16, 16, all).toSeq === all.toSeq)
  }

  test("roundtrip: width growth to 12 bits and table-full clear-reset") {
    // deterministic pseudo-random bytes: enough distinct phrases to walk
    // the code width 9→12 and overflow the 4096-entry table (the encoder
    // emits a mid-stream CLEAR; the decoder must resync)
    val n = 256 * 192
    val px = Array.tabulate(n)(i => ((i * 2654435761L >>> 13) & 0xFF).toByte)
    assert(rt(256, 192, px).toSeq === px.toSeq)
  }

  test("hand-packed stream decodes against the format, not our encoder") {
    // 4 pixels "ABAB" as pure literals with a clear before and between:
    // codes (9-bit, LSB-first): CLEAR(256) A(65) B(66) A(65) B(66) EOI(257)
    val codes = Seq(256, 65, 66, 65, 66, 257)
    var acc = 0L; var nbits = 0
    val data = new java.io.ByteArrayOutputStream()
    codes.foreach { c =>
      acc |= c.toLong << nbits; nbits += 9
      while (nbits >= 8) { data.write((acc & 0xFF).toInt); acc >>>= 8; nbits -= 8 }
    }
    if (nbits > 0) data.write((acc & 0xFF).toInt)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](4, 0, 1, 0)) // 4×1 logical screen
    out.write(0xF7); out.write(0); out.write(0)
    (0 until 256).foreach(i => { out.write(i); out.write(i); out.write(i) })
    out.write(0x2C); out.write(Array[Byte](0, 0, 0, 0, 4, 0, 1, 0, 0))
    out.write(8) // LZW min code size
    val d = data.toByteArray
    out.write(d.length); out.write(d)
    out.write(0); out.write(0x3B)
    val img = Gif.decode(out.toByteArray)
    assert(img.isDefined, "hand-packed stream must decode")
    assert(img.get.indices.toSeq === Seq[Byte](65, 66, 65, 66))
    // palette came through (grayscale identity)
    assert((img.get.palette(65 * 3) & 0xFF) === 65)
  }

  test("deferred-clear stream: the full table is read-only, never overwritten") {
    // a foreign encoder may keep using the FULL table without emitting
    // CLEAR ("deferred clear", legal GIF). After the last entry (4095) is
    // defined, later codes must decode via the defined entries — a
    // decoder that keeps computing a slot from the saturated counter
    // overwrites entry 4095 on every arrival and emits wrong pixels.
    val MinCode = 8; val Clear = 256; val Eoi = 257; val Base = 258
    val MaxSlots = 4096
    // 3839 literals: the first + 3838 defining arrivals fill 258..4095
    val lits = Array.tabulate(MaxSlots - Base + 1)(j => j % 251)
    var acc = 0L; var nbits = 0
    val data = new java.io.ByteArrayOutputStream()
    var width = MinCode + 1; var counter = Base
    def put(c: Int): Unit = {
      acc |= c.toLong << nbits; nbits += width
      while (nbits >= 8) { data.write((acc & 0xFF).toInt); acc >>>= 8; nbits -= 8 }
    }
    // the decoder's width schedule, mirrored (incl. the phantom first slot)
    def bump(): Unit =
      if (counter < MaxSlots) {
        counter += 1; if (counter > (1 << width) && width < 12) width += 1
      }
    put(Clear)
    lits.foreach { l => put(l); bump() }
    // table now truly full. A literal (prev moves), then code 4095 — it
    // must decode to the entry defined at its one legitimate arrival,
    // [lits(3837), lits(3838)] = [72, 73], NOT to [7, 7] (what an
    // overwriting decoder's kwkwk path would emit here)
    put(7)
    put(MaxSlots - 1)
    put(Eoi)
    if (nbits > 0) data.write((acc & 0xFF).toInt)
    val expected = lits.map(_.toByte) ++
      Array(7.toByte, lits(lits.length - 2).toByte, lits(lits.length - 1).toByte)
    val w = expected.length; val h = 1
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xFF); out.write(w >> 8); out.write(h & 0xFF); out.write(h >> 8)
    out.write(0xF7); out.write(0); out.write(0)
    (0 until 256).foreach(i => { out.write(i); out.write(i); out.write(i) })
    out.write(0x2C); out.write(Array[Byte](0, 0, 0, 0))
    out.write(w & 0xFF); out.write(w >> 8); out.write(h & 0xFF); out.write(h >> 8)
    out.write(0)
    out.write(MinCode)
    val d = data.toByteArray
    var off = 0
    while (off < d.length) {
      val n = math.min(255, d.length - off)
      out.write(n); out.write(d, off, n); off += n
    }
    out.write(0); out.write(0x3B)
    val img = Gif.decode(out.toByteArray)
    assert(img.isDefined, "well-formed deferred-clear stream must decode")
    assert(img.get.indices.toSeq === expected.toSeq,
      "full-table codes must decode via the defined entries")
  }

  test("malformed payloads decode to None, never to wrong pixels") {
    val good = Gif.encode(8, 4, Array.fill(32)(9.toByte))
    assert(Gif.decode("NOTAGIF!".getBytes ++ good.drop(8)).isEmpty, "bad signature")
    // clear the global-color-table flag
    val noTable = good.clone(); noTable(10) = (noTable(10) & 0x7F).toByte
    assert(Gif.decode(noTable).isEmpty, "missing global table")
    // set the interlace flag in the image descriptor (offset: 13 header
    // + 768 table + 9 descriptor; packed byte is its last byte)
    val inter = good.clone(); inter(13 + 768 + 9) = (inter(13 + 768 + 9) | 0x40).toByte
    assert(Gif.decode(inter).isEmpty, "interlace must be rejected, not mis-decoded")
    assert(Gif.decode(good.dropRight(8)).isEmpty, "truncated stream")
    // declare a 2-entry global table while minCode stays 8: indices could
    // run past the palette — must reject, not crash downstream
    val smallTable = good.clone(); smallTable(10) = 0xF0.toByte
    assert(Gif.decode(smallTable).isEmpty, "under-sized global table")
    // too many pixels for the declared raster: shrink declared dims only
    val shrunk = good.clone()
    shrunk(6) = 2; shrunk(13 + 768 + 5) = 2 // logical + image width 8→2
    assert(Gif.decode(shrunk).isEmpty, "pixel overflow must fail, not truncate")
  }

  test("extension blocks are skipped, not rejected") {
    val good = Gif.encode(8, 4, Array.tabulate(32)(_.toByte))
    // splice a graphic-control extension between the table and descriptor
    val ext = Array[Byte](0x21, 0xF9.toByte, 4, 0, 0, 0, 0, 0)
    val at = 13 + 768
    val spliced = good.take(at) ++ ext ++ good.drop(at)
    val img = Gif.decode(spliced)
    assert(img.isDefined && img.get.indices.toSeq === Array.tabulate(32)(_.toByte).toSeq)
  }
}
