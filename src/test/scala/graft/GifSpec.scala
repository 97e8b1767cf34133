package graft

import graft.operators.Multimodal.Gif
import org.scalatest.funsuite.AnyFunSuite

/** The GIF/LZW codec: a hand-packed stream (codes laid out bit-by-bit in
  * the test) decodes to known pixels, so the variable-width LZW read path
  * is checked against the FORMAT rather than our own encoder; roundtrips
  * cover the code-width growth schedule (9→12 bits needs thousands of
  * distinct phrases), the table-full clear-and-reset path, the KwKwK
  * self-reference, and runs, plus (round 15) the four-pass interlace row
  * permutation; malformed payloads → None (bad signature, no global
  * table, out-of-range code, truncated data, pixel overflow). */
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

  test("interlaced roundtrip: the four-pass row permutation inverts exactly") {
    val px = Array.tabulate(80)(i => ((i * 13 + 5) & 0xFF).toByte) // 8×10: every pass populated
    val inter = Gif.decode(Gif.encode(8, 10, px, interlaced = true))
    assert(inter.isDefined, "interlaced decode failed")
    assert(inter.get.indices.toSeq === px.toSeq, "de-interlaced rows diverged")
    assert(!java.util.Arrays.equals(
      Gif.encode(8, 10, px, interlaced = true), Gif.encode(8, 10, px)),
      "interlaced stream identical to straight — permutation vacuous")
    // degenerate heights: later passes legally start beyond the image
    for (h <- Seq(1, 2, 3, 4, 5)) {
      val p2 = Array.tabulate(8 * h)(i => ((i * 7 + h) & 0xFF).toByte)
      assert(Gif.decode(Gif.encode(8, h, p2, interlaced = true)).get.indices.toSeq
        === p2.toSeq, s"h=$h roundtrip diverged")
    }
  }

  test("malformed payloads decode to None, never to wrong pixels") {
    val good = Gif.encode(8, 4, Array.fill(32)(9.toByte))
    assert(Gif.decode("NOTAGIF!".getBytes ++ good.drop(8)).isEmpty, "bad signature")
    // clear the global-color-table flag
    val noTable = good.clone(); noTable(10) = (noTable(10) & 0x7F).toByte
    assert(Gif.decode(noTable).isEmpty, "missing global table")
    // the ANIMATION path still refuses interlaced frames (compositing
    // them is out of scope — see Gif scaladoc); flag offset: 13 header
    // + 768 table + 9 descriptor; packed byte is its last byte
    val inter = good.clone(); inter(13 + 768 + 9) = (inter(13 + 768 + 9) | 0x40).toByte
    assert(Gif.decodeFrames(inter).isEmpty,
      "animation decode must refuse interlaced frames, not mis-composite")
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

  test("animation roundtrip: frames, per-frame delays, loop block skipped") {
    val frames = Seq(
      Array.fill(32)(3.toByte),
      Array.tabulate(32)(_.toByte),
      Array.tabulate(32)(i => (255 - i).toByte))
    val delays = Seq(10, 0, 250) // a zero delay must survive the roundtrip
    val bytes = Gif.encodeAnimation(8, 4, frames, delays, loops = 2)
    val anim = Gif.decodeFrames(bytes)
    assert(anim.isDefined, "animation roundtrip decode failed")
    assert(anim.get.width === 8 && anim.get.height === 4)
    assert(anim.get.frames.map(_.toSeq) === frames.map(_.toSeq))
    assert(anim.get.delaysCs === delays)
    // the single-frame reader applied to an animation must refuse (its
    // contract is one image then trailer), not emit the first frame as
    // if it were the whole file
    assert(Gif.decode(bytes).isEmpty,
      "single-frame decode must not silently truncate an animation")
    // and decodeFrames over a plain single-frame GIF is the degenerate
    // animation: one frame, delay 0
    val single = Gif.encode(8, 4, frames(1))
    val asAnim = Gif.decodeFrames(single)
    assert(asAnim.isDefined && asAnim.get.frames.length === 1)
    assert(asAnim.get.frames.head.toSeq === frames(1).toSeq)
    assert(asAnim.get.delaysCs === Seq(0))
  }

  test("animation malformed cases: partial frames, zero frames, truncation → None") {
    val frames = Seq(Array.fill(32)(1.toByte), Array.fill(32)(2.toByte))
    val bytes = Gif.encodeAnimation(8, 4, frames, Seq(5, 5))
    // offset the second frame's descriptor (left = 1): compositing is a
    // renderer's job — emitting the raw partial raster would be wrong
    // pixels, so the decoder must refuse
    val secondDesc = {
      // walk the block structure (a byte SCAN would false-positive on
      // 0x2C inside LZW data): header 13 + table 768 + NETSCAPE app
      // extension 19 + graphic control 8 → first descriptor; then skip
      // its 9 desc bytes + minCode + sub-blocks + terminator + the
      // second control block
      var pos = 13 + 768 + 19 + 8
      assert((bytes(pos) & 0xFF) === 0x2C, "layout walk lost the first descriptor")
      pos += 1 + 9 + 1 // introducer + descriptor + minCode
      var n = bytes(pos) & 0xFF
      while (n != 0) { pos += 1 + n; n = bytes(pos) & 0xFF }
      pos += 1 + 8
      assert((bytes(pos) & 0xFF) === 0x2C, "layout walk lost the second descriptor")
      pos
    }
    val partial = bytes.clone(); partial(secondDesc + 1) = 1 // left = 1
    assert(Gif.decodeFrames(partial).isEmpty, "partial frame must be rejected")
    // trailer with no frames at all
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](8, 0, 4, 0)); out.write(0xF7); out.write(0); out.write(0)
    (0 until 256).foreach(i => { out.write(i); out.write(i); out.write(i) })
    out.write(0x3B)
    assert(Gif.decodeFrames(out.toByteArray).isEmpty, "zero frames must be rejected")
    // truncation mid-second-frame
    assert(Gif.decodeFrames(bytes.dropRight(10)).isEmpty, "truncated animation")
  }

  test("composited decode: disposal 1/2/3 + transparency on the q108 fixture shape") {
    // the q108 fixture, hand-walked: doc "ab cd" (the space at byte 2
    // makes transparency fire in frame 2)
    val txt = "ab cd".getBytes("US-ASCII")
    val full = java.util.Arrays.copyOf(txt, 32)
    val shifted = Array.tabulate[Byte](8)(j => if (j + 2 < txt.length) txt(j + 2) else 0)
    val C = 200.toByte
    val bytes = Gif.encodeAnimationSubframes(8, 4, Seq(
      Gif.SubFrame(0, 0, 8, 4, full, 10, 2, None),
      Gif.SubFrame(1, 1, 6, 2, Array.fill(12)(C), 11, 1, None),
      Gif.SubFrame(2, 1, 4, 2, shifted, 12, 3, Some(32)),
      Gif.SubFrame(0, 3, 8, 1, Array.fill[Byte](8)(77), 13, 0, None)))
    val anim = Gif.decodeComposited(bytes)
    assert(anim.isDefined, "composited decode failed")
    val a = anim.get
    assert(a.width === 8 && a.height === 4)
    assert(a.delaysCs === Seq(10, 11, 12, 13))
    def sum(fr: Array[Byte]) = fr.map(_ & 0xFF).map(_.toLong).sum
    def px(fr: Array[Byte], row: Int, col: Int) = fr(row * 8 + col) & 0xFF
    // frame 0: the raw doc raster (97+98+32+99+100)
    assert(sum(a.frames(0)) === 426L)
    // frame 1: disposal 2 on frame 0 restored the canvas to background 0,
    // then rect R (cols 1..6 × rows 1..2) filled with 200
    assert(sum(a.frames(1)) === 2400L)
    assert(px(a.frames(1), 0, 0) === 0, "outside R must be background")
    assert(px(a.frames(1), 1, 1) === 200)
    // frame 2: R2 ⊆ R lands the shifted bytes; the space (32) is
    // TRANSPARENT, showing the 200 underneath; the padding 0s are OPAQUE
    assert(px(a.frames(2), 1, 2) === 200, "transparent space must show the canvas")
    assert(px(a.frames(2), 1, 3) === 99)
    assert(px(a.frames(2), 1, 4) === 100)
    assert(px(a.frames(2), 1, 5) === 0, "opaque zero must overwrite the canvas")
    assert(px(a.frames(2), 1, 6) === 200, "R \\ R2 keeps frame 1's fill")
    assert(sum(a.frames(2)) === (200L * 4 + 200 + 99 + 100))
    // frame 3: disposal 3 on frame 2 RESTORED the pre-frame canvas — its
    // doc pixels must be gone (doc-independent sum), and the disjoint
    // row-3 rect carries 77
    assert(px(a.frames(3), 1, 3) === 200, "disposal 3 must erase frame 2's pixels")
    assert(px(a.frames(3), 3, 0) === 77)
    assert(sum(a.frames(3)) === (200L * 12 + 77L * 8))
  }

  test("composited decode: partial-rect disposal 2 restores only its rect") {
    val bytes = Gif.encodeAnimationSubframes(8, 4, Seq(
      Gif.SubFrame(0, 0, 8, 4, Array.fill[Byte](32)(5), 1, 1, None),
      Gif.SubFrame(0, 0, 2, 2, Array.fill[Byte](4)(9), 1, 2, None),
      Gif.SubFrame(7, 3, 1, 1, Array[Byte](1), 1, 0, None)))
    val a = Gif.decodeComposited(bytes).get
    def px(fr: Array[Byte], row: Int, col: Int) = fr(row * 8 + col) & 0xFF
    assert(px(a.frames(1), 0, 0) === 9)
    assert(px(a.frames(2), 0, 0) === 0, "disposal 2 must clear ITS rect to background")
    assert(px(a.frames(2), 0, 2) === 5, "disposal 2 must not touch outside its rect")
    assert(px(a.frames(2), 3, 7) === 1)
  }

  test("composited decode agrees with decodeFrames on full-frame opaque animations") {
    val frames = Seq(
      Array.tabulate(32)(_.toByte),
      Array.tabulate(32)(i => (255 - i).toByte))
    val bytes = Gif.encodeAnimation(8, 4, frames, Seq(5, 7))
    val raw = Gif.decodeFrames(bytes).get
    val comp = Gif.decodeComposited(bytes).get
    assert(comp.frames.map(_.toSeq) === raw.frames.map(_.toSeq),
      "full-frame opaque compositing must equal the raw rasters")
    assert(comp.delaysCs === raw.delaysCs)
  }

  test("composited decode malformed cases: reserved disposal, escaping rect → None") {
    val bytes = Gif.encodeAnimationSubframes(8, 4, Seq(
      Gif.SubFrame(0, 0, 8, 4, Array.fill[Byte](32)(5), 1, 1, None)))
    // the first graphic-control packed byte: header 13 + table 768 +
    // NETSCAPE extension 19 + (0x21 0xF9 0x04) → offset +3
    val ctl = 13 + 768 + 19 + 3
    assert((bytes(ctl - 1) & 0xFF) === 4, "layout walk lost the control block")
    val badDisp = bytes.clone(); badDisp(ctl) = (4 << 2).toByte
    assert(Gif.decodeComposited(badDisp).isEmpty,
      "reserved disposal method must be rejected")
    // descriptor left=1 on a full-width frame → rect escapes the canvas
    val desc = ctl + 5 // packed, delay(2), tIdx, terminator → 0x2C
    assert((bytes(desc) & 0xFF) === 0x2C, "layout walk lost the descriptor")
    val badRect = bytes.clone(); badRect(desc + 1) = 1
    assert(Gif.decodeComposited(badRect).isEmpty,
      "a rect escaping the canvas must be rejected")
    // the encoder refuses to build either state
    intercept[IllegalArgumentException] {
      Gif.encodeAnimationSubframes(8, 4, Seq(
        Gif.SubFrame(1, 0, 8, 4, Array.fill[Byte](32)(5), 1, 1, None)))
    }
    intercept[IllegalArgumentException] {
      Gif.encodeAnimationSubframes(8, 4, Seq(
        Gif.SubFrame(0, 0, 8, 4, Array.fill[Byte](32)(5), 1, 4, None)))
    }
  }

  test("frame sampling (q135): sampled rows ≡ full decode at the stride, timestamps = delay prefix sums") {
    import graft.operators.Multimodal
    val txt = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val clip = Multimodal.synthesizeGifClip(Iterator((7L, txt))).toSeq
    val samples = Multimodal.sampleGifFrames(clip.iterator).toSeq
    val anim = Gif.decodeFrames(clip.head._2).get
    assert(anim.frames.length === Multimodal.GifSampleFrames)
    val wantIdx = 0 until Multimodal.GifSampleFrames by Multimodal.GifSampleStride
    assert(samples.map(_.frame_idx) === wantIdx.toSeq)
    val starts = anim.delaysCs.scanLeft(0)(_ + _)
    samples.foreach { smp =>
      assert(smp.doc_id === 7L)
      assert(smp.t_cs === starts(smp.frame_idx),
        s"frame ${smp.frame_idx} start timestamp")
      // frame f is the doc bytes shifted by f, zero-padded: recompute the
      // mean from the SOURCE bytes, independent of the decode path
      val n = anim.width * anim.height
      val want = (0 until n).map(j =>
        if (j + smp.frame_idx < txt.length) txt(j + smp.frame_idx) & 0xFF else 0).sum
      assert(smp.mean_px === want.toDouble / n, s"frame ${smp.frame_idx} mean")
    }
  }
}
