package graft

import graft.operators.Tiff
import org.scalatest.funsuite.AnyFunSuite

/** The TIFF codec pair: exact roundtrips across the wire's structural
  * axes (byte order × compression × sample layout × strip geometry,
  * including the inline-vs-out-of-line strip-array branch), two-direction
  * javax.imageio interop (their reader on our bytes, our decoder on bytes
  * this repo did not author), PackBits opcode discipline, and the refusal
  * surface for legal-but-unsupported layouts. */
class TiffSpec extends AnyFunSuite {

  private def raster(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 31 + seed * 17 + 7) % 251).toByte)

  /** Low-entropy raster: long runs drive the PackBits repeat path. */
  private def runRaster(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => (((i / 9) * 13 + seed) % 5 * 40).toByte)

  test("gray roundtrip is exact across byte order, compression, strip geometry") {
    for {
      (w, h) <- Seq((7, 5), (1, 1), (16, 4), (3, 11), (130, 2))
      be <- Seq(false, true)
      pb <- Seq(false, true)
      rps <- Seq(1, 2, Int.MaxValue) // 1-row strips, partial last, single-strip inline
      px <- Seq(raster(w * h, w + h), runRaster(w * h, h))
    } {
      val bytes = Tiff.encodeGray(w, h, px, bigEndian = be, rowsPerStrip = rps,
        packBits = pb)
      val img = Tiff.decode(bytes).getOrElse(
        fail(s"refused own gray wire (w=$w h=$h be=$be pb=$pb rps=$rps)"))
      assert(img.width == w && img.height == h && img.samplesPerPixel == 1)
      assert(java.util.Arrays.equals(img.pixels, px),
        s"gray roundtrip mismatch (w=$w h=$h be=$be pb=$pb rps=$rps)")
    }
  }

  test("RGB roundtrip is exact (incl. the out-of-line BitsPerSample array)") {
    for {
      (w, h) <- Seq((7, 5), (1, 1), (9, 3))
      be <- Seq(false, true)
      pb <- Seq(false, true)
      rps <- Seq(2, Int.MaxValue)
    } {
      val px = raster(w * h * 3, w * 3 + h)
      val img = Tiff.decode(Tiff.encodeRgb(w, h, px, bigEndian = be,
        rowsPerStrip = rps, packBits = pb)).getOrElse(fail("refused own RGB wire"))
      assert(img.samplesPerPixel == 3 && java.util.Arrays.equals(img.pixels, px))
    }
  }

  test("the two byte orders produce different bytes for the same image") {
    val px = raster(7 * 5, 3)
    val ii = Tiff.encodeGray(7, 5, px, bigEndian = false, rowsPerStrip = 2)
    val mm = Tiff.encodeGray(7, 5, px, bigEndian = true, rowsPerStrip = 2)
    assert(!java.util.Arrays.equals(ii, mm))
    assert(ii(0) == 'I' && mm(0) == 'M')
    // and cross-decoding both yields the identical raster
    assert(java.util.Arrays.equals(Tiff.decode(ii).get.pixels,
      Tiff.decode(mm).get.pixels))
  }

  test("packRow: opcode caps and never the -128 noop") {
    // 200 identical bytes: repeat runs cap at 128 → two repeat ops
    val longRun = Tiff.packRow(Array.fill[Byte](200)(42))
    assert(longRun.toSeq == Seq[Byte]((1 - 128).toByte, 42, (1 - 72).toByte, 42))
    // 200 strictly alternating bytes: literals cap at 128
    val alt = Array.tabulate[Byte](200)(i => if (i % 2 == 0) 1 else 2)
    val packedAlt = Tiff.packRow(alt)
    assert(packedAlt(0) == 127) // literal of 128
    assert(!packedAlt.contains((-128).toByte))
    // mixed content unpacks exactly (decode via a 1-row image)
    val mixed: Array[Byte] = Array[Byte](5, 5, 5, 1, 2, 3) ++ Array.fill[Byte](40)(9) ++ Array[Byte](7)
    val img = Tiff.decode(Tiff.encodeGray(mixed.length, 1, mixed, packBits = true))
    assert(java.util.Arrays.equals(img.get.pixels, mixed))
  }

  test("interop: javax.imageio reads this encoder's bytes (all variants)") {
    val w = 13; val h = 7
    val px = raster(w * h, 5)
    for {
      be <- Seq(false, true)
      pb <- Seq(false, true)
      rps <- Seq(3, Int.MaxValue)
    } {
      val bytes = Tiff.encodeGray(w, h, px, bigEndian = be, rowsPerStrip = rps,
        packBits = pb)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, s"ImageIO could not read (be=$be pb=$pb rps=$rps)")
      assert(ref.getWidth == w && ref.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(ref.getRaster.getSample(x, y, 0) == (px(y * w + x) & 0xFF),
          s"pixel ($x,$y) differs (be=$be pb=$pb rps=$rps)")
    }
    // RGB + PackBits through their reader too
    val rgb = raster(w * h * 3, 6)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Tiff.encodeRgb(w, h, rgb, bigEndian = true, rowsPerStrip = 2, packBits = true)))
    assert(ref != null)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = ref.getRGB(x, y)
      val p = (y * w + x) * 3
      assert(((argb >> 16) & 0xFF) == (rgb(p) & 0xFF) &&
        ((argb >> 8) & 0xFF) == (rgb(p + 1) & 0xFF) &&
        (argb & 0xFF) == (rgb(p + 2) & 0xFF), s"RGB pixel ($x,$y)")
    }
  }

  test("interop: this decoder reads javax.imageio-authored bytes") {
    val w = 11; val h = 9
    // gray
    val gpx = raster(w * h, 8)
    val gbi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gbi.getRaster.setSample(x, y, 0, gpx(y * w + x) & 0xFF)
    val gos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gbi, "tiff", gos), "ImageIO refused gray write")
    val gimg = Tiff.decode(gos.toByteArray)
      .getOrElse(fail("refused an ImageIO-authored gray TIFF"))
    assert(gimg.width == w && gimg.height == h && gimg.samplesPerPixel == 1)
    assert(java.util.Arrays.equals(gimg.pixels, gpx))
    // RGB
    val cpx = raster(w * h * 3, 9)
    val cbi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      cbi.setRGB(x, y, ((cpx(p) & 0xFF) << 16) | ((cpx(p + 1) & 0xFF) << 8) |
        (cpx(p + 2) & 0xFF))
    }
    val cos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(cbi, "tiff", cos), "ImageIO refused RGB write")
    val cimg = Tiff.decode(cos.toByteArray)
      .getOrElse(fail("refused an ImageIO-authored RGB TIFF"))
    assert(cimg.samplesPerPixel == 3 && java.util.Arrays.equals(cimg.pixels, cpx))
  }

  test("refusal surface: unsupported-but-legal layouts decode to None, never throw") {
    val valid = Tiff.encodeGray(7, 5, raster(35, 1), rowsPerStrip = 2)
    // wrong magic
    val badMagic = valid.clone(); badMagic(2) = 41
    assert(Tiff.decode(badMagic).isEmpty)
    // mixed byte-order mark
    val badBom = valid.clone(); badBom(1) = 'M'
    assert(Tiff.decode(badBom).isEmpty)
    // 16-bit depth: patch BitsPerSample's inline value (entry 3 of the
    // IFD, value field at +8) — locate the IFD via the header offset
    def ifdOff(b: Array[Byte]): Int =
      (b(4) & 0xFF) | ((b(5) & 0xFF) << 8) | ((b(6) & 0xFF) << 16) | ((b(7) & 0xFF) << 24)
    val deep = valid.clone()
    deep(ifdOff(deep) + 2 + 12 * 2 + 8) = 16 // tag 258 is the third entry
    assert(Tiff.decode(deep).isEmpty)
    // dimension bomb: huge claimed width must refuse (before allocating)
    val bomb = valid.clone()
    val widthValue = ifdOff(bomb) + 2 + 8 // first entry (tag 256) value field
    bomb(widthValue) = 0xFF.toByte; bomb(widthValue + 1) = 0xFF.toByte
    assert(Tiff.decode(bomb).isEmpty)
    // truncation anywhere must refuse or ignore, never throw
    (0 until valid.length).foreach(k => Tiff.decode(valid.take(k)))
  }
}
