package graft

import graft.operators.{Jpeg, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** The baseline JPEG codec's example-based gate (CodecPropertySpec holds
  * the property tier): a hand-assembled golden bitstream checked against
  * an independent IDCT, two-direction interop with the JDK's own JPEG
  * codec (javax.imageio — bytes this repo did not author), the JFIF
  * color transform against the published formula, restart-marker wire
  * presence, and the refusal ladder for everything outside baseline
  * sequential. */
class JpegSpec extends AnyFunSuite {

  private def blockGray(bw: Int, bh: Int, blocks: Array[Byte]): Array[Byte] = {
    val (w, h) = (bw * 8, bh * 8)
    Array.tabulate[Byte](w * h)(i => blocks((i / w / 8) * bw + (i % w / 8)))
  }

  test("flat-block grayscale roundtrip is exact and the wire carries RSTn markers") {
    val blocks = Array.tabulate(Multimodal.JpegBw * Multimodal.JpegBh)(
      i => ((i * 71 + 13) % 256).toByte)
    val gray = blockGray(Multimodal.JpegBw, Multimodal.JpegBh, blocks)
    val bytes = Jpeg.encodeGray(Multimodal.JpegW, Multimodal.JpegH, gray,
      restartInterval = 3)
    // RST0.. must be physically on the wire (35 MCUs / 3 → 11 restarts)
    val rsts = bytes.sliding(2).count(p =>
      (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) >= 0xD0 && (p(1) & 0xFF) <= 0xD7)
    assert(rsts === 11, s"expected 11 restart markers, found $rsts")
    val img = Jpeg.decode(bytes).getOrElse(fail("decode refused a valid stream"))
    assert(img.width === Multimodal.JpegW && img.height === Multimodal.JpegH)
    assert(java.util.Arrays.equals(img.pixels, gray),
      "flat-block roundtrip not exact")
  }

  test("hand-assembled golden bitstream decodes to the independent IDCT's output") {
    // one 8×8 grayscale block, quant all ones, hand-chosen coefficients:
    // DC = 5 (diff 5, category 3), one AC at zigzag position 1 with value
    // -2 (run 0, size 2), then EOB. Hand tables: DC symbols 0..11 all at
    // length 4 (code = symbol); AC symbols {EOB=0x00 -> '0', 0x02 -> '1'}.
    // Entropy bits: 0101(DC cat... ) — see the byte comments below.
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(out.write)
    b(0xFF, 0xD8) // SOI
    b(0xFF, 0xDB, 0x00, 0x43, 0x00) // DQT len 67, Pq=0 Tq=0
    (0 until 64).foreach(_ => out.write(1))
    b(0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x00, 0x08, 0x00, 0x08, 0x01, 0x01,
      0x11, 0x00) // SOF0: 8-bit, 8x8, 1 comp, HV 1x1, Tq 0
    b(0xFF, 0xC4, 0x00, 0x1F, 0x00) // DHT DC: len 31, class 0 id 0
    b(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) // 12 codes of len 4
    (0 to 11).foreach(out.write) // symbol s -> code s (4 bits)
    b(0xFF, 0xC4, 0x00, 0x15, 0x10) // DHT AC: len 21, class 1 id 0
    b(2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) // 2 codes of len 1
    b(0x00, 0x02) // EOB -> '0', (run 0, size 2) -> '1'
    b(0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3F, 0x00) // SOS
    // entropy: DC cat 3 = '0011', diff 5 = '101'; AC '1' + (-2 -> '01');
    // EOB '0'  =>  0011 1011 0100 + 1-padding = 0x3B 0x5F
    b(0x3B, 0x5F)
    b(0xFF, 0xD9) // EOI
    val img = Jpeg.decode(out.toByteArray)
      .getOrElse(fail("golden bitstream refused"))
    // independent IDCT: coefficients placed by THIS test, not the codec —
    // DC 5 at natural (0,0), AC -2 at natural (0,1) (zigzag position 1)
    def cc(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    val want = Array.tabulate(64) { p =>
      val (x, y) = (p % 8, p / 8)
      def cos(a: Int, f: Int) = math.cos((2 * a + 1) * f * math.Pi / 16.0)
      val s = cc(0) * cc(0) * 5.0 +
        cc(1) * cc(0) * (-2.0) * cos(x, 1) // AC at (u=1, v=0)
      math.max(0, math.min(255, math.round(0.25 * s + 128.0).toInt))
    }
    assert(img.pixels.map(_ & 0xFF).toSeq === want.toSeq,
      "decoder disagrees with the independent IDCT on the golden stream")
  }

  test("interop: javax.imageio-authored grayscale JPEG decodes within IDCT tolerance") {
    val (w, h) = (40, 24)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until h).foreach(y => (0 until w).foreach { x =>
      val v = (x * 9 + y * 5) % 256
      bi.getRaster.setSample(x, y, 0, v)
    })
    val os = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", os), "ImageIO refused to write")
    val bytes = os.toByteArray
    val mine = Jpeg.decode(bytes)
      .getOrElse(fail("refused an ImageIO-authored baseline JPEG"))
    assert(mine.width === w && mine.height === h && mine.nComponents === 1)
    // reference = the JDK's own decode of the same bytes; IDCT and
    // rounding differ per T.83 tolerances, so allow ±2 per sample
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val maxDiff = (0 until h).flatMap(y => (0 until w).map { x =>
      math.abs((mine.pixels(y * w + x) & 0xFF) - ref.getRaster.getSample(x, y, 0))
    }).max
    assert(maxDiff <= 2, s"max sample diff vs ImageIO decode: $maxDiff")
  }

  test("interop: this encoder's output is readable by javax.imageio") {
    val (w, h) = (24, 16)
    val gray = Array.tabulate(w * h)(i => ((i * 37 + 11) % 251).toByte)
    val bytes = Jpeg.encodeGray(w, h, gray)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null, "ImageIO could not read this encoder's stream")
    assert(ref.getWidth === w && ref.getHeight === h)
    val mine = Jpeg.decode(bytes).getOrElse(fail("own stream refused"))
    val maxDiff = (0 until h).flatMap(y => (0 until w).map { x =>
      math.abs((mine.pixels(y * w + x) & 0xFF) - ref.getRaster.getSample(x, y, 0))
    }).max
    assert(maxDiff <= 2, s"max sample diff vs ImageIO on own stream: $maxDiff")
  }

  test("interop: javax.imageio-authored COLOR (subsampled) JPEG decodes within tolerance") {
    // constant color ⇒ chroma downsampling choice (their box average vs
    // this decoder's replication upsampling) cannot diverge — what's
    // exercised is the 3-component scan over bytes this repo did not
    // author: the JDK writer's own tables, sampling layout and markers
    val (w, h) = (20, 14)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = bi.createGraphics()
    g.setColor(new java.awt.Color(170, 90, 40)); g.fillRect(0, 0, w, h)
    g.dispose()
    val os = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", os))
    val mine = Jpeg.decode(os.toByteArray)
      .getOrElse(fail("refused an ImageIO-authored color JPEG"))
    assert(mine.nComponents === 3 && mine.width === w && mine.height === h)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(os.toByteArray))
    val maxDiff = (0 until h).flatMap(y => (0 until w).flatMap { x =>
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      Seq(math.abs((mine.pixels(o) & 0xFF) - ((rgb >> 16) & 0xFF)),
        math.abs((mine.pixels(o + 1) & 0xFF) - ((rgb >> 8) & 0xFF)),
        math.abs((mine.pixels(o + 2) & 0xFF) - (rgb & 0xFF)))
    }).max
    assert(maxDiff <= 3, s"max channel diff vs ImageIO color decode: $maxDiff")
  }

  test("4:4:4 color with non-neutral chroma matches the published JFIF transform") {
    // block-constant planes → exact YCbCr recovery; expected RGB computed
    // HERE from the CCIR 601 full-range formula, not by the codec
    val (bw, bh) = (2, 1)
    val (w, h) = (bw * 8, bh * 8)
    val yv = Array[Byte](200.toByte, 60)
    val cbv = Array[Byte](90, 170.toByte)
    val crv = Array[Byte](150.toByte, 40)
    val img = Jpeg.decode(Jpeg.encodeYcc444(w, h,
      blockGray(bw, bh, yv), blockGray(bw, bh, cbv), blockGray(bw, bh, crv)))
      .getOrElse(fail("444 stream refused"))
    assert(img.nComponents === 3)
    def clamp(v: Long) = math.max(0L, math.min(255L, v)).toInt
    (0 until w * h).foreach { p =>
      val blk = (p % w) / 8
      val (yy, cb, cr) = (yv(blk) & 0xFF, (cbv(blk) & 0xFF) - 128, (crv(blk) & 0xFF) - 128)
      val want = (clamp(math.round(yy + 1.402 * cr)),
        clamp(math.round(yy - 0.344136 * cb - 0.714136 * cr)),
        clamp(math.round(yy + 1.772 * cb)))
      val got = (img.pixels(3 * p) & 0xFF, img.pixels(3 * p + 1) & 0xFF,
        img.pixels(3 * p + 2) & 0xFF)
      assert(got === want, s"pixel $p (block $blk)")
    }
  }

  test("progressive: flat-block rasters roundtrip exactly through SOF2 (gray and 4:2:0)") {
    val blocks = Array.tabulate(Multimodal.JpegBw * Multimodal.JpegBh)(
      i => ((i * 59 + 31) % 256).toByte)
    val gray = blockGray(Multimodal.JpegBw, Multimodal.JpegBh, blocks)
    val (w, h) = (Multimodal.JpegW, Multimodal.JpegH)
    val gBytes = Jpeg.encodeGrayProgressive(w, h, gray)
    // the wire must really be progressive (SOF2) with > 1 scan
    assert(gBytes.sliding(2).exists(p =>
      (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xC2), "no SOF2 on the wire")
    assert(gBytes.sliding(2).count(p =>
      (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xDA) === 2,
      "gray progressive must carry a DC scan + one AC scan")
    val g = Jpeg.decode(gBytes).getOrElse(fail("own progressive gray refused"))
    assert(g.nComponents === 1 && java.util.Arrays.equals(g.pixels, gray),
      "progressive gray roundtrip not exact")
    val cwp = (w + 1) / 2
    val flat = Array.fill[Byte](cwp * ((h + 1) / 2))(128.toByte)
    val cBytes = Jpeg.encodeYcc420Progressive(w, h, gray, flat, flat)
    assert(cBytes.sliding(2).count(p =>
      (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xDA) === 4,
      "4:2:0 progressive must carry a DC scan + three AC scans")
    val c = Jpeg.decode(cBytes).getOrElse(fail("own progressive 420 refused"))
    assert(c.nComponents === 3)
    (0 until w * h).foreach { p =>
      assert((c.pixels(3 * p) & 0xFF) === (gray(p) & 0xFF), s"pixel $p")
      assert(c.pixels(3 * p + 1) === c.pixels(3 * p) &&
        c.pixels(3 * p + 2) === c.pixels(3 * p), s"neutral chroma broke at $p")
    }
  }

  test("progressive DC successive approximation: exact roundtrip, with the SA scans really on the wire") {
    // odd AND even block values so the refinement bit is load-bearing —
    // dropping it would shift every odd gray level by one
    val blocks = Array.tabulate(Multimodal.JpegBw * Multimodal.JpegBh)(
      i => ((i * 3 + 1) % 256).toByte)
    val gray = blockGray(Multimodal.JpegBw, Multimodal.JpegBh, blocks)
    val bytes = Jpeg.encodeGrayProgressive(
      Multimodal.JpegW, Multimodal.JpegH, gray, dcSa = true)
    // wire shape: three scans — DC first (Ah=0, Al=1), DC refine
    // (Ah=1, Al=0), AC full band
    def scanParams(b: Array[Byte]): Seq[(Int, Int, Int, Int)] = {
      var i = 0
      val out = Seq.newBuilder[(Int, Int, Int, Int)]
      while (i + 1 < b.length) {
        if ((b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFF) == 0xDA) {
          val ns = b(i + 4) & 0xFF
          val at = i + 5 + 2 * ns
          out += ((b(at) & 0xFF, b(at + 1) & 0xFF,
            (b(at + 2) & 0xFF) >> 4, b(at + 2) & 0xF))
          i = at + 3
        } else i += 1
      }
      out.result()
    }
    assert(scanParams(bytes) === Seq((0, 0, 0, 1), (0, 0, 1, 0), (1, 63, 0, 0)),
      "SA progression not on the wire as declared")
    val img = Jpeg.decode(bytes).getOrElse(fail("SA progressive refused"))
    assert(java.util.Arrays.equals(img.pixels, gray),
      "DC successive approximation roundtrip not exact")
  }

  test("interop: javax.imageio-authored PROGRESSIVE JPEGs (successive approximation) decode within tolerance") {
    // the JDK writer's default progressive scan script uses Al=1 first
    // passes + DC/AC refinement scans — exactly the SA machinery the
    // minimal fixture encoder skips, on bytes this repo did not author
    def progressiveBytes(bi: java.awt.image.BufferedImage): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val os = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(os)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
      writer.dispose(); ios.close()
      os.toByteArray
    }
    // grayscale gradient
    val (w, h) = (40, 24)
    val gbi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      gbi.getRaster.setSample(x, y, 0, (x * 9 + y * 5) % 256)))
    val gb = progressiveBytes(gbi)
    assert(gb.sliding(2).exists(p =>
      (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xC2),
      "ImageIO did not produce SOF2 — interop test vacuous")
    val mine = Jpeg.decode(gb).getOrElse(fail("refused ImageIO progressive gray"))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gb))
    val maxDiff = (0 until h).flatMap(y => (0 until w).map(x =>
      math.abs((mine.pixels(y * w + x) & 0xFF) - ref.getRaster.getSample(x, y, 0)))).max
    assert(maxDiff <= 2, s"gray progressive: max diff vs ImageIO decode $maxDiff")
    // constant-color 4:2:0 (chroma resampling choices cannot diverge)
    val cbi = new java.awt.image.BufferedImage(20, 14,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = cbi.createGraphics()
    g2.setColor(new java.awt.Color(170, 90, 40)); g2.fillRect(0, 0, 20, 14)
    g2.dispose()
    val cb = progressiveBytes(cbi)
    val mc = Jpeg.decode(cb).getOrElse(fail("refused ImageIO progressive color"))
    val rc = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cb))
    val maxC = (0 until 14).flatMap(y => (0 until 20).flatMap { x =>
      val rgb = rc.getRGB(x, y)
      val o = (y * 20 + x) * 3
      Seq(math.abs((mc.pixels(o) & 0xFF) - ((rgb >> 16) & 0xFF)),
        math.abs((mc.pixels(o + 1) & 0xFF) - ((rgb >> 8) & 0xFF)),
        math.abs((mc.pixels(o + 2) & 0xFF) - (rgb & 0xFF)))
    }).max
    assert(maxC <= 3, s"color progressive: max diff vs ImageIO decode $maxC")
  }

  test("property interop: random ImageIO-authored gray JPEGs (baseline and progressive, edge dims) decode within tolerance") {
    // randomized generalization of the fixed interop cases: dims down to
    // 1×1 drive partial-MCU handling on bytes this repo did not author
    val rnd = new scala.util.Random(0x1A9E6 ^ sys.env.get("SPARK_GRAFT_FUZZ_SEED")
      .map(_.toLong).getOrElse(0L))
    (1 to 25).foreach { c =>
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        bi.getRaster.setSample(x, y, 0, rnd.nextInt(256))))
      val progressive = c % 2 == 0
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      if (progressive)
        param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val os = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(os)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
      writer.dispose(); ios.close()
      val bytes = os.toByteArray
      val mine = Jpeg.decode(bytes).getOrElse(
        fail(s"case $c (${w}x$h prog=$progressive): refused ImageIO bytes"))
      assert(mine.width === w && mine.height === h && mine.nComponents === 1)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val maxDiff = (0 until h).flatMap(y => (0 until w).map(x =>
        math.abs((mine.pixels(y * w + x) & 0xFF) - ref.getRaster.getSample(x, y, 0)))).max
      assert(maxDiff <= 2,
        s"case $c (${w}x$h prog=$progressive): max diff vs ImageIO $maxDiff")
    }
  }

  test("progressive AC successive approximation: exact roundtrip, SA scan script on the wire, ImageIO agrees") {
    def scanParams(b: Array[Byte]): Seq[(Int, Int, Int, Int)] = {
      var i = 0
      val out = Seq.newBuilder[(Int, Int, Int, Int)]
      while (i + 1 < b.length) {
        if ((b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFF) == 0xDA) {
          val ns = b(i + 4) & 0xFF
          val at = i + 5 + 2 * ns
          out += ((b(at) & 0xFF, b(at + 1) & 0xFF,
            (b(at + 2) & 0xFF) >> 4, b(at + 2) & 0xF))
          i = at + 3
        } else i += 1
      }
      out.result()
    }
    val nb = Multimodal.JpegBw * Multimodal.JpegBh
    val rnd = new scala.util.Random(127001)
    // fixture set: one deterministic sweep hitting every residue class
    // with both parities and signs, plus random fixtures; a coverage
    // probe below rejects a vacuous set
    val fixtures = Array.tabulate[Byte](nb)(i => (i * 37 + 1).toByte) +:
      Array.fill(4)(Array.fill[Byte](nb)((rnd.nextInt(256)).toByte))
    val classesSeen = scala.collection.mutable.Set.empty[Int]
    fixtures.foreach { blocks =>
      blocks.foreach(b => classesSeen += (b & 0xFF) % 6)
      val gray = Multimodal.acSaBlockGray(blocks)
      val bytes = Jpeg.encodeGrayProgressive(
        Multimodal.JpegW, Multimodal.JpegH, gray,
        quant = Multimodal.QuantAcSa, acSa = true)
      // scan script: plain DC, AC first at Al=1, AC refine Ah=1/Al=0
      assert(scanParams(bytes) === Seq((0, 0, 0, 0), (1, 63, 0, 1), (1, 63, 1, 0)),
        "AC-SA progression not on the wire as declared")
      val img = Jpeg.decode(bytes).getOrElse(fail("AC-SA progressive refused"))
      assert(java.util.Arrays.equals(img.pixels, gray),
        "AC successive approximation roundtrip not exact")
      // the JDK's decoder consumes the same wire (bytes we authored,
      // decoder we did not): dims + per-pixel tolerance for its IDCT
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, "ImageIO refused the AC-SA stream")
      assert(ref.getWidth == Multimodal.JpegW && ref.getHeight == Multimodal.JpegH)
      val maxDiff = (0 until Multimodal.JpegH).flatMap(y =>
        (0 until Multimodal.JpegW).map(x =>
          math.abs((img.pixels(y * Multimodal.JpegW + x) & 0xFF) -
            ref.getRaster.getSample(x, y, 0)))).max
      assert(maxDiff <= 2, s"AC-SA: max diff vs ImageIO decode $maxDiff")
    }
    assert(classesSeen == Set(0, 1, 2, 3, 4, 5),
      s"fixture set misses residue classes: ${(Set(0, 1, 2, 3, 4, 5) -- classesSeen)}")
  }

  test("combined DC+AC successive approximation (4 scans): exact roundtrip, script on the wire") {
    def scanParams(b: Array[Byte]): Seq[(Int, Int, Int, Int)] = {
      var i = 0
      val out = Seq.newBuilder[(Int, Int, Int, Int)]
      while (i + 1 < b.length) {
        if ((b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFF) == 0xDA) {
          val ns = b(i + 4) & 0xFF
          val at = i + 5 + 2 * ns
          out += ((b(at) & 0xFF, b(at + 1) & 0xFF,
            (b(at + 2) & 0xFF) >> 4, b(at + 2) & 0xF))
          i = at + 3
        } else i += 1
      }
      out.result()
    }
    val nb = Multimodal.JpegBw * Multimodal.JpegBh
    val gray = Multimodal.acSaBlockGray(
      Array.tabulate[Byte](nb)(i => (i * 41 + 3).toByte))
    val bytes = Jpeg.encodeGrayProgressive(
      Multimodal.JpegW, Multimodal.JpegH, gray,
      quant = Multimodal.QuantAcSa, dcSa = true, acSa = true)
    assert(scanParams(bytes) ===
      Seq((0, 0, 0, 1), (0, 0, 1, 0), (1, 63, 0, 1), (1, 63, 1, 0)),
      "full SA progression not on the wire as declared")
    val img = Jpeg.decode(bytes).getOrElse(fail("full-SA progressive refused"))
    assert(java.util.Arrays.equals(img.pixels, gray),
      "combined DC+AC successive approximation roundtrip not exact")
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null, "ImageIO refused the full-SA stream")
  }

  test("AC-refine EOBn run past 32767 blocks: mid-run cap flush with pending correction bits") {
    // 256×128 blocks = 32768 > the EOBn cap, every block carrying one
    // always-even AC coefficient (c = 2 at zigzag 14) — the refine scan
    // sees NO new significance anywhere, so all blocks join one EOB run
    // with one pending correction bit each and the encoder must flush
    // EOBn(32767)+bits mid-run, then a second run for the remainder; the
    // decoder must chain the runs and land every correction bit
    val (bw2, bh2) = (256, 128) // 32768 blocks
    val (w2, h2) = (bw2 * 8, bh2 * 8)
    val sq = Array(1, -1, -1, 1, 1, -1, -1, 1)
    val gray = new Array[Byte](w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) { gray(y * w2 + x) = (128 + 2 * sq(x % 8)).toByte; x += 1 }
      y += 1
    }
    val bytes = Jpeg.encodeGrayProgressive(w2, h2, gray,
      quant = Multimodal.QuantAcSa, acSa = true)
    val img = Jpeg.decode(bytes).getOrElse(fail("EOBn-cap stream refused"))
    assert(java.util.Arrays.equals(img.pixels, gray),
      "EOBn cap flush: roundtrip not exact")
  }

  test("refusal ladder: everything outside baseline sequential returns None") {
    val gray = Array.tabulate(16 * 16)(i => (i % 251).toByte)
    val valid = Jpeg.encodeGray(16, 16, gray)
    assert(Jpeg.decode(valid).isDefined)
    def patched(find: Int, replace: Int): Array[Byte] = {
      val b = valid.clone()
      val at = b.sliding(2).indexWhere(p =>
        (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == find)
      assert(at >= 0, f"marker FF$find%02X not found")
      b(at + 1) = replace.toByte
      b
    }
    // extended / lossless / arithmetic frames (0xC2 progressive is now
    // SUPPORTED; a baseline stream relabeled SOF2 still refuses because
    // its Ss=0..Se=63 scan header is illegal for a progressive frame)
    Seq(0xC1, 0xC3, 0xC9, 0xCB).foreach(sof =>
      assert(Jpeg.decode(patched(0xC0, sof)).isEmpty, f"SOF FF$sof%02X accepted"))
    assert(Jpeg.decode(patched(0xC0, 0xC2)).isEmpty,
      "baseline scan header inside a SOF2 frame accepted")
    // 16-bit quantization (Pq=1) is not baseline
    val pq = valid.clone()
    val dqtAt = pq.sliding(2).indexWhere(p =>
      (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xDB)
    pq(dqtAt + 4) = 0x10.toByte
    assert(Jpeg.decode(pq).isEmpty, "16-bit DQT accepted")
    // hostile dims refuse BEFORE allocation (w·h over the clamp)
    val big = valid.clone()
    val sofAt = big.sliding(2).indexWhere(p =>
      (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xC0)
    Seq(5, 6, 7, 8).foreach(o => big(sofAt + 2 + o) = 0xFF.toByte)
    assert(Jpeg.decode(big).isEmpty, "2^32-pixel frame accepted")
    // truncations that cut into header or entropy data refuse (losing
    // only the trailing EOI after every MCU decoded is tolerated, as in
    // real-world decoders — every entropy byte carries ≥ 1 data bit, so
    // length-3 always removes MCU bits)
    Seq(0, 1, 2, 20, valid.length / 2, valid.length - 3).foreach(n =>
      assert(Jpeg.decode(valid.take(n)).isEmpty, s"truncation at $n accepted"))
    // stray bytes before SOI
    assert(Jpeg.decode(Array[Byte](0, 0) ++ valid).isEmpty)
  }
}
