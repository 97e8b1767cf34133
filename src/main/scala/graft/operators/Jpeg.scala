package graft.operators

/** Pure-JVM baseline JPEG/JFIF codec — the format web-scale multimodal
  * corpora actually arrive in (the round-15 verdict's one named codec
  * gap). Implemented from the published wire format (ITU T.81: baseline
  * sequential DCT, Huffman entropy coding, JFIF color model) with the
  * same discipline as the BMP/PNG/GIF codecs in [[Multimodal]]: the
  * DECODER is general (grayscale and 3-component YCbCr at any 1..4
  * sampling pair — 4:4:4, 4:2:2, 4:2:0 —, restart markers, byte
  * stuffing, arbitrary DHT/DQT tables, partial edge MCUs) and TOTAL
  * (every read bounds-checked; any malformed, truncated, or non-baseline
  * input returns None, never throws — hostile dimensions are clamped on
  * a Long before any allocation); the ENCODER exists to synthesize
  * fixtures and spec inputs (flat quantization, Annex-K DC / derived AC
  * Huffman tables) — it is not a quality-tuned compressor.
  *
  * Lossless-roundtrip trick the q122/q123 oracle rows ride: with
  * all-ones quantization tables, a raster whose every 8×8 block is
  * CONSTANT has a DC-only spectrum (DC = 8·(v−128), an exact integer),
  * so quantize → dequantize → IDCT reproduces the block exactly and the
  * roundtrip is the identity — SQL-oracle-able like the lossless
  * codecs, while the wire still carries real markers, Huffman codes,
  * byte stuffing, zigzag and the full IDCT path.
  */
private[graft] object Jpeg {

  /** Decoded image: `pixels` is row-major gray (1 byte/px) when
    * `nComponents == 1`, row-major RGB when `nComponents == 3`. */
  final case class Image(width: Int, height: Int, nComponents: Int,
      pixels: Array[Byte])

  /** All-ones quantization — the lossless-for-flat-blocks fixture table. */
  val QuantFlat: Array[Int] = Array.fill(64)(1)

  /** jpeg natural order: natural (row-major) index of each zigzag pos. */
  private[operators] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // ----------------------------------------------------------------------
  // Huffman table specs the ENCODER declares in DHT (the decoder builds
  // whatever the stream declares — these are not baked into decoding).
  // DC: ITU T.81 Annex K.3.1 luminance DC lengths (public-spec constants,
  // like the G.711 BIAS/CLIP) — variable code lengths, so the decoder's
  // canonical multi-length assignment is exercised by every fixture.
  // AC: 176 symbols at one 8-bit length — the 162 baseline AC symbols
  // (EOB, ZRL, 16 runs × 10 magnitude categories) PLUS the 14 EOBn
  // symbols (0x10..0xE0) baseline never emits but the PROGRESSIVE
  // encoder's shared table needs. Spec-legal (176 ≤ 255 fits the
  // one-byte DHT Li field; 176 length-8 codes leave the all-ones byte
  // unused) and keeps the encoder free of Annex K's frequency-ordered
  // transcription.
  // ----------------------------------------------------------------------
  private val DcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray
  private val AcVals: Array[Int] =
    (((0 to 14).map(_ << 4)) ++ Seq(0xF0) ++ // EOB/EOBn (s = 0) + ZRL
      (for { r <- 0 to 15; s <- 1 to 10 } yield (r << 4) | s))
      .distinct.sorted.toArray
  private val AcBits: Array[Int] = {
    val b = new Array[Int](16); b(7) = AcVals.length; b // all length 8 (176 ≤ 255)
  }

  /** Canonical code assignment (T.81 C.2): symbol → (code, length). */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](vals.length)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) { out(k) = (code, l); code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    out
  }

  // ---------------------------- bit I/O ---------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1 << len) - 1))
      n += len
      while (n >= 8) {
        val b = (acc >>> (n - 8)) & 0xFF
        out.write(b)
        if (b == 0xFF) out.write(0x00) // byte stuffing
        n -= 8
      }
    }
    def flush(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n) // pad 1s
  }

  // ---------------------------- encoder ---------------------------------

  private def u16be(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
  }
  private def marker(out: java.io.ByteArrayOutputStream, m: Int): Unit = {
    out.write(0xFF); out.write(m)
  }

  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private def cC(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Forward DCT + quantize one 8×8 block (samples 0..255, natural
    * order) into ZIGZAG-ordered quantized coefficients. */
  private def fdctQuant(block: Array[Int], quantNat: Array[Int]): Array[Int] = {
    val coefZ = new Array[Int](64)
    var z = 0
    while (z < 64) {
      val nat = ZigZag(z)
      val u = nat % 8
      val v = nat / 8
      var sum = 0.0
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          sum += (block(y * 8 + x) - 128) * CosT(x)(u) * CosT(y)(v)
          x += 1
        }
        y += 1
      }
      val f = 0.25 * cC(u) * cC(v) * sum
      coefZ(z) = math.round(f / quantNat(nat)).toInt
      z += 1
    }
    coefZ
  }

  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** One component plane with its geometry and sampling factors. */
  private final case class Plane(samples: Array[Byte], w: Int, h: Int,
      hSamp: Int, vSamp: Int, quantId: Int, dcTable: Int, acTable: Int)

  /** 8×8 block at block coords (bx, by) with edge replication. */
  private def blockOf(p: Plane, bx: Int, by: Int): Array[Int] = {
    val b = new Array[Int](64)
    var y = 0
    while (y < 8) {
      val sy = math.min(by * 8 + y, p.h - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(bx * 8 + x, p.w - 1)
        b(y * 8 + x) = p.samples(sy * p.w + sx) & 0xFF
        x += 1
      }
      y += 1
    }
    b
  }

  private def writeDht(out: java.io.ByteArrayOutputStream, tc: Int, th: Int,
      bits: Array[Int], vals: Array[Int]): Unit = {
    marker(out, 0xC4)
    u16be(out, 2 + 1 + 16 + vals.length)
    out.write((tc << 4) | th)
    bits.foreach(out.write)
    vals.foreach(out.write)
  }

  /** Baseline encode of 1 or 3 planes (interleaved single scan). The
    * caller supplies each plane pre-sampled at its own resolution; dims
    * must satisfy wi = ceil(w·hi/hmax), hi analogous. */
  private def encodePlanes(w: Int, h: Int, planes: Seq[Plane],
      quants: Seq[Array[Int]], restartInterval: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    marker(out, 0xD8) // SOI
    marker(out, 0xE0) // APP0 / JFIF
    u16be(out, 16)
    out.write('J'); out.write('F'); out.write('I'); out.write('F'); out.write(0)
    out.write(1); out.write(1) // version 1.1
    out.write(0) // units: none
    u16be(out, 1); u16be(out, 1) // aspect 1:1
    out.write(0); out.write(0) // no thumbnail
    quants.zipWithIndex.foreach { case (q, i) => // DQT, zigzag order, Pq=0
      marker(out, 0xDB)
      u16be(out, 2 + 1 + 64)
      out.write(i)
      var z = 0
      while (z < 64) { out.write(q(ZigZag(z))); z += 1 }
    }
    marker(out, 0xC0) // SOF0
    u16be(out, 8 + 3 * planes.size)
    out.write(8) // precision
    u16be(out, h); u16be(out, w)
    out.write(planes.size)
    planes.zipWithIndex.foreach { case (p, i) =>
      out.write(i + 1) // component id
      out.write((p.hSamp << 4) | p.vSamp)
      out.write(p.quantId)
    }
    val dcTables = planes.map(_.dcTable).distinct
    val acTables = planes.map(_.acTable).distinct
    dcTables.foreach(t => writeDht(out, 0, t, DcBits, DcVals))
    acTables.foreach(t => writeDht(out, 1, t, AcBits, AcVals))
    if (restartInterval > 0) { // DRI
      marker(out, 0xDD)
      u16be(out, 4)
      u16be(out, restartInterval)
    }
    marker(out, 0xDA) // SOS
    u16be(out, 6 + 2 * planes.size)
    out.write(planes.size)
    planes.zipWithIndex.foreach { case (p, i) =>
      out.write(i + 1)
      out.write((p.dcTable << 4) | p.acTable)
    }
    out.write(0); out.write(63); out.write(0) // Ss, Se, Ah/Al

    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    val dcCode = DcVals.zip(dcCodes).toMap
    val acCode = AcVals.zip(acCodes).toMap
    val bw = new BitWriter(out)
    val preds = new Array[Int](planes.size)

    def encodeBlock(p: Plane, ci: Int, bx: Int, by: Int): Unit = {
      val coefZ = fdctQuant(blockOf(p, bx, by), quants(p.quantId))
      val diff = coefZ(0) - preds(ci)
      preds(ci) = coefZ(0)
      val s = category(diff)
      val (c, l) = dcCode(s)
      bw.put(c, l)
      if (s > 0) bw.put(if (diff < 0) diff - 1 else diff, s)
      var k = 1
      var run = 0
      while (k < 64) {
        if (coefZ(k) == 0) run += 1
        else {
          while (run >= 16) {
            val (zc, zl) = acCode(0xF0); bw.put(zc, zl); run -= 16
          }
          val ss = category(coefZ(k))
          val (ac, al) = acCode((run << 4) | ss)
          bw.put(ac, al)
          bw.put(if (coefZ(k) < 0) coefZ(k) - 1 else coefZ(k), ss)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (ec, el) = acCode(0x00); bw.put(ec, el) } // EOB
    }

    var mcuCount = 0
    var rstIdx = 0
    def maybeRestart(): Unit = {
      if (restartInterval > 0 && mcuCount > 0 && mcuCount % restartInterval == 0) {
        bw.flush()
        marker(out, 0xD0 + rstIdx)
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(preds, 0)
      }
      mcuCount += 1
    }

    if (planes.size == 1) {
      // non-interleaved: MCU = one block over the component's own grid
      val p = planes.head
      val bxs = (p.w + 7) / 8
      val bys = (p.h + 7) / 8
      var by = 0
      while (by < bys) {
        var bx = 0
        while (bx < bxs) {
          maybeRestart(); encodeBlock(p, 0, bx, by); bx += 1
        }
        by += 1
      }
    } else {
      val hmax = planes.map(_.hSamp).max
      val vmax = planes.map(_.vSamp).max
      val mcx = (w + 8 * hmax - 1) / (8 * hmax)
      val mcy = (h + 8 * vmax - 1) / (8 * vmax)
      var my = 0
      while (my < mcy) {
        var mx = 0
        while (mx < mcx) {
          maybeRestart()
          planes.zipWithIndex.foreach { case (p, ci) =>
            var j = 0
            while (j < p.vSamp) {
              var i = 0
              while (i < p.hSamp) {
                encodeBlock(p, ci, mx * p.hSamp + i, my * p.vSamp + j)
                i += 1
              }
              j += 1
            }
          }
          mx += 1
        }
        my += 1
      }
    }
    bw.flush()
    marker(out, 0xD9) // EOI
    out.toByteArray
  }

  /** Minimal spec-legal PROGRESSIVE (SOF2) encode — no successive
    * approximation: scan 1 is the interleaved DC scan (Ss=Se=0,
    * Ah=Al=0), then one full-band AC scan per component (Ss=1, Se=63)
    * with real EOBn run-length coding across blocks (the decoder's
    * EOBRUN path is load-bearing for every all-zero-AC block). Exists to
    * synthesize fixtures; successive-approximation DECODE is exercised
    * by javax.imageio-authored files in the spec (the JDK writer's
    * default progressive scan script uses Al=1 first passes +
    * refinements). */
  private def encodeProgressivePlanes(w: Int, h: Int, planes: Seq[Plane],
      quants: Seq[Array[Int]], dcSa: Boolean = false,
      acSa: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    marker(out, 0xD8)
    marker(out, 0xE0)
    u16be(out, 16)
    out.write('J'); out.write('F'); out.write('I'); out.write('F'); out.write(0)
    out.write(1); out.write(1)
    out.write(0)
    u16be(out, 1); u16be(out, 1)
    out.write(0); out.write(0)
    quants.zipWithIndex.foreach { case (q, i) =>
      marker(out, 0xDB)
      u16be(out, 2 + 1 + 64)
      out.write(i)
      var z = 0
      while (z < 64) { out.write(q(ZigZag(z))); z += 1 }
    }
    marker(out, 0xC2) // SOF2 — progressive
    u16be(out, 8 + 3 * planes.size)
    out.write(8)
    u16be(out, h); u16be(out, w)
    out.write(planes.size)
    planes.zipWithIndex.foreach { case (p, i) =>
      out.write(i + 1)
      out.write((p.hSamp << 4) | p.vSamp)
      out.write(p.quantId)
    }
    planes.map(_.dcTable).distinct.foreach(t => writeDht(out, 0, t, DcBits, DcVals))
    planes.map(_.acTable).distinct.foreach(t => writeDht(out, 1, t, AcBits, AcVals))

    // quantized coefficient blocks over the padded interleaved grid
    val hmax = planes.map(_.hSamp).max
    val vmax = planes.map(_.vSamp).max
    val mcx = (w + 8 * hmax - 1) / (8 * hmax)
    val mcy = (h + 8 * vmax - 1) / (8 * vmax)
    val bPerLine = planes.map(p => mcx * p.hSamp)
    val bPerCol = planes.map(p => mcy * p.vSamp)
    val blocks: Seq[Array[Array[Int]]] = planes.zipWithIndex.map { case (p, ci) =>
      Array.tabulate(bPerLine(ci) * bPerCol(ci)) { bi =>
        fdctQuant(blockOf(p, bi % bPerLine(ci), bi / bPerLine(ci)), quants(p.quantId))
      }
    }
    val dcCodes = DcVals.zip(canonicalCodes(DcBits, DcVals)).toMap
    val acCodes = AcVals.zip(canonicalCodes(AcBits, AcVals)).toMap

    // interleaved walk over every component's DC, shared by the DC-first
    // and DC-refinement scans
    def dcScanHeader(ahal: Int): Unit = {
      marker(out, 0xDA)
      u16be(out, 6 + 2 * planes.size)
      out.write(planes.size)
      planes.zipWithIndex.foreach { case (p, i) =>
        out.write(i + 1)
        out.write(p.dcTable << 4) // Ta unused in a DC scan
      }
      out.write(0); out.write(0); out.write(ahal) // Ss=0, Se=0
    }
    def dcWalk(f: (Int, Int) => Unit): Unit = { // (componentIdx, dcValue)
      var my = 0
      while (my < mcy) {
        var mx = 0
        while (mx < mcx) {
          planes.zipWithIndex.foreach { case (p, ci) =>
            var j = 0
            while (j < p.vSamp) {
              var i2 = 0
              while (i2 < p.hSamp) {
                f(ci, blocks(ci)((my * p.vSamp + j) * bPerLine(ci) +
                  mx * p.hSamp + i2)(0))
                i2 += 1
              }
              j += 1
            }
          }
          mx += 1
        }
        my += 1
      }
    }

    // scan 1: DC first, all components interleaved — at Al = 1 when the
    // successive-approximation progression is requested (the point
    // transform for DC is an ARITHMETIC right shift; the predictor chain
    // runs over the shifted values, and two's complement makes the
    // decoder's `(pred << 1) | refinementBit` exact for negatives too)
    val dcAl = if (dcSa) 1 else 0
    dcScanHeader(dcAl)
    locally {
      val bw = new BitWriter(out)
      val preds = new Array[Int](planes.size)
      dcWalk { (ci, dc) =>
        val v = dc >> dcAl
        val diff = v - preds(ci)
        preds(ci) = v
        val s = category(diff)
        val (c, l) = dcCodes(s)
        bw.put(c, l)
        if (s > 0) bw.put(if (diff < 0) diff - 1 else diff, s)
      }
      bw.flush()
    }
    if (dcSa) { // DC refinement: one raw low bit per block (Ah=1, Al=0)
      dcScanHeader(0x10)
      val bw = new BitWriter(out)
      dcWalk((_, dc) => bw.put(dc & 1, 1))
      bw.flush()
    }

    // AC scans, one component each, EOBn runs across blocks. With
    // `acSa` the full band ships as a successive-approximation pair —
    // a first scan at Al = 1 followed by the T.81 G.1.2.3 refinement
    // scan (Ah = 1, Al = 0) — otherwise a single Al = 0 first scan.
    def acScanHeader(ci: Int, ahal: Int): Unit = {
      marker(out, 0xDA)
      u16be(out, 6 + 2)
      out.write(1)
      out.write(ci + 1)
      out.write(planes(ci).acTable) // Td unused in an AC scan
      out.write(1); out.write(63); out.write(ahal)
    }
    def blockGeom(ci: Int): (Int, Int) = {
      val p = planes(ci)
      (((w * p.hSamp + hmax - 1) / hmax + 7) / 8,
        ((h * p.vSamp + vmax - 1) / vmax + 7) / 8)
    }
    def foreachBlock(ci: Int)(f: Array[Int] => Unit): Unit = {
      val (wB, hB) = blockGeom(ci)
      var by = 0
      while (by < hB) {
        var bx = 0
        while (bx < wB) {
          f(blocks(ci)(by * bPerLine(ci) + bx))
          bx += 1
        }
        by += 1
      }
    }

    // AC FIRST scan at point transform `al`: coefficients ship as
    // sign·(|v| >> al) (T.81 point transform rounds magnitudes toward
    // zero); values that shift to zero extend runs/EOB like true zeros.
    def acFirstScan(ci: Int, al: Int): Unit = {
      acScanHeader(ci, al)
      val bw = new BitWriter(out)
      var eobrun = 0
      def flushEob(): Unit = if (eobrun > 0) {
        val r = 31 - Integer.numberOfLeadingZeros(eobrun) // floor(log2)
        val (c, l) = acCodes(r << 4)
        bw.put(c, l)
        if (r > 0) bw.put(eobrun - (1 << r), r)
        eobrun = 0
      }
      foreachBlock(ci) { coefZ =>
        def vAl(k: Int): Int = {
          val v = coefZ(k)
          if (v < 0) -((-v) >> al) else v >> al
        }
        var kLast = 63
        while (kLast >= 1 && vAl(kLast) == 0) kLast -= 1
        if (kLast < 1) { // no AC at this precision — extend the EOB run
          eobrun += 1
          if (eobrun == 32767) flushEob()
        } else {
          flushEob()
          var k = 1
          var run = 0
          while (k <= kLast) {
            val v = vAl(k)
            if (v == 0) run += 1
            else {
              while (run >= 16) {
                val (zc, zl) = acCodes(0xF0); bw.put(zc, zl); run -= 16
              }
              val s = category(v)
              val (ac, alen) = acCodes((run << 4) | s)
              bw.put(ac, alen)
              bw.put(if (v < 0) v - 1 else v, s)
              run = 0
            }
            k += 1
          }
          if (kLast < 63) eobrun += 1 // trailing zeros end this block
        }
      }
      flushEob()
      bw.flush()
    }

    // AC REFINEMENT scan (Ah = al + 1): already-significant coefficients
    // (|v| >> (al+1) ≠ 0) contribute one correction bit each — bit `al`
    // of the magnitude — interleaved in POSITIONAL order with the
    // symbols; newly-significant ones (|v| >> al == 1) ship as
    // (run << 4) | 1 plus a sign bit, where the run counts only
    // zero-history positions; ZRL covers 16 zero-history positions and
    // is emitted only while a newly-significant coefficient remains
    // ahead; blocks (and block tails) with no new significance join an
    // EOBn run whose correction bits buffer up and flush right after
    // the EOBn symbol. This mirrors exactly what decodeProgressiveScan's
    // acRefineBlock consumes (its walk reads one bit at every nonzero-
    // history position it crosses).
    def acRefineScan(ci: Int, al: Int): Unit = {
      acScanHeader(ci, (al + 1) << 4 | al)
      val bw = new BitWriter(out)
      var eobrun = 0
      val pending = scala.collection.mutable.ArrayBuffer.empty[Int]
      def flushEob(): Unit = if (eobrun > 0) {
        val r = 31 - Integer.numberOfLeadingZeros(eobrun)
        val (c, l) = acCodes(r << 4)
        bw.put(c, l)
        if (r > 0) bw.put(eobrun - (1 << r), r)
        pending.foreach(b => bw.put(b, 1))
        pending.clear()
        eobrun = 0
      }
      foreachBlock(ci) { coefZ =>
        def mag(k: Int): Int = math.abs(coefZ(k)) >> al
        var kLastNew = 0
        var k0 = 1
        while (k0 <= 63) { if (mag(k0) == 1) kLastNew = k0; k0 += 1 }
        if (kLastNew == 0) {
          // no new significance anywhere: the whole block joins the EOB
          // run; its correction bits ride the run's pending buffer
          eobrun += 1
          var k = 1
          while (k <= 63) { if (mag(k) > 1) pending += (mag(k) & 1); k += 1 }
          if (eobrun == 32767) flushEob()
        } else {
          flushEob()
          var run = 0
          val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
          var k = 1
          while (k <= kLastNew) {
            val m = mag(k)
            if (m == 0) run += 1
            else {
              while (run > 15) {
                val (zc, zl) = acCodes(0xF0); bw.put(zc, zl)
                buf.foreach(b => bw.put(b, 1)); buf.clear()
                run -= 16
              }
              if (m > 1) buf += (m & 1) // already significant: bit al
              else {
                val (ac, alen) = acCodes((run << 4) | 1)
                bw.put(ac, alen)
                bw.put(if (coefZ(k) > 0) 1 else 0, 1) // sign of the new ±1
                buf.foreach(b => bw.put(b, 1)); buf.clear()
                run = 0
              }
            }
            k += 1
          }
          // tail after the last new significance joins the EOB run
          if (kLastNew < 63) {
            eobrun += 1
            var kt = kLastNew + 1
            while (kt <= 63) { if (mag(kt) > 1) pending += (mag(kt) & 1); kt += 1 }
          }
        }
      }
      flushEob()
      bw.flush()
    }

    planes.indices.foreach { ci =>
      if (acSa) { acFirstScan(ci, 1); acRefineScan(ci, 0) }
      else acFirstScan(ci, 0)
    }
    marker(out, 0xD9)
    out.toByteArray
  }

  /** Grayscale progressive encode; `dcSa = true` splits the DC into a
    * successive-approximation pair (first scan at Al = 1, then a
    * one-bit refinement scan) so the decoder's DC-refinement path is
    * exercised on an oracle-gated wire, not only via interop; `acSa`
    * does the same for the AC band (first scan at Al = 1 + the
    * G.1.2.3 refinement scan with correction bits, new-significance
    * symbols, refine-ZRL and EOBn-with-pending-bits). */
  def encodeGrayProgressive(w: Int, h: Int, gray: Array[Byte],
      quant: Array[Int] = QuantFlat, dcSa: Boolean = false,
      acSa: Boolean = false): Array[Byte] = {
    require(gray.length == w * h, "raster size mismatch")
    encodeProgressivePlanes(w, h,
      Seq(Plane(gray, w, h, 1, 1, 0, 0, 0)), Seq(quant), dcSa, acSa)
  }

  /** 4:2:0 YCbCr progressive encode (planes as in [[encodeYcc420]]). */
  def encodeYcc420Progressive(w: Int, h: Int, yp: Array[Byte], cb: Array[Byte],
      cr: Array[Byte], quantLum: Array[Int] = QuantFlat,
      quantChroma: Array[Int] = QuantFlat): Array[Byte] = {
    val cwp = (w + 1) / 2
    val chp = (h + 1) / 2
    require(yp.length == w * h && cb.length == cwp * chp && cr.length == cwp * chp,
      "plane size mismatch")
    encodeProgressivePlanes(w, h, Seq(
      Plane(yp, w, h, 2, 2, 0, 0, 0),
      Plane(cb, cwp, chp, 1, 1, 1, 1, 1),
      Plane(cr, cwp, chp, 1, 1, 1, 1, 1)), Seq(quantLum, quantChroma))
  }

  /** Grayscale baseline encode (natural-order quant table); a positive
    * `restartInterval` emits DRI + RSTn markers every that many MCUs. */
  def encodeGray(w: Int, h: Int, gray: Array[Byte],
      quant: Array[Int] = QuantFlat, restartInterval: Int = 0): Array[Byte] = {
    require(gray.length == w * h, "raster size mismatch")
    encodePlanes(w, h,
      Seq(Plane(gray, w, h, 1, 1, 0, 0, 0)), Seq(quant), restartInterval)
  }

  /** 4:2:0 YCbCr baseline encode: `yp` at w×h, `cb`/`cr` pre-subsampled
    * at ceil(w/2)×ceil(h/2) (the caller owns the downsampling choice —
    * this is a wire encoder, not a color pipeline). */
  def encodeYcc420(w: Int, h: Int, yp: Array[Byte], cb: Array[Byte],
      cr: Array[Byte], quantLum: Array[Int] = QuantFlat,
      quantChroma: Array[Int] = QuantFlat): Array[Byte] = {
    val cw = (w + 1) / 2
    val ch = (h + 1) / 2
    require(yp.length == w * h && cb.length == cw * ch && cr.length == cw * ch,
      "plane size mismatch")
    encodePlanes(w, h, Seq(
      Plane(yp, w, h, 2, 2, 0, 0, 0),
      Plane(cb, cw, ch, 1, 1, 1, 1, 1),
      Plane(cr, cw, ch, 1, 1, 1, 1, 1)), Seq(quantLum, quantChroma))
  }

  /** 4:4:4 YCbCr baseline encode (all planes full resolution). */
  def encodeYcc444(w: Int, h: Int, yp: Array[Byte], cb: Array[Byte],
      cr: Array[Byte], quantLum: Array[Int] = QuantFlat,
      quantChroma: Array[Int] = QuantFlat): Array[Byte] = {
    require(yp.length == w * h && cb.length == w * h && cr.length == w * h,
      "plane size mismatch")
    encodePlanes(w, h, Seq(
      Plane(yp, w, h, 1, 1, 0, 0, 0),
      Plane(cb, w, h, 1, 1, 1, 1, 1),
      Plane(cr, w, h, 1, 1, 1, 1, 1)), Seq(quantLum, quantChroma))
  }

  // ---------------------------- decoder ---------------------------------

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // T.81 F.2.2.3 canonical decode tables
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = code - 1
        if (bits(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def value(l: Int, code: Int): Int = vals(valPtr(l) + code - minCode(l))
    def inRange(l: Int, code: Int): Boolean =
      maxCode(l) >= 0 && code <= maxCode(l)
  }

  /** Entropy-segment bit reader: unstuffs FF00, stops at any real
    * marker (exposing it to the MCU loop for RST handling). */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    var atMarker = -1 // marker byte hit (not consumed), or -1

    /** Next bit, or -1 on exhaustion/marker. */
    def bit(): Int = {
      if (n == 0) {
        if (atMarker >= 0 || pos >= bytes.length) return -1
        val b = bytes(pos) & 0xFF
        if (b == 0xFF) {
          if (pos + 1 >= bytes.length) { atMarker = 0xD9; return -1 }
          val m = bytes(pos + 1) & 0xFF
          if (m == 0x00) { pos += 2; acc = 0xFF; n = 8 }
          else { atMarker = m; return -1 }
        } else { pos += 1; acc = b; n = 8 }
      }
      n -= 1
      (acc >>> n) & 1
    }

    /** `len` bits as an unsigned int, or -1 on exhaustion (len ≤ 16). */
    def bits(len: Int): Int = {
      var v = 0
      var i = 0
      while (i < len) {
        val b = bit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }

    /** Discard padding bits to a byte boundary and consume an expected
      * RST marker. `bit()` never advances past a marker it surfaces, so
      * `pos` sits AT the 0xFF in the surfaced case and at the first
      * unread byte otherwise. */
    def consumeRst(expected: Int): Boolean = {
      n = 0 // the encoder 1-pads to the boundary; the pad bits die here
      if (atMarker < 0) {
        if (pos + 1 >= bytes.length || (bytes(pos) & 0xFF) != 0xFF) return false
        atMarker = bytes(pos + 1) & 0xFF
      }
      pos += 2
      val ok = atMarker == expected
      atMarker = -1
      ok
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def decodeHuff(br: BitReader, t: HuffTable): Int = {
    var code = 0
    var l = 1
    while (l <= 16) {
      val b = br.bit()
      if (b < 0) return -1
      code = (code << 1) | b
      if (t.inRange(l, code)) return t.value(l, code)
      l += 1
    }
    -1 // no code of length ≤ 16 matched — corrupt stream
  }

  private final case class Comp(id: Int, hSamp: Int, vSamp: Int, tq: Int,
      var td: Int = 0, var ta: Int = 0)

  /** Interleaved frame geometry shared by the progressive scan decoder,
    * the coefficient-store allocation and the reconstruction:
    * (hmax, vmax, mcuCols, mcuRows, compW, compH, blocksPerLine,
    * blocksPerCol) — block grids are the PADDED interleaved ones; a
    * non-interleaved scan iterates its component's own ceil(cw/8) grid
    * but addresses blocks with the padded stride, so interleaved and
    * single-component scans target the same storage. */
  private def geoOf(comps: Array[Comp], w: Int, h: Int):
      (Int, Int, Int, Int, Array[Int], Array[Int], Array[Int], Array[Int]) = {
    val hmax = comps.map(_.hSamp).max
    val vmax = comps.map(_.vSamp).max
    val mcx = (w + 8 * hmax - 1) / (8 * hmax)
    val mcy = (h + 8 * vmax - 1) / (8 * vmax)
    val cw = comps.map(c => (w * c.hSamp + hmax - 1) / hmax)
    val ch = comps.map(c => (h * c.vSamp + vmax - 1) / vmax)
    (hmax, vmax, mcx, mcy, cw, ch,
      comps.map(c => mcx * c.hSamp), comps.map(c => mcy * c.vSamp))
  }

  /** Total baseline decode; None on anything malformed, truncated, or
    * outside baseline sequential (progressive, arithmetic, 12-bit,
    * 16-bit quant, 2/4-component frames all refuse). */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 4) return None
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
    var pos = 2
    val quant = new Array[Array[Int]](4) // zigzag order as stored
    val dcTab = new Array[HuffTable](4)
    val acTab = new Array[HuffTable](4)
    var comps: Array[Comp] = null
    var w = 0
    var h = 0
    var restartInterval = 0
    // progressive state: per-component raw (undequantized) coefficient
    // stores over the padded interleaved block grid, filled scan by scan
    var progressive = false
    var coefs: Array[Array[Int]] = null
    var scanSeen = false

    def u16(at: Int): Int =
      if (at + 1 >= bytes.length) -1
      else ((bytes(at) & 0xFF) << 8) | (bytes(at + 1) & 0xFF)

    // pos + 1: a standalone marker (EOI ends a progressive frame) may be
    // the file's final two bytes; length-carrying segments re-check via u16
    while (pos + 1 < bytes.length) {
      if ((bytes(pos) & 0xFF) != 0xFF) return None
      var m = bytes(pos + 1) & 0xFF
      pos += 2
      while (m == 0xFF && pos < bytes.length) { // fill bytes before marker
        m = bytes(pos) & 0xFF; pos += 1
      }
      m match {
        case 0xD9 => // EOI — the image, for a progressive frame whose
          // scans all landed; premature otherwise
          return if (progressive && scanSeen)
            reconstructProgressive(comps, coefs, quant, w, h)
          else None
        case 0x01 => // TEM, standalone
        case mm if mm >= 0xD0 && mm <= 0xD7 => // stray RST outside scan
          return None
        case sofm @ (0xC0 | 0xC2) => // SOF0 baseline / SOF2 progressive
          progressive = sofm == 0xC2
          val len = u16(pos)
          if (len < 8 || pos + len > bytes.length) return None
          val prec = bytes(pos + 2) & 0xFF
          h = u16(pos + 3)
          w = u16(pos + 5)
          val nf = bytes(pos + 7) & 0xFF
          if (prec != 8 || w <= 0 || h <= 0) return None
          if (nf != 1 && nf != 3) return None
          if (len != 8 + 3 * nf) return None
          // hostile-dims clamp BEFORE any allocation: the output raster
          // (w·h·3) plus per-component planes must stay far under 2^31
          if (w.toLong * h.toLong > (1L << 26)) return None
          comps = new Array[Comp](nf)
          var i = 0
          while (i < nf) {
            val id = bytes(pos + 8 + 3 * i) & 0xFF
            val hv = bytes(pos + 9 + 3 * i) & 0xFF
            val tq = bytes(pos + 10 + 3 * i) & 0xFF
            val hs = (hv >>> 4) & 0xF
            val vs = hv & 0xF
            if (hs < 1 || hs > 4 || vs < 1 || vs > 4 || tq > 3) return None
            if (comps.take(i).exists(_.id == id)) return None
            comps(i) = Comp(id, hs, vs, tq)
            i += 1
          }
          if (progressive) {
            // per-component coefficient stores over the padded block grid,
            // bounded before allocation (w·h already clamped above; the
            // grid padding multiplies by ≤ ~4 plus one MCU of edge)
            val (_, _, _, _, _, _, bpl, bpc) = geoOf(comps, w, h)
            coefs = new Array[Array[Int]](nf)
            var ci = 0
            while (ci < nf) {
              val n = bpl(ci).toLong * bpc(ci).toLong * 64L
              if (n > (1L << 27)) return None
              coefs(ci) = new Array[Int](n.toInt)
              ci += 1
            }
          }
          pos += len
        case sof if (sof >= 0xC1 && sof <= 0xCF) && sof != 0xC4 && sof != 0xC8 =>
          return None // extended/lossless/arithmetic frames (0xC2 handled above)
        case 0xC4 => // DHT
          val len = u16(pos)
          if (len < 2 || pos + len > bytes.length) return None
          var at = pos + 2
          val end = pos + len
          while (at < end) {
            if (at + 17 > end) return None
            val tcth = bytes(at) & 0xFF
            val tc = (tcth >>> 4) & 0xF
            val th = tcth & 0xF
            if (tc > 1 || th > 3) return None
            val bits = Array.tabulate(16)(i => bytes(at + 1 + i) & 0xFF)
            val nv = bits.sum
            if (nv == 0 || nv > 256 || at + 17 + nv > end) return None
            // canonical-code feasibility: the code counter must never
            // exceed the available code space at any length
            var code = 0
            var ok = true
            var l = 1
            while (l <= 16 && ok) {
              code += bits(l - 1)
              if (code > (1 << l)) ok = false
              code <<= 1
              l += 1
            }
            if (!ok) return None
            val vals = Array.tabulate(nv)(i => bytes(at + 17 + i) & 0xFF)
            val table = new HuffTable(bits, vals)
            if (tc == 0) dcTab(th) = table else acTab(th) = table
            at += 17 + nv
          }
          pos += len
        case 0xDB => // DQT
          val len = u16(pos)
          if (len < 2 || pos + len > bytes.length) return None
          var at = pos + 2
          val end = pos + len
          while (at < end) {
            val pqtq = bytes(at) & 0xFF
            val pq = (pqtq >>> 4) & 0xF
            val tq = pqtq & 0xF
            if (pq != 0 || tq > 3) return None // 16-bit quant ⇒ not baseline
            if (at + 1 + 64 > end) return None
            quant(tq) = Array.tabulate(64)(i => bytes(at + 1 + i) & 0xFF)
            if (quant(tq).exists(_ == 0)) return None
            at += 65
          }
          pos += len
        case 0xDD => // DRI
          val len = u16(pos)
          if (len != 4 || pos + len > bytes.length) return None
          restartInterval = u16(pos + 2)
          pos += len
        case 0xDA => // SOS
          val len = u16(pos)
          if (len < 3 || pos + len > bytes.length || comps == null) return None
          val ns = bytes(pos + 2) & 0xFF
          if (ns < 1 || ns > comps.length || len != 6 + 2 * ns) return None
          val scanComps = new Array[Int](ns) // indices into comps
          var i = 0
          while (i < ns) {
            val cid = bytes(pos + 3 + 2 * i) & 0xFF
            val tdta = bytes(pos + 4 + 2 * i) & 0xFF
            val ci = comps.indexWhere(_.id == cid)
            if (ci < 0) return None
            scanComps(i) = ci
            val c = comps(ci)
            c.td = (tdta >>> 4) & 0xF
            c.ta = tdta & 0xF
            if (c.td > 3 || c.ta > 3) return None
            i += 1
          }
          val ss = bytes(pos + 3 + 2 * ns) & 0xFF
          val se = bytes(pos + 4 + 2 * ns) & 0xFF
          val ahal = bytes(pos + 5 + 2 * ns) & 0xFF
          if (!progressive) {
            if (ns != comps.length) return None
            if (ss != 0 || se != 63 || ahal != 0) return None // not sequential
            var j = 0
            while (j < ns) {
              val c = comps(j)
              if (dcTab(c.td) == null || acTab(c.ta) == null) return None
              if (quant(c.tq) == null) return None
              j += 1
            }
            return decodeScan(bytes, pos + len, comps, quant, dcTab, acTab,
              w, h, restartInterval)
          }
          // progressive: fold this scan into the coefficient stores and
          // continue the marker walk from the scan's end
          decodeProgressiveScan(bytes, pos + len, comps, scanComps, coefs,
            dcTab, acTab, w, h, restartInterval,
            ss, se, (ahal >>> 4) & 0xF, ahal & 0xF) match {
            case Some(next) => scanSeen = true; pos = next
            case None => return None
          }
        case app if app >= 0xE0 && app <= 0xEF => // APPn
          val len = u16(pos)
          if (len < 2 || pos + len > bytes.length) return None
          pos += len
        case 0xFE => // COM
          val len = u16(pos)
          if (len < 2 || pos + len > bytes.length) return None
          pos += len
        case _ => return None // DAC, DNL, JPG, unknown — outside baseline
      }
    }
    None // ran out of bytes without a scan
  }

  private def decodeScan(bytes: Array[Byte], at: Int, comps: Array[Comp],
      quant: Array[Array[Int]], dcTab: Array[HuffTable],
      acTab: Array[HuffTable], w: Int, h: Int,
      restartInterval: Int): Option[Image] = {
    val hmax = comps.map(_.hSamp).max
    val vmax = comps.map(_.vSamp).max
    val interleaved = comps.length > 1
    // per-component sample dims and padded block grids
    val cw = comps.map(c => (w * c.hSamp + hmax - 1) / hmax)
    val ch = comps.map(c => (h * c.vSamp + vmax - 1) / vmax)
    val (mcx, mcy, bPerLine, bPerCol) =
      if (interleaved)
        ((w + 8 * hmax - 1) / (8 * hmax), (h + 8 * vmax - 1) / (8 * vmax),
          comps.map(c => ((w + 8 * hmax - 1) / (8 * hmax)) * c.hSamp),
          comps.map(c => ((h + 8 * vmax - 1) / (8 * vmax)) * c.vSamp))
      else
        (((cw(0) + 7) / 8), ((ch(0) + 7) / 8),
          Array((cw(0) + 7) / 8), Array((ch(0) + 7) / 8))
    // padded plane allocation clamp (dims already ≤ 2^26 samples; the
    // sampling factors multiply by ≤ 4 per axis — still far under 2^31)
    val planes = comps.indices.map { ci =>
      val n = bPerLine(ci).toLong * 8L * bPerCol(ci).toLong * 8L
      if (n > (1L << 28)) return None
      new Array[Byte](n.toInt)
    }.toArray

    val br = new BitReader(bytes, at)
    val preds = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val outBlock = new Array[Int](64)

    def decodeBlock(ci: Int, bx: Int, by: Int): Boolean = {
      val c = comps(ci)
      java.util.Arrays.fill(coef, 0)
      val t = decodeHuff(br, dcTab(c.td))
      if (t < 0 || t > 11) return false
      val diffBits = if (t == 0) 0 else br.bits(t)
      if (diffBits < 0) return false
      preds(ci) += extend(diffBits, t)
      val q = quant(c.tq)
      coef(0) = preds(ci) * q(0)
      var k = 1
      var done = false
      while (!done && k < 64) {
        val rs = decodeHuff(br, acTab(c.ta))
        if (rs < 0) return false
        val r = (rs >>> 4) & 0xF
        val s = rs & 0xF
        if (s == 0) {
          if (rs == 0x00) done = true // EOB
          else if (rs == 0xF0) k += 16 // ZRL
          else return false
        } else {
          k += r
          if (k > 63 || s > 10) return false
          val vb = br.bits(s)
          if (vb < 0) return false
          coef(ZigZag(k)) = extend(vb, s) * q(k)
          k += 1
        }
      }
      if (k > 64) return false
      // IDCT into the padded plane
      idct(coef, outBlock)
      val plane = planes(ci)
      val stride = bPerLine(ci) * 8
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          plane((by * 8 + y) * stride + bx * 8 + x) = outBlock(y * 8 + x).toByte
          x += 1
        }
        y += 1
      }
      true
    }

    var rstIdx = 0
    var mcusUntilRst = if (restartInterval > 0) restartInterval else -1
    var my = 0
    while (my < mcy) {
      var mx = 0
      while (mx < mcx) {
        if (mcusUntilRst == 0) {
          if (!br.consumeRst(0xD0 + rstIdx)) return None
          rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(preds, 0)
          mcusUntilRst = restartInterval
        }
        if (interleaved) {
          var ci = 0
          while (ci < comps.length) {
            val c = comps(ci)
            var j = 0
            while (j < c.vSamp) {
              var i = 0
              while (i < c.hSamp) {
                if (!decodeBlock(ci, mx * c.hSamp + i, my * c.vSamp + j))
                  return None
                i += 1
              }
              j += 1
            }
            ci += 1
          }
        } else if (!decodeBlock(0, mx, my)) return None
        if (mcusUntilRst > 0) mcusUntilRst -= 1
        mx += 1
      }
      my += 1
    }

    assemble(comps, planes, bPerLine, w, h, cw, ch, hmax, vmax)
  }

  /** One progressive (SOF2) scan folded into the per-component raw
    * coefficient stores: DC-first (interleaved or single-component),
    * DC-refinement (one raw bit per block), AC-first with EOB runs, and
    * AC-refinement (T.81 G.1.2.3 correction bits), each with restart
    * handling (DC predictors AND the EOB run reset). Returns the
    * position of the next marker's 0xFF, or None on anything malformed.
    * Progression-order validation is the shallow, crash-relevant subset
    * (band/approximation field ranges, single-component AC scans,
    * Ah = Al+1 on refinements); a semantically out-of-order but
    * well-formed progression decodes to whatever its coefficients say —
    * garbage-in tolerated, never a throw. */
  private def decodeProgressiveScan(bytes: Array[Byte], at: Int,
      comps: Array[Comp], scanComps: Array[Int], coefs: Array[Array[Int]],
      dcTab: Array[HuffTable], acTab: Array[HuffTable], w: Int, h: Int,
      restartInterval: Int, ss: Int, se: Int, ah: Int, al: Int): Option[Int] = {
    if (coefs == null) return None
    val dcScan = ss == 0
    if (dcScan && se != 0) return None
    if (!dcScan && (scanComps.length != 1 || se < ss || se > 63)) return None
    if (al > 13 || (ah != 0 && ah != al + 1)) return None
    val refine = ah != 0
    if (dcScan && !refine) {
      var i = 0
      while (i < scanComps.length) {
        if (dcTab(comps(scanComps(i)).td) == null) return None
        i += 1
      }
    }
    if (!dcScan && acTab(comps(scanComps(0)).ta) == null) return None

    val (_, _, mcx, mcy, cw, ch, bPerLine, _) = geoOf(comps, w, h)
    val br = new BitReader(bytes, at)
    val preds = new Array[Int](comps.length)
    var eobrun = 0

    def dcFirstBlock(ci: Int, base: Int): Boolean = {
      val t = decodeHuff(br, dcTab(comps(ci).td))
      if (t < 0 || t > 11) return false
      val db = if (t == 0) 0 else { val v = br.bits(t); if (v < 0) return false; v }
      preds(ci) += extend(db, t)
      coefs(ci)(base) = preds(ci) << al
      true
    }
    def dcRefineBlock(ci: Int, base: Int): Boolean = {
      val b = br.bit()
      if (b < 0) return false
      if (b == 1) coefs(ci)(base) |= (1 << al)
      true
    }
    def acFirstBlock(co: Array[Int], base: Int, ta: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      var ended = false
      while (k <= se && !ended) {
        val rs = decodeHuff(br, acTab(ta))
        if (rs < 0) return false
        val r = (rs >>> 4) & 0xF
        val s = rs & 0xF
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) - 1
            if (r > 0) {
              val eb = br.bits(r); if (eb < 0) return false; eobrun += eb
            }
            ended = true
          }
        } else {
          if (s > 10) return false
          k += r
          if (k > se) return false
          val vb = br.bits(s)
          if (vb < 0) return false
          co(base + ZigZag(k)) = extend(vb, s) << al
          k += 1
        }
      }
      true
    }
    def acRefineBlock(co: Array[Int], base: Int, ta: Int): Boolean = {
      val p1 = 1 << al
      val m1 = -(1 << al)
      var k = ss
      if (eobrun == 0) {
        var eobHit = false
        while (k <= se && !eobHit) {
          val rs = decodeHuff(br, acTab(ta))
          if (rs < 0) return false
          var r = (rs >>> 4) & 0xF
          val s = rs & 0xF
          var newVal = 0
          if (s == 0) {
            if (r < 15) {
              // refine-scan EOBn counts INCLUDE the current block, whose
              // remaining band coefficients still receive correction
              // bits below (unlike the first-scan form, which ends the
              // current block outright — hence (1<<r) here, not
              // (1<<r) − 1): a plain EOB (r = 0) must still run the
              // correction pass over k..Se before the run decrements
              eobrun = 1 << r
              if (r > 0) {
                val eb = br.bits(r); if (eb < 0) return false; eobrun += eb
              }
              eobHit = true
            } // r == 15: ZRL — pass over 16 zero-history coefficients
          } else {
            if (s != 1) return false // refinements carry ±1 only
            val b = br.bit()
            if (b < 0) return false
            newVal = if (b == 1) p1 else m1
          }
          if (!eobHit) {
            var placed = false
            while (k <= se && !placed) {
              val zz = base + ZigZag(k)
              if (co(zz) != 0) {
                val b = br.bit()
                if (b < 0) return false
                if (b == 1 && (co(zz) & p1) == 0)
                  co(zz) += (if (co(zz) >= 0) p1 else m1)
              } else if (r == 0) {
                if (newVal != 0) co(zz) = newVal
                placed = true
              } else r -= 1
              k += 1
            }
          }
        }
      }
      if (eobrun > 0) {
        // this block lies inside an EOB run: only correction bits for
        // its already-nonzero coefficients in the band
        while (k <= se) {
          val zz = base + ZigZag(k)
          if (co(zz) != 0) {
            val b = br.bit()
            if (b < 0) return false
            if (b == 1 && (co(zz) & p1) == 0)
              co(zz) += (if (co(zz) >= 0) p1 else m1)
          }
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    var rstIdx = 0
    var mcusUntilRst = if (restartInterval > 0) restartInterval else -1
    def checkRestart(): Boolean = {
      if (mcusUntilRst == 0) {
        if (!br.consumeRst(0xD0 + rstIdx)) return false
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(preds, 0)
        eobrun = 0
        mcusUntilRst = restartInterval
      }
      true
    }

    if (dcScan && scanComps.length > 1) {
      var my = 0
      while (my < mcy) {
        var mx = 0
        while (mx < mcx) {
          if (!checkRestart()) return None
          var si = 0
          while (si < scanComps.length) {
            val ci = scanComps(si)
            val c = comps(ci)
            var j = 0
            while (j < c.vSamp) {
              var i2 = 0
              while (i2 < c.hSamp) {
                val base =
                  ((my * c.vSamp + j) * bPerLine(ci) + mx * c.hSamp + i2) * 64
                val ok =
                  if (refine) dcRefineBlock(ci, base) else dcFirstBlock(ci, base)
                if (!ok) return None
                i2 += 1
              }
              j += 1
            }
            si += 1
          }
          if (mcusUntilRst > 0) mcusUntilRst -= 1
          mx += 1
        }
        my += 1
      }
    } else {
      // single-component scan (every AC scan; DC scans with Ns = 1)
      val ci = scanComps(0)
      val ta = comps(ci).ta
      val co = coefs(ci)
      val wB = (cw(ci) + 7) / 8
      val hB = (ch(ci) + 7) / 8
      var by = 0
      while (by < hB) {
        var bx = 0
        while (bx < wB) {
          if (!checkRestart()) return None
          val base = (by * bPerLine(ci) + bx) * 64
          val ok =
            if (dcScan) {
              if (refine) dcRefineBlock(ci, base) else dcFirstBlock(ci, base)
            } else {
              if (refine) acRefineBlock(co, base, ta)
              else acFirstBlock(co, base, ta)
            }
          if (!ok) return None
          if (mcusUntilRst > 0) mcusUntilRst -= 1
          bx += 1
        }
        by += 1
      }
    }

    // the scan's entropy data ends at the next real marker: padding bits
    // die with the current byte; fill 0xFFs before the marker byte and
    // stuffed FF00 pairs are stepped over
    if (br.atMarker >= 0) return Some(br.pos)
    var p = br.pos
    while (p + 1 < bytes.length &&
        !((bytes(p) & 0xFF) == 0xFF && (bytes(p + 1) & 0xFF) != 0x00)) p += 1
    if (p + 1 >= bytes.length) None else Some(p)
  }

  /** Dequantize + IDCT the progressive coefficient stores and assemble
    * the image (runs at EOI, once every scan has landed). */
  private def reconstructProgressive(comps: Array[Comp],
      coefs: Array[Array[Int]], quant: Array[Array[Int]], w: Int,
      h: Int): Option[Image] = {
    if (comps == null || coefs == null) return None
    val (hmax, vmax, _, _, cw, ch, bPerLine, bPerCol) = geoOf(comps, w, h)
    val planes = new Array[Array[Byte]](comps.length)
    val dq = new Array[Int](64)
    val out = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val q = quant(comps(ci).tq)
      if (q == null) return None
      val stride = bPerLine(ci) * 8
      val plane = new Array[Byte](stride * bPerCol(ci) * 8)
      val co = coefs(ci)
      var by = 0
      while (by < bPerCol(ci)) {
        var bx = 0
        while (bx < bPerLine(ci)) {
          val base = (by * bPerLine(ci) + bx) * 64
          var z = 0
          while (z < 64) {
            val nat = ZigZag(z)
            dq(nat) = co(base + nat) * q(z)
            z += 1
          }
          idct(dq, out)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              plane((by * 8 + y) * stride + bx * 8 + x) = out(y * 8 + x).toByte
              x += 1
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
      planes(ci) = plane
      ci += 1
    }
    assemble(comps, planes, bPerLine, w, h, cw, ch, hmax, vmax)
  }

  /** Crop padding and assemble the output image: pass-through for gray,
    * replication chroma upsampling + JFIF YCbCr→RGB for color. Shared by
    * the baseline scan and the progressive reconstruction. */
  private def assemble(comps: Array[Comp], planes: Array[Array[Byte]],
      bPerLine: Array[Int], w: Int, h: Int, cw: Array[Int], ch: Array[Int],
      hmax: Int, vmax: Int): Option[Image] = {
    if (comps.length == 1) {
      val px = new Array[Byte](w * h)
      val stride = bPerLine(0) * 8
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * stride, px, y * w, w)
        y += 1
      }
      Some(Image(w, h, 1, px))
    } else {
      val px = new Array[Byte](w * h * 3)
      val strides = comps.indices.map(ci => bPerLine(ci) * 8).toArray
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def sampleOf(ci: Int): Int = {
            val c = comps(ci)
            val sx = math.min(x * c.hSamp / hmax, cw(ci) - 1)
            val sy = math.min(y * c.vSamp / vmax, ch(ci) - 1)
            planes(ci)(sy * strides(ci) + sx) & 0xFF
          }
          val yy = sampleOf(0).toDouble
          val cb = sampleOf(1) - 128.0
          val cr = sampleOf(2) - 128.0
          val o = (y * w + x) * 3
          px(o) = clamp255(math.round(yy + 1.402 * cr).toInt).toByte
          px(o + 1) = clamp255(math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt).toByte
          px(o + 2) = clamp255(math.round(yy + 1.772 * cb).toInt).toByte
          x += 1
        }
        y += 1
      }
      Some(Image(w, h, 3, px))
    }
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Inverse DCT of one dequantized block (natural order) into clamped
    * 0..255 samples. Double-precision separable-equivalent direct form —
    * exact for the DC-only blocks the fixtures produce, conformant
    * within T.83 tolerances for full-spectrum blocks. */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) sum += cC(u) * cC(v) * c * CosT(x)(u) * CosT(y)(v)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = clamp255(math.round(0.25 * sum + 128.0).toInt)
        x += 1
      }
      y += 1
    }
  }
}
