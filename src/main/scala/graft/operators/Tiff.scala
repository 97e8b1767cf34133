package graft.operators

/** Pure-JVM codec for a baseline-TIFF subset (TIFF 6.0, the public Adobe
  * specification) — the NINTH wire format in the codec bracket, and the
  * one that brings two structural features no other family exercises:
  *
  *   1. DUAL BYTE ORDER: the same logical file is legal little-endian
  *      ("II", Intel) or big-endian ("MM", Motorola), chosen by the
  *      header — every multi-byte read in the decoder is parametrized by
  *      it (the registered fixtures alternate the order by doc_id parity,
  *      so BOTH paths are load-bearing on every run).
  *   2. OFFSET INDIRECTION: a TIFF is a pointer graph, not a stream — an
  *      IFD of (tag, type, count, value-or-offset) entries where any
  *      value wider than 4 bytes lives elsewhere in the file behind an
  *      offset. Multi-strip images push StripOffsets/StripByteCounts
  *      out of line; single-strip images keep them inline — both layouts
  *      are legal and the fixture geometry (RowsPerStrip=2 over 5 rows →
  *      3 strips) forces the out-of-line branch while the spec also
  *      pins the inline one.
  *
  * Supported subset (encoder and decoder are an exact pair):
  * 8-bit grayscale (PhotometricInterpretation=1, SamplesPerPixel=1) and
  * 8-bit chunky RGB (Photometric=2, SamplesPerPixel=3), Compression 1
  * (none) or 32773 (PackBits — TIFF's own byte-oriented RLE, packed PER
  * ROW as §9 of the spec requires), any RowsPerStrip. The decoder is
  * deliberately more liberal than the encoder where the spec allows a
  * reader to be (unknown tags are skipped; trailing bytes behind the
  * pointer graph are fine; SHORT and LONG are both accepted for scalar
  * tags; spec defaults apply for Compression/SamplesPerPixel/
  * RowsPerStrip) and refuses — returns None, never throws — anything
  * that would change pixel interpretation it does not implement (tiles,
  * predictors, planar layout, non-8-bit depths, non-default
  * Orientation/FillOrder, other compressions).
  *
  * Decode discipline as in [[Multimodal.Bmp]]/[[Jpeg]]: every read is
  * bounds-checked, claimed dimensions are clamped on Longs BEFORE any
  * allocation, and PackBits output can never overrun the strip it
  * belongs to.
  */
object Tiff {

  /** Decoded raster: row-major, top-down; gray (spp=1) or RGB (spp=3). */
  final case class Image(width: Int, height: Int, samplesPerPixel: Int,
      pixels: Array[Byte])

  // Tag numbers used (TIFF 6.0 §8); the decoder also recognizes a few
  // interpretation-changing tags only to REFUSE non-default values.
  private val TagWidth = 256
  private val TagLength = 257
  private val TagBits = 258
  private val TagCompression = 259
  private val TagPhotometric = 262
  private val TagFillOrder = 266
  private val TagStripOffsets = 273
  private val TagOrientation = 274
  private val TagSpp = 277
  private val TagRowsPerStrip = 278
  private val TagStripCounts = 279
  private val TagPlanarConfig = 284
  private val TagPredictor = 317
  private val TagTileWidth = 322
  private val TagTileLength = 323
  private val TagTileOffsets = 324
  private val TagTileCounts = 325

  private val TypeShort = 3
  private val TypeLong = 4

  private val CompNone = 1
  private val CompPackBits = 32773

  // ------------------------------ encoder ------------------------------

  /** Little/big-endian byte sink. */
  private final class Writer(be: Boolean) {
    val buf = new java.io.ByteArrayOutputStream()
    def size: Int = buf.size
    def u8(v: Int): Unit = buf.write(v & 0xFF)
    def u16(v: Int): Unit =
      if (be) { u8(v >>> 8); u8(v) } else { u8(v); u8(v >>> 8) }
    def u32(v: Int): Unit =
      if (be) { u8(v >>> 24); u8(v >>> 16); u8(v >>> 8); u8(v) }
      else { u8(v); u8(v >>> 8); u8(v >>> 16); u8(v >>> 24) }
    def bytes(b: Array[Byte]): Unit = buf.write(b, 0, b.length)
    /** §2: all values must begin on a word boundary. */
    def alignEven(): Unit = if ((size & 1) == 1) u8(0)
  }

  /** PackBits-pack one row (§9): literal runs as (n−1, bytes) with
    * n ≤ 128, repeat runs of ≥ 2 as (1−n as signed byte, byte) with
    * n ≤ 128; −128 never emitted. Greedy: repeats win at length 2
    * except a length-2 repeat sandwiched between literals, which the
    * spec suggests folding into the literal — we take the simple greedy
    * (repeat at ≥ 2), which is legal; decoders cannot tell. */
  private[graft] def packRow(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(row.length + row.length / 128 + 1)
    var i = 0
    while (i < row.length) {
      var run = 1
      while (i + run < row.length && run < 128 && row(i + run) == row(i)) run += 1
      if (run >= 2) {
        out.write(1 - run) // two's-complement signed byte
        out.write(row(i) & 0xFF)
        i += run
      } else {
        var lit = 1
        while (i + lit < row.length && lit < 128 &&
            !(i + lit + 1 < row.length && row(i + lit) == row(i + lit + 1)))
          lit += 1
        out.write(lit - 1)
        (0 until lit).foreach(j => out.write(row(i + j) & 0xFF))
        i += lit
      }
    }
    out.toByteArray
  }

  /** Shared encoder core. `spp` 1 (gray) or 3 (RGB chunky); strips of
    * `rowsPerStrip` rows, each row PackBits-packed separately when
    * `packBits`. Layout: header, strip data (word-aligned), out-of-line
    * value arrays, IFD last. */
  private def encode(width: Int, height: Int, spp: Int, photometric: Int,
      pixels: Array[Byte], bigEndian: Boolean, rowsPerStrip: Int,
      packBits: Boolean): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xFFFF && height <= 0xFFFF,
      "encoder supports SHORT dimensions only")
    require(spp == 1 || spp == 3, "spp must be 1 or 3")
    require(pixels.length == width * height * spp, "raster size mismatch")
    require(rowsPerStrip > 0, "rowsPerStrip must be positive")

    val w = new Writer(bigEndian)
    // header: byte order, magic 42, IFD offset (patched below)
    val bom = if (bigEndian) 'M' else 'I'
    w.u8(bom); w.u8(bom); w.u16(42)
    w.u32(0) // placeholder — IFD offset patched at the end

    val rowBytes = width * spp
    val nStrips = (height + rowsPerStrip - 1) / rowsPerStrip
    val stripOffsets = new Array[Int](nStrips)
    val stripCounts = new Array[Int](nStrips)
    var s = 0
    while (s < nStrips) {
      w.alignEven()
      stripOffsets(s) = w.size
      val rows = math.min(rowsPerStrip, height - s * rowsPerStrip)
      var r = 0
      while (r < rows) {
        val row = java.util.Arrays.copyOfRange(pixels,
          (s * rowsPerStrip + r) * rowBytes, (s * rowsPerStrip + r + 1) * rowBytes)
        w.bytes(if (packBits) packRow(row) else row)
        r += 1
      }
      stripCounts(s) = w.size - stripOffsets(s)
      s += 1
    }

    // out-of-line arrays (only written when they exceed the 4-byte
    // inline value field)
    w.alignEven()
    val bitsOffset = if (spp == 3) { // 3 SHORTs = 6 bytes > 4
      val o = w.size; (0 until 3).foreach(_ => w.u16(8)); o
    } else 0
    w.alignEven()
    val offsetsOffset = if (nStrips > 1) {
      val o = w.size; stripOffsets.foreach(w.u32); o
    } else 0
    w.alignEven()
    val countsOffset = if (nStrips > 1) {
      val o = w.size; stripCounts.foreach(w.u32); o
    } else 0

    w.alignEven()
    val ifdOffset = w.size
    def entryShort(tag: Int, v: Int): Unit = {
      w.u16(tag); w.u16(TypeShort); w.u32(1); w.u16(v); w.u16(0)
    }
    def entryLongs(tag: Int, vs: Array[Int], offset: Int): Unit = {
      w.u16(tag); w.u16(TypeLong); w.u32(vs.length)
      if (vs.length == 1) w.u32(vs(0)) else w.u32(offset)
    }
    // entries in ascending tag order (§2 requirement)
    w.u16(9)
    entryShort(TagWidth, width)
    entryShort(TagLength, height)
    if (spp == 3) { // count 3 → out of line
      w.u16(TagBits); w.u16(TypeShort); w.u32(3); w.u32(bitsOffset)
    } else entryShort(TagBits, 8)
    entryShort(TagCompression, if (packBits) CompPackBits else CompNone)
    entryShort(TagPhotometric, photometric)
    entryLongs(TagStripOffsets, stripOffsets, offsetsOffset)
    entryShort(TagSpp, spp)
    entryShort(TagRowsPerStrip, rowsPerStrip)
    entryLongs(TagStripCounts, stripCounts, countsOffset)
    w.u32(0) // no next IFD

    val out = w.buf.toByteArray
    // patch the header's IFD offset
    if (bigEndian) {
      out(4) = (ifdOffset >>> 24).toByte; out(5) = (ifdOffset >>> 16).toByte
      out(6) = (ifdOffset >>> 8).toByte; out(7) = ifdOffset.toByte
    } else {
      out(4) = ifdOffset.toByte; out(5) = (ifdOffset >>> 8).toByte
      out(6) = (ifdOffset >>> 16).toByte; out(7) = (ifdOffset >>> 24).toByte
    }
    out
  }

  /** 8-bit grayscale (BlackIsZero), uncompressed or PackBits. */
  def encodeGray(width: Int, height: Int, gray: Array[Byte],
      bigEndian: Boolean = false, rowsPerStrip: Int = Int.MaxValue,
      packBits: Boolean = false): Array[Byte] =
    encode(width, height, 1, 1, gray, bigEndian,
      math.min(rowsPerStrip, height), packBits)

  /** 8-bit chunky RGB, uncompressed or PackBits. */
  def encodeRgb(width: Int, height: Int, rgb: Array[Byte],
      bigEndian: Boolean = false, rowsPerStrip: Int = Int.MaxValue,
      packBits: Boolean = false): Array[Byte] =
    encode(width, height, 3, 2, rgb, bigEndian,
      math.min(rowsPerStrip, height), packBits)

  // ------------------------------ decoder ------------------------------

  private final class Reader(val bytes: Array[Byte], val be: Boolean) {
    def u16(o: Int): Int =
      if (be) ((bytes(o) & 0xFF) << 8) | (bytes(o + 1) & 0xFF)
      else (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    /** unsigned 32-bit as Long so offsets past 2 GiB refuse cleanly. */
    def u32(o: Int): Long =
      if (be) (u16(o).toLong << 16) | u16(o + 2)
      else (u16(o + 2).toLong << 16) | u16(o)
  }

  /** Read an entry's values as Longs; None if the type is not
    * SHORT/LONG, the count disagrees with `expectMax`, or any byte is
    * out of bounds. Inline values are left-justified in the 4-byte
    * field (§2), in the file's byte order. */
  private def entryValues(r: Reader, entryOff: Int, expectMax: Int): Option[Seq[Long]] = {
    val typ = r.u16(entryOff + 2)
    val cnt = r.u32(entryOff + 4)
    val size = typ match {
      case TypeShort => 2L
      case TypeLong => 4L
      case _ => return None
    }
    if (cnt < 1 || cnt > expectMax) return None
    val total = size * cnt
    val base =
      if (total <= 4) entryOff + 8L
      else r.u32(entryOff + 8)
    if (base < 0 || base + total > r.bytes.length) return None
    Some((0 until cnt.toInt).map { i =>
      val o = (base + i * size).toInt
      if (typ == TypeShort) r.u16(o).toLong else r.u32(o)
    })
  }

  private val MaxStrips = 1 << 20

  /** Decode; None on any malformation or on any legal-but-unsupported
    * layout (see object doc). Never throws. */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 8) return None
    val be = bytes(0) match {
      case 'I' if bytes(1) == 'I' => false
      case 'M' if bytes(1) == 'M' => true
      case _ => return None
    }
    val r = new Reader(bytes, be)
    if (r.u16(2) != 42) return None
    val ifdOff = r.u32(4)
    if (ifdOff < 8 || ifdOff + 2 > bytes.length) return None
    val io = ifdOff.toInt
    val n = r.u16(io)
    if (n < 1 || io + 2L + 12L * n + 4 > bytes.length) return None

    // one pass over the entries: collect the tags we use, refuse the
    // interpretation-changing ones we don't implement
    var width = -1L; var height = -1L
    var bits: Seq[Long] = Seq(1L) // spec default
    var comp = CompNone.toLong; var photo = -1L; var spp = 1L
    var rps = 0xFFFFFFFFL // spec default: effectively "one strip"
    var offsets: Seq[Long] = null; var counts: Seq[Long] = null
    var i = 0
    var prevTag = -1
    while (i < n) {
      val eo = io + 2 + 12 * i
      val tag = r.u16(eo)
      if (tag <= prevTag) return None // §2: ascending tag order
      prevTag = tag
      tag match {
        case TagWidth => width = entryValues(r, eo, 1).map(_.head).getOrElse(return None)
        case TagLength => height = entryValues(r, eo, 1).map(_.head).getOrElse(return None)
        case TagBits => bits = entryValues(r, eo, 16).getOrElse(return None)
        case TagCompression => comp = entryValues(r, eo, 1).map(_.head).getOrElse(return None)
        case TagPhotometric => photo = entryValues(r, eo, 1).map(_.head).getOrElse(return None)
        case TagStripOffsets => offsets = entryValues(r, eo, MaxStrips).getOrElse(return None)
        case TagSpp => spp = entryValues(r, eo, 1).map(_.head).getOrElse(return None)
        case TagRowsPerStrip => rps = entryValues(r, eo, 1).map(_.head).getOrElse(return None)
        case TagStripCounts => counts = entryValues(r, eo, MaxStrips).getOrElse(return None)
        // refuse non-default values of tags that change interpretation
        case TagFillOrder | TagOrientation | TagPlanarConfig | TagPredictor =>
          if (entryValues(r, eo, 1).map(_.head).getOrElse(return None) != 1L) return None
        case TagTileWidth | TagTileLength | TagTileOffsets | TagTileCounts =>
          return None // tiled TIFF not implemented
        case _ => () // unknown/cosmetic tag: skip without parsing
      }
      i += 1
    }

    if (width <= 0 || height <= 0 || photo < 0 || offsets == null || counts == null)
      return None
    if (spp != 1L && spp != 3L) return None
    if (!((spp == 1L && photo == 1L) || (spp == 3L && photo == 2L))) return None
    if (bits.length != spp.toInt || bits.exists(_ != 8L)) return None
    if (comp != CompNone && comp != CompPackBits) return None
    // clamp BEFORE any allocation (the q91 guard discipline)
    if (width > (1 << 24) || height > (1 << 24)) return None
    if (width * height * spp > Int.MaxValue / 4) return None
    val w = width.toInt; val h = height.toInt; val sp = spp.toInt
    val rowsPer = if (rps > h) h.toLong else rps
    if (rowsPer < 1) return None
    val nStrips = ((h + rowsPer - 1) / rowsPer).toInt
    if (offsets.length != nStrips || counts.length != nStrips) return None

    val rowBytes = w * sp
    val px = new Array[Byte](w * h * sp)
    var strip = 0
    while (strip < nStrips) {
      val rows = math.min(rowsPer.toInt, h - strip * rowsPer.toInt)
      val expected = rows * rowBytes
      val off = offsets(strip); val cnt = counts(strip)
      if (off < 0 || cnt < 0 || off + cnt > bytes.length) return None
      val dst = strip * rowsPer.toInt * rowBytes
      if (comp == CompNone) {
        if (cnt != expected) return None
        System.arraycopy(bytes, off.toInt, px, dst, expected)
      } else { // PackBits
        var src = off.toInt
        val end = (off + cnt).toInt
        var produced = 0
        while (produced < expected) {
          if (src >= end) return None
          val op = bytes(src); src += 1
          if (op >= 0) { // literal of op+1 bytes
            val m = op + 1
            if (src + m > end || produced + m > expected) return None
            System.arraycopy(bytes, src, px, dst + produced, m)
            src += m; produced += m
          } else if (op != -128) { // repeat next byte 1-op times
            val m = 1 - op
            if (src >= end || produced + m > expected) return None
            java.util.Arrays.fill(px, dst + produced, dst + produced + m, bytes(src))
            src += 1; produced += m
          } // -128: noop per spec
        }
        // trailing pad bytes inside the declared count are tolerated
        // (writers may pad strips to word boundaries)
      }
      strip += 1
    }
    Some(Image(w, h, sp, px))
  }
}
