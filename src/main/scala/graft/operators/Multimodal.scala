package graft.operators

import graft.GQuery
import graft.Tables.t
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, batch decode/feature-extraction via `mapPartitions` over a
  * typed Dataset (the Scala analogue of `mapInPandas` batch UDFs).
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in this
  * container): [[StubDecoder]] derives deterministic pseudo-features from
  * the raw bytes. Everything around it — binary schema, partition-batched
  * iteration, feature array shape — is the real pipeline and is what the
  * oracle/spec verify.
  */
object Multimodal {

  /** A media row: payload is an opaque blob + metadata columns. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String,
      width: Int, height: Int)

  final case class MediaFeatures(doc_id: Long, n_bytes: Long, first_cp: Int,
      fake_label: Long, feature: Seq[Float])

  /** STUB decoder: a real implementation would JNI/FFI into an image/audio
    * codec here; this one derives a deterministic 8-dim feature from byte
    * statistics so the distributed plumbing is testable. */
  object StubDecoder {
    val FeatureDim = 8

    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        val bytes = r.payload
        val feature = (0 until FeatureDim).map { i =>
          var acc = 0L
          var j = i
          while (j < bytes.length) { acc += (bytes(j) & 0xFF); j += FeatureDim }
          (acc % 997L).toFloat / 997f
        }
        // decode back to text for the code-point feature: well-defined for
        // any UTF-8 payload (DuckDB's ascii() = first code point, '' -> 0)
        val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        MediaFeatures(r.doc_id, bytes.length.toLong,
          if (text.nonEmpty) text.codePointAt(0) else 0,
          bytes.length.toLong % 10L, feature)
      }
  }

  /** A sampled frame: fixed-size byte slice of a "video" payload. */
  final case class Frame(doc_id: Long, frame_idx: Long, frame_bytes: Array[Byte])

  /** Frame sampling: treat the payload as a sequence of fixed-size frames
    * and keep every `everyN`-th (the video-pipeline primitive; a real
    * decoder would seek keyframes, the slicing/batch plumbing is
    * identical). Pure typed flatMap — distributes per partition, no
    * driver involvement. */
  def sampleFrames(rows: Iterator[MediaRow], frameBytes: Int, everyN: Int): Iterator[Frame] =
    rows.flatMap { r =>
      val n = r.payload.length
      val nFrames = (n + frameBytes - 1) / frameBytes
      (0 until nFrames by everyN).iterator.map { i =>
        val from = i * frameBytes
        val until = math.min(from + frameBytes, n)
        Frame(r.doc_id, i.toLong, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }

  val FrameBytes = 64
  val SampleEvery = 3

  /** q48 — frame-sampling pipeline: payload → typed frame rows; scalar
    * outputs (index, frame length) are arithmetically derivable from the
    * byte length, so the oracle verifies the slicing exactly. */
  private def q48(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .mapPartitions(rows => sampleFrames(rows, FrameBytes, SampleEvery))
      .select($"doc_id", $"frame_idx",
        length($"frame_bytes").cast("long").as("frame_len"))
      .orderBy($"doc_id", $"frame_idx")
  }

  private val q48Sql =
    s"""WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
       |idx AS (SELECT doc_id, n, unnest(range(0, (n + ${FrameBytes - 1}) // $FrameBytes, $SampleEvery)) AS frame_idx FROM m)
       |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |  CAST(LEAST($FrameBytes, n - frame_idx * $FrameBytes) AS BIGINT) AS frame_len
       |FROM idx ORDER BY doc_id, frame_idx""".stripMargin

  /** documents → media rows: UTF-8 payload standing in for image bytes. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("payload"),
        lit("image/fake").as("media_type"),
        ($"n_chars" % 640).cast("int").as("width"),
        ($"n_chars" % 480).cast("int").as("height"))
      .as[MediaRow]
  }

  /** A stride-resized payload: the codec-free shape of nearest-neighbor
    * image resize (index arithmetic + gather). */
  final case class ResizedMedia(doc_id: Long, orig_len: Long, stride: Long,
      resized_len: Long, resized: Array[Byte])

  val ResizeTarget = 48

  /** Resize: stride-sample the payload down to ≤ `targetBytes`. A real
    * image resize replaces the byte gather with pixel interpolation; the
    * distributed shape — pure typed map, no shuffle, output size bounded
    * by the target — is identical. */
  def resizePayload(rows: Iterator[MediaRow], targetBytes: Int): Iterator[ResizedMedia] =
    rows.map { r =>
      val n = r.payload.length
      if (n == 0) ResizedMedia(r.doc_id, 0L, 0L, 0L, Array.empty)
      else {
        val stride = math.max(1, (n + targetBytes - 1) / targetBytes)
        val out = (0 until n by stride).map(r.payload(_)).toArray
        ResizedMedia(r.doc_id, n.toLong, stride.toLong, out.length.toLong, out)
      }
    }

  /** q55 — the resize pipeline: binary column → stride resize → bounded
    * payload. The oracle verifies the index arithmetic (stride and
    * resized length are exact functions of the byte length); the byte
    * gather itself is spec-verified. */
  private def q55(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .mapPartitions(rows => resizePayload(rows, ResizeTarget))
      .select($"doc_id", $"orig_len", $"stride", $"resized_len")
      .orderBy($"doc_id")
  }

  private val q55Sql =
    s"""WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
       |r AS (SELECT doc_id, n,
       |  CASE WHEN n = 0 THEN 0 ELSE GREATEST(1, (n + ${ResizeTarget - 1}) // $ResizeTarget) END AS stride
       |  FROM m)
       |SELECT doc_id, CAST(n AS BIGINT) AS orig_len, CAST(stride AS BIGINT) AS stride,
       |  CAST(CASE WHEN n = 0 THEN 0 ELSE (n + stride - 1) // stride END AS BIGINT) AS resized_len
       |FROM r ORDER BY doc_id""".stripMargin

  /** q35 — the decode pipeline end-to-end: binary column → partition-batched
    * stub decode → typed features. Scalar outputs are byte-derivable so the
    * DuckDB oracle can verify the plumbing exactly. */
  private def q35(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .mapPartitions(StubDecoder.decodeBatch)
      .select($"doc_id", $"n_bytes", $"first_cp", $"fake_label")
      .orderBy($"doc_id")
  }

  private val q35Sql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_cp,
      |  CAST(octet_length(encode(text)) % 10 AS BIGINT) AS fake_label
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Pure-JVM decoder for binary PPM (P6) — a REAL image format decode
    * (header tokenizer with comment support, dimension/maxval validation,
    * raster extraction), replacing the stub for one concrete format. Only
    * 1-byte samples are supported (maxval ≤ 255); a 2-byte-sample or
    * malformed payload decodes to None, the per-row skip policy (S8). */
  object Ppm {
    final case class Image(width: Int, height: Int, maxval: Int, pixels: Array[Byte])

    /** P6 writer (used to synthesize oracle-checkable images and by the
      * golden spec); `comment` exercises the parser's `#` handling. */
    def encodeP6(width: Int, height: Int, maxval: Int, pixels: Array[Byte],
        comment: Option[String] = None): Array[Byte] = {
      val header = new StringBuilder("P6\n")
      comment.foreach(c => header.append("# ").append(c).append('\n'))
      header.append(width).append(' ').append(height).append('\n').append(maxval).append('\n')
      header.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ pixels
    }

    def decode(bytes: Array[Byte]): Option[Image] = {
      var i = 0
      def isWs(b: Byte): Boolean =
        b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b
      def token(): Option[String] = {
        var scanning = true
        while (scanning && i < bytes.length) {
          if (isWs(bytes(i))) i += 1
          else if (bytes(i) == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
          else scanning = false
        }
        val start = i
        while (i < bytes.length && !isWs(bytes(i)) && bytes(i) != '#') i += 1
        if (i > start)
          Some(new String(bytes, start, i - start, java.nio.charset.StandardCharsets.US_ASCII))
        else None
      }
      def posInt(t: Option[String]): Option[Int] = t.flatMap(_.toIntOption).filter(_ > 0)
      if (!token().contains("P6")) return None
      (posInt(token()), posInt(token()), posInt(token())) match {
        case (Some(w), Some(h), Some(mv)) if mv <= 255 =>
          // exactly ONE whitespace byte separates the header from the raster
          if (i >= bytes.length || !isWs(bytes(i))) return None
          val rasterStart = i + 1
          val need = w.toLong * h * 3
          if (bytes.length - rasterStart < need) None
          else Some(Image(w, h, mv,
            java.util.Arrays.copyOfRange(bytes, rasterStart, rasterStart + need.toInt)))
        case _ => None
      }
    }
  }

  val PpmW = 8
  val PpmH = 4

  final case class PpmStats(doc_id: Long, width: Int, height: Int, maxval: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Wrap each document's UTF-8 bytes as the raster of a PpmW×PpmH P6
    * image (zero-padded), with a `#` comment line in the header. */
  def synthesizePpm(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      val px = java.util.Arrays.copyOf(txt, PpmW * PpmH * 3)
      MediaRow(id, Ppm.encodeP6(PpmW, PpmH, 255, px, Some(s"doc $id")),
        "image/x-portable-pixmap", PpmW, PpmH)
    }

  /** REAL decode → per-channel pixel means. Invalid payloads are skipped
    * (S8 row policy). Channel sums divide by the pixel count (a power of
    * two here), so the means are exact doubles the oracle reproduces. */
  def decodePpmStats(rows: Iterator[MediaRow]): Iterator[PpmStats] =
    rows.flatMap { r =>
      Ppm.decode(r.payload).map { img =>
        val n = img.width * img.height
        val sums = new Array[Long](3)
        var p = 0
        while (p < n * 3) { sums(p % 3) += img.pixels(p) & 0xFF; p += 1 }
        PpmStats(r.doc_id, img.width, img.height, img.maxval,
          sums(0).toDouble / n, sums(1).toDouble / n, sums(2).toDouble / n)
      }
    }

  /** q58 — the decode pipeline on a REAL format: synthesize a P6 image per
    * document (raster = the document's bytes — deterministic, so DuckDB
    * can recompute the expected pixels), run the actual header-parsing
    * decoder in a partition-batched map, emit decoded dimensions + pixel
    * stats. Unlike q35's stub, a decoder bug (wrong raster offset, wrong
    * channel interleave, off-by-one in the header scan) shifts every mean
    * and fails the hash compare. */
  private def q58(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodePpmStats(synthesizePpm(rows)))
      .select($"doc_id", $"width", $"height", $"maxval", $"mean_r", $"mean_g", $"mean_b")
      .orderBy($"doc_id")
  }

  /** NOTE — single-byte-corpus assumption (shared with q77Sql): the Spark
    * side rasterizes the UTF-8 BYTES of `text`, while the oracle indexes
    * CHARACTERS (`ascii(substr(text, j+1, 1))` = code point of the j-th
    * character). The two agree exactly iff every character is single-byte
    * (ASCII ≤ 0x7F), which the driver's synthetic corpora satisfy; a
    * non-ASCII corpus would need a byte-level oracle (e.g. indexing into
    * `encode(text)` blob bytes) — documented rather than generalized
    * because the hash gate would fail loudly, not silently, on such data. */
  private val q58Sql = {
    val raster = PpmW * PpmH * 3
    def chSum(c: Int) = s"CAST(SUM(CASE WHEN j % 3 = $c THEN v ELSE 0 END) AS BIGINT)"
    s"""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
       |ch AS (SELECT doc_id, j,
       |    CASE WHEN j < len THEN ascii(substr(text, CAST(j + 1 AS INTEGER), 1)) ELSE 0 END AS v
       |  FROM b, range($raster) t(j)),
       |agg AS (SELECT doc_id, ${chSum(0)} AS sr, ${chSum(1)} AS sg, ${chSum(2)} AS sb
       |  FROM ch GROUP BY doc_id)
       |SELECT doc_id, CAST($PpmW AS INTEGER) AS width, CAST($PpmH AS INTEGER) AS height,
       |  CAST(255 AS INTEGER) AS maxval,
       |  sr / ${PpmW * PpmH}.0 AS mean_r, sg / ${PpmW * PpmH}.0 AS mean_g,
       |  sb / ${PpmW * PpmH}.0 AS mean_b
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  /** Pure-JVM decoder for RIFF/WAVE PCM — a REAL audio container decode
    * (chunk walker with unknown-chunk skipping and word alignment, fmt
    * validation, 16-bit little-endian sample extraction) beside the PPM
    * image path: the two concrete formats bracketing the stub. Only
    * PCM (format 1) at 16 bits decodes; anything else — float WAV,
    * truncated data, bad tags — is None, the per-row skip policy (S8). */
  object Wav {
    final case class Audio(sampleRate: Int, channels: Int, bitsPerSample: Int,
        samples: Array[Short])

    private def le(n: Int): ByteOrderBuf = new ByteOrderBuf(n)

    /** Minimal little-endian writer (no java.nio dependency games). */
    final class ByteOrderBuf(n: Int) {
      val a = new Array[Byte](n)
      private var i = 0
      def ascii(s: String): this.type = { s.foreach(c => { a(i) = c.toByte; i += 1 }); this }
      def u32(v: Long): this.type = {
        a(i) = (v & 0xFF).toByte; a(i + 1) = ((v >> 8) & 0xFF).toByte
        a(i + 2) = ((v >> 16) & 0xFF).toByte; a(i + 3) = ((v >> 24) & 0xFF).toByte
        i += 4; this
      }
      def u16(v: Int): this.type = {
        a(i) = (v & 0xFF).toByte; a(i + 1) = ((v >> 8) & 0xFF).toByte; i += 2; this
      }
      def bytes(b: Array[Byte]): this.type = {
        System.arraycopy(b, 0, a, i, b.length); i += b.length; this
      }
      /** one zero pad byte (the array is zero-initialized). */
      def pad(): this.type = { i += 1; this }
    }

    /** PCM-16 writer (synthesizes oracle-checkable payloads; the golden
      * spec drives it too). `junk` inserts an unknown chunk BEFORE fmt —
      * exercising the walker's skip + odd-size word-alignment path. */
    def encodePcm16(sampleRate: Int, channels: Int, samples: Array[Short],
        junk: Option[Array[Byte]] = None): Array[Byte] = {
      val dataBytes = samples.length * 2
      val junkBytes = junk.map(j => 8 + j.length + (j.length & 1)).getOrElse(0)
      val riffSize = 4 + junkBytes + 24 + 8 + dataBytes
      val buf = le(8 + riffSize)
      buf.ascii("RIFF").u32(riffSize.toLong).ascii("WAVE")
      junk.foreach { j =>
        buf.ascii("LIST").u32(j.length.toLong).bytes(j)
        if ((j.length & 1) == 1) buf.pad() // word alignment after odd chunk
      }
      buf.ascii("fmt ").u32(16L).u16(1).u16(channels)
        .u32(sampleRate.toLong).u32(sampleRate.toLong * channels * 2)
        .u16(channels * 2).u16(16)
      buf.ascii("data").u32(dataBytes.toLong)
      samples.foreach(s => buf.u16(s & 0xFFFF))
      buf.a
    }

    def decode(bytes: Array[Byte]): Option[Audio] = {
      def u32(o: Int): Long =
        if (o + 4 > bytes.length) -1L
        else (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
          ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
      def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
      def tag(o: Int): String =
        if (o + 4 > bytes.length) ""
        else new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var data: Option[(Int, Int)] = None // (offset, size)
      var o = 12
      while (o + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
        val id = tag(o)
        val size = u32(o + 4)
        if (size < 0 || o + 8 + size > bytes.length) return None
        val body = o + 8
        id match {
          case "fmt " =>
            if (size < 16) return None
            val audioFormat = u16(body)
            if (audioFormat != 1 || u16(body + 14) != 16) return None // PCM-16 only
            fmt = Some((u16(body + 2), u32(body + 4).toInt, u16(body + 14)))
          case "data" => data = Some((body, size.toInt))
          case _ => () // unknown chunk: skip
        }
        o = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
      for ((channels, rate, bits) <- fmt; (off, sz) <- data
           if channels >= 1 && rate > 0 && sz % (channels * 2) == 0) yield {
        val samples = new Array[Short](sz / 2)
        var i = 0
        while (i < samples.length) { samples(i) = u16(off + i * 2).toShort; i += 1 }
        Audio(rate, channels, bits, samples)
      }
    }
  }

  val WavFrames = 64
  val WavChannels = 2
  val WavRate = 8000

  final case class WavStats(doc_id: Long, sample_rate: Int, channels: Int,
      n_frames: Long, mean_left: Double, mean_right: Double, peak: Int)

  /** Wrap each document's bytes as a stereo PCM-16 clip: interleaved
    * sample j = (byte_j − 128)·256, zero-padded to [[WavFrames]] frames —
    * deterministic, so DuckDB recomputes the expected samples. A LIST
    * junk chunk (odd-sized, exercising alignment) precedes fmt. */
  def synthesizeWav(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      val n = WavFrames * WavChannels
      val samples = new Array[Short](n)
      var j = 0
      while (j < n) {
        val v = if (j < txt.length) txt(j) & 0xFF else 0
        samples(j) = ((v - 128) * 256).toShort
        j += 1
      }
      MediaRow(id, Wav.encodePcm16(WavRate, WavChannels, samples,
          junk = Some(s"doc $id".getBytes(java.nio.charset.StandardCharsets.US_ASCII))),
        "audio/wav", 0, 0)
    }

  /** REAL decode → per-channel means + peak. Channel sums are integer and
    * divide by the frame count (a power of two), so the means are exact
    * doubles the oracle reproduces; a decoder bug (wrong data offset,
    * byte-order slip, channel de-interleave off-by-one) shifts them. */
  def decodeWavStats(rows: Iterator[MediaRow]): Iterator[WavStats] =
    rows.flatMap { r =>
      Wav.decode(r.payload).map { a =>
        val frames = a.samples.length / a.channels
        var sl = 0L; var sr = 0L; var peak = 0
        var i = 0
        while (i < a.samples.length) {
          val s = a.samples(i).toInt
          if (i % a.channels == 0) sl += s else sr += s
          if (math.abs(s) > peak) peak = math.abs(s)
          i += 1
        }
        WavStats(r.doc_id, a.sampleRate, a.channels, frames.toLong,
          sl.toDouble / frames, sr.toDouble / frames, peak)
      }
    }

  /** ITU-T G.711 companding — the audio COMPRESSION axis beside the
    * PCM-16 container (the image side has five compressed wire formats;
    * audio had none): µ-law and A-law, the two standard 8-bit logarithmic
    * codings of 16-bit linear PCM that telephony corpora actually arrive
    * in. Implemented from the published algorithm (segment/exponent +
    * 4-bit mantissa, BIAS 0x84 and CLIP 32635 for µ-law; 13-bit
    * magnitudes, segment table and the 0x55 toggle for A-law; sign
    * conventions per the spec's encode/decode tables). Both directions
    * are total on their domains — every 16-bit sample encodes, every
    * byte decodes — so there is no malformed-payload surface; the
    * correctness property is instead the CODEBOOK CONTRACT
    * (decode∘encode∘decode = decode on all 256 bytes) plus bounded
    * quantization error, both pinned by G711Spec across the full 16-bit
    * sweep. */
  object G711 {
    private val Bias = 0x84
    private val Clip = 32635

    /** 16-bit linear → µ-law byte. */
    def ulawEncode(sample: Int): Int = {
      val sign = if (sample < 0) 0x80 else 0x00
      val mag = math.min(if (sample < 0) -sample else sample, Clip) + Bias
      val exp =
        if (mag <= 0xFF) 0 else if (mag <= 0x1FF) 1 else if (mag <= 0x3FF) 2
        else if (mag <= 0x7FF) 3 else if (mag <= 0xFFF) 4 else if (mag <= 0x1FFF) 5
        else if (mag <= 0x3FFF) 6 else 7
      val mant = (mag >> (exp + 3)) & 0x0F
      ~(sign | (exp << 4) | mant) & 0xFF
    }

    /** µ-law byte → 16-bit linear. */
    def ulawDecode(byte: Int): Int = {
      val u = ~byte & 0xFF
      val t = (((u & 0x0F) << 3) + Bias) << ((u >> 4) & 0x07)
      if ((u & 0x80) != 0) Bias - t else t - Bias
    }

    /** 16-bit linear → A-law byte (13-bit magnitude path). */
    def alawEncode(sample: Int): Int = {
      val x = sample >> 3 // arithmetic shift = floor division by 8
      val (mask, px) = if (x >= 0) (0xD5, x) else (0x55, -x - 1)
      val seg =
        if (px <= 0x1F) 0 else if (px <= 0x3F) 1 else if (px <= 0x7F) 2
        else if (px <= 0xFF) 3 else if (px <= 0x1FF) 4 else if (px <= 0x3FF) 5
        else if (px <= 0x7FF) 6 else if (px <= 0xFFF) 7 else 8
      if (seg >= 8) 0x7F ^ mask
      else {
        val mant = if (seg < 2) (px >> 1) & 0x0F else (px >> seg) & 0x0F
        ((seg << 4) | mant) ^ mask
      }
    }

    /** A-law byte → 16-bit linear. */
    def alawDecode(byte: Int): Int = {
      val a = byte ^ 0x55
      val t0 = (a & 0x0F) << 4
      val seg = (a >> 4) & 0x07
      val t = seg match {
        case 0 => t0 + 8
        case 1 => t0 + 0x108
        case s => (t0 + 0x108) << (s - 1)
      }
      if ((a & 0x80) != 0) t else -t
    }
  }

  final case class CompandStats(doc_id: Long, n_samples: Long,
      byte_sum: Long, recon_sum: Long, max_err: Long)

  /** Synthesize q77's PCM samples from the document bytes, compand each
    * through the given law and expand back; per-doc stats carry a
    * checksum of the COMPANDED bytes (pins encode exactly) beside the
    * reconstruction sum and worst quantization error (pins decode). */
  def compandStats(rows: Iterator[(Long, Array[Byte])],
      enc: Int => Int, dec: Int => Int): Iterator[CompandStats] =
    rows.map { case (id, txt) =>
      val n = WavFrames * WavChannels
      var j = 0
      var byteSum = 0L; var reconSum = 0L; var maxErr = 0L
      while (j < n) {
        val v = ((if (j < txt.length) txt(j) & 0xFF else 0) - 128) * 256
        val b = enc(v)
        val r = dec(b)
        byteSum += b; reconSum += r
        maxErr = math.max(maxErr, math.abs(r.toLong - v))
        j += 1
      }
      CompandStats(id, n.toLong, byteSum, reconSum, maxErr)
    }

  private def q120(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows =>
        compandStats(rows, G711.ulawEncode, G711.ulawDecode))
      .select($"doc_id", $"n_samples", $"byte_sum", $"recon_sum", $"max_err")
      .orderBy($"doc_id")
  }

  private def q121(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows =>
        compandStats(rows, G711.alawEncode, G711.alawDecode))
      .select($"doc_id", $"n_samples", $"byte_sum", $"recon_sum", $"max_err")
      .orderBy($"doc_id")
  }

  // Oracles: the same segment/mantissa arithmetic re-derived in SQL (CASE
  // ladders for the segment, integer div/mod for the shifts — no bit ops,
  // so the text stays portable). Single-byte-corpus assumption as in
  // q77Sql; samples are q77's (byte − 128) · 256 synthesis.
  private val q120Sql = {
    val n = WavFrames * WavChannels
    s"""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
       |s AS (SELECT doc_id, j,
       |    (CASE WHEN j < len THEN ascii(substr(text, CAST(j + 1 AS INTEGER), 1)) ELSE 0 END - 128) * 256 AS v
       |  FROM b, range($n) t(j)),
       |m AS (SELECT doc_id, j, v,
       |    CASE WHEN v < 0 THEN 1 ELSE 0 END AS neg,
       |    LEAST(CASE WHEN v < 0 THEN -v ELSE v END, 32635) + 132 AS mag
       |  FROM s),
       |e AS (SELECT doc_id, j, v, neg, mag,
       |    CASE WHEN mag <= 255 THEN 0 WHEN mag <= 511 THEN 1
       |         WHEN mag <= 1023 THEN 2 WHEN mag <= 2047 THEN 3
       |         WHEN mag <= 4095 THEN 4 WHEN mag <= 8191 THEN 5
       |         WHEN mag <= 16383 THEN 6 ELSE 7 END AS seg
       |  FROM m),
       |cb AS (SELECT doc_id, j, v, neg, seg,
       |    (mag // CAST(POWER(2, seg + 3) AS BIGINT)) % 16 AS mant
       |  FROM e),
       |rt AS (SELECT doc_id,
       |    255 - (neg * 128 + seg * 16 + mant) AS byte,
       |    (CASE WHEN neg = 1 THEN -1 ELSE 1 END) *
       |      ((mant * 8 + 132) * CAST(POWER(2, seg) AS BIGINT) - 132) AS recon,
       |    v
       |  FROM cb)
       |SELECT doc_id, CAST($n AS BIGINT) AS n_samples,
       |  CAST(SUM(byte) AS BIGINT) AS byte_sum,
       |  CAST(SUM(recon) AS BIGINT) AS recon_sum,
       |  CAST(MAX(ABS(recon - v)) AS BIGINT) AS max_err
       |FROM rt GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  private val q121Sql = {
    val n = WavFrames * WavChannels
    s"""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
       |s AS (SELECT doc_id, j,
       |    (CASE WHEN j < len THEN ascii(substr(text, CAST(j + 1 AS INTEGER), 1)) ELSE 0 END - 128) * 256 AS v
       |  FROM b, range($n) t(j)),
       |m AS (SELECT doc_id, j, v,
       |    CAST(FLOOR(v / 8.0) AS BIGINT) AS x
       |  FROM s),
       |p AS (SELECT doc_id, j, v, x,
       |    CASE WHEN x >= 0 THEN 213 ELSE 85 END AS mask,
       |    CASE WHEN x >= 0 THEN x ELSE -x - 1 END AS px
       |  FROM m),
       |e AS (SELECT doc_id, j, v, mask, px,
       |    CASE WHEN px <= 31 THEN 0 WHEN px <= 63 THEN 1 WHEN px <= 127 THEN 2
       |         WHEN px <= 255 THEN 3 WHEN px <= 511 THEN 4 WHEN px <= 1023 THEN 5
       |         WHEN px <= 2047 THEN 6 ELSE 7 END AS seg
       |  FROM p),
       |cb AS (SELECT doc_id, j, v, mask, seg,
       |    CASE WHEN seg < 2 THEN (px // 2) % 16
       |         ELSE (px // CAST(POWER(2, seg) AS BIGINT)) % 16 END AS mant
       |  FROM e),
       |by AS (SELECT doc_id, j, v, xor(seg * 16 + mant, mask) AS byte FROM cb),
       |de AS (SELECT doc_id, v, byte, xor(byte, 85) AS a FROM by),
       |rt AS (SELECT doc_id, v, byte,
       |    (CASE WHEN a >= 128 THEN 1 ELSE -1 END) *
       |      (CASE WHEN (a // 16) % 8 = 0 THEN (a % 16) * 16 + 8
       |            WHEN (a // 16) % 8 = 1 THEN (a % 16) * 16 + 264
       |            ELSE ((a % 16) * 16 + 264) *
       |              CAST(POWER(2, (a // 16) % 8 - 1) AS BIGINT) END) AS recon
       |  FROM de)
       |SELECT doc_id, CAST($n AS BIGINT) AS n_samples,
       |  CAST(SUM(byte) AS BIGINT) AS byte_sum,
       |  CAST(SUM(recon) AS BIGINT) AS recon_sum,
       |  CAST(MAX(ABS(recon - v)) AS BIGINT) AS max_err
       |FROM rt GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** q77 — the decode pipeline on a REAL audio container: synthesize a
    * RIFF/WAVE PCM-16 clip per document (samples = the document's bytes),
    * run the actual chunk-walking decoder in a partition-batched map,
    * emit decoded rate/channels/frame-count + channel stats. */
  private def q77(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodeWavStats(synthesizeWav(rows)))
      .select($"doc_id", $"sample_rate", $"channels", $"n_frames",
        $"mean_left", $"mean_right", $"peak")
      .orderBy($"doc_id")
  }

  // single-byte-corpus assumption: see the q58Sql note (ascii(substr(..))
  // indexes characters, the Spark side indexes UTF-8 bytes — equal only on
  // an ASCII corpus, which the driver's testdata is)
  private val q77Sql = {
    val n = WavFrames * WavChannels
    s"""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
       |s AS (SELECT doc_id, j,
       |    (CASE WHEN j < len THEN ascii(substr(text, CAST(j + 1 AS INTEGER), 1)) ELSE 0 END - 128) * 256 AS v
       |  FROM b, range($n) t(j)),
       |agg AS (SELECT doc_id,
       |    CAST(SUM(CASE WHEN j % 2 = 0 THEN v ELSE 0 END) AS BIGINT) AS sl,
       |    CAST(SUM(CASE WHEN j % 2 = 1 THEN v ELSE 0 END) AS BIGINT) AS sr,
       |    CAST(MAX(ABS(v)) AS INTEGER) AS peak
       |  FROM s GROUP BY doc_id)
       |SELECT doc_id, CAST($WavRate AS INTEGER) AS sample_rate,
       |  CAST($WavChannels AS INTEGER) AS channels,
       |  CAST($WavFrames AS BIGINT) AS n_frames,
       |  sl / $WavFrames.0 AS mean_left, sr / $WavFrames.0 AS mean_right, peak
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  /** Pure-JVM codec for QOI ("Quite OK Image" — the public one-page spec
    * at qoiformat.org): the THIRD real format beside PPM (raw raster
    * parse) and WAV (container chunk walk), and the first with actual
    * compression state — a 64-slot hash-indexed color cache, wrapping
    * delta ops (DIFF/LUMA), run-length ops, and a byte-exact end marker.
    * Encoder and decoder both live here: q91 synthesizes each document's
    * raster THROUGH the full op set and decodes it back, so an op
    * implemented wrong on either side (hash formula, wrap arithmetic,
    * run bias, index update discipline) shifts the decoded stats and
    * fails the hash gate. Malformed payloads — bad magic, bad
    * channels/colorspace, truncated stream, missing end marker — decode
    * to None, the per-row skip policy (S8). RGB (channels=3) only; an
    * alpha payload is rejected like a 2-byte-sample PPM. */
  object Qoi {
    final case class Image(width: Int, height: Int, pixels: Array[Byte])

    private def hash(r: Int, g: Int, b: Int): Int =
      (r * 3 + g * 5 + b * 7 + 255 * 11) % 64

    /** QOI encoder (spec-complete for RGB): INDEX/DIFF/LUMA/RUN/RGB ops,
      * 62-cap runs, index updated on every non-INDEX-emitting pixel —
      * the reference qoi.c state machine. */
    def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3, "raster size mismatch")
      val out = new java.io.ByteArrayOutputStream(rgb.length + 32)
      def u32be(v: Int): Unit = {
        out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
        out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
      }
      out.write('q'); out.write('o'); out.write('i'); out.write('f')
      u32be(width); u32be(height); out.write(3); out.write(0)
      // packed RGBA with alpha fixed 0xFF: a virgin slot (0) can never
      // equal a live pixel, reproducing reference qoi.c's behavior where
      // the initial {0,0,0,0} entries never INDEX-match an opaque pixel
      val index = new Array[Int](64)
      var pr = 0; var pg = 0; var pb = 0 // previous pixel (alpha fixed 255)
      var run = 0
      var p = 0
      while (p < rgb.length) {
        val r = rgb(p) & 0xFF; val g = rgb(p + 1) & 0xFF; val b = rgb(p + 2) & 0xFF
        if (r == pr && g == pg && b == pb) {
          run += 1
          if (run == 62) { out.write(0xC0 | (run - 1)); run = 0 }
        } else {
          if (run > 0) { out.write(0xC0 | (run - 1)); run = 0 }
          val h = hash(r, g, b)
          val packed = (r << 24) | (g << 16) | (b << 8) | 0xFF
          if (index(h) == packed) {
            out.write(h) // QOI_OP_INDEX (tag 00)
          } else {
            index(h) = packed
            val dr = ((r - pr) << 24) >> 24; val dg = ((g - pg) << 24) >> 24
            val db = ((b - pb) << 24) >> 24 // wrapping signed byte diffs
            if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 && db <= 1)
              out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)) // DIFF
            else if (dg >= -32 && dg <= 31 &&
                dr - dg >= -8 && dr - dg <= 7 && db - dg >= -8 && db - dg <= 7) {
              out.write(0x80 | (dg + 32)) // LUMA
              out.write(((dr - dg + 8) << 4) | (db - dg + 8))
            } else {
              out.write(0xFE); out.write(r); out.write(g); out.write(b) // RGB
            }
          }
        }
        pr = r; pg = g; pb = b
        p += 3
      }
      if (run > 0) out.write(0xC0 | (run - 1))
      (0 until 7).foreach(_ => out.write(0))
      out.write(1)
      out.toByteArray
    }

    /** Decode; None on any malformation. Accepts only the RGB layout this
      * library writes (channels=3, colorspace 0/1). */
    def decode(bytes: Array[Byte]): Option[Image] = {
      if (bytes.length < 14 + 8) return None
      if (bytes(0) != 'q' || bytes(1) != 'o' || bytes(2) != 'i' || bytes(3) != 'f') return None
      def u32be(o: Int): Long =
        ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
          ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
      val w = u32be(4); val h = u32be(8)
      val channels = bytes(12) & 0xFF; val colorspace = bytes(13) & 0xFF
      // each dimension is an unsigned 32-bit field (≤ 4.29e9): clamp BOTH
      // before multiplying — the product of two such values can overflow
      // even a Long and wrap past the w*h guard below
      if (w <= 0 || h <= 0 || w > (1L << 24) || h > (1L << 24)) return None
      if (w * h > Int.MaxValue / 4) return None
      if (channels != 3 || colorspace > 1) return None
      // a RUN op covers ≤ 62 pixels per stream byte: a header whose pixel
      // count exceeds that ceiling cannot be satisfied by the stream —
      // reject BEFORE allocating the raster (a hostile header must not
      // allocate gigabytes to be refused)
      if (w * h > (bytes.length - 22).toLong * 62) return None
      val n = (w * h).toInt
      val px = new Array[Byte](n * 3)
      val index = new Array[Int](64) // packed RGBA (alpha 0xFF), decoder mirror
      var r = 0; var g = 0; var b = 0
      var run = 0
      var i = 14
      var p = 0
      while (p < n) {
        if (run > 0) run -= 1
        else {
          if (i >= bytes.length - 8) return None // ran into the end marker
          val b1 = bytes(i) & 0xFF; i += 1
          if (b1 == 0xFE) { // RGB
            if (i + 3 > bytes.length - 8) return None
            r = bytes(i) & 0xFF; g = bytes(i + 1) & 0xFF; b = bytes(i + 2) & 0xFF; i += 3
          } else if (b1 == 0xFF) { // RGBA: alpha not representable here
            return None
          } else (b1 >> 6) match {
            case 0 => // INDEX
              val v = index(b1 & 0x3F)
              r = (v >>> 24) & 0xFF; g = (v >>> 16) & 0xFF; b = (v >>> 8) & 0xFF
            case 1 => // DIFF
              r = (r + ((b1 >> 4) & 3) - 2) & 0xFF
              g = (g + ((b1 >> 2) & 3) - 2) & 0xFF
              b = (b + (b1 & 3) - 2) & 0xFF
            case 2 => // LUMA
              if (i >= bytes.length - 8) return None
              val b2 = bytes(i) & 0xFF; i += 1
              val dg = (b1 & 0x3F) - 32
              r = (r + dg - 8 + ((b2 >> 4) & 0xF)) & 0xFF
              g = (g + dg) & 0xFF
              b = (b + dg - 8 + (b2 & 0xF)) & 0xFF
            case _ => // RUN (0..61 biased by -1)
              run = b1 & 0x3F
              if (run > 61) return None // 0xFE/0xFF handled above; paranoia
          }
          index(hash(r, g, b)) = (r << 24) | (g << 16) | (b << 8) | 0xFF
        }
        px(p * 3) = r.toByte; px(p * 3 + 1) = g.toByte; px(p * 3 + 2) = b.toByte
        p += 1
      }
      // exact end marker, nothing else trailing
      if (i != bytes.length - 8) return None
      val marker = Seq(0, 0, 0, 0, 0, 0, 0, 1)
      if ((0 until 8).exists(j => (bytes(i + j) & 0xFF) != marker(j))) return None
      Some(Image(w.toInt, h.toInt, px))
    }
  }

  val QoiW = 8
  val QoiH = 4

  final case class QoiStats(doc_id: Long, width: Int, height: Int, enc_len: Long,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Wrap each document's UTF-8 bytes as a QoiW×QoiH RGB raster
    * (zero-padded) and QOI-ENCODE it — the compressed synthesis q91
    * decodes back. */
  def synthesizeQoi(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      val px = java.util.Arrays.copyOf(txt, QoiW * QoiH * 3)
      MediaRow(id, Qoi.encode(QoiW, QoiH, px), "image/qoi", QoiW, QoiH)
    }

  /** REAL decode → per-channel pixel means (q58's stats over the
    * roundtripped raster) plus the encoded length — the one field only
    * the real codec can produce, oracle-checked as > 0 via the row's
    * payload size... kept Spark-side only: enc_len is NOT oracled (DuckDB
    * cannot re-run the encoder), so it is excluded from q91's output. */
  def decodeQoiStats(rows: Iterator[MediaRow]): Iterator[QoiStats] =
    rows.flatMap { r =>
      Qoi.decode(r.payload).map { img =>
        val n = img.width * img.height
        val sums = new Array[Long](3)
        var p = 0
        while (p < n * 3) { sums(p % 3) += img.pixels(p) & 0xFF; p += 1 }
        QoiStats(r.doc_id, img.width, img.height, r.payload.length.toLong,
          sums(0).toDouble / n, sums(1).toDouble / n, sums(2).toDouble / n)
      }
    }

  /** q91 — the decode pipeline on a COMPRESSED real format: synthesize a
    * QOI image per document (raster = the document's bytes, deterministic
    * for the oracle), roundtrip it through the full INDEX/DIFF/LUMA/RUN
    * op set, emit decoded dimensions + channel means. Retires the q35
    * stub's load-bearing slot: PPM covers raw-raster parsing, WAV covers
    * container walking, QOI covers stateful compressed decode. */
  private def q91(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodeQoiStats(synthesizeQoi(rows)))
      .select($"doc_id", $"width", $"height", $"mean_r", $"mean_g", $"mean_b")
      .orderBy($"doc_id")
  }

  // single-byte-corpus assumption: see the q58Sql note. The oracle is the
  // roundtrip identity — decode(encode(raster)) == raster — so it
  // recomputes the stats from the raw bytes exactly like q58's.
  private val q91Sql = {
    val raster = QoiW * QoiH * 3
    def chSum(c: Int) = s"CAST(SUM(CASE WHEN j % 3 = $c THEN v ELSE 0 END) AS BIGINT)"
    s"""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
       |ch AS (SELECT doc_id, j,
       |    CASE WHEN j < len THEN ascii(substr(text, CAST(j + 1 AS INTEGER), 1)) ELSE 0 END AS v
       |  FROM b, range($raster) t(j)),
       |agg AS (SELECT doc_id, ${chSum(0)} AS sr, ${chSum(1)} AS sg, ${chSum(2)} AS sb
       |  FROM ch GROUP BY doc_id)
       |SELECT doc_id, CAST($QoiW AS INTEGER) AS width, CAST($QoiH AS INTEGER) AS height,
       |  sr / ${QoiW * QoiH}.0 AS mean_r, sg / ${QoiW * QoiH}.0 AS mean_g,
       |  sb / ${QoiW * QoiH}.0 AS mean_b
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  /** Pure-JVM codec for PNG (RGB-8, color type 2) — the FOURTH real
    * format, and the first with an industry-standard compression stack:
    * zlib DEFLATE via `java.util.zip` (platform stdlib), per-chunk CRC32
    * validation, and the five PNG scanline filters (None/Sub/Up/Average/
    * Paeth). The encoder rotates the filter per row (`row % 5`), so a
    * roundtrip exercises every filter's ENCODE and DECODE arithmetic —
    * an off-by-one in the Paeth predictor or the Average floor shifts
    * pixels and fails q95's hash gate. Malformed payloads — bad
    * signature, CRC mismatch, non-RGB8 header, truncated or over-long
    * inflate, bad filter byte — decode to None (S8). Both interlace
    * methods are decoded (Adam7 since round 15 — seven pass sub-images,
    * each filtered independently, one zlib stream, scattered back on
    * the pass grid); palettes, alpha and 16-bit depths are rejected,
    * not mis-decoded. */
  object Png {
    final case class Image(width: Int, height: Int, pixels: Array[Byte])

    private val Signature =
      Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)

    private def crcOf(typeAndData: Array[Byte]): Long = {
      val c = new java.util.zip.CRC32
      c.update(typeAndData)
      c.getValue
    }

    private def u32be(v: Long): Array[Byte] =
      Array(((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
        ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)

    private def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val td = ctype.getBytes("US-ASCII") ++ data
      u32be(data.length.toLong) ++ td ++ u32be(crcOf(td))
    }

    /** Paeth predictor (the PNG spec's exact tie-breaking order). */
    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    /** Adam7 pass geometry: (x0, y0, dx, dy) per pass, spec order. */
    private val Adam7 = Array(
      (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

    /** Sub-image dimensions of Adam7 pass `p` over a w×h image (either
      * may be 0 — such passes contribute NO scanlines, per spec). */
    private def passDims(p: Int, w: Int, h: Int): (Int, Int) = {
      val (x0, y0, dx, dy) = Adam7(p)
      (math.max(0, (w - x0 + dx - 1) / dx), math.max(0, (h - y0 + dy - 1) / dy))
    }

    /** Filter one raster into PNG raw scanlines (filter byte + filtered
      * row); row r carries filter `(f0 + r) % 5`, so a rotating caller
      * exercises every filter across any ≥ 5 total scanlines. */
    private def filterRaster(w: Int, h: Int, rgb: Array[Byte], f0: Int): Array[Byte] = {
      val stride = w * 3
      val raw = new Array[Byte](h * (1 + stride))
      var r = 0
      while (r < h) {
        val f = (f0 + r) % 5
        raw(r * (1 + stride)) = f.toByte
        var i = 0
        while (i < stride) {
          val cur = rgb(r * stride + i) & 0xFF
          val left = if (i >= 3) rgb(r * stride + i - 3) & 0xFF else 0
          val up = if (r > 0) rgb((r - 1) * stride + i) & 0xFF else 0
          val ul = if (r > 0 && i >= 3) rgb((r - 1) * stride + i - 3) & 0xFF else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case _ => paeth(left, up, ul)
          }
          raw(r * (1 + stride) + 1 + i) = ((cur - pred) & 0xFF).toByte
          i += 1
        }
        r += 1
      }
      raw
    }

    /** Reconstruct a w×h sub-raster from raw scanlines at `off`; None on
      * a bad filter byte. (The inverse of [[filterRaster]]; predictor
      * neighbors come from the RECONSTRUCTED pixels, per spec.) */
    private def unfilterRaster(raw: Array[Byte], off: Int, w: Int, h: Int): Option[Array[Byte]] = {
      val stride = w * 3
      val px = new Array[Byte](h * stride)
      var r = 0
      while (r < h) {
        val f = raw(off + r * (1 + stride)) & 0xFF
        if (f > 4) return None
        var j = 0
        while (j < stride) {
          val x = raw(off + r * (1 + stride) + 1 + j) & 0xFF
          val left = if (j >= 3) px(r * stride + j - 3) & 0xFF else 0
          val up = if (r > 0) px((r - 1) * stride + j) & 0xFF else 0
          val ul = if (r > 0 && j >= 3) px((r - 1) * stride + j - 3) & 0xFF else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case _ => paeth(left, up, ul)
          }
          px(r * stride + j) = ((x + pred) & 0xFF).toByte
          j += 1
        }
        r += 1
      }
      Some(px)
    }

    private def deflateAll(raw: Array[Byte]): Array[Byte] = {
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](raw.length + 64)
      val out = new java.io.ByteArrayOutputStream()
      while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      out.toByteArray
    }

    private def wrapChunks(width: Int, height: Int, interlace: Int,
        idat: Array[Byte]): Array[Byte] = {
      val ihdr = u32be(width.toLong) ++ u32be(height.toLong) ++
        Array[Byte](8, 2, 0, 0, interlace.toByte) // depth 8, RGB, deflate, adaptive
      Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
        chunk("IEND", Array.empty[Byte])
    }

    /** Encode an RGB-8 raster, non-interlaced; scanline r carries filter
      * `r % 5`, so every filter type appears in any image of ≥ 5 rows. */
    def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3, "raster size mismatch")
      wrapChunks(width, height, 0, deflateAll(filterRaster(width, height, rgb, 0)))
    }

    /** Encode an RGB-8 raster ADAM7-INTERLACED (round 15 — the one IHDR
      * configuration the decoder previously refused): each of the seven
      * passes extracts its sub-raster, filters it with a RUNNING filter
      * rotation (so all five filters appear across the passes' combined
      * scanlines), and the concatenated pass data deflates as one zlib
      * stream, per spec. Empty passes (a dimension underflows) emit no
      * scanlines. */
    def encodeAdam7(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3, "raster size mismatch")
      val out = new java.io.ByteArrayOutputStream()
      var f0 = 0
      var p = 0
      while (p < 7) {
        val (x0, y0, dx, dy) = Adam7(p)
        val (wp, hp) = passDims(p, width, height)
        if (wp > 0 && hp > 0) {
          val sub = new Array[Byte](wp * hp * 3)
          var j = 0
          while (j < hp) {
            var i = 0
            while (i < wp) {
              val src = ((y0 + j * dy) * width + (x0 + i * dx)) * 3
              val dst = (j * wp + i) * 3
              sub(dst) = rgb(src); sub(dst + 1) = rgb(src + 1); sub(dst + 2) = rgb(src + 2)
              i += 1
            }
            j += 1
          }
          out.write(filterRaster(wp, hp, sub, f0))
          f0 += hp
        }
        p += 1
      }
      wrapChunks(width, height, 1, deflateAll(out.toByteArray))
    }

    /** Decode; None on any malformation. RGB-8 only; both interlace
      * methods (0 = none, 1 = Adam7 — round 15) accepted. */
    def decode(bytes: Array[Byte]): Option[Image] = {
      if (bytes.length < 8 + 25 + 12 || !bytes.take(8).sameElements(Signature)) return None
      def be32(o: Int): Long =
        ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
          ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
      var i = 8
      var w = 0L; var h = 0L
      var interlaced = false
      var sawIhdr = false; var sawIend = false
      val idat = new java.io.ByteArrayOutputStream()
      while (!sawIend) {
        if (i + 12 > bytes.length) return None
        val len = be32(i)
        if (len > bytes.length - i - 12) return None
        val ctype = new String(bytes, i + 4, 4, "US-ASCII")
        val td = java.util.Arrays.copyOfRange(bytes, i + 4, i + 8 + len.toInt)
        if (crcOf(td) != be32(i + 8 + len.toInt)) return None
        ctype match {
          case "IHDR" =>
            if (sawIhdr || len != 13) return None
            sawIhdr = true
            w = be32(i + 8); h = be32(i + 12)
            val (depth, color, comp, filt, inter) =
              (bytes(i + 16), bytes(i + 17), bytes(i + 18), bytes(i + 19), bytes(i + 20))
            if (w <= 0 || h <= 0 || depth != 8 || color != 2 ||
              comp != 0 || filt != 0 || (inter != 0 && inter != 1)) return None
            interlaced = inter == 1
            // each dimension is an unsigned 32-bit field: clamp BOTH before
            // any product — w*h of two ~4e9 values overflows even a Long and
            // would wrap past the guards below
            if (w > (1L << 24) || h > (1L << 24)) return None
            // inflate target is ≤ h*(3+w*3) bytes (interlaced scanline
            // count < 2h): refuse hostile headers before allocating (the
            // q91 guard, PNG edition)
            if (w * h > Int.MaxValue / 4 || h * (3 + w * 3) > bytes.length.toLong * 1032 + (1 << 20))
              return None
          case "IDAT" =>
            if (!sawIhdr) return None
            idat.write(bytes, i + 8, len.toInt)
          case "IEND" =>
            if (!sawIhdr || len != 0) return None
            sawIend = true
          case _ => () // ancillary chunks skipped (CRC still validated)
        }
        i += 12 + len.toInt
      }
      if (i != bytes.length) return None
      val stride = (w * 3).toInt
      // pass layout: interlaced = the seven Adam7 sub-images' scanlines
      // concatenated (empty passes contribute nothing); else one sub-image
      val passes: Seq[(Int, Int, Int, Int, Int, Int)] = // (x0, y0, dx, dy, wp, hp)
        if (!interlaced) Seq((0, 0, 1, 1, w.toInt, h.toInt))
        else (0 until 7).flatMap { p =>
          val (x0, y0, dx, dy) = Adam7(p)
          val (wp, hp) = passDims(p, w.toInt, h.toInt)
          if (wp == 0 || hp == 0) None else Some((x0, y0, dx, dy, wp, hp))
        }
      val expect = passes.map { case (_, _, _, _, wp, hp) =>
        hp * (1 + wp * 3) }.sum
      val raw = new Array[Byte](expect)
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      val got = try {
        var off = 0
        while (off < expect && !inflater.finished()) {
          val n = inflater.inflate(raw, off, expect - off)
          // any zero-progress iteration is malformed: needsInput ⇒ truncated
          // stream; otherwise (e.g. FDICT preset-dictionary header) inflate
          // would return 0 forever and spin this loop — reject, don't hang
          if (n == 0) return None
          off += n
        }
        // an over-long stream means the header lied about dimensions
        if (!inflater.finished() && inflater.inflate(new Array[Byte](1)) > 0) return None
        off
      } catch { case _: java.util.zip.DataFormatException => return None }
      finally inflater.end()
      if (got != expect) return None
      val px = new Array[Byte]((h * stride).toInt)
      var off = 0
      var pi = 0
      while (pi < passes.length) {
        val (x0, y0, dx, dy, wp, hp) = passes(pi)
        val subOpt = unfilterRaster(raw, off, wp, hp)
        if (subOpt.isEmpty) return None
        val sub = subOpt.get
        var j = 0
        while (j < hp) {
          var i2 = 0
          while (i2 < wp) {
            val dst = ((y0 + j * dy) * w.toInt + (x0 + i2 * dx)) * 3
            val src = (j * wp + i2) * 3
            px(dst) = sub(src); px(dst + 1) = sub(src + 1); px(dst + 2) = sub(src + 2)
            i2 += 1
          }
          j += 1
        }
        off += hp * (1 + wp * 3)
        pi += 1
      }
      Some(Image(w.toInt, h.toInt, px))
    }
  }

  val PngW = 8
  val PngH = 5 // ≥ 5 rows: the encoder's row-rotating filter hits all five

  final case class PngStats(doc_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Wrap each document's UTF-8 bytes as a PngW×PngH RGB raster
    * (zero-padded) and PNG-ENCODE it through the rotating filters. */
  def synthesizePng(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      val px = java.util.Arrays.copyOf(txt, PngW * PngH * 3)
      MediaRow(id, Png.encode(PngW, PngH, px), "image/png", PngW, PngH)
    }

  /** REAL decode → per-channel pixel means (the q58/q91 stats over the
    * roundtripped raster). */
  def decodePngStats(rows: Iterator[MediaRow]): Iterator[PngStats] =
    rows.flatMap { r =>
      Png.decode(r.payload).map { img =>
        val n = img.width * img.height
        val sums = new Array[Long](3)
        var p = 0
        while (p < n * 3) { sums(p % 3) += img.pixels(p) & 0xFF; p += 1 }
        PngStats(r.doc_id, img.width, img.height,
          sums(0).toDouble / n, sums(1).toDouble / n, sums(2).toDouble / n)
      }
    }

  /** q95 — the decode pipeline on the INDUSTRY-STANDARD compressed
    * format: synthesize a real PNG per document (zlib DEFLATE, CRC32
    * chunks, all five scanline filters load-bearing via row rotation),
    * decode it back with the chunk-walking + inflate + de-filter
    * pipeline, emit decoded dimensions + channel means. Completes the
    * format bracket: PPM (raw raster), WAV (container walk), QOI
    * (stateful compressed ops), PNG (checksummed chunks over a real
    * compression stack). */
  private def q95(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodePngStats(synthesizePng(rows)))
      .select($"doc_id", $"width", $"height", $"mean_r", $"mean_g", $"mean_b")
      .orderBy($"doc_id")
  }

  /** Wrap each document's UTF-8 bytes as a PngW×PngH RGB raster and
    * ADAM7-encode it (q116's synthesis — same raster as q95, different
    * wire layout). */
  def synthesizePngAdam7(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      val px = java.util.Arrays.copyOf(txt, PngW * PngH * 3)
      MediaRow(id, Png.encodeAdam7(PngW, PngH, px), "image/png", PngW, PngH)
    }

  /** q116 — the q95 decode pipeline over ADAM7-INTERLACED PNGs (round 15
    * — the IHDR configuration the decoder previously refused rather than
    * mis-decode): each document synthesizes as an interlaced PNG (seven
    * pass sub-images, per-pass filtering with a running filter rotation,
    * one zlib stream) and decodes through the pass-walking de-interlacer
    * back to the identical raster. The 8×5 fixture makes ALL SEVEN
    * passes non-empty (11 scanlines — every filter appears) — PngSpec
    * pins the pass geometry and the interlaced↔straight pixel equality.
    * Oracle: q95's roundtrip-identity SQL verbatim — interlacing is wire
    * layout, not content. */
  private def q116(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodePngStats(synthesizePngAdam7(rows)))
      .select($"doc_id", $"width", $"height", $"mean_r", $"mean_g", $"mean_b")
      .orderBy($"doc_id")
  }

  // single-byte-corpus assumption: see the q58Sql note. Oracle = the
  // roundtrip identity, stats recomputed from the raw bytes.
  /** Shared roundtrip-identity oracle for the RGB-raster codecs (PNG,
    * BMP): a w×h×3 raster zero-padded from the document's bytes, decoded
    * back and reduced to per-channel means — pure SQL because the
    * roundtrip is the identity, so only the synthesis needs re-deriving.
    * Single-byte-corpus assumption as in q58Sql. */
  private def rgbRoundtripSql(w: Int, h: Int): String = {
    val raster = w * h * 3
    def chSum(c: Int) = s"CAST(SUM(CASE WHEN j % 3 = $c THEN v ELSE 0 END) AS BIGINT)"
    s"""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
       |ch AS (SELECT doc_id, j,
       |    CASE WHEN j < len THEN ascii(substr(text, CAST(j + 1 AS INTEGER), 1)) ELSE 0 END AS v
       |  FROM b, range($raster) t(j)),
       |agg AS (SELECT doc_id, ${chSum(0)} AS sr, ${chSum(1)} AS sg, ${chSum(2)} AS sb
       |  FROM ch GROUP BY doc_id)
       |SELECT doc_id, CAST($w AS INTEGER) AS width, CAST($h AS INTEGER) AS height,
       |  sr / ${w * h}.0 AS mean_r, sg / ${w * h}.0 AS mean_g,
       |  sb / ${w * h}.0 AS mean_b
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  private val q95Sql = rgbRoundtripSql(PngW, PngH)

  /** Pure-JVM codec for GIF89a (single frame, 256-entry global color
    * table) — the FIFTH real format, bringing the one mainstream
    * compression algorithm the bracket lacked: VARIABLE-WIDTH LZW with
    * GIF's exact code-size schedule (clear/EOI codes, width growth when
    * the running code count exceeds 2^width — the giflib counting, which
    * keeps encoder and decoder widening between the same two codes —
    * 12-bit cap, clear-and-reset on a full table), packed LSB-first into
    * 255-byte sub-blocks. Encoder and decoder are an exact pair; the
    * decoder additionally handles the KwKwK self-referencing code and
    * walks entries as prefix-link/suffix arrays (O(1) per entry, output
    * unwound via a stack). Single-frame decode handles the four-pass
    * INTERLACE row order (round 15 — a pure row permutation around the
    * same LZW stream); the animation/compositing paths still refuse it.
    * Malformed payloads — bad signature, missing global table,
    * truncated sub-blocks, a code beyond the table, pixel
    * overflow/underflow, missing trailer — decode to None (the S8
    * rule), never to wrong pixels. Extensions (0x21 blocks) are
    * skipped, not rejected: real GIFs carry graphic-control blocks. */
  object Gif {
    final case class Image(width: Int, height: Int,
        palette: Array[Byte], indices: Array[Byte])

    private val MinCode = 8 // 256-entry table ⇒ literal codes are bytes
    private val Clear = 1 << MinCode
    private val Eoi = Clear + 1
    private val Base = Eoi + 1
    private val MaxSlots = 4096

    private def u16le(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

    private final class BitWriter {
      private val out = new java.io.ByteArrayOutputStream()
      private var acc = 0L
      private var nbits = 0
      def put(code: Int, width: Int): Unit = {
        acc |= code.toLong << nbits
        nbits += width
        while (nbits >= 8) {
          out.write((acc & 0xFF).toInt)
          acc >>>= 8; nbits -= 8
        }
      }
      def bytes: Array[Byte] = {
        if (nbits > 0) { out.write((acc & 0xFF).toInt); acc = 0; nbits = 0 }
        out.toByteArray
      }
    }

    /** GIF-variant LZW over byte indices: emits clear first, resets on a
      * full table, widens when the running count EXCEEDS 2^width. */
    private def lzwEncode(data: Array[Byte]): Array[Byte] = {
      val bits = new BitWriter
      var width = MinCode + 1
      var counter = Base
      var dict = new java.util.HashMap[Int, Int]() // (prefix<<8 | byte) -> code
      bits.put(Clear, width)
      if (data.isEmpty) { bits.put(Eoi, width); return bits.bytes }
      var prefix = data(0) & 0xFF
      var i = 1
      while (i < data.length) {
        val b = data(i) & 0xFF
        val k = (prefix << 8) | b
        val hit = dict.getOrDefault(k, -1)
        if (hit >= 0) prefix = hit
        else {
          bits.put(prefix, width)
          if (counter >= MaxSlots) {
            // table full: clear and restart (decoder mirrors on the code)
            bits.put(Clear, width)
            dict = new java.util.HashMap[Int, Int]()
            counter = Base; width = MinCode + 1
          } else {
            dict.put(k, counter)
            counter += 1
            if (counter > (1 << width) && width < 12) width += 1
          }
          prefix = b
        }
        i += 1
      }
      bits.put(prefix, width)
      // the final data code counts toward the width schedule like any
      // other (the decoder cannot tell it is final): in the exact
      // boundary case the decoder widens between it and EOI, so the
      // encoder must too
      if (counter < MaxSlots) {
        counter += 1
        if (counter > (1 << width) && width < 12) width += 1
      }
      bits.put(Eoi, width)
      bits.bytes
    }

    /** GIF interlace pass schedule, stream order: (first row, step). */
    private val InterlacePasses = Array((0, 8), (4, 8), (2, 4), (1, 2))

    /** Stream-order row permutation of an interlaced h-row image: entry
      * k = the DISPLAY row carried by the k-th stream row. Passes whose
      * first row is beyond h contribute nothing (short images legally
      * skip them, per spec). */
    private def interlaceRows(h: Int): Array[Int] = {
      val out = new Array[Int](h)
      var k = 0
      InterlacePasses.foreach { case (s0, st) =>
        var r = s0
        while (r < h) { out(k) = r; k += 1; r += st }
      }
      out
    }

    /** Encode an index raster over a grayscale palette (entry i = i,i,i);
      * `interlaced = true` writes the rows in the four-pass interlace
      * order (round 15) with the descriptor flag set. */
    def encode(width: Int, height: Int, indices: Array[Byte],
        interlaced: Boolean = false): Array[Byte] = {
      require(indices.length == width * height, "raster size mismatch")
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF89a".getBytes("US-ASCII"))
      out.write(u16le(width)); out.write(u16le(height))
      out.write(0xF7) // global table present, 8-bit resolution, 256 entries
      out.write(0); out.write(0)
      var i = 0
      while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
      out.write(0x2C)
      out.write(u16le(0)); out.write(u16le(0))
      out.write(u16le(width)); out.write(u16le(height))
      out.write(if (interlaced) 0x40 else 0) // no local table
      out.write(MinCode)
      val raster =
        if (!interlaced) indices
        else {
          val perm = interlaceRows(height)
          val re = new Array[Byte](indices.length)
          var k = 0
          while (k < height) {
            System.arraycopy(indices, perm(k) * width, re, k * width, width)
            k += 1
          }
          re
        }
      val data = lzwEncode(raster)
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        out.write(n); out.write(data, off, n); off += n
      }
      out.write(0)
      out.write(0x3B)
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): Option[Image] = {
      var pos = 0
      def u8(): Int = { val v = bytes(pos) & 0xFF; pos += 1; v }
      def u16(): Int = { val v = (bytes(pos) & 0xFF) | ((bytes(pos + 1) & 0xFF) << 8); pos += 2; v }
      try {
        if (bytes.length < 13) return None
        val sig = new String(bytes, 0, 6, "US-ASCII")
        if (sig != "GIF89a" && sig != "GIF87a") return None
        pos = 6
        val w = u16(); val h = u16()
        val packed = u8(); u8(); u8() // bg index, aspect
        if ((packed & 0x80) == 0) return None // global table required here
        // with minCode pinned to 8, LZW literals span 0..255 — a smaller
        // declared table would let a decoded index run past the palette
        // downstream (a crash, not a None); reject the mismatch here
        if ((packed & 0x07) != 7) return None
        val tableLen = 3 * (2 << (packed & 0x07))
        if (pos + tableLen > bytes.length) return None
        val palette = java.util.Arrays.copyOfRange(bytes, pos, pos + tableLen)
        pos += tableLen
        // skip extension blocks to the image descriptor
        while ((bytes(pos) & 0xFF) == 0x21) {
          pos += 2 // introducer + label
          var n = u8()
          while (n != 0) { pos += n; n = u8() }
        }
        if (u8() != 0x2C) return None
        u16(); u16() // left, top
        val iw = u16(); val ih = u16()
        val ipacked = u8()
        if (iw != w || ih != h) return None
        val interlaced = (ipacked & 0x40) != 0 // four-pass row order (round 15)
        if ((ipacked & 0x80) != 0) return None // local table unsupported
        val minCode = u8()
        if (minCode != MinCode) return None
        // join the data sub-blocks
        val data = new java.io.ByteArrayOutputStream()
        var n = u8()
        while (n != 0) {
          if (pos + n > bytes.length) return None
          data.write(bytes, pos, n); pos += n
          n = u8()
        }
        if (u8() != 0x3B) return None
        lzwDecode(data.toByteArray, w * h).map { idx =>
          val display =
            if (!interlaced) idx
            else {
              val perm = interlaceRows(h)
              val de = new Array[Byte](idx.length)
              var k = 0
              while (k < h) {
                System.arraycopy(idx, k * w, de, perm(k) * w, w)
                k += 1
              }
              de
            }
          Image(w, h, palette, display)
        }
      } catch { case _: IndexOutOfBoundsException => None }
    }

    /** A decoded GIF89a animation: full-frame index rasters in stream
      * order, each with its graphic-control delay (centiseconds; 0 when
      * the frame carried no control block). */
    final case class Anim(width: Int, height: Int, palette: Array[Byte],
        delaysCs: Seq[Int], frames: Seq[Array[Byte]])

    /** Multi-frame decode (round 12 — the animation half of the codec).
      * Each frame is its own LZW stream behind its own descriptor;
      * graphic-control extensions (0x21 0xF9) supply per-frame delays and
      * other extensions (comment, application/NETSCAPE loop) are walked
      * and skipped. The supported subset stays honest to the S8 rule —
      * anything outside it decodes to None, never to wrong pixels:
      * frames must be FULL-FRAME (left=top=0, frame dims = screen dims;
      * compositing partial frames under the four disposal methods is a
      * renderer's job, and emitting an un-composited partial raster as if
      * it were the frame would be wrong pixels), non-interlaced, global
      * palette only, and at least one frame must precede the trailer. */
    def decodeFrames(bytes: Array[Byte]): Option[Anim] = {
      var pos = 0
      def u8(): Int = { val v = bytes(pos) & 0xFF; pos += 1; v }
      def u16(): Int = { val v = (bytes(pos) & 0xFF) | ((bytes(pos + 1) & 0xFF) << 8); pos += 2; v }
      try {
        if (bytes.length < 13) return None
        val sig = new String(bytes, 0, 6, "US-ASCII")
        if (sig != "GIF89a" && sig != "GIF87a") return None
        pos = 6
        val w = u16(); val h = u16()
        val packed = u8(); u8(); u8()
        if ((packed & 0x80) == 0) return None
        if ((packed & 0x07) != 7) return None // see decode: minCode=8 ⇒ 256 entries
        val tableLen = 3 * (2 << (packed & 0x07))
        if (pos + tableLen > bytes.length) return None
        val palette = java.util.Arrays.copyOfRange(bytes, pos, pos + tableLen)
        pos += tableLen
        val frames = Seq.newBuilder[Array[Byte]]
        val delays = Seq.newBuilder[Int]
        var nFrames = 0
        var pendingDelay = 0 // a control block governs the NEXT frame only
        while (true) {
          u8() match {
            case 0x21 =>
              val label = u8()
              if (label == 0xF9) {
                // graphic control: size-4 block — packed, delay, transparent
                if (u8() != 4) return None
                u8(); pendingDelay = u16(); u8()
                if (u8() != 0) return None
              } else {
                var n = u8()
                while (n != 0) { pos += n; n = u8() }
              }
            case 0x2C =>
              val left = u16(); val top = u16()
              val iw = u16(); val ih = u16()
              val ipacked = u8()
              if (left != 0 || top != 0 || iw != w || ih != h) return None
              if ((ipacked & 0x40) != 0) return None
              if ((ipacked & 0x80) != 0) return None
              if (u8() != MinCode) return None
              val data = new java.io.ByteArrayOutputStream()
              var n = u8()
              while (n != 0) {
                if (pos + n > bytes.length) return None
                data.write(bytes, pos, n); pos += n
                n = u8()
              }
              lzwDecode(data.toByteArray, w * h) match {
                case Some(px) =>
                  frames += px; delays += pendingDelay
                  nFrames += 1; pendingDelay = 0
                case None => return None
              }
            case 0x3B =>
              return if (nFrames > 0) Some(Anim(w, h, palette, delays.result(), frames.result()))
                else None
            case _ => return None
          }
        }
        None
      } catch { case _: IndexOutOfBoundsException => None }
    }

    /** Encode full-frame index rasters as a GIF89a animation: NETSCAPE2.0
      * loop block, then per frame a graphic-control extension carrying
      * its delay (centiseconds) and an LZW-compressed full-frame image.
      * Exact pair of [[decodeFrames]]. */
    def encodeAnimation(width: Int, height: Int,
        frames: Seq[Array[Byte]], delaysCs: Seq[Int], loops: Int = 0): Array[Byte] = {
      require(frames.nonEmpty && frames.length == delaysCs.length,
        "one delay per frame")
      require(frames.forall(_.length == width * height), "raster size mismatch")
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF89a".getBytes("US-ASCII"))
      out.write(u16le(width)); out.write(u16le(height))
      out.write(0xF7)
      out.write(0); out.write(0)
      var i = 0
      while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
      // NETSCAPE2.0 application extension: loop count (0 = forever)
      out.write(0x21); out.write(0xFF); out.write(11)
      out.write("NETSCAPE2.0".getBytes("US-ASCII"))
      out.write(3); out.write(1); out.write(u16le(loops)); out.write(0)
      frames.zip(delaysCs).foreach { case (px, delay) =>
        out.write(0x21); out.write(0xF9); out.write(4)
        out.write(0) // disposal none, no transparency
        out.write(u16le(delay)); out.write(0); out.write(0)
        out.write(0x2C)
        out.write(u16le(0)); out.write(u16le(0))
        out.write(u16le(width)); out.write(u16le(height))
        out.write(0)
        out.write(MinCode)
        val data = lzwEncode(px)
        var off = 0
        while (off < data.length) {
          val n = math.min(255, data.length - off)
          out.write(n); out.write(data, off, n); off += n
        }
        out.write(0)
      }
      out.write(0x3B)
      out.toByteArray
    }

    /** One frame of a composited animation encode: a sub-rectangle raster
      * at (left, top), its delay, its GIF89a disposal method (0
      * unspecified / 1 keep / 2 restore-to-background / 3
      * restore-to-previous) and an optional transparent palette index
      * (pixels equal to it leave the canvas untouched). */
    final case class SubFrame(left: Int, top: Int, w: Int, h: Int,
        px: Array[Byte], delayCs: Int, disposal: Int, transparent: Option[Int])

    /** Encode partial-frame sub-rasters as a GIF89a animation — the
      * general form of [[encodeAnimation]] (which is the all-full-frame,
      * disposal-0, opaque special case). Exact pair of
      * [[decodeComposited]]. */
    def encodeAnimationSubframes(width: Int, height: Int,
        subframes: Seq[SubFrame], loops: Int = 0): Array[Byte] = {
      require(subframes.nonEmpty, "at least one frame")
      subframes.foreach { f =>
        require(f.left >= 0 && f.top >= 0 &&
          f.left + f.w <= width && f.top + f.h <= height, "rect out of canvas")
        require(f.px.length == f.w * f.h, "raster size mismatch")
        require(f.disposal >= 0 && f.disposal <= 3, "disposal 0..3")
      }
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF89a".getBytes("US-ASCII"))
      out.write(u16le(width)); out.write(u16le(height))
      out.write(0xF7)
      out.write(0); out.write(0) // background index 0, no aspect
      var i = 0
      while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
      out.write(0x21); out.write(0xFF); out.write(11)
      out.write("NETSCAPE2.0".getBytes("US-ASCII"))
      out.write(3); out.write(1); out.write(u16le(loops)); out.write(0)
      subframes.foreach { f =>
        out.write(0x21); out.write(0xF9); out.write(4)
        out.write((f.disposal << 2) | (if (f.transparent.isDefined) 1 else 0))
        out.write(u16le(f.delayCs)); out.write(f.transparent.getOrElse(0)); out.write(0)
        out.write(0x2C)
        out.write(u16le(f.left)); out.write(u16le(f.top))
        out.write(u16le(f.w)); out.write(u16le(f.h))
        out.write(0)
        out.write(MinCode)
        val data = lzwEncode(f.px)
        var off = 0
        while (off < data.length) {
          val n = math.min(255, data.length - off)
          out.write(n); out.write(data, off, n); off += n
        }
        out.write(0)
      }
      out.write(0x3B)
      out.toByteArray
    }

    /** COMPOSITED multi-frame decode (round 13 — the renderer half that
      * [[decodeFrames]] deliberately refuses): frames may be PARTIAL
      * rects with transparency, and each emitted raster is the full
      * canvas AS DISPLAYED after rendering that frame — the GIF89a
      * rendering model verbatim. The canvas starts as the screen
      * descriptor's background index; per frame the sub-rect lands at
      * (left, top) with transparent pixels leaving the canvas through;
      * then the frame's disposal method runs: 0/1 keep the canvas, 2
      * restores the frame's RECT to the background index, 3 restores the
      * canvas to its pre-frame state. The honest subset still rejects to
      * None rather than emit wrong pixels: interlaced frames, local
      * palettes, rects escaping the canvas, reserved disposal methods
      * (4–7), zero frames, truncation. */
    def decodeComposited(bytes: Array[Byte]): Option[Anim] = {
      var pos = 0
      def u8(): Int = { val v = bytes(pos) & 0xFF; pos += 1; v }
      def u16(): Int = { val v = (bytes(pos) & 0xFF) | ((bytes(pos + 1) & 0xFF) << 8); pos += 2; v }
      try {
        if (bytes.length < 13) return None
        val sig = new String(bytes, 0, 6, "US-ASCII")
        if (sig != "GIF89a" && sig != "GIF87a") return None
        pos = 6
        val w = u16(); val h = u16()
        val packed = u8(); val bgIdx = u8(); u8() // bg index, aspect
        if ((packed & 0x80) == 0) return None
        if ((packed & 0x07) != 7) return None // see decode: minCode=8 ⇒ 256 entries
        val tableLen = 3 * (2 << (packed & 0x07))
        if (pos + tableLen > bytes.length) return None
        val palette = java.util.Arrays.copyOfRange(bytes, pos, pos + tableLen)
        pos += tableLen
        val canvas = new Array[Byte](w * h)
        java.util.Arrays.fill(canvas, bgIdx.toByte)
        val frames = Seq.newBuilder[Array[Byte]]
        val delays = Seq.newBuilder[Int]
        var nFrames = 0
        var pendingDelay = 0
        var pendingDisposal = 0
        var pendingTransparent = -1 // <0 = opaque frame
        while (true) {
          u8() match {
            case 0x21 =>
              val label = u8()
              if (label == 0xF9) {
                if (u8() != 4) return None
                val cpacked = u8()
                pendingDelay = u16()
                val tIdx = u8()
                if (u8() != 0) return None
                pendingDisposal = (cpacked >> 2) & 0x07
                if (pendingDisposal > 3) return None // reserved methods
                pendingTransparent = if ((cpacked & 1) != 0) tIdx else -1
              } else {
                var n = u8()
                while (n != 0) { pos += n; n = u8() }
              }
            case 0x2C =>
              val left = u16(); val top = u16()
              val iw = u16(); val ih = u16()
              val ipacked = u8()
              if (left + iw > w || top + ih > h || iw == 0 || ih == 0) return None
              if ((ipacked & 0x40) != 0) return None
              if ((ipacked & 0x80) != 0) return None
              if (u8() != MinCode) return None
              val data = new java.io.ByteArrayOutputStream()
              var n = u8()
              while (n != 0) {
                if (pos + n > bytes.length) return None
                data.write(bytes, pos, n); pos += n
                n = u8()
              }
              lzwDecode(data.toByteArray, iw * ih) match {
                case Some(px) =>
                  val before =
                    if (pendingDisposal == 3) canvas.clone() else null
                  var y = 0
                  while (y < ih) {
                    var x = 0
                    while (x < iw) {
                      val v = px(y * iw + x) & 0xFF
                      if (v != pendingTransparent)
                        canvas((top + y) * w + (left + x)) = v.toByte
                      x += 1
                    }
                    y += 1
                  }
                  frames += canvas.clone(); delays += pendingDelay
                  nFrames += 1
                  pendingDisposal match {
                    case 2 =>
                      var yy = 0
                      while (yy < ih) {
                        java.util.Arrays.fill(canvas,
                          (top + yy) * w + left, (top + yy) * w + left + iw,
                          bgIdx.toByte)
                        yy += 1
                      }
                    case 3 => System.arraycopy(before, 0, canvas, 0, canvas.length)
                    case _ => ()
                  }
                  pendingDelay = 0; pendingDisposal = 0; pendingTransparent = -1
                case None => return None
              }
            case 0x3B =>
              return if (nFrames > 0) Some(Anim(w, h, palette, delays.result(), frames.result()))
                else None
            case _ => return None
          }
        }
        None
      } catch { case _: IndexOutOfBoundsException => None }
    }

    private def lzwDecode(data: Array[Byte], nPixels: Int): Option[Array[Byte]] = {
      val out = new Array[Byte](nPixels)
      var outN = 0
      val prefix = new Array[Int](MaxSlots)
      val suffix = new Array[Byte](MaxSlots)
      val stack = new Array[Byte](MaxSlots + 1)
      var width = MinCode + 1
      var counter = Base
      // the next genuinely-UNDEFINED slot — decoupled from the phantom
      // width counter, which saturates at MaxSlots while the last entry
      // (MaxSlots−1) is still definable exactly once. Once definedN
      // reaches MaxSlots nothing may be (re)defined and kwkwk is
      // impossible: codes can only reference defined entries — the
      // well-formed "deferred clear" stream giflib encoders emit when
      // they keep using the full table without a CLEAR. (Previously the
      // slot computed from the saturated counter stuck at MaxSlots−1 and
      // every further non-clear code OVERWROTE that entry — a foreign
      // deferred-clear GIF then decoded to wrong pixels instead of its
      // actual raster, violating the "malformed → None, never wrong
      // pixels" contract. GifSpec's deferred-clear case pins this.)
      var definedN = Base
      var prev = -1
      var acc = 0L
      var nbits = 0
      var pos = 0
      def firstByte(code0: Int): Int = {
        var c = code0
        while (c >= Clear) c = prefix(c)
        c
      }
      def emit(code0: Int): Boolean = {
        var sp = 0
        var c = code0
        while (c >= Clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        stack(sp) = c.toByte; sp += 1
        if (outN + sp > nPixels) return false // overflow: malformed
        while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
        true
      }
      while (true) {
        while (nbits < width) {
          if (pos >= data.length) return None // ran out before EOI
          acc |= (data(pos) & 0xFFL) << nbits
          nbits += 8; pos += 1
        }
        val code = (acc & ((1L << width) - 1)).toInt
        acc >>>= width; nbits -= width
        if (code == Clear) {
          counter = Base; width = MinCode + 1; definedN = Base; prev = -1
        } else if (code == Eoi) {
          return if (outN == nPixels) Some(out) else None
        } else if (prev == -1) {
          if (code >= Clear) return None // first code must be a literal
          if (!emit(code)) return None
          counter += 1 // the giflib phantom slot: count the first code too
          if (counter > (1 << width) && width < 12) width += 1
          prev = code
        } else {
          if (code > Eoi && code < Base) return None
          // kwkwk: the code IS the entry this arrival defines — only
          // possible while a free slot exists; past table-full, code
          // MaxSlots−1 references the (already-defined) last entry
          val kwkwk = code == definedN && definedN < MaxSlots
          if (!kwkwk && code >= Base && code >= definedN) return None
          val sourceFirst = firstByte(if (kwkwk) prev else code)
          if (definedN < MaxSlots) {
            prefix(definedN) = prev
            suffix(definedN) = sourceFirst.toByte
          }
          if (!emit(if (kwkwk) definedN else code)) return None
          prev = if (kwkwk) definedN else code
          if (definedN < MaxSlots) definedN += 1
          if (counter < MaxSlots) {
            counter += 1
            if (counter > (1 << width) && width < 12) width += 1
          }
        }
      }
      None
    }
  }

  val GifW = 8
  val GifH = 4

  final case class GifStats(doc_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Wrap each document's UTF-8 bytes as a GifW×GifH INDEX raster over
    * the grayscale palette (zero-padded) and GIF-ENCODE it through LZW. */
  def synthesizeGif(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      val px = java.util.Arrays.copyOf(txt, GifW * GifH)
      MediaRow(id, Gif.encode(GifW, GifH, px), "image/gif", GifW, GifH)
    }

  /** REAL decode → per-channel means THROUGH THE PALETTE (the decoder's
    * actual color path, not a shortcut over indices). */
  def decodeGifStats(rows: Iterator[MediaRow]): Iterator[GifStats] =
    rows.flatMap { r =>
      Gif.decode(r.payload).map { img =>
        val n = img.width * img.height
        val sums = new Array[Long](3)
        var p = 0
        while (p < n) {
          val idx = img.indices(p) & 0xFF
          sums(0) += img.palette(idx * 3) & 0xFF
          sums(1) += img.palette(idx * 3 + 1) & 0xFF
          sums(2) += img.palette(idx * 3 + 2) & 0xFF
          p += 1
        }
        GifStats(r.doc_id, img.width, img.height,
          sums(0).toDouble / n, sums(1).toDouble / n, sums(2).toDouble / n)
      }
    }

  /** q101 — the decode pipeline on the LZW member of the format bracket:
    * synthesize a GIF89a per document (indices = the document's bytes),
    * roundtrip through variable-width LZW + sub-block packing + palette
    * lookup, emit decoded dimensions + channel means. The bracket now
    * spans PPM (raw raster), WAV (container walk), QOI (stateful
    * byte-op compression), PNG (DEFLATE + checksummed chunks), GIF
    * (dictionary compression with an adaptive code size). */
  private def q101(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodeGifStats(synthesizeGif(rows)))
      .select($"doc_id", $"width", $"height", $"mean_r", $"mean_g", $"mean_b")
      .orderBy($"doc_id")
  }

  // single-byte-corpus assumption: see the q58Sql note. Oracle = the
  // roundtrip identity through the grayscale palette (entry i = (i,i,i)),
  // so every channel mean equals the padded-byte mean.
  /** Shared roundtrip-identity oracle for the palette-INDEXED raster
    * codec (GIF, both wire layouts): w×h single-channel indexes whose
    * identity palette maps index i to gray (i,i,i), so all three channel
    * means equal the index mean. */
  private def indexedRoundtripSql(w: Int, h: Int): String = {
    val raster = w * h
    s"""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
       |ch AS (SELECT doc_id,
       |    CASE WHEN j < len THEN ascii(substr(text, CAST(j + 1 AS INTEGER), 1)) ELSE 0 END AS v
       |  FROM b, range($raster) t(j)),
       |agg AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS sv FROM ch GROUP BY doc_id)
       |SELECT doc_id, CAST($w AS INTEGER) AS width, CAST($h AS INTEGER) AS height,
       |  sv / $raster.0 AS mean_r, sv / $raster.0 AS mean_g, sv / $raster.0 AS mean_b
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  private val q101Sql = indexedRoundtripSql(GifW, GifH)

  /** q117's interlaced fixture geometry: 10 rows make ALL FOUR interlace
    * passes non-empty (pass rows 0,8 / 4 / 2,6 / 1,3,5,7,9) — GifH = 4
    * would leave pass 2 vacuously empty. */
  val GifIW = 8
  val GifIH = 10

  /** Wrap each document's UTF-8 bytes as a GifIW×GifIH INDEX raster and
    * GIF-encode it INTERLACED (q117's synthesis). */
  def synthesizeGifInterlaced(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      val px = java.util.Arrays.copyOf(txt, GifIW * GifIH)
      MediaRow(id, Gif.encode(GifIW, GifIH, px, interlaced = true), "image/gif", GifIW, GifIH)
    }

  /** q117 — the q101 decode pipeline over INTERLACED GIFs (round 15 —
    * the descriptor flag the decoder previously refused rather than
    * mis-decode): the LZW stream carries rows in the four-pass order and
    * the decoder permutes them back to display order. The 8×10 fixture
    * populates every pass — GifSpec pins the permutation against a
    * straight encode of the same raster. Oracle: the q101 roundtrip
    * identity at this geometry — interlacing is wire layout, not
    * content. */
  private def q117(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodeGifStats(synthesizeGifInterlaced(rows)))
      .select($"doc_id", $"width", $"height", $"mean_r", $"mean_g", $"mean_b")
      .orderBy($"doc_id")
  }

  private val q117Sql = indexedRoundtripSql(GifIW, GifIH)

  /** Frames per synthesized animation (q107). */
  val GifFrames = 3

  final case class GifAnimStats(doc_id: Long, n_frames: Int,
      duration_cs: Int, mean_px: Double)

  /** Per document: a [[GifFrames]]-frame animation whose frame f is the
    * document's bytes shifted by f (zero-padded to the raster), with
    * per-frame delays 10+f cs — every frame exercises its own LZW stream
    * and control block. */
  def synthesizeGifAnim(rows: Iterator[(Long, Array[Byte])]): Iterator[(Long, Array[Byte])] =
    rows.map { case (id, txt) =>
      val frames = (0 until GifFrames).map { f =>
        val px = new Array[Byte](GifW * GifH)
        var j = 0
        while (j < px.length) {
          if (j + f < txt.length) px(j) = txt(j + f)
          j += 1
        }
        px
      }
      (id, Gif.encodeAnimation(GifW, GifH, frames, (0 until GifFrames).map(10 + _)))
    }

  /** REAL multi-frame decode → frame count, total duration, and the
    * all-frames pixel mean THROUGH THE PALETTE (the decoder's color
    * path, matching [[decodeGifStats]]). */
  def decodeGifAnimStats(rows: Iterator[(Long, Array[Byte])]): Iterator[GifAnimStats] =
    rows.flatMap { case (id, payload) =>
      Gif.decodeFrames(payload).map { anim =>
        val n = anim.width * anim.height
        var sum = 0L
        anim.frames.foreach { fr =>
          var p = 0
          while (p < n) { sum += anim.palette((fr(p) & 0xFF) * 3) & 0xFF; p += 1 }
        }
        GifAnimStats(id, anim.frames.length, anim.delaysCs.sum,
          sum.toDouble / (n.toLong * anim.frames.length))
      }
    }

  /** q107 — the ANIMATION half of the GIF codec: synthesize a 3-frame
    * GIF89a per document (NETSCAPE loop block, per-frame graphic-control
    * delays, one LZW stream per frame), decode every frame, emit frame
    * count + total duration + the all-frames palette mean. */
  private def q107(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodeGifAnimStats(synthesizeGifAnim(rows)))
      .select($"doc_id", $"n_frames", $"duration_cs", $"mean_px")
      .orderBy($"doc_id")
  }

  // oracle = the roundtrip identity per frame: frame f's padded-shift
  // mean, averaged over frames; duration = Σ (10+f) = 33 cs. Single-byte
  // corpus assumption as in q101Sql.
  private val q107Sql = {
    val raster = GifW * GifH
    val duration = (0 until GifFrames).map(10 + _).sum
    s"""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
       |ch AS (SELECT doc_id,
       |    CASE WHEN j + f < len THEN ascii(substr(text, CAST(j + f + 1 AS INTEGER), 1)) ELSE 0 END AS v
       |  FROM b, range($raster) t(j), range($GifFrames) u(f)),
       |agg AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS sv FROM ch GROUP BY doc_id)
       |SELECT doc_id, CAST($GifFrames AS INTEGER) AS n_frames,
       |  CAST($duration AS INTEGER) AS duration_cs,
       |  sv / ${raster * GifFrames}.0 AS mean_px
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  // ---- q135: frame sampling (the video-pipeline op) --------------------
  // A training pipeline rarely embeds EVERY frame of a clip — it
  // stride-samples (every k-th frame, or one per shot) and
  // feature-extracts the survivors. q135 is that operator over the one
  // animated container this repo decodes for real: synthesize a
  // [[GifSampleFrames]]-frame animation per document, decode it with the
  // in-repo codec, keep every [[GifSampleStride]]-th frame, and emit ONE
  // ROW PER SAMPLED FRAME — (doc_id, frame_idx, t_cs, mean_px), where
  // t_cs is the frame's START timestamp (the running sum of the
  // preceding per-frame delays, exactly what a clip sampler keys on) and
  // mean_px the frame's palette-resolved pixel mean (the stand-in for
  // any per-frame feature extractor). Unlike q107's per-doc aggregate,
  // the output granularity here is per-frame — the relation a
  // downstream embed-every-sampled-frame stage consumes.
  //
  // Per-row byte-column work in one mapPartitions pass — embarrassingly
  // parallel, no shuffle before the final sort. Oracle: the q107
  // roundtrip identity per SAMPLED frame (frame f is the doc's bytes
  // shifted by f, zero-padded), with t_cs = Σ_{g<f} (10+g) = 10f+f(f−1)/2
  // in closed form.

  /** Frames per synthesized clip (q135). */
  val GifSampleFrames = 12
  /** Keep every k-th frame. */
  val GifSampleStride = 4

  final case class GifFrameSample(doc_id: Long, frame_idx: Int, t_cs: Int,
      mean_px: Double)

  /** Per document: a [[GifSampleFrames]]-frame animation, frame f = the
    * doc bytes shifted by f (the [[synthesizeGifAnim]] identity at clip
    * length), delays 10+f cs. */
  def synthesizeGifClip(rows: Iterator[(Long, Array[Byte])]): Iterator[(Long, Array[Byte])] =
    rows.map { case (id, txt) =>
      val frames = (0 until GifSampleFrames).map { f =>
        val px = new Array[Byte](GifW * GifH)
        var j = 0
        while (j < px.length) {
          if (j + f < txt.length) px(j) = txt(j + f)
          j += 1
        }
        px
      }
      (id, Gif.encodeAnimation(GifW, GifH, frames, (0 until GifSampleFrames).map(10 + _)))
    }

  /** REAL multi-frame decode → stride-sampled per-frame rows with start
    * timestamps and the palette-resolved frame mean. */
  def sampleGifFrames(rows: Iterator[(Long, Array[Byte])]): Iterator[GifFrameSample] =
    rows.flatMap { case (id, payload) =>
      Gif.decodeFrames(payload).toSeq.flatMap { anim =>
        val n = anim.width * anim.height
        val starts = anim.delaysCs.scanLeft(0)(_ + _)
        (0 until anim.frames.length by GifSampleStride).map { f =>
          val fr = anim.frames(f)
          var sum = 0L
          var p = 0
          while (p < n) { sum += anim.palette((fr(p) & 0xFF) * 3) & 0xFF; p += 1 }
          GifFrameSample(id, f, starts(f), sum.toDouble / n)
        }
      }
    }

  private def q135(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => sampleGifFrames(synthesizeGifClip(rows)))
      .select($"doc_id", $"frame_idx", $"t_cs", $"mean_px")
      .orderBy($"doc_id", $"frame_idx")
  }

  private val q135Sql = {
    val raster = GifW * GifH
    s"""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
       |fr AS (SELECT CAST(f AS INTEGER) AS f FROM range(0, $GifSampleFrames, $GifSampleStride) t(f)),
       |ch AS (SELECT doc_id, f,
       |    CASE WHEN j + f < len THEN ascii(substr(text, CAST(j + f + 1 AS INTEGER), 1)) ELSE 0 END AS v
       |  FROM b CROSS JOIN fr CROSS JOIN range($raster) t(j)),
       |agg AS (SELECT doc_id, f, CAST(SUM(v) AS BIGINT) AS sv FROM ch GROUP BY doc_id, f)
       |SELECT doc_id, f AS frame_idx,
       |  CAST(10 * f + (f * (f - 1)) // 2 AS INTEGER) AS t_cs,
       |  sv / $raster.0 AS mean_px
       |FROM agg ORDER BY doc_id, frame_idx""".stripMargin
  }

  // ---- q108: disposal-method compositing (round 13) --------------------
  // Fixture geometry on the GifW×GifH = 8×4 canvas: frame 0 is the full
  // doc raster (disposal 2 → canvas restored to background 0); frame 1
  // fills rect R = cols 1..6 × rows 1..2 (12 px) with AnimC (disposal 1 —
  // kept); frame 2 lands R2 = cols 2..5 × rows 1..2 (8 px, R2 ⊆ R) with
  // the doc bytes shifted by 2 and transparent index AnimT = 32 (ASCII
  // space — guaranteed present in text, so transparency is exercised:
  // spaces show the AnimC underneath), disposal 3 → canvas restored to
  // its pre-frame state; frame 3 fills the disjoint R3 = row 3 (8 px)
  // with AnimD. The composited sums are then integer-exact and each
  // disposal method is OBSERVABLE: s1 = AnimC·12 proves disposal 2
  // cleared frame 0; s3 = AnimC·12 + AnimD·8 is doc-INDEPENDENT exactly
  // because disposal 3 erased frame 2's doc pixels — any compositor bug
  // leaks doc bytes into it.
  private val AnimC = 200
  private val AnimD = 77
  private val AnimT = 32
  private val RArea = 12
  private val R2Area = 8
  private val R3Area = 8

  final case class GifCompStats(doc_id: Long, n_frames: Int, duration_cs: Int,
      s0: Long, s1: Long, s2: Long, s3: Long)

  /** Per document: the 4-frame disposal/transparency animation above. */
  def synthesizeGifDisposalAnim(rows: Iterator[(Long, Array[Byte])]): Iterator[(Long, Array[Byte])] =
    rows.map { case (id, txt) =>
      val full = java.util.Arrays.copyOf(txt, GifW * GifH)
      val shifted = new Array[Byte](R2Area)
      var j = 0
      while (j < R2Area) {
        if (j + 2 < txt.length) shifted(j) = txt(j + 2)
        j += 1
      }
      val sub = Gif.SubFrame
      (id, Gif.encodeAnimationSubframes(GifW, GifH, Seq(
        sub(0, 0, GifW, GifH, full, 10, 2, None),
        sub(1, 1, 6, 2, Array.fill[Byte](RArea)(AnimC.toByte), 11, 1, None),
        sub(2, 1, 4, 2, shifted, 12, 3, Some(AnimT)),
        sub(0, 3, GifW, 1, Array.fill[Byte](R3Area)(AnimD.toByte), 13, 0, None))))
    }

  /** Composited decode → per-frame canvas sums THROUGH THE PALETTE (the
    * decoder's color path, as [[decodeGifAnimStats]]). */
  def decodeGifCompStats(rows: Iterator[(Long, Array[Byte])]): Iterator[GifCompStats] =
    rows.flatMap { case (id, payload) =>
      Gif.decodeComposited(payload).map { anim =>
        val n = anim.width * anim.height
        val sums = anim.frames.map { fr =>
          var sum = 0L
          var p = 0
          while (p < n) { sum += anim.palette((fr(p) & 0xFF) * 3) & 0xFF; p += 1 }
          sum
        }
        GifCompStats(id, anim.frames.length, anim.delaysCs.sum,
          sums(0), sums(1), sums(2), sums(3))
      }
    }

  /** q108 — DISPOSAL-METHOD COMPOSITING on the GIF codec: synthesize a
    * 4-frame partial-rect animation per document exercising disposal
    * methods 0/1/2/3 and transparency, render it through the composited
    * decoder (the GIF89a canvas model: background init, sub-rect landing,
    * transparent pass-through, per-method canvas restore), emit the
    * per-frame composited pixel sums. */
  private def q108(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodeGifCompStats(synthesizeGifDisposalAnim(rows)))
      .select($"doc_id", $"n_frames", $"duration_cs", $"s0", $"s1", $"s2", $"s3")
      .orderBy($"doc_id")
  }

  // oracle = the compositing model applied symbolically to the fixture
  // (see the geometry note above; single-byte-corpus assumption as in
  // q58Sql): s0 = padded doc-byte sum; s1 = AnimC·|R| (disposal 2 cleared
  // frame 0); s2 = AnimC·(|R|−|R2|) + Σ over R2 of (space → AnimC, else
  // the shifted byte; padding 0 is opaque); s3 = AnimC·|R| + AnimD·|R3|
  // (disposal 3 erased frame 2).
  private val q108Sql = {
    val raster = GifW * GifH
    val s1 = AnimC * RArea
    val s3 = AnimC * RArea + AnimD * R3Area
    s"""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
       |f0 AS (SELECT doc_id, CAST(SUM(CASE WHEN j < len THEN ascii(substr(text, CAST(j + 1 AS INTEGER), 1)) ELSE 0 END) AS BIGINT) AS s0
       |  FROM b, range($raster) t(j) GROUP BY doc_id),
       |f2 AS (SELECT doc_id, CAST(SUM(CASE
       |    WHEN j + 2 < len AND ascii(substr(text, CAST(j + 3 AS INTEGER), 1)) = $AnimT THEN $AnimC
       |    WHEN j + 2 < len THEN ascii(substr(text, CAST(j + 3 AS INTEGER), 1))
       |    ELSE 0 END) AS BIGINT) AS s2p
       |  FROM b, range($R2Area) t(j) GROUP BY doc_id)
       |SELECT b.doc_id, CAST(4 AS INTEGER) AS n_frames, CAST(46 AS INTEGER) AS duration_cs,
       |  f0.s0 AS s0, CAST($s1 AS BIGINT) AS s1,
       |  CAST(${AnimC * (RArea - R2Area)} + f2.s2p AS BIGINT) AS s2,
       |  CAST($s3 AS BIGINT) AS s3
       |FROM b JOIN f0 USING (doc_id) JOIN f2 USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Pure-JVM codec for BMP (Windows DIB) — the SIXTH format family,
    * completing the codec axis (r14 verdict candidate 7: "PNG Adam7
    * interlace or BMP"): 24-bit BI_RGB with the two wire quirks that
    * define the format — BGR byte order and BOTTOM-UP rows padded to a
    * 4-byte stride (top-down via a negative height field also decoded)
    * — plus 8-bit BI_RLE8, a real run-length compression with encoded
    * runs, absolute (literal) blocks word-aligned by a pad byte, and
    * end-of-line / end-of-bitmap opcodes; the palette is built from the
    * raster's distinct colors (> 256 refuses at encode). Malformed
    * payloads — bad magic, a header size other than BITMAPINFOHEADER
    * (V4/V5 refused, not mis-walked), bad planes/bitcount/compression
    * combos, hostile dimensions, a pixel array that doesn't fill the
    * file, an RLE run crossing a row boundary, a partial row at EOL,
    * the delta opcode (its skipped pixels are undefined — refused,
    * never guessed), a palette index past the table, a missing or
    * non-final EOB — decode to None (the S8 rule), never to wrong
    * pixels. Layout per the public Windows BITMAPFILEHEADER /
    * BITMAPINFOHEADER documentation. */
  object Bmp {
    /** Decoded raster: RGB, row-major, top-down (file order normalized). */
    final case class Image(width: Int, height: Int, pixels: Array[Byte])

    private val HeaderLen = 54 // BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)

    private def u16le(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    }
    private def u32le(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
      out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
    }

    private def headers(out: java.io.ByteArrayOutputStream, fileSize: Int,
        pixelOffset: Int, width: Int, heightField: Int, bitCount: Int,
        compression: Int, imageSize: Int, clrUsed: Int): Unit = {
      out.write('B'); out.write('M'); u32le(out, fileSize)
      u16le(out, 0); u16le(out, 0); u32le(out, pixelOffset)
      u32le(out, 40); u32le(out, width); u32le(out, heightField)
      u16le(out, 1); u16le(out, bitCount); u32le(out, compression)
      u32le(out, imageSize); u32le(out, 2835); u32le(out, 2835)
      u32le(out, clrUsed); u32le(out, 0)
    }

    /** 24-bit BI_RGB: BGR pixels, rows padded to a 4-byte stride,
      * bottom-up unless `topDown` (then the height field goes negative). */
    def encode24(width: Int, height: Int, rgb: Array[Byte],
        topDown: Boolean = false): Array[Byte] = {
      require(rgb.length == width * height * 3, "raster size mismatch")
      val stride = (width * 3 + 3) & ~3
      val out = new java.io.ByteArrayOutputStream(HeaderLen + stride * height)
      headers(out, HeaderLen + stride * height, HeaderLen, width,
        if (topDown) -height else height, 24, 0, stride * height, 0)
      val rows = if (topDown) 0 until height else (height - 1) to 0 by -1
      rows.foreach { y =>
        var x = 0
        while (x < width) {
          val p = (y * width + x) * 3
          out.write(rgb(p + 2) & 0xFF); out.write(rgb(p + 1) & 0xFF)
          out.write(rgb(p) & 0xFF)
          x += 1
        }
        (width * 3 until stride).foreach(_ => out.write(0))
      }
      out.toByteArray
    }

    /** Build the distinct-color palette (scan order) and per-pixel
      * indexes; > 256 distinct colors refuses — 8-bit depth cannot
      * represent the raster and silently quantizing it would be q55's
      * job, not a codec's. */
    private def palettize(width: Int, height: Int,
        rgb: Array[Byte]): (Array[Int], Array[Int]) = {
      require(rgb.length == width * height * 3, "raster size mismatch")
      val palette = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
      val idx = new Array[Int](width * height)
      var p = 0
      while (p < idx.length) {
        val c = ((rgb(p * 3) & 0xFF) << 16) | ((rgb(p * 3 + 1) & 0xFF) << 8) |
          (rgb(p * 3 + 2) & 0xFF)
        idx(p) = palette.getOrElseUpdate(c, palette.size)
        p += 1
      }
      require(palette.size <= 256,
        s"RLE8 needs <= 256 distinct colors, got ${palette.size}")
      (palette.keys.toArray, idx)
    }

    private def writePalette(out: java.io.ByteArrayOutputStream,
        colors: Array[Int]): Unit =
      colors.foreach { c => // BGR0 quads
        out.write(c & 0xFF); out.write((c >>> 8) & 0xFF)
        out.write((c >>> 16) & 0xFF); out.write(0)
      }

    /** 8-bit BI_RGB (uncompressed, palette-indexed, 4-byte row stride) —
      * the third wire variant, exercised by BmpSpec. */
    def encode8(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      val (colors, idx) = palettize(width, height, rgb)
      val stride = (width + 3) & ~3
      val pixelOffset = HeaderLen + colors.length * 4
      val out = new java.io.ByteArrayOutputStream(pixelOffset + stride * height)
      headers(out, pixelOffset + stride * height, pixelOffset, width, height,
        8, 0, stride * height, colors.length)
      writePalette(out, colors)
      ((height - 1) to 0 by -1).foreach { y =>
        var x = 0
        while (x < width) { out.write(idx(y * width + x)); x += 1 }
        (width until stride).foreach(_ => out.write(0))
      }
      out.toByteArray
    }

    /** 8-bit BI_RLE8: per bottom-up row, greedy encoded runs for repeats
      * of >= 2 (count capped at 255), absolute blocks for literal
      * stretches of >= 3 (word-aligned by a pad byte), shorter literals
      * as count-1 encoded runs; EOL (00 00) after every row but the
      * last, then EOB (00 01). Runs never cross a row boundary. */
    def encodeRle8(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      val (colors, idx) = palettize(width, height, rgb)
      val data = new java.io.ByteArrayOutputStream()
      var y = height - 1
      while (y >= 0) {
        val row = y * width
        var x = 0
        while (x < width) {
          val v = idx(row + x)
          var run = 1
          while (x + run < width && run < 255 && idx(row + x + run) == v) run += 1
          if (run >= 2) { data.write(run); data.write(v); x += run }
          else {
            var lit = 1
            while (x + lit < width && lit < 255 &&
                !(x + lit + 1 < width && idx(row + x + lit) == idx(row + x + lit + 1)))
              lit += 1
            if (lit >= 3) {
              data.write(0); data.write(lit)
              (0 until lit).foreach(j => data.write(idx(row + x + j)))
              if ((lit & 1) == 1) data.write(0)
            } else {
              (0 until lit).foreach(j => { data.write(1); data.write(idx(row + x + j)) })
            }
            x += lit
          }
        }
        if (y > 0) { data.write(0); data.write(0) }
        y -= 1
      }
      data.write(0); data.write(1)
      val rle = data.toByteArray
      val pixelOffset = HeaderLen + colors.length * 4
      val out = new java.io.ByteArrayOutputStream(pixelOffset + rle.length)
      headers(out, pixelOffset + rle.length, pixelOffset, width, height,
        8, 1, rle.length, colors.length)
      writePalette(out, colors)
      out.write(rle, 0, rle.length)
      out.toByteArray
    }

    private def ru16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def ru32(b: Array[Byte], o: Int): Int =
      ru16(b, o) | (ru16(b, o + 2) << 16)

    /** Decode; None on any malformation. Accepts the three layouts this
      * library writes (24-bit BI_RGB bottom-up or top-down, 8-bit BI_RGB,
      * 8-bit BI_RLE8 bottom-up); anything else refuses. */
    def decode(bytes: Array[Byte]): Option[Image] = {
      if (bytes.length < HeaderLen) return None
      if (bytes(0) != 'B' || bytes(1) != 'M') return None
      if (ru32(bytes, 2) != bytes.length) return None
      val pixelOffset = ru32(bytes, 10)
      if (ru32(bytes, 14) != 40) return None // only BITMAPINFOHEADER
      val w = ru32(bytes, 18)
      val hField = ru32(bytes, 22)
      if (ru16(bytes, 26) != 1) return None // planes
      val bits = ru16(bytes, 28)
      val comp = ru32(bytes, 30)
      val topDown = hField < 0
      // the height field is signed 32-bit: negate on a Long (Int.MinValue
      // survives), then clamp BOTH dims before multiplying (QOI rule)
      val hL = math.abs(hField.toLong)
      if (w <= 0 || hL <= 0 || w > (1 << 24) || hL > (1L << 24)) return None
      if (w.toLong * hL > Int.MaxValue / 4) return None
      val h = hL.toInt
      val n = w * h
      // raster allocation happens INSIDE each branch, after the checks
      // that tie the claimed dimensions to the actual byte count — a
      // 54-byte header claiming a gigapixel raster must refuse before
      // `new Array`, not after (the q91 guard discipline)
      if (bits == 24) {
        if (comp != 0) return None
        if (pixelOffset != HeaderLen) return None
        val stride = (w * 3 + 3) & ~3
        if (HeaderLen.toLong + stride.toLong * h != bytes.length) return None
        val px = new Array[Byte](n * 3)
        var j = 0
        while (j < h) {
          val imgRow = if (topDown) j else h - 1 - j
          var o = HeaderLen + j * stride
          var x = 0
          while (x < w) {
            val p = (imgRow * w + x) * 3
            px(p) = bytes(o + 2); px(p + 1) = bytes(o + 1); px(p + 2) = bytes(o)
            x += 1; o += 3
          }
          j += 1
        }
        Some(Image(w, h, px))
      } else if (bits == 8) {
        val clrUsed = ru32(bytes, 46)
        if (clrUsed < 1 || clrUsed > 256) return None
        if (pixelOffset != HeaderLen + clrUsed * 4) return None
        if (pixelOffset > bytes.length) return None
        def color(px: Array[Byte], p: Int, v: Int): Unit = {
          val o = HeaderLen + v * 4
          px(p) = bytes(o + 2); px(p + 1) = bytes(o + 1); px(p + 2) = bytes(o)
        }
        if (comp == 0) {
          if (topDown) return None // encode8 is bottom-up only; keep the pair exact
          val stride = (w + 3) & ~3
          if (pixelOffset.toLong + stride.toLong * h != bytes.length) return None
          val px = new Array[Byte](n * 3)
          var j = 0
          while (j < h) {
            val imgRow = h - 1 - j
            var x = 0
            while (x < w) {
              val v = bytes(pixelOffset + j * stride + x) & 0xFF
              if (v >= clrUsed) return None
              color(px, (imgRow * w + x) * 3, v)
              x += 1
            }
            j += 1
          }
          Some(Image(w, h, px))
        } else if (comp == 1) {
          if (topDown) return None // RLE bitmaps cannot be top-down, per spec
          // RLE cannot be tied to an exact length upfront, but it CAN be
          // bounded: every 2-byte opcode paints at most 255 pixels, so a
          // stream of L bytes can never cover more than 255*L/2 — a tiny
          // payload claiming a huge raster refuses before allocating
          if (n.toLong > 255L * ((bytes.length - pixelOffset) / 2)) return None
          val px = new Array[Byte](n * 3)
          var i = pixelOffset
          var fy = 0 // file row counter: 0 = bottom row
          var x = 0
          while (true) {
            if (i + 2 > bytes.length) return None
            val b0 = bytes(i) & 0xFF; val b1 = bytes(i + 1) & 0xFF; i += 2
            if (b0 > 0) { // encoded run
              if (fy >= h || x + b0 > w || b1 >= clrUsed) return None
              val base = ((h - 1 - fy) * w + x) * 3
              (0 until b0).foreach(j => color(px, base + j * 3, b1))
              x += b0
            } else b1 match {
              case 0 => // EOL: a partial row would leave pixels undefined
                if (fy >= h || x != w) return None
                fy += 1; x = 0
              case 1 => // EOB: last row complete (EOL before it optional)
                if (!((fy == h - 1 && x == w) || (fy == h && x == 0))) return None
                if (i != bytes.length) return None
                return Some(Image(w, h, px))
              case 2 => return None // delta: skipped pixels are undefined
              case cnt => // absolute block, 3..255 literals, word-aligned
                if (fy >= h || x + cnt > w) return None
                val padded = cnt + (cnt & 1)
                if (i + padded > bytes.length) return None
                val base = ((h - 1 - fy) * w + x) * 3
                var j = 0
                while (j < cnt) {
                  val v = bytes(i + j) & 0xFF
                  if (v >= clrUsed) return None
                  color(px, base + j * 3, v)
                  j += 1
                }
                i += padded; x += cnt
            }
          }
          None // unreachable; the loop exits via returns
        } else None
      } else None
    }
  }

  val BmpW = 7 // width*3 = 21 bytes: the 4-byte stride padding is load-bearing
  val BmpH = 5

  final case class BmpStats(doc_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Wrap each document's UTF-8 bytes as a BmpW×BmpH RGB raster
    * (zero-padded) and BMP-encode it 24-bit BI_RGB (q118). */
  def synthesizeBmp(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      val px = java.util.Arrays.copyOf(txt, BmpW * BmpH * 3)
      MediaRow(id, Bmp.encode24(BmpW, BmpH, px), "image/bmp", BmpW, BmpH)
    }

  /** Same raster through the 8-bit RLE8 path (q119): 35 pixels can never
    * exceed the 256-color palette cap, so every document encodes. */
  def synthesizeBmpRle(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      val px = java.util.Arrays.copyOf(txt, BmpW * BmpH * 3)
      MediaRow(id, Bmp.encodeRle8(BmpW, BmpH, px), "image/bmp", BmpW, BmpH)
    }

  /** REAL decode → per-channel pixel means (the q58/q91/q95 stats over
    * the roundtripped raster). */
  def decodeBmpStats(rows: Iterator[MediaRow]): Iterator[BmpStats] =
    rows.flatMap { r =>
      Bmp.decode(r.payload).map { img =>
        val n = img.width * img.height
        val sums = new Array[Long](3)
        var p = 0
        while (p < n * 3) { sums(p % 3) += img.pixels(p) & 0xFF; p += 1 }
        BmpStats(r.doc_id, img.width, img.height,
          sums(0).toDouble / n, sums(1).toDouble / n, sums(2).toDouble / n)
      }
    }

  /** q118 — the decode pipeline on the DIB wire layout: synthesize a
    * 24-bit BMP per document (BGR order, bottom-up rows, stride padding
    * — all three load-bearing at the 7-wide fixture), decode it back,
    * emit decoded dimensions + channel means. */
  private def q118(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodeBmpStats(synthesizeBmp(rows)))
      .select($"doc_id", $"width", $"height", $"mean_r", $"mean_g", $"mean_b")
      .orderBy($"doc_id")
  }

  /** q119 — the RLE8 half of the BMP codec: palette from the raster's
    * distinct colors, run/absolute/EOL/EOB opcode stream (text bytes
    * drive absolute blocks; the zero-padded tail drives encoded runs),
    * decoded through the opcode walker back to the identical raster. */
  private def q119(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodeBmpStats(synthesizeBmpRle(rows)))
      .select($"doc_id", $"width", $"height", $"mean_r", $"mean_g", $"mean_b")
      .orderBy($"doc_id")
  }

  // oracle = the roundtrip identity ([[rgbRoundtripSql]] at the BMP
  // fixture geometry); shared by q118 and q119 — compression is wire
  // layout, not content.
  private val q118Sql = rgbRoundtripSql(BmpW, BmpH)

  // ------------------------- JPEG (q122/q123) ---------------------------

  val JpegBw = 7 // blocks across — 35 block bytes, the BMP fixture budget
  val JpegBh = 5 // blocks down
  val JpegW: Int = JpegBw * 8 // 56 px
  val JpegH: Int = JpegBh * 8 // 40 px

  final case class JpegStats(doc_id: Long, width: Int, height: Int,
      mean_gray: Double)
  final case class Jpeg420Stats(doc_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Per-8×8-BLOCK-constant gray raster from the document's bytes (one
    * byte per block, zero-padded): with [[Jpeg.QuantFlat]] a constant
    * block has a DC-only spectrum with an exact-integer DC, so the LOSSY
    * codec roundtrips these rasters EXACTLY — the q122/q123 oracle
    * premise (see [[Jpeg]]'s doc). */
  private def blockGray(txt: Array[Byte]): Array[Byte] = {
    val blocks = java.util.Arrays.copyOf(txt, JpegBw * JpegBh)
    val gray = new Array[Byte](JpegW * JpegH)
    var y = 0
    while (y < JpegH) {
      var x = 0
      while (x < JpegW) {
        gray(y * JpegW + x) = blocks((y / 8) * JpegBw + (x / 8))
        x += 1
      }
      y += 1
    }
    gray
  }

  /** Grayscale baseline JPEG per document, RSTn markers every 3 MCUs so
    * the serving path exercises restart handling on every row. */
  def synthesizeJpeg(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      MediaRow(id, Jpeg.encodeGray(JpegW, JpegH, blockGray(txt),
        restartInterval = 3), "image/jpeg", JpegW, JpegH)
    }

  /** 4:2:0 YCbCr baseline JPEG per document: the same block-constant
    * raster as the Y plane, chroma flat at 128 (neutral — decoded RGB is
    * exactly (y, y, y)), so the 16×16 MCU interleave, the PARTIAL edge
    * MCUs (56×40 is 3.5×2.5 MCUs) and chroma upsampling are all
    * load-bearing on the wire while the roundtrip stays the identity. */
  def synthesizeJpeg420(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      val cw = (JpegW + 1) / 2
      val chh = (JpegH + 1) / 2
      val flat = Array.fill[Byte](cw * chh)(128.toByte)
      MediaRow(id, Jpeg.encodeYcc420(JpegW, JpegH, blockGray(txt), flat, flat),
        "image/jpeg", JpegW, JpegH)
    }

  /** REAL decode → decoded dims + gray mean. */
  def decodeJpegStats(rows: Iterator[MediaRow]): Iterator[JpegStats] =
    rows.flatMap { r =>
      Jpeg.decode(r.payload).collect {
        case img if img.nComponents == 1 =>
          var sum = 0L
          var i = 0
          while (i < img.pixels.length) { sum += img.pixels(i) & 0xFF; i += 1 }
          JpegStats(r.doc_id, img.width, img.height,
            sum.toDouble / (img.width * img.height))
      }
    }

  /** REAL decode of the color path → per-channel means. */
  def decodeJpeg420Stats(rows: Iterator[MediaRow]): Iterator[Jpeg420Stats] =
    rows.flatMap { r =>
      Jpeg.decode(r.payload).collect {
        case img if img.nComponents == 3 =>
          val n = img.width * img.height
          val sums = new Array[Long](3)
          var p = 0
          while (p < n * 3) { sums(p % 3) += img.pixels(p) & 0xFF; p += 1 }
          Jpeg420Stats(r.doc_id, img.width, img.height,
            sums(0).toDouble / n, sums(1).toDouble / n, sums(2).toDouble / n)
      }
    }

  /** q122 — baseline JPEG decode over the grayscale wire: markers, DQT,
    * DHT canonical codes, byte stuffing, RSTn restarts, zigzag, dequant,
    * IDCT — all on the real JFIF layout, with the block-constant fixture
    * making the roundtrip exact (so the oracle is pure SQL). */
  private def q122(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodeJpegStats(synthesizeJpeg(rows)))
      .select($"doc_id", $"width", $"height", $"mean_gray")
      .orderBy($"doc_id")
  }

  /** q123 — the 4:2:0 YCbCr half: interleaved 16×16 MCUs with partial
    * edge MCUs, two chroma components, replication upsampling and the
    * JFIF color transform (neutral chroma ⇒ RGB = (y,y,y) exactly). */
  private def q123(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodeJpeg420Stats(synthesizeJpeg420(rows)))
      .select($"doc_id", $"width", $"height", $"mean_r", $"mean_g", $"mean_b")
      .orderBy($"doc_id")
  }

  /** Oracle: roundtrip identity at BLOCK granularity — each of the
    * [[JpegBw]]×[[JpegBh]] blocks is one (zero-padded) document byte
    * replicated over 64 pixels, so the raster mean is the mean of the
    * padded block bytes. Single-byte-corpus assumption as in q58Sql. */
  private val q122Sql = {
    val nb = JpegBw * JpegBh
    s"""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
       |ch AS (SELECT doc_id,
       |    CASE WHEN j < len THEN ascii(substr(text, CAST(j + 1 AS INTEGER), 1)) ELSE 0 END AS v
       |  FROM b, range($nb) t(j)),
       |agg AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS sv FROM ch GROUP BY doc_id)
       |SELECT doc_id, CAST($JpegW AS INTEGER) AS width, CAST($JpegH AS INTEGER) AS height,
       |  sv / $nb.0 AS mean_gray
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  /** PROGRESSIVE (SOF2) twins of the q122/q123 fixtures: same
    * block-constant rasters, same exact-roundtrip premise, but the wire
    * carries a multi-scan progression (interleaved DC scan, then
    * per-component full-band AC scans with EOBn run-length coding — the
    * block-constant raster makes every AC scan one long EOB run, so the
    * EOBRUN machinery is load-bearing for every row). */
  def synthesizeJpegProg(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      MediaRow(id, Jpeg.encodeGrayProgressive(JpegW, JpegH, blockGray(txt)),
        "image/jpeg", JpegW, JpegH)
    }

  def synthesizeJpegProg420(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      val cw = (JpegW + 1) / 2
      val chh = (JpegH + 1) / 2
      val flat = Array.fill[Byte](cw * chh)(128.toByte)
      MediaRow(id,
        Jpeg.encodeYcc420Progressive(JpegW, JpegH, blockGray(txt), flat, flat),
        "image/jpeg", JpegW, JpegH)
    }

  /** q124 — PROGRESSIVE JPEG decode, grayscale: the SOF2 multi-scan
    * path (coefficient accumulation across scans, EOB runs, final
    * dequant+IDCT reconstruction) on the real JFIF wire; the
    * successive-approximation scans the fixture encoder does not emit
    * are gated by JpegSpec's javax.imageio interop instead. */
  private def q124(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodeJpegStats(synthesizeJpegProg(rows)))
      .select($"doc_id", $"width", $"height", $"mean_gray")
      .orderBy($"doc_id")
  }

  /** q125 — progressive 4:2:0 color: interleaved DC scan over 16×16
    * MCUs (partial at both edges) + three per-component AC scans. */
  private def q125(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodeJpeg420Stats(synthesizeJpegProg420(rows)))
      .select($"doc_id", $"width", $"height", $"mean_r", $"mean_g", $"mean_b")
      .orderBy($"doc_id")
  }

  /** q126's wire: the q124 progression with the DC split into a
    * successive-approximation pair (first scan at Al=1, one-bit
    * refinement scan) — the SA decode machinery ImageIO interop covers
    * in spec-land, now behind an oracle row too. */
  def synthesizeJpegProgSa(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      MediaRow(id,
        Jpeg.encodeGrayProgressive(JpegW, JpegH, blockGray(txt), dcSa = true),
        "image/jpeg", JpegW, JpegH)
    }

  /** q126 — progressive JPEG with DC successive approximation. */
  private def q126(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodeJpegStats(synthesizeJpegProgSa(rows)))
      .select($"doc_id", $"width", $"height", $"mean_gray")
      .orderBy($"doc_id")
  }

  // ------------- q127: AC successive approximation (progressive) --------

  /** Quant table for the AC-SA fixture: flat except 8 at the two exact
    * square-wave basis positions (nat 4 = (u=4, v=0); nat 36 =
    * (u=4, v=4)) — their raw spectra are exact multiples of 8
    * (see [[acSaBlockGray]]), so dividing by 8 makes the QUANTIZED
    * coefficient the raw amplitude itself: any integer, including the
    * ODD values and ±1 the successive-approximation refinement paths
    * need, while the roundtrip stays bit-exact. */
  val QuantAcSa: Array[Int] = {
    val q = Jpeg.QuantFlat.clone(); q(4) = 8; q(36) = 8; q
  }

  /** The 8-point square wave s = √2·cos((2x+1)π/4) — the one ±1-valued
    * integer pattern that IS a single DCT basis (u = 4), so a block
    * a + c·s(x) + d·s(x)s(y) has the exact integer spectrum
    * {DC = 8(a−128), (u=4,v=0) = 8c, (u=4,v=4) = 8d} and nothing else. */
  private val Sq = Array(1, -1, -1, 1, 1, -1, -1, 1)

  /** Per-block raster for q127: base = v/2 + 64 keeps base ± (|c|+|d|)
    * inside [0, 255] with no clamping, and the residue class of the
    * block byte v picks which AC-SA decode path the block drives:
    *
    *   v%6=0 — c=d=0: EOB runs in both AC scans (and the padding bytes)
    *   v%6=1 — c=+1: invisible at Al=1, NEWLY significant (+) in refine
    *   v%6=2 — c∈−16..−23: significant from the first scan; no new
    *           significance in refine ⇒ EOBn with PENDING correction bit
    *   v%6=3 — d∈17..24 alone at zigzag 39: a 38-zero run ⇒ ZRL pair in
    *           the FIRST scan (Al=1)
    *   v%6=4 — c∈18..25 at z=14 plus d=±1 at z=39: 24 zero-history
    *           positions between them ⇒ REFINE-scan ZRL with the
    *           buffered correction bit flushing after it, then a new ±1
    *   v%6=5 — c=−1: newly significant with the NEGATIVE sign bit
    *
    * Both square-wave terms sum to zero over the block, so the BLOCK
    * MEAN is base for every class — the SQL oracle stays byte
    * arithmetic — while the wire exercises every G.1.2.3 branch. */
  private[graft] def acSaBlockGray(txt: Array[Byte]): Array[Byte] = {
    val blocks = java.util.Arrays.copyOf(txt, JpegBw * JpegBh)
    val gray = new Array[Byte](JpegW * JpegH)
    var by = 0
    while (by < JpegBh) {
      var bx = 0
      while (bx < JpegBw) {
        val v = blocks(by * JpegBw + bx) & 0xFF
        val base = (v >> 1) + 64
        val (c, d) = (v % 6) match {
          case 0 => (0, 0)
          case 1 => (1, 0)
          case 2 => (-(16 + (v & 7)), 0)
          case 3 => (0, 17 + (v & 7))
          case 4 => (18 + (v & 7), if ((v & 8) != 0) 1 else -1)
          case _ => (-1, 0)
        }
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            gray((by * 8 + y) * JpegW + bx * 8 + x) =
              (base + c * Sq(x) + d * Sq(x) * Sq(y)).toByte
            x += 1
          }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    gray
  }

  def synthesizeJpegProgAcSa(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      MediaRow(id,
        Jpeg.encodeGrayProgressive(JpegW, JpegH, acSaBlockGray(txt),
          quant = QuantAcSa, acSa = true),
        "image/jpeg", JpegW, JpegH)
    }

  /** q127 — progressive JPEG with AC successive approximation: the
    * Al=1 AC first scan plus the T.81 G.1.2.3 refinement scan
    * (correction bits, new-significance ±1 symbols, refine-ZRL,
    * EOBn-with-pending-bits — all on the wire by fixture construction,
    * see [[acSaBlockGray]]), previously gated only by ImageIO interop. */
  private def q127(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodeJpegStats(synthesizeJpegProgAcSa(rows)))
      .select($"doc_id", $"width", $"height", $"mean_gray")
      .orderBy($"doc_id")
  }

  /** q128's wire: the FULL successive-approximation progression — DC
    * split (Al=1 first + refinement) AND the AC pair, four scans total,
    * so coefficient accumulation across the maximal scan-script shape is
    * on an oracle row (the q127 fixture content; DC-SA changes wire
    * layout, not content, the q118/q119 rule). */
  def synthesizeJpegProgFullSa(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      MediaRow(id,
        Jpeg.encodeGrayProgressive(JpegW, JpegH, acSaBlockGray(txt),
          quant = QuantAcSa, dcSa = true, acSa = true),
        "image/jpeg", JpegW, JpegH)
    }

  /** q128 — progressive JPEG, combined DC + AC successive approximation. */
  private def q128(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodeJpegStats(synthesizeJpegProgFullSa(rows)))
      .select($"doc_id", $"width", $"height", $"mean_gray")
      .orderBy($"doc_id")
  }

  /** q127's oracle: block mean = v/2 + 64 per (padded) byte — the
    * square-wave AC terms cancel over each block exactly. */
  private val q127Sql = {
    val nb = JpegBw * JpegBh
    s"""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
       |ch AS (SELECT doc_id,
       |    CASE WHEN j < len THEN ascii(substr(text, CAST(j + 1 AS INTEGER), 1)) ELSE 0 END AS v
       |  FROM b, range($nb) t(j)),
       |agg AS (SELECT doc_id, CAST(SUM(v // 2 + 64) AS BIGINT) AS sv FROM ch GROUP BY doc_id)
       |SELECT doc_id, CAST($JpegW AS INTEGER) AS width, CAST($JpegH AS INTEGER) AS height,
       |  sv / $nb.0 AS mean_gray
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  /** q123's oracle: same block mean on every channel (neutral chroma). */
  private val q123Sql = {
    val nb = JpegBw * JpegBh
    s"""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
       |ch AS (SELECT doc_id,
       |    CASE WHEN j < len THEN ascii(substr(text, CAST(j + 1 AS INTEGER), 1)) ELSE 0 END AS v
       |  FROM b, range($nb) t(j)),
       |agg AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS sv FROM ch GROUP BY doc_id)
       |SELECT doc_id, CAST($JpegW AS INTEGER) AS width, CAST($JpegH AS INTEGER) AS height,
       |  sv / $nb.0 AS mean_r, sv / $nb.0 AS mean_g, sv / $nb.0 AS mean_b
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  // ----------------------- TIFF (q130/q131) -----------------------------

  val TiffW = 7
  val TiffH = 5
  /** 5 rows at 2 per strip → 3 strips: StripOffsets/StripByteCounts are
    * forced out of line behind offsets — the pointer-graph branch of the
    * [[Tiff]] wire (single-strip inline is TiffSpec's job). */
  val TiffRowsPerStrip = 2

  final case class TiffGrayStats(doc_id: Long, width: Int, height: Int,
      mean_gray: Double)

  /** One gray TIFF per document (text bytes as the raster, zero-padded),
    * ALTERNATING byte order by doc_id parity — every run exercises both
    * the "II" and "MM" read paths on half the corpus each. */
  def synthesizeTiffGray(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      val px = java.util.Arrays.copyOf(txt, TiffW * TiffH)
      MediaRow(id, Tiff.encodeGray(TiffW, TiffH, px,
        bigEndian = id % 2 == 0, rowsPerStrip = TiffRowsPerStrip),
        "image/tiff", TiffW, TiffH)
    }

  /** RGB + PackBits variant for q131: the text bytes give literal-heavy
    * rows, the zero-padded tail gives repeat runs — both opcode classes
    * on the wire for every document, packed per row as §9 requires. */
  def synthesizeTiffRgbPackBits(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, txt) =>
      val px = java.util.Arrays.copyOf(txt, TiffW * TiffH * 3)
      MediaRow(id, Tiff.encodeRgb(TiffW, TiffH, px,
        bigEndian = id % 2 == 0, rowsPerStrip = TiffRowsPerStrip,
        packBits = true),
        "image/tiff", TiffW, TiffH)
    }

  /** REAL decode → dims + gray mean (refuses non-gray). */
  def decodeTiffGrayStats(rows: Iterator[MediaRow]): Iterator[TiffGrayStats] =
    rows.flatMap { r =>
      Tiff.decode(r.payload).collect {
        case img if img.samplesPerPixel == 1 =>
          var sum = 0L
          var i = 0
          while (i < img.pixels.length) { sum += img.pixels(i) & 0xFF; i += 1 }
          TiffGrayStats(r.doc_id, img.width, img.height,
            sum.toDouble / (img.width * img.height))
      }
    }

  /** REAL decode of the RGB path → per-channel means. */
  def decodeTiffRgbStats(rows: Iterator[MediaRow]): Iterator[BmpStats] =
    rows.flatMap { r =>
      Tiff.decode(r.payload).collect {
        case img if img.samplesPerPixel == 3 =>
          val n = img.width * img.height
          val sums = new Array[Long](3)
          var p = 0
          while (p < n * 3) { sums(p % 3) += img.pixels(p) & 0xFF; p += 1 }
          BmpStats(r.doc_id, img.width, img.height,
            sums(0).toDouble / n, sums(1).toDouble / n, sums(2).toDouble / n)
      }
    }

  /** q130 — TIFF decode over the dual-byte-order pointer-graph wire:
    * header, IFD entry walk, out-of-line strip arrays, multi-strip
    * assembly — byte order alternating per document. */
  private def q130(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodeTiffGrayStats(synthesizeTiffGray(rows)))
      .select($"doc_id", $"width", $"height", $"mean_gray")
      .orderBy($"doc_id")
  }

  /** q131 — the PackBits + RGB half: per-row RLE opcode streams inside
    * each strip, 3-sample chunky pixels, out-of-line BitsPerSample. */
  private def q131(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("b")).as[(Long, Array[Byte])]
      .mapPartitions(rows => decodeTiffRgbStats(synthesizeTiffRgbPackBits(rows)))
      .select($"doc_id", $"width", $"height", $"mean_r", $"mean_g", $"mean_b")
      .orderBy($"doc_id")
  }

  /** q130's oracle: roundtrip identity — pixel j is (padded) text byte j,
    * so the gray mean is pure byte arithmetic. */
  private val q130Sql = {
    val np = TiffW * TiffH
    s"""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
       |ch AS (SELECT doc_id,
       |    CASE WHEN j < len THEN ascii(substr(text, CAST(j + 1 AS INTEGER), 1)) ELSE 0 END AS v
       |  FROM b, range($np) t(j)),
       |agg AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS sv FROM ch GROUP BY doc_id)
       |SELECT doc_id, CAST($TiffW AS INTEGER) AS width, CAST($TiffH AS INTEGER) AS height,
       |  sv / $np.0 AS mean_gray
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  // q131's oracle: the RGB roundtrip identity at the TIFF geometry
  // (compression is wire layout, not content — the q118/q119 rule)
  private val q131Sql = rgbRoundtripSql(TiffW, TiffH)

  val all: Seq[GQuery] = Seq(
    GQuery("q35_multimodal_decode", q35, Some(q35Sql)),
    GQuery("q48_frame_sample", q48, Some(q48Sql)),
    GQuery("q55_multimodal_resize", q55, Some(q55Sql)),
    GQuery("q58_ppm_decode", q58, Some(q58Sql)),
    GQuery("q77_wav_decode", q77, Some(q77Sql)),
    GQuery("q91_qoi_decode", q91, Some(q91Sql)),
    GQuery("q95_png_decode", q95, Some(q95Sql)),
    GQuery("q116_png_interlaced_decode", q116, Some(q95Sql)),
    GQuery("q101_gif_decode", q101, Some(q101Sql)),
    GQuery("q117_gif_interlaced_decode", q117, Some(q117Sql)),
    GQuery("q107_gif_anim_decode", q107, Some(q107Sql)),
    GQuery("q108_gif_compositing", q108, Some(q108Sql)),
    GQuery("q118_bmp_decode", q118, Some(q118Sql)),
    GQuery("q119_bmp_rle8_decode", q119, Some(q118Sql)),
    GQuery("q120_ulaw_compand", q120, Some(q120Sql)),
    GQuery("q121_alaw_compand", q121, Some(q121Sql)),
    GQuery("q122_jpeg_decode", q122, Some(q122Sql)),
    GQuery("q123_jpeg420_decode", q123, Some(q123Sql)),
    // oracles shared with the baseline twins — progression is wire
    // layout, not content (the q118/q119 rule)
    GQuery("q124_jpeg_progressive_decode", q124, Some(q122Sql)),
    GQuery("q125_jpeg420_progressive_decode", q125, Some(q123Sql)),
    GQuery("q126_jpeg_sa_decode", q126, Some(q122Sql)),
    GQuery("q127_jpeg_ac_sa_decode", q127, Some(q127Sql)),
    // same content as q127 (SA split is wire layout, not content) —
    // oracle shared, the q118/q119 rule
    GQuery("q128_jpeg_full_sa_decode", q128, Some(q127Sql)),
    GQuery("q130_tiff_decode", q130, Some(q130Sql)),
    GQuery("q131_tiff_packbits_decode", q131, Some(q131Sql)),
    GQuery("q135_gif_frame_sample", q135, Some(q135Sql)),
  )
}
