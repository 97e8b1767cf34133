package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.G711
import org.scalatest.funsuite.AnyFunSuite

/** G.711 companding against the published algorithm's invariants, swept
  * exhaustively (the domains are tiny: 256 bytes, 65,536 samples):
  * codebook idempotence, bounded and segment-proportional quantization
  * error, sign symmetry, monotone magnitude ordering, and golden anchors
  * from the spec's tables (most-negative → 0x00 and most-positive → 0x80
  * for µ-law; ±zero codes). Both laws are total — every input encodes,
  * every byte decodes — so there is no refusal surface to test. */
class G711Spec extends AnyFunSuite {

  private val allSamples = Short.MinValue.toInt to Short.MaxValue.toInt

  test("µ-law codebook contract: decode∘encode∘decode = decode on all 256 bytes") {
    (0 to 255).foreach { b =>
      val v = G711.ulawDecode(b)
      assert(G711.ulawDecode(G711.ulawEncode(v)) === v, s"byte $b (decodes to $v)")
    }
  }

  test("A-law codebook contract: decode∘encode∘decode = decode on all 256 bytes") {
    (0 to 255).foreach { b =>
      val v = G711.alawDecode(b)
      assert(G711.alawDecode(G711.alawEncode(v)) === v, s"byte $b (decodes to $v)")
    }
  }

  test("µ-law full 16-bit sweep: byte in range, error bounded by the segment step") {
    allSamples.foreach { v =>
      val b = G711.ulawEncode(v)
      assert(b >= 0 && b <= 255)
      val r = G711.ulawDecode(b)
      // segment step = 2^(exp+3); the reconstruction sits inside the
      // quantization cell, so the error is below one step (clip region
      // at |v| > 32635 adds at most the clipped tail)
      assert(math.abs(r - v) <= 1024 + (32767 - 32635), s"v=$v b=$b r=$r")
    }
  }

  test("A-law full 16-bit sweep: byte in range, error bounded by the segment step") {
    allSamples.foreach { v =>
      val b = G711.alawEncode(v)
      assert(b >= 0 && b <= 255)
      val r = G711.alawDecode(b)
      // top segment step = 2^(seg+4) = 2048 at seg 7 (13-bit magnitudes
      // scaled back by 8)
      assert(math.abs(r - v) <= 2048, s"v=$v b=$b r=$r")
    }
  }

  test("sign symmetry: negating the sample flips only the sign of the reconstruction") {
    // µ-law: enc(-v) decodes to -dec(enc(v)) for magnitudes below clip
    (0 to 32635).foreach { v =>
      assert(G711.ulawDecode(G711.ulawEncode(-v)) === -G711.ulawDecode(G711.ulawEncode(v)),
        s"ulaw v=$v")
    }
    // A-law's 13-bit path pairs -v-1 with v at the shifted magnitude, so
    // symmetry holds on the x-domain representatives: dec(enc(8k)) and
    // -dec(enc(-8k-8)) straddle zero equally
    (0 until 4096).foreach { k =>
      assert(G711.alawDecode(G711.alawEncode(k * 8)) ===
        -G711.alawDecode(G711.alawEncode(-k * 8 - 8)), s"alaw k=$k")
    }
  }

  test("monotone: reconstructed magnitude never decreases as the sample grows") {
    var prev = Int.MinValue
    allSamples.foreach { v =>
      val r = G711.ulawDecode(G711.ulawEncode(v))
      assert(r >= prev, s"ulaw not monotone at v=$v: $r < $prev")
      prev = r
    }
    prev = Int.MinValue
    allSamples.foreach { v =>
      val r = G711.alawDecode(G711.alawEncode(v))
      assert(r >= prev, s"alaw not monotone at v=$v: $r < $prev")
      prev = r
    }
  }

  test("golden anchors from the published tables") {
    assert(G711.ulawEncode(-32768) === 0x00, "most-negative µ-law code")
    assert(G711.ulawEncode(32767) === 0x80, "most-positive µ-law code")
    assert(G711.ulawEncode(0) === 0xFF, "positive zero µ-law code")
    assert(G711.ulawDecode(0xFF) === 0)
    assert(G711.ulawDecode(0x7F) === 0, "negative zero decodes to 0")
    assert(G711.ulawDecode(0x00) === 132 - ((0x0F * 8 + 132) << 7),
      "0x00 is the most negative reconstruction")
    // A-law: zero encodes to 0xD5 (mask with empty payload), which
    // decodes to the smallest positive step, +8
    assert(G711.alawEncode(0) === 0xD5)
    assert(G711.alawDecode(0xD5) === 8)
    assert(G711.alawDecode(0x55) === -8)
    assert(G711.alawDecode(G711.alawEncode(-32768)) === -32256,
      "most-negative A-law reconstruction (top segment midpoint)")
  }

  test("compandStats: checksum/error columns agree with a direct per-sample loop") {
    val doc = (7L, "g711 compand fixture".getBytes("UTF-8"))
    Seq[(Int => Int, Int => Int)](
      (G711.ulawEncode, G711.ulawDecode),
      (G711.alawEncode, G711.alawDecode)).foreach { case (enc, dec) =>
      val st = Multimodal.compandStats(Iterator(doc), enc, dec).next()
      val n = Multimodal.WavFrames * Multimodal.WavChannels
      val samples = (0 until n).map(j =>
        ((if (j < doc._2.length) doc._2(j) & 0xFF else 0) - 128) * 256)
      assert(st.n_samples === n.toLong)
      assert(st.byte_sum === samples.map(enc(_).toLong).sum)
      assert(st.recon_sum === samples.map(v => dec(enc(v)).toLong).sum)
      assert(st.max_err === samples.map(v => math.abs(dec(enc(v)) - v).toLong).max)
    }
  }
}
