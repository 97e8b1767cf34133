package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** q129 (SemDeDup) against an INDEPENDENT driver-side walk: local
  * quantization, local cosine argmax assignment (ties to the smallest
  * centroid id), within-cell all-pairs in exact BigInt arithmetic, and the
  * greedy min-id removal rule — recomputed from the raw embeddings and
  * compared row-exactly. Also pins the algebra the query rests on: the
  * all-integer τ test must agree with the float cosine threshold away from
  * the boundary, and the removed/kept split must partition each cell.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def cosLocal(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** q62's quantization arithmetic, locally. */
  private def quantize(v: Seq[Double]): Array[Long] = {
    val scale = v.map(math.abs).max / 127.0
    if (scale == 0.0) Array.fill(v.length)(0L)
    else v.map(x => math.floor(x / scale + 0.5).toLong).toArray
  }

  /** The registered integer τ test, in BigInt so the spec cannot share an
    * overflow bug with the implementation. */
  private def intDup(aq: Array[Long], bq: Array[Long]): Boolean = {
    val dot = BigInt(aq.zip(bq).map { case (u, v) => u * v }.sum)
    val na = BigInt(aq.map(x => x * x).sum)
    val nb = BigInt(bq.map(x => x * x).sum)
    na > 0 && nb > 0 && dot >= 0 &&
      BigInt(Similarity.SemDedupDen) * Similarity.SemDedupDen * dot * dot >=
        BigInt(Similarity.SemDedupNum) * Similarity.SemDedupNum * na * nb
  }

  test("q129 equals an independent driver-side brute force") {
    val got = SparkEntry.queries("q129_semantic_dedup")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    val emb = Similarity.embeddings(spark, dir)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val cents = Similarity.trainedCentroids(spark, dir).sortBy(_._1)

    val assigned = emb.map { case (id, v) =>
      val best = cents.map { case (cid, cv) => (cid, cosLocal(v, cv)) }
        .maxBy { case (cid, s) => (s, -cid) }._1
      (id, best, quantize(v))
    }

    val expected: Map[Long, (Long, Long, Long)] =
      assigned.groupBy(_._2).toSeq.flatMap { case (cell, members) =>
        val sorted = members.sortBy(_._1)
        sorted.flatMap { case (bid, _, bq) =>
          val lowerDups = sorted.takeWhile(_._1 < bid)
            .collect { case (aid, _, aq) if intDup(aq, bq) => aid }
          if (lowerDups.isEmpty) None
          else Some(bid -> ((cell, lowerDups.min, lowerDups.length.toLong)))
        }
      }.toMap

    assert(got == expected)
    // non-vacuity: duplicates exist, more than one cell contributes, and
    // some member is witnessed by >1 lower-id duplicate
    assert(expected.nonEmpty)
    assert(expected.values.map(_._1).toSet.size > 1, "one cell only — fixture too weak")
    assert(expected.values.exists(_._3 > 1L), "no multi-witness removal exercised")
    // the removed set is a strict subset of the corpus: something survives
    // in every cell that has members
    val removedPerCell = expected.groupBy(_._2._1).map { case (c, m) => c -> m.size }
    val sizePerCell = assigned.groupBy(_._2).map { case (c, m) => c -> m.size }
    removedPerCell.foreach { case (c, r) =>
      assert(r < sizePerCell(c), s"cell $c removed all its members")
    }
  }

  test("integer τ test agrees with the float cosine threshold away from the boundary") {
    val tau = Similarity.SemDedupNum.toDouble / Similarity.SemDedupDen
    val emb = Similarity.embeddings(spark, dir)
      .collect().map(r => (r.getLong(0), quantize(r.getSeq[Double](1))))
    val rnd = new scala.util.Random(7)
    val sample = rnd.shuffle(emb.toSeq).take(60)
    var checked = 0
    for {
      (ai, aq) <- sample; (bi, bq) <- sample if ai < bi
      if aq.exists(_ != 0L) && bq.exists(_ != 0L)
    } {
      val c = cosLocal(aq.map(_.toDouble).toSeq, bq.map(_.toDouble).toSeq)
      if (math.abs(c - tau) > 1e-9) {
        assert(intDup(aq, bq) == (c >= tau), s"pair ($ai,$bi) cos=$c")
        checked += 1
      }
    }
    assert(checked > 1000, s"only $checked pairs checked")
  }

  test("zero-vector guard: an all-zero code duplicates nothing") {
    val z = Array.fill(64)(0L)
    val anyVec = Array.tabulate(64)(i => (i % 5 - 2).toLong)
    assert(!intDup(z, anyVec) && !intDup(anyVec, z) && !intDup(z, z))
  }
}
