package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** q109's cluster summary against an INDEPENDENT driver-side walk: local
  * quantization, local cosine argmax assignment (ties to the smallest
  * centroid id — the registered rule), floorDiv centers and a direct
  * Σ(x − c)² inertia, recomputed per cluster and compared exactly. The
  * query's algebraic one-pass form (Σx² − 2cΣx + nc²) must equal the
  * direct form on every cluster, the cluster sizes must partition the
  * corpus, and the fixture must exercise the negative-sum floorDiv path
  * (the pmod identity's only interesting case). */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def cosLocal(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** q62's quantization arithmetic, locally: scale = max|x|/127,
    * q_i = ⌊x_i/scale + 0.5⌋ (all-zero vector → all-zero codes). */
  private def quantize(v: Seq[Double]): Array[Long] = {
    val scale = v.map(math.abs).max / 127.0
    if (scale == 0.0) Array.fill(v.length)(0L)
    else v.map(x => math.floor(x / scale + 0.5).toLong).toArray
  }

  test("q109 equals an independent driver-side brute force and partitions the corpus") {
    import spark.implicits._
    // rep_vec_id is NULL for an empty cluster (the every-cluster contract:
    // one row per TRAINED centroid, empty cells as (cluster, 0, NULL, 0))
    val got = SparkEntry.queries("q109_kmeans_clusters")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3))))
      .toMap

    val emb = Similarity.embeddings(spark, dir)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val cents = Similarity.trainedCentroids(spark, dir).sortBy(_._1)

    // independent assignment: best cosine, ties to the smallest centroid id
    val assigned = emb.map { case (id, v) =>
      val best = cents.map { case (cid, cv) => (cid, cosLocal(v, cv)) }
        .maxBy { case (cid, s) => (s, -cid) }._1
      (id, best, quantize(v))
    }
    assert(assigned.map(_._2).distinct.length > 1, "fixture must span clusters")

    val byCluster = assigned.groupBy(_._2)
    // non-vacuity: multiple non-singleton clusters, and at least one
    // negative per-dim sum so floorDiv ≠ truncating division somewhere
    assert(byCluster.count(_._2.length > 1) >= 2)
    val dims = assigned.head._3.length
    val anyNegSum = byCluster.values.exists { ms =>
      (0 until dims).exists(d => ms.map(_._3(d)).sum < 0) }
    assert(anyNegSum, "fixture must exercise the negative-sum floorDiv path")

    // one row per TRAINED centroid — populated cells match the brute
    // force; any empty cell must read (0, NULL, 0)
    assert(got.keySet == cents.map(_._1).toSet)
    byCluster.foreach { case (cid, ms) =>
      val n = ms.length.toLong
      val rep = ms.map(_._1).min
      val inertia = (0 until dims).map { d =>
        val xs = ms.map(_._3(d))
        val c = Math.floorDiv(xs.sum, n)
        xs.map(x => (x - c) * (x - c)).sum
      }.sum
      assert(got(cid) == ((n, Some(rep), inertia)),
        s"cluster $cid: got ${got(cid)}, want ($n, $rep, $inertia)")
    }
    (got.keySet -- byCluster.keySet).foreach { cid =>
      assert(got(cid) == ((0L, None, 0L)), s"empty cluster $cid: got ${got(cid)}")
    }
    assert(got.values.map(_._1).sum == emb.length.toLong)
  }

  test("q109's plan has no corpus-side join (one corpus scan, aggregation only)") {
    // the scale property the first cut violated: assignment and
    // quantization are per-row functions of ONE scan, so no plan node may
    // join two corpus-derived relations — a corpus×corpus equi-join on
    // vec_id is broadcastable only at toy scale. The ONLY permitted join
    // is the every-cluster left join, whose probe side is the k-row
    // driver-literal centroid-id frame (a LocalRelation)
    val df = SparkEntry.queries("q109_kmeans_clusters")(spark, dir)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.length <= 1, s"q109 plan contains extra joins: $joins")
    joins.foreach { j =>
      val literalSide = Seq(j.left, j.right).exists(_.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
      assert(literalSide, s"q109 join lacks a k-row driver-literal side: $j")
    }
  }

  /** The Oracle family's md5 hash63 from the published arithmetic,
    * independent of the Column expression (the TextLmSpec walk). */
  private def hash63(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2147483648L) * 4294967296L +
      java.lang.Long.parseLong(hex.substring(8, 16), 16)
  }

  test("q136 ≡ independent per-cell lowest-hash walk; quotas respected") {
    import spark.implicits._
    val cents = Similarity.trainedCentroids(spark, dir)
    val assigned = Similarity.assignToCentroids(
        Similarity.embeddings(spark, dir), cents)
      .select($"cell", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = assigned.groupBy(_._1).toSeq.flatMap { case (cell, ms) =>
      ms.map(_._2).sortBy(id => (hash63(id.toString), id))
        .take(Similarity.ClusterQuota).zipWithIndex
        .map { case (id, i) => (cell, i + 1, id) }
    }.toSet
    val got = SparkEntry.queries("q136_cluster_balanced_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want)
    // quota + per-cell-count invariants
    val perCell = got.groupBy(_._1)
    perCell.foreach { case (cell, picks) =>
      assert(picks.size <= Similarity.ClusterQuota, s"cell $cell over quota")
      assert(picks.map(_._2).toSeq.sorted == (1 to picks.size), s"cell $cell ranks")
    }
    // non-vacuity: some cell hits its quota, and the sample genuinely
    // SUBSETS the corpus (at this fixture every non-empty cell exceeds
    // the quota, so an under-quota cell would be vacuous to demand)
    assert(perCell.values.exists(_.size == Similarity.ClusterQuota))
    assert(got.size < assigned.length, "quota never bound — sample ≡ corpus")
  }
}
