package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Lloyd-trained IVF index (exact-integer training on the int8 codes —
  * the REGISTERED configuration since round 6): training must not degrade
  * the spherical k-means objective, the trained partition-pruned index
  * must reach recall@10 ≥ 9/10 on the q28 query, and across a query
  * panel the trained centroids must not lose recall vs the raw seeds
  * (training is load-bearing for q28/q61/q67/q78, so "does it help
  * retrieval" is the property that matters, not one lucky query). */
class IvfTrainingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def emb = {
    import spark.implicits._
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("vec"))
  }

  private def cosLocal(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("Lloyd training improves (never degrades) the assignment objective and moves centroids") {
    val e = emb.cache()
    val seeds = Similarity.trainCentroids(e, iters = 0)
    val trained = Similarity.trainCentroids(e,
      iters = Similarity.TrainIters, sampleMod = Similarity.TrainSampleMod)
    val q0 = Similarity.assignmentQuality(e, seeds)
    val q1 = Similarity.assignmentQuality(e, trained)
    assert(q1 >= q0 - 1e-9, s"objective degraded: $q0 -> $q1")
    assert(q1 > q0 + 1e-6, s"training was a no-op: $q0 -> $q1")
    // centroids genuinely moved off the seed vectors
    assert(seeds.zip(trained).exists { case ((_, s), (_, t)) => s != t })
  }

  test("trained IVF index: recall@10 ≥ 9/10 vs exact brute force, partition-pruned probe") {
    import spark.implicits._
    val e = emb.cache()
    val idxDir = java.nio.file.Files.createTempDirectory("ivftrained").toString + "/index"
    // the registered configuration, exactly as trainedCentroids serves it
    val cents = Similarity.buildTrainedIvfIndex(e, idxDir,
      iters = Similarity.TrainIters, sampleMod = Similarity.TrainSampleMod)
    val qvec = e.filter($"vec_id" === Similarity.QueryVecId).head().getSeq[Double](1)
    val cells = cents
      .map { case (id, c) => (cosLocal(c, qvec), id) }
      .sortBy { case (sim, id) => (-sim, id) }
      .take(Similarity.NProbe).map(_._2)
    val got = Similarity.queryIvfIndex(spark, idxDir, qvec, cells, k = Similarity.K + 1)
      .filter($"vec_id" =!= Similarity.QueryVecId)
      .limit(Similarity.K)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val exact = SparkEntry.queries("q27_ann_brute_topk")(spark, dir)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val overlap = got.intersect(exact).size
    assert(overlap >= 9, s"recall@10 = $overlap/10 on the trained index")
    // and the probe really prunes: scan carries the cell partition filter
    val probed = spark.read.parquet(idxDir).filter($"cell".isin(cells: _*))
    val scan = probed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(scan).isDefined, scan)
  }

  test("across a query panel, trained centroids never lose recall vs the seeds") {
    import spark.implicits._
    val e = emb.cache()
    val all = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val queries = Seq(0L, 17L, 101L, 250L, 333L, 444L)
    def meanRecall(cents: Seq[(Long, Seq[Double])]): Double = {
      val asg = Similarity.assignToCentroids(e, cents)
        .select($"vec_id", $"cell").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      queries.map { qid =>
        val qv = all(qid)
        val cells = cents
          .map { case (id, c) => (cosLocal(c, qv), id) }
          .sortBy { case (sim, id) => (-sim, id) }
          .take(Similarity.NProbe).map(_._2).toSet
        val top = all.toSeq.filter(_._1 != qid)
          .map { case (id, v) =>
            (id, BigDecimal(cosLocal(v, qv)).setScale(3, BigDecimal.RoundingMode.HALF_UP))
          }
          .sortBy { case (id, sim) => (-sim, id) }
          .take(Similarity.K).map(_._1)
        top.count(t => cells.contains(asg(t))).toDouble
      }.sum / queries.length
    }
    val seeds = meanRecall(Similarity.trainCentroids(e, iters = 0))
    val trained = meanRecall(Similarity.trainCentroids(e,
      iters = Similarity.TrainIters, sampleMod = Similarity.TrainSampleMod))
    assert(trained >= seeds,
      s"training lost recall: seeds $seeds -> trained $trained (panel mean @10)")
  }
}
