package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Lloyd-trained IVF index: training must not degrade the spherical
  * k-means objective, and the trained partition-pruned index must reach
  * recall@10 ≥ 9/10 against the exact brute-force baseline. */
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
    val trained = Similarity.trainCentroids(e, iters = 5)
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
    val cents = Similarity.buildTrainedIvfIndex(e, idxDir, iters = 5)
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
}
