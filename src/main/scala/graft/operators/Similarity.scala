package graft.operators

import graft.GQuery
import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  *  - q27: exact brute-force cosine top-k for one query vector — the
  *    baseline every ANN variant is measured against. One scan, no shuffle
  *    of the corpus, ranking via TakeOrdered semantics.
  *  - q28: LSH-bucketed ANN (random-hyperplane signatures, multi-probe on
  *    1-bit flips) — the scale path: candidate set is a bucket join, not a
  *    corpus scan. Approximate → rows-only check; the spec asserts overlap
  *    vs q27.
  *  - q29: embedding near-duplicate pairs (cosine ≥ 0.98) via the same LSH
  *    buckets — all-pairs only within buckets.
  *
  * All dot products run in double precision over `array<double>` casts:
  * float×float promoted per-element, sequential left-fold sum — bit-stable
  * and matched by the DuckDB oracle's list_cosine_similarity on DOUBLE[].
  */
object Similarity {

  val K = 10
  val QueryVecId = 0L

  /** Cosine similarity between two array<double> columns — native fused
    * Catalyst expression (codegen'd single loop, no intermediate arrays). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine(a, b)

  /** Higher-order-function formulation (identical fold order and results);
    * kept for the spec that proves the native expression matches it. */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (u, v) => u * v), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def embeddings(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))

  /** q27 — brute-force exact top-k neighbors of vector 0 (excluded itself).
    * Rounded to 3 dp for cross-engine rank stability; ties broken by id. */
  private def q27(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = embeddings(s, dir)
    val q = emb.filter($"vec_id" === QueryVecId)
      .select($"vec".as("qvec"))
    val topk = emb.filter($"vec_id" =!= QueryVecId)
      .crossJoin(broadcast(q))
      .select($"vec_id", round(cosine($"vec", $"qvec"), 3).as("sim"))
      .orderBy($"sim".desc, $"vec_id")
      .limit(K) // TakeOrderedAndProject: per-partition top-k, no global sort
    // rank assignment runs over just K rows, so the unpartitioned window is
    // not a scale bottleneck
    topk.withColumn("rank", row_number().over(Window.orderBy($"sim".desc, $"vec_id")))
      .select($"rank", $"vec_id", $"sim")
      .orderBy($"rank")
  }

  private val q27Sql =
    s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = $QueryVecId),
       |sims AS (SELECT e.vec_id,
       |    ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qvec), 3) AS sim
       |  FROM embeddings e, q WHERE e.vec_id <> $QueryVecId),
       |ranked AS (SELECT vec_id, sim,
       |    ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS rank FROM sims)
       |SELECT rank, vec_id, sim FROM ranked WHERE rank <= $K ORDER BY rank""".stripMargin

  val Planes = 12

  /** Deterministic random hyperplanes: coefficient (p, d) from a seeded
    * xorshift-mixed hash — reproducible across runs and engines. */
  private def planeCoef(p: Int, d: Int): Double = {
    var x = (p.toLong * 1315423911L) ^ (d.toLong * 2654435761L) ^ 0x9E3779B97F4A7C15L
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    // map to (-1, 1)
    (x.toDouble / Long.MaxValue.toDouble)
  }

  /** sig = bit per hyperplane: sign of <vec, plane>. */
  def lshSignature(s: SparkSession, vecCol: Column): Column = {
    val bits: Seq[Column] = (0 until Planes).map { p =>
      val coefs = array((0 until 64).map(d => lit(planeCoef(p, d))): _*)
      val dot = aggregate(zip_with(vecCol, coefs, (u, v) => u * v), lit(0.0), (a, v) => a + v)
      when(dot >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Buckets probed for a signature: itself + all 1-bit flips (multi-probe). */
  private def probes(sig: Column): Column =
    array_union(array(sig), array((0 until Planes).map(p => sig.bitwiseXOR(lit(1L << p))): _*))

  val Centroids = 8
  val NProbe = 3

  /** IVF index: every vector assigned to its nearest centroid; centroids are
    * the first [[Centroids]] corpus vectors by id (deterministic seeding —
    * at scale you'd Lloyd-iterate on a sample, the partitioning stays the
    * same shape). Returns (vec_id, vec, cell). */
  def ivfAssign(emb: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    val cents = emb.filter($"vec_id" < Centroids)
      .select($"vec_id".as("cent_id"), $"vec".as("cvec"))
    emb.crossJoin(broadcast(cents))
      .select($"vec_id", $"vec", $"cent_id", cosine($"vec", $"cvec").as("csim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"csim".desc, $"cent_id")))
      .filter($"rn" === 1)
      .select($"vec_id", $"vec", $"cent_id".as("cell"))
  }

  /** q28 — ANN top-k for vector 0 via IVF: probe the [[NProbe]] centroids
    * nearest to the query, exact re-rank inside the probed cells only (the
    * corpus scan shrinks by ~NProbe/Centroids; at 100 TB cells map to
    * parquet partitions so pruning happens at the scan). */
  private def q28(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = embeddings(s, dir)
    val assigned = ivfAssign(emb).cache()
    val qvec = emb.filter($"vec_id" === QueryVecId).select($"vec".as("qvec"))
    val cents = emb.filter($"vec_id" < Centroids)
      .select($"vec_id".as("cent_id"), $"vec".as("cvec"))
    val probed = cents.crossJoin(broadcast(qvec))
      .select($"cent_id", cosine($"cvec", $"qvec").as("csim"))
      .orderBy($"csim".desc, $"cent_id").limit(NProbe)
      .select($"cent_id".as("cell"))
    val topk = assigned.join(broadcast(probed), "cell")
      .filter($"vec_id" =!= QueryVecId)
      .crossJoin(broadcast(qvec))
      .select($"vec_id", round(cosine($"vec", $"qvec"), 3).as("sim"))
      .orderBy($"sim".desc, $"vec_id")
      .limit(K)
    topk.withColumn("rank", row_number().over(Window.orderBy($"sim".desc, $"vec_id")))
      .select($"rank", $"vec_id", $"sim")
      .orderBy($"rank")
  }

  /** Persisted IVF index: cell assignments written as parquet partitioned
    * BY cell, so probing nprobe cells is a partition-pruned scan — at
    * 100 TB the query reads only probed directories, never the corpus.
    * Build once, query many (the amortization split a real ANN service
    * needs). */
  def buildIvfIndex(emb: DataFrame, indexDir: String): Unit =
    ivfAssign(emb).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(indexDir)

  /** Query a persisted index: nprobe nearest cells → pruned scan → exact
    * re-rank. `cells` are the probed cell ids (from centroid similarity). */
  def queryIvfIndex(s: SparkSession, indexDir: String, qvec: Seq[Double],
      cells: Seq[Long], k: Int = K): DataFrame = {
    import s.implicits._
    val idx = s.read.parquet(indexDir).filter($"cell".isin(cells: _*))
    idx.withColumn("sim", round(cosine($"vec",
        array(qvec.map(lit): _*).cast("array<double>")), 3))
      .orderBy($"sim".desc, $"vec_id")
      .limit(k)
      .select($"vec_id", $"sim")
  }

  /** q29 — embedding near-duplicate pairs (cosine ≥ 0.98): bucket-local
    * all-pairs over LSH signature groups with multi-probe, exact verify. */
  private def q29(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = embeddings(s, dir).withColumn("sig", lshSignature(s, $"vec")).cache()
    val probed = emb.select($"vec_id", $"vec", explode(probes($"sig")).as("bucket"))
    val base = emb.select($"vec_id".as("doc_b"), $"vec".as("vec_b"), $"sig".as("bucket"))
    val cand = probed.join(base, Seq("bucket"))
      .filter($"vec_id" < $"doc_b")
      .select($"vec_id".as("doc_a"), $"doc_b", $"vec".as("vec_a"), $"vec_b")
      .dropDuplicates("doc_a", "doc_b")
    cand.select($"doc_a", $"doc_b", round(cosine($"vec_a", $"vec_b"), 3).as("sim"))
      .filter($"sim" >= 0.98)
      .orderBy($"doc_a", $"doc_b")
  }

  val all: Seq[GQuery] = Seq(
    GQuery("q27_ann_brute_topk", q27, Some(q27Sql), bench = true),
    GQuery("q28_ann_ivf_topk", q28, None, bench = true),
    GQuery("q29_embed_dup_pairs", q29, None),
  )
}
