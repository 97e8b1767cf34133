package graft

import graft.functions.HashFamily
import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Oracle (md5, DuckDB-checkable) and Fast (xxhash64, production)
  * hash families to each other: wherever verification is an exact metric
  * over the raw data the verified output must be identical, and wherever
  * the sketch itself is the metric the Fast family must still find the
  * planted near-duplicates. */
class HashFamilySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("hash63: both families are non-negative, deterministic, and distinct streams") {
    import spark.implicits._
    val df = spark.range(1000).select($"id".cast("string").as("s"))
      .select(
        HashFamily.Oracle.hash63(col("s")).as("o"),
        HashFamily.Fast.hash63(col("s")).as("f"))
      .cache()
    assert(df.filter($"o" < 0L || $"f" < 0L).count() === 0L)
    // 1000 distinct inputs → 1000 distinct hashes in each family (63-bit
    // space; a collision here would mean a broken derivation, not bad luck)
    assert(df.select($"o").distinct().count() === 1000L)
    assert(df.select($"f").distinct().count() === 1000L)
    // and the families are genuinely different functions
    assert(df.filter($"o" === $"f").count() === 0L)
  }

  test("minhash permutations are independent: signature agreement ≈ jaccard, not 0-or-64") {
    import graft.functions.MinHashParams
    import spark.implicits._
    // constants in range and distinct across k
    val as = (0 until Dedup.MinHashPerms).map(MinHashParams.a)
    val bs = (0 until Dedup.MinHashPerms).map(MinHashParams.b)
    assert(as.forall(a => a >= 1 && a < MinHashParams.P))
    assert(bs.forall(b => b >= 0 && b < MinHashParams.P))
    assert(as.distinct.size === as.size)
    // two sets with jaccard exactly 1/3 (|A∩B| = 50, |A∪B| = 150): each
    // permutation agrees independently with probability ≈ 1/3, so the
    // agreement count is Binomial(64, 1/3) — well inside [8, 36] (±5σ).
    // A degenerate family (all permutations sharing one argmin, the
    // failure mode of additive h1 + k·h2 bases) lands at 0 or 64 instead.
    for (fam <- Seq(HashFamily.Oracle, HashFamily.Fast)) {
      val docs = Seq(
        (1L, (1 to 100).map(i => s"tok$i")),
        (2L, (51 to 150).map(i => s"tok$i")),
      ).toDF("doc_id", "sh")
      val sig = Dedup.minhashSignatures(docs, fam).orderBy($"doc_id").collect()
      val s1 = sig(0).getSeq[Long](1)
      val s2 = sig(1).getSeq[Long](1)
      val agree = s1.zip(s2).count { case (x, y) => x == y }
      assert(agree >= 8 && agree <= 36, s"$fam: agreement $agree/64 outside Binomial(64, 1/3) range")
    }
  }

  test("minhash LSH: verified pairs identical across families, both equal exact Jaccard") {
    val exact = SparkEntry.queries("q24_ngram_jaccard_pairs")(spark, dir)
    val oracle = Dedup.minhashLshPairs(spark, dir, HashFamily.Oracle)
    val fast = Dedup.minhashLshPairs(spark, dir, HashFamily.Fast)
    assert(oracle.exceptAll(fast).count() === 0L)
    assert(fast.exceptAll(oracle).count() === 0L)
    // recall 1.0 on this corpus: LSH output (either family) == exact pair set
    assert(fast.exceptAll(exact).count() === 0L)
    assert(exact.exceptAll(fast).count() === 0L)
    assert(exact.count() >= 20L)
  }

  test("simhash Fast family finds the planted near-identical pair") {
    val pairs = Dedup.simhashPairs(spark, dir, HashFamily.Fast).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Number](2).intValue <= Dedup.HammingRadius))
    // doc 0 and 82 share near-identical text (jaccard 0.95) — a valid
    // 64-bit simhash of ANY family puts them within the radius
    assert(pairs.exists(r => r.getLong(0) === 0L && r.getLong(1) === 82L))
  }

  test("q57 gate soundness: LSH candidate recall == 1.0 vs the exact pair set, both families, registered scales") {
    // q57 registers the Fast-LSH output against the EXACT Jaccard oracle
    // (q24's SQL); that equality is sound ⇔ every exact pair is an LSH
    // candidate (the verify step then recomputes true Jaccard). This pins
    // the recall-is-1.0 premise crisply at the corpus scales the harness
    // gates, so a corpus/parameter change that loses a pair fails HERE
    // with a named pair instead of flaking q57's hash compare.
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01");
         family <- Seq(HashFamily.Oracle, HashFamily.Fast)) {
      val exact = Dedup.ngramJaccardPairs(spark, d).select(col("doc_a"), col("doc_b"))
      val cands = Dedup.lshCandidates(Dedup.docBands(spark, d, family)).cache()
      val nCand = cands.count()
      val missed = exact.exceptAll(cands).collect()
      assert(missed.isEmpty,
        s"$d/$family: LSH missed exact pairs (of $nCand candidates): " +
          missed.take(5).mkString(", "))
      val nExact = exact.count()
      assert(nExact > 0L, s"$d: exact pair set empty — recall assertion vacuous")
      info(s"$d ${family.getClass.getSimpleName}: $nCand candidates cover all $nExact exact pairs")
      cands.unpersist()
    }
  }

  test("hash split under Fast family: deterministic, near-80/10/10, stable under growth") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val split = Sampling.hashSplit(docs, $"doc_id", HashFamily.Fast).cache()
    val n = split.count().toDouble
    val frac = split.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.06, frac.toString)
    assert(math.abs(frac("valid") - 0.1) < 0.05, frac.toString)
    // growth stability: splitting a subset assigns each doc the same split
    val sub = Sampling.hashSplit(docs.limit(100), $"doc_id", HashFamily.Fast)
    assert(sub.join(split.withColumnRenamed("split", "full_split"), "doc_id")
      .filter($"split" =!= $"full_split").count() === 0L)
  }
}
