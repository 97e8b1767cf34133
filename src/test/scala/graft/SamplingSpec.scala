package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sampling-operator invariants: split determinism + proportion sanity,
  * exact per-stratum quotas, non-vacuous correlated-share output. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("hash split: deterministic, total, and near the 80/10/10 design") {
    val a = run("q50_hash_split").collect()
    val b = run("q50_hash_split").collect()
    assert(a.toSeq === b.toSeq) // re-run stability (no rand() anywhere)
    val byName = a.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    val n = a.length.toDouble
    assert(byName.keySet === Set("train", "valid", "test"))
    // hash buckets approximate the design proportions; wide tolerance
    // because sf0.001 has few documents
    assert(byName("train") / n > 0.6 && byName("train") / n < 0.95)
    assert(byName("valid") + byName("test") > 0)
  }

  test("stratified sample: exact quota per stratum, ranks contiguous") {
    val rows = run("q51_stratified_sample").collect()
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (lang, rs) =>
      assert(rs.length <= graft.operators.Sampling.QuotaPerStratum, lang)
      assert(rs.map(_.getInt(2)).sorted.toSeq === (1 to rs.length).toSeq, lang)
    }
  }

  test("Misra-Gries sketch: frequent values survive partial aggregation") {
    import spark.implicits._
    // N = 2000, k = 16 → every value with freq > N/k = 125 is guaranteed
    val data = Seq.fill(1000)("alpha") ++ Seq.fill(500)("beta") ++
      (1 to 100).flatMap(i => Seq.fill(5)(s"noise$i"))
    val df = new scala.util.Random(11).shuffle(data).toDF("tok").repartition(8)
    val cands = df
      .agg(graft.functions.HeavyHitters.candidates($"tok", 16).as("c"))
      .head().getSeq[String](0)
    assert(cands.size <= 16)
    assert(cands.contains("alpha") && cands.contains("beta"))
  }

  test("heavy tokens: two-pass sketch plan equals exact group-by") {
    import spark.implicits._
    val got = run("q53_heavy_tokens").collect().map(r => (r.getString(0), r.getLong(1)))
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.trim($"text")), "\\s+")).as("tok"))
    val n = toks.count()
    val exact = toks.groupBy($"tok").count()
      .filter($"count" * 1000L >= n * graft.operators.TextOps.HeavyPerMille)
      .orderBy($"tok")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === exact.toSeq)
    assert(got.nonEmpty)
  }

  test("supplier share: non-vacuous and share bound holds") {
    import spark.implicits._
    val out = run("q52_supplier_share").collect()
    assert(out.nonEmpty)
    // every reported supplier genuinely exceeds the 20% share on some part
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val pair = li.groupBy($"l_partkey", $"l_suppkey")
      .agg(org.apache.spark.sql.functions.sum($"l_quantity").as("q"))
    val tot = li.groupBy($"l_partkey".as("p"))
      .agg(org.apache.spark.sql.functions.sum($"l_quantity").as("t"))
    val suppliers = pair.join(tot, $"l_partkey" === $"p")
      .filter($"q" * 5 > $"t")
      .select($"l_suppkey").distinct().as[Long].collect().toSet
    assert(out.map(_.getLong(0)).toSet === suppliers)
  }

  test("temperature mixing: quotas ≡ independent sqrt walk; smoothing premise holds") {
    import graft.operators.Sampling
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, dir, "documents")
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent quota walk: one IEEE sqrt per language, exact-decimal
    // total (mirrors the operator's decimal-cast sum), floor-half-up
    val tw = counts.values.toSeq.sorted
      .map(n => BigDecimal(math.sqrt(n.toDouble)).setScale(12, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    val wantQuota = counts.map { case (l, n) =>
      l -> math.max(1L, math.floor(Sampling.MixBudget * math.sqrt(n.toDouble) / tw + 0.5).toLong)
    }
    val out = run("q137_temperature_mixing").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val gotQuota = out.map(r => r._1 -> r._4).toMap
    assert(gotQuota === wantQuota)
    // per-language admitted counts = min(quota, n), ranks contiguous
    out.groupBy(_._1).foreach { case (l, picks) =>
      assert(picks.length.toLong === math.min(wantQuota(l), counts(l)), s"lang $l size")
      assert(picks.map(_._2).sorted.toSeq == (1 to picks.length), s"lang $l ranks")
    }
    // the operator's premise: α = 1/2 DOWN-weights the largest language
    // vs proportional sampling and UP-weights the smallest
    val total = counts.values.sum.toDouble
    val (maxL, minL) = (counts.maxBy(_._2)._1, counts.minBy(_._2)._1)
    assert(wantQuota(maxL) < Sampling.MixBudget * counts(maxL) / total,
      s"largest language $maxL not down-weighted")
    assert(wantQuota(minL) > Sampling.MixBudget * counts(minL) / total,
      s"smallest language $minL not up-weighted")
  }
}
