package graft

import graft.functions.HashFamily
import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q133 (bigram-LM perplexity) and q134 (DSIR importance weights)
  * against INDEPENDENT driver-side walks — plain Scala maps and doubles,
  * none of the engine's join/aggregate machinery — plus the operators'
  * scale-shape plan contracts and the DSIR separation premise the
  * operator exists to deliver (target-slice docs must outscore the
  * rest). Exactness vs DuckDB is the oracle rows' job; these pin
  * SEMANTICS and PLAN SHAPE.
  */
class TextLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val docs: Seq[(Long, String, Array[String])] =
    Tables.t(spark, dir, "documents").select("doc_id", "lang", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.split("\\s+")))
      .toSeq

  test("q133 ≡ independent bigram-LM walk (n exact, logppl within 1e-6)") {
    val bigrams = docs.map { case (id, _, ws) =>
      id -> ws.sliding(2).filter(_.length == 2).map(a => (a(0), a(1))).toSeq
    }.filter(_._2.nonEmpty)
    val cb = bigrams.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cu = bigrams.flatMap(_._2).groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val v = docs.flatMap(_._3).distinct.size.toDouble
    val want = bigrams.map { case (id, bs) =>
      val s = bs.map { b => math.log((cb(b) + 1.0) / (cu(b._1) + v)) }.sum
      id -> ((bs.length.toLong, -s / bs.length))
    }.toMap
    val got = TextOps.bigramLmScores(TextOps.docTokens(spark, dir)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (n, p)) =>
      assert(n == want(id)._1, s"doc $id n_bigrams")
      assert(math.abs(p - want(id)._2) <= 1e-6, s"doc $id logppl $p vs ${want(id)._2}")
    }
  }

  /** The Oracle family's md5 hash63 reimplemented from the published
    * arithmetic (first/second 8 hex chars of md5), independent of both
    * the Column expression and the SQL string. */
  private def hash63(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2147483648L) * 4294967296L +
      java.lang.Long.parseLong(hex.substring(8, 16), 16)
  }

  test("q134 ≡ independent DSIR walk; target slice separates from every other lang") {
    val B = TextOps.DsirBuckets
    val feats = docs.map { case (id, lang, ws) =>
      val grams = ws.toSeq ++ ws.sliding(2).filter(_.length == 2).map(a => s"${a(0)} ${a(1)}")
      (id, lang == TextOps.DsirTargetLang,
        grams.map(g => hash63(g) % B).groupBy(identity)
          .map { case (f, v) => f -> v.size.toLong })
    }
    val ct = feats.filter(_._2).flatMap(_._3).groupBy(_._1)
      .map { case (f, v) => f -> v.map(_._2).sum }
    val cr = feats.flatMap(_._3).groupBy(_._1).map { case (f, v) => f -> v.map(_._2).sum }
    val nt = ct.values.sum.toDouble
    val nr = cr.values.sum.toDouble
    val want = feats.map { case (id, _, fc) =>
      val s = fc.map { case (f, c) =>
        c * (math.log((ct.getOrElse(f, 0L) + 1.0) / (nt + B)) -
          math.log((cr(f) + 1.0) / (nr + B)))
      }.sum
      id -> ((fc.values.sum, s))
    }.toMap
    val got = {
      import spark.implicits._
      TextOps.dsirWeights(TextOps.docTokens(spark, dir)
          .join(Tables.t(spark, dir, "documents").select($"doc_id", $"lang"), "doc_id"),
        HashFamily.Oracle).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    }
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (n, w)) =>
      assert(n == want(id)._1, s"doc $id n_feats")
      assert(math.abs(w - want(id)._2) <= 1e-6, s"doc $id logw $w vs ${want(id)._2}")
    }
    // the operator's premise: target-language docs carry higher importance
    // weight than every other language slice, by a real margin
    val byLang = docs.map { case (id, lang, _) => lang -> got(id)._2 }
      .groupBy(_._1).map { case (l, v) => l -> v.map(_._2).sum / v.size }
    val en = byLang(TextOps.DsirTargetLang)
    (byLang - TextOps.DsirTargetLang).foreach { case (l, m) =>
      assert(en > m + 1.0, s"target mean $en does not separate from $l mean $m")
    }
  }

  test("plan shape: no Window anywhere; q134's bucket-table joins broadcast") {
    import spark.implicits._
    val q133 = TextOps.bigramLmScores(TextOps.docTokens(spark, dir))
    val q134 = TextOps.dsirWeights(TextOps.docTokens(spark, dir)
        .join(Tables.t(spark, dir, "documents").select($"doc_id", $"lang"), "doc_id"),
      HashFamily.Oracle)
    Seq("q133" -> q133, "q134" -> q134).foreach { case (n, df) =>
      df.collect() // AQE: final plan
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$n grew a Window — the family is hash-aggregate-only by design")
      // the doc-feature aggregate is CUT (localCheckpoint) before its
      // three consumers — uncut, Catalyst re-derives tokenize+explode+
      // aggregate from a separate corpus scan per consumer
      assert(plan.contains("ExistingRDD"),
        s"$n lost the plan cut — each aggregate consumer re-scans the corpus")
    }
    // ct/cr are ≤ DsirBuckets rows by construction — broadcast at any SF
    val p134 = q134.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p134).size >= 2,
      "q134's bucket-count joins are not broadcast")
  }
}
