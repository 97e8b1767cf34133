package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q111's subword tokenizer against an INDEPENDENT driver-side greedy
  * walk: the vocab's structure (base chars 1..36, learned grams 37..,
  * lengths 2..4), exact token-count equality with a plain-Scala greedy
  * longest-match over the collected distinct words, a round-trip
  * (detokenized ids re-concatenate to every word), and non-vacuity —
  * learned grams must actually win over the single-char fallback. */
class TokenizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val vocab: Seq[(String, Long)] = TextOps.subwordVocab(spark, dir)
  private lazy val byTok: Map[String, Long] = vocab.toMap

  /** Independent greedy longest-match — imperative, no Spark. */
  private def tokenize(w: String): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    var i = 0
    while (i < w.length) {
      val l = (TextOps.SubMaxLen to 1 by -1)
        .find(l => i + l <= w.length && byTok.contains(w.substring(i, i + l)))
        .getOrElse(sys.error(s"no match at $i in '$w'"))
      out += byTok(w.substring(i, i + l))
      i += l
    }
    out.result()
  }

  private lazy val words: Seq[(String, Long)] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  test("vocab structure: 36 base chars at ids 1..36, K grams of length 2..4, all distinct") {
    val (base, grams) = vocab.partition(_._2 <= 36)
    assert(base.map(_._1) == "0123456789abcdefghijklmnopqrstuvwxyz".map(_.toString))
    assert(base.map(_._2) == (1L to 36L))
    assert(grams.length == TextOps.SubGramK)
    assert(grams.map(_._2) == (37L until 37L + TextOps.SubGramK))
    assert(grams.forall { case (g, _) =>
      g.length >= 2 && g.length <= TextOps.SubMaxLen &&
        g.forall(c => c.isDigit || (c >= 'a' && c <= 'z')) })
    assert(vocab.map(_._1).distinct.length == vocab.length)
  }

  test("q111 equals an independent driver-side greedy tokenization of the corpus") {
    val got = SparkEntry.queries("q111_subword_tokens")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == vocab.map(_._2), "one row per vocab id, ordered")
    assert(got.forall { case (id, tok, _) => byTok(tok) == id })
    val want = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    words.foreach { case (w, cnt) =>
      tokenize(w).foreach(id => want(id) += cnt) }
    got.foreach { case (id, tok, n) =>
      assert(n == want(id), s"id $id ('$tok'): got $n, want ${want(id)}") }
    // non-vacuity: learned grams genuinely win over the char fallback
    assert(got.exists { case (id, _, n) => id > 36 && n > 0 },
      "no learned gram was ever used — greedy path vacuous")
    val totalChars = words.map { case (w, c) => w.length * c }.sum
    val totalToks = got.map(_._3).sum
    assert(totalToks < totalChars,
      "token count equals char count — subword merging never happened")
  }

  test("q115 packing conserves exactly the corpus token count q111 reports") {
    import spark.implicits._
    // both derive from the same learned vocab and greedy walk, one over
    // the distinct-word relation weighted by counts, one folded per
    // document — their totals must be the same number
    val q111n = SparkEntry.queries("q111_subword_tokens")(spark, dir)
      .agg(sum($"n")).head().getLong(0)
    val q115n = SparkEntry.queries("q115_subword_packing")(spark, dir)
      .agg(sum($"n_tokens")).head().getLong(0)
    assert(q111n > 0, "corpus tokenized to zero tokens — vacuous")
    assert(q115n === q111n,
      s"packing counted $q115n tokens, the inventory counted $q111n")
  }

  test("q115's per-doc token counts: fold variant ≡ join variant (the A/B premise)") {
    // the serving path is the measured winner (join, Q115AB_r16.json);
    // the fold stays as the scan-local fallback shape and must keep
    // computing the same manifest
    val a = graft.operators.TextOps.docSubwordToksFold(spark, dir)
      .collect().map(_.toString).sorted
    val b = graft.operators.TextOps.docSubwordToksJoin(spark, dir)
      .collect().map(_.toString).sorted
    assert(a.nonEmpty, "no documents tokenized — vacuous")
    assert(a.sameElements(b), "fold and join token counts diverged")
  }

  test("round-trip: tokenized ids re-concatenate to every distinct word (Spark side)") {
    import spark.implicits._
    val byId = vocab.map { case (t, id) => (id, t) }
    val rev = map(byId.flatMap { case (id, t) => Seq(lit(id), lit(t)) }: _*)
    val bad = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))).as("w"))
      .distinct()
      .withColumn("rt", concat_ws("",
        transform(TextOps.subwordIds($"w", vocab), id => element_at(rev, id))))
      .filter($"rt" =!= $"w")
    assert(bad.count() == 0, s"round-trip failures: ${bad.take(5).mkString(", ")}")
  }
}
