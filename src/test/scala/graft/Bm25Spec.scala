package graft

import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 (q75) against the TF-IDF skeleton (q68) it extends: on planted
  * rare keywords the two rankers must agree (the keyword is the top term
  * for exactly the docs that contain it), and where they are DESIGNED to
  * differ — tf saturation, document-length normalization — BM25 must show
  * the textbook behavior. */
class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val filler = Vector("the", "data", "spark", "table", "row", "scan")

  private def mkDocs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, text) => (id, "spec", text) }.toDF("doc_id", "source", "text")
  }

  /** Deterministic filler text of n words. */
  private def fill(n: Int, seed: Int): String =
    (0 until n).map(i => filler((i * 7 + seed) % filler.size)).mkString(" ")

  test("planted rare keyword: BM25 and TF-IDF both rank it top-1 for exactly its docs") {
    // 40 filler docs + 5 docs that also carry 'xylophone' twice (df = 5 of
    // 45): high idf under both weightings → rank 1 under both
    val planted = (0L until 5L).map(i => i -> (fill(30, i.toInt) + " xylophone xylophone"))
    val noise = (5L until 45L).map(i => i -> fill(30 + (i % 11).toInt, i.toInt))
    val docs = mkDocs(planted ++ noise)
    val toks = TextOps.tokensOf(docs)

    val bmTop1 = TextOps.bm25TopTerms(toks, topK = 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // the q68 rational TF-IDF ranking, computed inline over the same toks
    val tf = toks.select(col("doc_id"), explode(col("ws")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy((col("tf") * n / col("df")).desc, col("term"))
    val tfidfTop1 = tf.join(df, "term")
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("term")).toMap

    for (id <- 0L until 5L) {
      assert(bmTop1(id) === "xylophone", s"doc $id BM25 top-1")
      assert(tfidfTop1(id) === "xylophone", s"doc $id TF-IDF top-1")
    }
    for (id <- 5L until 45L) {
      assert(bmTop1(id) !== "xylophone")
      assert(tfidfTop1(id) !== "xylophone")
    }
  }

  test("tf saturation: BM25 prefers a moderately-rare term over a 60×-repeated ubiquitous one where TF-IDF does not") {
    // 'common' appears in every doc (idf → 0 under BM25's damped form);
    // the probe doc repeats it 60×. 'rare' appears in half the docs, twice
    // in the probe doc. Rational TF-IDF: common scores 60·(N/N) = 60 vs
    // rare 2·(N/(N/2)) = 4 → common wins. BM25's ln-damped idf ≈ 0.01 and
    // tf ceiling 2.2 cap common at ~0.03, far below rare (~0.9).
    val n = 40
    val probe = 0L -> (Seq.fill(60)("common").mkString(" ") + " rare rare " + fill(20, 3))
    val rest = (1L until n.toLong).map { i =>
      val rare = if (i % 2 == 0) " rare" else ""
      i -> (s"common$rare " + fill(25, i.toInt))
    }
    val toks = TextOps.tokensOf(mkDocs(probe +: rest))

    val bmTop1 = TextOps.bm25TopTerms(toks, topK = 1)
      .filter(col("doc_id") === 0L).collect().head.getString(2)
    assert(bmTop1 === "rare", "BM25 must saturate the repeated ubiquitous term")

    val tf = toks.select(col("doc_id"), explode(col("ws")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy((col("tf") * n / col("df")).desc, col("term"))
    val tfidfTop1 = tf.join(df, "term")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && col("doc_id") === 0L)
      .collect().head.getAs[String]("term")
    assert(tfidfTop1 === "common", "raw TF-IDF is expected to be misled here")
  }

  test("length normalization: same tf scores higher in the shorter document") {
    val docs = mkDocs(Seq(
      0L -> ("needle needle " + fill(10, 1)),
      1L -> ("needle needle " + fill(90, 2))) ++
      (2L until 20L).map(i => i -> fill(40, i.toInt)))
    val scores = TextOps.bm25TopTerms(TextOps.tokensOf(docs), topK = 3)
      .filter(col("term") === "needle")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scores(0L) > scores(1L),
      s"short-doc needle ${scores.get(0L)} must outscore long-doc ${scores.get(1L)}")
  }
}
