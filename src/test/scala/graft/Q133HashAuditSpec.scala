package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Collision audit for q133's hash-keyed exchanges (round 18): the
  * bigram-LM pipeline groups and joins on xxhash64(bigram) /
  * xxhash64(token) instead of the strings, which computes the identical
  * result exactly when the hash is injective on the corpus' bigram and
  * token sets. The oracle pins that at the gate SFs (sf0.001/sf0.01);
  * this lane pins it at EVERY shipped SF including the bench's sf0.1,
  * where no oracle runs — a collision would show up here as
  * |distinct strings| ≠ |distinct hashes| before it could silently
  * shift a bench-only number. */
class Q133HashAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def audit(dir: String): Unit = {
    import spark.implicits._
    val toks = TextOps.docTokens(spark, dir)
    val bigrams = toks.filter(size($"ws") >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ws)-2), i -> concat_ws(' ', ws[i], ws[i+1]))")).as("bg"))
    val tokens = toks.select(explode($"ws").as("tok"))
    val row = bigrams.agg(
        countDistinct($"bg").as("nbg"),
        countDistinct(xxhash64($"bg")).as("nhbg")).head()
    assert(row.getLong(0) === row.getLong(1),
      s"$dir: bigram hash collision (${row.getLong(0)} strings vs ${row.getLong(1)} hashes)")
    val trow = tokens.agg(
        countDistinct($"tok").as("nt"),
        countDistinct(xxhash64($"tok")).as("nht")).head()
    assert(trow.getLong(0) === trow.getLong(1),
      s"$dir: token hash collision (${trow.getLong(0)} strings vs ${trow.getLong(1)} hashes)")
  }

  test("no bigram/token xxhash64 collisions at sf0.001") { audit("/root/testdata/sf0.001") }
  test("no bigram/token xxhash64 collisions at sf0.01") { audit("/root/testdata/sf0.01") }
  test("no bigram/token xxhash64 collisions at sf0.1 (bench SF)") { audit("/root/testdata/sf0.1") }
}
