package graft

import graft.streaming.HeavyTokenStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming heavy-token monitor's contract is the Misra-Gries
  * guarantee, NOT byte-identity (counts fold — error accumulates across
  * merges but stays ≤ N/k): every token whose total frequency exceeds
  * N/k must be present in the state after any batch split, and residual
  * counts must lower-bound the true counts. Replay of an already-applied
  * batch id must fold NOTHING (the persisted high-water mark makes the
  * counting state replay-idempotent, like DedupStream's partition
  * overwrites). */
class HeavyTokenStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val capacity = 64

  private def docs: DataFrame =
    Tables.t(spark, dir, "documents").select(col("doc_id"), col("text"))

  /** exact token counts of the full corpus. */
  private lazy val exact: Map[String, Long] = {
    import spark.implicits._
    docs.select(explode(split(lower(trim($"text")), "\\s+")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def assertRecall(stateDir: String): Unit = {
    val state = HeavyTokenStream.candidates(spark, stateDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = state.head._3
    assert(total === exact.values.sum, "token total must be exact")
    val present = state.map(_._1).toSet
    val threshold = total / capacity
    val heavy = exact.filter(_._2 > threshold)
    assert(heavy.nonEmpty, "no heavy tokens at this capacity — vacuous")
    val missed = heavy.keySet -- present
    assert(missed.isEmpty, s"missed heavy tokens (freq > $threshold): $missed")
    // residuals never exceed the true counts
    state.foreach { case (tok, residual, _) =>
      assert(residual <= exact.getOrElse(tok, 0L),
        s"residual for $tok exceeds its true count")
    }
  }

  test("recall of all > N/k tokens under two different batch splits") {
    import spark.implicits._
    for (splits <- Seq(
        Seq(docs.filter($"doc_id" % 2 === 0), docs.filter($"doc_id" % 2 === 1)),
        Seq(docs.filter($"doc_id" >= 400), docs.filter($"doc_id" < 100),
          docs.filter($"doc_id" >= 100 && $"doc_id" < 400)))) {
      val state = java.nio.file.Files.createTempDirectory("heavystream").toString + "/state"
      splits.zipWithIndex.foreach { case (b, id) =>
        HeavyTokenStream.processBatch(spark, b, id.toLong, state, capacity)
      }
      assertRecall(state)
    }
  }

  test("file-source wiring folds arriving files into the state") {
    val src = java.nio.file.Files.createTempDirectory("heavysrc").toString
    val state = java.nio.file.Files.createTempDirectory("heavystream2").toString + "/state"
    docs.write.mode("append").parquet(src)
    val q = HeavyTokenStream.start(spark, src, state, capacity)
    q.awaitTermination()
    assertRecall(state)
  }

  test("restarted query over the same stateDir folds NEW files (durable checkpoint)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("heavyrestart").toString
    val (src, state) = (s"$root/src", s"$root/state")
    docs.filter($"doc_id" < 250).write.mode("append").parquet(src)
    HeavyTokenStream.start(spark, src, state, capacity).awaitTermination()
    val t1 = HeavyTokenStream.candidates(spark, state).collect().head.getLong(2)
    // a SECOND query lifetime over the same dirs: with a temp checkpoint
    // the new files would land at batch 0 ≤ the persisted mark and be
    // silently dropped; the durable checkpoint resumes the id sequence
    docs.filter($"doc_id" >= 250).write.mode("append").parquet(src)
    HeavyTokenStream.start(spark, src, state, capacity).awaitTermination()
    val t2 = HeavyTokenStream.candidates(spark, state).collect().head.getLong(2)
    assert(t2 === exact.values.sum,
      "restart dropped the new files — checkpoint did not resume the id sequence")
    assert(t2 > t1, "second lifetime folded nothing")
    assertRecall(state)
  }

  test("replay of an applied batch id is a no-op; a NEW id folds") {
    import spark.implicits._
    val state = java.nio.file.Files.createTempDirectory("heavystream3").toString + "/state"
    val b = docs.filter($"doc_id" < 250)
    HeavyTokenStream.processBatch(spark, b, 0L, state, capacity)
    val t1 = HeavyTokenStream.candidates(spark, state).collect().head.getLong(2)
    // same id again (redelivery) and a stale lower id: both skipped
    HeavyTokenStream.processBatch(spark, b, 0L, state, capacity)
    HeavyTokenStream.processBatch(spark, b, -1L, state, capacity)
    val t2 = HeavyTokenStream.candidates(spark, state).collect().head.getLong(2)
    assert(t2 === t1, "replayed batch ids must fold nothing into the counting state")
    // a genuinely new batch id still folds (the mark advances, not freezes)
    HeavyTokenStream.processBatch(spark, b, 1L, state, capacity)
    val t3 = HeavyTokenStream.candidates(spark, state).collect().head.getLong(2)
    assert(t3 === 2 * t1, "a new batch id must fold its counts")
  }
}
