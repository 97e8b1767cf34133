package graft

import graft.operators.GraphQueries
import graft.streaming.SsspStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The maintained distance table must equal batch q79 over the union
  * edge set under ANY batch split — including splits where LATE edges
  * SHORTEN distances the store already served (the maintenance path:
  * monotone incremental relaxation, no recompute). Replay must converge;
  * compaction must preserve the snapshot. */
class SsspStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def pairs: DataFrame = {
    import spark.implicits._
    Tables.t(spark, dir, "lineitem")
      .select($"l_partkey".cast("long").as("p"), $"l_suppkey".cast("long").as("su"))
      .distinct()
      .select(($"p" * 2).as("src"), ($"su" * 2 + 1).as("dst"),
        (lit(1L) + ($"p" * 3 + $"su" * 5) % 7).as("w"))
  }

  private lazy val source: Long = {
    import spark.implicits._
    2L * Tables.t(spark, dir, "lineitem")
      .agg(min($"l_suppkey".cast("long"))).head().getLong(0) + 1L
  }

  private def batchWant: Map[Long, Long] =
    SparkEntry.queries("q79_graph_scale_sssp")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def snapshotOf(store: String): Map[Long, Long] =
    SsspStream.snapshot(spark, store).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def ingest(slices: Seq[DataFrame]): String = {
    val store = java.nio.file.Files.createTempDirectory("ssspstream").toString + "/store"
    slices.zipWithIndex.foreach { case (sl, i) =>
      SsspStream.processBatch(sl, i.toLong, store, source, GraphQueries.ScaleSsspBudget)
    }
    store
  }

  test("streamed distances ≡ batch q79; late edges shorten served distances") {
    import spark.implicits._
    val e = pairs.cache()
    val want = batchWant
    val store = java.nio.file.Files.createTempDirectory("ssspimprove").toString + "/store"
    SsspStream.processBatch(e.filter(expr("(dst div 2) % 3 = 0")), 0L, store,
      source, GraphQueries.ScaleSsspBudget)
    val after0 = snapshotOf(store)
    SsspStream.processBatch(e.filter(expr("(dst div 2) % 3 = 1")), 1L, store,
      source, GraphQueries.ScaleSsspBudget)
    SsspStream.processBatch(e.filter(expr("(dst div 2) % 3 = 2")), 2L, store,
      source, GraphQueries.ScaleSsspBudget)
    val finalSnap = snapshotOf(store)
    assert(finalSnap === want, "supplier-split stream diverged from batch q79")
    // non-vacuity: maintenance, not append — some node served after batch
    // 0 must end up STRICTLY CLOSER once the later edges arrive
    val shortened = after0.count { case (n, d) => want.get(n).exists(_ < d) }
    assert(shortened > 0, "no served distance improved by later batches — monotone path unexercised")
  }

  test("split by part, two batches — different improvement cascade") {
    import spark.implicits._
    val e = pairs.cache()
    val store = ingest(Seq(
      e.filter(expr("(src div 2) % 2 = 1")),
      e.filter(expr("(src div 2) % 2 = 0"))))
    assert(snapshotOf(store) === batchWant, "part-split stream diverged from batch q79")
  }

  test("compaction preserves the snapshot; replay is a no-op") {
    import spark.implicits._
    val e = pairs.cache()
    val want = batchWant
    val store = ingest(Seq(
      e.filter(expr("(dst div 2) % 2 = 0")),
      e.filter(expr("(dst div 2) % 2 = 1"))))
    assert(snapshotOf(store) === want, "two-batch snapshot diverged")
    SsspStream.compact(spark, store, throughBatch = 1L)
    assert(snapshotOf(store) === want, "compaction changed the snapshot")
    def dirs(sub: String) = new java.io.File(s"$store/$sub").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(dirs("edges") === Set("batch=-1"), s"edges dirs: ${dirs("edges")}")
    assert(dirs("dists") === Set("batch=-1"), s"dists dirs: ${dirs("dists")}")
    // redelivery after compaction: relaxation from a complete table finds
    // no improvements and writes nothing
    SsspStream.processBatch(e.filter(expr("(dst div 2) % 2 = 0")), 0L, store,
      source, GraphQueries.ScaleSsspBudget)
    assert(snapshotOf(store) === want, "post-compaction redelivery broke the snapshot")
  }

  test("negative-weight edges are dropped at ingest (precondition enforced)") {
    import spark.implicits._
    val e = pairs.cache()
    val want = batchWant
    // poison rows: negative weights between real endpoints — if ingested
    // they would lower served distances below the batch oracle
    val poison = e.limit(5).select($"src", $"dst", ($"w" * -10).as("w"))
    val store = ingest(Seq(e.union(poison)))
    assert(snapshotOf(store) === want,
      "negative-weight rows must be filtered, not relaxed into the store")
  }
}
