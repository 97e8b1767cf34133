package graft

import graft.functions.HashFamily
import graft.operators.Dedup
import graft.streaming.{DedupClusterStream, DedupStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The physical-purge contract ([[DedupStream.purgeRetired]]): after a
  * takedown, a purge must remove the retired documents' band and shingle
  * rows from EVERY index file (the GDPR/licensing half the q112 mask
  * defers), preserve the survivors, keep the bands generation bucketed
  * (the probe's co-located join must survive the rewrite), leave the
  * post-purge ingest byte-identical to the masked-index ingest, and
  * converge when re-run over its own previous generation. */
class DedupPurgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs: DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet").select($"doc_id", $"text")
  }
  private def ins(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("text"), lit(1).as("op"))
  private def rm(df: DataFrame): DataFrame =
    df.select(col("doc_id"), lit("").as("text"), lit(-1).as("op"))
  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("dclpurge").toString + "/store"

  private val retireP = col("doc_id") % 5 === 0 && col("doc_id") % 3 =!= 2

  private def retiredRowsIn(store: String): (Long, Long) = {
    val r = docs.filter(retireP).select(col("doc_id"))
    val bands = spark.table(DedupStream.bandsTable(s"$store/index"))
      .join(r, "doc_id").count()
    val sh = spark.read.parquet(s"$store/index/shingles")
      .join(r, "doc_id").count()
    (bands, sh)
  }

  private def snapshotRows(store: String): Seq[String] =
    DedupClusterStream.snapshot(spark, store)
      .orderBy(col("doc_id")).collect().map(_.toString).toSeq

  private def pairRows(store: String): Seq[String] =
    DedupStream.pairs(spark, s"$store/pairs").collect().map(_.toString).toSeq

  private def batchDirs(path: String): Set[String] =
    new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName).toSet

  test("purge drops retired bytes, preserves survivors, and post-purge ingest equals the masked path") {
    val d = docs.cache()
    val (purged, masked) = (tmpStore(), tmpStore())
    for (st <- Seq(purged, masked)) {
      DedupClusterStream.processBatch(spark, ins(d.filter(col("doc_id") % 3 === 0)), 0L, st)
      DedupClusterStream.processBatch(spark, ins(d.filter(col("doc_id") % 3 === 1)), 1L, st)
      DedupClusterStream.processBatch(spark, rm(d.filter(retireP)), 2L, st)
    }
    val (b0, s0) = retiredRowsIn(purged)
    assert(b0 > 0 && s0 > 0, "retired docs left no index rows — purge test vacuous")
    val survivorBands = spark.table(DedupStream.bandsTable(s"$purged/index"))
      .join(d.filter(retireP).select(col("doc_id")), Seq("doc_id"), "left_anti").count()

    DedupClusterStream.purgeRetired(spark, purged, throughBatch = 2L)
    assert(retiredRowsIn(purged) === ((0L, 0L)),
      "retired doc rows still physically present after purge")
    assert(spark.table(DedupStream.bandsTable(s"$purged/index")).count() === survivorBands,
      "purge lost (or duplicated) survivor band rows")
    // the removed store itself folds to one distinct generation — without
    // this, mask reads list one directory per takedown batch ever taken
    assert(batchDirs(s"$purged/removed") === Set("batch=-1"),
      s"removed-store dirs after purge: ${batchDirs(s"$purged/removed")}")
    assert(spark.read.parquet(s"$purged/removed").select(col("doc_id")).distinct().count()
      === docs.filter(retireP).count(),
      "removed-store fold lost (or fabricated) retirements")

    // the late batch probes the PURGED index on one store and the MASKED
    // index on the other — verified pairs and served clusters must match
    val late = ins(d.filter(col("doc_id") % 3 === 2))
    DedupClusterStream.processBatch(spark, late, 3L, purged)
    DedupClusterStream.processBatch(spark, late, 3L, masked)
    assert(pairRows(purged) === pairRows(masked),
      "post-purge probe verified a different pair set than the masked index")
    assert(snapshotRows(purged) === snapshotRows(masked),
      "post-purge served clusters diverged from the masked path")

    // re-run over the previous generation converges: batches fold, the
    // answer and the physical-absence property are unchanged
    val before = snapshotRows(purged)
    DedupClusterStream.purgeRetired(spark, purged, throughBatch = 3L)
    assert(retiredRowsIn(purged) === ((0L, 0L)))
    assert(snapshotRows(purged) === before, "re-purge changed the served table")
    assert(batchDirs(s"$purged/index/bands") === Set("batch=-2"),
      s"bands dirs after second purge: ${batchDirs(s"$purged/index/bands")}")
    assert(batchDirs(s"$purged/index/shingles") === Set("batch=-2"),
      s"shingle dirs after second purge: ${batchDirs(s"$purged/index/shingles")}")
    assert(batchDirs(s"$purged/removed") === Set("batch=-2"),
      s"removed dirs after second purge: ${batchDirs(s"$purged/removed")}")

    // the purged generation must still satisfy the probe join's
    // distribution: only the new batch's band keys may exchange
    val newBands = Dedup.bandsOf(Dedup.shinglesOf(d.filter(col("doc_id") % 3 === 2)),
      HashFamily.Fast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", -1)
    try {
      val probe = DedupStream.probeIndex(spark, newBands, 4L, s"$purged/index")
      assert(graft.store.Bucketing.scanUnexchanged(
        probe, DedupStream.bandsTable(s"$purged/index")),
        "purged generation broke the co-located probe join")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevAqe)
    }
  }

  test("purge on a store that never saw a takedown is a no-op") {
    val d = docs.cache()
    val st = tmpStore()
    DedupClusterStream.processBatch(spark, ins(d.filter(col("doc_id") % 3 === 0)), 0L, st)
    val before = batchDirs(s"$st/index/bands")
    DedupClusterStream.purgeRetired(spark, st, throughBatch = 0L)
    assert(batchDirs(s"$st/index/bands") === before, "no-takedown purge touched the index")
  }
}
