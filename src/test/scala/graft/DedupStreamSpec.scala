package graft

import graft.functions.HashFamily
import graft.operators.Dedup
import graft.streaming.DedupStream
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Stream-ingested corpus must dedup to the BYTE-identical verified pair
  * set a batch rebuild produces, for any batch partitioning and for both
  * hash families. */
class DedupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")

  private def assertSame(got: DataFrame, want: DataFrame): Unit = {
    assert(got.exceptAll(want).count() === 0L,
      "stream produced a pair the batch rebuild does not")
    assert(want.exceptAll(got).count() === 0L,
      "stream missed a pair the batch rebuild finds")
  }

  private def runSliced(slices: Seq[DataFrame], family: HashFamily): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("dedupstream").toString
    val (docsDir, indexDir, pairsDir) = (s"$root/docs", s"$root/index", s"$root/pairs")
    new java.io.File(docsDir).mkdirs()
    slices.zipWithIndex.foreach { case (s, i) =>
      s.coalesce(1).write.parquet(s"$docsDir/slice_$i")
      // file source discovers files recursively per glob; flatten instead
      val part = new java.io.File(s"$docsDir/slice_$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$docsDir/doc_$i.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$docsDir/slice_$i"))
    }
    val q = DedupStream.start(spark, docsDir, indexDir, pairsDir, family)
    q.awaitTermination()
    DedupStream.pairs(spark, pairsDir)
  }

  test("incremental LSH ≡ batch rebuild: Oracle family, id-ordered batches") {
    import spark.implicits._
    val d = docs.cache()
    val slices = Seq(
      d.filter($"doc_id" % 3 === 0), d.filter($"doc_id" % 3 === 1), d.filter($"doc_id" % 3 === 2))
    val got = runSliced(slices, HashFamily.Oracle)
    assertSame(got, Dedup.minhashLshPairs(spark, dir, HashFamily.Oracle))
  }

  test("incremental LSH ≡ batch rebuild: Fast family, different partitioning") {
    import spark.implicits._
    val d = docs.cache()
    // 5 contiguous ranges streamed in REVERSE id order: emission-once and
    // least/greatest normalization must make arrival order invisible
    val bounds = Seq(400L, 300L, 200L, 100L, 0L)
    val slices = bounds.map(lo => d.filter($"doc_id" >= lo && $"doc_id" < lo + 100L))
    val got = runSliced(slices, HashFamily.Fast)
    assertSame(got, Dedup.minhashLshPairs(spark, dir, HashFamily.Fast))
  }

  test("batch replay is idempotent: pairs and index byte-identical after redelivery") {
    import spark.implicits._
    val d = docs.cache()
    // scheme-qualified root: existence probes must go through the Hadoop
    // FileSystem of the path (java.io.File would read this as relative
    // and silently restart the index)
    val root = "file://" + java.nio.file.Files.createTempDirectory("dedupreplay")
    val (indexDir, pairsDir) = (s"$root/index", s"$root/pairs")
    val b0 = d.filter($"doc_id" % 2 === 0)
    val b1 = d.filter($"doc_id" % 2 === 1)
    DedupStream.processBatch(spark, b0, 0L, indexDir, pairsDir, HashFamily.Fast)
    DedupStream.processBatch(spark, b1, 1L, indexDir, pairsDir, HashFamily.Fast)
    val firstPairs = DedupStream.pairs(spark, pairsDir).collect().toSeq
    val firstBands = spark.table(DedupStream.bandsTable(indexDir)).count()
    val firstShingles = spark.read.parquet(s"$indexDir/shingles").count()
    // redeliver batch 1 (foreachBatch's post-crash contract: same id, same data)
    DedupStream.processBatch(spark, b1, 1L, indexDir, pairsDir, HashFamily.Fast)
    assert(DedupStream.pairs(spark, pairsDir).collect().toSeq === firstPairs)
    assert(spark.table(DedupStream.bandsTable(indexDir)).count() === firstBands)
    assert(spark.read.parquet(s"$indexDir/shingles").count() === firstShingles)
    assert(firstPairs.nonEmpty, "replay test corpus produced no pairs — vacuous")
  }

  test("index probe join never exchanges the bucketed index side") {
    import spark.implicits._
    val d = docs.cache()
    val root = java.nio.file.Files.createTempDirectory("dedupplan").toString
    val (indexDir, pairsDir) = (s"$root/index", s"$root/pairs")
    DedupStream.processBatch(spark, d.filter($"doc_id" < 250), 0L, indexDir,
      pairsDir, HashFamily.Fast)
    val newBands = Dedup.bandsOf(
      Dedup.shinglesOf(d.filter($"doc_id" >= 250)), HashFamily.Fast)
    // force the sort-merge path (the 10¹⁰-doc-index shape: nothing is
    // broadcastable); the bucketed scan must satisfy the join's
    // distribution so only the new batch's band keys move
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", -1)
    try {
      val probe = DedupStream.probeIndex(spark, newBands, 1L, indexDir)
      assert(graft.store.Bucketing.scanUnexchanged(
        probe, DedupStream.bandsTable(indexDir)),
        "probe join shuffled or broadcast the index side")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevAqe)
    }
  }

  test("fresh session re-attaches a populated index: partitions recovered, probe equal") {
    import spark.implicits._
    val d = docs.cache()
    val root = java.nio.file.Files.createTempDirectory("dedupattach").toString
    val (indexDir, pairsDir) = (s"$root/index", s"$root/pairs")
    DedupStream.processBatch(spark, d.filter($"doc_id" < 200), 0L, indexDir,
      pairsDir, HashFamily.Fast)
    DedupStream.processBatch(spark, d.filter($"doc_id" >= 200 && $"doc_id" < 400), 1L,
      indexDir, pairsDir, HashFamily.Fast)
    val table = DedupStream.bandsTable(indexDir)
    val bandRows = spark.table(table).count()
    assert(bandRows > 0)
    val newBands = Dedup.bandsOf(
      Dedup.shinglesOf(d.filter($"doc_id" >= 400)), HashFamily.Fast).cache()
    val want = DedupStream.probeIndex(spark, newBands, 2L, indexDir)
      .collect().map(_.toString).sorted
    // simulate a fresh JVM over the same index: the catalog entry is gone,
    // the data files remain — the next probe must restore the table AND
    // its batch partitions (a recovered-but-partitionless table would
    // silently probe an empty index)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val got = DedupStream.probeIndex(spark, newBands, 2L, indexDir)
      .collect().map(_.toString).sorted
    assert(spark.table(table).count() === bandRows,
      "re-attached index lost rows (partitions not recovered)")
    assert(got === want, "probe over the re-attached index diverged")
  }
}
