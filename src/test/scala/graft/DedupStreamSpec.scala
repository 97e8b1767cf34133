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
}
