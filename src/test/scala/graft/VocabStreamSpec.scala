package graft

import graft.functions.HashFamily
import graft.streaming.VocabStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV mergeability in the streaming path: after ANY batch split of the
  * corpus, the persisted sketch state yields estimates byte-identical to
  * the batch q65 pipeline over the full corpus. */
class VocabStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables.t(spark, dir, "documents")
    .select(col("doc_id"), col("text"), col("source"))

  private def runSplit(splits: Seq[org.apache.spark.sql.DataFrame]): Map[String, Long] = {
    val stateDir = java.nio.file.Files.createTempDirectory("vocabstate").toString + "/state"
    splits.foreach(b => VocabStream.processBatch(spark, b, stateDir, HashFamily.Oracle))
    VocabStream.estimates(spark, stateDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("stream-folded sketch equals batch q65 under two different batch splits") {
    val batchMode = SparkEntry.queries("q65_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val byThirds = Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
    assert(runSplit(byThirds) === batchMode)

    // reverse arrival order, uneven sizes, plus an empty batch
    val uneven = Seq(
      docs.filter(col("doc_id") >= 400),
      docs.filter(lit(false)),
      docs.filter(col("doc_id") < 400))
    assert(runSplit(uneven) === batchMode)
  }

  test("file-source wiring folds available files and answers estimates") {
    val src = java.nio.file.Files.createTempDirectory("vocabsrc").toString
    val stateDir = java.nio.file.Files.createTempDirectory("vocabstate2").toString + "/state"
    docs.write.mode("append").parquet(src)
    val q = VocabStream.start(spark, src, stateDir, HashFamily.Oracle)
    q.awaitTermination()
    val streamed = VocabStream.estimates(spark, stateDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchMode = SparkEntry.queries("q65_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batchMode)
  }
}
