package graft

import graft.streaming.ContaminationStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming decontamination ≡ batch q66: with the eval bit set fixed up
  * front, probing training docs batch-by-batch accumulates exactly the
  * batch sweep's flagged manifest, under any batch split. */
class ContaminationStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def train = Tables.t(spark, dir, "documents")
    .filter(col("doc_id") % graft.operators.TextOps.EvalMod =!= 0L)
    .select(col("doc_id"), col("text"))

  private def collectManifest(path: String): Map[Long, Long] =
    ContaminationStream.manifest(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("stream-accumulated manifest equals batch q66 under two batch splits") {
    val batchMode = SparkEntry.queries("q66_bloom_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bits = java.nio.file.Files.createTempDirectory("evalbits").toString + "/bits"
    ContaminationStream.buildEvalBits(spark, dir, bits)

    for (splits <- Seq(
        Seq(train.filter(col("doc_id") % 2 === 1), train.filter(col("doc_id") % 2 === 0)),
        Seq(train.filter(col("doc_id") >= 300), train.filter(lit(false)),
          train.filter(col("doc_id") < 300)))) {
      val out = java.nio.file.Files.createTempDirectory("contam").toString + "/flagged"
      splits.zipWithIndex.foreach { case (b, i) =>
        ContaminationStream.processBatch(spark, b, i.toLong, bits, out)
      }
      assert(collectManifest(out) === batchMode)
    }
  }

  test("batch replay rewrites its own manifest partition — no double-append") {
    val batchMode = SparkEntry.queries("q66_bloom_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bits = java.nio.file.Files.createTempDirectory("evalbits3").toString + "/bits"
    ContaminationStream.buildEvalBits(spark, dir, bits)
    val out = java.nio.file.Files.createTempDirectory("contam3").toString + "/flagged"
    val b0 = train.filter(col("doc_id") % 2 === 1)
    val b1 = train.filter(col("doc_id") % 2 === 0)
    ContaminationStream.processBatch(spark, b0, 0L, bits, out)
    ContaminationStream.processBatch(spark, b1, 1L, bits, out)
    // redelivery of batch 1 (post-crash foreachBatch contract)
    ContaminationStream.processBatch(spark, b1, 1L, bits, out)
    assert(collectManifest(out) === batchMode)
    assert(ContaminationStream.manifest(spark, out).count() === batchMode.size.toLong,
      "replayed batch duplicated manifest rows")
  }

  test("file-source wiring probes available files against the fixed bits") {
    val batchMode = SparkEntry.queries("q66_bloom_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bits = java.nio.file.Files.createTempDirectory("evalbits2").toString + "/bits"
    ContaminationStream.buildEvalBits(spark, dir, bits)
    val src = java.nio.file.Files.createTempDirectory("trainsrc").toString
    val out = java.nio.file.Files.createTempDirectory("contam2").toString + "/flagged"
    train.write.mode("append").parquet(src)
    val q = ContaminationStream.start(spark, src, bits, out)
    q.awaitTermination()
    assert(collectManifest(out) === batchMode)
  }
}
