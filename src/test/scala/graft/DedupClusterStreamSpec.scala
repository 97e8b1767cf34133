package graft

import graft.streaming.DedupClusterStream
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The composed streaming deduper must serve q63's cluster/canonical
  * table exactly over the union corpus under ANY batch split — including
  * splits where a cluster's members arrive in different batches and the
  * bridging pair only exists once its later document lands (the
  * cross-batch cluster-merge path through the nested CcStream). Replay
  * must be a no-op. */
class DedupClusterStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs: DataFrame = {
    import spark.implicits._
    Tables.t(spark, dir, "documents").select($"doc_id", $"text")
  }

  private def batchWant: Seq[(Long, Long, Long, Boolean)] =
    SparkEntry.queries("q63_dedup_clusters")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq

  private def snapshotOf(store: String): Seq[(Long, Long, Long, Boolean)] =
    DedupClusterStream.snapshot(spark, store).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq

  test("streamed clusters ≡ batch q63 under interleaved splits; replay is a no-op") {
    import spark.implicits._
    val d = docs.cache()
    val want = batchWant
    val store = java.nio.file.Files.createTempDirectory("dclspec").toString + "/store"
    val slices = Seq(0, 1, 2).map(i => d.filter($"doc_id" % 3 === i))
    slices.zipWithIndex.foreach { case (sl, i) =>
      DedupClusterStream.processBatch(spark, sl, i.toLong, store)
    }
    assert(snapshotOf(store) === want, "interleaved stream diverged from batch q63")
    // non-vacuity: the merge path must have fired — some document's
    // cluster label must have been REVISED across label batches (a
    // provisional cluster later absorbed by a bridging pair)
    val revised = spark.read.parquet(s"$store/cc/labels")
      .groupBy($"node")
      .agg(org.apache.spark.sql.functions.countDistinct($"component").as("v"))
      .filter($"v" > 1).count()
    assert(revised > 0, "no cluster label was ever revised — merge path exercised nothing")
    // replay of an applied batch rewrites identical partitions end to end
    DedupClusterStream.processBatch(spark, slices(1), 1L, store)
    assert(snapshotOf(store) === want, "replay changed the served clusters")
    d.unpersist()
  }
}
