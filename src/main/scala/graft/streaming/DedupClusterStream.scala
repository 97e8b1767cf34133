package graft.streaming

import graft.functions.HashFamily
import graft.operators.Dedup
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming near-dup CLUSTERING — q63's cluster/canonical table
  * maintained online, and the capstone COMPOSITION of the maintained-
  * store family: three existing maintainers chained behind one ingest,
  * each contributing exactly the contract it already proves.
  *
  *   1. [[DedupStream]] maintains the LSH band index + shingle store and
  *      emits each batch's VERIFIED new pairs exactly once (its spec
  *      pins the accumulated pair set byte-identical to the batch
  *      pipeline under any split; the q57 recall argument makes that
  *      pair set the EXACT n-gram Jaccard pair set at the registered
  *      scales — so the streamed edges equal q63's batch input);
  *   2. the batch's new pairs feed [[CcStream]] over a nested `cc/`
  *      store — cluster labels are connected components of the verified
  *      pair graph, and CcStream's targeted recompute handles the
  *      cross-batch CLUSTER MERGE (two clusters built in earlier
  *      batches joined by one late pair) that makes labels non-foldable;
  *   3. serving derives q63's full output shape from the label store:
  *      cluster id = component min-id (the canonical-survivor rule),
  *      cluster sizes, and the keep flag.
  *
  * Per batch the work is new-docs × bands + matched buckets (DedupStream,
  * index probed never rescanned) plus the touched clusters' edges
  * (CcStream) — dup volume, not corpus volume: the working set any exact
  * online deduper must read. A 100 TB corpus streams through this path
  * with the band index bucketed on the probe key and the cluster store
  * bounded by dup volume. Replay-safe end to end: DedupStream rewrites
  * byte-identical partitions, CcStream's recompute is prefix-convergent.
  */
object DedupClusterStream {

  private def indexDir(root: String) = s"$root/index"
  private def pairsDir(root: String) = s"$root/pairs"
  private def ccDir(root: String) = s"$root/cc"

  private def exists(s: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  private val pairsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_a", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("doc_b", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("jaccard", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("batch", org.apache.spark.sql.types.LongType)))

  /** Fold one micro-batch of (doc_id, text) documents: dedup against the
    * index, then fold the new verified pairs into the cluster store. */
  def processBatch(s: SparkSession, batch: DataFrame, batchId: Long,
      rootDir: String, family: HashFamily = HashFamily.Fast,
      threshold: Double = Dedup.JaccardThreshold): Unit = {
    import s.implicits._
    // empty-batch guard (the CcStream note, uniform across the family)
    if (batch.isEmpty) return
    DedupStream.processBatch(s, batch, batchId,
      indexDir(rootDir), pairsDir(rootDir), family, threshold)
    // explicit schema (no inference): a run prefix that never verified a
    // pair leaves pairsDir missing or an all-_SUCCESS root with no data
    // files — both must read as empty, not throw
    val pairsSrc =
      if (exists(s, pairsDir(rootDir)))
        s.read.schema(pairsSchema).parquet(pairsDir(rootDir))
      else s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], pairsSchema)
    val newPairs = pairsSrc
      .filter($"batch" === batchId)
      .select($"doc_a".as("src"), $"doc_b".as("dst"))
    // a batch may verify no new pair — nothing for the cluster store
    // (CcStream's label read path requires at least one prior write)
    if (!newPairs.isEmpty) CcStream.processBatch(newPairs, batchId, ccDir(rootDir))
  }

  /** Served cluster table — q63's output shape verbatim: one row per
    * document with at least one near-dup, cluster id = component min-id,
    * keep ⇔ the document IS its cluster's canonical survivor. */
  def snapshot(s: SparkSession, rootDir: String): DataFrame = {
    import s.implicits._
    if (!exists(s, s"${ccDir(rootDir)}/labels"))
      return s.emptyDataFrame.select(lit(0L).as("doc_id"), lit(0L).as("cluster_id"),
        lit(0L).as("cluster_size"), lit(false).as("keep")).limit(0)
    val lab = CcStream.snapshot(s, ccDir(rootDir))
      .select($"node".as("doc_id"), $"component".as("cluster_id"))
    val sizes = lab.groupBy($"cluster_id").agg(count(lit(1)).as("cluster_size"))
    lab.join(sizes, "cluster_id")
      .select($"doc_id", $"cluster_id", $"cluster_size".cast("long").as("cluster_size"),
        ($"doc_id" === $"cluster_id").as("keep"))
  }

  /** File-source wiring over a documents directory (doc_id, text) — the
    * [[DedupStream.start]] shape with a durable checkpoint so restarts
    * resume the batch-id sequence. */
  def start(s: SparkSession, docsDir: String, rootDir: String,
      family: HashFamily = HashFamily.Fast,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    s.readStream.schema(DedupStream.docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(docsDir)
      .writeStream
      .option("checkpointLocation", s"$rootDir.ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) processBatch(s, batch, batchId, rootDir, family)
      }
      .trigger(trigger)
      .start()

  /** Compact the nested cluster store (the band index and pairs store
    * stay batch-partitioned — they are append-layout by design). */
  def compact(s: SparkSession, rootDir: String, throughBatch: Long): Unit =
    CcStream.compact(s, ccDir(rootDir), throughBatch)
}
