package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shared negative-generation fold for the maintained batch-partitioned
  * stores — ONE implementation of the list-batches → stage-fold →
  * write-staging-generation → delete-sources sequence that CcStream,
  * TriangleStream, and KCoreStream each previously hand-rolled (the
  * copies had already diverged on the missing-store guard; a review
  * caught compact() crashing on stores no batch had ever created). */
private[streaming] object Stores {

  /** Fold batches ≤ `throughBatch` (plus prior negative generations) of
    * the batch-partitioned store at `path` into one fresh negative
    * generation, staging the rows through `stage`. No-op if the store
    * was never created. One compactor at a time (the documented
    * single-maintainer contract of every caller). */
  def fold(s: SparkSession, path: String, throughBatch: Long)(
      stage: DataFrame => DataFrame): Unit = {
    import s.implicits._
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = org.apache.hadoop.fs.FileSystem
      .get(root.toUri, s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val batchIds = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong)
    val sources = batchIds.filter(b => b < 0 || b <= throughBatch)
    if (sources.isEmpty) return
    val stagingId = batchIds.filter(_ < 0).minOption.getOrElse(0L) - 1L
    val src = s.read.parquet(path).filter($"batch".isInCollection(sources))
    stage(src).localCheckpoint()
      .withColumn("batch", lit(stagingId))
      .write.mode(SaveMode.Overwrite).option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch").parquet(path)
    sources.foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"batch=$b"), true)
    }
  }
}
