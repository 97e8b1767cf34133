package graft.streaming

import graft.functions.{HashFamily, KmvBuffer, KmvSketch}
import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Running per-source vocabulary-size monitor over a document stream —
  * the streaming face of q65. KMV sketches are mergeable (union of
  * sketches ≡ sketch of the union), so incremental maintenance is EXACT:
  * after any sequence of micro-batches the persisted state equals the
  * batch-mode sketch of the full corpus, regardless of arrival order or
  * batch splits (VocabStreamSpec proves byte-identity against q65).
  *
  * Per micro-batch: sketch the new documents (one bounded aggregation —
  * O(k) longs per source per partition cross the shuffle), merge with the
  * persisted state, overwrite. State is O(sources × k) longs — driver-tiny
  * at any corpus scale, so the read-merge-overwrite cycle costs nothing
  * next to the batch scan; the heavy side (token hashing) touches only the
  * new documents, which is the whole point: a 10¹⁰-document corpus is
  * never rescanned to keep its vocabulary estimate current.
  */
object VocabStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("source", StringType, nullable = false)))

  private val stateSchema = StructType(Seq(
    StructField("source", StringType),
    StructField("sketch", ArrayType(LongType, containsNull = false))))

  /** Per-source KMV sketch of one document batch. */
  def sketchOf(batch: DataFrame, family: HashFamily,
      k: Int = TextOps.KmvK): DataFrame = {
    import batch.sparkSession.implicits._
    batch
      .select($"source", explode(split(lower(trim($"text")), "\\s+")).as("tok"))
      .select($"source", family.hash63($"tok").as("x"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(KmvBuffer(k).toColumn.name("sketch"))
      .toDF("source", "sketch")
  }

  /** Merge one batch into the persisted state. The old state is collected
    * first (O(sources × k) longs), which both makes the overwrite safe —
    * nothing lazily reads the directory being replaced — and keeps the
    * merge a union of driver-held rows with the batch aggregate. Replay
    * of a batch is a no-op by construction: KMV union is an idempotent
    * semilattice, so re-merging already-counted tokens changes nothing.
    * State existence goes through the Hadoop FileSystem of the path's
    * scheme, never `java.io.File` (the DedupStream lesson). */
  def processBatch(s: SparkSession, batch: DataFrame, stateDir: String,
      family: HashFamily, k: Int = TextOps.KmvK): Unit = {
    import s.implicits._
    import scala.jdk.CollectionConverters._
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    val stateExists = statePath
      .getFileSystem(s.sparkContext.hadoopConfiguration).exists(statePath)
    val old: DataFrame =
      if (stateExists)
        s.createDataFrame(s.read.parquet(stateDir).collect().toList.asJava, stateSchema)
      else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
    sketchOf(batch, family, k).unionByName(old)
      .select($"source", explode($"sketch").as("x"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(KmvBuffer(k).toColumn.name("sketch"))
      .toDF("source", "sketch")
      .write.mode(SaveMode.Overwrite).parquet(stateDir)
  }

  /** Current estimates from the persisted state — the same arithmetic as
    * [[KmvSketch.estimate]] in column form (identical IEEE op order). */
  def estimates(s: SparkSession, stateDir: String, k: Int = TextOps.KmvK): DataFrame = {
    import s.implicits._
    s.read.parquet(stateDir)
      .select($"source",
        when(size($"sketch") < k, size($"sketch").cast("long"))
          .otherwise(floor(lit((k - 1).toDouble) /
            (element_at($"sketch", k).cast("double") / lit(KmvSketch.HashSpace))).cast("long"))
          .as("est_distinct"))
      .orderBy($"source")
  }

  /** File-source wiring: new parquet document files appear in `srcDir`,
    * every micro-batch folds into the sketch state. */
  def start(s: SparkSession, srcDir: String, stateDir: String,
      family: HashFamily = HashFamily.Fast, k: Int = TextOps.KmvK): StreamingQuery =
    s.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: DataFrame, _: Long) =>
        processBatch(s, batch, stateDir, family, k))
      .start()
}
