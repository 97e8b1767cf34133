package graft.streaming

import graft.functions.{HeavyHitters, MisraGriesAgg}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Running heavy-token monitor over a document stream — the streaming
  * face of q53's candidate pass, and the error-ACCUMULATING member of the
  * streaming-sketch family: unlike the KMV/bottom-k monitors (idempotent
  * semilattices — replay-safe, byte-identical to batch), a Misra-Gries
  * summary folds counts, so the guarantees are the sketch's own, not
  * byte-identity:
  *
  *  - every token with total frequency > N/k across everything ingested
  *    is PRESENT in the state (the mergeable-summaries recall bound —
  *    error adds across merges but stays ≤ N/k total), which is the
  *    property q53's exact second pass needs from a candidate set;
  *  - each residual count lower-bounds the true count;
  *  - replay is NOT a no-op (counts would double): this monitor requires
  *    exactly-once input delivery, the honest contract of a counting
  *    sketch (HeavyTokenStreamSpec documents both halves).
  *
  * Per micro-batch: one bounded aggregation over the new documents' tokens
  * (O(k) entries per partition cross the shuffle), a driver-side merge of
  * two ≤ k summaries via the SAME `MisraGriesAgg.merge` the batch
  * aggregate uses, one O(k) state overwrite. The history is never
  * rescanned.
  */
object HeavyTokenStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val stateSchema = StructType(Seq(
    StructField("k", StringType),
    StructField("c", LongType),
    StructField("total", LongType)))

  private def pathExists(s: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** (summary pairs, token count) of one batch — a single bounded
    * aggregation, partials merged by Spark itself. */
  def sketchOf(batch: DataFrame, capacity: Int): (Map[String, Long], Long) = {
    import batch.sparkSession.implicits._
    val row = batch
      .select(explode(split(lower(trim($"text")), "\\s+")).as("tok"))
      .agg(HeavyHitters.summary($"tok", capacity).as("s"), count(lit(1)).as("n"))
      .collect().head
    val pairs = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (pairs, row.getLong(1))
  }

  /** Merge one batch into the persisted state via the aggregate's own
    * merge (sum counters, subtract the (k+1)-th largest, drop
    * non-positives — the Agarwal et al. construction). */
  def processBatch(s: SparkSession, batch: DataFrame, stateDir: String,
      capacity: Int): Unit = {
    import s.implicits._
    val (batchMap, batchN) = sketchOf(batch, capacity)
    val (oldMap, oldN): (Map[String, Long], Long) =
      if (pathExists(s, stateDir)) {
        val rows = s.read.parquet(stateDir).collect()
        (rows.map(r => r.getString(0) -> r.getLong(1)).toMap,
          rows.headOption.map(_.getLong(2)).getOrElse(0L))
      } else (Map.empty, 0L)
    val agg = MisraGriesAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("unused"), capacity)
    val merged = agg.merge(
      scala.collection.mutable.HashMap.from(oldMap),
      scala.collection.mutable.HashMap.from(batchMap))
    val total = oldN + batchN
    merged.toSeq.sortBy(_._1)
      .map { case (k, c) => (k, c, total) }
      .toDF("k", "c", "total")
      .write.mode(SaveMode.Overwrite).parquet(stateDir)
  }

  /** Current candidate set: every token whose true total frequency
    * exceeds total/capacity is guaranteed present. */
  def candidates(s: SparkSession, stateDir: String): DataFrame =
    s.read.parquet(stateDir)
      .select(col("k").as("tok"), col("c").as("residual"), col("total"))
      .orderBy(col("tok"))

  /** File-source wiring: new parquet document files fold into the state. */
  def start(s: SparkSession, srcDir: String, stateDir: String,
      capacity: Int): StreamingQuery =
    s.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: DataFrame, _: Long) =>
        processBatch(s, batch, stateDir, capacity))
      .start()
}
