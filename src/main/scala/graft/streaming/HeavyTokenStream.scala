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
  * semilattices — replay-safe by algebra), a Misra-Gries summary folds
  * counts, so idempotence has to come from the harness instead. It does:
  * the state carries the LAST APPLIED BATCH ID, and a batch whose id is
  * ≤ that high-water mark is skipped — the same replay discipline
  * [[DedupStream]] keys its partition overwrites on, adapted to a
  * fold-into-one-summary state. Spark's streaming engine guarantees a
  * replayed foreachBatch delivery reuses the same batch id (and the file
  * source, the same files), which is exactly what makes "skip ≤ mark"
  * equal to exactly-once folding. Guarantees:
  *
  *  - every token with total frequency > N/k across everything ingested
  *    is PRESENT in the state (the mergeable-summaries recall bound —
  *    error adds across merges but stays ≤ N/k total), which is the
  *    property q53's exact second pass needs from a candidate set;
  *  - each residual count lower-bounds the true count;
  *  - replaying a delivered batch id is a NO-OP (HeavyTokenStreamSpec
  *    asserts totals do not move), so redelivery after a sink-side crash
  *    cannot double counts. One torn-write caveat remains: the state
  *    overwrite itself is not transactional, so a crash INSIDE the
  *    parquet rewrite can corrupt the state file — at which point the
  *    monitor is rebuilt from the batch source, the standard recovery
  *    for any overwrite-in-place sketch state.
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
    StructField("total", LongType),
    StructField("last_batch", LongType)))

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
    * non-positives — the Agarwal et al. construction). Idempotent under
    * redelivery: `batchId` values must be monotonically increasing across
    * DISTINCT batches (the streaming engine's contract); a call whose id
    * is ≤ the persisted high-water mark is a replay and folds nothing. */
  def processBatch(s: SparkSession, batch: DataFrame, batchId: Long,
      stateDir: String, capacity: Int): Unit = {
    import s.implicits._
    // an all-empty batch folds nothing and would (on a fresh state) write
    // a zero-partition parquet directory that wedges later schema reads
    if (batch.isEmpty) return
    val (oldMap, oldN, lastBatch): (Map[String, Long], Long, Long) =
      if (pathExists(s, stateDir)) {
        val rows = s.read.parquet(stateDir).collect()
        (rows.map(r => r.getString(0) -> r.getLong(1)).toMap,
          rows.headOption.map(_.getLong(2)).getOrElse(0L),
          rows.headOption.map(_.getLong(3)).getOrElse(Long.MinValue))
      } else (Map.empty, 0L, Long.MinValue)
    if (batchId <= lastBatch) return // replayed delivery: already folded
    val (batchMap, batchN) = sketchOf(batch, capacity)
    val agg = MisraGriesAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("unused"), capacity)
    val merged = agg.merge(
      scala.collection.mutable.HashMap.from(oldMap),
      scala.collection.mutable.HashMap.from(batchMap))
    val total = oldN + batchN
    merged.toSeq.sortBy(_._1)
      .map { case (k, c) => (k, c, total, batchId) }
      .toDF("k", "c", "total", "last_batch")
      .write.mode(SaveMode.Overwrite).parquet(stateDir)
  }

  /** Current candidate set: every token whose true total frequency
    * exceeds total/capacity is guaranteed present. */
  def candidates(s: SparkSession, stateDir: String): DataFrame =
    s.read.parquet(stateDir)
      .select(col("k").as("tok"), col("c").as("residual"), col("total"))
      .orderBy(col("tok"))

  /** File-source wiring: new parquet document files fold into the state.
    *
    * The checkpoint lives beside the state (`<stateDir>.ckpt`) and is as
    * durable as the state itself — REQUIRED for the replay guard above: a
    * fresh (temp) checkpoint restarts batch ids at 0 and re-lists every
    * source file, so a restarted query over an existing stateDir would
    * deliver new data at ids ≤ the persisted high-water mark and the
    * guard would silently DROP it. With the durable checkpoint a
    * restarted query resumes the id sequence and only ever delivers
    * unseen files (or replays the genuinely-torn last batch, which the
    * mark absorbs). Callers wanting a fresh run use a fresh stateDir. */
  def start(s: SparkSession, srcDir: String, stateDir: String,
      capacity: Int): StreamingQuery =
    s.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", s"$stateDir.ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        processBatch(s, batch, batchId, stateDir, capacity))
      .start()
}
