package graft.streaming

import graft.functions.{KllSketch, KllState}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Running per-group KLL quantile monitor over a measurement stream —
  * the tighter-error companion to [[QuantileStream]], completing the
  * streaming-sketch family's third class:
  *
  *  - [[VocabStream]]/[[QuantileStream]] — idempotent semilattices:
  *    replay-safe by algebra, byte-identical to batch;
  *  - [[HeavyTokenStream]] — counting state, replay-idempotent via a
  *    batch-id high-water mark;
  *  - this — a COMPACTING sketch: the survivor set depends on merge
  *    order, so the persisted state is NOT byte-identical to a batch
  *    rebuild (that is q76/QuantileStream's contract); what the KLL
  *    construction guarantees — and KllStreamSpec gates — is the O(1/k)
  *    rank-error bound of every estimate plus EXACT counts, under any
  *    batch split. Replay safety uses the HeavyTokenStream mark: a
  *    batch id ≤ the persisted high-water mark folds nothing (a
  *    compacting sketch double-counts on replay otherwise).
  *
  * Per micro-batch: ONE distributed bounded aggregation builds a KLL
  * state per group over the new rows (O(k) doubles per group per
  * partition cross the shuffle — the mergeable-summaries shape), the
  * driver folds each into the persisted state via the same `mergeIn`
  * the aggregate's combine uses, one O(groups × k) overwrite. History
  * is never rescanned; state is driver-tiny at any scale.
  */
object KllStream {

  val rowSchema: StructType = StructType(Seq(
    StructField("grp", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Documented rank-error tolerance of every served estimate at
    * [[KllSketch.DefaultK]]: the KLL construction's ε ≈ c/k (c ≈ 2.3
    * single-sketch, ≤ ~7 under arbitrary merge orders — both ≪ 0.05 at
    * k = 200) with headroom for tied-value rank jumps. ONE constant,
    * shared by KllStreamSpec's gate and the q97 tolerance row, so the
    * spec bound and the served bound cannot drift apart. */
  val RankEps: Double = 0.05

  private val stateSchema = StructType(Seq(
    StructField("grp", StringType),
    StructField("state", BinaryType),
    StructField("last_batch", LongType)))

  private def pathExists(s: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** One serialized KLL state per group of one batch — a single bounded
    * aggregation, partials merged by Spark itself. */
  def sketchOf(batch: DataFrame, k: Int): DataFrame =
    batch.groupBy(col("grp")).agg(KllSketch.state(col("value"), k).as("state"))

  /** Fold one batch into the persisted per-group states. Idempotent under
    * redelivery: `batchId` must be monotonic across DISTINCT batches (the
    * streaming engine's contract); ids ≤ the stored mark fold nothing. */
  def processBatch(s: SparkSession, batch: DataFrame, batchId: Long,
      stateDir: String, k: Int = KllSketch.DefaultK): Unit = {
    if (batch.isEmpty) return // zero-partition parquet would wedge reads
    val (old, lastBatch): (Map[String, KllState], Long) =
      if (pathExists(s, stateDir)) {
        val rows = s.read.parquet(stateDir).collect()
        (rows.map(r => r.getString(0) -> KllState.fromBytes(r.getAs[Array[Byte]](1))).toMap,
          rows.headOption.map(_.getLong(2)).getOrElse(Long.MinValue))
      } else (Map.empty, Long.MinValue)
    if (batchId <= lastBatch) return // replayed delivery: already folded
    val fresh = sketchOf(batch, k).collect()
      .map(r => r.getString(0) -> KllState.fromBytes(r.getAs[Array[Byte]](1))).toMap
    val merged = (old.keySet ++ fresh.keySet).toSeq.sorted.map { g =>
      val st = (old.get(g), fresh.get(g)) match {
        case (Some(a), Some(b)) => a.mergeIn(b); a
        case (Some(a), None) => a
        case (None, Some(b)) => b
        case (None, None) => new KllState(k) // unreachable
      }
      Row(g, st.toBytes, batchId)
    }
    s.createDataFrame(
        s.sparkContext.parallelize(merged, 1), stateSchema)
      .write.mode(SaveMode.Overwrite).parquet(stateDir)
  }

  /** Current estimates from the persisted states, in the q76 output
    * shape (est_median, est_p90) plus the EXACT folded count. */
  def estimates(s: SparkSession, stateDir: String): DataFrame = {
    val rows = s.read.parquet(stateDir).collect()
      .map { r =>
        val st = KllState.fromBytes(r.getAs[Array[Byte]](1))
        Row(r.getString(0), st.quantile(0.5), st.quantile(0.9), st.n)
      }.sortBy(_.getString(0))
    s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1), StructType(Seq(
      StructField("grp", StringType),
      StructField("est_median", DoubleType),
      StructField("est_p90", DoubleType),
      StructField("n", LongType))))
  }

  /** File-source wiring: new parquet measurement files fold into the
    * per-group KLL states.
    *
    * The checkpoint lives beside the state (`<stateDir>.ckpt`) and is as
    * durable as the state itself — REQUIRED for the replay guard above: a
    * fresh (temp) checkpoint restarts batch ids at 0 and re-lists every
    * source file, so a restarted query over an existing stateDir would
    * deliver new data at ids ≤ the persisted high-water mark and the
    * guard would silently DROP it. With the durable checkpoint a
    * restarted query resumes the id sequence and only ever delivers
    * unseen files. Callers wanting a fresh run use a fresh stateDir. */
  def start(s: SparkSession, srcDir: String, stateDir: String,
      k: Int = KllSketch.DefaultK): StreamingQuery =
    s.readStream.schema(rowSchema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", s"$stateDir.ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        processBatch(s, batch, batchId, stateDir, k))
      .start()
}
