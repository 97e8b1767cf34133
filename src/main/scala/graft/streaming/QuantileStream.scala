package graft.streaming

import graft.functions.{HashFamily, QuantileSketch}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Running per-group quantile monitor over a measurement stream — the
  * streaming face of q76 (the VocabStream pattern applied to rank
  * statistics). The quantile sketch's state is a bottom-k-by-(hash, value)
  * pair set, and bottom-k union is a mergeable, IDEMPOTENT semilattice:
  * after any sequence of micro-batches the persisted state equals the
  * batch-mode sketch of everything seen — regardless of arrival order,
  * batch splits, or foreachBatch REPLAYS (re-merging rows already in the
  * state is a no-op), so the estimates are byte-identical to q76's
  * (QuantileStreamSpec proves all three properties).
  *
  * Per micro-batch: sketch the new rows (one bounded aggregation, ≤ k
  * pairs per group per partition cross the shuffle), merge with the
  * persisted state by re-feeding both through the same aggregate,
  * overwrite. State is O(groups × k) pairs — driver-tiny at any scale —
  * and the heavy side touches only the new rows: a 10¹⁰-row history is
  * never rescanned to keep its percentiles current.
  */
object QuantileStream {

  /** Stream rows: a group label, the measured value, and the row's
    * primary key rendered to a string (hashed for the sample draw —
    * row-unique so duplicates of the VALUE keep their multiplicity). */
  val rowSchema: StructType = StructType(Seq(
    StructField("grp", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("row_key", StringType, nullable = false)))

  private val stateSchema = StructType(Seq(
    StructField("grp", StringType),
    StructField("samp", ArrayType(QuantileSketch.PairType, containsNull = false))))

  private def pathExists(s: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Per-group mergeable sample of one batch. */
  def sketchOf(batch: DataFrame, family: HashFamily,
      k: Int = QuantileSketch.DefaultK): DataFrame =
    batch.groupBy(col("grp"))
      .agg(QuantileSketch.samplePairs(
        family.hash63(col("row_key")), col("value"), k).as("samp"))

  /** Merge one batch into the persisted state: explode old pairs + new
    * pairs through the SAME bounded aggregate (union of bottom-k sets ≡
    * bottom-k of the union). Old state is collected first (O(groups × k))
    * so nothing lazily reads the directory being replaced. */
  def processBatch(s: SparkSession, batch: DataFrame, stateDir: String,
      family: HashFamily, k: Int = QuantileSketch.DefaultK): Unit = {
    import scala.jdk.CollectionConverters._
    // an all-empty first batch would otherwise write a zero-partition
    // parquet directory (no footer files), wedging every later read of the
    // state on schema inference; an empty batch merges nothing, so skip
    if (batch.isEmpty) return
    val old: DataFrame =
      if (pathExists(s, stateDir))
        s.createDataFrame(s.read.parquet(stateDir).collect().toList.asJava, stateSchema)
      else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
    sketchOf(batch, family, k).unionByName(old)
      .select(col("grp"), explode(col("samp")).as("p"))
      .groupBy(col("grp"))
      .agg(QuantileSketch.samplePairs(col("p.h"), col("p.v"), k).as("samp"))
      .write.mode(SaveMode.Overwrite).parquet(stateDir)
  }

  /** Current estimates from the persisted state, in the q76 output shape
    * (same interpolation arithmetic — the values route through the very
    * [[QuantileSketch.sample]] aggregate the batch query uses). */
  def estimates(s: SparkSession, stateDir: String,
      k: Int = QuantileSketch.DefaultK): DataFrame =
    s.read.parquet(stateDir)
      .select(col("grp"), explode(col("samp")).as("p"))
      .groupBy(col("grp"))
      .agg(QuantileSketch.sample(col("p.h"), col("p.v"), k).as("vals"))
      .select(col("grp"),
        QuantileSketch.interpolate(col("vals"), 0.5).as("est_median"),
        QuantileSketch.interpolate(col("vals"), 0.9).as("est_p90"),
        size(col("vals")).cast("long").as("sample_n"))
      .orderBy(col("grp"))

  /** File-source wiring: new parquet measurement files appear in
    * `srcDir`, every micro-batch folds into the sketch state. */
  def start(s: SparkSession, srcDir: String, stateDir: String,
      family: HashFamily = HashFamily.Fast,
      k: Int = QuantileSketch.DefaultK): StreamingQuery =
    s.readStream.schema(rowSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: DataFrame, _: Long) =>
        processBatch(s, batch, stateDir, family, k))
      .start()
}
