package graft.streaming

import graft.GQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

import java.util.concurrent.atomic.AtomicLong

/** Structured Streaming surface (SURVEY.md §2.9): the reference's freshness
  * contracts (rolling last-hour kills/jumps snapshots, periodic risk
  * refresh) generalized to windowed aggregation over the `events` stream.
  *
  * The batch parquet drives a real streaming query (`readStream` →
  * watermark → tumbling window → memory sink, `Trigger.AvailableNow`), so
  * the same plan runs against a live source in production. The oracle is
  * the batch-equivalent SQL — streaming results must equal batch results on
  * a finite input.
  */
object EventsStream {

  private val nameCounter = new AtomicLong(0)

  /** Tumbling 1-hour windows per event type: count + exact-decimal sum. */
  def windowedCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
    // file-stream sources require a directory; select the one table file
    // via glob filter
    val stream = s.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val withTs = batchSchema("ts").dataType match {
      case LongType => stream.withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
      case _ => stream.withColumn("ts_t", $"ts".cast("timestamp"))
    }
    val agg = withTs
      .withWatermark("ts_t", "2 hours")
      .groupBy(window($"ts_t", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(38,6)")).as("sum_value"))
    val sinkName = s"events_window_${nameCounter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sinkName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sinkName)
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("win_start"),
        $"event_type", $"n", $"sum_value")
      .orderBy($"win_start", $"event_type")
  }

  private val q36Sql =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
      |  event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  SUM(CAST(value AS DECIMAL(38,6))) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  val all: Seq[GQuery] = Seq(
    GQuery("q36_stream_window", windowedCounts, Some(q36Sql)),
  )
}
