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

  /** Tumbling 1-hour windows per event type: count + exact-decimal sum.
    *
    * CAVEAT — verification harness shape, not the live deployment shape:
    * `complete` output + memory sink keeps every window in state/driver
    * memory, which is what makes a finite AvailableNow run comparable to
    * the batch oracle (append mode would withhold the trailing windows the
    * watermark never closes). A live unbounded deployment of this exact
    * aggregation would use `append` + watermark with a real sink, where
    * state is bounded by the watermark horizon. */
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
        $"event_type", $"n", graft.Tables.decStr($"sum_value").as("sum_value"))
      .orderBy($"win_start", $"event_type")
  }

  /** Per-user session state for the stateful operator. */
  final case class SessionAgg(user_id: Long, n_sessions: Long, n_events: Long)

  /** q37 — stateful streaming sessionization via
    * `flatMapGroupsWithState`: per-user custom state (KeyValueGroupedDataset),
    * >30 min gap starts a new session. On a finite AvailableNow input the
    * result is deterministic and equals the batch window formulation (q14),
    * so it shares that oracle.
    *
    * State design for an unbounded stream: only (last_ts, counts) per user
    * is retained — O(users), not O(events); with a live source you would add
    * a GroupStateTimeout to expire idle users. Events inside one batch are
    * sorted by (ts, event_id) before folding, giving deterministic output.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import s.implicits._
    val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
    val stream = s.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val withUs = batchSchema("ts").dataType match {
      case LongType => stream.withColumn("ts_us", expr("ts div 1000"))
      case _ => stream.withColumn("ts_us", unix_micros($"ts".cast("timestamp")))
    }
    val typed = withUs.select($"user_id".as[Long], $"ts_us".as[Long], $"event_id".as[Long])
      .as[(Long, Long, Long)]

    def fold(userId: Long, events: Iterator[(Long, Long, Long)],
        state: GroupState[(Long, Long, Long)]): Iterator[SessionAgg] = {
      val sorted = events.toSeq.sortBy(e => (e._2, e._3))
      var (lastTs, sessions, count) = state.getOption.getOrElse((Long.MinValue, 0L, 0L))
      sorted.foreach { case (_, ts, _) =>
        if (lastTs == Long.MinValue || ts - lastTs > 1800L * 1000000L) sessions += 1
        lastTs = ts
        count += 1
      }
      state.update((lastTs, sessions, count))
      Iterator.single(SessionAgg(userId, sessions, count))
    }

    val sinkName = s"events_sessions_${nameCounter.incrementAndGet()}"
    val q = typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fold)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(sinkName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // update-mode sink may hold one row per (user, batch); keep the latest
    s.table(sinkName)
      .groupBy($"user_id")
      .agg(max($"n_sessions").as("n_sessions"), max($"n_events").as("n_events"))
      .orderBy($"user_id")
  }

  /** q54 — watermarked stream-stream interval join: views matched to
    * purchases by the same user within the following 30 minutes. Both
    * sides carry event-time watermarks and the join condition bounds the
    * time range in BOTH directions, so Spark can expire buffered state —
    * the property that makes the join runnable on unbounded streams
    * (unbounded-state joins are rejected by the planner). On the finite
    * AvailableNow input the result equals the batch theta join, which is
    * the DuckDB oracle. */
  def streamStreamJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
    def side(): DataFrame = {
      val st = s.readStream.schema(batchSchema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      batchSchema("ts").dataType match {
        case LongType => st.withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
        case _ => st.withColumn("ts_t", $"ts".cast("timestamp"))
      }
    }
    val views = side().filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("v_event"), $"ts_t".as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val purchases = side().filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("p_event"), $"ts_t".as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val joined = views.join(purchases,
      $"user_id" === $"p_user" &&
        $"p_ts" >= $"v_ts" &&
        $"p_ts" <= $"v_ts" + expr("INTERVAL 30 MINUTES"))
    val sinkName = s"events_ssj_${nameCounter.incrementAndGet()}"
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sinkName)
      .select($"user_id", $"v_event", $"p_event")
      .orderBy($"user_id", $"v_event", $"p_event")
  }

  private val q54Sql =
    """WITH v AS (SELECT user_id, event_id AS v_event, epoch_us(ts) AS vt
      |           FROM events WHERE event_type = 'view'),
      |p AS (SELECT user_id AS pu, event_id AS p_event, epoch_us(ts) AS pt
      |      FROM events WHERE event_type = 'purchase')
      |SELECT v.user_id, v_event, p_event
      |FROM v JOIN p ON v.user_id = pu AND pt >= vt AND pt - vt <= 1800000000
      |ORDER BY user_id, v_event, p_event""".stripMargin

  private val q37Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events)
      |SELECT user_id,
      |  CAST(SUM(CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin

  private val q36Sql =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
      |  event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  val all: Seq[GQuery] = Seq(
    GQuery("q36_stream_window", windowedCounts, Some(q36Sql)),
    GQuery("q37_stream_sessionize", sessionize, Some(q37Sql)),
    GQuery("q54_stream_stream_join", streamStreamJoin, Some(q54Sql)),
  )
}
