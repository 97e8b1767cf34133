package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators Spark lacks natively, composed from built-ins
  * (preference (a) in SURVEY §7.3 — no custom SparkPlan needed):
  *
  *  - **As-of join** via the union+window technique: union both sides with a
  *    side marker, one window pass per key ordered by (ts, side), and
  *    `last(_, ignoreNulls)` carries the most recent right row forward.
  *    One shuffle on the key — never a per-row range probe. This is the
  *    scalable formulation (an equi-join + sort would re-shuffle both sides
  *    anyway; here the sort IS the join).
  *
  *  - **Banded range join** via time bucketing: |Δts| ≤ B pairs must share a
  *    bucket of width B or sit in adjacent buckets, so the left side probes
  *    two buckets and the exact predicate filters — an equi-join on
  *    (key, bucket), never a cross join.
  */
object TemporalJoins {

  /** Generic as-of join: for each left row, the latest right row with
    * `rightTs ≤ leftTs` on the same key. Right payload columns are carried
    * as `r_<name>`; unmatched left rows keep nulls. */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String]): DataFrame = {
    val r = right.select(
      col(key), col(rightTs).as("_ts"), lit(0).as("_side"),
      struct(rightPayload.map(col): _*).as("_r"))
    val leftCols = left.columns
    val l = left.select(
      Seq(col(key), col(leftTs).as("_ts"), lit(1).as("_side"),
        lit(null).cast(r.schema("_r").dataType).as("_r")) ++
        leftCols.filterNot(_ == key).map(col): _*)
    val rPadded = r.select(
      Seq(col(key), col("_ts"), col("_side"), col("_r")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // deterministic tie-break at equal timestamps: lexicographic order of
    // the right payload struct (first payload column decides)
    val w = Window.partitionBy(col(key)).orderBy(col("_ts"), col("_side"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(rPadded)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        rightPayload.map(p => col("_match").getField(p).as(s"r_$p")): _*)
  }

  /** Banded range self/two-table join: pairs on `key` with
    * `0 ≤ rightTs − leftTs ≤ bandMicros`. */
  def bandedRangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, bandMicros: Long): DataFrame = {
    // internal renames keep the join collision-safe when both sides use the
    // same timestamp column name (e.g. a self-join on ts_us)
    val l = left.withColumn("_lts", col(leftTs)).withColumn("_bk",
      explode(array((col(leftTs) / bandMicros).cast("long"),
        (col(leftTs) / bandMicros).cast("long") + 1L)))
    val r0 = right.withColumn("_rts", col(rightTs))
    val r = (if (left.columns.contains(rightTs) && rightTs != leftTs) r0.drop(rightTs) else r0)
      .withColumn("_bk", (col("_rts") / bandMicros).cast("long"))
    val rSafe = if (rightTs == leftTs) r.drop(rightTs) else r
    l.join(rSafe, Seq(key, "_bk"))
      .filter(col("_rts") >= col("_lts") && col("_rts") - col("_lts") <= bandMicros)
      .drop("_bk", "_lts", "_rts")
  }

  /** q38 — as-of join on events: each purchase matched to the user's most
    * recent prior-or-simultaneous view. */
  private def q38(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts_us", $"event_id")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts_us".as("v_ts"), $"event_id".as("v_event"))
    asof(purchases, views, "user_id", "ts_us", "v_ts", Seq("v_event", "v_ts"))
      .select($"user_id", $"event_id", $"ts_us",
        $"r_v_event".as("view_event"),
        ($"ts_us" - $"r_v_ts").as("gap_us"))
      .orderBy($"user_id", $"event_id")
  }

  // The oracle mirrors the union+window formulation (identical tie-breaks:
  // at equal ts the view sorts first, so it is visible to the purchase).
  private val q38Sql =
    """WITH v AS (SELECT user_id, epoch_us(ts) AS ts_us, 0 AS side,
      |    event_id AS v_event, NULL::BIGINT AS event_id FROM events WHERE event_type = 'view'),
      |p AS (SELECT user_id, epoch_us(ts) AS ts_us, 1 AS side,
      |    NULL::BIGINT AS v_event, event_id FROM events WHERE event_type = 'purchase'),
      |u AS (SELECT * FROM v UNION ALL SELECT * FROM p),
      |m AS (SELECT user_id, ts_us, side, event_id,
      |    LAST_VALUE(v_event IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY ts_us, side, v_event
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_event,
      |    LAST_VALUE(CASE WHEN side = 0 THEN ts_us END IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY ts_us, side, v_event
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ts
      |  FROM u)
      |SELECT user_id, event_id, ts_us, view_event, ts_us - v_ts AS gap_us
      |FROM m WHERE side = 1 ORDER BY user_id, event_id""".stripMargin

  /** q39 — banded range join: view→purchase pairs of the same user within
    * 30 minutes. */
  private def q39(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts_us", $"event_id".as("view_event"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts_us".as("p_ts"), $"event_id".as("purchase_event"))
    bandedRangeJoin(views, purchases, "user_id", "ts_us", "p_ts", 1800L * 1000000L)
      .select($"user_id", $"view_event", $"purchase_event", ($"p_ts" - $"ts_us").as("gap_us"))
      .orderBy($"user_id", $"view_event", $"purchase_event")
  }

  private val q39Sql =
    """SELECT v.user_id, v.event_id AS view_event, p.event_id AS purchase_event,
      |  epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
      |FROM events v JOIN events p
      |  ON v.user_id = p.user_id AND v.event_type = 'view' AND p.event_type = 'purchase'
      |  AND epoch_us(p.ts) >= epoch_us(v.ts)
      |  AND epoch_us(p.ts) - epoch_us(v.ts) <= 1800000000
      |ORDER BY v.user_id, view_event, purchase_event""".stripMargin

  /** q40 — rollup aggregate with grouping id (beyond-reference analytics
    * completeness; subtotals + grand total in one pass). */
  private def q40(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.Tables.{dec, decStr}
    graft.Tables.t(s, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(sum(dec($"l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        decStr($"sum_qty").as("sum_qty"), $"n")
      .orderBy($"returnflag", $"linestatus")
  }

  private val q40Sql =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS sum_qty,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** q41 — exact percentiles (median/p90 of quantity per return flag).
    * Spark `percentile` and DuckDB `quantile_cont` share the linear-
    * interpolation definition; inputs are small exact doubles so the one
    * interpolation op is bit-stable. */
  private def q41(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  private val q41Sql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q76 — the same percentiles through the mergeable
    * [[graft.functions.QuantileSketch]]: the 100 TB path for q41, where an
    * exact `percentile` must buffer every value of a group (Spark's
    * Percentile aggregation state is the full value multiset — a
    * corpus-sized sort in disguise), while the sketch ships O(k) per
    * partition with map-side partials. The sketch is a deterministic
    * bottom-k-by-row-hash sample, so — unlike KLL's coin flips or
    * t-digest's merge-order-dependent centroids — the DuckDB oracle
    * reproduces the estimate EXACTLY (the same determinism trade q65's
    * KMV makes), and QuantileSketchSpec separately gates the estimates
    * against the exact q41 values and proves partitioning invariance.
    * The row hash keys on (l_orderkey, l_linenumber) in Oracle mode;
    * production runs would swap [[HashFamily.Fast]] exactly as the dedup
    * family does. The sketch samples the DISTINCT (key, value) space —
    * the idempotence that lets the streaming monitor replay batches — so
    * the oracle's sample CTE carries the matching DISTINCT: this corpus's
    * synthetic (orderkey, linenumber) key is NOT row-unique (≈0.6% of
    * rows repeat the triple at sf0.1, which is how the sf0.1 sweep caught
    * the mismatch), and collapsed duplicates shift rank estimates well
    * inside the sketch's error bound (QuantileSketchSpec's gate). */
  private def q76(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.QuantileSketch
    import s.implicits._
    val rowKey = graft.functions.HashFamily.Oracle.hash63(
      concat($"l_orderkey".cast("string"), lit("-"), $"l_linenumber".cast("string")))
    graft.Tables.t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(QuantileSketch.sample(rowKey, $"l_quantity").as("samp"),
        count(lit(1)).as("n"))
      .select($"l_returnflag",
        QuantileSketch.interpolate($"samp", 0.5).as("est_median_qty"),
        QuantileSketch.interpolate($"samp", 0.9).as("est_p90_qty"),
        size($"samp").cast("long").as("sample_n"),
        $"n".cast("long").as("n"))
      .orderBy($"l_returnflag")
  }

  private val q76Sql = {
    val k = graft.functions.QuantileSketch.DefaultK
    val h = Dedup.hash63Sql(
      "CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)")
    // the interpolation arithmetic mirrors QuantileSketch.interpolate op
    // for op (multiply, floor, subtract, multiply-add on doubles) so the
    // estimate is bit-identical, not merely close
    def pick(q: String, col: String) =
      s"""MAX(CASE WHEN vr = CAST(FLOOR($q * (ns - 1)) AS BIGINT) + 1 THEN l_quantity END) AS ${col}_lo,
         |    MAX(CASE WHEN vr = LEAST(CAST(FLOOR($q * (ns - 1)) AS BIGINT) + 2, ns) THEN l_quantity END) AS ${col}_hi""".stripMargin
    def interp(q: String, col: String) =
      s"${col}_lo + (${col}_hi - ${col}_lo) * ($q * (ns - 1) - FLOOR($q * (ns - 1)))"
    s"""WITH keyed AS (SELECT DISTINCT l_returnflag, l_quantity, $h AS hk FROM lineitem),
       |samp AS (SELECT l_returnflag, l_quantity,
       |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY hk, l_quantity) AS rn
       |  FROM keyed),
       |s AS (SELECT l_returnflag, l_quantity FROM samp WHERE rn <= $k),
       |ord AS (SELECT l_returnflag, l_quantity,
       |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS vr,
       |    COUNT(*) OVER (PARTITION BY l_returnflag) AS ns
       |  FROM s),
       |n AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY l_returnflag),
       |pick AS (SELECT l_returnflag, ns,
       |    ${pick("0.5", "m")},
       |    ${pick("0.9", "p")}
       |  FROM ord GROUP BY l_returnflag, ns)
       |SELECT p.l_returnflag,
       |  ${interp("0.5", "m")} AS est_median_qty,
       |  ${interp("0.9", "p")} AS est_p90_qty,
       |  CAST(ns AS BIGINT) AS sample_n, n.n
       |FROM pick p JOIN n USING (l_returnflag) ORDER BY l_returnflag""".stripMargin
  }

  /** q42 — correlated-subquery shape (Catalyst decorrelates it into a
    * join): customers spending more than 2× their nation's per-customer
    * average. Integer cents arithmetic keeps both engines exact. */
  private def q42(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // explicit round-to-nearest: Spark's double→long CAST truncates while
    // DuckDB's rounds; round() first makes both engines agree
    val cents = round(col("o_totalprice") * 100.0, 0).cast("long")
    val spend = graft.Tables.t(s, dir, "orders")
      .groupBy($"o_custkey").agg(sum(cents).as("spend_cents"))
    val cust = graft.Tables.t(s, dir, "customer")
      .join(spend, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"c_nationkey", coalesce($"spend_cents", lit(0L)).as("spend_cents"))
    val nation = cust.groupBy($"c_nationkey")
      .agg(sum($"spend_cents").as("nation_cents"), count(lit(1)).as("nation_custs"))
    cust.join(nation, Seq("c_nationkey"))
      .filter($"spend_cents" * $"nation_custs" > $"nation_cents" * 2L)
      .select($"c_custkey", $"spend_cents")
      .orderBy($"c_custkey")
  }

  private val q42Sql =
    """WITH spend AS (
      |  SELECT c_custkey, c_nationkey,
      |    COALESCE((SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT)
      |              FROM orders WHERE o_custkey = c_custkey), 0) AS spend_cents
      |  FROM customer),
      |nat AS (SELECT c_nationkey, CAST(SUM(spend_cents) AS BIGINT) AS nation_cents,
      |    CAST(COUNT(*) AS BIGINT) AS nation_custs
      |  FROM spend GROUP BY c_nationkey)
      |SELECT s.c_custkey, s.spend_cents
      |FROM spend s JOIN nat n ON s.c_nationkey = n.c_nationkey
      |WHERE s.spend_cents * n.nation_custs > n.nation_cents * 2
      |ORDER BY s.c_custkey""".stripMargin

  /** q46 — custom typed Aggregator: exact bounded top-k per group (orders
    * by totalprice within each status). The aggregation ships O(k) buffers
    * map-side instead of window-sorting whole groups; oracle is the
    * equivalent ROW_NUMBER window. */
  private def q46(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val topk = graft.functions.TopK(3).toColumn
    graft.Tables.t(s, dir, "orders")
      .select($"o_orderstatus", $"o_totalprice", $"o_orderkey")
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(topk)
      .flatMap { case (status, hits) =>
        hits.zipWithIndex.map { case ((price, key), i) => (status, i + 1, key, price) }
      }
      .toDF("o_orderstatus", "rank", "o_orderkey", "o_totalprice")
      .orderBy($"o_orderstatus", $"rank")
  }

  private val q46Sql =
    """SELECT o_orderstatus, CAST(rank AS INTEGER) AS rank, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderstatus, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rank
      |  FROM orders) WHERE rank <= 3
      |ORDER BY o_orderstatus, rank""".stripMargin

  /** q49 — CUBE: all grouping-set combinations in one pass (completes the
    * grouping-sets family next to q40's ROLLUP). */
  private def q49(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.Tables.{dec, decStr}
    graft.Tables.t(s, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(sum(dec($"o_totalprice")).as("total"), count(lit(1)).as("n"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        decStr($"total").as("total"), $"n")
      .orderBy($"status", $"priority")
  }

  private val q49Sql =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS total,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Funnel deadline: stage-2/3 events must land within one day of the
    * anchoring first view. Part of the operator's semantics (first-touch
    * attribution with a fixed deadline), single-sourced into the oracle
    * SQL so both engines share one constant. 24 h is the widest window
    * at which the shipped fixtures exercise every stage 0–3 (the fastest
    * unconstrained view→purchase chain at sf0.001 takes ~4.3 h, so a
    * 1-hour deadline leaves stage 3 vacuously empty). */
  val FunnelWindowUs: Long = 86400L * 1000000L

  /** q82 — first-touch funnel over events: per user, the deepest prefix
    * of view → click → purchase completed within [[FunnelWindowUs]] of
    * the user's FIRST view (stage 0–3), plus the exact time-to-convert
    * for completers. The chain is the greedy first-touch rule every
    * funnel tool defaults to: the deadline anchors at the first view,
    * the earliest qualifying click is taken (which maximizes the room
    * left for the purchase under a fixed deadline), then the earliest
    * qualifying purchase. All arithmetic is exact epoch-micros longs.
    *
    * Scale shape: ONE hash exchange on user_id — the three chained
    * conditional window minima and the final per-user aggregate all
    * share that partitioning, so Catalyst plans a single Exchange
    * feeding stacked Window operators (no per-stage re-shuffle, no
    * self-joins, state O(1) per row). The same plan at 100 TB is one
    * shuffle of the events table, which is the floor for any per-user
    * computation. */
  /** The funnel aggregation over any (user_id, event_type, ts_us) frame —
    * single-sourced between the registered q82 and the streaming monitor
    * ([[graft.streaming.FunnelStream]] recomputes exactly this over a
    * touched user's full history). Unordered output (q82 adds the dump
    * ordering). */
  def funnelStages(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id")
    events
      .withColumn("v_us", min(when($"event_type" === "view", $"ts_us")).over(w))
      .withColumn("c_us", min(when($"event_type" === "click" &&
        $"ts_us" >= $"v_us" && $"ts_us" <= $"v_us" + FunnelWindowUs, $"ts_us")).over(w))
      .withColumn("p_us", min(when($"event_type" === "purchase" &&
        $"ts_us" >= $"c_us" && $"ts_us" <= $"v_us" + FunnelWindowUs, $"ts_us")).over(w))
      .groupBy($"user_id")
      .agg(
        max(when($"p_us".isNotNull, 3L).when($"c_us".isNotNull, 2L)
          .when($"v_us".isNotNull, 1L).otherwise(0L)).as("stage"),
        // null below stage 3 by construction: p_us is null there
        max($"p_us" - $"v_us").as("ttc_us"))
  }

  private def q82(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    funnelStages(graft.Tables.events(s, dir)).orderBy($"user_id")
  }

  /** q82's oracle with an extra predicate on the EVENTS (the q113
    * parameterization — the funnel definition is untouched, only the
    * surviving event set shrinks; mirrors [[graft.operators.Dedup]]'s
    * `q63SqlOn` / [[graft.operators.Similarity]]'s `q28SqlOn` shape). */
  private[graft] def q82SqlOn(pred: String): String =
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events WHERE 1=1$pred),
       |v AS (SELECT user_id, event_type, ts_us,
       |  MIN(CASE WHEN event_type = 'view' THEN ts_us END)
       |    OVER (PARTITION BY user_id) AS v_us FROM e),
       |c AS (SELECT *, MIN(CASE WHEN event_type = 'click'
       |    AND ts_us >= v_us AND ts_us <= v_us + $FunnelWindowUs THEN ts_us END)
       |    OVER (PARTITION BY user_id) AS c_us FROM v),
       |p AS (SELECT *, MIN(CASE WHEN event_type = 'purchase'
       |    AND ts_us >= c_us AND ts_us <= v_us + $FunnelWindowUs THEN ts_us END)
       |    OVER (PARTITION BY user_id) AS p_us FROM c)
       |SELECT user_id,
       |  CAST(MAX(CASE WHEN p_us IS NOT NULL THEN 3 WHEN c_us IS NOT NULL THEN 2
       |           WHEN v_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage,
       |  CAST(MAX(p_us - v_us) AS BIGINT) AS ttc_us
       |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin

  private[graft] val q82Sql = q82SqlOn("")

  /** Day length for q87's retention offsets — single-sourced into the
    * oracle. Epoch micros are non-negative, so truncating integer
    * division (Spark `div`, DuckDB `//`) IS floor division in both
    * engines. */
  val RetentionDayUs: Long = 86400L * 1000000L

  /** q87 — cohort retention by acquisition behavior: users are cohorted
    * by the TYPE of their first event (first-touch attribution, the q82
    * anchor rule — ties at the first timestamp break to the
    * lexicographically smallest type) and each cohort's retention curve
    * counts the distinct users active at each whole-day offset from
    * their own first event. The shipped events fixture makes calendar
    * cohorts vacuous (every user starts the same week), so behavioral
    * cohorts are the non-degenerate instance: 3 cohorts × ~30 offsets.
    * Exact integers end to end.
    *
    * Scale shape: the two chained window minima share ONE hash exchange
    * on user_id (the q82 stacked-Window plan — the floor for any
    * per-user derivation); the distinct + count then re-shuffle on the
    * (cohort, offset) key, which no plan can avoid since the output key
    * differs from the input key. Nothing driver-side. */
  private def q87(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
    graft.Tables.events(s, dir)
      .withColumn("first_ts", min($"ts_us").over(w))
      .withColumn("cohort",
        min(when($"ts_us" === $"first_ts", $"event_type")).over(w))
      .select($"cohort", $"user_id",
        (expr(s"ts_us div $RetentionDayUs") -
          expr(s"first_ts div $RetentionDayUs")).as("day_offset"))
      .distinct()
      .groupBy($"cohort", $"day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort", $"day_offset")
  }

  private val q87Sql =
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
       |f AS (SELECT *, MIN(ts_us) OVER (PARTITION BY user_id) AS first_ts FROM e),
       |c AS (SELECT *, MIN(CASE WHEN ts_us = first_ts THEN event_type END)
       |        OVER (PARTITION BY user_id) AS cohort FROM f),
       |d AS (SELECT DISTINCT cohort, user_id,
       |    ts_us // $RetentionDayUs - first_ts // $RetentionDayUs AS day_offset FROM c)
       |SELECT cohort, CAST(day_offset AS BIGINT) AS day_offset,
       |  CAST(COUNT(*) AS BIGINT) AS n_users
       |FROM d GROUP BY cohort, day_offset ORDER BY cohort, day_offset""".stripMargin

  val all: Seq[GQuery] = Seq(
    GQuery("q38_asof_join", q38, Some(q38Sql), bench = true),
    GQuery("q39_range_join", q39, Some(q39Sql)),
    GQuery("q40_rollup", q40, Some(q40Sql)),
    GQuery("q41_percentiles", q41, Some(q41Sql)),
    GQuery("q76_quantile_sketch", q76, Some(q76Sql)),
    GQuery("q42_decorrelated", q42, Some(q42Sql)),
    GQuery("q46_topk_aggregator", q46, Some(q46Sql)),
    GQuery("q49_cube", q49, Some(q49Sql)),
    GQuery("q82_funnel_stages", q82, Some(q82Sql)),
    GQuery("q87_cohort_retention", q87, Some(q87Sql)),
  )
}
