package graft.operators

import graft.{GQuery, Tables}
import graft.Tables.{dec, decStr, t}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator pack — the reference's scan/filter/join/aggregate/
  * set-op surface (SURVEY.md §2.1–§2.6) re-expressed over the driver's
  * TPC-H-ish tables so that each operator shape has a DuckDB oracle.
  *
  * Operator provenance (reference file:line is cited per query):
  *  - point lookup  P1  `/root/reference/src/database.rs:137-148`
  *  - projections   P5  `/root/reference/src/database.rs:164-176`
  *  - predicate     P7  `/root/reference/src/sync.rs:83`
  *  - anti/except   J1/J2 `/root/reference/src/sync.rs:126-151`
  *  - equi joins    J3  `/root/reference/src/database.rs:372-375`
  *  - update join   J5/J7 `/root/reference/src/database.rs:256-292,311-320`
  *  - count/sum     A1/A2 `/root/reference/src/database.rs:179-197`, sync.rs:256
  *  - dedup         A3  `/root/reference/src/database.rs:546-555`
  *
  * Scale notes: provably-tiny dimensions (nation/region, fixed-size) are
  * broadcast-hinted; anything that scales with data (customer, id sets) is
  * left to AQE's runtime size decision. The genuinely large-large join
  * (lineitem⋈orders) shuffles on its natural key and relies on AQE for
  * skew; aggregates are partial (map-side) by construction. All
  * filters/projections are plain column expressions so they push into the
  * parquet scan.
  */
object Relational {

  /** q01 — TPC-H Q1 shape: filtered scan → grouped exact-decimal sums (A1/A2). */
  private def q01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        decStr(sum(dec($"l_quantity"))).as("sum_qty"),
        decStr(sum(dec($"l_extendedprice"))).as("sum_base_price"),
        decStr(sum(dec($"l_extendedprice" * (lit(1.0) - $"l_discount")))).as("sum_disc_price"),
        decStr(sum(dec($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,6))) AS VARCHAR) AS sum_charge,
      |  CAST(COUNT(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02 — filter + projection; predicate and column pruning reach the
    * parquet scan (P5/P7). */
  private def q02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp") &&
        $"l_quantity" >= 48.0)
      .select($"l_orderkey", $"l_partkey", $"l_linenumber", $"l_quantity", $"l_returnflag")
      .orderBy($"l_orderkey", $"l_partkey", $"l_linenumber")
  }

  private val q02Sql =
    """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_returnflag
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND l_quantity >= 48.0
      |ORDER BY l_orderkey, l_partkey, l_linenumber""".stripMargin

  /** q03 — point lookup by key (P1, `database.rs:137-148`): scalar-subquery
    * min key, broadcast to a single-row filter. */
  private def q03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val minKey = o.agg(min($"o_orderkey").as("k"))
    o.join(broadcast(minKey), $"o_orderkey" === $"k")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice",
        date_format($"o_orderdate", "yyyy-MM-dd").as("o_date"))
  }

  private val q03Sql =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_date
      |FROM orders WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders)""".stripMargin

  /** q04 — star join through broadcast dimensions (J3 shape):
    * orders⋈customer⋈nation⋈region → revenue per region. */
  private def q04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey") // customer scales; AQE decides
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(decStr(sum(dec($"o_totalprice"))).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy($"r_name")
  }

  private val q04Sql =
    """SELECT r_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** q05 — large-large shuffle join lineitem⋈orders on the natural key;
    * sort-merge/AQE territory at 100 TB. */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(
        decStr(sum(dec($"l_extendedprice" * (lit(1.0) - $"l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
  }

  private val q05Sql =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q06 — anti join (J1, `sync.rs:126-136`): customers with no 'P'-status
    * order. */
  private def q06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pend = t(s, dir, "orders").filter($"o_orderstatus" === "P")
    t(s, dir, "customer")
      .join(pend, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  private val q06Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  /** q07 — semi join (existence probe P2/P3 shape, `database.rs:334-353`):
    * suppliers with at least one max-quantity line item. */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = t(s, dir, "lineitem").filter($"l_quantity" >= 49.0)
    t(s, dir, "supplier")
      .join(big, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }

  private val q07Sql =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_suppkey = s_suppkey AND l_quantity >= 49.0)
      |ORDER BY s_suppkey""".stripMargin

  /** q08 — deterministic dedup (A3, `database.rs:546-555`): keep exactly one
    * row per key via row_number — the relational form of Cypher's
    * "keep head, delete tail". */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey")
      .orderBy($"o_custkey")
  }

  private val q08Sql =
    """SELECT o_custkey, o_orderkey FROM (
      |  SELECT o_custkey, o_orderkey,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  /** q09 — per-group top-k (window ranking; extension beyond reference §2.5). */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  private val q09Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** q10 — set difference (J1/J2, `sync.rs:126-151`): custkeys active in
    * 1995 but not in 1996. Spark `except` == SQL EXCEPT (distinct). */
  private def q10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    def yr(y: Int) = o.filter(year($"o_orderdate") === y).select($"o_custkey")
    yr(1995).except(yr(1996)).orderBy($"o_custkey")
  }

  private val q10Sql =
    """SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
      |ORDER BY o_custkey""".stripMargin

  /** q11 — union-distinct (§2.6 implicit union of edge sets). */
  private def q11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    c.filter($"c_acctbal" < 0.0).select($"c_custkey")
      .union(c.filter($"c_acctbal" > 9000.0).select($"c_custkey"))
      .distinct()
      .orderBy($"c_custkey")
  }

  private val q11Sql =
    """SELECT c_custkey FROM customer WHERE c_acctbal < 0.0
      |UNION
      |SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
      |ORDER BY c_custkey""".stripMargin

  /** q12 — snapshot-upsert join (J7, `database.rs:256-292`): fold a per-key
    * aggregate snapshot onto the base table with COALESCE defaults — the
    * bulk form of the reference's 8.5k per-row SET statements. */
  private def q12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val snap = t(s, dir, "orders")
      .filter($"o_orderstatus" === "P")
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("pcnt"), sum(dec($"o_totalprice")).as("pspend"))
    t(s, dir, "customer")
      .join(snap, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey",
        coalesce($"pcnt", lit(0L)).as("pending_orders"),
        decStr(coalesce($"pspend", lit(BigDecimal(0)).cast("decimal(38,6)"))).as("pending_spend"))
      .orderBy($"c_custkey")
  }

  private val q12Sql =
    """SELECT c_custkey,
      |  COALESCE(pcnt, 0) AS pending_orders,
      |  CAST(COALESCE(pspend, CAST(0 AS DECIMAL(38,6))) AS VARCHAR) AS pending_spend
      |FROM customer LEFT JOIN (
      |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS pcnt,
      |    SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS pspend
      |  FROM orders WHERE o_orderstatus = 'P' GROUP BY o_custkey) s
      |ON c_custkey = o_custkey
      |ORDER BY c_custkey""".stripMargin

  /** q15 — group-by + HAVING (A1 with predicate on the aggregate). */
  private def q15(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .filter($"n_customers" > 20)
      .orderBy($"c_mktsegment")
  }

  private val q15Sql =
    """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
      |FROM customer GROUP BY c_mktsegment
      |HAVING COUNT(*) > 20 ORDER BY c_mktsegment""".stripMargin

  /** q16 — global top-k: order-by + limit compiles to TakeOrderedAndProject
    * (no full sort at scale). */
  private def q16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
  }

  private val q16Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** q13 — the reference's risk formula (E1/E2, `database.rs:324-332`,
    * `sync.rs:303-307`) applied to the events table: per-user
    * kills²/jumps + global baseline. Pure column arithmetic, no UDF; each
    * double op is a single IEEE operation so the oracle matches bit-exactly. */
  private def q13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val perUser = ev.groupBy($"user_id").agg(
      sum(when($"event_type" === "error", 1L).otherwise(0L)).as("kills"),
      sum(when($"event_type".isin("click", "view"), 1L).otherwise(0L)).as("jumps"))
    val totals = perUser.agg(
      sum($"kills").as("tk"), sum($"jumps").as("tj"))
    val baseline = when(col("tj") > 0L, col("tk").cast("double") / col("tj").cast("double"))
      .otherwise(lit(0.01))
    val kills2 = col("kills").cast("double") * col("kills").cast("double")
    perUser.crossJoin(broadcast(totals))
      .select($"user_id", $"kills", $"jumps",
        (when($"jumps" > 0L, kills2 / col("jumps").cast("double")).otherwise(kills2)
          + baseline).as("risk"))
      .orderBy($"user_id")
  }

  private val q13Sql =
    """WITH per_user AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS kills,
      |    CAST(SUM(CASE WHEN event_type IN ('click','view') THEN 1 ELSE 0 END) AS BIGINT) AS jumps
      |  FROM events GROUP BY user_id),
      |tot AS (SELECT CAST(SUM(kills) AS BIGINT) AS tk, CAST(SUM(jumps) AS BIGINT) AS tj FROM per_user)
      |SELECT user_id, kills, jumps,
      |  (CASE WHEN jumps > 0 THEN CAST(kills AS DOUBLE) * CAST(kills AS DOUBLE) / CAST(jumps AS DOUBLE)
      |        ELSE CAST(kills AS DOUBLE) * CAST(kills AS DOUBLE) END
      |   + CASE WHEN tj > 0 THEN CAST(tk AS DOUBLE) / CAST(tj AS DOUBLE) ELSE 0.01 END) AS risk
      |FROM per_user, tot ORDER BY user_id""".stripMargin

  /** q14 — sessionization over events: a new session starts after a >30 min
    * gap per user (lag window + conditional sum). */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    Tables.events(s, dir)
      .withColumn("prev", lag($"ts_us", 1).over(w))
      .withColumn("new_sess",
        when($"prev".isNull || ($"ts_us" - $"prev") > 1800L * 1000000L, 1L).otherwise(0L))
      .groupBy($"user_id")
      .agg(sum($"new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  private val q14Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events)
      |SELECT user_id,
      |  CAST(SUM(CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q45 — TPC-H Q3 shape: selective filters on both sides of a
    * fact-fact join, grouped revenue, global top-k by revenue. */
  private def q45(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cut = lit("1998-01-01").cast("timestamp")
    val cust = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
    val ord = t(s, dir, "orders").filter($"o_orderdate" < cut)
    val li = t(s, dir, "lineitem").filter($"l_shipdate" > cut)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey", "left_semi")
      .groupBy($"l_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"), $"o_orderpriority")
      .agg(sum(dec($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
      // top-k is selected on the DECIMAL value; only the rendering is string
      .withColumn("revenue", decStr($"revenue"))
  }

  private val q45Sql =
    """SELECT l_orderkey, orderdate, o_orderpriority,
      |  CAST(revenue AS VARCHAR) AS revenue
      |FROM (
      |  SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |    o_orderpriority,
      |    SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS revenue
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |    AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |    AND EXISTS (SELECT 1 FROM customer
      |      WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
      |  GROUP BY l_orderkey, orderdate, o_orderpriority
      |  ORDER BY revenue DESC, l_orderkey LIMIT 10)""".stripMargin

  /** q47 — TPC-H Q7 shape: five-way join through both dimension paths
    * (supplier-nation and customer-nation), bilateral filter, grouped
    * yearly volume. */
  private def q47(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n1 = t(s, dir, "nation").select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))
    val n2 = t(s, dir, "nation").select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(t(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(n1), $"s_nationkey" === $"s_nk")
      .join(broadcast(n2), $"c_nationkey" === $"c_nk")
      .filter($"s_nk" < 5 && $"c_nk" >= 20)
      .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").as("l_year"))
      .agg(decStr(sum(dec($"l_extendedprice" * (lit(1.0) - $"l_discount")))).as("volume"),
        count(lit(1)).as("n"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  private val q47Sql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS volume,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_nationkey < 5 AND n2.n_nationkey >= 20
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  val all: Seq[GQuery] = Seq(
    GQuery("q01_pricing_summary", q01, Some(q01Sql), bench = true),
    GQuery("q02_filter_project", q02, Some(q02Sql), bench = true),
    GQuery("q03_point_lookup", q03, Some(q03Sql)),
    GQuery("q04_star_join", q04, Some(q04Sql), bench = true),
    GQuery("q05_bigjoin_agg", q05, Some(q05Sql), bench = true),
    GQuery("q06_antijoin", q06, Some(q06Sql)),
    GQuery("q07_semijoin", q07, Some(q07Sql)),
    GQuery("q08_dedup_keyed", q08, Some(q08Sql)),
    GQuery("q09_window_topk", q09, Some(q09Sql), bench = true),
    GQuery("q10_except", q10, Some(q10Sql)),
    GQuery("q11_union_distinct", q11, Some(q11Sql)),
    GQuery("q12_snapshot_upsert", q12, Some(q12Sql)),
    GQuery("q13_risk_scores", q13, Some(q13Sql)),
    GQuery("q14_sessionize", q14, Some(q14Sql), bench = true),
    GQuery("q15_having", q15, Some(q15Sql)),
    GQuery("q16_global_topk", q16, Some(q16Sql)),
    GQuery("q45_shipping_priority", q45, Some(q45Sql), bench = true),
    GQuery("q47_bilateral_volume", q47, Some(q47Sql)),
  )
}
