package graft.operators

import graft.GQuery
import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting operators for a training-data
  * pipeline over `documents` — the ops a 100 TB corpus needs between dedup
  * and training:
  *
  *  - q50: hash-based train/valid/test split. Random sampling is
  *    nondeterministic across engines and re-runs; hashing the stable key
  *    gives a split that is reproducible, stable under corpus growth (a
  *    document never changes split when others are added), and pure
  *    per-row projection — no shuffle, no state, embarrassingly parallel.
  *  - q51: stratified quota sampling — top-N per stratum in deterministic
  *    hash order, the class-balancing primitive. One shuffle on the
  *    stratum key; at scale a skewed stratum is bounded by the same
  *    window-rank plan TakeOrdered uses per partition (rank is computed
  *    within each stratum only).
  *  - q52: TPC-H Q20-shaped correlated-aggregate semi-join on the
  *    relational side — "suppliers that dominate a part's shipments" —
  *    two partial aggregations joined on the group key, never a
  *    row-per-row correlated probe.
  *
  * All three are exact and deterministic, so each carries a full DuckDB
  * oracle (the hash is the md5-derived [[Dedup.hash63]]).
  */
object Sampling {

  import graft.functions.HashFamily

  private def h(c: org.apache.spark.sql.Column,
      family: HashFamily = HashFamily.Oracle) = family.hash63(c.cast("string"))
  private def hSql(x: String) = Dedup.hash63Sql(s"CAST($x AS VARCHAR)")

  /** Deterministic hash split over any keyed DataFrame — the library
    * surface behind q50. Production runs pass [[HashFamily.Fast]]; the
    * registered query stays in Oracle mode for the DuckDB gate (the hash
    * is per-row, so unlike the per-shingle dedup hashing the md5 cost is
    * proportional to row count, not token count). */
  def hashSplit(df: DataFrame, key: org.apache.spark.sql.Column,
      family: HashFamily = HashFamily.Oracle): DataFrame =
    df.select(key.as("doc_id"), (h(key, family) % 100L).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80L, lit("train"))
          .when(col("bucket") < 90L, lit("valid"))
          .otherwise(lit("test")))

  /** q50 — deterministic 80/10/10 split keyed on doc_id. */
  private def q50(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    hashSplit(t(s, dir, "documents"), $"doc_id").orderBy($"doc_id")
  }

  private val q50Sql =
    s"""SELECT doc_id, ${hSql("doc_id")} % 100 AS bucket,
       |  CASE WHEN ${hSql("doc_id")} % 100 < 80 THEN 'train'
       |       WHEN ${hSql("doc_id")} % 100 < 90 THEN 'valid'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  val QuotaPerStratum = 20

  /** q51 — per-language quota sample: first [[QuotaPerStratum]] docs per
    * lang in (hash, doc_id) order. Implemented as a bounded typed
    * [[graft.functions.BottomK]] aggregate, NOT a window: partial
    * aggregation ships O(quota) per partition per stratum, where a
    * row_number window would shuffle and sort every row of every stratum
    * — the difference between a sliver and a full corpus sort at 100 TB.
    * Exact 64-bit ordering keeps the output identical to the window
    * formulation (and the SQL oracle). */
  private def q51(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"lang", $"doc_id", h($"doc_id").as("hkey"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._3, r._2)) // (hash, doc_id) ascending
      .agg(graft.functions.BottomK(QuotaPerStratum).toColumn)
      .flatMap { case (lang, picks) =>
        picks.zipWithIndex.map { case ((_, id), i) => (lang, id, i + 1) }
      }
      .toDF("lang", "doc_id", "rk")
      .orderBy($"lang", $"rk")
  }

  private val q51Sql =
    s"""SELECT lang, doc_id, rk FROM (
       |  SELECT lang, doc_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY ${hSql("doc_id")}, doc_id) AS INTEGER) AS rk
       |  FROM documents)
       |WHERE rk <= $QuotaPerStratum ORDER BY lang, rk""".stripMargin

  /** q52 — suppliers shipping an outsized share (>20%) of some part's
    * total volume (TPC-H Q20 shape adapted to the available tables: the
    * correlated "share of this part's shipments" aggregate becomes two
    * partial aggregations joined on l_partkey — never a row-per-row
    * correlated probe; decimal compare keeps the share test exact). The
    * 20% bar is what the synthetic data exercises — no supplier reaches
    * 50% at sf≥0.001, and a vacuous result set proves nothing. */
  private def q52(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perPair = t(s, dir, "lineitem")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity".cast("decimal(38,6)")).as("pair_qty"))
    val perPart = t(s, dir, "lineitem")
      .groupBy($"l_partkey".as("p_key"))
      .agg(sum($"l_quantity".cast("decimal(38,6)")).as("part_qty"))
    val dominant = perPair
      .join(perPart, $"l_partkey" === $"p_key")
      .filter($"pair_qty" * 5 > $"part_qty")
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_dominated"))
    dominant
      .join(t(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey", "left_semi")
      .select($"l_suppkey".as("s_suppkey"), $"n_dominated")
      .orderBy($"s_suppkey")
  }

  private val q52Sql =
    """WITH pair AS (
      |  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(38,6))) AS pair_qty
      |  FROM lineitem GROUP BY l_partkey, l_suppkey),
      |part_tot AS (
      |  SELECT l_partkey AS p_key, SUM(CAST(l_quantity AS DECIMAL(38,6))) AS part_qty
      |  FROM lineitem GROUP BY l_partkey),
      |dom AS (
      |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_dominated
      |  FROM pair JOIN part_tot ON l_partkey = p_key
      |  WHERE pair_qty * 5 > part_qty
      |  GROUP BY l_suppkey)
      |SELECT l_suppkey AS s_suppkey, n_dominated
      |FROM dom WHERE l_suppkey IN (SELECT s_suppkey FROM supplier)
      |ORDER BY s_suppkey""".stripMargin

  /** Per-source token budget for q81 — small enough that the cut binds at
    * every shipped SF (sources average ≳750 whitespace tokens even at
    * sf0.001), so the admitted set is a real prefix, not the whole
    * corpus. */
  val TokenBudgetPerSource = 400L

  /** q81 — token-budget mixture sampling: the "data mixing" step of a
    * training pipeline. For each source, admit documents in deterministic
    * (hash, doc_id) order until the cumulative whitespace-token count
    * fills [[TokenBudgetPerSource]] — reproducible (hash order, like
    * q50/q51), budgeted in TOKENS (what a training run actually buys),
    * and stable under corpus growth within a source prefix. Implemented
    * as the bounded typed [[graft.functions.BudgetBottom]] aggregate, NOT
    * a window: partial aggregation ships O(budget) rows per partition per
    * source, where the ROW_NUMBER/SUM-OVER oracle formulation would
    * shuffle and sort every document of every source — at 100 TB the
    * budget is a sliver and the window is the corpus. */
  private def q81(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"source", $"doc_id", h($"doc_id").as("hkey"),
        size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._3, r._2, r._4)) // (hash, doc_id, n_tokens) ascending
      .agg(graft.functions.BudgetBottom(TokenBudgetPerSource).toColumn)
      .flatMap { case (source, picks) =>
        var cum = 0L
        picks.zipWithIndex.map { case ((_, id, n), i) =>
          cum += n
          (source, id, n, cum, i + 1)
        }
      }
      .toDF("source", "doc_id", "n_tokens", "cum_tokens", "rk")
      .orderBy($"source", $"rk")
  }

  private val q81Sql =
    s"""SELECT source, doc_id, n_tokens, cum_tokens, rk FROM (
       |  SELECT source, doc_id, n_tokens,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY hk, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY hk, doc_id) AS INTEGER) AS rk
       |  FROM (SELECT source, doc_id,
       |          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |          ${hSql("doc_id")} AS hk
       |        FROM documents))
       |WHERE cum_tokens <= $TokenBudgetPerSource ORDER BY source, rk""".stripMargin

  // ---------------------------------------------------------------------
  // q137 — temperature-scaled language mixing (the multilingual
  // α-sampling knob: exponential smoothing of per-language sampling
  // rates, Conneau et al. 2020 "Unsupervised Cross-lingual Representation
  // Learning at Scale" §3 / Devlin et al.'s mBERT recipe): per-language
  // quota ∝ n_lang^α with α = 1/2 — high-resource languages are
  // DOWN-weighted relative to proportional sampling, low-resource ones
  // up — then the quota fills in deterministic hash order (q51's
  // machinery). Where q51 fixes one quota per stratum and q81 buys
  // TOKENS per source in hash order, this derives the quotas themselves
  // from the corpus distribution — the third member of the mixing family.
  //
  // Exactness: weight = sqrt(n) is ONE IEEE op on an integer both
  // engines hold exactly; the weight total — a float sum over languages,
  // order-dependent — rides the q133 decimal-cast trick; the quota is
  // floor(budget·w/total + 0.5) (explicit floor-based round-half-up, the
  // q62 discipline — round() half-even/half-away semantics differ across
  // engines). Scale shape: the language aggregate is languages-sized
  // (broadcast by construction), ranks come from the BottomK bounded
  // aggregate (O(budget) partials, never a corpus window sort), and the
  // quota join broadcasts.
  // ---------------------------------------------------------------------

  /** Total documents the temperature mix admits. */
  val MixBudget = 100

  private def q137(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val cnt = docs.groupBy($"lang").agg(count(lit(1)).as("n"))
    val tot = cnt.agg(
      sum(sqrt($"n".cast("double")).cast("decimal(38,12)")).as("tw"))
    val quotas = cnt.crossJoin(broadcast(tot))
      .withColumn("quota", greatest(lit(1L),
        floor(lit(MixBudget.toDouble) * sqrt($"n".cast("double")) /
          $"tw".cast("double") + lit(0.5)).cast("long")))
      .select($"lang", $"quota")
    val ranked = docs
      .select($"lang", $"doc_id", h($"doc_id").as("hkey"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._3, r._2))
      .agg(graft.functions.BottomK(MixBudget).toColumn)
      .flatMap { case (lang, picks) =>
        picks.zipWithIndex.map { case ((_, id), i) => (lang, i + 1, id) }
      }
      .toDF("lang", "rk", "doc_id")
    ranked.join(broadcast(quotas), "lang")
      .filter($"rk" <= $"quota")
      .select($"lang", $"rk", $"doc_id", $"quota")
      .orderBy($"lang", $"rk")
  }

  private val q137Sql =
    s"""WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
       |tot AS (SELECT SUM(CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(38,12))) AS tw FROM cnt),
       |q AS (SELECT lang,
       |    GREATEST(1, CAST(floor(${MixBudget.toDouble} * sqrt(CAST(n AS DOUBLE)) / CAST(t.tw AS DOUBLE) + 0.5) AS BIGINT)) AS quota
       |  FROM cnt CROSS JOIN tot t),
       |r AS (SELECT lang, doc_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY ${hSql("doc_id")}, doc_id) AS INTEGER) AS rk
       |  FROM documents)
       |SELECT lang, rk, doc_id, quota FROM r JOIN q USING (lang)
       |WHERE rk <= quota ORDER BY lang, rk""".stripMargin

  // registry LAST: object vals initialize in declaration order, so every
  // referenced qNNNSql must already be assigned (a GQuery capturing a
  // not-yet-initialized val silently carries null into oracle_sql.json)
  val all: Seq[GQuery] = Seq(
    GQuery("q50_hash_split", q50, Some(q50Sql)),
    GQuery("q51_stratified_sample", q51, Some(q51Sql)),
    GQuery("q52_supplier_share", q52, Some(q52Sql)),
    GQuery("q81_token_budget_mix", q81, Some(q81Sql)),
    GQuery("q137_temperature_mixing", q137, Some(q137Sql)),
  )
}
