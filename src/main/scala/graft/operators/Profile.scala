package graft.operators

import graft.GQuery
import graft.Tables.t
import graft.functions.HashFamily
import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** q73 — table profiler: the per-column audit (row count, nulls, min/max,
  * approximate distinct cardinality) a pipeline runs before admitting a new
  * data drop. ONE scan computes every metric for every column — nulls and
  * extrema as plain aggregates, cardinality through the [[KmvSketch]]
  * estimator lifted into an untyped UDAF (`functions.udaf`), all combined
  * in a single wide aggregation row that is then unpivoted driver-free into
  * the long (column, metrics) form. No per-column rescans, no shuffle
  * beyond the one aggregation — the profile of a 100 TB table costs one
  * pass.
  *
  * Extrema are computed in each column's native order and rendered to
  * string afterwards (lexicographic min of "10"/"9" would be wrong);
  * cardinality hashes the string rendering so one estimator serves every
  * type, and the Oracle hash family makes the ESTIMATE itself — not just
  * the exact metrics — reproducible in DuckDB.
  */
object Profile {

  private val Cols: Seq[(String, DataFrame => Column)] = Seq(
    ("doc_id", _ => col("doc_id")),
    ("lang", _ => col("lang")),
    ("n_chars", _ => col("n_chars")),
    ("source", _ => col("source")),
    ("text_len", _ => length(col("text"))))

  /** The single-pass profiler over arbitrary (name, column) pairs —
    * public so ProfileSpec can drive it over a null-bearing frame. The
    * KMV input hashes only non-null values ([[graft.functions.KmvSketchBoxed]]
    * skips nulls, `hash63` of a null renders null), matching the oracle's
    * `WHERE expr IS NOT NULL`. */
  def profile(docs: DataFrame, cols: Seq[(String, DataFrame => Column)]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val kmvU = udaf(graft.functions.KmvSketchBoxed(TextOps.KmvK), Encoders.LONG)
    val aggs: Seq[Column] = cols.flatMap { case (name, f) =>
      val c = f(docs)
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${name}_nulls"),
        min(c).cast("string").as(s"${name}_min"),
        max(c).cast("string").as(s"${name}_max"),
        kmvU(HashFamily.Oracle.hash63(c.cast("string"))).as(s"${name}_nd"))
    } :+ count(lit(1)).as("n_rows")
    val wide = docs.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row into (column, metrics) — an inline over
    // a literal-built struct array, no driver round-trip
    wide.select($"n_rows", inline(array(cols.map { case (name, _) =>
        struct(lit(name).as("column"),
          col(s"${name}_nulls").as("n_nulls"),
          col(s"${name}_nd").as("n_distinct_est"),
          col(s"${name}_min").as("min_val"),
          col(s"${name}_max").as("max_val"))
      }: _*)))
      .select($"column", $"n_rows".cast("long").as("n_rows"),
        $"n_nulls".cast("long").as("n_nulls"), $"n_distinct_est",
        $"min_val", $"max_val")
      .orderBy($"column")
  }

  private def q73(s: SparkSession, dir: String): DataFrame =
    profile(t(s, dir, "documents"), Cols)

  private def q73Sql = {
    val k = TextOps.KmvK
    def one(name: String, sqlExpr: String) = {
      val h = Dedup.hash63Sql(s"CAST($sqlExpr AS VARCHAR)")
      s"""SELECT '$name' AS "column",
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_rows,
         |  (SELECT CAST(SUM(CASE WHEN $sqlExpr IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM documents) AS n_nulls,
         |  (SELECT CAST(CASE WHEN nd < $k THEN nd
         |       ELSE floor(${k - 1}.0 / (CAST(x AS DOUBLE) / 9223372036854775808.0)) END AS BIGINT)
         |   FROM (SELECT x, row_number() OVER (ORDER BY x) AS rn, COUNT(*) OVER () AS nd
         |         FROM (SELECT DISTINCT $h AS x FROM documents WHERE $sqlExpr IS NOT NULL))
         |   WHERE rn = CASE WHEN nd < $k THEN nd ELSE $k END) AS n_distinct_est,
         |  (SELECT CAST(MIN($sqlExpr) AS VARCHAR) FROM documents) AS min_val,
         |  (SELECT CAST(MAX($sqlExpr) AS VARCHAR) FROM documents) AS max_val""".stripMargin
    }
    Seq(
      one("doc_id", "doc_id"), one("lang", "lang"), one("n_chars", "n_chars"),
      one("source", "source"), one("text_len", "length(text)"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
  }

  val all: Seq[GQuery] = Seq(
    GQuery("q73_table_profile", q73, Some(q73Sql)),
  )
}
