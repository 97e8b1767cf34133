package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared plumbing for the query registry.
  *
  * Every operator the engine exposes is declared as a [[GQuery]]: a named
  * DataFrame program over the driver's parquet tables plus (where the
  * semantics are SQL-expressible) an equivalent DuckDB oracle query. The
  * driver's harness hash-compares the two at sf0.01 — so both sides are
  * written for *bit-exact* parity:
  *
  *   - money/double SUMs go through DECIMAL(38,6) (exact, order-independent)
  *   - single-op double arithmetic (one divide, one multiply) is IEEE-exact
  *     and therefore safe; multi-row double accumulation is not and is avoided
  *   - counts are BIGINT on both sides (DuckDB sum(int) yields HUGEINT — the
  *     oracle SQL always casts)
  *   - timestamps are emitted as formatted strings (engines disagree on
  *     physical timestamp encodings)
  *   - every result carries a deterministic total ORDER BY
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** include in the per-round benchmark headline set */
    bench: Boolean = false,
    /** Production configuration of the same operator for the bench to
      * time, where the oracled `run` deliberately pays an oracle-only cost
      * (e.g. the md5 hash family whose only purpose is DuckDB parity).
      * The correctness gate always checks `run`; a benchRun must be the
      * same operator under a production knob, never a different query —
      * and a spec must pin the two configurations to each other. */
    benchRun: Option[(SparkSession, String) => DataFrame] = None,
)

object Tables {
  /** Read one of the driver's parquet tables (region, nation, customer,
    * supplier, part, orders, lineitem, events, documents, embeddings). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact-sum decimal: cast before aggregating so the sum is
    * order-independent and identical across engines. */
  def dec(c: Column): Column = c.cast(DecimalType(38, 6))

  /** Hash-stable rendering of a DECIMAL(38,6) result column.
    *
    * The driver's compare may read the Spark parquet and the DuckDB result
    * through different client paths (pyarrow keeps `decimal.Decimal`,
    * duckdb's fetchdf converts DECIMAL → float64), so a decimal that is
    * *numerically* identical on both engines can still hash-differ purely by
    * Python-side representation. Rendering to a fixed-scale string on BOTH
    * engines removes the ambiguity: Spark's decimal→string is
    * BigDecimal.toString (plain notation for scale 6: "1.500000") and
    * DuckDB's DECIMAL→VARCHAR prints the same fixed-scale form. The sum
    * itself stays decimal-exact; only the final rendering changes.
    * Oracle side: wrap with CAST(... AS VARCHAR). */
  def decStr(c: Column): Column = c.cast("string")

  /** events with an exact epoch-micros column `ts_us`. The driver's events
    * table stores TIMESTAMP(NANOS); with `spark.sql.legacy.parquet.nanosAsLong`
    * it surfaces as epoch-nanos Long and `div 1000` (integer division — a
    * double round-trip would lose precision above 2^53) matches DuckDB's
    * nanos→micros truncation exactly. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "events")
    val us = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    df.withColumn("ts_us", us)
  }
}
