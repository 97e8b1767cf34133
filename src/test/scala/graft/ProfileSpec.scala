package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The single-pass profiler on a null-bearing frame: nulls must be
  * counted by n_nulls but EXCLUDED from the distinct estimate and the
  * extrema — the SQL aggregate semantics the DuckDB oracle implements
  * (`WHERE expr IS NOT NULL`). The harness corpus has no nulls, so this
  * path is only exercised here. */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("nulls: counted, excluded from n_distinct_est and extrema") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (3L, null), (4L, "a"), (null, "c"), (null, null))
      .toDF("id", "s")
    val prof = Profile.profile(df, Seq(
        ("id", _ => col("id")), ("s", _ => col("s"))))
      .collect().map(r => r.getString(0) -> r).toMap

    val idRow = prof("id")
    assert(idRow.getLong(1) === 6L, "n_rows")
    assert(idRow.getLong(2) === 2L, "n_nulls")
    // below k the KMV sketch is exact — and must not count a phantom
    // value for the nulls (the primitive-encoder coercion bug)
    assert(idRow.getLong(3) === 4L, "n_distinct_est over non-null ids")
    assert(idRow.getString(4) === "1", "min ignores nulls")
    assert(idRow.getString(5) === "4", "max ignores nulls")

    val sRow = prof("s")
    assert(sRow.getLong(2) === 2L, "n_nulls")
    assert(sRow.getLong(3) === 3L, "n_distinct_est over a, b, c")
    assert(sRow.getString(4) === "a")
    assert(sRow.getString(5) === "c")
  }

  test("all-null column: zero distinct, null extrema") {
    import spark.implicits._
    val df = Seq(("x"), ("y")).toDF("k")
      .withColumn("dead", lit(null).cast("string"))
    val row = Profile.profile(df, Seq(("dead", _ => col("dead"))))
      .collect().head
    assert(row.getLong(2) === 2L, "n_nulls")
    assert(row.getLong(3) === 0L, "n_distinct_est")
    assert(row.isNullAt(4) && row.isNullAt(5), "extrema stay null")
  }
}
