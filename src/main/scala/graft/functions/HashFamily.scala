package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable base-hash family for the dedup/sampling pipeline.
  *
  * Two implementations with one contract:
  *
  *  - [[HashFamily.Oracle]] — md5-derived arithmetic form that DuckDB can
  *    replicate token-for-token, making every downstream operator exactly
  *    oracle-checkable. md5 costs ~10× a non-cryptographic hash, so this
  *    mode exists for the correctness gate, not for production corpora.
  *  - [[HashFamily.Fast]] — xxhash64 (Spark's codegen'd native expression,
  *    the same family Flink/ClickHouse use for content hashing). This is
  *    the default a 100 TB run should use: identical pipeline shape,
  *    identical *verified* output wherever verification is an exact
  *    metric over the raw data (n-gram Jaccard), and only the candidate
  *    sets — never the verified answers — can differ.
  *
  * The family provides only the per-row base hash. MinHash permutations
  * are built ON TOP of the base hash by [[MinHashParams]] — a universal
  * family `h_k(x) = (a_k·x + b_k) mod p` over the 31-bit Mersenne prime
  * field, whose constants are family-independent public parameters.
  */
sealed trait HashFamily {
  /** Non-negative 63-bit hash of a column. */
  def hash63(c: Column): Column
}

object HashFamily {

  /** md5-derived, DuckDB-reproducible (see [[graft.operators.Dedup.hash63Sql]]). */
  case object Oracle extends HashFamily {
    def hash63(c: Column): Column =
      (conv(substring(md5(c), 1, 8), 16, 10).cast("long") % 2147483648L) * 4294967296L +
        conv(substring(md5(c), 9, 8), 16, 10).cast("long")
  }

  /** xxhash64-based production family; the sign-bit mask keeps the value
    * non-negative without disturbing the low 63 bits. */
  case object Fast extends HashFamily {
    def hash63(c: Column): Column = xxhash64(c).bitwiseAND(lit(Long.MaxValue))
  }
}

/** MinHash permutation parameters — the universal hash family
  * `h_k(x) = (a_k·x + b_k) mod p`, p = 2³¹ − 1 (Mersenne prime).
  *
  * Working in the 31-bit field is what makes the family BOTH correct and
  * overflow-free on every engine: `a_k < p` and `x < p`, so `a_k·x + b_k`
  * stays under 2⁶² — no 128-bit arithmetic, no signed wraparound under
  * ANSI mode — while the multiply genuinely reorders the field for every
  * k. (An additive form `h1 + k·h2` with small `k·h2` cannot reorder a
  * 62-bit `h1` — all "permutations" collapse to the same argmin shingle,
  * which silently degrades a 64-permutation signature into a single-hash
  * sample. HashFamilySpec guards against that failure mode directly.)
  *
  * The per-k constants derive from the SAME md5 arithmetic as
  * [[HashFamily.Oracle.hash63]], evaluated once on the driver — 128
  * scalar digests at plan-build time, zero per-row cost — so the DuckDB
  * oracle reproduces them with `md5('a' || k)` over `range(64)`, and the
  * Fast family shares them verbatim (constants are public parameters of
  * the sketch, not part of the per-row hashing budget).
  */
object MinHashParams {
  val P: Long = 2147483647L // 2^31 − 1

  /** Driver-side replica of the hash63 md5 arithmetic (hex prefix splits,
    * same values as the Spark column form and the DuckDB SQL form). */
  def hash63Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    val hi = java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2147483648L
    val lo = java.lang.Long.parseLong(hex.substring(8, 16), 16)
    hi * 4294967296L + lo
  }

  /** a_k ∈ [1, p−1] — multiplier must be nonzero in the field. */
  def a(k: Int): Long = hash63Local(s"a$k") % (P - 1) + 1

  /** b_k ∈ [0, p−1]. */
  def b(k: Int): Long = hash63Local(s"b$k") % P

  /** Column form of permutation k over base-hash column `x` (< p). */
  def perm(k: Int, x: Column): Column = (lit(a(k)) * x + lit(b(k))) % P

  /** DuckDB fragment computing (k, a, b) rows — cross-join against the
    * per-shingle base hashes to evaluate all permutations in SQL. */
  def coefSql(perms: Int): String =
    s"""SELECT k,
       |    (${graft.operators.Dedup.hash63Sql("('a' || k)")} % ${P - 1}) + 1 AS a,
       |    ${graft.operators.Dedup.hash63Sql("('b' || k)")} % $P AS b
       |  FROM range($perms) t(k)""".stripMargin
}
