package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual salting for skewed equi-joins — the fallback when AQE's runtime
  * skew split isn't available (e.g. the skewed side feeds a non-shuffle
  * operator, or a deterministic plan is required).
  *
  * `salted(left, right, key, salt)` computes the same rows as
  * `left.join(right, key)`: the skewed left side gets a random-ish salt in
  * [0, salt) derived from deterministic row content hashing, and the right
  * side is exploded `salt` times so every (key, salt) partition pairs up.
  * Shuffle keys become (key, salt), splitting a hot key across `salt`
  * reducers at the cost of replicating the right side `salt`×  — the right
  * side should be the smaller one.
  */
object SkewJoin {

  def salted(left: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0)
    // deterministic per-row salt: hash of the whole left row, not rand(),
    // so results are reproducible run to run
    val leftCols = left.columns.toIndexedSeq.map(col)
    val l = left.withColumn("_salt", pmod(hash(leftCols: _*), lit(salt)))
    val r = right.withColumn("_salt", explode(array((0 until salt).map(lit): _*)))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Convenience: detect the heavy-hitter keys above `threshold` rows and
    * salt only those, passing the rest through a plain join — the classic
    * two-path skew plan. */
  def saltedHeavyHitters(left: DataFrame, right: DataFrame, key: String,
      salt: Int, threshold: Long): DataFrame = {
    val hot = left.groupBy(col(key)).count().filter(col("count") > threshold)
      .select(col(key)).cache()
    val lHot = left.join(hot, Seq(key), "left_semi")
    val lCold = left.join(hot, Seq(key), "left_anti")
    val rHot = right.join(hot, Seq(key), "left_semi")
    salted(lHot, rHot, key, salt)
      .unionByName(lCold.join(right, Seq(key)))
  }
}
