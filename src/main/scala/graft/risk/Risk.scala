package graft.risk

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's danger-scoring expressions as pure column arithmetic —
  * no UDF, fully codegen'd (SURVEY.md §2.8 E1/E2).
  */
object Risk {

  /** E1 — `calculate_total_risk` (`/root/reference/src/database.rs:324-332`,
    * golden unit tests at 619-644): kills²/jumps + baseline when jumps>0,
    * else kills² + baseline. */
  def totalRisk(kills: Column, jumps: Column, baseline: Column): Column = {
    val k = kills.cast("double")
    val j = jumps.cast("double")
    when(jumps > 0, k * k / j).otherwise(k * k) + baseline
  }

  /** E2 — galaxy baseline (`/root/reference/src/sync.rs:303-307`):
    * Σkills/Σjumps, fallback 0.01 when Σjumps = 0. */
  def baseline(totalKills: Column, totalJumps: Column): Column =
    when(totalJumps > 0, totalKills.cast("double") / totalJumps.cast("double"))
      .otherwise(lit(0.01))
}
