package graft

import graft.risk.Risk
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden scalar fixtures lifted from the reference's unit tests
  * (`/root/reference/src/database.rs:619-644`) plus the baseline fallback
  * (`sync.rs:303-307`). */
class RiskSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def risk(kills: Int, jumps: Int, baseline: Double): Double =
    Seq((kills, jumps)).toDF("kills", "jumps")
      .select(Risk.totalRisk($"kills", $"jumps", lit(baseline)).as("r"))
      .head().getDouble(0)

  test("no activity → baseline") { assert(risk(0, 0, 0.1) === 0.1) }
  test("kills without jumps → kills² + baseline") { assert(risk(5, 0, 0.1) === 25.1) }
  test("jumps without kills → baseline") { assert(risk(0, 100, 0.1) === 0.1) }
  test("normal → kills²/jumps + baseline") {
    assert(math.abs(risk(10, 200, 0.1) - 0.6) < 1e-12)
  }

  test("baseline = Σkills/Σjumps with 0.01 fallback") {
    def base(tk: Long, tj: Long): Double =
      Seq((tk, tj)).toDF("tk", "tj")
        .select(Risk.baseline($"tk", $"tj").as("b")).head().getDouble(0)
    assert(base(50, 1000) === 0.05)
    assert(base(50, 0) === 0.01)
  }
}
