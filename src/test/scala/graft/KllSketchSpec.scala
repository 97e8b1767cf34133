package graft

import graft.functions.{KllSketch, KllState}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KLL sketch gates: rank-error bounds against exact percentiles (its
  * only verifiable contract — the survivor set depends on partitioning,
  * so unlike QuantileSketch there is nothing byte-stable to pin), error
  * stability across partitionings, exact counts, and serde fidelity. */
class KllSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** rank of `v` within group as a fraction. */
  private def rankOf(dir: String, flag: String, v: Double): Double = {
    import spark.implicits._
    val grp = Tables.t(spark, dir, "lineitem").filter($"l_returnflag" === flag).cache()
    val r = grp.filter($"l_quantity" <= v).count().toDouble / grp.count().toDouble
    grp.unpersist()
    r
  }

  private def estimates(dir: String, parts: Int): Map[String, Seq[Double]] = {
    import spark.implicits._
    Tables.t(spark, dir, "lineitem")
      .repartition(parts)
      .groupBy($"l_returnflag")
      .agg(KllSketch.quantiles($"l_quantity", Seq(0.5, 0.9)).as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
  }

  test("rank error vs exact percentiles within bound, at both registered scales and three partitionings") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01");
         parts <- Seq(1, 7, 32)) {
      val est = estimates(dir, parts)
      for ((flag, qs) <- est; (q, v) <- Seq(0.5, 0.9).zip(qs)) {
        val err = math.abs(rankOf(dir, flag, v) - q)
        // k = 200 → theoretical ε ≈ c/k (~1–2%); 0.05 also absorbs the
        // tied-value rank jump (~2% — quantity has ~50 levels)
        assert(err <= 0.05, s"$dir parts=$parts $flag q=$q est=$v err=$err")
      }
    }
  }

  test("buffer laws: counts exact, serde lossless, merged error within bound") {
    val rng = new scala.util.Random(11)
    for (trial <- 0 until 20) {
      val n = 2000 + rng.nextInt(3000)
      val xs = Array.fill(n)(rng.nextDouble() * 1000.0)
      val cut = 50 + rng.nextInt(500)
      val parts = xs.grouped(cut).map { part =>
        val st = new KllState(200)
        part.foreach(st.insert)
        KllState.fromBytes(st.toBytes) // partials cross the wire
      }.toList
      val merged = parts.reduceLeft { (a, b) => a.mergeIn(b); a }
      assert(merged.n === n.toLong, "count must be exact under merge + serde")
      val sorted = xs.sorted
      for (q <- Seq(0.1, 0.5, 0.9)) {
        val est = merged.quantile(q)
        // exact rank of the estimate in the raw stream
        val rank = sorted.count(_ <= est).toDouble / n
        assert(math.abs(rank - q) <= 0.06, s"trial=$trial q=$q rank=$rank")
      }
    }
  }

  test("empty and single-element states") {
    val st = new KllState(200)
    assert(st.quantile(0.5).isNaN)
    st.insert(42.0)
    assert(st.quantile(0.0) === 42.0)
    assert(st.quantile(1.0) === 42.0)
  }
}
