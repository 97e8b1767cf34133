package graft

import graft.operators.GraphQueries
import org.scalatest.funsuite.AnyFunSuite

/** q90's fixed-point PageRank must approximate TRUE (double) PageRank:
  * the bit-exact integer oracle proves cross-engine agreement, but only
  * this spec proves the quantized iteration still computes the operator
  * it claims — an independent driver-local double-precision reference
  * over the same graph, same damping, same iteration count, compared
  * within |Δ| ≤ 1e-9 per vertex (the truncation loses < in-degree·1e-15
  * per step, geometrically damped by 0.85, so 1e-9 is ~4 orders of
  * margin at fixture degree). */
class PageRankFpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q90 plan: exchanges stay at the one-per-iteration floor") {
    // e/deg are cached pre-partitioned on the join keys, so each of the
    // 10 iterations needs exactly ONE exchange (the aggregate re-keys
    // node → dst — unavoidable, the output key differs) and the joins
    // are exchange-free; endpoints (initial repartition, final sort,
    // count-side plans) add a constant handful. Audited at 17; a lost
    // partitioning-reuse (e.g. dropping the repartition-at-cache or an
    // alias Catalyst stops tracking) jumps this to ~27+.
    val plan = SparkEntry.queries("q90_scale_pagerank_fp")(spark, dir)
      .queryExecution.sparkPlan
    // typed traversal of the OPERATOR tree: a text count over treeString
    // also sweeps up the plans embedded in InMemoryRelation printouts
    val n = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.size
    assert(n <= 2 * GraphQueries.PrIters,
      s"q90 plan has $n exchanges — partitioning reuse lost (expected ~${GraphQueries.PrIters + 7})")
  }

  test("q90 fixed-point ranks within 1e-9 of double PageRank; mass conserved") {
    val edges = GraphQueries.partSupplierEdges(spark, dir)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.length
    val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.length.toDouble }
    val idx = nodes.zipWithIndex.toMap
    val inEdges = edges.groupBy(_._2) // dst -> incoming (src, dst)
    var r = nodes.map(_ => 1.0 / n)
    for (_ <- 1 to GraphQueries.PrIters) {
      r = nodes.map { v =>
        0.15 / n + 0.85 * inEdges.getOrElse(v, Array.empty[(Long, Long)])
          .map { case (u, _) => r(idx(u)) / deg(u) }.sum
      }
    }
    val want = nodes.zip(r).toMap

    val got = SparkEntry.queries("q90_scale_pagerank_fp")(spark, dir)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(got.keySet === want.keySet, "vertex sets differ")
    val scale = GraphQueries.PrScale.toDouble
    val worst = got.map { case (v, fp) => math.abs(fp / scale - want(v)) }.max
    assert(worst <= 1e-9, f"max |fixed-point - double| = $worst%.3e exceeds 1e-9")
    // total mass stays ≈ 1 (floors only ever lose, teleport re-injects):
    // a wrong deg join or a dropped vertex shows up here first
    val mass = got.values.map(_.toDouble).sum / scale
    assert(mass > 0.9 && mass <= 1.000001, s"rank mass $mass out of range")
  }
}
