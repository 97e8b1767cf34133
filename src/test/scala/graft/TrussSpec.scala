package graft

import graft.operators.GraphQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** kTrussPeel semantics: per-edge triangle support, synchronous peel,
  * cascades, and the round budget actually reaching the fixpoint at the
  * gate scale (the q84 budget-pin discipline). */
class TrussSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def edges(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("a", "b")
  }

  private def peeled(rows: Seq[(Long, Long)], k: Int, rounds: Int = 10): Map[(Long, Long), Long] =
    GraphQueries.kTrussPeel(edges(rows), k, rounds).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  // K5 on 10..14: every edge has support 3 (the other three vertices)
  private val k5 = (for {
    i <- 10L to 14L; j <- (i + 1) to 14L
  } yield (i, j)).toSeq

  test("a clique is its own truss with the exact supports") {
    assert(peeled(k5, k = 5) === k5.map(_ -> 3L).toMap)
  }

  test("peeling cascades: dropping rim edges starves the shared edge") {
    // two triangles sharing edge (2,3): supports — (2,3) has 2 witnesses,
    // every other edge 1. At k = 4 round 1 drops the four support-1
    // edges, which destroys BOTH triangles through (2,3): its support
    // falls 2 → 0 and round 2 removes it. A one-round peel would keep it.
    val strip = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(peeled(strip ++ k5, k = 4) === k5.map(_ -> 3L).toMap,
      "the strip must cascade away entirely; the clique must survive")
    // the cascade is real: (2,3)'s ORIGINAL support (rounds = 0 returns
    // the raw support aggregate) clears the k−2 threshold — it dies only
    // because round 1 starves it, not for its own support
    assert(peeled(strip, k = 4, rounds = 0).get((2L, 3L)) === Some(2L),
      "the shared edge must start at support k-2; only the cascade kills it")
  }

  test("support threshold is k-2 exactly") {
    // K4: every edge support 2 → survives k = 4, dissolves at k = 5
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(peeled(k4, k = 4) === k4.map(_ -> 2L).toMap)
    assert(peeled(k4, k = 5) === Map.empty)
  }

  test("q105's round budget reaches the true fixpoint at the gate scale") {
    import spark.implicits._
    val got = SparkEntry.queries("q105_scale_ktruss")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // independent run-to-convergence on a re-derived projection, with
    // >2x the shipped round budget
    val pairs = Tables.t(spark, dir, "lineitem")
      .filter($"l_quantity" === 50)
      .select($"l_partkey".cast("long").as("p"), $"l_suppkey".cast("long").as("su"))
      .distinct()
    val smallSu = pairs.groupBy($"su").agg(count(lit(1)).as("d"))
      .filter($"d" <= GraphQueries.TriDegreeCap).select($"su")
    val kept = pairs.join(smallSu, Seq("su"), "left_semi")
    val proj = kept.as("x").join(kept.as("y"), $"x.su" === $"y.su" && $"x.p" < $"y.p")
      .select($"x.p".as("a"), $"y.p".as("b")).distinct()
    val want = GraphQueries.kTrussPeel(proj, GraphQueries.TrussK,
        GraphQueries.TrussRounds * 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === want, "the shipped budget stopped short of the fixpoint")
    // non-vacuity: the peel must drop edges AND keep a non-empty truss
    val nProj = proj.count()
    assert(got.nonEmpty && got.size < nProj,
      s"vacuous peel: ${got.size} of $nProj edges")
    assert(got.values.min >= GraphQueries.TrussK - 2,
      "a served edge is below the truss threshold")
  }
}
