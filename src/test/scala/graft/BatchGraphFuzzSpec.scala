package graft

import graft.operators.GraphQueries
import org.scalatest.funsuite.AnyFunSuite

/** Random-graph fuzzing for the BATCH graph engines — the other half of
  * StreamScheduleFuzzSpec's coverage: the streaming fuzz exercises the
  * maintainers' restricted recomputes; this suite drives the batch
  * functions those maintainers are pinned against (minLabelPropagation,
  * kCorePeel, kTrussPeel) over random edge sets and checks them against
  * the same independently coded [[FuzzOracles]]. Same seed knob
  * (SPARK_GRAFT_FUZZ_SEED) as the other fuzz suites. */
class BatchGraphFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val SeedBase: Long =
    sys.env.get("SPARK_GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(0L)

  private def randomEdges(rnd: scala.util.Random, n: Int,
      density: Double): Set[(Long, Long)] =
    (for {
      a <- 0L until n.toLong; b <- (a + 1) until n.toLong
      if rnd.nextDouble() < density
    } yield (a, b)).toSet

  private def sym(edges: Set[(Long, Long)]) = {
    import spark.implicits._
    val e = edges.toSeq
    (e ++ e.map(_.swap)).toDF("src", "dst")
  }

  test("15 random graphs: minLabelPropagation ≡ union-find") {
    val rnd = new scala.util.Random(0xBCC5EEDL ^ SeedBase)
    (1 to 15).foreach { c =>
      val edges = randomEdges(rnd, 5 + rnd.nextInt(10), 0.15 + rnd.nextDouble() * 0.4)
      if (edges.nonEmpty) {
        val got = GraphQueries.minLabelPropagation(sym(edges), rounds = 30)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === FuzzOracles.unionFind(edges), s"case $c: edges=$edges")
      }
    }
  }

  test("15 random graphs: kCorePeel ≡ synchronous driver peel (k = 2..3)") {
    val rnd = new scala.util.Random(0xBC07E5EEDL ^ SeedBase)
    (1 to 15).foreach { c =>
      val k = 2 + rnd.nextInt(2)
      val edges = randomEdges(rnd, 5 + rnd.nextInt(10), 0.2 + rnd.nextDouble() * 0.4)
      if (edges.nonEmpty) {
        val got = GraphQueries.kCorePeel(sym(edges), k, rounds = 30)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === FuzzOracles.brutePeel(edges, k), s"case $c k=$k: edges=$edges")
      }
    }
  }

  test("15 random graphs: kTrussPeel ≡ synchronous driver support peel (k = 3..4)") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xB7055EEDL ^ SeedBase)
    (1 to 15).foreach { c =>
      val k = 3 + rnd.nextInt(2)
      val edges = randomEdges(rnd, 5 + rnd.nextInt(5), 0.35 + rnd.nextDouble() * 0.4)
      if (edges.nonEmpty) {
        val got = GraphQueries.kTrussPeel(edges.toSeq.toDF("a", "b"), k, rounds = 30)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        assert(got === FuzzOracles.bruteTruss(edges, k), s"case $c k=$k: edges=$edges")
      }
    }
  }
}
