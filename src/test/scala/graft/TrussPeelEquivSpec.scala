package graft

import graft.operators.GraphQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** kTrussPeelFromTriangles ≡ kTrussPeel — the round-18 q105 engine swap:
  * the triangle-store-driven peel must compute the identical bounded
  * function (same survivors, same supports, round for round) as the
  * wedge-join peel, on every graph shape and budget. Randomized graphs
  * exercise cascades, isolated edges, disconnected cliques, the
  * budget-exhausted branch (supports re-measured in the final surviving
  * subgraph) and rounds = 0 (raw input supports). */
class TrussPeelEquivSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def edgesDF(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("a", "b")
  }

  /** Ordered triangle enumeration — the projectedTriangles layout. */
  private def trisOf(e: DataFrame): DataFrame =
    e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      .join(e.as("e3"), col("x") === col("e3.a") && col("z") === col("e3.b"),
        "left_semi")

  private def asMap(df: DataFrame): Map[(Long, Long), Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  private def check(rows: Seq[(Long, Long)], k: Int, rounds: Int,
      label: String): Unit = {
    val e = edgesDF(rows).localCheckpoint()
    val tris = trisOf(e).localCheckpoint()
    val ref = asMap(GraphQueries.kTrussPeel(e, k, rounds))
    val got = asMap(GraphQueries.kTrussPeelFromTriangles(e, tris, k, rounds))
    assert(got === ref, s"$label: k=$k rounds=$rounds |E|=${rows.size}")
  }

  test("random graphs: store-driven peel equals wedge-join peel") {
    val rnd = new scala.util.Random(18)
    (1 to 12).foreach { c =>
      val n = 6 + rnd.nextInt(20)
      val p = 0.15 + rnd.nextDouble() * 0.5
      val rows = (for {
        i <- 1L to n; j <- (i + 1) to n if rnd.nextDouble() < p
      } yield (i, j)).toSeq
      if (rows.nonEmpty) {
        val k = 3 + rnd.nextInt(4)
        check(rows, k, rounds = 10, s"case $c")
        // budget-exhausted branch: one round only, cascades cut short
        check(rows, k, rounds = 1, s"case $c (budget)")
      }
    }
  }

  test("rounds = 0 returns the raw input supports on both engines") {
    val strip = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    check(strip, k = 4, rounds = 0, "strip")
  }

  test("two cliques joined by a triangle-less bridge") {
    val cliqueA = (for { i <- 1L to 5L; j <- (i + 1) to 5L } yield (i, j)).toSeq
    val cliqueB = (for { i <- 11L to 15L; j <- (i + 1) to 15L } yield (i, j)).toSeq
    val rows = cliqueA ++ cliqueB :+ ((5L, 11L))
    check(rows, k = 5, rounds = 10, "bridged cliques")
    check(rows, k = 4, rounds = 2, "bridged cliques (short budget)")
  }
}
