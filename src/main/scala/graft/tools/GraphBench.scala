// Dev tool: compare the label-correcting Pregel SSSP with the
// delta-stepping engine on a synthetic weighted circulant graph.
// Run: sbt 'runMain graft.tools.GraphBench [nVertices]'
package graft.tools

import graft.graph.Dijkstra
import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.SparkSession

object GraphBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext

    // circulant with log-spaced chords → small diameter, weighted 1..5
    val chords = Iterator.iterate(1L)(_ * 7L).takeWhile(_ < n / 2).toSeq
    val edges = sc.range(0L, n, 1L, 8).flatMap { i =>
      chords.flatMap(d => Seq(
        Edge(i, (i + d) % n, (1L + (i * 7L + d) % 5L).toDouble),
        Edge(i, (i - d + n) % n, (1L + (i * 13L + d) % 5L).toDouble)))
    }
    val g = Graph.fromEdges(edges, 0L).cache()
    g.edges.count() // materialize

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val pregel = time("label-correcting pregel") {
      Dijkstra.sssp(g, 0L).vertices.filter(v => !v._2._1.isInfinite).count()
    }
    val delta = time("delta-stepping") {
      Dijkstra.deltaSssp(g, 0L).vertices.filter(v => !v._2._1.isInfinite).count()
    }
    println(s"reachable: pregel=$pregel delta=$delta (must be equal)")
    require(pregel == delta)
    spark.stop()
  }
}
