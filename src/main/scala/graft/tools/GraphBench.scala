// Distributed-SSSP benchmark: every query in the standard bench dispatches
// to the driver-local heap (fixture graphs ≪ the 2M-edge threshold), so this
// tool is what times the actual distributed engines — label-correcting
// Pregel vs delta-stepping, plus the DataFrame dispatch entry with the
// local threshold forced to 0 — on a synthetic multi-million-edge graph,
// and emits one JSON artifact with wall-times and superstep counts.
//
// Run: sbt 'runMain graft.tools.GraphBench [nVertices] [outFile]'
// (default 400k vertices ≈ 5.6M weighted edges; committed artifact:
// GRAPHBENCH_r03.json)
package graft.tools

import graft.graph.Dijkstra
import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.SparkSession

object GraphBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 400000L
    val out = if (args.length > 1) Some(args(1)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext

    // circulant with log-spaced chords → small diameter, weighted 1..5
    val chords = Iterator.iterate(1L)(_ * 7L).takeWhile(_ < n / 2).toSeq
    val parts = cpus.toInt
    val edgeRdd = sc.range(0L, n, 1L, parts).flatMap { i =>
      chords.flatMap(d => Seq(
        Edge(i, (i + d) % n, (1L + (i * 7L + d) % 5L).toDouble),
        Edge(i, (i - d + n) % n, (1L + (i * 13L + d) % 5L).toDouble)))
    }
    val g = Graph.fromEdges(edgeRdd, 0L).cache()
    val nEdges = g.edges.count() // materialize before timing

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (pregel, tPregel) = time {
      Dijkstra.sssp(g, 0L).vertices.filter(v => !v._2._1.isInfinite).count()
    }
    val stats = new Dijkstra.DeltaStats
    val (delta, tDelta) = time {
      Dijkstra.deltaSssp(g, 0L, stats = Some(stats)).vertices
        .filter(v => !v._2._1.isInfinite).count()
    }
    require(pregel == delta, s"engine disagreement: pregel=$pregel delta=$delta")

    // the DataFrame entry with the local threshold forced to 0: exercises
    // the exact branch a >2M-edge production graph takes (edge DataFrame →
    // GraphX build → delta-stepping → distributed distance table)
    import spark.implicits._
    val edgeDf = g.edges.map(e => (e.srcId, e.dstId, e.attr)).toDF("src", "dst", "w")
      .cache()
    edgeDf.count()
    val (frameReach, tFrame) = time {
      Dijkstra.ssspFrameFromEdges(edgeDf, 0L, threshold = 0L).count()
    }
    require(frameReach == delta, s"frame dispatch disagreement: $frameReach vs $delta")

    val json =
      s"""{"graph":{"vertices":$n,"edges":$nEdges,"reachable":$pregel},""" +
        s""""pregel_label_correcting":{"sec":$tPregel},""" +
        s""""delta_stepping":{"sec":$tDelta,"stats":${stats.json}},""" +
        s""""frame_dispatch_threshold0":{"sec":$tFrame}}"""
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
