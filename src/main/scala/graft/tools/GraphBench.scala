// Distributed-SSSP benchmark: every query in the standard bench dispatches
// to the driver-local heap (fixture graphs ≪ the 2M-edge threshold), so this
// tool is what times the actual distributed engines — label-correcting
// Pregel vs delta-stepping — on synthetic multi-million-edge graphs, and
// emits one JSON artifact with wall-times and superstep counts.
//
// Round-4 extension (VERDICT r3 item 1): the comparison is now a MATRIX —
// three graph shapes (the round-3 low-diameter/narrow-weight circulant,
// a wide-weight-variance variant, and a moderate-diameter sparse variant)
// × a Δ sweep (multiples of the mean-weight heuristic) — because a single
// (topology, Δ) point cannot justify a default engine choice. Every timed
// run is equality-checked against the label-correcting reachable count.
//
// Run: sbt 'runMain graft.tools.GraphBench [nVertices] [outFile] [shapes] [multipliers]'
// (default 400k vertices; committed artifact: GRAPHBENCH_r04.json)
package graft.tools

import graft.graph.Dijkstra
import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession

object GraphBench {

  // Graph shapes, all circulants (deterministic, skew-free, connected):
  //  - expander_w5: log-spaced chords, weights 1..5 — the round-3 graph:
  //    diameter ~ log n, narrow weight band (delta-stepping's worst case:
  //    few corrections to save, bucket machinery is pure overhead);
  //  - wide_w1000: same chords, weights 1..1000 — wide weight variance,
  //    where label-correcting wavefronts do many later-corrected
  //    relaxations;
  //  - middiam_w5: chords {1, 97, 9403}, weights 1..5 — sparser (6 edges
  //    per vertex) with diameter in the hundreds: many cheap supersteps,
  //    the per-superstep-overhead stress case.
  //  - hidiam_w5 (OPT-IN — pass it in the shapes arg; excluded from the
  //    default sweep): chords {1, 31}, diameter ~n/62 — thousands of
  //    supersteps, the boundary probe for where frontier-synchronous
  //    engines stop being viable at all (run at n=100k unless you have
  //    an hour).
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 400000L
    val out = if (args.length > 1) Some(args(1)) else None
    val only = if (args.length > 2) args(2).split(",").toSet else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    val parts = cpus.toInt

    val logChords = Iterator.iterate(1L)(_ * 7L).takeWhile(_ < n / 2).toSeq
    val sparseChords = Seq(1L, 97L, 9403L).filter(_ < n / 2)
    val hidiamChords = Seq(1L, 31L).filter(_ < n / 2)
    def circulant(chords: Seq[Long], wmod: Long) =
      sc.range(0L, n, 1L, parts).flatMap { i =>
        chords.flatMap(d => Seq(
          Edge(i, (i + d) % n, (1L + (i * 7L + d) % wmod).toDouble),
          Edge(i, (i - d + n) % n, (1L + (i * 13L + d) % wmod).toDouble)))
      }

    // hidiam is opt-in: a default (no-shapes-arg) sweep must stay
    // affordable, and the boundary probe costs an order of magnitude more
    val optIn = Set("hidiam_w5")
    val shapeDefs: Seq[(String, () => RDD[Edge[Double]])] = Seq(
      ("expander_w5", () => circulant(logChords, 5L)),
      ("wide_w1000", () => circulant(logChords, 1000L)),
      ("middiam_w5", () => circulant(sparseChords, 5L)),
      ("hidiam_w5", () => circulant(hidiamChords, 5L)))
      .filter { case (name, _) =>
        if (only.isEmpty) !optIn(name) else only.contains(name) }

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // default sweep includes 16× and 32× so the SHIPPED DeltaMeanMultiplier
    // (32) is always a measured point of the default run, not only of ad-hoc
    // invocations that pass multipliers explicitly
    val deltaMultipliers =
      if (args.length > 3) args(3).split(",").toSeq.map(_.toDouble)
      else Seq(0.5, 1.0, 2.0, 4.0, 8.0, 16.0, 32.0)

    val shapeJsons = shapeDefs.map { case (shape, mk) =>
      val g = Graph.fromEdges(mk(), 0L).cache()
      val nEdges = g.edges.count() // materialize before timing
      // sweep multiples of the raw MEAN WEIGHT (stable across heuristic
      // changes — r3 artifacts used the same base); chooseDelta's default
      // is reported separately
      val meanW = {
        val (s, c) = g.edges.map(e => (e.attr, 1L))
          .fold((0.0, 0L)) { case ((a, b), (w, k)) => (a + w, b + k) }
        s / c
      }
      val chosen = Dijkstra.chooseDelta(g)

      val (pregel, tPregel) = time {
        Dijkstra.sssp(g, 0L).vertices.filter(v => !v._2._1.isInfinite).count()
      }

      val deltaRuns = deltaMultipliers.map { m =>
        val stats = new Dijkstra.DeltaStats
        val (reach, t) = time {
          Dijkstra.deltaSssp(g, 0L, delta = meanW * m, stats = Some(stats))
            .vertices.filter(v => !v._2._1.isInfinite).count()
        }
        require(reach == pregel,
          s"engine disagreement on $shape mult=$m: pregel=$pregel delta=$reach")
        System.err.println(f"[graphbench] $shape delta x$m%.1f: $t%.1f s (pregel $tPregel%.1f s)")
        m -> (t, stats)
      }

      // the DataFrame entry with the local threshold forced to 0: exercises
      // the exact branch a >2M-edge production graph takes (edge DataFrame →
      // GraphX build → default engine → distributed distance table)
      import spark.implicits._
      val edgeDf = g.edges.map(e => (e.srcId, e.dstId, e.attr)).toDF("src", "dst", "w")
        .cache()
      edgeDf.count()
      val (frameReach, tFrame) = time {
        Dijkstra.ssspFrameFromEdges(edgeDf, 0L, threshold = 0L).count()
      }
      require(frameReach == pregel, s"frame dispatch disagreement: $frameReach vs $pregel")
      edgeDf.unpersist()
      g.unpersist()

      val deltaJson = deltaRuns.map { case (m, (t, st)) =>
        s""""x$m":{"sec":$t,"stats":${st.json}}"""
      }.mkString(",")
      s""""$shape":{"vertices":$n,"edges":$nEdges,"reachable":$pregel,"mean_w":$meanW,"chosen_delta":$chosen,""" +
        s""""pregel_label_correcting":{"sec":$tPregel},""" +
        s""""delta_stepping":{$deltaJson},""" +
        s""""frame_dispatch_threshold0":{"sec":$tFrame}}"""
    }

    val json = shapeJsons.mkString("{", ",", "}")
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
