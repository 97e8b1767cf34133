// GRAPHBENCH_r09 driver — proves (or refutes) the round-8 superstep-batching
// rewrite with measurements instead of correctness evidence alone:
//
//  - mode "hidiam": the opt-in boundary probe (100k-vertex chords-{1,31}
//    circulant, ~3,373 supersteps) swept over batchMax ∈ {1, 8, 16, 32, 64}
//    for BOTH engines. batchMax = 1 is the unbatched round-7 engine
//    re-measured on the same box/JVM (its r7 artifact number: 230.0 s
//    pregel / 239.0 s delta, GRAPHBENCH_r07_hidiam.json); every run is
//    equality-checked against the batchMax = 1 reachable count.
//  - mode "pairs": no-regression guard — the three default GraphBench
//    shapes at 400k vertices, N same-JVM (pregel, delta-x32) pairs each at
//    the shipped batchMax, reported individually (min-of-N is computed by
//    the reader) — the calm-box band VERDICT r8 directive 1 folds in.
//
// Run: sbt 'runMain graft.tools.BatchSweep hidiam GRAPHBENCH_r09_hidiam.json [bmaxList]'
//      sbt 'runMain graft.tools.BatchSweep pairs GRAPHBENCH_r09_pairs.json [nPairs]'
//      sbt 'runMain graft.tools.BatchSweep heavy GRAPHBENCH_r09_heavy.json [nPairs]'
package graft.tools

import graft.graph.Dijkstra
import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.SparkSession

object BatchSweep {

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "hidiam"
    val out = if (args.length > 1) Some(args(1)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    val parts = cpus.toInt

    def circulant(n: Long, chords: Seq[Long], wmod: Long) =
      sc.range(0L, n, 1L, parts).flatMap { i =>
        chords.flatMap(d => Seq(
          Edge(i, (i + d) % n, (1L + (i * 7L + d) % wmod).toDouble),
          Edge(i, (i - d + n) % n, (1L + (i * 13L + d) % wmod).toDouble)))
      }

    val json = mode match {
      case "hidiam" =>
        val bms = if (args.length > 2) args(2).split(",").toSeq.map(_.toInt)
          else Seq(1, 8, 16, 32, 64)
        val n = 100000L
        val g = Graph.fromEdges(circulant(n, Seq(1L, 31L), 5L), 0L).cache()
        val nEdges = g.edges.count()
        var baselineReach = -1L
        // key carries the leg index so an INTERLEAVED list (e.g.
        // "8,16,8,16,8,16" — the r10 A/B) emits distinct JSON keys
        val rows = bms.zipWithIndex.map { case (bm, idx) =>
          val (pReach, tP) = time {
            Dijkstra.sssp(g, 0L, batchMax = bm)
              .vertices.filter(v => !v._2._1.isInfinite).count()
          }
          if (baselineReach < 0) baselineReach = pReach
          require(pReach == baselineReach,
            s"pregel reachable set changed at batchMax=$bm: $pReach vs $baselineReach")
          val st = new Dijkstra.DeltaStats
          val (dReach, tD) = time {
            Dijkstra.deltaSssp(g, 0L, stats = Some(st), batchMax = bm)
              .vertices.filter(v => !v._2._1.isInfinite).count()
          }
          require(dReach == baselineReach,
            s"delta reachable set changed at batchMax=$bm: $dReach vs $baselineReach")
          System.err.println(f"[batchsweep] hidiam leg=$idx batchMax=$bm: pregel $tP%.1f s, delta $tD%.1f s")
          val key = if (bms.distinct.size == bms.size) s"x$bm" else s"leg${idx}_x$bm"
          s""""$key":{"pregel_sec":$tP,"delta_sec":$tD,"delta_stats":${st.json}}"""
        }
        s""""hidiam_w5_batch_sweep":{"vertices":$n,"edges":$nEdges,"reachable":$baselineReach,${rows.mkString(",")}}"""

      case "heavy" =>
        // the one engine path no committed artifact has ever TIMED: the
        // delta heavy phase (w ≥ Δ). Every default shape's max weight
        // sits far below Δ = 32×mean, so anyHeavy short-circuits and
        // heavy_supersteps stays 0. A 0.1% heavy tail at 100,000 (vs a
        // 1..5 body) puts mean ≈ 103 and Δ ≈ 3,300 ≪ 100,000 — the
        // heavy relax pass runs once per settled bucket, the textbook
        // delta-stepping discipline, finally measured.
        val nPairs = if (args.length > 2) args(2).toInt else 2
        val n = 400000L
        val chords = Iterator.iterate(1L)(_ * 7L).takeWhile(_ < n / 2).toSeq
        val edges = sc.range(0L, n, 1L, parts).flatMap { i =>
          chords.flatMap { d =>
            def w(seed: Long) =
              if ((seed * 11 + d) % 1000 == 0) 100000.0
              else (1L + (seed * 7L + d) % 5L).toDouble
            Seq(Edge(i, (i + d) % n, w(i)), Edge(i, (i - d + n) % n, w(i + n)))
          }
        }
        val g = Graph.fromEdges(edges, 0L).cache()
        val nEdges = g.edges.count()
        val dlt = Dijkstra.chooseDelta(g)
        val nHeavy = g.edges.filter(_.attr >= dlt).count()
        require(nHeavy > 0, "heavy shape has no heavy edge — probe is vacuous")
        var reach0 = -1L
        val pairRows = (1 to nPairs).map { i =>
          val (pReach, tP) = time {
            Dijkstra.sssp(g, 0L)
              .vertices.filter(v => !v._2._1.isInfinite).count()
          }
          val st = new Dijkstra.DeltaStats
          val (dReach, tD) = time {
            Dijkstra.deltaSssp(g, 0L, stats = Some(st))
              .vertices.filter(v => !v._2._1.isInfinite).count()
          }
          if (reach0 < 0) reach0 = pReach
          require(pReach == reach0 && dReach == reach0,
            s"engine disagreement on heavy pair $i: $pReach/$dReach vs $reach0")
          require(st.heavySupersteps > 0,
            s"heavy phase never ran (heavySupersteps=0, delta=${st.delta})")
          System.err.println(f"[batchsweep] heavy pair $i: pregel $tP%.1f s, delta $tD%.1f s, stats ${st.json}")
          s"""{"pregel_sec":$tP,"delta_sec":$tD,"delta_stats":${st.json}}"""
        }
        s""""heavy_tail_w100k":{"vertices":$n,"edges":$nEdges,"heavy_edges":$nHeavy,"chosen_delta":$dlt,"reachable":$reach0,"pairs":[${pairRows.mkString(",")}]}"""

      case "pairs" =>
        val nPairs = if (args.length > 2) args(2).toInt else 3
        val n = 400000L
        val logChords = Iterator.iterate(1L)(_ * 7L).takeWhile(_ < n / 2).toSeq
        val shapes = Seq(
          ("expander_w5", logChords, 5L),
          ("wide_w1000", logChords, 1000L),
          ("middiam_w5", Seq(1L, 97L, 9403L), 5L))
        val rows = shapes.map { case (name, chords, wmod) =>
          val g = Graph.fromEdges(circulant(n, chords, wmod), 0L).cache()
          g.edges.count()
          var reach0 = -1L
          val pairRows = (1 to nPairs).map { i =>
            val (pReach, tP) = time {
              Dijkstra.sssp(g, 0L)
                .vertices.filter(v => !v._2._1.isInfinite).count()
            }
            val (dReach, tD) = time {
              Dijkstra.deltaSssp(g, 0L)
                .vertices.filter(v => !v._2._1.isInfinite).count()
            }
            if (reach0 < 0) reach0 = pReach
            require(pReach == reach0 && dReach == reach0,
              s"engine disagreement on $name pair $i: $pReach/$dReach vs $reach0")
            System.err.println(f"[batchsweep] $name pair $i: pregel $tP%.1f s, delta $tD%.1f s")
            s"""{"pregel_sec":$tP,"delta_sec":$tD}"""
          }
          g.unpersist()
          s""""$name":{"reachable":$reach0,"pairs":[${pairRows.mkString(",")}]}"""
        }
        s""""repeat_pairs_batched":{${rows.mkString(",")}}"""

      case other =>
        spark.stop()
        sys.error(s"unknown mode '$other' — expected one of: hidiam, heavy, pairs")
    }

    val wrapped = "{" + json + "}"
    println(wrapped)
    out.foreach(p => java.nio.file.Files.writeString(java.nio.file.Paths.get(p), wrapped + "\n"))
    spark.stop()
  }
}
