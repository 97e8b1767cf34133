// Same-JVM isolation A/B for the round-11 bucketed store layout — the
// round-11 MAINTBENCH regressed its headline lanes (triangle 1.58→1.99×
// of r10, GROWING with SF; sssp 1.19–1.48×) while the round shipped TWO
// coupled changes at once: the ±op liveness machinery AND the bucketed
// layout. This tool decomposes the cost on the SAME binary and the SAME
// lane schedules ([[MaintLanes]], shared with [[MaintBench]]) by running
// each lane under three arms, interleaved A,P,N,N,P,A so slow drift
// (JIT, page cache, same-box noise) cancels across arms:
//
//   bucketed — production: bucketed writes + bucket-pruned reads;
//   unpruned — bucketed writes, pruning skipped (Stores.withLayoutArm
//              pruning=false): isolates the READ half (per-read
//              bucket-id driver action + partition-filter planning)
//              from the layout itself;
//   flat     — bucketing=false: flat writes (no bucket repartition
//              shuffle, one leaf dir per batch) and naturally unpruned
//              reads — the r10 layout. Arms are THREAD-SCOPED
//              (Stores.withLayoutArm ThreadLocal) since round 13, so
//              nothing else in the JVM can observe a non-default arm.
//
// flat vs unpruned = the WRITE-side layout cost (extra repartition
// shuffle, nb/nb² leaf dirs, listing of more+smaller files);
// unpruned vs bucketed = the READ-side pruning cost/benefit.
// Whatever regression remains in the flat arm vs MAINTBENCH_r10 is the
// ±op liveness machinery (plus box drift) — not the layout.
//
// Run: sbt 'runMain graft.tools.MaintAb [outFile] [sfDirs,comma-sep] [lanes,comma-sep]'
package graft.tools

import graft.streaming.Stores
import org.apache.spark.sql.SparkSession

object MaintAb {

  private case class Arm(name: String, bucketing: Boolean, pruning: Boolean)
  private val Arms = Seq(
    Arm("bucketed", bucketing = true, pruning = true),
    Arm("unpruned", bucketing = true, pruning = false),
    Arm("flat", bucketing = false, pruning = false))

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) Some(args(0)) else None
    val sfDirs = (if (args.length > 1) args(1).split(",").toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"))
    val laneNames = (if (args.length > 2) args(2).split(",").toSeq
      else Seq("triangle", "triangle_delta", "sssp", "sssp_delta"))
    val spark = session()

    val sfJsons = sfDirs.map { dir =>
      val lanes = new MaintLanes(spark, dir)
      val picked = lanes.all.filter(l => laneNames.contains(l.name))
      require(picked.map(_.name).toSet == laneNames.toSet,
        s"unknown lane in $laneNames (have ${lanes.all.map(_.name)})")
      val laneJsons = picked.map { lane =>
        // mirrored arm order: A,P,N then N,P,A — each arm once per half,
        // so any monotone drift over the six runs hits both halves of
        // every arm symmetrically
        val schedule = Arms ++ Arms.reverse
        val totals = scala.collection.mutable.Map.empty[String, List[Double]]
          .withDefaultValue(Nil)
        schedule.foreach { arm =>
          val store = MaintBench.tmp(s"ab-${lane.name}-${arm.name}")
          // thread-scoped arm (round 13): the switches live in a
          // ThreadLocal inside withLayoutArm's extent, so a stream on any
          // other thread of this JVM keeps the production layout
          val t = Stores.withLayoutArm(arm.bucketing, arm.pruning) {
            lane.slices.zipWithIndex.map { case (sl, i) =>
              MaintBench.time(lane.step(sl, i.toLong, store)) }.sum
          }
          totals(arm.name) = totals(arm.name) :+ t
          System.err.println(f"[maintab] $dir ${lane.name} ${arm.name}: $t%.2f s")
        }
        val best = Arms.map(a => a.name -> totals(a.name).min).toMap
        val ratios =
          s""""layout_write_ratio":${best("unpruned") / best("flat")},""" +
          s""""prune_read_ratio":${best("bucketed") / best("unpruned")},""" +
          s""""bucketed_vs_flat":${best("bucketed") / best("flat")}"""
        val arms = Arms.map(a =>
          s""""${a.name}":{"runs":[${totals(a.name).mkString(",")}],"min":${best(a.name)}}""")
          .mkString(",")
        s""""${lane.name}":{$arms,$ratios}"""
      }
      lanes.unpersist()
      s""""${dir.split("/").last}":{${laneJsons.mkString(",")}}"""
    }

    val json = "{" + sfJsons.mkString(",") +
      ""","arms":{"bucketed":"production (bucketed writes + pruned reads)","unpruned":"bucketed writes, pruning OFF - read-side isolation","flat":"bucketing OFF - the r10 layout"},"note":"same-JVM three-arm isolation A/B of the round-11 bucketed store layout over the SHARED MaintBench lane schedules (fresh store per run; arm order A,P,N,N,P,A per lane so drift cancels; min-of-2 per arm). layout_write_ratio = unpruned/flat isolates the bucketed WRITE+layout cost (repartition shuffle per writeBatch, nb or nb^2 leaf dirs per batch, more+smaller files to list/open); prune_read_ratio = bucketed/unpruned isolates the pruned READ cost/benefit (one collect_set bucket-id driver action per pruned read vs fewer files scanned); bucketed_vs_flat is their product - the lane's total layout bill at this SF. Whatever r10->r11 regression the flat arm still carries is the +-op liveness machinery the lanes gained in the same round, not the layout."}"""
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }

  private def session(): SparkSession = MaintBench.session()
}
