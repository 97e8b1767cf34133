// Same-JVM interleaved A/B for q80's superstep batching (VERDICT r17
// item 4): Pregel min-label propagation (one superstep = 2+ jobs per
// hop, message-pruned) vs the chained-batch DataFrame rounds
// (minLabelPropagationBatched, ~rounds/chunk driver actions, no
// pruning). Results asserted EQUAL every run; arms alternate P,B,B,P
// per round so drift cancels (the AbPairStore pattern). The input is
// q80's real relation — the materialized sparse pair store's edges —
// built once (warm-path comparison, matching the bench's warm cells).
// Run: sbt 'runMain graft.tools.AbCcBatch <sfDir> [rounds]'
package graft.tools

import graft.operators.GraphQueries
import org.apache.spark.sql.{DataFrame, SparkSession}

object AbCcBatch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = GraphQueries.sparsePartSupplierEdges(spark, dir)
    edges.count() // pay the store build once, outside the timed arms

    def run(name: String, f: () => DataFrame): (Double, Map[Long, Long]) = {
      val t0 = System.nanoTime()
      val rows = f().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[abccbatch] $name $dt%.3f s (${rows.size} nodes)")
      (dt, rows)
    }

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "pregel" -> (() => GraphQueries.minLabelPropagation(edges, GraphQueries.ScaleCcRounds)),
      "batched" -> (() => GraphQueries.minLabelPropagationBatched(edges, GraphQueries.ScaleCcRounds)))
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    var ref: Map[Long, Long] = null
    (1 to rounds).foreach { _ =>
      (arms ++ arms.reverse).foreach { case (nm, f) =>
        val (dt, rows) = run(nm, f)
        if (ref == null) ref = rows
        require(rows == ref, s"$nm diverged! (${rows.size} vs ${ref.size} nodes)")
        times(nm) = times(nm) :+ dt
      }
    }
    arms.map(_._1).distinct.foreach { nm =>
      System.err.println(s"[abccbatch] $nm runs: " +
        times(nm).map(t => f"$t%.3f").mkString(", ") + f"  min ${times(nm).min}%.3f")
    }
    System.err.println("[abccbatch] results EQUAL across all runs")
    spark.stop()
  }
}
