// Same-JVM interleaved A/B of the min-label propagation variants on a
// CLUSTER-SHAPED graph — the regime CcStream's per-batch recompute
// actually runs in (many tiny near-clique components, diameter ~2-3),
// the opposite of AbCcBatch's 10k-node q80 graph where Pregel's message
// pruning won. Input: the verified near-dup pair graph of the sfDir
// corpus (q24's output relation), symmetrized. Results asserted EQUAL
// every run; arms alternate P,B,B,P per round.
// Run: sbt 'runMain graft.tools.AbCcSmall <sfDir> [rounds]'
package graft.tools

import graft.operators.{Dedup, GraphQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object AbCcSmall {
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
    import spark.implicits._

    val pairs = Dedup.ngramJaccardPairs(spark, dir)
      .select($"doc_a".as("src"), $"doc_b".as("dst")).localCheckpoint()
    val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
      .localCheckpoint()
    System.err.println(s"[abccsmall] ${edges.count()} directed edges")

    def run(name: String, f: () => DataFrame): (Double, Map[Long, Long]) = {
      val t0 = System.nanoTime()
      val rows = f().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[abccsmall] $name $dt%.3f s (${rows.size} nodes)")
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
    arms.map(_._1).foreach { nm =>
      System.err.println(s"[abccsmall] $nm runs: " +
        times(nm).map(t => f"$t%.3f").mkString(", ") + f"  min ${times(nm).min}%.3f")
    }
    System.err.println("[abccsmall] results EQUAL across all runs")
    spark.stop()
  }
}
