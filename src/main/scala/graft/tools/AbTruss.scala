// Same-JVM interleaved A/B for q105's peel engine (round 18): the
// r17 wedge-join peel (kTrussPeel over the projection store,
// inputStable) vs the triangle-store-driven peel
// (kTrussPeelFromTriangles). Results asserted EQUAL every run; arms
// alternate W,T,T,W per round so drift cancels (the AbPairStore
// pattern). Both stores are built once before the timed arms — this
// times the WARM serve exactly like the bench's warm cells.
// Run: sbt 'runMain graft.tools.AbTruss <sfDir> [rounds]'
package graft.tools

import graft.operators.GraphQueries
import org.apache.spark.sql.{DataFrame, SparkSession}

object AbTruss {
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

    val e = GraphQueries.projectedPartEdges(spark, dir)
    val tris = GraphQueries.projectedTriangles(spark, dir)
    e.count(); tris.count() // store builds paid once, outside the arms

    def run(name: String, f: () => DataFrame): (Double, Map[(Long, Long), Long]) = {
      val t0 = System.nanoTime()
      val rows = f().collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[abtruss] $name $dt%.3f s (${rows.size} edges)")
      (dt, rows)
    }

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "wedge" -> (() => GraphQueries.kTrussPeel(e,
        GraphQueries.TrussK, GraphQueries.TrussRounds, inputStable = true)),
      "tris" -> (() => GraphQueries.kTrussPeelFromTriangles(e, tris,
        GraphQueries.TrussK, GraphQueries.TrussRounds)))
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    var ref: Map[(Long, Long), Long] = null
    (1 to rounds).foreach { _ =>
      (arms ++ arms.reverse).foreach { case (nm, f) =>
        val (dt, rows) = run(nm, f)
        if (ref == null) ref = rows
        require(rows == ref, s"$nm diverged! (${rows.size} vs ${ref.size})")
        times(nm) = times(nm) :+ dt
      }
    }
    arms.map(_._1).foreach { nm =>
      System.err.println(s"[abtruss] $nm runs: " +
        times(nm).map(t => f"$t%.3f").mkString(", ") + f"  min ${times(nm).min}%.3f")
    }
    System.err.println("[abtruss] results EQUAL across all runs")
    spark.stop()
  }
}
