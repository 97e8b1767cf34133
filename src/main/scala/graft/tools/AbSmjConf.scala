// Same-JVM interleaved A/B for `spark.sql.join.preferSortMergeJoin`
// (round 18, VERDICT r17 item 9): full warm passes over the bench query
// list, arms alternating D,S,S,D per round (D = default true, S =
// false, i.e. planner may pick shuffled-hash joins). The conf is a
// runtime session conf, so both arms share one session and the stores
// are built once before the timed passes (warm-path comparison, the
// bench's warm cells). A conf flip changes join PHYSICAL strategy only,
// never results; the adopt/reject criterion is the per-query-min
// geomean. Run: sbt 'runMain graft.tools.AbSmjConf <sfDir> [rounds]'
package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

object AbSmjConf {
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

    val benched = SparkEntry.registry.filter(_.bench)
    // store builds + steady state once, untimed
    benched.foreach { q =>
      try q.benchRun.getOrElse(q.run)(spark, dir).count()
      catch { case e: Throwable => System.err.println(s"[absmj] prime ${q.name}: ${e.getMessage}") }
    }

    def pass(): Map[String, Double] = benched.map { q =>
      val t0 = System.nanoTime()
      q.benchRun.getOrElse(q.run)(spark, dir).count()
      q.name -> (System.nanoTime() - t0) / 1e9
    }.toMap

    val times = scala.collection.mutable.Map
      .empty[(String, String), List[Double]].withDefaultValue(Nil)
    def arm(name: String, prefer: Boolean): Unit = {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", prefer)
      val p = pass()
      System.err.println(f"[absmj] $name pass total ${p.values.sum}%.3f s")
      p.foreach { case (q, t) => times((name, q)) = times((name, q)) :+ t }
    }
    (1 to rounds).foreach { _ =>
      arm("smj", prefer = true); arm("shj", prefer = false)
      arm("shj", prefer = false); arm("smj", prefer = true)
    }
    val names = benched.map(_.name)
    var logSum = 0.0
    names.foreach { q =>
      val a = times(("smj", q)).min; val b = times(("shj", q)).min
      logSum += math.log(b / a)
      System.err.println(f"[absmj] $q%-36s smj=$a%.3f shj=$b%.3f ratio=${b / a}%.3f")
    }
    System.err.println(f"[absmj] geomean shj/smj = ${math.exp(logSum / names.size)}%.4f " +
      f"(totals smj=${names.map(q => times(("smj", q)).min).sum}%.3f " +
      f"shj=${names.map(q => times(("shj", q)).min).sum}%.3f)")
    spark.stop()
  }
}
