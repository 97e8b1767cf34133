// Dev tool: stage-level timing of q24 warm cost at the bench SF.
// Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.tools.ProfileQ24'
package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileQ24 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[q24prof] $label%-28s min=${ts.map(_._1).min}%.3f all=${ts.map(t => f"${t._1}%.2f").mkString(",")} rows=${ts.head._2}")
    }

    // build stores once (untimed)
    Dedup.ngramJaccardPairs(spark, dir).count()

    time("docShingles scan")(Dedup.docShingles(spark, dir).count())
    time("prefix store scan")(Dedup.docJaccardPrefixes(spark, dir).count())
    // the SHIPPED candidate join — shared with ngramJaccardPairs, so the
    // profiler can never drift from the query it claims to measure
    def candidates = Dedup.jaccardCandidatePairs(spark, dir)
    time("candidate self-join")(candidates.count())
    time("candidates distinct")(candidates.distinct().count())
    time("verify (full q24)")(Dedup.ngramJaccardPairs(spark, dir).count())
    spark.stop()
  }
}
