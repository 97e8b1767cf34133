// Dev probe: how selective is q24's length filter ahead of the array
// joins? Run: SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.tools.ProbeQ24Sizes'
package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeQ24Sizes {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val hashed = Dedup.docShinglesHashed(spark, dir)
    val sizes = hashed.select($"doc_id", size($"sh").as("n"))
    val cand = Dedup.jaccardCandidatePairs(spark, dir).distinct()
    val withN = cand
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
    val surv = withN.filter(lit(Dedup.JaccardThreshold) * greatest($"na", $"nb")
      <= least($"na", $"nb").cast("double"))
    println(s"[probe] candidates=${cand.count()} sizeSurvivors=${surv.count()}")
    val bytes = hashed.agg(sum(size($"sh"))).head.getLong(0) * 8
    println(s"[probe] hashed shingle payload ~ ${bytes / 1024 / 1024} MiB over ${hashed.count()} docs")
    spark.stop()
  }
}
