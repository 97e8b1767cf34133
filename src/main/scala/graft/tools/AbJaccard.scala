// Dev A/B: q24 prefix plan with string join keys (old) vs 128-bit
// hash-pair keys (current). Run: sbt 'runMain graft.tools.AbJaccard'
//
// Measured at sf0.1, local[32], 5 runs × 2 interleaved rounds: both
// variants converge to ~1.21s min once fully warm — the key change is
// locally NEUTRAL (page-cached parquet, CPU-bound verify dominates); its
// benefit is the ~40% shuffle byte-volume cut (16-byte keys vs ~25-byte
// strings across four exchanges), which pays on a real cluster where
// shuffles hit network and disk, not the page cache.
package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object AbJaccard {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // old plan: string keys end-to-end
    def oldPlan(): DataFrame = {
      val sh = Dedup.docShingles(spark, dir).cache()
      val posting = sh.select($"doc_id", size($"sh").as("n"), explode($"sh").as("shingle"))
      val dfreq = posting.groupBy($"shingle").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"df", $"shingle")
      val prefixes = posting.join(dfreq, "shingle")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= Dedup.prefixLen($"n"))
        .select($"doc_id", $"shingle", $"rn", $"n")
      val t = Dedup.JaccardThreshold
      val requiredOverlap = lit(t / (1.0 + t)) * (col("x.n") + col("y.n")) - lit(1e-9)
      val overlapBound = least(col("x.rn"), col("y.rn")) - 1 +
        least(col("x.n") - col("x.rn"), col("y.n") - col("y.rn")) + 1
      val candidates = prefixes.as("x").join(prefixes.as("y"),
          col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id") &&
            lit(t) * greatest(col("x.n"), col("y.n")) <= least(col("x.n"), col("y.n")).cast("double") &&
            overlapBound.cast("double") >= requiredOverlap)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      Dedup.verifyPairs(candidates, sh, t)
    }

    def time(label: String, f: () => DataFrame): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        f().count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab] $label min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    spark.read.parquet(s"$dir/documents.parquet").count() // warmup
    time("old-string-keys", oldPlan)
    time("new-hash-pairs ", () => Dedup.ngramJaccardPairs(spark, dir))
    // interleaved second round to cancel drift
    time("old-string-keys", oldPlan)
    time("new-hash-pairs ", () => Dedup.ngramJaccardPairs(spark, dir))
    spark.stop()
  }
}
