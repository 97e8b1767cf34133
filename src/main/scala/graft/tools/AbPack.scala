// Dev A/B: the packing family's running-offset stage — per-source WINDOW
// (round ≤16 shape, single WindowExec task per source) vs two-pass
// distributed PREFIX SUM (round 17, PrefixSum.cumEndBySource).
// Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.tools.AbPack'
// Writes the artifact JSON to $SPARK_GRAFT_AB_OUT (default PACKAB_r17.json).
//
// The round-16 verdict marked the window shape WEAK: `source` has a
// handful of values, so PARTITION BY source funnels every row of a
// corpus source through ONE task — parallelism = #sources at 100 TB.
// The prefix sum removes that ceiling at the cost of being two passes
// (a range-sampling/materialize job and a partials job) instead of one
// window stage. This tool measures that fixed overhead honestly at the
// bench SF on q70's full pipeline (tokenize → counts → offsets → bin
// aggregate), arms asserted result-equal before timing, interleaved
// rounds, compare minima (noisy box). The small-SF loser is still the
// 100 TB winner — the window's cost curve has a one-task wall, the
// prefix sum's is flat in #sources — but the artifact records what the
// rewrite costs where the wall is not yet visible.
package graft.tools

import graft.operators.PrefixSum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object AbPack {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_AB_OUT", "PACKAB_r17.json")
    val runs = sys.env.getOrElse("SPARK_GRAFT_AB_RUNS", "5").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val PackBin = graft.operators.TextOps.PackBinTokens
    def toks(): DataFrame = spark.read.parquet(s"$dir/documents.parquet")
      .select($"source", $"doc_id",
        size(split(lower(trim($"text")), "\\s+")).cast("long").as("toks"))
    def binAgg(withCum: DataFrame): DataFrame = withCum
      .withColumn("bin", expr(s"(cum_end - toks) div $PackBin"))
      .groupBy($"source", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"toks").as("n_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))

    def windowArm(): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"doc_id")
      binAgg(toks().withColumn("cum_end", sum($"toks").over(w)))
    }
    def prefixArm(): DataFrame = binAgg(PrefixSum.cumEndBySource(toks()))

    val a = windowArm().collect().map(_.toString).sorted
    val b = prefixArm().collect().map(_.toString).sorted
    require(a.sameElements(b),
      s"arms disagree: window=${a.length} rows, prefix=${b.length} rows")

    def time(f: () => DataFrame): Seq[Double] =
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        f().count()
        (System.nanoTime() - t0) / 1e9
      }

    val (w1, p1) = (time(windowArm), time(prefixArm))
    val (w2, p2) = (time(windowArm), time(prefixArm))
    val (wAll, pAll) = (w1 ++ w2, p1 ++ p2)
    def fmt(ts: Seq[Double]) = ts.map(t => f"$t%.3f").mkString("[", ",", "]")

    // ---- the wall itself, made visible at local scale: a synthetic
    // corpus big enough that per-source single-task sorting dominates.
    // SOURCES sources × ROWS rows: the window arm funnels ROWS/SOURCES
    // rows through ONE WindowExec task each (parallelism = SOURCES on a
    // 32-thread box), the prefix arm spreads the same rows over every
    // core. This is the sf-independent demonstration that the fixed
    // overhead measured above buys the scale property the rewrite
    // exists for. ----
    val synthRows = sys.env.getOrElse("SPARK_GRAFT_AB_SYNTH_ROWS", "20000000").toLong
    val synthSources = sys.env.getOrElse("SPARK_GRAFT_AB_SYNTH_SOURCES", "2").toInt
    val synthRuns = sys.env.getOrElse("SPARK_GRAFT_AB_SYNTH_RUNS", "3").toInt
    def synth(): DataFrame = spark.range(synthRows)
      .select(concat(lit("src"), ($"id" % synthSources)).as("source"),
        $"id".as("doc_id"), ($"id" % 97 + 1).as("toks"))
    def synthWindow(): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"doc_id")
      binAgg(synth().withColumn("cum_end", sum($"toks").over(w)))
    }
    def synthPrefix(): DataFrame = binAgg(PrefixSum.cumEndBySource(synth()))
    def timeS(f: () => DataFrame): Seq[Double] =
      (1 to synthRuns).map { _ =>
        val t0 = System.nanoTime()
        f().count()
        (System.nanoTime() - t0) / 1e9
      }
    // equality on the synthetic arms too — content signature (row count
    // + order-independent sum of row hashes), not just group count: a
    // bin-shift bug that preserves the number of (source, bin) groups
    // must fail this gate (the real-data arms above compare full sorted
    // row sets; 2M synthetic bins are too many to collect)
    def sig(f: () => DataFrame): (Long, Long) = {
      val r = f().agg(count(lit(1)),
        sum(hash($"source", $"bin", $"n_docs", $"n_tokens",
          $"first_doc", $"last_doc").cast("long"))).head()
      (r.getLong(0), r.getLong(1))
    }
    require(sig(synthWindow) == sig(synthPrefix), "synth arms disagree")
    val (sw1, sp1) = (timeS(synthWindow), timeS(synthPrefix))
    val (sw2, sp2) = (timeS(synthWindow), timeS(synthPrefix))
    val (swAll, spAll) = (sw1 ++ sw2, sp1 ++ sp2)

    val json =
      s"""{"ab":"packing offsets: per-source window vs two-pass distributed prefix sum",
         |"sf_dir":"$dir","runs_per_round":$runs,"rounds":2,
         |"window_min_sec":${f"${wAll.min}%.3f"},"prefix_min_sec":${f"${pAll.min}%.3f"},
         |"window_all":${fmt(wAll)},"prefix_all":${fmt(pAll)},
         |"synth":{"rows":$synthRows,"sources":$synthSources,"runs_per_round":$synthRuns,
         |"window_min_sec":${f"${swAll.min}%.3f"},"prefix_min_sec":${f"${spAll.min}%.3f"},
         |"window_all":${fmt(swAll)},"prefix_all":${fmt(spAll)}},
         |"note":"q70 full pipeline both arms; results asserted equal before timing; interleaved rounds, compare minima. At bench SF the prefix arm pays a fixed two-extra-job cost; the synth block (few sources, many rows) is the wall that cost buys off: the window arm's parallelism is #sources, the prefix arm's is the partition count."}"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
