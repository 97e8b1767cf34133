// The KCoreStream scaladoc's giant-component mitigation, measured:
// "deployments facing a giant component should batch coarsely (amortize
// the re-peel)". This probe ingests the SAME skewed graph (MaintBench's
// giant-component fixture at the sf0.1 scale — the giant holds ~90%
// of the NODES and ~99% of the EDGES; edge share is the figure that
// governs re-peel cost) two ways — the standard three
// node-sliced micro-batches (three re-peels of the giant) vs ONE coarse
// batch (one re-peel) — equality-checks the served k-core between them,
// and emits both wall-time totals so the amortization factor is a number,
// not an implication.
//
// Run: sbt 'runMain graft.tools.KCoarseProbe [outFile] [sfDir]'
package graft.tools

import graft.streaming.KCoreStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object KCoarseProbe {

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) Some(args(0)) else None
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def tmp() = java.nio.file.Files.createTempDirectory("kcoarse").toString + "/store"
    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val spN = graft.Tables.t(spark, dir, "lineitem")
      .filter($"l_quantity" === 50)
      .select($"l_partkey", $"l_suppkey").distinct().count()
    val skew = MaintBench.skewEdges(spark, spN).cache()
    val edges = skew.count()

    val fine = tmp()
    val fineTimes = Seq(0, 1, 2).map { i =>
      val sl = skew.filter($"slice" === i).select($"src", $"dst")
      secs(KCoreStream.processBatch(sl, i.toLong, fine))
    }
    val coarse = tmp()
    val coarseTime = secs(
      KCoreStream.processBatch(skew.select($"src", $"dst"), 0L, coarse))

    val a = KCoreStream.snapshot(spark, fine).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = KCoreStream.snapshot(spark, coarse).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    require(a == b, s"fine/coarse k-core disagree: ${a.size} vs ${b.size} rows")
    skew.unpersist()

    val json =
      s"""{"sf":"$dir","skew_edges":$edges,"served_rows":${a.size},""" +
        s""""fine_batches":{${fineTimes.zipWithIndex.map { case (t, i) => s""""batch$i":$t""" }.mkString(",")},"total":${fineTimes.sum}},""" +
        s""""coarse_batch_total":$coarseTime,""" +
        s""""amortization_x":${fineTimes.sum / coarseTime},""" +
        """"note":"KCoreStream on the skew graph whose giant component holds ~99% of the edges (~90% of the nodes) (low-diameter expander core in slice 0, extra chord families in slices 1-2 - every batch touches every giant node and every stream prefix satisfies the min-label fixpoint-within-rounds precondition): three micro-batches (each re-peels the giant) vs ONE coarse batch (one re-peel), fine==coarse equality-checked - the check that caught the first fixture's precondition violation. The ratio is the scaladoc's 'batch coarsely' mitigation quantified; expect ~3x amortization minus fixed per-batch overhead, same-box variance applies (see MAINTBENCH_r10 note)."}"""
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
