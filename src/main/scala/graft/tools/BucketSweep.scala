// Measures the store bucket count for the q24 prefix / q25 band
// self-joins (VERDICT r5 directive 2): for each count in the sweep, the
// bucketed store is built once (untimed — the prepare stage), then the
// consuming query is timed warm, in INTERLEAVED rounds so machine drift
// hits every config equally. The store key carries the bucket count, so
// configs never alias each other's stores.
//
// Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
//   sbt 'runMain graft.tools.BucketSweep [outFile]'
// Committed artifact: BUCKETSWEEP_r06.json
package graft.tools

import graft.functions.HashFamily
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

object BucketSweep {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = args.headOption
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val counts = Seq(16, 32, 64)
    val rounds = 3
    val runsPerRound = 3
    spark.read.parquet(s"$dir/documents.parquet").count() // warmup

    def timed(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val q24 = scala.collection.mutable.Map.empty[Int, Vector[Double]].withDefaultValue(Vector())
    val q25 = scala.collection.mutable.Map.empty[Int, Vector[Double]].withDefaultValue(Vector())
    var expected: Option[(Long, Long)] = None
    for (r <- 0 until rounds; b <- counts) {
      System.setProperty("graft.store.buckets", b.toString)
      if (r == 0) { // build this config's stores once, untimed
        Dedup.ngramJaccardPairs(spark, dir).count()
        Dedup.minhashLshPairs(spark, dir, HashFamily.Fast).count()
      }
      val n24 = Dedup.ngramJaccardPairs(spark, dir).count()
      val n25 = Dedup.minhashLshPairs(spark, dir, HashFamily.Fast).count()
      // every timed config must produce the identical pair sets
      expected match {
        case Some((e24, e25)) => require(e24 == n24 && e25 == n25,
          s"bucket count $b changed results: q24 $n24 vs $e24, q25 $n25 vs $e25")
        case None => expected = Some((n24, n25))
      }
      q24(b) = q24(b) ++ (1 to runsPerRound).map(_ => timed(Dedup.ngramJaccardPairs(spark, dir).count()))
      q25(b) = q25(b) ++ (1 to runsPerRound).map(_ => timed(Dedup.minhashLshPairs(spark, dir, HashFamily.Fast).count()))
      System.err.println(f"[bucketsweep] round $r b=$b q24 ${q24(b).takeRight(runsPerRound).min}%.2f q25 ${q25(b).takeRight(runsPerRound).min}%.2f")
    }

    def stats(ts: Vector[Double]): String = {
      val s = ts.sorted
      f"""{"min":${s.head}%.3f,"median":${s((s.length - 1) / 2)}%.3f,"max":${s.last}%.3f,"runs":${s.length}}"""
    }
    val json = counts.map(b =>
      s""""b$b":{"q24":${stats(q24(b))},"q25":${stats(q25(b))}}""").mkString("{", ",", s""","sf":"$dir"}""")
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
