// Cold-lane breakdown of q112's takedown replay (22-27 s in the bench's
// cold column — the single most expensive path in the artifact, VERDICT
// r17 item 3): replays q112Store's four batches DIRECTLY (the same
// slices the streaming wiring delivers) with wall timers around each
// phase of DedupClusterStream.processBatch — the op split, the
// DedupStream insert path (shingle/band/probe/verify/writes), the
// dead-pair derivation, and the nested CcStream label recompute — plus
// the final compact and snapshot. Attribution first (guide §1), then
// surgery. Run: sbt 'runMain graft.tools.ProbeQ112 <sfDir> [reps]'
package graft.tools

import graft.streaming.{CcStream, DedupStream, Stores}
import graft.functions.HashFamily
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

object ProbeQ112 {

  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[probeq112]   $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  private val pairsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_a", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("doc_b", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("jaccard", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("batch", org.apache.spark.sql.types.LongType)))

  /** DedupClusterStream.processBatch, instrumented phase by phase (kept
    * in lockstep with the production body — probe-only, never served). */
  private def processBatchTimed(s: SparkSession, batch: DataFrame, batchId: Long,
      rootDir: String): Unit = {
    import s.implicits._
    val indexDir = s"$rootDir/index"; val pairsDir = s"$rootDir/pairs"
    val ccDir = s"$rootDir/cc"; val removedDir = s"$rootDir/removed"
    val hasOps = batch.columns.contains("op")
    val b = t("checkpoint+split")(batch.localCheckpoint())
    val opCol = if (hasOps) $"op" else lit(1)
    val split = b.agg(count(lit(1)).as("n"),
      coalesce(sum(when(opCol === -1, 1L).otherwise(0L)), lit(0L)).as("nd")).head()
    val (n, nDel) = (split.getLong(0), split.getLong(1))
    if (n == 0L) return
    val anyDels = nDel > 0L
    val dels =
      if (anyDels) b.filter($"op" === -1).select($"doc_id")
      else s.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0)
    val adds =
      (if (hasOps) b.filter($"op" =!= -1) else b)
        .select($"doc_id", $"text")
        .join(dels, Seq("doc_id"), "left_anti")
    if (anyDels)
      t("removed-store write")(
        dels.select($"doc_id", lit(batchId).as("rmb"), lit(batchId).as("batch"))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch").parquet(removedDir))
    val nAdds = if (!anyDels) n else adds.count()
    if (nAdds > 0L)
      t("DedupStream.processBatch")(
        DedupStream.processBatch(s, adds, batchId, indexDir, pairsDir,
          HashFamily.Fast, Dedup.JaccardThreshold, removedDir = Some(removedDir)))
    val exists = {
      val p = new org.apache.hadoop.fs.Path(pairsDir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
    }
    val pairsSrc =
      if (exists) s.read.schema(pairsSchema).parquet(pairsDir)
      else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], pairsSchema)
    val newPairs = pairsSrc
      .filter($"batch" === batchId)
      .select($"doc_a".as("src"), $"doc_b".as("dst"), lit(1).as("op"))
    val deadPairs =
      if (!anyDels) newPairs.limit(0)
      else t("dead-pair derivation") {
        val prevRm = Stores.broadcastIfUnder(
          s.read.parquet(removedDir)
            .filter($"batch" < batchId).select($"doc_id".as("__prm")),
          removedDir)
        val prior = pairsSrc.filter($"batch" < batchId)
          .select($"doc_a", $"doc_b")
          .join(prevRm, $"doc_a" === $"__prm", "left_anti")
          .join(prevRm, $"doc_b" === $"__prm", "left_anti")
        val rmA = prior.join(broadcast(dels.select($"doc_id".as("__rm"))),
          $"doc_a" === $"__rm", "left_semi")
        val rmBOnly = prior
          .join(broadcast(dels.select($"doc_id".as("__rm"))),
            $"doc_b" === $"__rm", "left_semi")
          .join(broadcast(dels.select($"doc_id".as("__rm"))),
            $"doc_a" === $"__rm", "left_anti")
        rmA.union(rmBOnly)
          .select($"doc_a".as("src"), $"doc_b".as("dst"), lit(-1).as("op"))
      }
    val ccBatch = t("ccBatch checkpoint")(deadPairs.union(newPairs).localCheckpoint())
    if (!ccBatch.isEmpty)
      t("CcStream.processBatch")(CcStream.processBatch(ccBatch, batchId, s"$rootDir/cc"))
    val _ = ccDir
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
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

    (1 to reps).foreach { rep =>
      val root = java.nio.file.Files.createTempDirectory("probeq112").toString + "/store"
      val docs = graft.Tables.t(spark, dir, "documents")
        .select($"doc_id", $"text").cache()
      val retire = $"doc_id" % 5 === 0 && $"doc_id" % 3 =!= 2
      val slices = Seq(
        docs.filter($"doc_id" % 3 === 0).select($"doc_id", $"text", lit(1).as("op")),
        docs.filter($"doc_id" % 3 === 1).select($"doc_id", $"text", lit(1).as("op")),
        docs.filter(retire).select($"doc_id", lit("").as("text"), lit(-1).as("op")),
        docs.filter($"doc_id" % 3 === 2).select($"doc_id", $"text", lit(1).as("op")))
      val t0 = System.nanoTime()
      slices.zipWithIndex.foreach { case (sl, i) =>
        System.err.println(s"[probeq112] rep $rep batch $i:")
        processBatchTimed(spark, sl, i.toLong, root)
      }
      t("compact")(graft.streaming.DedupClusterStream.compact(spark, root, throughBatch = 2L))
      val nRows = t("snapshot+collect")(
        graft.streaming.DedupClusterStream.snapshot(spark, root).orderBy($"doc_id").count())
      System.err.println(f"[probeq112] rep $rep TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s ($nRows rows)")
      docs.unpersist()
    }
    spark.stop()
  }
}
