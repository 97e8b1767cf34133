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
import graft.operators.{Dedup, GraphQueries}
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

  /** DedupStream.processBatch, instrumented sub-phase by sub-phase (in
    * lockstep with the production body — probe-only, never served). */
  private def dedupBatchTimed(s: SparkSession, batch: DataFrame, batchId: Long,
      indexDir: String, pairsDir: String, removedDir: String): Unit = {
    import graft.operators.Dedup
    val family = HashFamily.Fast
    val threshold = Dedup.JaccardThreshold
    val newSh = Dedup.shinglesOf(batch).cache()
    val newBands = Dedup.bandsOf(newSh, family).cache()
    val newShH = newSh.select(col("doc_id"),
      expr("transform(sh, s -> xxhash64(s))").as("sh"))
    val table = t("  ensureBandsTable")(DedupStream.ensureBandsTable(s, indexDir))
    val removedPath = {
      val p = new org.apache.hadoop.fs.Path(removedDir)
      if (p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)) Some(removedDir) else None
    }
    removedPath.foreach { d =>
      t("  revived-check") {
        val rm = s.read.parquet(d)
        val revived = batch.select(col("doc_id"))
          .join(rm.filter(col("batch") < batchId).select(col("doc_id")), "doc_id")
          .limit(1).collect()
        require(revived.isEmpty)
      }
    }
    val oldSh = {
      val p = s"$indexDir/shingles"
      val ph = new org.apache.hadoop.fs.Path(p)
      if (ph.getFileSystem(s.sparkContext.hadoopConfiguration).exists(ph))
        s.read.parquet(p).filter(col("batch") < batchId).select(col("doc_id"), col("sh"))
      else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("sh",
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)))))
    }
    val cand0 = t("  candidates(probe+self+distinct) [lazy]")(
      DedupStream.candidates(s, newBands, batchId, indexDir))
    val cand = removedPath.fold(cand0) { d =>
      val mask = s.read.parquet(d).filter(col("batch") <= batchId)
      cand0
        .join(Stores.broadcastIfUnder(mask.select(col("doc_id").as("__rm_a")), d),
          col("doc_a") === col("__rm_a"), "left_anti")
        .join(Stores.broadcastIfUnder(mask.select(col("doc_id").as("__rm_b")), d),
          col("doc_b") === col("__rm_b"), "left_anti")
    }
    val verified = Dedup.verifyHashedPairs(cand, oldSh.unionByName(newShH), threshold)
    t("  verify+pairs-write")(
      verified.withColumn("batch", lit(batchId))
        .write.mode(SaveMode.Overwrite).option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch").parquet(pairsDir))
    t("  bands-write")(
      graft.store.Bucketing.withDynamicPartitionOverwrite(s, batch.sparkSession) {
        newBands.select(col("doc_id"), col("band"), col("bhash"))
          .withColumn("batch", lit(batchId))
          .write.mode(SaveMode.Overwrite).insertInto(table)
      })
    t("  shingles-write")(
      newShH.withColumn("batch", lit(batchId))
        .write.mode(SaveMode.Overwrite).option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch").parquet(s"$indexDir/shingles"))
    newBands.unpersist(); newSh.unpersist()
  }

  /** CcStream.processBatch, instrumented sub-phase by sub-phase. */
  private def ccBatchTimed(batch: DataFrame, batchId: Long, storeDir: String): Unit = {
    val s = batch.sparkSession
    import s.implicits._
    if (batch.isEmpty) return
    val withOp =
      if (batch.columns.contains("op")) batch.select($"src", $"dst", $"op")
      else batch.select($"src", $"dst", lit(1).as("op"))
    t("  edges-writeBatch")(Stores.writeBatch(
      withOp.union(withOp.select($"dst".as("src"), $"src".as("dst"), $"op")),
      batchId, s"$storeDir/edges", CcStream.EdgeBuckets))
    val touched = t("  touched-ckpt")(batch.select($"src".as("node"))
      .union(batch.select($"dst")).distinct().localCheckpoint())
    val labelsExist = Stores.exists(s, s"$storeDir/labels")
    val affectedNodes = t("  membersOf+union")((
      if (!labelsExist) touched
      else CcStream.membersOf(s, storeDir, touched).union(touched).distinct()
    ).localCheckpoint())
    val induced = CcStream.liveEdgesRestricted(s, storeDir, batchId, affectedNodes)
    val labels = t("  minLabelPropagation")(
      GraphQueries.minLabelPropagation(induced, GraphQueries.ScaleCcRounds)
        .localCheckpoint())
    val tombstones = affectedNodes.join(labels, Seq("node"), "left_anti")
      .select($"node", lit(null).cast("long").as("component"))
    val labelRows = t("  tombstones+labelRows-ckpt")(
      labels.union(tombstones).localCheckpoint())
    t("  labels-writeReplicaBatch")(
      Stores.writeReplicaBatch(labelRows, batchId, storeDir, CcStream.LabelReplicas))
  }

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
        dedupBatchTimed(s, adds, batchId, indexDir, pairsDir, removedDir))
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
      t("CcStream.processBatch")(ccBatchTimed(ccBatch, batchId, s"$rootDir/cc"))
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
