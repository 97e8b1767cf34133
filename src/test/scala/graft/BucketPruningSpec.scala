package graft

import graft.streaming.{CcStream, SsspDeltaStream, SsspStream, Stores, TriangleStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-11 bucket-pruning contract, asserted on EXECUTED plans (the
  * RestrictedScanSpec pattern one level down): restriction-first made
  * per-batch shuffle volume delta-sized, but a restricted scan still
  * listed and read the whole store's files — the stores are now
  * partitioned `batch=<id>/<pb>=<hashbucket>/…` and every restricted
  * read must (a) carry a PARTITION filter on its bucket column and
  * (b) actually read fewer files than the store holds. Semantics are
  * pinned alongside: pruning is a superset filter, so results must be
  * byte-identical to the unpruned computation. */
class BucketPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString + "/store"

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(scans)
  }

  private def parquetFilesUnder(dir: String): Long = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .count(_.getFileName.toString.endsWith(".parquet"))
  }

  /** Runs `df`, finds the parquet scans whose location matches `frag`,
    * and returns (total files READ across them, every-scan-pruned on one
    * of `pbCols`). `numFiles` is the scan's own driver metric — files
    * the planned read actually covers after partition pruning. */
  private def scanStats(df: DataFrame, frag: String,
      pbCols: Set[String]): (Long, Boolean) = {
    df.collect()
    val fs = scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains(frag)))
    assert(fs.nonEmpty, s"no parquet scan over $frag in the executed plan")
    val files = fs.map(_.metrics("numFiles").value).sum
    val pruned = fs.forall(
      _.partitionFilters.exists(_.references.exists(a => pbCols(a.name))))
    (files, pruned)
  }

  private def oneNode(n: Long): DataFrame = {
    import spark.implicits._
    Seq(n).toDF("node")
  }

  test("CcStream: labelsOf / membersOf / edge reads prune to touched buckets") {
    import spark.implicits._
    val store = tmp("bprune-cc")
    // 200 disjoint components across two batches: labels and edges
    // populate every node/component/src bucket
    CcStream.processBatch(
      (1L to 120L).map(i => (i, i + 1000L)).toDF("src", "dst"), 0L, store)
    CcStream.processBatch(
      (121L to 200L).map(i => (i, i + 1000L)).toDF("src", "dst"), 1L, store)
    val totalLabelFiles = parquetFilesUnder(s"$store/labels")
    val totalEdgeFiles = parquetFilesUnder(s"$store/edges")
    assert(totalLabelFiles > Stores.NumBuckets,
      "fixture too small — labels must span buckets for pruning to be visible")

    // labelsOf: node-restricted → pbn partition filter
    val labs = CcStream.labelsOf(spark, store, oneNode(5L))
    val (lf, lp) = scanStats(labs, "/labels", Set("pbn"))
    assert(lp, "labelsOf scan must carry a pbn partition filter")
    assert(lf < totalLabelFiles, s"labelsOf read $lf of $totalLabelFiles files")
    assert(labs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((5L, 5L)))

    // membersOf: three label reads (touched labelsOf, pbc candidates,
    // arbitration labelsOf) — each must prune on ITS restriction key,
    // and even summed they must read less than one full store scan
    val mem = CcStream.membersOf(spark, store, oneNode(5L))
    val (mf, mp) = scanStats(mem, "/labels", Set("pbn", "pbc"))
    assert(mp, "every membersOf label scan must carry a pbn/pbc partition filter")
    assert(mf < totalLabelFiles,
      s"membersOf label scans read $mf files — more than one full scan ($totalLabelFiles)")
    assert(mem.collect().map(_.getLong(0)).toSet === Set(5L, 1005L))

    // liveEdgesRestricted: src-restricted → pbs partition filter
    val ind = CcStream.liveEdgesRestricted(spark, store, 10L, oneNode(5L))
    val (ef, ep) = scanStats(ind, "/edges", Set("pbs"))
    assert(ep, "edge scan must carry a pbs partition filter")
    assert(ef < totalEdgeFiles, s"edge read $ef of $totalEdgeFiles files")
    assert(ind.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((5L, 1005L)))
  }

  test("compaction preserves the bucketed layout — folded generations stay prunable") {
    import spark.implicits._
    val store = tmp("bprune-fold")
    CcStream.processBatch(
      (1L to 150L).map(i => (i, i + 1000L)).toDF("src", "dst"), 0L, store)
    CcStream.processBatch(
      (151L to 200L).map(i => (i, i + 1000L)).toDF("src", "dst"), 1L, store)
    val before = CcStream.snapshot(spark, store).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    CcStream.compact(spark, store, throughBatch = 1L)
    val total = parquetFilesUnder(s"$store/labels")
    assert(total > Stores.NumBuckets,
      "folded generation must itself span buckets")
    val labs = CcStream.labelsOf(spark, store, oneNode(5L))
    val (lf, lp) = scanStats(labs, "/labels", Set("pbn"))
    assert(lp && lf < total,
      s"post-compaction labelsOf must stay pruned (read $lf of $total)")
    val after = CcStream.snapshot(spark, store).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after === before, "compaction changed the served labels")
  }

  test("TriangleStream: edgesTouching prunes each branch on its endpoint bucket") {
    import spark.implicits._
    val store = tmp("bprune-tri")
    // a 120-node path of projected edges: supplier 100+i witnesses edge
    // (i, i+1) — edges span both endpoint buckets
    val pairs = (1L to 120L).flatMap(i => Seq((i, 100L + i), (i + 1, 100L + i)))
    TriangleStream.processBatch(pairs.toDF("p", "su"), 0L, store)
    val totalEdgeFiles = parquetFilesUnder(s"$store/edges")
    assert(totalEdgeFiles > Stores.NumBuckets,
      "fixture too small — edges must span buckets")
    val et = TriangleStream.edgesTouching(spark, store, 5L,
      Seq(5L).toDF("n"))
    val (f, p) = scanStats(et, "/edges", Set("pba", "pbb"))
    assert(p, "both edgesTouching branches must carry endpoint partition filters")
    assert(f < totalEdgeFiles,
      s"edgesTouching read $f files — not less than the store's $totalEdgeFiles")
    assert(et.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((4L, 5L), (5L, 6L)))
  }

  test("SsspStream: dist lookups and relaxation edge reads prune to frontier buckets") {
    import spark.implicits._
    val store = tmp("bprune-sssp")
    // two-level star (diameter 2, so relaxation converges in a few
    // rounds): hub 1 → spokes, spoke i → leaf i+1000 — dists and edges
    // span every node/src bucket
    def tier(r: Range) = r.flatMap(i => Seq((1L, i.toLong, 1L), (i.toLong, i + 1000L, 1L)))
    SsspStream.processBatch(tier(2 to 120).toDF("src", "dst", "w"),
      0L, store, source = 1L, budget = 1000L)
    SsspStream.processBatch(tier(121 to 200).toDF("src", "dst", "w"),
      1L, store, source = 1L, budget = 1000L)
    val totalDistFiles = parquetFilesUnder(s"$store/dists")
    val totalEdgeFiles = parquetFilesUnder(s"$store/edges")
    assert(totalDistFiles > Stores.NumBuckets,
      "fixture too small — dists must span buckets for pruning to be visible")

    // the wired freshest-row lookup: node-restricted → pbn
    val d = SsspStream.distsOf(Some(Stores.read(spark, s"$store/dists")), oneNode(5L))
    val (df1, dp) = scanStats(d, "/dists", Set("pbn"))
    assert(dp, "distsOf scan must carry a pbn partition filter")
    assert(df1 < totalDistFiles, s"distsOf read $df1 of $totalDistFiles files")
    assert(d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === Set((5L, 1L)))

    // the relaxation rounds' edge frame: src-bucket pruned
    val e = Stores.pruneTo(Stores.read(spark, s"$store/edges"),
        SsspStream.EdgeBucket, oneNode(5L))
      .join(oneNode(5L).withColumnRenamed("node", "src"), Seq("src"), "left_semi")
      .select($"src", $"dst")
    val (ef, ep) = scanStats(e, "/edges", Set("pbs"))
    assert(ep, "relaxation edge scan must carry a pbs partition filter")
    assert(ef < totalEdgeFiles, s"edge read $ef of $totalEdgeFiles files")
    assert(e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((5L, 1L), (5L, 1005L)))

    // compaction keeps the layout: the folded generation stays prunable
    val before = SsspStream.snapshot(spark, store).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    SsspStream.compact(spark, store, throughBatch = 1L)
    val total = parquetFilesUnder(s"$store/dists")
    val d2 = SsspStream.distsOf(Some(Stores.read(spark, s"$store/dists")), oneNode(5L))
    val (f2, p2) = scanStats(d2, "/dists", Set("pbn"))
    assert(p2 && f2 < total,
      s"post-compaction distsOf must stay pruned (read $f2 of $total)")
    val after = SsspStream.snapshot(spark, store).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after === before, "compaction changed the served distances")
  }

  test("SsspDeltaStream: dist, cone-probe and event reads prune on their bucket keys") {
    import spark.implicits._
    val store = tmp("bprune-ssspd")
    def tier(r: Range) = r.flatMap(i =>
      Seq((1L, i.toLong, 1L, 1), (i.toLong, i + 1000L, 1L, 1)))
    SsspDeltaStream.processBatch(tier(2 to 120).toDF("src", "dst", "w", "op"),
      0L, store, source = 1L, budget = 1000L)
    SsspDeltaStream.processBatch(tier(121 to 200).toDF("src", "dst", "w", "op"),
      1L, store, source = 1L, budget = 1000L)
    val totalDistFiles = parquetFilesUnder(s"$store/dists")
    val totalEventFiles = parquetFilesUnder(s"$store/events")
    assert(totalDistFiles > Stores.NumBuckets,
      "fixture too small — dists must span buckets")

    // freshest-row lookup: node-restricted → pbn
    val fr = SsspDeltaStream.freshRowsOf(
      Some(Stores.read(spark, s"$store/dists")), oneNode(5L))
    val (ff, fp) = scanStats(fr, "/dists", Set("pbn"))
    assert(fp, "freshRowsOf scan must carry a pbn partition filter")
    assert(ff < totalDistFiles, s"freshRowsOf read $ff of $totalDistFiles files")
    assert(fr.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      === Set((5L, 1L, 1L)))

    // damaged-cone descendant probe ("whose rows point AT the
    // frontier?"): pred-restricted → pbp
    val cone = Stores.pruneTo(Stores.read(spark, s"$store/dists"),
        SsspDeltaStream.DistPredBucket, oneNode(5L))
      .join(oneNode(5L).withColumnRenamed("node", "pred"), Seq("pred"), "left_semi")
      .select($"node")
    val (cf, cp) = scanStats(cone, "/dists", Set("pbp"))
    assert(cp, "cone probe must carry a pbp partition filter")
    assert(cf < totalDistFiles, s"cone probe read $cf of $totalDistFiles files")
    assert(cone.collect().map(_.getLong(0)).toSet === Set(1005L))

    // live-edge lookup: src-restricted → pbs
    val le = SsspDeltaStream.liveEdgesFrom(
      Stores.read(spark, s"$store/events"), oneNode(5L))
    val (lf, lp) = scanStats(le, "/events", Set("pbs"))
    assert(lp, "liveEdgesFrom scan must carry a pbs partition filter")
    assert(lf < totalEventFiles, s"liveEdgesFrom read $lf of $totalEventFiles files")
    assert(le.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((5L, 1L), (5L, 1005L)))
  }

  test("a store without bucket columns falls back to the unpruned read") {
    import spark.implicits._
    val store = tmp("bprune-legacy")
    // hand-built legacy layout: batch partition only (the pre-r11 shape)
    Seq((1L, 1L), (2L, 1L)).toDF("node", "component")
      .withColumn("batch", lit(0L))
      .write.option("partitionOverwriteMode", "dynamic").partitionBy("batch")
      .parquet(s"$store/labels")
    val labs = CcStream.labelsOf(spark, store, oneNode(2L))
    assert(labs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((2L, 1L)), "legacy layout must still serve (unpruned)")
  }
}
