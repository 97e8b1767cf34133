// Maintenance-cost probe for the maintained-store graph family: the
// CORRECTNESS rows (q93/q94/q96/q98/q99) prove the streamed stores exact;
// this measures what exactness COSTS per micro-batch, across scale
// factors — the empirical check of the per-batch working-set claim
// (touched components / delta adjacency / dup volume, not corpus volume).
// Each maintainer ingests its standard three-slice split at each SF with
// per-batch wall times; emits one JSON artifact.
//
// The lane fixtures and schedules live in [[MaintLanes]], shared with
// [[MaintAb]] (the bucketed-vs-flat isolation A/B) so the two artifacts
// measure THE SAME ingest schedules — divergent copies would make the
// A/B incomparable to the headline lanes.
//
// Run: sbt 'runMain graft.tools.MaintBench [outFile] [sfDirs,comma-sep] [lanes,comma-sep]'
package graft.tools

import graft.streaming.{AnnDeltaStream, CcStream, DedupClusterStream, FunnelStream, KCoreStream, SemDedupStream, SsspDeltaStream, SsspStream, TriangleStream, TrussStream}
import graft.operators.GraphQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One maintainer's bench lane: its micro-batch schedule plus the step
  * that folds a batch into a store rooted at the caller's directory.
  * `prepare` runs UNTIMED before each attempt — for shared prepare-stage
  * cost (e.g. ann_delta's centroid training) that is not per-batch
  * maintenance and must not land in batch 0's cell. `post` runs TIMED
  * after the schedule and lands in its own `post` cell — for maintenance
  * jobs priced separately from ingest (e.g. the dedup index purge). */
private[tools] final case class Lane(name: String,
    slices: Seq[DataFrame], step: (DataFrame, Long, String) => Unit,
    prepare: () => Unit = () => (),
    post: Option[String => Unit] = None)

/** The maintenance lanes' shared fixtures and schedules at one SF dir —
  * cached frames; call [[unpersist]] when done. */
private[tools] final class MaintLanes(spark: SparkSession, dir: String) {
  import spark.implicits._

  val sp: DataFrame = graft.Tables.t(spark, dir, "lineitem")
    .filter($"l_quantity" === 50)
    .select(($"l_partkey".cast("long") * 2).as("src"),
      ($"l_suppkey".cast("long") * 2 + 1).as("dst"))
    .distinct().cache()
  val spN: Long = sp.count()
  val rawPairs: DataFrame = graft.Tables.t(spark, dir, "lineitem")
    .filter($"l_quantity" === 50)
    .select($"l_partkey".cast("long").as("p"), $"l_suppkey".cast("long").as("su"))
    .distinct().cache()
  val weighted: DataFrame = graft.Tables.t(spark, dir, "lineitem")
    .select($"l_partkey".cast("long").as("p"), $"l_suppkey".cast("long").as("su"))
    .distinct()
    .select(($"p" * 2).as("src"), ($"su" * 2 + 1).as("dst"),
      (lit(1L) + ($"p" * 3 + $"su" * 5) % 7).as("w"))
    .cache()
  val wN: Long = weighted.count()
  val source: Long = 2L * graft.Tables.t(spark, dir, "lineitem")
    .agg(min($"l_suppkey".cast("long"))).head().getLong(0) + 1L
  val docs: DataFrame = graft.Tables.t(spark, dir, "documents")
    .select($"doc_id", $"text").cache()
  val docN: Long = docs.count()
  val skew: DataFrame = MaintBench.skewEdges(spark, spN).cache()
  val skewN: Long = skew.count()
  val events: DataFrame = graft.Tables.events(spark, dir)
    .select($"user_id", $"event_type", $"ts_us").cache()
  val evN: Long = events.count()
  val embd: DataFrame = graft.Tables.t(spark, dir, "embeddings")
    .select($"vec_id", $"embedding".cast("array<double>").as("vec"))
    .withColumn("del", $"vec_id" % 5 === 0)
    .withColumn("reins", $"vec_id" % 10 === 0)
    .cache()
  val embN: Long = embd.count()
  // frozen codebook for the ann_delta lane — LAZY so lane-filtered runs
  // that exclude it never pay centroid training (the lane's step closure
  // forces it on first batch; training cost is the shared prepare stage
  // every retrieval query amortizes, not a per-batch maintenance cost)
  lazy val cents: Seq[(Long, Seq[Double])] =
    graft.operators.Similarity.trainedCentroids(spark, dir)

  private def slices3(d: DataFrame, col_ : String): Seq[DataFrame] =
    Seq(0, 1, 2).map(i => d.filter(expr(s"($col_) % 3 = $i")))

  // sssp_delta's third batch DELETES every (p+su)%5==0 pair — the
  // damaged-cone maintenance path, not an insert relaxation
  private val delta = weighted
    .withColumn("del", ((($"src" / 2) + (($"dst" - 1) / 2)) % 5 === 0))
  private val deltaSlices = Seq(
    delta.filter(expr("(dst div 2) % 2 = 0")).select($"src", $"dst", $"w", lit(1).as("op")),
    delta.filter(expr("(dst div 2) % 2 = 1")).select($"src", $"dst", $"w", lit(1).as("op")),
    delta.filter($"del").select($"src", $"dst", lit(0L).as("w"), lit(-1).as("op")))
  // the decremental 4-batch schedules (insert/insert/delete/re-insert
  // — the q102/q103 shapes): batch 2 exercises split recompute /
  // witness-withdrawal deltas, batch 3 resurrection
  private val spd = sp
    .withColumn("del", expr("((src div 2) + ((dst - 1) div 2)) % 5 = 0"))
    .withColumn("reins", expr("((src div 2) + ((dst - 1) div 2)) % 10 = 0"))
  private val rpd = rawPairs
    .withColumn("del", expr("(p + su) % 5 = 0"))
    .withColumn("reins", expr("(p + su) % 10 = 0"))
  // q106's shape: the capped part-part projection with an edge-granular
  // delete/re-insert schedule (truss deletions are edge-granular;
  // witness-granular lives in the triangle lane)
  private val projd = {
    val smallSu = rawPairs.groupBy($"su").agg(count(lit(1)).as("d"))
      .filter($"d" <= GraphQueries.TriDegreeCap).select($"su")
    val keptp = rawPairs.join(smallSu, Seq("su"), "left_semi")
    keptp.as("x").join(keptp.as("y"), $"x.su" === $"y.su" && $"x.p" < $"y.p")
      .select($"x.p".as("a"), $"y.p".as("b")).distinct()
      .withColumn("del", ($"a" + $"b") % 5 === 0)
      .withColumn("reins", ($"a" + $"b") % 10 === 0)
      .cache()
  }

  val all: Seq[Lane] = Seq(
    Lane("cc", slices3(sp, "dst div 2"),
      (b, i, d) => CcStream.processBatch(b, i, d)),
    Lane("cc_delta", Seq(
        spd.filter(expr("(dst div 2) % 2 = 0")).select($"src", $"dst", lit(1).as("op")),
        spd.filter(expr("(dst div 2) % 2 = 1")).select($"src", $"dst", lit(1).as("op")),
        spd.filter($"del").select($"src", $"dst", lit(-1).as("op")),
        spd.filter($"reins").select($"src", $"dst", lit(1).as("op"))),
      (b, i, d) => CcStream.processBatch(b, i, d)),
    Lane("sssp", slices3(weighted, "dst div 2"),
      (b, i, d) => SsspStream.processBatch(b, i, d, source, GraphQueries.ScaleSsspBudget)),
    Lane("sssp_delta", deltaSlices,
      (b, i, d) => SsspDeltaStream.processBatch(b, i, d, source, GraphQueries.ScaleSsspBudget)),
    Lane("triangle", slices3(rawPairs, "su"),
      (b, i, d) => TriangleStream.processBatch(b, i, d)),
    Lane("triangle_delta", Seq(
        rpd.filter(expr("su % 2 = 0")).select($"p", $"su", lit(1).as("op")),
        rpd.filter(expr("su % 2 = 1")).select($"p", $"su", lit(1).as("op")),
        rpd.filter($"del").select($"p", $"su", lit(-1).as("op")),
        rpd.filter($"reins").select($"p", $"su", lit(1).as("op"))),
      (b, i, d) => TriangleStream.processBatch(b, i, d)),
    Lane("truss_delta", Seq(
        projd.filter($"b" % 2 === 0).select($"a", $"b", lit(1).as("op")),
        projd.filter($"b" % 2 === 1).select($"a", $"b", lit(1).as("op")),
        projd.filter($"del").select($"a", $"b", lit(-1).as("op")),
        projd.filter($"reins").select($"a", $"b", lit(1).as("op"))),
      (b, i, d) => TrussStream.processBatch(b, i, d)),
    Lane("kcore", slices3(sp, "dst div 2"),
      (b, i, d) => KCoreStream.processBatch(b, i, d)),
    Lane("kcore_skew", Seq(0, 1, 2).map(i =>
        skew.filter($"slice" === i).select($"src", $"dst")),
      (b, i, d) => KCoreStream.processBatch(b, i, d)),
    // the truss giant-component honesty probe (round 13): the SAME skew
    // fixture through TrussStream — one giant low-diameter component
    // every batch touches, so each batch re-peels ~the whole graph's
    // supports by design (the KCoreStream cliff with the support-peel
    // multiplier on top; TrussStream normalizes edge orientation itself)
    Lane("truss_skew", Seq(0, 1, 2).map(i =>
        skew.filter($"slice" === i).select($"src".as("a"), $"dst".as("b"))),
      (b, i, d) => TrussStream.processBatch(b, i, d)),
    Lane("dedup_cluster", slices3(docs, "doc_id"),
      (b, i, d) => DedupClusterStream.processBatch(spark, b, i, d)),
    // the q112 shape: insert/insert/retire/late-insert — batch 2 retires
    // every already-ingested doc_id % 5 == 0 document (pair withdrawals
    // through the nested CC store + the index mask), batch 3 probes the
    // masked index
    Lane("dedup_takedown", Seq(
        docs.filter($"doc_id" % 3 === 0).select($"doc_id", $"text", lit(1).as("op")),
        docs.filter($"doc_id" % 3 === 1).select($"doc_id", $"text", lit(1).as("op")),
        docs.filter($"doc_id" % 5 === 0 && $"doc_id" % 3 =!= 2)
          .select($"doc_id", lit("").as("text"), lit(-1).as("op")),
        docs.filter($"doc_id" % 3 === 2).select($"doc_id", $"text", lit(1).as("op"))),
      (b, i, d) => DedupClusterStream.processBatch(spark, b, i, d),
      // the q114 maintenance job, priced as its own post-schedule cell:
      // one mask-aware rewrite of the whole band/shingle index
      post = Some(d => DedupClusterStream.purgeRetired(spark, d, throughBatch = 3L))),
    // the q113 shape: insert/insert/retract/re-insert over the events
    // corpus — batch 2 retracts every event of the % 7 == 0 users (the
    // deleted-user tombstone path) plus the % 5 == 3 users' clicks (stage
    // demotion), batch 3 resurrects the % 10 == 3 users' clicks
    Lane("funnel_delta", {
      val gone = $"user_id" % 7 === 0
      val demoted = $"user_id" % 7 =!= 0 && $"user_id" % 5 === 3 &&
        $"event_type" === "click"
      Seq(
        events.filter($"user_id" % 2 === 0).withColumn("op", lit(1)),
        events.filter($"user_id" % 2 === 1).withColumn("op", lit(1)),
        events.filter(gone || demoted).withColumn("op", lit(-1)),
        events.filter(demoted && $"user_id" % 10 === 3).withColumn("op", lit(1)))
    }, (b, i, d) => FunnelStream.processBatch(b, i, d)),
    // the q110 shape: insert/insert/delete/re-insert over the embedding
    // corpus against the frozen trained codebook (deletes carry null vecs)
    Lane("ann_delta", Seq(
        embd.filter($"vec_id" % 2 === 0).select($"vec_id", $"vec", lit(1).as("op")),
        embd.filter($"vec_id" % 2 === 1).select($"vec_id", $"vec", lit(1).as("op")),
        embd.filter($"del").select($"vec_id",
          lit(null).cast("array<double>").as("vec"), lit(-1).as("op")),
        embd.filter($"reins").select($"vec_id", $"vec", lit(1).as("op"))),
      (b, i, d) => AnnDeltaStream.processBatch(b, i, d, cents),
      prepare = () => { cents; () }),
    // the q132 shape: the ann_delta schedule through SemDedupStream —
    // each batch additionally discovers its τ-pairs against the prior
    // live rows of the touched cells; the pair-store fold (drop pairs
    // that no longer resolve, one negative generation) is the
    // maintenance job, priced as its own post cell
    Lane("semdedup_delta", Seq(
        embd.filter($"vec_id" % 2 === 0).select($"vec_id", $"vec", lit(1).as("op")),
        embd.filter($"vec_id" % 2 === 1).select($"vec_id", $"vec", lit(1).as("op")),
        embd.filter($"del").select($"vec_id",
          lit(null).cast("array<double>").as("vec"), lit(-1).as("op")),
        embd.filter($"reins").select($"vec_id", $"vec", lit(1).as("op"))),
      (b, i, d) => SemDedupStream.processBatch(b, i, d, cents),
      prepare = () => { cents; () },
      post = Some(d => SemDedupStream.compact(spark, d, throughBatch = 3L))))

  def unpersist(): Unit = {
    sp.unpersist(); rawPairs.unpersist(); weighted.unpersist()
    docs.unpersist(); skew.unpersist(); projd.unpersist(); embd.unpersist()
    events.unpersist()
  }
}

object MaintBench {

  /** Skewed component distribution for the k-core honesty probes — one
    * giant component holding ~99% of the edges, the rest disjoint
    * 4-cycles — with BOTH preconditions of the maintained-store engines
    * engineered in, not assumed:
    *
    *  - the giant is a LOW-DIAMETER circulant (chords = powers of 3, so
    *    any gap closes in ≤ 2·log₃ g ≈ 18 hops — inside ScaleCcRounds =
    *    20), and it arrives WHOLE in slice 0 with slices 1 and 2 adding
    *    extra chord families (+5, +11) over every node: each batch
    *    touches every giant node (the full-re-peel degeneracy under
    *    measurement) and EVERY STREAM PREFIX is itself low-diameter, so
    *    min-label reaches fixpoint within the round budget at every
    *    step. The first cut of this fixture sliced a high-diameter
    *    ring+chord giant by node residue — its chord-3 edges formed a
    *    3,600-hop chain whose labels could NOT converge in 20 rounds,
    *    silently violating the engines' documented fixpoint
    *    precondition (caught by KCoarseProbe's fine≡coarse equality
    *    check, which now guards exactly this);
    *  - the fringe is sized to a multiple of 4 so every 4-cycle closes
    *    (an open tail path would peel out of the 2-core).
    *
    * Returns (src, dst, slice) — callers feed slice ∈ {0, 1, 2} as the
    * three micro-batches. */
  def skewEdges(spark: org.apache.spark.sql.SparkSession, spN: Long): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val nSkew = ((math.max(60L, spN) + 39L) / 40L) * 40L
    val g = nSkew * 9 / 10
    val chords = Iterator.iterate(1L)(_ * 3L).takeWhile(_ < g / 2).toSeq
    val expander = chords.map(c =>
        spark.range(g).select($"id".as("src"), (($"id" + c) % g).as("dst")))
      .reduce(_ union _)
      .withColumn("slice", lit(0))
    def family(c: Long, sl: Int) =
      spark.range(g).select($"id".as("src"), (($"id" + c) % g).as("dst"))
        .withColumn("slice", lit(sl))
    // disjoint 4-cycles: dst = same group's next position (integer
    // arithmetic via - and %, NOT `/` — Column division is double);
    // sliced by position so prefix fragments are short paths
    val fringe = spark.range(g, nSkew).select($"id".as("src"),
        (lit(g) + ($"id" - g) - (($"id" - g) % 4) + (($"id" - g + 1) % 4)).as("dst"))
      .withColumn("slice", (($"src" - g) % 3).cast("int"))
    expander.union(family(5L, 1)).union(family(11L, 2)).union(fringe)
      .filter($"src" =!= $"dst")
  }

  /** Integer env knob with a loud failure mode: a malformed value aborts
    * with a message NAMING the variable (the lane-filter error style),
    * not a bare NumberFormatException from nowhere. */
  private[tools] def envInt(name: String, default: Int): Int =
    sys.env.get(name).fold(default) { v =>
      require(scala.util.Try(v.toInt).isSuccess,
        s"$name must be an integer, got '$v'")
      v.toInt
    }

  private[tools] def time[T](f: => T): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private[tools] def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  private[tools] def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) Some(args(0)) else None
    val sfDirs = (if (args.length > 1) args(1).split(",").toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"))
    val laneFilter = if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = session()

    val sfJsons = sfDirs.map { dir =>
      val lanes = new MaintLanes(spark, dir)
      val picked = laneFilter.fold(lanes.all)(f => lanes.all.filter(l => f(l.name)))
      laneFilter.foreach(f => require(picked.map(_.name).toSet == f,
        s"unknown lane in $f (have ${lanes.all.map(_.name)})"))
      // min-of-N (SPARK_GRAFT_MAINT_RUNS, default 1), attempts INTERLEAVED
      // ACROSS LANES (round 14): the r13 artifacts proved back-to-back
      // repeats of one lane share a multi-minute ambient burst (both
      // attempts of several sf0.1 lanes in MAINTBENCH_r13_minof2 were
      // poisoned together; single-shot lanes took 5-20x spikes — one
      // sf0.01 batch read 207 s on one run, 12 s on the next). Attempt
      // k of every lane runs before attempt k+1 of any lane — the MaintAb
      // arm-interleaving trick applied to the headline bench — so a burst
      // lands in at most one attempt per lane and the best-total attempt
      // filters it. Every attempt's total is emitted so a reader still
      // sees the spread.
      val runs = envInt("SPARK_GRAFT_MAINT_RUNS", 1).max(1)
      val attemptsByLane: Map[String, Seq[(Seq[Double], Option[Double])]] = {
        val acc = scala.collection.mutable.Map
          .empty[String, Vector[(Seq[Double], Option[Double])]]
          .withDefaultValue(Vector.empty)
        for (_ <- 1 to runs; lane <- picked) {
          lane.prepare()
          val store = tmp(s"mb-${lane.name}")
          val ts = lane.slices.zipWithIndex.map { case (sl, i) =>
            time(lane.step(sl, i.toLong, store)) }
          val postT = lane.post.map(f => time(f(store)))
          System.err.println(f"[maintbench] $dir ${lane.name}: ${ts.map(t => f"$t%.1f").mkString(", ")} s" +
            postT.fold("")(p => f" (post $p%.1f s)"))
          acc(lane.name) = acc(lane.name) :+ ((ts, postT))
        }
        acc.toMap
      }
      val rows = picked.map { lane =>
        val attempts = attemptsByLane(lane.name)
        val (ts, post) = attempts.minBy(_._1.sum)
        val runsJson =
          if (runs == 1) ""
          else s""","runs":[${attempts.map(_._1.sum).mkString(",")}]"""
        val postJson = post.fold("")(p => s""","post":$p""")
        s""""${lane.name}":{${ts.zipWithIndex.map { case (t, i) => s""""batch$i":$t""" }.mkString(",")},"total":${ts.sum}$postJson$runsJson}"""
      }
      lanes.unpersist()
      val sf = dir.split("/").last
      s""""$sf":{"sparse_pairs":${lanes.spN},"weighted_edges":${lanes.wN},"documents":${lanes.docN},"skew_edges":${lanes.skewN},"embeddings":${lanes.embN},"events":${lanes.evN},${rows.mkString(",")}}"""
    }

    val json = "{" + sfJsons.mkString(",") +
      ""","note":"per-micro-batch wall seconds for each maintained-store graph maintainer ingesting its standard split (three slices; the *_delta lanes use the 4-batch insert/insert/delete/re-insert schedule of q102/q103), per scale factor (one JVM, sequential). The claim under test: per-batch cost tracks the touched working set (affected components / delta-edge adjacency / dup volume), not corpus volume - so cost should grow sub-linearly in SF wherever the touched volume does. kcore_skew = the honest degenerate case, a giant component holding ~99% of the edges that every node-sliced batch touches, so each batch re-peels ~the whole graph by design (see KCoreStream scaladoc). r12 additions: truss_delta (the q106 edge-granular 4-batch schedule over the capped part-part projection - the composed nested-CC + support-peel maintainer, the family's most expensive member) now has a measured lane; FunnelStream's events store joined the bucketed layout; lane fixtures are shared with MaintAb (MAINTAB_r12), the same-JVM bucketed/unpruned/flat isolation A/B that splits the r11 lane regression into layout cost vs liveness cost. r14 additions: dedup_takedown - the q112 insert/insert/retire/late-insert schedule through DedupClusterStream (pair withdrawals via the nested CC store + the probe mask; batch 3 measures the masked-probe path); ann_delta - the q110 insert/insert/delete/re-insert schedule over the embedding corpus through AnnDeltaStream (per-batch cost is assignment of the batch's own rows + a partitioned write; the index is never read on ingest, so batches should cost their own size at every SF; centroid training is excluded - it is the shared prepare stage, forced in an untimed prepare step before each attempt). r15 additions: funnel_delta - the q113 insert/insert/retract/re-insert schedule through FunnelStream (per-batch cost is the touched users' histories; the retraction batch touches the retired users, so its cost is their history volume plus the funnel-row rewrite); dedup_takedown now also emits a 'post' cell = the q114 PHYSICAL index purge (one mask-aware rewrite of the band/shingle index, a maintenance job priced separately from ingest). r13 addition: truss_skew - the kcore_skew giant-component fixture fed through TrussStream, measuring the documented degenerate-component cliff (every batch re-peels ~the whole giant's supports by design) for the truss maintainer directly instead of transferring the kcore number. Same-box variance caveat of MAINTBENCH_r10 applies; with SPARK_GRAFT_MAINT_RUNS=N>1 each lane repeats its full schedule N times against a fresh store and the per-batch row is the best-total run (all run totals in 'runs'); attempts are INTERLEAVED across lanes (r14: attempt k of every lane runs before attempt k+1 of any lane), so a multi-minute ambient burst poisons at most one attempt per lane instead of all attempts of one lane."}"""
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
