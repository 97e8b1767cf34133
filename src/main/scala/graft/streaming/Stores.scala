package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shared negative-generation fold + read for the maintained
  * batch-partitioned stores — ONE implementation of the compaction
  * sequence CcStream, TriangleStream, KCoreStream, SsspStream and
  * FunnelStream previously hand-rolled (the copies had already diverged
  * on the missing-store guard before round 9 unified three of them).
  *
  * ATOMICITY (round 10): the round-9 fold wrote the staging generation
  * into the live root and only then deleted its sources — any reader in
  * that window saw BOTH and, for SUM-semantics stores (TriangleStream's
  * ±1 edge deltas and per-part count deltas), double-counted; a crash
  * between the write and the deletes left the store permanently folding
  * staging plus sources into a doubled next generation. Freshest-row and
  * distinct-fold stores tolerated the overlap (row_number/distinct pick
  * one); the sum stores made it load-bearing. The fix is a per-generation
  * COVER MANIFEST making the switch a single atomic file rename:
  *
  *   1. the staged fold is written to a temp SIBLING of the root and
  *      renamed in as `batch=<stagingId>` — readers IGNORE a negative
  *      generation with no manifest, so the half-landed generation is
  *      invisible;
  *   2. `_cover_<g>` (underscore-prefixed — invisible to parquet
  *      listings) is renamed into place, naming every source batch the
  *      generation folded. From this instant — one atomic rename —
  *      readers see the generation AND exclude its covered sources;
  *   3. the covered source directories (and folded-away older
  *      generations' manifests) are deleted, purely as space/listing
  *      reclamation: they were already invisible after step 2.
  *
  * A crash anywhere leaves a state the next [[fold]] repairs in its
  * cleanup pass (delete stale temps, finish interrupted deletions, drop
  * unmanifested generations — their rows still live in their sources)
  * and that [[read]] already serves correctly. Every reader of a folded
  * store must go through [[read]]; a raw `spark.read.parquet` over the
  * root would double-count exactly the windows the manifest closes.
  *
  * The staged generation always contains at least one real parquet file
  * (an empty fold result is written through a single reserved task, whose
  * writer creates its file eagerly), so a store whose entire content
  * folds to nothing still has a readable schema — the "all-_SUCCESS root
  * wedges later reads" failure cannot be produced by compaction.
  *
  * One compactor at a time (the documented single-maintainer contract of
  * every caller); ingest is unaffected — live batches touch only their
  * own non-negative ids.
  */
private[graft] object Stores {

  private def fsOf(s: SparkSession, root: Path): FileSystem =
    FileSystem.get(root.toUri, s.sparkContext.hadoopConfiguration)

  // ---------------------------------------------------------------------
  // Bucketed layout (round 11): restriction-first made per-batch SHUFFLE
  // volume delta-sized, but a restricted scan still LISTED AND READ the
  // whole store's files — the remaining linear-in-store term at 100 TB.
  // Stores are therefore partitioned `batch=<id>/<pb>=<bucket>/…` where
  // <pb> is a deterministic hash bucket of a restriction key; a
  // restricted read turns its (delta-sized) key set into ≤ nb bucket ids
  // and pushes them as a PARTITION filter, so planning prunes the
  // listing and scan to the touched buckets. Dual-keyed stores (labels:
  // node AND component) carry one bucket column per key and prune on
  // whichever the consumer restricts. NumBuckets is sized for the local
  // test scale — a deployment sizes it to target-bucket-bytes (hundreds
  // of buckets at 100 TB); the MECHANISM (shared hash, partition filter,
  // plan-asserted pruning) is scale-free.
  // ---------------------------------------------------------------------

  /** One bucket column of a store's layout: `pbCol` is the partition
    * directory column, derived from `keyCol` via [[bucketId]]. */
  case class Bucket(pbCol: String, keyCol: String, nb: Int = NumBuckets)

  /** Buckets per key at local test scale (see the layout note above). */
  val NumBuckets = 8

  /** THE bucket hash — write layout and read pruning must share it for
    * pruning to be sound. xxhash64 is deterministic across JVMs and
    * never null (a null key hashes to the seed's value — tombstone rows
    * land in a real bucket and are prunable like any other). */
  def bucketId(key: Column, nb: Int): Column =
    pmod(xxhash64(key), lit(nb.toLong)).cast("int")

  private def withBucketCols(df: DataFrame, buckets: Seq[Bucket]): DataFrame =
    buckets.foldLeft(df)((d, b) => d.withColumn(b.pbCol, bucketId(col(b.keyCol), b.nb)))

  /** Write one micro-batch under `batch=<id>[/pb=<bucket>…]` with a
    * dynamic partition overwrite (the family's idempotent-replay
    * primitive). Bucketed writes repartition on the bucket columns
    * first so each bucket is written by one task — without it every
    * task writes a sliver of every bucket and the file count multiplies
    * by the task count. */
  def writeBatch(df: DataFrame, batchId: Long, path: String,
      buckets: Seq[Bucket] = Nil): Unit = {
    val parts = "batch" +: buckets.map(_.pbCol)
    val withPb = withBucketCols(df, buckets).withColumn("batch", lit(batchId))
    val out =
      if (buckets.isEmpty) withPb
      else withPb.repartition(buckets.map(b => col(b.pbCol)): _*)
    out.write.mode(SaveMode.Overwrite).option("partitionOverwriteMode", "dynamic")
      .partitionBy(parts: _*).parquet(path)
  }

  /** The distinct bucket ids the keys in `keys`' FIRST column can live
    * in — ≤ nb values, one delta-sized driver action. */
  private def bucketIdsOf(keys: DataFrame, b: Bucket): Seq[Int] =
    keys.select(bucketId(col(keys.columns.head), b.nb).as("pb")).distinct()
      .collect().map(_.getInt(0)).toSeq

  /** Prune an ALREADY-RESOLVED store frame to the buckets the
    * restriction `keys` can live in — [[readPruned]]'s filter half, for
    * callers that resolve ONE frame per batch and restrict it per round
    * (the SSSP relaxation loops): the frame's file index is listed once,
    * and each round's bucket-id set still reaches the scan as a
    * PARTITION filter at that action's planning. A frame without the
    * bucket column (a legacy layout, or a spec's hand-built fixture)
    * falls back unfiltered. */
  def pruneTo(df: DataFrame, b: Bucket, keys: DataFrame): DataFrame =
    if (!df.columns.contains(b.pbCol)) df
    else df.filter(col(b.pbCol).isInCollection(bucketIdsOf(keys, b)))

  /** [[read]] pruned to the buckets the restriction `keys` can live in:
    * the bucket ids become a PARTITION filter, so the scan lists and
    * reads only the touched buckets' files — the file-footprint half of
    * restriction-first (round 10 landed the shuffle half; the caller's
    * semi-join still applies, pruning is a superset filter). A store
    * without the bucket column (a legacy layout, or a spec's hand-built
    * fixture) falls back to the unpruned read. */
  def readPruned(s: SparkSession, path: String, b: Bucket,
      keys: DataFrame): DataFrame =
    pruneTo(read(s, path), b, keys)

  /** Store-root existence probe (scheme-qualified paths work). */
  def exists(s: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** THE family's freshest-row precedence, in one place (the round-10
    * review counted eleven hand-rolled copies of this window across the
    * streams — the exact rot path the round-9 fold dedup closed for
    * compaction): live batches (non-negative ids) outrank compacted
    * generations; among generations the newest — most negative — wins
    * (a generation summarizes everything folded before it). Keeps every
    * input column; callers project after. */
  def freshestPerKey(df: DataFrame, keyCol: String): DataFrame =
    freshestPerKey(df, Seq(keyCol))

  /** Composite-key variant — [[TrussStream]]'s EDGE-keyed results store
    * needs the same precedence over (a, b). */
  def freshestPerKey(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((col("batch") >= 0).desc, abs(col("batch")).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** `df` with a guaranteed ±op column: a store written before its
    * maintainer's ±op era carries none — those rows are all inserts.
    * A missing column is defaulted to +1; a present-but-null op (a
    * schema-merged read over mixed generations) likewise — without the
    * default, an `op === 1` liveness filter silently drops every legacy
    * row. MIGRATION CONTRACT: a legacy store must be [[fold]]-compacted
    * ONCE before ±op batches are appended (the fold stage normalizes
    * every surviving row to +1) — parquet's sampled-schema read over a
    * root mixing op-less and op-bearing files is otherwise ambiguous
    * about which files keep their op values. CcDeltaSpec pins the
    * compact-then-± path. */
  def withOpDefault(df: DataFrame): DataFrame =
    if (!df.columns.contains("op")) df.withColumn("op", lit(1))
    else df.withColumn("op", coalesce(col("op"), lit(1)))

  private case class Survey(present: Set[Long], validGens: Set[Long],
      covered: Set[Long], staleManifests: Seq[Path], tmps: Seq[Path])

  /** One listing of the store root: batch directories, manifested
    * (= visible) negative generations, the union of their covered source
    * ids, plus the debris a crashed fold can leave.
    *
    * A reader overlapping the single compactor can list a manifest that
    * the fold's reclamation step deletes before the reader opens it —
    * the listing is then stale in a way a fresh one repairs, so the open
    * retries the whole survey (bounded) instead of failing the read.
    * (The manifest rename itself is the atomic visibility switch; this
    * retry only covers the post-switch CLEANUP racing a reader's two
    * non-atomic metadata calls. The data-file window — a reader's
    * resolved file index racing source-directory deletion at action time
    * — is governed by the same single-owner serving contract every
    * maintained store documents for compaction.) */
  private def survey(fs: FileSystem, root: Path): Survey = {
    var attempt = 0
    while (true) {
      try {
        val entries = fs.listStatus(root)
        val present = entries.filter(_.isDirectory).map(_.getPath.getName)
          .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong).toSet
        val manifests = entries.filter(!_.isDirectory).map(_.getPath)
          .filter(_.getName.startsWith("_cover_"))
          .map(p => (p, -p.getName.stripPrefix("_cover_").toLong))
        val (valid, stale) = manifests.partition { case (_, gen) => present(gen) }
        val covered = valid.flatMap { case (p, _) =>
          val in = fs.open(p)
          val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          body.split(",").filter(_.nonEmpty).map(_.trim.toLong)
        }.toSet
        val tmps = entries.filter(!_.isDirectory).map(_.getPath)
          .filter(_.getName.startsWith("_tmpcover_"))
        return Survey(present, valid.map(_._2).toSet, covered,
          stale.map(_._1).toSeq, tmps.toSeq)
      } catch {
        case e: java.io.FileNotFoundException =>
          attempt += 1
          if (attempt >= 5) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Live batch ids of the store: present directories minus sources
    * covered by a manifested generation; negative ids count only when
    * manifested (an unmanifested generation is a crashed fold's
    * half-landed write — its rows still live in its sources). */
  private def liveBatches(fs: FileSystem, root: Path): Set[Long] = {
    val st = survey(fs, root)
    st.present.filter(b => !st.covered(b) && (b >= 0 || st.validGens(b)))
  }

  /** The store's rows at its live batch set — the one sanctioned read
    * path over a folded store (see the atomicity note above). The caller
    * is responsible for the root's existence (every caller already
    * guards with its typed-empty-frame fallback). */
  def read(s: SparkSession, path: String): DataFrame = {
    val root = new Path(path)
    val live = liveBatches(fsOf(s, root), root)
    s.read.parquet(path).filter(col("batch").isInCollection(live))
  }

  /** Fold batches ≤ `throughBatch` (plus prior generations) of the
    * batch-partitioned store at `path` into one fresh manifested negative
    * generation, staging the rows through `stage` (whose output must NOT
    * carry the `batch` or bucket columns — the generation directories
    * supply them; pass the store's `buckets` so the generation keeps the
    * bucketed layout and stays prunable). No-op if the store was never
    * created. */
  def fold(s: SparkSession, path: String, throughBatch: Long,
      buckets: Seq[Bucket] = Nil)(
      stage: DataFrame => DataFrame): Unit = {
    val root = new Path(path)
    val fs = fsOf(s, root)
    if (!fs.exists(root)) return

    // repair pass: finish whatever a crashed fold left behind
    val parent = root.getParent
    fs.listStatus(parent).map(_.getPath)
      .filter(_.getName.startsWith(root.getName + ".foldtmp-"))
      .foreach(p => fs.delete(p, true))
    val st0 = survey(fs, root)
    st0.tmps.foreach(p => fs.delete(p, false))
    st0.staleManifests.foreach(p => fs.delete(p, false))
    st0.present.filter(st0.covered).foreach { b =>
      fs.delete(new Path(root, s"batch=$b"), true)
      if (b < 0) fs.delete(new Path(root, s"_cover_${-b}"), false)
    }
    st0.present.filter(b => b < 0 && !st0.validGens(b))
      .foreach(b => fs.delete(new Path(root, s"batch=$b"), true))

    val live = liveBatches(fs, root)
    val sources = live.filter(b => b < 0 || b <= throughBatch)
    if (sources.isEmpty) return
    val stagingId = live.filter(_ < 0).minOption.getOrElse(0L) - 1L

    val src = s.read.parquet(path).filter(col("batch").isInCollection(sources))
    val staged = stage(src).localCheckpoint()
    val tmp = new Path(parent,
      root.getName + ".foldtmp-" + java.util.UUID.randomUUID().toString.take(8))
    if (staged.isEmpty) {
      // a single reserved task creates its parquet file eagerly even with
      // zero rows, keeping the generation's schema readable; bucketed
      // layouts write it under an all-zeros bucket path so partition
      // discovery keeps one consistent directory depth
      val leaf =
        if (buckets.isEmpty) tmp
        else new Path(tmp, buckets.map(b => s"${b.pbCol}=0").mkString("/"))
      staged.repartition(1).write.mode(SaveMode.Overwrite).parquet(leaf.toString)
    } else if (buckets.isEmpty) {
      staged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    } else {
      withBucketCols(staged, buckets)
        .repartition(buckets.map(b => col(b.pbCol)): _*)
        .write.mode(SaveMode.Overwrite)
        .partitionBy(buckets.map(_.pbCol): _*)
        .parquet(tmp.toString)
    }
    if (!fs.rename(tmp, new Path(root, s"batch=$stagingId")))
      throw new java.io.IOException(s"fold: rename $tmp -> batch=$stagingId failed")

    val manifestTmp = new Path(root, s"_tmpcover_${-stagingId}")
    val o = fs.create(manifestTmp, true)
    try o.write(sources.toSeq.sorted.mkString(",").getBytes("UTF-8"))
    finally o.close()
    if (!fs.rename(manifestTmp, new Path(root, s"_cover_${-stagingId}")))
      throw new java.io.IOException(s"fold: manifest rename failed for $path")

    sources.foreach { b =>
      fs.delete(new Path(root, s"batch=$b"), true)
      if (b < 0) fs.delete(new Path(root, s"_cover_${-b}"), false)
    }
  }
}
