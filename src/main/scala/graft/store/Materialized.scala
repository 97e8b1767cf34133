package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Session-scoped materialized relations — the IVF-index amortization
  * pattern (q28) generalized: a derived relation many operators consume
  * (shingles, tokens) is computed ONCE per (session, key) and parquet-
  * backed thereafter, instead of being re-derived inside every consuming
  * query's plan. The first consumer pays the build — visible in its
  * timing, the same contract as the q28 index build; every later consumer
  * runs a columnar scan with pushdown/pruning intact.
  *
  * At 100 TB this is the canonical "prepare" stage of a curation
  * pipeline: tokenize/shingle the corpus once into a columnar
  * intermediate, then point every dedup/quality/packing pass at it.
  * Re-deriving the transform per query multiplies the dominant CPU cost
  * of the whole pipeline by the number of passes.
  *
  * CONTRACT — immutable inputs per key: the cache is keyed by
  * (session, key) and never revalidated, so the relation a key derives
  * from must not change for the session's lifetime. Every call site keys
  * by the input's scale-factor directory (`"shingles:$dir"`), and the
  * harness treats those directories as immutable snapshots — exactly the
  * prepare-stage assumption of a real pipeline, where the materialized
  * intermediate is stamped to one corpus snapshot. A caller that rewrites
  * an input in place must [[invalidate]] its keys (the bench's cold-run
  * lane and tests use this to force a rebuild); nothing does so
  * implicitly.
  *
  * STAGING (round 6): when `spark.graft.stagingDir` (session conf) or
  * `SPARK_GRAFT_STAGING` (env) names a root, store locations derive from
  * the KEY under that root and outlive the session — a fresh session (or
  * JVM) over the same immutable corpus snapshot RE-ATTACHES to the
  * existing files instead of rebuilding every prefix/band index
  * (bucketed stores restore their catalog entry + bucket spec with the
  * DedupStream `ensureBandsTable` idempotent-DDL pattern; the data files
  * are the truth). A `_SUCCESS`-incomplete directory — a torn previous
  * build — is rebuilt with a full overwrite. [[invalidate]] DELETES
  * staged stores so it still forces a rebuild. Without a staging root
  * the stores are per-JVM temp directories reclaimed by a shutdown hook,
  * the local-test default. The staging root itself is GOVERNED (round
  * 10): every build/attach stamps recency and evicts the least-recently-
  * attached stores beyond `spark.graft.stagingMaxStores` (default 256)
  * / `spark.graft.stagingMaxBytes` (default unbounded); stores held by
  * this JVM's live sessions are exempt, and an evicted store simply
  * rebuilds on next use. Concurrent FIRST
  * builds of one key from separate JVMs race benignly only if they
  * compute identical bytes (they do — pure functions of the snapshot);
  * the harness serializes sbt JVMs anyway.
  */
object Materialized {
  private val stores =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** Corpus directory embedded in a store key (every call site keys as
    * `name:<sf dir>[...]`) — the [[CorpusCaches]] eviction unit. */
  private def corpusOf(key: String): Option[String] =
    key.split(':').find(_.startsWith("/"))

  private def stagingRoot(s: SparkSession): Option[String] =
    s.conf.getOption("spark.graft.stagingDir").orElse(sys.env.get("SPARK_GRAFT_STAGING"))

  private def keyHash(key: String): String = {
    val b = key.getBytes("UTF-8")
    java.lang.Long.toHexString(
      org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
        b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 7) & 0xFFFFFFFFL)
  }

  /** Complete-build marker: the Hadoop committer writes `_SUCCESS` last,
    * so its presence distinguishes an attachable store from a torn one. */
  private def isComplete(s: SparkSession, dir: String): Boolean = {
    val p = new Path(dir, "_SUCCESS")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  // ---- staged-store governor (round 10) -------------------------------
  // Staged stores outlive every session BY DESIGN (re-attach is the whole
  // point), which left the staging root growing without bound as corpora
  // came and went. The governor bounds it: each build/attach stamps the
  // store with a monotonic recency marker and then evicts the LEAST
  // RECENTLY ATTACHED stores beyond the configured budget. Stores held by
  // THIS JVM's live sessions are never evicted (the CorpusCaches wiring:
  // a corpus evicted from the session cache drops its map entries and
  // thereby becomes governable); an evicted store simply rebuilds on next
  // use — the invalidate() contract, applied by age. Like compaction,
  // governance assumes one writer JVM at a time over a staging root; a
  // multi-writer deployment sizes the budget above its working set.

  /** Max staged stores kept under a staging root (count budget). */
  private def maxStagedStores(s: SparkSession): Int =
    s.conf.getOption("spark.graft.stagingMaxStores")
      .orElse(sys.props.get("graft.staging.maxStores"))
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .getOrElse(256)

  /** Max total bytes kept under a staging root (size budget; default
    * unbounded — counting stores is the cheap first-order control). */
  private def maxStagedBytes(s: SparkSession): Long =
    s.conf.getOption("spark.graft.stagingMaxBytes")
      .orElse(sys.props.get("graft.staging.maxBytes"))
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      .getOrElse(Long.MaxValue)

  private val TouchMarker = "_graft_touched"

  /** Eviction grace: stores touched within this window are never evicted
    * — closes the race where a concurrent relation() has touched a store
    * it is still attaching (not yet in the maps) when another thread's
    * governStaged runs under a tight budget. */
  private def stagingGraceMs(s: SparkSession): Long =
    s.conf.getOption("spark.graft.stagingGraceMs")
      .orElse(sys.props.get("graft.staging.graceMs"))
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      .getOrElse(15L * 60 * 1000)

  private val touchSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Recency stamp: wall-clock millis (comparable ACROSS JVM instances —
    * System.nanoTime is only ordered within one JVM and can invert after
    * a restart, which would evict the freshest stores first) shifted to
    * make room for a per-JVM counter that breaks same-millisecond ties
    * (file mtime alone is second-granular on some filesystems). */
  private def touchStamp(): Long =
    (System.currentTimeMillis() << 20) | (touchSeq.incrementAndGet() & 0xFFFFFL)

  private def touchStaged(s: SparkSession, dir: String): Unit =
    try {
      val p = new Path(dir, TouchMarker)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val o = fs.create(p, true)
      try o.write(touchStamp().toString.getBytes("UTF-8")) finally o.close()
    } catch { case _: Throwable => () }

  private def stampOf(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Long =
    try {
      val p = new Path(dir, TouchMarker)
      if (!fs.exists(p)) 0L
      else {
        val in = fs.open(p)
        val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        body.trim.toLong
      }
    } catch { case _: Throwable => 0L }

  /** Evict least-recently-attached staged stores until the root fits the
    * budgets. `keepName` (the store just touched) and every store a live
    * session of this JVM currently maps are exempt. */
  private def governStaged(s: SparkSession, root: String, keepName: String): Unit = {
    val maxN = maxStagedStores(s)
    val maxB = maxStagedBytes(s)
    if (maxN == Int.MaxValue && maxB == Long.MaxValue) return
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootP)) return
    val heldNames: Set[String] =
      stores.values.map(p => new Path(p).getName).toSet ++
        tables.keys.flatMap { case (ss, key) =>
          stagingRoot(ss).map(r => new Path(stagedBucketPath(r, key)).getName)
        }
    val entries = fs.listStatus(rootP).filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => p.getName.startsWith("mat_") || p.getName.startsWith("matbkt_"))
    var total = entries.length
    var totalBytes =
      if (maxB == Long.MaxValue) 0L
      else entries.map(p => try fs.getContentSummary(p).getLength catch {
        case _: Throwable => 0L
      }).sum
    // grace window: anything touched recently may be mid-attach in
    // another thread/JVM — never evict it (see stagingGraceMs)
    val graceFloor = (System.currentTimeMillis() - stagingGraceMs(s)) << 20
    val evictable = entries
      .filterNot(p => p.getName == keepName || heldNames(p.getName))
      .map(p => (p, stampOf(fs, p)))
      .filter(_._2 < graceFloor)
      .sortBy(_._2)
      .map(_._1)
    evictable.foreach { p =>
      if (total > maxN || totalBytes > maxB) {
        val bytes = if (maxB == Long.MaxValue) 0L
          else try fs.getContentSummary(p).getLength catch { case _: Throwable => 0L }
        if (fs.delete(p, true)) { total -= 1; totalBytes -= bytes }
      }
    }
  }

  private def deletePath(s: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Temp directory reclaimed at JVM exit — the store location when no
    * staging root is configured. */
  private def tempStore(prefix: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }))
    d
  }

  /** Serve `build`'s result from the per-(session, key) parquet store,
    * building it on first use — or re-attaching to a completed staged
    * build of the same key. Thread-safe: TrieMap.getOrElseUpdate is
    * atomic, so concurrent first consumers agree on one store. */
  def relation(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val store = stores.getOrElseUpdate((s, key), {
      stagingRoot(s) match {
        case Some(root) =>
          val out = s"$root/mat_${keyHash(key)}"
          if (!isComplete(s, out)) {
            // concurrent first builds (two sessions or two JVMs) must not
            // write the same directory — two Overwrite jobs share commit
            // staging and can tear each other into a _SUCCESS-carrying
            // mixed file set. Each builder writes a UNIQUE temp sibling
            // and atomically renames it into place: the first completed
            // build wins, a loser discards its copy and attaches to the
            // winner (contents are deterministic, so any winner is
            // equally correct). A torn store from a crashed PRIOR JVM
            // (no _SUCCESS) is cleared before building.
            deletePath(s, out)
            val tmp = s"$root/.build_${keyHash(key)}_" +
              java.util.UUID.randomUUID().toString.take(8)
            build.write.mode(SaveMode.Overwrite).parquet(tmp)
            val fs = new Path(out).getFileSystem(s.sparkContext.hadoopConfiguration)
            if (!fs.rename(new Path(tmp), new Path(out))) deletePath(s, tmp)
            // Hadoop rename-onto-existing-directory is NOT a reliable
            // failure: HDFS (and some local-FS paths) move src INTO the
            // destination as a child and return true. Readers stay correct
            // either way (the dot-prefixed name is hidden from parquet
            // listings), but the loser's full copy would leak inside the
            // store forever — sweep any .build_* children out of the
            // winning store.
            val outPath = new Path(out)
            if (fs.exists(outPath))
              fs.listStatus(outPath).map(_.getPath)
                .filter(_.getName.startsWith(".build_"))
                .foreach(p => fs.delete(p, true))
          }
          touchStaged(s, out)
          governStaged(s, root, new Path(out).getName)
          out
        case None =>
          val out = s"${tempStore("graft-mat")}/rel"
          build.write.mode(SaveMode.Overwrite).parquet(out)
          out
      }
    })
    // LRU-governed per corpus: eviction drops only the cache entry — the
    // next consumer rebuilds (temp) or re-attaches (staged); files are
    // reclaimed by the shutdown hook / staging TTLs as before
    corpusOf(key).foreach(d =>
      CorpusCaches.retain(s, d, s"mat:$key")(() => { stores.remove((s, key)); () }))
    s.read.parquet(store)
  }

  private val tables =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** Catalog name of a bucketed store — a pure function of the key, so a
    * fresh session re-attaching a staged store restores the SAME entry. */
  private[graft] def bucketedTableName(key: String): String =
    "graft_mat_" + keyHash(key)

  private def stagedBucketPath(root: String, key: String): String =
    s"$root/matbkt_${keyHash(key)}"

  /** [[relation]] in BUCKETED form: the store is a bucketed table
    * (pre-shuffled on `bucketCols` at build time), so an equi-join of the
    * relation with ITSELF on the bucket key — the shape of every
    * candidate-pair generator in the dedup family — runs with no exchange
    * on either side (the `store.Bucketing` co-location property, applied
    * to a derived relation instead of a base table). Same immutable-input
    * contract as [[relation]]. With a staging root, a fresh session over
    * an already-built key re-registers the table over the existing files
    * (empty bucketed write = catalog entry + bucket spec only) instead of
    * rebuilding. */
  def bucketedRelation(s: SparkSession, key: String, bucketCols: Seq[String],
      buckets: Int)(build: => DataFrame): DataFrame = {
    val name = tables.getOrElseUpdate((s, key), {
      val n = bucketedTableName(key)
      def register(path: String, rebuild: Boolean): Unit =
        if (rebuild) {
          // cleared first so a torn previous build never mixes files;
          // the CTAS then runs against an empty location (CTAS refuses
          // non-empty ones) with the default ErrorIfExists table mode
          deletePath(s, path)
          build.write.format("parquet")
            .option("path", path)
            .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
            .sortBy(bucketCols.head, bucketCols.tail: _*)
            .saveAsTable(n)
        } else {
          // attach: the files are the truth — restore only the catalog
          // entry + bucket spec with plain DDL (an external CREATE TABLE
          // accepts a populated location; CTAS does not)
          val cols = bucketCols.map(c => s"`$c`").mkString(", ")
          s.sql(s"""CREATE TABLE $n (${s.read.parquet(path).schema.toDDL})
            USING PARQUET
            CLUSTERED BY ($cols) SORTED BY ($cols) INTO $buckets BUCKETS
            LOCATION '$path'""")
        }
      if (!s.catalog.tableExists(n)) {
        stagingRoot(s) match {
          case Some(root) =>
            val path = stagedBucketPath(root, key)
            register(path, rebuild = !isComplete(s, path))
            touchStaged(s, path)
            governStaged(s, root, new Path(path).getName)
          case None =>
            // EXTERNAL table at a fresh temp path: a managed table's
            // warehouse location outlives the (in-memory) catalog that
            // named it, so a fresh session hashing the same key would
            // collide with the last JVM's directory; a unique path per
            // build sidesteps that and the shutdown hook reclaims it
            register(s"${tempStore("graft-mat-bkt")}/rel", rebuild = true)
        }
      }
      n
    })
    corpusOf(key).foreach(d =>
      CorpusCaches.retain(s, d, s"matbkt:$key") { () =>
        tables.remove((s, key))
        // external table: DROP removes only the catalog entry; staged
        // files re-attach on next use, temp files die with the JVM
        try s.sql(s"DROP TABLE IF EXISTS $name") catch { case _: Throwable => () }
        ()
      })
    s.table(name)
  }

  /** Drop every store of `s` (all keys): the next consumer rebuilds from
    * its current input. For tests and for measuring cold (prepare-stage-
    * inclusive) timings. Temp-dir store files are left for the shutdown
    * hook; STAGED stores are deleted (re-attach would otherwise quietly
    * undo the invalidation); bucketed tables are dropped through the
    * catalog either way. */
  def invalidate(s: SparkSession): Unit = {
    val root = stagingRoot(s)
    stores.keys.filter(_._1 eq s).foreach { k =>
      stores.remove(k).foreach { path =>
        if (root.exists(path.startsWith)) deletePath(s, path)
      }
    }
    tables.filter(_._1._1 eq s).foreach { case (k, name) =>
      tables.remove(k)
      root.foreach(r => deletePath(s, stagedBucketPath(r, k._2)))
      try s.sql(s"DROP TABLE IF EXISTS $name") catch { case _: Throwable => () }
    }
  }
}
