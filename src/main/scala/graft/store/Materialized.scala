package graft.store

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
  * implicitly. Stores are temp directories reclaimed by a JVM shutdown
  * hook; a long-lived multi-tenant service would swap this for a managed
  * staging location with TTLs.
  */
object Materialized {
  private val stores =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** Serve `build`'s result from the per-(session, key) parquet store,
    * building it on first use. Thread-safe: TrieMap.getOrElseUpdate is
    * atomic, so concurrent first consumers agree on one store. */
  def relation(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val store = stores.getOrElseUpdate((s, key), {
      val d = java.nio.file.Files.createTempDirectory("graft-mat")
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: Throwable => () }))
      val out = s"$d/rel"
      build.write.mode(SaveMode.Overwrite).parquet(out)
      out
    })
    s.read.parquet(store)
  }

  private val tables =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** [[relation]] in BUCKETED form: the store is a managed bucketed table
    * (pre-shuffled on `bucketCols` at build time), so an equi-join of the
    * relation with ITSELF on the bucket key — the shape of every
    * candidate-pair generator in the dedup family — runs with no exchange
    * on either side (the `store.Bucketing` co-location property, applied
    * to a derived relation instead of a base table). Same immutable-input
    * contract as [[relation]]; the catalog entry is session-scoped like
    * every bucketed table here. */
  def bucketedRelation(s: SparkSession, key: String, bucketCols: Seq[String],
      buckets: Int)(build: => DataFrame): DataFrame = {
    val name = tables.getOrElseUpdate((s, key), {
      val b = key.getBytes("UTF-8")
      val n = "graft_mat_" + java.lang.Long.toHexString(
        org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
          b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 7) & 0xFFFFFFFFL)
      if (!s.catalog.tableExists(n)) {
        // EXTERNAL table at a fresh temp path: a managed table's warehouse
        // location outlives the (in-memory) catalog that named it, so a
        // fresh session hashing the same key would collide with the last
        // JVM's directory; a unique path per build sidesteps that and the
        // shutdown hook reclaims it like every other store
        val d = java.nio.file.Files.createTempDirectory("graft-mat-bkt")
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
              .foreach(p => java.nio.file.Files.deleteIfExists(p))
          } catch { case _: Throwable => () }))
        build.write.mode(SaveMode.Overwrite).format("parquet")
          .option("path", s"$d/rel")
          .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
          .sortBy(bucketCols.head, bucketCols.tail: _*)
          .saveAsTable(n)
      }
      n
    })
    s.table(name)
  }

  /** Drop every store of `s` (all keys): the next consumer rebuilds from
    * its current input. For tests and for measuring cold (prepare-stage-
    * inclusive) timings; store files are left for the shutdown hook,
    * bucketed tables are dropped through the catalog. */
  def invalidate(s: SparkSession): Unit = {
    stores.keys.filter(_._1 eq s).foreach(stores.remove)
    tables.filter(_._1._1 eq s).foreach { case (k, name) =>
      tables.remove(k)
      try s.sql(s"DROP TABLE IF EXISTS $name") catch { case _: Throwable => () }
    }
  }
}
