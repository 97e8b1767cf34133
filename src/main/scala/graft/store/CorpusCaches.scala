package graft.store

import org.apache.spark.sql.SparkSession

/** Session-lifetime governor for per-(session, corpus) cached artifacts —
  * the bound the round-6 verdict asked for: every prepare-stage cache in
  * the engine (q85's hop frames, the trained centroid / PQ codebook sets,
  * the persisted IVF index, each [[Materialized]] store) is bounded PER
  * CORPUS by construction, but a long-lived session iterating many corpora
  * accumulated one set per corpus with no eviction path short of session
  * teardown.
  *
  * Owners register each artifact here under its (session, corpus dir) with
  * a closure that releases it (unpersist / cache-map removal / temp-file
  * delete); consumers re-[[retain]]ing refresh recency. When the number of
  * distinct corpora a session holds exceeds [[capacity]], the
  * least-recently-used corpus's releasers run — the next query over that
  * corpus pays a clean rebuild (CorpusCachesSpec pins both the LRU order
  * and the rebuild correctness). Within-capacity corpora are never
  * touched, so steady-state serving (the bench's single-corpus loop) is
  * byte-for-byte the pre-governor behavior.
  *
  * `-Dgraft.cache.corpora=N` sizes the window per deployment (default 4 —
  * the harness's three SF dirs plus slack). Releasers must be idempotent;
  * a replaced registration (same corpus + slot) drops the old closure, so
  * re-invocations that rebuild an artifact keep exactly one releaser per
  * slot. Thread-safe via a single lock; release closures run while it is
  * held, which is fine for the cache-map/unpersist work they do (none
  * re-enter [[retain]]).
  *
  * CONCURRENCY CONTRACT: eviction runs releasers eagerly, and some
  * releasers destroy live artifacts (Similarity's deletes the on-disk IVF
  * index files; q85's unpersists the hop frames). The governor therefore
  * assumes queries over a session are issued one at a time (the harness's
  * and the HTTP server's model): with concurrent queries spanning more
  * than [[capacity]] corpora, retaining corpus N+1 could release an index
  * another thread is actively probing. A deployment that needs concurrent
  * multi-corpus serving should raise the capacity above its working set —
  * entries within capacity are never touched.
  *
  * Entries whose session has been stopped are swept on the next
  * [[retain]]/[[touch]]: a long-lived multi-session JVM no longer retains
  * dead sessions' closures until live corpora happen to push them out.
  */
object CorpusCaches {

  /** Max distinct (session, corpus) entries held before LRU eviction.
    * Re-read per call (tests resize it at runtime); a malformed value
    * falls back to the default rather than throwing mid-query. */
  def capacity: Int = {
    val raw = sys.props.getOrElse("graft.cache.corpora", "4")
    math.max(1, scala.util.Try(raw.trim.toInt).getOrElse(4))
  }

  /** Stopped-session predicate — a seam so the sweep is spec-testable
    * without tearing down the suite's shared SparkContext. */
  private[graft] var stoppedCheck: SparkSession => Boolean =
    s => s.sparkContext.isStopped

  // access-ordered: iteration starts at the least-recently-used entry
  private val order =
    new java.util.LinkedHashMap[(SparkSession, String), Boolean](16, 0.75f, true)
  private val slots = scala.collection.mutable.Map
    .empty[(SparkSession, String), scala.collection.mutable.Map[String, () => Unit]]

  /** Register (or refresh) a per-corpus artifact and its releaser; one
    * releaser per (corpus, slot). Evicts LRU corpora beyond [[capacity]]. */
  def retain(s: SparkSession, dir: String, slot: String)(release: () => Unit): Unit =
    synchronized {
      sweepStoppedLocked()
      slots.getOrElseUpdate((s, dir), scala.collection.mutable.Map.empty)
        .update(slot, release)
      order.put((s, dir), true)
      while (order.size > capacity) releaseLocked(order.keySet.iterator.next())
    }

  /** Refresh recency of an already-held corpus without registering. */
  def touch(s: SparkSession, dir: String): Unit = synchronized {
    sweepStoppedLocked()
    if (order.containsKey((s, dir))) { order.put((s, dir), true); () }
  }

  /** Run and drop every releaser of the corpus — the explicit hand-driven
    * eviction (tests; a service retiring a corpus snapshot). */
  def release(s: SparkSession, dir: String): Unit =
    synchronized { releaseLocked((s, dir)) }

  /** Corpora currently held for `s`, LRU-first. */
  def held(s: SparkSession): Seq[String] = synchronized {
    import scala.jdk.CollectionConverters._
    order.keySet.asScala.toSeq.collect { case (`s`, d) => d }
  }

  // drop every corpus whose session has stopped: its releasers run (each
  // guarded — unpersist on a dead context throws, harmlessly) and the dead
  // session's closures stop occupying capacity a live session needs
  private def sweepStoppedLocked(): Unit = {
    import scala.jdk.CollectionConverters._
    val dead = order.keySet.asScala.filter(k => stoppedCheck(k._1)).toList
    dead.foreach(releaseLocked)
  }

  private def releaseLocked(k: (SparkSession, String)): Unit = {
    order.remove(k)
    slots.remove(k).foreach(_.values.foreach { r =>
      try r() catch { case _: Throwable => () }
    })
  }
}
