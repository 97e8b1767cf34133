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
}
