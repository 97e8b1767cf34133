package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, BroadcastQueryStageExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}

/** Bucketed-table support: pre-shuffle once at write time so repeated
  * equi-joins and aggregations on the bucket key run with NO exchange.
  *
  * This is the co-located-join strategy for the 100 TB layout: fact tables
  * bucketed on their join key (e.g. lineitem/orders on orderkey, jumps on
  * src_system_id) join bucket-to-bucket; Spark's scan reports the bucketed
  * distribution and Catalyst elides the shuffle (verified by the spec, which
  * asserts the executed plan contains no ShuffleExchange).
  */
object Bucketing {

  /** Write `df` as a bucketed managed parquet table (sorted within buckets
    * so sort-merge joins also skip the sort). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True if the executed plan of `df` contains no exchange at all (neither
    * shuffle nor broadcast) — the co-location property bucketing buys.
    *
    * The action runs on `df` ITSELF (a noop `DataFrameWriter.save` would
    * build a *separate* QueryExecution and leave this one un-finalized, so
    * the inspection would see the pre-AQE plan). After the run, the
    * AdaptiveSparkPlanExec carries the final plan, where exchanges surface
    * either as raw `Exchange` nodes or as materialized `QueryStageExec`
    * boundaries (shuffle/broadcast stages) — matched as plan nodes, not by
    * string. */
  def isShuffleFree(df: DataFrame): Boolean = {
    // collect() drives df.queryExecution itself (Dataset.withAction), which
    // finalizes its AdaptiveSparkPlanExec; foreach/toLocalIterator would
    // execute the separate rddQueryExecution and leave this plan un-run
    df.collect()
    def hasExchange(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => hasExchange(a.executedPlan)
      case _: ShuffleQueryStageExec | _: BroadcastQueryStageExec => true
      case _: Exchange | _: ReusedExchangeExec => true
      // other stages (e.g. the final ResultQueryStage) are plain leaf
      // wrappers — descend into their plans, they may hide exchanges
      case q: QueryStageExec => hasExchange(q.plan)
      case other => other.children.exists(hasExchange)
    }
    !hasExchange(df.queryExecution.executedPlan)
  }

  /** True if NO exchange (shuffle or broadcast) in `df`'s executed plan
    * has the scan of catalog table `table` anywhere beneath it — i.e. the
    * table's rows are consumed exactly where they were read, the
    * co-location property a bucketed probe join must have on its index
    * side (the OTHER side may shuffle freely). Runs the plan first, same
    * AQE-finalization discipline as [[isShuffleFree]]. */
  def scanUnexchanged(df: DataFrame, table: String): Boolean = {
    df.collect()
    def scansTable(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => scansTable(a.executedPlan)
      case q: QueryStageExec => scansTable(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.tableIdentifier.exists(_.table == table)
      case other => other.children.exists(scansTable)
    }
    def ok(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => ok(a.executedPlan)
      case e @ (_: Exchange | _: ReusedExchangeExec) => !scansTable(e)
      case q: ShuffleQueryStageExec => !scansTable(q.plan)
      case q: BroadcastQueryStageExec => !scansTable(q.plan)
      case q: QueryStageExec => ok(q.plan)
      case other => other.children.forall(ok)
    }
    scansTable(df.queryExecution.executedPlan) &&
      ok(df.queryExecution.executedPlan)
  }

  /** Run `body` with dynamic partition-overwrite semantics (an
    * `INSERT OVERWRITE` replaces only the partitions it touches — the
    * idempotent-replay primitive the streaming sinks key their batch
    * output on), restoring each session's previous mode afterwards.
    *
    * PREFER the per-write data-source option
    * `option("partitionOverwriteMode", "dynamic")` wherever the writer
    * supports it (all path-based writes): it outranks every session conf
    * and mutates nothing. This wrapper remains only for `insertInto`,
    * whose API carries no write options; the restore is not atomic under
    * concurrent writers on one session — callers serialize their batches
    * (foreachBatch does by contract).
    *
    * Takes ALL involved sessions because a foreachBatch micro-batch
    * DataFrame belongs to a CLONE of the session that started the stream
    * (its conf was snapshotted at start), and `DataFrameWriter` reads the
    * mode from the frame's OWN session — setting it only on the outer
    * session leaves the clone in static mode, which silently turns
    * "overwrite my batch partition" into "overwrite the whole table"
    * (DedupStreamSpec's cross-batch tests caught exactly this).
    *
    * REENTRANT per session (round 18): independent stores on ONE session
    * may write concurrently (the parallelized fuzz lanes do; any
    * multi-stream deployment could), and a plain save/set/restore races —
    * the first finisher's restore flips the conf back to static while
    * another writer's `INSERT OVERWRITE` is still executing, silently
    * rewriting its WHOLE table instead of one partition. Every concurrent
    * user wants the same value, so the fix is an epoch refcount per
    * session: the first entrant saves the previous value and sets
    * dynamic; only the last one out restores it. The counter map is
    * synchronized; the body still runs unlocked (concurrent writes stay
    * concurrent). Per-store serialization remains the caller's contract —
    * this only makes DIFFERENT stores' writes safe to overlap. */
  private val overwriteDepth =
    scala.collection.mutable.Map.empty[SparkSession, (Int, Option[String])]

  def withDynamicPartitionOverwrite[T](sessions: SparkSession*)(body: => T): T = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val distinct = sessions.distinct
    overwriteDepth.synchronized {
      distinct.foreach { s =>
        overwriteDepth.get(s) match {
          case Some((n, prev)) => overwriteDepth(s) = (n + 1, prev)
          case None =>
            val prev = s.conf.getOption(key)
            s.conf.set(key, "dynamic")
            overwriteDepth(s) = (1, prev)
        }
      }
    }
    try body
    finally overwriteDepth.synchronized {
      distinct.foreach { s =>
        overwriteDepth(s) match {
          case (1, prev) =>
            overwriteDepth.remove(s)
            prev match {
              case Some(v) => s.conf.set(key, v)
              case None => s.conf.unset(key)
            }
          case (n, prev) => overwriteDepth(s) = (n - 1, prev)
        }
      }
    }
  }
}
