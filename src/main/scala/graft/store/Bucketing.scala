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
}
