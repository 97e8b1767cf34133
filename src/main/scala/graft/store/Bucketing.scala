package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
    * shuffle nor broadcast) — the co-location property bucketing buys. */
  def isShuffleFree(df: DataFrame): Boolean = {
    // finalize AQE without materializing rows on the driver
    df.write.format("noop").mode(SaveMode.Overwrite).save()
    !df.queryExecution.executedPlan.toString.contains("Exchange")
  }
}
