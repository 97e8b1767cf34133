package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the formatted physical plan of one
  * registered query without executing it —
  * `runMain graft.tools.Explain <sfDir> <queryName...>`. The shape every
  * audit checks: filters and projections pushed into the scans
  * (PushedFilters / ReadSchema), joins broadcast where a side is small,
  * no stray Exchange between operators that already share a
  * partitioning, WholeStageCodegen spans wide.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    try args.drop(1).foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    } finally spark.stop()
  }
}
