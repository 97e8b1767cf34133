package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-pass distributed prefix sum — the scale-safe replacement for the
  * packing family's per-source running-total window (q70, q72, q115).
  *
  * `sum(toks) OVER (PARTITION BY source ORDER BY doc_id)` is the natural
  * declaration, but `source` is intrinsically LOW-cardinality (a handful
  * of corpus labels), so WindowExec hash-shuffles every document row of a
  * source into ONE task and sorts it there: at 100 TB that is a
  * billions-of-rows single-task sort per source, and cluster parallelism
  * collapses to the number of sources. A prefix sum does not need a
  * single sequential scan — it needs (a) locally ordered chunks and (b)
  * each chunk's starting offset, which is the sum of everything before
  * it. So:
  *
  *   1. range-partition by (source, doc_id) into #shuffle-partitions
  *      chunks and sort WITHIN each chunk — parallelism is the partition
  *      count, not the source count, and every chunk holds a contiguous
  *      key range;
  *   2. one partition-count-sized aggregate: per (chunk, source) token
  *      totals, collected to the driver (≤ #chunks + #sources rows — the
  *      boundary source of adjacent chunks is the only key split across
  *      two), folded into per-(chunk, source) starting offsets in chunk
  *      order, and broadcast back;
  *   3. one map-side pass adds the broadcast offset to the chunk-local
  *      running sum — no further exchange.
  *
  * Both passes read ONE materialized copy of the (source, doc_id, toks)
  * relation (`localCheckpoint`, memory-and-disk): the checkpoint before
  * the range exchange keeps the range partitioner's SAMPLING pass off the
  * caller's (potentially expensive) upstream plan, and the checkpoint
  * after the sort pins partition indices so the offset pass and the add
  * pass agree by construction rather than by recompute-determinism.
  * cum_end is deterministic regardless of where the range boundaries
  * land: (source, doc_id) is a total order (doc_id unique), and a prefix
  * sum over a total order does not depend on its chunking.
  *
  * This is the brief's genuine `mapPartitions` case — per-partition
  * imperative logic (a running accumulator over sorted rows) that no
  * declarative operator expresses without re-introducing the per-key
  * shuffle the rewrite exists to remove.
  */
object PrefixSum {

  final case class TokRow(source: String, doc_id: Long, toks: Long)
  final case class CumRow(source: String, doc_id: Long, toks: Long, cum_end: Long)

  /** `df` must have (source: string, doc_id: long, toks: long) with
    * doc_id UNIQUE within each source (every caller feeds the documents
    * table's key; on duplicate keys a ROWS-frame running sum is not
    * well-defined under any engine — the order of ties is arbitrary);
    * returns the same rows plus `cum_end` = running sum of toks within
    * source in doc_id order, inclusive of the current row — exactly the
    * window `SUM(toks) OVER (PARTITION BY source ORDER BY doc_id ROWS
    * UNBOUNDED PRECEDING)`, without its one-task-per-source exchange.
    *
    * NOTE: construction is EAGER — pass 1 (offsets) runs Spark jobs when
    * this function is called, not when the caller first acts on the
    * result; that is inherent to a two-pass algorithm whose second pass
    * needs the first's output on the driver. */
  def cumEndBySource(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val nChunks = scala.util.Try(
      s.conf.get("spark.sql.shuffle.partitions", "32").toInt).getOrElse(32).max(1)
    // LAZY checkpoints: the blocks are persisted as a side effect of the
    // first pass that reads them (the range sampler materializes `in`,
    // pass 1's aggregate materializes `ranged`) — eager checkpoints here
    // cost two extra full-scan jobs for nothing
    val in = df
      .select($"source".cast("string").as("source"),
        $"doc_id".cast("long").as("doc_id"), $"toks".cast("long").as("toks"))
      .localCheckpoint(eager = false)
    val ranged = in
      .repartitionByRange(nChunks, $"source", $"doc_id")
      .sortWithinPartitions($"source", $"doc_id")
      .as[TokRow]
      .localCheckpoint(eager = false)
    // pass 1: per-(chunk, source) totals → starting offsets, in chunk
    // order per source. Partition ids come from the PINNED checkpoint, so
    // pass 2 reads the identical assignment.
    val partials: Array[(Int, String, Long)] = ranged
      .groupBy(spark_partition_id().as("pid"), $"source")
      .agg(sum($"toks").as("tot"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // `ranged` is fully materialized by the aggregate above; the input
    // copy has served both its readers (range sampler + exchange) and
    // can release its blocks now
    in.unpersist(blocking = false)
    val offsets: Map[(Int, String), Long] = partials
      .groupBy(_._2).iterator.flatMap { case (src, chunks) =>
        var run = 0L
        chunks.sortBy(_._1).map { case (pid, _, tot) =>
          val entry = ((pid, src), run); run += tot; entry
        }
      }.toMap
    val bc = s.sparkContext.broadcast(offsets)
    // pass 2: map-side add — rows arrive (source, doc_id)-sorted within
    // the chunk, so one accumulator per source transition suffices
    ranged.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      // explicit first-row flag: a legitimate NULL source must not
      // collide with the pre-first-row sentinel (null == null would skip
      // the offset fetch for a null-source group at a chunk head)
      var started = false
      var cur: String = null
      var cum = 0L
      it.map { r =>
        if (!started || r.source != cur) {
          started = true
          cur = r.source
          cum = bc.value.getOrElse((pid, r.source), 0L)
        }
        cum += r.toks
        CumRow(r.source, r.doc_id, r.toks, cum)
      }
    }.toDF()
  }
}
