package graft

import graft.operators.{PrefixSum, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Round-17 scale contract for the packing family (q70, q72, q115):
  *
  *  1. NO per-source running-sum window anywhere in their plans — `source`
  *   is a handful of corpus labels, so `PARTITION BY source` hands every
  *   row of a source to ONE WindowExec task (parallelism = #sources at
  *   100 TB). The family now runs [[PrefixSum.cumEndBySource]], a
  *   two-pass distributed prefix sum; the assertion is precise (no Window
  *   whose partition spec is solely `source`) so the legitimate
  *   high-cardinality-key windows elsewhere in the same trees (per-doc
  *   top-k, island grouping) stay allowed.
  *
  *  2. The prefix sum itself equals the window semantics — checked
  *   against an independently computed per-source running total on
  *   randomized data whose every source spans multiple range chunks.
  *
  *  3. q115's word-length join stays a BROADCAST hash join at shipped
  *   SFs (the distinct-word side is vocabulary-sized); past the
  *   threshold the plan degrades to a shuffle join AQE's skew-join
  *   handles — see docSubwordToksJoin's doc.
  */
class PackingPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Window nodes partitioned by exactly one attribute named `source`. */
  private def perSourceWindows(df: DataFrame) =
    df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.size == 1 &&
        w.partitionSpec.head.isInstanceOf[AttributeReference] &&
        w.partitionSpec.head.asInstanceOf[AttributeReference].name == "source" => w
    }

  for (q <- Seq("q70_sequence_packing", "q72_curation_manifest", "q115_subword_packing"))
    test(s"$q: no single-task-per-source Window in the plan") {
      val df = SparkEntry.queries(q)(spark, dir)
      val bad = perSourceWindows(df)
      assert(bad.isEmpty,
        s"$q still windows on the low-cardinality source key:\n${bad.mkString("\n")}")
      // the physical plan carries the prefix sum's map-side pass instead
      assert(df.queryExecution.executedPlan.toString.contains("MapPartitions"),
        s"$q: expected the prefix sum's MapPartitions stage in the physical plan")
    }

  test("cumEndBySource equals the per-source running total (randomized, multi-chunk)") {
    import spark.implicits._
    val rnd = new Random(170001)
    // 4 shuffle partitions in TestSpark → 4 range chunks; 3 sources ×
    // ~400 rows each guarantees every source straddles chunk boundaries
    val rows = (0 until 1200).map { i =>
      (s"src${rnd.nextInt(3)}", i.toLong, rnd.nextInt(50).toLong)
    }
    val got = PrefixSum.cumEndBySource(rows.toDF("source", "doc_id", "toks"))
      .select($"source", $"doc_id", $"toks", $"cum_end")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (src, rs) =>
      var cum = 0L
      rs.sortBy(_._2).map { case (_, id, tk) => cum += tk; (src, id, tk, cum) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == expected)
  }

  test("cumEndBySource: NULL source is an ordinary group, even at chunk heads") {
    import spark.implicits._
    // enough null-source rows to straddle every range chunk: if a chunk
    // head's null group skipped its broadcast offset (the null == null
    // sentinel collision), later rows would understate cum_end
    val rows = (0 until 800).map(i =>
      (if (i % 2 == 0) null else "a", i.toLong, (i % 7 + 1).toLong))
    val got = PrefixSum.cumEndBySource(rows.toDF("source", "doc_id", "toks"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val expected = rows.groupBy(r => Option(r._1)).toSeq.flatMap { case (src, rs) =>
      var cum = 0L
      rs.sortBy(_._2).map { case (_, id, tk) => cum += tk; (src, id, cum) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == expected)
  }

  test("cumEndBySource: empty input and single-row input") {
    import spark.implicits._
    val empty = PrefixSum.cumEndBySource(
      Seq.empty[(String, Long, Long)].toDF("source", "doc_id", "toks"))
    assert(empty.count() == 0L)
    val one = PrefixSum.cumEndBySource(
      Seq(("a", 7L, 42L)).toDF("source", "doc_id", "toks")).collect()
    assert(one.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      == Seq(("a", 7L, 42L, 42L)))
  }

  test("q115's distinct-word length join broadcasts at shipped SFs") {
    val df = TextOps.docSubwordToksJoin(spark, dir)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the word-length side to broadcast:\n$plan")
  }
}
