package graft

import graft.operators.Dedup
import graft.streaming.DedupClusterStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Document takedowns through the [[DedupClusterStream]] composition:
  * after insert/insert/retire/late-insert, the served cluster table must
  * equal an INDEPENDENT driver-side union-find over the exact Jaccard
  * pair set of the SURVIVING documents (splits, shrinks, canonical
  * handoffs, dissolved clusters all included); the index mask must stop
  * late documents pairing with retired ones (non-vacuous in this
  * fixture); retirement is terminal (re-insert refused loudly); replay
  * converges. */
class DedupTakedownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs: DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet").select($"doc_id", $"text")
  }

  private def retired(id: Long): Boolean = id % 5 == 0 && id % 3 != 2

  private def ins(df: DataFrame): DataFrame = {
    import spark.implicits._
    df.select($"doc_id", $"text", lit(1).as("op"))
  }
  private def rm(df: DataFrame): DataFrame = {
    import spark.implicits._
    df.select($"doc_id", lit("").as("text"), lit(-1).as("op"))
  }

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("dcltakedown").toString + "/store"

  /** The q112 schedule, driven directly. */
  private def runSchedule(store: String): Unit = {
    import spark.implicits._
    val d = docs.cache()
    DedupClusterStream.processBatch(spark, ins(d.filter($"doc_id" % 3 === 0)), 0L, store)
    DedupClusterStream.processBatch(spark, ins(d.filter($"doc_id" % 3 === 1)), 1L, store)
    DedupClusterStream.processBatch(spark,
      rm(d.filter($"doc_id" % 5 === 0 && $"doc_id" % 3 =!= 2)), 2L, store)
    DedupClusterStream.processBatch(spark, ins(d.filter($"doc_id" % 3 === 2)), 3L, store)
  }

  /** Independent expectation: union-find over the batch exact-Jaccard
    * pair set restricted to surviving endpoints — (doc_id, cluster_id,
    * cluster_size, keep) for every doc with ≥ 1 surviving near-dup. */
  private lazy val fullPairs: Seq[(Long, Long)] =
    Dedup.ngramJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def expectedClusters(): Map[Long, (Long, Long, Boolean)] = {
    val pairs = fullPairs.filter { case (a, b) => !retired(a) && !retired(b) }
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ms) =>
      val cid = ms.min
      ms.map(m => m -> ((cid, ms.size.toLong, m == cid)))
    }.toMap
  }

  private def snapshotMap(store: String): Map[Long, (Long, Long, Boolean)] =
    DedupClusterStream.snapshot(spark, store).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("takedown schedule ≡ independent union-find on surviving pairs; compaction and replay converge") {
    val store = tmpStore()
    runSchedule(store)
    val want = expectedClusters()
    assert(want.nonEmpty, "fixture yields no surviving clusters — vacuous")
    // the takedown must have CHANGED the clustering vs the full corpus
    val full = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      fullPairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      fullPairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(m => m -> find(m)).toMap
    }
    assert(full.keySet.exists(retired), "no retired doc was ever clustered — deletion path vacuous")
    assert(full.keySet != want.keySet || full.exists { case (d, c) =>
        want.get(d).exists(_._1 != c) },
      "takedown left the clustering unchanged — split/shrink path vacuous")
    assert(snapshotMap(store) === want, "served clusters diverged from union-find on survivors")
    // fold the cluster store THROUGH the takedown batch; late batch live
    DedupClusterStream.compact(spark, store, throughBatch = 2L)
    assert(snapshotMap(store) === want, "post-compaction snapshot diverged")
    // replay the takedown batch and the late insert batch (crash-redelivery)
    import spark.implicits._
    val d = docs
    DedupClusterStream.processBatch(spark,
      rm(d.filter($"doc_id" % 5 === 0 && $"doc_id" % 3 =!= 2)), 2L, store)
    DedupClusterStream.processBatch(spark, ins(d.filter($"doc_id" % 3 === 2)), 3L, store)
    assert(snapshotMap(store) === want, "redelivery diverged")
  }

  test("index mask: late documents never pair with retired ones (non-vacuous)") {
    import spark.implicits._
    val store = tmpStore()
    runSchedule(store)
    // the fixture DOES contain exact pairs between retired and slice-2
    // docs — without the mask, batch 3 would emit them
    val crossPairs = fullPairs.filter { case (a, b) =>
      (retired(a) && b % 3 == 2) || (retired(b) && a % 3 == 2) }
    assert(crossPairs.nonEmpty, "no retired×late pair in fixture — mask test vacuous")
    val batch3 = spark.read.parquet(s"$store/pairs").filter($"batch" === 3L)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(batch3.nonEmpty, "late batch verified no pairs at all — mask test weak")
    assert(batch3.forall { case (a, b) => !retired(a) && !retired(b) },
      "a late document paired with a retired one — the index mask failed")
  }

  test("retirement is terminal: re-inserting a retired doc_id is refused loudly") {
    import spark.implicits._
    val store = tmpStore()
    val d = docs.filter($"doc_id" < 30).cache()
    DedupClusterStream.processBatch(spark, ins(d), 0L, store)
    DedupClusterStream.processBatch(spark, rm(d.filter($"doc_id" === 5)), 1L, store)
    val e = intercept[IllegalArgumentException] {
      DedupClusterStream.processBatch(spark, ins(d.filter($"doc_id" === 5)), 2L, store)
    }
    assert(e.getMessage.contains("retired"), s"refusal must name the cause: ${e.getMessage}")
  }
}
