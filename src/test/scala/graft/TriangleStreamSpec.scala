package graft

import graft.streaming.TriangleStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

/** The maintained triangle-count store must equal batch q83 over the
  * union pair set under ANY batch split — including splits that force
  * CROSS-BATCH WEDGE CLOSURES (the three projected edges of one triangle
  * witnessed by suppliers arriving in different batches) and the
  * CAP-CROSSING REMOVAL path (a supplier's degree growing past
  * TriDegreeCap withdraws its witness contributions, destroying edges
  * and triangles in an append-only stream). Replay must be a no-op;
  * compaction must preserve the snapshot and keep ingest working. */
class TriangleStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Driver-side reference: per-part corner counts of the capped
    * projection's triangles — q83's semantics, independently coded. */
  private def brute(pairs: Seq[(Long, Long)], cap: Long): Map[Long, Long] = {
    val bySu = pairs.distinct.groupBy(_._2).filter(_._2.map(_._1).distinct.size <= cap)
    val edges = bySu.values.flatMap { ps =>
      val parts = ps.map(_._1).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.size) yield (parts(i), parts(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val tris = for {
      (a, b) <- edges.toSeq
      z <- adj(a) if z > b && adj(b)(z)
    } yield (a, b, z)
    tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  }

  private def df(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("p", "su")
  }

  private def snapshotOf(store: String): Map[Long, Long] =
    TriangleStream.snapshot(spark, store).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def freshStore(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  test("cross-batch wedge closure: a triangle closes only at the third witness") {
    val store = freshStore("tricross")
    // three suppliers, each witnessing ONE edge of triangle {1,2,3}
    TriangleStream.processBatch(df(Seq((1L, 100L), (2L, 100L))), 0L, store)
    assert(snapshotOf(store) === Map.empty, "one edge cannot form a triangle")
    TriangleStream.processBatch(df(Seq((2L, 200L), (3L, 200L))), 1L, store)
    assert(snapshotOf(store) === Map.empty, "two edges cannot form a triangle")
    TriangleStream.processBatch(df(Seq((1L, 300L), (3L, 300L))), 2L, store)
    assert(snapshotOf(store) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      "third edge must close the cross-batch triangle")
  }

  test("cap crossing withdraws witnesses and destroys triangles") {
    val cap = 2L
    val store = freshStore("tricap")
    TriangleStream.processBatch(df(Seq((1L, 100L), (2L, 100L))), 0L, store, cap)
    TriangleStream.processBatch(
      df(Seq((2L, 200L), (3L, 200L), (1L, 300L), (3L, 300L))), 1L, store, cap)
    assert(snapshotOf(store) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // supplier 100 gains part 4 → degree 3 > cap → its edge (1,2) is
    // withdrawn, no other witness exists → the triangle dies
    TriangleStream.processBatch(df(Seq((4L, 100L))), 2L, store, cap)
    assert(snapshotOf(store) === Map.empty,
      "cap crossing must remove the unwitnessed edge and its triangle")
    assert(brute(Seq((1L, 100L), (2L, 100L), (2L, 200L), (3L, 200L),
      (1L, 300L), (3L, 300L), (4L, 100L)), cap) === Map.empty,
      "reference disagrees — test premise broken")
  }

  test("an edge pinned by an untouched under-cap witness survives a cap crossing") {
    val cap = 2L
    val store = freshStore("tripin")
    // edge (1,2) witnessed by BOTH supplier 100 and supplier 400
    TriangleStream.processBatch(
      df(Seq((1L, 100L), (2L, 100L), (1L, 400L), (2L, 400L))), 0L, store, cap)
    TriangleStream.processBatch(
      df(Seq((2L, 200L), (3L, 200L), (1L, 300L), (3L, 300L))), 1L, store, cap)
    assert(snapshotOf(store) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // supplier 100 crosses the cap; supplier 400 still pins (1,2)
    TriangleStream.processBatch(df(Seq((4L, 100L))), 2L, store, cap)
    assert(snapshotOf(store) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      "edge pinned by an untouched witness must survive")
  }

  private def dfOps(rows: Seq[(Long, Long, Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("p", "su", "op")
  }

  test("deletion destroys a cross-batch triangle; re-insert across compaction restores it") {
    val store = freshStore("tridel")
    // triangle {1,2,3}: one witness edge per batch (the q96 shape)
    TriangleStream.processBatch(df(Seq((1L, 100L), (2L, 100L))), 0L, store)
    TriangleStream.processBatch(df(Seq((2L, 200L), (3L, 200L))), 1L, store)
    TriangleStream.processBatch(df(Seq((1L, 300L), (3L, 300L))), 2L, store)
    assert(snapshotOf(store) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // withdraw supplier 100's (1,100) witness: edge (1,2) loses its only
    // witness → the triangle closed two batches ago dies
    TriangleStream.processBatch(dfOps(Seq((1L, 100L, -1))), 3L, store)
    assert(snapshotOf(store) === Map.empty,
      "deleting the only witness of one edge must destroy the triangle")
    // fold the whole ± history (delete collapses away), then re-insert:
    // the pair must resurrect against the negative generation
    TriangleStream.compact(spark, store, throughBatch = 3L)
    assert(snapshotOf(store) === Map.empty, "compaction changed the snapshot")
    TriangleStream.processBatch(dfOps(Seq((1L, 100L, 1))), 4L, store)
    assert(snapshotOf(store) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      "re-insert after compaction must re-close the triangle")
  }

  test("a deletion can CREATE triangles: dropping a supplier back under the cap") {
    val cap = 2L
    val store = freshStore("triuncap")
    // supplier 100 witnesses all three edges of {1,2,3} but has degree
    // 3 > cap — over-cap, so it contributes nothing
    TriangleStream.processBatch(
      df(Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L))), 0L, store, cap)
    assert(snapshotOf(store) === Map.empty, "over-cap supplier must contribute nothing")
    // delete (4,100): degree falls to 3... still > cap
    TriangleStream.processBatch(dfOps(Seq((4L, 100L, -1))), 1L, store, cap)
    assert(snapshotOf(store) === Map.empty)
    // delete (3,100): degree 2 ≤ cap → its remaining clique {1,2} is ONE
    // edge, no triangle — but with suppliers 200/300 below, the return
    // of (1,2) closes one
    TriangleStream.processBatch(
      df(Seq((2L, 200L), (3L, 200L), (1L, 300L), (3L, 300L))), 2L, store, cap)
    assert(snapshotOf(store) === Map.empty,
      "edges (2,3) and (1,3) alone close nothing while (1,2) is uncapped away")
    TriangleStream.processBatch(dfOps(Seq((3L, 100L, -1))), 3L, store, cap)
    assert(snapshotOf(store) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      "the un-capping deletion must return (1,2) and close the triangle")
    assert(brute(Seq((1L, 100L), (2L, 100L), (2L, 200L), (3L, 200L),
      (1L, 300L), (3L, 300L)), cap) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      "reference disagrees — test premise broken")
  }

  test("mixed ± fixture ≡ batch q83 on the surviving witness set (with compaction)") {
    import spark.implicits._
    val pairs = Tables.t(spark, dir, "lineitem")
      .filter($"l_quantity" === 50)
      .select($"l_partkey".cast("long").as("p"), $"l_suppkey".cast("long").as("su"))
      .distinct()
      .withColumn("del", ($"p" + $"su") % 5 === 0)
      .withColumn("reins", ($"p" + $"su") % 10 === 0)
      .cache()
    val store = freshStore("tridelta")
    TriangleStream.processBatch(
      pairs.filter($"su" % 2 === 0).select($"p", $"su", lit(1).as("op")), 0L, store)
    TriangleStream.processBatch(
      pairs.filter($"su" % 2 === 1).select($"p", $"su", lit(1).as("op")), 1L, store)
    TriangleStream.processBatch(
      pairs.filter($"del").select($"p", $"su", lit(-1).as("op")), 2L, store)
    TriangleStream.compact(spark, store, throughBatch = 2L)
    TriangleStream.processBatch(
      pairs.filter($"reins").select($"p", $"su", lit(1).as("op")), 3L, store)
    // non-vacuity: the schedule must actually delete surviving pairs
    assert(pairs.filter($"del" && !$"reins").count() > 0)
    val local = pairs.filter(!$"del" || $"reins").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = brute(local, graft.operators.GraphQueries.TriDegreeCap)
    pairs.unpersist()
    assert(snapshotOf(store) === want,
      "± maintained counts diverged from the surviving-set batch run")
  }

  test("streamed counts ≡ batch q83 under supplier splits on the fixture") {
    import spark.implicits._
    val pairs = Tables.t(spark, dir, "lineitem")
      .filter($"l_quantity" === 50)
      .select($"l_partkey".cast("long").as("p"), $"l_suppkey".cast("long").as("su"))
      .distinct().cache()
    val want = SparkEntry.queries("q83_scale_triangles")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slices = Seq(0, 1, 2).map(i => pairs.filter($"su" % 3 === i))
    val store = freshStore("trifix")
    slices.zipWithIndex.foreach { case (sl, i) =>
      TriangleStream.processBatch(sl, i.toLong, store)
    }
    assert(snapshotOf(store) === want, "supplier-split stream diverged from batch q83")
    // non-vacuity: some triangle must span slices — per-slice triangle
    // totals summed must undercount the full graph's
    val local = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val perSlice = (0 to 2).map(i => brute(local.filter(_._2 % 3 == i),
      graft.operators.GraphQueries.TriDegreeCap).values.sum).sum
    val full = brute(local, graft.operators.GraphQueries.TriDegreeCap).values.sum
    assert(full > perSlice, "no cross-slice triangle — closure path exercised nothing")
    assert(full > 0, "fixture has no triangles at all")
    pairs.unpersist()
  }

  test("replay is a no-op; compaction preserves the snapshot and ingest continues") {
    import spark.implicits._
    val pairs = Tables.t(spark, dir, "lineitem")
      .filter($"l_quantity" === 50)
      .select($"l_partkey".cast("long").as("p"), $"l_suppkey".cast("long").as("su"))
      .distinct().cache()
    val want = SparkEntry.queries("q83_scale_triangles")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val store = freshStore("trireplay")
    val s0 = pairs.filter($"su" % 2 === 0)
    val s1 = pairs.filter($"su" % 2 === 1)
    TriangleStream.processBatch(s0, 0L, store)
    TriangleStream.processBatch(s1, 1L, store)
    assert(snapshotOf(store) === want)
    // redelivery of batch 0: prefix-deterministic deltas → identical bytes
    TriangleStream.processBatch(s0, 0L, store)
    assert(snapshotOf(store) === want, "replay changed the count store")
    TriangleStream.compact(spark, store, throughBatch = 1L)
    assert(snapshotOf(store) === want, "compaction changed the snapshot")
    def dirs(sub: String) = new java.io.File(s"$store/$sub").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(dirs("pairs") === Set("batch=-1"), s"pairs dirs: ${dirs("pairs")}")
    assert(dirs("counts") === Set("batch=-1"), s"counts dirs: ${dirs("counts")}")
    // post-compaction redelivery: history already holds batch 0's pairs,
    // so the recomputed delta is empty and the snapshot is untouched
    TriangleStream.processBatch(s0, 0L, store)
    assert(snapshotOf(store) === want, "post-compaction redelivery broke the snapshot")
    pairs.unpersist()
  }
}
