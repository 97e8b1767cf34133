package graft

import graft.streaming.TriangleStream
import org.apache.spark.sql.DataFrame
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
