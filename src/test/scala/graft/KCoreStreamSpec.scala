package graft

import graft.streaming.KCoreStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The maintained k-core store must equal batch q84 over the union edge
  * set under ANY batch split — including splits where later arrivals
  * re-run peel cascades inside a component (tombstoned nodes coming
  * alive, survivors' induced degrees moving). Replay must converge;
  * compaction must preserve the snapshot (tombstones keep shadowing
  * older alive rows) and keep ingest working. */
class KCoreStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def df(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("src", "dst")
  }

  private def snapshotOf(store: String): Map[Long, Long] =
    KCoreStream.snapshot(spark, store).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def freshStore(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  test("cross-batch cascade: tombstoned nodes come alive, degrees move") {
    val store = freshStore("kcorecross")
    // path 1-2-3: everything peels at k=2 → all tombstoned
    KCoreStream.processBatch(df(Seq((1L, 2L), (2L, 3L))), 0L, store)
    assert(snapshotOf(store) === Map.empty, "a path has no 2-core")
    // closing edge → triangle: all three flip alive at degree 2
    KCoreStream.processBatch(df(Seq((3L, 1L))), 1L, store)
    assert(snapshotOf(store) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      "closing the triangle must revive the tombstoned nodes")
    // second cycle through 4: degrees of 1 and 2 must UPDATE to 3
    KCoreStream.processBatch(df(Seq((1L, 4L), (4L, 2L))), 2L, store)
    assert(snapshotOf(store) === Map(1L -> 3L, 2L -> 3L, 3L -> 2L, 4L -> 2L),
      "later arrivals must update surviving degrees in place")
  }

  private def dfOps(rows: Seq[(Long, Long, Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("src", "dst", "op")
  }

  test("a deletion collapses a peel cascade; re-insert across compaction restores it") {
    val store = freshStore("kcoredel")
    // 5-cycle: every node degree 2 → the whole cycle is its own 2-core
    KCoreStream.processBatch(
      df(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))), 0L, store)
    assert(snapshotOf(store) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L))
    // delete one edge → a path: both path ends fall under k and the peel
    // CASCADES through the entire component — every row must tombstone
    KCoreStream.processBatch(dfOps(Seq((1L, 2L, -1))), 1L, store)
    assert(snapshotOf(store) === Map.empty,
      "the deletion must cascade the peel through the whole path")
    KCoreStream.compact(spark, store, throughBatch = 1L)
    assert(snapshotOf(store) === Map.empty, "compaction changed the snapshot")
    // re-insert against the folded generation: the cycle reassembles
    KCoreStream.processBatch(dfOps(Seq((1L, 2L, 1))), 2L, store)
    assert(snapshotOf(store) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L),
      "re-insert after compaction must restore the core")
  }

  test("deletion blast radius stays inside the touched component") {
    val store = freshStore("kcoreblast")
    KCoreStream.processBatch(df(Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L))), 0L, store)
    assert(snapshotOf(store) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L,
      10L -> 2L, 11L -> 2L, 12L -> 2L))
    KCoreStream.processBatch(dfOps(Seq((2L, 3L, -1))), 1L, store)
    assert(snapshotOf(store) === Map(10L -> 2L, 11L -> 2L, 12L -> 2L),
      "the touched triangle dissolves; the untouched one must be intact")
  }

  test("mixed ± fixture ≡ batch q84 on the surviving edge set (with compaction)") {
    import spark.implicits._
    import graft.operators.GraphQueries
    val p = Tables.t(spark, dir, "lineitem")
      .filter($"l_quantity" === 50)
      .select($"l_partkey".cast("long").as("p"), $"l_suppkey".cast("long").as("su"))
      .distinct()
      .select(($"p" * 2).as("src"), ($"su" * 2 + 1).as("dst"),
        (($"p" + $"su") % 5 === 0).as("del"),
        (($"p" + $"su") % 10 === 0).as("reins"))
      .cache()
    val store = freshStore("kcoredelta")
    KCoreStream.processBatch(
      p.filter(expr("(dst div 2) % 2 = 0")).select($"src", $"dst", lit(1).as("op")),
      0L, store)
    KCoreStream.processBatch(
      p.filter(expr("(dst div 2) % 2 = 1")).select($"src", $"dst", lit(1).as("op")),
      1L, store)
    KCoreStream.processBatch(
      p.filter($"del").select($"src", $"dst", lit(-1).as("op")), 2L, store)
    KCoreStream.compact(spark, store, throughBatch = 2L)
    KCoreStream.processBatch(
      p.filter($"reins").select($"src", $"dst", lit(1).as("op")), 3L, store)
    assert(p.filter($"del" && !$"reins").count() > 0,
      "schedule must actually delete surviving edges")
    val surviving = p.filter(!$"del" || $"reins").select($"src", $"dst")
    val sym = surviving.union(surviving.select($"dst".as("src"), $"src".as("dst")))
    val want = GraphQueries.kCorePeel(sym, GraphQueries.KCoreK, GraphQueries.KCoreRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    p.unpersist()
    assert(snapshotOf(store) === want,
      "decremental k-core diverged from the surviving-set batch run")
  }

  private def pairs: DataFrame = {
    import spark.implicits._
    Tables.t(spark, dir, "lineitem")
      .filter($"l_quantity" === 50)
      .select(($"l_partkey".cast("long") * 2).as("src"),
        ($"l_suppkey".cast("long") * 2 + 1).as("dst"))
      .distinct()
  }

  private def batchWant: Map[Long, Long] =
    SparkEntry.queries("q84_scale_kcore")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("streamed k-core ≡ batch q84 under supplier splits on the fixture") {
    import spark.implicits._
    val e = pairs.cache()
    val want = batchWant
    val store = freshStore("kcorefix")
    Seq(0, 1, 2).map(i => e.filter(expr(s"(dst div 2) % 3 = $i")))
      .zipWithIndex.foreach { case (sl, i) =>
        KCoreStream.processBatch(sl, i.toLong, store)
      }
    assert(snapshotOf(store) === want, "supplier-split stream diverged from batch q84")
    // non-vacuity: maintenance must actually REVISE nodes across batches —
    // some node must carry rows in ≥2 batches with different (deg, alive)
    val revised = spark.read.parquet(s"$store/results")
      .groupBy($"node")
      .agg(countDistinct(struct($"deg", $"alive")).as("variants"))
      .filter($"variants" > 1).count()
    assert(revised > 0, "no node was ever revised — cascade path exercised nothing")
    e.unpersist()
  }

  test("replay converges; compaction preserves the snapshot and ingest continues") {
    import spark.implicits._
    val e = pairs.cache()
    val want = batchWant
    val store = freshStore("kcorereplay")
    val s0 = e.filter(expr("(dst div 2) % 2 = 0"))
    val s1 = e.filter(expr("(dst div 2) % 2 = 1"))
    KCoreStream.processBatch(s0, 0L, store)
    KCoreStream.processBatch(s1, 1L, store)
    assert(snapshotOf(store) === want)
    KCoreStream.processBatch(s0, 0L, store) // redelivery
    assert(snapshotOf(store) === want, "replay changed the served k-core")
    KCoreStream.compact(spark, store, throughBatch = 1L)
    assert(snapshotOf(store) === want, "compaction changed the snapshot")
    def dirs(sub: String) = new java.io.File(s"$store/$sub").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(dirs("results") === Set("batch=-1"), s"results dirs: ${dirs("results")}")
    assert(dirs("cc/labels") === Set("batch=-1"), s"cc labels dirs: ${dirs("cc/labels")}")
    KCoreStream.processBatch(s0, 0L, store) // post-compaction redelivery
    assert(snapshotOf(store) === want, "post-compaction redelivery broke the snapshot")
    e.unpersist()
  }
}
