package graft

import graft.operators.GraphQueries
import graft.streaming.TrussStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The maintained k-truss store must equal batch kTrussPeel over the
  * surviving edge set under ANY batch split — including splits where
  * later arrivals re-run support cascades inside a component
  * (tombstoned edges coming alive, survivors' supports moving) and
  * deletions that collapse them. Replay must converge; compaction must
  * preserve the snapshot over the composite (a, b) key and keep ingest
  * working. */
class TrussStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def df(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("a", "b")
  }

  private def dfOps(rows: Seq[(Long, Long, Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("a", "b", "op")
  }

  private def snapshotOf(store: String): Map[(Long, Long), Long] =
    TrussStream.snapshot(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  private def freshStore(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  // K5 on 10..14 (every edge support 3) — survives k = 4 and k = 5
  private val k5 = (for {
    i <- 10L to 14L; j <- (i + 1) to 14L
  } yield (i, j)).toSeq
  private val k5Want = k5.map(_ -> 3L).toMap

  test("cross-batch cascade: tombstoned edges come alive, supports move") {
    val store = freshStore("trusscross")
    // two triangles sharing (2,3): at k = 4 the whole strip cascades
    // away (TrussSpec's case) — everything tombstoned
    TrussStream.processBatch(
      df(Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))),
      0L, store, k = 4)
    assert(snapshotOf(store) === Map.empty, "the strip has no 4-truss")
    // closing edge (1,4) makes K4 on 1..4: every edge revives at sup 2
    TrussStream.processBatch(df(Seq((1L, 4L))), 1L, store, k = 4)
    assert(snapshotOf(store) ===
      Map((1L, 2L) -> 2L, (1L, 3L) -> 2L, (1L, 4L) -> 2L,
        (2L, 3L) -> 2L, (2L, 4L) -> 2L, (3L, 4L) -> 2L),
      "closing the strip into K4 must revive the tombstoned edges")
    // fifth vertex completing K5: surviving supports must UPDATE 2 → 3
    TrussStream.processBatch(
      df(Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L))), 2L, store, k = 4)
    assert(snapshotOf(store).forall(_._2 === 3L),
      "later arrivals must update surviving supports in place")
    assert(snapshotOf(store).size === 10)
  }

  test("a deletion collapses a support cascade; re-insert across compaction restores it") {
    val store = freshStore("trussdel")
    TrussStream.processBatch(df(k5), 0L, store, k = 5)
    assert(snapshotOf(store) === k5Want)
    // delete one edge: the two endpoints' other edges fall to support 2
    // and at k = 5 the peel cascades through the whole clique
    TrussStream.processBatch(dfOps(Seq((10L, 11L, -1))), 1L, store, k = 5)
    assert(snapshotOf(store) === Map.empty,
      "the deletion must cascade the peel through the whole clique")
    TrussStream.compact(spark, store, throughBatch = 1L)
    assert(snapshotOf(store) === Map.empty, "compaction changed the snapshot")
    // re-insert against the folded generation: the clique reassembles
    TrussStream.processBatch(dfOps(Seq((10L, 11L, 1))), 2L, store, k = 5)
    assert(snapshotOf(store) === k5Want,
      "re-insert after compaction must restore the truss")
  }

  test("deletion blast radius stays inside the touched component") {
    val store = freshStore("trussblast")
    val k4a = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val k4b = k4a.map { case (x, y) => (x + 20L, y + 20L) }
    TrussStream.processBatch(df(k4a ++ k4b), 0L, store, k = 4)
    assert(snapshotOf(store).size === 12)
    TrussStream.processBatch(dfOps(Seq((1L, 2L, -1))), 1L, store, k = 4)
    assert(snapshotOf(store) === k4b.map(_ -> 2L).toMap,
      "the touched K4 dissolves; the untouched one must be intact")
  }

  test("orientation-normalized: (b, a) arrivals address the (a, b) edge") {
    val store = freshStore("trussorient")
    TrussStream.processBatch(df(k5), 0L, store, k = 5)
    // delete delivered REVERSED — must hit the same edge row
    TrussStream.processBatch(dfOps(Seq((11L, 10L, -1))), 1L, store, k = 5)
    assert(snapshotOf(store) === Map.empty,
      "a reversed delete must withdraw the normalized edge")
  }

  private def proj: DataFrame = {
    import spark.implicits._
    val pairs = Tables.t(spark, dir, "lineitem")
      .filter($"l_quantity" === 50)
      .select($"l_partkey".cast("long").as("p"), $"l_suppkey".cast("long").as("su"))
      .distinct()
    val smallSu = pairs.groupBy($"su").agg(count(lit(1)).as("d"))
      .filter($"d" <= GraphQueries.TriDegreeCap).select($"su")
    val kept = pairs.join(smallSu, Seq("su"), "left_semi")
    kept.as("x").join(kept.as("y"), $"x.su" === $"y.su" && $"x.p" < $"y.p")
      .select($"x.p".as("a"), $"y.p".as("b")).distinct()
  }

  test("mixed ± fixture ≡ batch peel on the surviving edge set (with compaction)") {
    import spark.implicits._
    val p = proj
      .withColumn("del", ($"a" + $"b") % 5 === 0)
      .withColumn("reins", ($"a" + $"b") % 10 === 0)
      .cache()
    val store = freshStore("trussdelta")
    TrussStream.processBatch(
      p.filter($"b" % 2 === 0).select($"a", $"b", lit(1).as("op")), 0L, store)
    TrussStream.processBatch(
      p.filter($"b" % 2 === 1).select($"a", $"b", lit(1).as("op")), 1L, store)
    TrussStream.processBatch(
      p.filter($"del").select($"a", $"b", lit(-1).as("op")), 2L, store)
    TrussStream.compact(spark, store, throughBatch = 2L)
    TrussStream.processBatch(
      p.filter($"reins").select($"a", $"b", lit(1).as("op")), 3L, store)
    assert(p.filter($"del" && !$"reins").count() > 0,
      "schedule must actually delete surviving edges")
    val surviving = p.filter(!$"del" || $"reins").select($"a", $"b")
    val want = GraphQueries.kTrussPeel(surviving,
        GraphQueries.TrussK, GraphQueries.TrussRounds)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    p.unpersist()
    assert(snapshotOf(store) === want,
      "decremental truss diverged from the surviving-set batch run")
  }

  private def batchWant: Map[(Long, Long), Long] =
    SparkEntry.queries("q105_scale_ktruss")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("streamed truss ≡ batch q105 under endpoint splits on the fixture") {
    import spark.implicits._
    val e = proj.cache()
    val want = batchWant
    val store = freshStore("trussfix")
    Seq(0, 1, 2).map(i => e.filter($"b" % 3 === i))
      .zipWithIndex.foreach { case (sl, i) =>
        TrussStream.processBatch(sl, i.toLong, store)
      }
    assert(snapshotOf(store) === want, "endpoint-split stream diverged from batch q105")
    // non-vacuity: maintenance must actually REVISE edges across batches
    val revised = spark.read.parquet(s"$store/results")
      .groupBy($"a", $"b")
      .agg(countDistinct(struct($"sup", $"alive")).as("variants"))
      .filter($"variants" > 1).count()
    assert(revised > 0, "no edge was ever revised — cascade path exercised nothing")
    e.unpersist()
  }

  test("replay converges; compaction preserves the snapshot and ingest continues") {
    import spark.implicits._
    val e = proj.cache()
    val want = batchWant
    val store = freshStore("trussreplay")
    val s0 = e.filter($"b" % 2 === 0)
    val s1 = e.filter($"b" % 2 === 1)
    TrussStream.processBatch(s0, 0L, store)
    TrussStream.processBatch(s1, 1L, store)
    assert(snapshotOf(store) === want)
    TrussStream.processBatch(s0, 0L, store) // redelivery
    assert(snapshotOf(store) === want, "replay changed the served truss")
    TrussStream.compact(spark, store, throughBatch = 1L)
    assert(snapshotOf(store) === want, "compaction changed the snapshot")
    def dirs(sub: String) = new java.io.File(s"$store/$sub").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(dirs("results") === Set("batch=-1"), s"results dirs: ${dirs("results")}")
    assert(dirs("cc/labels") === Set("batch=-1"), s"cc labels dirs: ${dirs("cc/labels")}")
    TrussStream.processBatch(s0, 0L, store) // post-compaction redelivery
    assert(snapshotOf(store) === want, "post-compaction redelivery broke the snapshot")
    e.unpersist()
  }
}
