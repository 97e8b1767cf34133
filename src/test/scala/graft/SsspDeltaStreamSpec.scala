package graft

import graft.streaming.{SsspDeltaStream, SsspStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Decremental SSSP maintenance must stay exact where relaxation alone
  * cannot: a deletion that LENGTHENS a served distance, one that
  * DISCONNECTS a vertex, and a delete → re-insert cycle across a
  * compaction. The cross-check oracle is the insert-only [[SsspStream]]
  * (itself pinned to batch q79) rebuilt from scratch on the surviving
  * edge set — the two engines must serve identical tables. */
class SsspDeltaStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Budget = 64L

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString + "/store"

  private def ev(rows: Seq[(Long, Long, Long, Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("src", "dst", "w", "op")
  }

  private def snap(store: String): Map[Long, Long] =
    SsspDeltaStream.snapshot(spark, store).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("deletion lengthens a distance and disconnects a vertex; re-insert restores") {
    val store = tmp("ssspdelta")
    // 0-1 (1), 1-2 (1), 0-2 (5), 2-3 (1): dists 0,1,2,3
    SsspDeltaStream.processBatch(
      ev(Seq((0L, 1L, 1L, 1), (1L, 2L, 1L, 1), (0L, 2L, 5L, 1), (2L, 3L, 1L, 1))),
      0L, store, source = 0L, budget = Budget)
    assert(snap(store) === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    // delete (1,2): 2 must LENGTHEN to 5 via the 0-2 edge, 3 to 6 —
    // the damaged cone is {2, 3} (3 only transitively, via pred)
    SsspDeltaStream.processBatch(ev(Seq((1L, 2L, 0L, -1))),
      1L, store, source = 0L, budget = Budget)
    assert(snap(store) === Map(0L -> 0L, 1L -> 1L, 2L -> 5L, 3L -> 6L),
      "deletion must lengthen the damaged cone's distances")
    // delete (0,2): 2 and 3 DISCONNECT — tombstoned, absent from serving
    SsspDeltaStream.processBatch(ev(Seq((0L, 2L, 0L, -1))),
      2L, store, source = 0L, budget = Budget)
    assert(snap(store) === Map(0L -> 0L, 1L -> 1L),
      "disconnected vertices must drop from the served table")
    // re-insert (1,2): 2 and 3 come back through the restored edge
    SsspDeltaStream.processBatch(ev(Seq((1L, 2L, 1L, 1))),
      3L, store, source = 0L, budget = Budget)
    assert(snap(store) === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L),
      "re-inserted edge must resurrect tombstoned vertices")
  }

  test("budget exclusion: a lengthened path beyond the budget tombstones, not serves") {
    val store = tmp("ssspdelta-budget")
    // 0-1 (1); 0-1 alternative (100) — beyond budget 10 after deletion
    SsspDeltaStream.processBatch(ev(Seq((0L, 1L, 1L, 1))),
      0L, store, source = 0L, budget = 10L)
    SsspDeltaStream.processBatch(ev(Seq((0L, 1L, 100L, 1))),
      1L, store, source = 0L, budget = 10L)
    assert(snap(store) === Map(0L -> 0L, 1L -> 1L))
    // deleting nothing… then delete the short edge: both (0,1) edges go
    // (deletion is pair-granular), so 1 disconnects entirely
    SsspDeltaStream.processBatch(ev(Seq((0L, 1L, 0L, -1))),
      2L, store, source = 0L, budget = 10L)
    assert(snap(store) === Map(0L -> 0L),
      "pair-granular delete removes every parallel edge")
  }

  test("mixed fixture ≡ insert-only rebuild on the surviving edge set (with compaction)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val pairs = Tables.t(spark, dir, "lineitem")
      .select($"l_partkey".cast("long").as("p"), $"l_suppkey".cast("long").as("su"))
      .distinct()
      .select(($"p" * 2).as("src"), ($"su" * 2 + 1).as("dst"),
        (lit(1L) + ($"p" * 3 + $"su" * 5) % 7).as("w"),
        (($"p" + $"su") % 5 === 0).as("del"),
        (($"p" + $"su") % 10 === 0).as("reins"))
      .cache()
    val source = 2L * Tables.t(spark, dir, "lineitem")
      .agg(min($"l_suppkey".cast("long"))).head().getLong(0) + 1L
    val store = tmp("ssspdelta-fixture")
    // two insert slices, a delete batch, a partial re-insert batch
    SsspDeltaStream.processBatch(
      pairs.filter(expr("(dst div 2) % 2 = 0")).select($"src", $"dst", $"w", lit(1).as("op")),
      0L, store, source, Budget)
    SsspDeltaStream.processBatch(
      pairs.filter(expr("(dst div 2) % 2 = 1")).select($"src", $"dst", $"w", lit(1).as("op")),
      1L, store, source, Budget)
    SsspDeltaStream.processBatch(
      pairs.filter($"del").select($"src", $"dst", lit(0L).as("w"), lit(-1).as("op")),
      2L, store, source, Budget)
    SsspDeltaStream.compact(spark, store, throughBatch = 2L)
    SsspDeltaStream.processBatch(
      pairs.filter($"reins").select($"src", $"dst", $"w", lit(1).as("op")),
      3L, store, source, Budget)
    val got = snap(store)
    // non-vacuity: the delete batch must actually remove surviving-set edges
    assert(pairs.filter($"del" && !$"reins").count() > 0)
    // oracle: the proven insert-only maintainer, fresh, on the survivors
    val surviving = pairs.filter(!$"del" || $"reins").select($"src", $"dst", $"w")
    val refStore = tmp("ssspdelta-ref")
    SsspStream.processBatch(surviving, 0L, refStore, source, Budget)
    val want = SsspStream.snapshot(spark, refStore).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.unpersist()
    assert(got === want, "decremental result diverged from the surviving-set rebuild")
  }

  test("replay is byte-identical; post-compaction delete still maintains") {
    val store = tmp("ssspdelta-replay")
    SsspDeltaStream.processBatch(
      ev(Seq((0L, 1L, 1L, 1), (1L, 2L, 1L, 1), (0L, 2L, 4L, 1))),
      0L, store, source = 0L, budget = Budget)
    SsspDeltaStream.processBatch(ev(Seq((1L, 2L, 0L, -1))),
      1L, store, source = 0L, budget = Budget)
    val before = snap(store)
    // redeliver batch 1 (identical content): prefix-bounded reads must
    // reproduce the same rows — snapshot unchanged
    SsspDeltaStream.processBatch(ev(Seq((1L, 2L, 0L, -1))),
      1L, store, source = 0L, budget = Budget)
    assert(snap(store) === before, "replay must converge to the same served table")
    // compact everything, then delete the remaining path to 2
    SsspDeltaStream.compact(spark, store, throughBatch = 1L)
    assert(snap(store) === before, "compaction must preserve the snapshot")
    SsspDeltaStream.processBatch(ev(Seq((0L, 2L, 0L, -1))),
      2L, store, source = 0L, budget = Budget)
    assert(snap(store) === Map(0L -> 0L, 1L -> 1L),
      "post-compaction deletion must still identify the damaged cone")
  }
}
