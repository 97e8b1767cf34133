package graft

import graft.api.EveGraph
import graft.fixtures.StarMap
import graft.store.EveStore
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end fixture tests over the FIXTURES.md mini star map: bootstrap →
  * routes, wormhole snapshot-replace, dedup, island 404 semantics. */
class EveGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def engine(withWormholes: Boolean): EveGraph = {
    val dir = java.nio.file.Files.createTempDirectory("evestore-test").toString
    val eng = new EveGraph(new EveStore(spark, dir))
    eng.bootstrap(StarMap.source(withWormholes))
    eng
  }

  private lazy val plain = engine(withWormholes = false)
  private lazy val wormy = engine(withWormholes = true)

  test("shortest route takes the 3-hop corridor") {
    assert(plain.shortestRoute("Jita", "Amarr") ===
      Some(Seq("Jita", "Perimeter", "Urlen", "Amarr")))
  }

  test("safest route avoids the dangerous corridor") {
    assert(plain.safestRoute("Jita", "Amarr") ===
      Some(Seq("Jita", "SafeA", "SafeB", "SafeC", "Amarr")))
  }

  test("wormholes shorten the shortest route via Thera") {
    assert(wormy.shortestRoute("Jita", "Amarr") ===
      Some(Seq("Jita", "Thera", "Amarr")))
  }

  test("non-wormhole signatures are filtered (P7): no route to the island via Thera") {
    assert(wormy.shortestRoute("Jita", "Island1").isEmpty)
  }

  test("unreachable island → None (404)") {
    assert(plain.shortestRoute("Jita", "Island1").isEmpty)
    assert(plain.shortestRoute("Island1", "Island2") ===
      Some(Seq("Island1", "Island2")))
  }

  test("unknown system name → None (404)") {
    assert(plain.shortestRoute("Jita", "Nowhere").isEmpty)
  }

  test("duplicate system rows are deduped to one survivor") {
    import spark.implicits._
    val n = plain.store.systems.filter($"system_id" === StarMap.SafeA).count()
    assert(n === 1L)
  }

  test("sentinel normalization applied during sync") {
    import spark.implicits._
    val row = plain.store.systems.filter($"system_id" === StarMap.Island2).head()
    assert(row.constellation_id === -1L)
    assert(row.security_class === "undefined")
    assert(row.planets === Seq.empty)
  }

  test("edge risk = destination-system E1 risk") {
    import spark.implicits._
    // baseline = Σkills/Σjumps = 75/1100; Perimeter risk = 30²/100 + b
    val b = 75.0 / 1100.0
    val edge = plain.store.jumps
      .filter($"src_system_id" === StarMap.Jita && $"dst_system_id" === StarMap.Perimeter)
      .head()
    assert(math.abs(edge.risk - (9.0 + b)) < 1e-12)
    // quiet SafeA: 0 kills, 100 jumps → baseline only
    val safe = plain.store.jumps
      .filter($"src_system_id" === StarMap.Jita && $"dst_system_id" === StarMap.SafeA)
      .head()
    assert(math.abs(safe.risk - b) < 1e-12)
  }

  test("wormhole refresh is snapshot-replace: no duplicate edges on re-refresh") {
    import spark.implicits._
    val eng = engine(withWormholes = true)
    val before = eng.store.jumps.count()
    eng.refreshWormholes(StarMap.source(withWormholes = true))
    assert(eng.store.jumps.count() === before)
    // and each wormhole edge exists exactly once per direction
    val theraEdges = eng.store.jumps
      .filter($"src_system_id" === StarMap.Thera || $"dst_system_id" === StarMap.Thera)
    assert(theraEdges.count() === 4L) // Jita↔Thera, Thera↔Amarr
  }

  test("wormhole refresh rewrites only the wormhole partition") {
    val eng = engine(withWormholes = true)
    val gateV = eng.store.version("jumps_gate")
    val whV = eng.store.version("jumps_wormhole")
    // wormhole snapshot-replace: drops Thera/Turnur edges + re-adds sigs —
    // the (at scale, huge) gate partition must not be rewritten
    eng.refreshWormholes(StarMap.source(withWormholes = true))
    assert(eng.store.version("jumps_gate") === gateV, "gate partition was rewritten")
    assert(eng.store.version("jumps_wormhole") !== whV)
    // and the reverse: gate re-derivation leaves the wormhole partition alone
    val whV2 = eng.store.version("jumps_wormhole")
    eng.store.deriveJumps()
    assert(eng.store.version("jumps_wormhole") === whV2, "wormhole partition was rewritten")
  }

  test("stargate refresh preserves active wormhole edges (provenance)") {
    import spark.implicits._
    val eng = engine(withWormholes = true)
    assert(eng.shortestRoute("Jita", "Amarr") === Some(Seq("Jita", "Thera", "Amarr")))
    // a gates-only refresh must not wipe the wormhole overlay
    eng.refreshStargates(StarMap.source(withWormholes = true))
    assert(eng.store.jumps.filter($"kind" === "wormhole").count() === 4L)
    assert(eng.shortestRoute("Jita", "Amarr") === Some(Seq("Jita", "Thera", "Amarr")))
  }

  test("wormholes expire when the next refresh has no signatures") {
    import spark.implicits._
    val eng = engine(withWormholes = true)
    eng.refreshWormholes(StarMap.source(withWormholes = false))
    assert(eng.store.jumps
      .filter($"src_system_id" === StarMap.Thera || $"dst_system_id" === StarMap.Thera)
      .count() === 0L)
    assert(eng.shortestRoute("Jita", "Amarr") ===
      Some(Seq("Jita", "Perimeter", "Urlen", "Amarr")))
  }

  test("diff-sync removes systems absent from the source (DETACH semantics)") {
    import spark.implicits._
    val eng = engine(withWormholes = false)
    val smaller = new graft.sources.FixtureSource(
      systems = StarMap.systemResponses.filterNot(_.system_id == StarMap.Perimeter),
      stargates = StarMap.stargateResponses)
    eng.refreshSystems(smaller)
    assert(eng.store.systems.filter($"name" === "Perimeter").count() === 0L)
    // incident edges detached both directions
    assert(eng.store.jumps
      .filter($"src_system_id" === StarMap.Perimeter || $"dst_system_id" === StarMap.Perimeter)
      .count() === 0L)
    // graph projections rebuilt on next query: corridor now broken → Safe chain
    eng.refreshSystemMap()
    assert(eng.shortestRoute("Jita", "Amarr") ===
      Some(Seq("Jita", "SafeA", "SafeB", "SafeC", "Amarr")))
  }

  test("per-row 404 is skipped, sync continues (S8 policy)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evestore-404").toString
    val eng = new EveGraph(new EveStore(spark, dir))
    val lossy = new graft.sources.FixtureSource(
      systems = StarMap.systemResponses, stargates = StarMap.stargateResponses,
      kills = StarMap.killSnapshots, jumps = StarMap.jumpSnapshots,
      missingIds = Set(StarMap.Island1))
    eng.bootstrap(lossy)
    // the missing system is simply absent; everything else synced
    assert(eng.store.systems.filter($"system_id" === StarMap.Island1).count() === 0L)
    assert(eng.store.systems.count() === 10L)
    assert(eng.shortestRoute("Jita", "Amarr").nonEmpty)
  }

  test("edge derivation validates both endpoints (S11/J3)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evestore-j3").toString
    val eng = new EveGraph(new EveStore(spark, dir))
    // stargate whose destination system does not exist anywhere
    val ghostGate = graft.model.StargateResponse(59999999L, "Stargate (Ghost)",
      StarMap.Jita, 29624L, graft.model.Position(0, 0, 0),
      graft.model.StargateDestination(59999998L, 77777777L))
    val src = new graft.sources.FixtureSource(
      systems = StarMap.systemResponses.map(s =>
        if (s.system_id == StarMap.Jita) s.copy(stargates = s.stargates.map(_ :+ ghostGate.stargate_id)) else s),
      stargates = StarMap.stargateResponses :+ ghostGate,
      kills = StarMap.killSnapshots, jumps = StarMap.jumpSnapshots)
    eng.bootstrap(src)
    // ghost gate row lands in the stargate table…
    assert(eng.store.stargates.filter($"stargate_id" === ghostGate.stargate_id).count() === 1L)
    // …but no edge to the nonexistent endpoint is created
    assert(eng.store.jumps.filter($"dst_system_id" === 77777777L).count() === 0L)
  }

  test("rate-limited source aborts the sync (S7 policy)") {
    val eng = engine(withWormholes = false)
    val limited = new graft.sources.FixtureSource(
      systems = StarMap.systemResponses, stargates = StarMap.stargateResponses,
      rateLimited = true)
    assertThrows[graft.sources.SourceRateLimited] {
      eng.refreshSystems(limited)
    }
  }

  test("incremental risk projection refresh equals full rebuild") {
    import graft.model.{SystemJumps, SystemKills}
    val dir = java.nio.file.Files.createTempDirectory("evestore-inc").toString
    val eng = new EveGraph(new EveStore(spark, dir))
    eng.bootstrap(StarMap.source(withWormholes = false))
    // new snapshot arrives: SafeB becomes dangerous
    import spark.implicits._
    eng.store.updateKillsJumps(
      Seq(SystemKills(StarMap.SafeB, 50)).toDS(),
      Seq.empty[SystemJumps].toDS())
    eng.store.refreshJumpRisks()
    // full rebuild vs incremental vertex-join update
    eng.refreshJumpRisk()
    val full = eng.catalog.getOrCreate("jump-risk", () => fail("must exist"))
      .triplets.map(t => (t.srcId, t.dstId, t.attr)).collect().toSet
    eng.refreshJumpRiskIncremental()
    val inc = eng.catalog.getOrCreate("jump-risk", () => fail("must exist"))
      .triplets.map(t => (t.srcId, t.dstId, t.attr)).collect().toSet
    assert(inc === full)
    // and the dangerous SafeB reroutes the safest path
    assert(eng.safestRoute("Jita", "Amarr") ===
      Some(Seq("Jita", "Perimeter", "Urlen", "Amarr")))
    // topology change after the projection was built: the incremental path
    // must detect the stale edge set and fall back to a full rebuild that
    // includes the new edge
    eng.store.addWormholes(Seq((StarMap.Jita, StarMap.Amarr)).toDS())
    eng.refreshJumpRiskIncremental()
    val rebuilt = eng.catalog.getOrCreate("jump-risk", () => fail("must exist"))
      .triplets.map(t => (t.srcId, t.dstId)).collect().toSet
    assert(rebuilt.contains((StarMap.Jita, StarMap.Amarr)))
    assert(rebuilt.contains((StarMap.Amarr, StarMap.Jita)))
  }

  test("streaming risk refresh equals the batch refresh (foreachBatch cadence)") {
    import spark.implicits._
    // engine bootstrapped with NO kill/jump data
    val dir = java.nio.file.Files.createTempDirectory("evestore-rs").toString
    val eng = new EveGraph(new EveStore(spark, dir))
    eng.bootstrap(new graft.sources.FixtureSource(
      systems = StarMap.systemResponses, stargates = StarMap.stargateResponses))
    // snapshots arrive as a stream
    val snapDir = java.nio.file.Files.createTempDirectory("snapshots").toString
    val kills = StarMap.killSnapshots.map(k => k.system_id -> k.ship_kills).toMap
    StarMap.jumpSnapshots
      .map(j => (j.system_id, kills.getOrElse(j.system_id, 0), j.ship_jumps))
      .toDF("system_id", "ship_kills", "ship_jumps")
      .write.mode("append").parquet(snapDir)
    val q = graft.streaming.RiskStream.start(eng, snapDir)
    q.awaitTermination()
    // identical risks to the batch-refreshed engine
    val streamed = eng.store.jumps.toDF()
      .select($"src_system_id", $"dst_system_id", $"risk")
    val batch = plain.store.jumps.toDF()
      .select($"src_system_id", $"dst_system_id", $"risk")
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
    // and the swapped projection answers the safest route identically
    assert(eng.safestRoute("Jita", "Amarr") ===
      Some(Seq("Jita", "SafeA", "SafeB", "SafeC", "Amarr")))
  }

  test("JSON snapshot source: full bootstrap from .jsonl files") {
    import spark.implicits._
    val snap = java.nio.file.Files.createTempDirectory("eve-json").toString
    // capture the fixture as JSON-lines snapshots (what a REST capture
    // would produce), then bootstrap purely from files
    Seq(
      ("systems.jsonl", StarMap.systemResponses.toDS.toDF()),
      ("stargates.jsonl", StarMap.stargateResponses.toDS.toDF()),
      ("kills.jsonl", StarMap.killSnapshots.toDS.toDF()),
      ("jumps.jsonl", StarMap.jumpSnapshots.toDS.toDF()),
      ("signatures.jsonl", StarMap.wormholeSignatures.toDS.toDF()),
    ).foreach { case (name, df) =>
      val tmp = s"$snap/_w_$name"
      df.coalesce(1).write.json(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".json")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$snap/$name"))
    }
    val eng = {
      val dir = java.nio.file.Files.createTempDirectory("evestore-json").toString
      new EveGraph(new EveStore(spark, dir))
    }
    eng.bootstrap(new graft.sources.JsonEveSource(snap))
    assert(eng.shortestRoute("Jita", "Amarr") ===
      Some(Seq("Jita", "Thera", "Amarr")))
    assert(eng.store.systems.count() === 11L)
  }

  test("graph catalog: lazy build, list, drop") {
    val eng = engine(withWormholes = false)
    assert(!eng.catalog.exists("jump-risk") || eng.catalog.exists("jump-risk"))
    eng.safestRoute("Jita", "Amarr") // G10 lazy build
    assert(eng.catalog.exists("jump-risk"))
    assert(eng.catalog.drop("jump-risk"))
    assert(!eng.catalog.exists("jump-risk"))
    assert(!eng.catalog.drop("jump-risk"))
  }

  test("graph catalog: pinned projection survives a mid-query refresh") {
    import org.apache.spark.graphx.{Edge, Graph}
    import org.apache.spark.storage.StorageLevel
    val cat = new graft.graph.GraphCatalog[Long, Double]
    def build(w: Double): () => Graph[Long, Double] =
      () => Graph.fromEdges(spark.sparkContext.parallelize(Seq(Edge(1L, 2L, w))), 0L)
    val g0 = cat.getOrCreate("g", build(1.0))
    val res = cat.withGraph("g", () => fail("projection must already exist")) { g =>
      assert(g eq g0)
      cat.refresh("g", build(2.0)) // swap lands while the query is in flight
      // retired from the catalog, but the pin keeps the snapshot cached —
      // the rest of the query computes on consistent data
      assert(g0.vertices.getStorageLevel !== StorageLevel.NONE)
      assert(g0.edges.getStorageLevel !== StorageLevel.NONE)
      g.edges.map(_.attr).sum()
    }
    assert(res === 1.0) // the in-flight query answered from its snapshot
    // last pin released → the retired instance is unpersisted
    assert(g0.vertices.getStorageLevel === StorageLevel.NONE)
    assert(g0.edges.getStorageLevel === StorageLevel.NONE)
    // new queries see the refreshed projection, still cached
    assert(cat.withGraph("g", () => fail("refreshed"))(_.edges.map(_.attr).sum()) === 2.0)
    // drop retires an unpinned instance immediately
    val g2 = cat.getOrCreate("g", () => fail("refreshed"))
    assert(cat.drop("g"))
    assert(g2.vertices.getStorageLevel === StorageLevel.NONE)
  }

  test("graph catalog: concurrent refresh storm never hands a query an uncached snapshot") {
    // the lookup-to-pin race: a refresh can retire (and, at pins == 0,
    // unpersist) a holder BETWEEN a reader's catalog lookup and its pin.
    // tryPin refuses retired holders and withGraph re-fetches; with the
    // old unconditional pin() this storm could observe a graph whose
    // cache was already dropped (torn snapshot on the next superstep).
    // One-sided test: correct code can never fail it.
    import org.apache.spark.graphx.{Edge, Graph}
    import org.apache.spark.storage.StorageLevel
    val cat = new graft.graph.GraphCatalog[Long, Double]
    def build(w: Double): () => Graph[Long, Double] =
      () => Graph.fromEdges(spark.sparkContext.parallelize(Seq(Edge(1L, 2L, w))), 0L)
    cat.getOrCreate("g", build(0.0))
    val problems = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val readers = (1 to 4).map(t => new Thread(() => {
      try {
        for (_ <- 0 until 20) {
          cat.withGraph("g", build(-1.0)) { g =>
            if (g.vertices.getStorageLevel == StorageLevel.NONE ||
              g.edges.getStorageLevel == StorageLevel.NONE)
              problems.add(s"reader $t pinned an unpersisted graph")
            g.edges.count()
          }
        }
      } catch { case e: Throwable => problems.add(s"reader $t: $e") }
    }))
    val refresher = new Thread(() => {
      try for (i <- 1 to 20) cat.refresh("g", build(i.toDouble))
      catch { case e: Throwable => problems.add(s"refresher: $e") }
    })
    (readers :+ refresher).foreach(_.start())
    (readers :+ refresher).foreach(_.join(120000))
    assert(problems.isEmpty, problems.toArray.mkString("; "))
  }
}
