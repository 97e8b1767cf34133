package graft.api

import graft.graph.{Dijkstra, GraphCatalog}
import graft.model._
import graft.sources.EveSource
import graft.store.EveStore
import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.functions._

/** Engine facade mirroring the reference's public contract (SURVEY.md §2.11):
  * route queries + refresh operations + bootstrap, minus the HTTP layer
  * (plain Scala functions; a server would be a thin wrapper).
  *
  * Projections: two weighted graphs, `system-map` (cost) and `jump-risk`
  * (risk), managed by [[GraphCatalog]] with the reference's lifecycle —
  * rebuilt on refresh (`database.rs:468-482`), `jump-risk` built lazily on
  * first safest-route query (`main.rs:178-185`).
  */
final class EveGraph(val store: EveStore) {

  val catalog = new GraphCatalog[Long, Double]

  private val spark = store.spark

  // ---- projections (G1/G2, `database.rs:422-456`) ----

  // jumps-table version each projection was built from: the incremental
  // risk path is only sound while the edge topology is unchanged
  private val builtAgainst = scala.collection.concurrent.TrieMap.empty[String, Long]

  private def buildProjection(name: String, weightCol: String): Graph[Long, Double] = {
    builtAgainst.put(name, store.jumpsVersion)
    val edges = store.jumps.toDF()
      .select(col("src_system_id"), col("dst_system_id"), col(weightCol).cast("double"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 2D edge partitioning bounds vertex replication to 2√N partitions —
    // the projection layout that keeps Pregel supersteps balanced at scale
    Graph.fromEdges(edges, 0L)
      .partitionBy(org.apache.spark.graphx.PartitionStrategy.EdgePartition2D)
  }

  def refreshSystemMap(): Unit =
    catalog.refresh("system-map", () => buildProjection("system-map", "cost"))

  def refreshJumpRisk(): Unit =
    catalog.refresh("jump-risk", () => buildProjection("jump-risk", "risk"))

  /** G5 at scale: risk is a function of the *destination* system, so a
    * risk-only refresh need not rebuild the edge structure — join the new
    * per-system risks onto the vertices and re-derive edge weights with
    * `mapTriplets`. Topology RDDs are reused; only the vertex values and
    * edge attrs change (SURVEY §2.7 "incremental joinVertices" note).
    *
    * Risk comes from [[EveStore.riskBySystem]] — the systems table, the
    * same source the full refresh writes onto edges — never from existing
    * edge rows (wormhole edges carry risk=0.0 until the next full refresh,
    * so an edge-derived dedup would nondeterministically pick stale
    * weights). Falls back to a full build when no projection exists yet OR
    * the edge set changed since the projection was built (the reused
    * topology would silently be stale). */
  def refreshJumpRiskIncremental(): Unit = {
    val current = store.jumpsVersion
    if (!catalog.exists("jump-risk") || !builtAgainst.get("jump-risk").contains(current)) {
      refreshJumpRisk(); return
    }
    val riskVerts = store.riskBySystem()
      .rdd.map(r => (r.getLong(0), r.getDouble(1)))
    catalog.refresh("jump-risk", () => {
      val old = catalog.getOrCreate("jump-risk", () => buildProjection("jump-risk", "risk"))
      old.mapVertices((_, _) => 0.0)
        .joinVertices(riskVerts)((_, _, r) => r)
        .mapTriplets(t => t.dstAttr)
        .mapVertices((_, _) => 0L)
    })
  }

  // ---- route queries (G8/G9/G10, `database.rs:484-544`) ----

  private def systemIdByName(name: String): Option[Long] =
    store.systems.filter(col("name") === name)
      .select(col("system_id")).limit(1)
      .collect().headOption.map(_.getLong(0))

  private def namesByIds(ids: Seq[Long]): Map[Long, String] =
    store.systems.filter(col("system_id").isin(ids: _*))
      .select(col("system_id"), col("name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  /** Shared route logic: name-resolve both endpoints (missing name → None →
    * the reference's 404), Dijkstra over the named projection, then the
    * id→name mapping (J6). The projection is *pinned* for the duration of
    * the search ([[GraphCatalog.withGraph]]): a refresh landing mid-query
    * retires the old graph from the catalog immediately but cannot
    * unpersist it under the running Pregel loop, so the answer is computed
    * against one consistent snapshot. */
  private def route(graphName: String, weightCol: String, from: String, to: String): Option[Seq[String]] =
    for {
      src <- systemIdByName(from)
      dst <- systemIdByName(to)
      res <- catalog.withGraph(graphName, () => buildProjection(graphName, weightCol))(
        Dijkstra.autoPath(_, src, dst))
    } yield {
      val names = namesByIds(res._2.distinct)
      res._2.map(id => names.getOrElse(id, "undefined"))
    }

  /** GET /shortest-route/{from}/to/{to} — cost-weighted (cost=1 constant in
    * the reference, so fewest jumps). */
  def shortestRoute(from: String, to: String): Option[Seq[String]] =
    route("system-map", "cost", from, to)

  /** GET /safest-route/{from}/to/{to} — risk-weighted; projection built
    * lazily if absent (G10). */
  def safestRoute(from: String, to: String): Option[Seq[String]] =
    route("jump-risk", "risk", from, to)

  // ---- refresh endpoints (§2.11, `main.rs:201-245`) ----

  /** POST /systems/refresh — diff-sync (SURVEY.md §3.2): stale ids removed
    * (DETACH), new ids pulled/normalized/appended, dedup repair. */
  def refreshSystems(source: EveSource): Unit = {
    import spark.implicits._
    val esiIds = source.systemIds(spark).cache()
    val dbIds = store.systems.select($"system_id").as[Long]
    val stale = dbIds.except(esiIds) // J1: db − esi
    if (!stale.isEmpty) store.removeSystems(stale)
    val fresh = esiIds.except(dbIds) // J2: esi − db
    if (!fresh.isEmpty) {
      val details = source.systemDetails(spark, fresh)
      store.appendSystems(graft.sources.Normalize.systems(details))
    }
    store.dedupSystems()
  }

  /** POST /stargates/refresh — stargate diff-sync driven by the systems'
    * stargate-id lists (A4 explode), then edge re-derivation (J3) and
    * system-map rebuild. Per-row 404s (ids the source no longer knows) are
    * skipped, matching `pull_stargate` (`sync.rs:323-350`). */
  def refreshStargates(source: EveSource): Unit = {
    import spark.implicits._
    val expected = store.systems
      .select(explode($"stargates").as("stargate_id"))
      .distinct().as[Long].cache()
    val dbIds = store.stargates.select($"stargate_id").as[Long]
    val stale = dbIds.except(expected)
    if (!stale.isEmpty) store.removeStargates(stale)
    val fresh = expected.except(dbIds)
    if (!fresh.isEmpty) {
      val details = source.stargateDetails(spark, fresh)
      store.appendStargates(graft.sources.Normalize.stargates(details))
    }
    store.dedupStargates()
    store.deriveJumps()
    refreshSystemMap()
  }

  /** POST /systems/risk — kills/jumps snapshot upsert, baseline, edge-risk
    * update join, jump-risk rebuild (SURVEY.md §3.3). */
  def refreshRisks(source: EveSource): Unit = {
    store.updateKillsJumps(source.systemKills(spark), source.systemJumps(spark))
    store.refreshJumpRisks()
    refreshJumpRisk()
  }

  /** POST /wormholes/refresh — snapshot-replace protocol (`sync.rs:66-94`):
    * drop all Thera/Turnur edges first, then re-add current wormhole
    * signatures bidirectionally, then rebuild system-map. */
  def refreshWormholes(source: EveSource): Unit = {
    import spark.implicits._
    store.dropConnectionsOf("Thera")
    store.dropConnectionsOf("Turnur")
    val whs = source.signatures(spark)
      .filter($"signature_type" === "wormhole") // P7
      .select($"in_system_id", $"out_system_id").as[(Long, Long)]
    // edge only if both endpoints exist (same validation as J3)
    val sys = store.systems.select($"system_id").distinct()
    val valid = whs.toDF("in_id", "out_id")
      .join(sys.toDF("a"), $"in_id" === $"a", "left_semi")
      .join(sys.toDF("b"), $"out_id" === $"b", "left_semi")
      .as[(Long, Long)]
    store.addWormholes(valid)
    refreshSystemMap()
  }

  /** Startup bootstrap, reference order (`main.rs:27-34,83-107`):
    * systems → stargates (+cost graph) → risks (+risk graph) → wormholes
    * (+cost graph rebuild). Any failure propagates (process aborts). */
  def bootstrap(source: EveSource): Unit = {
    store.initEmpty()
    refreshSystems(source)
    refreshStargates(source)
    refreshRisks(source)
    refreshWormholes(source)
  }
}
