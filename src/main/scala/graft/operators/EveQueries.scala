package graft.operators

import graft.GQuery
import graft.api.EveGraph
import graft.fixtures.StarMap
import graft.store.EveStore
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's own query surface (§2.11) run end-to-end on the
  * FIXTURES.md mini star map: full bootstrap (diff-sync → edge derivation →
  * risk refresh → wormhole snapshot-replace) then weighted-Dijkstra routes.
  *
  * These exercise the EVE domain paths the TPC-H-shaped queries cannot
  * (sentinel normalization, DETACH deletes, projection catalog, snapshot
  * replace). Fixture inputs are embedded, not read from sfDir, so there is
  * no DuckDB oracle — the driver's rows-only check applies; exact golden
  * values are asserted in the ScalaTest suite instead.
  */
object EveQueries {

  // one bootstrapped engine per (session, wormhole-flag): the fixture is
  // immutable and every query only reads, so Verify's four eve queries pay
  // bootstrap twice instead of four times
  private val engines =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, Boolean), EveGraph]

  private def freshEngine(s: SparkSession, withWormholes: Boolean): EveGraph =
    engines.getOrElseUpdate((s, withWormholes), {
      val dir = java.nio.file.Files.createTempDirectory("evestore").toString
      val eng = new EveGraph(new EveStore(s, dir))
      eng.bootstrap(StarMap.source(withWormholes))
      eng
    })

  private def routeFrame(s: SparkSession, route: Option[Seq[String]]): DataFrame = {
    import s.implicits._
    route.getOrElse(Seq.empty).zipWithIndex
      .map { case (n, i) => (i, n) }
      .toDF("step", "system_name")
      .orderBy($"step")
  }

  /** G8 — shortest route on gates only: Jita→Perimeter→Urlen→Amarr. */
  private def shortest(s: SparkSession, dir: String): DataFrame =
    routeFrame(s, freshEngine(s, withWormholes = false).shortestRoute("Jita", "Amarr"))

  /** G8 after wormhole refresh — Thera shortcut wins: Jita→Thera→Amarr. */
  private def shortestWh(s: SparkSession, dir: String): DataFrame =
    routeFrame(s, freshEngine(s, withWormholes = true).shortestRoute("Jita", "Amarr"))

  /** G9/G10 — safest route avoids the dangerous corridor via the Safe chain. */
  private def safest(s: SparkSession, dir: String): DataFrame =
    routeFrame(s, freshEngine(s, withWormholes = false).safestRoute("Jita", "Amarr"))

  /** Risk table after refresh — E1/E2 golden values over the fixture. */
  private def risks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val eng = freshEngine(s, withWormholes = false)
    eng.store.jumps.toDF()
      .select($"src_system_id", $"dst_system_id", $"cost", $"risk")
      .orderBy($"src_system_id", $"dst_system_id")
  }

  val all: Seq[GQuery] = Seq(
    GQuery("eve_shortest_route", shortest, None),
    GQuery("eve_shortest_route_wormholes", shortestWh, None),
    GQuery("eve_safest_route", safest, None),
    GQuery("eve_jump_risks", risks, None),
  )
}
