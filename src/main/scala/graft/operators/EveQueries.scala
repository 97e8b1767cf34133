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
  * replace). Fixture inputs are embedded, not read from sfDir — so the
  * DuckDB oracles read the *persisted fixture store* instead:
  * [[persistFixture]] dumps the bootstrapped systems table (with kills /
  * jumps counters, risk NOT included) and the two jump topologies (gates /
  * gates+wormholes, cost only) next to the query outputs, and each oracle
  * recomputes the expected answer from first principles — risk via the
  * E1/E2 formulas in SQL, routes via a recursive-CTE optimal-path search
  * (the q17–q19 technique; the fixture's optima are unique, so engine
  * tie-breaking cannot diverge). `{{EVE_FIXTURE}}` is substituted with the
  * absolute dump path by Verify at dump time.
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

  /** Dump the bootstrapped fixture store for the oracles: systems with the
    * refreshed kills/jumps counters (risk intentionally excluded — the
    * oracle recomputes it), plus cost-only jump topologies for both
    * variants. Engines are cached, so this reuses the bootstrap the route
    * queries already paid for.
    *
    * `fixtureDir` must NOT be a sibling of the per-query result dirs: the
    * harness treats every top-level entry of the dump directory as a query
    * result, so a free-standing fixture dir shows up as a permanently
    * un-oracled "query". Verify nests it inside an eve query's own result
    * dir under an underscore-prefixed name, which every parquet reader
    * (Spark, pyarrow, DuckDB globs) skips as hidden — the oracles address
    * it by absolute path, so discovery rules never apply to them. */
  def persistFixture(s: SparkSession, fixtureDir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val gates = freshEngine(s, withWormholes = false)
    val wh = freshEngine(s, withWormholes = true)
    def dump(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$fixtureDir/$name")
    dump(gates.store.systems.toDF()
      .select(col("system_id"), col("name"), col("kills"), col("jumps")), "systems")
    dump(gates.store.jumps.toDF()
      .select(col("src_system_id"), col("dst_system_id"), col("cost")), "jumps_gates")
    dump(wh.store.jumps.toDF()
      .select(col("src_system_id"), col("dst_system_id"), col("cost")), "jumps_wh")
  }

  private val fixtureSys = "read_parquet('{{EVE_FIXTURE}}/systems/*.parquet')"

  /** E1/E2 in SQL over the persisted systems table, op-for-op the same
    * double arithmetic as [[graft.risk.Risk]] (k²/j + baseline; baseline =
    * Σkills/Σjumps else 0.01) so values match bit-exactly. */
  private val riskSql =
    s"""SELECT system_id,
       |  (CASE WHEN jumps > 0
       |     THEN CAST(kills AS DOUBLE) * CAST(kills AS DOUBLE) / CAST(jumps AS DOUBLE)
       |     ELSE CAST(kills AS DOUBLE) * CAST(kills AS DOUBLE) END)
       |  + (SELECT CASE WHEN SUM(CAST(jumps AS BIGINT)) > 0
       |       THEN CAST(SUM(CAST(kills AS BIGINT)) AS DOUBLE) / CAST(SUM(CAST(jumps AS BIGINT)) AS DOUBLE)
       |       ELSE 0.01 END FROM $fixtureSys) AS risk
       |FROM $fixtureSys""".stripMargin

  /** Recursive-CTE optimal-path search: enumerate simple paths from/to the
    * named systems over the given weighted edge set, keep the cheapest
    * (unique on this fixture), emit (step, system_name). */
  private def routeOracle(edgesSql: String, from: String, to: String): String =
    s"""WITH RECURSIVE
       |sys AS (SELECT system_id, name FROM $fixtureSys),
       |e AS ($edgesSql),
       |p(node, path, cost) AS (
       |  SELECT system_id, [system_id], CAST(0 AS DOUBLE) FROM sys WHERE name = '$from'
       |  UNION ALL
       |  SELECT e.dst, list_append(p.path, e.dst), p.cost + e.w
       |  FROM p JOIN e ON e.src = p.node
       |  WHERE NOT list_contains(p.path, e.dst)),
       |best AS (SELECT p.path FROM p JOIN sys t ON t.name = '$to' AND p.node = t.system_id
       |         ORDER BY p.cost, p.path LIMIT 1),
       |steps AS (SELECT CAST(generate_subscripts(best.path, 1) - 1 AS INTEGER) AS step,
       |                 unnest(best.path) AS sid FROM best)
       |SELECT steps.step, s.name AS system_name
       |FROM steps JOIN sys s ON s.system_id = steps.sid ORDER BY step""".stripMargin

  private def gateEdges(table: String): String =
    s"SELECT src_system_id AS src, dst_system_id AS dst, cost AS w FROM read_parquet('{{EVE_FIXTURE}}/$table/*.parquet')"

  /** Risk-weighted edges: weight = destination system's recomputed risk
    * (J5 — edge risk is the dst system's E1 value). */
  private val riskEdges =
    s"""SELECT j.src_system_id AS src, j.dst_system_id AS dst, r.risk AS w
       |FROM read_parquet('{{EVE_FIXTURE}}/jumps_gates/*.parquet') j
       |JOIN ($riskSql) r ON r.system_id = j.dst_system_id""".stripMargin

  private val risksOracle =
    s"""SELECT j.src_system_id, j.dst_system_id, j.cost, r.risk
       |FROM read_parquet('{{EVE_FIXTURE}}/jumps_gates/*.parquet') j
       |JOIN ($riskSql) r ON r.system_id = j.dst_system_id
       |ORDER BY j.src_system_id, j.dst_system_id""".stripMargin

  val all: Seq[GQuery] = Seq(
    GQuery("eve_shortest_route", shortest,
      Some(routeOracle(gateEdges("jumps_gates"), "Jita", "Amarr"))),
    GQuery("eve_shortest_route_wormholes", shortestWh,
      Some(routeOracle(gateEdges("jumps_wh"), "Jita", "Amarr"))),
    GQuery("eve_safest_route", safest,
      Some(routeOracle(riskEdges, "Jita", "Amarr"))),
    GQuery("eve_jump_risks", risks, Some(risksOracle)),
  )
}
