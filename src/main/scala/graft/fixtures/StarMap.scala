package graft.fixtures

import graft.model._
import graft.sources.FixtureSource

/** Mini star map per FIXTURES.md §A.7: a unique shortest Jita→Amarr path, a
  * longer but lower-risk alternative (shortest ≠ safest), an unreachable
  * island, Thera wormholes bridging regions, a duplicate system row for
  * dedup, and sentinel-default fields on one system.
  */
object StarMap {

  val Jita = 30000142L
  val Perimeter = 30000144L
  val Urlen = 30000139L
  val Amarr = 30002187L
  val SafeA = 30001001L
  val SafeB = 30001002L
  val SafeC = 30001003L
  val Island1 = 30009001L
  val Island2 = 30009002L
  val Thera = 31000005L
  val Turnur = 30002086L

  /** Undirected gate pairs (each yields two Stargate rows / two JUMP edges,
    * per `/root/reference/src/database.rs:241-242`). */
  val gatePairs: Seq[(Long, Long)] = Seq(
    (Jita, Perimeter), (Perimeter, Urlen), (Urlen, Amarr),
    (Jita, SafeA), (SafeA, SafeB), (SafeB, SafeC), (SafeC, Amarr),
    (SafeB, Turnur),
    (Island1, Island2))

  private def gateId(src: Long, dst: Long): Long =
    50000000000L + (src % 100000L) * 100000L + (dst % 100000L) // disjoint 5-digit slots -> collision-free

  val stargateResponses: Seq[StargateResponse] =
    gatePairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.map { case (src, dst) =>
      StargateResponse(gateId(src, dst), s"Stargate ($dst)", src, 29624L,
        Position(1.0, 2.0, 3.0), StargateDestination(gateId(dst, src), dst))
    }

  private def gatesOf(id: Long): Seq[Long] =
    stargateResponses.filter(_.system_id == id).map(_.stargate_id)

  private def sys(id: Long, name: String, sec: Double): SystemResponse =
    SystemResponse(id, Some(name), Some(20000020L), sec, Some(40000849L), Some("A"),
      Position(1.0, 2.0, 3.0), Some(Seq(PlanetRef(40000855L))), Some(gatesOf(id)))

  val names: Map[Long, String] = Map(
    Jita -> "Jita", Perimeter -> "Perimeter", Urlen -> "Urlen", Amarr -> "Amarr",
    SafeA -> "SafeA", SafeB -> "SafeB", SafeC -> "SafeC",
    Island1 -> "Island1", Island2 -> "Island2", Thera -> "Thera", Turnur -> "Turnur")

  val systemResponses: Seq[SystemResponse] = {
    val base = names.toSeq.sortBy(_._1).map { case (id, n) => sys(id, n, 0.9) }
    // sentinel-exercising row: Island2 with missing optional fields
    val withSentinels = base.map { s =>
      if (s.system_id == Island2)
        s.copy(constellation_id = None, star_id = None, security_class = None, planets = None)
      else s
    }
    // duplicate SafeA row (same key, different constellation) → dedup fixture
    withSentinels :+ sys(SafeA, "SafeA", 0.9).copy(constellation_id = Some(99999999L))
  }

  /** Last-hour snapshots: the Perimeter/Urlen corridor is dangerous, the
    * Safe chain is quiet → shortest ≠ safest. */
  val killSnapshots: Seq[SystemKills] = Seq(
    SystemKills(Jita, 10), SystemKills(Perimeter, 30), SystemKills(Urlen, 30),
    SystemKills(Amarr, 5), SystemKills(SafeA, 0), SystemKills(SafeB, 0),
    SystemKills(SafeC, 0))

  val jumpSnapshots: Seq[SystemJumps] =
    names.keys.toSeq.sorted.map(id => SystemJumps(id, 100))

  private def sig(i: String, inId: Long, outId: Long): EveScoutSignature =
    EveScoutSignature(i, "2026-01-01T00:00:00Z", "2026-01-01T00:00:00Z", "",
      completed = true, wh_exits_outward = true, "K162", "xlarge",
      "2026-01-02T00:00:00Z", 12L, "wormhole", outId, names(outId), inId,
      10000002L, "The Forge", None)

  /** Thera wormholes bridging Jita and Amarr (plus one non-wormhole
    * signature that the P7 filter must drop). */
  val wormholeSignatures: Seq[EveScoutSignature] = Seq(
    sig("sig1", Thera, Jita),
    sig("sig2", Thera, Amarr),
    sig("sig3", Thera, Island1).copy(signature_type = "data"))

  def source(withWormholes: Boolean): FixtureSource =
    new FixtureSource(
      systems = systemResponses,
      stargates = stargateResponses,
      kills = killSnapshots,
      jumps = jumpSnapshots,
      sigs = if (withWormholes) wormholeSignatures else Nil)
}
