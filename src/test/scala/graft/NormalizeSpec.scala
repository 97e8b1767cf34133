package graft

import graft.model._
import graft.sources.Normalize
import org.scalatest.funsuite.AnyFunSuite

/** DTO-conversion goldens from the reference tests
  * (`/root/reference/src/sync.rs:352-414`) plus the sentinel rules
  * (`sync.rs:28-42`). */
class NormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Jita SystemResponse → System (sync.rs:358-386)") {
    val dto = SystemResponse(30000142L, Some("Jita"), Some(20000020L), 0.9,
      Some(40000849L), Some("A"), Position(1.0, 2.0, 3.0),
      Some(Seq(PlanetRef(40000855L))), Some(Seq(50000056L)))
    val sys = Normalize.systems(Seq(dto).toDS()).head()
    assert(sys === System(30000142L, "Jita", 20000020L, 0.9, 40000849L, "A",
      1.0, 2.0, 3.0, Seq(40000855L), Seq(50000056L), 0, 0))
  }

  test("missing optionals → sentinels -1 / undefined / []") {
    val dto = SystemResponse(1L, None, None, 0.5, None, None,
      Position(0.0, 0.0, 0.0), None, None)
    val sys = Normalize.systems(Seq(dto).toDS()).head()
    assert(sys.name === "undefined")
    assert(sys.constellation_id === -1L)
    assert(sys.star_id === -1L)
    assert(sys.security_class === "undefined")
    assert(sys.planets === Seq.empty)
    assert(sys.stargates === Seq.empty)
    assert(sys.kills === 0 && sys.jumps === 0)
  }

  test("StargateResponse → Stargate destination flattening (sync.rs:389-413)") {
    val dto = StargateResponse(50011905L, "Stargate (Vouskiaho)", 30000142L,
      29624L, Position(1.0, 2.0, 3.0), StargateDestination(50011906L, 30000144L))
    val sg = Normalize.stargates(Seq(dto).toDS()).head()
    assert(sg === Stargate(50011905L, "Stargate (Vouskiaho)", 30000142L, 29624L,
      1.0, 2.0, 3.0, 50011906L, 30000144L))
  }
}
