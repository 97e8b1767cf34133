package graft.model

/** Canonical row types — schemas lifted from the reference structs
  * (`/root/reference/src/database.rs:81-96,199-210`, `esi.rs:5-46,85-107`,
  * `eve_scout.rs:15-44`); see SURVEY.md §1.2 for the full type census.
  * Stored tables are non-nullable: ingest normalizes missing values to the
  * reference's sentinels (`sync.rs:28-42`): -1 / "undefined" / [].
  */

/** Node table `System` — `database.rs:81-96`. */
final case class System(
    system_id: Long,
    name: String,
    constellation_id: Long,
    security_status: Double,
    star_id: Long,
    security_class: String,
    x: Double,
    y: Double,
    z: Double,
    planets: Seq[Long],
    stargates: Seq[Long],
    kills: Int,
    jumps: Int)

/** Node table `Stargate` — `database.rs:199-210` (destination flattened per
  * `sync.rs:50-64`). */
final case class Stargate(
    stargate_id: Long,
    name: String,
    system_id: Long,
    type_id: Long,
    x: Double,
    y: Double,
    z: Double,
    destination_stargate_id: Long,
    destination_system_id: Long)

/** Edge table `JUMP` — `database.rs:372-375` (cost) + `311-313` (risk).
  * `kind` ("gate" | "wormhole") records edge provenance: the reference
  * never rebuilds wormhole edges from stargates, so edge re-derivation must
  * leave them untouched (`sync.rs:66-94` owns their lifecycle). */
final case class Jump(
    src_system_id: Long,
    dst_system_id: Long,
    cost: Double,
    risk: Double,
    kind: String)

/** Last-hour kill/jump snapshots — `esi.rs:85-107`. */
final case class SystemKills(system_id: Long, ship_kills: Int)
final case class SystemJumps(system_id: Long, ship_jumps: Int)

// ---- ingest DTOs (schema-on-read; optional fields become sentinels) ----

final case class Position(x: Double, y: Double, z: Double)
final case class PlanetRef(planet_id: Long)

/** ESI `universe/systems/{id}` response — `esi.rs:5-30`. */
final case class SystemResponse(
    system_id: Long,
    name: Option[String],
    constellation_id: Option[Long],
    security_status: Double,
    star_id: Option[Long],
    security_class: Option[String],
    position: Position,
    planets: Option[Seq[PlanetRef]],
    stargates: Option[Seq[Long]])

final case class StargateDestination(stargate_id: Long, system_id: Long)

/** ESI `universe/stargates/{id}` response — `esi.rs:32-46`. */
final case class StargateResponse(
    stargate_id: Long,
    name: String,
    system_id: Long,
    type_id: Long,
    position: Position,
    destination: StargateDestination)

/** EVE-Scout public signature — `eve_scout.rs:15-44`. The pipeline reads
  * signature_type/in_system_id/out_system_id (`sync.rs:83-90`); the rest
  * must parse but are unused. */
final case class EveScoutSignature(
    id: String,
    created_at: String,
    updated_at: String,
    completed_at: String,
    completed: Boolean,
    wh_exits_outward: Boolean,
    wh_type: String,
    max_ship_size: String,
    expires_at: String,
    remaining_hours: Long,
    signature_type: String,
    out_system_id: Long,
    out_system_name: String,
    in_system_id: Long,
    in_region_id: Long,
    in_region_name: String,
    comment: Option[String])
