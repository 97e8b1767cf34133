package graft.sources

import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Source abstraction for the five remote endpoints the reference pulls
  * (SURVEY.md §2.1 S1–S6: ESI systems/stargates/kills/jumps + EVE-Scout
  * signatures). Implementations return Datasets; the offline fixture
  * implementation backs them with in-memory rows or parquet.
  *
  * Error policy (S7/S8, `esi.rs:109-138`, `sync.rs:323-350`): per-row
  * not-found is *skipped* (modeled here as ids absent from the detail
  * Dataset — a semi join naturally drops them); rate-limit/5xx aborts the
  * whole job (modeled as a thrown [[SourceRateLimited]] from the source).
  */
sealed abstract class SourceError(msg: String) extends RuntimeException(msg)
final case class SourceRateLimited(endpoint: String) extends SourceError(s"rate limited: $endpoint")
final case class SourceFailed(endpoint: String, detail: String) extends SourceError(s"$endpoint: $detail")

trait EveSource {
  /** S1 — full universe system-id list. */
  def systemIds(spark: SparkSession): Dataset[Long]
  /** S2 — details for the requested ids; unknown ids are silently absent
    * (404-skip semantics, `sync.rs:336-341`). */
  def systemDetails(spark: SparkSession, ids: Dataset[Long]): Dataset[SystemResponse]
  /** S3 — stargate details, same skip semantics. */
  def stargateDetails(spark: SparkSession, ids: Dataset[Long]): Dataset[StargateResponse]
  /** S4 — last-hour kills snapshot. */
  def systemKills(spark: SparkSession): Dataset[SystemKills]
  /** S5 — last-hour jumps snapshot. */
  def systemJumps(spark: SparkSession): Dataset[SystemJumps]
  /** S6 — EVE-Scout public signatures. */
  def signatures(spark: SparkSession): Dataset[EveScoutSignature]
}

/** Offline source over in-memory fixture rows. `missingIds` simulates
  * per-row 404s; `rateLimited` simulates a 420/429 aborting the sync. */
final class FixtureSource(
    systems: Seq[SystemResponse],
    stargates: Seq[StargateResponse],
    kills: Seq[SystemKills] = Nil,
    jumps: Seq[SystemJumps] = Nil,
    sigs: Seq[EveScoutSignature] = Nil,
    missingIds: Set[Long] = Set.empty,
    rateLimited: Boolean = false,
) extends EveSource {

  private def guard(endpoint: String): Unit =
    if (rateLimited) throw SourceRateLimited(endpoint)

  override def systemIds(spark: SparkSession): Dataset[Long] = {
    import spark.implicits._
    guard("universe/systems")
    spark.createDataset(systems.map(_.system_id))
  }

  override def systemDetails(spark: SparkSession, ids: Dataset[Long]): Dataset[SystemResponse] = {
    import spark.implicits._
    guard("universe/systems/{id}")
    val all = spark.createDataset(systems.filterNot(s => missingIds(s.system_id)))
    // fixture equivalent of the per-id fetch fan-out: semi join against ids
    all.join(ids.toDF("id").hint("broadcast"), col("system_id") === col("id"), "left_semi")
      .as[SystemResponse]
  }

  override def stargateDetails(spark: SparkSession, ids: Dataset[Long]): Dataset[StargateResponse] = {
    import spark.implicits._
    guard("universe/stargates/{id}")
    val all = spark.createDataset(stargates.filterNot(s => missingIds(s.stargate_id)))
    all.join(ids.toDF("id").hint("broadcast"), col("stargate_id") === col("id"), "left_semi")
      .as[StargateResponse]
  }

  override def systemKills(spark: SparkSession): Dataset[SystemKills] = {
    import spark.implicits._
    guard("universe/system_kills")
    spark.createDataset(kills)
  }

  override def systemJumps(spark: SparkSession): Dataset[SystemJumps] = {
    import spark.implicits._
    guard("universe/system_jumps")
    spark.createDataset(jumps)
  }

  override def signatures(spark: SparkSession): Dataset[EveScoutSignature] = {
    import spark.implicits._
    guard("v2/public/signatures")
    spark.createDataset(sigs)
  }
}

/** DTO → canonical row normalization (P9/P10, `sync.rs:25-64`): sentinel
  * defaults, nested-struct flattening, planet-id extraction — one `select`
  * instead of per-row conversion. */
object Normalize {

  def systems(dto: Dataset[SystemResponse]): Dataset[System] = {
    val spark = dto.sparkSession
    import spark.implicits._
    dto.select(
      $"system_id",
      coalesce($"name", lit("undefined")).as("name"),
      coalesce($"constellation_id", lit(-1L)).as("constellation_id"),
      $"security_status",
      coalesce($"star_id", lit(-1L)).as("star_id"),
      coalesce($"security_class", lit("undefined")).as("security_class"),
      $"position.x".as("x"), $"position.y".as("y"), $"position.z".as("z"),
      coalesce(transform($"planets", p => p("planet_id")), array().cast("array<bigint>")).as("planets"),
      coalesce($"stargates", array().cast("array<bigint>")).as("stargates"),
      lit(0).as("kills"),
      lit(0).as("jumps"),
    ).as[System]
  }

  def stargates(dto: Dataset[StargateResponse]): Dataset[Stargate] = {
    val spark = dto.sparkSession
    import spark.implicits._
    dto.select(
      $"stargate_id", $"name", $"system_id", $"type_id",
      $"position.x".as("x"), $"position.y".as("y"), $"position.z".as("z"),
      $"destination.stargate_id".as("destination_stargate_id"),
      $"destination.system_id".as("destination_system_id"),
    ).as[Stargate]
  }
}
