package graft.sources

import graft.model._
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** File-backed source: the offline stand-in for the five REST endpoints,
  * reading JSON-lines snapshots (the shape ESI/EVE-Scout responses land in
  * when captured). Schemas are explicit — derived from the DTO encoders,
  * never inferred (SURVEY.md §1.3: schema-on-read with declared schemas).
  *
  * Layout under `root/`:
  *   systems.jsonl      SystemResponse rows (S1 ids ≡ S2 details here)
  *   stargates.jsonl    StargateResponse rows
  *   kills.jsonl        SystemKills rows        (optional)
  *   jumps.jsonl        SystemJumps rows        (optional)
  *   signatures.jsonl   EveScoutSignature rows  (optional)
  */
final class JsonEveSource(root: String) extends EveSource {

  private def read[T: org.apache.spark.sql.Encoder](
      spark: SparkSession, file: String, required: Boolean): Dataset[T] = {
    val path = s"$root/$file"
    val enc = implicitly[org.apache.spark.sql.Encoder[T]]
    if (!new java.io.File(path).exists()) {
      if (required) throw SourceFailed(file, "missing snapshot file")
      spark.emptyDataset[T](enc)
    } else spark.read.schema(enc.schema).json(path).as[T](enc)
  }

  override def systemIds(spark: SparkSession): Dataset[Long] = {
    import spark.implicits._
    read[SystemResponse](spark, "systems.jsonl", required = true)
      .select($"system_id").as[Long]
  }

  override def systemDetails(spark: SparkSession, ids: Dataset[Long]): Dataset[SystemResponse] = {
    implicit val enc = Encoders.product[SystemResponse]
    read[SystemResponse](spark, "systems.jsonl", required = true)
      .join(ids.toDF("id").hint("broadcast"), col("system_id") === col("id"), "left_semi")
      .as[SystemResponse]
  }

  override def stargateDetails(spark: SparkSession, ids: Dataset[Long]): Dataset[StargateResponse] = {
    implicit val enc = Encoders.product[StargateResponse]
    read[StargateResponse](spark, "stargates.jsonl", required = true)
      .join(ids.toDF("id").hint("broadcast"), col("stargate_id") === col("id"), "left_semi")
      .as[StargateResponse]
  }

  override def systemKills(spark: SparkSession): Dataset[SystemKills] = {
    implicit val enc = Encoders.product[SystemKills]
    read[SystemKills](spark, "kills.jsonl", required = false)
  }

  override def systemJumps(spark: SparkSession): Dataset[SystemJumps] = {
    implicit val enc = Encoders.product[SystemJumps]
    read[SystemJumps](spark, "jumps.jsonl", required = false)
  }

  override def signatures(spark: SparkSession): Dataset[EveScoutSignature] = {
    implicit val enc = Encoders.product[EveScoutSignature]
    read[EveScoutSignature](spark, "signatures.jsonl", required = false)
  }
}
