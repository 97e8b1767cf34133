package graft.store

import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.collection.concurrent.TrieMap

/** Parquet-backed mutable tables with the reference's write semantics
  * re-expressed as bulk relational rewrites (SURVEY.md §2.1 S9-S12, §4).
  *
  * Neo4j-style point mutations (`SET`, `DETACH DELETE`) become
  * read→transform→overwrite of whole tables. Each overwrite writes a fresh
  * versioned directory and then atomically swaps a manifest pointer, so a
  * reader (or a cached graph projection) started against version N never
  * observes a half-written version N+1 — the refresh-atomicity fix called
  * out in SURVEY.md §7.4. At cluster scale the same protocol works over any
  * shared filesystem because the manifest move is a single-file rename.
  */
final class EveStore(val spark: SparkSession, root: String) {
  import spark.implicits._

  Files.createDirectories(Paths.get(root))
  private val versions = TrieMap.empty[String, Long]

  // ---- versioned table primitives ----

  private def manifest(table: String) = Paths.get(root, table, "MANIFEST")

  private def currentVersion(table: String): Option[Long] =
    versions.get(table).orElse {
      val m = manifest(table)
      if (Files.exists(m)) Some(Files.readString(m).trim.toLong) else None
    }

  def write(table: String, df: DataFrame): Unit = {
    val next = currentVersion(table).getOrElse(0L) + 1L
    val dir = Paths.get(root, table, s"v$next")
    df.write.mode(SaveMode.Overwrite).parquet(dir.toString)
    val tmp = Paths.get(root, table, s".MANIFEST.$next")
    Files.createDirectories(tmp.getParent)
    Files.writeString(tmp, next.toString)
    Files.move(tmp, manifest(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    versions.put(table, next)
  }

  def read(table: String): DataFrame = currentVersion(table) match {
    case Some(v) => spark.read.parquet(Paths.get(root, table, s"v$v").toString)
    case None => throw new IllegalStateException(s"table $table not initialized")
  }

  def exists(table: String): Boolean = currentVersion(table).isDefined

  /** Current committed version of a table (None before first write) —
    * lets callers detect whether a snapshot they derived is still fresh. */
  def version(table: String): Option[Long] = currentVersion(table)

  def systems: Dataset[System] = read("systems").as[System]
  def stargates: Dataset[Stargate] = read("stargates").as[Stargate]

  /** The jumps edge table is stored as independently-versioned partitions
    * keyed by edge `kind`: gate re-derivation and wormhole snapshot-replace
    * each rewrite ONLY their own partition. That is the mutation-cost story
    * at 100 TB — the ephemeral wormhole refresh (every few minutes) must
    * not rewrite the massive stable gate partition it shares a logical
    * table with. Readers see the union. */
  private val JumpKinds = Seq("gate", "wormhole")
  private def jumpTable(kind: String) = s"jumps_$kind"

  def jumps: Dataset[Jump] =
    JumpKinds.map(k => read(jumpTable(k))).reduce(_ unionByName _).as[Jump]

  /** Combined version of the jump partitions: strictly increases whenever
    * either partition is rewritten (projection-staleness detection). */
  def jumpsVersion: Long =
    version(jumpTable("gate")).getOrElse(0L) * 1000003L +
      version(jumpTable("wormhole")).getOrElse(0L)

  def initEmpty(): Unit = {
    if (!exists("systems")) write("systems", spark.emptyDataset[System].toDF())
    if (!exists("stargates")) write("stargates", spark.emptyDataset[Stargate].toDF())
    JumpKinds.foreach { k =>
      if (!exists(jumpTable(k))) write(jumpTable(k), spark.emptyDataset[Jump].toDF())
    }
  }

  // ---- node sinks (S9/S10) ----

  def appendSystems(rows: Dataset[System]): Unit =
    write("systems", systems.toDF().unionByName(rows.toDF()))

  def appendStargates(rows: Dataset[Stargate]): Unit =
    write("stargates", stargates.toDF().unionByName(rows.toDF()))

  // ---- dedup repair (A3, `database.rs:546-578`) ----

  /** Keep one arbitrary-but-deterministic survivor per key; edges are
    * deduped on (src,dst) afterwards — the relational equivalent of the
    * reference's per-instance DETACH (SURVEY.md §7.4 "Dedup + DETACH"). */
  def dedupSystems(): Unit = {
    val w = Window.partitionBy($"system_id").orderBy($"name", $"constellation_id")
    write("systems", systems.toDF()
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn"))
    dedupJumps()
  }

  def dedupStargates(): Unit = {
    val w = Window.partitionBy($"stargate_id").orderBy($"name")
    write("stargates", stargates.toDF()
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn"))
  }

  /** Repair pass — dedups on (src,dst) ACROSS kinds (same survivor choice
    * as before the partition split), so it rewrites every partition; the
    * hot mutation paths below stay partition-local. */
  def dedupJumps(): Unit = {
    val w = Window.partitionBy($"src_system_id", $"dst_system_id").orderBy($"cost", $"risk")
    val deduped = jumps.toDF()
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
      .cache()
    JumpKinds.foreach(k => write(jumpTable(k), deduped.filter($"kind" === k)))
    deduped.unpersist()
  }

  // ---- deletes (J4 + G6 DETACH, `database.rs:557-607`) ----

  /** DETACH DELETE by id list: anti-join the node table *and* both edge
    * endpoints. */
  def removeSystems(ids: Dataset[Long]): Unit = {
    // id set scales with the diff, not the table: let AQE pick the strategy
    val idDf = ids.toDF("rid")
    write("systems", systems.toDF().join(idDf, $"system_id" === $"rid", "left_anti"))
    JumpKinds.foreach { k =>
      write(jumpTable(k), read(jumpTable(k))
        .join(idDf, $"src_system_id" === $"rid", "left_anti")
        .join(idDf, $"dst_system_id" === $"rid", "left_anti"))
    }
  }

  def removeStargates(ids: Dataset[Long]): Unit =
    write("stargates", stargates.toDF()
      .join(ids.toDF("rid"), $"stargate_id" === $"rid", "left_anti"))

  /** G7 — drop every edge touching the named system, both directions
    * (undirected match, `database.rs:458-466`; wormhole expiry). Each kind
    * partition is probed read-only first and rewritten only when it
    * actually references the system — the Thera/Turnur expiry touches just
    * the wormhole partition, never the gate one. */
  def dropConnectionsOf(systemName: String): Unit = {
    val ids = systems.filter($"name" === systemName).select($"system_id".as("rid"))
    JumpKinds.foreach { k =>
      val part = read(jumpTable(k))
      val touches = $"src_system_id" === $"rid" || $"dst_system_id" === $"rid"
      if (!part.join(broadcast(ids), touches, "left_semi").isEmpty)
        write(jumpTable(k), part.join(broadcast(ids), touches, "left_anti"))
    }
  }

  // ---- edge derivation (S11/J3, `database.rs:367-385`) ----

  /** Derive JUMP edges from stargate rows, validating that *both* endpoints
    * exist (the reference's double MATCH), then dedup on (src,dst) — which
    * also gives the idempotence its `jump_exists` probe provided. */
  def deriveJumps(): Unit = {
    val sys = systems.select($"system_id").distinct()
    val candidates = stargates.select(
      $"system_id".as("src_system_id"),
      $"destination_system_id".as("dst_system_id"))
    val validated = candidates
      .join(sys.toDF("sid"), $"src_system_id" === $"sid", "left_semi")
      .join(sys.toDF("did"), $"dst_system_id" === $"did", "left_semi")
      .select($"src_system_id", $"dst_system_id",
        lit(1.0).as("cost"), lit(0.0).as("risk"), lit("gate").as("kind"))
    // preserve risk already set on surviving gate edges
    val existing = read(jumpTable("gate"))
      .select($"src_system_id", $"dst_system_id", $"risk".as("old_risk"))
    val gates = validated.join(existing, Seq("src_system_id", "dst_system_id"), "left")
      .select($"src_system_id", $"dst_system_id", $"cost",
        coalesce($"old_risk", lit(0.0)).as("risk"), $"kind")
      .dropDuplicates("src_system_id", "dst_system_id")
    // wormhole edges have their own lifecycle (refreshWormholes) and their
    // own partition: gate re-derivation doesn't even read it
    write(jumpTable("gate"), gates)
  }

  /** S12 — wormhole edges are inserted in both directions, *without* an
    * existence check (reference contract: idempotence comes from the
    * drop-Thera/Turnur-first refresh protocol, `sync.rs:66-94`). */
  def addWormholes(pairs: Dataset[(Long, Long)]): Unit = {
    val p = pairs.toDF("in_id", "out_id")
    val both = p.select($"in_id".as("src_system_id"), $"out_id".as("dst_system_id"))
      .union(p.select($"out_id", $"in_id"))
      .withColumn("cost", lit(1.0)).withColumn("risk", lit(0.0))
      .withColumn("kind", lit("wormhole"))
    // partition-local: the (huge, stable) gate partition is untouched
    write(jumpTable("wormhole"), read(jumpTable("wormhole")).unionByName(both))
  }

  // ---- snapshot upsert (J7, `database.rs:256-292`) ----

  /** Bulk form of the reference's per-system SET fan-out: one join per
    * snapshot, unmatched systems keep their previous value. */
  def updateKillsJumps(kills: Dataset[SystemKills], jumps_ : Dataset[SystemJumps]): Unit = {
    val k = kills.toDF("k_id", "ship_kills")
    val j = jumps_.toDF("j_id", "ship_jumps")
    write("systems", systems.toDF()
      .join(k, $"system_id" === $"k_id", "left")
      .join(j, $"system_id" === $"j_id", "left")
      .withColumn("kills", coalesce($"ship_kills", $"kills"))
      .withColumn("jumps", coalesce($"ship_jumps", $"jumps"))
      .drop("k_id", "ship_kills", "j_id", "ship_jumps"))
  }

  // ---- risk update (J5 + E1/E2, `database.rs:294-332`, `sync.rs:296-321`) ----

  /** Per-system E1 risk over the current systems snapshot with the E2
    * baseline — (system_id, risk). The single source of truth for risk:
    * both the edge-table refresh and the incremental projection rebuild
    * derive from it (never from previously-written edge rows, which could
    * carry stale or not-yet-refreshed values). */
  def riskBySystem(): DataFrame = {
    val sys = systems.toDF()
    val totals = sys.agg(
      sum($"kills".cast("long")).as("tk"),
      sum($"jumps".cast("long")).as("tj"))
    val baseline = when($"tj" > 0L, $"tk".cast("double") / $"tj".cast("double"))
      .otherwise(lit(0.01))
    sys.crossJoin(broadcast(totals))
      .select($"system_id",
        graft.risk.Risk.totalRisk($"kills", $"jumps", baseline).as("risk"))
  }

  /** One edge-table join replaces the reference's ~8.5k per-system
    * statements: every edge's risk becomes its *destination* system's
    * kills²/jumps + baseline (baseline = Σkills/Σjumps, fallback 0.01). */
  def refreshJumpRisks(): Unit = {
    val rbs = riskBySystem()
      .select($"system_id".as("risk_id"), $"risk".as("new_risk"))
    // risk applies to every edge kind; each partition joins independently
    JumpKinds.foreach { k =>
      write(jumpTable(k), read(jumpTable(k))
        .join(rbs, $"dst_system_id" === $"risk_id", "left")
        .withColumn("risk", coalesce($"new_risk", $"risk"))
        .drop("risk_id", "new_risk"))
    }
  }
}
