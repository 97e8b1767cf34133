package graft.operators

import graft.GQuery
import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q72 — the end-to-end corpus-curation manifest: the single artifact a
  * training run consumes, produced by composing the pipeline's stages in
  * their canonical order. Every document receives exactly one verdict:
  *
  *   1. `eval_holdout`          — the held-out split (never trained on)
  *   2. `dropped_exact_dup`     — exact-content non-survivor (q23 keeper rule)
  *   3. `dropped_near_dup`      — near-dup cluster non-survivor (q63 rule)
  *   4. `dropped_contaminated`  — shares an 8-gram with the eval split (q60)
  *   5. `dropped_short`         — fewer than [[MinWords]] words
  *   6. `kept`                  — packed; carries its q70-style bin id
  *
  * The point of registering the composition itself (not just the stages) is
  * that verdict PRECEDENCE and survivor rules interact — e.g. an exact-dup
  * keeper can still lose as a near-dup cluster member, and contamination is
  * only checked for docs that survived dedup — and the oracle pins the
  * whole cascade, not each stage in isolation. Each stage keeps its native
  * scale shape: hash group-by, verified-pair CC, inverted-index overlap,
  * per-row predicates, the distributed packing prefix sum; the cascade
  * adds only left joins against the (small) dropped/kept id sets.
  */
object Curate {

  val MinWords = 20L

  private def q72(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents").select($"doc_id", $"source",
      size(split(lower(trim($"text")), "\\s+")).cast("long").as("toks"),
      md5($"text").as("h"))
    val keepers = docs.groupBy($"h").agg(min($"doc_id").as("keeper"))
    val nearDrop = Dedup.dedupClusters(s, dir)
      .filter(!$"keep").select($"doc_id", lit(true).as("near_dup"))
    val contaminated = TextOps.decontaminationReport(s, dir)
      .select($"doc_id", lit(true).as("contam"))
    val statused = docs
      .join(keepers, "h")
      .join(nearDrop, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .withColumn("status",
        when($"doc_id" % TextOps.EvalMod === 0L, "eval_holdout")
          .when($"doc_id" =!= $"keeper", "dropped_exact_dup")
          .when($"near_dup", "dropped_near_dup")
          .when($"contam", "dropped_contaminated")
          .when($"toks" < MinWords, "dropped_short")
          .otherwise("kept"))
    // packing offsets via the two-pass distributed prefix sum — a
    // per-source window here would funnel each corpus source's survivors
    // through one task (see PrefixSum.cumEndBySource)
    val kept = PrefixSum.cumEndBySource(
        statused.filter($"status" === "kept")
          .select($"source", $"doc_id", $"toks"))
      .withColumn("bin", expr(s"(cum_end - toks) div ${TextOps.PackBinTokens}"))
      .select($"doc_id", $"bin")
    statused.join(kept, Seq("doc_id"), "left")
      .select($"doc_id", $"source", $"status", coalesce($"bin", lit(-1L)).as("bin"))
      .orderBy($"doc_id")
  }

  private def q72Sql =
    s"""WITH d AS (SELECT doc_id, source, md5(text) AS h,
       |    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS toks
       |  FROM documents),
       |k AS (SELECT h, MIN(doc_id) AS keeper FROM d GROUP BY h),
       |nd AS (SELECT doc_id FROM (${Dedup.q63SqlShared}) c WHERE NOT c.keep),
       |ct AS (SELECT doc_id FROM (${TextOps.q60SqlShared}) x),
       |st AS (SELECT d.doc_id, d.source, d.toks,
       |    CASE WHEN d.doc_id % ${TextOps.EvalMod} = 0 THEN 'eval_holdout'
       |         WHEN d.doc_id <> k.keeper THEN 'dropped_exact_dup'
       |         WHEN d.doc_id IN (SELECT doc_id FROM nd) THEN 'dropped_near_dup'
       |         WHEN d.doc_id IN (SELECT doc_id FROM ct) THEN 'dropped_contaminated'
       |         WHEN d.toks < $MinWords THEN 'dropped_short'
       |         ELSE 'kept' END AS status
       |  FROM d JOIN k USING (h)),
       |kept AS (SELECT doc_id,
       |    (SUM(toks) OVER (PARTITION BY source ORDER BY doc_id
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks)
       |      // ${TextOps.PackBinTokens} AS bin
       |  FROM st WHERE status = 'kept')
       |SELECT st.doc_id, st.source, st.status,
       |  CAST(COALESCE(kept.bin, -1) AS BIGINT) AS bin
       |FROM st LEFT JOIN kept USING (doc_id) ORDER BY st.doc_id""".stripMargin

  val all: Seq[GQuery] = Seq(
    GQuery("q72_curation_manifest", q72, Some(q72Sql)),
  )
}
