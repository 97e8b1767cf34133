package graft

import graft.streaming.KllStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming KLL monitor: a COMPACTING sketch, so the contract is the
  * construction's own — O(1/k) rank error of every estimate and EXACT
  * counts under any batch split (no byte-identity to a batch rebuild;
  * that is q76/QuantileStream's lane) — plus replay idempotence via the
  * batch-id high-water mark (a compacting sketch double-counts replayed
  * rows otherwise). */
class KllStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows: DataFrame = {
    import spark.implicits._
    Tables.t(spark, dir, "lineitem").select(
      $"l_returnflag".as("grp"), $"l_quantity".as("value"))
  }

  /** rank of `v` within group as a fraction. */
  private def rankOf(flag: String, v: Double): Double = {
    import spark.implicits._
    val grp = rows.filter($"grp" === flag).cache()
    val r = grp.filter($"value" <= v).count().toDouble / grp.count().toDouble
    grp.unpersist()
    r
  }

  private lazy val exactCounts: Map[String, Long] = {
    import spark.implicits._
    rows.groupBy($"grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def assertBounds(stateDir: String): Unit = {
    val est = KllStream.estimates(spark, stateDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(est.keySet === exactCounts.keySet)
    est.foreach { case (flag, (med, p90, n)) =>
      assert(n === exactCounts(flag), s"$flag count must be exact")
      for ((q, v) <- Seq(0.5 -> med, 0.9 -> p90)) {
        val err = math.abs(rankOf(flag, v) - q)
        // the ONE documented bound (KllStream.RankEps): ε ≈ c/k plus the
        // tied-value jump — also what the q97 tolerance row serves
        assert(err <= KllStream.RankEps, s"$flag q=$q est=$v err=$err")
      }
    }
  }

  test("rank error within bound and counts exact, under two different batch splits") {
    import spark.implicits._
    val d = rows.cache()
    for (splits <- Seq(
        Seq(d.filter($"value" < 20.0), d.filter($"value" >= 20.0)),
        Seq(d.filter($"value" >= 35.0), d.filter(lit(false)),
          d.filter($"value" < 35.0)))) {
      val state = java.nio.file.Files.createTempDirectory("kllstream").toString + "/state"
      splits.zipWithIndex.foreach { case (b, id) =>
        KllStream.processBatch(spark, b, id.toLong, state)
      }
      assertBounds(state)
    }
  }

  test("replay of an applied batch id folds nothing; a new id folds") {
    import spark.implicits._
    val d = rows.cache()
    val state = java.nio.file.Files.createTempDirectory("kllstream2").toString + "/state"
    val b = d.filter($"value" < 25.0)
    KllStream.processBatch(spark, b, 0L, state)
    val before = KllStream.estimates(spark, state).collect().map(_.toString).toSeq
    KllStream.processBatch(spark, b, 0L, state) // redelivery
    KllStream.processBatch(spark, b, -3L, state) // stale id
    assert(KllStream.estimates(spark, state).collect().map(_.toString).toSeq === before,
      "replayed ids must fold nothing into a compacting sketch")
    KllStream.processBatch(spark, d.filter($"value" >= 25.0), 1L, state)
    assertBounds(state) // full corpus folded exactly once
  }

  test("file-source wiring folds arriving files into the state") {
    val src = java.nio.file.Files.createTempDirectory("kllsrc").toString
    val state = java.nio.file.Files.createTempDirectory("kllstream3").toString + "/state"
    rows.write.mode("append").parquet(src)
    val q = KllStream.start(spark, src, state)
    q.awaitTermination()
    assertBounds(state)
  }
}
