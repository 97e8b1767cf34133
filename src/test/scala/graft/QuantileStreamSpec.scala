package graft

import graft.functions.HashFamily
import graft.streaming.QuantileStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming quantile monitor ≡ batch q76: the bottom-k sample state is a
  * mergeable idempotent semilattice, so stream-folded estimates must be
  * BYTE-identical to the batch sketch under any split, any arrival order,
  * and any replay. */
class QuantileStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows: DataFrame = {
    import spark.implicits._
    Tables.t(spark, dir, "lineitem").select(
      $"l_returnflag".as("grp"),
      $"l_quantity".as("value"),
      concat($"l_orderkey".cast("string"), lit("-"),
        $"l_linenumber".cast("string")).as("row_key"))
  }

  private lazy val batchMode: Map[String, (Double, Double, Long)] =
    SparkEntry.queries("q76_quantile_sketch")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap

  private def streamed(stateDir: String): Map[String, (Double, Double, Long)] =
    QuantileStream.estimates(spark, stateDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap

  test("stream-folded estimates ≡ batch q76 under two splits incl. reverse arrival") {
    import spark.implicits._
    val d = rows.cache()
    for (splits <- Seq(
        Seq(d.filter($"row_key".endsWith("1")), d.filter(!$"row_key".endsWith("1"))),
        Seq(d.filter($"value" >= 25.0), d.filter(lit(false)), d.filter($"value" < 25.0)))) {
      val state = java.nio.file.Files.createTempDirectory("qstream").toString + "/state"
      splits.foreach(b => QuantileStream.processBatch(spark, b, state, HashFamily.Oracle))
      assert(streamed(state) === batchMode)
    }
  }

  test("replaying a batch is a no-op: estimates and state unchanged") {
    import spark.implicits._
    val d = rows.cache()
    val state = java.nio.file.Files.createTempDirectory("qstream2").toString + "/state"
    val b0 = d.filter($"value" < 20.0)
    val b1 = d.filter($"value" >= 20.0)
    QuantileStream.processBatch(spark, b0, state, HashFamily.Oracle)
    QuantileStream.processBatch(spark, b1, state, HashFamily.Oracle)
    val before = streamed(state)
    QuantileStream.processBatch(spark, b1, state, HashFamily.Oracle) // redelivery
    assert(streamed(state) === before)
    assert(before === batchMode)
  }

  test("file-source wiring folds arriving files into the state") {
    val src = java.nio.file.Files.createTempDirectory("qstreamsrc").toString
    val state = java.nio.file.Files.createTempDirectory("qstream3").toString + "/state"
    rows.write.mode("append").parquet(src)
    val q = QuantileStream.start(spark, src, state, HashFamily.Oracle)
    q.awaitTermination()
    assert(streamed(state) === batchMode)
  }
}
