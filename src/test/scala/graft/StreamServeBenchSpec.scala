package graft

import graft.streaming.StreamServe
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The benchRun contract for the q110/q112 serve rows: the bench path
  * reuses a once-per-session store, so its WARM serve must return exactly
  * what a fresh build-and-serve returns — otherwise the bench would time
  * a different (possibly stale) query than the correctness gate proves. */
class StreamServeBenchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q110 bench serve: cached-store warm call equals the fresh build") {
    StreamServe.invalidateBenchStores()
    val first = rows(StreamServe.q110Serve(spark, dir))
    val warm = rows(StreamServe.q110Serve(spark, dir))
    assert(first.nonEmpty, "serve returned nothing — vacuous")
    assert(warm === first, "cached-store serve diverged from fresh build")
  }

  test("q112 bench serve: cached-store warm call equals the fresh build") {
    StreamServe.invalidateBenchStores()
    val first = rows(StreamServe.q112Serve(spark, dir))
    val warm = rows(StreamServe.q112Serve(spark, dir))
    assert(first.nonEmpty, "serve returned nothing — vacuous")
    assert(warm === first, "cached-store serve diverged from fresh build")
  }

  test("q132 bench serve: cached-store warm call equals the fresh build") {
    StreamServe.invalidateBenchStores()
    val first = rows(StreamServe.q132Serve(spark, dir))
    val warm = rows(StreamServe.q132Serve(spark, dir))
    assert(first.nonEmpty, "serve returned nothing — vacuous")
    assert(warm === first, "cached-store serve diverged from fresh build")
  }
}
