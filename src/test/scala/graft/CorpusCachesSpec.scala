package graft

import graft.store.CorpusCaches
import org.scalatest.funsuite.AnyFunSuite

/** The corpus-cache governor's contract: per-corpus artifacts are held up
  * to `capacity` corpora in LRU order; eviction runs every registered
  * releaser exactly once; an evicted corpus's next query pays a clean
  * rebuild and returns the identical result (the warm path must never
  * trade correctness for the bound). */
class CorpusCachesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def withCapacity[A](n: Int)(body: => A): A = {
    val prev = sys.props.get("graft.cache.corpora")
    sys.props("graft.cache.corpora") = n.toString
    try body
    finally prev match {
      case Some(v) => sys.props("graft.cache.corpora") = v
      case None => sys.props -= "graft.cache.corpora"
    }
  }

  test("LRU eviction: oldest corpus released at capacity, recency refreshed by touch") {
    withCapacity(2) {
      var released = List.empty[String]
      def reg(d: String): Unit =
        CorpusCaches.retain(spark, d, "spec")(() => released ::= d)
      // isolate from artifacts other suites may have registered
      Seq("/spec/a", "/spec/b", "/spec/c").foreach(d => CorpusCaches.release(spark, d))
      CorpusCaches.held(spark).foreach(d => CorpusCaches.release(spark, d))
      reg("/spec/a")
      reg("/spec/b")
      CorpusCaches.touch(spark, "/spec/a") // a is now fresher than b
      reg("/spec/c") // over capacity: LRU (= b) must go
      assert(released === List("/spec/b"), s"expected b evicted, got $released")
      assert(CorpusCaches.held(spark).toSet === Set("/spec/a", "/spec/c"))
      // re-registration replaces the releaser: releasing a runs ONE closure
      CorpusCaches.retain(spark, "/spec/a", "spec")(() => released ::= "/spec/a2")
      CorpusCaches.release(spark, "/spec/a")
      assert(released === List("/spec/a2", "/spec/b"),
        "replaced releaser must run once, the original not at all")
      CorpusCaches.release(spark, "/spec/c")
    }
  }

  test("stopped session's corpora are swept on the next retain, live session's kept") {
    withCapacity(4) {
      val dead = spark.newSession() // distinct SparkSession object, shared context
      CorpusCaches.held(spark).foreach(d => CorpusCaches.release(spark, d))
      CorpusCaches.held(dead).foreach(d => CorpusCaches.release(dead, d))
      var released = List.empty[String]
      CorpusCaches.retain(dead, "/spec/dead1", "spec")(() => released ::= "dead1")
      CorpusCaches.retain(spark, "/spec/live1", "spec")(() => released ::= "live1")
      // mark the sibling session stopped through the spec seam (stopping it
      // for real would tear down the suite's shared SparkContext)
      val prevCheck = CorpusCaches.stoppedCheck
      try {
        CorpusCaches.stoppedCheck = s => s eq dead
        CorpusCaches.retain(spark, "/spec/live2", "spec")(() => released ::= "live2")
        assert(released === List("dead1"),
          s"dead session's releaser must run, live ones must not: $released")
        assert(CorpusCaches.held(dead).isEmpty, "dead session still holds corpora")
        assert(CorpusCaches.held(spark).toSet === Set("/spec/live1", "/spec/live2"),
          "live session's corpora must survive the sweep")
      } finally {
        CorpusCaches.stoppedCheck = prevCheck
        CorpusCaches.held(spark).foreach(d => CorpusCaches.release(spark, d))
      }
    }
  }

  test("malformed capacity property falls back to the default instead of throwing") {
    val prev = sys.props.get("graft.cache.corpora")
    sys.props("graft.cache.corpora") = "not-a-number"
    try assert(CorpusCaches.capacity === 4)
    finally prev match {
      case Some(v) => sys.props("graft.cache.corpora") = v
      case None => sys.props -= "graft.cache.corpora"
    }
  }

  test("explicit release forces a clean rebuild with identical results") {
    import graft.operators.Similarity
    val before = Similarity.trainedCentroids(spark, dir)
    val q85Before = SparkEntry.queries("q85_scale_walk_centrality")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    CorpusCaches.release(spark, dir)
    // trained centroids: the cache entry is gone, retraining reproduces
    // the exact integer centroids (training is deterministic)
    val after = Similarity.trainedCentroids(spark, dir)
    assert(after === before, "post-eviction retraining diverged")
    // q85: the Materialized walks store entry was evicted; the rebuilt
    // SpMV chain (fresh store) must agree
    val q85After = SparkEntry.queries("q85_scale_walk_centrality")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(q85After === q85Before, "post-eviction q85 rebuild diverged")
  }
}
