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
    // q85: hop frames were unpersisted; the rebuilt chain must agree
    val q85After = SparkEntry.queries("q85_scale_walk_centrality")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(q85After === q85Before, "post-eviction q85 rebuild diverged")
  }
}
