package graft

import graft.store.{Bucketing, Materialized}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Staged materialized stores: a fresh session over the same immutable
  * corpus snapshot must RE-ATTACH to the existing store files (zero
  * rebuild — the whole point: a second pipeline session does not re-pay
  * the prepare stage), invalidate must still force a rebuild, and a
  * re-attached BUCKETED store must keep the co-location property its
  * build paid for. */
class MaterializedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def stagedSession(root: String): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.graft.stagingDir", root)
    s
  }

  test("staged relation: fresh session re-attaches (zero rebuild); invalidate forces rebuild") {
    val root = java.nio.file.Files.createTempDirectory("graft-staging").toString
    val key = "spec:mat:" + java.util.UUID.randomUUID()
    var builds = 0
    def build(s: SparkSession) = {
      import s.implicits._
      builds += 1
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    }

    val s1 = stagedSession(root)
    val r1 = Materialized.relation(s1, key)(build(s1)).collect().map(_.toString).sorted
    assert(builds === 1)

    val s2 = stagedSession(root) // fresh session, same staging root + key
    val r2 = Materialized.relation(s2, key)(build(s2)).collect().map(_.toString).sorted
    assert(builds === 1, "fresh session must re-attach to the staged store, not rebuild")
    assert(r2 === r1)

    Materialized.invalidate(s2)
    Materialized.relation(s2, key)(build(s2)).collect()
    assert(builds === 2, "invalidate must delete the staged store and force a rebuild")
  }

  test("staged bucketed relation: catalog re-registration over existing files, join still exchange-free") {
    val root = java.nio.file.Files.createTempDirectory("graft-staging-bkt").toString
    val key = "spec:matbkt:" + java.util.UUID.randomUUID()
    var builds = 0
    def build(s: SparkSession) = {
      import s.implicits._
      builds += 1
      (0L until 64L).map(i => (i % 8, i)).toDF("h1", "v")
    }

    val s1 = stagedSession(root)
    val t1 = Materialized.bucketedRelation(s1, key, Seq("h1"), 4)(build(s1))
    val rows1 = t1.collect().map(_.toString).sorted
    assert(builds === 1)

    // force the sort-merge path on both sessions (a broadcast exchange
    // would mask the bucketing question this test asks)
    def noBroadcast(s: SparkSession): Unit = {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", -1)
    }
    noBroadcast(s1)
    val j1 = t1.as("x").join(t1.as("y"), col("x.h1") === col("y.h1"))
    assert(Bucketing.isShuffleFree(j1), "baseline: built store must be co-located")

    // simulate a fresh JVM: drop the catalog entry (sessions share the
    // in-memory external catalog), keep the staged files
    val name = Materialized.bucketedTableName(key)
    spark.sql(s"DROP TABLE IF EXISTS $name")

    val s2 = stagedSession(root)
    noBroadcast(s2)
    val t2 = Materialized.bucketedRelation(s2, key, Seq("h1"), 4)(build(s2))
    assert(builds === 1, "re-attach must not re-run the build")
    assert(t2.collect().map(_.toString).sorted === rows1)
    // the re-registered table still carries the bucket spec: the self-join
    // on the bucket key runs with zero exchange, as at build time
    val j = t2.as("x").join(t2.as("y"), col("x.h1") === col("y.h1"))
    assert(Bucketing.isShuffleFree(j),
      "re-attached bucketed store lost the co-location property")

    Materialized.invalidate(s2)
    Materialized.bucketedRelation(s2, key, Seq("h1"), 4)(build(s2)).count()
    assert(builds === 2, "invalidate must force a bucketed rebuild")
  }

  test("q90 ranks persist to the staged store; a second session re-attaches") {
    // VERDICT r8 directive 4: the ~15–26 s fixed-point PageRank build must
    // amortize across sessions — second-session cold ≈ warm. Behavioral
    // pin: the staged store directory is untouched (same name + mtime) by
    // the second session's serve, and the served rows are identical.
    val root = java.nio.file.Files.createTempDirectory("graft-staging-q90").toString
    val dir = "/root/testdata/sf0.001"
    val s1 = stagedSession(root)
    val r1 = SparkEntry.queries("q90_scale_pagerank_fp")(s1, dir)
      .collect().map(_.toString).toSeq
    def listing = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("mat_"))
      .map(f => f.getName -> f.lastModified()).toMap
    val before = listing
    assert(before.nonEmpty, "q90 must stage its rank store")
    val s2 = stagedSession(root) // fresh session, same staging root
    val r2 = SparkEntry.queries("q90_scale_pagerank_fp")(s2, dir)
      .collect().map(_.toString).toSeq
    assert(r2 === r1, "re-attached ranks diverged from the built ranks")
    assert(listing === before, "second session must re-attach, not rebuild")
  }

  test("staging governor: least-recently-attached store evicted beyond budget; survivor re-attaches; evictee rebuilds") {
    import graft.store.CorpusCaches
    val root = java.nio.file.Files.createTempDirectory("graft-staging-gov").toString
    def corpus(i: Int) = s"/graft-gov-corpus-$i" // a "/"-segment makes the key corpus-keyed
    def key(i: Int) = s"gov:${corpus(i)}"
    val builds = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    def build(s: SparkSession, i: Int) = {
      import s.implicits._
      builds(i) += 1
      Seq((i.toLong, s"v$i")).toDF("id", "v")
    }
    def stagedDirs = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("mat_")).map(_.getName).toSet

    val s1 = stagedSession(root)
    s1.conf.set("spark.graft.stagingMaxStores", "2")
    // the production grace window exists to protect mid-attach stores
    // from concurrent eviction; zero it so this single-threaded spec can
    // observe eviction at all
    s1.conf.set("spark.graft.stagingGraceMs", "0")
    Materialized.relation(s1, key(1))(build(s1, 1)).collect()
    CorpusCaches.release(s1, corpus(1)) // un-hold: the store becomes governable
    Materialized.relation(s1, key(2))(build(s1, 2)).collect()
    CorpusCaches.release(s1, corpus(2))
    assert(stagedDirs.size === 2)
    val dirsBeforeThird = stagedDirs
    // third build exceeds the budget: the LEAST RECENTLY ATTACHED
    // unheld store (key 1) must be evicted; key 2 and the fresh key 3 stay
    Materialized.relation(s1, key(3))(build(s1, 3)).collect()
    assert(stagedDirs.size === 2, "governor must hold the root at the store budget")
    assert(stagedDirs.intersect(dirsBeforeThird).size === 1,
      "exactly one prior store (the LRU one) must be evicted")
    // the surviving within-budget store re-attaches with zero rebuild
    val s2 = stagedSession(root)
    s2.conf.set("spark.graft.stagingMaxStores", "2")
    s2.conf.set("spark.graft.stagingGraceMs", "0")
    val r2 = Materialized.relation(s2, key(2))(build(s2, 2)).collect().map(_.toString).toSeq
    assert(builds(2) === 1, "within-budget store must re-attach, not rebuild")
    assert(r2 === Seq("[2,v2]"))
    // the evicted store rebuilds cleanly on next use
    val r1 = Materialized.relation(s2, key(1))(build(s2, 1)).collect().map(_.toString).toSeq
    assert(builds(1) === 2, "evicted store must rebuild on next use")
    assert(r1 === Seq("[1,v1]"))
  }

  test("torn staged build (no _SUCCESS) is rebuilt, not attached") {
    val root = java.nio.file.Files.createTempDirectory("graft-staging-torn").toString
    val key = "spec:mattorn:" + java.util.UUID.randomUUID()
    var builds = 0
    def build(s: SparkSession) = {
      import s.implicits._
      builds += 1
      Seq((1L, "x")).toDF("id", "v")
    }
    val s1 = stagedSession(root)
    Materialized.relation(s1, key)(build(s1)).collect()
    assert(builds === 1)
    // tear the store: remove the success marker, as a crashed writer would
    val stored = new java.io.File(root).listFiles().filter(_.getName.startsWith("mat_")).head
    assert(new java.io.File(stored, "_SUCCESS").delete())
    val s2 = stagedSession(root)
    Materialized.relation(s2, key)(build(s2)).collect()
    assert(builds === 2, "an incomplete staged store must be rebuilt")
  }
}
