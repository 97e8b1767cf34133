package graft

import graft.streaming.CcStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The maintained component-label store must equal the batch q80 result
  * over the union edge set under ANY batch split — including splits that
  * force CROSS-BATCH COMPONENT MERGES (one new edge joining two
  * components built in earlier batches), the case that makes labels
  * non-foldable and targeted recompute necessary. Replay must converge;
  * compaction must preserve the snapshot and keep ingest working. */
class CcStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def pairs: DataFrame = {
    import spark.implicits._
    Tables.t(spark, dir, "lineitem")
      .filter($"l_quantity" === 50)
      .select(($"l_partkey".cast("long") * 2).as("src"),
        ($"l_suppkey".cast("long") * 2 + 1).as("dst"))
      .distinct()
  }

  private def batchWant: Map[Long, Long] =
    SparkEntry.queries("q80_graph_scale_cc")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def snapshotOf(storeDir: String): Map[Long, Long] =
    CcStream.snapshot(spark, storeDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def ingest(slices: Seq[DataFrame]): String = {
    val store = java.nio.file.Files.createTempDirectory("ccstream").toString + "/store"
    slices.zipWithIndex.foreach { case (sl, i) =>
      CcStream.processBatch(sl, i.toLong, store)
    }
    store
  }

  test("streamed labels ≡ batch q80 under merge-forcing splits") {
    import spark.implicits._
    val e = pairs.cache()
    val want = batchWant
    // by supplier: a part with suppliers in different batches is a
    // provisional singleton-side component until the merge batch lands
    val bySupplier = ingest(Seq(
      e.filter(expr("(dst div 2) % 3 = 0")),
      e.filter(expr("(dst div 2) % 3 = 1")),
      e.filter(expr("(dst div 2) % 3 = 2"))))
    assert(snapshotOf(bySupplier) === want, "supplier-split stream diverged from batch q80")
    // by part, reversed order — different merge cascade
    val byPartRev = ingest(Seq(
      e.filter(expr("(src div 2) % 2 = 1")),
      e.filter(expr("(src div 2) % 2 = 0"))))
    assert(snapshotOf(byPartRev) === want, "part-split stream diverged from batch q80")
    // non-vacuity: the supplier split must actually merge across batches —
    // some part must have suppliers in at least two slices
    val parts01 = e.filter(expr("(dst div 2) % 3 = 0")).select($"src").distinct()
      .join(e.filter(expr("(dst div 2) % 3 = 1")).select($"src").distinct(), "src").count()
    assert(parts01 > 0, "no part spans slices 0 and 1 — merge path exercised nothing")
  }

  test("file-source wiring + compaction + post-compaction ingest") {
    import spark.implicits._
    val e = pairs.cache()
    val want = batchWant
    val root = java.nio.file.Files.createTempDirectory("ccwire").toString
    val (inDir, store) = (s"$root/in", s"$root/store")
    new java.io.File(inDir).mkdirs()
    Seq(expr("(dst div 2) % 2 = 0"), expr("(dst div 2) % 2 = 1")).zipWithIndex
      .foreach { case (cond, i) =>
        val tmp = s"$root/slice_$i"
        e.filter(cond).coalesce(1).write.parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$inDir/edges_$i.parquet"))
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      }
    CcStream.start(spark, inDir, store).awaitTermination()
    assert(snapshotOf(store) === want, "streamed store diverged from batch q80")
    CcStream.compact(spark, store, throughBatch = 1L)
    assert(snapshotOf(store) === want, "compaction changed the snapshot")
    def dirs(sub: String) = new java.io.File(s"$store/$sub").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(dirs("edges") === Set("batch=-1"), s"edges dirs: ${dirs("edges")}")
    assert(dirs("labels") === Set("batch=-1"), s"labels dirs: ${dirs("labels")}")
    // post-compaction redelivery: only its own non-negative partition is
    // touched; the recompute reads compacted history and converges
    CcStream.processBatch(e.filter(expr("(dst div 2) % 2 = 0")), 0L, store)
    assert(snapshotOf(store) === want, "post-compaction redelivery broke the snapshot")
  }

  test("batch replay is idempotent") {
    import spark.implicits._
    val e = pairs.cache()
    val store = ingest(Seq(
      e.filter(expr("(dst div 2) % 2 = 0")),
      e.filter(expr("(dst div 2) % 2 = 1"))))
    val before = snapshotOf(store)
    assert(before === batchWant, "two-batch snapshot diverged from batch q80")
    CcStream.processBatch(e.filter(expr("(dst div 2) % 2 = 0")), 0L, store)
    assert(snapshotOf(store) === before, "replay changed the label store")
  }
}
