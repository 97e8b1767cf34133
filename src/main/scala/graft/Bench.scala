package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs the headline query subset (GQuery.bench) against
  * SPARK_GRAFT_SF_DIR and prints one JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Session mirrors a production cluster profile scaled to one node:
  * 32 threads, shuffle partitions = cores (not 200), AQE on. A warmup
  * action runs first so JVM/codegen startup is not attributed to the first
  * query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JVM + codegen + parquet footer caches (best-effort)
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }

    val benched = SparkEntry.registry.filter(_.bench)
    // min-of-N with N defaulting to 5 (was 3): the round-5 artifact showed
    // byte-identical binaries moving ±31% per query under min-of-3 — the
    // per-query MEDIAN and SPREAD of the warm runs are emitted alongside so
    // a reader can tell a real regression from that noise floor
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt.max(1)
    final case class R(name: String, best: Double, cold: Double,
      median: Double, spread: Double)
    val results = benched.map { q =>
      val name = q.name
      // production configuration where one exists (e.g. xxhash64 dedup
      // hashing instead of the oracle-only md5 family)
      val fn = q.benchRun.getOrElse(q.run)
      // drop this session's materialized prepare-stage stores so run 1 is
      // a true COLD run — it pays the query's own tokenize/shingle/index
      // build, the cost a pipeline's first pass over a fresh corpus pays
      graft.store.Materialized.invalidate(spark)
      // min over repeated runs: filters ambient machine noise, reports the
      // plan's actual cost; a failed query is marked -1, never a fast time
      val timings = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
        (ok, (System.nanoTime() - t0) / 1e9)
      }
      val ok = timings.forall(_._1)
      if (!ok) R(name, -1.0, -1.0, -1.0, -1.0)
      else {
        // headline stays min-of-N (steady-state plan cost); cold rides
        // along so the amortized prepare stage never disappears from the
        // artifact; median/spread are over the WARM runs (cold excluded —
        // it measures the prepare stage, not run-to-run noise)
        val times = timings.map(_._2)
        val warm = if (times.length > 1) times.tail else times
        val sorted = warm.sorted
        val median = sorted((sorted.length - 1) / 2)
        R(name, times.min, times.head, median, sorted.last - sorted.head)
      }
    }
    def jmap(f: R => Double) =
      results.map(r => s"\"" + r.name + "\":" + f(r)).mkString("{", ",", "}")
    // any failed query poisons the headline total (-1): a regression must
    // never read as a speedup by dropping its own time out of the sum
    val failed = results.count(_.best < 0.0)
    val total = if (failed > 0) -1.0 else results.map(_.best).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(_.best)},""" +
      s""""median":${jmap(_.median)},"spread":${jmap(_.spread)},"cold":${jmap(_.cold)},""" +
      s""""runs":$runs,"failed":$failed,"sf":"$sfDir"}"""
    // self-announcing headline on its own short line, BOTH before and after
    // the big JSON: the driver's stdout capture has truncated the JSON two
    // rounds running, and whichever end the capture keeps must still carry
    // the verdict-relevant numbers
    val headline = f"[bench] total=$total%.3fs failed=$failed queries=${results.length}"
    println(headline)
    println(json)
    println(headline)
    // the stdout line has been truncated by output capture before (r6's
    // artifact lost its warm map to a tail cut) — persist the full JSON to a
    // file as well so the per-query maps always survive the run
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
      System.err.println(s"[bench] wrote $outPath")
    } catch {
      case e: Throwable => System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
