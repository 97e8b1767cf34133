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
    // INTERLEAVED passes (round 14): repeats of one query must not run
    // back-to-back — the r13 session proved this box's ambient noise
    // arrives in MULTI-MINUTE bursts, long enough to cover an entire
    // min-of-5 of a single query (q24 read 5.26 s as a min of five in one
    // window, 0.85 s an hour later, identical binary). So the bench runs
    // N full PASSES over the whole query list — pass 0 cold, passes
    // 1..N−1 warm — and takes per-query stats ACROSS passes: a burst now
    // poisons at most one pass of every query (visible as a uniform
    // inflation in that pass, filtered by the min), never every repeat of
    // one query. The per-query MEDIAN and SPREAD over the warm passes
    // ride along so a reader can tell a real regression from noise.
    val runsEnv = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5")
    require(scala.util.Try(runsEnv.toInt).isSuccess,
      s"SPARK_GRAFT_BENCH_RUNS must be an integer, got '$runsEnv'")
    val runs = runsEnv.toInt.max(1)
    final case class R(name: String, best: Double, cold: Double,
      median: Double, spread: Double)
    def runOnce(q: GQuery): (Boolean, Double) = {
      // production configuration where one exists (e.g. xxhash64 dedup
      // hashing instead of the oracle-only md5 family)
      val fn = q.benchRun.getOrElse(q.run)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          false
      }
      (ok, (System.nanoTime() - t0) / 1e9)
    }
    // COLD passes: before each query, drop this session's materialized
    // prepare-stage stores (and the stream-serve bench stores) so the run
    // pays the query's own tokenize/shingle/index build, the cost a
    // pipeline's first pass over a fresh corpus pays. (Per-query
    // invalidation, so each query's cold time includes rebuilding the
    // shared stores it depends on.) SPARK_GRAFT_BENCH_COLD_RUNS > 1
    // (round 15) repeats the whole cold pass with fresh invalidation and
    // reports the per-query MIN across cold passes — a single-shot cold
    // pass was the one lane a burst could still poison beyond repair
    // within one artifact (r14 runA needed runB to arbitrate its colds).
    val coldRunsEnv = sys.env.getOrElse("SPARK_GRAFT_BENCH_COLD_RUNS", "1")
    require(scala.util.Try(coldRunsEnv.toInt).isSuccess,
      s"SPARK_GRAFT_BENCH_COLD_RUNS must be an integer, got '$coldRunsEnv'")
    val coldRuns = coldRunsEnv.toInt.max(1)
    val coldPasses = (0 until coldRuns).map { c =>
      System.err.println(s"[bench] cold pass ${c + 1}/$coldRuns")
      benched.map { q =>
        graft.store.Materialized.invalidate(spark)
        streaming.StreamServe.invalidateBenchStores()
        runOnce(q)
      }
    }
    // PRIMING pass (untimed in per-query stats): the cold lane
    // invalidates ALL stores before EACH query, so when it ends only the
    // stores the LAST cold query rebuilt exist — without a rebuild here,
    // the FIRST warm pass would pay every other query's store build
    // inside a "warm" cell (the r15 artifact showed it: q110's warm
    // spread carried a 16.9 s deterministic store rebuild a reader could
    // only misread as noise). One untimed full pass restores steady
    // state, so every warm cell times the query/serve path only.
    val primeSec =
      if (runs <= 1) 0.0
      else {
        System.err.println("[bench] priming pass (untimed)")
        val t0 = System.nanoTime()
        benched.foreach(runOnce)
        (System.nanoTime() - t0) / 1e9
      }
    // warm passes: full list per pass, no invalidation
    val warmPasses = (1 until runs).map { p =>
      System.err.println(s"[bench] warm pass $p/${runs - 1}")
      benched.map(runOnce)
    }
    val results = benched.zipWithIndex.map { case (q, i) =>
      val timings = (coldPasses ++ warmPasses).map(_(i))
      if (!timings.forall(_._1)) R(q.name, -1.0, -1.0, -1.0, -1.0)
      else {
        // headline stays min over all runs (steady-state plan cost); cold
        // (min across cold passes) rides along so the amortized prepare
        // stage never disappears from the artifact; median/spread are
        // over the WARM passes (cold excluded — it measures the prepare
        // stage, not run-to-run noise)
        val times = timings.map(_._2)
        val cold = times.take(coldRuns).min
        val warm = if (warmPasses.nonEmpty) times.drop(coldRuns) else times
        val sorted = warm.sorted
        val median = sorted((sorted.length - 1) / 2)
        R(q.name, times.min, cold, median, sorted.last - sorted.head)
      }
    }
    def jmap(f: R => Double) =
      results.map(r => s"\"" + r.name + "\":" + f(r)).mkString("{", ",", "}")
    // per-pass wall totals (cold passes first): a multi-minute ambient
    // burst shows up as ONE inflated entry here, telling the reader
    // exactly which pass to discount — the per-query min already filtered
    // it. A pass containing any FAILED run emits null, not a number: a
    // failure's wall time can be a fast exception path, and a normal-
    // looking total would mislead exactly the burst-hunting reader this
    // column exists for (the headline already poisons to -1).
    val passTotals = (coldPasses ++ warmPasses)
      .map(p => if (p.exists(!_._1)) "null" else f"${p.map(_._2).sum}%.3f")
      .mkString("[", ",", "]")
    // any failed query poisons the headline total (-1): a regression must
    // never read as a speedup by dropping its own time out of the sum
    val failed = results.count(_.best < 0.0)
    val total = if (failed > 0) -1.0 else results.map(_.best).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(_.best)},""" +
      s""""median":${jmap(_.median)},"spread":${jmap(_.spread)},"cold":${jmap(_.cold)},""" +
      s""""runs":$runs,"cold_runs":$coldRuns,"interleaved":true,"pass_totals":$passTotals,""" +
      f""""prime_sec":$primeSec%.3f,"failed":$failed,"sf":"$sfDir"}"""
    // FULL stats (median/spread/cold maps) persist to a file: the driver's
    // stdout capture keeps only a bounded TAIL, and the full line (~2.6 KB
    // at 31 queries) has overrun it two rounds running — "parsed": null in
    // the official artifact both times
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
      System.err.println(s"[bench] wrote $outPath")
    } catch {
      case e: Throwable => System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // STDOUT gets the contract line only — metric/value/unit/queries/sf
    // plus the small scalars — compact enough (~1.4 KB) to survive a
    // 2 KB tail capture whole, printed LAST so the surviving end of any
    // cut is the parseable one; a short headline rides before it for a
    // human reading a harder-cut log
    val contract =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(_.best)},""" +
      s""""runs":$runs,"cold_runs":$coldRuns,"failed":$failed,""" +
      s""""bench_file":"$outPath","sf":"$sfDir"}"""
    println(f"[bench] total=$total%.3fs failed=$failed queries=${results.length}")
    println(contract)
    spark.stop()
  }
}
