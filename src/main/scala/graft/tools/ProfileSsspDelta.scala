// Profile for the sssp_delta maintenance lane — MAINTBENCH_r16 read
// 17.5/20.7/28.0 s across three SF decades (the least-flat lane), and the
// round-16 verdict asked WHICH term scales: frontier recompute volume,
// store listing, or fixed per-round scheduling. This tool replays the
// exact MaintBench schedule per SF and attributes each batch's wall to:
//
//   - cone_rounds / relax_rounds — the iterative loops' trip counts
//     (each round is a fixed set of Spark jobs: candidate probe,
//     restriction joins, checkpoint, emptiness action);
//   - jobs / job_ms — total Spark jobs and their summed wall (from the
//     listener's start/end timestamps): constant jobs with growing
//     job_ms ⇒ data volume; growing jobs ⇒ round count;
//   - event_files / dist_files — store file counts after the batch (the
//     listing term).
//
// Run: sbt 'runMain graft.tools.ProfileSsspDelta [outFile] [sfDirs,comma-sep]'
package graft.tools

import graft.operators.GraphQueries
import graft.streaming.SsspDeltaStream
import org.apache.hadoop.fs.Path
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

object ProfileSsspDelta {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("SSSPDPROF_r17.json")
    val sfDirs = args.lift(1).map(_.split(",").toSeq).getOrElse(
      Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val jobMs = new java.util.concurrent.atomic.AtomicLong
    val startAt = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        startAt.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        jobs.incrementAndGet()
        Option(startAt.remove(j.jobId)).foreach(t => jobMs.addAndGet(j.time - t))
      }
    })
    def drainAndReset(): Unit = {
      Thread.sleep(300) // listener bus is async; let the tail land
      jobs.set(0); jobMs.set(0)
    }
    def filesUnder(path: String): Int = {
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0
      else {
        val it = fs.listFiles(p, true)
        var n = 0
        while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
        n
      }
    }

    val perSf = sfDirs.map { dir =>
      val lanes = new MaintLanes(spark, dir)
      val slices = lanes.all.find(_.name == "sssp_delta")
        .getOrElse(sys.error("sssp_delta lane missing")).slices.map(_.cache())
      slices.foreach(_.count())
      // two attempts like MaintBench; report both (attempt 0 carries the
      // ambient warmup)
      val attempts = (0 until 2).map { _ =>
        val store = java.nio.file.Files
          .createTempDirectory("ssspdprof").toString + "/store"
        val batches = slices.zipWithIndex.map { case (b, i) =>
          drainAndReset()
          val t0 = System.nanoTime()
          SsspDeltaStream.processBatch(b, i.toLong, store, lanes.source,
            GraphQueries.ScaleSsspBudget)
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300)
          f"""{"batch":$i,"wall":$wall%.3f,"cone_rounds":${SsspDeltaStream.lastConeRounds},""" +
            s""""relax_rounds":${SsspDeltaStream.lastRelaxRounds},"jobs":${jobs.get},""" +
            s""""job_ms":${jobMs.get},"event_files":${filesUnder(s"$store/events")},""" +
            s""""dist_files":${filesUnder(s"$store/dists") + filesUnder(s"$store/distsp")}}"""
        }
        batches.mkString("[", ",", "]")
      }
      slices.foreach(_.unpersist())
      lanes.unpersist()
      val sf = dir.split("/").last
      s""""$sf":{"edges":${lanes.wN},"attempts":[${attempts.mkString(",")}]}"""
    }
    val json = s"""{"profile":"sssp_delta per-batch attribution",${perSf.mkString(",")}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out), (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
