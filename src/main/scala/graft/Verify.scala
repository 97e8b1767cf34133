package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional third arg: comma-separated query names — dump (and emit
    // oracle SQL for) only those, for spot-gating one query at a bigger
    // SF without paying the full registry
    val (sfDir, outDir) = (args(0), args(1))
    val only = if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark has no native
      // type for; read as epoch-nanos long (queries convert exactly).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // the eve_* oracles read the bootstrapped fixture store (systems +
    // jump topologies) from the dump dir; their SQL carries a
    // {{EVE_FIXTURE}} placeholder resolved to the absolute path here.
    // The store nests INSIDE the eve_jump_risks result dir with a "_"
    // prefix: parquet readers skip hidden entries when reading that
    // query's result, and the harness's top-level scan of outDir no
    // longer sees a fixture dir it would report as an un-oracled query.
    val fixtureDir =
      Paths.get(outDir).toAbsolutePath.toString + "/eve_jump_risks/_fixture"
    if (only.forall(_.exists(_.startsWith("eve_"))))
      try operators.EveQueries.persistFixture(spark, fixtureDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] fixture persist failed: ${e.getMessage}")
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{{EVE_FIXTURE}}", fixtureDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
