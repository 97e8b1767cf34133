// Same-JVM interleaved A/B for q133's hash-keyed exchanges (round 18,
// VERDICT r17 item 8): the r17 string-keyed bigram pipeline vs the
// shipped xxhash64-keyed one (TextOps.bigramLmScores). Results asserted
// EQUAL every run (full collect compare — the audit lane separately
// pins hash injectivity); arms alternate S,H,H,S per round so drift
// cancels. Run: sbt 'runMain graft.tools.AbQ133 <sfDir> [rounds]'
package graft.tools

import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object AbQ133 {

  /** The r17 string-keyed shape, verbatim (kept only as the A/B arm). */
  private def stringKeyed(toks: DataFrame): DataFrame = {
    val s = toks.sparkSession
    import s.implicits._
    val dbc = toks.filter(size($"ws") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(ws)-2), i -> concat_ws(' ', ws[i], ws[i+1]))")).as("bg"))
      .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("c"))
      .withColumn("w1", substring_index($"bg", " ", 1))
      .localCheckpoint()
    val cb = dbc.groupBy($"bg").agg(sum($"c").as("cb"))
    val cu = dbc.groupBy($"w1").agg(sum($"c").as("cu"))
    val v = cu.select($"w1".as("tok"))
      .union(toks.select(element_at($"ws", -1).as("tok")))
      .agg(countDistinct($"tok").as("v"))
    dbc.join(cb, "bg").join(cu, "w1").crossJoin(broadcast(v))
      .withColumn("lnp", log(($"cb".cast("double") + lit(1.0)) /
        ($"cu".cast("double") + $"v".cast("double"))))
      .groupBy($"doc_id")
      .agg(sum($"c").cast("long").as("n_bigrams"),
        sum(($"c".cast("double") * $"lnp").cast("decimal(38,12)")).as("s"))
      .select($"doc_id", $"n_bigrams",
        round(-($"s".cast("double")) / $"n_bigrams".cast("double"), 6).as("logppl"))
      .orderBy($"doc_id")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 3
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

    val toks = TextOps.docTokens(spark, dir)
    toks.count() // token-store build paid once, outside the arms

    def run(name: String, f: () => DataFrame): (Double, Seq[String]) = {
      val t0 = System.nanoTime()
      val rows = f().collect().map(_.toString).toSeq
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[abq133] $name $dt%.3f s (${rows.size} docs)")
      (dt, rows)
    }

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "string" -> (() => stringKeyed(toks)),
      "hashed" -> (() => TextOps.bigramLmScores(toks)))
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    var ref: Seq[String] = null
    (1 to rounds).foreach { _ =>
      (arms ++ arms.reverse).foreach { case (nm, f) =>
        val (dt, rows) = run(nm, f)
        if (ref == null) ref = rows
        require(rows == ref, s"$nm diverged! (${rows.size} vs ${ref.size})")
        times(nm) = times(nm) :+ dt
      }
    }
    arms.map(_._1).foreach { nm =>
      System.err.println(s"[abq133] $nm runs: " +
        times(nm).map(t => f"$t%.3f").mkString(", ") + f"  min ${times(nm).min}%.3f")
    }
    System.err.println("[abq133] results EQUAL across all runs")
    spark.stop()
  }
}
