// Dev A/B: q80/q84 with INLINE pair builds (scan+distinct per run) vs the
// materialized pair store — interleaved in ONE JVM so ambient noise hits
// both arms alike; results asserted equal before timing. Run:
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.tools.AbPairStore'
package graft.tools

import graft.Tables.t
import graft.operators.GraphQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object AbPairStore {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def inlineSparseEdges: DataFrame = {
      val pairs = t(spark, dir, "lineitem")
        .filter($"l_quantity" === 50)
        .select($"l_partkey".cast("long").as("p"), $"l_suppkey".cast("long").as("su"))
        .distinct()
      val fwd = pairs.select(($"p" * 2).as("src"), ($"su" * 2 + 1).as("dst"))
      fwd.union(fwd.select($"dst".as("src"), $"src".as("dst")))
    }
    def q80Inline() = GraphQueries
      .minLabelPropagation(inlineSparseEdges, GraphQueries.ScaleCcRounds)
      .orderBy($"node").count()
    def q80Store() = graft.SparkEntry.queries("q80_graph_scale_cc")(spark, dir).count()
    def q84Inline() = GraphQueries
      .kCorePeel(inlineSparseEdges, GraphQueries.KCoreK, GraphQueries.KCoreRounds)
      .orderBy($"node").count()
    def q84Store() = graft.SparkEntry.queries("q84_scale_kcore")(spark, dir).count()

    // warm both paths once (store build included) before timing
    q80Inline(); q80Store(); q84Inline(); q84Store()
    def time(f: () => Long): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    val rounds = 5
    val res = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to rounds) {
      res("q80 inline") ::= time(q80Inline)
      res("q80 store") ::= time(q80Store)
      res("q84 inline") ::= time(q84Inline)
      res("q84 store") ::= time(q84Store)
    }
    res.toSeq.sortBy(_._1).foreach { case (k, ts) =>
      println(f"[ab] $k%-12s min=${ts.min}%.3f all=${ts.reverse.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
