// Dev probe: per-run cost of the data-scale graph fixture INPUT builds
// (the scan + filter + distinct + union each warm q80/q84 run re-pays)
// vs the full queries. Run:
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.tools.ProbeGraphInputs'
package graft.tools

import graft.operators.GraphQueries
import org.apache.spark.sql.SparkSession

object ProbeGraphInputs {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[probe] $label%-28s min=${ts.map(_._1).min}%.3f all=${ts.map(t => f"${t._1}%.2f").mkString(",")} rows=${ts.head._2}")
    }
    time("sparse edges build")(GraphQueries.sparsePartSupplierEdges(spark, dir).count())
    time("full edges build")(GraphQueries.partSupplierEdges(spark, dir).count())
    time("q80 full")(graft.SparkEntry.queries("q80_graph_scale_cc")(spark, dir).count())
    time("q84 full")(graft.SparkEntry.queries("q84_scale_kcore")(spark, dir).count())
    spark.stop()
  }
}
