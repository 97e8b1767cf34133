// Dev A/B: peel init-checkpoint vs direct store-scan input (the
// `inputStable` flag), interleaved in ONE JVM. Run:
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.tools.AbInputStable'
package graft.tools

import graft.operators.GraphQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object AbInputStable {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // reach the projection store through q105's own path builder
    def truss(stable: Boolean): Long =
      GraphQueries.kTrussPeel(GraphQueries.projectedPartEdges(spark, dir),
        GraphQueries.TrussK, GraphQueries.TrussRounds, inputStable = stable)
        .orderBy($"a", $"b").count()
    def core(stable: Boolean): Long =
      GraphQueries.kCorePeel(GraphQueries.sparsePartSupplierEdges(spark, dir),
        GraphQueries.KCoreK, GraphQueries.KCoreRounds, inputStable = stable)
        .orderBy($"node").count()
    truss(true); truss(false); core(true); core(false) // warm stores + JIT
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val res = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to 5) {
      res("truss stable") ::= time(truss(true))
      res("truss chk") ::= time(truss(false))
      res("core stable") ::= time(core(true))
      res("core chk") ::= time(core(false))
    }
    res.toSeq.sortBy(_._1).foreach { case (k, ts) =>
      println(f"[ab] $k%-12s min=${ts.min}%.3f all=${ts.reverse.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
