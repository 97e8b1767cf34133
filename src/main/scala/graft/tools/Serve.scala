package graft.tools
import graft.api.{EveGraph, HttpApi}
import graft.fixtures.StarMap
import graft.store.EveStore
import org.apache.spark.sql.SparkSession
object Serve {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("evestore-serve").toString
    val eng = new EveGraph(new EveStore(spark, dir))
    eng.bootstrap(StarMap.source(withWormholes = false))
    val api = new HttpApi(eng, () => StarMap.source(withWormholes = true))
    val port = api.start(8008)
    println(s"SERVING on $port")
    Thread.sleep(600000)
  }
}
