package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    names.foreach(n => SparkEntry.queries(n)(spark, sfDir).count())
    graft.operators.LimeOps.clearStatsCache()
    spark.catalog.clearCache()
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"TIMED $n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
