package graft
object ZProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("q_scan_zorder")(spark, "/root/testdata/sf0.001")
    df.collect()
    println(df.queryExecution.executedPlan.toString.split("\n").filter(l =>
      l.contains("PushedFilters") || l.contains("FileScan")).mkString("\n").take(2000))
    spark.stop()
  }
}
