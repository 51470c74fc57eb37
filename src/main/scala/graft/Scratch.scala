package graft

/** Ad-hoc profiling main (dev tool; not part of the driver contract).
  * Edit locally to time suspect subtrees — see git history for the
  * lambda-capture investigation it was built for.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // Bench-protocol replica for a named subset: warm pass, artifact
    // rebuild as its own row, then per-query isolated-cold timings
    // with the fitted-stats artifact retained (exactly Bench.scala).
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count() catch { case _: Throwable => () }
    }
    operators.LimeOps.clearStatsCache()
    spark.catalog.clearCache()
    t("artifact_lime_stats")(operators.LimeOps.limeStatsFit(spark, sfDir).count())
    names.foreach { n =>
      spark.catalog.clearCache()
      t(s"cold_$n")(SparkEntry.queries(n)(spark, sfDir).count())
    }
    spark.stop()
  }
}
