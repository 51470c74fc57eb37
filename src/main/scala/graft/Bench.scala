package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state measurement: one untimed pass over the SAME scale
    // factor first, so JVM/codegen/shuffle-machinery warmup (including
    // plans whose generated code embeds data-derived constants) is not
    // charged to whichever queries happen to run first in map order.
    // Fitted-artifact caches are cleared afterwards so the timed pass
    // still measures real computation, not artifact reuse.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // Cold-start the timed pass: drop fitted-artifact caches AND every
    // cached DataFrame subtree (minhash signatures, packed bitsets, …)
    // so the timed loop measures real recomputation, not cache replay.
    graft.operators.LimeOps.clearStatsCache()
    spark.catalog.clearCache()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // A failed query is reported as -elapsed (negative) so a
      // regression that fails fast cannot masquerade as a speedup.
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      val elapsed = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) elapsed else -elapsed)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // abs: a failed query's negative marker must not LOWER the total —
    // a fast failure would otherwise read as a speedup
    val total = if (results.nonEmpty) results.values.map(math.abs).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
