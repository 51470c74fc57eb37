package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  /** Suites share one session, and operators with a documented cache
    * retention contract (SparkEntry scaladoc) leave InMemoryRelations
    * behind; a later suite's plan-shape or pushdown assertion can
    * silently match a leaked cached subtree instead of the scan (the
    * round-11 PlanShapeSpec incident, seen again battery-order-only
    * in ScaleOpsSpec). Every suite therefore ends with a cleared
    * cache — mid-suite caches are untouched.
    */
  override def afterAll(): Unit = {
    spark.catalog.clearCache()
    super.afterAll()
  }
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .getOrCreate()
}
