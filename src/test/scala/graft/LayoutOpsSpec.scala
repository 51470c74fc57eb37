package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** The layout queries' PLAN claims, made falsifiable (their result
  * claims are the driver's oracle rows — each is plain SQL over the
  * raw tables, so layout-independence is hash-proven there):
  *  - q_join_bucketed runs the orders⋈customer merge join with ZERO
  *    exchanges below the join,
  *  - q_scan_partition_prune's scan reads exactly the two matching
  *    nation partitions (static pruning),
  *  - q_join_dpp carries a dynamicpruningexpression on the fact scan
  *    and at runtime reads exactly the dim-selected 5 partitions.
  */
class LayoutOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // completed AQE query stages are leaf nodes; flatten through them
  private def flat(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flat(a.executedPlan)
    case q: QueryStageExec => q +: flat(q.plan)
    case n => n +: n.children.flatMap(flat)
  }

  test("bucketed join: zero exchanges below the merge join, result = plain join") {
    val df = SparkEntry.queries("q_join_bucketed")(spark, dir)
    val rows = df.collect()
    val nodes = flat(df.queryExecution.executedPlan)
    val smj = nodes.collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"merge hint did not produce an SMJ:\n${df.queryExecution.executedPlan}")
    // the join's subtree must be exchange-free: both inputs arrive
    // bucket-co-located from disk
    val joinSubtree = flat(smj.head)
    assert(!joinSubtree.exists(n =>
        n.isInstanceOf[ShuffleExchangeLike] || n.isInstanceOf[BroadcastExchangeLike]),
      s"bucketed join still moves data:\n${smj.head}")
    // whole plan: exactly the segment aggregate + output sort shuffles
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
    assert(shuffles == 2, s"q_join_bucketed shuffle count drifted: $shuffles")
    // layout never changes results (also oracle-proven at sf0.01)
    val plain = graft.Tables.orders(spark, dir)
      .join(graft.Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy("c_mktsegment").collect()
    assert(rows.map(_.toString).toSeq == plain.map(_.toString).toSeq)
  }

  private def partitionsRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = flat(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec if f.metrics.contains("numPartitions") => f }
    assert(scans.nonEmpty, s"no partitioned scan in:\n${df.queryExecution.executedPlan}")
    scans.map(_.metrics("numPartitions").value).max
  }

  test("static partition pruning: scan reads exactly the 2 matching nation dirs") {
    val df = SparkEntry.queries("q_scan_partition_prune")(spark, dir)
    assert(partitionsRead(df) == 2,
      s"static prune read ${partitionsRead(df)} partitions, want 2")
  }

  test("z-order layout: the 2-D box scan skips most row groups; results are layout-free") {
    val df = SparkEntry.queries("q_scan_zorder")(spark, dir)
    val rows = df.collect()
    val scanned = flat(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
      .map(_.metrics("numOutputRows").value).max
    val total = graft.Tables.lineitem(spark, dir).count()
    // unclustered comparator: the same box over the raw table
    val raw = graft.Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= graft.Tables.dateLit("1996-01-01") &&
        col("l_shipdate") < graft.Tables.dateLit("1996-07-01") &&
        col("l_extendedprice").between(20000.0, 30000.0))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
    val rawRows = raw.collect()
    val rawScanned = flat(raw.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
      .map(_.metrics("numOutputRows").value).max
    info(s"z-ordered box scan emitted $scanned of $total rows " +
      s"(unclustered comparator: $rawScanned)")
    // the layout never changes results (also oracle-proven at sf0.01)
    assert(rows.map(_.toString).toSeq == rawRows.map(_.toString).toSeq,
      s"z-ordered result diverged from the raw-table box")
    // and the clustering actually prunes: the pushed 2-D box predicate
    // must skip most of the z-ordered row groups, and never read more
    // than the unclustered copy
    assert(scanned <= rawScanned, s"z-order read MORE than unclustered: $scanned > $rawScanned")
    assert(scanned < total / 3,
      s"z-ordered scan emitted $scanned of $total rows — row groups not pruned " +
        "on both dimensions (measured 1171/6000 when healthy; ~3036 means the " +
        "date dimension stopped pruning — check the TIMESTAMP_MICROS write)")
  }

  test("dynamic partition pruning: dim join prunes the fact scan to 5 of 25 nations") {
    val df = SparkEntry.queries("q_join_dpp")(spark, dir)
    val n = partitionsRead(df)
    assert(df.queryExecution.executedPlan.toString.toLowerCase.contains("dynamicpruning"),
      s"no dynamicpruningexpression on the fact scan:\n${df.queryExecution.executedPlan}")
    // ASIA = 5 of the 25 nation partitions
    assert(n == 5, s"DPP read $n partitions, want 5")
  }
}
