package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the 100 TB shuffle-elimination story
  * ScaleOps documents: both fact tables written bucketed on the join
  * key land pre-partitioned, so the fact-fact join (and any same-key
  * aggregate above it) plans with ZERO shuffle exchanges. At cluster
  * scale this turns the recurring orders⋈lineitem shuffle
  * (O(data) network per query) into a one-time layout cost.
  */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join + same-key aggregate plans with zero shuffle exchanges") {
    val s = spark
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_totalprice")
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_quantity")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("b_orders")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("b_lineitem")
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the non-broadcast path
      val bucketed = s.table("b_lineitem")
        .join(s.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("qty"), max(col("o_totalprice")).as("top"))
      assert(bucketed.count() > 0) // finalizes the AQE plan
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")

      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("qty"), max(col("o_totalprice")).as("top"))
      assert(bucketed.orderBy("l_orderkey").collect().map(_.toString).toSeq ==
        plain.orderBy("l_orderkey").collect().map(_.toString).toSeq)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
