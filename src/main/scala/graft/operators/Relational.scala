package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational query surface (SURVEY.md §2.1–§2.6).
  *
  * Every builder is a pure DataFrame composition: Catalyst handles
  * predicate pushdown, column pruning, join selection and partial
  * aggregation. Oracle-checked queries follow the §7.4 playbook:
  * total-order ORDER BY, DECIMAL casts before float-summing
  * aggregates, explicit aliases matching the DuckDB SQL.
  */
object Relational {

  /** Money firewall: exact decimal so sum order can't change results. */
  private val D = "decimal(18,2)"

  // ===== §2.4 q_agg_hash — TPC-H-Q1-style pricing summary =====
  def qAggHash(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(D)).as("sum_qty"),
        sum(col("l_extendedprice").cast(D)).as("sum_base_price"),
        sum(col("l_extendedprice").cast(D) * (lit(1) - col("l_discount").cast(D))).as("sum_disc_price"),
        sum(col("l_extendedprice").cast(D) * (lit(1) - col("l_discount").cast(D)) * (lit(1) + col("l_tax").cast(D))).as("sum_charge"),
        round(sum(col("l_quantity").cast(D)).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(sum(col("l_extendedprice").cast(D)).cast("double") / count(lit(1)), 6).as("avg_price"),
        count(lit(1)).as("count_order")
      )
      .orderBy("l_returnflag", "l_linestatus")

  val oracle: Map[String, String] = Map(
    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
        |  SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS sum_disc_price,
        |  SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS sum_charge,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )

  /** Registry consumed by SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_hash" -> (qAggHash _)
  )
}
