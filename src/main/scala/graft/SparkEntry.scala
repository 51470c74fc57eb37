package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.qAggHash(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Registry contract: a handful of builders `.cache()` an
    * intermediate that two downstream branches share (q_tpch_q21's
    * per-pair flags, q_tpch_q11's per-part values, the repetition /
    * contam / simhash / minhash / IVF intermediates). The cached plans
    * are lazy, so a builder cannot unpersist them itself — the FINAL
    * consumer materializes them after this function returns. Callers
    * that sweep many registry entries in one long-lived session
    * (Verify, Bench) therefore run `spark.catalog.clearCache()`
    * between queries (or rely on LRU eviction); one-query-per-session
    * callers (the driver's per-query bench protocol) get cleanup for
    * free at session exit.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ EventOps.queries ++ LlmData.queries ++ LimeOps.queries ++
      LayoutOps.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ EventOps.oracle ++ LlmData.oracle ++ LimeOps.oracle ++
      LayoutOps.oracle
}
