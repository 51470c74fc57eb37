package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the harness star schema (TESTDATA.md).
  *
  * All tables are single parquet files per scale-factor directory; Spark
  * picks up the embedded schema. At 100 TB these would be partitioned
  * directories — the loader signature stays the same, so nothing else
  * in the engine changes.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame   = t(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame     = t(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame   = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = t(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame     = t(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame     = t(s, dir, "region")
  /** events.ts has shipped as both TIMESTAMP(NANOS) (which Spark 4
    * surfaces as long under `nanosAsLong`) and plain TIMESTAMP(MICROS)
    * across harness data generations. Detect from the embedded schema:
    * a long `ts` is nanos → truncate to µs (the same value DuckDB
    * produces, verified in FIXTURES.md); a timestamp `ts` is used as-is.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // TIMESTAMP_NTZ generations: cast to TIMESTAMP(LTZ). The session
      // timezone is pinned to UTC (Sessions.local), so the cast is
      // wall-clock identity and downstream unix_micros()/window() code
      // sees the same type every generation.
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame  = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")

  /** THE date-literal comparison boundary (Spark side). Every operator
    * that compares a fixture date column (l_shipdate, o_orderdate —
    * currently TIMESTAMP_NTZ) against a calendar-day literal goes
    * through this helper, and the oracle SQL's matching convention is
    * `TIMESTAMP 'YYYY-MM-DD'` literals — both engines coerce
    * date32/timestamp columns identically against those. If the
    * fixture generation drifts (TablesSpec's schema canary fails
    * naming the column), THIS function is the one-line Spark-side
    * fix: timestamp literals compare correctly against DATE,
    * TIMESTAMP and TIMESTAMP_NTZ columns alike (Spark coerces DATE
    * to TIMESTAMP at midnight, exactly like DuckDB), so most drifts
    * need no change at all — TablesSpec round-trips a forced date32
    * fixture through this helper to prove it.
    */
  def dateLit(day: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    lit(day).cast("timestamp")
  }
}
