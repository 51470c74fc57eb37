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
  /** events.ts is TIMESTAMP(NANOS) in parquet, which Spark 4 rejects by
    * default. Read nanos as long and truncate to µs — the same value
    * DuckDB produces when it reads the file (verified in FIXTURES.md).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    t(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, dir: String): DataFrame  = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
}
