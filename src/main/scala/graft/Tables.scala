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
  def events(s: SparkSession, dir: String): DataFrame     = t(s, dir, "events")
  def documents(s: SparkSession, dir: String): DataFrame  = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
}
