package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale recipes referenced in SURVEY.md §7.5: explicit skew salting
  * (for when AQE's skew-join split cannot apply — e.g. aggregations
  * into high-cardinality maps, or non-AQE engines downstream) and
  * bucketed co-located joins (ScaleOpsSpec).
  */
object ScaleOps {

  /** Salted inner equi-join for a skewed probe side: the big side gets
    * a deterministic salt in [0, buckets) derived from its whole row
    * (xxhash64 — no RNG, so plans stay partition-independent), the
    * small side is exploded ×buckets, and the join key becomes
    * (key, salt) so one hot key spreads over `buckets` tasks.
    * Row-multiplication is on the SMALL side only.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(buckets.toLong)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on key. Spark's
    * hash aggregation already does map-side partials; this form exists
    * for aggregates where the partial state itself is the skew (e.g.
    * collect-like or high-cardinality sketch states).
    */
  def saltedCount(df: DataFrame, key: String, buckets: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(buckets.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("cnt"))

  /** Compacted partitioned parquet sink — the 100 TB write shape.
    * Repartitioning by the partition column before `partitionBy` means
    * each task writes to ONE hive partition (without it, every task
    * opens a file in every partition → tasks×partitions small files);
    * `maxRecordsPerFile` bounds file size so one hot partition still
    * splits, and `sortCols` orders rows within each file so parquet
    * min/max row-group stats support downstream predicate pushdown.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       sortCols: Seq[String], maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartition(col(partitionCol))
      .sortWithinPartitions((partitionCol +: sortCols).map(col): _*)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)
}
