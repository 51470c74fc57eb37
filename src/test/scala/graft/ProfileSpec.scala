package graft

import graft.operators.Relational
import org.apache.spark.sql.functions.col
import java.nio.file.Files

/** Grades q_profile_table: independent recompute on the fixture plus a
  * planted-defect table (the loads the census exists to catch).
  */
class ProfileSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("profile_table: census recomputed independently from collected rows") {
    val rows = Tables.lineitem(spark, dir).collect()
    val numCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val n = rows.length.toLong
    val expected: Map[String, (Long, Long, Long, Option[Double], Option[Double])] =
      (numCols.map { c =>
        val vs = rows.map(r => Option(r.getAs[Any](c)).map {
          case i: Int => i.toDouble
          case l: Long => l.toDouble
          case d: Double => d
        })
        val defined = vs.flatten
        c -> (n, vs.count(_.isEmpty).toLong, defined.distinct.length.toLong,
          defined.minOption, defined.maxOption)
      } ++ Seq("l_returnflag", "l_linestatus", "l_shipdate").map { c =>
        val vs = rows.map(r => Option(r.getAs[Any](c)).map(_.toString))
        c -> (n, vs.count(_.isEmpty).toLong, vs.flatten.distinct.length.toLong,
          None: Option[Double], None: Option[Double])
      }).toMap
    val got = Relational.qProfileTable(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toMap
    assert(got == expected, s"census diverges:\n got $got\n exp $expected")
  }

  test("profile_table: planted defects surface (all-null column, collapsed dimension)") {
    val s = spark
    import s.implicits._
    val tmp = Files.createTempDirectory("profile-defect").toFile.getAbsolutePath
    Seq(
      (1L, 10L, 100L, 1, Option.empty[Double], 5.0, 0.1, 0.02, "N", "O", "2024-01-01 00:00:00"),
      (2L, 11L, 100L, 1, Option.empty[Double], 6.0, 0.1, 0.02, "N", "O", "2024-01-02 00:00:00"),
      (3L, 12L, 100L, 2, Option.empty[Double], 7.0, 0.2, 0.02, "N", "O", "2024-01-03 00:00:00")
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "raw")
      .withColumn("l_shipdate", col("raw").cast("timestamp")).drop("raw")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = Relational.qProfileTable(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    // the all-null measure: 3 nulls, 0 distinct, no extrema
    assert(got("l_quantity") == ((3L, 0L, None)))
    // the collapsed dimension: a single distinct value across the load
    assert(got("l_returnflag") == ((0L, 1L, None)))
    // a healthy column for contrast
    assert(got("l_orderkey") == ((0L, 3L, Some(1.0))))
  }
}
