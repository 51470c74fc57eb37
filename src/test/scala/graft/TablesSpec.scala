package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins Tables.events' schema-generation adaptivity: harness data has
  * shipped events.ts as TIMESTAMP(NANOS) (surfaced as long under
  * `nanosAsLong`) and as plain TIMESTAMP(MICROS)/NTZ — the loader must
  * return the SAME rows and the same TimestampType column for both, or
  * every events-reading operator fails analysis on a regeneration (the
  * round-6 breakage: 23 queries lost to a hard-coded nanos path).
  */
class TablesSpec extends SparkSpec {

  private def writeGeneration(nanos: Boolean): String = {
    val dir = Files.createTempDirectory("events-gen").toFile.getAbsolutePath
    val s = spark
    import s.implicits._
    val base = Seq(
      (1L, "2024-01-01 00:00:00.000001", 10L, "view", 1.5, """{"k":1}"""),
      (2L, "2024-01-15 12:34:56.789012", 11L, "click", 2.5, """{"k":2}"""),
      (3L, "2024-01-30 23:59:59.999999", 10L, "purchase", 3.5, """{"k":3}""")
    ).toDF("event_id", "raw", "user_id", "event_type", "value", "props")
    val df =
      if (nanos)
        // nanos-as-long generation: int64 column named ts (what Spark
        // sees of parquet TIMESTAMP(NANOS) under nanosAsLong)
        base.withColumn("ts", unix_micros(col("raw").cast("timestamp")) * 1000L)
      else
        // micros generation: a real timestamp column, stored by parquet
        // as TIMESTAMP(MICROS); NTZ vs LTZ is a wall-clock identity
        // under the pinned UTC session tz
        base.withColumn("ts", col("raw").cast("timestamp_ntz"))
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events loader: nanos-long and timestamp generations load identically") {
    val nanosDir = writeGeneration(nanos = true)
    val microsDir = writeGeneration(nanos = false)
    val a = Tables.events(spark, nanosDir)
    val b = Tables.events(spark, microsDir)
    assert(a.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(b.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val rows = (df: org.apache.spark.sql.DataFrame) =>
      df.select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy("event_id").collect().map(_.toString).toSeq
    assert(rows(a) == rows(b))
    // µs precision survives both paths (the .999999 fixture)
    assert(rows(a).exists(_.contains("23:59:59.999999")))
    // downstream unix_micros()/window() analysis must succeed (the
    // exact failure mode of the round-6 breakage)
    assert(b.select(unix_micros(col("ts"))).count() == 3)
  }

  test("fixture schema canary: types the oracle SQL assumes") {
    // The harness regenerates test data between rounds and parquet
    // types have drifted before (events.ts nanos → micros broke 23
    // queries in round 6, found only through the driver's oracle
    // mismatches). This canary fails the suite IMMEDIATELY at round
    // start with the drifted column named, for every type the oracle
    // SQL or an operator gate assumes. On failure: check FIXTURES.md,
    // then decide loader adaptivity (the Tables.events pattern) or an
    // oracle-side cast — BOTH sides must agree, a one-sided cast just
    // moves the mismatch. For DATE-column drift specifically
    // (timestamp_ntz → date32), every Spark-side date comparison goes
    // through ONE helper — `Tables.dateLit` — and the oracle
    // convention is `TIMESTAMP 'YYYY-MM-DD'` literals, both of which
    // coerce identically against date32 and timestamp columns, so
    // that drift is a no-op (proved by the date32 round-trip test
    // below); any other drift is a one-line dateLit fix.
    val dir = "/root/testdata/sf0.001"
    def typeOf(table: String, column: String): String = {
      val schema = spark.read.parquet(s"$dir/$table.parquet").schema
      if (schema.fieldNames.contains(column)) schema(column).dataType.simpleString
      else "MISSING"
    }
    val expected = Seq(
      // TPC-H date columns ship as TIMESTAMP_NTZ in the current
      // generation (this canary caught that drift on round-7 data —
      // benign because BOTH engines read the raw column and every
      // date-literal compare coerces identically; a future change to
      // date32 or TIMESTAMP_LTZ must be re-reviewed on both sides).
      // The fixture's lineitem is the 11-column cut (no commitdate /
      // receiptdate — FIXTURES.md).
      ("lineitem", "l_shipdate", "timestamp_ntz"),
      ("orders", "o_orderdate", "timestamp_ntz"),
      // decimal firewall inputs fold these as DECIMAL casts of double
      ("lineitem", "l_extendedprice", "double"),
      ("lineitem", "l_quantity", "double"),
      ("orders", "o_totalprice", "double"),
      // text pipeline: split/regex assume plain strings
      ("documents", "text", "string"),
      ("documents", "n_chars", "bigint"),
      // embedding ops cast array<float> → array<double>; the oracle
      // CASTs the same float column, so element type must stay float
      ("embeddings", "embedding", "array<float>"),
      ("embeddings", "label", "int"),
      // events.ts is generation-adaptive (bigint nanos OR timestamp);
      // everything else on events is assumed stable
      ("events", "event_type", "string"),
      ("events", "value", "double"),
      ("events", "props", "string"))
    val drifted = expected.flatMap { case (t, c, want) =>
      val got = typeOf(t, c)
      if (got != want) Some(s"$t.$c: expected $want, fixture now ships $got") else None
    }
    assert(drifted.isEmpty,
      "fixture schema drift (see this test's docstring for the protocol):\n" +
        drifted.mkString("\n"))
    val tsType = typeOf("events", "ts")
    assert(tsType == "bigint" || tsType.startsWith("timestamp"),
      s"events.ts shipped as $tsType — neither known generation; extend Tables.events")
  }

  test("dateLit round-trips a forced date32 fixture generation") {
    // If a future generation ships l_shipdate as parquet date32, every
    // operator comparing through Tables.dateLit must keep returning
    // the same rows with NO code change (Spark coerces DATE to
    // TIMESTAMP-at-midnight in comparisons, exactly like DuckDB
    // coerces date32 against TIMESTAMP literals — the documented
    // oracle convention). Force that generation and prove the
    // inclusive/exclusive boundary semantics survive.
    val dir = Files.createTempDirectory("date32-gen").toFile.getAbsolutePath
    val s = spark
    import s.implicits._
    Seq((1L, "1995-12-31"), (2L, "1996-01-01"), (3L, "1996-06-15"),
        (4L, "1996-12-31"), (5L, "1997-01-01"))
      .toDF("l_orderkey", "raw")
      .withColumn("l_shipdate", col("raw").cast("date")) // parquet date32
      .select("l_orderkey", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val li = Tables.lineitem(spark, dir)
    assert(li.schema("l_shipdate").dataType == org.apache.spark.sql.types.DateType)
    val got = li
      .filter(col("l_shipdate") >= Tables.dateLit("1996-01-01") &&
              col("l_shipdate") < Tables.dateLit("1997-01-01"))
      .orderBy("l_orderkey").select("l_orderkey").as[Long].collect().toSeq
    assert(got == Seq(2L, 3L, 4L),
      s"date32 generation broke dateLit boundary semantics: got $got")
  }
}
