package graft

import org.apache.spark.sql.types._

/** Guards the verifier's output-format contract (SURVEY.md §7.4.7):
  * the driver compares result frames BY STRING FORM after a pandas
  * row sort, so
  *  - no DECIMAL column may escape any query (Spark's parquet Decimal
  *    formats "5.00" where DuckDB's float64 formats "5.0")
  *  - no array/map/struct cell may appear ANYWHERE, even in no-oracle
  *    queries (the verifier's row sort throws on unhashable cells and
  *    records the query as an error)
  * Round 1 lost 19 queries to exactly these; this spec fails fast on
  * any future query that reintroduces one.
  */
class OutputContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no query output column is decimal, array, map, or struct typed") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val schema = fn(spark, dir).schema
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[DecimalType] =>
          s"$name.${f.name}: ${f.dataType.simpleString} (decimal must be cast to double in the final select)"
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString} (flatten to scalars or render a canonical string)"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("every oracle-declared query aliases only [a-z0-9_] column names") {
    // the driver sorts columns by name on both sides; exotic names
    // (spaces, quotes, uppercase mismatches) break the pairing
    val bad = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val cols = SparkEntry.queries(name)(spark, dir).schema.fieldNames
      cols.filterNot(_.matches("[a-z][a-z0-9_]*")).map(c => s"$name.$c")
    }
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("oracle mutation canary: the flag perturbs exactly one numeric column of the target") {
    // a two-round-green sweep is only as trustworthy as the
    // comparator's ability to go red; the canary flag lets the sweep
    // be run with one constant flipped, and THIS test pins that the
    // flip is live, targeted, and a no-op when the flag is off
    val df = graft.operators.Relational.qAggHash(spark, dir)
    assert(Verify.mutate("q_agg_hash", df) eq df,
      "flag off: mutate must be an identity pass-through")
    sys.props("graft.verify.mutate") = "q_agg_hash"
    try {
      assert(Verify.mutate("q_filter_pred", df) eq df,
        "untargeted queries must pass through untouched")
      val mut = Verify.mutate("q_agg_hash", df)
      val cols = df.columns
      val before = df.collect().map(r => cols.map(c => r.get(r.fieldIndex(c))))
      val after = mut.collect().map(r => cols.map(c => r.get(r.fieldIndex(c))))
      val changed = cols.indices.filter(i =>
        before.map(_(i)).toSeq != after.map(_(i)).toSeq)
      val firstNum = df.schema.fields.indexWhere(
        _.dataType.isInstanceOf[NumericType])
      assert(changed == Seq(firstNum),
        s"exactly the first numeric column must change, got indices $changed")
    } finally sys.props -= "graft.verify.mutate"
  }

  test("canary target validation rejects unknown AND valid-but-unselected targets") {
    // both failure modes leave a red-sweep run indistinguishable from
    // a flag that was never set: a typo'd name mutates nothing, and a
    // REAL name outside an explicit query selection mutates nothing
    // too (the restricted sweep never runs it)
    assert(Verify.canaryTargetError("q_agg_hash", Set.empty).isEmpty,
      "known target + full sweep must validate")
    assert(Verify.canaryTargetError("q_agg_hash", Set("q_agg_hash", "q_filter_pred")).isEmpty,
      "known target inside the restricted selection must validate")
    assert(Verify.canaryTargetError("q_agg_hsah", Set.empty).exists(_.contains("unknown")),
      "typo'd target must be rejected")
    assert(Verify.canaryTargetError("q_agg_hash", Set("q_filter_pred"))
        .exists(_.contains("not in the selected")),
      "valid-but-unselected target must be rejected")
  }
}
