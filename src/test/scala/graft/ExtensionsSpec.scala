package graft

/** graft.GraftExtensions must expose the native expressions to SQL. */
class ExtensionsSpec extends SparkSpec {

  test("dot_f64 callable from SQL, matches Column API semantics") {
    val r = spark.sql(
      "SELECT dot_f64(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d").head()
    assert(r.getDouble(0) == 32.0)
  }

  test("wrong argument types are rejected at analysis time") {
    // int arrays would be silently reinterpreted as garbage doubles
    val e = intercept[Exception] {
      spark.sql("SELECT dot_f64(array(1, 2), array(3, 4))").head()
    }
    assert(e.getMessage.contains("dot_f64"), e.getMessage)
  }

  test("bitset_intersect_count callable from SQL") {
    val r = spark.sql(
      "SELECT bitset_intersect_count(array(7L, 1L), array(5L, 3L)) AS c").head()
    // 7&5 = 0b101 (2 bits), 1&3 = 0b1 (1 bit)
    assert(r.getInt(0) == 3)
  }
}
