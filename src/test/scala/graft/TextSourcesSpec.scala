package graft

import graft.sources.TextSources
import org.apache.spark.sql.functions._

/** Round-trip the documents table (newlines/quotes/commas in `text`
  * exercise CSV quoting) through both secondary formats.
  */
class TextSourcesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, dir)
    .select("doc_id", "lang", "source", "n_chars", "text")

  test("CSV round-trip preserves the documents table") {
    val path = java.nio.file.Files.createTempDirectory("graft-csv").toString + "/docs"
    TextSources.writeCsv(docs, path)
    val back = TextSources.readCsv(spark, path, docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("JSONL round-trip preserves the documents table") {
    val path = java.nio.file.Files.createTempDirectory("graft-jsonl").toString + "/docs"
    TextSources.writeJsonl(docs, path)
    val back = TextSources.readJsonl(spark, path, docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("ORC round-trip preserves the documents table") {
    val path = java.nio.file.Files.createTempDirectory("graft-orc").toString + "/docs"
    TextSources.writeOrc(docs, path)
    val back = TextSources.readOrc(spark, path, docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("Avro round-trip preserves the documents table") {
    val path = java.nio.file.Files.createTempDirectory("graft-avro").toString + "/docs"
    TextSources.writeAvro(docs, path)
    val back = TextSources.readAvro(spark, path, docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("text round-trip preserves records with embedded newlines") {
    val s = spark
    import s.implicits._
    // the base64 pack must survive exactly what the line protocol
    // would shear: newlines, quotes, commas inside the text field
    val planted = Seq(
      (1L, "en", "web", 12L, "line one\nline two"),
      (2L, "de", "book", 9L, "quote \" and, comma"),
      (3L, "en", "web", 0L, ""))
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-text").toString + "/docs"
    TextSources.writeText(planted, Seq("doc_id", "lang", "source", "n_chars", "text"), path)
    val back = TextSources.readText(spark, path)
      .select(element_at(col("f"), 1).cast("long").as("doc_id"),
        element_at(col("f"), 2).as("lang"),
        element_at(col("f"), 3).as("source"),
        element_at(col("f"), 4).cast("long").as("n_chars"),
        element_at(col("f"), 5).as("text"))
    assert(back.count() == planted.count())
    assert(back.exceptAll(planted).isEmpty && planted.exceptAll(back).isEmpty)
    // and the sf fixture round-trips through the same pack
    val p2 = java.nio.file.Files.createTempDirectory("graft-text2").toString + "/docs"
    TextSources.writeText(docs, Seq("doc_id", "lang", "source", "n_chars", "text"), p2)
    val back2 = TextSources.readText(spark, p2)
      .select(element_at(col("f"), 1).cast("long").as("doc_id"),
        element_at(col("f"), 2).as("lang"),
        element_at(col("f"), 3).as("source"),
        element_at(col("f"), 4).cast("long").as("n_chars"),
        element_at(col("f"), 5).as("text"))
    assert(back2.exceptAll(docs).isEmpty && docs.exceptAll(back2).isEmpty)
  }
}
