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
}
