package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Secondary ingestion formats (SURVEY.md §2.1): CSV and JSON-lines
  * for text corpora, with explicit schemas (schema inference costs an
  * extra full scan at 100 TB — callers must pass one) and the matching
  * writers. Parquet remains the primary format (`graft.Tables`).
  */
object TextSources {

  def readCsv(s: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    s.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", "true") // quoted newlines inside text columns
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** JSON-lines (one object per line — the splittable form; multiLine
    * JSON arrays cannot be split across workers and are only for small
    * side inputs).
    */
  def readJsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Field separator for the text-format record packer — the
    * escaped form, never a raw control byte in source (the BpeEncode
    * NUL-byte lesson: invisible bytes survive edits silently).
    */
  private val FieldSep = "\u0001"

  /** Line-oriented `text` — the rawest splittable format (one string
    * per line; log shipping, WET/WARC-adjacent dumps). A record with
    * embedded newlines would shear across lines, so the writer packs
    * each row into ONE hex line of separator-joined fields and the
    * reader unpacks — the standard armour for arbitrary text through
    * a line protocol. Hex, not base64: Spark's base64 can emit
    * RFC 2045 76-char CHUNKED output (newlines inside the encoding —
    * exactly the shearing this pack exists to prevent, and it bit a
    * 450-char fixture record in testing); hex never line-wraps.
    * Fields must not contain U+0001 and must be non-null (documented
    * contract; the packer is injective given that).
    */
  def writeText(df: DataFrame, cols: Seq[String], path: String): Unit = {
    import org.apache.spark.sql.functions.{col, concat_ws, encode, hex}
    df.select(hex(encode(
        concat_ws(FieldSep, cols.map(c => col(c).cast("string")): _*), "UTF-8"))
        .as("value"))
      .write.mode("overwrite").text(path)
  }

  def readText(s: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, decode, split, unhex}
    s.read.text(path)
      .select(split(decode(unhex(col("value")), "UTF-8"), FieldSep).as("f"))
  }

  /** ORC — the columnar alternative to parquet (predicate pushdown,
    * column pruning and splittability all work the same way through
    * the DataSource V2 scan). The explicit schema keeps the read
    * contract identical to the text sources even though ORC embeds
    * its own: a writer-side schema drift fails analysis instead of
    * silently re-typing columns.
    */
  def readOrc(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Avro — the ROW-oriented interchange format of event buses
    * (Kafka Connect pipelines, schema-registry ecosystems): splittable
    * like the others, but with per-record serialization instead of
    * columnar stripes, so it's the landing format the columnar
    * rewrite (parquet/ORC) ingests FROM. Spark 4 bundles the avro
    * datasource inside spark-sql — `format("avro")` needs no external
    * module. The explicit read schema keeps the same
    * drift-fails-analysis contract as readOrc, on top of Avro's own
    * writer-embedded schema.
    */
  /** The short name "avro" is reserved by Spark's lookup for the
    * external spark-avro module's V2 registration; this deployment
    * ships only the V1 `AvroFileFormat` inside spark-sql, so the
    * fully-qualified class name addresses it directly (the documented
    * class-name form of `format(...)`).
    */
  private val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  def readAvro(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).format(AvroFormat).load(path)

  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").format(AvroFormat).save(path)
}
