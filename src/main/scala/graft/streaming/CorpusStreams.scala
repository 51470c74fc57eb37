package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the corpus-statistic operators — the
  * monitors a training-data pipeline runs ON THE INGEST STREAM rather
  * than in a nightly batch. Documents arrive as a file stream (the
  * production entry would be the object-store notification feed; the
  * transform chain is identical).
  */
object CorpusStreams {

  def readDocuments(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    s.readStream.schema(schema)
      .option("basePath", dir)
      .parquet(s"$dir/documents*.parquet")
  }

  case class DocKey(source: String, lang: String)
  case class Chi2State(counts: Map[DocKey, Long], seq: Long)
  case class Chi2Out(seq: Long, source: String, n_docs: Long, chi2_contrib: Double)

  /** Streaming categorical-drift monitor (batch twin: qStatChi2): the
    * per-source χ² contribution against independence of the
    * source × lang contingency table, refreshed every trigger — the
    * "this crawl dump is all one language" alarm raised WHILE the
    * dump is arriving, not the morning after.
    *
    * χ² needs the GLOBAL margins, so the whole monitor keys on one
    * spine group whose state IS the O(sources × langs) contingency
    * table — corpus-size-free, no eviction needed (the qEvMarkov
    * closed-set argument), NoTimeout. The function sees only narrow
    * (source, lang) rows; at extreme volume pre-shrink with an
    * upstream per-(source, lang) windowed count in its own query (the
    * gapfill two-query split). Every trigger emits the FULL per-source
    * row set stamped with a trigger sequence number — an update
    * stream whose max-seq rows are the current verdict, equal to the
    * batch operator on a full replay.
    *
    * Cell math mirrors the batch chain bit-exactly: the full
    * source × lang grid (absent cells contribute their (0−e)²/e = e
    * terms — the round-8 advice fix), nano-unit long terms, one
    * closing double division through scaled BigDecimal.
    */
  def chi2Drift(docs: DataFrame): Dataset[Chi2Out] = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col("source"), col("lang")).as[(String, String)]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[Chi2State, Chi2Out](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[Chi2State]) =>
          val st0 = state.getOption.getOrElse(Chi2State(Map.empty, 0L))
          var counts = st0.counts
          rows.foreach { case (src, lg) =>
            val k = DocKey(src, lg)
            counts += k -> (counts.getOrElse(k, 0L) + 1L)
          }
          val seq = st0.seq + 1
          state.update(Chi2State(counts, seq))
          val sources = counts.keysIterator.map(_.source).toSeq.distinct.sorted
          val langs = counts.keysIterator.map(_.lang).toSeq.distinct.sorted
          val nBySrc = sources.map(src =>
            src -> counts.iterator.filter(_._1.source == src).map(_._2).sum).toMap
          val nByLang = langs.map(lg =>
            lg -> counts.iterator.filter(_._1.lang == lg).map(_._2).sum).toMap
          val nn = nBySrc.valuesIterator.sum.toDouble
          def round6(x: Double): Double =
            java.math.BigDecimal.valueOf(x)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          sources.iterator.map { src =>
            val termSum = langs.iterator.map { lg =>
              val c = counts.getOrElse(DocKey(src, lg), 0L).toDouble
              val e = nBySrc(src).toDouble * nByLang(lg) / nn
              java.math.BigDecimal.valueOf((c - e) * (c - e) / e * 1e9)
                .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
            }.sum
            Chi2Out(seq, src, nBySrc(src), round6(termSum.toDouble / 1e9))
          }
      }
  }
}
