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

  case class KsState(counts: Map[(String, Long), Long], seq: Long)
  case class KsOut(seq: Long, source: String, n_docs: Long, ks_stat: Double,
    crit_005: Double, drifted: Boolean)

  /** Streaming continuous-drift monitor (batch twin: qStatKsDrift):
    * the per-source two-sample KS statistic of the n_chars
    * distribution against the REST of the corpus, refreshed every
    * trigger — the length-distribution companion to chi2Drift's
    * categorical alarm, so BOTH corpus-drift monitors run on the
    * ingest stream. Same spine-group shape: state is the
    * O(sources × distinct n_chars) count table (bounded by the VALUE
    * RANGE, not row count — the batch operator's own cum-window
    * argument), NoTimeout, full per-source verdict re-emitted per
    * trigger with a sequence stamp; max-seq rows ≡ the batch operator
    * on a full replay, the CDF/critical-value math mirrored in the
    * identical double op order.
    */
  def ksDrift(docs: DataFrame): Dataset[KsOut] = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col("source"), col("n_chars")).as[(String, Long)]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[KsState, KsOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[KsState]) =>
          val st0 = state.getOption.getOrElse(KsState(Map.empty, 0L))
          var counts = st0.counts
          rows.foreach { case (src, nc) =>
            counts += (src, nc) -> (counts.getOrElse((src, nc), 0L) + 1L)
          }
          val seq = st0.seq + 1
          state.update(KsState(counts, seq))
          val sources = counts.keysIterator.map(_._1).toSeq.distinct.sorted
          val xs = counts.keysIterator.map(_._2).toSeq.distinct.sorted
          val cx = xs.map(x => x ->
            sources.iterator.map(src => counts.getOrElse((src, x), 0L)).sum).toMap
          val nBySrc = sources.map(src =>
            src -> xs.iterator.map(x => counts.getOrElse((src, x), 0L)).sum).toMap
          val nn = nBySrc.valuesIterator.sum
          def round6(v: Double): Double =
            java.math.BigDecimal.valueOf(v)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          sources.iterator.map { src =>
            val n = nBySrc(src)
            var cumS = 0L; var cumX = 0L; var ks = 0.0
            xs.foreach { x =>
              cumS += counts.getOrElse((src, x), 0L)
              cumX += cx(x)
              val diff = math.abs(cumS.toDouble / n -
                (cumX - cumS).toDouble / (nn - n))
              if (diff > ks) ks = diff
            }
            val ksR = round6(ks)
            val crit = round6(1.358 * math.sqrt(
              nn.toDouble / (n.toDouble * (nn - n))))
            KsOut(seq, src, n, ksR, crit, ksR > crit)
          }
      }
  }

  case class BucketState(ids: List[Long])
  case class CandPair(a_id: Long, b_id: Long)

  /** The shared band-bucket state machine of BOTH streaming screens
    * (text minhash bands and embedding hyperplane bands): state is the
    * bucket's member id list (in total the maintained signature
    * artifact), a pair emits exactly once per shared bucket when the
    * LATER of the two arrives (ascending within a trigger, so the
    * output set is arrival-order- and trigger-boundary-independent),
    * replays screen once, and old×old pairs (max ≤ t) are suppressed
    * before anything materializes. Factored once so the suppression /
    * replay rules can never drift between the two screens.
    */
  private def screenBucket(t: Long)(
      rs: Iterator[(Long, Int, Long)],
      state: GroupState[BucketState]): Iterator[CandPair] = {
    var mem = state.getOption.map(_.ids).getOrElse(Nil)
    val memSet = scala.collection.mutable.HashSet.empty[Long]
    mem.foreach(memSet += _)
    val incoming = rs.map(_._1).toSeq.distinct.sorted
    val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
    incoming.foreach { x =>
      if (!memSet.contains(x)) {
        mem.foreach { m =>
          val a = math.min(m, x); val b = math.max(m, x)
          if (b > t) out += CandPair(a, b)
        }
        mem = x :: mem
        memSet += x
      }
    }
    state.update(BucketState(mem))
    out.iterator
  }

  /** The corpus shingle artifact the streaming screen verifies against
    * — the batch pipeline's own word-bigram shingle table (doc_id,
    * shingles, sz), maintained as arriving shards are admitted.
    */
  def corpusShingleArtifact(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.LlmData
    LlmData.shingled(s, dir)
      .select(col("doc_id"), col("shingles"), size(col("shingles")).as("sz"))
      .filter(col("sz") > 0)
  }

  /** Streaming incremental near-dup screen (batch twin:
    * q_dedup_incremental) — the ingest-time face of the shard-arrival
    * workflow: every arriving document is screened against everything
    * admitted before it, WHILE the shard lands, not in a nightly
    * batch. Same candidate machinery as the batch banded path, run
    * incrementally:
    *
    *  - stream side: norm → compiled word-bigram shingles → minhash
    *    signature → banded keys, the EXACT batch expressions (band
    *    count derived from τ and the 0.95 recall target — the
    *    textPairsBanded contract, same fail-fast);
    *  - the maintained BAND TABLE is the state: one group per
    *    (band, band_key) bucket holding member doc_ids — in total the
    *    O(corpus × bands) id table a production pipeline would keep
    *    as its signature artifact, here updated transactionally by
    *    the state store. A pair (a, b) emits exactly once per shared
    *    bucket, when the LATER of the two arrives, so the output SET
    *    is arrival-order- and trigger-boundary-independent;
    *  - pairs where both sides predate the shard threshold `t` are
    *    suppressed INSIDE the bucket transform (max(a,b) > t before
    *    anything materializes — the batch path's own old×old rule);
    *  - candidates then verify EXACTLY against the static shingle
    *    artifact (stream-static joins + one array_intersect), jac ≥ τ.
    *
    * Cross-band collisions emit the same verified pair at-least-once
    * (one per shared bucket); the pair-graph sink upserts on
    * (a_id, b_id) — exactly how the batch artifact absorbs its own
    * `.distinct()` — and the parity spec compares distinct tuple
    * sets against the batch banded path bit-for-bit.
    */
  def dedupScreen(docs: DataFrame, corpusShingles: DataFrame, t: Long,
      tau: Double): DataFrame = {
    import graft.operators.LlmData
    val s = docs.sparkSession
    import s.implicits._
    val bands = LlmData.mhBandsFor(tau, LlmData.MhBandRows, LlmData.MhRecallTarget)
    require(bands <= LlmData.MhMaxBands,
      s"streaming near-dup screen at tau=$tau: band count $bands exceeds " +
        s"${LlmData.MhMaxBands} — raise tau (the textPairsBanded contract)")
    val rows = LlmData.MhBandRows
    val nPerms = (bands * rows).toInt
    val banded = docs
      .withColumn("norm_text", lower(trim(col("text"))))
      .select(col("doc_id"),
        graft.functions.VectorExprs.wordBigramShingles(col("norm_text")).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"),
        graft.functions.VectorExprs.minhashSignature(col("shingles"), nPerms).as("sig"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), " +
          s"b -> xxhash64(b, slice(sig, b * $rows + 1, $rows)))")))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_key"))
      .as[(Long, Int, Long)]
    val cand = banded
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rs, state: GroupState[BucketState]) => screenBucket(t)(rs, state)
      }
    cand.toDF()
      .join(corpusShingles.select(col("doc_id").as("a_id"),
        col("shingles").as("a_sh"), col("sz").as("a_sz")), "a_id")
      .join(corpusShingles.select(col("doc_id").as("b_id"),
        col("shingles").as("b_sh"), col("sz").as("b_sz")), "b_id")
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("jac",
        round(col("inter") / (col("a_sz") + col("b_sz") - col("inter")), 6))
      .filter(col("jac") >= tau)
      .select("a_id", "b_id", "jac")
  }

  /** The corpus embedding artifact (vec_id, v, nrm) the embedding
    * screen verifies against — the batch pipeline's own normed table.
    */
  def corpusEmbeddingArtifact(s: SparkSession, dir: String): DataFrame =
    graft.operators.LlmData.embWithNorms(s, dir)

  def readEmbeddings(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/embeddings.parquet").schema
    s.readStream.schema(schema)
      .option("basePath", dir)
      .parquet(s"$dir/embeddings*.parquet")
  }

  /** Streaming incremental EMBEDDING near-dup screen (batch twin:
    * q_dedup_embed_incr) — the vector-side face of dedupScreen, same
    * bucket-state machinery over hyperplane-LSH bands instead of
    * minhash bands: arriving vectors hash through the batch path's own
    * seeded hyperplane signatures (bits × tables from the SAME
    * derivation contract), the maintained band table lives as
    * (band, sig)-bucket state, a pair emits once per shared bucket
    * when its later side arrives with old×old suppressed inside the
    * transform, and candidates verify exactly (cosine ≥ τ) against
    * the static embedding artifact. Output distinct tuples ≡ the
    * batch banded pair graph filtered to new-involving pairs,
    * bit-for-bit (same signatures ⇒ same buckets ⇒ same candidates ⇒
    * same verified cosines).
    */
  def embedScreen(vecs: DataFrame, corpusEmb: DataFrame, t: Long,
      tau: Double, bits: Int, tables: Int, seed: Long,
      dim: Int = graft.operators.LlmData.EmbDim): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val banded = vecs
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("sigs",
        graft.functions.VectorExprs.hyperplaneSigs(col("v"), seed, tables, bits, dim))
      .select(col("vec_id"), posexplode(col("sigs")))
      .select(col("vec_id"), col("pos").as("band"), col("col").as("sig"))
      .as[(Long, Int, Long)]
    val cand = banded
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rs, state: GroupState[BucketState]) => screenBucket(t)(rs, state)
      }
    cand.toDF()
      .join(corpusEmb.select(col("vec_id").as("a_id"),
        col("v").as("av"), col("nrm").as("an")), "a_id")
      .join(corpusEmb.select(col("vec_id").as("b_id"),
        col("v").as("bv"), col("nrm").as("bn")), "b_id")
      .withColumn("cosine", round(
        graft.functions.VectorExprs.dotF64(col("av"), col("bv")) /
          (col("an") * col("bn")), 6))
      .filter(col("cosine") >= tau)
      .select("a_id", "b_id", "cosine")
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
