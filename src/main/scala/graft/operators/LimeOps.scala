package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.lime.{Lime, LimeText, SpLime}
import graft.lime.Lime.LimeConfig

/** LIME query-contract wiring (SURVEY.md §2.7).
  *
  * The SQL-expressible prefix (stats fit, discretize, closed-form
  * score, kernel on deterministic distances) is oracle-checked; the
  * RNG/linear-algebra stages (perturb, ridge, explain, SP-LIME) are
  * declared without oracle entries — allowed per the driver contract —
  * and graded by LimeSpec property tests instead.
  */
object LimeOps {

  val limeFeatures: Seq[String] = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Fitted training stats are a reusable artifact (like any fitted
    * model): compute once per table and share across the discretize /
    * score / perturb consumers instead of re-running the two stats
    * passes per query. Deterministic (decimal sums + exact
    * percentiles), so caching cannot change results.
    */
  private val statsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Lime.FeatureStats]]()
  private def statsFor(s: SparkSession, dir: String): Seq[Lime.FeatureStats] =
    statsCache.computeIfAbsent(dir, d => Lime.fitStats(lineitem(s, d), limeFeatures))
  /** For benchmarking: drop fitted artifacts so a timed pass measures
    * the stats computation rather than a cache hit. */
  def clearStatsCache(): Unit = statsCache.clear()

  /** Deterministic long instance id for lineitem rows. */
  private def withId(df: DataFrame): DataFrame =
    df.withColumn("instance_id", col("l_orderkey") * 10 + col("l_linenumber"))

  private def instances(s: SparkSession, dir: String, maxOrderkey: Int): DataFrame =
    withId(lineitem(s, dir).filter(col("l_orderkey") <= maxOrderkey))
      .select((Seq("instance_id") ++ limeFeatures).map(col): _*)

  // ===== oracle-checked prefix =====

  def limeStatsFit(s: SparkSession, dir: String): DataFrame = {
    val stats = statsFor(s, dir)
    val session = s
    import session.implicits._
    stats.map(st => (st.name,
        Lime.round6(st.mean), Lime.round6(st.std),
        st.edges(0), st.edges(1), st.edges(2)))
      .toDF("feature", "mean", "std", "q1", "q2", "q3")
      .orderBy("feature")
  }

  def limeDiscretize(s: SparkSession, dir: String): DataFrame = {
    val li = lineitem(s, dir)
    val stats = statsFor(s, dir)
    stats.foldLeft(withId(li)) { (df, st) =>
      df.withColumn(s"${st.name}_bin", Lime.binOf(col(st.name), st.edges))
    }
      .select((Seq("instance_id") ++ limeFeatures.map(_ + "_bin")).map(col): _*)
      .orderBy("instance_id")
  }

  /** Decile discretizer (public LIME `discretizer='decile'`) on one
    * feature — the nBins generalization of the quartile default.
    */
  def limeDiscretizeDecile(s: SparkSession, dir: String): DataFrame = {
    val li = lineitem(s, dir)
    // only the edges are needed — skip fitStats' mean/std/bin passes
    val edges = Lime.exactQuantiles(li, Seq("l_extendedprice"),
      (1 until 10).map(_.toDouble / 10)).head.map(Lime.round6)
    withId(li)
      .withColumn("l_extendedprice_bin", Lime.binOf(col("l_extendedprice"), edges))
      .select("instance_id", "l_extendedprice_bin")
      .orderBy("instance_id")
  }

  def limeScore(s: SparkSession, dir: String): DataFrame = {
    val li = lineitem(s, dir)
    val stats = statsFor(s, dir)
    withId(li)
      .withColumn("pred", round(Lime.logisticScore(stats, limeFeatures.map(col)), 6))
      .select("instance_id", "pred")
      .orderBy("instance_id")
  }

  def limeKernel(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir).select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probes = emb.filter(col("vec_id") < 5).select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val d2 = aggregate(zip_with(col("pv"), col("v"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    broadcast(probes).join(emb, col("probe_id") =!= col("vec_id"))
      .withColumn("dist", round(sqrt(d2), 6))
      .withColumn("kweight", round(sqrt(exp(-d2 / lit(36.0))), 6)) // w = 0.75·√64 = 6
      .select("probe_id", "vec_id", "dist", "kweight")
      .orderBy("probe_id", "vec_id")
  }

  // ===== RNG / linear-algebra stages =====
  // lime_perturb carries a full DuckDB oracle since round 11 (the
  // XxSql hash-chain replay); the ridge/select/explain stages remain
  // spec-graded — their d×d solves have no SQL form.

  def limePerturb(s: SparkSession, dir: String): DataFrame = {
    val stats = statsFor(s, dir)
    val inst = instances(s, dir, 2)
    Lime.perturb(inst, "instance_id", stats, LimeConfig(nSamples = 8))
      .select((Seq("instance_id", "sample_id") ++
        limeFeatures.flatMap(f => Seq(s"${f}__bin", s"${f}__z", s"${f}__val"))).map(col): _*)
      .orderBy("instance_id", "sample_id")
  }

  def limeFitRidge(s: SparkSession, dir: String): DataFrame =
    Lime.explainTabular(instances(s, dir, 20), "instance_id", limeFeatures,
      LimeConfig(nSamples = 256, kFeatures = 4))

  def limeSelectTopk(s: SparkSession, dir: String): DataFrame =
    Lime.explainTabular(instances(s, dir, 20), "instance_id", limeFeatures,
      LimeConfig(nSamples = 256, kFeatures = 2))

  def limeExplainTabular(s: SparkSession, dir: String): DataFrame =
    Lime.explainTabular(instances(s, dir, 10), "instance_id", limeFeatures,
      LimeConfig(nSamples = 512, kFeatures = 4))

  /** Mixed numeric + categorical explanation: l_returnflag /
    * l_linestatus perturb by training-frequency resampling (public
    * LIME categorical semantics), scored by a closed-form logistic
    * where returnflag='R' carries the dominant signal.
    */
  def limeExplainCat(s: SparkSession, dir: String): DataFrame = {
    val numFeats = Seq("l_quantity", "l_discount")
    val catFeats = Seq("l_returnflag", "l_linestatus")
    val inst = withId(lineitem(s, dir).filter(col("l_orderkey") <= 10))
      .select((Seq("instance_id") ++ numFeats ++ catFeats).map(col): _*)
    val stats = statsFor(s, dir).filter(st => numFeats.contains(st.name))
    val scoreFn: DataFrame => DataFrame = { df =>
      val lin = lit(0.2) +
        lit(0.6) * (col("l_quantity__val") - lit(stats(0).mean)) / lit(stats(0).std) +
        lit(-0.4) * (col("l_discount__val") - lit(stats(1).mean)) / lit(stats(1).std) +
        when(col("l_returnflag__val") === "R", 1.5).otherwise(0.0) +
        when(col("l_linestatus__val") === "F", -0.8).otherwise(0.0)
      df.withColumn("pred", lit(1.0) / (lit(1.0) + exp(-lin)))
    }
    Lime.explainTabular(inst, "instance_id", numFeats,
      LimeConfig(nSamples = 512, kFeatures = 4), Some(scoreFn), catFeats)
  }

  def limeExplainText(s: SparkSession, dir: String): DataFrame =
    LimeText.explainText(documents(s, dir).filter(col("doc_id") < 5), "doc_id", "text",
      LimeConfig(nSamples = 64, kFeatures = 10, kernelWidth = Some(25.0)))

  /** LIME image explanations over the multimodal plumbing: each probe
    * embedding serialized to its F32LE storage bytes (the qMmFeatures
    * object-store stand-in) becomes an opaque 8×8 "image" blob;
    * LimeImage decodes, grid-segments into 16 superpixels, and
    * explains the stand-in classifier. The decode step is the
    * documented pluggable seam for real codecs.
    */
  def limeExplainImage(s: SparkSession, dir: String): DataFrame = {
    val session = s
    import session.implicits._
    val images = embeddings(s, dir)
      .filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val bb = java.nio.ByteBuffer.allocate(4 * v.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        v.foreach(bb.putFloat)
        (id, bb.array())
      }
      .toDF("doc_id", "payload")
    graft.lime.LimeImage.explainImage(images)
  }

  /** The one explanation matrix both SP-LIME rows consume (pick's
    * greedy coverage and the importance vector) — ONE statement of
    * the instance set and config so the two graded rows can never
    * drift apart.
    */
  private[graft] def spLimeExplanations(s: SparkSession, dir: String): DataFrame =
    Lime.explainTabular(instances(s, dir, 10), "instance_id", limeFeatures,
      LimeConfig(nSamples = 256, kFeatures = 4))

  /** Oracle-less companion to `sp_lime_pick` (`sp_lime_importance`):
    * the global feature-importance vector I_j = √(Σ_i |W_ij|) that
    * Algorithm 2 maximizes coverage of, emitted as its own graded
    * row. W is the ridge output of the RNG-driven explanation
    * pipeline, so no DuckDB twin can exist (the driver records the
    * rows-only check); LimeSpec pins determinism and I ≡ an
    * independent driver-side recomputation from the explanation
    * matrix — the hash-trust upgrade for the greedy loop's input.
    */
  def spLimeImportance(s: SparkSession, dir: String): DataFrame =
    spLimeExplanations(s, dir)
      .select(col("feature"), abs(col("weight")).as("aw"))
      .filter(col("aw") > 0)
      .groupBy("feature")
      .agg(round(sqrt(sum(col("aw"))), 6).as("importance"),
        count(lit(1)).as("n_instances"))
      .orderBy("feature")

  def spLimePick(s: SparkSession, dir: String): DataFrame = {
    val expl = spLimeExplanations(s, dir)
    val picked = SpLime.pick(expl, b = 3)
    val session = s
    import session.implicits._
    picked.toDF("round", "instance_id", "gain")
      .withColumn("gain", round(col("gain"), 6))
      .orderBy("round")
  }

  // ===== oracle SQL =====

  /** DuckDB replay of Spark's `xxhash64` — the machinery that turns
    * lime_perturb from spec-trust into oracle-trust. Spark's RNG is a
    * PURE function of the counter tuple (Rng.scala: xxhash64 over
    * (seed, instance_id, sample_id, feature)), and XXH64 is ~10
    * wrapping 64-bit ops per value, so DuckDB can re-derive every
    * uniform bit-for-bit: unsigned 64-bit state lives in HUGEINT
    * ∈ [0, 2⁶⁴), wrap-multiply is the 32-bit-split identity
    * a·b mod 2⁶⁴ = (a_lo·b + (a_hi·b mod 2³²)·2³²) mod 2⁶⁴ (all
    * intermediates < 2⁹⁷ — inside HUGEINT), rotations are two exact
    * power-of-two shifts, and xor round-trips through signed BIGINT.
    * Each step becomes ONE chained-CTE column, so the expression tree
    * stays linear (inlining would double per step through the split
    * multiply). Constant subchains (the seed hash, the feature-name
    * word/tail constants) fold at generation time in Scala BigInt —
    * the same public algorithm, executed once.
    */
  private object XxSql {
    val MASK: BigInt = (BigInt(1) << 64) - 1
    val P1 = BigInt("9E3779B185EBCA87", 16); val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
    val P3 = BigInt("165667B19E3779F9", 16); val P4 = BigInt("85EBCA77C2B2AE63", 16)
    val P5 = BigInt("27D4EB2F165667C5", 16)
    private val M64 = "18446744073709551616::HUGEINT"
    private val M32 = "4294967296::HUGEINT"
    def rotlC(x: BigInt, r: Int): BigInt = ((x << r) | (x >> (64 - r))) & MASK
    def mulC(a: BigInt, b: BigInt): BigInt = (a * b) & MASK

    class Chain {
      val defs = scala.collection.mutable.ArrayBuffer[String]() // defs(i) defines column xi
      private def add(expr: String): String = { defs += expr; s"x${defs.size - 1}" }
      def mulmod(a: String, b: BigInt): String =
        add(s"((($a) % $M32) * $b::HUGEINT + ((($a) // $M32) * $b::HUGEINT % $M32) * $M32) % $M64")
      def addmod(a: String, c: BigInt): String = add(s"(($a) + $c::HUGEINT) % $M64")
      def rotl(a: String, r: Int): String =
        add(s"(($a) * ${BigInt(1) << r}::HUGEINT % $M64 + ($a) // ${BigInt(1) << (64 - r)}::HUGEINT)")
      def shr(a: String, r: Int): String = add(s"(($a) // ${BigInt(1) << r}::HUGEINT)")
      private def sgn(a: String): String =
        s"(CASE WHEN ($a) >= 9223372036854775808::HUGEINT THEN CAST(($a) - $M64 AS BIGINT) ELSE CAST(($a) AS BIGINT) END)"
      private def unsgn(a: String): String =
        add(s"(CASE WHEN ($a) < 0 THEN CAST(($a) AS HUGEINT) + $M64 ELSE CAST(($a) AS HUGEINT) END)")
      def xor(a: String, b: String): String = unsgn(add(s"xor(${sgn(a)}, ${sgn(b)})"))
      def xorC(a: String, c: BigInt): String = {
        val lit = if (c >= (BigInt(1) << 63)) (c - (BigInt(1) << 64)).toString else c.toString
        unsgn(add(s"xor(${sgn(a)}, $lit::BIGINT)"))
      }
      def const(c: BigInt): String = add(s"$c::HUGEINT")
      def fmix(h0: String): String = {
        val a = xor(h0, shr(h0, 33)); val b = mulmod(a, P2)
        val c = xor(b, shr(b, 29)); val d = mulmod(c, P3)
        xor(d, shr(d, 32))
      }
      /** Spark XXH64.hashLong of a non-negative BIGINT column, constant seed. */
      def hashLongC(v: String, seed: BigInt): String = {
        val h0 = const((seed + P5 + 8) & MASK)
        val k1 = mulmod(rotl(mulmod(v, P2), 31), P1)
        fmix(addmod(mulmod(rotl(xor(h0, k1), 27), P1), P4))
      }
      /** Spark XXH64.hashInt of a column in [0, 2³²), dynamic seed. */
      def hashInt(v: String, seed: String): String = {
        val h0 = addmod(seed, P5 + 4)
        fmix(addmod(mulmod(rotl(xor(h0, mulmod(v, P1)), 23), P2), P3))
      }
      /** Spark XXH64.hashUnsafeBytes of a CONSTANT byte string (< 32 B),
        * dynamic seed — word/tail constants folded at generation time.
        */
      def hashConstBytes(bytes: Array[Byte], seed: String): String = {
        val n = bytes.length
        require(n < 32, "constant-string hash supports < 32 bytes")
        var h = addmod(seed, P5 + n)
        var off = 0
        while (off + 8 <= n) {
          val w = BigInt(1, bytes.slice(off, off + 8).reverse) // little-endian
          h = addmod(mulmod(rotl(xorC(h, mulC(rotlC(mulC(w, P2), 31), P1)), 27), P1), P4)
          off += 8
        }
        if (off + 4 <= n) {
          val w = BigInt(1, bytes.slice(off, off + 4).reverse)
          h = addmod(mulmod(rotl(xorC(h, mulC(w, P1)), 23), P2), P3)
          off += 4
        }
        while (off < n) {
          h = mulmod(rotl(xorC(h, mulC(BigInt(bytes(off) & 0xff), P5)), 11), P1)
          off += 1
        }
        fmix(h)
      }
      /** Rng.u01: top-53-bits uniform, identical association. */
      def u01(h: String): String =
        add(s"(CAST(${shr(h, 11)} AS DOUBLE) + 0.5) / 9007199254740992.0")
      /** The chained CTEs: t0 AS (SELECT *, e0 AS x0 FROM base), ... */
      def ctes(base: String): (String, String) = {
        val parts = defs.zipWithIndex.map { case (e, i) =>
          val src = if (i == 0) base else s"t${i - 1}"
          s"t$i AS (SELECT *, $e AS x$i FROM $src)"
        }
        (parts.mkString(",\n"), s"t${defs.size - 1}")
      }
    }
  }

  /** The lime_perturb oracle: every stage of the perturb fan-out
    * replayed in DuckDB — sampling uniforms from the XxSql hash chain
    * (bit-identical to Rng.u01), bin edges from round-6 quantile_cont
    * (the lime_discretize equivalence), cumulative bin frequencies
    * from exact long counts with the same left-to-right double adds,
    * bin means from exact decimal sums (the fitStats pass-2
    * firewall), and the same reverse-fold bin pick / z flag / value
    * lookup. Seed 42 (Long) ⇒ the seed hash folds to a constant.
    */
  private def perturbOracleSql(nSamples: Int, maxOrderkey: Int): String = {
    val seedHash = { // hashLong(42, 42) — constant-folded in Scala
      import XxSql._
      def fmixC(h0: BigInt): BigInt = {
        var h = h0
        h ^= h >> 33; h = mulC(h, P2); h ^= h >> 29; h = mulC(h, P3); h ^= h >> 32
        h
      }
      val h0 = (BigInt(42) + P5 + 8) & MASK
      val k1 = mulC(rotlC(mulC(BigInt(42), P2), 31), P1)
      fmixC(mulC(rotlC(h0 ^ k1, 27), P1) + P4 & MASK)
    }
    val ch = new XxSql.Chain
    val hId = ch.hashLongC("CAST(instance_id AS HUGEINT)", seedHash)
    val hSamp = ch.hashInt("CAST(sample_id AS HUGEINT)", hId)
    val feats = limeFeatures
    val uCols = feats.map(f => f -> ch.u01(ch.hashConstBytes(f.getBytes("UTF-8"), hSamp))).toMap
    val (chainCtes, lastT) = ch.ctes("base")
    def p(f: String) = f.split("_").last.take(2) // short prefix per feature
    val edgeCols = feats.map { f =>
      Seq(0.25, 0.5, 0.75).zipWithIndex.map { case (q, i) =>
        s"ROUND(quantile_cont($f, $q), 6) AS ${p(f)}_e${i + 1}"
      }.mkString(", ")
    }.mkString(",\n    ")
    def binExpr(x: String, f: String) =
      s"(CASE WHEN $x > ${p(f)}_e3 THEN 3 WHEN $x > ${p(f)}_e2 THEN 2 WHEN $x > ${p(f)}_e1 THEN 1 ELSE 0 END)"
    val binStatCols = feats.flatMap { f =>
      (0 until 4).flatMap { b =>
        Seq(
          s"CAST(SUM(CASE WHEN ${binExpr(f, f)} = $b THEN CAST($f AS DECIMAL(19,6)) END) AS DOUBLE) / GREATEST(SUM(CASE WHEN ${binExpr(f, f)} = $b THEN 1 ELSE 0 END), 1) AS ${p(f)}_bm$b",
          s"CAST(SUM(CASE WHEN ${binExpr(f, f)} = $b THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS ${p(f)}_bf$b")
      }
    }.mkString(",\n    ")
    val cumCols = feats.flatMap { f =>
      Seq(s"${p(f)}_bf0 AS ${p(f)}_c0",
        s"${p(f)}_bf0 + ${p(f)}_bf1 AS ${p(f)}_c1",
        s"(${p(f)}_bf0 + ${p(f)}_bf1) + ${p(f)}_bf2 AS ${p(f)}_c2")
    }.mkString(", ")
    val outCols = feats.map { f =>
      val u = uCols(f)
      val sbin = s"(CASE WHEN $u < ${p(f)}_c0 THEN 0 WHEN $u < ${p(f)}_c1 THEN 1 WHEN $u < ${p(f)}_c2 THEN 2 ELSE 3 END)"
      val ibin = binExpr(f, f)
      val bin = s"(CASE WHEN sample_id = 0 THEN $ibin ELSE $sbin END)"
      val bm = s"(CASE $bin WHEN 0 THEN ${p(f)}_bm0 WHEN 1 THEN ${p(f)}_bm1 WHEN 2 THEN ${p(f)}_bm2 ELSE ${p(f)}_bm3 END)"
      s"""  $bin AS ${f}__bin,
         |  CASE WHEN $bin = $ibin THEN 1.0 ELSE 0.0 END AS ${f}__z,
         |  CASE WHEN sample_id = 0 THEN $f ELSE $bm END AS ${f}__val""".stripMargin
    }.mkString(",\n")
    s"""WITH inst AS (
       |  SELECT l_orderkey * 10 + l_linenumber AS instance_id,
       |    ${feats.mkString(", ")}
       |  FROM lineitem WHERE l_orderkey <= $maxOrderkey
       |),
       |base AS (
       |  SELECT inst.*, s.sample_id
       |  FROM inst CROSS JOIN (SELECT unnest(generate_series(0, ${nSamples - 1})) AS sample_id) s
       |),
       |q AS (
       |  SELECT
       |    $edgeCols
       |  FROM lineitem
       |),
       |bs AS (
       |  SELECT
       |    $binStatCols
       |  FROM lineitem CROSS JOIN q
       |),
       |bs2 AS (SELECT *, $cumCols FROM bs),
       |$chainCtes
       |SELECT instance_id, sample_id,
       |$outCols
       |FROM $lastT CROSS JOIN q CROSS JOIN bs2
       |ORDER BY instance_id, sample_id""".stripMargin
  }

  private def statsCte = {
    def one(f: String) =
      s"""SELECT '$f' AS feature,
         |  ROUND(CAST(SUM(CAST($f AS DECIMAL(19,6))) AS DOUBLE) / COUNT(*), 6) AS mean,
         |  ROUND(CASE WHEN COUNT(*) < 2 THEN 1e-12
         |    ELSE GREATEST(SQRT(GREATEST((CAST(SUM(CAST($f AS DECIMAL(19,6)) * CAST($f AS DECIMAL(19,6))) AS DOUBLE)
         |    - CAST(SUM(CAST($f AS DECIMAL(19,6))) AS DOUBLE) * CAST(SUM(CAST($f AS DECIMAL(19,6))) AS DOUBLE) / COUNT(*))
         |    / (COUNT(*) - 1.0), 0.0)), 1e-12) END, 6) AS std,
         |  ROUND(quantile_cont($f, 0.25), 6) AS q1,
         |  ROUND(quantile_cont($f, 0.5), 6) AS q2,
         |  ROUND(quantile_cont($f, 0.75), 6) AS q3
         |FROM lineitem""".stripMargin
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map(one).mkString("\nUNION ALL\n")
  }

  val oracle: Map[String, String] = Map(
    "lime_stats_fit" -> s"SELECT * FROM (\n$statsCte\n) ORDER BY feature",
    "lime_discretize" ->
      """WITH q AS (
        |  SELECT ROUND(quantile_cont(l_quantity, 0.25), 6) AS qq1, ROUND(quantile_cont(l_quantity, 0.5), 6) AS qq2, ROUND(quantile_cont(l_quantity, 0.75), 6) AS qq3,
        |         ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS eq1, ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS eq2, ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS eq3,
        |         ROUND(quantile_cont(l_discount, 0.25), 6) AS dq1, ROUND(quantile_cont(l_discount, 0.5), 6) AS dq2, ROUND(quantile_cont(l_discount, 0.75), 6) AS dq3,
        |         ROUND(quantile_cont(l_tax, 0.25), 6) AS tq1, ROUND(quantile_cont(l_tax, 0.5), 6) AS tq2, ROUND(quantile_cont(l_tax, 0.75), 6) AS tq3
        |  FROM lineitem
        |)
        |SELECT l_orderkey * 10 + l_linenumber AS instance_id,
        |  CASE WHEN l_quantity > qq3 THEN 3 WHEN l_quantity > qq2 THEN 2 WHEN l_quantity > qq1 THEN 1 ELSE 0 END AS l_quantity_bin,
        |  CASE WHEN l_extendedprice > eq3 THEN 3 WHEN l_extendedprice > eq2 THEN 2 WHEN l_extendedprice > eq1 THEN 1 ELSE 0 END AS l_extendedprice_bin,
        |  CASE WHEN l_discount > dq3 THEN 3 WHEN l_discount > dq2 THEN 2 WHEN l_discount > dq1 THEN 1 ELSE 0 END AS l_discount_bin,
        |  CASE WHEN l_tax > tq3 THEN 3 WHEN l_tax > tq2 THEN 2 WHEN l_tax > tq1 THEN 1 ELSE 0 END AS l_tax_bin
        |FROM lineitem, q ORDER BY instance_id""".stripMargin,
    "lime_discretize_decile" -> {
      val edges = (1 to 9).map(i =>
        s"ROUND(quantile_cont(l_extendedprice, 0.$i), 6) AS e$i").mkString(", ")
      val chain = (9 to 1 by -1).map(i =>
        s"WHEN l_extendedprice > e$i THEN $i").mkString(" ")
      s"""WITH q AS (SELECT $edges FROM lineitem)
         |SELECT l_orderkey * 10 + l_linenumber AS instance_id,
         |  CASE $chain ELSE 0 END AS l_extendedprice_bin
         |FROM lineitem, q ORDER BY instance_id""".stripMargin
    },
    // Full RNG replay — see perturbOracleSql / XxSql scaladoc.
    "lime_perturb" -> perturbOracleSql(8, 2),
    "lime_score" ->
      """WITH st AS (
        |  SELECT
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) / COUNT(*) AS mq,
        |    GREATEST(SQRT(GREATEST((CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) - CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) / COUNT(*)) / (COUNT(*) - 1.0), 0.0)), 1e-12) AS sq,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) / COUNT(*) AS me,
        |    GREATEST(SQRT(GREATEST((CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) - CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) / COUNT(*)) / (COUNT(*) - 1.0), 0.0)), 1e-12) AS se,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(19,6))) AS DOUBLE) / COUNT(*) AS md,
        |    GREATEST(SQRT(GREATEST((CAST(SUM(CAST(l_discount AS DECIMAL(19,6)) * CAST(l_discount AS DECIMAL(19,6))) AS DOUBLE) - CAST(SUM(CAST(l_discount AS DECIMAL(19,6))) AS DOUBLE) * CAST(SUM(CAST(l_discount AS DECIMAL(19,6))) AS DOUBLE) / COUNT(*)) / (COUNT(*) - 1.0), 0.0)), 1e-12) AS sd,
        |    CAST(SUM(CAST(l_tax AS DECIMAL(19,6))) AS DOUBLE) / COUNT(*) AS mt,
        |    GREATEST(SQRT(GREATEST((CAST(SUM(CAST(l_tax AS DECIMAL(19,6)) * CAST(l_tax AS DECIMAL(19,6))) AS DOUBLE) - CAST(SUM(CAST(l_tax AS DECIMAL(19,6))) AS DOUBLE) * CAST(SUM(CAST(l_tax AS DECIMAL(19,6))) AS DOUBLE) / COUNT(*)) / (COUNT(*) - 1.0), 0.0)), 1e-12) AS st_
        |  FROM lineitem
        |)
        |SELECT l_orderkey * 10 + l_linenumber AS instance_id,
        |  ROUND(1.0 / (1.0 + EXP(-(0.1 + 0.8 * (l_quantity - mq) / sq + -0.5 * (l_extendedprice - me) / se + 1.2 * (l_discount - md) / sd + -0.7 * (l_tax - mt) / st_))), 6) AS pred
        |FROM lineitem, st ORDER BY instance_id""".stripMargin,
    "lime_kernel" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |SELECT p.vec_id AS probe_id, b.vec_id AS vec_id,
        |  ROUND(SQRT(list_sum(list_transform(generate_series(1, 64), i -> (p.e[i] - b.e[i]) * (p.e[i] - b.e[i])))), 6) AS dist,
        |  ROUND(SQRT(EXP(-list_sum(list_transform(generate_series(1, 64), i -> (p.e[i] - b.e[i]) * (p.e[i] - b.e[i]))) / 36.0)), 6) AS kweight
        |FROM v p JOIN v b ON p.vec_id < 5 AND b.vec_id <> p.vec_id
        |ORDER BY probe_id, b.vec_id""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lime_stats_fit" -> (limeStatsFit _),
    "lime_discretize" -> (limeDiscretize _),
    "lime_discretize_decile" -> (limeDiscretizeDecile _),
    "lime_score" -> (limeScore _),
    "lime_kernel" -> (limeKernel _),
    "lime_perturb" -> (limePerturb _),
    "lime_fit_ridge" -> (limeFitRidge _),
    "lime_select_topk" -> (limeSelectTopk _),
    "lime_explain_tabular" -> (limeExplainTabular _),
    "lime_explain_cat" -> (limeExplainCat _),
    "lime_explain_text" -> (limeExplainText _),
    "lime_image" -> (limeExplainImage _),
    "sp_lime_pick" -> (spLimePick _),
    "sp_lime_importance" -> (spLimeImportance _)
  )
}
