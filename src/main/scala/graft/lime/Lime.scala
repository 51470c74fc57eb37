package graft.lime

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed LIME for tabular data (SURVEY.md §2.7).
  *
  * Semantics follow the public algorithm (Ribeiro, Singh & Guestrin,
  * KDD 2016) and the canonical implementation defaults
  * (marcotcr/lime): quartile discretization of continuous features,
  * binary interpretable representation "falls in the same bin as the
  * instance", proximity kernel sqrt(exp(-d²/w²)) with default width
  * 0.75·√d', weighted Ridge(α=1) surrogate, top-K features by |coef|.
  *
  * Distribution strategy: one stats job (O(features) driver
  * materialization, broadcast back as plan literals), then a single
  * narrow stage for perturb→score→kernel (counter-based RNG — see
  * Rng — keeps it partition-layout-independent), one shuffle on
  * instance_id for the ridge Aggregator, and a shuffle-free window
  * for top-K. Shuffled bytes are O(instances·d'²), not O(instances·N).
  */
object Lime {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** @param discretize quartile-discretized sampling with a binary
    *   interpretable representation (public LIME default); false =
    *   gaussian sampling around the instance with z-scored features
    *   (`discretize_continuous=False, sample_around_instance=True`)
    * @param selection "highest_weights", "forward_selection", "none"
    *   (keep every feature, public LIME feature_selection='none'), or
    *   "auto" (forward selection when d' <= 6, like the public impl)
    */
  case class LimeConfig(
      nSamples: Int = 1000,
      kFeatures: Int = 4,
      kernelWidth: Option[Double] = None,
      seed: Long = 42,
      lambda: Double = 1.0,
      discretize: Boolean = true,
      selection: String = "highest_weights",
      nBins: Int = 4)  // 4 = quartile (public default), 10 = decile

  /** Per-feature training statistics: mean/std (exact decimal sums),
    * quartile bin edges (rounded to 6dp as the cross-engine firewall),
    * per-bin means and frequencies for perturbation sampling.
    */
  case class FeatureStats(
      name: String,
      mean: Double,
      std: Double,
      edges: Seq[Double],          // q1, q2, q3 rounded to 6dp
      binMeans: Seq[Double],       // representative value per bin (4)
      binCumFreqs: Seq[Double])    // cumulative bin frequencies (4, last=1)

  /** Categorical feature statistics: distinct values (sorted, so the
    * sampling when-chain is deterministic) with cumulative training
    * frequencies. Cardinality must be bounded (it becomes plan
    * literals) — enforce with `maxCard`.
    */
  case class CatStats(name: String, values: Seq[String], cumFreqs: Seq[Double])

  def fitCatStats(df: DataFrame, features: Seq[String], maxCard: Int = 64): Seq[CatStats] = {
    features.map { f =>
      val rows = df.groupBy(f).agg(count(lit(1)).as("n")).orderBy(f).collect()
      require(rows.length <= maxCard,
        s"categorical feature $f has ${rows.length} distinct values (> $maxCard)")
      val total = rows.map(_.getLong(1)).sum.toDouble
      val cum = rows.map(_.getLong(1) / total).scanLeft(0.0)(_ + _).tail
      CatStats(f, rows.map(_.get(0).toString).toVector, cum.toVector.updated(rows.length - 1, 1.0))
    }
  }

  /** HALF_UP 6-dp rounding — the one cross-engine rule (Spark round()
    * and DuckDB ROUND are both half-up; math.rint is half-even and
    * diverges on exact halves).
    */
  def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // 19,6: >18 digits forces int128 decimal storage in DuckDB (int64
  // products of scale-6 values overflow), and 19+19 stays at the 38 cap
  private val D6 = "decimal(19,6)"

  /** Deterministic mean/std/bin-edges in one pass + bin stats in a
    * second pass. Sums go through DECIMAL so partition order can't
    * change results (SURVEY.md §7.4).
    *
    * `nBins` = 4 gives the public quartile discretizer (default);
    * 10 gives the decile discretizer (`discretizer='decile'`).
    */
  /** @param smallInput single-job `percentile` aggregate for the bin
    *   edges instead of the distributed value-count CDF — same values
    *   (identical interpolation formula), fewer jobs. Right for
    *   explain-time instance sets (tens-to-thousands of rows); wrong
    *   for corpus-level fits where the Percentile map-aggregate's
    *   per-partition value→count maps dominate.
    */
  def fitStats(dfIn: DataFrame, features: Seq[String], nBins: Int = 4,
               smallInput: Boolean = false): Seq[FeatureStats] = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    // The corpus fit runs FOUR whole-table aggregates (moments +
    // sketch, below-counts, bracket census, bin stats); cache the
    // pruned feature projection across them so passes 2-4 read the
    // in-memory columns instead of re-scanning and re-decoding the
    // source (features × 8 bytes per row — ~20 MB at bench scale).
    // Values are unchanged: same rows, same expressions. The tiny
    // explain-time fits (smallInput) skip the cache churn.
    val df = if (smallInput) dfIn else dfIn.select(features.map(col): _*).cache()
    try fitStatsInner(df, features, nBins, smallInput)
    finally if (!smallInput) df.unpersist(blocking = false)
  }

  private def fitStatsInner(df: DataFrame, features: Seq[String], nBins: Int,
                            smallInput: Boolean): Seq[FeatureStats] = {
    def r6(v: Double): Double = round6(v)
    def ph[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      if (sys.env.contains("GRAFT_PROFILE"))
        println(f"[fit-phase] $name%-16s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val ps = (1 until nBins).map(_.toDouble / nBins)
    // Exact mean/std in primitive LONG micro-units instead of decimal
    // sums: m = unscaled(cast(x AS DECIMAL(18,6))) — the SAME
    // string-based HALF_UP quantization as the decimal path, extracted
    // once per row (one bounded decimal multiply), and m² split as
    // (q·10⁶+r)² = q²·10¹² + 2qr·10⁶ + r² so each part sums inside
    // int64. The partial sums reassemble the exact 10⁻¹²-unit integer
    // on the driver — bit-identical to cast(sum(decimal) as double),
    // with codegen'd long aggregation instead of BigDecimal buffers.
    // Fallback to the full decimal path when (a) any value overflowed
    // the DECIMAL(18,6) cast (m null where x isn't: |x| ≥ 10¹²) or
    // (b) the post-hoc (count, max|m|) bound says a sum could wrap.
    def micro(f: String): Column =
      (col(f).cast("decimal(18,6)") * lit(1000000L).cast("decimal(7,0)"))
        .cast("long")
    val momentCols = features.flatMap { f =>
      val m = micro(f)
      val r = pmod(m, lit(1000000L))
      // (m−r) is an exact multiple of 10⁶ and < 2⁵³, so the double
      // division is exact; cast back to long for the long-only sums
      val q = ((m - r) / lit(1000000L)).cast("long")
      Seq(
        sum(m).as(s"${f}__sm"),
        sum(q * q).as(s"${f}__sqq"),
        sum(q * r).as(s"${f}__sqr"),
        sum(r * r).as(s"${f}__srr"),
        max(abs(m)).as(s"${f}__maxm"),
        max(r).as(s"${f}__maxr"),
        count(col(f)).as(s"${f}__nx"),
        count(m).as(s"${f}__nm"))
    } ++ Seq(count(lit(1)).as("__n"))
    // smallInput: ONE fused aggregate job exactly as before (moments +
    // exact percentile). Corpus path: the sketch's TypedImperativeAggregate
    // would force the whole fused aggregate into interpreted
    // ObjectHashAggregate — measured 1.32 s fused vs 0.62 s (codegen
    // moments) + 0.63 s (sketch) SEPARATE at bench scale — so the two
    // run as independent overlapped jobs instead (guide §2.6), with the
    // shared projection cache populated once up front.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val (r1, rSketch) =
      if (smallInput) {
        val pass1 = momentCols ++ features.map { f =>
          // functions.percentile (exact), col(f)-based — no SQL-string
          // interpolation, so quoted/exotic column names keep working
          percentile(col(f), array(ps.map(lit): _*)).as(s"${f}__q")
        }
        val r = ph("pass1")(df.agg(pass1.head, pass1.tail: _*).head())
        (r, r)
      } else {
        implicit val ec: ExecutionContext = ExecutionContext.global
        ph("populate")(df.count()) // build the cache once, not racily twice
        val momentsF = Future {
          ph("moments")(df.agg(momentCols.head, momentCols.tail: _*).head())
        }
        // bracket job (A): approx sketch + the non-null counts the
        // read-off needs (exactQuantilesFromSketch reads `${f}__nx`)
        val sketchCols = features.map(f => count(col(f)).as(s"${f}__nx")) ++
          quantileSketchCols(features, ps)
        val rs = ph("sketch")(df.agg(sketchCols.head, sketchCols.tail: _*).head())
        (Await.result(momentsF, Duration.Inf), rs)
      }
    val n = r1.getAs[Long]("__n")
    val longSafe = n > 0 && features.forall { f =>
      val maxm = BigInt(math.max(r1.getAs[Long](s"${f}__maxm"), 1L))
      val maxq = maxm / 1000000L + 1
      val maxr = BigInt(math.max(r1.getAs[Long](s"${f}__maxr"), 1L))
      // no decimal-cast overflow, and exact no-wrap bounds for Σm,
      // Σq², Σqr, Σr²: |Σx| <= n·max|x| per term, so no extra margin —
      // the observed max(r) keeps the r² bound from capping the fast
      // path at ~2.3M rows the way a blanket (10⁶)² term would
      r1.getAs[Long](s"${f}__nx") == r1.getAs[Long](s"${f}__nm") &&
        Seq(maxm, maxq * maxq, maxq * maxr, maxr * maxr)
          .forall(b => BigInt(n) * b < Long.MaxValue)
    }
    if (!longSafe) log.info(
      s"fitStats: long fast path unsafe for n=$n (overflow bound or nulls); using decimal fallback")
    val moments: Map[String, (Double, Double)] =
      if (longSafe) features.map { f =>
        val sumD = BigDecimal(BigInt(r1.getAs[Long](s"${f}__sm")), 6).toDouble
        val sumsqUnscaled =
          BigInt(r1.getAs[Long](s"${f}__sqq")) * BigInt(10).pow(12) +
          BigInt(r1.getAs[Long](s"${f}__sqr")) * 2000000L +
          BigInt(r1.getAs[Long](s"${f}__srr"))
        val sumsqD = BigDecimal(sumsqUnscaled, 12).toDouble
        f -> (sumD, sumsqD)
      }.toMap
      else {
        // decimal fallback: magnitudes large enough to wrap int64
        val p = features.flatMap { f =>
          val x = col(f).cast(D6)
          Seq(sum(x).cast("double").as(s"${f}__sd"),
              sum(x * x).cast("double").as(s"${f}__ssd"))
        }
        val r = df.agg(p.head, p.tail: _*).head()
        features.map(f => f -> (r.getAs[Double](s"${f}__sd"), r.getAs[Double](s"${f}__ssd"))).toMap
      }
    def g(name: String): Double = {
      val f = name.stripSuffix("__mean").stripSuffix("__std")
      val (sumD, sumsqD) = moments(f)
      if (name.endsWith("__mean")) sumD / n
      else {
        val v = math.sqrt((sumsqD - sumD * sumD / n) / (n - 1.0))
        math.max(if (v.isNaN) 0.0 else v, 1e-12)
      }
    }
    val edges =
      if (smallInput)
        features.map { f =>
          val qs = r1.getAs[scala.collection.Seq[Double]](s"${f}__q")
          require(qs != null && n > 0,
            s"fitStats: feature $f has no non-null values")
          qs.toVector.map(r6)
        }
      else ph("sketchReadoff")(exactQuantilesFromSketch(df, features, ps, rSketch)).map(_.map(r6))

    // Bin means go through the exact-integer firewall (exact per-bin
    // micro-unit sums → one double division), and bin frequencies were
    // always exact long counts → one division — so BOTH are
    // partition-order-independent AND engine-replicable. This is what
    // lets lime_perturb carry a DuckDB oracle: the sampling
    // thresholds (cumFreqs) and the emitted __val (binMeans) must be
    // bit-reproducible from SQL, not 1e-13-wobbly double sums.
    // When longSafe holds, the per-bin sums ride the SAME micro-unit
    // LONG lattice as the moments (each bin's sum is a subset of Σm,
    // so the no-wrap bound holds a fortiori) — codegen'd long
    // aggregation, measured 0.64 s vs 0.90 s for the decimal form at
    // bench scale; the unscaled integer is identical, so the closing
    // division is the same IEEE op on the same values. Null features
    // fall to bin 0 in the COUNT but stay out of the SUM (null m),
    // exactly like the decimal form (sum skips nulls).
    val binStats: Map[String, (IndexedSeq[Double], IndexedSeq[Double])] =
      if (longSafe) {
        val pass2 = features.zip(edges).flatMap { case (f, e) =>
          val bin = binOf(col(f), e)
          val m = micro(f)
          (0 until nBins).flatMap { b =>
            Seq(
              sum(when(bin === b, m)).as(s"${f}__bs$b"),
              sum(when(bin === b, 1L).otherwise(0L)).as(s"${f}__bc$b"))
          }
        }
        val r2 = ph("pass2")(df.agg(pass2.head, pass2.tail: _*).head())
        features.map { f =>
          val cnts = (0 until nBins).map(b => r2.getAs[Long](s"${f}__bc$b"))
          val means = (0 until nBins).map { b =>
            val i = r2.fieldIndex(s"${f}__bs$b")
            // empty bin: the decimal form read a NULL sum back as 0.0
            if (r2.isNullAt(i)) 0.0
            else BigDecimal(BigInt(r2.getLong(i)), 6).toDouble /
              math.max(cnts(b), 1L)
          }
          f -> (means, cnts.map(_.toDouble / n))
        }.toMap
      } else {
        val pass2 = features.zip(edges).flatMap { case (f, e) =>
          val bin = binOf(col(f), e)
          (0 until nBins).flatMap { b =>
            Seq(
              (sum(when(bin === b, col(f).cast(D6))).cast("double") /
                greatest(sum(when(bin === b, 1).otherwise(0)), lit(1))).as(s"${f}__bm$b"),
              (sum(when(bin === b, 1).otherwise(0)).cast("double") / count(lit(1))).as(s"${f}__bf$b"))
          }
        }
        val r2 = ph("pass2")(df.agg(pass2.head, pass2.tail: _*).head())
        features.map { f =>
          f -> ((0 until nBins).map(b => r2.getAs[Double](s"${f}__bm$b")),
            (0 until nBins).map(b => r2.getAs[Double](s"${f}__bf$b")))
        }.toMap
      }

    features.zip(edges).map { case (f, e) =>
      val (means, freqs) = binStats(f)
      val cum = freqs.scanLeft(0.0)(_ + _).tail.updated(nBins - 1, 1.0)
      FeatureStats(f, g(s"${f}__mean"), g(s"${f}__std"), e, means, cum)
    }
  }

  /** Exact quantiles at `ps` per feature via a value-count cumulative
    * distribution instead of the `percentile` aggregate: Spark's
    * Percentile builds one value→count OpenHashMap per partition and
    * merges them generically (the dominant cost of the stats pass at
    * bench scale), while this shape is one codegen'd melt + hash
    * aggregate + tiny per-feature window. Order statistics and the
    * interpolation `(hi−pos)·v_lo + (pos−lo)·v_hi` replicate
    * Percentile.getPercentile bit-for-bit, so results are unchanged
    * (and still match DuckDB quantile_cont after round6).
    *
    * Scale shape: the shuffle carries one row per DISTINCT value per
    * feature (not per input row), and the per-feature window sees only
    * that distinct-value list.
    */
  private[graft] def exactQuartiles(df: DataFrame,
                                    features: Seq[String]): Seq[Vector[Double]] =
    exactQuantiles(df, features, Seq(0.25, 0.5, 0.75))

  /** Sketch-bracket exact quantiles — three shuffle-light jobs, no
    * single-partition window (the value-count CDF below serializes
    * each feature's distinct values through ONE window partition,
    * which for a near-unique column means a single-threaded sort of
    * ~n rows):
    *
    *   (A) one `percentile_approx` pass brackets every target order
    *       statistic within the sketch's rank-error bound (±n/acc);
    *   (B) one aggregate counts rows strictly below each bracket, and
    *       one filtered aggregate collects the distinct (value, count)
    *       pairs inside the brackets — O(#targets · n/acc) rows, equal
    *       values collapsed;
    *
    * then the exact order statistics are read off on the driver. The
    * sketch only chooses WHICH rows get collected — the returned
    * quantiles are the exact order statistics either way, so results
    * are bit-identical to the CDF path (and partition-independent even
    * though the sketch itself is not). Falls back to the CDF path if a
    * bracket misses its target (outside the sketch's error contract;
    * kept as a correctness belt).
    */
  // Sketch accuracy only sizes the bracket margin (exactness comes
  // from the bracket census + below-counts; a missed bracket falls
  // back to the CDF path) — 2000 keeps brackets ±0.15% of rank, an
  // ~5× cheaper QuantileSummaries than 10000 in the fused pass 1.
  private val QAcc = 2000

  /** The sketch columns of job (A): per feature, the approx bracket
    * edges. Exposed so callers that already run a whole-table
    * aggregate (fitStats pass 1) can fuse job (A) into it and skip one
    * scan. Non-null counts are NOT included — the read-off uses the
    * caller's `${f}__nx` aggregates (fitStats pass 1 already has them;
    * the standalone entry below adds its own) rather than duplicating
    * a count column per feature in the fused pass.
    */
  private[graft] def quantileSketchCols(features: Seq[String],
                                        ps: Seq[Double]): Seq[Column] = {
    val margin = 3.0 / QAcc
    val lops = ps.map(p => math.max(0.0, p - margin))
    val hips = ps.map(p => math.min(1.0, p + margin))
    features.map { f =>
      percentile_approx(col(f).cast("double"),
        array((lops ++ hips).map(lit): _*), lit(QAcc)).as(s"${f}__qb")
    }
  }

  private[graft] def exactQuantiles(df: DataFrame, features: Seq[String],
                                    ps: Seq[Double]): Seq[Vector[Double]] = {
    val aggA = features.map(f => count(col(f)).as(s"${f}__nx")) ++
      quantileSketchCols(features, ps)
    val rA = df.agg(aggA.head, aggA.tail: _*).head()
    exactQuantilesFromSketch(df, features, ps, rA)
  }

  /** Jobs (B) + driver read-off, given job (A)'s result row (which
    * must carry `${f}__nx` non-null counts and `${f}__qb` brackets).
    */
  private[graft] def exactQuantilesFromSketch(
      df: DataFrame, features: Seq[String], ps: Seq[Double],
      rA: org.apache.spark.sql.Row): Seq[Vector[Double]] = {
    val nPer = features.map(f => f -> rA.getAs[Long](s"${f}__nx")).toMap
    features.foreach { f =>
      require(nPer(f) > 0, s"exactQuantiles: feature $f has no non-null values")
    }
    val brackets: Map[String, Seq[(Double, Double)]] = features.map { f =>
      val b = rA.getAs[scala.collection.Seq[Double]](s"${f}__qb")
      f -> ps.indices.map(i => (b(i), b(ps.length + i)))
    }.toMap
    val aggB = features.flatMap { f =>
      brackets(f).zipWithIndex.map { case ((lo, _), i) =>
        sum(when(col(f) < lo, 1L).otherwise(0L)).as(s"${f}__below$i")
      }
    }
    // The below-counts aggregate (B1) and the bracket census (B2) are
    // independent given the brackets — run them as overlapped jobs
    // (guide §2.6) so the tail of one back-fills the other's tasks.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val rBF = Future {
      val t0 = System.nanoTime()
      val r = df.agg(aggB.head, aggB.tail: _*).head()
      if (sys.env.contains("GRAFT_PROFILE"))
        println(f"[fit-phase] jobB1_below    ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    // ONE scan for every feature's bracket census, not a scan per
    // feature: melt (feature, value) pairs with an explode over
    // struct literals (no SQL-string interpolation, so quoted/exotic
    // column names keep working), then keep only values inside their
    // OWN feature's brackets. The fan-out is ×|features| rows but each
    // bracket spans ~±(3/QAcc) of rank per edge (±0.15% at the
    // current accuracy), so the aggregate input stays a small slice
    // of the scan.
    val inBracket = {
      val melted = df.select(explode(array(features.map(f =>
        struct(lit(f).as("feature"), col(f).cast("double").as("v"))): _*)).as("fv"))
        .select(col("fv.feature").as("feature"), col("fv.v").as("v"))
      val cond = features.map { f =>
        col("feature") === f &&
          brackets(f).map { case (lo, hi) => col("v") >= lo && col("v") <= hi }
            .reduce(_ || _)
      }.reduce(_ || _)
      melted.filter(col("v").isNotNull && cond)
        .groupBy("feature", "v").agg(count(lit(1)).as("c"))
        .select(col("feature"), col("v"), col("c"))
    }
    val byFeat = {
      val t0 = System.nanoTime()
      val r = inBracket.collect()
      if (sys.env.contains("GRAFT_PROFILE"))
        println(f"[fit-phase] jobB2_census   ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }.groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(r => (r.getDouble(1), r.getLong(2))).sortBy(_._1) }
    val rB = Await.result(rBF, Duration.Inf)
    def search(f: String, k: Long): Option[Double] = {
      val vs = byFeat.getOrElse(f, Array.empty[(Double, Long)])
      var res: Option[Double] = None
      brackets(f).indices.foreach { i =>
        if (res.isEmpty) {
          val (lo, hi) = brackets(f)(i)
          var cum = rB.getAs[Long](s"${f}__below$i")
          if (k >= cum) vs.foreach { case (v, c) =>
            if (res.isEmpty && v >= lo && v <= hi) {
              if (k < cum + c) res = Some(v)
              cum += c
            }
          }
        }
      }
      res
    }
    features.map { f =>
      val n = nPer(f)
      val qs = ps.map { p =>
        val pos = (n - 1) * p
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        (search(f, lo), search(f, hi)) match {
          case (Some(a), Some(b)) =>
            Some(if (lo == hi) a else (hi - pos) * a + (pos - lo) * b)
          case _ => None
        }
      }
      if (qs.forall(_.isDefined)) qs.flatten.toVector
      else exactQuantilesCdf(df, Seq(f), ps).head
    }
  }

  /** Full value-count CDF exact quantiles (fallback path; see
    * exactQuantiles for why it is no longer the default).
    */
  private[graft] def exactQuantilesCdf(df: DataFrame, features: Seq[String],
                                       ps: Seq[Double]): Seq[Vector[Double]] = {
    import org.apache.spark.sql.expressions.Window
    // SINGLE job: a column-pruned scan + hash-agg branch per feature
    // (branches run concurrently), unioned into one per-feature window
    // that carries both the running count and the partition total, so
    // the 0-indexed rank targets floor/ceil((n−1)·p) are evaluated as
    // EXPRESSIONS — no separate count job, no rank broadcast, no
    // cache. NULLs are excluded like the `percentile` aggregate this
    // replaces (and like DuckDB quantile_cont); rank targets use the
    // per-feature NON-NULL count.
    val counts = features.map { f =>
      df.filter(col(f).isNotNull)
        .groupBy(col(f).cast("double").as("v")).agg(count(lit(1)).as("c"))
        .select(lit(f).as("feature"), col("v"), col("c"))
    }.reduce(_ unionByName _)
    val wCum = Window.partitionBy("feature").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("feature")
    val withCum = counts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("prev", col("cum") - col("c"))
      .withColumn("n", sum(col("c")).over(wAll))
    // a row survives iff one of the wanted order statistics lands in
    // its [prev, cum) range
    val target = ps.flatMap { p =>
      val pos = (col("n") - 1) * lit(p)
      Seq(floor(pos), ceil(pos))
    }.map(k => k >= col("prev") && k < col("cum")).reduce(_ || _)
    val hitRows = withCum.filter(target)
      .select("feature", "v", "prev", "cum", "n").collect()
    val nPer: Map[String, Long] =
      hitRows.map(r => r.getString(0) -> r.getLong(4)).toMap
    features.foreach { f =>
      require(nPer.contains(f), s"exactQuantiles: feature $f has no non-null values")
    }
    def valueAt(f: String, k: Long): Double =
      hitRows.collectFirst {
        case r if r.getString(0) == f && r.getLong(2) <= k && k < r.getLong(3) =>
          r.getDouble(1)
      }.getOrElse(sys.error(s"exactQuantiles: rank $k of $f not found"))
    features.map { f =>
      val n = nPer(f)
      ps.map { p =>
        val pos = (n - 1) * p
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        if (lo == hi) valueAt(f, lo)
        else (hi - pos) * valueAt(f, lo) + (pos - lo) * valueAt(f, hi)
      }.toVector
    }
  }

  /** Driver-side fitStats for explain-time instance sets (the
    * explainTabular gate): the same arithmetic as the two smallInput
    * aggregation jobs — exact HALF_UP scale-6 moment sums, the
    * Percentile order-statistic interpolation, exact per-bin decimal
    * sums — computed from ONE collected instance table instead of two
    * whole-plan aggregate jobs per explanation query. Bit-identical
    * for double feature columns (the gate checks the type).
    */
  private[lime] def fitStatsLocal(rows: Array[org.apache.spark.sql.Row],
                                  features: Seq[String], nBins: Int): Seq[FeatureStats] = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val n = rows.length.toLong
    val ps = (1 until nBins).map(_.toDouble / nBins)
    def m6(v: Double): java.math.BigInteger =
      new java.math.BigDecimal(java.lang.Double.toString(v))
        .setScale(6, java.math.RoundingMode.HALF_UP).unscaledValue()
    features.zipWithIndex.map { case (f, fi) =>
      val vs: Array[Double] =
        rows.flatMap(r => if (r.isNullAt(fi)) None else Some(r.getDouble(fi)))
      require(vs.nonEmpty && n > 0, s"fitStats: feature $f has no non-null values")
      var sm = java.math.BigInteger.ZERO
      var smm = java.math.BigInteger.ZERO
      vs.foreach { v =>
        val m = m6(v)
        sm = sm.add(m); smm = smm.add(m.multiply(m))
      }
      val sumD = new java.math.BigDecimal(sm, 6).doubleValue()
      val sumsqD = new java.math.BigDecimal(smm, 12).doubleValue()
      val mean = sumD / n
      val stdV = math.sqrt((sumsqD - sumD * sumD / n) / (n - 1.0))
      val std = math.max(if (stdV.isNaN) 0.0 else stdV, 1e-12)
      val sorted = vs.sorted
      val edges = ps.map { p =>
        val pos = (vs.length - 1) * p
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        val a = sorted(lo.toInt); val b = sorted(hi.toInt)
        round6(if (lo == hi) a else (hi - pos) * a + (pos - lo) * b)
      }.toVector
      val binSum = Array.fill(nBins)(java.math.BigInteger.ZERO)
      val binCnt = new Array[Long](nBins)
      vs.foreach { v =>
        val b = edges.count(e => v > e) // binOf: edges strictly below
        binSum(b) = binSum(b).add(m6(v))
        binCnt(b) += 1
      }
      // empty bin: the aggregate read a NULL sum back as 0.0 — 0/1 here
      val binMeans = (0 until nBins).map(b =>
        new java.math.BigDecimal(binSum(b), 6).doubleValue() / math.max(binCnt(b), 1L))
      val freqs = (0 until nBins).map(b => binCnt(b).toDouble / n)
      val cum = freqs.scanLeft(0.0)(_ + _).tail.updated(nBins - 1, 1.0)
      FeatureStats(f, mean, std, edges, binMeans, cum)
    }
  }

  /** Driver-side fitCatStats over the same collected instance table:
    * counts per distinct value in UTF-8 byte order (Spark's string
    * ordering), cumulative frequencies with the last pinned to 1.0.
    */
  private[lime] def fitCatStatsLocal(rows: Array[org.apache.spark.sql.Row],
      offset: Int, catFeatures: Seq[String], maxCard: Int = 64): Seq[CatStats] = {
    def cmpU8(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < x.length && i < y.length) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      x.length - y.length
    }
    catFeatures.zipWithIndex.map { case (f, ci) =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      rows.foreach { r =>
        val v = r.get(offset + ci).toString
        counts.update(v, counts.getOrElse(v, 0L) + 1L)
      }
      val keys = counts.keys.toArray.sortWith(cmpU8(_, _) < 0)
      require(keys.length <= maxCard,
        s"categorical feature $f has ${keys.length} distinct values (> $maxCard)")
      val total = counts.valuesIterator.sum.toDouble
      val cum = keys.map(counts(_) / total).scanLeft(0.0)(_ + _).tail
      CatStats(f, keys.toVector, cum.toVector.updated(keys.length - 1, 1.0))
    }
  }

  /** Quartile bin id: count of edges strictly below x — matches
    * numpy searchsorted(side='left') used by the public discretizer.
    */
  def binOf(x: Column, edges: Seq[Double]): Column =
    // ascending fold leaves the HIGHEST edge as the outermost check:
    // when(x > e_last, n-1).otherwise(when(x > e_{n-2}, ...)...)
    edges.zipWithIndex.foldLeft(lit(0): Column) {
      case (acc, (e, i)) => when(x > e, i + 1).otherwise(acc)
    }

  /** Proximity kernel π(d) = sqrt(exp(-d²/w²)) (public impl form). */
  def kernel(dist: Column, width: Double): Column =
    sqrt(exp(-dist * dist / lit(width * width)))

  /** Closed-form logistic "black box" over z-scored features with
    * fixed public demo coefficients — the deterministic scorer used by
    * the oracle-checked lime_score query and the explain specs.
    */
  val demoCoefs: Seq[Double] = Seq(0.8, -0.5, 1.2, -0.7)
  val demoIntercept: Double = 0.1

  def logisticScore(stats: Seq[FeatureStats], values: Seq[Column]): Column = {
    val lin = stats.zip(values).zip(demoCoefs).foldLeft(lit(demoIntercept): Column) {
      case (acc, ((st, v), b)) => acc + lit(b) * (v - lit(st.mean)) / lit(math.max(st.std, 1e-12))
    }
    lit(1.0) / (lit(1.0) + exp(-lin))
  }

  /** Perturbation fan-out: N samples per instance as a single narrow
    * explode — sample 0 is the instance itself. For each (sample,
    * feature): draw a bin from the training bin distribution with the
    * counter-based RNG, set z=1 iff it equals the instance's bin, and
    * take the bin-mean as the undiscretized value for scoring.
    *
    * Returns the input columns plus, per feature f:
    * `f__bin`, `f__z`, `f__val`, and `sample_id`.
    */
  def perturb(instances: DataFrame, idCol: String, stats: Seq[FeatureStats], cfg: LimeConfig,
              catStats: Seq[CatStats] = Nil): DataFrame = {
    val base0 = instances.withColumn("sample_id", explode(sequence(lit(0), lit(cfg.nSamples - 1))))
    // categorical features: resample from the training frequency table;
    // z = 1 iff the sampled value equals the instance's (public LIME
    // categorical semantics). The sampled value itself is the score
    // input.
    val base = catStats.foldLeft(base0) { (df, cs) =>
      val u = Rng.u01(lit(cfg.seed), col(idCol), col("sample_id"), lit("cat:" + cs.name))
      val sampled = cs.values.init.zip(cs.cumFreqs.init).reverse
        .foldLeft(lit(cs.values.last): Column) { case (acc, (v, c)) =>
          when(u < c, lit(v)).otherwise(acc)
        }
      val v = when(col("sample_id") === 0, col(cs.name).cast("string")).otherwise(sampled)
      df.withColumn(s"${cs.name}__val", v)
        .withColumn(s"${cs.name}__z",
          (col(s"${cs.name}__val") === col(cs.name).cast("string")).cast("double"))
    }
    if (cfg.discretize)
      stats.foldLeft(base) { (df, st) =>
        val u = Rng.u01(lit(cfg.seed), col(idCol), col("sample_id"), lit(st.name))
        // reverse-nested fold: when(u<c0,0).otherwise(when(u<c1,1)...)
        // — the LOWEST matching cumulative frequency wins, identical to
        // the original ascending when-chain for any bin count
        val sampledBin = st.binCumFreqs.init.zipWithIndex.reverse
          .foldLeft(lit(st.binCumFreqs.length - 1): Column) { case (acc, (c, i)) =>
            when(u < c, i).otherwise(acc)
          }
        val instBin = binOf(col(st.name), st.edges)
        val bin = when(col("sample_id") === 0, instBin).otherwise(sampledBin)
        df.withColumn(s"${st.name}__bin", bin)
          .withColumn(s"${st.name}__z", (col(s"${st.name}__bin") === instBin).cast("double"))
          .withColumn(s"${st.name}__val",
            when(col("sample_id") === 0, col(st.name))
              .otherwise(element_at(array(st.binMeans.map(lit): _*), col(s"${st.name}__bin") + 1)))
      }
    else
      // continuous mode: gaussian around the instance, z-scored
      // interpretable representation; sample 0 stays the instance
      stats.foldLeft(base) { (df, st) =>
        val g = Rng.gaussian(lit(cfg.seed), col(idCol) * lit(1000003L) + col("sample_id"), lit(stats.indexOf(st)))
        val v = when(col("sample_id") === 0, col(st.name))
          .otherwise(col(st.name) + g * lit(st.std))
        df.withColumn(s"${st.name}__val", v)
          .withColumn(s"${st.name}__bin", binOf(col(s"${st.name}__val"), st.edges))
          .withColumn(s"${st.name}__z",
            (col(s"${st.name}__val") - lit(st.mean)) / lit(math.max(st.std, 1e-12)))
      }
  }

  /** End-to-end tabular explanation:
    * stats → perturb → score → kernel → per-instance ridge → top-K.
    *
    * `scoreFn` maps the perturbed frame (with `f__val` columns) to a
    * prediction column — closed-form expression for the demo scorer,
    * or an MLlib Transformer wrapper (see LimeMllib).
    *
    * Output: (instance_id, rank, feature, weight, intercept, r2,
    * local_pred), kFeatures rows per instance.
    */
  def explainTabular(
      instances: DataFrame,
      idCol: String,
      features: Seq[String],
      cfg: LimeConfig = LimeConfig(),
      scoreFnOpt: Option[DataFrame => DataFrame] = None,
      catFeatures: Seq[String] = Nil): DataFrame = {
    val spark = instances.sparkSession
    import spark.implicits._
    // Explain-time stats gate: instance sets are bounded by contract
    // (tens-to-thousands of rows), so at or below the gate the stats
    // come from ONE collect + the driver-side twins of the two
    // smallInput aggregate jobs (bit-identical arithmetic; the type
    // check keeps exotic fixture schemas on the distributed path).
    val statsGate = 65536
    val statCols = features ++ catFeatures
    val localOk =
      features.forall(f => instances.schema(f).dataType ==
        org.apache.spark.sql.types.DoubleType) &&
      catFeatures.forall(f => instances.schema(f).dataType ==
        org.apache.spark.sql.types.StringType)
    val localRows =
      if (localOk) instances.select(statCols.map(col): _*).limit(statsGate + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    val (stats, catStats) =
      if (localOk && localRows.nonEmpty && localRows.length <= statsGate)
        (fitStatsLocal(localRows, features, cfg.nBins),
          if (catFeatures.nonEmpty) fitCatStatsLocal(localRows, features.size, catFeatures)
          else Nil)
      else
        (fitStats(instances, features, cfg.nBins, smallInput = true),
          if (catFeatures.nonEmpty) fitCatStats(instances, catFeatures) else Nil)
    val allFeatures = features ++ catFeatures
    val d = allFeatures.size
    val width = cfg.kernelWidth.getOrElse(0.75 * math.sqrt(d))

    val perturbed = perturb(instances, idCol, stats, cfg, catStats)
    val scoreFn = scoreFnOpt.getOrElse { df: DataFrame =>
      df.withColumn("pred", logisticScore(stats, features.map(f => col(s"${f}__val"))))
    }
    val scored = scoreFn(perturbed)
    // distance in the interpretable space: binary rep → d² = Σ(1 - z)
    // (instance row is all-ones); continuous rep → scaled euclidean to
    // the instance
    val dist2 =
      if (cfg.discretize) allFeatures.map(f => lit(1.0) - col(s"${f}__z")).reduce(_ + _)
      else (stats.map(st =>
        pow((col(s"${st.name}__val") - col(st.name)) / lit(math.max(st.std, 1e-12)), 2)) ++
        catFeatures.map(f => lit(1.0) - col(s"${f}__z"))).reduce(_ + _)
    val weighted = scored
      .withColumn("kweight", sqrt(exp(-dist2 / lit(width * width))))
      .select(col(idCol).as("instance_id"),
        array(allFeatures.map(f => col(s"${f}__z")): _*).as("z"),
        col("pred").cast("double").as("y"),
        col("kweight").cast("double").as("w"))

    val fwd = cfg.selection == "forward_selection" ||
      (cfg.selection == "auto" && d <= 6)
    val agg = new RidgeAggregator(d, cfg.lambda,
      if (fwd) cfg.kFeatures else Int.MaxValue, fwd)
    // The normal-equations fold runs as BUILT-IN sums — one codegen'd
    // HashAggregate with map-side partials — instead of the previous
    // typed groupByKey + Aggregator (SerializeFromObject + interpreted
    // ObjectHashAggregate deserializing every sample row). Each buffer
    // cell's per-row term reproduces RidgeAggregator.reduce's exact
    // multiply order — G(r,c) += (w·x_r)·x_c (BOTH triangles: the two
    // orders can differ in the last ulp and finish reads the full
    // matrix), b(r) += (w·x_r)·y, Σw, Σw·y, Σ(w·y)·y — and sums
    // accumulate per row / merge per partition exactly like the
    // Aggregator's reduce/merge, so the collected buffers are
    // bit-identical. The O(d'³) solve itself is one finish call per
    // INSTANCE row (never per sample), off the hot path.
    val m = d + 1
    def xCol(i: Int): Column = if (i == 0) lit(1.0) else col("z").getItem(i - 1)
    val bufCols: Seq[Column] =
      (for { r <- 0 until m; c <- 0 until m }
        yield sum((col("w") * xCol(r)) * xCol(c)).as(s"__g_${r}_$c")) ++
      (0 until m).map(r => sum((col("w") * xCol(r)) * col("y")).as(s"__b_$r")) ++
      Seq(sum(col("w")).as("__sw"),
        sum(col("w") * col("y")).as("__swy"),
        sum(col("w") * col("y") * col("y")).as("__swyy"))
    val solveUdf = udf((buf: Seq[Double]) => agg.finish(buf.toArray))
    val fits = weighted.groupBy(col("instance_id"))
        .agg(bufCols.head, bufCols.tail: _*)
        .select(col("instance_id"),
          solveUdf(array(
            ((for { r <- 0 until m; c <- 0 until m } yield col(s"__g_${r}_$c")) ++
              (0 until m).map(r => col(s"__b_$r")) ++
              Seq(col("__sw"), col("__swy"), col("__swyy"))): _*)).as("fit"))

    // In continuous mode the instance's interpretable vector is its
    // z-scored values (not all-ones), so the aggregator's localPred
    // (= beta-sum) is replaced with intercept + beta . z_instance,
    // joined back from the instances frame.
    val fitsWithPred =
      if (cfg.discretize) fits.withColumn("local_pred", col("fit.localPred"))
      else {
        val zArr = array(
          (stats.map(st =>
            (col(st.name) - lit(st.mean)) / lit(math.max(st.std, 1e-12))) ++
            catFeatures.map(_ => lit(1.0))): _*)
        val instZ = instances.select(col(idCol).as("instance_id"), zArr.as("z_inst"))
        fits.join(instZ, "instance_id")
          .withColumn("local_pred",
            col("fit.intercept") + aggregate(
              zip_with(col("fit.coefs"), col("z_inst"), (c, z) => c * z),
              lit(0.0), (acc, x) => acc + x))
          .drop("z_inst")
      }

    val names = array(allFeatures.map(lit): _*)
    val exploded = fitsWithPred.select(
      col("instance_id"),
      col("fit.intercept").as("intercept"),
      col("fit.r2").as("r2"),
      col("local_pred"),
      posexplode(col("fit.coefs")))
      .withColumn("feature", element_at(names, col("pos") + 1))
      .withColumnRenamed("col", "weight")
    val w = Window.partitionBy("instance_id").orderBy(abs(col("weight")).desc, col("feature"))
    val keep = if (cfg.selection == "none") Int.MaxValue else cfg.kFeatures
    exploded.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= keep)
      .select("instance_id", "rank", "feature", "weight", "intercept", "r2", "local_pred")
      .orderBy("instance_id", "rank")
  }
}
