package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Grades the sketch-based aggregates (no oracle — estimates are
  * impl-specific) against their exact counterparts.
  */
class ApproxAggSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx_percentile within the GK rank-error bound of exact") {
    val s = spark
    // exact percentiles at p ± 2× the rank error (1/accuracy = 1%):
    // the sketch may return the data value AT the ±1% rank boundary,
    // which can sit outside the INTERPOLATED percentile at that same
    // rank, so the band uses a doubled margin to bound the value
    // robustly rather than encode a data-dependent coincidence
    val exact = Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.23, 0.27, 0.48, 0.52, 0.73, 0.77))").as("e"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toVector).toMap
    val approx = Relational.qAggApproxQuantile(s, dir).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val e = exact(r.getString(0))
      val qs = Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(qs == qs.sorted, s"approx quantiles not monotonic: $qs")
      Seq((qs(0), e(0), e(1)), (qs(1), e(2), e(3)), (qs(2), e(4), e(5))).foreach {
        case (a, lo, hi) =>
          assert(a >= lo && a <= hi,
            s"${r.getString(0)}: approx $a outside exact rank-error band [$lo, $hi]")
      }
    }
  }

  test("HLL sketch: merged per-day partials match the direct sketch, both near exact") {
    val s = spark
    val exact = Tables.events(s, dir).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Relational.qAggHllSketch(s, dir).collect().foreach { r =>
      val (direct, merged) = (r.getLong(1), r.getLong(2))
      // mergeability: the union of independently-built partials estimates
      // the same set as the direct sketch. At this fixture's cardinality
      // the sketches stay in sparse/coupon mode where both paths agree
      // exactly; in dense HLL mode a direct sketch estimates via HIP
      // while a union falls back to the composite estimator, so allow a
      // small relative tolerance rather than assert equality.
      assert(math.abs(direct - merged) <= math.max(1L, (0.02 * direct).toLong),
        s"${r.getString(0)}: direct $direct vs merged $merged")
      val e = exact(r.getString(0)).toDouble
      assert(math.abs(direct - e) / e <= 0.05, s"${r.getString(0)}: $direct vs exact $e")
    }
  }

  test("approx_top_k: direct and merged branches both exact below the Misra-Gries capacity") {
    val s = spark
    // exact token counts the sketch must reproduce: with
    // distinct(vocab) <= maxItemsTracked (8192) the frequent-items
    // sketch stores every item, so estimates are exact counts and the
    // top-k itemset can differ from exact only on count ties at rank k
    val exact = Tables.documents(s, dir)
      .select(explode(split(lower(trim(col("text"))), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.size <= 8192, s"fixture vocab ${exact.size} outgrew maxItemsTracked")
    val rows = graft.operators.LlmData.qAggApproxTopk(s, dir).collect()
    assert(rows.nonEmpty)
    val kth = exact.values.toSeq.sorted(Ordering[Long].reverse).take(10).last
    rows.foreach { r =>
      val word = r.getString(0)
      Seq(1, 2).foreach { i =>
        if (!r.isNullAt(i))
          assert(r.getLong(i) == exact(word),
            s"$word: estimate ${r.getLong(i)} != exact ${exact(word)}")
      }
      // any returned item must genuinely belong at the top: its exact
      // count is >= the k-th largest exact count
      assert(exact(word) >= kth, s"$word (${exact(word)}) below the k-th count $kth")
    }
  }

  test("approx_count_distinct within 5% of exact distinct") {
    val s = spark
    val exact = Tables.events(s, dir).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Relational.qAggApproxDistinct(s, dir).collect().foreach { r =>
      val e = exact(r.getString(0)).toDouble
      val a = r.getLong(1).toDouble
      assert(math.abs(a - e) / e <= 0.05, s"${r.getString(0)}: $a vs exact $e")
    }
  }

  test("theta sketches: pairwise set algebra within RSE of exact; shard-merge = direct") {
    val s = spark
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select(col("source"), explode(split(lower(trim(col("text"))), " ")).as("word"))
      .filter(col("word") =!= "")
    // exact pairwise distinct-set cardinalities (driver-side: 20
    // sources, fixture scale)
    val sets = words.distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val rows = graft.operators.LlmData.qAggThetaSets(s, dir).collect()
    assert(rows.length == sets.size * (sets.size - 1) / 2,
      s"expected all source pairs, got ${rows.length}")
    // theta default lgK=12 -> RSE ~ 1/sqrt(4096) ~ 1.6%; 5% bound with
    // a small absolute floor for the intersection/difference estimates
    def ok(est: Long, exact: Int): Boolean =
      math.abs(est - exact) <= math.max(0.05 * exact, 32.0)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, s"pair order violated: $a, $b")
      val (sa, sb) = (sets(a), sets(b))
      assert(ok(r.getLong(2), sa.size), s"$a |A| ${r.getLong(2)} vs ${sa.size}")
      assert(ok(r.getLong(3), sb.size), s"$b |B| ${r.getLong(3)} vs ${sb.size}")
      assert(ok(r.getLong(4), (sa ++ sb).size), s"$a,$b union ${r.getLong(4)} vs ${(sa ++ sb).size}")
      assert(ok(r.getLong(5), (sa & sb).size), s"$a,$b inter ${r.getLong(5)} vs ${(sa & sb).size}")
      assert(ok(r.getLong(6), (sa -- sb).size), s"$a,$b diff ${r.getLong(6)} vs ${(sa -- sb).size}")
    }
    // mergeability: per-shard sketches combined with theta_union_agg
    // estimate the same cardinality as the direct per-source sketch
    val direct = words.groupBy("source")
      .agg(expr("cast(theta_sketch_estimate(theta_sketch_agg(word)) as long)").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = words
      .withColumn("shard", pmod(xxhash64(col("word")), lit(8)))
      .groupBy("source", "shard").agg(expr("theta_sketch_agg(word)").as("sk"))
      .groupBy("source")
      .agg(expr("cast(theta_sketch_estimate(theta_union_agg(sk)) as long)").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    direct.foreach { case (src, d) =>
      assert(ok(merged(src), sets(src).size),
        s"$src merged ${merged(src)} vs exact ${sets(src).size}")
      assert(math.abs(merged(src) - d) <= math.max(0.05 * d, 32.0),
        s"$src shard-merged ${merged(src)} drifted from direct $d")
    }
  }
}
