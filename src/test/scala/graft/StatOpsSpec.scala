package graft

import graft.operators.Relational
import org.apache.spark.sql.functions.col

/** Independent plain-Scala recomputes for the r11 robust-stats /
  * segmentation operators whose oracle mirrors the construction —
  * a shared construction bug cannot pass both the recompute and the
  * DuckDB hash (the LlmDataSpec idiom).
  */
class StatOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def r6(x: Double) = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
  private def d2(x: Double) = java.math.BigDecimal.valueOf(x)
    .setScale(2, java.math.RoundingMode.HALF_UP)

  /** ntile(k) bucket for 0-based index i of n rows — equal buckets,
    * earlier buckets take the remainder (Spark ≡ DuckDB definition).
    */
  private def ntileOf(i: Int, n: Int, k: Int): Int = {
    val base = n / k; val extra = n % k
    if (i < (base + 1) * extra) i / (base + 1) + 1
    else (i - (base + 1) * extra) / base + extra + 1
  }

  test("agg_trimmed: rank-trimmed mean recomputed independently") {
    val rows = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
    val expected = rows.groupBy(_._1).map { case (flag, xs) =>
      val sorted = xs.sortBy(x => (x._2, x._3, x._4)).map(x => d2(x._2))
      val n = sorted.length
      val k = n * 5 / 100
      val kept = sorted.slice(k, n - k)
      flag -> (n.toLong, kept.length.toLong,
        r6(sorted.map(BigDecimal(_)).sum.toDouble / n),
        r6(kept.map(BigDecimal(_)).sum.toDouble / kept.length))
    }
    val got = Relational.qAggTrimmed(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got == expected, s"trimmed mean diverges:\n got $got\n exp $expected")
    // trimming must actually drop rows at fixture scale, and the
    // trimmed mean sits inside the raw value range
    got.values.foreach { case (n, kept, _, _) => assert(kept < n && kept > 0) }
  }

  test("seg_rfm: quartile segment census recomputed independently") {
    val dayUs = 86400000000L
    val os = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).toInstant.toEpochMilli * 1000, r.getDouble(2)))
    val perCust = os.groupBy(_._1).map { case (c, xs) =>
      (c, xs.map(_._2).max, xs.length.toLong, xs.map(x => BigDecimal(d2(x._3))).sum)
    }.toSeq
    val asOf = perCust.map(_._2).max
    val rfm = perCust.map { case (c, last, f, m) =>
      (c, (asOf - last) / dayUs, f, m)
    }
    val rScore = {
      val sorted = rfm.sortBy(x => (x._2, x._1))
      sorted.zipWithIndex.map { case (x, i) => x._1 -> ntileOf(i, sorted.length, 4) }.toMap
    }
    val fScore = {
      val sorted = rfm.sortBy(x => (-x._3, x._1))
      sorted.zipWithIndex.map { case (x, i) => x._1 -> ntileOf(i, sorted.length, 4) }.toMap
    }
    val mScore = {
      val sorted = rfm.sortBy(x => (-x._4, x._1))
      sorted.zipWithIndex.map { case (x, i) => x._1 -> ntileOf(i, sorted.length, 4) }.toMap
    }
    val expected = rfm.groupBy(x => (rScore(x._1), fScore(x._1), mScore(x._1)))
      .map { case (seg, xs) =>
        seg -> (xs.length.toLong, xs.map(_._3).sum,
          r6(xs.map(_._4).sum.toDouble / xs.length))
      }
    val got = Relational.qSegRfm(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(got == expected, s"RFM census diverges:\n got $got\n exp $expected")
    // scores span the full quartile range and partition all customers
    assert(got.values.map(_._1).sum == perCust.length.toLong)
    assert(got.keys.map(_._1).min == 1 && got.keys.map(_._1).max == 4)
  }

  test("stat_power: MDE calculator recomputed independently") {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        d2(r.getDouble(2)).movePointRight(2).longValueExact))
    val z = 2.8015852181129683
    val expected = ev.groupBy(_._1).map { case (typ, xs) =>
      val perUser = xs.groupBy(_._2).map { case (_, ys) => ys.map(_._3).sum }.toSeq
      val n = perUser.length
      val sx = perUser.map(BigInt(_)).sum
      val sxx = perUser.map(c => BigInt(c) * BigInt(c)).sum
      def cents(b: BigInt) = (BigDecimal(b) / 100).toDouble
      def cents2(b: BigInt) = (BigDecimal(b) / 10000).toDouble
      val mean = cents(sx) / n
      val vr = (cents2(sxx) - cents(sx) * cents(sx) / n) / (n - 1.0)
      val n1 = n / 2; val n2 = n - n / 2
      val mde = z * math.sqrt(vr * (1.0 / n1 + 1.0 / n2))
      typ -> (n.toLong, r6(mean), r6(math.sqrt(vr)), r6(mde), r6(mde / mean))
    }
    val got = graft.operators.Relational.qStatPower(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got == expected, s"power readout diverges:\n got $got\n exp $expected")
    // an MDE is positive and shrinks as n grows within this fixture's
    // comparable variances; at minimum it must be finite and positive
    got.values.foreach { case (n, _, sd, mde, rel) =>
      assert(n > 1 && sd > 0 && mde > 0 && rel > 0)
    }
  }

  test("stat_ratio_delta: delta-method CI recomputed independently") {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        d2(r.getDouble(2)).movePointRight(2).longValueExact))
    val z = 1.959963984540054
    val expected = ev.groupBy(_._1).map { case (typ, xs) =>
      val perUser = xs.groupBy(_._2).map { case (_, ys) =>
        (ys.map(_._3).sum, ys.length.toLong)
      }.toSeq
      val n = perUser.length
      def cents(b: BigInt) = (BigDecimal(b) / 100).toDouble
      def cents2(b: BigInt) = (BigDecimal(b) / 10000).toDouble
      val sx = perUser.map(p => BigInt(p._1)).sum
      val sy = perUser.map(p => BigInt(p._2)).sum
      val sxx = perUser.map(p => BigInt(p._1) * BigInt(p._1)).sum
      val syy = perUser.map(p => BigInt(p._2) * BigInt(p._2)).sum
      val sxy = perUser.map(p => BigInt(p._1) * BigInt(p._2)).sum
      val mx = cents(sx) / n; val my = sy.toDouble / n
      val r = mx / my
      val varx = (cents2(sxx) - cents(sx) * cents(sx) / n) / (n - 1.0)
      val vary = (syy.toDouble - sy.toDouble * sy.toDouble / n) / (n - 1.0)
      val covxy = (cents(sxy) - cents(sx) * sy.toDouble / n) / (n - 1.0)
      val se = math.sqrt((varx + r * r * vary - 2.0 * r * covxy) / n) / my
      typ -> (n.toLong, r6(r), r6(se), r6(r - z * se), r6(r + z * se))
    }
    val got = graft.operators.Relational.qStatRatioDelta(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got == expected, s"ratio delta diverges:\n got $got\n exp $expected")
    // a CI is an interval around the ratio
    got.values.foreach { case (_, r, se, lo, hi) =>
      assert(se > 0 && lo < r && r < hi)
    }
  }

  test("sample_neyman: variance-optimal allocation recomputed independently") {
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val census = docs.groupBy(_._1).map { case (src, xs) =>
      val n = xs.length
      val sx = xs.map(x => BigInt(x._2)).sum
      val sxx = xs.map(x => BigInt(x._2) * BigInt(x._2)).sum
      val sd = (sxx.toDouble - sx.toDouble * sx.toDouble / n) / (n - 1.0)
      val std6 = r6(math.sqrt(sd))
      (src, n.toLong, std6,
        java.math.BigDecimal.valueOf(n * std6 * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact)
    }.toSeq
    val totW = census.map(_._4).sum
    val alloc = census.map { case (src, n, std6, w) =>
      val a = 100.0 * w / totW
      (src, n, std6, a, math.floor(a).toLong, a - math.floor(a))
    }
    val deficit = 100L - alloc.map(_._5).sum
    val ranked = alloc.sortBy(x => (-x._6, x._1)).zipWithIndex
      .map { case (x, i) => x._1 -> (i + 1 <= deficit) }.toMap
    val expected = alloc.map { case (src, n, std6, a, fl, _) =>
      src -> (n, std6, r6(a), fl + (if (ranked(src)) 1L else 0L))
    }.toMap
    val got = graft.operators.LlmData.qSampleNeyman(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toMap
    assert(got == expected, s"Neyman allocation diverges:\n got $got\n exp $expected")
    // allocations must close the budget exactly
    assert(got.values.map(_._4).sum == 100L)
  }

  test("stat_cuped: planted lift — pre-period adjustment finds the true effect") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cuped").toString
    // 200 users × 30 days, one event/user/day. Post-period (days
    // 15-29) odd users get a true lift δ = 2. The per-user base
    // b_u = 10 + (u mod 7) is arm-balanced and identical pre/post, so
    // X strongly predicts Y (CUPED's working assumption); deterministic
    // per-(user, day) noise keeps the fixture realistic.
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = for (u <- 0L until 200L; d <- 0 until 30) yield {
      val post = d >= 15
      val lift = if (post && u % 2 == 1) 2.0 else 0.0
      val b = 10.0 + (u % 7)
      val noise = ((u * 31 + d) % 5) / 10.0
      (u * 30 + d, new java.sql.Timestamp(base.getTime + d * 86400000L),
        u, "click", b + lift + noise, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val got = graft.operators.Relational.qStatCuped(spark, tmp).collect()
      .map(r => r.getInt(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6)))
      .toMap
    val (pre0, post0, adj0, theta, rho2) = got(0)
    val (pre1, post1, adj1, _, _) = got(1)
    // the pre-period is effect-free (arms differ only by noise layout)
    assert(math.abs(pre1 - pre0) < 1.0, s"pre-period imbalance: $pre0 vs $pre1")
    // the post-period carries δ = 2 per event × 15 days = 30 per user
    assert(math.abs((post1 - post0) - 30.0) < 2.0, s"raw diff off: ${post1 - post0}")
    assert(math.abs((adj1 - adj0) - 30.0) < 2.0, s"adjusted diff off: ${adj1 - adj0}")
    // X ≈ Y structurally → theta near 1, strong variance reduction
    assert(theta > 0.7 && theta < 1.3, s"theta off: $theta")
    assert(rho2 > 0.5, s"rho2 too weak for a correlated pre-period: $rho2")
  }

  test("agg_bitmap_distinct: bitmap popcount equals exact distinct, across buckets") {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (t, xs) =>
      t -> (xs.map(_._2).distinct.length.toLong, xs.length.toLong)
    }
    val got = graft.operators.Relational.qAggBitmapDistinct(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected, s"bitmap distinct diverges:\n got $got\n exp $expected")

    // planted wide-id corpus: 70k ids cross the 32768-per-bucket
    // boundary, so the OR-merge genuinely spans multiple buckets
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bmd").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    (1L to 70000L).map(i => (i, base, i % 70000L, "t", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val wide = graft.operators.Relational.qAggBitmapDistinct(spark, tmp).collect()
    assert(wide.length == 1 && wide(0).getLong(1) == 70000L && wide(0).getLong(2) == 70000L)
  }

  test("stat_cuped: variance-reduced readout recomputed independently") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value")).collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).toInstant.toEpochMilli * 1000 / 86400000000L,
        d2(r.getDouble(2)).movePointRight(2).longValueExact))
    val lo = ev.map(_._2).min; val hi = ev.map(_._2).max
    val mid = lo + (hi - lo + 1) / 2
    val perUser = ev.groupBy(_._1).map { case (u, xs) =>
      (u, xs.filter(_._2 < mid).map(_._3).sum, xs.filter(_._2 >= mid).map(_._3).sum)
    }.toSeq
    // global moments in exact cents / cents² (BigInt), then the same
    // double closes as the operator
    val n = perUser.length
    val tsx = perUser.map(x => BigInt(x._2)).sum
    val tsy = perUser.map(x => BigInt(x._3)).sum
    val tsxy = perUser.map(x => BigInt(x._2) * BigInt(x._3)).sum
    val tsxx = perUser.map(x => BigInt(x._2) * BigInt(x._2)).sum
    val tsyy = perUser.map(x => BigInt(x._3) * BigInt(x._3)).sum
    def cents(b: BigInt) = (BigDecimal(b) / 100).toDouble
    def cents2(b: BigInt) = (BigDecimal(b) / 10000).toDouble
    val nn = n.toDouble
    val cov = cents2(tsxy) / nn - (cents(tsx) / nn) * (cents(tsy) / nn)
    val varX = cents2(tsxx) / nn - (cents(tsx) / nn) * (cents(tsx) / nn)
    val varY = cents2(tsyy) / nn - (cents(tsy) / nn) * (cents(tsy) / nn)
    val theta = cov / varX
    val meanXAll = cents(tsx) / nn
    val expected = perUser.groupBy(x => (x._1 % 2).toInt).map { case (arm, xs) =>
      val na = xs.length
      val sx = xs.map(x => BigInt(x._2)).sum; val sy = xs.map(x => BigInt(x._3)).sum
      val meanX = cents(sx) / na; val meanY = cents(sy) / na
      arm -> (na.toLong, r6(meanX), r6(meanY),
        r6(meanY - theta * (meanX - meanXAll)), r6(theta),
        r6(cov * cov / (varX * varY)))
    }
    val got = Relational.qStatCuped(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(got == expected, s"CUPED readout diverges:\n got $got\n exp $expected")
    // both arms present; rho2 is a squared correlation
    assert(got.keySet == Set(0, 1))
    got.values.foreach { case (_, _, _, _, _, rho2) => assert(rho2 >= 0 && rho2 <= 1) }
  }

  test("q_stat_sprt: planted lift rejects, an exact null never does (r12)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // 20 days × 200 users × 1 event; 'lifted' adds +10.0 to arm 1
    // (odd users) on top of the same deterministic base; 'flat' gives
    // BOTH arms identical values, so delta is exactly 0 every day and
    // the always-valid p may never leave 1.0
    val rows = for {
      day <- 0 until 20
      u <- 0 until 200
      typ <- Seq("lifted", "flat")
    } yield {
      val base = 50.0 + (u % 7) + (day % 3)
      val v = if (typ == "lifted" && u % 2 == 1) base + 10.0 else base
      (day * 200L + u, java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"),
        u.toLong, typ, v)
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.EventOps.sprtFrom(ev).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(5), r.getBoolean(6)))
    val flat = got.filter(_._1 == "flat")
    assert(flat.nonEmpty && flat.forall(x => x._3 == 1.0 && !x._4),
      s"exact-null arm must hold p = 1.0 forever: ${flat.take(3).toSeq}")
    val lifted = got.filter(_._1 == "lifted").sortBy(_._2.getTime)
    assert(lifted.last._3 <= 0.05 && lifted.last._4,
      s"a +10.0 lift on 2000 obs/arm must reject by the final day: ${lifted.last}")
    // always-valid means MONOTONE non-increasing — the peeking guarantee
    lifted.map(_._3).sliding(2).foreach { pair =>
      assert(pair(1) <= pair(0) + 1e-12,
        s"always-valid p increased: ${pair(0)} -> ${pair(1)}")
    }
  }
}
