package graft

import graft.operators.EventOps
import org.apache.spark.sql.functions.col

/** Independent-recompute grades for the batch event operators whose
  * oracle mirrors the CONSTRUCTION (a shared construction bug would
  * pass both engines) — the LlmDataSpec recompute idiom.
  */
class EventOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ev_decay: staircase half-life weights recomputed independently") {
    def halfUp(x: Double, scale: Int): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(x).setScale(scale, java.math.RoundingMode.HALF_UP)
    // plain-Scala reimplementation: UTC calendar-day age, h = age/7
    // capped at 40, weight_micro = 2^20 >> h, value in exact cents
    val ev = Tables.events(spark, dir)
      .select(col("ts"), col("event_type"), col("value")).collect()
      .map(r => (r.getTimestamp(0).toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate,
        r.getString(1), r.getDouble(2)))
    val asOf = ev.map(_._1).max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val expected = ev.groupBy(_._2).map { case (typ, xs) =>
      val terms = xs.map { case (day, _, v) =>
        val h = math.min(java.time.temporal.ChronoUnit.DAYS.between(day, asOf) / 7, 40L)
        val wmi = 1048576L >> h
        val cents = halfUp(v, 2).movePointRight(2).longValueExact
        (cents, wmi)
      }
      val sumCents = terms.map(_._1).sum
      val sumW = terms.map(_._2).sum
      val sumCW = terms.map(t => t._1 * t._2).sum
      typ -> (xs.length.toLong, sumCents / 100.0,
        halfUp(sumW / 1048576.0, 6).doubleValue,
        halfUp(sumCW / 104857600.0, 6).doubleValue,
        halfUp(sumCW / (1048576.0 * sumCents), 6).doubleValue)
    }
    val got = EventOps.qEvDecay(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got == expected, s"decay rollup diverges:\n got $got\n exp $expected")
    // semantics the numbers must show: weights are a DECAY (ratio < 1
    // unless everything is in the newest week) and the newest week
    // contributes at full weight — an as-of-day event's wmi is 2^20
    got.values.foreach { case (_, _, dc, _, ratio) =>
      assert(ratio > 0.0 && ratio <= 1.0, s"decay_ratio out of (0,1]: $ratio")
      assert(dc > 0.0, "decayed_count must be positive")
    }
  }

  test("ev_ewma: dyadic EWMA over the gap-filled spine recomputed independently") {
    def halfUp(x: Double, scale: Int): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(x).setScale(scale, java.math.RoundingMode.HALF_UP)
    val ev = Tables.events(spark, dir)
      .select(col("ts"), col("event_type"), col("value")).collect()
      .map(r => (r.getTimestamp(0).toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate,
        r.getString(1), r.getDouble(2)))
    val days = ev.map(_._1)
    val (lo, hi) = (days.min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _)),
      days.max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _)))
    val spine = Iterator.iterate(lo)(_.plusDays(1)).takeWhile(!_.isAfter(hi)).toSeq
    val daily = ev.groupBy(e => (e._2, e._1)).map { case (k, xs) =>
      k -> (xs.length.toLong,
        xs.map(e => halfUp(e._3, 2).movePointRight(2).longValueExact).sum)
    }
    val expected = ev.map(_._2).distinct.flatMap { typ =>
      val series = spine.map(d => (d, daily.getOrElse((typ, d), (0L, 0L))))
      series.zipWithIndex.map { case ((d, (ne, cents)), idx) =>
        val frame = series.slice(math.max(0, idx - 13), idx + 1).map(_._2._2)
        val l = frame.length
        val num = frame.zipWithIndex.map { case (c, i) => c * (1048576L >> (l - 1 - i)) }.sum
        val den = 2097152L - (2097152L >> l)
        (typ, d.toString) -> (ne, halfUp(cents / 100.0, 6).doubleValue,
          halfUp(num / (den * 100.0), 6).doubleValue)
      }
    }.toMap
    val got = EventOps.qEvEwma(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got == expected, "EWMA diverges from the independent recompute")
    // semantics: on a silent day the EWMA decays but stays positive
    // once any mass entered the frame; it never exceeds the frame max
    got.foreach { case (_, (_, _, e)) => assert(e >= 0.0) }
  }

  test("ev_cooccur: basket counts and lift recomputed independently") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")).collect()
      .map { r =>
        val inst = r.getTimestamp(1).toInstant
        (r.getLong(0), inst.getEpochSecond * 1000000L + inst.getNano / 1000L,
          r.getLong(2), r.getString(3))
      }
    // independent sessionization: per user in (ts, event_id) order, a
    // gap >= 30 min starts a new session (the qEvSession contract)
    val baskets = ev.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
      var sid = 0L
      var prev = Long.MinValue
      xs.sortBy(x => (x._2, x._3)).map { x =>
        if (prev == Long.MinValue || x._2 - prev >= 1800000000L) sid += 1
        prev = x._2
        ((u, sid), x._4)
      }
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val n = baskets.size.toLong
    val typeCount = baskets.values.toSeq.flatten.groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val pairCount = baskets.values.toSeq
      .flatMap(ts => ts.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val expected = pairCount.map { case ((a, b), nab) =>
      (a, b) -> (nab, r6(nab * 1.0 / n),
        r6((nab * n) * 1.0 / (typeCount(a) * typeCount(b))))
    }
    val got = EventOps.qEvCooccur(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == expected, s"co-occurrence diverges:\n got $got\n exp $expected")
  }

  test("join_interval: bucketed overlap pairs equal the quadratic recompute") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id")).collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).toInstant.toEpochMilli * 1000 +
          r.getTimestamp(1).toInstant.getNano / 1000 % 1000, r.getLong(2)))
    val sess = ev.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
      var sid = 0L; var prev = Long.MinValue
      val tagged = xs.sortBy(x => (x._2, x._3)).map { x =>
        if (prev == Long.MinValue || x._2 - prev >= 1800000000L) sid += 1
        prev = x._2
        (sid, x._2)
      }
      tagged.groupBy(_._1).map { case (sid2, ts) =>
        (u, sid2, ts.map(_._2).min, ts.map(_._2).max)
      }
    }
    val expected = (for {
      a <- sess; b <- sess
      if a._1 < b._1 && a._3 <= b._4 && b._3 <= a._4
    } yield (a._1, a._2, b._1, b._2) ->
      (math.min(a._4, b._4) - math.max(a._3, b._3))).toMap
    val got = EventOps.qJoinInterval(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) -> r.getLong(4))
      .toMap
    assert(got == expected, s"interval join diverges:\n got $got\n exp $expected")
    assert(got.nonEmpty && got.values.forall(_ >= 0))
  }

  test("join_asof_tol: tolerance gate recomputed independently; both states present") {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).toInstant.toEpochMilli * 1000 +
          r.getTimestamp(1).toInstant.getNano / 1000 % 1000,
        r.getLong(2), r.getString(3)))
    val tol = 3600000000L
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      var lastView: Option[(Long, Long)] = None // (view_id, view_ts)
      xs.sortBy(x => (x._2, if (x._4 == "view") 0 else 1, x._3)).flatMap { x =>
        if (x._4 == "view") { lastView = Some((x._3, x._2)); None }
        else Some(x._3 -> (x._1, lastView, lastView.map(v => x._2 - v._2)))
      }
    }.map { case (pid, (u, lv, gap)) =>
      val ok = gap.exists(_ <= tol)
      pid -> (u, if (ok) lv.map(_._1) else None, if (ok) gap else None, ok)
    }.toMap
    val got = graft.operators.Relational.qJoinAsofTol(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4))).toMap
    assert(got == expected, s"asof tolerance diverges:\n got $got\n exp $expected")
    // the fixture must exercise BOTH faces of the gate
    assert(got.values.exists(_._4) && got.values.exists(!_._4))
  }

  test("ev_active_users: DAU/WAU/stickiness recomputed independently") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val dayUs = 86400000000L
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), col("ts")).collect()
      .map { r =>
        val us = r.getTimestamp(1).toInstant.toEpochMilli * 1000
        (us / dayUs, r.getLong(0))
      }.distinct
    val days = ud.map(_._1).distinct
    val expected = days.map { d =>
      val dau = ud.filter(_._1 == d).map(_._2).distinct.length.toLong
      val wau = ud.filter(x => x._1 <= d && x._1 > d - 7).map(_._2).distinct.length.toLong
      d -> (dau, wau, r6(dau.toDouble / wau))
    }.toMap
    val got = EventOps.qEvActiveUsers(spark, dir).collect()
      .map { r =>
        val d = r.getTimestamp(0).toInstant.toEpochMilli * 1000 / dayUs
        d -> (r.getLong(1), r.getLong(2), r.getDouble(3))
      }.toMap
    assert(got == expected, s"engagement panel diverges:\n got $got\n exp $expected")
    // WAU dominates DAU; stickiness in (0, 1]
    got.values.foreach { case (dau, wau, st) =>
      assert(dau <= wau && st > 0.0 && st <= 1.0)
    }
  }

  test("ev_concurrency: sweep-line peak recomputed independently") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id")).collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).toInstant.toEpochMilli * 1000 +
          r.getTimestamp(1).toInstant.getNano / 1000 % 1000, r.getLong(2)))
    // sessionize per user (>= 30 min gap starts a session), then clip
    // each [st, en] to days and sweep with open-before-close ties
    val dayUs = 86400000000L
    val sess = ev.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
      var sid = 0L; var prev = Long.MinValue
      val tagged = xs.sortBy(x => (x._2, x._3)).map { x =>
        if (prev == Long.MinValue || x._2 - prev >= 1800000000L) sid += 1
        prev = x._2
        (sid, x._2)
      }
      tagged.groupBy(_._1).map { case (sid2, ts) =>
        (u, sid2, ts.map(_._2).min, ts.map(_._2).max)
      }
    }
    val points = sess.flatMap { case (u, sid, st, en) =>
      (st / dayUs to en / dayUs).flatMap { d =>
        val segSt = math.max(st, d * dayUs)
        val segEn = math.min(en, d * dayUs + dayUs - 1)
        Seq((d, segSt, 1, u, sid), (d, segEn, -1, u, sid))
      }
    }
    val expected = points.groupBy(_._1).map { case (d, ps) =>
      val ordered = ps.sortBy(p => (p._2, -p._3, p._4, p._5))
      var run = 0L; var peak = Long.MinValue
      ordered.foreach { p => run += p._3; peak = math.max(peak, run) }
      d -> (ps.count(_._3 == 1).toLong, peak)
    }
    val got = EventOps.qEvConcurrency(spark, dir).collect()
      .map { r =>
        val dUs = r.getTimestamp(0).toInstant.toEpochMilli * 1000
        dUs / dayUs -> (r.getLong(1), r.getLong(2))
      }.toMap
    assert(got == expected, s"concurrency diverges:\n got $got\n exp $expected")
    got.values.foreach { case (n, peak) => assert(peak >= 1 && peak <= n) }
  }

  test("ev_interarrival: per-type gap census recomputed independently") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    // numpy/Spark linear interpolation at h = f*(n-1); f dyadic so the
    // arithmetic is exact over long gaps (the operator's p75 contract)
    def pct(sorted: Array[Long], f: Double): Double = {
      val h = f * (sorted.length - 1)
      val lo = sorted(h.toInt); val hi = sorted(math.ceil(h).toInt)
      lo + (h - h.toInt) * (hi - lo)
    }
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toInstant.toEpochMilli * 1000 +
          r.getTimestamp(2).toInstant.getNano / 1000 % 1000, r.getLong(3)))
    val gaps = ev.groupBy(e => (e._1, e._2)).toSeq.flatMap { case (_, xs) =>
      val ts = xs.sortBy(x => (x._3, x._4)).map(_._3)
      ts.sliding(2).filter(_.length == 2).map(p => (xs.head._2, p(1) - p(0)))
    }
    val expected = gaps.groupBy(_._1).map { case (typ, xs) =>
      val g = xs.map(_._2).sorted.toArray
      typ -> (g.length.toLong,
        r6(g.sum.toDouble / g.length / 1e6),
        r6(pct(g, 0.5) / 1e6), r6(pct(g, 0.75) / 1e6), g.max)
    }
    val got = EventOps.qEvInterarrival(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
      .toMap
    assert(got == expected, s"interarrival census diverges:\n got $got\n exp $expected")
    // a gap census over positive time must be positive and ordered
    got.values.foreach { case (n, mean, med, p75, mx) =>
      assert(n > 0 && mean > 0 && med <= p75 && p75 <= mx / 1e6 + 1e-6)
    }
  }

  test("ev_cohort: weekly retention triangle recomputed independently") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val weekUs = 7L * 86400000000L
    val dayUs = 86400000000L
    val uw = Tables.events(spark, dir)
      .select(col("user_id"), col("ts")).collect()
      .map { r =>
        val us = r.getTimestamp(1).toInstant.toEpochMilli * 1000
        (r.getLong(0), us / dayUs * dayUs / weekUs)
      }.distinct
    val firstWeek = uw.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val sizes = firstWeek.values.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val expected = uw.map { case (u, w) => (firstWeek(u), w - firstWeek(u), u) }
      .distinct.groupBy(x => (x._1, x._2)).map { case ((cw, off), xs) =>
        (cw, off) -> (xs.map(_._3).distinct.length.toLong, sizes(cw),
          r6(xs.map(_._3).distinct.length.toDouble / sizes(cw)))
      }
    val got = EventOps.qEvCohort(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got == expected, s"cohort triangle diverges:\n got $got\n exp $expected")
    // offset-0 retention is 1 by construction (everyone is active in
    // their own first week), and every cell retains ≤ the cohort size
    got.foreach { case ((_, off), (n, size, ret)) =>
      assert(n <= size && (off != 0L || ret == 1.0))
    }
  }

  test("ev_lifecycle: growth-accounting flows recomputed independently") {
    val weekUs = 7L * 86400000000L
    val dayUs = 86400000000L
    val uw = Tables.events(spark, dir)
      .select(col("user_id"), col("ts")).collect()
      .map { r =>
        val us = r.getTimestamp(1).toInstant.toEpochMilli * 1000
        (r.getLong(0), us / dayUs * dayUs / weekUs)
      }.distinct
    val byWeek = uw.groupBy(_._2).map { case (w, xs) => w -> xs.map(_._1).toSet }
    val firstW = uw.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val lo = uw.map(_._2).min; val hi = uw.map(_._2).max
    val expected = (lo to hi).map { w =>
      val cur = byWeek.getOrElse(w, Set.empty)
      val prev = byWeek.getOrElse(w - 1, Set.empty)
      val nNew = cur.count(firstW(_) == w).toLong
      val nRet = cur.count(prev.contains).toLong
      val nRes = cur.count(u => firstW(u) != w && !prev.contains(u)).toLong
      val nChu = prev.count(u => !cur.contains(u)).toLong
      w -> (cur.size.toLong, nNew, nRet, nRes, nChu)
    }.toMap
    val got = EventOps.qEvLifecycle(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == expected, s"lifecycle flows diverge:\n got $got\n exp $expected")
    // the growth-accounting identity: new + retained + resurrected =
    // active, every week
    got.values.foreach { case (a, n, r, res, _) => assert(n + r + res == a) }
  }

  test("ev_adoption: cumulative adoption curve recomputed independently") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val dayUs = 86400000000L
    val firstDay = Tables.events(spark, dir)
      .select(col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant.toEpochMilli * 1000 / dayUs))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val byDay = firstDay.values.groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    val lo = byDay.keys.min; val hi = byDay.keys.max
    val total = firstDay.size.toLong
    var cum = 0L
    val expected = (lo to hi).map { d =>
      val nNew = byDay.getOrElse(d, 0L)
      cum += nNew
      d -> (nNew, cum, r6(cum.toDouble / total))
    }.toMap
    val got = EventOps.qEvAdoption(spark, dir).collect()
      .map { r =>
        val d = r.getTimestamp(0).toInstant.toEpochMilli * 1000 / dayUs
        d -> (r.getLong(1), r.getLong(2), r.getDouble(3))
      }.toMap
    assert(got == expected, s"adoption curve diverges:\n got $got\n exp $expected")
    // the curve is monotone and closes at 100%
    assert(got(hi)._3 == 1.0 && got(hi)._2 == total)
  }

  test("ev_wow: week-over-week growth recomputed independently") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val weekUs = 7L * 86400000000L
    val dayUs = 86400000000L
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("ts")).collect()
      .map { r =>
        val us = r.getTimestamp(1).toInstant.toEpochMilli * 1000
        (r.getString(0), us / dayUs * dayUs / weekUs)
      }
    val lo = ev.map(_._2).min; val hi = ev.map(_._2).max
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (typ, xs) =>
      val byW = xs.groupBy(_._2).map { case (w, ys) => w -> ys.length.toLong }
      (lo to hi).map { w =>
        val n = byW.getOrElse(w, 0L)
        val prev = if (w == lo) None else Some(byW.getOrElse(w - 1, 0L))
        val g = prev.filter(_ > 0).map(p => r6((n - p).toDouble / p))
        (typ, w) -> (n, prev, g)
      }
    }.toMap
    val got = EventOps.qEvWow(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    assert(got == expected, s"WoW panel diverges:\n got $got\n exp $expected")
    // the first week of each type has no prior-week row
    assert(got.filter(_._1._2 == lo).values.forall(_._2.isEmpty))
  }

  test("ev_value_bands: dyadic percentile bands recomputed independently") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    def pct(sorted: Array[Double], f: Double): Double = {
      val h = f * (sorted.length - 1)
      val lo = h.toInt
      if (lo == h) sorted(lo) else sorted(lo) + (h - lo) * (sorted(lo + 1) - sorted(lo))
    }
    val dayUs = 86400000000L
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("ts"), col("value")).collect()
      .map(r => (r.getString(0),
        r.getTimestamp(1).toInstant.toEpochMilli * 1000 / dayUs, r.getDouble(2)))
    val expected = ev.groupBy(x => (x._1, x._2)).map { case ((t, d), xs) =>
      val s = xs.map(_._3).sorted.toArray
      (t, d) -> (xs.length.toLong, r6(pct(s, 0.25)), r6(pct(s, 0.5)), r6(pct(s, 0.75)))
    }
    val got = EventOps.qEvValueBands(spark, dir).collect()
      .map { r =>
        val d = r.getTimestamp(1).toInstant.toEpochMilli * 1000 / dayUs
        (r.getString(0), d) -> (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      }.toMap
    assert(got == expected, s"value bands diverge:\n got $got\n exp $expected")
    got.values.foreach { case (_, p25, p50, p75) => assert(p25 <= p50 && p50 <= p75) }
  }

  test("stat_wilson: error-rate CI recomputed independently") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val dayUs = 86400000000L
    val ev = Tables.events(spark, dir)
      .select(col("ts"), col("event_type")).collect()
      .map(r => (r.getTimestamp(0).toInstant.toEpochMilli * 1000 / dayUs, r.getString(1)))
    val z = 1.959963984540054
    val expected = ev.groupBy(_._1).map { case (d, xs) =>
      val n = xs.length.toDouble
      val e = xs.count(_._2 == "error").toLong
      val p = e / n
      val center = p + z * z / (2.0 * n)
      val half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
      val denom = 1.0 + z * z / n
      d -> (xs.length.toLong, e, r6(p), r6((center - half) / denom), r6((center + half) / denom))
    }
    val got = EventOps.qStatWilson(spark, dir).collect()
      .map { r =>
        val d = r.getTimestamp(0).toInstant.toEpochMilli * 1000 / dayUs
        d -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      }.toMap
    assert(got == expected, s"Wilson CI diverges:\n got $got\n exp $expected")
    // a Wilson interval is inside [0, 1] and brackets the rate
    got.values.foreach { case (_, _, p, lo, hi) =>
      assert(lo >= 0 && hi <= 1 && lo <= p && p <= hi)
    }
  }

  test("ev_power_users: decile concentration recomputed independently") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val perUser = Tables.events(spark, dir)
      .select(col("user_id")).collect().map(_.getLong(0))
      .groupBy(identity).map { case (u, xs) => (u, xs.length.toLong) }.toSeq
    // ntile semantics: n rows into 10 buckets, first (n mod 10)
    // buckets take ceil(n/10), the rest floor(n/10)
    val ordered = perUser.sortBy { case (u, n) => (-n, u) }
    val nU = ordered.length
    val base = nU / 10; val extra = nU % 10
    val deciles = ordered.zipWithIndex.map { case ((u, n), i) =>
      val d = if (i < (base + 1) * extra) i / (base + 1) + 1
              else (i - (base + 1) * extra) / base + extra + 1
      (d, u, n)
    }
    val total = perUser.map(_._2).sum
    val agg = deciles.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, xs) =>
      (d, xs.length.toLong, xs.map(_._3).sum)
    }
    val expected = agg.scanLeft((0, 0L, 0L, 0L)) { case ((_, _, _, cum), (d, u, e)) =>
      (d, u, e, cum + e)
    }.tail.map { case (d, u, e, cum) =>
      d -> (u, e, r6(e.toDouble / total), r6(cum.toDouble / total))
    }.toMap
    val got = EventOps.qEvPowerUsers(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got == expected, s"power-user census diverges:\n got $got\n exp $expected")
    // cumulative share must close at 1; ntile buckets differ by ≤ 1
    // user; every user lands in exactly one decile
    assert(got(10)._4 == 1.0)
    val sizes10 = got.values.map(_._1)
    assert(sizes10.max - sizes10.min <= 1 && sizes10.sum == nU.toLong)
  }

  /** Plain-Scala PageRank over (user, tsUs, eventId, type) rows with
    * the operator's exact quantization contract: per-round edge
    * contributions HALF_UP-rounded to nano-units before the exact
    * long per-node sum, dangling mass over the same quantized ranks.
    */
  private def referencePagerank(ev: Seq[(Long, Long, Long, String)])
      : Map[String, (Long, Double)] = {
    def qz(v: Double): Long = java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact
    val edges = ev.groupBy(_._1).values.flatMap { xs =>
      val sorted = xs.sortBy(x => (x._2, x._3)).map(_._4)
      sorted.zip(sorted.drop(1))
    }.groupBy(identity).map { case ((f, t), es) => (f, t, es.size.toLong) }.toSeq
    val out = edges.groupBy(_._1).map { case (f, es) => f -> es.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val nN = nodes.length
    var rank = nodes.map(_ -> 1.0 / nN).toMap
    (1 to 3).foreach { _ =>
      val sums = edges.groupBy(_._2).map { case (to, es) =>
        to -> es.map(e => qz(rank(e._1) * e._3 / out(e._1) * 1e9)).sum
      }
      val dq = nodes.filterNot(out.contains).map(n => qz(rank(n) * 1e9)).sum
      rank = nodes.map { n =>
        n -> (0.15 / nN + 0.85 *
          (sums.getOrElse(n, 0L) / 1e9 + dq / 1e9 / nN.toDouble))
      }.toMap
    }
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    nodes.map(n => n -> (out.getOrElse(n, 0L), r6(rank(n)))).toMap
  }

  test("graph_pagerank: three quantized rounds recomputed independently") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).toInstant.toEpochMilli * 1000 +
          r.getTimestamp(1).toInstant.getNano / 1000 % 1000,
        r.getLong(2), r.getString(3)))
    val expected = referencePagerank(ev.toSeq)
    val got = EventOps.qGraphPagerank(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expected, s"pagerank diverges:\n got $got\n exp $expected")
    // ranks form a (near-)distribution: mass stays within quantization
    // tolerance of 1 and every node keeps the (1-d)/N floor
    val mass = got.values.map(_._2).sum
    assert(math.abs(mass - 1.0) < 1e-3 && got.values.forall(_._2 >= 0.15 / got.size - 1e-9))
  }

  test("graph_pagerank: dangling node redistributes mass (planted corpus)") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("pr").toString
    // X never has a successor → dangling; A is never a target
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    Seq(
      (1L, t(0), 1L, "A", 1.0, "{}"), (2L, t(1), 1L, "B", 1.0, "{}"),
      (3L, t(2), 1L, "X", 1.0, "{}"),
      (4L, t(0), 2L, "A", 1.0, "{}"), (5L, t(1), 2L, "X", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val got = EventOps.qGraphPagerank(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val expected = referencePagerank(Seq(
      (1L, 0L, 1L, "A"), (1L, 60000000L, 2L, "B"), (1L, 120000000L, 3L, "X"),
      (2L, 0L, 4L, "A"), (2L, 60000000L, 5L, "X")))
    assert(got == expected, s"dangling pagerank diverges:\n got $got\n exp $expected")
    // X is dangling (no out-transitions) yet holds the highest rank
    // (both paths terminate there); A keeps only the floor + dangling
    assert(got("X")._1 == 0L)
    assert(got("X")._2 > got("A")._2 && got("X")._2 > got("B")._2)
  }

  test("ev_anomaly_mad: window median/MAD recomputed independently") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    // numpy/Spark-style linear interpolation at h = 0.5·(k−1) — exact
    // dyadic arithmetic on these ≤7-element windows
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val h = 0.5 * (s.length - 1)
      val lo = h.toInt
      if (lo == h) s(lo) else s(lo) + (h - lo) * (s(lo + 1) - s(lo))
    }
    val dayUs = 86400000000L
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("ts")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant.toEpochMilli * 1000 / dayUs))
    val lo = ev.map(_._2).min; val hi = ev.map(_._2).max
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (typ, xs) =>
      val byDay = xs.groupBy(_._2).map { case (d, ys) => d -> ys.length.toLong }
      val series = (lo to hi).map(d => d -> byDay.getOrElse(d, 0L))
      series.map { case (d, n) =>
        val win = series.filter(p => p._1 >= d - 6 && p._1 <= d).map(_._2.toDouble)
        val m = med(win)
        val a = med(win.map(x => math.abs(x - m)))
        (typ, d) -> (n, r6(m), r6(a), math.abs(n - m) > 3.0 * a)
      }
    }.toMap
    val got = EventOps.qEvAnomalyMad(spark, dir).collect()
      .map { r =>
        val d = r.getTimestamp(1).toInstant.toEpochMilli * 1000 / dayUs
        (r.getString(0), d) -> (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))
      }.toMap
    assert(got == expected, s"MAD anomaly diverges:\n got $got\n exp $expected")
    // MAD is non-negative and bounded by the window range
    got.values.foreach { case (_, _, a, _) => assert(a >= 0) }
  }

  test("ev_burst: Fano factor over the zero-filled spine recomputed independently") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val dayUs = 86400000000L
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("ts")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant.toEpochMilli * 1000 / dayUs))
    val lo = ev.map(_._2).min; val hi = ev.map(_._2).max
    val expected = ev.groupBy(_._1).map { case (typ, xs) =>
      val byDay = xs.groupBy(_._2).map { case (d, ys) => d -> ys.length.toLong }
      val series = (lo to hi).map(d => byDay.getOrElse(d, 0L))
      val nDays = series.length.toLong
      val nEv = series.sum
      val sumSq = series.map(x => x * x).sum
      val mean = nEv.toDouble / nDays
      typ -> (nDays, nEv, r6(mean),
        r6((sumSq.toDouble / nDays - mean * mean) / mean))
    }
    val got = EventOps.qEvBurst(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got == expected, s"burstiness census diverges:\n got $got\n exp $expected")
    // the spine is global: every type sees the same day count
    assert(got.values.map(_._1).toSet.size == 1)
  }
}
