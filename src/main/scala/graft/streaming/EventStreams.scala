package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming twins of graft.operators.EventOps (§2.9).
  *
  * Each takes a *streaming* DataFrame with the events schema
  * (event_id long, ts timestamp, user_id long, event_type string,
  * value double, props string) and returns a streaming result whose
  * batch semantics match the EventOps builder of the same name.
  * Watermarks bound state: window aggs keep O(open windows) state,
  * funnel keeps O(active users), dedup keeps O(keys within watermark).
  */
object EventStreams {

  /** File-based streaming source over the same parquet table — the
    * production entry would be Kafka; the transform chain is identical.
    */
  def readEvents(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // streaming source needs an explicit schema (pre-ts-conversion)
    // FileStreamSource wants a directory; glob the single harness file
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val raw = s.readStream
      .schema(schema)
      .option("basePath", dir)
      .parquet(s"$dir/events*.parquet")
    // schema-generation adaptivity mirrors Tables.events: long ts is
    // nanos (truncate to µs), timestamp ts is already µs
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // NTZ → LTZ: wall-clock identity under the pinned UTC session tz
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  def tumble(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
              col("n_events"), col("sum_value"))

  def slide(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("user_id"),
              col("n_events"), col("sum_value"))

  /** Native session windows (30-min gap) — the streaming equivalent of
    * EventOps.qEvSession's lag-gap-cumsum batch idiom.
    */
  def session(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n_events"))

  /** Per-session event-type paths (batch twin: the per-session stage
    * of EventOps.qEvSesspath): one row per closed 30-min-gap session
    * with its ordered event-type path — the sequence-model training
    * feed. The top-20 path-count rollup is a SECOND aggregation and
    * runs downstream of the sink (streaming allows one stateful agg
    * per query); state is O(open sessions), the same session_window
    * primitive and watermark as `session` above. Path order = struct
    * array_sort on (ts, event_id, event_type) — the batch rule.
    */
  def sesspath(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(collect_list(struct(col("ts"), col("event_id"), col("event_type"))).as("evs"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        array_join(expr("transform(array_sort(evs), x -> x.event_type)"), ">").as("path"))

  /** First event per (user_id, event_type) — the same key set as the
    * batch twin qEvDedupStream (event_id alone is unique in this data,
    * which would make the dedup a no-op).
    *
    * Caveat: dropDuplicatesWithinWatermark keeps the first ARRIVING
    * record per key; the batch twin keeps the earliest by event time.
    * These coincide for in-order streams — for an out-of-order source
    * where the distinction matters, use a flatMapGroupsWithState
    * min-by-event-time variant (cf. funnel below) instead.
    */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  // ===== stateful funnel (flatMapGroupsWithState) =====

  /** Full-precision event time: getTime truncates to milliseconds,
    * which would break strict ordering comparisons against the batch
    * twin's unix_micros for same-millisecond events.
    */
  private def tsMicros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)
  /** lastUs = max event time EVER SEEN for the user, carried so the
    * retention timeout can never move backwards when a later batch
    * delivers older (but in-watermark) events for the same user — a
    * watermark-plus-this-batch anchor would re-arm the timeout EARLIER
    * and evict live funnel state (review-found eviction edge).
    */
  case class FunnelState(signupUs: Option[Long], clickUs: Option[Long],
    purchaseUs: Option[Long], lastUs: Long = 0L)
  case class FunnelOut(user_id: Long, signup_us: Long, click_us: Long, purchase_us: Long)

  case class TouchState(touchId: Long, touchType: String, touchUs: Long)
  case class AttributionOut(purchase_id: Long, user_id: Long, purchase_us: Long,
    touch_id: Option[Long], touch_type: Option[String], touch_us: Option[Long],
    attributed: Boolean)

  /** Streaming last-touch attribution (batch twin: qEvAttribution).
    * State per user is the single most recent view/click — O(1) per
    * user, never O(events); evicted on event-time timeout 8 days past
    * last activity (a touch older than the 7-day attribution window
    * can never attribute again, so the extra day is pure slack).
    * Within a batch events process in event-time order (cf. funnel); a
    * cross-batch straggler TOUCH arriving behind an already-emitted
    * purchase cannot retro-attribute — the append-mode caveat shared
    * with the dedup twin.
    */
  def attribution(events: DataFrame): Dataset[AttributionOut] = {
    val s = events.sparkSession
    import s.implicits._
    val sevenDaysUs = 7L * 86400L * 1000000L
    events
      .withWatermark("ts", "1 hour")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, AttributionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, evs, state: GroupState[TouchState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = evs.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[AttributionOut]
            var touch = state.getOption
            sorted.foreach { e =>
              val us = tsMicros(e.ts)
              if (e.event_type == "purchase") {
                val attributed = touch.exists(t => us - t.touchUs <= sevenDaysUs)
                out += AttributionOut(e.event_id, uid, us,
                  touch.map(_.touchId), touch.map(_.touchType),
                  touch.map(_.touchUs), attributed)
              } else touch = Some(TouchState(e.event_id, e.event_type, us))
            }
            touch.foreach(state.update)
            // same watermark-vs-last-activity anchor as funnel (the
            // batch-1 zero-watermark pitfall)
            val lastMs = sorted.last.ts.getTime
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), lastMs) + 8L * 86400 * 1000)
            out.iterator
          }
      }
  }

  case class MarkovState(lastType: String, lastUs: Long)
  case class TransitionOut(user_id: Long, from_type: String, to_type: String,
                           from_us: Long, to_us: Long)

  /** Streaming Markov transition stream (batch twin: qEvMarkov's `tr`
    * stage): one row per consecutive same-user event pair, in
    * event-time order. State per user is the single last event —
    * O(1), evicted 30 days past last activity (a documented horizon:
    * a user returning after eviction starts a fresh chain, losing the
    * one transition that spanned the dormancy — the same bounded-state
    * tradeoff the attribution twin declares for its 7-day window).
    * The transition-probability matrix is the downstream aggregation
    * of this stream (count by (from, to) / row_total), exactly as the
    * batch operator aggregates its lead() pairs.
    */
  def markov(events: DataFrame): Dataset[TransitionOut] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", "1 hour")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[MarkovState, TransitionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, evs, state: GroupState[MarkovState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = evs.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[TransitionOut]
            var last = state.getOption
            sorted.foreach { e =>
              val us = tsMicros(e.ts)
              last.foreach(l =>
                out += TransitionOut(uid, l.lastType, e.event_type, l.lastUs, us))
              last = Some(MarkovState(e.event_type, us))
            }
            last.foreach(state.update)
            // watermark-vs-last-activity anchor (the batch-1
            // zero-watermark pitfall — see funnel)
            val lastMs = sorted.last.ts.getTime
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), lastMs) + 30L * 86400 * 1000)
            out.iterator
          }
      }
  }

  case class RetentionState(cohortDay: Long, emitted: Int)
  case class RetentionOut(user_id: Long, cohort_day: java.sql.Date, day_offset: Int)

  /** Streaming cohort-retention increments (batch twin: qEvRetention):
    * one row the FIRST time a user is active on cohort-day + offset
    * (offset 0..7); `count(DISTINCT user_id)` by (cohort_day,
    * day_offset) over this stream is the batch operator's
    * active_users. State per user: first-seen epoch day + an 8-bit
    * emitted mask — O(1), evictable once the watermark passes
    * cohort + 8 days (no in-window event can then arrive non-late).
    * Documented horizon: a user re-appearing AFTER eviction starts a
    * new cohort — the standard bounded-state streaming-retention
    * tradeoff (batch first-seen is unbounded by construction).
    */
  def retention(events: DataFrame): Dataset[RetentionOut] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", "1 hour")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetentionState, RetentionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, evs, state: GroupState[RetentionState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = evs.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
            // UTC epoch day — the session tz is pinned UTC, so this is
            // the batch twin's to_date(ts)
            def day(e: Ev): Long = Math.floorDiv(tsMicros(e.ts), 86400000000L)
            var st = state.getOption.getOrElse(
              RetentionState(day(sorted.head), 0))
            val out = scala.collection.mutable.ArrayBuffer.empty[RetentionOut]
            sorted.foreach { e =>
              val off = (day(e) - st.cohortDay).toInt
              if (off >= 0 && off <= 7 && (st.emitted & (1 << off)) == 0) {
                st = st.copy(emitted = st.emitted | (1 << off))
                out += RetentionOut(uid,
                  java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(st.cohortDay)),
                  off)
              }
            }
            state.update(st)
            // evictable once nothing in [cohort, cohort+7d] can arrive
            // non-late; the max() keeps the timeout ahead of the
            // current watermark as the API requires
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 60000L,
              (st.cohortDay + 8) * 86400000L))
            out.iterator
          }
      }
  }

  /** Emits one row per user the moment the ordered
    * signup→click→purchase funnel completes. State is O(active users)
    * and dropped on event-time timeout past the watermark.
    */
  /** The SHARED per-batch funnel state machine (one copy for funnel
    * and funnelTime — review-found lockstep risk): advance `st0` over
    * this batch's events in event-time order and return the new state
    * plus the step completions `(step, gapUs)` in completion order.
    */
  private def advanceFunnel(st0: FunnelState, evs: Seq[Ev]): (FunnelState, Seq[(String, Long)]) = {
    var st = st0
    val gaps = Seq.newBuilder[(String, Long)]
    val sorted = evs.sortBy(e => (tsMicros(e.ts), e.event_id))
    sorted.foreach { e =>
      val us = tsMicros(e.ts)
      e.event_type match {
        case "signup" if st.signupUs.isEmpty => st = st.copy(signupUs = Some(us))
        case "click" if st.signupUs.isDefined && st.clickUs.isEmpty &&
          us > st.signupUs.get =>
          st = st.copy(clickUs = Some(us))
          gaps += (("1_signup_to_click", us - st.signupUs.get))
        case "purchase" if st.clickUs.isDefined && st.purchaseUs.isEmpty &&
          us > st.clickUs.get =>
          st = st.copy(purchaseUs = Some(us))
          gaps += (("2_click_to_purchase", us - st.clickUs.get))
        case _ =>
      }
    }
    (st.copy(lastUs = math.max(st0.lastUs, tsMicros(sorted.last.ts))), gaps.result())
  }

  /** Anchor the 24 h retention to the group's LAST ACTIVITY EVER (the
    * state-carried lastUs), not the watermark alone: in the first
    * micro-batch the watermark is still 0 (it advances after a
    * batch), so a watermark-relative timeout would land in 1970 and
    * the first real watermark advance would evict every batch-1 user;
    * and a later batch of OLDER in-watermark events must not pull an
    * armed timeout backwards. max(watermark, …) keeps the timeout
    * valid (it must exceed the current watermark) without shortening.
    */
  private def armFunnelTimeout(state: GroupState[FunnelState], st: FunnelState): Unit =
    state.setTimeoutTimestamp(
      math.max(state.getCurrentWatermarkMs(), st.lastUs / 1000) + 24L * 3600 * 1000)

  def funnel(events: DataFrame): Dataset[FunnelOut] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", "1 hour")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, evs, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st0 = state.getOption.getOrElse(FunnelState(None, None, None))
            val done0 = st0.purchaseUs.isDefined
            val (st, _) = advanceFunnel(st0, evs.toSeq)
            state.update(st)
            armFunnelTimeout(state, st)
            if (!done0 && st.purchaseUs.isDefined)
              Iterator(FunnelOut(uid, st.signupUs.get, st.clickUs.get, st.purchaseUs.get))
            else Iterator.empty
          }
      }
  }

  /** Stream-stream interval join (batch twin: qEvCtxjoin): purchases
    * joined to the same user's clicks in the preceding hour, both
    * sides watermarked so Spark can bound the join state — clicks
    * hold long enough to meet a future purchase (join window + the
    * purchase side's lateness), purchases evict on their own
    * watermark. The range condition bounds BOTH event times, which is
    * what makes state cleanup possible at all; without it a
    * stream-stream join's state grows forever.
    */
  // ===== shared sides of the context interval join (ONE statement of
  // the window and both watermark delays — the inner and outer faces
  // must never disagree on them) =====

  private def purchaseSide(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")

  private def clickSide(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")

  private def ctxJoinCond =
    expr("""p_user = c_user AND
           |click_ts >= purchase_ts - INTERVAL 1 HOUR AND
           |click_ts < purchase_ts""".stripMargin)

  def ctxJoin(events: DataFrame): DataFrame =
    purchaseSide(events).join(clickSide(events), ctxJoinCond)
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        expr("(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000")
          .as("gap_s"))

  /** LEFT-OUTER stream-stream interval join (batch twin:
    * qEvCtxjoinOuter's pre-rollup pair stream): purchases keep a row
    * even with no influencing click — but the null-click row can only
    * emit once the watermark PROVES no matching click can still
    * arrive (Spark holds the unmatched purchase in state until then).
    * Consequence pinned by the spec: a purchase near the head of the
    * stream emits its organic row only after later event time
    * advances the watermark past its window — and purchases near the
    * end of a bounded replay never flush, which is why the file-
    * source comparison must restrict to watermark-closed purchases.
    * The n_clicks rollup runs downstream of the sink.
    */
  def ctxJoinOuter(events: DataFrame): DataFrame =
    purchaseSide(events).join(clickSide(events), ctxJoinCond, "leftOuter")
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("purchase_ts"), col("click_id"))

  case class EvV(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

  /** Streaming hour-of-day seasonality profile (batch twin: qEvHourly's
    * byHour stage): per (event_type, hour-of-day) counts + exact
    * decimal value sums. The 24-hour clock folds ALL event time onto
    * O(types × 24) cells, so no cell ever closes and no watermark
    * applies — run in complete (or update) mode; state IS the profile,
    * corpus-size-free. The share-of-day normalization is a second
    * windowed aggregation and runs downstream of the sink (the
    * sesspath rule).
    */
  def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), hour(col("ts")).as("hour_of_day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  case class HourRow(hour_start: Timestamp, n_events: Long)
  /** open = per-hour in-flight counts; lastClosedMs = the most recent
    * emitted spine hour (−1 before the spine origin exists). */
  case class GapfillState(open: Seq[(Long, Long)], lastClosedMs: Long)

  /** Streaming gap-filled hour spine (batch twin: qEvGapfill): one row
    * per hour from the first observed hour onward — INCLUDING zero
    * rows for silent hours, emitted the moment the watermark proves
    * the hour closed (a windowed agg alone cannot produce them: no
    * rows → no group). Single global spine key; the function sees
    * only narrow (ts) rows and folds them to O(open hours) counts, so
    * state is O(hours in flight) — at extreme volume, pre-shrink with
    * an upstream per-hour windowed aggregate in its own query and run
    * this as the downstream spine pass (the two-query sesspath
    * split). Timeout re-arms at the next hour boundary so silent
    * hours close off watermark advances even when the key has no new
    * rows in a batch.
    */
  def gapfill(events: DataFrame): Dataset[HourRow] = {
    val s = events.sparkSession
    import s.implicits._
    val HourMs = 3600000L
    events
      .withWatermark("ts", "1 hour")
      .select(col("ts")).as[Timestamp]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[GapfillState, HourRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, evs, state: GroupState[GapfillState]) =>
          val st0 = state.getOption.getOrElse(GapfillState(Nil, -1L))
          var open = st0.open.toMap
          if (!state.hasTimedOut) {
            evs.foreach { t =>
              val h = Math.floorDiv(tsMicros(t) / 1000L, HourMs) * HourMs
              open += h -> (open.getOrElse(h, 0L) + 1L)
            }
          }
          val wm = state.getCurrentWatermarkMs()
          // every aligned hour with h + 1h <= wm is closed
          val cap = if (wm < HourMs) Long.MinValue
            else Math.floorDiv(wm - HourMs, HourMs) * HourMs
          val out = scala.collection.mutable.ArrayBuffer.empty[HourRow]
          var last = st0.lastClosedMs
          if (last < 0 && open.nonEmpty) {
            // spine origin: the first observed hour, once it closes
            val first = open.keys.min
            if (first <= cap) last = first - HourMs
          }
          if (last >= 0) {
            var h = last + HourMs
            while (h <= cap) {
              out += HourRow(new Timestamp(h), open.getOrElse(h, 0L))
              open -= h
              last = h
              h += HourMs
            }
          }
          // an in-watermark straggler for an already-emitted hour would
          // otherwise park an unreachable entry in state forever
          state.update(GapfillState(
            open.filter(_._1 > last).toSeq.sortBy(_._1), last))
          // close future hours off pure watermark advances (no-data
          // batches only invoke timed-out keys)
          state.setTimeoutTimestamp(math.max(wm + 1000L, cap + 2 * HourMs))
          out.iterator
      }
  }

  case class EvT(ts: Timestamp, user_id: Long, event_type: String)
  case class EntropyState(counts: Map[String, Long], lastUs: Long)
  case class EntropyOut(user_id: Long, n_events: Long, n_types: Long, entropy: Double)

  /** Streaming per-user behavioral entropy (batch twin: qEvEntropy):
    * an UPDATE stream — each trigger emits the refreshed
    * (n_events, n_types, entropy) row for every user whose counts
    * changed; the LAST row per user is the current profile and equals
    * the batch operator on a full replay. State per user is the
    * O(types) count map (types are a tiny closed set — the qEvMarkov
    * argument), evicted 30 days past last activity with the markov
    * twin's documented dormancy horizon. Entropy math mirrors the
    * batch nano-unit firewall exactly: per-type terms c·⌊ln(c/n)·1e9⌉
    * as longs, one closing double division — bit-identical parity,
    * not approximate.
    */
  def entropy(events: DataFrame): Dataset[EntropyOut] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", "1 hour")
      .select(col("ts"), col("user_id"), col("event_type")).as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EntropyState, EntropyOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, evs, state: GroupState[EntropyState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st0 = state.getOption.getOrElse(EntropyState(Map.empty, 0L))
            var counts = st0.counts
            var lastUs = st0.lastUs
            evs.foreach { e =>
              counts += e.event_type -> (counts.getOrElse(e.event_type, 0L) + 1L)
              lastUs = math.max(lastUs, tsMicros(e.ts))
            }
            state.update(EntropyState(counts, lastUs))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), lastUs / 1000) +
                30L * 86400 * 1000)
            val n = counts.valuesIterator.sum
            // the batch operator's exact chain: round(ln(c/n)·1e9) as
            // long terms, then round6(−(Σterm/1e9)/n)
            val termSum = counts.valuesIterator.map { c =>
              c * java.math.BigDecimal.valueOf(math.log(c.toDouble / n) * 1e9)
                .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
            }.sum
            val ent = java.math.BigDecimal
              .valueOf(-(termSum.toDouble / 1e9) / n)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
            Iterator(EntropyOut(uid, n, counts.size.toLong, ent))
          }
      }
  }
  case class DayAgg(day: Long, n: Long, cents: Long)
  /** open = in-flight daily partials (watermark not yet past day end);
    * closedTail = the most recent ≤ 6 CLOSED daily rows (the trailing
    * window's lookback); seen = closed-day count (the batch rn). */
  case class AnomalyState(open: List[DayAgg], closedTail: List[DayAgg], seen: Long)
  case class AnomalyOut(event_type: String, day: Timestamp, n_events: Long,
    v: Double, mean7: Double, std7: Double, z: Double, is_anomaly: Boolean)

  /** Streaming daily-anomaly monitor (batch twin: qEvAnomaly): per
    * event_type, each day's value sum is z-scored against the
    * trailing 7 OBSERVED days (itself included), flagged at |z| ≥ 2 —
    * the production monitor shape of the batch query, emitting each
    * day's verdict the moment the watermark proves the day complete.
    *
    * State per event_type is O(1): the ≤ 6 most recent closed daily
    * rows + the open-day partials the watermark hasn't passed
    * (bounded by lateness: at a 1 h watermark at most 2 calendar days
    * are ever open) — O(types × 7) rows total, corpus-size-free, and
    * the state never needs eviction because types are a tiny closed
    * set (the qEvMarkov O(types²) argument).
    *
    * Exactness: per-event values fold as exact half-up cents (the
    * batch d2 cast), daily sums close as longs, and the 7-day
    * moments convert through scaled BigDecimal — bit-identical to
    * the batch operator's decimal(·,2)/(·,4)-then-cast-double chain,
    * so flag parity is exact, not approximate. A daily sum past
    * decimal(18,2) range throws loudly (longValueExact), mirroring
    * the batch operator's honest-bound NULL/error note.
    *
    * Emission timing: a day closes when the GLOBAL watermark passes
    * its end; days close in ascending order per type, and a day with
    * zero events is simply absent — exactly the batch window-over-
    * observed-rows frame. The first 6 closed days emit nothing (the
    * batch rn ≥ 7 filter).
    */
  def anomaly(events: DataFrame): Dataset[AnomalyOut] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", "1 hour")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[EvV]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomalyState, AnomalyOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (etype, evs, state: GroupState[AnomalyState]) =>
          val st0 = state.getOption.getOrElse(AnomalyState(Nil, Nil, 0L))
          var open = st0.open.map(d => d.day -> d).toMap
          if (!state.hasTimedOut) {
            evs.foreach { e =>
              val d = Math.floorDiv(tsMicros(e.ts), 86400000000L)
              val cents = java.math.BigDecimal.valueOf(e.value)
                .setScale(2, java.math.RoundingMode.HALF_UP)
                .movePointRight(2).longValueExact()
              val cur = open.getOrElse(d, DayAgg(d, 0L, 0L))
              open += d -> DayAgg(d, cur.n + 1, cur.cents + cents)
            }
          }
          val wm = state.getCurrentWatermarkMs()
          val (toClose, stillOpen) = open.values.toList.sortBy(_.day)
            .partition(d => (d.day + 1) * 86400000L <= wm)
          var tail = st0.closedTail
          var seen = st0.seen
          val out = scala.collection.mutable.ArrayBuffer.empty[AnomalyOut]
          def bd(unscaled: java.math.BigInteger, scale: Int): Double =
            new java.math.BigDecimal(unscaled, scale).doubleValue()
          def big(l: Long) = java.math.BigInteger.valueOf(l)
          def round6(x: Double): Double =
            java.math.BigDecimal.valueOf(x)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          toClose.foreach { d =>
            seen += 1
            if (seen >= 7) {
              val win = tail.takeRight(6) :+ d
              val s1 = bd(win.map(c => big(c.cents))
                .foldLeft(java.math.BigInteger.ZERO)(_.add(_)), 2)
              val s2 = bd(win.map(c => big(c.cents).multiply(big(c.cents)))
                .foldLeft(java.math.BigInteger.ZERO)(_.add(_)), 4)
              val cnt = 7.0
              val v = bd(big(d.cents), 2)
              val mean7 = round6(s1 / cnt)
              val std7 = round6(math.sqrt(
                math.max((s2 - s1 * s1 / cnt) / (cnt - 1), 0.0)))
              val z = round6((v - mean7) / math.max(std7, 1e-9))
              out += AnomalyOut(etype, new Timestamp(d.day * 86400000L),
                d.n, v, mean7, std7, z, math.abs(z) >= 2)
            }
            tail = (tail :+ d).takeRight(6)
          }
          state.update(AnomalyState(stillOpen, tail, seen))
          // re-arm so open days close even if this type goes quiet: the
          // earliest open day's end, kept strictly ahead of the current
          // watermark as the API requires. No open days → no timeout;
          // the O(types) resident state needs no eviction.
          if (stillOpen.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(wm + 60000L, (stillOpen.map(_.day).min + 1) * 86400000L))
          out.iterator
      }
  }

  case class StepGapOut(user_id: Long, step: String, gap_us: Long)

  /** Streaming funnel step latencies (batch twin: the per-user gap
    * streams of qEvFunnelTime — the median/p90 rollup is a second
    * aggregation and runs downstream of the sink, the sesspath rule).
    * Same per-user first-times state machine and 24 h retention as
    * `funnel`, but a gap row is emitted the moment a STEP completes —
    * signup→click gaps flow for users who never purchase, matching
    * the batch query's per-step populations.
    */
  def funnelTime(events: DataFrame): Dataset[StepGapOut] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", "1 hour")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StepGapOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, evs, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st0 = state.getOption.getOrElse(FunnelState(None, None, None))
            val (st, gaps) = advanceFunnel(st0, evs.toSeq)
            state.update(st)
            armFunnelTimeout(state, st)
            gaps.iterator.map { case (step, gapUs) => StepGapOut(uid, step, gapUs) }
          }
      }
  }
}
