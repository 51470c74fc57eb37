package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming twins (§2.9) driven through MemoryStream. */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def evDf(evs: Seq[Ev]) = {
    val s = spark
    import s.implicits._
    val stream = MemoryStream[Ev](s)
    stream.addData(evs)
    (stream, stream.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}")))
  }

  test("tumble twin matches batch window counts (complete mode)") {
    val s = spark
    import s.implicits._
    val evs = Seq(
      Ev(1, ts(5), 1, "click"), Ev(2, ts(20), 1, "click"),
      Ev(3, ts(65), 2, "view"), Ev(4, ts(70), 1, "click"))
    val (_, df) = evDf(evs)
    val q = EventStreams.tumble(df).writeStream
      .format("memory").queryName("tumble_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = s.sql("SELECT hour_start, event_type, n_events FROM tumble_out ORDER BY hour_start, event_type")
        .as[(Timestamp, String, Long)].collect().toSeq
      assert(rows == Seq(
        (ts(0), "click", 2L),
        (ts(60), "click", 1L),
        (ts(60), "view", 1L)))
    } finally q.stop()
  }

  test("slide twin: one row per overlapping 15-min-slide window") {
    val s = spark
    import s.implicits._
    // 1h windows sliding every 15 min: window starts are multiples of
    // the slide, so an event at minute 20 falls in the 4 windows
    // starting at 23:30, 23:45, 00:00 and 00:15 — 4 windows, starts
    // one slide apart, which is exactly what the assertions check
    val (_, df) = evDf(Seq(Ev(1, ts(20), 7, "click")))
    val q = EventStreams.slide(df).writeStream
      .format("memory").queryName("slide_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = s.sql("SELECT win_start, user_id, n_events FROM slide_out ORDER BY win_start")
        .as[(Timestamp, Long, Long)].collect().toSeq
      assert(rows.length == 4, s"expected 4 overlapping windows, got $rows")
      assert(rows.forall { case (_, uid, n) => uid == 7L && n == 1L })
      // consecutive window starts are exactly one slide apart
      val starts = rows.map(_._1.getTime)
      assert(starts.sliding(2).forall { case Seq(a, b) => b - a == 15 * 60 * 1000 })
    } finally q.stop()
  }

  test("late events behind the watermark are dropped (append-mode tumble)") {
    val s = spark
    import s.implicits._
    val stream = MemoryStream[Ev](s)
    val df = stream.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.tumble(df).writeStream
      .format("memory").queryName("late_out").outputMode("append").start()
    try {
      // batch 1: window [0h,1h) gets one event; the 2h05 event pushes
      // the watermark to 1h55 after the batch, closing [0h,1h)
      stream.addData(Seq(Ev(1, ts(5), 1, "click"), Ev(2, ts(125), 2, "click")))
      q.processAllAvailable()
      // batch 2: minute-15 event is 100 min behind the watermark → must
      // be DROPPED, not added to the already-closed [0h,1h) window
      stream.addData(Seq(Ev(3, ts(15), 3, "click"), Ev(4, ts(130), 4, "click")))
      q.processAllAvailable()
      val out = s.table("late_out")
        .select(col("hour_start").cast("string"), col("n_events")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(out("2024-01-01 00:00:00") == 1L,
        s"late event leaked into the closed window: $out")
    } finally q.stop()
  }

  test("dedup twin drops duplicate event_id within watermark") {
    val s = spark
    import s.implicits._
    val evs = Seq(Ev(1, ts(1), 1, "click"), Ev(1, ts(2), 1, "click"), Ev(2, ts(3), 1, "view"))
    val (_, df) = evDf(evs)
    val q = EventStreams.dedup(df).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val n = s.sql("SELECT count(DISTINCT event_id) c, count(*) n FROM dedup_out").collect()(0)
      assert(n.getLong(0) == 2 && n.getLong(1) == 2)
    } finally q.stop()
  }

  test("funnel twin emits only ordered signup→click→purchase completions") {
    val s = spark
    import s.implicits._
    val evs = Seq(
      // user 1 completes in order
      Ev(1, ts(1), 1, "signup"), Ev(2, ts(2), 1, "click"), Ev(3, ts(3), 1, "purchase"),
      // user 2 purchases before clicking — never completes
      Ev(4, ts(1), 2, "signup"), Ev(5, ts(2), 2, "purchase"), Ev(6, ts(3), 2, "click"))
    val (_, df) = evDf(evs)
    val q = EventStreams.funnel(df).writeStream
      .format("memory").queryName("funnel_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val users = s.sql("SELECT user_id FROM funnel_out").as[Long].collect().toSeq
      assert(users == Seq(1L))
    } finally q.stop()
  }

  test("session twin: beyond-watermark late event cannot merge closed sessions") {
    val s = spark
    import s.implicits._
    val stream = MemoryStream[Ev](s)
    val df = stream.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.session(df).writeStream
      .format("memory").queryName("late_session_out").outputMode("append").start()
    try {
      // batch 1: user 1 bursts at minute 0 and minute 50 — 40 min
      // apart, so two distinct 30-min-gap sessions. The minute-200
      // event drives the watermark to 190, far past both session ends.
      stream.addData(Seq(Ev(1, ts(0), 1, "click"), Ev(2, ts(50), 1, "click"),
        Ev(3, ts(200), 9, "click")))
      q.processAllAvailable()
      // batch 2: a minute-20 straggler. If accepted it would bridge
      // the 0- and 50-minute bursts into ONE merged session (it is
      // within 30 min of both); 170 min behind the watermark it must
      // be dropped — the batch-side contract (q_ev_late_watermark):
      // events older than the watermark are FINAL, never mutated.
      stream.addData(Seq(Ev(4, ts(20), 1, "click"), Ev(5, ts(210), 9, "click")))
      q.processAllAvailable()
      stream.addData(Seq(Ev(6, ts(400), 9, "click"))) // push watermark; flush closures
      q.processAllAvailable()
      val u1 = s.sql(
        "SELECT n_events FROM late_session_out WHERE user_id = 1 ORDER BY session_start")
        .as[Long].collect().toSeq
      assert(u1 == Seq(1L, 1L),
        s"late event merged or extended a closed session: $u1")
    } finally q.stop()
  }

  test("funnel twin: out-of-order arrival within and across batches still completes") {
    val s = spark
    import s.implicits._
    val stream = MemoryStream[Ev](s)
    val df = stream.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.funnel(df).writeStream
      .format("memory").queryName("ooo_funnel_out").outputMode("append").start()
    try {
      // user 1: the whole funnel arrives in ONE batch in REVERSED
      // arrival order — the handler sorts by event time, so ordered-
      // by-event-time completion must still be detected
      stream.addData(Seq(Ev(3, ts(3), 1, "purchase"), Ev(2, ts(2), 1, "click"),
        Ev(1, ts(1), 1, "signup")))
      q.processAllAvailable()
      // user 2: signup+purchase arrive first, the bridging click only
      // in the NEXT batch (still within watermark) — state must carry
      // the signup across batches, and the purchase must NOT complete
      // the funnel retroactively (purchase at t4 > click at t5 fails
      // the ordering, so user 2 never completes)
      stream.addData(Seq(Ev(4, ts(2), 2, "signup"), Ev(5, ts(4), 2, "purchase")))
      q.processAllAvailable()
      stream.addData(Seq(Ev(6, ts(5), 2, "click")))
      q.processAllAvailable()
      // user 3: same cross-batch split but in funnel order — completes
      stream.addData(Seq(Ev(7, ts(2), 3, "signup"), Ev(8, ts(4), 3, "click")))
      q.processAllAvailable()
      stream.addData(Seq(Ev(9, ts(6), 3, "purchase")))
      q.processAllAvailable()
      val users = s.sql("SELECT user_id FROM ooo_funnel_out ORDER BY user_id")
        .as[Long].collect().toSeq
      assert(users == Seq(1L, 3L), s"expected users 1 and 3 to complete, got $users")
    } finally q.stop()
  }

  test("dedup twin: cross-batch duplicate within watermark is dropped") {
    val s = spark
    import s.implicits._
    val stream = MemoryStream[Ev](s)
    val df = stream.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.dedup(df).writeStream
      .format("memory").queryName("xbatch_dedup_out").outputMode("append").start()
    try {
      stream.addData(Seq(Ev(1, ts(1), 1, "click")))
      q.processAllAvailable()
      // batch 2: same (user, type) key 1 min later — inside the 10-min
      // watermark, so state still holds the key → dropped; a new type
      // for the same user passes
      stream.addData(Seq(Ev(2, ts(2), 1, "click"), Ev(3, ts(3), 1, "view")))
      q.processAllAvailable()
      val rows = s.sql("SELECT event_id FROM xbatch_dedup_out ORDER BY event_id")
        .as[Long].collect().toSeq
      assert(rows == Seq(1L, 3L), s"cross-batch duplicate leaked: $rows")
    } finally q.stop()
  }

  test("file-source tumble twin reproduces the oracle-checked batch result") {
    // end-to-end over the REAL parquet fixture through readEvents
    // (schema inference, nanos→µs conversion, FileStreamSource glob):
    // the streaming aggregate must equal q_ev_tumble, whose output the
    // DuckDB oracle hash-checks every round
    val dir = "/root/testdata/sf0.001"
    val q = EventStreams.tumble(EventStreams.readEvents(spark, dir)).writeStream
      .format("memory").queryName("file_tumble").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT hour_start, event_type, n_events, sum_value FROM file_tumble")
        .collect().map(_.toString).sorted.toSeq
      val batch = graft.operators.EventOps.qEvTumble(spark, dir)
        .select("hour_start", "event_type", "n_events", "sum_value")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"streaming tumble diverged from batch (${streamed.length} vs ${batch.length} rows)")
    } finally q.stop()
  }

  test("file-source funnel twin finds the same completed users as batch") {
    val dir = "/root/testdata/sf0.001"
    val q = EventStreams.funnel(EventStreams.readEvents(spark, dir)).writeStream
      .format("memory").queryName("file_funnel").outputMode("append").start()
    try {
      q.processAllAvailable()
      val s = spark
      import s.implicits._
      val streamed = s.sql("SELECT user_id FROM file_funnel")
        .as[Long].collect().toSet
      val batch = graft.operators.EventOps.qEvFunnel(spark, dir)
        .filter(col("completed"))
        .select("user_id").as[Long].collect().toSet
      assert(batch.nonEmpty, "fixture should contain completed funnels")
      assert(streamed == batch,
        s"streaming-only=${streamed.diff(batch)} batch-only=${batch.diff(streamed)}")
    } finally q.stop()
  }

  test("file-source session twin reproduces the batch session windows") {
    // the batch form is lag-gap-cumsum with a `>= 30 min starts a new
    // session` boundary, documented as equal to session_window's
    // half-open [start, last + gap) extent — this pins that claim on
    // the real fixture: same (user, session_start, n_events) triples
    val dir = "/root/testdata/sf0.001"
    val q = EventStreams.session(EventStreams.readEvents(spark, dir)).writeStream
      .format("memory").queryName("file_session").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT user_id, session_start, n_events FROM file_session")
        .collect().map(_.toString).sorted.toSeq
      val batch = graft.operators.EventOps.qEvSession(spark, dir)
        .select(col("user_id"), col("session_start"), col("n_events"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"session twin diverged: ${streamed.length} vs ${batch.length} rows; " +
        s"first-only-streamed=${streamed.diff(batch).take(3)} " +
        s"first-only-batch=${batch.diff(streamed).take(3)}")
    } finally q.stop()
  }

  test("file-source sesspath twin reproduces the batch top-20 paths") {
    // the twin emits one row per session with its ordered path; the
    // top-20 count rollup is the documented downstream stage — run it
    // here over the sink and pin row equality with qEvSesspath
    val dir = "/root/testdata/sf0.001"
    val q = EventStreams.sesspath(EventStreams.readEvents(spark, dir)).writeStream
      .format("memory").queryName("file_sesspath").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        """SELECT path, COUNT(*) AS n_sessions FROM file_sesspath
          |GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val batch = graft.operators.EventOps.qEvSesspath(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"sesspath twin diverged: ${streamed.take(3)} vs ${batch.take(3)}")
    } finally q.stop()
  }

  test("sesspath twin: a session spanning two triggers merges into one path") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Ev](s)
    val events = input.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.sesspath(events).writeStream
      .format("memory").queryName("sesspath_merge").outputMode("complete").start()
    try {
      // trigger 1: two events 10 min apart (open session)
      input.addData(Ev(1L, ts(0), 7L, "signup"), Ev(2L, ts(10), 7L, "click"))
      q.processAllAvailable()
      // trigger 2: 20 min after the last event — within the 30-min gap,
      // session_window must MERGE it into the same session's path
      input.addData(Ev(3L, ts(30), 7L, "purchase"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, path FROM sesspath_merge")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((7L, "signup>click>purchase")),
        s"expected one merged session path, got $rows")
    } finally q.stop()
  }

  test("file-source funnel-time twin reproduces the batch step latencies") {
    // the twin emits per-user gap rows as steps complete; the
    // median/p90 rollup runs downstream of the sink — run it here and
    // pin row equality with qEvFunnelTime
    val dir = "/root/testdata/sf0.001"
    val q = EventStreams.funnelTime(EventStreams.readEvents(spark, dir)).writeStream
      .format("memory").queryName("file_funnel_time").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        """SELECT step, COUNT(*) AS n_users,
          |  ROUND(percentile(gap_us, 0.5) / 1000000.0, 6) AS med_s,
          |  ROUND(percentile(gap_us, 0.9) / 1000000.0, 6) AS p90_s
          |FROM file_funnel_time GROUP BY step ORDER BY step""".stripMargin)
        .collect().map(_.toString).toSeq
      val batch = graft.operators.EventOps.qEvFunnelTime(spark, dir)
        .collect().map(_.toString).toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"funnel-time twin diverged: $streamed vs $batch")
    } finally q.stop()
  }

  test("funnel-time twin emits a step-1 gap for a user who never purchases") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Ev](s)
    val events = input.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.funnelTime(events).writeStream
      .format("memory").queryName("funnel_time_partial").outputMode("append").start()
    try {
      input.addData(Ev(1L, ts(0), 9L, "signup"), Ev(2L, ts(7), 9L, "click"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, step, gap_us FROM funnel_time_partial")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(rows == Seq((9L, "1_signup_to_click", 7L * 60 * 1000000)),
        s"expected one step-1 gap row, got $rows")
    } finally q.stop()
  }

  test("file-source stream-stream interval join reproduces the batch context pairs") {
    val dir = "/root/testdata/sf0.001"
    val q = EventStreams.ctxJoin(EventStreams.readEvents(spark, dir)).writeStream
      .format("memory").queryName("file_ctxjoin").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT user_id, purchase_id, click_id, gap_s FROM file_ctxjoin")
        .collect().map(_.toString).sorted.toSeq
      val batch = graft.operators.EventOps.qEvCtxjoin(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"ctxjoin twin diverged: ${streamed.length} vs ${batch.length} pairs; " +
        s"only-streamed=${streamed.diff(batch).take(3)} only-batch=${batch.diff(streamed).take(3)}")
    } finally q.stop()
  }

  test("stream-stream join: click in one trigger meets a purchase in the next") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Ev](s)
    val events = input.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.ctxJoin(events).writeStream
      .format("memory").queryName("ctxjoin_xbatch").outputMode("append").start()
    try {
      input.addData(Ev(1L, ts(0), 5L, "click"))
      q.processAllAvailable()
      // purchase 40 min later arrives in the NEXT trigger — the click
      // must still be in join state and pair with it
      input.addData(Ev(2L, ts(40), 5L, "purchase"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, purchase_id, click_id, gap_s FROM ctxjoin_xbatch")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(rows == Seq((5L, 2L, 1L, 40L * 60)),
        s"expected the cross-trigger pair, got $rows")
    } finally q.stop()
  }

  test("LEFT-OUTER stream join: the organic row emits only after the watermark closes the window") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Ev](s)
    val events = input.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.ctxJoinOuter(events).writeStream
      .format("memory").queryName("ctxjoin_outer_hold").outputMode("append").start()
    try {
      // a clickless purchase: its organic row CANNOT emit yet — a
      // matching click might still arrive within the watermark
      input.addData(Ev(1L, ts(10), 3L, "purchase"))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM ctxjoin_outer_hold").count() == 0,
        "organic row emitted before the watermark proved no click can arrive")
      // advance BOTH sides' event time far past the window + delays
      input.addData(Seq(Ev(2L, ts(600), 99L, "click"), Ev(3L, ts(600), 99L, "purchase")))
      q.processAllAvailable()
      input.addData(Seq(Ev(4L, ts(610), 98L, "click"), Ev(5L, ts(610), 98L, "purchase")))
      q.processAllAvailable()
      val organic = spark.sql(
        "SELECT user_id, purchase_id FROM ctxjoin_outer_hold WHERE click_id IS NULL")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(organic.contains((3L, 1L)),
        s"expected the held organic row for user 3 after watermark advance, got $organic")
    } finally q.stop()
  }

  test("funnel timeout never moves backwards on older in-watermark events") {
    // regression pin for the review-found eviction edge: the timeout
    // anchors to the MAX event time ever seen per user, so a later
    // batch delivering an OLDER (still in-watermark) event must not
    // re-arm the timeout earlier and evict live state
    val s = spark
    import s.implicits._
    val input = MemoryStream[Ev](s)
    val events = input.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.funnel(events).writeStream
      .format("memory").queryName("funnel_anchor").outputMode("append").start()
    try {
      // t1: user 1 signs up at hour 100 → anchor 100 h, timeout 124 h
      input.addData(Ev(1L, ts(6000), 1L, "signup"))
      q.processAllAvailable()
      // t2: an OLDER in-watermark event for user 1 (hour 99.5; the
      // watermark is ~99 h). A this-batch anchor would re-arm the
      // timeout to 123.5 h — earlier than the armed 124 h
      input.addData(Ev(2L, ts(5970), 1L, "view"))
      q.processAllAvailable()
      // t3: filler pushes the watermark into (123.5 h, 124 h): with
      // the backwards anchor user 1 would be EVICTED here
      input.addData(Ev(3L, ts(7485), 9L, "view"))
      q.processAllAvailable()
      // t4: user 1 completes at hour 125 — only possible if the
      // signup state survived t3
      input.addData(Seq(Ev(4L, ts(7500), 1L, "click"), Ev(5L, ts(7501), 1L, "purchase")))
      q.processAllAvailable()
      val done = spark.sql("SELECT user_id FROM funnel_anchor")
        .collect().map(_.getLong(0)).toSeq
      assert(done == Seq(1L),
        s"funnel state was evicted by a backwards-moving timeout: $done")
    } finally q.stop()
  }

  test("stream-stream join soak: click state evicts once the watermark passes the window") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Ev](s)
    val events = input.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.ctxJoin(events).writeStream
      .format("memory").queryName("ctxjoin_soak").outputMode("append").start()
    try {
      // trigger 1: 30 clicks — 30 rows of click-side join state
      input.addData((1 to 30).map(i => Ev(i, ts(i % 10), i.toLong, "click")))
      q.processAllAvailable()
      val s1 = stateRows(q)
      // trigger 2: hour 8 on BOTH sides — the query watermark is the
      // MIN across inputs, so the purchase side must also advance (a
      // purchase stream that never fires would pin the watermark at 0
      // and no click could ever evict)
      input.addData(Seq(Ev(900, ts(480), 900L, "click"),
        Ev(910, ts(480), 910L, "purchase")))
      q.processAllAvailable()
      // trigger 3: applies the advanced watermark on entry → eviction
      input.addData(Seq(Ev(901, ts(485), 901L, "click"),
        Ev(911, ts(485), 911L, "purchase")))
      q.processAllAvailable()
      val s3 = stateRows(q)
      info(s"ctxjoin state rows: after trigger1=$s1, after trigger3=$s3")
      assert(s1 >= 30, s"expected >= 30 click-state rows after trigger 1, got $s1")
      assert(s3 <= 5,
        s"join state not bounded by watermark: $s3 rows for 2 live clicks (32 seen)")
    } finally q.stop()
  }

  test("file-source LEFT-OUTER stream join matches batch on watermark-closed purchases") {
    val dir = "/root/testdata/sf0.001"
    val q = EventStreams.ctxJoinOuter(EventStreams.readEvents(spark, dir)).writeStream
      .format("memory").queryName("file_ctxjoin_outer").outputMode("append").start()
    try {
      q.processAllAvailable()
      // a bounded replay never flushes outer rows near the stream end
      // (the watermark stops at max event time − delay), so compare
      // only purchases whose join window is provably closed: 3 h
      // before the stream's end. The real boundary is the GLOBAL
      // watermark (min over sides of max-event-time − delay, i.e. the
      // click side's 2 h delay measured from the last CLICK, which
      // can itself trail the last purchase) minus the 1 h window —
      // measured ≈ 5.5 h on this fixture (organic rows emitted up to
      // 16:42 with stream end 23:26); 8 h is a conservative margin
      val ev = graft.Tables.events(spark, dir)
      val maxMs = ev.agg(org.apache.spark.sql.functions.max("ts"))
        .head().getTimestamp(0).getTime
      val closed = ev.filter(col("event_type") === "purchase")
        .collect()
        .filter(_.getAs[java.sql.Timestamp]("ts").getTime <= maxMs - 8L * 3600 * 1000)
        .map(_.getAs[Long]("event_id")).toSet
      val streamed = spark.sql(
        """SELECT user_id, purchase_id, COUNT(click_id) AS n_clicks
          |FROM file_ctxjoin_outer GROUP BY 1, 2""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(t => closed(t._2)).toSet
      val batch = graft.operators.EventOps.qEvCtxjoinOuter(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(t => closed(t._2)).toSet
      assert(closed.nonEmpty && streamed == batch,
        s"outer twin diverged on ${closed.size} closed purchases: " +
        s"only-streamed=${(streamed -- batch).take(3)} only-batch=${(batch -- streamed).take(3)}")
      // the outer semantics must actually be exercised: at least one
      // organic (zero-click) purchase in the compared set
      assert(batch.exists(_._3 == 0L),
        "fixture has no organic purchase in the closed window — outer path untested")
    } finally q.stop()
  }

  test("file-source dedup twin keeps exactly the batch key set") {
    // dropDuplicatesWithinWatermark keeps the first ARRIVING record
    // per key while the batch twin keeps the earliest by event time —
    // a documented divergence in the representative row, so the pin
    // here is the part that IS guaranteed: one survivor per key and
    // the same (user_id, event_type) key set as the batch result
    val dir = "/root/testdata/sf0.001"
    val q = EventStreams.dedup(EventStreams.readEvents(spark, dir)).writeStream
      .format("memory").queryName("file_dedup").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT user_id, event_type FROM file_dedup")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val batch = graft.operators.EventOps.qEvDedupStream(spark, dir)
        .select("user_id", "event_type")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(streamed.length == streamed.distinct.length, "duplicate keys survived")
      assert(streamed.toSet == batch.toSet,
        s"key sets diverged: ${streamed.length} vs ${batch.length} keys")
    } finally q.stop()
  }

  test("session twin groups by 30-minute gaps") {
    val s = spark
    import s.implicits._
    // two bursts 40 minutes apart → 2 sessions
    val evs = Seq(Ev(1, ts(0), 1, "click"), Ev(2, ts(10), 1, "click"), Ev(3, ts(50), 1, "click"))
    val (_, df) = evDf(evs)
    val q = EventStreams.session(df).writeStream
      .format("memory").queryName("session_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val n = s.sql("SELECT count(*) FROM session_out").as[Long].collect()(0)
      assert(n == 2)
    } finally q.stop()
  }

  // ===== multi-trigger soaks: watermark advancement must keep the
  // state store O(active keys), not O(keys ever seen) (round-4
  // verdict item 5) =====

  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.lastProgress.stateOperators(0).numRowsTotal

  test("session soak: state stays O(open sessions) across 3+ triggers") {
    val s = spark
    import s.implicits._
    val stream = MemoryStream[Ev](s)
    val df = stream.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.session(df).writeStream.format("memory")
      .queryName("soak_session").outputMode("append").start()
    try {
      // trigger 1: 40 users burst in the first minutes — 40 open sessions
      stream.addData((1 to 40).map(u => Ev(u, ts(u % 6), u.toLong, "click")))
      q.processAllAvailable()
      val s1 = stateRows(q)
      // trigger 2: hour 4 — the watermark (end of this batch) moves to
      // ~3:50, far past every trigger-1 session's end + gap
      stream.addData((201 to 205).map(i => Ev(i, ts(240 + i % 5), (i - 200).toLong, "click")))
      q.processAllAvailable()
      // trigger 3: hour 8 — trigger-1 sessions are evicted at this
      // batch's start (watermark is applied entering the trigger)
      stream.addData(Seq(Ev(999, ts(480), 999L, "click")))
      q.processAllAvailable()
      val s3 = stateRows(q)
      info(s"session state rows: after trigger1=$s1, after trigger3=$s3")
      assert(s1 >= 40, s"expected >= 40 open sessions after trigger 1, got $s1")
      assert(s3 <= 10,
        s"state not bounded by watermark: $s3 rows for ~6 open sessions (45 keys seen)")
    } finally q.stop()
  }

  test("dedup soak: dropDuplicatesWithinWatermark state evicts expired keys across triggers") {
    val s = spark
    import s.implicits._
    val stream = MemoryStream[Ev](s)
    val df = stream.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.dedup(df).writeStream.format("memory")
      .queryName("soak_dedup").outputMode("append").start()
    try {
      // trigger 1: 60 distinct (user, type) keys in the first minutes
      stream.addData((1 to 60).map(i => Ev(i, ts(i % 8), i.toLong, "click")))
      q.processAllAvailable()
      val s1 = stateRows(q)
      // trigger 2: hour 2 — watermark moves ~110 min past every
      // trigger-1 event, so those keys leave the 10-min retention
      stream.addData((101 to 105).map(i => Ev(i, ts(120 + i % 5), i.toLong, "click")))
      q.processAllAvailable()
      // trigger 3: hour 4 — trigger-2 keys expire in turn (state is
      // dropped entering the trigger, after the watermark advanced)
      stream.addData(Seq(Ev(999, ts(240), 999L, "click")))
      q.processAllAvailable()
      val s3 = stateRows(q)
      info(s"dedup state rows: after trigger1=$s1, after trigger3=$s3")
      assert(s1 >= 60, s"expected >= 60 dedup state keys after trigger 1, got $s1")
      assert(s3 <= 10,
        s"dedup state not bounded by watermark: $s3 rows for ~1 in-watermark key (66 keys seen)")
      // and every emitted event_id is still unique — eviction must not
      // re-admit duplicates of rows that were emitted in-watermark
      val n = s.sql("SELECT count(DISTINCT event_id) c, count(*) n FROM soak_dedup").head()
      assert(n.getLong(0) == n.getLong(1), "duplicate event rows in the soak output")
    } finally q.stop()
  }

  test("late-watermark soak: stragglers dropped across 3+ triggers, closed windows final") {
    val s = spark
    import s.implicits._
    val stream = MemoryStream[Ev](s)
    val df = stream.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.tumble(df).writeStream.format("memory")
      .queryName("soak_late").outputMode("append").start()
    try {
      // trigger 1: [0h,1h) gets 2 events; the 2h05 event moves the
      // watermark to 1h55 after the batch, closing [0h,1h)
      stream.addData(Seq(Ev(1, ts(5), 1, "click"), Ev(2, ts(10), 2, "click"),
        Ev(3, ts(125), 3, "click")))
      q.processAllAvailable()
      // trigger 2: one straggler for the closed [0h,1h) window (must
      // drop) and a 4h05 event pushing the watermark to 3h55
      stream.addData(Seq(Ev(4, ts(15), 4, "click"), Ev(5, ts(245), 5, "click")))
      q.processAllAvailable()
      // trigger 3: stragglers for BOTH closed windows ([0h,1h) and
      // [2h,3h)) — the watermark only ever advances, so both drop
      stream.addData(Seq(Ev(6, ts(20), 6, "click"), Ev(7, ts(130), 7, "click"),
        Ev(8, ts(500), 8, "click")))
      q.processAllAvailable()
      // trigger 4: close everything still open
      stream.addData(Seq(Ev(9, ts(800), 9, "click")))
      q.processAllAvailable()
      val out = s.table("soak_late")
        .select(col("hour_start").cast("string"), col("n_events")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(out("2024-01-01 00:00:00") == 2L,
        s"straggler leaked into the closed [0h,1h) window: $out")
      assert(out("2024-01-01 02:00:00") == 1L,
        s"straggler leaked into the closed [2h,3h) window: $out")
      // every in-watermark event landed exactly once
      assert(out("2024-01-01 04:00:00") == 1L && out("2024-01-01 08:00:00") == 1L, s"$out")
    } finally q.stop()
  }

  test("funnel soak: flatMapGroupsWithState evicts timed-out users across triggers") {
    val s = spark
    import s.implicits._
    def tsd(day: Int, minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d ${minute / 60}%02d:${minute % 60}%02d:00")
    val stream = MemoryStream[Ev](s)
    val df = stream.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.funnel(df).writeStream.format("memory")
      .queryName("soak_funnel").outputMode("append").start()
    try {
      // trigger 1: 50 users sign up on day 1 — 50 state groups, each
      // with a watermark+24h event-time timeout
      stream.addData((1 to 50).map(u => Ev(u, tsd(1, u), u.toLong, "signup")))
      q.processAllAvailable()
      val s1 = stateRows(q)
      // trigger 2: day 4 — watermark jumps ~3 days, day-1 timeouts fire
      stream.addData((101 to 110).map(i => Ev(1000L + i, tsd(4, i - 100), i.toLong, "signup")))
      q.processAllAvailable()
      // trigger 3: day 6 — day-4 users' timeouts fire in turn
      stream.addData(Seq(Ev(9999, tsd(6, 1), 999L, "signup")))
      q.processAllAvailable()
      val s3 = stateRows(q)
      info(s"funnel state rows: after trigger1=$s1, after trigger3=$s3")
      assert(s1 >= 50, s"expected >= 50 state groups after trigger 1, got $s1")
      assert(s3 <= 15,
        s"state not evicted on timeout: $s3 groups for ~1 active user (61 keys seen)")
    } finally q.stop()
  }

  test("attribution twin: cross-batch touch carry, 7-day window, touchless purchase") {
    val s = spark
    import s.implicits._
    def tsd(day: Int, minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d ${minute / 60}%02d:${minute % 60}%02d:00")
    val stream = MemoryStream[Ev](s)
    val df = stream.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.attribution(df).writeStream
      .format("memory").queryName("attr_out").outputMode("append").start()
    try {
      // batch 1, REVERSED arrival order: the in-batch sort must put
      // the click (t1) before the purchase (t2) → attributed; then a
      // second purchase (t3) re-attributes to the SAME click (last
      // touch persists, it is not consumed)
      stream.addData(Seq(Ev(3, tsd(1, 3), 1, "purchase"), Ev(1, tsd(1, 1), 1, "click"),
        Ev(2, tsd(1, 2), 1, "purchase")))
      q.processAllAvailable()
      // batch 2: user 1 purchases again — the batch-1 click must carry
      // across batches in state; user 2 purchases with NO touch ever →
      // unattributed row, not a dropped row
      stream.addData(Seq(Ev(4, tsd(1, 30), 1, "purchase"), Ev(5, tsd(1, 31), 2, "purchase")))
      q.processAllAvailable()
      // batch 3: user 3 touched on day 2, purchases on day 12 — gap
      // beyond the 7-day window → emitted but attributed=false
      stream.addData(Seq(Ev(6, tsd(2, 1), 3, "view")))
      q.processAllAvailable()
      stream.addData(Seq(Ev(7, tsd(12, 1), 3, "purchase")))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT purchase_id, touch_id, attributed FROM attr_out ORDER BY purchase_id")
        .as[(Long, Option[Long], Boolean)].collect().toSeq
      assert(rows == Seq(
        (2L, Some(1L), true),
        (3L, Some(1L), true),
        (4L, Some(1L), true),
        (5L, None, false),
        (7L, Some(6L), false)), s"got $rows")
    } finally q.stop()
  }

  test("attribution soak: one touch row per user, evicted past the window") {
    val s = spark
    import s.implicits._
    def tsd(day: Int, minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d ${minute / 60}%02d:${minute % 60}%02d:00")
    val stream = MemoryStream[Ev](s)
    val df = stream.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.attribution(df).writeStream
      .format("memory").queryName("soak_attr").outputMode("append").start()
    try {
      // trigger 1: 60 users each produce 5 touches — state must hold
      // ONE row per user (the last touch), not 5
      stream.addData(for (u <- 1 to 60; i <- 0 until 5)
        yield Ev(u * 10L + i, tsd(1, u + i), u.toLong, "view"))
      q.processAllAvailable()
      val s1 = stateRows(q)
      // trigger 2: day 12 — beyond touch-day+8, day-1 timeouts fire
      stream.addData(Seq(Ev(9001, tsd(12, 1), 999L, "view")))
      q.processAllAvailable()
      // trigger 3: day 22 advances the watermark again so trigger-2
      // evictions (which need a watermark PAST the timeout) take hold
      stream.addData(Seq(Ev(9002, tsd(22, 1), 998L, "view")))
      q.processAllAvailable()
      val s3 = stateRows(q)
      info(s"attribution state rows: after trigger1=$s1, after trigger3=$s3")
      assert(s1 <= 61, s"state must be O(users) not O(events): $s1 rows for 60 users")
      assert(s1 >= 60, s"expected ~60 state rows after trigger 1, got $s1")
      assert(s3 <= 5,
        s"state not evicted past the attribution window: $s3 rows for ~2 active users")
    } finally q.stop()
  }

  test("file-source markov twin reproduces the batch transition counts") {
    // aggregating the streamed transition rows must equal qEvMarkov's
    // oracle-checked (from_type, to_type, n) counts on the real fixture
    val dir = "/root/testdata/sf0.001"
    val q = EventStreams.markov(EventStreams.readEvents(spark, dir)).writeStream
      .format("memory").queryName("file_markov").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT from_type, to_type, count(*) AS n FROM file_markov GROUP BY 1, 2")
        .collect().map(_.toString).sorted.toSeq
      val batch = graft.operators.EventOps.qEvMarkov(spark, dir)
        .select("from_type", "to_type", "n")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"streaming markov diverged (${streamed.length} vs ${batch.length} cells)")
    } finally q.stop()
  }

  test("file-source retention twin reproduces the batch cohort matrix") {
    val dir = "/root/testdata/sf0.001"
    val q = EventStreams.retention(EventStreams.readEvents(spark, dir)).writeStream
      .format("memory").queryName("file_retention").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        """SELECT cohort_day, day_offset, count(DISTINCT user_id) AS active_users
          |FROM file_retention GROUP BY 1, 2""".stripMargin)
        .collect().map(_.toString).sorted.toSeq
      val batch = graft.operators.EventOps.qEvRetention(spark, dir)
        .select(col("cohort_day"), col("day_offset").cast("int"), col("active_users"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"streaming retention diverged (${streamed.length} vs ${batch.length} cells)")
    } finally q.stop()
  }

  test("markov soak: O(1) state per user, cross-batch transition, dormancy eviction") {
    val s = spark
    import s.implicits._
    def tsd(day: Int, minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d ${minute / 60}%02d:${minute % 60}%02d:00")
    val stream = MemoryStream[Ev](s)
    val df = stream.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.markov(df).writeStream
      .format("memory").queryName("soak_markov").outputMode("append").start()
    try {
      // trigger 1: 40 users × 4 events — state must be ONE row per
      // user (the last event), not 4
      stream.addData(for (u <- 1 to 40; i <- 0 until 4)
        yield Ev(u * 10L + i, tsd(1, u + i * 2), u.toLong, if (i % 2 == 0) "view" else "click"))
      q.processAllAvailable()
      val s1 = stateRows(q)
      // trigger 2: user 1 returns next day — the cross-batch
      // transition must pair with trigger-1's LAST event
      stream.addData(Seq(Ev(9001, tsd(2, 1), 1L, "purchase")))
      q.processAllAvailable()
      val cross = s.sql(
        "SELECT from_type FROM soak_markov WHERE user_id = 1 AND to_type = 'purchase'")
        .collect().map(_.getString(0)).toSeq
      assert(cross == Seq("click"), s"cross-batch transition wrong: $cross")
      // triggers 3+4: jump far past the 30-day dormancy horizon, then
      // advance the watermark again so the timeouts take hold
      stream.addData(Seq(Ev(9002, tsd(15, 1), 998L, "view"))) // feb 15 vs jan: month boundary avoided
      q.processAllAvailable()
      stream.addData(Seq(Ev(9003,
        Timestamp.valueOf("2024-03-20 00:01:00"), 997L, "view")))
      q.processAllAvailable()
      stream.addData(Seq(Ev(9004,
        Timestamp.valueOf("2024-04-25 00:01:00"), 996L, "view")))
      q.processAllAvailable()
      val s4 = stateRows(q)
      info(s"markov state rows: after trigger1=$s1, after dormancy=$s4")
      assert(s1 >= 40 && s1 <= 41, s"state must be O(users): $s1 rows for 40 users")
      assert(s4 <= 5,
        s"dormant users not evicted past the 30-day horizon: $s4 rows")
      // every streamed transition is strictly forward in event time
      val bad = s.sql("SELECT count(*) FROM soak_markov WHERE to_us <= from_us").head().getLong(0)
      assert(bad == 0, s"$bad non-forward transitions")
    } finally q.stop()
  }

  test("retention soak: emitted mask dedups offsets, state evicted past cohort+8d") {
    val s = spark
    import s.implicits._
    def tsd(day: Int, minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d ${minute / 60}%02d:${minute % 60}%02d:00")
    val stream = MemoryStream[Ev](s)
    val df = stream.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.retention(df).writeStream
      .format("memory").queryName("soak_retention").outputMode("append").start()
    try {
      // trigger 1: 30 users, 3 events each on days 1 and 2 — exactly
      // TWO rows per user (offsets 0, 1) despite 6 events
      stream.addData(for (u <- 1 to 30; d <- 1 to 2; i <- 0 until 3)
        yield Ev(u * 100L + d * 10 + i, tsd(d, u + i), u.toLong, "view"))
      q.processAllAvailable()
      val rows1 = s.sql("SELECT count(*) FROM soak_retention").head().getLong(0)
      assert(rows1 == 60, s"expected 30 users × offsets {0,1} = 60 rows, got $rows1")
      val s1 = stateRows(q)
      // day-9 event for user 1 is past offset 7 — no new row, but the
      // watermark (day 9 - 1 h) passes cohort+8d for every user
      stream.addData(Seq(Ev(9001, tsd(10, 1), 1L, "view")))
      q.processAllAvailable()
      stream.addData(Seq(Ev(9002, tsd(25, 1), 999L, "view")))
      q.processAllAvailable()
      val s3 = stateRows(q)
      val rows3 = s.sql("SELECT count(*) FROM soak_retention").head().getLong(0)
      info(s"retention state rows: after trigger1=$s1, after advance=$s3")
      // 60 + user 999's own cohort row; user 1's day-10 event (offset
      // 9, past the window) must NOT have added one
      assert(rows3 == 61, s"past-window events must not add rows: $rows3")
      val u1 = s.sql("SELECT count(*) FROM soak_retention WHERE user_id = 1").head().getLong(0)
      assert(u1 == 2, s"user 1 must keep exactly offsets {0,1}: $u1 rows")
      assert(s1 >= 30, s"expected >= 30 state rows, got $s1")
      assert(s3 <= 5,
        s"state not evicted past cohort+8d: $s3 rows for ~2 in-horizon users")
    } finally q.stop()
  }

  test("anomaly twin: closed days emit trailing-7 z-scores, state stays O(types)") {
    val s = spark
    import s.implicits._
    def tsd(day: Int, minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d ${minute / 60}%02d:${minute % 60}%02d:00")
    val stream = MemoryStream[EventStreams.EvV](s)
    val q = EventStreams.anomaly(stream.toDF()).writeStream
      .format("memory").queryName("soak_anomaly").outputMode("append").start()
    try {
      // one event per day at noon, value 10 except a 100 spike on day 9
      def ev(day: Int, v: Double) =
        EventStreams.EvV(day.toLong, tsd(day, 720), day.toLong, "m", v)
      // trigger 1: days 1..7. The trailing no-data micro-batch applies
      // the post-batch watermark (day 7 11:00) and closes days 1..6 —
      // seen = 6 < 7, so the batch rn ≥ 7 filter holds: no emission
      stream.addData((1 to 7).map(d => ev(d, 10.0)))
      q.processAllAvailable()
      assert(s.table("soak_anomaly").count() == 0,
        "the rn >= 7 warm-up emitted before 7 closed days existed")
      // trigger 2: days 8..10 (spike on 9). The no-data batch's
      // watermark (day 10 11:00) closes days 7, 8, 9 — spike flagged
      stream.addData(Seq(ev(8, 10.0), ev(9, 100.0), ev(10, 10.0)))
      q.processAllAvailable()
      assert(s.table("soak_anomaly").count() == 3,
        "days 7-9 should close off trigger 2's watermark")
      // trigger 3: day-12 filler closes day 10 (spike now mid-window →
      // small negative z, unflagged); trigger 4 closes day 12 in turn
      stream.addData(Seq(ev(12, 10.0)))
      q.processAllAvailable()
      stream.addData(Seq(ev(14, 10.0)))
      q.processAllAvailable()
      val rows = s.table("soak_anomaly")
        .select(col("day").cast("string"), col("z"), col("is_anomaly"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
        .sortBy(_._1)
      assert(rows.map(_._1).toSeq ==
        Seq("2024-01-07 00:00:00", "2024-01-08 00:00:00",
          "2024-01-09 00:00:00", "2024-01-10 00:00:00", "2024-01-12 00:00:00"),
        s"closed-day emission set wrong: ${rows.toSeq}")
      val flagged = rows.filter(_._3).map(_._1).toSeq
      assert(flagged == Seq("2024-01-09 00:00:00"),
        s"only the spike day should flag: ${rows.toSeq}")
      // the spike's z against six 10s: (100 − 160/7) / √((10600 −
      // 160²/7)/6) ≈ 2.2678
      val zSpike = rows.find(_._1 == "2024-01-09 00:00:00").get._2
      assert(math.abs(zSpike - 2.267791) < 1e-4, s"spike z drifted: $zSpike")
      // flat-window days score exactly 0 (std floor 1e-9, the batch
      // greatest() rule); days with the spike mid-window score small
      // negative z but never flag
      assert(rows.take(2).forall(_._2 == 0.0),
        s"flat days must z-score 0: ${rows.toSeq}")
      assert(rows.drop(3).forall(r => r._2 < 0 && math.abs(r._2) < 2),
        s"mid-window spike days must score small negative z: ${rows.toSeq}")
      // state is O(types): ONE group row despite 12 distinct days seen
      val sr = stateRows(q)
      assert(sr <= 2, s"anomaly state not O(types): $sr rows for 1 type")
    } finally q.stop()
  }

  test("file-source hourly twin matches the batch hour-of-day profile") {
    // complete-mode profile + the downstream share normalization must
    // reproduce q_ev_hourly's full tuples (the 24-hour clock never
    // closes, so a bounded replay covers every cell — no watermark
    // restriction needed, unlike the anomaly/gapfill twins)
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val q = EventStreams.hourly(EventStreams.readEvents(spark, dir)).writeStream
      .format("memory").queryName("file_hourly").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = s.sql(
        """SELECT event_type, hour_of_day, n_events, sum_value,
          |  ROUND(n_events / CAST(SUM(n_events) OVER (PARTITION BY event_type) AS DOUBLE), 6) AS share
          |FROM file_hourly""".stripMargin)
        .collect().map(_.toString).sorted.toSeq
      val batch = graft.operators.EventOps.qEvHourly(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"streaming hourly diverged from batch (${streamed.length} vs ${batch.length} rows)")
    } finally q.stop()
  }

  test("gapfill twin emits zero rows for silent hours as the watermark closes them") {
    val s = spark
    import s.implicits._
    val stream = MemoryStream[Ev](s)
    val df = stream.toDF()
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val q = EventStreams.gapfill(df).writeStream.format("memory")
      .queryName("soak_gapfill").outputMode("append").start()
    try {
      // hours 0 and 3 have events; hours 1 and 2 are silent. The 6h05
      // event advances the watermark past every earlier hour end.
      stream.addData(Seq(Ev(1, ts(10), 1, "click"), Ev(2, ts(20), 2, "view"),
        Ev(3, ts(185), 3, "click"), Ev(4, ts(365), 9, "view")))
      q.processAllAvailable()
      val rows = s.table("soak_gapfill")
        .select(col("hour_start").cast("string"), col("n_events"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      assert(rows.map(_._1).toSeq == (0 to 4).map(h => f"2024-01-01 0$h%d:00:00"),
        s"spine must run first-observed..watermark-closed: ${rows.toSeq}")
      assert(rows.toMap == Map(
        "2024-01-01 00:00:00" -> 2L, "2024-01-01 01:00:00" -> 0L,
        "2024-01-01 02:00:00" -> 0L, "2024-01-01 03:00:00" -> 1L,
        "2024-01-01 04:00:00" -> 0L), s"wrong spine counts: ${rows.toSeq}")
      // a later trigger extends the spine (hour 5 closes with 0, hour
      // 6's own count closes) — cross-trigger continuity, no re-emits
      stream.addData(Seq(Ev(5, ts(485), 9, "view")))
      q.processAllAvailable()
      val rows2 = s.table("soak_gapfill")
        .select(col("hour_start").cast("string"), col("n_events"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      assert(rows2.length == 7 &&
        rows2.map(_._1).distinct.length == 7, s"duplicate spine rows: ${rows2.toSeq}")
      assert(rows2.toMap.get("2024-01-01 05:00:00").contains(0L) &&
        rows2.toMap.get("2024-01-01 06:00:00").contains(1L), s"${rows2.toSeq}")
    } finally q.stop()
  }

  test("file-source gapfill twin matches batch on watermark-closed spine hours") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val q = EventStreams.gapfill(EventStreams.readEvents(spark, dir)).writeStream
      .format("memory").queryName("file_gapfill").outputMode("append").start()
    try {
      q.processAllAvailable()
      val maxMs = graft.Tables.events(spark, dir)
        .agg(org.apache.spark.sql.functions.max("ts"))
        .head().getTimestamp(0).getTime
      val wmMs = maxMs - 3600 * 1000L
      val batch = graft.operators.EventOps.qEvGapfill(spark, dir)
        .collect()
        .filter(_.getTimestamp(0).getTime + 3600000L <= wmMs)
        .map(_.toString).sorted.toSeq
      val streamed = s.table("file_gapfill")
        .collect().map(_.toString).sorted.toSeq
      assert(batch.nonEmpty && streamed == batch,
        s"streaming gapfill diverged from batch (${streamed.length} vs ${batch.length} rows)")
    } finally q.stop()
  }

  test("file-source entropy twin: last update per user equals the batch profile") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val q = EventStreams.entropy(EventStreams.readEvents(spark, dir)).writeStream
      .format("memory").queryName("file_entropy").outputMode("append").start()
    try {
      q.processAllAvailable()
      // update-stream contract: n_events per user only grows, so the
      // max-n row per user IS the final profile
      val streamed = s.sql(
        """SELECT user_id, n_events, n_types, entropy FROM (
          |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) AS rn
          |  FROM file_entropy) WHERE rn = 1""".stripMargin)
        .collect().map(_.toString).sorted.toSeq
      val batch = graft.operators.EventOps.qEvEntropy(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"streaming entropy diverged from batch (${streamed.length} vs ${batch.length} rows)")
    } finally q.stop()
  }

  test("chi2-drift twin: file-source last trigger equals batch; skew raises the alarm") {
    import graft.streaming.CorpusStreams
    val s = spark
    val dir = "/root/testdata/sf0.001"
    // file-source parity: the max-seq rows are the current verdict and
    // must equal q_stat_chi2's full tuples after a complete replay
    val q = CorpusStreams.chi2Drift(CorpusStreams.readDocuments(spark, dir))
      .writeStream.format("memory").queryName("file_chi2").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = s.sql(
        """SELECT source, n_docs, chi2_contrib FROM file_chi2
          |WHERE seq = (SELECT MAX(seq) FROM file_chi2)""".stripMargin)
        .collect().map(_.toString).sorted.toSeq
      val batch = graft.operators.LlmData.qStatChi2(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"streaming chi2 diverged from batch (${streamed.length} vs ${batch.length} rows)")
    } finally q.stop()

    // drift detection across triggers: a balanced corpus scores low;
    // one source flooding a single language spikes its contribution
    import s.implicits._
    val stream = MemoryStream[(String, String)](s)
    val df = stream.toDF().toDF("source", "lang")
    val q2 = CorpusStreams.chi2Drift(df).writeStream
      .format("memory").queryName("soak_chi2").outputMode("append").start()
    try {
      stream.addData(for (src <- Seq("s1", "s2"); lg <- Seq("a", "b"); _ <- 1 to 50)
        yield (src, lg))
      q2.processAllAvailable()
      val r1 = s.sql("SELECT MAX(chi2_contrib) FROM soak_chi2 WHERE seq = 1")
        .head().getDouble(0)
      assert(r1 < 0.001, s"balanced corpus must score ~0 chi2, got $r1")
      // s2's next 200 docs are ALL lang a — the crawl-dump failure mode
      stream.addData((1 to 200).map(_ => ("s2", "a")))
      q2.processAllAvailable()
      val last = s.sql(
        """SELECT source, chi2_contrib FROM soak_chi2
          |WHERE seq = (SELECT MAX(seq) FROM soak_chi2)""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(last("s2") > 10.0,
        s"language flood must spike the source's contribution: $last")
      assert(stateRows(q2) <= 2, s"chi2 state not O(1): ${stateRows(q2)} rows")
    } finally q2.stop()
  }

  test("ks-drift twin: file-source last trigger equals batch; length flood drifts") {
    import graft.streaming.CorpusStreams
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val q = CorpusStreams.ksDrift(CorpusStreams.readDocuments(spark, dir))
      .writeStream.format("memory").queryName("file_ks").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = s.sql(
        """SELECT source, n_docs, ks_stat, crit_005, drifted FROM file_ks
          |WHERE seq = (SELECT MAX(seq) FROM file_ks)""".stripMargin)
        .collect().map(_.toString).sorted.toSeq
      val batch = graft.operators.LlmData.qStatKsDrift(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"streaming KS diverged from batch (${streamed.length} vs ${batch.length} rows)")
    } finally q.stop()

    // drift across triggers: identical length mixes score ~0; one
    // source flooding long documents crosses the critical value
    import s.implicits._
    val stream = MemoryStream[(String, Long)](s)
    val df = stream.toDF().toDF("source", "n_chars")
    val q2 = CorpusStreams.ksDrift(df).writeStream
      .format("memory").queryName("soak_ks").outputMode("append").start()
    try {
      stream.addData(for (src <- Seq("s1", "s2"); nc <- 100L to 109L; _ <- 1 to 10)
        yield (src, nc))
      q2.processAllAvailable()
      val r1 = s.sql("SELECT MAX(ks_stat), BOOL_OR(drifted) FROM soak_ks WHERE seq = 1").head()
      assert(r1.getDouble(0) < 0.05 && !r1.getBoolean(1),
        s"identical mixes must not drift: $r1")
      stream.addData((1 to 300).map(_ => ("s2", 5000L)))
      q2.processAllAvailable()
      val last = s.sql(
        """SELECT source, drifted FROM soak_ks
          |WHERE seq = (SELECT MAX(seq) FROM soak_ks)""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      assert(last("s2"), s"length flood must trip the KS alarm: $last")
      assert(stateRows(q2) <= 2, s"ks state not O(1) groups: ${stateRows(q2)}")
    } finally q2.stop()
  }

  test("dedup-screen twin: file-source distinct pairs equal the batch banded path") {
    import graft.streaming.CorpusStreams
    import graft.operators.LlmData
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val mx = graft.Tables.documents(s, dir).agg(max("doc_id")).head().getLong(0)
    val t = mx - mx / 10
    val nDocs = graft.Tables.documents(s, dir).count()
    // ground truth: the batch BANDED incremental path (exactGate = 0
    // forces it) — same shingles, same minhash, same band derivation,
    // so candidates and verify are the identical deterministic
    // function and parity is bit-for-bit, not probabilistic. The
    // banded path itself is pinned ≡ exact in ScaleOpsSpec.
    val sh = LlmData.shingled(s, dir)
      .select(col("doc_id"), col("shingles"), size(col("shingles")).as("sz"))
    val batch = LlmData.incrementalPairs(sh, t, 0.3, s, nDocs, exactGate = 0)
      .select("a_id", "b_id", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val q = CorpusStreams.dedupScreen(
        CorpusStreams.readDocuments(s, dir),
        CorpusStreams.corpusShingleArtifact(s, dir), t, 0.3)
      .writeStream.format("memory").queryName("screen_file")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = s.sql("SELECT DISTINCT a_id, b_id, jac FROM screen_file")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(batch.nonEmpty, "fixture must contain new-involving banded pairs")
      assert(streamed == batch,
        s"screen diverged from batch banded path: missing=${batch.diff(streamed)} " +
          s"extra=${streamed.diff(batch)}")
    } finally q.stop()
  }

  test("dedup-screen soak: cross-trigger pair surfaces, old-only pairs suppressed, state is the band table") {
    import graft.streaming.CorpusStreams
    val s = spark
    import s.implicits._
    // synthetic corpus: ids ≤ 99 are the existing corpus, ids ≥ 100
    // the arriving shard; texts are word sequences so identical texts
    // share every bigram (jac 1.0) and distinct texts share none
    def text(j: Int): String = (0 until 8).map(w => s"w${j}_$w").mkString(" ")
    val oldDocs = (0L to 9L).map(i => (i, text(i.toInt))) ++
      Seq((20L, text(90)), (21L, text(90))) // planted OLD×OLD dup — must be suppressed
    val newDocs = Seq(
      (100L, text(0)),  // cross-trigger dup of old doc 0
      (101L, text(91)), (102L, text(91)), // NEW×NEW dup inside the shard
      (103L, text(92))) // unique — no pairs
    val allDocs = oldDocs ++ newDocs
    val statics = allDocs.toDF("doc_id", "text")
      .withColumn("norm_text", lower(trim(col("text"))))
      .select(col("doc_id"),
        graft.functions.VectorExprs.wordBigramShingles(col("norm_text")).as("shingles"))
      .withColumn("sz", size(col("shingles")))
    val stream = MemoryStream[(Long, String)](s)
    val docs = stream.toDF().toDF("doc_id", "text")
    val q = CorpusStreams.dedupScreen(docs, statics, t = 99L, tau = 0.3)
      .writeStream.format("memory").queryName("screen_soak")
      .outputMode("append").start()
    try {
      stream.addData(oldDocs)
      q.processAllAvailable()
      val afterOld = s.sql("SELECT DISTINCT a_id, b_id FROM screen_soak").count()
      assert(afterOld == 0,
        s"old×old pairs must never emit from the screen, got $afterOld")
      stream.addData(newDocs)
      q.processAllAvailable()
      val pairs = s.sql("SELECT DISTINCT a_id, b_id FROM screen_soak")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((0L, 100L), (101L, 102L)),
        s"expected the cross-trigger and in-shard pairs only, got $pairs")
      // state is the maintained band table: O(docs × bands) member ids
      // spread over (band, band_key) buckets — 13 banded docs × 34
      // bands = 442 memberships is the hard ceiling
      assert(stateRows(q) <= 13L * 34,
        s"band-table state exceeded the membership bound: ${stateRows(q)}")
    } finally q.stop()
  }

  test("embed-screen twin: file-source distinct pairs equal the batch LSH path's new-involving set") {
    import graft.streaming.CorpusStreams
    import graft.operators.LlmData
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val mx = s.read.parquet(s"$dir/embeddings.parquet")
      .agg(max("vec_id")).head().getLong(0)
    val t = mx - mx / 10
    // ground truth: the batch banded graph (fixture band parameters —
    // the DedupEmbedSpec contract, pinned pair-for-pair ≡ exact)
    // filtered to new-involving pairs; same signatures ⇒ parity is
    // bit-for-bit, not probabilistic
    val batch = LlmData.embNearDupLsh(LlmData.embWithNorms(s, dir),
        0.4, bits = 4, tables = 64, seed = LlmData.EmbLshSeed)
      .filter(col("b_id") > t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val q = CorpusStreams.embedScreen(
        CorpusStreams.readEmbeddings(s, dir),
        CorpusStreams.corpusEmbeddingArtifact(s, dir), t,
        tau = 0.4, bits = 4, tables = 64, seed = LlmData.EmbLshSeed)
      .writeStream.format("memory").queryName("embscreen_file")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = s.sql("SELECT DISTINCT a_id, b_id, cosine FROM embscreen_file")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(batch.nonEmpty, "fixture must contain new-involving cosine pairs")
      assert(streamed == batch,
        s"embed screen diverged: missing=${batch.diff(streamed)} " +
          s"extra=${streamed.diff(batch)}")
    } finally q.stop()
  }

  test("file-source anomaly twin matches batch rows on watermark-closed days") {
    // full-tuple parity (counts, sums, mean/std/z AND flags) with the
    // oracle-checked q_ev_anomaly, restricted to days the bounded
    // replay's final watermark (max event time − 1 h) has provably
    // closed — the last fixture day never closes, exactly the
    // ctxJoinOuter bounded-replay caveat
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val q = EventStreams.anomaly(EventStreams.readEvents(spark, dir)).writeStream
      .format("memory").queryName("file_anomaly").outputMode("append").start()
    try {
      q.processAllAvailable()
      val maxMs = graft.Tables.events(spark, dir)
        .agg(org.apache.spark.sql.functions.max("ts"))
        .head().getTimestamp(0).getTime
      val wmMs = maxMs - 3600 * 1000L
      val batch = graft.operators.EventOps.qEvAnomaly(spark, dir)
        .collect()
        .filter(r => r.getTimestamp(1).getTime + 86400000L <= wmMs)
        .map(_.toString).sorted.toSeq
      val streamed = s.table("file_anomaly")
        .select(col("event_type"), col("day"), col("n_events"), col("v"),
          col("mean7"), col("std7"), col("z"), col("is_anomaly"))
        .collect().map(_.toString).sorted.toSeq
      assert(batch.nonEmpty, "fixture yields no watermark-closed anomaly rows")
      assert(streamed == batch,
        s"streaming anomaly diverged from batch (${streamed.length} vs ${batch.length} rows); " +
          s"first diff: ${streamed.zip(batch).find(p => p._1 != p._2)}")
    } finally q.stop()
  }
}
