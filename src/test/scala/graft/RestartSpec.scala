package graft

import graft.streaming.{CorpusStreams, EventStreams}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import java.sql.Timestamp

/** Exactly-once across a kill/restart boundary — the checkpoint
  * contract StreamingSpec's single-query twins and soaks never
  * exercise: for each stateful family (near-dup screen, funnel,
  * anomaly monitor) a query runs over batch 1, STOPS, and a NEW query
  * instance resumes from the SAME checkpoint over batch 2. The pinned
  * properties:
  *
  *  - NO LOSS: the sink after both runs equals an uninterrupted
  *    single run over all the data (restart transparency — carried
  *    state completes work begun before the stop: a funnel user whose
  *    purchase arrives after the restart, a near-dup pair whose
  *    second member lands in the second shard, an anomaly day closed
  *    by the post-restart watermark);
  *  - NO DUP: nothing emitted before the stop re-emits after recovery
  *    (offsets and state both come back from the checkpoint).
  *
  * Sources are file streams (replayable — the checkpoint's offset log
  * is meaningful across instances, unlike MemoryStream); batch 2
  * lands as NEW files in the watched glob after the first query
  * stops. The sink is the PARQUET file sink — the fault-tolerant sink
  * recovery requires (the memory sink refuses checkpoint recovery
  * outright), and its _spark_metadata commit log makes the
  * exactly-once claim END-TO-END: the batch read of the sink
  * directory sees only committed files.
  */
class RestartSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${1 + minute / 1440}%02d " +
      f"${minute % 1440 / 60}%02d:${minute % 60}%02d:00")

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Start `build` on (ckpt, out), drain, stop; return the committed
    * sink contents (string rows, sorted). */
  private def runToSink(build: => DataFrame, ckpt: String,
      out: String): Seq[String] = {
    val q: StreamingQuery = build.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(out).collect().map(_.toString).sorted.toSeq
  }

  /** Multiset difference b − a (a must be a prefix-multiset of b). */
  private def diff(b: Seq[String], a: Seq[String]): Seq[String] = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    a.foreach(r => counts(r) = counts.getOrElse(r, 0) + 1)
    b.filter { r =>
      val c = counts.getOrElse(r, 0)
      if (c > 0) { counts(r) = c - 1; false } else true
    }
  }

  test("funnel restart: state carried across checkpoint, no dup/loss") {
    val s = spark
    import s.implicits._
    val src = tmpDir("graft-funnel-src-")
    val events1 = Seq(
      // user 1: signup + click before the stop, purchase after
      (1L, ts(0), 1L, "signup", 1.0), (2L, ts(5), 1L, "click", 1.0),
      // user 2: signup only before the stop
      (3L, ts(1), 2L, "signup", 1.0),
      // user 3: completes entirely before the stop — must emit in
      // run 1 and NEVER re-emit after recovery
      (4L, ts(0), 3L, "signup", 1.0), (5L, ts(2), 3L, "click", 1.0),
      (6L, ts(4), 3L, "purchase", 1.0))
    val events2 = Seq(
      (7L, ts(20), 1L, "purchase", 1.0),
      (8L, ts(21), 2L, "click", 1.0), (9L, ts(25), 2L, "purchase", 1.0))
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    events1.toDF(cols: _*).write.parquet(s"$src/batch1.parquet")
    val sch = s.read.parquet(s"$src/batch1.parquet").schema
    def stream() = EventStreams.funnel(
      s.readStream.schema(sch).parquet(s"$src/batch*.parquet")).toDF()

    val ckpt = tmpDir("graft-funnel-ckpt-"); val out = tmpDir("graft-funnel-out-")
    val run1 = runToSink(stream(), ckpt, out)
    events2.toDF(cols: _*).write.parquet(s"$src/batch2.parquet")
    val all = runToSink(stream(), ckpt, out)
    val run2 = diff(all, run1)
    val single = runToSink(stream(), tmpDir("graft-funnel-ckpt2-"),
      tmpDir("graft-funnel-out2-"))

    assert(all == single,
      s"restarted sink diverged from the uninterrupted run:\n" +
        s"all=$all\nsingle=$single")
    def users(rows: Seq[String]): Set[Long] =
      rows.map(r => r.drop(1).takeWhile(_ != ',').toLong).toSet
    assert(users(run1) == Set(3L),
      s"expected only user 3 before the stop, got ${users(run1)}")
    // users 1 and 2 can only complete if signup/click state survived
    // the restart; user 3 re-appearing would be a dup
    assert(users(run2) == Set(1L, 2L),
      s"expected users 1 and 2 to complete after restart, got ${users(run2)}")
    assert(all.length == 3, s"one completion per user, got $all")
  }

  test("dedup-screen restart: band-table state carried, cross-restart pairs surface once") {
    val s = spark
    import s.implicits._
    def text(j: Int): String = (0 until 8).map(w => s"w${j}_$w").mkString(" ")
    // batch 1: unique old docs, one planted OLD×OLD dup (suppressed at
    // t = 99 forever), one new doc pairing with an old one pre-stop
    val batch1 = (0L to 9L).map(i => (i, text(i.toInt))) ++
      Seq((20L, text(90)), (21L, text(90)), (100L, text(0)))
    // batch 2 (post-restart): an in-shard dup, and doc 103 whose
    // partners (0 and 100) BOTH live in pre-restart band state
    val batch2 = Seq((101L, text(91)), (102L, text(91)), (103L, text(0)))
    val statics = (batch1 ++ batch2).toDF("doc_id", "text")
      .withColumn("norm_text", lower(trim(col("text"))))
      .select(col("doc_id"),
        graft.functions.VectorExprs.wordBigramShingles(col("norm_text")).as("shingles"))
      .withColumn("sz", size(col("shingles")))
    val src = tmpDir("graft-screen-src-")
    batch1.toDF("doc_id", "text").write.parquet(s"$src/batch1.parquet")
    val sch = s.read.parquet(s"$src/batch1.parquet").schema
    def stream() = CorpusStreams.dedupScreen(
      s.readStream.schema(sch).parquet(s"$src/batch*.parquet"),
      statics, t = 99L, tau = 0.3)

    val ckpt = tmpDir("graft-screen-ckpt-"); val out = tmpDir("graft-screen-out-")
    val run1 = runToSink(stream(), ckpt, out)
    batch2.toDF("doc_id", "text").write.parquet(s"$src/batch2.parquet")
    val all = runToSink(stream(), ckpt, out)
    val run2 = diff(all, run1)
    val single = runToSink(stream(), tmpDir("graft-screen-ckpt2-"),
      tmpDir("graft-screen-out2-"))

    // the screen is at-least-once per shared bucket WITHIN a run (the
    // sink upserts on the pair — its documented contract), so parity
    // and the dup check compare DISTINCT pair sets
    def pairs(rows: Seq[String]): Set[(Long, Long)] =
      rows.map { r =>
        val f = r.drop(1).dropRight(1).split(",")
        (f(0).toLong, f(1).toLong)
      }.toSet
    val p1 = pairs(run1); val p2 = pairs(run2)
    assert(p1 == Set((0L, 100L)), s"pre-stop pairs: $p1")
    assert(p2 == Set((101L, 102L), (0L, 103L), (100L, 103L)),
      s"post-restart pairs (two need pre-restart band state): $p2")
    assert(p1.intersect(p2).isEmpty, "pair re-emitted across restart")
    assert(p1 ++ p2 == pairs(single),
      "restarted union diverged from the uninterrupted screen")
  }

  test("anomaly restart: watermark + trailing-window state recovered, days emit once") {
    val s = spark
    import s.implicits._
    // one event type, two events per day across 12 days (days 0..11);
    // day d closes when the watermark (max ts − 1 h) passes its end,
    // and the first 6 closed days emit nothing (the batch rn ≥ 7 rule)
    def dayEvents(d: Int): Seq[(Long, Timestamp, Long, String, Double)] = {
      val base = d * 1440
      Seq(
        (d * 2L, ts(base + 600), 1L, "click", 1.0 + d),
        (d * 2L + 1, ts(base + 720), 2L, "click", 2.0 + d))
    }
    val batch1 = (0 until 10).flatMap(dayEvents) // days 0..9
    val batch2 = (10 until 12).flatMap(dayEvents) // days 10..11
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val src = tmpDir("graft-anom-src-")
    batch1.toDF(cols: _*).write.parquet(s"$src/batch1.parquet")
    val sch = s.read.parquet(s"$src/batch1.parquet").schema
    def stream() = EventStreams.anomaly(
      s.readStream.schema(sch).parquet(s"$src/batch*.parquet")).toDF()

    val ckpt = tmpDir("graft-anom-ckpt-"); val out = tmpDir("graft-anom-out-")
    val run1 = runToSink(stream(), ckpt, out)
    batch2.toDF(cols: _*).write.parquet(s"$src/batch2.parquet")
    val all = runToSink(stream(), ckpt, out)
    val run2 = diff(all, run1)
    val single = runToSink(stream(), tmpDir("graft-anom-ckpt2-"),
      tmpDir("graft-anom-out2-"))

    assert(run1.nonEmpty && run2.nonEmpty,
      s"both runs must close days (run1=${run1.length}, run2=${run2.length})")
    assert(run1.toSet.intersect(run2.toSet).isEmpty,
      s"day re-emitted across restart: ${run1.toSet.intersect(run2.toSet)}")
    assert(all == single,
      s"restarted sink diverged from the uninterrupted run:\n" +
        s"all=$all\nsingle=$single")
    // the sharpest state-recovery claim: day 9 was OPEN (not closed by
    // the watermark) at the stop; it must close after restart from the
    // recovered open-day partials, z-scored against the recovered
    // trailing window of run-1 closed days
    assert(run2.exists(_.contains("2024-01-10")),
      s"day 9 (open at the stop) must close after restart: $run2")
    assert(run1.forall(!_.contains("2024-01-10")),
      s"day 9 must not have closed before the stop: $run1")
  }

  test("ctxJoinOuter restart: two-sided join state carried, outer null row emits exactly once") {
    // the one stateful family the other restarts don't cover: a
    // watermarked stream-stream interval join holds BOTH sides in
    // state. Pinned across the kill/resume boundary: (a) a pre-stop
    // click matches a post-restart purchase (left-side state
    // carried); (b) a clickless purchase held at the stop emits its
    // organic null row EXACTLY ONCE, after the recovered watermark
    // finally proves no click can arrive; (c) nothing re-emits.
    val s = spark
    import s.implicits._
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val batch1 = Seq(
      // user 1: click + purchase both pre-stop → matched row in run 1
      (1L, ts(10), 1L, "click", 1.0), (2L, ts(30), 1L, "purchase", 1.0),
      // user 2: clickless purchase — held in state at the stop (the
      // watermark cannot yet prove no click will arrive)
      (3L, ts(40), 2L, "purchase", 1.0),
      // user 4: click only — its purchase lands after the restart
      (4L, ts(20), 4L, "click", 1.0))
    val batch2 = Seq(
      (5L, ts(50), 4L, "purchase", 1.0),
      // watermark advance on BOTH sides (global watermark is the min
      // across the two delays); same-ts click/purchase never join
      // (click_ts < purchase_ts is strict) and their own organic rows
      // stay held past every batch here — no noise in either run
      (6L, ts(600), 99L, "click", 1.0), (7L, ts(600), 99L, "purchase", 1.0),
      (8L, ts(610), 98L, "click", 1.0), (9L, ts(610), 98L, "purchase", 1.0))
    // the flush batch: state eligible under the batch-2 watermark
    // emits in the NEXT microbatch, so one more file provides it
    val batch3 = Seq(
      (10L, ts(620), 97L, "click", 1.0), (11L, ts(620), 97L, "purchase", 1.0))

    def run(src: String, ckpt: String, out: String,
        phases: Seq[() => Unit]): Seq[String] = {
      val sch = s.read.parquet(s"$src/batch1.parquet").schema
      val q = EventStreams.ctxJoinOuter(
          s.readStream.schema(sch).parquet(s"$src/batch*.parquet"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try phases.foreach { ph => ph(); q.processAllAvailable() } finally q.stop()
      s.read.parquet(out).collect().map(_.toString).sorted.toSeq
    }

    val src = tmpDir("graft-ctx-src-")
    batch1.toDF(cols: _*).write.parquet(s"$src/batch1.parquet")
    val ckpt = tmpDir("graft-ctx-ckpt-"); val out = tmpDir("graft-ctx-out-")
    val run1 = run(src, ckpt, out, Seq(() => ()))
    batch2.toDF(cols: _*).write.parquet(s"$src/batch2.parquet")
    val all = run(src, ckpt, out, Seq(() => (),
      () => batch3.toDF(cols: _*).write.parquet(s"$src/batch3.parquet")))
    val run2 = diff(all, run1)

    // uninterrupted twin, phased the same way past the flush batch
    val src2 = tmpDir("graft-ctx-src2-")
    (batch1 ++ batch2).toDF(cols: _*).write.parquet(s"$src2/batch1.parquet")
    val single = run(src2, tmpDir("graft-ctx-ckpt2-"), tmpDir("graft-ctx-out2-"),
      Seq(() => (),
        () => batch3.toDF(cols: _*).write.parquet(s"$src2/batch2.parquet")))

    def uid(r: String): Long = r.drop(1).takeWhile(_ != ',').toLong
    assert(run1.map(uid) == Seq(1L),
      s"run 1 must hold everything but the pre-stop match: $run1")
    assert(run2.map(uid).sorted == Seq(2L, 4L),
      s"after restart: user 4's cross-restart match + user 2's organic row, got $run2")
    val organic = all.filter(_.endsWith(",null]"))
    assert(organic.length == 1 && uid(organic.head) == 2L,
      s"exactly one organic null row, for user 2: $all")
    assert(run1.toSet.intersect(run2.toSet).isEmpty,
      "a joined row re-emitted across the restart")
    assert(all == single,
      s"restarted sink diverged from the uninterrupted run:\nall=$all\nsingle=$single")
  }
}
