package graft

import graft.streaming.{DedupStream, StreamSessions}
import org.apache.spark.sql.functions._

/** Timer-based sessionization: event-time timers close quiet sessions,
  * row-driven splits close superseded ones, and every emitted session is
  * exactly a maximal gap-bounded run of its key's events. */
class StreamSessionsSpec extends SparkSpec {

  private val gapSec = 86400L   // 24 h — the fixture's p90 inter-event gap
  private val latenessSec = 3600L

  /** Batch ground truth: each user's events gap-grouped after a global
    * sort — (user, start_sec, end_sec, n). Gap decisions run in epoch
    * MILLISECONDS to match the processor exactly (the r6 ADVICE finding:
    * a second-truncated gap test can split an inter-event gap within ~1 s
    * of exactly 24 h differently from the ms-precision stream); only the
    * reported bounds truncate to seconds, as the stream's output does. */
  private def batchSessions(): Seq[(Long, Long, Long, Long)] = {
    val gapMs = gapSec * 1000L
    val ev = ops.Tables.events(spark, sf)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val ts = rows.map(_._2).sorted
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
      var start = ts.head; var last = ts.head; var n = 1L
      ts.tail.foreach { t =>
        if (t - last <= gapMs) { last = t; n += 1 }
        else { out += ((u, start / 1000, last / 1000, n)); start = t; last = t; n = 1L }
      }
      out += ((u, start / 1000, last / 1000, n))
      out.toSeq
    }
  }

  test("every emitted session is a maximal gap-run; sessions closed well " +
    "before the final watermark are all present; at most one open tail " +
    "per key is missing") {
    val root = tmpDir("sessions")
    val ev = ops.Tables.events(spark, sf).select(col("user_id"), col("ts"))
    // three event-time-ordered crawl batches (terciles)
    val b = ev.select(unix_micros(col("ts")).as("u")).agg(
      expr("percentile(u, 0.3333)"), expr("percentile(u, 0.6667)")).head()
    val (t1, t2) = (b.getDouble(0).toLong, b.getDouble(1).toLong)
    DedupStream.stageBatches(s"$root/feed", Seq(
      ev.filter(unix_micros(col("ts")) <= t1),
      ev.filter(unix_micros(col("ts")) > t1 && unix_micros(col("ts")) <= t2),
      ev.filter(unix_micros(col("ts")) > t2)))
    val q = StreamSessions.start(spark, s"$root/feed", s"$root/out",
      s"$root/ckpt", java.time.Duration.ofSeconds(gapSec))
    try q.processAllAvailable() finally q.stop()

    val got = spark.read.parquet(s"$root/out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = batchSessions()
    val wantSet = want.toSet
    assert(got.nonEmpty, "sessions must close during the drain")
    got.foreach(s => assert(wantSet.contains(s),
      s"emitted session $s is not a maximal batch gap-run"))
    assert(got.distinct.length === got.length, "no session emitted twice")

    // completeness: everything ending well before the final watermark
    // closed (margin dodges the exact watermark-boundary semantics)
    val maxSec = ops.Tables.events(spark, sf)
      .agg(max(unix_timestamp(col("ts")))).head().getLong(0)
    val margin = 2 * latenessSec
    val mustClose = want.filter(_._3 + gapSec < maxSec - latenessSec - margin)
    val gotSet = got.toSet
    mustClose.foreach(s => assert(gotSet.contains(s),
      s"session $s ended ${maxSec - s._3} s before the end and must have closed"))
    // only sessions the FINAL watermark never finalized may be missing
    // (end + gap >= wm) — the exact tail the built-in session window
    // leaves open; 2 s of slack absorbs the seconds-truncated bounds
    val wmSec = maxSec - latenessSec
    want.foreach { sess =>
      if (!gotSet.contains(sess))
        assert(sess._3 + gapSec + 2 >= wmSec,
          s"session $sess was finalizable (end+gap < final watermark " +
            s"$wmSec) but missing")
    }
  }

  test("a late BRIDGE row arriving a batch after the closing row merges " +
    "the run the batch oracle merges — watermark-gated finalization never " +
    "emits a splittable session early (review r11)") {
    import spark.implicits._
    val root = tmpDir("sessions-bridge")
    val gapSec = 60L
    def ev(u: Long, t: String) = (u, java.sql.Timestamp.valueOf(t))
    // user 1: 10:00:00 then (next batch) 10:02:00 — 120 s apart, beyond
    // the 60 s gap, so the pre-fix row-driven close emitted [10:00,10:00]
    // immediately; then (a batch later, above the 1 h-lateness watermark)
    // the BRIDGE at 10:01:00 — within the gap of BOTH. Batch gap-grouping
    // = ONE session [10:00:00, 10:02:00] of 3 events. A final far-future
    // sentinel (user 99) advances the watermark past end+gap so the
    // merged run finalizes.
    DedupStream.stageBatches(s"$root/feed", Seq(
      Seq(ev(1, "2024-01-01 10:00:00")).toDF("user_id", "ts"),
      Seq(ev(1, "2024-01-01 10:02:00")).toDF("user_id", "ts"),
      Seq(ev(1, "2024-01-01 10:01:00")).toDF("user_id", "ts"),
      Seq(ev(99, "2024-01-01 14:00:00")).toDF("user_id", "ts")))
    val q = StreamSessions.start(spark, s"$root/feed", s"$root/out",
      s"$root/ckpt", java.time.Duration.ofSeconds(gapSec))
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$root/out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    val startSec = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
    assert(got === Seq((1L, startSec, startSec + 120, 3L)),
      s"the bridged run must emit as ONE 3-event session, got $got")
  }

  test("watermark landing EXACTLY on end+gap: the fired timer re-arms past " +
    "the fired expiry (Spark auto-deletes the fired pair after the " +
    "handler), so the quiet key's session still emits on the next advance " +
    "(review r11 boundary)") {
    import spark.implicits._
    val root = tmpDir("sessions-boundary")
    val gapSec = 60L
    def ev(u: Long, t: String) = (u, java.sql.Timestamp.valueOf(t))
    // user 1 ends at 10:00:00 (close point 10:01:00). Batch 2's max
    // (11:01:00) sets the NEXT batch's watermark to exactly 10:01:00 with
    // the 1 h lateness — the timer fires inclusively there but the strict
    // emit rule holds the session; a same-expiry re-arm would then be
    // destroyed by the post-handler auto-delete and the session lost.
    // Batch 3 advances the watermark past the boundary and the re-armed
    // (+1 ms) timer must close it.
    DedupStream.stageBatches(s"$root/feed", Seq(
      Seq(ev(1, "2024-01-01 10:00:00")).toDF("user_id", "ts"),
      Seq(ev(99, "2024-01-01 11:01:00")).toDF("user_id", "ts"),
      Seq(ev(99, "2024-01-01 12:00:00")).toDF("user_id", "ts")))
    val q = StreamSessions.start(spark, s"$root/feed", s"$root/out",
      s"$root/ckpt", java.time.Duration.ofSeconds(gapSec))
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$root/out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
    assert(got.contains((1L, t0, t0, 1L)),
      s"user 1's boundary session must finalize once the watermark " +
        s"strictly passes end+gap, got $got")
  }
}
