package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, Trigger, ValueState}
import org.apache.spark.sql.Encoders

/** Timer-based sessionization on `transformWithState` — the event-time
  * TIMER primitive ([[StatefulProcessorHandle.registerTimer]]), completing
  * the custom-state API surface next to `ValueState`
  * ([[KeyedLastWriteTws]]) and `MapState` ([[StreamHeavyHitters]]). The
  * built-in `session_window` aggregation ([[EventTime.sessionCounts]])
  * covers windowed COUNTS; the processor form is what you write when a
  * session CLOSE must trigger arbitrary logic (emit a summary row, fire a
  * webhook, seal a feature vector) the windowed aggregate can't express.
  *
  * Close detection is two-path, and has to be: a key's next batch of rows
  * is processed BEFORE that batch's expired timers, so
  *  - row-driven: when a key's new batch opens with a gap beyond the
  *    session gap, the processor closes the old session inline and starts
  *    the new one;
  *  - timer-driven: a key that goes QUIET has no future rows to trigger
  *    the close, so every batch re-arms one event-time timer at
  *    `last + gap`; the watermark passing it fires
  *    [[SessionProcessor.handleExpiredTimer]]. A timer made stale by
  *    newer rows (expiry < current last + gap) is ignored.
  *
  * Exactness: each emitted session is a maximal gap-bounded run of a
  * key's events — identical to the batch gap-grouping — and the two close
  * paths partition the closed set (rows close sessions whose key has
  * later events; timers close the tail sessions the final watermark
  * passes). Only a key's last session can stay open (unemitted) at drain,
  * exactly like the built-in session window with watermark semantics.
  */
object StreamSessions {

  final case class SessionOut(user_id: Long, start_sec: Long, end_sec: Long,
                              n_events: Long)

  final class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp), SessionOut] {
    // (startMs, lastMs, count) of the key's OPEN session
    @transient private var sess: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState("sess",
        ExpressionEncoder[(Long, Long, Long)](),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    private def rearm(lastMs: Long): Unit = {
      val h = getHandle
      h.listTimers().foreach(t => h.deleteTimer(t.asInstanceOf[Long]))
      h.registerTimer(lastMs + gapMs)
    }

    override def handleInputRows(key: Long, rows: Iterator[(Long, java.sql.Timestamp)],
                                 timerValues: TimerValues): Iterator[SessionOut] = {
      // batch rows may arrive unordered: sessionize the sorted batch, then
      // merge the first batch-session with the stored open session
      val ts = rows.map(_._2.getTime).toArray.sorted
      if (ts.isEmpty) return Iterator.empty
      var out = List.empty[SessionOut]
      var cur = Option(if (sess.exists()) sess.get() else null)
      // A late row more than a gap BEFORE the open session's start belongs
      // to its own earlier session under batch gap-grouping — the r6 ADVICE
      // hazard was merging it via the vacuously-true `t - last <= gap` for
      // t < last. Such rows gap-group among themselves and emit closed.
      // (With the operating contract lateness < gap, they can never also
      // reach within a gap of the open start, so no backward bridge is
      // missed.)
      var early = Option.empty[(Long, Long, Long)]
      ts.foreach { t =>
        cur match {
          case Some(s) if t < s._1 - gapMs =>
            early match {
              case Some(e) if t - e._2 <= gapMs =>
                early = Some((e._1, t, e._3 + 1))
              case Some(e) =>
                out ::= SessionOut(key, e._1 / 1000, e._2 / 1000, e._3)
                early = Some((t, t, 1L))
              case None =>
                early = Some((t, t, 1L))
            }
          case Some(s) if t - s._2 <= gapMs =>
            cur = Some((math.min(s._1, t), math.max(s._2, t), s._3 + 1))
          case Some(s) =>
            out ::= SessionOut(key, s._1 / 1000, s._2 / 1000, s._3)
            cur = Some((t, t, 1L))
          case None =>
            cur = Some((t, t, 1L))
        }
      }
      early.foreach(e => out ::= SessionOut(key, e._1 / 1000, e._2 / 1000, e._3))
      val open = cur.get
      sess.update(open)
      rearm(open._2)
      out.reverseIterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[SessionOut] =
      if (!sess.exists()) Iterator.empty
      else {
        val s = sess.get()
        // stale timer: newer rows extended the session past this expiry
        if (expired.getExpiryTimeInMs < s._2 + gapMs) Iterator.empty
        else {
          sess.clear()
          Iterator.single(SessionOut(key, s._1 / 1000, s._2 / 1000, s._3))
        }
      }
  }

  /** Drive the events fixture through a checkpointed AvailableNow run as
    * two event-time halves PLUS a sentinel batch carrying one far-future
    * event per user (`max ts + 3·gap`): the sentinel closes every user's
    * final real session ROW-driven, so the emitted set is exactly the
    * complete batch gap-grouping of the real events — fully
    * deterministic, no watermark-boundary cases — and the run is graded
    * by the DuckDB gap-grouping oracle. (The sentinel's own 1-event
    * session stays open and is never emitted.) The mid-stream closes
    * still exercise both real paths: the halves span many gaps, so
    * timers fire for quiet users between batches. */
  def streamedSessions(spark: SparkSession, dir: String,
                       gapSec: Long = 86400L): DataFrame = {
    val root = graft.ops.TwoBatchScratch.freshRoot(spark, "graft_stream_sess")
    // one materialized scan feeds the split bounds, both halves and the
    // sentinel (5 consumers otherwise re-read the parquet each)
    val ev = graft.ops.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"))
      .localCheckpoint(true)
    val b = ev.select(unix_micros(col("ts")).as("u"))
      .agg(expr("percentile(u, 0.5)"), max(col("u"))).head()
    val (t1, tmax) = (b.getDouble(0).toLong, b.getLong(1))
    val sentinel = ev.select(col("user_id")).distinct()
      .withColumn("ts",
        timestamp_micros(lit(tmax + 3 * gapSec * 1000000L)))
    // two event-time halves + the sentinel: the halves span many gaps, so
    // quiet users' timer closes still fire BETWEEN batches (both close
    // paths exercised), while the drain pays 3 micro-batch lifecycles
    // instead of 4 — the per-batch state-store cycle is the fixed cost
    // that dominates a gate-scale run. The crash/resume and multi-batch
    // edge cases live in StreamSessionsSpec with purpose-built feeds.
    DedupStream.stageBatches(s"$root/feed", Seq(
      ev.filter(unix_micros(col("ts")) <= t1),
      ev.filter(unix_micros(col("ts")) > t1),
      sentinel))
    val q = start(spark, s"$root/feed", s"$root/out", s"$root/ckpt",
      java.time.Duration.ofSeconds(gapSec))
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(s"$root/out")
      .orderBy(col("user_id"), col("start_sec"))
  }

  /** Start (or resume) the sessionizer over a staged parquet feed of
    * `(user_id BIGINT, ts TIMESTAMP)` rows. */
  def start(spark: SparkSession, feedDir: String, out: String, ckpt: String,
            gap: java.time.Duration, lateness: String = "1 hour",
            maxFilesPerTrigger: Int = 1): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    StreamTune.withStateConf(spark) {
      spark.readStream
        .schema("user_id BIGINT, ts TIMESTAMP")
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(feedDir)
        .withWatermark("ts", lateness)
        // keep the watermark-tagged ts column through to the operator
        .select(col("user_id"), col("ts"))
        .as[(Long, java.sql.Timestamp)]
        .groupByKey(_._1)
        .transformWithState(new SessionProcessor(gap.toMillis),
          TimeMode.EventTime(), OutputMode.Append())
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
    }
  }
}
