package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, Trigger}

/** Trailing-event-log materialization on `transformWithState` with
  * `ListState` — the fourth and last custom-state primitive (after
  * ValueState, MapState, and event-time timers), each now carried by an
  * oracle-graded checkpointed run. The op maintains each key's most recent k
  * events across micro-batches — the online feature-store pattern ("last
  * 5 purchases per user") where the serving row must be ready at lookup
  * time, not recomputed from the event log.
  *
  * State is BOUNDED at k entries per key by construction: each batch
  * merges its rows into the stored list and keeps only the (ts, id)-top-k
  * — `ListState.put` rewrites the whole small list, which is the right
  * primitive when the retained collection is tiny and ordered (vs
  * MapState's per-entry point writes for large keyed counters).
  *
  * Determinism at drain: a SENTINEL row per key in the final staged batch
  * triggers the flush — each key emits its trailing-k exactly once, so
  * the drained output is byte-equal to the batch window query
  * (`row_number() OVER (ORDER BY ts DESC, id DESC) <= k`) regardless of
  * how the feed was batched. */
object StreamTrailLog {

  final case class TrailOut(user_id: Long, rank: Int, event_id: Long,
                            ts_sec: Long, value: Double)

  /** (event_id, tsUs, value, sentinel) keyed by user. Timestamps travel as
    * unix MICROseconds: the events fixture carries µs precision, and the
    * batch oracle ranks on the full-precision ts — a millisecond
    * truncation here could order two same-ms events by id while the
    * oracle splits them on µs (the round-6 ADVICE finding). */
  final class TrailProcessor(k: Int)
      extends StatefulProcessor[Long, (Long, Long, Long, Double, Boolean), TrailOut] {
    @transient private var log: ListState[(Long, Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      log = getHandle.getListState("log",
        ExpressionEncoder[(Long, Long, Double)](),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    // latest-first: ts desc, then event id desc
    private def order(a: (Long, Long, Double), b: (Long, Long, Double)): Boolean =
      a._2 > b._2 || (a._2 == b._2 && a._1 > b._1)

    override def handleInputRows(key: Long,
                                 rows: Iterator[(Long, Long, Long, Double, Boolean)],
                                 timerValues: TimerValues): Iterator[TrailOut] = {
      val (sentinels, real) = rows.partition(_._5)
      val fresh = real.map(r => (r._2, r._3, r._4)).toSeq
      val merged = (log.get().toSeq ++ fresh).sortWith(order).take(k)
      if (sentinels.hasNext) {
        log.clear()
        merged.iterator.zipWithIndex.map { case ((id, ts, v), i) =>
          TrailOut(key, i + 1, id, ts / 1000000, v)
        }
      } else {
        if (merged.nonEmpty) log.put(merged.toArray)
        Iterator.empty
      }
    }
  }

  /** Drive the events fixture (event_id, ts, user_id, value) through a
    * checkpointed AvailableNow run as two event-time halves plus the
    * per-user sentinel batch (state merge across batches still exercised,
    * one fewer fixed micro-batch lifecycle), and return each user's
    * trailing-k log — graded by the batch `row_number ... DESC` oracle. */
  def streamedTrailLog(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val root = graft.ops.TwoBatchScratch.freshRoot(spark, "graft_stream_trail")
    // one materialized scan feeds the split bounds, both halves and the
    // sentinel (5 consumers otherwise re-read the parquet each)
    val ev = graft.ops.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"),
        lit(false).as("sentinel"))
      .localCheckpoint(true)
    DedupStream.stageHalvesWithSentinel(s"$root/feed", ev, "ts") { tmax =>
      ev.select(col("user_id")).distinct()
        .select(lit(-1L).as("event_id"),
          timestamp_micros(lit(tmax + 1000000L)).as("ts"),
          col("user_id"), lit(0.0).as("value"), lit(true).as("sentinel"))
    }
    val q = start(spark, s"$root/feed", s"$root/out", s"$root/ckpt", k)
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(s"$root/out")
      .select(col("user_id"), col("rank"), col("event_id"), col("ts_sec"),
        round(col("value"), 2).as("value"))
      .orderBy(col("user_id"), col("rank"))
  }

  /** Start (or resume) the trailing-log stream over a staged parquet feed
    * of `(event_id, ts, user_id, value, sentinel)` rows. */
  def start(spark: SparkSession, feedDir: String, out: String, ckpt: String,
            k: Int = 5,
            maxFilesPerTrigger: Int = 1): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    StreamTune.withStateConf(spark) {
      spark.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE, sentinel BOOLEAN")
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(feedDir)
        // every field is load-bearing for the trail state (key, id, time,
        // value); a row missing any has no defined trail contribution and
        // would kill the stream at the typed encoder (r12 fuzz)
        .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
          col("ts").isNotNull && col("value").isNotNull)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tus"), col("value"), col("sentinel"))
        .as[(Long, Long, Long, Double, Boolean)]
        .groupByKey(_._1)
        .transformWithState(new TrailProcessor(k),
          TimeMode.None(), OutputMode.Append())
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
    }
  }
}
