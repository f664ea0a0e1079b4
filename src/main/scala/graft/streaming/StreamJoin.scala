package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Driver-checked stream-stream join: run [[EventTime.purchaseAttribution]]
  * as a REAL checkpointed Structured Streaming query over a staged two-batch
  * event feed and grade the emitted matches against the batch interval-join
  * oracle — the same promotion [[DedupStream.streamedPairs]] gave the
  * incremental dedup path (an operator is not "done" as a streaming op
  * until an actual checkpointed run is oracle-graded).
  *
  * Exactness argument (why streamed == batch here): the feed is split at
  * the median EVENT TIME, so batch 1 is wholly older than batch 2 and no
  * row is ever late behind the watermark; and a signup evicted from join
  * state after batch 1 (watermark past `s_ts + horizon`) can only match
  * purchases with `p_ts < watermark <= max ts of batch 1`, which by the
  * time-split were IN batch 1 and already joined. Hence the inner
  * time-bound join emits exactly the batch join's matches. Out-of-order
  * arrival WITHIN a batch is free (watermarks advance at batch
  * boundaries); cross-batch disorder is bounded by `lateness` exactly as
  * in production.
  */
object StreamJoin {

  /** Max sane event-time span for a streamed feed (see the guard in
    * [[stageEventFeed]]; shared by the session driver). */
  val SanityHorizonDays: Long = 365L * 50L

  val eventsSchema: StructType =
    StructType.fromDDL("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING")

  /** Stage purchase/signup events as two time-ordered crawl batches, drive
    * them through a checkpointed AvailableNow run of the watermarked
    * stream-stream join, and return the match log shaped for the oracle
    * (epoch seconds + attribution lag). */
  def streamedAttribution(spark: SparkSession, dir: String,
                          horizon: String = "1 hour",
                          lateness: String = "10 minutes"): DataFrame = {
    val root = graft.ops.TwoBatchScratch.freshRoot(spark, "graft_stream_join")
    val feed = s"$root/feed"
    stageEventFeed(spark, dir, feed)
    // a stream-stream join keeps FOUR state stores per shuffle partition;
    // at the session's 32 partitions that is 128 store lifecycles per
    // micro-batch of commit/snapshot IO — the dominant cost of a small
    // drive (measured 12 s -> ~3 s at 8). Partitions-ONLY tuning here:
    // RocksDB + changelog (the transformWithState band's win) was
    // measured SLOWER for this op (floors 4.7 s vs 3.9 s) — four RocksDB
    // instance lifecycles per partition cost more than the default
    // in-memory HDFS store holds for join state this small, so each band
    // keeps the provider its own measurements picked.
    val q = StreamTune.withStateConf(spark, rocksDb = false) {
      start(spark, feed, s"$root/out", s"$root/ckpt", horizon, lateness,
        maxFilesPerTrigger = Some(2))
    }
    try q.processAllAvailable() finally q.stop()
    matches(spark, s"$root/out")
      .select(col("p_id"), col("s_id"), col("p_user").as("user_id"),
        unix_timestamp(col("p_ts")).as("p_sec"),
        unix_timestamp(col("s_ts")).as("s_sec"),
        (unix_timestamp(col("p_ts")) - unix_timestamp(col("s_ts"))).as("lag_sec"))
      .orderBy(col("p_id"), col("s_id"))
  }

  /** Stage the purchase/signup events as two time-ordered crawl batches
    * split at the median event time (each batch 2 files, so a
    * maxFilesPerTrigger=2 run maps part i to micro-batch i) — batch 0
    * wholly precedes batch 1, the premise of the exactness argument. */
  def stageEventFeed(spark: SparkSession, dir: String, feedDir: String): Unit = {
    val ev = graft.ops.Tables.events(spark, dir)
      .filter(col("event_type").isin("purchase", "signup"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val mm = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    // loud, not an NPE from unboxing a null aggregate (review r11 — the
    // defect class the heavy-hitter driver's empty-feed guard fixed)
    require(!mm.isNullAt(0),
      s"events at $dir carry no purchase/signup rows — the attribution " +
        "driver needs both")
    // Watermark sanity horizon (r13 extremes_time fuzz): one corrupt
    // far-future (or epoch-zero) timestamp advances the stream's
    // event-time watermark past every later NORMAL event, which is then
    // dropped SILENTLY as late — the silent-loss class this engine always
    // refuses loudly. A real feed never spans half a century.
    val spanDays = (mm.getLong(1) - mm.getLong(0)) / 86400000000L
    require(spanDays <= StreamJoin.SanityHorizonDays,
      s"events at $dir span $spanDays days of event time (> " +
        s"${StreamJoin.SanityHorizonDays}-day watermark sanity horizon): " +
        "an extreme timestamp would advance the watermark past every " +
        "later normal event and drop it silently — repair the feed's " +
        "timestamps before streaming")
    val mid = (mm.getLong(0) + mm.getLong(1)) / 2
    DedupStream.stageBatches(feedDir,
      Seq(ev.filter(unix_micros(col("ts")) <= mid),
        ev.filter(unix_micros(col("ts")) > mid)), filesPerPart = 2)
  }

  /** Start the checkpointed watermarked stream-stream join over a staged
    * event feed; per-batch match emission is a batch-id-keyed directory
    * overwrite, so an at-least-once replay after a crash converges to the
    * uninterrupted run's log (the [[DedupStream.start]] contract). */
  def start(spark: SparkSession, feed: String, outPath: String,
            checkpoint: String, horizon: String = "1 hour",
            lateness: String = "10 minutes",
            maxFilesPerTrigger: Option[Int] = None,
            trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(eventsSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val src = reader.parquet(feed)
    val joined = EventTime.purchaseAttribution(
      src.filter(col("event_type") === "purchase"),
      src.filter(col("event_type") === "signup"), horizon, lateness)
    joined.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // replay-idempotent: same batch id -> same directory
        batch.write.mode(SaveMode.Overwrite).parquet(s"$outPath/batch-$id")
      }
      .start()
  }

  /** The emitted match log: union over per-batch directories, empty-but-
    * typed before the first batch lands (shared reader — r9 review). */
  def matches(spark: SparkSession, outPath: String): DataFrame =
    graft.ops.TwoBatchScratch.batchLog(spark, outPath,
      "p_id BIGINT, p_user BIGINT, p_ts TIMESTAMP, " +
        "s_id BIGINT, s_user BIGINT, s_ts TIMESTAMP")
}
