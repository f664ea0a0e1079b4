package graft

import graft.streaming.StreamHeavyHitters
import org.apache.spark.sql.functions._

/** Streaming heavy-hitter alerts: MapState counts across micro-batches,
  * exactly-once crossing alerts, and batch-split independence of the
  * alerted set. The end-to-end run is also DuckDB-oracle-graded as
  * `q_stream_hh`; these specs pin what the oracle can't see — the alert
  * log's exactly-once contract and the crossing-count bounds. */
class StreamHeavyHittersSpec extends SparkSpec {

  private val threshold = 75L

  private def batchHitters(): Map[Long, Long] =
    ops.Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("streamed alerts equal the batch GROUP BY/HAVING answer and each " +
    "key alerts exactly once with a crossing count inside its bounds") {
    val got = StreamHeavyHitters.streamedHeavyHitters(spark, sf, threshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = batchHitters()
    assert(want.nonEmpty, "fixture must produce heavy hitters at this threshold")
    assert(got === want)
    // raw alert log: exactly one alert per key, emitted at a cumulative
    // count that is >= threshold and <= the key's final total
    val raw = spark.read
      .parquet(StreamHeavyHitters.scratchRoot(spark) + "/alerts").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(raw.map(_._1).distinct.length === raw.length,
      "a key must never alert twice across batches")
    raw.foreach { case (k, at) =>
      assert(at >= threshold, s"key $k alerted below threshold: $at")
      assert(at <= want(k), s"key $k crossing count $at exceeds final total ${want(k)}")
    }
  }

  test("crash at the last commit: the resumed run replays the lost batch " +
    "idempotently — the alert log stays alert-per-key-unique and equals " +
    "the batch answer") {
    import org.apache.spark.sql.functions.{col, unix_micros, min => minF, max => maxF}
    val root = tmpDir("hh-crash")
    val ev = ops.Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("tsu"), col("user_id"))
    val mm = ev.agg(minF(col("tsu")), maxF(col("tsu"))).head()
    val mid = (mm.getLong(0) + mm.getLong(1)) / 2
    graft.streaming.DedupStream.stageBatches(s"$root/feed",
      Seq(ev.filter(col("tsu") <= mid).select(col("user_id")),
        ev.filter(col("tsu") > mid).select(col("user_id"))))
    val q1 = StreamHeavyHitters.start(spark, s"$root/feed", s"$root/alerts",
      s"$root/ckpt", threshold)
    try q1.processAllAvailable() finally q1.stop()
    CkptCrash.awaitCommits(s"$root/ckpt", 2)
    CkptCrash.simulateCrashAtLastCommit(spark, s"$root/ckpt")
    val q2 = StreamHeavyHitters.start(spark, s"$root/feed", s"$root/alerts",
      s"$root/ckpt", threshold)
    try q2.processAllAvailable() finally q2.stop()
    // explicit schema (review r11): the implementation reads this sink the
    // same way for exactly this reason — a no-alert run leaves only
    // _spark_metadata and schema inference would throw opaquely
    val raw = spark.read.schema("key BIGINT, at_count BIGINT")
      .parquet(s"$root/alerts").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(raw.map(_._1).distinct.length === raw.length,
      "a replayed batch must not duplicate its alerts")
    assert(raw.map(_._1).toSet === batchHitters().keySet,
      "the resumed run converges to the batch GROUP BY/HAVING answer")
  }

  test("the alerted set is independent of shard fan-in (state keying is an " +
    "operational knob, not a semantic one)") {
    val a = StreamHeavyHitters.streamedHeavyHitters(spark, sf, threshold, shards = 4)
      .collect().map(_.getLong(0)).toSet
    val b = batchHitters().keySet
    assert(a === b)
  }

  test("a threshold nobody crosses returns the empty alert set instead of " +
    "crashing on schema inference over a file-less sink dir (r9 review)") {
    val got = StreamHeavyHitters.streamedHeavyHitters(spark, sf,
      threshold = Long.MaxValue)
    assert(got.count() === 0L)
    assert(got.columns.toSeq === Seq("user_id", "n_events"),
      "empty but fully typed")
  }
}
