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

  test("the alerted set is independent of shard fan-in (state keying is an " +
    "operational knob, not a semantic one)") {
    val a = StreamHeavyHitters.streamedHeavyHitters(spark, sf, threshold, shards = 4)
      .collect().map(_.getLong(0)).toSet
    val b = batchHitters().keySet
    assert(a === b)
  }
}
