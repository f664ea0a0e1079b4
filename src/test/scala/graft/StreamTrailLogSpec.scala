package graft

import graft.streaming.StreamTrailLog
import org.apache.spark.sql.functions._

/** ListState trailing-log materialization: the drained output equals the
  * batch latest-first window answer independent of batching, each key
  * flushes exactly once, and ranks are contiguous latest-first. */
class StreamTrailLogSpec extends SparkSpec {

  test("drained trailing-k equals the batch row_number DESC answer, one " +
    "flush per key, ranks contiguous and ts non-increasing") {
    val k = 5
    val got = StreamTrailLog.streamedTrailLog(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val want = ops.Tables.events(spark, sf)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rank") <= k)
      .select(col("user_id"), col("rank"), col("event_id"),
        (unix_millis(col("ts")) / 1000).cast("long").as("ts_sec"),
        round(col("value"), 2))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.sorted.toSeq === want.sorted.toSeq)
    got.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1 to rs.length),
        s"user $u ranks must be contiguous from 1")
      val ts = rs.sortBy(_._2).map(_._4)
      assert(ts.zip(ts.tail).forall { case (a, b) => a >= b },
        s"user $u trailing log must be latest-first")
    }
  }
}
