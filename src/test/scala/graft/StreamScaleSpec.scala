package graft

import graft.streaming.{DedupStream, StreamHeavyHitters, StreamLatency}
import org.apache.spark.sql.functions._

/** The transformWithState scale claim, pinned at x10 (SCALE.md "tws"
  * band): a micro-batch's cost is fixed lifecycle + touched-key work, so
  * feeding 10x the rows (and 10x the keys) must NOT cost ~10x per batch —
  * the steady-state median batch at x10 stays within a small factor of
  * the x1 median. Relative, not absolute: wall-clock budgets drift with
  * the host, ratios don't. */
class StreamScaleSpec extends SparkSpec {

  private def runHh(root: String, ev: org.apache.spark.sql.DataFrame): Seq[StreamLatency.BatchStat] = {
    // three event-time-quantile batches, the graded drivers' feed shape
    val qs = ev.stat.approxQuantile("tsu", Array(1.0 / 3, 2.0 / 3), 0.001)
    DedupStream.stageBatches(s"$root/feed", Seq(
      ev.filter(col("tsu") <= qs(0)),
      ev.filter(col("tsu") > qs(0) && col("tsu") <= qs(1)),
      ev.filter(col("tsu") > qs(1))).map(_.select(col("user_id"))))
    val q = StreamHeavyHitters.start(spark, s"$root/feed", s"$root/alerts",
      s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    StreamLatency.stats(q)
  }

  test("x10 feed volume and key cardinality leave the per-batch median " +
    "within 3x of x1 (cost tracks touched keys, not corpus)") {
    val base = ops.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"))
    val x10 = base.crossJoin(spark.range(10).select(col("id").as("__r")))
      .select((col("user_id") + col("__r") * 10000000L).as("user_id"),
        col("tsu"))
    val root = tmpDir("twsscale")
    val s1 = runHh(s"$root/x1", base)
    val s10 = runHh(s"$root/x10", x10)
    assert(s1.size === 3 && s10.size === 3,
      s"expected 3 batches each, got ${s1.size}/${s10.size}")
    assert(s10.map(_.inputRows).sum === 10L * s1.map(_.inputRows).sum)
    // batch 0 pays JIT/codegen on both sides; compare steady state
    val med1 = StreamLatency.median(s1.drop(1).map(_.seconds))
    val med10 = StreamLatency.median(s10.drop(1).map(_.seconds))
    // 0.5 s additive, not 2.0 (review r11): with sub-second medians the
    // old slack dominated the bound — an 8x super-linear blowup passed.
    // 3x multiplicative is the claim; the small additive absorbs timer
    // granularity only.
    assert(med10 <= 3.0 * med1 + 0.5,
      f"x10 steady median $med10%.2f s vs x1 $med1%.2f s — per-batch cost " +
        "is tracking data volume super-linearly, the fixed-overhead claim broke")
  }
}
