package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Per-micro-batch latency extraction from a streaming query's progress
  * log — the end-to-end "event arrives → applied to the sink" figure for
  * the engine's two continuous paths (CDC upsert, streaming dedup).
  *
  * The reference's only published performance bound is its integration
  * test's insert→queryable latency: it sleeps 2 s after an insert and
  * expects the row synced (`/root/reference/tests/test_mysql.py:28`). The
  * Spark analog of that bound is the micro-batch trigger latency:
  * `triggerExecution` covers offset resolution, the batch's plan, and the
  * sink commit, so a batch's stat IS the worst-case freshness of every
  * event it carries. StreamLatencySpec mirrors the 2 s bound per batch;
  * `Profile streamlat` records the x10 figures in SCALE.md. */
object StreamLatency {

  final case class BatchStat(batchId: Long, seconds: Double, inputRows: Long) {
    def rowsPerSec: Double = if (seconds > 0) inputRows / seconds else 0.0
  }

  /** Stats for every completed micro-batch that carried input rows, oldest
    * first. Call after the drain; the progress log survives `stop()` (its
    * retention, `spark.sql.streaming.numRecentProgressUpdates`, defaults to
    * 100 — raise it before draining feeds with more batches than that). */
  def stats(q: StreamingQuery): Seq[BatchStat] =
    q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .flatMap { p =>
        // a progress entry with no triggerExecution carries no latency
        // fact — skip it rather than reporting 0 s; one that ROUNDED to
        // 0 ms floors at 1 ms so rowsPerSec never degrades to 0.0, the
        // most-wrong value for the fastest batch (review r11)
        Option(p.durationMs.get("triggerExecution")).map(_.longValue).map {
          ms => BatchStat(p.batchId, math.max(ms, 1L) / 1000.0, p.numInputRows)
        }
      }

  def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of an empty sequence")
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }
}
