package graft

import graft.cdc.{ParquetCdcSource, Pipeline}
import graft.model.{PipelineConfig, SyncConfig}
import graft.streaming.StreamLatency
import graft.tools.FeedGen
import org.apache.spark.sql.types.StructType

/** Mirrors the reference's one published performance bound — its
  * integration test inserts a row, sleeps 2 s, and expects it queryable
  * (`tests/test_mysql.py:28`) — as a per-micro-batch latency assertion on
  * the CDC upsert path: once the JVM is warm, a micro-batch (offset
  * resolution + plan + sink swap commit) must land its events inside that
  * same 2 s window. */
class StreamLatencySpec extends SparkSpec {

  test("CDC upsert micro-batches hold the reference's 2s insert->queryable " +
    "bound once warm") {
    val root = tmpDir("streamlat")
    val lay = FeedGen.generate(spark, root, nUsers = 200, nBatches = 6,
      eventsPerBatch = 40)
    val sync = SyncConfig("users", pk = "id", full = true,
      schema = Some(StructType.fromDDL(
        "id INT, name STRING, score DOUBLE, updated TIMESTAMP")))
    val pipe = new Pipeline(spark, PipelineConfig(Seq(sync)),
      new ParquetCdcSource(spark, lay.feedDir, lay.tableDir), lay.sinkRoot)
    val q = pipe.start(lay.ckptDir) // AvailableNow; maxFilesPerTrigger=1
    try q.processAllAvailable() finally q.stop()
    val stats = StreamLatency.stats(q)
    // one micro-batch per staged feed file
    assert(stats.size === 6, s"expected 6 micro-batches, got ${stats.map(_.batchId)}")
    assert(stats.map(_.inputRows).sum === 6L * 40)
    // batch 0 pays JIT + codegen for the whole upsert plan — the reference's
    // probe also runs against a warm server, so the bound applies from
    // batch 1 on. Median, not max: a shared CI host can stall any single
    // batch; a systematic regression moves the median.
    val steady = stats.drop(1).map(_.seconds)
    val med = StreamLatency.median(steady)
    assert(med <= 2.0,
      f"steady-state micro-batch median $med%.2f s exceeds the reference's " +
        f"2 s insert->queryable bound (per-batch: ${steady.map(s => f"$s%.2f").mkString(" ")})")
  }
}
