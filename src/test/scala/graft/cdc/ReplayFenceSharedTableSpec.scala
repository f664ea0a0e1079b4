package graft.cdc

import graft.{CkptCrash, SparkSpec}
import graft.model._
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types._

/** ADVICE r12 (medium) regression: the first-batch replay fence must be
  * keyed by `sync.indexName` — the SAME identity `statePath` uses — not by
  * `sync.table`. Two syncs may share one source table with different target
  * indexes (SyncConfig.index); a table-keyed fence entry is consumed by the
  * FIRST sync's micro-batch, leaving every other sync's first batch to
  * replay unfenced — exactly the stale-payload-over-repaired-state
  * regression the fence (r12 OffsetWatermarkFuzzSpec finding) exists to
  * stop. This drives the full scenario end-to-end through both indexes:
  * crash inside a batch → operator `refresh` while the stream is down →
  * restart replays the batch → BOTH indexes must keep the refreshed state.
  */
class ReplayFenceSharedTableSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("two syncs sharing a source table: the restart's checkpoint-replayed" +
    " first batch is fenced for EVERY index, not just the first") {
    val root = tmpDir("fence-shared")
    val feedDir = s"$root/feed"
    val tableDir = s"$root/tables"
    val sinkRoot = s"$root/sink"
    val ckpt = s"$root/ckpt"
    new java.io.File(feedDir).mkdirs()

    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("score", LongType)))
    // same source table, two target indexes — the reference's
    // one-table-many-indexes shape (settings.py Sync.index)
    val syncA = SyncConfig("t", pk = "id", full = true,
      index = Some("idx_a"), schema = Some(schema))
    val syncB = SyncConfig("t", pk = "id", full = true,
      index = Some("idx_b"), schema = Some(schema))
    val cfg = PipelineConfig(Seq(syncA, syncB))

    def writeTruth(score: Long): Unit =
      Seq((1, score)).toDF("id", "score")
        .write.mode(SaveMode.Overwrite).parquet(s"$tableDir/t.parquet")
    writeTruth(10L)

    def feed(events: ChangeEvent*): Unit =
      events.toSeq.toDS().toDF()
        .repartition(1).write.mode(SaveMode.Append).parquet(feedDir)

    val src = new ParquetCdcSource(spark, feedDir, tableDir,
      maxFilesPerTrigger = 1)
    val pipe = new Pipeline(spark, cfg, src, sinkRoot)

    def scoreOf(sync: SyncConfig): Long = {
      val rows = pipe.sinkState(sync).collect()
      assert(rows.length === 1, s"${sync.indexName}: one row expected")
      rows.head.getLong(rows.head.fieldIndex("score"))
    }

    // stage 1: two live batches (the crash helper rewinds to the LAST
    // commit, so it needs a prior one), then crash INSIDE the second so
    // the next start replays it from the checkpoint
    feed(ChangeEvent("update", "t", 100, ts("2024-01-01 00:00:00"),
      """{"id": 1, "score": 10}"""))
    feed(ChangeEvent("update", "t", 101, ts("2024-01-01 00:00:01"),
      """{"id": 1, "score": 11}"""))
    val q1 = pipe.start(ckpt); q1.processAllAvailable(); q1.stop()
    assert(scoreOf(syncA) === 11L && scoreOf(syncB) === 11L,
      "stage 1: the batch landed in both indexes")
    CkptCrash.simulateCrashAtLastCommit(spark, ckpt)

    // stage 2: operator repair while the stream is down — refresh from new
    // source truth records a snapshot floor ABOVE the replayed offset for
    // each index's own state dir
    writeTruth(999L)
    pipe.refresh()
    assert(scoreOf(syncA) === 999L && scoreOf(syncB) === 999L,
      "stage 2: both indexes hold the refreshed snapshot")

    // stage 3: restart — the first micro-batch is the checkpoint REPLAY of
    // the stale offset-101 payload. Each sync's first batch must pass
    // through splitStale (per-index fence), so neither index regresses.
    val q2 = pipe.start(ckpt); q2.processAllAvailable(); q2.stop()
    assert(scoreOf(syncA) === 999L,
      "stage 3: idx_a kept the refreshed state (fence consumed by idx_a)")
    assert(scoreOf(syncB) === 999L,
      "stage 3: idx_b kept the refreshed state — a table-keyed fence is " +
        "consumed by idx_a's batch and lets this one replay unfenced")
  }
}
