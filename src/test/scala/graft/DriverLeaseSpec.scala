package graft

import graft.cdc._
import graft.model._
import org.apache.spark.sql.types._

/** The fail-loud single-driver deployment fence (r9 verdict #1): a second
  * driver process mutating the same sink state path must fail with a clear
  * message instead of silently interleaving last-copy-wins swaps; a crashed
  * holder's lease is reclaimed on a stale heartbeat. */
class DriverLeaseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("acquire/release lifecycle: first claim wins, re-acquire refreshes, " +
    "a FRESH foreign lease fails loud naming the holder, release frees it") {
    val statePath = tmpDir("lease") + "/t"
    DriverLease.acquire(spark, statePath, identity = "procA")
    assert(DriverLease.holder(spark, statePath).map(_._1) === Some("procA"))
    // re-acquire by the same identity: heartbeat refresh, no failure
    DriverLease.acquire(spark, statePath, identity = "procA")
    val e = intercept[IllegalStateException] {
      DriverLease.acquire(spark, statePath, identity = "procB")
    }
    assert(e.getMessage.contains("procA") &&
      e.getMessage.contains("outside the deployment contract"),
      s"the failure must name the holder and the contract: ${e.getMessage}")
    // a foreign release is a no-op; the holder's release frees the lease
    DriverLease.release(spark, statePath, identity = "procB")
    assert(DriverLease.holder(spark, statePath).isDefined)
    DriverLease.release(spark, statePath, identity = "procA")
    assert(DriverLease.holder(spark, statePath).isEmpty)
    DriverLease.acquire(spark, statePath, identity = "procB")
    assert(DriverLease.holder(spark, statePath).map(_._1) === Some("procB"))
  }

  test("stale-heartbeat takeover: a dead holder's lease is reclaimed past " +
    "the horizon, after which the DEAD identity is the one refused") {
    val statePath = tmpDir("lease-stale") + "/t"
    DriverLease.acquire(spark, statePath, identity = "crashed")
    // age the heartbeat past the horizon
    val f = new java.io.File(DriverLease.leasePath(statePath))
    assert(f.setLastModified(System.currentTimeMillis() - 120L * 1000L))
    DriverLease.acquire(spark, statePath, identity = "restarted",
      staleMs = 60L * 1000L)
    assert(DriverLease.holder(spark, statePath).map(_._1) === Some("restarted"))
    // the crashed identity (were it alive after all) now fails loud
    intercept[IllegalStateException] {
      DriverLease.acquire(spark, statePath, identity = "crashed",
        staleMs = 60L * 1000L)
    }
  }

  test("pipeline end-to-end: a second driver process's replay and refresh " +
    "fail loud against a live stream's fresh lease; the stream's own " +
    "batches keep heartbeating") {
    val sinkRoot = tmpDir("lease-sink")
    val sync = SyncConfig("t", pk = "id", full = true,
      schema = Some(StructType(Seq(
        StructField("id", IntegerType), StructField("name", StringType)))))
    val snapshot = Map("t" -> Seq((1, "a")).toDF("id", "name"))
    val src = new MemoryCdcSource(spark, snapshot)
    val pipe = new Pipeline(spark, PipelineConfig(Seq(sync)), src, sinkRoot)
    src.addEvents(ChangeEvent("create", "t", 1, ts("2024-01-01 00:00:00"),
      """{"id": 1, "name": "a"}"""))
    // ProcessingTime, NOT the default AvailableNow: the active-phase
    // asserts below need a query that stays alive after draining (an
    // AvailableNow query self-terminates and its heartbeat thread could
    // release the lease under the asserts — review r10)
    val q = pipe.start(tmpDir("lease-ckpt"),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
    q.processAllAvailable()
    assert(q.isActive, "precondition: the drained query must still be live")
    val statePath = s"$sinkRoot/t"
    // while the query is ACTIVE (even drained/idle — the heartbeat thread,
    // not just data-bearing batches, keeps the lease fresh), a second
    // driver's claim is refused
    assert(DriverLease.holder(spark, statePath).map(_._1) ===
      Some(DriverLease.processIdentity),
      "the stream must hold the lease under this JVM's identity")
    intercept[IllegalStateException] {
      DriverLease.acquire(spark, statePath, identity = "other-driver")
    }
    // a graceful stop RELEASES the lease (the heartbeat thread's finally):
    // a planned handoff is instant, no staleness window
    q.stop()
    val deadline = System.currentTimeMillis() + 10000
    while (DriverLease.holder(spark, statePath).isDefined &&
           System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(DriverLease.holder(spark, statePath).isEmpty,
      "stopping the stream must release the lease promptly")
    DriverLease.acquire(spark, statePath, identity = "other-driver")
    DriverLease.release(spark, statePath, identity = "other-driver")
    // and from THIS process's view, a foreign fresh lease (the second
    // driver won a claim) makes our own mutating verbs fail loud too
    // write through the Hadoop FS (a raw java.io overwrite invalidates the
    // local filesystem's .crc sidecar and reads fail on ChecksumException)
    val hp = new org.apache.hadoop.fs.Path(DriverLease.leasePath(statePath))
    val hdfs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = hdfs.create(hp, true)
    try out.write("other-driver".getBytes("UTF-8")) finally out.close()
    val f = new java.io.File(DriverLease.leasePath(statePath))
    val er = intercept[IllegalStateException] { pipe.replayDeadLetters() }
    assert(er.getMessage.contains("other-driver"))
    val ef = intercept[IllegalStateException] { pipe.refresh() }
    assert(ef.getMessage.contains("other-driver"))
    // reclaim: age the usurper's heartbeat and the pipeline takes back over
    assert(f.setLastModified(System.currentTimeMillis() - 120L * 1000L))
    pipe.refresh()
    assert(DriverLease.holder(spark, statePath).map(_._1) ===
      Some(DriverLease.processIdentity))
    assert(pipe.sinkState(sync).count() === 1L)
  }
}
