package graft.cdc

import graft.SparkSpec
import graft.model._
import org.apache.spark.sql.types._

/** The start() unwinding guard (ADVICE r10): a failure AFTER the streaming
  * query starts but BEFORE start() returns (a throwing listener attach, a
  * heartbeat wiring failure) used to propagate to start()'s catch, which
  * deregistered the stream refcount and released the lease while the query
  * kept RUNNING — a leaked active stream the caller has no handle to stop,
  * mutating the state path with no idle heartbeat fence. The guard stops
  * the query first; this spec drives it through the test seam (the failure
  * is not constructible from the public surface). */
class StartUnwindSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("a post-start wiring failure stops the query before the lease is " +
    "released: no active stream survives the throw, the lease is free, " +
    "and a later clean start() works") {
    val sinkRoot = tmpDir("unwind-sink")
    val ckpt = tmpDir("unwind-ckpt")
    val statePath = s"$sinkRoot/t"
    val sync = SyncConfig("t", pk = "id", schema = Some(StructType(Seq(
      StructField("id", IntegerType), StructField("score", LongType)))))
    val src = new MemoryCdcSource(spark)
    src.addEvents(ChangeEvent("create", "t", 1, ts("2024-01-01 00:00:00"),
      """{"id": 1, "score": 10}"""))
    val pipe = new Pipeline(spark, PipelineConfig(Seq(sync)), src, sinkRoot)
    val leaked = new java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.sql.streaming.StreamingQuery]()
    pipe.onStartWired = { q =>
      leaked.set(q)
      throw new RuntimeException("injected post-start wiring failure")
    }
    try {
      val e = intercept[RuntimeException] { pipe.start(ckpt) }
      assert(e.getMessage.contains("injected post-start wiring failure"))
      val q = leaked.get()
      assert(q != null, "the query started before the wiring failure")
      // the unwinding guard must have STOPPED it — pre-fix it kept running
      // with its refcount deregistered and its lease released
      assert(!q.isActive,
        "the unwinding guard must stop the query it cannot hand back")
      // and only then released: with the query down, a free lease is sound
      assert(DriverLease.holder(spark, statePath).isEmpty,
        "the failed start must leave no lease behind")
      assert(Pipeline.streamRefCount(statePath).get() === 0L,
        "the failed start must leave no stream registration behind")
    } finally pipe.onStartWired = _ => ()
    // the path is clean: a later start on the same checkpoint just works
    val q2 = pipe.start(ckpt)
    try {
      q2.processAllAvailable()
      assert(pipe.sinkState(sync).count() === 1L)
    } finally { q2.stop(); pipe.releaseLeases() }
  }
}
