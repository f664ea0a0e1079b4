package graft

import graft.cdc._
import graft.model._
import org.apache.spark.sql.types._

/** The external progress channel (reference `progress/file.py` /
  * `progress/redis.py`): a string hash other APPLICATIONS read to learn
  * where a sync is — distinct from the checkpoint, which is private to
  * the query. Both backends merge fields (redis HMSET semantics; the
  * reference's file backend replace-drops sibling keys, deliberately not
  * reproduced), and the publisher only ever writes COMMITTED batches. */
class ProgressStoreSpec extends SparkSpec {

  test("file store: set merges fields, get round-trips, absent file is empty") {
    val store = new FileProgressStore(tmpDir("prog") + "/progress.json")
    assert(store.get() === Map.empty)
    store.set(Map("a" -> "1", "b" -> "x y\nz"))
    store.set(Map("b" -> "2")) // merge: a survives, b overwritten
    assert(store.get() === Map("a" -> "1", "b" -> "2"))
  }

  test("socket store: HSET merges into the live server hash, HGETALL " +
    "round-trips values with whitespace") {
    val server = new ProgressKvServer
    try {
      val store = new SocketProgressStore(s"localhost:${server.port}")
      assert(store.get() === Map.empty)
      store.set(Map("pos" -> """{"file": "binlog.01", "pos": 4}""", "x" -> "1"))
      store.set(Map("x" -> "2", "empty" -> "")) // empty values must round-trip
      assert(store.get() ===
        Map("pos" -> """{"file": "binlog.01", "pos": 4}""", "x" -> "2",
          "empty" -> ""))
      assert(server.snapshot.size === 3)
    } finally server.close()
  }

  test("pipeline publishes committed positions; a second application " +
    "reads them and they advance across restarts") {
    val root = tmpDir("progpipe")
    val path = s"$root/progress.json"
    val sync = SyncConfig("t", pk = "id", schema = Some(StructType(Seq(
      StructField("id", IntegerType), StructField("v", IntegerType)))))
    val src = new MemoryCdcSource(spark)
    val pipe = new Pipeline(spark, PipelineConfig(Seq(sync)), src, s"$root/sink")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    def drain(events: ChangeEvent*): Unit = {
      src.addEvents(events: _*)
      val q = pipe.start(s"$root/ckpt",
        progress = Some(new FileProgressStore(path)))
      try q.processAllAvailable() finally q.stop()
    }
    def awaitBatch(reader: ProgressStore, id: Long): Map[String, String] = {
      // the listener fires asynchronously after the commit; poll briefly
      val deadline = System.currentTimeMillis() + 30000
      var m = reader.get()
      while (!m.get("batchId").contains(id.toString) &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(50); m = reader.get()
      }
      m
    }

    drain(ChangeEvent("create", "t", 1, ts("2024-01-01 00:00:00"), """{"id": 1, "v": 1}"""))
    // the "other application": an independent store instance on the path
    val reader = new FileProgressStore(path)
    val m1 = awaitBatch(reader, 0L)
    assert(m1.get("batchId").contains("0"), s"progress after batch 0: $m1")
    assert(m1.contains("endOffset") && m1.contains("timestamp"))

    drain(ChangeEvent("update", "t", 2, ts("2024-01-01 00:00:01"), """{"id": 1, "v": 2}"""))
    val m2 = awaitBatch(reader, 1L)
    assert(m2.get("batchId").contains("1"), s"progress after restart: $m2")
    // and the sink really holds the committed state the store points at
    assert(pipe.sinkState(sync).collect().toSeq ===
      Seq(org.apache.spark.sql.Row(1, 2)))
  }

  test("a failing progress store never kills or stalls the stream, but is " +
    "NOT silent either: the publisher logs and records lastFailure, and " +
    "clears it on the next successful publish (review r11: the listener " +
    "bus swallows listener throws, so the store's fail-loud HSET rejection " +
    "was vanishing here)") {
    val root = tmpDir("progfail")
    val sync = SyncConfig("t", pk = "id", schema = Some(StructType(Seq(
      StructField("id", IntegerType), StructField("v", IntegerType)))))
    val src = new MemoryCdcSource(spark)
    val pipe = new Pipeline(spark, PipelineConfig(Seq(sync)), src, s"$root/sink")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    @volatile var broken = true
    val flaky = new ProgressStore {
      val inner = new FileProgressStore(s"$root/progress.json")
      override def set(fields: Map[String, String]): Unit = {
        if (broken) throw new IllegalStateException("progress HSET rejected: ERR")
        inner.set(fields)
      }
      override def get(): Map[String, String] = inner.get()
    }
    src.addEvents(ChangeEvent("create", "t", 1,
      ts("2024-01-01 00:00:00"), """{"id": 1, "v": 1}"""))
    // ProcessingTime keeps ONE query alive across both phases (the default
    // AvailableNow trigger terminates after draining the first batch)
    val q = pipe.start(s"$root/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(200L),
      progress = Some(flaky))
    try {
      q.processAllAvailable()
      // the stream survived the failing store and committed its batch
      assert(pipe.sinkState(sync).collect().toSeq ===
        Seq(org.apache.spark.sql.Row(1, 1)))
      assert(flaky.get().isEmpty, "nothing was published while broken")
      // heal the store; the next committed batch publishes and clears
      broken = false
      src.addEvents(ChangeEvent("update", "t", 2,
        ts("2024-01-01 00:00:01"), """{"id": 1, "v": 2}"""))
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 30000
      var m = flaky.get()
      while (!m.get("batchId").contains("1") &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(50); m = flaky.get()
      }
      assert(m.get("batchId").contains("1"),
        s"the healed store must receive the next committed position: $m")
    } finally q.stop()
  }

  test("ProgressPublisher records lastFailure on a store error and clears " +
    "it on the next success (direct listener contract, review r11)") {
    val root = tmpDir("progfail2")
    @volatile var broken = true
    val store = new ProgressStore {
      val inner = new FileProgressStore(s"$root/p.json")
      override def set(fields: Map[String, String]): Unit = {
        if (broken) throw new IllegalStateException("boom")
        inner.set(fields)
      }
      override def get(): Map[String, String] = inner.get()
    }
    val sync = SyncConfig("t", pk = "id", schema = Some(StructType(Seq(
      StructField("id", IntegerType), StructField("v", IntegerType)))))
    val src = new MemoryCdcSource(spark)
    val pipe = new Pipeline(spark, PipelineConfig(Seq(sync)),
      src, s"$root/sink")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    src.addEvents(ChangeEvent("create", "t", 1,
      ts("2024-01-01 00:00:00"), """{"id": 1, "v": 1}"""))
    val q = pipe.start(s"$root/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(200L))
    val publisher = ProgressPublisher.attach(spark, q.id, store)
    try {
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 30000
      while (publisher.lastFailure.isEmpty &&
             System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(publisher.lastFailure.exists(_.contains("boom")),
        s"the failure must be recorded: ${publisher.lastFailure}")
      broken = false
      src.addEvents(ChangeEvent("update", "t", 2,
        ts("2024-01-01 00:00:01"), """{"id": 1, "v": 2}"""))
      q.processAllAvailable()
      val d2 = System.currentTimeMillis() + 30000
      while (publisher.lastFailure.nonEmpty &&
             System.currentTimeMillis() < d2) Thread.sleep(50)
      assert(publisher.lastFailure.isEmpty,
        "a successful publish must clear the recorded failure")
    } finally {
      q.stop()
      ProgressPublisher.detach(spark, publisher)
    }
  }

  test("SocketProgressStore.get names a protocol error on a tab-less reply " +
    "(wrong server / ERR) instead of a StringIndexOutOfBounds (r9 review)") {
    // point the KV client at a CDC feed server: its reply to HGETALL is an
    // ERR line with no tab
    val wrong = new graft.sources.CdcFeedServer
    try {
      val store = new SocketProgressStore(s"localhost:${wrong.port}")
      val err = intercept[IllegalStateException](store.get())
      assert(err.getMessage.contains("not a progress KV server"),
        s"must name the protocol mismatch: ${err.getMessage}")
    } finally wrong.close()
  }

  test("FileProgressStore.set merges under a cross-process file lock with " +
    "per-process temp names; heavy concurrent merges lose no fields") {
    val path = tmpDir("fps") + "/progress.json"
    val store = new FileProgressStore(path)
    // concurrent writers (threads stand in for processes; the lock file +
    // unique tmp protocol is what the test pins on disk)
    val threads = (1 to 8).map { t =>
      new Thread(() => {
        val s = new FileProgressStore(path) // independent instance per writer
        (1 to 10).foreach(i => s.set(Map(s"k$t-$i" -> s"v$t-$i")))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    val got = store.get()
    assert(got.size === 80, s"all 80 fields must survive the merge: ${got.size}")
    assert(new java.io.File(path + ".lock").exists(), "lock sidecar exists")
  }
}
