package graft

import graft.model.ChangeEvent
import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Top-level, not nested in the suite: a case class inside a spec CLASS
  * captures the outer instance, and Janino's generated encoder code can't
  * construct it — every MemoryStream addData fell back to interpreted
  * UnsafeProjection (harmless in tests, but noisy and slow). */
case class StreamEv(ts: java.sql.Timestamp, event_type: String, value: Double,
                    user_id: Long)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  // review r11: the former `type Ev` + forwarding factory was dead
  // indirection left from hoisting the case class to top level


  test("tumbling window with watermark drops late data past the bound") {
    val mem = MemoryStream[StreamEv](spark)
    val q = EventTime.tumblingCounts(mem.toDF(), lateness = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("tumb").start()
    mem.addData(
      StreamEv(ts("2024-01-01 10:05:00"), "click", 1.0, 1),
      StreamEv(ts("2024-01-01 10:55:00"), "click", 2.0, 1))
    q.processAllAvailable()
    // advance watermark far past the 10:00 window...
    mem.addData(StreamEv(ts("2024-01-01 13:00:00"), "click", 4.0, 1))
    q.processAllAvailable()
    // ...then send an event for the closed 10:00 window: must be dropped
    mem.addData(StreamEv(ts("2024-01-01 10:30:00"), "click", 8.0, 1))
    mem.addData(StreamEv(ts("2024-01-01 13:10:00"), "flush", 0.0, 1))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("tumb")
      .filter(col("win_start") === ts("2024-01-01 10:00:00")).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("n") === 2)       // late event NOT counted
    assert(rows.head.getAs[Double]("total") === 3.0)
  }

  test("session window groups events by gap") {
    val mem = MemoryStream[StreamEv](spark)
    val q = EventTime.sessionCounts(mem.toDF(), gap = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sess").start()
    mem.addData(
      StreamEv(ts("2024-01-01 10:00:00"), "a", 1.0, 7),
      StreamEv(ts("2024-01-01 10:10:00"), "a", 1.0, 7),  // same session
      StreamEv(ts("2024-01-01 12:00:00"), "a", 1.0, 7))  // new session
    q.processAllAvailable()
    mem.addData(StreamEv(ts("2024-01-02 00:00:00"), "a", 1.0, 8)) // advance watermark
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("sess").filter(col("user_id") === 7)
      .orderBy("win_start").collect()
    assert(sessions.map(_.getAs[Long]("n")).toSeq === Seq(2L, 1L))
  }

  test("stream-stream join attributes purchases to signups within the horizon") {
    val purchases = MemoryStream[StreamEv](spark)
    val signups = MemoryStream[StreamEv](spark)
    // Ev lacks event_id; reuse user_id-bearing frame with an id column
    val p = purchases.toDF().withColumn("event_id", (col("value") * 100).cast("long"))
    val s = signups.toDF().withColumn("event_id", (col("value") * 100).cast("long"))
    val q = EventTime.purchaseAttribution(p, s, horizon = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("attr").start()
    signups.addData(StreamEv(ts("2024-01-01 10:00:00"), "signup", 1.0, 7))
    purchases.addData(
      StreamEv(ts("2024-01-01 10:30:00"), "purchase", 2.0, 7),  // within horizon
      StreamEv(ts("2024-01-01 12:30:00"), "purchase", 3.0, 7),  // past horizon
      StreamEv(ts("2024-01-01 10:30:00"), "purchase", 4.0, 8))  // other user
    q.processAllAvailable(); q.stop()
    val rows = spark.table("attr").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("p_id") === 200L)
    assert(rows.head.getAs[Long]("s_id") === 100L)
  }

  test("streaming dropDuplicates with watermark dedupes across batches, bounded state") {
    // SURVEY §2.2 stateful-streaming row: exactly-once-per-key emission with
    // event-time-bounded state (late replays past the watermark age out)
    implicit val s = spark
    val mem = MemoryStream[ChangeEvent](spark)
    val out = mem.toDS().toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("table", "data")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("dd").start()
    mem.addData(
      ChangeEvent("update", "t", 1, ts("2024-01-01 00:00:00"), "k1"),
      ChangeEvent("update", "t", 2, ts("2024-01-01 00:00:01"), "k1"), // in-batch dup
      ChangeEvent("update", "t", 3, ts("2024-01-01 00:00:02"), "k2"))
    q.processAllAvailable()
    mem.addData(
      ChangeEvent("update", "t", 4, ts("2024-01-01 00:00:03"), "k1"), // cross-batch dup
      ChangeEvent("update", "t", 5, ts("2024-01-01 00:00:04"), "k3"))
    q.processAllAvailable(); q.stop()
    val seen = spark.table("dd").as[ChangeEvent].collect().map(_.data).sorted.toSeq
    assert(seen === Seq("k1", "k2", "k3"))
  }

  test("KeyedLastWrite: stale cross-batch replays never clobber newer state") {
    implicit val s = spark
    val mem = MemoryStream[ChangeEvent](spark)
    val out = KeyedLastWrite.latestPerKey(mem.toDS(), pkOf = e => Some(e.data))
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("lww").start()
    mem.addData(ChangeEvent("update", "t", 10, ts("2024-01-01 00:00:10"), "k1"))
    q.processAllAvailable()
    // batch 2: a STALE event (offset 5 < 10) and a fresh one
    mem.addData(
      ChangeEvent("update", "t", 5, ts("2024-01-01 00:00:05"), "k1"),
      ChangeEvent("update", "t", 20, ts("2024-01-01 00:00:20"), "k2"))
    q.processAllAvailable(); q.stop()
    val emitted = spark.table("lww").as[ChangeEvent].collect()
    assert(emitted.map(_.offset).sorted.toSeq === Seq(10L, 20L)) // 5 suppressed
  }

  test("KeyedLastWrite: events with no extractable pk pass through un-suppressed") {
    // ADVICE r01: keying pk-less events on "" collapsed distinct rows into
    // one channel where they suppressed each other (silent data loss)
    implicit val s = spark
    val mem = MemoryStream[ChangeEvent](spark)
    val out = KeyedLastWrite.latestPerKey(mem.toDS(),
      pkOf = e => if (e.data.startsWith("k")) Some(e.data) else None)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("lww_nopk").start()
    mem.addData(
      ChangeEvent("update", "t", 30, ts("2024-01-01 00:00:30"), "row-a"),
      ChangeEvent("update", "t", 10, ts("2024-01-01 00:00:10"), "row-b"))
    q.processAllAvailable()
    // a lower-offset pk-less event in a LATER batch must still come through
    mem.addData(ChangeEvent("update", "t", 5, ts("2024-01-01 00:00:05"), "row-c"))
    q.processAllAvailable(); q.stop()
    val emitted = spark.table("lww_nopk").as[ChangeEvent].collect()
    assert(emitted.map(_.data).sorted.toSeq === Seq("row-a", "row-b", "row-c"))
  }

  test("KeyedLastWriteTws (transformWithState) emits the same stream as the old API") {
    implicit val s = spark
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    // transformWithState requires the RocksDB state store; scope it to this
    // test so the flatMapGroupsWithState suites keep the default provider
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[ChangeEvent](spark)
      val out = KeyedLastWriteTws.latestPerKey(mem.toDS(),
        pkOf = e => if (e.data.startsWith("k")) Some(e.data) else None)
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName("lww_tws").start()
      mem.addData(ChangeEvent("update", "t", 10, ts("2024-01-01 00:00:10"), "k1"))
      q.processAllAvailable()
      // the same out-of-order replay the old-API spec uses, plus a pk-less
      // passthrough row: stale k1@5 suppressed, fresh k2@20 emitted,
      // "row-x" passes through untouched
      mem.addData(
        ChangeEvent("update", "t", 5, ts("2024-01-01 00:00:05"), "k1"),
        ChangeEvent("update", "t", 20, ts("2024-01-01 00:00:20"), "k2"),
        ChangeEvent("update", "t", 3, ts("2024-01-01 00:00:03"), "row-x"))
      q.processAllAvailable(); q.stop()
      val emitted = spark.table("lww_tws").as[ChangeEvent].collect()
      assert(emitted.map(e => (e.data, e.offset)).sorted.toSeq ===
        Seq(("k1", 10L), ("k2", 20L), ("row-x", 3L)))
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}
