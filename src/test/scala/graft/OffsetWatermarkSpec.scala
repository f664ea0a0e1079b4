package graft

import graft.cdc._
import graft.model._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The r9 review findings on the offset-watermark sidecar: empty-batch
  * no-op (a first empty dynamic-partitioned write used to leave a
  * schema-less dir that crashed every later batch), the snapshot floor
  * (refresh/backfill never advance the per-pk map, so pre-snapshot
  * quarantined rows used to replay over refreshed state; the floor is
  * captured BEFORE the scan and survives a torn write), the (offset, _ridx)
  * position order (a repaired row must lose to an applied same-offset
  * sibling with a higher row index), and the bounded probe broadcast in
  * splitStale. */
class OffsetWatermarkSpec extends SparkSpec {
  import spark.implicits._


  /** The quarantine-repair ritual: read -> transform -> EAGER checkpoint ->
    * overwrite the SAME path. The localCheckpoint(true) is what makes
    * overwriting the file being read safe — one helper so no copy can
    * drop it (review r11: five inlined copies). */
  private def repairQuarantine(dl: String)(
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val repaired = f(spark.read.parquet(dl)).localCheckpoint(true)
    repaired.write.mode("overwrite").parquet(dl)
    repaired // still materialized — callers may re-stage it (crash-retry)
  }

  private def wmOf(statePath: String): Map[Int, (Long, Int)] =
    OffsetWatermark.current(spark, statePath).map(
      _.collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getInt(2)))).toMap)
      .getOrElse(Map.empty)

  test("advance: an empty batch is a full no-op — no store created, no " +
    "rewrite — in both the bucketed and flat layouts (r9 review: the empty " +
    "bucketed first write seeded a schema-less dir that crashed current())") {
    val empty = Seq.empty[(Int, Long, Int)].toDF("id", "offset", "_ridx")
    val some = Seq((1, 10L, 0), (2, 20L, 0)).toDF("id", "offset", "_ridx")
    for (buckets <- Seq(Some(4), None)) {
      val statePath = tmpDir("wm-empty") + "/state"
      OffsetWatermark.advance(spark, statePath, empty, "id", buckets)
      assert(OffsetWatermark.current(spark, statePath).isEmpty,
        s"empty first batch must not create the store (buckets=$buckets)")
      assert(!new java.io.File(OffsetWatermark.path(statePath)).exists(),
        s"no dir at all should appear (buckets=$buckets)")
      // the store must still bootstrap and read back fine afterwards
      OffsetWatermark.advance(spark, statePath, some, "id", buckets)
      assert(wmOf(statePath) === Map(1 -> ((10L, 0)), 2 -> ((20L, 0))))
      // an empty batch against an EXISTING store: no rewrite (mtimes frozen)
      val dir = new java.io.File(OffsetWatermark.path(statePath))
      val before = dir.listFiles().map(f => f.getName -> f.lastModified).toMap
      OffsetWatermark.advance(spark, statePath, empty, "id", buckets)
      val after = dir.listFiles().map(f => f.getName -> f.lastModified).toMap
      assert(after === before, s"empty batch must not rewrite (buckets=$buckets)")
      assert(wmOf(statePath) === Map(1 -> ((10L, 0)), 2 -> ((20L, 0))))
    }
  }

  test("current: a historical schema-less watermark dir (only _SUCCESS) " +
    "reads as absent and the next real batch heals it") {
    val statePath = tmpDir("wm-heal") + "/state"
    val dir = new java.io.File(OffsetWatermark.path(statePath))
    assert(dir.mkdirs())
    assert(new java.io.File(dir, "_SUCCESS").createNewFile())
    assert(OffsetWatermark.current(spark, statePath).isEmpty,
      "_SUCCESS alone must not count as data")
    OffsetWatermark.advance(spark, statePath,
      Seq((5, 50L, 0)).toDF("id", "offset", "_ridx"), "id", Some(4))
    assert(wmOf(statePath) === Map(5 -> ((50L, 0))))
  }

  test("advance: the watermark is the max (offset, _ridx) PAIR, not the " +
    "max offset — a multi-row event's later row wins, and the merge is " +
    "monotone on the pair") {
    val statePath = tmpDir("wm-pair") + "/state"
    OffsetWatermark.advance(spark, statePath,
      Seq((1, 7L, 0), (1, 7L, 3), (2, 4L, 1)).toDF("id", "offset", "_ridx"),
      "id", None)
    assert(wmOf(statePath) === Map(1 -> ((7L, 3)), 2 -> ((4L, 1))))
    // a later batch with the SAME offset but lower ridx must not regress
    OffsetWatermark.advance(spark, statePath,
      Seq((1, 7L, 1), (2, 9L, 0)).toDF("id", "offset", "_ridx"), "id", None)
    assert(wmOf(statePath) === Map(1 -> ((7L, 3)), 2 -> ((9L, 0))))
  }

  test("splitStale: a repaired row at the SAME offset as its applied " +
    "sibling is superseded iff its _ridx is lower (r9 review: offset-only " +
    "compare inverted the live path's last-write-wins tiebreak)") {
    val ready = Seq(
      (1, 7L, 0, "lost-lww"), (1, 7L, 3, "is-the-applied-row"),
      (1, 7L, 5, "later-row-of-same-event"))
      .toDF("id", "offset", "_ridx", "tag")
    val wm = Seq((1, 7L, 3))
      .toDF("id", OffsetWatermark.OffsetCol, OffsetWatermark.RidxCol)
    val (f, s) = OffsetWatermark.splitStale(ready, Some(wm), "id")
    assert(f.select("tag").as[String].collect().toSet ===
      Set("is-the-applied-row", "later-row-of-same-event"),
      "at-watermark exactly = idempotent fresh; above = fresh")
    assert(s.select("tag").as[String].collect().toSet === Set("lost-lww"))
  }

  test("splitStale: above the broadcast bound the shuffle path returns " +
    "identical (fresh, stale) splits") {
    val ready = Seq(
      (1, 5L, 0, "keep-at-wm"), (1, 3L, 0, "stale"), (2, 9L, 0, "newer"),
      (3, 1L, 0, "no-wm-entry")).toDF("id", "offset", "_ridx", "tag")
    val wm = Seq((1, 5L, 0), (2, 7L, 0))
      .toDF("id", OffsetWatermark.OffsetCol, OffsetWatermark.RidxCol)
    def run(maxBroadcast: Long): (Set[String], Set[String]) = {
      val (f, s) = OffsetWatermark.splitStale(ready, Some(wm), "id",
        floor = 0L, maxBroadcastProbes = maxBroadcast)
      (f.select("tag").as[String].collect().toSet,
        s.select("tag").as[String].collect().toSet)
    }
    val viaBroadcast = run(Long.MaxValue)
    val viaShuffle = run(1L) // 3 distinct pks > 1 forces the shuffle join
    assert(viaBroadcast ===
      ((Set("keep-at-wm", "newer", "no-wm-entry"), Set("stale"))))
    assert(viaShuffle === viaBroadcast)
  }

  test("splitStale: the snapshot floor supersedes rows with NO per-pk " +
    "watermark entry; floor 0 fences nothing even at offset 0") {
    val ready = Seq(
      (7, 2L, 0, "pre-snapshot"), (9, 5L, 0, "post-snapshot"),
      (4, 0L, 0, "offset-zero"))
      .toDF("id", "offset", "_ridx", "tag")
    val (f0, s0) = OffsetWatermark.splitStale(ready, None, "id", floor = 0L)
    assert(f0.count() === 3L && s0.count() === 0L,
      "no snapshot => nothing fenced, even offset 0")
    val (f2, s2) = OffsetWatermark.splitStale(ready, None, "id", floor = 2L)
    assert(f2.select("tag").as[String].collect().toSet === Set("post-snapshot"))
    assert(s2.select("tag").as[String].collect().toSet ===
      Set("pre-snapshot", "offset-zero"))
  }

  test("snapshot floor survives a torn swap: crash after the old floor is " +
    "deleted but before the temp renames in is healed at read time") {
    val statePath = tmpDir("wm-floor") + "/state"
    assert(OffsetWatermark.snapshotFloor(spark, statePath) === 0L)
    OffsetWatermark.recordSnapshotFloor(spark, statePath, 41L)
    assert(OffsetWatermark.snapshotFloor(spark, statePath) === 41L)
    // overwrite works (second refresh)
    OffsetWatermark.recordSnapshotFloor(spark, statePath, 55L)
    assert(OffsetWatermark.snapshotFloor(spark, statePath) === 55L)
    // simulate the crash window: temp fully written, main deleted, rename
    // never ran — the read must complete the swap, not report 0
    val main = new java.io.File(OffsetWatermark.floorPath(statePath))
    val tmp = new java.io.File(OffsetWatermark.floorPath(statePath) + ".next")
    java.nio.file.Files.write(tmp.toPath, "77".getBytes("UTF-8"))
    assert(main.delete())
    assert(OffsetWatermark.snapshotFloor(spark, statePath) === 77L,
      "an interrupted floor swap must heal to the NEW floor")
    assert(main.exists() && !tmp.exists(), "the swap must be completed on disk")
  }

  test("refresh fences replays: a pre-snapshot quarantined row repaired to " +
    "a pk the stream never applied is DISCARDED, not replayed over the " +
    "refreshed value; a post-refresh quarantine still replays (r9 review)") {
    val sinkRoot = tmpDir("sink-fence")
    val sync = SyncConfig("t", pk = "id", full = false,
      schema = Some(StructType(Seq(
        StructField("id", IntegerType), StructField("name", StringType)))))
    // the source-of-truth current state refresh() will snapshot
    val snapshot = Seq((1, "ann-live"), (7, "bob-current")).toDF("id", "name")
    val src = new MemoryCdcSource(spark, Map("t" -> snapshot))
    val pipe = new Pipeline(spark, PipelineConfig(Seq(sync)), src, sinkRoot)
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ckpt = tmpDir("ckpt-fence")
    src.addEvents(
      ChangeEvent("create", "t", 1, ts, """{"id": 1, "name": "ann"}"""),
      // bob's event is quarantined (null pk), so NO per-pk watermark entry
      // will ever exist for the pk it is later repaired to
      ChangeEvent("create", "t", 2, ts, """{"id": null, "name": "stale-bob"}"""))
    val q1 = pipe.start(ckpt)
    q1.processAllAvailable(); q1.stop()
    assert(pipe.sinkState(sync).collect().toSeq === Seq(Row(1, "ann")))

    // snapshot rebuild: the sink now holds the source's CURRENT truth, and
    // the floor covers everything observed so far (wm max 1, quarantine
    // max 2 => floor 2)
    assert(pipe.refresh() === Map("t" -> 2L))
    assert(OffsetWatermark.snapshotFloor(
      spark, s"$sinkRoot/${sync.indexName}") === 2L)
    assert(pipe.sinkState(sync).collect().map(r =>
      (r.getInt(0), r.getString(1))).toSet ===
      Set((1, "ann-live"), (7, "bob-current")))

    // operator repairs the pre-snapshot row to pk 7 — before this fix the
    // replay applied it (pk 7 has no per-pk entry) and clobbered bob-current
    val dl = pipe.deadLetterPath(sync)
    repairQuarantine(dl)(_.withColumn("id",
      when(col("name") === "stale-bob", lit(7)).otherwise(col("id"))))
    assert(pipe.replayDeadLetters() === Map("t" -> ((0L, 1L, 0L))),
      "the pre-snapshot payload is superseded by the snapshot")
    assert(pipe.sinkState(sync).collect().map(r =>
      (r.getInt(0), r.getString(1))).toSet ===
      Set((1, "ann-live"), (7, "bob-current")),
      "the refreshed value must survive the replay")

    // a quarantine that happens AFTER the snapshot replays normally
    src.addEvents(
      ChangeEvent("create", "t", 5, ts, """{"id": null, "name": "late"}"""))
    val q2 = pipe.start(ckpt)
    q2.processAllAvailable(); q2.stop()
    repairQuarantine(dl)(_.withColumn("id",
      when(col("name") === "late", lit(9)).otherwise(col("id"))))
    assert(pipe.replayDeadLetters() === Map("t" -> ((1L, 0L, 0L))),
      "offset 5 > floor 2: fresh")
    assert(pipe.sinkState(sync).collect().map(r =>
      (r.getInt(0), r.getString(1))).toSet ===
      Set((1, "ann-live"), (7, "bob-current"), (9, "late")))
  }

  test("end-to-end _ridx fence: a repaired row from a multi-row event " +
    "cannot clobber its applied same-offset sibling that won " +
    "last-write-wins") {
    val sinkRoot = tmpDir("sink-ridx")
    val sync = SyncConfig("t", pk = "id", schema = Some(StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType)))))
    val src = new MemoryCdcSource(spark)
    val pipe = new Pipeline(spark, PipelineConfig(Seq(sync)), src, sinkRoot)
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // ONE multi-row envelope at offset 7: row 0 has a null pk (quarantined),
    // row 1 applies to pk 1 — the LWW winner for offset 7
    src.addEvents(ChangeEvent("create", "t", 7, ts,
      """[{"id": null, "name": "row-zero"}, {"id": 1, "name": "row-one"}]"""))
    val q = pipe.start(tmpDir("ckpt-ridx"))
    q.processAllAvailable(); q.stop()
    assert(pipe.sinkState(sync).collect().toSeq === Seq(Row(1, "row-one")))
    // operator repairs row 0 to pk 1 — same offset, LOWER _ridx: superseded
    val dl = pipe.deadLetterPath(sync)
    repairQuarantine(dl)(_.withColumn("id", lit(1)))
    assert(pipe.replayDeadLetters() === Map("t" -> ((0L, 1L, 0L))),
      "the _ridx-0 repair must be discarded, not applied")
    assert(pipe.sinkState(sync).collect().toSeq === Seq(Row(1, "row-one")),
      "row-one (higher _ridx at the same offset) must survive")
  }

  test("a NULL _ridx (unparseable-array envelope kept by posexplode_outer) " +
    "is position 0: advance stores 0 and a crash-retried splitStale reads " +
    "the row as FRESH instead of dropping it from BOTH splits (r9 review)") {
    val statePath = tmpDir("wm-nullridx") + "/state"
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("offset", LongType), StructField("_ridx", IntegerType)))
    val row = spark.createDataFrame(
      java.util.Arrays.asList(Row(3, 11L, null)), schema)
    OffsetWatermark.advance(spark, statePath, row, "id", None)
    assert(wmOf(statePath) === Map(3 -> ((11L, 0))),
      "null _ridx must be stored as position 0, never as null")
    // crash-retry: the same row re-screened against the watermark it itself
    // advanced — the idempotent fresh case, NOT a three-valued vanish
    val (fresh, stale) = OffsetWatermark.splitStale(
      row, OffsetWatermark.current(spark, statePath), "id")
    assert(fresh.count() === 1L && stale.count() === 0L,
      "equal position (11, null==0) must re-read as fresh")
    // a same-offset sibling applied at a HIGHER _ridx supersedes it
    OffsetWatermark.advance(spark, statePath,
      Seq((3, 11L, 2)).toDF("id", "offset", "_ridx"), "id", None)
    val (f2, s2) = OffsetWatermark.splitStale(
      row, OffsetWatermark.current(spark, statePath), "id")
    assert(f2.count() === 0L && s2.count() === 1L,
      "null==0 must lose to the applied _ridx-2 sibling")
  }

  test("a pre-_ridx watermark store (r9 schema upgrade) reads and merges: " +
    "the first post-upgrade batch neither wedges on column resolution nor " +
    "poisons the position compares, in both layouts (r9 review)") {
    for (buckets <- Seq(None, Some(4))) {
      val statePath = tmpDir(s"wm-migrate-${buckets.isDefined}") + "/state"
      val dir = OffsetWatermark.path(statePath)
      val legacy = Seq((1, 10L), (2, 20L)).toDF("id", OffsetWatermark.OffsetCol)
      buckets match {
        case Some(n) => legacy
          .withColumn(BucketedUpsertSink.BucketCol,
            BucketedUpsertSink.bucketOf(col("id"), n))
          .write.partitionBy(BucketedUpsertSink.BucketCol).parquet(dir)
        case None => legacy.write.parquet(dir)
      }
      assert(wmOf(statePath) === Map(1 -> ((10L, 0)), 2 -> ((20L, 0))),
        s"legacy rows read as position (offset, 0) (buckets=$buckets)")
      // the merge leaves the store PARTIALLY migrated in the bucketed
      // layout (untouched buckets keep the old schema) — reads must still
      // see every row's position
      OffsetWatermark.advance(spark, statePath,
        Seq((1, 10L, 2), (3, 30L, 0)).toDF("id", "offset", "_ridx"),
        "id", buckets)
      assert(wmOf(statePath) ===
        Map(1 -> ((10L, 2)), 2 -> ((20L, 0)), 3 -> ((30L, 0))),
        s"post-upgrade merge over a legacy store (buckets=$buckets)")
    }
  }

  test("snapshot floor is MONOTONE: a later rebuild with a lower " +
    "recomputed ceiling (a replay purged the quarantine since) cannot " +
    "re-open the fence (r9 review)") {
    val statePath = tmpDir("wm-floormax") + "/state"
    OffsetWatermark.recordSnapshotFloor(spark, statePath, 70L)
    OffsetWatermark.recordSnapshotFloor(spark, statePath, 50L)
    assert(OffsetWatermark.snapshotFloor(spark, statePath) === 70L,
      "a lower floor must not regress the committed one")
    OffsetWatermark.recordSnapshotFloor(spark, statePath, 90L)
    assert(OffsetWatermark.snapshotFloor(spark, statePath) === 90L)
  }

  test("floor heal: main absent with several crash temps installs the " +
    "max-valued COMPLETE temp; an empty in-flight temp is skipped, not " +
    "resurrected (r9 review: a reader renaming a writer's visible empty " +
    "temp live crashed both sides)") {
    val statePath = tmpDir("wm-floorheal") + "/state"
    val base = OffsetWatermark.floorPath(statePath)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base + ".next.111-aaaa"), "60".getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base + ".next.222-bbbb"), "75".getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base + ".next.333-cccc"), Array.empty[Byte])
    assert(OffsetWatermark.snapshotFloor(spark, statePath) === 75L,
      "heal must install the max-valued complete temp")
    assert(new java.io.File(base).exists(), "main must exist after the heal")
    assert(new java.io.File(base + ".next.333-cccc").exists(),
      "an in-flight empty temp belongs to its writer and is left alone")
  }

  test("concurrent floor writers (the refreshAsync overlap) serialize: " +
    "interleaved recordSnapshotFloor calls never tear, erase, or regress " +
    "the fence — the committed floor is the max of all writers") {
    val statePath = tmpDir("wm-floorrace") + "/state"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val floors = scala.util.Random.shuffle((1 to 40).map(_ * 10L).toList)
    val futures = floors.map { f =>
      pool.submit(new Runnable {
        def run(): Unit = OffsetWatermark.recordSnapshotFloor(spark, statePath, f)
      })
    }
    pool.shutdown()
    futures.foreach(_.get()) // surface any writer exception
    assert(pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS))
    assert(OffsetWatermark.snapshotFloor(spark, statePath) === 400L)
  }

  test("a repaired UNPARSEABLE-payload row replays as fresh and a " +
    "crash-retry re-screens it idempotently instead of reporting (0,0) " +
    "while it sits invisible in quarantine (r9 review)") {
    val sinkRoot = tmpDir("sink-nullridx")
    val sync = SyncConfig("t", pk = "id", schema = Some(StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType)))))
    val src = new MemoryCdcSource(spark)
    val pipe = new Pipeline(spark, PipelineConfig(Seq(sync)), src, sinkRoot)
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    src.addEvents(
      ChangeEvent("create", "t", 1, ts, """{"id": 1, "name": "ann"}"""),
      // array-SHAPED but unparseable: from_json yields a null __rows array,
      // and posexplode_outer keeps it as a (_ridx NULL, row NULL) row — the
      // only decode shape that quarantines with a null position
      ChangeEvent("create", "t", 3, ts, """[ totally not json"""))
    val q = pipe.start(tmpDir("ckpt-nullridx"))
    q.processAllAvailable(); q.stop()
    assert(pipe.sinkState(sync).collect().toSeq === Seq(Row(1, "ann")))
    val dl = pipe.deadLetterPath(sync)
    assert(spark.read.parquet(dl).select("_ridx").collect().head.isNullAt(0),
      "precondition: the unparseable envelope quarantines with NULL _ridx")
    val repaired = repairQuarantine(dl)(_.withColumn("id", lit(5)))
    assert(pipe.replayDeadLetters() === Map("t" -> ((1L, 0L, 0L))),
      "the repaired null-_ridx row must replay as fresh")
    // crash-retry: the same repaired rows land back in quarantine (crash
    // after writeCompacted, before the rewrite swap) — the re-screen is the
    // idempotent equal-position fresh case, never a silent (0,0) strand
    repaired.write.mode("overwrite").parquet(dl)
    assert(pipe.replayDeadLetters() === Map("t" -> ((1L, 0L, 0L))),
      "equal-position re-apply is the idempotent fresh case")
  }

  test("a replay hammering a LIVE stream serializes on the state lock: no " +
    "live update and no repaired row is lost to a concurrent " +
    "read-merge-write (r9 review: two complete copies racing a swap meant " +
    "last-copy-wins silently dropped the loser's rows)") {
    val sinkRoot = tmpDir("sink-racelock")
    val sync = SyncConfig("t", pk = "id", schema = Some(StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType)))))
    val src = new MemoryCdcSource(spark)
    val pipe = new Pipeline(spark, PipelineConfig(Seq(sync)), src, sinkRoot)
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // wave 1: creates for pks 1..20 + 10 quarantined (null pk) envelopes
    (1 to 20).foreach(i => src.addEvents(
      ChangeEvent("create", "t", i.toLong, ts, s"""{"id": $i, "name": "v0"}""")))
    (1 to 10).foreach(i => src.addEvents(
      ChangeEvent("create", "t", 20L + i, ts,
        s"""{"id": null, "name": "q$i"}""")))
    val ckpt = tmpDir("ckpt-racelock")
    val q1 = pipe.start(ckpt)
    q1.processAllAvailable(); q1.stop()
    // operator repairs the quarantine to fresh pks 101..110
    val dl = pipe.deadLetterPath(sync)
    repairQuarantine(dl)(_.withColumn("id",
      (lit(100) + regexp_extract(col("name"), "q(\\d+)", 1).cast("int"))
        .cast("int")))
    // hammer: replays loop in one thread while the stream applies updates
    val freshTotal = new java.util.concurrent.atomic.AtomicLong()
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val replayer = new Thread(() => {
      try (1 to 5).foreach { _ =>
        freshTotal.addAndGet(pipe.replayDeadLetters()("t")._1); ()
      } catch { case t: Throwable => failed.set(t) }
    }, "replay-hammer")
    (1 to 20).foreach(i => src.addEvents(
      ChangeEvent("update", "t", 30L + i, ts,
        s"""{"id": $i, "name": "v1"}""")))
    val q2 = pipe.start(ckpt)
    replayer.start()
    q2.processAllAvailable()
    replayer.join(120000)
    // a join timeout is a DEADLOCK diagnosis (review r11): proceeding
    // with a live replayer would race the assertions below on freshTotal
    // and the sink state
    assert(!replayer.isAlive,
      "replay hammer did not finish — replayDeadLetters wedged on the state lock")
    q2.stop()
    assert(failed.get() === null, s"replay must never throw: ${failed.get()}")
    assert(freshTotal.get() === 10L,
      "each repaired row replays fresh exactly once across the loop")
    val state = pipe.sinkState(sync).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert((1 to 20).forall(i => state.get(i).contains("v1")),
      s"every live update must survive the replay race: $state")
    assert((1 to 10).forall(i => state.get(100 + i).contains(s"q$i")),
      s"every repaired row must survive the live-update race: $state")
  }

  test("replayDeadLetters heals an interrupted quarantine rewrite: a crash " +
    "between the swap's two renames must not make every envelope silently " +
    "invisible (r9 review)") {
    val sinkRoot = tmpDir("sink-dlheal")
    val sync = SyncConfig("t", pk = "id", schema = Some(StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType)))))
    val src = new MemoryCdcSource(spark)
    val pipe = new Pipeline(spark, PipelineConfig(Seq(sync)), src, sinkRoot)
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    src.addEvents(
      ChangeEvent("create", "t", 2, ts, """{"id": null, "name": "lost"}"""))
    val q = pipe.start(tmpDir("ckpt-dlheal"))
    q.processAllAvailable(); q.stop()
    val dl = pipe.deadLetterPath(sync)
    assert(pipe.replayDeadLetters() === Map("t" -> ((0L, 0L, 1L))),
      "precondition: one unrepaired envelope")
    // simulate the crash window: quarantine sits only at `.old`
    assert(new java.io.File(dl).renameTo(new java.io.File(dl + ".old")))
    assert(pipe.replayDeadLetters() === Map("t" -> ((0L, 0L, 1L))),
      "the probe must heal the swap and still see the envelope")
    assert(new java.io.File(dl).exists() &&
      !new java.io.File(dl + ".old").exists(),
      "the heal must restore the quarantine dir on disk")
  }

  test("advance: layout migration — a FLAT sidecar under a newly-bucketed " +
    "config is rewritten bucketed once instead of wedging on the missing " +
    "_bucket column, and vice versa (ADVICE r9)") {
    // flat -> bucketed
    val s1 = tmpDir("wm-mig-fb") + "/state"
    OffsetWatermark.advance(spark, s1,
      Seq((1, 10L, 0), (2, 20L, 0)).toDF("id", "offset", "_ridx"), "id", None)
    OffsetWatermark.advance(spark, s1,
      Seq((2, 25L, 0), (3, 30L, 0)).toDF("id", "offset", "_ridx"), "id", Some(4))
    assert(wmOf(s1) === Map(1 -> ((10L, 0)), 2 -> ((25L, 0)), 3 -> ((30L, 0))),
      "the migrated store must merge old flat entries with the new batch")
    val dir1 = new java.io.File(OffsetWatermark.path(s1))
    assert(dir1.listFiles().exists(_.getName.startsWith(
      BucketedUpsertSink.BucketCol + "=")),
      "after migration the store must be laid out bucketed")
    // and the NEXT bucketed batch takes the normal pruned path
    OffsetWatermark.advance(spark, s1,
      Seq((1, 40L, 0)).toDF("id", "offset", "_ridx"), "id", Some(4))
    assert(wmOf(s1) === Map(1 -> ((40L, 0)), 2 -> ((25L, 0)), 3 -> ((30L, 0))))

    // bucketed -> flat
    val s2 = tmpDir("wm-mig-bf") + "/state"
    OffsetWatermark.advance(spark, s2,
      Seq((1, 10L, 0), (2, 20L, 0)).toDF("id", "offset", "_ridx"), "id", Some(4))
    OffsetWatermark.advance(spark, s2,
      Seq((2, 25L, 0), (3, 30L, 0)).toDF("id", "offset", "_ridx"), "id", None)
    assert(wmOf(s2) === Map(1 -> ((10L, 0)), 2 -> ((25L, 0)), 3 -> ((30L, 0))))
    val dir2 = new java.io.File(OffsetWatermark.path(s2))
    assert(!dir2.listFiles().exists(_.getName.startsWith(
      BucketedUpsertSink.BucketCol + "=")),
      "after migration the store must be laid out flat")
    assert(OffsetWatermark.current(spark, s2).get.columns.toSet ===
      Set("id", OffsetWatermark.OffsetCol, OffsetWatermark.RidxCol))
  }
}
