package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sink layout transitions (review r11): the bucketed sink must survive
  * the two config changes a deployment actually makes — flipping
  * `state.buckets` ON over an existing flat store, and changing the
  * bucket COUNT — without silently dropping or duplicating rows; and the
  * refresh staging path must survive an empty source table. */
class SinkLayoutSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("op", StringType), StructField("id", IntegerType),
    StructField("v", StringType)))
  private val payload = StructType(Seq(
    StructField("id", IntegerType), StructField("v", StringType)))

  private def creates(rows: (Int, String)*) =
    rows.map { case (i, v) => ("create", i, v) }.toDF("op", "id", "v")

  test("flipping state.buckets ON over an existing FLAT store migrates it " +
    "(full merge + bucketed rewrite + layout marker) instead of merging " +
    "against empty and stranding the flat files") {
    val statePath = tmpDir("layout-flip") + "/t"
    // flat era: plain parquet state, the UpsertSink layout
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
      .write.parquet(statePath)
    // bucketed era: first batch updates id 1, creates id 9
    BucketedUpsertSink.applyBatch(spark, statePath,
      creates((9, "new")).unionByName(
        Seq(("update", 1, "a2")).toDF("op", "id", "v")),
      "id", numBuckets = 4, schema = Some(payload))
    val state = spark.read.parquet(statePath)
      .drop(BucketedUpsertSink.BucketCol)
      .orderBy("id").collect().toSeq
    assert(state === Seq(Row(1, "a2"), Row(2, "b"), Row(3, "c"), Row(9, "new")),
      s"the pre-flip rows must survive the migration: $state")
    val names = new java.io.File(statePath).listFiles().map(_.getName)
    assert(names.exists(_.startsWith("_bucket=")), "layout must be bucketed")
    assert(!names.exists(n => n.endsWith(".parquet") && !n.startsWith("_")),
      s"no stranded flat part files: ${names.mkString(",")}")
    assert(names.contains("_nbuckets-4"), "the modulus marker must be written")
    // and the next incremental batch works against the migrated layout
    BucketedUpsertSink.applyBatch(spark, statePath,
      Seq(("delete", 2, null: String)).toDF("op", "id", "v"),
      "id", numBuckets = 4, schema = Some(payload))
    assert(spark.read.parquet(statePath).count() === 3L)
  }

  test("changing the bucket COUNT on an existing bucketed store fails LOUD " +
    "naming refresh (a pruned merge under the new modulus would duplicate " +
    "pks); a marker-less legacy store adopts the configured modulus") {
    val statePath = tmpDir("layout-count") + "/t"
    BucketedUpsertSink.init(Seq((1, "a"), (2, "b")).toDF("id", "v"),
      statePath, "id", numBuckets = 4)
    val e = intercept[IllegalStateException] {
      BucketedUpsertSink.applyBatch(spark, statePath, creates((3, "c")),
        "id", numBuckets = 8, schema = Some(payload))
    }
    assert(e.getMessage.contains("4 buckets") &&
      e.getMessage.contains("refresh"), e.getMessage)
    // legacy store: strip the marker; the next same-modulus batch adopts it
    assert(new java.io.File(s"$statePath/_nbuckets-4").delete())
    BucketedUpsertSink.applyBatch(spark, statePath, creates((3, "c")),
      "id", numBuckets = 4, schema = Some(payload))
    assert(new java.io.File(s"$statePath/_nbuckets-4").exists(),
      "a marker-less store must adopt the configured modulus")
    assert(spark.read.parquet(statePath).count() === 3L)
  }

  test("a TYPE change in an existing column takes the full-rewrite " +
    "evolution path, not the per-bucket path that would write mixed " +
    "physical types across bucket dirs") {
    val statePath = tmpDir("layout-type") + "/t"
    BucketedUpsertSink.init(Seq((1, 10), (2, 20)).toDF("id", "v"),
      statePath, "id", numBuckets = 4)
    // v arrives as LONG now (source widened the column)
    BucketedUpsertSink.applyBatch(spark, statePath,
      Seq(("create", 3, 30L)).toDF("op", "id", "v"),
      "id", numBuckets = 4, schema = None)
    // every bucket dir must carry ONE consistent physical type: an
    // unpruned read (no mergeSchema) succeeds and sees all rows
    val state = spark.read.parquet(statePath)
      .drop(BucketedUpsertSink.BucketCol).orderBy("id")
    assert(state.count() === 3L)
    assert(state.schema("v").dataType === LongType,
      s"the widened type must win everywhere: ${state.schema}")
  }

  test("the watermark sidecar migrates a changed bucket modulus (full " +
    "merge + rewrite) instead of pruning with new ids over old dirs and " +
    "minting duplicate pk entries") {
    val statePath = tmpDir("layout-wm") + "/t"
    def batch(id: Int, off: Long) =
      Seq((id, off, 0)).toDF("id", "offset", "_ridx")
    OffsetWatermark.advance(spark, statePath, batch(1, 10L), "id", Some(4))
    OffsetWatermark.advance(spark, statePath, batch(1, 20L), "id", Some(8))
    val wm = OffsetWatermark.current(spark, statePath).get
      .orderBy("id").collect()
    assert(wm.length === 1,
      s"one entry per pk after the modulus migration, got ${wm.toSeq}")
    assert(wm.head.getAs[Long](OffsetWatermark.OffsetCol) === 20L,
      "the migrated entry must carry the max position")
    val names = new java.io.File(OffsetWatermark.path(statePath))
      .listFiles().map(_.getName)
    assert(names.contains("_nbuckets-8"),
      s"the sidecar must record the new modulus: ${names.mkString(",")}")
  }

  test("staging an EMPTY snapshot with a bucketed layout returns count 0 " +
    "instead of crashing on schema inference over zero data files") {
    val live = tmpDir("layout-empty") + "/t"
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], payload)
    val (staging, n) = SwapRefresh.stage(empty, live, Some(("id", 4)))
    assert(n === 0L)
    StateCommit.dropStaging(spark, staging)
    // and the full refresh of an empty source swaps an empty sink live
    assert(SwapRefresh.refresh(empty, live, Some(("id", 4))) === 0L)
  }

  test("a repaired dead-letter row with a NULL offset fails the replay " +
    "LOUD instead of being deleted from quarantine unapplied") {
    import graft.model._
    val sinkRoot = tmpDir("layout-nulloff")
    val sync = SyncConfig("t", pk = "id", schema = Some(StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType)))))
    val src = new MemoryCdcSource(spark)
    val pipe = new Pipeline(spark, PipelineConfig(Seq(sync)), src, sinkRoot)
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    src.addEvents(
      ChangeEvent("create", "t", 1, ts, """{"id": 1, "v": "a"}"""),
      ChangeEvent("create", "t", 2, ts, """{"id": null, "v": "broken"}"""))
    val q = pipe.start(tmpDir("layout-nulloff-ckpt"))
    q.processAllAvailable(); q.stop()
    val dl = pipe.deadLetterPath(sync)
    // operator repair that also nulls the offset (hand-edited parquet)
    val repaired = spark.read.parquet(dl)
      .withColumn("id", lit(7))
      .withColumn("offset", lit(null).cast("long"))
      .localCheckpoint(true)
    repaired.write.mode("overwrite").parquet(dl)
    val e = intercept[IllegalArgumentException] { pipe.replayDeadLetters() }
    assert(e.getMessage.contains("NULL offset"), e.getMessage)
    // nothing was deleted: the quarantined envelope is still there
    assert(spark.read.parquet(dl).count() === 1L)
    pipe.releaseLeases()
  }
}
