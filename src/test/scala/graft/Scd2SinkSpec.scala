package graft

import graft.cdc.Scd2Sink
import graft.ops.{Relational, Tables}
import org.apache.spark.sql.functions._

class Scd2SinkSpec extends SparkSpec {


  /** The shared two-batch percentile split of the events feed (review
    * r11: two tests carried byte-identical copies of this block). */
  private def splitBatches(): (org.apache.spark.sql.DataFrame,
                               org.apache.spark.sql.DataFrame) = {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val cut = ev.agg(expr("percentile(unix_timestamp(ts), 0.5)"))
      .head().getDouble(0).toLong
    (ev.filter(unix_timestamp(col("ts")) <= cut),
      ev.filter(unix_timestamp(col("ts")) > cut))
  }

  test("incremental SCD2 over two batches equals the one-shot materialization") {
    val dir = tmpDir("scd2sink") + "/state"
    val (b1, b2) = splitBatches()
    Scd2Sink.applyBatch(spark, dir, b1, "user_id", "event_id", "ts")
    Scd2Sink.applyBatch(spark, dir, b2, "user_id", "event_id", "ts")
    val gotRows = Scd2Sink.read(spark, dir)
      .select(col("user_id"), col("event_id").as("version_id"),
        col("valid_from"), col("valid_to"), col("is_current"),
        round(col("value"), 2).as("value"))
      .collect().map(_.toSeq)
    val want = Relational.scd2(spark, sf).collect().map(_.toSeq).toSet
    // count first: Set comparison alone would hide duplicated history rows
    assert(gotRows.length === want.size, "no duplicate history rows")
    assert(gotRows.toSet === want)
  }

  test("at-least-once replay of an applied batch is a no-op") {
    val dir = tmpDir("scd2replay") + "/state"
    val (b1, b2) = splitBatches()
    Scd2Sink.applyBatch(spark, dir, b1, "user_id", "event_id", "ts")
    Scd2Sink.applyBatch(spark, dir, b2, "user_id", "event_id", "ts")
    val once = Scd2Sink.read(spark, dir).collect().map(_.toSeq).toSet
    // crash-after-swap-before-checkpoint: the sink sees the batch again —
    // must neither fail the order guard nor duplicate/zero-length anything
    Scd2Sink.applyBatch(spark, dir, b2, "user_id", "event_id", "ts")
    // Set equality hides duplicates — also pin the ROW COUNT (review r11:
    // a replay that appended every b2 history row a second time would
    // collapse to the same Set)
    assert(Scd2Sink.read(spark, dir).count() === once.size.toLong)
    val twice = Scd2Sink.read(spark, dir).collect().map(_.toSeq).toSet
    assert(twice === once)
  }

  test("a NULL event time is rejected up front, naming the column " +
    "(review r11: a committed null-ts row's replay was never recognized " +
    "by the null-unsafe anti-join and wedged the stream permanently)") {
    import spark.implicits._
    val dir = tmpDir("scd2nullts") + "/state"
    val ok = Seq((1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
      .toDF("user_id", "event_id", "ts", "value")
    Scd2Sink.applyBatch(spark, dir, ok, "user_id", "event_id", "ts")
    val withNull = Seq(
      (1L, 11L, Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:01")), 2.0),
      (2L, 20L, None, 3.0))
      .toDF("user_id", "event_id", "ts", "value")
    val err = intercept[IllegalArgumentException](
      Scd2Sink.applyBatch(spark, dir, withNull, "user_id", "event_id", "ts"))
    assert(err.getMessage.contains("NULL ts"), err.getMessage)
    // state intact: the poisoned batch wrote nothing
    assert(Scd2Sink.read(spark, dir).count() === 1L)
  }

  test("version-id reuse with a different timestamp is a conflict, not a replay") {
    val dir = tmpDir("scd2conflict") + "/state"
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .orderBy(col("ts")).limit(100)
    Scd2Sink.applyBatch(spark, dir, ev, "user_id", "event_id", "ts")
    val before = Scd2Sink.read(spark, dir).count()
    // same (key, version) ids, shifted timestamps: corruption-in-the-making
    val reused = ev.withColumn("ts",
      (col("ts").cast("long") + 864000L).cast("timestamp"))
    val ex = intercept[IllegalArgumentException] {
      Scd2Sink.applyBatch(spark, dir, reused, "user_id", "event_id", "ts")
    }
    assert(ex.getMessage.contains("reuse"))
    assert(Scd2Sink.read(spark, dir).count() === before)
  }

  test("intra-batch: exact duplicate rows collapse, same-triple different " +
    "payload is a conflict") {
    import spark.implicits._
    val dir = tmpDir("scd2intra") + "/state"
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // the same event delivered twice inside one batch — a replay, applies
    // as one version row
    val replay = Seq((1L, 10L, t0, "a"), (1L, 10L, t0, "a"))
      .toDF("user_id", "event_id", "ts", "v")
    Scd2Sink.applyBatch(spark, dir, replay, "user_id", "event_id", "ts")
    assert(Scd2Sink.read(spark, dir).count() === 1)
    // same (key, version, ts) but DIFFERENT payloads in one batch: two
    // distinct events under one version id — must fail loudly, never pick
    // a nondeterministic winner
    val dir2 = tmpDir("scd2intra2") + "/state"
    val conflict = Seq((1L, 10L, t0, "a"), (1L, 10L, t0, "b"))
      .toDF("user_id", "event_id", "ts", "v")
    val ex = intercept[IllegalArgumentException] {
      Scd2Sink.applyBatch(spark, dir2, conflict, "user_id", "event_id", "ts")
    }
    assert(ex.getMessage.contains("more than once within"))
    // same-key different-version at one ts stays legal (ordered by version)
    val dir3 = tmpDir("scd2intra3") + "/state"
    val legal = Seq((1L, 10L, t0, "a"), (1L, 11L, t0, "b"))
      .toDF("user_id", "event_id", "ts", "v")
    Scd2Sink.applyBatch(spark, dir3, legal, "user_id", "event_id", "ts")
    assert(Scd2Sink.read(spark, dir3).count() === 2)
  }

  test("out-of-replication-order batch is rejected loudly, state intact") {
    val dir = tmpDir("scd2bad") + "/state"
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val late = ev.orderBy(col("ts")).limit(50)     // oldest events
    val early = ev.orderBy(col("ts").desc).limit(50) // newest events
    Scd2Sink.applyBatch(spark, dir, early, "user_id", "event_id", "ts")
    val before = Scd2Sink.read(spark, dir).count()
    val ex = intercept[IllegalArgumentException] {
      Scd2Sink.applyBatch(spark, dir, late, "user_id", "event_id", "ts")
    }
    assert(ex.getMessage.contains("replication order"))
    assert(Scd2Sink.read(spark, dir).count() === before) // nothing half-applied
  }
}
