package graft

import graft.cdc.{Transforms, UpsertSink}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private def state(rows: (Int, String, String)*) =
    rows.toDF("id", "name", "city")

  private def changes(rows: (String, Integer, String, String)*) =
    rows.toDF("op", "id", "name", "city")

  test("create inserts, update overwrites changed fields, delete removes") {
    val s0 = state((1, "ann", "nyc"), (2, "bob", "sf"))
    val batch = changes(
      ("create", 3, "cat", "la"),
      ("update", 1, "anne", null), // partial update: city absent
      ("delete", 2, null, null))
    val out = UpsertSink.applyBatch(s0, batch, "id")
      .orderBy("id").collect().toSeq
    assert(out === Seq(Row(1, "anne", "nyc"), Row(3, "cat", "la")))
  }

  test("partial update preserves untouched columns (Mongo update semantics)") {
    // reference mongo.py:64: update events carry ONLY changed fields
    val s0 = state((7, "old-name", "tokyo"))
    val out = UpsertSink.applyBatch(s0, changes(("update", 7, null, "osaka")), "id")
    assert(out.head() === Row(7, "old-name", "osaka"))
  }

  test("applying the same batch twice is idempotent (at-least-once safety)") {
    val s0 = state((1, "ann", "nyc"))
    val batch = changes(("update", 1, "anne", null), ("create", 2, "bob", "sf"))
    val once = UpsertSink.applyBatch(s0, batch, "id")
    val twice = UpsertSink.applyBatch(once, batch, "id")
    assert(once.orderBy("id").collect().toSeq === twice.orderBy("id").collect().toSeq)
  }

  test("presence mask: explicit NULL overwrites, absent field keeps old value") {
    // ADVICE r01: with coalesce, an update could never null a column; the
    // _present mask distinguishes explicit-null from absent (json keys)
    val s0 = state((1, "ann", "nyc"), (2, "bob", "sf"))
    val batch = changes(
      ("update", 1, null, null),  // name explicitly nulled, city absent
      ("update", 2, "bobby", null)) // name changed, city absent
      .withColumn("_present", array(lit("id"), lit("name")))
    val out = UpsertSink.applyBatch(s0, batch, "id").orderBy("id").collect().toSeq
    assert(out === Seq(Row(1, null, "nyc"), Row(2, "bobby", "sf")))
  }

  test("presence mask: create replaces the whole document (add_documents)") {
    val s0 = state((5, "old", "berlin"))
    val batch = changes(("create", 5, "new", null))
      .withColumn("_present", array(lit("id"), lit("name")))
    // replace semantics: city not carried by the create -> null, not 'berlin'
    val out = UpsertSink.applyBatch(s0, batch, "id").collect().toSeq
    assert(out === Seq(Row(5, "new", null)))
  }

  test("interrupted swap recovers the pre-batch state on next read") {
    // simulate the crash window: live moved aside to .old, next never moved in
    val root = tmpDir("swapcrash")
    val live = s"$root/t"
    state((1, "ann", "nyc")).write.parquet(live)
    state((1, "ann", "paris")).write.parquet(live + ".next")
    import java.nio.file.{Files, Paths}
    Files.move(Paths.get(live), Paths.get(live + ".old"))
    assert(!Files.exists(Paths.get(live)))
    val recovered = UpsertSink.currentState(spark, live,
      state().schema)
    assert(recovered.collect().toSeq === Seq(Row(1, "ann", "nyc")))
    assert(Files.exists(Paths.get(live))) // healed on disk, not just in-memory
  }

  test("create -> update -> delete on one pk within a batch nets to absence") {
    // reference event.py:10-13 last-write-wins, then delete applies
    val evs = Seq(
      ("create", 1, 10L), ("update", 1, 11L), ("delete", 1, 12L),
      ("create", 2, 13L)).toDF("op", "id", "offset")
      .withColumn("table", lit("t")).withColumn("name", lit("x"))
    val compacted = Transforms.lastWriteWins(evs, col("id"))
    val out = UpsertSink.applyBatch(Seq.empty[(Int, String)].toDF("id", "name"),
      compacted.select("op", "id", "name"), "id")
    assert(out.select("id").as[Int].collect().toSeq === Seq(2))
  }
}
