package graft

import graft.cdc.Transforms
import graft.model._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  test("datetime -> epoch-seconds coercion matches the reference's pinned value") {
    // reference tests/test_mysql.py:24-30: '1977-01-27 22:00:53' -> 223250453
    val df = Seq("1977-01-27 22:00:53").toDF("t")
      .select(Transforms.coerceTimestampToEpoch(col("t").cast("timestamp")).as("e"))
    assert(df.head().getLong(0) === 223250453L)
  }

  test("date -> string coercion") {
    val df = Seq("1977-01-27").toDF("d")
      .select(Transforms.coerceDateToString(col("d").cast("date")).as("s"))
    assert(df.head().getString(0) === "1977-01-27")
  }

  test("projectAndCoerce: rename + coercion + SELECT * fallback") {
    val df = Seq((1, "a", java.sql.Timestamp.valueOf("1977-01-27 22:00:53")))
      .toDF("id", "name", "time")
    val sync = SyncConfig("t", pk = "id",
      fields = Seq(FieldMapping("id"), FieldMapping("time", Some("ts_epoch"))))
    val out = Transforms.projectAndCoerce(df, sync)
    assert(out.columns.toSeq === Seq("id", "ts_epoch"))
    assert(out.head() === Row(1, 223250453L))
    // empty fields => keep everything (reference SELECT *), coercing types
    val all = Transforms.projectAndCoerce(df, SyncConfig("t"))
    assert(all.columns.toSeq === Seq("id", "name", "time"))
    assert(all.head().getLong(2) === 223250453L)
  }

  test("table and op filters") {
    val events = Seq(
      ChangeEvent("create", "a", 1, null, "{}"),
      ChangeEvent("noise", "a", 2, null, "{}"),
      ChangeEvent("create", "b", 3, null, "{}")).toDF()
    assert(Transforms.tableFilter(events, Seq("a")).count() === 2)
    assert(Transforms.opFilter(Transforms.tableFilter(events, Seq("a"))).count() === 1)
  }

  test("lastWriteWins keeps exactly the highest-offset event per (table, pk)") {
    val events = Seq(
      ChangeEvent("create", "t", 1, null, """{"id":1,"v":"old"}"""),
      ChangeEvent("update", "t", 5, null, """{"id":1,"v":"new"}"""),
      ChangeEvent("create", "t", 2, null, """{"id":2,"v":"only"}"""),
      ChangeEvent("create", "u", 9, null, """{"id":1,"v":"other-table"}""")).toDF()
      .withColumn("pk", get_json_object(col("data"), "$.id"))
    val out = Transforms.lastWriteWins(events, col("pk"))
    assert(out.count() === 3)
    val kept = out.filter(col("table") === "t" && col("pk") === "1").head()
    assert(kept.getAs[Long]("offset") === 5L)
  }
}
