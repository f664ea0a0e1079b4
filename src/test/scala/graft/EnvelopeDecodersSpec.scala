package graft

import graft.cdc.EnvelopeDecoders
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Connector-wire-shape decoders. Sample payloads follow the documented
  * wire formats of the reference's three connectors (wal2json change
  * arrays, decoded binlog row events, Mongo change-stream documents) —
  * including the malformed corners the reference mishandles (SURVEY §2.3).
  */
class EnvelopeDecodersSpec extends SparkSpec {

  /** Exception text across the FULL cause chain (review r11: Spark wraps
    * task-side guard failures in a varying number of layers across
    * execution paths; one-level walks failed spuriously). */
  private def msgOf(t: Throwable): String = {
    val b = new StringBuilder
    var cur: Throwable = t
    val seen = scala.collection.mutable.Set.empty[Throwable]
    while (cur != null && seen.add(cur)) {
      b.append(Option(cur.getMessage).getOrElse("")).append('|')
      cur = cur.getCause
    }
    b.toString
  }
  import spark.implicits._

  test("wal2json: a multi-table transaction decodes every change (no truncation)") {
    // reference postgres.py:97-98 `return`s on the first non-synced table,
    // dropping the rest of the transaction; here all three survive decode
    // and F1 filtering happens downstream
    val msg =
      """{"change":[
        |{"kind":"insert","schema":"public","table":"other","columnnames":["id"],"columnvalues":[9]},
        |{"kind":"insert","schema":"public","table":"test","columnnames":["id","content","data_json"],"columnvalues":[1,"hello",{"name":"test data"}]},
        |{"kind":"delete","schema":"public","table":"test","oldkeys":{"keynames":["id"],"keyvalues":[2]}}
        |],"nextlsn":"0/16B6E60"}""".stripMargin.replace("\n", "")
    val out = EnvelopeDecoders.decodeWal2json(Seq((msg, 7L)).toDF("data", "offset"))
      .orderBy("_ridx").collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[String]("table")).toSeq === Seq("other", "test", "test"))
    assert(out.map(_.getAs[String]("op")).toSeq === Seq("create", "create", "delete"))
    assert(out.map(_.getAs[Int]("_ridx")).toSeq === Seq(0, 1, 2))
    // type fidelity: ints stay ints, nested JSON stays an object
    assert(out(1).getAs[String]("data") ===
      """{"id":1,"content":"hello","data_json":{"name":"test data"}}""")
    // deletes carry only the key (oldkeys)
    assert(out(2).getAs[String]("data") === """{"id":2}""")
    assert(out.forall(_.getAs[String]("nextlsn") === "0/16B6E60"))
    assert(out.forall(_.getAs[Long]("offset") === 7L))
  }

  test("wal2json: informational kinds drop without killing the rest of " +
    "the message; TRUNCATE fails loudly naming the repair (review r11: " +
    "silently dropping a data-affecting truncate left the sink holding " +
    "every truncated row — the posture the debezium decoder already had)") {
    val msg =
      """{"change":[
        |{"kind":"message","schema":"public","table":"test"},
        |{"kind":"update","schema":"public","table":"test","columnnames":["id","v"],"columnvalues":[3,4.5]}
        |],"nextlsn":"0/1"}""".stripMargin.replace("\n", "")
    val out = EnvelopeDecoders.decodeWal2json(Seq((msg, 1L)).toDF("data", "offset")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("op") === "update")
    assert(out.head.getAs[String]("data") === """{"id":3,"v":4.5}""")
    val trunc =
      """{"change":[{"kind":"truncate","schema":"public","table":"test"}],"nextlsn":"0/1"}"""
    val e = intercept[Exception] {
      EnvelopeDecoders.decodeWal2json(Seq((trunc, 2L)).toDF("data", "offset")).collect()
    }
    assert(msgOf(e).contains("TRUNCATE") || msgOf(e).contains("undecodable"),
      s"truncate must fail loud naming the repair: ${msgOf(e)}")
  }

  test("mysql binlog: a multi-row write expands to every row, later rows win ties") {
    // reference mysql.py:110-116 reads only rows[0]
    val msg =
      """{"schema":"db","table":"test","type":"write","rows":[
        |{"values":{"id":1,"age":46}},
        |{"values":{"id":2,"age":31}},
        |{"values":{"id":1,"age":47}}
        |]}""".stripMargin.replace("\n", "")
    val out = EnvelopeDecoders.decodeMysqlBinlog(Seq((msg, 3L)).toDF("data", "offset"))
      .orderBy("_ridx").collect()
    assert(out.length === 3)
    // note: VARIANT serialization normalizes object keys to sorted order —
    // same JSON value, different key order than the wire form
    assert(out.map(_.getAs[String]("data")).toSeq === Seq(
      """{"age":46,"id":1}""", """{"age":31,"id":2}""", """{"age":47,"id":1}"""))
    // last-write-wins with the _ridx tiebreak keeps the LATER row for id=1
    val env = EnvelopeDecoders.decodeMysqlBinlog(Seq((msg, 3L)).toDF("data", "offset"))
      .withColumn("id", get_json_object(col("data"), "$.id").cast("int"))
    val compacted = graft.cdc.Transforms.lastWriteWins(env, col("id"), Seq(col("_ridx")))
    val age1 = compacted.filter(col("id") === 1)
      .select(get_json_object(col("data"), "$.age")).head().getString(0)
    assert(age1 === "47")
  }

  test("mysql binlog: update rows carry the after-image, deletes the old row") {
    val upd = """{"schema":"db","table":"t","type":"update","rows":[{"before_values":{"id":5,"v":1},"after_values":{"id":5,"v":2}}]}"""
    val del = """{"schema":"db","table":"t","type":"delete","rows":[{"values":{"id":6,"v":9}}]}"""
    val out = EnvelopeDecoders.decodeMysqlBinlog(
      Seq((upd, 1L), (del, 2L)).toDF("data", "offset")).orderBy("offset").collect()
    assert(out(0).getAs[String]("op") === "update")
    assert(out(0).getAs[String]("data") === """{"id":5,"v":2}""")
    assert(out(1).getAs[String]("op") === "delete")
    assert(out(1).getAs[String]("data") === """{"id":6,"v":9}""")
    // (keys happen to be sorted already in these payloads)
  }

  test("mongo change stream: insert full doc, update partial+key, delete key only") {
    val ins = """{"operationType":"insert","ns":{"db":"d","coll":"c"},"fullDocument":{"_id":"a1","name":"x","tags":["p","q"]},"documentKey":{"_id":"a1"}}"""
    val upd = """{"operationType":"update","ns":{"db":"d","coll":"c"},"updateDescription":{"updatedFields":{"name":"y"}},"documentKey":{"_id":"a1"}}"""
    val del = """{"operationType":"delete","ns":{"db":"d","coll":"c"},"documentKey":{"_id":"a1"}}"""
    val out = EnvelopeDecoders.decodeMongoChangeStream(
      Seq((ins, 1L), (upd, 2L), (del, 3L)).toDF("data", "offset"))
      .orderBy("offset").collect()
    assert(out.map(_.getAs[String]("op")).toSeq === Seq("create", "update", "delete"))
    assert(out.forall(_.getAs[String]("table") === "c"))
    assert(out(0).getAs[String]("data") === """{"_id":"a1","name":"x","tags":["p","q"]}""")
    // partial update: ONLY the changed field plus the key (mongo.py:64-68)
    assert(out(1).getAs[String]("data") === """{"name":"y","_id":"a1"}""")
    assert(out(2).getAs[String]("data") === """{"_id":"a1"}""")
  }

  test("mongo change stream: empty updatedFields degenerates to the key alone") {
    val upd = """{"operationType":"update","ns":{"db":"d","coll":"c"},"updateDescription":{"updatedFields":{}},"documentKey":{"_id":"z9"}}"""
    val out = EnvelopeDecoders.decodeMongoChangeStream(
      Seq((upd, 1L)).toDF("data", "offset")).collect()
    assert(out.head.getAs[String]("data") === """{"_id":"z9"}""")
  }

  test("debezium: wrapped and flat envelopes decode; c/r create, u after-" +
    "image, d key-from-before") {
    val feed = Seq(
      // flat form (schemas disabled) — snapshot read + insert
      ("""{"op":"r","before":null,"after":{"id":1,"age":10},"source":{"table":"test"},"ts_ms":1}""", 1L),
      ("""{"op":"c","before":null,"after":{"id":2,"age":20},"source":{"table":"test"},"ts_ms":2}""", 2L),
      // wrapped form (schema envelope) — update carries the after-image
      ("""{"payload":{"op":"u","before":{"id":1,"age":10},"after":{"id":1,"age":11},"source":{"table":"test"},"ts_ms":3}}""", 3L),
      // delete: the key rides in `before`
      ("""{"op":"d","before":{"id":2,"age":20},"after":null,"source":{"table":"test"},"ts_ms":4}""", 4L))
    val out = EnvelopeDecoders.decodeDebezium(feed.toDF("data", "offset"))
      .orderBy("offset").collect()
    assert(out.map(_.getAs[String]("op")).toSeq ===
      Seq("create", "create", "update", "delete"))
    assert(out.map(_.getAs[String]("table")).toSeq === Seq.fill(4)("test"))
    assert(out(2).getAs[String]("data").contains(""""age":11"""))
    assert(out(2).getAs[String]("data").contains(""""id":1"""))
    assert(!out(2).getAs[String]("data").contains(""""age":10"""),
      "update must carry the after-image, not before")
    assert(out(3).getAs[String]("data").contains(""""id":2"""))
    // 'm' (logical-decoding message) carries no row change: explicit drop
    val msg = Seq(("""{"op":"m","source":{"table":"test"}}""", 5L))
      .toDF("data", "offset")
    assert(EnvelopeDecoders.decodeDebezium(msg).collect().isEmpty)
    // 't' (truncate) is a data change this envelope cannot apply — silently
    // ignoring it would leave the sink stale, so it must fail loudly
    val trunc = Seq(("""{"op":"t","source":{"table":"test"}}""", 6L))
      .toDF("data", "offset")
    val et = intercept[Exception] { EnvelopeDecoders.decodeDebezium(trunc).collect() }
    assert(msgOf(et).contains("undecodable"), msgOf(et))
  }

  test("undecodable messages fail loudly instead of vanishing") {
    // from_json yields null on garbage; the decoders must raise, not emit
    // zero rows (the changes would silently never reach the sink)
    val garbage = Seq(("{not json at all", 1L)).toDF("data", "offset")
    val e1 = intercept[Exception] {
      EnvelopeDecoders.decodeWal2json(garbage).collect()
    }
    assert(msgOf(e1).contains("undecodable"), msgOf(e1))
    val e2 = intercept[Exception] {
      EnvelopeDecoders.decodeMysqlBinlog(garbage).collect()
    }
    assert(msgOf(e2).contains("undecodable"), msgOf(e2))
    // a row event whose rows[] failed to decode would posexplode ZERO rows
    // and vanish without this guard (r9 review) — type parses, rows missing
    val rowless = Seq((
      """{"schema": "s", "table": "t", "type": "write"}""", 2L))
      .toDF("data", "offset")
    val e3 = intercept[Exception] {
      EnvelopeDecoders.decodeMysqlBinlog(rowless).collect()
    }
    assert(msgOf(e3).contains("undecodable"),
      s"row event without rows must fail loudly: $e3")
  }

  test("wire source: an out-of-range message offset fails loudly, not silently") {
    import graft.cdc.WireCdcSource
    val root = tmpDir("wireguard")
    val src = new WireCdcSource(spark, s"$root/feed", root, "wal2json")
    val msg = """{"change":[{"kind":"insert","schema":"p","table":"t","columnnames":["id"],"columnvalues":[1]}],"nextlsn":"0/1"}"""
    // offset 2^43 would collide after the <<20 shift — must raise
    val raw = Seq((8796093022208L, msg)).toDF("offset", "data")
    val e = intercept[Exception] { src.decode(raw).collect() }
    assert(e.getMessage.contains("offset encoding") ||
      Option(e.getCause).exists(_.getMessage.contains("offset encoding")))
    // and a well-in-range message decodes through the same path
    val ok = Seq((7L, msg)).toDF("offset", "data")
    val out = src.decode(ok).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("offset") === (7L << 20))
  }

  test("wire source e2e: raw wal2json feed streams through the full pipeline") {
    import graft.cdc._
    import graft.model._
    import org.apache.spark.sql.types._
    val root = tmpDir("wire")
    val feed = s"$root/feed"
    new java.io.File(feed).mkdirs()
    // message 1: a transaction inserting two rows across two tables
    // message 2: an update of one row + a delete of the other (same table)
    val m1 =
      """{"change":[
        |{"kind":"insert","schema":"public","table":"test","columnnames":["id","age"],"columnvalues":[1,46]},
        |{"kind":"insert","schema":"public","table":"other","columnnames":["id"],"columnvalues":[5]},
        |{"kind":"insert","schema":"public","table":"test","columnnames":["id","age"],"columnvalues":[2,30]},
        |{"kind":"insert","schema":"public","table":"test","columnnames":["id","age"],"columnvalues":[3,25]}
        |],"nextlsn":"0/1"}""".stripMargin.replace("\n", "")
    val m2 =
      """{"change":[
        |{"kind":"update","schema":"public","table":"test","columnnames":["id","age"],"columnvalues":[1,47]},
        |{"kind":"delete","schema":"public","table":"test","oldkeys":{"keynames":["id"],"keyvalues":[2]}}
        |],"nextlsn":"0/2"}""".stripMargin.replace("\n", "")
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$feed/w.jsonl"),
      Seq(s"""{"offset": 1, "data": "${esc(m1)}"}""",
        s"""{"offset": 2, "data": "${esc(m2)}"}""")
        .mkString("\n").getBytes("UTF-8"))
    val sync = SyncConfig("test", pk = "id", schema = Some(StructType(Seq(
      StructField("id", IntegerType), StructField("age", IntegerType)))))
    val src = new WireCdcSource(spark, feed, root, "wal2json")
    val pipe = new Pipeline(spark, PipelineConfig(Seq(sync)), src, s"$root/sink")
    val q = pipe.start(s"$root/ckpt")
    q.processAllAvailable(); q.stop()
    // the non-synced 'other' row in the MIDDLE of m1's transaction must not
    // truncate the rest (reference postgres.py:97-98 would drop ids 2 and 3,
    // leaving only (1,47) — id 3 surviving proves the transaction stayed
    // whole; id 2's absence proves the oldkeys delete path works)
    assert(pipe.sinkState(sync).orderBy("id").collect().toSeq ===
      Seq(org.apache.spark.sql.Row(1, 47), org.apache.spark.sql.Row(3, 25)))
  }

  test("mongo change stream: 'replace' is a full-document overwrite — " +
    "CREATE semantics, never silently dropped (review r11)") {
    val rep = """{"operationType":"replace","ns":{"db":"d","coll":"c"},"fullDocument":{"_id":"a1","name":"z"},"documentKey":{"_id":"a1"}}"""
    val out = EnvelopeDecoders.decodeMongoChangeStream(
      Seq((rep, 1L)).toDF("data", "offset")).collect()
    assert(out.length === 1, "a replaceOne must not vanish from the feed")
    assert(out.head.getAs[String]("op") === "create",
      "replace = full-document overwrite = the sink's create semantics")
    assert(out.head.getAs[String]("data") === """{"_id":"a1","name":"z"}""")
  }

  test("wal2json: a delete without oldkeys (REPLICA IDENTITY NOTHING) " +
    "fails LOUD instead of flowing a null payload that silently no-ops " +
    "at the sink (review r11)") {
    val msg = """{"change":[{"kind":"delete","schema":"public","table":"t"}],"nextlsn":"0/1"}"""
    val e = intercept[Exception] {
      EnvelopeDecoders.decodeWal2json(Seq((msg, 1L)).toDF("data", "offset")).collect()
    }
    assert(msgOf(e).contains("REPLICA IDENTITY") || msgOf(e).contains("undecodable"),
      s"the failure must name the repair: ${msgOf(e)}")
  }

  test("debezium: Kafka delete TOMBSTONES (null-valued records) are " +
    "routine log-compaction markers, filtered — not corruption that " +
    "fail-stops the stream (review r11)") {
    val feed = Seq(
      ("""{"op":"d","before":{"id":2},"after":null,"source":{"table":"test"},"ts_ms":1}""", 1L),
      (null.asInstanceOf[String], 2L), // the tombstone Debezium emits after the delete
      ("""{"op":"c","before":null,"after":{"id":3},"source":{"table":"test"},"ts_ms":3}""", 3L))
    val out = EnvelopeDecoders.decodeDebezium(feed.toDF("data", "offset"))
      .orderBy("offset").collect()
    assert(out.map(_.getAs[String]("op")).toSeq === Seq("delete", "create"),
      "the tombstone must drop; the real events must survive")
  }
}
