package graft

import org.apache.spark.sql.functions._

/** Drives the V2 MicroBatchStream CDC source end-to-end: offsets advance
  * per chunk, checkpoint restart resumes from the committed position, and
  * table/op filters are pushed into the partition reader. */
class CdcSourceV2Spec extends SparkSpec {

  private def writeChunk(dir: String, n: Long, rows: Seq[(String, String, Long, Long, String)]): Unit = {
    val f = new java.io.PrintWriter(s"$dir/chunk-$n.tsv", "UTF-8")
    try rows.foreach { case (op, table, off, ms, data) =>
      f.println(s"$op\t$table\t$off\t$ms\t$data")
    } finally f.close()
  }

  test("micro-batches follow chunk offsets and resume from the checkpoint") {
    val feed = tmpDir("feed")
    val ckpt = tmpDir("ckpt")
    writeChunk(feed, 0, Seq(("create", "t", 1, 1000, """{"id":1}"""),
      ("update", "t", 2, 2000, """{"id":1}""")))
    writeChunk(feed, 1, Seq(("delete", "t", 3, 3000, """{"id":1}""")))

    def drain(): Seq[org.apache.spark.sql.Row] = {
      val seen = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
      val q = spark.readStream.format("graft-cdc").load(feed)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen ++= df.collect(); ()
        }.start()
      q.processAllAvailable(); q.stop()
      seen.toSeq
    }

    val first = drain()
    assert(first.map(_.getAs[Long]("offset")).sorted === Seq(1L, 2L, 3L))
    assert(first.head.schema.fieldNames.toSeq ===
      Seq("op", "table", "offset", "ts", "data"))

    // restart with a new chunk appended: only the new chunk is read
    writeChunk(feed, 2, Seq(("create", "t", 4, 4000, """{"id":2}""")))
    val second = drain()
    assert(second.map(_.getAs[Long]("offset")) === Seq(4L))
  }

  test("full pipeline runs on the V2 source end-to-end") {
    import graft.cdc.{Pipeline, V2CdcSource}
    import graft.model.{PipelineConfig, SyncConfig}
    import org.apache.spark.sql.types._
    val feed = tmpDir("feed")
    val sinkRoot = tmpDir("sink")
    val ckpt = tmpDir("ckpt")
    writeChunk(feed, 0, Seq(
      ("create", "users", 1, 1704067200000L, """{"id": 1, "age": 46}"""),
      ("create", "users", 2, 1704067201000L, """{"id": 2, "age": 30}"""),
      ("delete", "users", 3, 1704067202000L, """{"id": 1}""")))
    val sync = SyncConfig("users", pk = "id", schema = Some(StructType(Seq(
      StructField("id", IntegerType), StructField("age", IntegerType)))))
    val src = new V2CdcSource(spark, feed, tmpDir("tables"), tables = Seq("users"))
    val pipe = new Pipeline(spark, PipelineConfig(Seq(sync)), src, sinkRoot)
    val q = pipe.start(ckpt)
    q.processAllAvailable(); q.stop()
    assert(pipe.sinkState(sync).collect().toSeq ===
      Seq(org.apache.spark.sql.Row(2, 30)))
  }

  test("tables/ops options filter inside the reader (no engine-side filter)") {
    val feed = tmpDir("feed")
    val ckpt = tmpDir("ckpt")
    writeChunk(feed, 0, Seq(
      ("create", "a", 1, 1000, "{}"), ("noise", "a", 2, 2000, "{}"),
      ("create", "b", 3, 3000, "{}")))
    val seen = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = spark.readStream.format("graft-cdc")
      .option("tables", "a")
      .option("ops", "create,update,delete")
      .load(feed)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= df.collect(); ()
      }.start()
    q.processAllAvailable(); q.stop()
    // no .filter() in the query — selection happened in the partition reader
    assert(seen.map(_.getAs[Long]("offset")).toSeq === Seq(1L))
  }

  test("an empty trailing data field is a VALID event; a torn line fails " +
    "loud instead of silently vanishing (r9 review)") {
    // empty payload survives the tab split
    val feed = tmpDir("feed-empty")
    writeChunk(feed, 0, Seq(("delete", "t", 1, 1000, "")))
    val seen = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = spark.readStream.format("graft-cdc").load(feed)
      .writeStream.option("checkpointLocation", tmpDir("ckpt-empty"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= df.collect(); ()
      }.start()
    q.processAllAvailable(); q.stop()
    assert(seen.map(r => (r.getAs[Long]("offset"), r.getAs[String]("data")))
      .toSeq === Seq((1L, "")),
      "the empty-payload event must be read, not dropped")

    // a genuinely short line (torn tail of a partial write) kills the
    // query at the checkpointed position — never a silent skip
    val feed2 = tmpDir("feed-torn")
    val f = new java.io.PrintWriter(s"$feed2/chunk-0.tsv", "UTF-8")
    try f.println("create\tt\t7\t1000") finally f.close() // 4 fields
    val q2 = spark.readStream.format("graft-cdc").load(feed2)
      .writeStream.option("checkpointLocation", tmpDir("ckpt-torn"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.count(); () // force the scan — foreachBatch hands a lazy frame
      }
      .start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    assert(err.getMessage.contains("malformed chunk line") ||
      Option(err.getCause).exists(_.toString.contains("malformed chunk line")) ||
      err.toString.contains("malformed chunk line"),
      s"torn line must name itself: $err")
  }

  test("a payload containing a raw tab stays WHOLE in the data field " +
    "(review r11: the unbounded split admitted the line and silently " +
    "truncated the payload at its first tab)") {
    val feed = tmpDir("feed-tabpayload")
    val payload = "{\"k\": \"a\tb\tc\"}"
    writeChunk(feed, 0, Seq(("create", "t", 1, 1000, payload)))
    val seen = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = spark.readStream.format("graft-cdc").load(feed)
      .writeStream.option("checkpointLocation", tmpDir("ckpt-tabpayload"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= df.collect(); ()
      }.start()
    q.processAllAvailable(); q.stop()
    assert(seen.map(_.getAs[String]("data")).toSeq === Seq(payload),
      "the tab-bearing payload must arrive uncut")
  }

  test("a feed behind the checkpoint fails loud instead of regressing " +
    "(review r11: a truncated/replaced feed dir would re-serve applied " +
    "chunks as fresh data)") {
    val feed = tmpDir("feed-regress")
    writeChunk(feed, 0, Seq(("create", "t", 1, 1000, "{}")))
    writeChunk(feed, 1, Seq(("create", "t", 2, 2000, "{}")))
    val ckpt = tmpDir("ckpt-regress")
    val q = spark.readStream.format("graft-cdc").load(feed)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.count(); ()
      }.start()
    q.processAllAvailable(); q.stop()
    // the feed regresses: chunk-1 vanishes (dir truncated/replaced)
    assert(new java.io.File(s"$feed/chunk-1.tsv").delete())
    val q2 = spark.readStream.format("graft-cdc").load(feed)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.count(); ()
      }.start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    assert(err.toString.contains("feed regressed") ||
      Option(err.getCause).exists(_.toString.contains("feed regressed")),
      s"the regression must name itself: $err")
  }

  test("a fully BLANK line (trailing newline, operator edit) is skipped, " +
    "not treated as a torn tail — wedging there is unrecoverable because " +
    "every restart re-reads the same checkpointed chunk (r9 review)") {
    val feed = tmpDir("feed-blank")
    val f = new java.io.PrintWriter(s"$feed/chunk-0.tsv", "UTF-8")
    try {
      f.println("create\tt\t1\t1000\t{\"id\":1}")
      f.println() // interior blank line
      f.println("create\tt\t2\t2000\t{\"id\":2}")
      f.println() // trailing blank line
    } finally f.close()
    val seen = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = spark.readStream.format("graft-cdc").load(feed)
      .writeStream.option("checkpointLocation", tmpDir("ckpt-blank"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= df.collect(); ()
      }.start()
    q.processAllAvailable(); q.stop()
    assert(seen.map(_.getAs[Long]("offset")).sorted === Seq(1L, 2L),
      "both real events must be read; blank lines must not wedge the stream")
  }
}
