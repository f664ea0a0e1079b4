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
}
