package graft.cdc

import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** S1-S3 generalized: the source interface (reference
  * `source/__init__.py:7-36`). A source provides a batch full scan (S4, for
  * backfill/refresh), an unbounded change stream in the [[ChangeEvent]]
  * envelope (S1-S3), a count (S5), and a liveness probe (O1).
  *
  * The reference's three connectors (MySQL binlog `mysql.py:81-135`,
  * Postgres wal2json `postgres.py:89-163`, Mongo change-stream
  * `mongo.py:49-74`) would slot behind this trait as custom
  * `MicroBatchStream`s with their binlog-pos / LSN / resume-token as the
  * Spark `Offset`; restart-with-backoff (`mysql.py:127-129`) becomes Spark
  * task retry + trigger cadence. In the offline harness the concrete
  * implementations are file- and memory-backed.
  */
trait CdcSource {
  /** S4: parallel batch scan for backfill — replaces the reference's O(n^2)
    * `LIMIT size OFFSET n` paging (`mysql.py:44-47`) with a partitioned scan. */
  def fullScan(sync: SyncConfig): DataFrame
  /** S1-S3: unbounded stream of [[ChangeEvent]] rows (streaming DataFrame). */
  def changes: DataFrame
  /** S5: source-side count for the consistency check. */
  def count(sync: SyncConfig): Long
  /** O1: liveness probe. */
  def ping(): Boolean
}

/** File-backed CDC feed: a directory of parquet files in the envelope
  * schema, tailed as a stream (`readStream` + `maxFilesPerTrigger` gives the
  * micro-batch cadence; the checkpoint dir replaces the progress store). */
final class ParquetCdcSource(spark: SparkSession, feedDir: String,
                             tableDir: String, maxFilesPerTrigger: Int = 1)
    extends CdcSource {
  def fullScan(sync: SyncConfig): DataFrame =
    Transforms.projectAndCoerce(
      spark.read.parquet(s"$tableDir/${sync.table}.parquet"), sync)
  def changes: DataFrame =
    spark.readStream
      .schema(ChangeEvent.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(feedDir)
  def count(sync: SyncConfig): Long =
    spark.read.parquet(s"$tableDir/${sync.table}.parquet").count()
  def ping(): Boolean = new java.io.File(feedDir).exists()
}

/** CDC feed backed by the custom V2 `MicroBatchStream` source
  * ([[graft.sources.GraftCdcSource]], `format("graft-cdc")`): replication
  * offsets live in the Spark checkpoint, and table/op selection runs inside
  * the source's partition readers. */
final class V2CdcSource(spark: SparkSession, feedDir: String, tableDir: String,
                        tables: Seq[String] = Seq.empty,
                        ops: Seq[String] = Seq.empty,
                        maxChunksPerTrigger: Option[Long] = None) extends CdcSource {
  def fullScan(sync: SyncConfig): DataFrame =
    Transforms.projectAndCoerce(
      spark.read.parquet(s"$tableDir/${sync.table}.parquet"), sync)
  def changes: DataFrame = {
    var r = spark.readStream.format("graft-cdc")
    if (tables.nonEmpty) r = r.option("tables", tables.mkString(","))
    if (ops.nonEmpty) r = r.option("ops", ops.mkString(","))
    // B2 insert_size as source admission: bounded catch-up micro-batches
    maxChunksPerTrigger.foreach(m => r = r.option("maxChunksPerTrigger", m.toString))
    r.load(feedDir)
  }
  def count(sync: SyncConfig): Long =
    spark.read.parquet(s"$tableDir/${sync.table}.parquet").count()
  def ping(): Boolean = new java.io.File(feedDir).exists()
}

/** CDC feed of RAW connector wire messages: a stream of `(offset, data)`
  * records — the shape a Kafka topic (offset, value) or a captured-feed
  * JSONL file delivers — where `data` is one message in the connector's own
  * wire format, decoded declaratively by [[EnvelopeDecoders]]. This is the
  * drop-in for feeds taken straight off a replication slot / binlog tailer /
  * change stream, with no preprocessing step in between.
  *
  * One wire message can decode to several changes (a wal2json transaction,
  * a multi-row binlog event), so the envelope offset is refined to
  * `(message offset << 20) | row index`: global order is preserved, rows
  * within one message stay ordered for last-write-wins, and the checkpoint
  * still tracks the coarse message offset (2^20 rows per message bound).
  *
  * @param wireFormat one of `wal2json`, `mysql-binlog`, `mongo`,
  *                   `debezium` (the Kafka-standard envelope — beyond the
  *                   reference's three connectors)
  */
final class WireCdcSource(spark: SparkSession, feedDir: String, tableDir: String,
                          wireFormat: String, maxFilesPerTrigger: Int = 1)
    extends CdcSource {
  import org.apache.spark.sql.functions._

  def fullScan(sync: SyncConfig): DataFrame =
    Transforms.projectAndCoerce(
      spark.read.parquet(s"$tableDir/${sync.table}.parquet"), sync)

  private[graft] def decode(raw: DataFrame): DataFrame = {
    val decoded = wireFormat match {
      case "wal2json"     => EnvelopeDecoders.decodeWal2json(raw)
      case "mysql-binlog" => EnvelopeDecoders.decodeMysqlBinlog(raw)
      case "mongo"        => EnvelopeDecoders.decodeMongoChangeStream(raw)
      case "debezium"     => EnvelopeDecoders.decodeDebezium(raw)
      case other => throw new IllegalArgumentException(
        s"unknown wire format '$other' (wal2json | mysql-binlog | mongo | debezium)")
    }
    // Fail LOUDLY if a message exceeds the encoding's bounds instead of
    // silently colliding with the next message's offset range (a 2M-row
    // transaction would otherwise interleave with its successor in
    // last-write-wins order): assert_true raises, the stream stops at the
    // checkpointed position, and the operator widens the encoding.
    decoded
      .filter(assert_true(
        col("offset") >= 0 && col("_ridx") < (1 << 20) && col("offset") < (1L << 43),
        concat(lit(s"wire message exceeds offset encoding (negative offset, " +
          s"rows >= 2^20, or message offset >= 2^43): offset="), col("offset"),
          lit(" _ridx="), col("_ridx"))).isNull)
      .select(col("op"), col("table"),
        (shiftleft(col("offset"), 20) + col("_ridx")).as("offset"),
        lit(null).cast("timestamp").as("ts"),
        col("data"))
  }

  def changes: DataFrame =
    decode(spark.readStream
      .schema("offset LONG, data STRING")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(feedDir))

  def count(sync: SyncConfig): Long =
    spark.read.parquet(s"$tableDir/${sync.table}.parquet").count()
  def ping(): Boolean = new java.io.File(feedDir).exists()
}

/** CDC feed tailed from a LIVE socket server via
  * [[graft.sources.SocketCdcSource]] (`format("graft-cdc-socket")`): the
  * server owns the log and assigns offsets, each micro-batch is a bounded
  * replayed span, and the checkpointed position is re-requested after a
  * crash — the binlog-client transport shape (`source/mysql.py:81-135`).
  * `hostPort` is `host:port`; the liveness probe IS a wire round-trip. */
final class SocketTailCdcSource(spark: SparkSession, hostPort: String,
                                tableDir: String,
                                maxEventsPerTrigger: Option[Long] = None)
    extends CdcSource {
  def fullScan(sync: SyncConfig): DataFrame =
    Transforms.projectAndCoerce(
      spark.read.parquet(s"$tableDir/${sync.table}.parquet"), sync)
  def changes: DataFrame = {
    var r = spark.readStream.format("graft-cdc-socket")
    maxEventsPerTrigger.foreach(m => r = r.option("maxEventsPerTrigger", m.toString))
    r.load(hostPort)
  }
  def count(sync: SyncConfig): Long =
    spark.read.parquet(s"$tableDir/${sync.table}.parquet").count()
  def ping(): Boolean =
    // the parse lives INSIDE the try (review r11): a malformed hostPort
    // (no colon, non-numeric port, IPv6 literal) threw MatchError out of
    // a liveness probe whose O1 contract is a Boolean
    try {
      val Array(host, port) = hostPort.split(':')
      graft.sources.SocketCdc.latest(host, port.toInt); true
    } catch { case _: Exception => false }
}

/** In-memory CDC feed for tests (the reference's integration harness shape:
  * script a few inserts/updates/deletes, assert the synced state). */
final class MemoryCdcSource(spark: SparkSession,
                            snapshot: Map[String, DataFrame] = Map.empty)
    extends CdcSource {
  import spark.implicits._
  val stream: MemoryStream[ChangeEvent] = MemoryStream[ChangeEvent](spark)
  def addEvents(evts: ChangeEvent*): Unit = stream.addData(evts)
  def fullScan(sync: SyncConfig): DataFrame =
    Transforms.projectAndCoerce(snapshot(sync.table), sync)
  def changes: DataFrame = stream.toDF()
  def count(sync: SyncConfig): Long = snapshot(sync.table).count()
  def ping(): Boolean = true
}
