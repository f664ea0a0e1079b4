package graft.sources

import graft.model.ChangeEvent
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util

/** A real Structured Streaming V2 source for the CDC envelope — the Spark
  * shape a production binlog/wal2json/change-stream connector takes
  * (SURVEY.md §2.1 S1-S3): the replication position is a Spark [[Offset]]
  * persisted in the checkpoint (not a side progress store), and the
  * reference's server-side `only_tables`/`only_events` filtering
  * (`mysql.py:91-93`, `mongo.py:50`) is config-driven source-side selection
  * — `.option("tables", "a,b")` / `.option("ops", "create,update")` are
  * applied inside the partition reader, before rows reach the engine
  * (matching the reference, where this selection also comes from config,
  * `settings.py:39-48`). The scan additionally implements
  * `SupportsPushDownFilters` for table/op predicates; Spark's planner does
  * not currently invoke V2 pushdown for micro-batch scans (verified
  * empirically — the rule only fires for batch relations), so the options
  * are the operative path.
  *
  * Wire format (stand-in for a binlog wire protocol): a directory of
  * `chunk-<n>.tsv` files, one change per line,
  * `op \t table \t offset \t epochMillis \t dataJson`. Chunk index == the
  * replication position; a micro-batch reads chunks `(start, end]`, one
  * input partition per chunk.
  *
  * Usage: `spark.readStream.format("graft-cdc").load(dir)`.
  */
class GraftCdcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeEvent.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CdcTable(properties.get("path"),
      Option(properties.get("tables")), Option(properties.get("ops")))
}

private class CdcTable(path: String, tables: Option[String], ops: Option[String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-cdc($path)"
  override def schema(): StructType = ChangeEvent.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    def optSet(o: Option[String], key: String): Array[Filter] =
      o.orElse(Option(options.get(key)))
        .map(v => In(if (key == "tables") "table" else "op",
          v.split(',').map(_.trim: Any)): Filter)
        .toArray
    new CdcScanBuilder(Option(path).getOrElse(options.get("path")),
      optSet(tables, "tables") ++ optSet(ops, "ops"),
      Option(options.get("maxChunksPerTrigger")).map(_.toLong))
  }
}

private class CdcScanBuilder(path: String, optionFilters: Array[Filter],
                             maxChunks: Option[Long])
    extends ScanBuilder with SupportsPushDownFilters {
  private var pushed: Array[Filter] = Array.empty

  /** Accept table/op equality and IN filters (the reference's server-side
    * selection); everything else stays with the engine. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo(a, _) => a == "table" || a == "op"
      case In(a, _)      => a == "table" || a == "op"
      case _             => false
    }
    pushed = accepted
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new CdcScan(path, optionFilters ++ pushed, maxChunks)
}

private class CdcScan(path: String, pushed: Array[Filter],
                      maxChunks: Option[Long]) extends Scan {
  override def readSchema(): StructType = ChangeEvent.schema
  override def description(): String =
    s"graft-cdc $path pushed=[${pushed.mkString(", ")}] maxChunks=$maxChunks"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CdcMicroBatchStream(path, pushed, maxChunks)
}

/** The replication position: index of the last consumed chunk. */
case class ChunkOffset(chunk: Long) extends Offset {
  override def json(): String = chunk.toString
}

private class CdcMicroBatchStream(path: String, pushed: Array[Filter],
                                  maxChunks: Option[Long] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow: the drain target is the position captured at
  // query start; the engine then loops admission-bounded micro-batches up
  // to it instead of one giant catch-up batch (or, without this interface,
  // a single-batch fallback that would stop after the first bounded batch).
  @volatile private var availableAtStart: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableAtStart = Some(maxChunk())

  private def maxChunk(): Long = {
    val files = Option(new java.io.File(path).list()).getOrElse(Array.empty)
    files.collect { case n if n.startsWith("chunk-") && n.endsWith(".tsv") =>
      n.stripPrefix("chunk-").stripSuffix(".tsv").toLong
    }.foldLeft(-1L)(math.max)
  }

  override def initialOffset(): Offset = ChunkOffset(-1L)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-controlled path")

  /** B2 admission control (the reference's `insert_size` flush bound,
    * `main.py:115-118`): cap each micro-batch at `maxChunksPerTrigger`
    * chunks so a large replication backlog drains as bounded batches
    * instead of one giant catch-up batch. Without the option, drain all. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val avail = availableAtStart.getOrElse(maxChunk())
    val s = start.asInstanceOf[ChunkOffset].chunk
    // a feed behind the checkpoint fails LOUD (review r11): silently
    // returning an end < start would regress the checkpoint and re-serve
    // already-applied chunks as fresh data (duplicate application, and
    // reused offsets poisoning the per-pk watermark downstream)
    require(avail >= s,
      s"feed regressed: latest available chunk $avail is behind the " +
        s"checkpointed position $s at $path — the feed dir was truncated " +
        "or replaced; restore it or reset the checkpoint deliberately")
    ChunkOffset(maxChunks.fold(avail)(m => math.min(avail, s + m)))
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = ChunkOffset(maxChunk())
  override def deserializeOffset(json: String): Offset = ChunkOffset(json.toLong)
  override def commit(end: Offset): Unit = () // chunks are retained; a real
  // connector would ack/advance the replication slot here
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ChunkOffset].chunk
    val e = end.asInstanceOf[ChunkOffset].chunk
    ((s + 1) to e).map(i => CdcChunkPartition(s"$path/chunk-$i.tsv"): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(pushed)
}

private case class CdcChunkPartition(file: String) extends InputPartition

private class CdcReaderFactory(pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CdcChunkReader(partition.asInstanceOf[CdcChunkPartition].file, pushed)
}

private class CdcChunkReader(file: String, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val lines: Iterator[String] = {
    // eager drain + immediate close (review r11): leaving the Source open
    // leaked one file descriptor per chunk partition per trigger until
    // finalization happened to run. Small chunks; a real connector streams.
    val src = scala.io.Source.fromFile(file, "UTF-8")
    try src.getLines().toList.iterator
    finally src.close()
  }
  private var current: InternalRow = _

  private def keep(op: String, table: String): Boolean = pushed.forall {
    case EqualTo("table", v) => table == v
    case EqualTo("op", v)    => op == v
    case In("table", vs)     => vs.contains(table)
    case In("op", vs)        => vs.contains(op)
    case _                   => true
  }

  override def next(): Boolean = {
    while (lines.hasNext) {
      val line = lines.next()
      // limit -1 keeps a trailing EMPTY data field (a valid event); a line
      // with genuinely fewer fields (torn tail of a partial write) fails
      // LOUD at the checkpointed position instead of silently vanishing —
      // a lost change surfaces much later as an undiagnosable check
      // MISMATCH (r9 review). A fully BLANK line (trailing newline, an
      // operator's editor pass) is not a torn tail: skipping it is the
      // old tolerant behavior; wedging the stream on it is unrecoverable
      // because every restart re-reads the same checkpointed chunk.
      if (line.nonEmpty) {
        // limit 5, not -1 (review r11): a payload containing a raw tab
        // must stay WHOLE in the data field — an unbounded split admitted
        // the line via the >= check and silently truncated the payload at
        // its first tab. A trailing empty data field still parses (limit-N
        // keeps trailing empties inside the first N).
        val parts = line.split("\t", 5)
        require(parts.length == 5,
          s"malformed chunk line (${parts.length} fields): $line")
        if (keep(parts(0), parts(1))) {
          current = InternalRow(
            UTF8String.fromString(parts(0)),
            UTF8String.fromString(parts(1)),
            parts(2).toLong,
            parts(3).toLong * 1000L, // epochMillis -> micros (TimestampType)
            UTF8String.fromString(parts(4)))
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
