package graft.cdc

import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K1: the upsert/delete sink (reference `meili.py:121-151`), re-expressed as
  * an idempotent MERGE-shaped batch apply against a keyed table.
  *
  * Semantics (normative, from the reference):
  *  - create -> insert document
  *  - update -> PARTIAL upsert: only the fields present in the event change;
  *    untouched columns of an existing row are preserved (Meilisearch
  *    `update_documents` semantics; Mongo update events carry only changed
  *    fields — `mongo.py:64`). This is the column-wise coalesce merge.
  *  - delete -> remove by pk (`meili.py:137`)
  *  - applying the same batch twice yields the same table (idempotence — the
  *    reference is at-least-once, SURVEY.md §2.3, so replays must be safe).
  *
  * Scale posture: one shuffle on the pk (the join); the current-state side
  * streams through a shuffled hash / sort-merge join — no driver-side
  * collection, no per-row remote calls. With AQE on, skewed hot pks re-plan.
  */
object UpsertSink {

  /** Apply one micro-batch of per-pk-compacted change rows to the current
    * state table.
    *
    * @param state   current table state (columns = payload columns; may be empty)
    * @param changes batch rows: an `op` column + payload columns, already
    *                last-write-wins-compacted per pk ([[Transforms.lastWriteWins]]).
    *                For partial updates, absent fields are null.
    * @param pk      primary-key column name
    * @return        new state
    */
  def applyBatch(state: DataFrame, changes: DataFrame, pk: String): DataFrame = {
    val payloadCols = state.columns.toSeq
    require(payloadCols.contains(pk), s"state table has no pk column '$pk'")

    val s = state.alias("s")
    val c = changes.alias("c")
    val joined = s.join(c, col(s"s.$pk") === col(s"c.$pk"), "full_outer")

    // Row survives unless the change for its pk is a delete; column-wise:
    // changed (non-null) fields win, otherwise keep existing value. A
    // `create`/`update` for an absent pk inserts the event's fields.
    val merged = joined
      .filter(col("c.op").isNull || col("c.op") =!= Op.Delete)
      .select(payloadCols.map { name =>
        when(col("c.op").isNull, col(s"s.$name"))            // unchanged row
          .otherwise(coalesce(col(s"c.$name"), col(s"s.$name")))
          .as(name)
      }: _*)
    merged
  }

  /** Streaming form: wire a compacted change stream into `foreachBatch`,
    * maintaining the state table as parquet at `statePath` (the "index").
    * Checkpointing (`option("checkpointLocation", ...)`) replaces the
    * reference's progress store (`progress/file.py`) — offset WAL + commit
    * log give effectively-exactly-once with this idempotent apply. */
  def foreachBatchApply(
      spark: SparkSession,
      statePath: String,
      pk: String,
      payloadSchema: org.apache.spark.sql.types.StructType
  ): (DataFrame, Long) => Unit = { (batch: DataFrame, _: Long) =>
    val state = currentState(spark, statePath, payloadSchema)
    val compacted = Transforms.lastWriteWins(batch, col(pk))
    val next = applyBatch(state, compacted, pk)
    // two-phase write: next state to a versioned dir, then pointer swap —
    // keeps the apply atomic without a table format in the offline harness
    val tmp = statePath + ".next"
    next.write.mode("overwrite").parquet(tmp)
    atomicSwapDirs(tmp, statePath)
  }

  def currentState(
      spark: SparkSession,
      statePath: String,
      schema: org.apache.spark.sql.types.StructType
  ): DataFrame = {
    val p = new java.io.File(statePath)
    if (p.exists()) spark.read.parquet(statePath)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Directory pointer swap (stand-in for Delta/Iceberg atomic commit in the
    * zero-dependency harness): move live aside, move next into place. */
  private[cdc] def atomicSwapDirs(next: String, live: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val livePath = Paths.get(live)
    val old = Paths.get(live + ".old")
    deleteRecursively(old)
    if (Files.exists(livePath)) Files.move(livePath, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(next), livePath, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }
}
