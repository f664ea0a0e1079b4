package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-pk applied-offset high-watermark sidecar for an upsert sink.
  *
  * Why it exists: the dead-letter replay path ([[Pipeline.replayDeadLetters]])
  * re-applies operator-repaired quarantined rows through the live upsert
  * tail. Those rows carry the SOURCE offset they were quarantined at, which
  * may be far in the past by replay time — live batches may have applied
  * newer changes to the same pk since. Upserting a repaired row by pk alone
  * would overwrite that newer state with the stale quarantined payload (the
  * r8 ADVICE medium finding). The sink table itself deliberately carries no
  * offset column (schema evolution in the merge would leak it into the
  * index — see [[Pipeline.applySync]]), so the watermark lives in a sidecar
  * keyed table: pk -> max source offset ever applied for that pk. Replay
  * consults it and DISCARDS any repaired row whose offset is below the
  * sink's watermark for its pk (superseded by live data); live batches and
  * replays both advance it.
  *
  * Crash-safety is the same at-least-once -> effectively-exactly-once
  * argument as the sink itself: `advance` is idempotent (greatest() of the
  * same inputs), so a checkpoint-replayed micro-batch or a crash-retried
  * replay re-advances to the same values; and because replay FILTERS on the
  * watermark, a crash-retry interleaved with newer stream writes can no
  * longer re-apply payloads those writes superseded.
  *
  * Scale posture: one keyed merge + write per batch, the same bound as the
  * sink apply it shadows. With `numBuckets` set the store is partitioned by
  * the SAME pk-hash bucket as [[BucketedUpsertSink]] and a batch rewrites
  * only the buckets it touches (dynamic partition overwrite, pruned read) —
  * O(changed buckets), never the whole map. Entries are never deleted: a
  * deleted pk's watermark still guards against a late stale replay
  * resurrecting the row.
  */
object OffsetWatermark {

  /** Stored max-applied-offset column. */
  val OffsetCol = "_wm_offset"

  def path(statePath: String): String = statePath + ".wm"

  /** Current watermark table (pk, [[OffsetCol]]); None if never written. */
  def current(spark: SparkSession, statePath: String): Option[DataFrame] = {
    val dir = path(statePath)
    UpsertSink.recoverSwap(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      Some(spark.read.parquet(dir).drop(BucketedUpsertSink.BucketCol))
    else None
  }

  /** Advance the watermark with one batch's applied (pk, offset) rows.
    * Monotone: stored values only ever increase (greatest of old and new),
    * so re-advancing with an already-applied batch is a no-op. */
  def advance(spark: SparkSession, statePath: String, applied: DataFrame,
              pk: String, numBuckets: Option[Int]): Unit = {
    val batch = applied.groupBy(col(pk)).agg(max(col("offset")).as(OffsetCol))
    val dir = path(statePath)
    current(spark, statePath) match {
      case None =>
        numBuckets match {
          case Some(n) =>
            batch.withColumn(BucketedUpsertSink.BucketCol,
                BucketedUpsertSink.bucketOf(col(pk), n))
              .write.mode("overwrite")
              .partitionBy(BucketedUpsertSink.BucketCol).parquet(dir)
          case None =>
            batch.write.mode("overwrite").parquet(dir)
        }
      case Some(stored) =>
        numBuckets match {
          case Some(n) =>
            // prune the stored read to the touched buckets; the distinct
            // collect is O(buckets) (config-bounded), the house pattern
            // from BucketedUpsertSink.applyBatch
            val withBucket = batch.withColumn(BucketedUpsertSink.BucketCol,
              BucketedUpsertSink.bucketOf(col(pk), n))
            val touched = withBucket.select(BucketedUpsertSink.BucketCol)
              .distinct().collect().map(_.getLong(0)).sorted
            if (touched.isEmpty) return
            val slice = spark.read.parquet(dir)
              .filter(col(BucketedUpsertSink.BucketCol).isin(touched: _*))
              .drop(BucketedUpsertSink.BucketCol)
            merge(slice, withBucket.drop(BucketedUpsertSink.BucketCol), pk)
              .withColumn(BucketedUpsertSink.BucketCol,
                BucketedUpsertSink.bucketOf(col(pk), n))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy(BucketedUpsertSink.BucketCol)
              .parquet(dir)
          case None =>
            val next = merge(stored, batch, pk)
            val tmp = dir + ".next"
            next.write.mode("overwrite").parquet(tmp)
            UpsertSink.atomicSwapDirs(spark, tmp, dir)
        }
    }
  }

  /** Keyed greatest-merge: one shuffle on the pk, streams both sides. */
  private def merge(stored: DataFrame, batch: DataFrame, pk: String): DataFrame = {
    val s = stored.withColumnRenamed(OffsetCol, "__s")
    val b = batch.withColumnRenamed(OffsetCol, "__b")
    s.join(b, Seq(pk), "full_outer")
      .select(col(pk),
        greatest(coalesce(col("__s"), col("__b")),
                 coalesce(col("__b"), col("__s"))).as(OffsetCol))
  }

  /** Split repaired dead-letter rows into (fresh, superseded) against the
    * watermark: a row is superseded iff the sink has already applied a
    * STRICTLY newer offset for its pk. Rows at the watermark exactly are
    * fresh — re-applying them is the idempotent at-least-once case. The
    * watermark side is pruned to the replay's pks via a broadcast of the
    * (small, operator-repaired) probe list before the join, so the stored
    * map is never shuffled wholesale for a replay. */
  def splitStale(ready: DataFrame, wm: Option[DataFrame], pk: String)
      : (DataFrame, DataFrame) = wm match {
    case None => (ready, ready.limit(0))
    case Some(w) =>
      val probes = ready.select(col(pk)).distinct()
      val slice = w.join(broadcast(probes), Seq(pk))
        .withColumnRenamed(OffsetCol, "__wm")
      val j = ready.join(slice, Seq(pk), "left").localCheckpoint()
      val fresh = j.filter(col("__wm").isNull || col("offset") >= col("__wm"))
        .drop("__wm")
      val stale = j.filter(col("__wm").isNotNull && col("offset") < col("__wm"))
        .drop("__wm")
      (fresh, stale)
  }
}
