package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-pk applied-position high-watermark sidecar for an upsert sink.
  *
  * Why it exists: the dead-letter replay path ([[Pipeline.replayDeadLetters]])
  * re-applies operator-repaired quarantined rows through the live upsert
  * tail. Those rows carry the SOURCE position they were quarantined at,
  * which may be far in the past by replay time — live batches may have
  * applied newer changes to the same pk since. Upserting a repaired row by
  * pk alone would overwrite that newer state with the stale quarantined
  * payload (the r8 ADVICE medium finding). The sink table itself
  * deliberately carries no offset column (schema evolution in the merge
  * would leak it into the index — see [[Pipeline.applySync]]), so the
  * watermark lives in a sidecar keyed table: pk -> max source position ever
  * applied for that pk. Replay consults it and DISCARDS any repaired row
  * whose position is below the sink's watermark for its pk (superseded by
  * live data); live batches and replays both advance it.
  *
  * Position = (offset, _ridx), compared lexicographically: one multi-row
  * envelope expands to several changes at ONE offset, ordered by `_ridx`
  * (last-write-wins ties break on it — [[Pipeline.applySync]]), so a
  * repaired row from such an event must also lose to an applied
  * same-offset sibling with a higher row index. Offset alone would read
  * that repair as fresh and invert the tiebreak the live path enforced
  * (r9 review).
  *
  * Crash-safety is the same at-least-once -> effectively-exactly-once
  * argument as the sink itself: `advance` is idempotent (greatest() of the
  * same inputs), so a checkpoint-replayed micro-batch or a crash-retried
  * replay re-advances to the same values; and because replay FILTERS on the
  * watermark, a crash-retry interleaved with newer stream writes can no
  * longer re-apply payloads those writes superseded.
  *
  * Scale posture: one keyed merge + write per batch, the same bound as the
  * sink apply it shadows — and an EMPTY batch (a multi-sync config where one
  * table got no events, or a batch whose rows were all quarantined) returns
  * before touching the store at all: no read, no rewrite, and crucially no
  * initial empty dynamic-partitioned write, which would leave a file-less
  * dir (only _SUCCESS) that `spark.read.parquet` cannot infer a schema from
  * and that would crash every later batch. With `numBuckets` set the store
  * is partitioned by the SAME pk-hash bucket as [[BucketedUpsertSink]] and a
  * batch rewrites only the buckets it touches (dynamic partition overwrite,
  * pruned read) — O(changed buckets), never the whole map. Entries are never
  * deleted: a deleted pk's watermark still guards against a late stale
  * replay resurrecting the row.
  *
  * The per-pk map guards rows the STREAM applied. Rows loaded by a full
  * snapshot rebuild ([[Pipeline.refresh]]/backfill) never pass through
  * `advance`, so they get a separate sync-LEVEL guard: the snapshot floor
  * ([[recordSnapshotFloor]]) — the max source offset observed (applied or
  * quarantined) when the snapshot was taken, captured BEFORE the snapshot
  * scan starts so concurrent stream progress can only leave it
  * conservatively low, never high. A snapshot holds the source's
  * then-current state, so it supersedes EVERY payload observed before it;
  * [[splitStale]] discards repaired rows at or below the floor even when
  * their pk has no per-pk entry.
  */
object OffsetWatermark {

  /** Stored max-applied-offset column. */
  val OffsetCol = "_wm_offset"

  /** Row index within the offset's envelope at which [[OffsetCol]] was
    * applied (multi-row events; 0 for single-row). */
  val RidxCol = "_wm_ridx"

  /** Above this many distinct repaired pks, [[splitStale]] stops
    * broadcasting the probe list and falls back to a shuffle join: a bulk
    * repair after a systematic quarantine (e.g. a decoder regression) can
    * hold millions of pks, and an unbounded broadcast of them would OOM the
    * driver — the same mechanical bounded-driver-work premise as the
    * mmrRerank/contextPack require guards. */
  val MaxBroadcastProbes = 1000000L

  def path(statePath: String): String = statePath + ".wm"

  /** Sidecar file holding the sync-level snapshot floor. */
  def floorPath(statePath: String): String = statePath + ".wm.floor"

  /** True iff the watermark dir holds actual DATA (bucket partition dirs or
    * parquet part files) — `_SUCCESS` alone does not count, so a historical
    * schema-less empty write reads as absent and the next real batch heals
    * it via the initial-write path. Also heals an interrupted atomic swap
    * first (the [[BucketedUpsertSink]] hasBuckets discipline). */
  private def hasData(spark: SparkSession, dir: String): Boolean = {
    UpsertSink.recoverSwap(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      n.startsWith(BucketedUpsertSink.BucketCol + "=") || n.endsWith(".parquet")
    }
  }

  /** Current watermark table (pk, [[OffsetCol]], [[RidxCol]]); None if
    * never written. */
  def current(spark: SparkSession, statePath: String): Option[DataFrame] = {
    val dir = path(statePath)
    if (hasData(spark, dir))
      Some(spark.read.parquet(dir).drop(BucketedUpsertSink.BucketCol))
    else None
  }

  /** Advance the watermark with one batch's applied (pk, offset, _ridx)
    * rows. Monotone: stored positions only ever increase (greatest of old
    * and new), so re-advancing with an already-applied batch is a no-op. An
    * empty batch is a full no-op (no store read or rewrite — see the scale
    * notes above). */
  def advance(spark: SparkSession, statePath: String, applied: DataFrame,
              pk: String, numBuckets: Option[Int]): Unit = {
    val batch = applied
      .groupBy(col(pk))
      .agg(max(struct(col("offset"), col("_ridx"))).as("__m"))
      .select(col(pk), col("__m.offset").as(OffsetCol),
        col("__m._ridx").cast("int").as(RidxCol))
    if (batch.isEmpty) return
    val dir = path(statePath)
    val exists = hasData(spark, dir)
    numBuckets match {
      case Some(n) =>
        val withBucket = batch.withColumn(BucketedUpsertSink.BucketCol,
          BucketedUpsertSink.bucketOf(col(pk), n))
        if (!exists) {
          withBucket.write.mode("overwrite")
            .partitionBy(BucketedUpsertSink.BucketCol).parquet(dir)
        } else {
          // prune the stored read to the touched buckets; the distinct
          // collect is O(buckets) (config-bounded), the house pattern
          // from BucketedUpsertSink.applyBatch
          val touched = withBucket.select(BucketedUpsertSink.BucketCol)
            .distinct().collect().map(_.getLong(0)).sorted
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
        }
      case None =>
        if (!exists) {
          batch.write.mode("overwrite").parquet(dir)
        } else {
          val next = merge(spark.read.parquet(dir), batch, pk)
          val tmp = dir + ".next"
          next.write.mode("overwrite").parquet(tmp)
          UpsertSink.atomicSwapDirs(spark, tmp, dir)
        }
    }
  }

  /** Keyed greatest-merge on the (offset, _ridx) pair: one shuffle on the
    * pk, streams both sides. Struct comparison is lexicographic, which is
    * exactly the position order. */
  private def merge(stored: DataFrame, batch: DataFrame, pk: String): DataFrame = {
    val s = stored.select(col(pk),
      struct(col(OffsetCol), col(RidxCol)).as("__s"))
    val b = batch.select(col(pk),
      struct(col(OffsetCol), col(RidxCol)).as("__b"))
    s.join(b, Seq(pk), "full_outer")
      .select(col(pk),
        greatest(coalesce(col("__s"), col("__b")),
                 coalesce(col("__b"), col("__s"))).as("__m"))
      .select(col(pk), col(s"__m.$OffsetCol").as(OffsetCol),
        col(s"__m.$RidxCol").as(RidxCol))
  }

  /** Record the sync-level snapshot floor after a full rebuild: every
    * payload with offset <= `floor` was observed before the snapshot and is
    * superseded by it. Protocol: write the value to a temp file (closed
    * before anything else moves), delete the old floor, rename the temp in
    * — and [[snapshotFloor]] COMPLETES an interrupted swap (old deleted,
    * temp not yet renamed) at read time, so a crash anywhere in the window
    * never erases the fence; a failed rename raises instead of silently
    * dropping it. The caller computes `floor` BEFORE the snapshot scan and
    * writes it AFTER the sink swap commits, so every crash ordering leaves
    * the floor conservatively LOW (stale replays stay possible in that
    * window — the pre-snapshot semantics — and re-running the rebuild heals
    * it) rather than dangerously high (which would silently discard repairs
    * the sink never received). */
  def recordSnapshotFloor(spark: SparkSession, statePath: String, floor: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(floorPath(statePath))
    val tmp = new org.apache.hadoop.fs.Path(floorPath(statePath) + ".next")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(floor.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) { fs.delete(p, false); () }
    require(fs.rename(tmp, p),
      s"cannot commit snapshot floor: rename $tmp -> $p failed")
  }

  /** The recorded snapshot floor; 0 if no snapshot rebuild ever ran (no
    * fencing — see [[splitStale]]). Completes an interrupted
    * [[recordSnapshotFloor]] swap first: the temp file is only ever left
    * behind COMPLETE (it is closed before the old floor is deleted), so
    * main-absent + temp-present means the new floor, never a torn write. */
  def snapshotFloor(spark: SparkSession, statePath: String): Long = {
    val p = new org.apache.hadoop.fs.Path(floorPath(statePath))
    val tmp = new org.apache.hadoop.fs.Path(floorPath(statePath) + ".next")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) && fs.exists(tmp)) {
      require(fs.rename(tmp, p),
        s"cannot complete interrupted snapshot-floor swap: $tmp -> $p")
    }
    if (!fs.exists(p)) 0L
    else {
      val len = fs.getFileStatus(p).getLen.toInt
      val bytes = new Array[Byte](len)
      val in = fs.open(p)
      try in.readFully(0, bytes) finally in.close()
      val text = new String(bytes, "UTF-8").trim
      // fail loudly rather than silently un-fence: the write protocol never
      // leaves a torn file, so an unparseable one is outside-protocol
      // corruption and the operator should re-run refresh
      require(text.nonEmpty,
        s"torn snapshot floor at $p — re-run refresh to restore the fence")
      text.toLong
    }
  }

  /** Split repaired dead-letter rows into (fresh, superseded) against the
    * watermark and the snapshot floor: a row is superseded iff the sink has
    * already applied a STRICTLY newer (offset, _ridx) position for its pk,
    * OR a snapshot rebuild observed the row's offset (offset <= floor — the
    * snapshot holds the source's state from a later point, whether or not
    * the pk has a per-pk entry). Rows at the per-pk watermark position
    * exactly are fresh — re-applying them is the idempotent at-least-once
    * case. The watermark side is pruned to the replay's pks before the
    * join — via broadcast when the probe list is small
    * ([[MaxBroadcastProbes]], established by a LIMIT-bounded count, not a
    * full aggregation), via a shuffle join on a bulk repair — so the stored
    * map is never shuffled wholesale for an ordinary replay and a huge one
    * cannot OOM the driver. */
  def splitStale(ready: DataFrame, wm: Option[DataFrame], pk: String,
                 floor: Long = 0L,
                 maxBroadcastProbes: Long = MaxBroadcastProbes)
      : (DataFrame, DataFrame) = {
    val j = wm match {
      case None => ready
        .withColumn("__wmo", lit(null).cast("long"))
        .withColumn("__wmr", lit(null).cast("int"))
      case Some(w) =>
        val probes = ready.select(col(pk)).distinct()
        val wmNamed = w.withColumnRenamed(OffsetCol, "__wmo")
          .withColumnRenamed(RidxCol, "__wmr")
        val probeLimit = math.min(maxBroadcastProbes + 1, Int.MaxValue.toLong).toInt
        val small = probes.limit(probeLimit).count() <= maxBroadcastProbes
        val slice =
          if (small) wmNamed.join(broadcast(probes), Seq(pk))
          else wmNamed.join(probes, Seq(pk))
        ready.join(slice, Seq(pk), "left").localCheckpoint()
    }
    // floor == 0 means "no snapshot ever" and fences nothing, even for a
    // source whose offsets happen to start at 0
    val floorCond: Column =
      if (floor > 0L) col("offset") <= lit(floor) else lit(false)
    val staleCond = floorCond ||
      (col("__wmo").isNotNull &&
        (col("offset") < col("__wmo") ||
          (col("offset") === col("__wmo") && col("_ridx") < col("__wmr"))))
    (j.filter(!staleCond).drop("__wmo", "__wmr"),
      j.filter(staleCond).drop("__wmo", "__wmr"))
  }
}
