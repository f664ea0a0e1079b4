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

  /** Column name of the optional field-presence mask: an array of payload
    * column names that the event's raw payload actually carried. With it,
    * an explicitly-null field OVERWRITES the stored value (Meilisearch
    * `update_documents` overwrites every listed field, null included) and
    * only genuinely absent fields keep the old value. */
  val PresentCol = "_present"

  /** Apply one micro-batch of per-pk-compacted change rows to the current
    * state table.
    *
    * @param state   current table state (columns = payload columns; may be empty)
    * @param changes batch rows: an `op` column + payload columns, already
    *                last-write-wins-compacted per pk ([[Transforms.lastWriteWins]]).
    *                May carry a [[PresentCol]] field-presence mask; without
    *                it, null fields are treated as absent (explicit-NULL
    *                updates are then unsupported — the coalesce fallback).
    * @param pk      primary-key column name
    * @return        new state
    */
  def applyBatch(state: DataFrame, changes: DataFrame, pk: String): DataFrame = {
    // Schema evolution, both directions (the reference is SCHEMALESS —
    // `data: dict`, whatever the connector decodes flows through, so fields
    // appear and disappear mid-stream):
    //  - a field first seen in this batch extends the table; pre-existing
    //    rows read null for it
    //  - a field the batch doesn't carry is preserved from state for every
    //    touched row (same semantics as a non-present masked field)
    val changeTypes = changes.schema
      .filterNot(f => f.name == "op" || f.name == PresentCol)
      .map(f => f.name -> f.dataType).toMap
    val newCols = changes.columns
      .filterNot(n => n == "op" || n == PresentCol)
      .filterNot(state.columns.contains)
    val payloadCols = state.columns.toSeq ++ newCols
    require(state.columns.contains(pk), s"state table has no pk column '$pk'")
    val hasMask = changes.columns.contains(PresentCol)

    val s = state.alias("s")
    val c = changes.alias("c")
    val joined = s.join(c, col(s"s.$pk") === col(s"c.$pk"), "full_outer")
    def sCol(name: String) =
      if (state.columns.contains(name)) col(s"s.$name")
      else lit(null).cast(changeTypes(name))
    def cCol(name: String) =
      if (changeTypes.contains(name)) col(s"c.$name")
      else lit(null).cast(state.schema(name).dataType)

    // Row survives unless the change for its pk is a delete; column-wise:
    // a `create` replaces the whole document (reference add_documents,
    // `meili.py:129`) — in BOTH branches: without the mask, letting a
    // create coalesce with stored state would leak a deleted-then-recreated
    // row's old fields into the new document (r9 review) — while an
    // `update` overwrites exactly the fields the event carried (mask) /
    // the non-null fields (no mask), keeping the rest.
    val merged = joined
      .filter(col("c.op").isNull || col("c.op") =!= Op.Delete)
      .select(payloadCols.map { name =>
        val applied =
          if (hasMask)
            when(col("c.op") === Op.Create, cCol(name))
              .otherwise(when(array_contains(col(s"c.$PresentCol"), name), cCol(name))
                .otherwise(sCol(name)))
          else
            when(col("c.op") === Op.Create, cCol(name))
              .otherwise(coalesce(cCol(name), sCol(name)))
        when(col("c.op").isNull, sCol(name))                 // unchanged row
          .otherwise(applied)
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
    // compact on the envelope, then drop its columns: with schema evolution
    // in the merge, leaking table/offset/ts/data here would evolve them
    // INTO the state table (same hazard Pipeline.applySync guards).
    // _ridx, when the batch carries it, joins the tiebreak: rows of one
    // multi-row event share (pk, offset) and the LATER row must win
    // deterministically — the same contract Pipeline.applySync enforces
    // (r9 review: without it the winner was partition-order nondeterminism
    // and a replay could flip it).
    val tiebreak =
      if (batch.columns.contains("_ridx")) Seq(col("_ridx")) else Seq.empty
    val compacted = Transforms.lastWriteWins(batch, col(pk), tiebreak)
      .drop("table", "offset", "ts", "data", "_ridx")
    val next = applyBatch(state, compacted, pk)
    // two-phase write: next state to a versioned dir, then pointer swap —
    // keeps the apply atomic without a table format in the offline harness
    stageSwap(spark, statePath)(tmp =>
      next.write.mode("overwrite").parquet(tmp))
  }

  /** Invocation-unique staging dir for a swap into `live`: a shared fixed
    * `.next` name lets two concurrent writers — a live micro-batch racing
    * a dead-letter replay on the same sync, or overlapping refresh tasks —
    * interleave writes in ONE staging dir and swap a torn mix live
    * (r9 review; the SwapRefresh discipline). The swap MOVES the dir, so
    * success leaves nothing behind; a crashed writer strands only its own
    * uniquely-named dir, never corrupts a peer's. */
  private[graft] def stagingDir(live: String): String = {
    val d = live + ".next-" + java.util.UUID.randomUUID().toString.take(8)
    // register with the janitor BEFORE any file exists: a staging dir's
    // mtime freezes at job start (all write activity happens under
    // _temporary), so age alone cannot distinguish a long-running write
    // from a crash leftover — the registry is what protects an in-JVM
    // writer however long its job runs (r9 review)
    activeStaging.add(new org.apache.hadoop.fs.Path(d).getName)
    d
  }

  /** The staged-write-then-swap pattern with failure cleanup: a staged
    * write that THROWS (task failure, disk full) used to leave its partial
    * dir on disk AND registered with the janitor — protected from reaping
    * forever, the exact leak the janitor exists to fix (r9 review). The
    * dir is dropped (and unregistered) on any failure; the caller's retry
    * stages fresh. */
  private[graft] def stageSwap(spark: SparkSession, live: String)
                              (write: String => Unit): Unit = {
    val tmp = stagingDir(live)
    try {
      write(tmp)
      atomicSwapDirs(spark, tmp, live)
    } catch {
      case t: Throwable => dropStaging(spark, tmp); throw t
    }
  }

  /** Abandon a staged dir without swapping it (e.g. a backfill that lost
    * the bootstrap race): delete it and release its janitor registration. */
  private[graft] def dropStaging(spark: SparkSession, staging: String): Unit = {
    val (fs, p) = hfs(spark, staging)
    try { fs.delete(p, true); () }
    catch { case _: java.io.IOException => () }
    activeStaging.remove(p.getName)
    ()
  }

  // staging dirs currently owned by a writer in THIS JVM — never reaped
  private val activeStaging =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Janitor reap horizon: an UNREGISTERED staging dir (no live writer in
    * this JVM) older than this is presumed crash-stranded and reaped. The
    * default (1 h) covers every in-repo rebuild with two orders of margin;
    * a deployment staging multi-hour cross-process full scans (a CLI
    * refresh in one JVM while a stream commits swaps in another — outside
    * the registry's visibility) must RAISE it past its longest stage
    * duration, or the scan loses its staging copy mid-write and fails at
    * swap time — safe (the rebuild re-runs) but expensive (ADVICE r9).
    * Reaped dirs are WARN-logged so that later swap failure is diagnosable
    * back to the reap. */
  @volatile private[graft] var stagingReapHorizonMs: Long = 3600L * 1000L
  /** Configure the janitor horizon (see [[stagingReapHorizonMs]]). */
  def setStagingReapHorizonMs(ms: Long): Unit = {
    require(ms > 0, s"staging reap horizon must be positive, got $ms")
    stagingReapHorizonMs = ms
  }
  private val sweepLog = org.slf4j.LoggerFactory.getLogger("graft.janitor")
  // amortizes the janitor's listStatus to every 32nd swap per live path
  private val sweepTick = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()

  def currentState(
      spark: SparkSession,
      statePath: String,
      schema: org.apache.spark.sql.types.StructType
  ): DataFrame =
    if (liveExists(spark, statePath)) spark.read.parquet(statePath)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Resolve a path against the session's Hadoop conf — works for local,
    * HDFS, S3A, … (a bare `java.io.File` probe silently treats any remote
    * sink as absent — ADVICE r01). */
  private def hfs(spark: SparkSession, p: String) = {
    val path = new org.apache.hadoop.fs.Path(p)
    (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
  }

  /** True iff the live state dir exists, after healing any interrupted swap. */
  def liveExists(spark: SparkSession, live: String): Boolean = {
    recoverSwap(spark, live)
    val (fs, p) = hfs(spark, live)
    fs.exists(p)
  }

  // Per-live-path monitor serializing same-JVM swappers and healers: the
  // rename-retry machinery below tolerates cross-process racers, but two
  // in-process swappers (overlapping refreshAsync tasks; a replay racing a
  // batch on a sidecar) interleaving exists-probes with deletes left narrow
  // TOCTOU windows where a crash could strand a path with NEITHER live nor
  // `.old` (r9 review). Every advertised concurrent shape is in-JVM, so the
  // monitor closes those windows outright; the retries remain for readers
  // in other processes.
  private val swapLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[graft] def swapLock(live: String): Object =
    swapLocks.computeIfAbsent(live, _ => new Object)

  /** Heal [[atomicSwapDirs]]'s crash window: a crash between the two renames
    * leaves no live dir but a complete `.old` — restore it. The state then
    * reflects the pre-batch version; the streaming checkpoint replays the
    * un-committed batch and the idempotent apply makes the replay safe. */
  private[graft] def recoverSwap(spark: SparkSession, live: String): Unit =
    swapLock(live).synchronized {
    val (fs, p) = hfs(spark, live)
    val old = new org.apache.hadoop.fs.Path(live + ".old")
    if (!fs.exists(p) && fs.exists(old)) {
      // a swapper in ANOTHER process can finish and DELETE `.old` between
      // our exists probe and this rename — the vanished source means live
      // is healthy again, so the failed heal is a no-op, not an error
      // (caught by the r9 swap-race stress spec)
      try { fs.rename(old, p); () }
      catch { case _: java.io.FileNotFoundException => () }
    }
  }

  /** Directory pointer swap (stand-in for Delta/Iceberg atomic commit in the
    * zero-dependency harness): move live aside, move next into place. Each
    * rename is atomic (same-volume dir rename); the window between them is
    * recoverable — every read path calls [[recoverSwap]] first.
    *
    * Concurrent-swap race (r9 review): a reader's [[recoverSwap]] firing
    * INSIDE our two-rename window sees no live + a complete `.old` and
    * resurrects the old copy — then our `next -> live` rename fails because
    * live exists again. Whatever sits at `live` when that rename fails is
    * a COMPLETE directory (the resurrected old copy, or — under two
    * concurrent refreshes, each swapping its own invocation-unique staging
    * dir — the other refresh's finished copy), so the swap RETRIES: move it
    * aside and rename again. Retrying never installs a torn state, only
    * decides which complete copy ends up live; bounded — each retry
    * requires another racer in the exact window. */
  private[graft] def atomicSwapDirs(spark: SparkSession, next: String, live: String): Unit =
    swapLock(live).synchronized {
    recoverSwap(spark, live) // heal any earlier interrupted swap first
    val (fs, livePath) = hfs(spark, live)
    val old = new org.apache.hadoop.fs.Path(live + ".old")
    // only clear `.old` while a live copy exists: if live is absent, `.old`
    // may be the ONLY complete copy (a cross-process swapper mid-window) and
    // deleting it would let a crash strand the path with neither (r9 review)
    if (fs.exists(livePath) && fs.exists(old)) fs.delete(old, true)
    // the aside itself can race a swapper in another process: both pass the
    // exists probe, the loser's rename finds the source vanished (the winner
    // took it) — live is then in the winner's hands, so just proceed; a
    // rename blocked by a racer-recreated `.old` re-clears it (under the
    // same live-exists guard) and retries (r9 review)
    var asideTries = 0
    while (fs.exists(livePath) &&
           !(try fs.rename(livePath, old)
             catch { case _: java.io.FileNotFoundException => false })) {
      asideTries += 1
      require(asideTries <= 8, s"rename $live -> $old failed ($asideTries attempts)")
      if (fs.exists(livePath)) fs.delete(old, true)
    }
    val nextPath = new org.apache.hadoop.fs.Path(next)
    var attempts = 0
    while (!fs.rename(nextPath, livePath)) {
      attempts += 1
      require(attempts <= 8, s"rename $next -> $live failed ($attempts attempts)")
      if (fs.exists(livePath)) {
        // a complete copy got (re)installed at live (a reader's heal, or a
        // cross-process racer's finished swap): move it aside and retry.
        // TOLERANT, not a bare require — the copy can vanish again mid-move
        // (another racer took it), which just means the retry probe re-runs
        // (r9 review: the single-attempt require aborted swaps spuriously)
        fs.delete(old, true)
        try { fs.rename(livePath, old); () }
        catch { case _: java.io.FileNotFoundException => () }
      }
    }
    if (fs.exists(old)) fs.delete(old, true)
    activeStaging.remove(nextPath.getName)
    sweepStaleStaging(fs, livePath)
    ()
  }

  /** Janitor for crash-stranded staging dirs: invocation-unique staging
    * (`<live>.next-*` / `<live>.staging-*`) self-cleans on success (the
    * swap MOVES it) but a crashed writer strands its copy forever — the
    * fixed-name scheme it replaced was at least reclaimed by the next
    * run's overwrite (r9 review). Reaps siblings matching the staging
    * patterns that are (a) NOT registered to a live writer in this JVM —
    * the authoritative liveness signal, since a dir's mtime freezes at job
    * start and a long scan would otherwise look stale mid-write — AND
    * (b) older than [[stagingReapHorizonMs]] by a TRUSTED mtime
    * (zero/unknown mtimes, e.g. object-store fake directories, are never
    * reaped). A cross-process writer stalled past the horizon loses only
    * its staging copy — its own swap then fails LOUDLY and the rebuild
    * re-runs, never silent corruption — and each reap is WARN-logged with
    * the dir name and age so that swap failure traces back here. Runs
    * after every 32nd successful swap per path (one listStatus RPC
    * amortized across micro-batch commits) and NEVER fails the
    * already-committed swap it rides on. */
  private def sweepStaleStaging(fs: org.apache.hadoop.fs.FileSystem,
                                livePath: org.apache.hadoop.fs.Path): Unit =
    try {
      val tick = sweepTick.computeIfAbsent(livePath.toString,
        _ => new java.util.concurrent.atomic.AtomicLong())
      if (tick.incrementAndGet() % 32L != 1L) return
      val parent = livePath.getParent
      if (parent == null || !fs.exists(parent)) return
      val name = livePath.getName
      val now = System.currentTimeMillis()
      val horizon = now - stagingReapHorizonMs
      fs.listStatus(parent).foreach { st =>
        val n = st.getPath.getName
        if ((n.startsWith(name + ".next-") || n.startsWith(name + ".staging-")) &&
            !activeStaging.contains(n) &&
            st.getModificationTime > 0 && st.getModificationTime < horizon) {
          try {
            if (fs.delete(st.getPath, true))
              sweepLog.warn(
                s"reaped stale staging dir ${st.getPath} (age " +
                  s"${(now - st.getModificationTime) / 1000}s > horizon " +
                  s"${stagingReapHorizonMs / 1000}s, no registered writer " +
                  "in this JVM); if a cross-process rebuild owned it, its " +
                  "swap will fail and must re-run — raise " +
                  "UpsertSink.setStagingReapHorizonMs for long rebuilds")
            ()
          }
          catch { case _: java.io.IOException => () }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () }
}
