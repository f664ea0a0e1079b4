package graft.cdc

import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** U1 plugin surface (reference `plugin.py:8-22`): `preEvent` transforms run
  * on each sync's projected view before compaction (the reference's
  * `pre_event`, 1-row -> 1-row, here as whole-DataFrame transforms so they
  * stay declarative and codegen'd); `postBatch` callbacks fire after each
  * sync's batch is applied (the reference's `post_event`, batched). */
final case class PluginHooks(
    preEvent: Seq[(String, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame] = Seq.empty,
    postBatch: Seq[(String, Long) => Unit] = Seq.empty)

/** The user-facing plugin contract for config-driven loading (the
  * reference's `Plugin` classes with `pre_event`/`post_event`,
  * `plugin.py:8-22`): implement with a no-arg constructor and list the
  * class name under `plugins=` in the CLI config. `preEvent` is a
  * whole-DataFrame transform (so it can broadcast-join, not just map rows);
  * `postBatch` fires after each sync's batch commits. */
trait GraftPlugin {
  /** Tables this plugin applies to (both hooks); empty = every sync. Must
    * be a class constant — it is read once at load time. A preEvent that
    * references table-specific columns MUST scope itself here — the hook
    * runs per sync view, and an unresolved column in one sync's view would
    * otherwise kill the whole multi-table query. */
  def tables: Set[String] = Set.empty
  /** The reference's `is_global` flag (`settings.py:29-36`): true (default)
    * = one singleton instance serves every invocation; false = a FRESH
    * instance is constructed per hook invocation (per sync per micro-batch
    * — the DataFrame-granularity analog of the reference's per-event
    * instantiation), so stateful plugins start clean each batch. */
  def isGlobal: Boolean = true
  def preEvent(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = df
  def postBatch(table: String, batchId: Long): Unit = ()
}

object PluginHooks {
  /** Reflection loader mirroring the reference's dotted-path
    * `load_plugin(str)` (`plugin.py:25-31`, via `importlib`). A class
    * declaring `isGlobal = true` (the default) is instantiated once and
    * reused; `isGlobal = false` re-instantiates per hook invocation
    * (`settings.py:29-36`'s two modes). The probe instance that reads the
    * flags is the singleton in global mode and is discarded otherwise. */
  def load(classNames: Seq[String]): PluginHooks = {
    val loaded = classNames.map(_.trim).filter(_.nonEmpty).map { n =>
      try {
        val ctor = Class.forName(n).getDeclaredConstructor()
        (ctor, ctor.newInstance().asInstanceOf[GraftPlugin])
      } catch { case e: Exception =>
        throw new IllegalArgumentException(
          s"cannot load plugin class '$n' (config key plugins=)", e)
      }
    }
    val hooks = loaded.map { case (ctor, probe) =>
      // table scoping reads from the load-time probe (tables is a class
      // constant by contract), so a non-global plugin is only constructed
      // for hooks it actually serves; hook-time construction failures keep
      // the plugin-name context the load path provides instead of escaping
      // as a bare reflection exception that kills the stream anonymously
      val inst: () => GraftPlugin =
        if (probe.isGlobal) () => probe
        else () => try ctor.newInstance().asInstanceOf[GraftPlugin]
        catch { case e: Exception =>
          throw new IllegalStateException(
            s"cannot re-instantiate non-global plugin " +
              s"'${ctor.getDeclaringClass.getName}' (config key plugins=)", e)
        }
      (probe.tables, inst)
    }
    PluginHooks(
      preEvent = hooks.map { case (scope, inst) =>
        (table: String, df: org.apache.spark.sql.DataFrame) =>
          if (scope.isEmpty || scope(table)) inst().preEvent(df) else df
      },
      postBatch = hooks.map { case (scope, inst) =>
        (table: String, batchId: Long) =>
          if (scope.isEmpty || scope(table)) inst().postBatch(table, batchId)
      })
  }
}

/** The three entry points of the reference (`main.py`): `start` (streaming
  * sync with optional bootstrap backfill), `refresh` (atomic rebuild),
  * `check` (consistency) — re-expressed on Structured Streaming + batch jobs.
  *
  * The reference's coroutine pair + asyncio.Lock + progress store
  * (`main.py:102-140`) collapse into the micro-batch engine: the trigger is
  * the flush interval (B2), each micro-batch is the buffer (B1 compaction
  * runs inside it), and the checkpoint dir is the offset store. The
  * stranded-tail hazard of the reference (size-only trigger leaves a partial
  * buffer unflushed forever — SURVEY.md §2.3) cannot occur: every micro-batch
  * flushes.
  *
  * ==Deployment contract: one driver process per sink state path==
  *
  * Every concurrency protocol below — the per-path state lock, the mutation
  * stamp, the swap monitor, the zone-map marker ownership — serializes
  * writers within ONE driver JVM (refreshAsync tasks, a replay racing a
  * micro-batch). A SECOND driver process mutating the same state path is
  * outside the contract: the swap machinery would still only ever install
  * complete copies, but simultaneous cross-process read-merge-writes are
  * last-copy-wins and silently drop the loser's rows. That premise is
  * ENFORCED fail-loud by [[DriverLease]]: every mutating entry point
  * (applySync, refresh/backfill commit, replayDeadLetters) acquires a
  * heartbeat lease on the state path and a second process fails with a
  * clear message instead of interleaving; a crashed holder's lease is
  * reclaimed after [[graft.model.PipelineConfig.leaseStaleMs]]. For
  * OUT-OF-PROCESS operational commands against a live stream (a CLI
  * `replay`/`refresh` in another JVM), stop the stream first — its
  * shutdown RELEASES the lease immediately (the heartbeat thread's
  * finally), so a planned handoff is instant; only a crashed holder costs
  * the staleness window. A live stream's lease stays fresh even while
  * idle (the heartbeat thread, not just data-bearing batches).
  */
final class Pipeline(spark: SparkSession, config: PipelineConfig,
                     source: CdcSource, sinkRoot: String,
                     hooks: PluginHooks = PluginHooks()) {

  private def statePath(sync: SyncConfig): String = s"$sinkRoot/${sync.indexName}"

  /** Syncs whose NEXT micro-batch must be fenced against the per-pk
    * watermark + snapshot floor: exactly the first batch of each query
    * run — the only batch that can be a checkpoint REPLAY. Re-armed by
    * every [[start]]. See the fence in [[applySyncLocked]]. */
  private val replayFencePending =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** pk column name after rename (the sink is keyed by the OUTPUT name). */
  private def pkOut(sync: SyncConfig): String =
    sync.fields.find(_.src == sync.pk).map(_.out).getOrElse(sync.pk)

  private def mappings(sync: SyncConfig): Seq[FieldMapping] =
    if (sync.fields.nonEmpty) sync.fields
    else sync.schema.get.fields.map(f => FieldMapping(f.name)).toSeq

  /** Sink-side schema after P2 coercion: timestamps -> epoch longs,
    * dates -> strings (reference `schemas.py:21-24`). */
  private def sinkSchema(sync: SyncConfig): StructType = {
    val payload = sync.schema.getOrElse(
      throw new IllegalArgumentException(s"sync '${sync.table}' needs a schema"))
    StructType(mappings(sync).map { m =>
      val f = payload.fields.find(_.name == m.src).getOrElse(
        throw new IllegalArgumentException(s"no payload column '${m.src}'"))
      f.dataType match {
        case TimestampType | TimestampNTZType => StructField(m.out, LongType)
        case DateType                         => StructField(m.out, StringType)
        case dt                               => StructField(m.out, dt)
      }
    })
  }

  /** One sync's view of the envelope stream: F1 table filter + F2 op filter
    * + payload parse + P1/P2 projection/rename/coercion, with the envelope's
    * op/offset kept for compaction and apply, plus the field-presence mask
    * (which raw-JSON keys the event actually carried — output names) so the
    * sink can distinguish explicit-null from absent fields. All declarative —
    * Catalyst prunes the JSON parse to the referenced fields. */
  private def syncView(events: DataFrame, sync: SyncConfig): DataFrame = {
    val payload = sync.schema.get
    val ms = mappings(sync)
    val filtered = Transforms.opFilter(Transforms.tableFilter(events, Seq(sync.table)))
    // Multi-row events: a JSON ARRAY payload is one envelope carrying n rows
    // (MySQL multi-row binlog write). The reference decodes only rows[0]
    // and silently drops rows 1..n (`mysql.py:110-116`, SURVEY.md §2.3);
    // here every row expands to its own change, with the position kept as
    // `_ridx` so later rows of one event win compaction ties.
    // posexplode_outer keeps unparseable payloads as a (null, null) row for
    // the dead-letter path instead of vanishing.
    // rlike, not ltrim+startswith: ltrim strips only ASCII space, so a
    // payload led by tab/newline before '[' would be mis-read as single-row
    // and dead-lettered. \s covers all JSON whitespace.
    val isArray = col("data").rlike("^\\s*\\[")
    val exploded = filtered
      .withColumn("__rows",
        when(isArray, from_json(col("data"), ArrayType(payload)))
          .otherwise(array(from_json(col("data"), payload))))
      .select(col("op"), col("table"), col("offset"), col("data"),
        posexplode_outer(col("__rows")).as(Seq("_ridx", "row")))
    val projected = ms.map { m =>
      val dt = payload.fields.find(_.name == m.src).getOrElse(
        throw new IllegalArgumentException(s"no payload column '${m.src}'")).dataType
      val c = dt match {
        case TimestampType | TimestampNTZType =>
          Transforms.coerceTimestampToEpoch(col(s"row.${m.src}"))
        case DateType => Transforms.coerceDateToString(col(s"row.${m.src}"))
        case _        => col(s"row.${m.src}")
      }
      c.as(m.out)
    }
    // Field presence: from the raw JSON keys for single-row events (explicit
    // null vs absent); for multi-row events from the parsed struct's non-null
    // fields — array elements' raw text isn't individually addressable, and
    // multi-row binlog events are full row images, not partial updates.
    val present = filter(
      array(ms.map { m =>
        when(isArray, when(col(s"row.${m.src}").isNotNull, lit(m.out)))
          .otherwise(
            when(array_contains(expr("json_object_keys(data)"), m.src), lit(m.out)))
      }: _*),
      x => x.isNotNull).as(UpsertSink.PresentCol)
    exploded.select(
      Seq(col("op"), col("table"), col("offset"), col("_ridx")) ++ projected :+ present: _*)
  }

  /** Where events whose payload carries no primary key are quarantined
    * (per sync): the reference raises `KeyError` and dies (`event.py:11`);
    * crashing a 1000-executor pipeline on one malformed event is wrong, and
    * silently compacting all null-pk rows into one key is worse — they are
    * preserved here with their full envelope for replay after repair. */
  def deadLetterPath(sync: SyncConfig): String =
    s"$sinkRoot/_dead_letter/${sync.indexName}"

  /** Apply one micro-batch for one sync: dead-letter split, B1 compaction,
    * then K1 upsert, committed via atomic directory swap. Idempotent —
    * replaying a batch yields the same state (at-least-once -> effectively
    * exactly-once; dead-letter rows carry `offset` so replays dedupe there). */
  private def applySync(batch: DataFrame, sync: SyncConfig, batchId: Long,
                        lineage: String): Unit = {
    applySyncLocked(batch, sync, batchId, lineage)
    // orphaned-marker self-heal (ADVICE r9), OUTSIDE the state lock: after
    // enough consecutive batches could not claim the marker FRESH (a
    // crashed refresh/batch/replay's orphan — see writeCompacted), run the
    // quiesced full rebuild. Its clear is quiesce-gated, so racing a
    // genuinely live refresh is safe (the refresh's commit bumps the stamp
    // and forces a re-scan); the cost of a false positive is one manifest
    // scan. The stream pays the scan inline — bounded, and strictly better
    // than pruning staying disabled forever.
    if (StateCommit.orphanHealDue(statePath(sync))) {
      Pipeline.log.warn(
        s"zone-map marker for ${statePath(sync)} not claimable fresh for " +
          s"${StateCommit.OrphanMarkerHealStreak}+ batches over " +
          s"${StateCommit.orphanMarkerHealMinMs / 1000}+ s — an orphan from " +
          "a crashed refresh/batch/replay; running a quiesced full zone-map " +
          "rebuild to restore pruned reads")
      rebuildZoneMap(sync)
    }
  }

  private def applySyncLocked(batch: DataFrame, sync: SyncConfig, batchId: Long,
                              lineage: String): Unit =
    StateCommit.stateLock(statePath(sync)).synchronized {
    // fail-loud single-driver fence (see the class scaladoc); also the
    // per-batch heartbeat refresh
    DriverLease.acquire(spark, statePath(sync), staleMs = config.leaseStaleMs)
    val pk = pkOut(sync)
    // Persisted for the batch's lifetime (r15, guide §5): the decoded view
    // (from_json ×2 branches, posexplode, json_object_keys per mapping — the
    // batch's dominant per-row CPU) feeds THREE actions per batch — the
    // dead-letter probe, the sink merge, and the watermark advance (plus the
    // dead-letter append when it fires). Unpersisted, each re-ran the whole
    // decode over the cached raw batch; serialized cache cuts that to one
    // decode + cache reads. Batch-sized, freed in the finally below.
    val full = hooks.preEvent.foldLeft(syncView(batch, sync))((df, h) => h(sync.table, df))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
    val dead = full.filter(col(pk).isNull)
    if (!dead.isEmpty)
      dead.write.mode("append").parquet(deadLetterPath(sync))
    val view = full.filter(col(pk).isNotNull)
    // The FIRST micro-batch of a query run may be a checkpoint REPLAY of a
    // batch whose effects a dead-letter replay or a snapshot refresh
    // superseded while the stream was down (r12 OffsetWatermarkFuzzSpec
    // finding: crash -> operator repairs + runs `replay` (or `refresh`) ->
    // stream restarts -> the replayed batch blindly re-upserts the OLD
    // payload over the newer state, and the already-advanced watermark
    // then fences the repair from ever being re-applied — a silent
    // permanent regression). Fence it through the replay path's own
    // splitStale: rows strictly below their pk's applied watermark, or at
    // or below the snapshot floor, are superseded and drop; rows AT the
    // watermark stay (the idempotent re-apply). Later batches of a run
    // cannot be replays (Spark runs each batchId once per query run), so
    // steady state pays no watermark read.
    // Fence identity is sync.indexName — the SAME identity statePath uses —
    // not sync.table: two syncs may share one source table with different
    // target indexes, and a table-keyed fence would be consumed by the first
    // sync's batch, leaving every other sync's first batch unfenced (ADVICE
    // r12).
    val fenced =
      if (replayFencePending.remove(sync.indexName)) {
        val sp = statePath(sync)
        OffsetWatermark.splitStale(view,
          OffsetWatermark.current(spark, sp), pk,
          OffsetWatermark.snapshotFloor(spark, sp))._1
      } else view
    // compact on the envelope, then hand the sink ONLY op + payload (+ mask):
    // the merge treats every unknown change column as schema evolution, so
    // leaking table/offset/_ridx here would evolve them INTO the sink table
    val compacted = Transforms.lastWriteWins(fenced, col(pk), Seq(col("_ridx")))
      .drop("table", "offset", "_ridx")
    try {
      writeCompacted(sync, compacted, batchId, lineage)
      // advance the per-pk applied-offset watermark so a later dead-letter
      // replay can detect (and discard) quarantined payloads this batch —
      // or any newer one — has superseded. Idempotent under checkpoint
      // replay.
      OffsetWatermark.advance(spark, statePath(sync),
        fenced.select(col(pk), col("offset"), col("_ridx")), pk, config.stateBuckets)
    } finally {
      // in a FINALLY: a failure after the sink write landed (splice,
      // marker clear, watermark advance) must still bump, or a concurrent
      // rebuild's quiesce check would miss the committed mutation and
      // clear over a stale scan; over-bumping on a pre-commit failure
      // only forces a harmless re-scan (r9 review)
      StateCommit.mutationStamp(statePath(sync)).incrementAndGet(); ()
    }
    hooks.postBatch.foreach(_(sync.table, batchId))
    } finally { full.unpersist(); () }
  }

  /** Commit one compacted change set to the sync's sink — the shared write
    * tail of the live micro-batch path and the dead-letter replay. */
  /** True iff `sync`'s sink uses the manifest-versioned immutable layout —
    * configured on, or the store already IS one (layout is a property of
    * the store; a restarted driver with a stale config must keep the
    * store's protocol, exactly like the bucket modulus). */
  private def manifestModeFor(sync: SyncConfig): Boolean =
    config.manifestSink ||
      ManifestStore.isManifestStore(spark, statePath(sync))

  /** Loud config-drift fence (review r13 #5): a manifest-layout store
    * under a config whose `state.buckets` was removed must fail with the
    * named repair, not fall through to the flat sink path and die on a
    * parquet-footer read of manifest text files. */
  private def requireBucketsFor(sync: SyncConfig): Int =
    config.stateBuckets.getOrElse(throw new IllegalStateException(
      s"state at ${statePath(sync)} is manifest-layout (state.manifest) " +
        "but state.buckets is unset — restore state.buckets (the layout " +
        "requires a bucket modulus; run refresh to re-lay the store out " +
        "under a different one)"))

  private def writeCompacted(sync: SyncConfig, compacted: DataFrame,
                             batchId: Long, lineage: String): Unit = {
    val pk = pkOut(sync)
    config.stateBuckets match {
      case _ if manifestModeFor(sync) =>
        // manifest layout: data and per-bucket zone-map stats publish in
        // ONE atomic manifest rename, so the whole write-ahead-marker /
        // claim / quiesced-clear protocol of the branch below has no crash
        // window to guard — a batch is either fully visible (data + stats)
        // or not at all. requireBucketsFor fails LOUD if the store is
        // manifest-layout but state.buckets was dropped from the config.
        BucketedUpsertSink.applyBatch(spark, statePath(sync), compacted, pk,
          requireBucketsFor(sync), schema = Some(sinkSchema(sync)),
          manifest = true, statCols = zoneMapColsFor(sync))
      case Some(n) =>
        // write-ahead staleness marker: the sink write and the zone-map
        // refresh are two non-atomic steps; marking BEFORE the write means
        // a crash anywhere in the window leaves a visible marker (pruned
        // reads fall back to the exact unpruned filter) rather than a
        // silently-stale manifest, and the at-least-once batch replay
        // re-runs the refresh and clears it (r6 ADVICE fix).
        // zoneMapActiveFor, not raw config.zoneMapCols: a sync whose
        // schema carries none of the stat columns maintains no manifest,
        // so it must not pay marker round-trips and empty-stats splices
        // per batch (r9 review)
        val zoneMapActive = zoneMapActiveFor(sync)
        // ownership-aware (r9 review): if a refresh's full rebuild already
        // holds the marker, this batch SKIPS the manifest work below
        // entirely — reads ignore the manifest while marked, a splice
        // could be overwritten by the rebuild's already-materialized
        // stats, and the batch's own crash window is covered because the
        // rebuild's quiesce check (the mutation stamp this batch bumps)
        // forces a re-scan that includes this batch before any clear.
        // Same-id re-marking (the at-least-once replay) still owns.
        // The splice-and-release fast path below is licensed by a FRESH
        // claim, or a RE-OWNED one whose orphan window provably guarded no
        // foreign write (StateCommit.MarkerClaim + the foreign-write
        // sidecar, review r10): a marker orphaned by a crash can guard a
        // foreign writer (a dead-letter replay under a batch's orphan)
        // that wrote buckets and skipped its splice — a re-owner that
        // spliced only its own buckets and released would leave those
        // buckets stale under NO marker, the silent-row-loss case. Foreign
        // writers therefore mark the sidecar WRITE-AHEAD; a re-owner that
        // finds it keeps the marker and the quiesced heal below is the
        // only way down, while the common transient-crash replay (sidecar
        // absent) still heals instantly.
        val claim =
          if (zoneMapActive)
            StateCommit.claimMarkerDetailed(spark, zoneMapPath(sync), batchId,
              lineage)
          else StateCommit.ForeignClaim
        // the re-own fast path additionally requires batchId >= 0 (a
        // checkpoint-replayed micro-batch): the checkpoint contract makes
        // a batch retry's write set IDENTICAL to its crashed attempt's, so
        // splicing the retry's buckets covers the orphan window. A
        // dead-letter replay (-2) has NO such contract — the operator can
        // edit the quarantine between attempts, so a retried replay's set
        // can be SMALLER than its crashed predecessor's and the
        // predecessor's extra buckets would go unspliced under no marker
        // (review r10). A DISCARDED/reset checkpoint reuses batch ids too,
        // against orphans whose write sets were entirely different — the
        // claim itself closes that (ADVICE r10): the marker records the
        // checkpoint LINEAGE (the checkpoint's persistent query id)
        // alongside the batch id, and a same-id claim from a different
        // lineage reads FOREIGN, deferring to the quiesced heal.
        val ownsMarker = zoneMapActive &&
          (claim == StateCommit.FreshClaim ||
            (claim == StateCommit.ReOwnedClaim && batchId >= 0L &&
              !StateCommit.hasForeignWrite(spark, zoneMapPath(sync))))
        // EVERY write that will not splice-and-release leaves sidecar
        // evidence WRITE-AHEAD — foreign claimers AND deferring re-owners
        // (review r10): the kept marker is otherwise the only record of
        // the unspliced buckets, and a marker torn or lost out-of-protocol
        // would let a later fresh claimer release over them; the sidecar
        // makes releaseMarker refuse regardless.
        if (zoneMapActive && !ownsMarker)
          StateCommit.markForeignWrite(spark, zoneMapPath(sync))
        // orphan-marker detection (ADVICE r9): ANY marker a batch cannot
        // claim fresh is an orphan or a live rebuild's — crashed refreshes
        // mint never-reused negative ids, crashed batches/replays now KEEP
        // their re-owned markers (above), and live same-JVM writers are
        // serialized by the state lock while cross-process ones are fenced
        // by the lease, so no healthy foreign marker can persist. Count
        // consecutive non-fresh observations; applySync escalates to a
        // quiesced full rebuild after the streak threshold AND a 60 s
        // continuous-observation age (a healthy refresh's brief window
        // never trips it; a spurious heal racing a live rebuild is still
        // CORRECT — both clears are quiesce-gated — just wasted work).
        if (zoneMapActive)
          StateCommit.observeMarkerClaim(statePath(sync), ownsMarker)
        BucketedUpsertSink.applyBatch(spark, statePath(sync), compacted, pk, n,
          schema = Some(sinkSchema(sync)))
        // incremental zone-map maintenance: stats recompute only for the
        // buckets this batch touched — same O(changed data) bound as the
        // sink write itself. The touched-set collect is O(buckets) (the
        // same bounded collect applyBatch does).
        if (ownsMarker) {
          val touched = compacted
            .select(BucketedUpsertSink.bucketOf(col(pk), n)).distinct()
            .collect().map(_.getLong(0)).toSeq
          if (touched.nonEmpty)
            graft.ops.Maintenance.refreshZoneMap(spark, statePath(sync),
              zoneMapPath(sync), touched, zoneMapColsFor(sync))
          StateCommit.releaseMarker(spark, zoneMapPath(sync), batchId)
        }
      case None =>
        val state = UpsertSink.currentState(spark, statePath(sync), sinkSchema(sync))
        val next = UpsertSink.applyBatch(state, compacted, pk)
        // invocation-unique staging with failure cleanup: a live batch and
        // a dead-letter replay can stage for the same sync concurrently
        StateCommit.stageSwap(spark, statePath(sync))(tmp =>
          next.write.mode("overwrite").parquet(tmp))
    }
  }

  /** Re-apply REPAIRED dead-letter rows (the operational close of the
    * quarantine path [[deadLetterPath]] opens): rows whose pk is now
    * non-null — the operator has edited the quarantined parquet, e.g.
    * backfilled ids from the source of truth — run through the SAME
    * offset-ordered compaction + upsert the live batch path uses, and the
    * quarantine dir is rewritten (staging + atomic swap) to keep only the
    * still-unrepaired rows. Crash-safe by idempotence, not atomicity: a
    * crash between the sink apply and the quarantine rewrite re-replays
    * the same rows next run, and last-write-wins on (pk, offset) makes
    * the re-apply a no-op — the same at-least-once -> effectively-
    * exactly-once argument as the micro-batch path itself.
    *
    * Staleness guard (r8 ADVICE medium): a quarantined row carries the
    * source offset it FAILED at, which may predate live batches that have
    * since upserted the same pk — blindly re-applying it would overwrite
    * newer sink state with the stale payload. Repaired rows are therefore
    * screened against the sink's per-pk applied-offset watermark
    * ([[OffsetWatermark]], maintained by every live batch): rows whose
    * (offset, _ridx) position is strictly below the watermark for their pk
    * are SUPERSEDED — dropped from the quarantine without applying (the
    * live data is newer by construction; the row index matters because a
    * multi-row event's applied sibling at the SAME offset may have won
    * last-write-wins on _ridx). This also closes the crash-retry window: a replay
    * retried after interleaved stream writes re-screens and discards what
    * those writes superseded, instead of re-applying it.
    *
    * Snapshot-loaded rows get the sync-LEVEL guard (r9 review): a full
    * rebuild ([[refresh]]/[[backfillIfNeeded]]) loads the source's current
    * state WITHOUT advancing the per-pk watermark, so a pk that only ever
    * appeared in quarantine has no entry and a stale replay would overwrite
    * its refreshed value. Those rebuilds record the snapshot floor — the
    * max offset observed (applied or quarantined) at snapshot time — and
    * replay discards every repaired row at or below it.
    *
    * Returns per-table (replayed, superseded, still quarantined). The
    * reference has no analog: it raises `KeyError` and dies on the first
    * pk-less event (`event.py:11`). */
  def replayDeadLetters(tables: Seq[String] = Seq.empty): Map[String, (Long, Long, Long)] =
    config.syncs
      .filter(s => tables.isEmpty || tables.contains(s.table))
      .map { s => StateCommit.stateLock(statePath(s)).synchronized {
        // single-driver fence: a CLI replay in a second JVM against a live
        // stream fails loud here instead of racing its swaps
        DriverLease.acquire(spark, statePath(s), staleMs = config.leaseStaleMs)
        val path = deadLetterPath(s)
        // heal an interrupted quarantine rewrite first: a crash between
        // atomicSwapDirs' two renames leaves the quarantine only at
        // `.old`, and probing the main path alone would read every
        // envelope as gone (r9 review)
        StateCommit.recoverSwap(spark, path)
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(p)) s.table -> ((0L, 0L, 0L))
        else {
          val pk = pkOut(s)
          val dl = spark.read.parquet(path)
          val ready = dl.filter(col(pk).isNotNull)
          // a repaired row with a NULL offset cannot be ordered against the
          // watermark: the three-valued staleness comparison would place it
          // in NEITHER split and the quarantine rewrite below would DELETE
          // it unapplied — silent loss. Fail loud instead (review r11).
          val nullOffset = ready.filter(col("offset").isNull).count()
          require(nullOffset == 0L,
            s"$nullOffset repaired dead-letter row(s) for '${s.table}' have " +
              "a NULL offset — restore the source offset in the quarantine " +
              "before replaying (the staleness screen cannot order them)")
          val (fresh, stale) = OffsetWatermark.splitStale(
            ready, OffsetWatermark.current(spark, statePath(s)), pk,
            OffsetWatermark.snapshotFloor(spark, statePath(s)))
          val nFresh = fresh.count()
          val nStale = stale.count()
          if (nFresh > 0) {
            val compacted = Transforms
              .lastWriteWins(fresh, col(pk), Seq(col("_ridx")))
              .drop("table", "offset", "_ridx")
            try {
              // lineage: a fixed label — replays have no checkpoint; the
              // -2 id never takes the fast path anyway (see writeCompacted)
              writeCompacted(s, compacted, batchId = -2L,
                lineage = Pipeline.ReplayLineage)
              OffsetWatermark.advance(spark, statePath(s),
                fresh.select(col(pk), col("offset"), col("_ridx")), pk,
                config.stateBuckets)
            } finally {
              // see applySync: the bump must survive a post-commit failure
              StateCommit.mutationStamp(statePath(s)).incrementAndGet(); ()
            }
          }
          if (nFresh > 0 || nStale > 0) {
            // keep only the still-null rows (superseded rows are resolved —
            // newer live data already holds their pk); overwrite via
            // staging + swap so a crash mid-rewrite never loses envelopes
            val remaining = dl.filter(col(pk).isNull)
            StateCommit.stageSwap(spark, path)(tmp =>
              remaining.write.mode("overwrite").parquet(tmp))
          }
          val left = spark.read.parquet(path).filter(col(pk).isNull).count()
          s.table -> ((nFresh, nStale, left))
        }
      }}.toMap

  /** Zone-map manifest path for a sync's sink state. */
  def zoneMapPath(sync: SyncConfig): String = statePath(sync) + ".zonemap"

  // only stat columns the sink schema actually carries: a configured column
  // missing from one sync's payload must not fail that sync's batches
  private def zoneMapColsFor(sync: SyncConfig): Seq[String] = {
    val have = sinkSchema(sync).fieldNames.toSet
    config.zoneMapCols.filter(have)
  }

  /** True iff this pipeline maintains a zone-map manifest for `sync`. */
  private def zoneMapActiveFor(sync: SyncConfig): Boolean =
    config.stateBuckets.isDefined && zoneMapColsFor(sync).nonEmpty

  /** A staged-but-uncommitted full snapshot: the swap layout stages a
    * sibling dir the commit atomically renames live; the manifest layout
    * stages an UNPUBLISHED commit dir the commit publishes with one
    * manifest rename. `abortPath` is what a losing/failing commit drops. */
  private sealed trait StagedSnapshot { def abortPath: String }
  private final case class StagedSwapDir(dir: String) extends StagedSnapshot {
    def abortPath: String = dir
  }
  private final case class StagedManifest(sc: ManifestStore.StagedCommit)
      extends StagedSnapshot {
    def abortPath: String = sc.commitDirAbs
  }

  /** The EXPENSIVE half of refresh/backfill, outside any lock: materialize
    * the full scan into the layout-appropriate staging form. */
  private def stageSnapshot(sync: SyncConfig): (StagedSnapshot, Long) =
    if (manifestModeFor(sync)) {
      val sc = ManifestStore.stageFull(spark, statePath(sync),
        source.fullScan(sync), pkOut(sync), requireBucketsFor(sync),
        zoneMapColsFor(sync))
      (StagedManifest(sc), sc.count)
    } else {
      val (st, n) = SwapRefresh.stage(source.fullScan(sync), statePath(sync),
        config.stateBuckets.map(nb => (pkOut(sync), nb)))
      (StagedSwapDir(st), n)
    }

  /** The shared locked COMMIT of every snapshot-rebuild path (refresh,
    * refreshAsync, backfill): force-own the zone-map marker (stealing an
    * orphan so a crashed batch's replay cannot re-own and clear it
    * mid-rebuild — r9 review), swap the staged snapshot live, record the
    * floor, bump the mutation stamp. One definition so the three paths
    * cannot drift. The manifest layout commits by PUBLISHING the staged
    * manifest instead of a dir swap — no marker to own (stats ride the
    * same atomic rename as the data). */
  private def commitRefreshSwap(sync: SyncConfig, staged: StagedSnapshot,
                                floor: Long,
                                precondition: () => Boolean = () => true): Boolean =
    StateCommit.stateLock(statePath(sync)).synchronized {
      // ONE failure-cleanup scope (review r10: three copy-pasted
      // drop-and-rethrow catches invited the next pre-swap step to forget
      // its fourth): ANY throw out of the commit drops the staged copy —
      // the staging dir is janitor-REGISTERED, and a leaked registration
      // protects a full-snapshot-sized dir from reaping for the JVM's
      // lifetime. After a successful swap the drop is a harmless no-op
      // (the swap MOVED the dir and deregistered it), so the catch need
      // not distinguish pre- from post-swap failures.
      try {
        // single-driver fence BEFORE any mutation of the live path (the
        // staged scan needed no lease — it wrote only its own unique dir)
        DriverLease.acquire(spark, statePath(sync), staleMs = config.leaseStaleMs)
        // evaluated under the lock (backfill's bootstrap-only re-probe);
        // losing it drops the staged copy instead of clobbering
        if (!precondition()) {
          StateCommit.dropStaging(spark, staged.abortPath)
          false
        } else {
          staged match {
            case StagedSwapDir(_) if zoneMapActiveFor(sync) =>
              StateCommit.forceMarker(spark, zoneMapPath(sync),
                Pipeline.freshOwnerId())
            case _ => () // manifest layout: stats ride the publish itself
          }
          try {
            staged match {
              case StagedSwapDir(dir) =>
                StateCommit.atomicSwapDirs(spark, dir, statePath(sync))
              case StagedManifest(sc) =>
                ManifestStore.publishFull(spark, statePath(sync), sc)
            }
            // a floor-record failure AFTER the swap landed leaves the
            // snapshot live but unfenced: a stale dead-letter replay for a
            // snapshot-only pk could then apply over the refreshed value
            // (the r9 hazard the floor exists for). The failure is loud
            // and names the heal — re-running refresh records the floor —
            // but it cannot be made atomic with the dir swap in this
            // harness (a table format's single commit would carry both).
            try OffsetWatermark.recordSnapshotFloor(spark, statePath(sync), floor)
            catch { case t: Throwable =>
              Pipeline.log.error(
                s"snapshot floor for ${statePath(sync)} FAILED to record " +
                  s"after the swap committed: stale dead-letter replays " +
                  s"are not fenced for snapshot-only pks until a refresh " +
                  s"succeeds — re-run refresh before replaying (${t.getMessage})")
              throw t
            }
          } finally {
            // in a FINALLY, like applySync: a floor-record failure after
            // the swap landed must still stamp the committed mutation, or
            // a concurrent rebuild's quiesce check would clear over a
            // scan that missed the new snapshot (r9 review)
            StateCommit.mutationStamp(statePath(sync)).incrementAndGet(); ()
          }
          true
        }
      } catch { case t: Throwable =>
        StateCommit.dropStaging(spark, staged.abortPath); throw t }
    }

  /** Full zone-map rebuild for one sync — the non-incremental path used
    * after [[refresh]]/backfill rebuilds where every bucket may have
    * changed: a full manifest scan whose marker clear is gated on the
    * mutation-stamp quiesce check, with starvation escalation —
    * [[StateCommit.quiescedClear]] (the state table and the full argument
    * live there). */
  /** Layout-aware sink liveness: in manifest mode the state dir EXISTS as
    * soon as an (unpublished, invisible) staging commit is written, so
    * "live" must mean "a manifest version is published" — a dir-existence
    * probe would make the backfill's own staging defeat its bootstrap
    * re-probe. */
  private def sinkLive(sync: SyncConfig): Boolean =
    if (manifestModeFor(sync))
      ManifestStore.liveExists(spark, statePath(sync))
    else UpsertSink.liveExists(spark, statePath(sync))

  private def rebuildZoneMap(sync: SyncConfig): Unit =
    if (manifestModeFor(sync)) () // stats ride every manifest commit itself
    else (config.stateBuckets, zoneMapColsFor(sync)) match {
      case (Some(_), cols) if cols.nonEmpty =>
        StateCommit.quiescedClear(spark, statePath(sync), zoneMapPath(sync))(
          () => graft.ops.Maintenance.computeFullZoneMap(
            spark, statePath(sync), cols))(
          m => graft.ops.Maintenance.publishZoneMap(
            spark, zoneMapPath(sync), m))
      case _ => ()
    }

  /** Max source offset this pipeline has OBSERVED for a sync — applied
    * (per-pk watermark) or quarantined (dead-letter envelopes). A full
    * rebuild records this as the snapshot floor: the snapshot's content is
    * newer than everything observed up to it, so replay must not re-apply
    * any of it. */
  private def observedOffsetCeiling(sync: SyncConfig): Long = {
    // UNDER the state lock (r14): this is the one watermark-store read
    // that ran outside it (refresh/K3 call it before their long scans), and
    // a live batch's advance under the lock rewrites touched _bucket dirs
    // via dynamic partition overwrite — the unlocked mergeSchema read here
    // listed files a concurrent advance then deleted, crashing refresh
    // with FILE_NOT_EXIST mid-footer-read (surfaced by
    // TwoJvmConcurrencySpec under full-suite load). The lock is held for
    // ONE max-aggregate over the narrow (pk, offset, _ridx) sidecar plus
    // the dead-letter max — bounded, nothing like the full source scan the
    // r9 review moved outside the lock; monitors are reentrant so callers
    // already holding the lock are unaffected.
    StateCommit.stateLock(statePath(sync)).synchronized {
    val wmMax = OffsetWatermark.current(spark, statePath(sync))
      .flatMap(w => Option(
        w.agg(max(col(OffsetWatermark.OffsetCol))).head.get(0)))
      .fold(0L)(_.asInstanceOf[Long])
    // same heal as replayDeadLetters: an interrupted quarantine rewrite
    // must not read as an empty dead-letter dir and record a too-low floor
    StateCommit.recoverSwap(spark, deadLetterPath(sync))
    val dlPath = new org.apache.hadoop.fs.Path(deadLetterPath(sync))
    val fs = dlPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dlMax =
      if (!fs.exists(dlPath)) 0L
      else Option(spark.read.parquet(deadLetterPath(sync))
        .agg(max(col("offset"))).head.get(0)).fold(0L)(_.asInstanceOf[Long])
    math.max(wmMax, dlMax)
    }
  }

  /** K3 bootstrap backfill: if `sync.full` and the sink is absent, load the
    * full scan before tailing (`main.py:84-101`). The snapshot floor is
    * captured BEFORE the scan and recorded AFTER the sink lands — see
    * [[refresh]] for the ordering argument. */
  def backfillIfNeeded(): Unit = config.syncs.foreach { sync =>
    if (sync.full && !sinkLive(sync)) {
      // same stage-outside / commit-inside split as [[refresh]]: the full
      // scan must not hold the state lock (a caller that started the
      // stream first would stall every micro-batch for the whole
      // bootstrap scan — r9 review)
      val floor = observedOffsetCeiling(sync)
      val (staging, _) = stageSnapshot(sync)
      // re-probe under the lock: a live batch may have bootstrapped the
      // sink during our scan; K3 is bootstrap-only, and the stream is
      // already building on ITS copy — drop our staging, don't clobber
      val committed = commitRefreshSwap(sync, staging, floor,
        precondition = () => !sinkLive(sync))
      if (committed) rebuildZoneMap(sync)
    }
  }

  /** B2 flush triggers from config (reference `main.py:110-133`):
    * `insert_interval` -> a `ProcessingTime` cadence; unset -> immediate
    * micro-batches (the reference's per-event path — every batch still
    * flushes, so the reference's stranded-tail hazard cannot occur).
    * `insert_size` is admission control, not a trigger: it maps to the
    * source's `maxFilesPerTrigger`/`maxOffsetsPerTrigger` option. */
  def configTrigger: Trigger =
    config.insertIntervalSecs
      .map(s => Trigger.ProcessingTime(s * 1000L))
      .getOrElse(Trigger.ProcessingTime(0L))

  /** `start`: bootstrap + one streaming query applying all syncs per
    * micro-batch. Returns the running query (caller stops it).
    *
    * @param monotonic when true, the envelope stream first passes through
    *   [[graft.streaming.KeyedLastWrite.latestPerKey]]: per-(table, pk)
    *   offset high-water marks in keyed state suppress stale events that
    *   arrive in a LATER micro-batch than a newer event they were reordered
    *   past (SURVEY.md §7 hard part 1 — within-batch reordering is already
    *   handled by B1 compaction; this closes the cross-batch case at the
    *   cost of keyed state proportional to live keys).
    * @param progress optional EXTERNAL progress store (the reference's
    *   file/redis `Progress` backends): committed batch positions are
    *   published through [[ProgressPublisher]] for other applications to
    *   read. Advisory — the checkpoint stays the restart source of truth.
    */
  def start(checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            monotonic: Boolean = false,
            progress: Option[ProgressStore] = None): StreamingQuery = {
    // reference main.py:35-36: `if settings.debug: logger.debug(settings)`
    if (config.debug) DebugLog.record(s"settings: $config")
    // register BEFORE any lease acquisition (backfill's commit, the first
    // batch): a restarted stream must be counted before the OLD query's
    // lingering heartbeat thread runs its shutdown release, or that
    // release deletes the lease this start just re-acquired. The increment
    // runs under the lease's per-path lock so it is atomic with any
    // concurrent releaseLeases' {count == 0 -> release} decision — without
    // it, a release decided on the old count could land between this
    // increment and the first acquire and delete the fresh lease
    // (review r10, twice). A failed start deregisters in the catch.
    config.syncs.foreach(s => DriverLease.locked(statePath(s)) {
      Pipeline.streamRefCount(statePath(s)).incrementAndGet(); ()
    })
    try startRegistered(checkpointDir, trigger, monotonic, progress)
    catch { case t: Throwable =>
      // startRegistered stops any query it started before throwing (ADVICE
      // r10) — by here no stream is running, so deregister-and-release is
      // sound, not a live query left unfenced
      config.syncs.foreach(s => Pipeline.deregisterStream(spark, statePath(s)))
      throw t
    }
  }

  private def startRegistered(checkpointDir: String, trigger: Trigger,
                              monotonic: Boolean,
                              progress: Option[ProgressStore]): StreamingQuery = {
    backfillIfNeeded()
    // arm the first-batch replay fence for every sync (see applySyncLocked)
    config.syncs.foreach(s => replayFencePending.add(s.indexName))
    val changes =
      if (!monotonic) source.changes
      else {
        implicit val sp: SparkSession = spark
        import sp.implicits._
        // None (unknown table / missing / unparseable pk) => the event passes
        // through un-suppressed rather than sharing a keyed-state channel
        // with every other pk-less event (ADVICE r01: "" collapsed them all)
        val pkOfEvent: ChangeEvent => Option[String] = {
          val pkByTable = config.syncs.map(s => s.table -> s.pk).toMap
          e => pkByTable.get(e.table)
            .flatMap(pk => Pipeline.jsonField(e.data, pk))
        }
        graft.streaming.KeyedLastWrite
          .latestPerKey(source.changes.as[ChangeEvent], pkOfEvent).toDF()
      }
    // checkpoint lineage for the zone-map marker (ADVICE r10): resolved
    // LAZILY on the first batch — the checkpoint's metadata file (holding
    // the persistent query id) is written by StreamExecution at start,
    // before any batch runs, but AFTER this closure is built. One value
    // per query run; stable across restarts of the same checkpoint;
    // fresh after a checkpoint reset — exactly the re-own scope.
    val lineageRef = new java.util.concurrent.atomic.AtomicReference[String]()
    val q = changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (lineageRef.get() == null)
          lineageRef.compareAndSet(null,
            Pipeline.checkpointLineage(spark, checkpointDir))
        val lineage = lineageRef.get()
        val cached = batch.persist()
        try {
          // reference main.py:103-104: `if settings.debug:
          // logger.debug(event)` per decoded event — here per micro-batch,
          // with the event dump BOUNDED (a batch at scale carries millions
          // of events; debug output must not grow with data volume)
          if (config.debug) {
            DebugLog.record(s"batch $batchId: ${cached.count()} events")
            cached.toJSON.take(20).foreach(e =>
              DebugLog.record(s"batch $batchId event: $e"))
          }
          config.syncs.foreach(applySync(cached, _, batchId, lineage))
        } finally { cached.unpersist(); () }
      }
      .start()
    // everything between the query starting and this method returning runs
    // under an unwinding guard (ADVICE r10): a throw here (a failing
    // ProgressPublisher.attach, a heartbeat-thread construction failure)
    // would otherwise propagate to start()'s catch, which deregisters the
    // refcount and releases the lease while the query keeps RUNNING —
    // a leaked active stream the caller has no handle to stop, mutating
    // the state path without an idle heartbeat fence. Stop it first.
    try startWired(q, progress)
    catch { case t: Throwable =>
      try q.stop()
      catch { case scala.util.control.NonFatal(s) => t.addSuppressed(s) }
      throw t
    }
  }

  // test seam: runs inside startWired right after the listener attach, so a
  // spec can inject the post-start failure the unwinding guard exists for
  // (a throwing attach is not constructible from the public surface)
  private[cdc] var onStartWired: StreamingQuery => Unit = _ => ()

  private def startWired(q: StreamingQuery,
                         progress: Option[ProgressStore]): StreamingQuery = {
    progress.foreach(ProgressPublisher.attach(spark, q.id, _))
    onStartWired(q)
    // Lease heartbeat + shutdown release (review r10): batches only
    // heartbeat when data flows, so an IDLE-but-live stream's lease would
    // go stale and a second driver's takeover would then crash THIS stream
    // at its next data-bearing batch — the fence evicting the wrong party.
    // A daemon thread touches every sync's lease at a third of the
    // staleness horizon while the query is active, and RELEASES the leases
    // when it terminates, so a graceful stop hands the path over
    // immediately instead of costing the next driver a full staleness
    // window. An acquire refusal here (a foreign takeover already
    // happened) is WARN-logged, not thrown — the batch path is the
    // fail-loud surface.
    val hb = new Thread(() => {
      try {
        val interval = math.max(1000L, config.leaseStaleMs / 3)
        var sinceTouch = interval // touch immediately on start
        while (q.isActive && !Thread.currentThread().isInterrupted) {
          if (sinceTouch >= interval) {
            sinceTouch = 0L
            config.syncs.foreach { s =>
              try DriverLease.acquire(spark, statePath(s), staleMs = config.leaseStaleMs)
              catch {
                case e @ (_: IllegalStateException | _: IllegalArgumentException) =>
                  // IAE (a bad lease.stale.ms) must be LOUD here too: the
                  // stream would otherwise run unfenced until its first
                  // data batch throws it (review r10)
                  Pipeline.log.warn(s"lease heartbeat for ${statePath(s)}: ${e.getMessage}")
                case scala.util.control.NonFatal(_) => ()
              }
            }
          }
          Thread.sleep(200L); sinceTouch += 200L
        }
      } catch { case _: InterruptedException => () }
      finally {
        // deregister (decrement + maybe-release, atomic per path) FIRST,
        // self-remove from the registry LAST: the other order let a
        // releaseLeases find the queue empty, read the not-yet-decremented
        // count, skip the release, and strand the lease past JVM exit on a
        // clean shutdown (review r10)
        config.syncs.foreach(s => Pipeline.deregisterStream(spark, statePath(s)))
        heartbeats.removeIf(_._1 eq Thread.currentThread())
        ()
      }
    }, "graft-lease-heartbeat")
    heartbeats.add((hb, q))
    hb.setDaemon(true)
    hb.start()
    q
  }

  // this pipeline's heartbeat threads WITH their queries — releaseLeases
  // stops only those whose query has terminated, so shutdown hygiene on a
  // finished query can never kill a still-active restarted stream's
  // heartbeat (review r10)
  private val heartbeats =
    new java.util.concurrent.ConcurrentLinkedQueue[(Thread, StreamingQuery)]()

  /** Shutdown hygiene: stop-and-join the heartbeat threads of TERMINATED
    * queries (an in-flight interval touch could otherwise recreate a lease
    * just released and strand it past JVM exit) and release each sync's
    * lease — but only where NO stream is still active on the path, so the
    * call is safe at any time: a live (possibly restarted) stream keeps
    * both its heartbeat and its lease (review r10). The CLI calls it after
    * `awaitTermination` and in the one-shot verbs' finally, so a planned
    * same-path handoff never pays the staleness window. */
  def releaseLeases(): Unit = {
    // save-and-CLEAR a pending interrupt for the whole hygiene pass
    // (review r10, the right depth): an interrupt-driven shutdown arrives
    // here with the flag restored by rethrowIfInterrupt, and EVERY
    // blocking step below — join, the timed tryLock, Hadoop's fs.delete —
    // aborts instantly on a pending flag, silently stranding the lease.
    // The flag is restored on exit so the caller's interrupt semantics
    // survive.
    val wasInterrupted = Thread.interrupted()
    try releaseLeasesCleanFlag()
    finally if (wasInterrupted) Thread.currentThread().interrupt()
  }

  private def releaseLeasesCleanFlag(): Unit = {
    // stop only heartbeats whose query has TERMINATED (review r10: an
    // unconditional interrupt loop would kill a still-active restarted
    // stream's heartbeat and leave it running unfenced)
    val it = heartbeats.iterator()
    while (it.hasNext) {
      val (t, query) = it.next()
      if (!query.isActive) {
        it.remove()
        t.interrupt()
        try t.join(3000L) catch { case _: InterruptedException => () }
        if (t.isAlive)
          Pipeline.log.warn("lease heartbeat thread did not stop within 3s " +
            "(wedged in a filesystem call?) — the gated release below " +
            "skips any path it still counts on or whose lock it holds")
      }
    }
    // the gated, bounded-tryLock release per path — see releasePathIfUnused
    config.syncs.foreach(s => Pipeline.releasePathIfUnused(spark, statePath(s)))
    ()
  }

  /** `refresh`: atomic rebuild of each sync from a full scan
    * (`main.py:143-176`; offset pinning is the caller's checkpoint). The
    * configured sink layout (state.buckets) carries onto the rebuilt copy —
    * the reference's settings-copy-on-refresh (`meili.py:43-49`).
    *
    * Snapshot-floor ordering (r9 review): the observed-offset ceiling is
    * captured BEFORE the full scan starts and recorded AFTER the swap
    * commits. A live stream running concurrently (the refreshAsync shape)
    * can therefore only push real observations ABOVE the recorded floor —
    * their repairs stay replayable (conservative) — never trap a
    * post-snapshot quarantine below it (which would silently discard a
    * legitimate repair). */
  def refresh(tables: Seq[String] = Seq.empty): Map[String, Long] =
    config.syncs
      .filter(s => tables.isEmpty || tables.contains(s.table))
      .map { s =>
        val floor = observedOffsetCeiling(s)
        // stage (the full-scan materialization) runs OUTSIDE the state
        // lock so a live stream keeps flowing through the long scan; only
        // the commit — swap + floor record — serializes with applySync.
        // Unlocked, a batch's read-merge-write racing the swap silently
        // dropped whichever complete copy lost while the floor still
        // asserted the snapshot superseded everything below it (r9 review)
        val (staging, n) = stageSnapshot(s)
        commitRefreshSwap(s, staging, floor)
        // every bucket may have changed under the swap — rebuild, don't
        // splice. Outside the lock (the stream keeps flowing); clears the
        // marker only after a quiesced scan, retries a swap-broken one
        rebuildZoneMap(s)
        s.table -> n
      }
      .toMap

  /** Async [[refresh]]: fire each sync's rebuild as a [[SinkTasks]] task
    * and return the ids — the reference's fire-then-gather refresh
    * (`meili.py:56-63`); pair with [[SinkTasks.waitForTask]] and a
    * timeout (its `wait_for_task_timeout`). The zone-map rebuild runs
    * INSIDE each task, after its swap, so an awaited task implies a
    * fresh manifest. */
  def refreshAsync(tables: Seq[String] = Seq.empty): Map[String, Long] =
    config.syncs
      .filter(s => tables.isEmpty || tables.contains(s.table))
      .map { s =>
        s.table -> SinkTasks.submit(s"refresh:${s.table}") {
          // ceiling captured inside the task but BEFORE its scan — same
          // conservative ordering as the synchronous refresh; commit
          // (marker + swap + floor) under the state lock, scans outside it
          val floor = observedOffsetCeiling(s)
          val (staging, _) = stageSnapshot(s)
          commitRefreshSwap(s, staging, floor)
          rebuildZoneMap(s)
        }
      }
      .toMap

  /** Zone-map marker status per table: `Some(ownerId)` when a pending
    * marker is up (pruned reads are falling back to exact unpruned
    * filters), `None` when the manifest is clean or the sync maintains no
    * zone map. An owner that persists across `check` runs with no refresh
    * in flight is an orphan from a crashed refresh/batch/replay — the
    * live stream self-heals it after [[StateCommit.OrphanMarkerHealStreak]]
    * batches over [[StateCommit.orphanMarkerHealMinMs]], or re-running
    * `refresh` clears it immediately (ADVICE r9). */
  def zoneMapStatus(): Map[String, Option[Long]] = config.syncs.map { s =>
    s.table -> (if (zoneMapActiveFor(s))
      StateCommit.markerOwner(spark, zoneMapPath(s))
    else None)
  }.toMap

  /** Lease status per sync (the `check` surface — r10 verdict #7): the
    * lease path, and the holder's identity + heartbeat age (ms) if held.
    * An operator diagnosing a refused second driver sees who holds what
    * without reading `<statePath>.lease` by hand. */
  def leaseStatus(): Map[String, (String, Option[(String, Long)])] =
    config.syncs.map { s =>
      s.table -> ((DriverLease.leasePath(statePath(s)),
        DriverLease.holder(spark, statePath(s))))
    }.toMap

  /** `check`: source count vs sink count per sync (`main.py:179-208`). */
  def check(): Map[String, (Long, Long)] = config.syncs.map { s =>
    val sinkCount =
      if (manifestModeFor(s))
        // the manifest carries per-bucket row counts published atomically
        // with the data — the count is O(buckets) text, no scan at all
        ManifestStore.currentManifest(spark, statePath(s)).fold(0L)(_.rowCount)
      else if (UpsertSink.liveExists(spark, statePath(s)))
        spark.read.parquet(statePath(s)).count()
      else 0L
    s.table -> (source.count(s), sinkCount)
  }.toMap

  /** Read one sync's current sink state (test/inspection helper); the
    * bucketed layout's partition column is internal and dropped. */
  def sinkState(sync: SyncConfig): DataFrame =
    if (manifestModeFor(sync))
      ManifestStore.readState(spark, statePath(sync), sinkSchema(sync))
        .drop(BucketedUpsertSink.BucketCol)
    else
      spark.read.parquet(statePath(sync)).drop(BucketedUpsertSink.BucketCol)
}

object Pipeline {
  // zone-map marker owner ids for refresh/backfill rebuilds: strictly
  // negative (never colliding with micro-batch ids >= 0 or the replay's
  // -2) and unique per invocation
  private val ownerSeq = new java.util.concurrent.atomic.AtomicLong(-100L)
  private[cdc] def freshOwnerId(): Long = ownerSeq.decrementAndGet()

  private[cdc] val log = org.slf4j.LoggerFactory.getLogger("graft.pipeline")

  // Active streaming queries per state path (this JVM): the lease
  // heartbeat's shutdown release is gated on being the LAST one, so a
  // restarted stream's freshly re-acquired lease survives the old query's
  // lingering heartbeat thread (review r10). EVERY transition that can
  // decide a release runs under DriverLease.pathLock so register/acquire
  // and count-check/release cannot interleave.
  private val streamRefCounts = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()
  private[cdc] def streamRefCount(statePath: String): java.util.concurrent.atomic.AtomicLong =
    streamRefCounts.computeIfAbsent(statePath,
      _ => new java.util.concurrent.atomic.AtomicLong())

  /** Atomic {decrement; if last -> release} for one stream on one path —
    * the single deregistration used by the heartbeat's finally and a
    * failed start's unwinding. BLOCKING lock: the deregistering thread
    * must complete its own transition. */
  private[cdc] def deregisterStream(spark: SparkSession, statePath: String): Unit = {
    // the caller is typically a JUST-INTERRUPTED heartbeat running its
    // finally: clear the flag for the release's filesystem I/O (Hadoop
    // RPC aborts instantly on a pending interrupt) and restore it after
    // (review r10)
    val wasInterrupted = Thread.interrupted()
    try DriverLease.locked(statePath) {
      if (streamRefCount(statePath).decrementAndGet() == 0L) {
        try DriverLease.release(spark, statePath)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    } finally if (wasInterrupted) Thread.currentThread().interrupt()
  }

  /** The gated shutdown release for one path: release iff NO stream is
    * registered, with the count re-checked under the path lock (a
    * concurrent start's register+acquire cannot interleave), and the lock
    * taken with a BOUNDED tryLock — a heartbeat wedged in an
    * interrupt-deaf filesystem RPC can hold this lock indefinitely
    * (possibly with the count already 0, mid-release), and shutdown must
    * skip such a path instead of hanging on the RPC's retry budget
    * (review r10). Returns true iff the lease was released. Shared by
    * [[Pipeline.releaseLeases]] and the lifecycle spec so the gating logic
    * cannot drift from what is tested. */
  private[cdc] def releasePathIfUnused(spark: SparkSession, statePath: String,
                                       tryMs: Long = DriverLease.TornGraceMs + 10000L): Boolean = {
    if (streamRefCount(statePath).get() != 0L) return false
    val l = DriverLease.pathLock(statePath)
    // untimed tryLock FIRST: it ignores a pending interrupt status, which
    // the timed form throws on instantly even for a FREE lock — and an
    // interrupt-driven shutdown (rethrowIfInterrupt restores the flag) is
    // exactly when this runs (review r10). The timed fallback bounds the
    // contended case; its default exceeds acquire's worst in-lock budget
    // (TornGraceMs + 5 s of deadline + retry sleeps), so a HEALTHY holder
    // — e.g. a background task's acquire waiting out a torn lease — is
    // waited for, not misclassified as wedged (review r10).
    val got = l.tryLock() ||
      (try l.tryLock(tryMs, java.util.concurrent.TimeUnit.MILLISECONDS)
       catch { case _: InterruptedException =>
         Thread.currentThread().interrupt(); false })
    if (!got) {
      log.warn(s"lease lock for $statePath is held (a wedged heartbeat?) — " +
        "skipping its shutdown release; the holder finishes it, or the " +
        "next driver pays the staleness window")
      return false
    }
    try {
      if (streamRefCount(statePath).get() == 0L) {
        try { DriverLease.release(spark, statePath); true }
        catch { case scala.util.control.NonFatal(_) => false }
      } else false
    } finally l.unlock()
  }

  /** Lineage label for dead-letter replays (no checkpoint — the constant
    * -2 owner id never takes the re-own fast path regardless). */
  private[cdc] val ReplayLineage = "replay"

  /** The checkpoint LINEAGE token recorded in zone-map markers (ADVICE
    * r10): the persistent streaming-query id from the checkpoint's
    * `metadata` file — stable across restarts of the SAME checkpoint
    * (where the batch-id write-set contract holds) and fresh after a
    * checkpoint discard/reset (where replayed ids 0,1,2,… carry no
    * relation to an old orphan's write set). Unreadable metadata falls
    * back to a fresh UUID — conservative: same-id re-owns then read
    * foreign and defer to the quiesced heal, never splice-and-release. */
  private[graft] def checkpointLineage(spark: SparkSession,
                                       checkpointDir: String): String =
    try {
      val p = new org.apache.hadoop.fs.Path(checkpointDir, "metadata")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      val body = try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(0, bytes); new String(bytes, "UTF-8")
      } finally in.close()
      val id = JsonMapper.mapper.readTree(body).get("id")
      require(id != null && !id.isNull && id.asText().nonEmpty)
      id.asText()
    } catch { case scala.util.control.NonFatal(e) =>
      val fallback = java.util.UUID.randomUUID().toString
      log.warn(s"cannot read streaming-query id from $checkpointDir/metadata " +
        s"(${e.getMessage}) — using a fresh lineage token; crashed-batch " +
        "markers will heal via the quiesced rebuild instead of the fast path")
      fallback
    }

  /** Extract a top-level field from a JSON object string as a stable string
    * key (executor-side; uses Spark's shaded-in Jackson). */
  private[cdc] def jsonField(json: String, field: String): Option[String] = {
    try {
      val node = JsonMapper.mapper.readTree(json).get(field)
      if (node == null || node.isNull) None else Some(node.asText())
    } catch { case _: Exception => None }
  }

  private object JsonMapper {
    lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  }
}
