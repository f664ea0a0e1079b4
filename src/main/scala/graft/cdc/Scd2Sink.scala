package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD type-2 HISTORY sink — the warehouse complement of [[UpsertSink]]:
  * where the upsert sink keeps only the latest row per key (the
  * reference's index semantics), this sink keeps EVERY version as a
  * [valid_from, valid_to) interval row, closing the previously-open
  * version when a key's next change arrives in a later micro-batch.
  * Runs per micro-batch (`foreachBatch`-shaped, like the other sinks).
  *
  * Contract: per key, events arrive in non-decreasing (ts, version) order
  * across batches — replication order, which is what the CDC sources
  * deliver; `version` compares with its column type's natural ordering,
  * the SAME ordering the interval window uses (numeric for numeric ids,
  * lexicographic for strings — no hidden numeric cast that would order
  * the guard differently from the window, or null out non-numeric ids).
  * A batch event that sorts at-or-before a key's open version would
  * interleave history; it is counted and REJECTED loudly (fail-stop)
  * rather than silently appended out of order — the same fail-loud
  * stance as the dead-letter path. The guard compares raw event-time
  * MICROSECONDS (stored internally as `__ts_us`) plus the version id —
  * second-truncated interval bounds cannot see a same-second reordering.
  *
  * Idempotent under at-least-once replay, loud under conflict: rows whose
  * (key, version, ts) triple already exists in the state are dropped up
  * front (a replayed batch — crash after the swap committed, before the
  * streaming checkpoint did — is a no-op; the swap is atomic, so state
  * holds either none or all of a batch). A row that REUSES an existing
  * (key, version) with a different ts is not a replay but corruption in
  * the making, and is rejected before the order guard runs.
  *
  * State layout: one parquet dir of interval rows, open versions having
  * null valid_to; `is_current` is derived on read, not stored. EVERY
  * write (first batch included) goes through the same staging +
  * atomic-pointer-swap protocol as [[UpsertSink]] (crash window healed on
  * next read) — a direct first write would let a mid-write crash leave a
  * partial dir that later reads accept as complete state. At 100 TB the
  * state is bucketed by key or a lakehouse MERGE (close + append are both
  * keyed upserts); the full-rewrite harness version keeps the protocol
  * honest at fixture scale — see SCALE.md.
  */
object Scd2Sink {

  /** Apply one micro-batch of `(key, version, ts, payload...)` rows.
    * `tsCol` must be a timestamp column; emitted intervals are epoch
    * seconds (the sink coercion rule, reference schemas.py:21-22). */
  def applyBatch(spark: SparkSession, statePath: String, batch: DataFrame,
                 key: String, version: String, tsCol: String): Unit = {
    StateCommit.recoverSwap(spark, statePath)
    val stored = readRaw(spark, statePath)
    stored.foreach { state =>
      // clear upgrade error instead of UNRESOLVED_COLUMN mid-plan: state
      // written by a sink version without the ordering column cannot be
      // guarded correctly and needs a rebuild
      require(state.columns.contains("__ts_us"),
        s"state at $statePath lacks the __ts_us ordering column " +
          "(written by an incompatible Scd2Sink); rebuild the history")
    }

    // intra-batch replay idempotence, mirroring the cross-batch anti-join
    // below: the same event delivered twice INSIDE one batch collapses to
    // one row instead of writing two history rows under one version id.
    // Whole-row distinct, NOT dropDuplicates(key, version, ts): two rows
    // sharing the triple but carrying DIFFERENT payloads are a conflict
    // the guard below must reject loudly, not a replay to silently pick a
    // nondeterministic winner from.
    val batchTs = batch.withColumn("__ts_us", unix_micros(col(tsCol)))
      .dropDuplicates()
    // replay idempotence: (key, version, ts) already in state == the same
    // event delivered again — drop silently. One cached frame: the guard
    // count, the emptiness check and the final write all reuse it instead
    // of re-running the state scan + anti-join per job.
    val fresh = (stored match {
      case Some(state) => batchTs.join(
        state.select(col(key), col(version), col("__ts_us")),
        Seq(key, version, "__ts_us"), "left_anti")
      case None => batchTs
    }).persist()
    try {
      if (fresh.isEmpty) return
      // NULL event times are rejected before any write (review r11): a
      // null __ts_us breaks replay idempotence — the (key, version,
      // __ts_us) anti-join above is null-unsafe, so a committed null-ts
      // row replayed after a crash is never recognized as a replay, trips
      // the version-reuse guard, and wedges the stream permanently. The
      // guard reads the CACHED post-anti-join frame (r12 ADVICE: the
      // pre-persist count paid one extra full evaluation of the deduped
      // batch); that is equivalent — state never holds a null __ts_us
      // (this guard has always preceded every write), so the null-unsafe
      // anti-join can never absorb a null-ts row.
      val nullTs = fresh.filter(col("__ts_us").isNull).count()
      require(nullTs == 0L,
        s"$nullTs row(s) carry a NULL $tsCol — SCD2 intervals need an " +
          "event time; repair the rows upstream and re-deliver")

      // version-id reuse WITHIN the batch: after the exact-replay collapse
      // above, two surviving rows sharing (key, version) — differing ts OR
      // differing payload at the same ts — are the corruption the
      // cross-state guard below rejects, arriving in one delivery. It
      // would sail past the state anti-join and write two history rows
      // under one version id; reject it here too. (The aggregate gets an
      // internal alias: a user version column literally named "count"
      // would make col("count") ambiguous.)
      val intraDups = fresh.groupBy(col(key), col(version))
        .agg(count(lit(1)).as("__graft_n"))
        .filter(col("__graft_n") > 1).count()
      require(intraDups == 0L,
        s"$intraDups (key, version) pair(s) appear more than once within " +
          "the batch; refusing to write duplicate SCD2 version rows")

      stored.foreach { state =>
        // version-id REUSE (same key+version, different ts) is not replay;
        // swallowing it would vanish an event from history — fail loudly
        val conflicts = fresh.join(
          state.select(col(key), col(version)), Seq(key, version), "left_semi")
          .count()
        require(conflicts == 0L,
          s"$conflicts event(s) reuse an existing (key, version) with a " +
            "different timestamp; refusing to rewrite SCD2 history")
      }

      val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col(version))
      val newVers = fresh
        .withColumn("valid_from", unix_timestamp(col(tsCol)))
        .withColumn("valid_to", unix_timestamp(lead(col(tsCol), 1).over(w)))
        .drop(tsCol)
      // the batch's first event per key — micros plus the RAW version id,
      // ordered exactly as the window orders
      val firstPerKey = fresh.groupBy(col(key))
        .agg(min(struct(col("__ts_us").as("us"), col(version).as("ver")))
          .as("__first"),
          min(unix_timestamp(col(tsCol))).as("__first_s"))

      StateCommit.stageSwap(spark, statePath) { next =>
      stored match {
        case Some(state) =>
          // fail-stop on history interleave: the batch's first event must
          // sort strictly AFTER every touched key's open version in
          // (ts_us, version) order
          val bad = state.filter(col("valid_to").isNull)
            .join(firstPerKey, Seq(key))
            .filter(col("__ts_us") > col("__first.us") ||
              (col("__ts_us") === col("__first.us") &&
                col(version) >= col("__first.ver")))
            .count()
          require(bad == 0L,
            s"$bad key(s) received events at or before their open version; " +
              "SCD2 history cannot interleave — replay in replication order")
          // no broadcast HINT (review r11): firstPerKey is O(distinct
          // batch keys) — a bulk backfill batch makes a forced broadcast a
          // driver OOM; AQE still auto-broadcasts it when genuinely small
          val closed = state.join(firstPerKey, Seq(key), "left")
            .withColumn("valid_to",
              when(col("valid_to").isNull && col("__first_s").isNotNull,
                col("__first_s")).otherwise(col("valid_to")))
            .drop("__first", "__first_s")
          closed.unionByName(newVers).write.mode("overwrite").parquet(next)
        case None =>
          newVers.write.mode("overwrite").parquet(next)
      }
      }
    } finally fresh.unpersist()
  }

  private def readRaw(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) Some(spark.read.parquet(path)) else None
  }

  /** The history table with `is_current` derived from the open interval;
    * the internal ordering column stays internal. */
  def read(spark: SparkSession, statePath: String): DataFrame = {
    StateCommit.recoverSwap(spark, statePath)
    spark.read.parquet(statePath)
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__ts_us")
  }
}
