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
  * deliver. A batch event that sorts at-or-before a key's open version
  * would interleave history; it is counted and REJECTED loudly
  * (fail-stop) rather than silently appended out of order — the same
  * fail-loud stance as the dead-letter path. The guard compares raw
  * event-time MICROSECONDS plus the version id (stored internally as
  * `__ts_us`/`__ver`), not the emitted epoch-second interval bounds —
  * second-truncated bounds cannot see a same-second reordering.
  *
  * Idempotent under at-least-once replay: rows whose (key, version)
  * already exist in the state are dropped up front, so a replayed batch
  * (crash after the swap committed, before the streaming checkpoint did)
  * is a no-op instead of a poisoned-forever guard failure or a duplicate
  * version row — the swap is atomic, so state holds either none or all
  * of a batch, never a prefix.
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
    UpsertSink.recoverSwap(spark, statePath)
    val stored = readRaw(spark, statePath)

    // at-least-once replay safety: drop rows already in the state
    val fresh = stored match {
      case Some(state) => batch.join(
        state.select(col(key), col(version)), Seq(key, version), "left_anti")
      case None => batch
    }
    if (fresh.isEmpty) return

    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col(version))
    val newVers = fresh
      .withColumn("valid_from", unix_timestamp(col(tsCol)))
      .withColumn("valid_to", unix_timestamp(lead(col(tsCol), 1).over(w)))
      .withColumn("__ts_us", unix_micros(col(tsCol)))
      .withColumn("__ver", col(version).cast("long"))
      .drop(tsCol)
    // the batch's first event per key, in full (micros, version) precision
    val firstPerKey = fresh.groupBy(col(key))
      .agg(min(struct(unix_micros(col(tsCol)).as("us"),
        col(version).cast("long").as("ver"))).as("__first"),
        min(unix_timestamp(col(tsCol))).as("__first_s"))

    val next = statePath + ".next"
    stored match {
      case Some(state) =>
        // fail-stop on history interleave: the batch's first event must
        // sort strictly AFTER every touched key's open version in
        // (ts_us, version) order
        val bad = state.filter(col("valid_to").isNull)
          .join(firstPerKey, Seq(key))
          .filter(col("__ts_us") > col("__first.us") ||
            (col("__ts_us") === col("__first.us") &&
              col("__ver") >= col("__first.ver")))
          .count()
        require(bad == 0L,
          s"$bad key(s) received events at or before their open version; " +
            "SCD2 history cannot interleave — replay in replication order")
        // close the open version of every touched key at the batch's first
        // event time; untouched keys pass through (left join, null first)
        val closed = state.join(broadcast(firstPerKey), Seq(key), "left")
          .withColumn("valid_to",
            when(col("valid_to").isNull && col("__first_s").isNotNull,
              col("__first_s")).otherwise(col("valid_to")))
          .drop("__first", "__first_s")
        closed.unionByName(newVers).write.mode("overwrite").parquet(next)
      case None =>
        newVers.write.mode("overwrite").parquet(next)
    }
    UpsertSink.atomicSwapDirs(spark, next, statePath)
  }

  private def readRaw(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) Some(spark.read.parquet(path)) else None
  }

  /** The history table with `is_current` derived from the open interval;
    * the internal ordering columns stay internal. */
  def read(spark: SparkSession, statePath: String): DataFrame = {
    UpsertSink.recoverSwap(spark, statePath)
    spark.read.parquet(statePath)
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__ts_us", "__ver")
  }
}
