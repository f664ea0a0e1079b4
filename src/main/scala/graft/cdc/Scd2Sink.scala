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
  * deliver. A batch event older than the key's open version would
  * interleave history; it is counted and REJECTED loudly (fail-stop)
  * rather than silently appended out of order — the same fail-loud stance
  * as the dead-letter path.
  *
  * State layout: one parquet dir of interval rows, open versions having
  * null valid_to; `is_current` is derived on read, not stored. The batch
  * rewrite goes through the same staging + atomic-pointer-swap protocol as
  * [[UpsertSink]] (crash window healed on next read). At 100 TB the state
  * is bucketed by key or a lakehouse MERGE (close + append are both keyed
  * upserts); the full-rewrite harness version keeps the protocol honest
  * at fixture scale — see SCALE.md.
  */
object Scd2Sink {

  /** Apply one micro-batch of `(key, version, ts, payload...)` rows.
    * `tsCol` must be a timestamp column; intervals are epoch seconds (the
    * sink coercion rule, reference schemas.py:21-22). */
  def applyBatch(spark: SparkSession, statePath: String, batch: DataFrame,
                 key: String, version: String, tsCol: String): Unit = {
    if (batch.isEmpty) return
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col(version))
    val newVers = batch
      .withColumn("valid_from", unix_timestamp(col(tsCol)))
      .withColumn("valid_to", unix_timestamp(lead(col(tsCol), 1).over(w)))
      .drop(tsCol)
    val firstPerKey = batch.groupBy(col(key))
      .agg(min(unix_timestamp(col(tsCol))).as("__first_ts"))

    UpsertSink.recoverSwap(spark, statePath)
    val stored = readRaw(spark, statePath)
    stored match {
      case Some(state) =>
        // fail-stop on history interleave: an open version newer than the
        // batch's first event for that key breaks interval monotonicity
        val bad = state.filter(col("valid_to").isNull)
          .join(firstPerKey, Seq(key))
          .filter(col("valid_from") > col("__first_ts"))
          .count()
        require(bad == 0L,
          s"$bad key(s) received events older than their open version; " +
            "SCD2 history cannot interleave — replay in replication order")
        // close the open version of every touched key at the batch's first
        // event time; untouched keys pass through (left join, null first_ts)
        val closed = state.join(broadcast(firstPerKey), Seq(key), "left")
          .withColumn("valid_to",
            when(col("valid_to").isNull && col("__first_ts").isNotNull,
              col("__first_ts")).otherwise(col("valid_to")))
          .drop("__first_ts")
        val next = statePath + ".next"
        closed.unionByName(newVers).write.mode("overwrite").parquet(next)
        UpsertSink.atomicSwapDirs(spark, next, statePath)
      case None =>
        newVers.write.mode("overwrite").parquet(statePath)
    }
  }

  private def readRaw(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) Some(spark.read.parquet(path)) else None
  }

  /** The history table with `is_current` derived from the open interval. */
  def read(spark: SparkSession, statePath: String): DataFrame = {
    UpsertSink.recoverSwap(spark, statePath)
    spark.read.parquet(statePath)
      .withColumn("is_current", col("valid_to").isNull)
  }
}
