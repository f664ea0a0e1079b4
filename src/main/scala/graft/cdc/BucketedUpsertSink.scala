package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K1 at scale: the upsert sink over a state table PARTITIONED BY a pk-hash
  * bucket, so one micro-batch rewrites only the buckets its pks land in —
  * O(changed buckets), never the whole state. This is the "state is never
  * rewritten wholesale" posture from SCALE.md made concrete without a table
  * format: bucket dirs play the role of Delta/Iceberg file groups, and the
  * write uses dynamic partition overwrite (only partitions present in the
  * batch output are replaced; all other bucket dirs are untouched — the
  * spec asserts their files' timestamps don't move).
  *
  * Scale notes:
  *  - the batch shuffles once on the pk (inside [[UpsertSink.applyBatch]]);
  *    the state side reads ONLY the affected bucket partitions (partition
  *    pruning on [[BucketCol]] — the `.isin` literal list is bounded by
  *    `numBuckets`, a config, never by data volume).
  *  - per-bucket overwrite is atomic per partition dir but not across
  *    buckets; a real deployment gets cross-bucket atomicity from a table
  *    format's commit protocol (Delta/Iceberg MERGE), which this layout
  *    maps onto directly.
  *  - idempotent like the flat sink: replaying a batch yields the same
  *    buckets with the same contents.
  */
object BucketedUpsertSink {

  val BucketCol = "_bucket"

  def bucketOf(pk: Column, numBuckets: Int): Column =
    pmod(xxhash64(pk), lit(numBuckets.toLong))

  /** Materialize an initial state table partitioned by pk-hash bucket. */
  def init(state: DataFrame, statePath: String, pk: String, numBuckets: Int): Unit =
    state
      .withColumn(BucketCol, bucketOf(col(pk), numBuckets))
      .write.mode("overwrite")
      .partitionBy(BucketCol)
      .parquet(statePath)

  private def hasBuckets(spark: SparkSession, statePath: String): Boolean = {
    // Heal an interrupted evolution swap FIRST (live moved to '.old', next
    // never moved in): without this, a crash in that window makes the state
    // look absent, the next batch bootstraps an empty table, and once a new
    // live dir exists the '.old' full state is stranded forever — silent
    // loss. The flat sink heals through liveExists; this is its equivalent.
    StateCommit.recoverSwap(spark, statePath)
    val p = new org.apache.hadoop.fs.Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith(BucketCol + "="))
  }

  /** Current state (without the bucket column). The payload schema makes a
    * fully-emptied or not-yet-created state readable. */
  def currentState(spark: SparkSession, statePath: String,
                   schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (hasBuckets(spark, statePath)) spark.read.parquet(statePath).drop(BucketCol)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Apply one compacted micro-batch: read ONLY the buckets the batch
    * touches, merge with [[UpsertSink.applyBatch]] semantics (presence
    * mask, create-replaces, delete-removes), overwrite ONLY those bucket
    * partitions. */
  def applyBatch(spark: SparkSession, statePath: String, changes: DataFrame,
                 pk: String, numBuckets: Int): Unit =
    applyBatch(spark, statePath, changes, pk, numBuckets, schema = None)

  /** As [[applyBatch]]; `schema` makes the very first batch work against a
    * not-yet-created state (bootstrap without a separate [[init]]). */
  def applyBatch(spark: SparkSession, statePath: String, changes: DataFrame,
                 pk: String, numBuckets: Int,
                 schema: Option[org.apache.spark.sql.types.StructType]): Unit = {
    val withBucket = changes.withColumn(BucketCol, bucketOf(col(pk), numBuckets))
    // Schema evolution guard: a batch carrying a column the stored state
    // lacks cannot use the per-bucket path — untouched bucket dirs would
    // keep the old parquet schema and later unpruned reads would see an
    // inconsistent table. Evolution is rare, so pay a one-time full-state
    // merge + rewrite through the atomic dir swap; afterwards every bucket
    // carries the new schema and the incremental path resumes.
    // One reader serves the evolution check (schema only — a footer read,
    // no data scan) and, if evolution fires, the full-state merge; the
    // exists/bucket-dir probe runs once per batch.
    val stored =
      if (hasBuckets(spark, statePath)) Some(spark.read.parquet(statePath))
      else None
    stored.foreach { full =>
      val storedCols = full.columns.filterNot(_ == BucketCol)
      val evolved = changes.columns
        .filterNot(n => n == "op" || n == UpsertSink.PresentCol)
        .exists(n => !storedCols.contains(n))
      if (evolved) {
        val merged = UpsertSink.applyBatch(full.drop(BucketCol), changes, pk)
          .withColumn(BucketCol, bucketOf(col(pk), numBuckets))
        StateCommit.stageSwap(spark, statePath)(tmp =>
          merged.write.mode("overwrite").partitionBy(BucketCol).parquet(tmp))
        return
      }
    }
    // bounded by numBuckets (config), so collecting the DISTINCT bucket ids
    // is O(buckets), not O(data) — it exists to make the state read a
    // partition-PRUNED scan
    val touched = withBucket.select(BucketCol).distinct()
      .collect().map(_.getLong(0)).sorted
    if (touched.isEmpty) return
    val state = stored match {
      case Some(full) =>
        full.filter(col(BucketCol).isin(touched: _*)).drop(BucketCol)
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schema.getOrElse(throw new IllegalStateException(
            s"no state at $statePath and no bootstrap schema given")))
    }
    val merged = UpsertSink.applyBatch(state, withBucket.drop(BucketCol), pk)
      .withColumn(BucketCol, bucketOf(col(pk), numBuckets))
      .persist()
    // Collect the written-bucket set BEFORE the overwrite: after the commit
    // the old files are gone, so any recompute of `merged` (cache eviction)
    // would re-list a replaced directory and fail. Pre-write, a recompute
    // only re-reads still-live files.
    val written = merged.select(BucketCol).distinct().collect().map(_.getLong(0)).toSet
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BucketCol)
      .parquet(statePath)
    // dynamic overwrite replaces only partitions PRESENT in the output: a
    // touched bucket whose last row was deleted writes nothing, so its stale
    // dir must be dropped explicitly
    merged.unpersist()
    val fsPath = new org.apache.hadoop.fs.Path(statePath)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.filterNot(written).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$statePath/$BucketCol=$b"), true); ()
    }
  }
}
