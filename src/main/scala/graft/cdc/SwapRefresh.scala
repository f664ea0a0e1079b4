package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** K2: atomic full rebuild — the reference's swap-index refresh
  * (`meili.py:34-71`, driver `main.py:143-176`): rebuild into a staging
  * index, atomically swap it live, drop the staging copy. Blue/green for a
  * table.
  *
  * Spark form: batch `spark.read` -> transform -> write staging dir ->
  * atomic directory pointer swap (no table format in the offline harness;
  * with Delta/Iceberg this is `CREATE OR REPLACE TABLE`).
  *
  * The reference pins the source offset BEFORE copying (`main.py:160-161`)
  * so changes made during the rebuild replay afterwards — snapshot-then-tail.
  * [[refresh]] takes the caller's already-captured offset for the same reason.
  */
object SwapRefresh {

  /** Rebuild `livePath` from `fresh`, atomically. Returns row count written.
    *
    * `buckets = Some((pk, n))` carries the live sink's bucketed layout onto
    * the staging copy before the swap — the analog of the reference copying
    * the live index's settings onto the tmp index (`meili.py:43-49`).
    * Without it a refresh of a bucketed sink would swap in a FLAT dir; the
    * next micro-batch's `hasBuckets` probe would then see no layout,
    * bootstrap an empty state, and silently discard the refreshed rows in
    * every bucket it touches. */
  def refresh(fresh: DataFrame, livePath: String,
              buckets: Option[(String, Int)] = None): Long = {
    val staging = livePath + ".staging"
    buckets match {
      // init IS the layout-defining write — reusing it keeps refresh's
      // staging copy from drifting if the bucket layout ever changes
      case Some((pk, n)) => BucketedUpsertSink.init(fresh, staging, pk, n)
      case None          => fresh.write.mode("overwrite").parquet(staging)
    }
    val n = fresh.sparkSession.read.parquet(staging).count()
    UpsertSink.atomicSwapDirs(fresh.sparkSession, staging, livePath)
    n
  }
}

/** S5 + `check` command: consistency verification (reference
  * `main.py:179-208` compares two scalar counts). We keep the count check
  * and add the content-level diff the reference lacks (SURVEY.md §2.2 set
  * ops): an `EXCEPT`-based row diff in both directions. */
object ConsistencyCheck {

  final case class Result(sourceCount: Long, sinkCount: Long,
                          missingInSink: Long, extraInSink: Long) {
    def ok: Boolean = sourceCount == sinkCount && missingInSink == 0 && extraInSink == 0
  }

  def countCheck(source: DataFrame, sink: DataFrame): Boolean =
    source.count() == sink.count()

  /** Full check: counts plus row-level except-diff (columns must align). */
  def check(source: DataFrame, sink: DataFrame): Result = {
    val cols = source.columns.toSeq
    val sink2 = sink.select(cols.map(org.apache.spark.sql.functions.col): _*)
    Result(
      sourceCount = source.count(),
      sinkCount = sink2.count(),
      missingInSink = source.exceptAll(sink2).count(),
      extraInSink = sink2.exceptAll(source).count()
    )
  }
}
