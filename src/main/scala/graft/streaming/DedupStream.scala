package graft.streaming

import graft.ops.IncrementalDedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Continuous corpus dedup: a file stream of crawl batches drives the
  * incremental near-dup index ([[graft.ops.IncrementalDedup]]) under Spark's
  * checkpointed exactly-once-per-batch contract — the operational shape of
  * dedup at 100 TB, where the corpus only ever grows and each arriving
  * batch must pay for itself, not for a recompute.
  *
  * Per micro-batch (foreachBatch): emit the batch's new near-dup pairs
  * (every pair has at least one side in the batch) to `outPath/batch-<id>`,
  * and append the batch's postings/bands to the persisted index — BOTH
  * writes are per-batch-directory overwrites keyed by the foreachBatch id,
  * and the index read excludes subdirs at or beyond the in-flight batch
  * id, so an at-least-once replay after a crash inside the batch window —
  * or a manual checkpoint rewind past completed batches — converges to
  * exactly the uninterrupted run's output (spec: `DedupStreamSpec` kills
  * the query with a lost commit and compares).
  *
  * The reference's closest shape is its continuous CDC sync loop
  * (meilisync `main.py:84-101`: progress checkpoint + restart); here the
  * same checkpoint-resume contract carries an analytics operator instead
  * of an index upsert. */
object DedupStream {

  val docsSchema: StructType = StructType.fromDDL("doc_id BIGINT, text STRING")

  /** Start the ingest stream over parquet crawl batches in `docsDir`.
    *
    * `useLsh` picks the sub-quadratic MinHash+LSH tier (the 100 TB path;
    * the union over batches equals the one-shot
    * [[graft.ops.Dedup.minhashLsh]] answer whenever the corpus holds no
    * stop-shingle and no band bucket crosses the width cap mid-stream —
    * the precise condition is on [[graft.ops.IncrementalDedup.updateLsh]])
    * over the exact inverted-index tier. `maxFilesPerTrigger` bounds a
    * micro-batch.
    *
    * `compactEvery`: every N batches, fold the accumulated per-batch state
    * subdirs into flat files from the HEAD of the batch window (safe by
    * [[graft.ops.IncrementalDedup.compactState]]'s argument: batches < k
    * are committed when k starts, and k's own crashed-attempt subdir is
    * excluded from the fold). Without a cadence the state read at batch B
    * is a B-subdir listing + union — thousands of dirs after a week of
    * micro-batches. 0 disables. */
  def start(spark: SparkSession, docsDir: String, statePath: String,
            outPath: String, checkpoint: String, threshold: Double = 0.5,
            useLsh: Boolean = true, maxFilesPerTrigger: Option[Int] = None,
            trigger: Trigger = Trigger.AvailableNow(),
            buckets: Int = 0, compactEvery: Int = 64): StreamingQuery = {
    val reader = spark.readStream.schema(docsSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(docsDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // the batch frame is bound to a CLONED session with its own
        // function registry — register/plan against it, not the outer one,
        // or graft_* expressions fail to resolve on a fresh session
        val session = batch.sparkSession
        if (compactEvery > 0 && id > 0 && id % compactEvery == 0) {
          if (useLsh) {
            IncrementalDedup.compactState(session, s"$statePath/bands",
              IncrementalDedup.bandsDdl, excludeBatch = Some(id))
            IncrementalDedup.compactState(session, s"$statePath/sets",
              IncrementalDedup.setsDdl, excludeBatch = Some(id))
          } else
            IncrementalDedup.compactState(session, statePath,
              IncrementalDedup.postingsDdl, excludeBatch = Some(id))
        }
        val docs = batch.select(col("doc_id"), col("text"))
        val pairs =
          if (useLsh)
            IncrementalDedup.updateLsh(session, statePath, docs, threshold,
              batchId = Some(id), buckets = buckets)
          else
            IncrementalDedup.update(session, statePath, docs, threshold,
              batchId = Some(id))
        // replay-idempotent emission: same batch id -> same directory, not
        // an append that would double the crashed batch's pairs
        pairs.write.mode(SaveMode.Overwrite).parquet(s"$outPath/batch-$id")
      }
      .start()
  }

  /** Driver-checked streaming contract: stage the `documents` table as two
    * single-file crawl batches, drive them through a checkpointed
    * [[start]] run (one file per micro-batch), and return the union pair
    * log. The streamed union equals the one-shot
    * [[graft.ops.Dedup.minhashLsh]] answer (caps agreeing — see
    * [[graft.ops.IncrementalDedup.updateLsh]]) — which carries the
    * exact-Jaccard closed form: the oracle grades an actual checkpointed
    * Structured Streaming run against DuckDB.
    *
    * Scratch discipline is [[graft.ops.IncrementalDedup.twoBatchPairs]]'s:
    * one per-application tmp dir, wiped at each call (checkpoint included,
    * so every call is a fresh stream, not a resume), removed on JVM exit. */
  def streamedPairs(spark: SparkSession, dir: String,
                    threshold: Double = 0.5): DataFrame = {
    import graft.ops.Tables
    val root = graft.ops.TwoBatchScratch.freshRoot(spark, "graft_dedup_stream")
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val feed = s"$root/feed"
    // 8 files per crawl batch: batch-input parallelism (see stageBatches)
    stageBatches(feed, corpusHalves(docs), filesPerPart = 8)
    // partitions-only tuning: the foreachBatch batch jobs run in the
    // cloned-at-start session, so 8 shuffle partitions right-size the
    // per-micro-batch join/agg jobs for a half-corpus feed (no state-store
    // operator here — the dedup state is explicit parquet)
    val q = StreamTune.withStateConf(spark, rocksDb = false) {
      start(spark, feed, s"$root/state", s"$root/pairs", s"$root/ckpt",
        threshold, maxFilesPerTrigger = Some(8))
    }
    // stop in finally: a failing micro-batch surfaces from
    // processAllAvailable as StreamingQueryException, and leaving the query
    // running would leak it (and its scratch state) into every later query
    // of the same session/bench run
    try q.processAllAvailable() finally q.stop()
    pairs(spark, s"$root/pairs").orderBy(col("doc_a"), col("doc_b"))
  }

  /** Split a doc frame into the two "old corpus / new crawl batch" halves
    * at the midpoint doc_id — ONE definition shared by [[streamedPairs]]
    * and the scale-curve profiler, so "the same two halves" stays true by
    * construction. Requires both halves non-empty (ids on both sides of
    * the midpoint): a degenerate corpus would silently collapse the
    * two-batch shape the callers claim to measure. */
  def corpusHalves(docs: DataFrame): Seq[DataFrame] = {
    val r = docs.agg(org.apache.spark.sql.functions.min(col("doc_id")),
      org.apache.spark.sql.functions.max(col("doc_id"))).head()
    require(!r.isNullAt(0), "corpusHalves: empty documents frame")
    // midpoint of the ACTUAL id range, not max/2: a corpus whose ids start
    // away from zero (an offset shard) is perfectly splittable and must not
    // trip the degenerate-split guard (r9 review) — the same (min+max)/2
    // the time-based splits use
    val split = (r.getLong(0) + r.getLong(1)) / 2
    require(r.getLong(0) <= split && r.getLong(1) > split,
      s"corpusHalves: doc_ids [${r.getLong(0)}, ${r.getLong(1)}] all on one " +
        "side of the midpoint; two-batch split would be degenerate")
    Seq(docs.filter(col("doc_id") <= split), docs.filter(col("doc_id") > split))
  }

  /** Stage each frame as `filesPerPart` parquet files in `feedDir`, with
    * strictly increasing mtimes per part: FileStreamSource admits files in
    * modification-time order, and files written in the same millisecond
    * tie — a real crawl feed arrives over time, so the deterministic
    * stand-in staggers the clock. With `maxFilesPerTrigger = filesPerPart`,
    * part i IS micro-batch i.
    *
    * filesPerPart > 1 matters for fixture realism: a single small parquet
    * file is ONE row group, so the whole per-batch shingle/minhash pipeline
    * would run in one task — while a real multi-GB crawl batch splits at
    * `maxPartitionBytes`. Multi-file parts restore the batch-input
    * parallelism deployment has (measured at x100: the single-file feed
    * serialized ~30 s of per-row compute onto one core). */
  def stageBatches(feedDir: String, parts: Seq[DataFrame],
                   filesPerPart: Int = 1): Unit = {
    require(filesPerPart >= 1 && filesPerPart < 1000,
      "filesPerPart must stay under the 1000-per-part mtime stride")
    new java.io.File(feedDir).mkdirs()
    val base = System.currentTimeMillis() - 60000
    parts.zipWithIndex.foreach { case (df, i) =>
      val staging = s"$feedDir.stage$i"
      df.repartition(filesPerPart).write.mode(SaveMode.Overwrite).parquet(staging)
      val files = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      // Spark skips empty partitions at write, so a part with fewer rows
      // than filesPerPart yields fewer files — the trigger would then fill
      // its batch across the part boundary and silently merge parts.
      // Loud beats silent: the callers stage real corpora.
      require(files.length == filesPerPart,
        s"stageBatches: part $i wrote ${files.length} files, expected " +
          s"$filesPerPart — too few rows to keep part/batch alignment")
      files.zipWithIndex.foreach { case (part, j) =>
        val dest = new java.io.File(f"$feedDir/c${i}_$j%03d.parquet")
        java.nio.file.Files.move(part.toPath, dest.toPath)
        // intra-part mtimes may tie (admission order within a batch is
        // irrelevant); the +1000 stride keeps PARTS strictly ordered
        require(dest.setLastModified(base + i * 1000L + j))
      }
      val sp = new org.apache.hadoop.fs.Path(staging)
      sp.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
        .delete(sp, true)
      ()
    }
  }

  /** Shared staging scaffold for the sentinel-closed drivers
    * ([[StreamSessions.streamedSessions]],
    * [[StreamTrailLog.streamedTrailLog]]): split `ev` at its median event
    * time into two event-time halves and stage them plus a caller-built
    * sentinel batch derived from the max event time. One definition so
    * the split/sentinel discipline (and the loud empty-feed guard — an
    * empty fixture's null percentile would otherwise NPE on getDouble)
    * cannot drift between drivers (review r11). */
  def stageHalvesWithSentinel(feedDir: String, ev: DataFrame, tsCol: String)
                             (sentinel: Long => DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    val b = ev.select(unix_micros(col(tsCol)).as("u"))
      .agg(expr("percentile(u, 0.5)"), max(col("u"))).head()
    require(!b.isNullAt(0),
      "stageHalvesWithSentinel: the event feed is empty — the streaming " +
        "drivers need at least one event")
    val (t1, tmax) = (b.getDouble(0).toLong, b.getLong(1))
    stageBatches(feedDir, Seq(
      ev.filter(unix_micros(col(tsCol)) <= t1),
      ev.filter(unix_micros(col(tsCol)) > t1),
      sentinel(tmax)))
  }


  /** The emitted pair log so far: union over per-batch directories;
    * empty-but-typed before the first batch lands (shared reader — r9
    * review). */
  def pairs(spark: SparkSession, outPath: String): DataFrame =
    graft.ops.TwoBatchScratch.batchLog(spark, outPath,
      "doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE")
}
