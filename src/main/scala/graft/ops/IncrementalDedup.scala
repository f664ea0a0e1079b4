package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-dup maintenance: dedup the corpus as it GROWS, without
  * re-deduplicating what's already indexed — the operational shape at
  * 100 TB, where a daily crawl batch is orders of magnitude smaller than
  * the corpus and a full recompute per batch is unaffordable.
  *
  * State: a postings index `(shingle, doc_id, n_sh)` of xxhash64'd word
  * n-gram shingles, stored as parquet (appended per batch; a real
  * deployment buckets it by `shingle` so the probe join co-partitions).
  *
  * Per batch: shingle the new docs (one codegen'd pass), probe the index
  * with the NEW postings only — every emitted pair has at least one new
  * side, so old x old pairs (already emitted by earlier batches) are never
  * recomputed — count shared shingles per candidate pair, emit pairs with
  * Jaccard >= threshold, then append the new postings to the index. Work
  * per batch is O(|batch postings| x avg shingle df), independent of how
  * many batches came before.
  *
  * Stop-shingle cap semantics under growth: `dfCap` is evaluated against
  * the CURRENT corpus (old + new document frequency). A shingle can
  * therefore cross the cap as the corpus grows — pairs it emitted earlier
  * are not retracted (append-only emission, the standard trade; a periodic
  * [[Dedup.ngramJaccard]] compaction re-derives the exact capped answer).
  * With `dfCap` at infinity the incremental union over batches is EXACTLY
  * the one-shot answer — the spec asserts that equivalence.
  */
object IncrementalDedup {

  /** State-store schemas, shared with the stream wrapper's compaction
    * cadence ([[graft.streaming.DedupStream]]). */
  val postingsDdl = "shingle BIGINT, doc_id BIGINT, n_sh INT"
  val bandsDdl = "doc_id BIGINT, band_id INT, band_h BIGINT"
  val setsDdl = "doc_id BIGINT, hs ARRAY<BIGINT>, n_sh INT"

  /** Read a state dir by an explicit SNAPSHOT of its current files.
    *
    * Load-bearing: the emitted-pairs plan reads this state, and appending
    * the batch afterwards triggers Spark's refreshByPath, which invalidates
    * any cache built on a directory-based scan — a consumer re-executing
    * the returned DataFrame would then re-read the state INCLUDING the
    * batch it just contributed and double-emit every new x old pair.
    * Pinning the file list at read time makes re-execution reproducible
    * regardless of later appends.
    *
    * `excludeBatch`: an at-least-once REPLAY of foreachBatch batch k finds
    * the crashed attempt's own `batch-k/` subdir already in the state dir;
    * reading it as "old" corpus would double every replayed doc (duplicate
    * sets rows multiply the verify join, and the batch pairs with its own
    * crashed copy). Excluding subdirs with id >= k makes the replay read
    * exactly the pre-batch snapshot, so replay output == first-run output.
    * The `>=` (not `==`) also covers a checkpoint REWIND — an operator
    * deleting trailing offsets/commits to reprocess from batch k leaves
    * later batches' subdirs on disk; those are future state relative to
    * the replay and must be invisible to it (each later batch overwrites
    * its own subdir when it re-runs).
    *
    * `bucketFilter`: when the store is laid out with `bucket=<j>` partition
    * dirs ([[updateLsh]] with `buckets > 0`), restricts the snapshot to the
    * given bucket ids — the partition-PRUNED read that keeps the per-batch
    * verify scan proportional to the batch's candidates, not the corpus.
    * Files without a bucket segment (pre-bucketing layout) are always kept:
    * they may hold any doc, so pruning them would silently drop pairs. */
  private def snapshotRead(spark: SparkSession, path: String, ddl: String,
                           excludeBatch: Option[Long] = None,
                           bucketFilter: Option[Set[Long]] = None): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    // heal a compactState crash window FIRST (live dir momentarily absent,
    // complete copy parked at <path>.old) — reading without this would see
    // an empty index, silently emit nothing, and the subsequent append
    // would re-create the live dir so the .old copy could never restore
    graft.cdc.StateCommit.recoverSwap(spark, path)
    // Hadoop FileSystem, not java.io: the state dir may be HDFS/S3.
    // Recursive: idempotent per-batch appends live in batch-<id> subdirs.
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val batchDir = "batch-(\\d+)".r
    val bucketDir = "bucket=(\\d+)".r
    // listFiles yields fully-qualified paths; qualify the root so the
    // ancestor walk terminates on Path equality
    val qp = fs.makeQualified(p)
    // decide on every ancestor segment below the store root, not just the
    // direct parent: bucket dirs nest inside batch dirs
    def skip(file: org.apache.hadoop.fs.Path): Boolean = {
      var d = file.getParent
      var drop = false
      while (d != null && d != qp && !drop) {
        d.getName match {
          case batchDir(n) => drop = excludeBatch.exists(n.toLong >= _)
          case bucketDir(j) => drop = bucketFilter.exists(!_.contains(j.toLong))
          case _ =>
        }
        d = d.getParent
      }
      drop
    }
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    if (fs.exists(p)) {
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet") &&
            !skip(st.getPath))
          files += st.getPath.toString
      }
    }
    if (files.nonEmpty) spark.read.schema(schema).parquet(files.toSeq: _*)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
  }

  /** Compact a state dir's accumulated per-batch files into `numFiles`
    * (append-per-batch leaves one file set per micro-batch — at a batch
    * every few minutes that is thousands of small files per week, and
    * snapshot listings + scan planning degrade linearly in file count).
    * Crash-safe: rewrite to a staging dir, then atomic pointer swap with
    * `.old` recovery, same protocol as the upsert sink (snapshotRead heals
    * the crash window before every read). Run it from a maintenance
    * schedule while the ingest stream is stopped with its last batch
    * committed, OR in-stream from the head of foreachBatch for batch k with
    * `excludeBatch = Some(k)`: every batch < k is committed by then (the
    * stream commits k-1 before starting k) so folding them is final, and
    * excluding k's own subdir keeps a crashed earlier attempt of k out of
    * the flat files — otherwise a replay of k would find its own rows in
    * the "old" snapshot and double-emit (the excluded subdir's files are
    * dropped by the swap; the replay rewrites them). A compaction that
    * itself gets replayed is idempotent: flat files carry no batch segment,
    * so the re-run folds the already-compacted state unchanged. The one
    * thing in-stream compaction forecloses is a manual checkpoint REWIND
    * past the compaction point (those batches' subdir structure is gone) —
    * same trade the reference makes when it trims its progress log.
    *
    * A bucketed sets store (`_buckets` marker, see [[resolveBuckets]]) is
    * compacted INTO its own layout — one fold per bucket dir, marker
    * carried inside the staged dir so it swaps in atomically with the data
    * (the layout's bucket key is `pmod(doc_id, m)` by construction). */
  def compactState(spark: SparkSession, path: String, ddl: String,
                   numFiles: Int = 8, excludeBatch: Option[Long] = None): Unit = {
    val cur = snapshotRead(spark, path, ddl, excludeBatch)
    if (!cur.isEmpty) {
      val stored: Option[Int] = readBucketsMarker(spark, path)
      val fs = new org.apache.hadoop.fs.Path(path, "_buckets")
        .getFileSystem(spark.sessionState.newHadoopConf())
      graft.cdc.StateCommit.stageSwap(spark, path) { tmp =>
        stored match {
          case Some(m) =>
            cur.withColumn("bucket", pmod(col("doc_id"), lit(m.toLong)))
              .repartition(col("bucket"))
              .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(tmp)
            val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "_buckets"), true)
            try out.write(s"$m\n".getBytes("UTF-8")) finally out.close()
          case None =>
            cur.repartition(numFiles).write.mode(SaveMode.Overwrite).parquet(tmp)
        }
      }
    }
  }

  /** The bucketed sets layout's modulus, persisted in the store itself
    * (`_buckets` marker, written on the FIRST bucketed write): `pmod(doc_id,
    * buckets)` decides which `bucket=<j>` dir a doc's set lives in, so
    * pruning an existing store with a DIFFERENT modulus than it was laid
    * out with would drop verify sets and silently lose near-dup pairs.
    * Later calls therefore use the STORED modulus — for pruning AND for new
    * writes — regardless of what the caller passes (a mismatch logs a
    * warning); the store stays self-consistent and stays pruned. A store
    * predating the marker (or compacted to flat files, which removes it)
    * adopts the next caller's modulus: flat files are never pruned, and
    * pre-marker stores were only ever written with one modulus. The marker
    * is not a `.parquet` file, so [[snapshotRead]] never scans it. */
  private def resolveBuckets(spark: SparkSession, setsPath: String,
                             requested: Int): Int =
    readBucketsMarker(spark, setsPath) match {
      case Some(stored) =>
        if (stored != requested)
          System.err.println(s"graft: bucketed sets store at $setsPath has " +
            s"modulus $stored; ignoring requested $requested")
        stored
      case None =>
        // temp-then-rename (review r11): a bare create-then-write crashing
        // mid-write stranded a TORN marker at the final name, and every
        // later read threw NumberFormatException forever — the store
        // bricked until an operator deleted the file by hand
        val marker = new org.apache.hadoop.fs.Path(setsPath, "_buckets")
        val tmp = new org.apache.hadoop.fs.Path(setsPath,
          s"_buckets.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
        val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
        val out = fs.create(tmp, true)
        try out.write(s"$requested\n".getBytes("UTF-8")) finally out.close()
        if (!fs.rename(tmp, marker)) {
          // lost a create race: adopt the winner's modulus
          try { fs.delete(tmp, false); () }
          catch { case _: java.io.IOException => () }
          return readBucketsMarker(spark, setsPath).getOrElse(requested)
        }
        requested
    }

  /** The `_buckets` marker's stored modulus, shared by [[resolveBuckets]]
    * and [[compactState]] (review r11: two hand-rolled readers could
    * drift). Torn handling: an unparseable marker over an EMPTY layout is
    * crash garbage from an interrupted first write — healed (deleted,
    * read as absent); one over an existing `bucket=` layout fails LOUD
    * with the repair instruction, because silently adopting a new modulus
    * would prune the store wrong and drop near-dup pairs. */
  private def readBucketsMarker(spark: SparkSession,
                                setsPath: String): Option[Int] = {
    val marker = new org.apache.hadoop.fs.Path(setsPath, "_buckets")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(marker)) return None
    // a checksum/EOF failure reading the tiny marker IS torn crash garbage
    // (a write died before its .crc landed) — route it to the same torn
    // handling as an unparseable body; other IO failures propagate
    val body =
      try {
        val in = fs.open(marker)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      } catch {
        case _: org.apache.hadoop.fs.ChecksumException | _: java.io.EOFException =>
          "\u0000torn"
      }
    body.toIntOption match {
      case some @ Some(_) => some
      case None =>
        val bucketed = fs.exists(new org.apache.hadoop.fs.Path(setsPath)) &&
          fs.listStatus(new org.apache.hadoop.fs.Path(setsPath))
            .exists(_.getPath.getName.startsWith("bucket="))
        if (bucketed)
          throw new IllegalStateException(
            s"torn _buckets marker at $setsPath over an existing bucketed " +
              "layout — restore the file to the layout's modulus (the " +
              "bucket= dirs were written with it) before writing again")
        try { fs.delete(marker, false); () }
        catch { case _: java.io.IOException => () }
        None
    }
  }

  /** Read the postings index; empty-but-typed when absent. `excludeBatch`
    * skips that batch's own subdir — see [[snapshotRead]] on replay. */
  def postings(spark: SparkSession, statePath: String,
               excludeBatch: Option[Long] = None): DataFrame =
    snapshotRead(spark, statePath, postingsDdl, excludeBatch)

  /** Ingest one batch of `(doc_id, text)` docs: emit the NEW near-dup pairs
    * (doc_a < doc_b, at least one side from this batch), then append the
    * batch's postings to the index. doc_ids must be globally unique. */
  def update(spark: SparkSession, statePath: String, newDocs: DataFrame,
             threshold: Double = 0.5, dfCap: Int = Int.MaxValue,
             batchId: Option[Long] = None): DataFrame = {
    graft.functions.TextFunctions.register(spark)
    // no persist (review r11): the only action before the caller executes
    // the returned pairs frame is writeState's append, so a cache here was
    // materialized once and unpersisted before any reuse — recomputing the
    // batch's shingling at pair time costs O(batch), the cache cost more
    val newPosts = newDocs
      .select(col("doc_id"), expr("graft_shingle_hashes(text, 3)").as("hs"))
      .withColumn("n_sh", size(col("hs")))
      .select(col("doc_id"), explode(col("hs")).as("shingle"), col("n_sh"))
    val oldPosts = postings(spark, statePath, excludeBatch = batchId)
    val allPosts = oldPosts.unionByName(newPosts)

    // df cap over the CURRENT corpus, computed ONLY for shingles the batch
    // carries: shingles untouched by the batch cannot contribute a pair
    // with a new side, so the df aggregate semi-joins to the batch's
    // distinct shingles first — shuffle/agg volume is O(touched postings),
    // not O(index). (The full-index SCAN that feeds the semi-join is pruned
    // too once the state is bucketed by shingle, the layout a real
    // deployment uses.)
    val touched = newPosts.select(col("shingle")).distinct()
    val relevant = allPosts.join(touched, Seq("shingle"), "left_semi")
    val liveShingles = relevant.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, dfCap))
      .select(col("shingle"))

    // probe: new postings x all postings on the shingle — every candidate
    // pair touches the batch; order the pair (a < b) so new x new pairs
    // appear once after the distinct-shingle count
    val probe = newPosts.join(liveShingles, "shingle")
      .select(col("shingle"), col("doc_id").as("p_doc"), col("n_sh").as("p_n"))
    val other = relevant.join(liveShingles, "shingle")
      .select(col("shingle"), col("doc_id").as("o_doc"), col("n_sh").as("o_n"))
    val pairs = probe.join(other,
        Seq("shingle")).filter(col("p_doc") =!= col("o_doc"))
      .select(
        least(col("p_doc"), col("o_doc")).as("doc_a"),
        greatest(col("p_doc"), col("o_doc")).as("doc_b"),
        when(col("p_doc") < col("o_doc"), col("p_n")).otherwise(col("o_n")).as("na"),
        when(col("p_doc") < col("o_doc"), col("o_n")).otherwise(col("p_n")).as("nb"),
        col("shingle"))
      // a new x new pair is produced twice (each side probes); count each
      // shared shingle once per pair
      .dropDuplicates("doc_a", "doc_b", "shingle")
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("c"))
      .withColumn("jaccard",
        round(col("c").cast("double") /
          greatest(col("na") + col("nb") - col("c"), lit(1)), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

    // The pair plan is pinned to the pre-append state snapshot, so the
    // append cannot change its result — no materialize-before-write dance,
    // and no cache for refreshByPath to eagerly recompute.
    writeState(newPosts.select(col("shingle"), col("doc_id"), col("n_sh")),
      statePath, batchId)
    pairs
  }

  /** State append. With a `batchId` (the foreachBatch id), the write is an
    * OVERWRITE of a per-batch subdir — an at-least-once replay of the same
    * batch rewrites the same files instead of appending duplicates (which
    * would double every replayed doc's postings and shift df counts).
    * Without one (ad-hoc batch use), a plain append. `partitionCols` adds
    * partition dirs under the target (the bucketed sets layout). */
  private def writeState(df: DataFrame, path: String, batchId: Option[Long],
                         partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(batchId match {
      case Some(_) => SaveMode.Overwrite
      case None => SaveMode.Append
    }).partitionBy(partitionCols: _*)
    w.parquet(batchId match {
      case Some(id) => s"$path/batch-$id"
      case None => path
    })
  }

  /** The LSH variant — the sub-quadratic incremental path for 100 TB: the
    * persisted index is band hashes (`bands` rows/doc, not one per shingle)
    * plus the sorted shingle-hash set per doc for exact verification. New
    * docs' bands probe the band index; candidates verify with one
    * merge-pass intersection against the sets store. Per-batch cost is
    * O(batch bands × capped bucket occupancy). Union over batches equals
    * the one-shot [[Dedup.minhashLsh]] whenever the corpus holds NO
    * stop-shingle (a shingle in more than dfCap docs — this tier stores
    * no postings index, so it cannot evaluate per-shingle df; the
    * one-shot tier's cap would change signatures/overlap where this one
    * keeps them) AND no band bucket crosses `maxBucketWidth` mid-stream —
    * a crossing now fails LOUD per batch (see the parity-window require
    * below) instead of surfacing as a silent oracle divergence.
    * On pure identical clusters the two caps agree exactly (bucket width
    * == shingle df); for mixed stop-shingle corpora the periodic
    * one-shot compaction re-derives the capped answer (spec-asserted on
    * the fixtures, where neither cap binds; review r12 spelled out the
    * precise equality condition).
    *
    * `buckets > 0` stores the sets under `bucket=pmod(doc_id, buckets)`
    * partition dirs and PRUNES the verify read to the buckets the batch's
    * candidates actually touch (an O(buckets) driver-side id set, the
    * [[graft.cdc.BucketedUpsertSink]] pattern). Output-identical to the
    * flat layout (spec-asserted); mixing layouts in one store is safe
    * (unbucketed files are never pruned). MEASURED NEGATIVE RESULT at the
    * 500k-doc fixture tier (`Profile incbucket`): flat wins — a 10% batch
    * touches every bucket (pruning moot, layout overhead 2x), and at a
    * 0.1% batch the saved sets read is a wash because the un-pruned BAND
    * index scan and fixed per-batch costs dominate first. Default stays 0;
    * the layout becomes relevant only once the sets store outweighs the
    * band index by enough that its scan is the batch bottleneck.
    *
    * AFTER A CROSSING FAILURE THE STATE HAS ADVANCED (ADVICE r14): the
    * parity-window guard rides the returned frame's first consuming
    * action, and in the default `buckets = 0` path the bands/sets appends
    * land BEFORE that action runs. A direct-API caller that catches the
    * crossing exception and keeps feeding new batches against the same
    * statePath therefore loses detection permanently — once the crossing
    * batch's bands are on disk, `__wOld` itself exceeds maxBucketWidth and
    * the crossing predicate can never match again. The contract: a
    * crossing failure makes a one-shot [[Dedup.minhashLsh]] compaction
    * MANDATORY before reusing the store (exactly the repair the error
    * message names). Checkpointed-stream replay is unaffected — a
    * `batchId` replay re-reads the pre-append snapshot (snapshotRead
    * excludes batch >= k) and re-detects the crossing. */
  def updateLsh(spark: SparkSession, statePath: String, newDocs: DataFrame,
                threshold: Double = 0.5, numHashes: Int = 16,
                bands: Int = 8, batchId: Option[Long] = None,
                buckets: Int = 0, maxBucketWidth: Int = 128): DataFrame = {
    graft.functions.TextFunctions.register(spark)
    val r = numHashes / bands
    val bandsPath = s"$statePath/bands"
    val setsPath = s"$statePath/sets"
    // the layout's modulus is a property of the STORE, not the call — see
    // resolveBuckets on why the stored value wins over `buckets`
    val eb = if (buckets > 0) resolveBuckets(spark, setsPath, buckets) else 0

    val newSets = newDocs
      .select(col("doc_id"), expr("graft_shingle_hashes(text, 3)").as("hs"))
      .withColumn("n_sh", size(col("hs")))
      .filter(col("n_sh") > 0) // zero-shingle docs carry no near-dup signal
      .select(col("doc_id"), array_sort(col("hs")).as("hs"), col("n_sh"))
      // serialized cache: each of (probe, two verify joins, state write)
      // would otherwise re-run the shingle+sort pipeline per action
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val newBands = newSets
      .withColumn("sig", expr(s"graft_minhash_sig(hs, $numHashes)"))
      .withColumn("band", explode(expr(
        s"transform(sequence(0, ${bands - 1}), " +
          s"b -> named_struct('id', b, 'h', xxhash64(slice(sig, b * $r + 1, $r))))")))
      .select(col("doc_id"), col("band.id").as("band_id"), col("band.h").as("band_h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

    val oldBands = snapshotRead(spark, bandsPath, bandsDdl, batchId)
    val allBands = oldBands.unionByName(newBands)

    // Degenerate-bucket cap (r12 adversarial-fixture finding): a band
    // bucket holding more than `maxBucketWidth` docs of the CURRENT
    // corpus is an exact-dup cluster in disguise — probing it emits
    // O(width²) pairs per batch, the quadratic blowup this tier exists to
    // avoid (an all-duplicate corpus put EVERY doc in one bucket). Such
    // buckets are excluded from candidate generation — the streaming
    // analog of the batch tier's stop-shingle dfCap ([[Dedup.minhashLsh]]),
    // with the same ownership story: identical clusters belong to the
    // exact-dedup tier, not near-dup pair emission. Width is counted only
    // for buckets the batch TOUCHES (semi-join first), so the aggregate is
    // O(touched-bucket occupancy), not O(index) — the same pruning shape
    // as [[update]]'s df aggregate. Like update's dfCap, the cap reads
    // the corpus-so-far: pairs emitted before a bucket crossed the cap
    // are not retracted (append-only emission; a periodic one-shot
    // [[Dedup.minhashLsh]] compaction re-derives the capped answer).
    val touchedBuckets = newBands.select(col("band_id"), col("band_h")).distinct()
    // Width per touched bucket, split old/new so the PARITY WINDOW is
    // checkable (ADVICE r12): a bucket whose pre-batch width was in
    // (0, maxBucketWidth] but whose total now EXCEEDS the cap crossed it
    // mid-stream — pairs emitted through it in earlier batches are never
    // retracted (append-only emission), so the stream's union silently
    // stops equalling the one-shot capped answer. That precondition break
    // must fail LOUD here, not surface as a confusing oracle mismatch.
    // (A cluster arriving in ONE batch has old width 0 — under the cap it
    // emits like the one-shot, over it both caps suppress — no window.)
    val widths = oldBands.withColumn("__old", lit(1L))
      .unionByName(newBands.select(col("doc_id"), col("band_id"), col("band_h"))
        .withColumn("__old", lit(0L)))
      .join(touchedBuckets, Seq("band_id", "band_h"), "left_semi")
      .groupBy(col("band_id"), col("band_h"))
      .agg(count(lit(1)).as("__w"), sum(col("__old")).as("__wOld"))
    // __wOld >= 2, not > 0 (review r13): a pre-batch width of 1 can never
    // have emitted a pair (pairs need two members), so a single-old-member
    // bucket crossing the cap matches the one-shot exactly — zero pairs
    // from both — and must not kill a healthy stream.
    // The guard RIDES the same filter that prunes wide buckets (r14, the
    // CdcSource assert_true idiom): the r13 shape ran a dedicated count
    // action per micro-batch — an extra job and an extra scan of the bands
    // state every trigger, measured ~0.15-0.25 s/batch on q_dedup_stream/
    // q_dedup_incr. Every widths row still passes through this predicate
    // (the semi-join fully evaluates its build side), so a crossing fails
    // the batch exactly as loudly — on the batch's first candidate-
    // consuming action; state writes are per-batch overwrites and
    // snapshotRead pins the pre-append snapshot, so a replay of the failed
    // batch re-detects the crossing.
    // ORDER-DEPENDENT (ADVICE r14): the assert_true conjunct must stay to
    // the LEFT of `__w <= maxBucketWidth` inside this one Filter. And
    // short-circuits left-to-right, and a crossing row always FAILS the
    // width conjunct — evaluated first it would silently prune the row the
    // assert exists to raise on. Both conjuncts reference aggregate output,
    // so the optimizer can neither split nor push them today; the
    // IncrementalDedupSpec mid-stream-crossing test is the canary if that
    // ever changes.
    val crossing = col("__w") > maxBucketWidth &&
      col("__wOld") >= 2 && col("__wOld") <= maxBucketWidth
    val narrow = widths
      .filter(assert_true(!crossing, concat(
        lit("updateLsh: touched band bucket (band_id="), col("band_id"),
        lit(", band_h="), col("band_h"),
        lit(s") crossed maxBucketWidth=$maxBucketWidth mid-stream — pairs " +
          "already emitted through it in earlier batches are not " +
          "retracted, so the incremental union no longer equals the " +
          "one-shot capped Dedup.minhashLsh answer; run a one-shot " +
          "compaction to re-derive the capped pairs (or raise " +
          "maxBucketWidth)"))).isNull &&
        col("__w") <= maxBucketWidth)
      .select(col("band_id"), col("band_h"))

    // probe: new bands x all bands; (a < b) ordering makes new x new pairs
    // single after the distinct. Only the probe side needs the narrow
    // semi-join: pairs form exclusively through new-side probes, so
    // filtering the probe removes a wide bucket's pairs entirely.
    val candidates = newBands.join(narrow, Seq("band_id", "band_h"), "left_semi")
      .alias("a").join(allBands.alias("b"),
        col("a.band_id") === col("b.band_id") && col("a.band_h") === col("b.band_h") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")

    val allSets =
      if (eb > 0) {
        // the bucket-id collect is O(buckets) rows, not O(candidates): the
        // candidate pair set itself never reaches the driver. The candidate
        // frame is cached because this action and the verify execution both
        // consume it (deterministic recompute would also be correct — the
        // snapshot is pinned — just wasteful).
        val cand = candidates.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        val touched = cand
          .select(explode(array(pmod(col("doc_a"), lit(eb.toLong)),
            pmod(col("doc_b"), lit(eb.toLong)))).as("b"))
          .distinct().collect().map(_.getLong(0)).toSet
        snapshotRead(spark, setsPath, setsDdl, batchId, Some(touched))
          .unionByName(newSets)
      } else snapshotRead(spark, setsPath, setsDdl, batchId).unionByName(newSets)

    val verified = candidates
      .join(allSets.select(col("doc_id").as("doc_a"), col("hs").as("sha"),
        col("n_sh").as("na")), Seq("doc_a"))
      .join(allSets.select(col("doc_id").as("doc_b"), col("hs").as("shb"),
        col("n_sh").as("nb")), Seq("doc_b"))
      .withColumn("c", expr("graft_overlap_count(sha, shb)"))
      .withColumn("jaccard",
        round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

    // Plan pinned to the pre-append snapshot (see snapshotRead) — append
    // first, return the lazy frame; one execution per consumer action.
    // With a batchId both writes are per-batch overwrites, so a replay (or
    // a crash between the two) converges to a consistent bands+sets pair.
    writeState(newBands, bandsPath, batchId)
    if (eb > 0)
      // repartition by bucket first: partitionBy alone writes up to
      // (tasks x buckets) splinter files — one shuffle of the BATCH's sets
      // (O(batch), not O(corpus)) buys one file per touched bucket
      writeState(newSets
          .withColumn("bucket", pmod(col("doc_id"), lit(eb.toLong)))
          .repartition(col("bucket")),
        setsPath, batchId, partitionCols = Seq("bucket"))
    else writeState(newSets, setsPath, batchId)
    newBands.unpersist(); newSets.unpersist()
    if (eb > 0) { candidates.unpersist(); () }
    verified
  }

  /** Driver-checked incremental contract: split `documents` at the median
    * doc_id (old corpus vs new crawl batch), ingest both through [[update]]
    * with no df cap, and return the SECOND batch's emitted pairs. Exactly
    * the one-shot n-gram-Jaccard pairs with at least one new-side doc
    * (doc_b > split, since doc_a < doc_b) — the oracle grades that
    * equivalence, turning the incremental = one-shot property the specs
    * assert into a gate-checked query. State lives in a scratch dir wiped
    * up front, so the query is re-runnable and self-contained. */
  def twoBatchPairs(spark: SparkSession, dir: String,
                    threshold: Double = 0.5): DataFrame = {
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val maxRow = docs.agg(max(col("doc_id"))).head()
    // max() of an empty table is null — fail with a message instead of a
    // bare NullPointerException out of getLong
    require(!maxRow.isNullAt(0),
      s"twoBatchPairs: documents table at $dir is empty; nothing to split")
    val split = maxRow.getLong(0) / 2
    // Per-APPLICATION scratch dir, wiped at each call: a fixed shared path
    // let two concurrent JVMs (bench alongside tests) wipe each other's
    // state mid-probe, while a per-invocation UUID dir leaked one full
    // postings copy per call (Bench runs this query 3x per invocation).
    // The appId disambiguates JVMs; within one app calls are sequential
    // and each consumer's action completes before the next call wipes —
    // the returned frame reads a pinned file snapshot of THIS call's dirs.
    // One bounded dir per app; a JVM shutdown hook removes it.
    val state = TwoBatchScratch.freshRoot(spark, "graft_incr_twobatch")
    // update() appends state eagerly (the write is an action); batch 1's
    // pair frame is discarded unexecuted — only its postings matter here.
    update(spark, state, docs.filter(col("doc_id") <= split), threshold)
    update(spark, state, docs.filter(col("doc_id") > split), threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}

/** JVM-exit cleanup of driver-query scratch dirs ([[IncrementalDedup
  * .twoBatchPairs]], [[graft.streaming.DedupStream.streamedPairs]]) —
  * local-tmpdir paths, so plain java.io deletion suffices. Also owns the
  * two shapes every streaming driver query shares (r9 review: five
  * copy-pasted preambles and two copy-pasted batch-log readers had
  * already started drifting): [[freshRoot]] and [[batchLog]]. */
private[graft] object TwoBatchScratch {
  // newKeySet.add returns a primitive boolean (first-add = true); the
  // previous ConcurrentHashMap[String, Boolean].putIfAbsent == null check
  // unboxed to false == null — always false — so the hook NEVER registered
  // and scratch dirs leaked one per application.
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def registerCleanup(path: String): Unit =
    if (registered.add(path)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles()
          if (kids != null) kids.foreach(rm)
          f.delete(); ()
        }
        rm(new java.io.File(path))
      }))
    }

  /** One streaming driver query's scratch root —
    * `java.io.tmpdir/<prefix>_<applicationId>` — wiped (every call is a
    * fresh stream, not a resume) and registered for JVM-exit cleanup. */
  def freshRoot(spark: org.apache.spark.sql.SparkSession, prefix: String): String = {
    val root = s"${sys.props("java.io.tmpdir")}/${prefix}_" +
      spark.sparkContext.applicationId
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(rp)) fs.delete(rp, true)
    registerCleanup(root)
    root
  }

  /** A foreachBatch driver's emitted log so far: union over the
    * replay-idempotent per-batch directories (`batch-<id>`), read with an
    * EXPLICIT schema so the result is empty-but-typed before the first
    * batch lands (schema inference over zero files throws). */
  def batchLog(spark: org.apache.spark.sql.SparkSession, outPath: String,
               ddl: String): org.apache.spark.sql.DataFrame = {
    val p = new org.apache.hadoop.fs.Path(outPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    val dirs =
      if (fs.exists(p))
        fs.listStatus(p).filter(_.isDirectory)
          .filter(_.getPath.getName.startsWith("batch-"))
          .map(_.getPath.toString).toSeq
      else Seq.empty[String]
    if (dirs.nonEmpty) spark.read.schema(schema).parquet(dirs: _*)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
  }
}
