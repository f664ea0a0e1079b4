package graft

import graft.ops.{Dedup, Tables}
import graft.streaming.DedupStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The continuous-dedup contract: a corpus streamed in as crawl batches
  * must emit, across all batches, exactly the pairs the one-shot LSH run
  * finds on the full corpus — including when the query is killed inside a
  * batch window (commit erased) and resumed from its checkpoint. */
class DedupStreamSpec extends SparkSpec {

  // ONE one-shot oracle for the whole suite (review r11: three tests
  // re-ran the full MinHash+LSH pipeline to rebuild an identical set)
  private lazy val oneShotLsh: Set[(Long, Long, Double)] =
    pairSet(Dedup.minhashLsh(spark, sf))

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select(col("doc_a"), col("doc_b"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  /** Stage the sf0.001 documents as four single-file crawl batches. */
  private def writeFeed(root: String): String = {
    val feed = s"$root/feed"
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    DedupStream.stageBatches(feed, (0 until 4).map { i =>
      // [lo, hi) buckets with an unbounded last one — doc_ids start at 0
      val lo = maxId * i / 4
      val hi = maxId * (i + 1) / 4
      docs.filter(col("doc_id") >= lo &&
        (if (i == 3) lit(true) else col("doc_id") < hi))
    })
    feed
  }

  test("streamed batches union to exactly the one-shot LSH answer") {
    val root = tmpDir("dedupstream")
    val feed = writeFeed(root)
    val q = DedupStream.start(spark, feed, s"$root/state", s"$root/pairs",
      s"$root/ckpt", maxFilesPerTrigger = Some(1))
    try q.processAllAvailable() finally q.stop()
    val streamed = pairSet(DedupStream.pairs(spark, s"$root/pairs"))
    val oneShot = oneShotLsh
    assert(streamed.nonEmpty)
    assert(streamed === oneShot)
  }

  test("periodic state compaction changes nothing in the emitted pair log") {
    val root = tmpDir("dedupstream_compact")
    val feed = writeFeed(root)
    // compact at the head of every batch after the first: batches 1..3 each
    // fold the prior state into flat files before probing it
    val q = DedupStream.start(spark, feed, s"$root/state", s"$root/pairs",
      s"$root/ckpt", maxFilesPerTrigger = Some(1), compactEvery = 1)
    try q.processAllAvailable() finally q.stop()
    val log = DedupStream.pairs(spark, s"$root/pairs")
    val compacted = pairSet(log)
    assert(compacted === oneShotLsh)
    assert(log.count() === compacted.size.toLong, "duplicate rows after compaction")
    // and the state really was folded: batches 0..2 have no subdirs left
    // (batch 3 appended after the last compaction, so its subdir remains)
    for (b <- 0 until 3; store <- Seq("bands", "sets"))
      assert(!new java.io.File(s"$root/state/$store/batch-$b").exists(),
        s"$store/batch-$b survived compaction")
    assert(new java.io.File(s"$root/state/bands").listFiles()
      .exists(_.getName.endsWith(".parquet")), "no flat files after compaction")
  }

  test("compaction cadence survives a crash in the batch window: replayed " +
    "batch re-compacts idempotently and the log converges") {
    val root = tmpDir("dedupstream_compact_crash")
    val feed = writeFeed(root)
    val ckpt = s"$root/ckpt"
    // phase 1: compaction at every batch head; kill after >= 2 commits, so
    // the in-flight batch's compaction (and possibly its writes) ran but
    // its commit is then erased
    val q1 = DedupStream.start(spark, feed, s"$root/state", s"$root/pairs",
      ckpt, maxFilesPerTrigger = Some(1), trigger = Trigger.ProcessingTime(0L),
      compactEvery = 1)
    CkptCrash.awaitCommits(ckpt, 2)
    q1.stop()
    CkptCrash.simulateCrashAtLastCommit(spark, ckpt)
    // resume with the same cadence: the replayed batch k re-runs its
    // compaction over the already-compacted flat files (idempotent fold,
    // excludeBatch keeps k's crashed subdir out), then re-emits its pairs
    val q2 = DedupStream.start(spark, feed, s"$root/state", s"$root/pairs",
      ckpt, maxFilesPerTrigger = Some(1), compactEvery = 1)
    try q2.processAllAvailable() finally q2.stop()
    val log = DedupStream.pairs(spark, s"$root/pairs")
    val resumed = pairSet(log)
    assert(resumed === oneShotLsh)
    assert(log.count() === resumed.size.toLong,
      "duplicate rows in the replayed pair log")
  }

  test("killed mid-batch with a lost commit, the resumed pair log equals " +
    "the uninterrupted run") {
    val root = tmpDir("dedupstream_crash")
    val feed = writeFeed(root)
    val ckpt = s"$root/ckpt"
    // phase 1: continuous trigger, one file per batch; kill after >= 2 commits
    val q1 = DedupStream.start(spark, feed, s"$root/state", s"$root/pairs",
      ckpt, maxFilesPerTrigger = Some(1), trigger = Trigger.ProcessingTime(0L))
    try CkptCrash.awaitCommits(ckpt, 2)
    finally q1.stop()
    // crash window: state subdirs and pair dirs for batch k AND any batch
    // the stop() interrupted beyond it may exist, but the checkpoint says
    // none of them committed — resume must replay batch k against the
    // pre-k snapshot only (snapshotRead excludes subdir ids >= k; the
    // later batches overwrite their own subdirs when they re-run)
    CkptCrash.simulateCrashAtLastCommit(spark, ckpt)
    val q2 = DedupStream.start(spark, feed, s"$root/state", s"$root/pairs",
      ckpt, maxFilesPerTrigger = Some(1))
    try q2.processAllAvailable() finally q2.stop()
    val log = DedupStream.pairs(spark, s"$root/pairs")
    val resumed = pairSet(log)
    val oneShot = oneShotLsh
    assert(resumed === oneShot)
    // the replayed batch must not pair against its own crashed copy: that
    // bug emits each of its pairs 4x (2 state copies per side), which a
    // set compare cannot see — the row count can
    assert(log.count() === resumed.size.toLong,
      "duplicate rows in the replayed pair log")
  }

  test("corpusHalves splits at the midpoint of the ACTUAL id range: a " +
    "corpus whose ids start away from zero is splittable (r9 review: " +
    "max/2 falsely rejected offset shards)") {
    import spark.implicits._
    val offsetDocs = Seq.range(5000L, 6001L).map(i => (i, s"d$i"))
      .toDF("doc_id", "text")
    val halves = DedupStream.corpusHalves(offsetDocs)
    val (a, b) = (halves(0).count(), halves(1).count())
    assert(a > 0 && b > 0 && a + b === 1001L,
      s"both halves populated, nothing lost: $a + $b")
    // the two halves partition the id range at (min+max)/2
    assert(halves(0).agg(max(col("doc_id"))).head().getLong(0) === 5500L)
    assert(halves(1).agg(min(col("doc_id"))).head().getLong(0) === 5501L)
  }
}
