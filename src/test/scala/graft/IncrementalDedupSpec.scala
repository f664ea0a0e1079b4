package graft

import graft.ops.{Dedup, IncrementalDedup}
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  // select-by-NAME like DedupStreamSpec's sibling (review r11: positional
  // gets silently compare the wrong columns if update() ever reorders)
  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select(col("doc_a"), col("doc_b"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  // null-guarded dir listing (review r11: a renamed layout dir made
  // listFiles() return null and the test die with a bare NPE instead of
  // the prepared diagnostic)
  private def filesIn(path: String): Array[java.io.File] =
    Option(new java.io.File(path).listFiles())
      .getOrElse(fail(s"missing dir: $path"))

  test("incremental batches union to exactly the one-shot answer (uncapped)") {
    val state = tmpDir("incstate") + "/postings"
    val docs = ops.Tables(spark, sf, "documents")
    // three arrival batches, any interleaving of ids
    val emittedSeq = (0 until 3).flatMap { b =>
      val batch = docs.filter(col("doc_id") % 3 === b)
      val out = IncrementalDedup.update(spark, state, batch)
      // re-execute the RETURNED frame after the state append — regression
      // for the refreshByPath cache invalidation that double-read the state
      assert(out.count() === out.dropDuplicates("doc_a", "doc_b").count())
      pairSet(out).toSeq
    }
    val emitted = emittedSeq.toSet
    assert(emittedSeq.size === emitted.size) // nothing emitted twice, ever
    val oneShot = pairSet(
      Dedup.ngramJaccard(spark, sf, threshold = 0.5, dfCap = Int.MaxValue))
    assert(emitted === oneShot)
    assert(emitted.nonEmpty) // the fixture plants near-dup pairs
  }

  test("streaming ingest: foreachBatch maintains the dup index as docs arrive") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmpDir("incstream")
    val state = s"$root/postings"
    val pairsOut = s"$root/pairs"
    val mem = MemoryStream[(Long, String)](spark)
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // batchId makes the state append an idempotent per-batch overwrite,
        // so an at-least-once replay cannot double the postings
        IncrementalDedup.update(spark, state, batch, batchId = Some(id))
          .write.mode("append").parquet(pairsOut)
      }
      .start()
    mem.addData((1L, "alpha beta gamma delta epsilon zeta eta theta"))
    q.processAllAvailable()
    mem.addData((2L, "alpha beta gamma delta epsilon zeta eta theta"),
                (3L, "one two three four five six seven eight"))
    q.processAllAvailable()
    mem.addData((4L, "one two three four five six seven eight nine"))
    q.processAllAvailable(); q.stop()
    val rows = spark.read.parquet(pairsOut)
      .select(col("doc_a"), col("doc_b"), col("jaccard")).collect()
    // (1,2) identical from batch 2; (3,4) near-dup across batches 2 and 3 —
    // exactly ONE row each (the sink write re-executes the returned frame
    // after the state append; emission must still be single)
    assert(rows.length === 2)
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L), (3L, 4L)))
  }

  test("incremental LSH batches union to exactly the one-shot LSH answer") {
    val state = tmpDir("inclsh")
    val docs = ops.Tables(spark, sf, "documents")
    val emittedSeq = (0 until 3).flatMap { b =>
      val batch = docs.filter(col("doc_id") % 3 === b)
      val out = IncrementalDedup.updateLsh(spark, state, batch)
      assert(out.count() === out.dropDuplicates("doc_a", "doc_b").count())
      pairSet(out).toSeq
    }
    val emitted = emittedSeq.toSet
    assert(emittedSeq.size === emitted.size)
    val oneShot = pairSet(Dedup.minhashLsh(spark, sf))
    assert(emitted === oneShot)
    assert(emitted.nonEmpty)
    // the bucketed sets layout (partition-pruned verify reads) must be
    // output-identical over the same batch sequence, with batch ids so the
    // layout takes effect (per-batch subdirs + bucket partition dirs)
    val bstate = tmpDir("inclsh_bucketed")
    val bucketed = (0 until 3).flatMap { b =>
      pairSet(IncrementalDedup.updateLsh(spark, bstate,
        docs.filter(col("doc_id") % 3 === b), batchId = Some(b.toLong),
        buckets = 16)).toSeq
    }.toSet
    assert(bucketed === oneShot)
    // and the layout really is bucketed: sets files live under bucket= dirs
    assert(filesIn(s"$bstate/sets/batch-2").exists(_.getName.startsWith("bucket=")),
      "bucketed layout missing bucket= partition dirs")
  }

  test("ADVICE r12: a band bucket crossing maxBucketWidth MID-STREAM fails " +
    "loud (pairs already emitted are not retractable); a cluster arriving " +
    "over-cap in ONE batch is capped silently like the one-shot") {
    def cluster(ids: Range): org.apache.spark.sql.DataFrame =
      ids.map(i => (i.toLong, "alpha beta gamma delta epsilon zeta"))
        .toDF("doc_id", "text")
    // single-batch over-cap cluster: old width 0 -> no parity window; the
    // cap suppresses the quadratic emission (one-shot dfCap agrees: all
    // shingles have df 6 > 4 -> capped overlap 0 -> no pairs)
    val state1 = tmpDir("lshcap_onebatch")
    val out1 = IncrementalDedup.updateLsh(spark, state1, cluster(1 to 6),
      maxBucketWidth = 4)
    assert(out1.count() === 0L, "over-cap single-batch cluster must emit 0")
    // mid-stream crossing: batch 1 is UNDER the cap (width 3, pairs emitted
    // like the one-shot), batch 2 pushes the same buckets to width 6 > 4 —
    // those batch-1 pairs can never be retracted, so the union-equals-
    // one-shot contract is broken and the call must say so loudly
    val state2 = tmpDir("lshcap_crossing")
    val under = IncrementalDedup.updateLsh(spark, state2, cluster(1 to 3),
      maxBucketWidth = 4)
    assert(under.count() === 3L, "under-cap batch emits its C(3,2) pairs")
    // the guard rides the bucket-pruning filter (r14), so it surfaces as a
    // task-level raise wrapped by the job — walk the cause chain for the
    // named contract instead of pinning the wrapper type
    val e = intercept[Exception] {
      IncrementalDedup.updateLsh(spark, state2, cluster(4 to 6),
        maxBucketWidth = 4).count()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(msgs.contains("crossed") && msgs.contains("maxBucketWidth"),
      s"parity-window failure must name the contract, got: $msgs")
    // width-1 pre-batch bucket crossing the cap is NOT a parity window
    // (review r13): one old member can never have emitted a pair, so both
    // tiers agree on zero pairs — the guard must not kill a healthy stream
    val state3 = tmpDir("lshcap_width1")
    assert(IncrementalDedup.updateLsh(spark, state3, cluster(1 to 1),
      maxBucketWidth = 4).count() === 0L)
    assert(IncrementalDedup.updateLsh(spark, state3, cluster(2 to 7),
      maxBucketWidth = 4).count() === 0L,
      "single-old-member cap crossing must suppress silently, not raise")
  }

  test("bucketed sets store pins its modulus against mismatched callers") {
    val state = tmpDir("inclsh_modulus")
    val docs = ops.Tables(spark, sf, "documents")
    // batches 0 and 1 lay the store out at modulus 16; batch 2 asks for 7 —
    // pruning batch-0/1 dirs (written under 16) with pmod(...,7) would drop
    // verify sets and lose pairs, so the stored modulus must win
    val emitted = Seq(16, 16, 7).zipWithIndex.flatMap { case (m, b) =>
      pairSet(IncrementalDedup.updateLsh(spark, state,
        docs.filter(col("doc_id") % 3 === b), batchId = Some(b.toLong),
        buckets = m)).toSeq
    }.toSet
    assert(emitted === pairSet(Dedup.minhashLsh(spark, sf)))
    // the marker records the first writer's modulus...
    val marker = scala.io.Source.fromFile(s"$state/sets/_buckets")
    try assert(marker.mkString.trim === "16") finally marker.close()
    // ...and batch 2 was WRITTEN under it too: modulus 7 could only produce
    // bucket dirs 0..6, so a dir >= 7 proves the stored 16 was used
    val b2 = filesIn(s"$state/sets/batch-2")
      .filter(_.getName.startsWith("bucket=")).map(_.getName.stripPrefix("bucket=").toInt)
    assert(b2.exists(_ >= 7), s"batch-2 buckets ${b2.mkString(",")} all < 7")
  }

  test("state compaction mid-sequence changes nothing but the file count") {
    val state = tmpDir("inccompact") + "/postings"
    val docs = ops.Tables(spark, sf, "documents")
    val before = (0 until 2).flatMap { b =>
      pairSet(IncrementalDedup.update(spark, state,
        docs.filter(col("doc_id") % 3 === b))).toSeq
    }
    val filesBefore = filesIn(state).count(_.getName.endsWith(".parquet"))
    IncrementalDedup.compactState(spark, state,
      IncrementalDedup.postingsDdl, numFiles = 1)
    val filesAfter = filesIn(state).count(_.getName.endsWith(".parquet"))
    assert(filesAfter === 1 && filesAfter < filesBefore)
    // the third batch over compacted state completes the exact one-shot set
    val after = pairSet(IncrementalDedup.update(spark, state,
      docs.filter(col("doc_id") % 3 === 2))).toSeq
    val oneShot = pairSet(
      Dedup.ngramJaccard(spark, sf, threshold = 0.5, dfCap = Int.MaxValue))
    assert((before ++ after).toSet === oneShot)
    assert((before ++ after).size === oneShot.size)
  }

  test("a batch only pays for itself: old x old pairs never re-emitted") {
    val state = tmpDir("incstate2") + "/postings"
    val b1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val b2 = Seq(
      (3L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val b3 = Seq(
      (4L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val p1 = pairSet(IncrementalDedup.update(spark, state, b1))
    assert(p1 === Set((1L, 2L, 1.0)))
    val p2 = pairSet(IncrementalDedup.update(spark, state, b2))
    assert(p2 === Set.empty) // disjoint doc: no pairs, and (1,2) NOT re-emitted
    val p3 = pairSet(IncrementalDedup.update(spark, state, b3))
    assert(p3 === Set((1L, 4L, 1.0), (2L, 4L, 1.0))) // new side pairs only
  }

  test("torn _buckets marker (review r11): crash garbage over an EMPTY " +
    "layout heals (read as absent, re-minted atomically); over an " +
    "existing bucketed layout it fails LOUD naming the repair instead of " +
    "silently adopting a new modulus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // empty layout: a torn (empty) marker from an interrupted first write
    val state1 = tmpDir("incr-torn-empty") + "/lsh"
    val sets1 = new java.io.File(s"$state1/sets")
    assert(sets1.mkdirs())
    locally {
      val m1 = new org.apache.hadoop.fs.Path(s"$state1/sets/_buckets")
      val fs1 = m1.getFileSystem(spark.sessionState.newHadoopConf())
      fs1.create(m1, true).close() // length 0: interrupted first write
    }
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "text")
    // pre-fix: NumberFormatException forever; now the garbage heals and the
    // bucketed write proceeds with the requested modulus
    IncrementalDedup.updateLsh(spark, state1, docs, buckets = 4).count()
    val stored = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(sets1, "_buckets").toPath), "UTF-8").trim
    assert(stored === "4", s"the healed marker must carry the modulus: $stored")

    // bucketed layout already on disk: a torn marker must not be silently
    // re-minted with a possibly different modulus
    val state2 = tmpDir("incr-torn-layout") + "/lsh"
    IncrementalDedup.updateLsh(spark, state2, docs, buckets = 4).count()
    // torn via the Hadoop fs (a raw java.io overwrite would instead trip
    // the .crc sidecar — also handled, but this pins the parse path)
    val m2 = new org.apache.hadoop.fs.Path(s"$state2/sets/_buckets")
    val fs2 = m2.getFileSystem(spark.sessionState.newHadoopConf())
    val o2 = fs2.create(m2, true)
    try o2.write("garbage".getBytes("UTF-8")) finally o2.close()
    val e = intercept[IllegalStateException] {
      IncrementalDedup.updateLsh(spark, state2,
        Seq((3L, "more text for the third document in the torn store"))
          .toDF("doc_id", "text"), buckets = 8).count()
    }
    assert(e.getMessage.contains("torn _buckets marker") &&
      e.getMessage.contains("modulus"), e.getMessage)
  }
}
