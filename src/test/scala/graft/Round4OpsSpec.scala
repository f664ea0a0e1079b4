package graft

import graft.ops.{Dedup, IncrementalDedup, Relational, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-4 additions: SCD2 history materialization, word-entropy quality
  * scoring, per-source corpus profiling, and the gate-checked incremental
  * dedup contract. The DuckDB oracle pins exact values; these specs pin
  * the structural contracts. */
class Round4OpsSpec extends SparkSpec {

  test("scd2: one version per event, intervals chain, exactly one current per key") {
    val rows = Relational.scd2(spark, sf).collect()
    val nEvents = ops.Tables.events(spark, sf).count()
    assert(rows.length.toLong === nEvents)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, vs) =>
      // ordered output: valid_to of version i == valid_from of version i+1
      vs.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(3) === b.getLong(2))
        case _           =>
      }
      // exactly one open (current) version, and it is the last one
      assert(vs.count(_.getBoolean(4)) === 1)
      assert(vs.last.getBoolean(4))
      assert(vs.init.forall(v => !v.isNullAt(3)))
    }
  }

  test("entropy: bounded by log2(n_tok), zero iff all tokens identical") {
    val rows = TextAnalysis.entropy(spark, sf).collect()
    assert(rows.length.toLong === ops.Tables(spark, sf, "documents").count())
    rows.foreach { r =>
      val (n, h) = (r.getLong(1), r.getDouble(2))
      assert(h >= -1e-9)
      assert(h <= math.log(n.toDouble) / math.log(2.0) + 1e-4)
    }
  }

  test("source profile: partitions the corpus, dup accounting consistent") {
    val rows = TextAnalysis.sourceProfile(spark, sf).collect()
    val total = ops.Tables(spark, sf, "documents").count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      val (nDocs, nUniq, dupRatio) = (r.getLong(1), r.getLong(4), r.getDouble(5))
      assert(nUniq >= 1L && nUniq <= nDocs)
      assert(math.abs(dupRatio - (nDocs - nUniq).toDouble / nDocs) < 1e-3)
    }
  }

  test("gram pos hashes: positional, duplicates preserved, matches SQL equivalent") {
    graft.functions.TextFunctions.register(spark)
    import spark.implicits._
    val df = Seq("a b c a b c a b", "x y", "solo", "").toDF("text")
    val got = df.select(expr("graft_gram_pos_hashes(text, 3)").as("h")).collect()
      .map(_.getSeq[Long](0))
    // 8 tokens -> 6 positional 3-grams; repeated text repeats hashes
    assert(got(0).length === 6)
    assert(got(0)(0) === got(0)(3)) // "a b c" at pos 0 and 3
    assert(got(0)(1) === got(0)(4))
    assert(got(1).isEmpty && got(2).isEmpty) // shorter than n
    assert(got(3).isEmpty)
    // parity with the interpreted HOF formulation it replaces (guarded:
    // sequence(1, 0) counts DOWN in Spark, so short texts need the branch)
    val ref = df.select(expr(
      """CASE WHEN size(split(text, ' ')) < 3 THEN array()
        |ELSE transform(sequence(1, size(split(text, ' ')) - 2),
        |  i -> xxhash64(concat_ws(' ', slice(split(text, ' '), i, 3)))) END"""
        .stripMargin).as("h")).collect().map(_.getSeq[Long](0))
    got.zip(ref).foreach { case (g, r) => assert(g === r) }
  }

  test("dup spans: corpus-duplicated positions flagged, runs contiguous") {
    val rows = TextAnalysis.dupSpans(spark, sf).collect()
    assert(rows.length.toLong === ops.Tables(spark, sf, "documents").count())
    rows.foreach { r =>
      val (nPos, nDup, longest, ratio) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nDup <= nPos)
      assert(longest <= nDup)
      assert(nDup == 0 || longest >= 1)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
    // the fixture corpus is known to contain cross-doc duplication
    assert(rows.exists(_.getLong(2) > 0))
  }

  test("scrub spans: untouched docs pass through, exact copies of earlier " +
    "docs empty out, counts reconcile") {
    val docs = ops.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextAnalysis.scrubDupSpans(spark, sf).collect()
    assert(rows.length === docs.size)
    rows.foreach { r =>
      val (id, nTok, nScrub, clean) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(nScrub >= 0 && nScrub <= nTok)
      if (nScrub == 0) assert(clean === docs(id)) // untouched => verbatim
      // kept-token count reconciles with the reassembled text (an empty
      // clean_text is ambiguous — zero tokens vs one kept empty token —
      // so reconcile only the nonempty case)
      if (clean.nonEmpty)
        assert(clean.split(" ", -1).length.toLong === nTok - nScrub, s"doc $id")
    }
    assert(rows.exists(r => r.getLong(2) > 0 && r.getString(3).nonEmpty),
      "fixture should contain a partially scrubbed doc")
    assert(rows.exists(r => r.getLong(2) > 0 && r.getString(3).isEmpty),
      "fixture should contain a fully scrubbed doc")
  }

  test("scrub spans: keep-first policy on a crafted corpus — the smallest " +
    "id keeps its text, copies empty out, a partial overlap loses its span") {
    // the sf fixtures have no byte-identical texts (full scrubs there come
    // from full gram coverage), so the policy branch needs its own corpus
    val dir = tmpDir("scrubcrafted")
    val shared = "one two three four five six seven"
    spark.createDataFrame(Seq(
      (10L, shared),                          // first occurrence: kept
      (20L, shared),                          // exact copy: fully scrubbed
      (30L, s"alpha beta $shared"),           // shares the 5-gram suffix
      (40L, "tiny doc"),                      // < 5 tokens: never touched
      (50L, shared)                           // another copy: fully scrubbed
    )).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.scrubDupSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(got(10L) === ((0L, shared)), "first occurrence must keep its text")
    assert(got(20L) === ((7L, "")), "exact copy must scrub in full")
    assert(got(50L) === ((7L, "")), "every later copy must scrub in full")
    assert(got(40L) === ((0L, "tiny doc")), "sub-gram doc must pass through")
    // doc 30 (9 tokens): its gram starts 2,3,4 equal doc 10's grams, and
    // those flagged starts cover token positions 2..8 — all seven shared
    // tokens go, only the "alpha beta" prefix survives
    assert(got(30L) === ((7L, "alpha beta")),
      s"partial overlap wrong: ${got(30L)}")
  }

  test("vocab coverage: ranked by frequency, cumulative share is monotone") {
    val rows = TextAnalysis.vocabCoverage(spark, sf).collect()
    assert(rows.length === 20)
    assert(rows.map(_.getInt(0)).toSeq === (1 to 20))
    val tfs = rows.map(_.getLong(2))
    assert(tfs.zip(tfs.tail).forall { case (a, b) => a >= b })
    val cums = rows.map(_.getDouble(4))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(cums.last <= 1.0 + 1e-9)
  }

  test("retention: offsets non-negative, week-0 actives bound later weeks") {
    val rows = Relational.retention(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (_, vs) =>
      assert(vs.forall(_.getLong(1) >= 0L))
      // week 0 exists (the signup itself is activity in its own week) and
      // no later week can have more distinct actives than the cohort did
      val w0 = vs.find(_.getLong(1) == 0L)
      assert(w0.isDefined)
      vs.foreach(v => assert(v.getLong(2) <= w0.get.getLong(2)))
    }
  }

  test("pq-adc: well-formed top-k, recall well above chance") {
    val pq = Similarity.pqTopK(spark, sf).collect()
    val nQ = 10
    assert(pq.length === nQ * 5)
    pq.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq === (1 to 5))
      // approximate squared distances (micro-units) are non-negative up to
      // the per-entry rounding of exact zeros
      rows.foreach(r => assert(r.getLong(3) >= -8L))
    }
    val bf = Similarity.bruteForceTopK(spark, sf).collect()
    def sets(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val (p, b) = (sets(pq), sets(bf))
    // toSeq: mapping over the key SET would dedupe equal per-query recalls
    val recall = b.keys.toSeq.map(q => p(q).intersect(b(q)).size.toDouble / b(q).size)
      .sum / b.size
    // measured 0.22 with 16 seed codewords vs 0.01 by chance (5/499);
    // trained sub-codebooks (kmeansFit per subspace) are the quality path
    assert(recall >= 0.1, s"PQ recall@5 $recall")
  }

  test("trained-pq: joint Lloyd codebooks are well-formed, recall comparable to seed tier") {
    val cb = Similarity.pqTrainCodebooks(spark, sf, maxIter = 2).collect()
    assert(cb.length === 8 * 16) // every (subspace, codeword) survives (dead-cell rule)
    assert(cb.forall(_.getSeq[Double](2).length === 8))
    val tr = Similarity.pqTopKTrained(spark, sf, maxIter = 2).collect()
    val seed = Similarity.pqTopK(spark, sf).collect()
    val bf = Similarity.bruteForceTopK(spark, sf).collect()
    def sets(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val (p, q, b) = (sets(tr), sets(seed), sets(bf))
    def recall(m: Map[Long, Set[Long]]) =
      b.keys.toSeq.map(k => m(k).intersect(b(k)).size.toDouble / b(k).size).sum / b.size
    val (rTr, rSeed) = (recall(p), recall(q))
    // Measured negative result (kept honest): on the synthetic near-uniform
    // embeddings there is no cluster structure for Lloyd to learn — trained
    // centroids shrink toward the mean and recall stays at the seed tier's
    // level (0.18-0.22 vs 0.22 across iteration counts) instead of beating
    // it. The assertion pins "comparable, well above chance", which is what
    // this fixture can support; on clustered real data the trained tier is
    // the quality path.
    assert(rTr >= 0.1 && rTr >= rSeed - 0.1, s"trained $rTr vs seed $rSeed")
  }

  test("approx percentile stays within 2% of the exact tier") {
    // the 2% verdicts are now part of the query's own output (and the
    // oracle pins them to TRUE); this spec asserts them directly plus the
    // exact-tier agreement the verdicts are computed against
    val exact = Relational.percentiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Relational.approxPercentiles(spark, sf).collect()
    assert(approx.length === exact.size)
    approx.foreach { r =>
      val (med, p90) = exact(r.getString(0))
      assert(r.getDouble(1) === med, s"${r.getString(0)} exact median mismatch")
      assert(r.getDouble(2) === p90, s"${r.getString(0)} exact p90 mismatch")
      assert(r.getAs[Boolean]("median_ok"), s"${r.getString(0)} median outside 2%")
      assert(r.getAs[Boolean]("p90_ok"), s"${r.getString(0)} p90 outside 2%")
    }
  }

  test("scd2 current versions agree with the last-write-wins compaction") {
    // cross-operator invariant: the open (is_current) SCD2 row per key IS
    // the row last-write-wins keeps — two independent formulations of
    // "latest state" must agree (modulo their tiebreaks on equal ts: scd2
    // orders by (ts, event_id), lww by (ts desc, event_id desc) — same row)
    val current = Relational.scd2(spark, sf).collect()
      .filter(_.getBoolean(4)).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lww = Relational.dedupLww(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(current === lww)
  }

  test("outliers: threshold accounting is exact and bounded") {
    val rows = Relational.outliers(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = ops.Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      // real-valued bound: integer n/10 would demand n_outliers < 0 for
      // any group of <= 10 rows, failing spuriously on small fixtures
      assert(r.getLong(4) >= 0L && r.getLong(4) <= r.getLong(1) * 0.1,
        s"${r.getString(0)}: 3-sigma outliers should be rare")
    }
  }

  test("incremental two-batch pairs == one-shot pairs with a new side") {
    val docs = ops.Tables(spark, sf, "documents")
    val split = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    val oneShot = Dedup.ngramJaccard(spark, sf, 0.5, dfCap = Int.MaxValue)
      .filter(col("doc_b") > split)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val incr = IncrementalDedup.twoBatchPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incr === oneShot)
  }
}
