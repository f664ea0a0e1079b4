package graft

import org.apache.spark.sql.functions._

/** Physical-plan assertions — the 100 TB posture is checked, not assumed:
  * dims broadcast, filters reach the parquet scan, aggregates are two-phase
  * (map-side partial), top-k avoids a global sort. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q3: small dimension side is broadcast, not shuffled") {
    assert(plan("q3_join_topk").contains("BroadcastHashJoin"))
  }

  test("q5: all dimension joins broadcast; only the fact tables shuffle") {
    val p = plan("q5_multijoin")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(2000))
  }

  test("filters are pushed down to the parquet scan") {
    val p = plan("q_filter")
    assert(p.contains("PushedFilters: ["), p.take(2000))
    assert(p.contains("In(event_type") || p.contains("EqualTo(event_type"), p.take(2000))
    assert(p.contains("GreaterThan(value"), p.take(2000))
  }

  test("projection pruning reaches the scan (ReadSchema is narrow)") {
    val p = plan("q_dedup_exact")
    // only text + doc_id should be read from a 5-column table
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p.take(2000))
  }

  test("q1: aggregation is two-phase (map-side partial before the shuffle)") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
    assert(p.contains("partial_"), p.take(2000))
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(plan("q_topk").contains("TakeOrderedAndProject"))
  }

  test("range join keeps its equi-key (hash/merge join, not nested loop)") {
    val p = plan("q_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("grouping sets expand in one pass (single Expand, no union of scans)") {
    val p = plan("q_grouping_sets")
    assert("Expand".r.findAllIn(p).size >= 1, p.take(2000))
    assert("Scan parquet".r.findAllIn(p).size <= 3, p.take(2000)) // 3 tables, 1 scan each
  }

  test("tfidf top-k per group gets the WindowGroupLimit pushdown") {
    // rank<=k is evaluated as a per-partition group limit BEFORE the window
    // shuffle (Spark 3.5+), so the shuffle moves k rows per doc, not all
    val p = plan("q_tfidf")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("prefix-filtered dedup joins stay keyed (no nested loop anywhere)") {
    val p = plan("q_dedup_ngram_prefix")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("ivf: the corpus is never shuffled — seeds and probes broadcast to it") {
    val p = plan("q_ann_ivf")
    // the probe join against the assigned corpus is a broadcast hash join;
    // the only Exchanges are for the tiny query/probe windows, not a
    // repartition of the corpus by cell
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("ann-lsh: band join broadcasts the probe side; every join stays keyed") {
    val p = plan("q_ann_lsh")
    // probes (numQueries * tables * (bits+1) rows) broadcast against the
    // corpus bucket index; the exact-cosine join-back is keyed on ids
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("decontamination joins stay keyed on the shingle hash") {
    val p = plan("q_decontaminate")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("filter funnel is one scan and one aggregate") {
    val p = plan("q_filter_funnel")
    assert("Scan parquet".r.findAllIn(p).size === 1, p.take(2000))
  }

  test("sequence packing windows per (split, shard), never a global order") {
    val p = plan("q_pack_sequences")
    // the window partitions by both keys; a global (empty-key) window or
    // a single-partition Exchange would serialize the corpus
    assert(!p.contains("SinglePartition"), p.take(2000))
  }

  test("mix deciles: ntile runs per shard partition, not one global sort") {
    val p = plan("q_mix_deciles")
    assert(!p.contains("SinglePartition"), p.take(2000))
    assert(p.contains("ntile"), p.take(2000))
  }

  test("window analytics: all frames share one per-user sort, no extra exchanges") {
    val p = plan("q_window_analytics")
    assert(!p.contains("SinglePartition"), p.take(2000))
    // lead/first/last and the range frame partition identically -> one
    // hashpartitioning exchange on user_id feeds every window
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size >= 1, p.take(2000))
  }

  test("stats agg: one two-phase aggregate computes every moment (no extra scans)") {
    val p = plan("q_stats_agg")
    assert(p.contains("partial_"), p.take(2000))
    assert("FileScan parquet".r.findAllIn(p).size === 1, p.take(2000))
  }

  test("histogram: arithmetic binning is one two-phase aggregate, no sort") {
    val p = plan("q_histogram")
    assert(p.contains("partial_"), p.take(2000))
    assert("FileScan parquet".r.findAllIn(p).size === 1, p.take(2000))
  }

  test("winsorize: the per-group bounds broadcast back onto the facts") {
    val p = plan("q_winsorize")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("mix weights: corpus totals join as a broadcast, no key shuffle of sources") {
    val p = plan("q_mix_weights")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000)) // single-row cross join broadcasts
  }

  test("vec quantize: the corpus is never shuffled for assignment") {
    val p = plan("q_vec_quantize")
    // one broadcast (the seed row) + the final tiny aggregate shuffle keyed
    // by cell; no exchange of the embeddings on a per-vector key
    assert(!p.contains("hashpartitioning(vec_id"), p.take(2000))
  }

  test("pii scrub: pure per-row work — no exchange except the output sort") {
    val p = plan("q_pii_scrub")
    assert(!p.contains("hashpartitioning"), p.take(2000))
  }

  test("boilerplate: sentence keys shuffle as md5 digests, two-level aggregate") {
    val p = plan("q_boilerplate")
    assert(p.contains("partial_"), p.take(2000))
    assert(p.contains("md5"), p.take(2000))
  }

  test("date-partitioned layout: a date predicate prunes partitions at plan time") {
    // the storage layout a 100 TB event table actually uses: partition dirs
    // by date, so a time-bounded query never lists or reads other days
    val dir = tmpDir("partev") + "/events"
    ops.Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("day") === "2024-03-02" && col("value") > 100)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: ["), p.take(2000))
    assert(p.contains("day"), p.take(2000))
    // the residual value predicate still pushes to parquet
    assert(p.contains("GreaterThan(value"), p.take(2000))
    // pruning is real: the scan's numFiles metric counts only the matching
    // day's files (inputFiles on the DataFrame ignores pruning)
    q.collect()
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val all = spark.read.parquet(dir).inputFiles.length
    assert(scan.metrics("numFiles").value < all,
      s"${scan.metrics("numFiles").value} vs $all")
  }

  test("scd2: one keyed shuffle (the window's partitionBy), nothing else") {
    val p = plan("q_scd2")
    assert(p.contains("Window"), p.take(2000))
    // the lead window and the versioning all ride one hash exchange on the
    // key; only the user-facing output sort may add a range exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(2000))
  }

  test("entropy: both aggregation levels are two-phase with partial state") {
    val p = plan("q_entropy")
    assert("partial_".r.findAllIn(p).size >= 2, p.take(2000))
    assert("Scan parquet".r.findAllIn(p).size === 1, p.take(2000))
  }

  test("source profile: single scan, hash-based distinct (no text shuffle)") {
    val p = plan("q_source_profile")
    assert("Scan parquet".r.findAllIn(p).size === 1, p.take(2000))
    assert(p.contains("xxhash64"), p.take(2000))
    // partial aggregation runs before the source-key shuffle
    assert(p.contains("partial_"), p.take(2000))
  }

  test("pq-adc: codebook and distance tables broadcast, corpus never nested-loops") {
    val p = plan("q_ann_pq")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
  }

  test("scrub spans: flag, cover and anti-join stay keyed — no pair join") {
    val p = plan("q_scrub_spans")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("dup spans: flagging is a keyed semi-join, no pair join anywhere") {
    val p = plan("q_dup_spans")
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
  }

  test("dedup pipeline: exact stage shuffles on the md5 digest, not the text") {
    val p = plan("q_dedup_pipeline")
    // the exact-dedup groupBy must key its exchange on the 16-byte digest;
    // hashpartitioning directly on the multi-KB text column is the 100 TB
    // shuffle-key mistake this assertion pins against
    assert(p.contains("md5"), p.take(2000))
    assert(!p.contains("Exchange hashpartitioning(text#"), p.take(2000))
  }

  test("bucketed layout: a co-bucketed join plans with zero exchanges") {
    // THE shuffle-elimination technique for repeated big-big joins at
    // 100 TB: both sides bucketed by the join key at write time join with
    // no Exchange at all — each bucket pair streams through a sort-merge
    // join locally. The fixture stands in for lineitem/orders-scale facts.
    // default warehouse dir (static conf); managed tables dropped in finally
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // disable broadcast: at fixture scale the dim side fits under the
    // threshold and a BroadcastHashJoin avoids the key exchanges for ANY
    // layout — the test would pass vacuously and prove nothing about
    // bucketing. Forcing the shuffle-join path makes the zero-exchange
    // assertion actually about the co-bucketed scan.
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val priorBc = spark.conf.get(bcKey)
    spark.conf.set(bcKey, "-1")
    try {
      ops.Tables(spark, sf, "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
      ops.Tables(spark, sf, "lineitem")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
      val j = spark.table("b_lineitem").join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      j.collect() // force final (AQE) plan
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
        !p.contains("Exchange hashpartitioning(o_orderkey"), p.take(3000))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(3000))
    } finally {
      spark.conf.set(bcKey, priorBc)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("para dedup: the first-occurrence window shuffles on the md5 digest, " +
    "never the segment text") {
    val p = plan("q_para_dedup")
    assert(p.contains("hashpartitioning(h#") || p.contains("hashpartitioning(h,"),
      p.take(3000))
    assert(!p.contains("hashpartitioning(seg"), p.take(3000))
  }

  test("bm25: df and corpus stats broadcast; the query-term filter sits at " +
    "the explode, before the tf aggregate") {
    val p = plan("q_bm25")
    assert("BroadcastExchange".r.findAllIn(p).size >= 2, p.take(3000))
    // the only real shuffles: the per-doc tf aggregate, the df aggregate
    // under its broadcast, and the user-facing output sort
    val gen = p.indexOf("Generate explode")
    val filt = p.indexOf("Filter t#")
    assert(gen >= 0 && filt >= 0 && filt < gen,
      "isin must filter directly above the generator\n" + p.take(3000))
  }

  test("dsir: the vocabulary log-ratio table broadcasts onto the token " +
    "stream (the corpus is never re-shuffled for scoring)") {
    val p = plan("q_dsir_weights")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("NestedLoop") ||
      "BroadcastNestedLoopJoin BuildRight, Cross".r.findAllIn(p).size ==
        "NestedLoop".r.findAllIn(p).size, // 1-row totals cross only
      p.take(3000))
  }

  test("stratified sample: both stages stay keyed windows, no nested loop, " +
    "no global (empty-key) window") {
    val p = plan("q_stratified_sample")
    assert(!p.contains("NestedLoop"), p.take(3000))
    // an empty-partitionBy window would plan Exchange SinglePartition —
    // the one-reducer funnel the salted two-stage design exists to avoid
    assert(!p.contains("SinglePartition"), p.take(3000))
    assert(p.contains("hashpartitioning(lang"), p.take(3000))
  }

  test("bloom decontamination: the prefilter sits in the scan stage " +
    "(below the first exchange on the test side)") {
    val p = plan("q_decontaminate_bloom")
    // the bloom probe is Spark's codegen'd might_contain — NOT a scala UDF
    // (a UDF here would break the scan stage's codegen span); scan-side
    // placement means walking DOWN its branch (tree prints parent-then-
    // children) reaches the parquet scan before any Exchange — i.e. only
    // surviving shingles ever shuffle
    assert(!p.contains("UDF"), "scala UDF crept into the bloom plan\n" + p.take(3000))
    val lines = p.linesIterator.toVector
    val fi = lines.indexWhere(l => l.contains("Filter") && l.contains("might_contain"))
    assert(fi >= 0, "no might_contain filter in the plan\n" + p.take(3000))
    val below = lines.drop(fi + 1)
    val scanAt = below.indexWhere(_.contains("FileScan"))
    val exchAt = below.indexWhere(_.contains("Exchange"))
    assert(scanAt >= 0, p.take(3000))
    assert(exchAt < 0 || scanAt < exchAt,
      "an Exchange sits between the bloom filter and its scan\n" + p.take(3000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      p.take(3000))
  }

  test("rrf fusion: both retrieval legs are cut by TakeOrderedAndProject " +
    "before the fusion join; corpus-side stats arrive broadcast") {
    val p = plan("q_rrf_fusion")
    // one top-N per leg: neither leg may global-sort the corpus
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2, p.take(3000))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("hard negatives: query side broadcast, corpus never shuffled " +
    "before scoring") {
    val p = plan("q_hard_negatives")
    // label-inequality is a non-equi predicate: the legal shapes are a
    // broadcast nested-loop of the TINY query side, never a cartesian
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("sem dedup: pair join is cell-blocked (keyed, never cartesian); " +
    "the tiny centroid table arrives broadcast") {
    val p = plan("q_sem_dedup")
    // the labels x cells centroid table is corpus-independent: broadcast
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // the self-join and disposition joins are keyed — all-pairs is the
    // one shape this operator exists to avoid
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("source cap: the sources-sized caps table is broadcast onto the " +
    "corpus; only the 1-row total is nested-loop; ranking never " +
    "cartesians") {
    val p = plan("q_source_cap")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // the corpus-total 1-row cross-join is the only BNLJ
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("ivf-pq: the probe cut and code joins stay keyed/broadcast; only " +
    "the two 1-row seed folds are nested-loop; corpus never cartesians") {
    val p = plan("q_ann_ivfpq")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // assignment + probe ranking each cross-join the 1-row seed set
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p.take(3000))
  }

  test("token budget: no global-order window funnel — every window " +
    "partitions by bucket or runs over the tiny bucket table; the bucket " +
    "sums broadcast back") {
    val p = plan("q_token_budget")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("jl projection: per-row fold against the one-row broadcast sign " +
    "matrix — no corpus shuffle, no cartesian, at most the one-row " +
    "nested-loop") {
    val p = plan("q_jl_project")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("unigram encode: the vocabulary cut is TakeOrderedAndProject; the " +
    "one-row vocabulary map is the only nested-loop; the DP is a per-row " +
    "fold with no extra exchange") {
    val p = plan("q_unigram_encode")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("pmi collocations: top-k is TakeOrderedAndProject; corpus totals " +
    "broadcast; no nested-loop on the pair-to-vocabulary joins") {
    val p = plan("q_pmi_collocations")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    // the two 1-row totals cross-join broadcast
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // pair->unigram joins are keyed (hash or sort-merge), not nested-loop
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      p.take(3000))
  }

  test("weighted sample: A-ES selection is TakeOrderedAndProject — " +
    "per-partition heaps, never a global sort of the corpus") {
    val p = plan("q_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      p.take(3000))
  }

  test("heavy hitters: the recount groupBy is two-phase and fed by the " +
    "candidate filter, so only candidate tokens reach the exchange") {
    val p = plan("q_heavy_hitters")
    assert(p.contains("partial_count") || p.contains("partial_"), p.take(3000))
    // the isin(candidates) filter sits BELOW the recount exchange —
    // formatted plans print children after parents, so the filter must
    // appear AFTER the exchange line (review r11: the old check only
    // asserted existence, so a hoisted filter shuffling every token —
    // exactly the 100 TB mistake — passed green)
    val exIdx = p.indexOf("Exchange hashpartitioning(tok")
    val inIdx = math.max(p.indexOf("INSET"), p.indexOf(" IN ("))
    assert(exIdx >= 0, "recount exchange missing: " + p.take(3000))
    assert(inIdx > exIdx,
      "candidate filter must sit below the recount exchange: " + p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("wordpiece encode: same shape contract as the unigram DP — " +
    "TakeOrderedAndProject vocabulary cut, one broadcast map, no cartesian") {
    val p = plan("q_wordpiece_encode")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("triangles: wedge and closure joins are keyed equi-joins, never " +
    "cartesian; the per-node count is two-phase") {
    val p = plan("q_triangles")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("partial_count"), p.take(3000))
  }

  test("epoch order: shard windows only (hash-uniform, skew-free) — no " +
    "single global window funnel before the final presentation sort; " +
    "scan reads doc_id alone") {
    val p = plan("q_epoch_order")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p.take(3000))
    // the ranking window partitions by shard — a global row_number would
    // show an empty partition spec before the window exchange
    assert(p.contains("hashpartitioning(shard"), p.take(3000))
  }

  test("bitext mine: the source side is broadcast into the brute-force " +
    "scoring tier (the ONE intended nested loop); neighborhood sums and " +
    "selection are keyed windows/joins") {
    val p = plan("q_bitext_mine")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      p.take(3000))
  }

  test("dq checks: per-table metrics fuse into single aggregate passes " +
    "(two-phase), the RI anti join broadcasts the dimension") {
    val p = plan("q_dq_checks")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p.take(3000))
    assert(p.contains("LeftAnti"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("drift: bucket counts are one two-phase aggregate; per-feature " +
    "stats broadcast back onto the bucket table; no cartesian") {
    val p = plan("q_drift")
    assert(p.contains("partial_"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("bitext ivf: margin machinery over the checkpointed candidate " +
    "table is keyed joins + windows — no cartesian, no nested loop") {
    val p = plan("q_bitext_mine_ivf")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("pagerank: every iteration joins keyed (hash/merge) — no nested " +
    "loop anywhere except the 1-row node-count broadcast") {
    val p = plan("q_pagerank")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      p.take(3000))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // per-destination sums are map-side combined
    assert(p.contains("partial_sum"), p.take(3000))
  }

  test("knn graph: the cell self-join is a keyed equi-join (hash/merge on " +
    "label), never a cartesian — per-cell quadratic, corpus-linear shuffles") {
    val p = plan("q_knn_graph")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("knn graph: per-source top-k is a PARTIAL bounded aggregate — the " +
    "src exchange moves k rows per source, not the candidate set") {
    val p = plan("q_knn_graph")
    assert(p.contains("ObjectHashAggregate"), p.take(3000))
    assert(p.contains("partial_topkagg"), p.take(3000))
  }

  test("zorder: the stats side is a broadcast 1-row join and the scan " +
    "reads only the three layout columns") {
    val p = plan("q_zorder")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "1-row stats must broadcast: " + p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // CLOSED struct (review r11): an unclosed prefix passed even when the
    // scan widened to extra columns after o_orderdate
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint," +
      "o_orderdate:timestamp_ntz>"), p.take(3000))
    // the interleave is pure codegen'd integer arithmetic — no udf calls
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("UDF"),
      p.take(3000))
  }

  test("zone map: manifest aggregate is two-phase, output O(shards)") {
    val p = plan("q_zone_map")
    assert(p.contains("partial_min") && p.contains("partial_max") &&
      p.contains("partial_count"), p.take(3000))
  }

  test("corr matrix: all six moment sets ride ONE scan and two-phase " +
    "aggregate — no per-pair scans") {
    val p = plan("q_corr_matrix")
    assert("Scan parquet".r.findAllIn(p).size === 1, p.take(3000))
    assert(p.contains("partial_corr"), p.take(3000))
  }

  test("skew report: per-key counts are two-phase; the hot-key cut is " +
    "TakeOrderedAndProject; the 1-row stats side broadcasts") {
    val p = plan("q_skew_report")
    assert(p.contains("partial_count"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("oov rate: the corpus explodes ONCE — both consumers read the " +
    "checkpointed (lang, token) table and the vocabulary broadcasts") {
    val p = plan("q_oov_rate")
    assert(!p.contains("FileScan parquet"),
      "corpus must be read only inside the one checkpoint materialization: " + p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("partial_sum"), p.take(3000))
  }

  test("compaction plan: shard sizes aggregate two-phase and the scan " +
    "reads only doc_id + text; the prefix window runs over O(shards) rows") {
    val p = plan("q_compaction_plan")
    assert(p.contains("partial_sum"), p.take(3000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      p.take(3000))
    assert(p.contains("Window"), p.take(3000))
  }

  test("data card: the whole profile rides ONE documents scan") {
    val p = plan("q_data_card")
    assert("Scan parquet".r.findAllIn(p).size === 1, p.take(2000))
    assert(p.contains("partial_"), p.take(2000))
  }

  test("sq8: per-dim stats aggregate two-phase and broadcast back; the " +
    "corpus never shuffles on vec_id") {
    val p = plan("q_embed_sq8")
    assert(p.contains("partial_min") || p.contains("partial_"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("lang mix / contrastive pairs: per-doc windows stay PARTITIONED — " +
    "no global window funnel anywhere in the chunk pipelines") {
    Seq("q_lang_mix", "q_contrastive_pairs").foreach { q =>
      val lp = SparkEntry.queries(q)(spark, sf).queryExecution.optimizedPlan
      val unpartitioned = lp.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      assert(unpartitioned.isEmpty, s"$q has a global window")
    }
  }

  test("k-core: every peel round is keyed equi-joins — no cartesian, no " +
    "nested loop against the edge list") {
    val p = plan("q_kcore")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // review r11: the old escape clause ("…|| Scan ExistingRDD") was
    // vacuously true — kCore localCheckpoints every round, so the plan
    // ALWAYS contains Scan ExistingRDD and a nested-loop regression could
    // never trip it. The executed plan has no BNLJ at all; pin that flat,
    // like the label-prop test below.
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("label prop: every round is keyed equi-joins over the checkpointed " +
    "edge list — no cartesian, no nested loop") {
    val p = plan("q_label_prop")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("edit dedup: the deletion-variant self-join is a keyed equi-join " +
    "and the scan reads only (doc_id, text)") {
    val p = plan("q_edit_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      p.take(3000))
  }

  test("rouge: bigram counts, the pruned id scan and the pair table all " +
    "ride checkpoints — the final assembly re-reads no parquet and every " +
    "join is keyed") {
    val p = plan("q_rouge")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert("Scan parquet".r.findAllIn(p).isEmpty, p.take(3000))
  }

  test("quantile norm: the cumulative window is PARTITIONED (by lang) and " +
    "runs over the bounded histogram aggregate, not the corpus; the " +
    "checkpointed doc table is scanned from parquet once") {
    import org.apache.spark.sql.catalyst.plans.logical
    val qe = SparkEntry.queries("q_quantile_norm")(spark, sf).queryExecution
    val unpart = qe.optimizedPlan.collect {
      case w: logical.Window if w.partitionSpec.isEmpty => w
    }
    assert(unpart.isEmpty, "no unpartitioned window anywhere")
    val windowsOverAgg = qe.optimizedPlan.collect {
      case w: logical.Window =>
        w.child.collectFirst { case _: logical.Aggregate => () }.isDefined ||
          w.child.collectFirst {
            case l: logical.LeafNode if l.computeStats().rowCount.isDefined => ()
          }.isDefined
    }
    assert(windowsOverAgg.forall(identity), "window input must be bounded")
    assert("Scan parquet".r.findAllIn(qe.executedPlan.toString).isEmpty,
      "docs ride the checkpoint, no re-scan")
  }

  test("k-anonymity: the class aggregate is two-phase and the scan reads " +
    "only the three quasi-identifier columns") {
    val p = plan("q_kanon")
    assert(p.contains("partial_"), p.take(3000))
    assert(p.contains(
      "ReadSchema: struct<lang:string,source:string,n_chars:bigint>"),
      p.take(3000))
  }

  test("assoc rules: item/total sides broadcast back and the basket " +
    "self-join is keyed — no cartesian against the basket table") {
    val p = plan("q_assoc_rules")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
    // the only nested-loop join is the final broadcast 1-row n_baskets fold
    // (the item-support fold rides the items checkpoint)
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, p.take(3000))
  }

  test("dbscan: degree cut, core-subgraph rounds and border/noise " +
    "attachment are all keyed — no cartesian, no nested loop") {
    val p = plan("q_dbscan")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("kneser-ney: model statistics ride the checkpointed bigram-type " +
    "table; the only nested loop is the 1-row type-total broadcast") {
    val p = plan("q_kn_lm")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(3000))
  }

  test("zipf: the vocabulary head is cut by TakeOrderedAndProject, never " +
    "a global sort of the vocabulary") {
    assert(plan("q_zipf").contains("TakeOrderedAndProject"))
  }

  test("markov paths: the lead window partitions by (user, day) and the " +
    "row-total table is broadcast back") {
    import org.apache.spark.sql.catalyst.plans.logical
    val qe = SparkEntry.queries("q_markov_paths")(spark, sf).queryExecution
    val unpart = qe.optimizedPlan.collect {
      case w: logical.Window if w.partitionSpec.isEmpty => w
    }
    assert(unpart.isEmpty, "journey window must be partitioned")
    assert(qe.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("ann ndcg: the checkpointed bounded rankings join keyed — no " +
    "cartesian in the metric assembly") {
    val p = plan("q_ann_ndcg")
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("ab test: ONE fused two-phase aggregate, no join anywhere (the " +
    "arm pivot is conditional sums inside the aggregate)") {
    val p = plan("q_ab_test")
    assert(p.contains("partial_"), p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
    assert("Scan parquet".r.findAllIn(p).size === 1, p.take(3000))
  }

  test("benford: digit counts are two-phase; the dense frame, total and " +
    "chi2 folds are all O(9) broadcasts") {
    val p = plan("q_benford")
    assert(p.contains("partial_"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("code detect: one scan, no join, only (doc_id, text) read") {
    val p = plan("q_code_detect")
    assert(!p.contains("Join"), p.take(3000))
    assert("Scan parquet".r.findAllIn(p).size === 1, p.take(3000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      p.take(3000))
  }

  test("source overlap: the pair join is keyed on the digest and the " +
    "source totals broadcast — no cartesian") {
    val p = plan("q_source_overlap")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("prune rate: everything after the checkpointed manifest is " +
    "O(probes x shards) — the final plan re-reads no parquet") {
    val p = plan("q_prune_rate")
    assert("Scan parquet".r.findAllIn(p).isEmpty, p.take(3000))
  }

  test("fim split: pure per-row slicing — one scan, no join, no exchange " +
    "before the presentation sort") {
    val p = plan("q_fim_split")
    assert(!p.contains("Join"), p.take(3000))
    assert("Scan parquet".r.findAllIn(p).size === 1, p.take(3000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      p.take(3000))
  }

  test("context pack: the candidate cut is TakeOrderedAndProject; the " +
    "pack windows run over that bounded cut only") {
    val p = plan("q_context_pack")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("erasure audit: one fused two-phase aggregate, no join") {
    val p = plan("q_erasure_audit")
    assert(p.contains("partial_"), p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
    assert("Scan parquet".r.findAllIn(p).size === 1, p.take(3000))
  }

  test("hubness: the occurrence aggregate is two-phase over the keyed " +
    "kNN ranking and the id join is keyed — no cartesian") {
    val p = plan("q_hubness")
    assert(p.contains("partial_"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("funnel steps: three column-pruned event scans feed the keyed step " +
    "joins (the bounded per-step tables ride checkpoints, never a " +
    "corpus-sized cache — review r11); only the 1-row base fold " +
    "nested-loops") {
    val p = plan("q_funnel_steps")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(3000))
    // re-scanning three pruned columns beats materializing every event
    // into executor storage at the 100 TB posture; the O(users) s1/s2
    // tables ride eager checkpoints (their scans run at construction), so
    // the RETURNED plan carries exactly the third step's pruned scan
    assert("Scan parquet".r.findAllIn(p).size === 1,
      s"expected exactly the purchase step's pruned scan:\n${p.take(3000)}")
  }

  test("unpartitioned windows ride bounded inputs: below every global " +
    "window sits a limit or an aggregate, never the raw corpus") {
    import org.apache.spark.sql.catalyst.plans.logical
    // Every query family that uses a global (unpartitioned) window — the
    // single-partition funnel is only acceptable because its input is
    // bounded first: a limit(k), or an aggregate that reduces the corpus
    // to a vocabulary/shard/day/bucket table. This pin replaces the
    // hand-audit of WindowExec warnings: ADD ANY NEW QUERY THAT USES
    // Window.orderBy (no partitionBy) TO THIS LIST. Driver-loop trainers
    // and streaming queries are covered by their own specs — constructing
    // them here would execute training rounds / checkpointed streams.
    val globalWindowQueries = Seq(
      "q_stratified_sample", "q_corpus_sample", "q_source_cap",
      "q_token_budget", "q_weighted_sample", "q_epoch_order",
      "q_train_test_split", "q_mix_weights", "q_mix_deciles",
      "q_vocab", "q_oov_rate", "q_pmi_collocations", "q_bpe_pairs",
      "q_rrf_fusion", "q_drift_windowed", "q_skew_report",
      "q_compaction_plan", "q_zipf", "q_context_pack")
    val offenders = globalWindowQueries.flatMap { name =>
      val lp = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
      lp.collect {
        case w: logical.Window if w.partitionSpec.isEmpty =>
          val bounded = w.child.collectFirst {
            case _: logical.GlobalLimit => ()
            case _: logical.LocalLimit => ()
            case _: logical.Aggregate => ()
            // a checkpointed subtree is already a materialized bounded
            // table (drift grids, oov vocab) — its logical node is a leaf
            case l: logical.LeafNode if l.computeStats().rowCount.isDefined => ()
          }.isDefined
          if (bounded) None else Some(name)
      }.flatten
    }.distinct
    assert(offenders.isEmpty,
      s"global window over a potentially unbounded input in: $offenders")
  }
}
