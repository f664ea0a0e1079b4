package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-data-pipeline
  * extensions) is exposed as a named query over the driver fixtures, with a
  * DuckDB-equivalent oracle in [[oracleSql]] where the semantics are
  * ANSI-SQL-expressible. Queries whose outputs depend on engine-internal
  * hashes (MinHash/SimHash/LSH/winnowing) are declared without an oracle and
  * get the driver's rows-only check; their exactly-verifiable counterparts
  * (`q_dedup_ngram`, `q_ann_topk`, `q_fingerprint`) pin the semantics.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational / reference-core (SURVEY §2.1-2.2) ----
    "q1_agg"           -> ((s, d) => Relational.q1Agg(s, d)),
    "q3_join_topk"     -> ((s, d) => Relational.q3JoinTopk(s, d)),
    "q5_multijoin"     -> ((s, d) => Relational.q5MultiJoin(s, d)),
    "q_window_rank"    -> ((s, d) => Relational.windowRank(s, d)),
    "q_window_running" -> ((s, d) => Relational.windowRunning(s, d)),
    "q_rollup"         -> ((s, d) => Relational.rollupAgg(s, d)),
    "q_cube"           -> ((s, d) => Relational.cubeAgg(s, d)),
    "q_grouping_sets"  -> ((s, d) => Relational.groupingSetsAgg(s, d)),
    "q_pivot"          -> ((s, d) => Relational.pivotAgg(s, d)),
    "q_unpivot"        -> ((s, d) => Relational.unpivotAttrs(s, d)),
    "q_range_join"     -> ((s, d) => Relational.rangeJoinCount(s, d)),
    "q_conditional_agg" -> ((s, d) => Relational.conditionalAgg(s, d)),
    "q_date_buckets"   -> ((s, d) => Relational.dateBuckets(s, d)),
    "q_approx_distinct" -> ((s, d) => Relational.approxDistinct(s, d)),
    "q_distinct"       -> ((s, d) => Relational.distinctAgg(s, d)),
    "q_topk"           -> ((s, d) => Relational.topK(s, d)),
    "q_anti_join"      -> ((s, d) => Relational.antiJoin(s, d)),
    "q_outer_join"     -> ((s, d) => Relational.outerJoin(s, d)),
    "q_semi_join"      -> ((s, d) => Relational.semiJoin(s, d)),
    "q_except_diff"    -> ((s, d) => Relational.exceptDiff(s, d)),
    "q_intersect"      -> ((s, d) => Relational.intersectOp(s, d)),
    "q_udaf_wavg"      -> ((s, d) => Relational.udafWavg(s, d)),
    "q_scalar_funcs"   -> ((s, d) => Relational.scalarFuncs(s, d)),
    "q_json"           -> ((s, d) => Relational.jsonExtract(s, d)),
    "q_explode"        -> ((s, d) => Relational.explodeTokens(s, d)),
    "q_string_agg"     -> ((s, d) => Relational.stringAgg(s, d)),
    "q_time_window"    -> ((s, d) => Relational.timeWindow(s, d)),
    "q_session_window" -> ((s, d) => Relational.sessionWindows(s, d)),
    "q_percentile"     -> ((s, d) => Relational.percentiles(s, d)),
    "q_check_counts"   -> ((s, d) => Relational.checkCounts(s, d)),
    "q_project_coerce" -> ((s, d) => Relational.projectCoerce(s, d)),
    "q_filter"         -> ((s, d) => Relational.filters(s, d)),
    "q_dedup_lww"      -> ((s, d) => Relational.dedupLww(s, d)),
    "q_cdc_apply"      -> ((s, d) => Relational.cdcApply(s, d)),
    "q_asof_join"      -> ((s, d) => AsOf.purchaseToSignup(s, d)),
    // ---- LLM-data-pipeline ops ----
    "q_dedup_exact"    -> ((s, d) => Dedup.exact(s, d)),
    "q_dedup_norm"     -> ((s, d) => Dedup.exactNormalized(s, d)),
    "q_scd2_asof"      -> ((s, d) => Relational.scd2AsOf(s, d)),
    "q_dedup_ngram"    -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "q_dedup_pipeline" -> ((s, d) => Dedup.dedupPipeline(s, d)),
    "q_dedup_cluster"  -> ((s, d) => Dedup.nearDupClusters(s, d)),
    "q_dedup_apply"    -> ((s, d) => Dedup.dedupApply(s, d)),
    "q_dedup_ngram_prefix" -> ((s, d) => Dedup.ngramJaccardPrefix(s, d)),
    "q_dedup_minhash"  -> ((s, d) => Dedup.minhashLsh(s, d)),
    // SymSpell deletion-neighborhood blocking over DISTINCT prefix keys,
    // verified with real levenshtein — the character-level dedup tier
    "q_edit_dedup"     -> ((s, d) => Dedup.editDedup(s, d)),
    "q_simhash"        -> ((s, d) => Dedup.simhash(s, d)),
    "q_simhash_pairs"  -> ((s, d) => Dedup.simhashPairs(s, d)),
    "q_embed_dup"      -> ((s, d) => Dedup.embedDup(s, d)),
    "q_ann_topk"       -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "q_ann_lsh"        -> ((s, d) => Similarity.lshTopK(s, d)),
    "q_lang_id"        -> ((s, d) => TextAnalysis.langId(s, d)),
    "q_text_quality"   -> ((s, d) => TextAnalysis.quality(s, d)),
    "q_token_count"    -> ((s, d) => TextAnalysis.tokenCount(s, d)),
    "q_chunk"          -> ((s, d) => TextAnalysis.chunk(s, d)),
    "q_array_funcs"    -> ((s, d) => TextAnalysis.arrayFuncs(s, d)),
    "q_repetition"     -> ((s, d) => TextAnalysis.repetition(s, d)),
    "q_tfidf"          -> ((s, d) => TextAnalysis.tfidfTop(s, d)),
    "q_train_test_split" -> ((s, d) => TextAnalysis.trainTestSplit(s, d)),
    "q_fingerprint"    -> ((s, d) => TextAnalysis.fingerprint(s, d)),
    "q_winnow"         -> ((s, d) => TextAnalysis.winnow(s, d)),
    // REAL container sniffing over a mixed corpus of genuine PNG/WAV/text
    // payloads: magic-byte dispatch, graded against the id-derived modality
    "q_multimodal_meta" -> ((s, d) => Multimodal.metaQuery(s, d)),
    // REAL codec roundtrip: javax.imageio encodes deterministic PNGs and
    // decodes them back; width/height/pixel-checksum are oracle-graded
    "q_multimodal_decode" -> ((s, d) => Multimodal.pngMetaQuery(s, d)),
    // the binaryFile INGESTION variant: payloads staged as .png FILES,
    // scanned via the binaryFile source, decoded by the same real codec
    "q_png_binaryfile" -> ((s, d) => Multimodal.pngBinaryAudit(s, d)),
    // text-format wal2json JSONL feed decoded end-to-end through the real
    // envelope decoder (the on-disk replication-log ingestion path)
    "q_jsonl_decode"   -> ((s, d) => IngestFormats.jsonlDecode(s, d)),
    // end-to-end CDC schema evolution: a wal2json feed gains a column
    // mid-stream; the REAL pipeline (decode -> typed view -> LWW -> bucketed
    // manifest-layout sink) evolves across a restart and the final sink
    // state is graded
    "q_cdc_evolve"     -> ((s, d) => IngestFormats.cdcEvolve(s, d)),
    // manifest TIME TRAVEL: version-1 snapshot pinned and re-read after a
    // version-2 update/delete commit; as-of-timestamp resolution asserted
    // inline; v1-vs-current full-outer compared per key and oracle-graded
    "q_manifest_timetravel" -> ((s, d) => Maintenance.timeTravelQuery(s, d)),
    // manifest CHANGE DATA FEED: the row-level v1->v2 delta (insert/delete,
    // update = delete+insert) read from ONLY the changed buckets
    "q_manifest_cdf" -> ((s, d) => Maintenance.cdfQuery(s, d)),
    // OPTIMISTIC CONCURRENT WRITERS: two real threads race four online
    // repair commits into one live manifest store through the claim
    // protocol; key-disjoint writes make the interleaving-independent
    // final state oracle-gradable — a lost update hash-mismatches
    "q_occ_writers" -> ((s, d) => Maintenance.occDisjointQuery(s, d)),
    // REAL audio roundtrip: javax.sound.sampled encodes deterministic PCM
    // WAVs and decodes them back; rate/channels/frames/sample-checksum are
    // oracle-graded (PCM WAV is lossless)
    "q_multimodal_audio" -> ((s, d) => Multimodal.wavMetaQuery(s, d)),
    "q_train_manifest" -> ((s, d) => TrainingPipeline.trainManifest(s, d)),
    "q_window_analytics" -> ((s, d) => Relational.windowAnalytics(s, d)),
    // time-series gap-fill (resample) over the events log
    "q_gapfill"        -> ((s, d) => Relational.gapFill(s, d)),
    "q_mix_deciles"    -> ((s, d) => TextAnalysis.mixDeciles(s, d)),
    "q_ann_ivf"        -> ((s, d) => Similarity.ivfTopK(s, d)),
    "q_decontaminate"  -> ((s, d) => Dedup.decontaminate(s, d)),
    // the SEMANTIC screen over the same hash split: max train-cosine per
    // test doc — catches the paraphrased leakage n-grams miss
    "q_decontaminate_embed" -> ((s, d) => Similarity.decontaminateEmbed(s, d)),
    // the production tier: same screen restricted to the IVF probe cut —
    // the candidate join is keyed on the coarse cell, nothing broadcasts
    "q_decontaminate_embed_ivf" -> ((s, d) => Similarity.decontaminateEmbedIvf(s, d)),
    "q_pack_sequences" -> ((s, d) => TextAnalysis.packSequences(s, d)),
    "q_filter_funnel"  -> ((s, d) => TextAnalysis.filterFunnel(s, d)),
    "q_stats_agg"      -> ((s, d) => Relational.statsAgg(s, d)),
    "q_histogram"      -> ((s, d) => Relational.histogram(s, d)),
    "q_winsorize"      -> ((s, d) => Relational.winsorize(s, d)),
    "q_lang_balance"   -> ((s, d) => TextAnalysis.langBalance(s, d)),
    "q_pii_scrub"      -> ((s, d) => TextAnalysis.piiScrub(s, d)),
    "q_boilerplate"    -> ((s, d) => TextAnalysis.boilerplate(s, d)),
    "q_containment"    -> ((s, d) => Dedup.containment(s, d)),
    "q_cluster_bigstar" -> ((s, d) => Dedup.nearDupClustersBigStar(s, d)),
    "q_mix_weights"    -> ((s, d) => TextAnalysis.mixWeights(s, d)),
    "q_vec_quantize"   -> ((s, d) => Similarity.vecQuantize(s, d)),
    "q_salted_join"    -> ((s, d) => Relational.saltedJoin(s, d)),
    "q_funnel"         -> ((s, d) => Relational.funnel(s, d)),
    "q_text_embed_join" -> ((s, d) => Multimodal.textEmbedJoin(s, d)),
    // 5 Lloyd rounds: the objective is near-saturated there and the bench
    // measures a bounded fit, not convergence-tail jitter
    "q_kmeans_profile" -> ((s, d) => Similarity.kmeansProfile(s, d, maxIter = 5)),
    "q_lm_score"       -> ((s, d) => TextAnalysis.lmScore(s, d)),
    "q_gopher_rules"   -> ((s, d) => TextAnalysis.gopherRules(s, d)),
    "q_reshard"        -> ((s, d) => TextAnalysis.reshard(s, d)),
    "q_novelty"        -> ((s, d) => Dedup.novelty(s, d)),
    "q_scd2"           -> ((s, d) => Relational.scd2(s, d)),
    "q_entropy"        -> ((s, d) => TextAnalysis.entropy(s, d)),
    "q_source_profile" -> ((s, d) => TextAnalysis.sourceProfile(s, d)),
    "q_dedup_incr"     -> ((s, d) => IncrementalDedup.twoBatchPairs(s, d)),
    "q_dedup_stream"   -> ((s, d) => graft.streaming.DedupStream.streamedPairs(s, d)),
    "q_dup_spans"      -> ((s, d) => TextAnalysis.dupSpans(s, d)),
    "q_scrub_spans"    -> ((s, d) => TextAnalysis.scrubDupSpans(s, d)),
    "q_para_dedup"     -> ((s, d) => TextAnalysis.paragraphDedup(s, d)),
    "q_quality_classify" -> ((s, d) => TextAnalysis.qualityClassify(s, d)),
    "q_stratified_sample" -> ((s, d) => Sampling.stratifiedSample(s, d)),
    "q_corpus_sample"  -> ((s, d) => Sampling.corpusSample(s, d)),
    // histogram-ECDF per-lang quantile normalization: the cumulative
    // window runs over the bounded (lang x bucket) table, never the corpus
    "q_quantile_norm"  -> ((s, d) => Sampling.quantileNorm(s, d)),
    "q_source_cap"     -> ((s, d) => Sampling.sourceCap(s, d)),
    "q_token_budget"   -> ((s, d) => Sampling.tokenBudget(s, d)),
    "q_weighted_sample" -> ((s, d) => Sampling.weightedSample(s, d)),
    "q_decontaminate_bloom" -> ((s, d) => Dedup.decontaminateBloom(s, d)),
    "q_bm25"           -> ((s, d) => TextAnalysis.bm25(s, d)),
    "q_bpe_pairs"      -> ((s, d) => TextAnalysis.bpePairStats(s, d)),
    "q_embed_pool"     -> ((s, d) => Similarity.embedPool(s, d)),
    // rows-only: the iterative merge can't be expressed in one oracle SQL;
    // Round5OpsSpec pins the textbook example + pair-stat agreement
    "q_bpe_fit"        -> ((s, d) => TextAnalysis.bpeFit(s, d)),
    "q_dsir_weights"   -> ((s, d) => TrainingPipeline.dsirWeights(s, d)),
    "q_vocab"          -> ((s, d) => TextAnalysis.vocabCoverage(s, d)),
    "q_ann_pq"         -> ((s, d) => Similarity.pqTopK(s, d)),
    "q_ann_ivfpq"      -> ((s, d) => Similarity.ivfPqTopK(s, d)),
    "q_jl_project"     -> ((s, d) => Similarity.jlProject(s, d)),
    "q_retention"      -> ((s, d) => Relational.retention(s, d)),
    "q_outliers"       -> ((s, d) => Relational.outliers(s, d)),
    "q_approx_percentile" -> ((s, d) => Relational.approxPercentiles(s, d)),
    "q_rrf_fusion"     -> ((s, d) => Similarity.hybridRetrieve(s, d)),
    // FAISS-SQ8 int8 scalar quantization audit: per-dim affine codes,
    // midpoint reconstruction, integer-unit MSE — the float32→int8
    // memory-reduction report for the ANN index
    "q_embed_sq8"      -> ((s, d) => Similarity.embedSq8(s, d)),
    // MMR diversified re-rank of the semantic top-N (the RAG context-
    // window fix): greedy λ·relevance − (1−λ)·max-sim-to-selected in
    // integer micro-units; the greedy ORDER is oracle-replayed
    "q_mmr_rerank"     -> ((s, d) => Similarity.mmrRerank(s, d)),
    // chunk-level language consistency (mixed-language detection): langId
    // per 48-token chunk, per-doc majority/minority rollup; 0-row mixed
    // set at fixture scale is NOT vacuous — Round8OpsSpec injects a
    // code-switched fixture (the q_boilerplate pattern)
    "q_lang_mix"       -> ((s, d) => TextAnalysis.langMix(s, d)),
    // Unicode NFC normalization (codegen'd JDK Normalizer expression) —
    // the pre-dedup canonicalization pass; DuckDB nfc_normalize is the
    // identical form
    "q_text_normalize" -> ((s, d) => TextAnalysis.textNormalize(s, d)),
    // per-(source, lang) dataset card: volumes, dup rate, token spread in
    // one fused scan
    "q_data_card"      -> ((s, d) => TextAnalysis.dataCard(s, d)),
    // ROUGE-2 multiset overlap between keyed candidate/reference pairs
    // (doc vs doc_id+1); F1 in the 2m/(nc+nr) integer form
    "q_rouge"          -> ((s, d) => TextAnalysis.rouge(s, d)),
    // k-core peel of the similarity graph (fixed rounds, kmeans-style
    // early stop at the fixed point; oracle unrolls all rounds)
    "q_kcore"          -> ((s, d) => Graph.kCore(s, d)),
    // LPA communities of the similarity graph (fixed synchronous rounds,
    // most-frequent-neighbor label, ties toward the smallest label)
    "q_label_prop"     -> ((s, d) => Graph.labelProp(s, d)),
    // DBSCAN over the eps-graph: core by degree, clusters = CC of the
    // core subgraph (unrolled min-label rounds), border to min core
    // neighbor, noise = -1
    "q_dbscan"         -> ((s, d) => Graph.dbscan(s, d)),
    // interpolated Kneser-Ney bigram scoring (d=0.75): discounted ML +
    // continuation-probability backoff, all-integer model statistics
    "q_kn_lm"          -> ((s, d) => TextAnalysis.knLmScore(s, d)),
    // Zipf rank-frequency least-squares fit over the top-100 vocab head
    "q_zipf"           -> ((s, d) => TextAnalysis.zipfFit(s, d)),
    // first-order Markov transition matrix of event types within
    // (user, day) journeys, row-normalized
    "q_markov_paths"   -> ((s, d) => Relational.markovPaths(s, d)),
    // nDCG@5 of the IVF cut vs the exact ranking (graded companion to
    // q_ann_recall; both tiers deterministic, metric oracle-exact)
    "q_ann_ndcg"       -> ((s, d) => Similarity.annNdcg(s, d)),
    // Welch two-sample A/B readout per event type over md5-derived arms;
    // integer centi-unit moments, one fused aggregate
    "q_ab_test"        -> ((s, d) => Drift.abTest(s, d)),
    // Benford first-digit screen with chi-square, exact integer digit path
    "q_benford"        -> ((s, d) => Drift.benford(s, d)),
    // code-vs-prose densities via the translate-difference path (no
    // regex dialect hazard); integer-math is_code flag
    "q_code_detect"    -> ((s, d) => TextAnalysis.codeDetect(s, d)),
    // cross-source duplication matrix on 64-char prefix fingerprints
    // (digest-keyed, overlap coefficient vs the smaller source)
    "q_source_overlap" -> ((s, d) => Dedup.sourceOverlap(s, d)),
    // zone-map pruning-rate eval: 16 deterministic narrow probes against
    // the O(shards) manifest — the measured layout-quality number
    "q_prune_rate"     -> ((s, d) => Layout.pruneRate(s, d)),
    // FIM span corruption: md5-derived (start, len) per doc, pure per-row
    // slicing — reproducible infilling data prep
    "q_fim_split"      -> ((s, d) => TrainingPipeline.fimSplit(s, d)),
    // RAG context packing: term-overlap-ranked chunks greedily packed
    // under a token budget; windows only over the top-64 candidate cut
    "q_context_pack"   -> ((s, d) => TrainingPipeline.contextPack(s, d)),
    // right-to-be-forgotten audit: per-source before = erased + after
    "q_erasure_audit"  -> ((s, d) => TrainingPipeline.erasureAudit(s, d)),
    // hubness diagnostic: k-occurrence over the cell-blocked kNN graph,
    // antihubs kept visible via the left join
    "q_hubness"        -> ((s, d) => Similarity.hubness(s, d)),
    // ordered 3-step funnel: earliest qualifying anchors, integer-epoch
    // comparisons, fixed number of keyed passes
    "q_funnel_steps"   -> ((s, d) => Relational.funnelSteps(s, d)),
    // ANN index eval: recall@5 and top-1 reciprocal rank of the IVF probe
    // cut vs the exact ranking — deterministic tiers make the metric
    // itself oracle-exact
    "q_ann_recall"     -> ((s, d) => Similarity.annRecall(s, d)),
    // ICT adjacent-chunk contrastive pairs with md5-derived in-batch-
    // negative shard keys (pure per-doc window work, no corpus shuffle)
    "q_contrastive_pairs" -> ((s, d) => TextAnalysis.contrastivePairs(s, d)),
    "q_hard_negatives" -> ((s, d) => Similarity.hardNegatives(s, d)),
    "q_pmi_collocations" -> ((s, d) => TextAnalysis.pmiCollocations(s, d)),
    "q_sem_dedup"      -> ((s, d) => Dedup.semDedup(s, d)),
    "q_unigram_counts" -> ((s, d) => TextAnalysis.unigramCounts(s, d)),
    "q_unigram_encode" -> ((s, d) => TextAnalysis.unigramEncode(s, d)),
    "q_heavy_hitters"  -> ((s, d) => FrequentItems.heavyHitters(s, d)),
    // Apriori pair rules over (user, day) event baskets: item support cut
    // before the keyed pair self-join; support/confidence/lift
    "q_assoc_rules"    -> ((s, d) => FrequentItems.assocRules(s, d)),
    // k-anonymity audit over (lang, source, length-bucket) classes with
    // per-language at-risk share
    "q_kanon"          -> ((s, d) => QualityChecks.kAnonymity(s, d)),
    "q_wordpiece_encode" -> ((s, d) => TextAnalysis.wordpieceEncode(s, d)),
    "q_pagerank"       -> ((s, d) => Graph.pageRank(s, d)),
    "q_triangles"      -> ((s, d) => Graph.triangles(s, d)),
    "q_epoch_order"    -> ((s, d) => Sampling.epochOrder(s, d)),
    "q_bitext_mine"    -> ((s, d) => Similarity.bitextMine(s, d)),
    "q_dq_checks"      -> ((s, d) => QualityChecks.dqChecks(s, d)),
    "q_drift"          -> ((s, d) => Drift.driftReport(s, d)),
    // continuous-monitoring drift: day-over-day PSI of the event-value
    // distribution on a fixed grid
    "q_drift_windowed" -> ((s, d) => Drift.driftWindowed(s, d)),
    "q_bitext_mine_ivf" -> ((s, d) => Similarity.bitextMineIvf(s, d)),
    "q_stream_join"    -> ((s, d) =>
      graft.streaming.StreamJoin.streamedAttribution(s, d)),
    // encodes with the merge table learned by the iterative fit —
    // oracle-exact since r7 (the oracle unrolls the same fit rounds);
    // Round6OpsSpec's driver-side re-encode retained
    "q_bpe_encode"     -> ((s, d) => TextAnalysis.bpeEncode(s, d)),
    // one hard-EM (Viterbi-EM) round of the unigram-LM trainer: integer
    // Viterbi re-segmentation + corpus-weighted piece re-count
    "q_unigram_em"     -> ((s, d) => TextAnalysis.unigramEmRound(s, d)),
    // the SentencePiece prune step: rank by EM usage, drop the bottom 20%
    // of multi-char pieces, re-weight survivors, re-segment — chained
    // engine-exactly (chars always survive as the encodability fallback)
    "q_unigram_prune"  -> ((s, d) => TextAnalysis.unigramPrune(s, d)),
    "q_knn_graph"      -> ((s, d) => Similarity.knnGraph(s, d)),
    "q_zorder"         -> ((s, d) => Layout.zorderKeys(s, d)),
    "q_zone_map"       -> ((s, d) => Layout.zoneMap(s, d)),
    "q_corr_matrix"    -> ((s, d) => Relational.corrMatrix(s, d)),
    "q_skew_report"    -> ((s, d) => Maintenance.skewReport(s, d)),
    "q_compaction_plan" -> ((s, d) => Maintenance.compactionPlan(s, d)),
    // the OPTIMIZE rewrite the plan diagnoses: stage a sharded layout,
    // compact through staging+atomic-swap, report bins FROM the new files
    "q_compaction_apply" -> ((s, d) => Maintenance.compactionApplyQuery(s, d)),
    // same rewrite with shards big enough to OVERFLOW the target at the
    // gate scale (8 shards, 8 KiB target), so the oversized-shard split
    // path is what the oracle grades
    "q_compaction_split" -> ((s, d) =>
      Maintenance.compactionApplyQuery(s, d, shards = 8, targetBytes = 8192)),
    "q_oov_rate"       -> ((s, d) => TextAnalysis.oovRate(s, d)),
    // an ACTUAL checkpointed transformWithState run (MapState counts),
    // graded by the batch GROUP BY/HAVING oracle — the q_dedup_stream
    // promotion shape
    "q_stream_hh"      -> ((s, d) =>
      graft.streaming.StreamHeavyHitters.streamedHeavyHitters(s, d)),
    // timer-based sessionization as an ACTUAL checkpointed run; the
    // sentinel batch makes the emitted set the complete gap-grouping
    "q_stream_sessions" -> ((s, d) =>
      graft.streaming.StreamSessions.streamedSessions(s, d)),
    // ListState trailing-k log with a sentinel flush — the fourth state
    // primitive, graded by the batch row_number DESC oracle
    "q_stream_traillog" -> ((s, d) =>
      graft.streaming.StreamTrailLog.streamedTrailLog(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. As of round 7 EVERY query carries an oracle —
    * the last rows-only holdouts were promoted by making their state
    * integer-exact: q_bpe_fit/q_bpe_encode unroll trainer rounds to chained
    * CTEs, and q_kmeans_profile accumulates Lloyd updates in floor(x*1e6)
    * micro-units (stable integer centroids are a fixed point, so the
    * oracle runs all rounds while the fit may stop early). The simhash and
    * winnow queries, formerly rows-only because they hashed with Spark's
    * xxhash64, now hash with an md5 prefix (graft.functions.Md5Hash60 ==
    * DuckDB `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`) and are
    * hard-gate-checked bit for bit; q_ann_lsh joined them in round 7 by
    * deriving its ±1 SRP hyperplanes from the same md5 generator and
    * accumulating dots on the floor(x*1e6) micro-unit lattice (integer
    * sums — a near-zero sign cannot flip with summation order), with the
    * recall-floor spec retained. The approx sketches
    * (q_approx_distinct, q_approx_percentile) ARE gate-checked: they emit
    * exact values plus Spark-computed error-bound booleans the oracle
    * expects to be TRUE. q_dedup_minhash IS gate-checked too: its verify
    * stage is exact Jaccard, so banding only affects candidate recall —
    * measured 1.0 at gate scale (zero symmetric difference vs the exact
    * pair set), giving it the ngram closed-form oracle — that premise (and
    * the never-binding 128 df cap) is pinned by OraclePremiseSpec at
    * sf0.01, so a fixture change fails the spec, not the gate. */

  /** PageRank over the symmetrized [[graft.ops.Dedup.embedDup]] graph in
    * integer micro-units: six power iterations unrolled as six chained
    * CTEs (floor-divided integer mass is engine-exact, so no float
    * summation-order hazard; DuckDB's recursive CTE cannot aggregate in
    * the recursive term, hence the unroll). Must mirror
    * [[graft.ops.Graph.pageRank]] constant for constant. */
  private val pageRankOracle: String = {
    val base =
      """WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |nr AS (SELECT vec_id, label, v,
        |        sqrt(list_sum(list_transform(v, x -> x * x))) AS norm,
        |        CAST(v[1] > 0 AS INT) * 8 + CAST(v[2] > 0 AS INT) * 4 +
        |        CAST(v[3] > 0 AS INT) * 2 + CAST(v[4] > 0 AS INT) AS cell
        |      FROM e0),
        |pr AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |       FROM nr a JOIN nr b ON a.label = b.label AND a.cell = b.cell
        |         AND a.vec_id < b.vec_id
        |       WHERE round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 4) >= 0.3),
        |e AS (SELECT vec_a AS src, vec_b AS dst FROM pr
        |      UNION ALL SELECT vec_b, vec_a FROM pr),
        |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM deg),
        |r0 AS (SELECT src AS node, CAST(1000000000000 AS BIGINT) // n AS r, n
        |       FROM deg, nn)""".stripMargin
    val iterCtes = (1 to 6).map { i =>
      s"""r$i AS (SELECT e.dst AS node,
         |  CAST(15000000000000 AS BIGINT) // (100 * p.n) +
         |  sum((85 * p.r) // (100 * d.outdeg)) AS r, p.n AS n
         |FROM e JOIN r${i - 1} p ON p.node = e.src JOIN deg d ON d.src = e.src
         |GROUP BY e.dst, p.n)""".stripMargin
    }
    (base +: iterCtes).mkString(",\n") +
      """
        |SELECT node AS vec_id, CAST(r AS BIGINT) AS rank_micro,
        |  round(CAST(r AS DOUBLE) / 1000000000000.0, 6) AS rank
        |FROM r6 ORDER BY vec_id""".stripMargin
  }

  /** The exact n-gram-Jaccard closed form, shared verbatim by the FOUR
    * dedup formulations that must produce the identical pair set
    * (inverted-index, PPJoin prefix-filtered, MinHash+LSH, and the
    * checkpointed streaming ingest) — one definition so the "same oracle"
    * claim cannot desynchronize across keys. */
  private val ngramJaccardOracle: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
      |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d),
      |p AS (SELECT doc_id, n_sh, shingle FROM
      |        (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM s)
      |      QUALIFY count(*) OVER (PARTITION BY shingle) <= 128),
      |j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
      |        count(*) AS c
      |      FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2, 3, 4)
      |SELECT doc_a, doc_b, round(CAST(c AS DOUBLE) / (na + nb - c), 4) AS jaccard
      |FROM j WHERE round(CAST(c AS DOUBLE) / (na + nb - c), 4) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  def oracleSql: Map[String, String] = oracleSqlBase +
    // the Bloom prefilter admits false positives but no false negatives,
    // and the exact verify join removes the former — byte-identical output
    // to the join-only operator, so it shares the same oracle
    ("q_decontaminate_bloom" -> oracleSqlBase("q_decontaminate"))

  /** The greedy left-to-right BPE merge fold in DuckDB, parameterized by
    * the 1-row merge table `bTab` (columns a, b). DuckDB's list_reduce has
    * no empty-accumulator init, so the fold runs over singleton lists —
    * equivalent to Spark's empty-init `aggregate` because the empty-acc
    * branch can never merge. */
  private def bpeFoldSql(bTab: String): String =
    s"""list_reduce(list_transform(syms, s -> [s]),
       |  (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = $bTab.a AND x[1] = $bTab.b
       |                   THEN acc[1:len(acc) - 1] || [$bTab.a || $bTab.b]
       |                   ELSE acc || x END)""".stripMargin

  /** Unrolled BPE training rounds as chained CTEs: v0 is the
    * frequency-weighted vocabulary split to symbols; round r derives pair
    * stats p{r} from v{r-1}, the argmax b{r}, and (while further rounds
    * need it) the re-folded vocabulary v{r}. */
  private def bpeRoundCtes(merges: Int, lastVocab: Boolean): String = {
    val v0 =
      """v0 AS (SELECT CAST(c AS BIGINT) AS c, string_split(tok, '') AS syms
        |  FROM (SELECT tok, count(*) AS c FROM
        |          (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |        GROUP BY tok))""".stripMargin
    val rounds = (1 to merges).map { r =>
      val stats =
        s"""pr$r AS (SELECT c, unnest(list_transform(range(1, len(syms)), i ->
           |    struct_pack(a := syms[i], b := syms[i + 1]))) AS p FROM v${r - 1}),
           |p$r AS (SELECT p.a AS a, p.b AS b, CAST(sum(c) AS BIGINT) AS freq
           |        FROM pr$r GROUP BY 1, 2),
           |b$r AS (SELECT a, b, a || b AS merged, freq FROM p$r
           |        ORDER BY freq DESC, a, b LIMIT 1)""".stripMargin
      val refold =
        s""",
           |v$r AS (SELECT c, ${bpeFoldSql(s"b$r")} AS syms
           |        FROM v${r - 1} CROSS JOIN b$r)""".stripMargin
      if (r < merges || lastVocab) stats + refold else stats
    }
    (v0 +: rounds).mkString(",\n")
  }

  /** Unrolled Lloyd-round k-means oracle: c0 is the first-k seed set on
    * the micro-unit lattice; round r assigns every corpus vector to its
    * argmax-cosine centroid of c{r-1} (row_number DESC + seed_id — the
    * same first-max rule as the Spark fold) and rebuilds c{r} from
    * floor(sum(vq)/n) per dimension, dead cells keeping their previous
    * centroid. The final SELECT is the per-cell quantization profile. */
  private def kmeansOracle(k: Int, rounds: Int): String = {
    def withNorm(c: String) =
      s"(SELECT seed_id, sv, sqrt(list_sum(list_transform(sv, x -> x * x))) AS snorm FROM $c)"
    val roundCtes = (1 to rounds).map { r =>
      s"""s$r AS (SELECT n0.vec_id, n0.vq, cc.seed_id,
         |          row_number() OVER (PARTITION BY n0.vec_id
         |            ORDER BY list_dot_product(n0.v, cc.sv) / (n0.norm * cc.snorm) DESC,
         |                     cc.seed_id) AS rk
         |        FROM n0 CROSS JOIN ${withNorm(s"c${r - 1}")} cc),
         |g$r AS (SELECT seed_id, CAST(generate_subscripts(vq, 1) AS INT) AS idx,
         |          unnest(vq) AS q FROM s$r WHERE rk = 1),
         |m$r AS (SELECT seed_id, list(floor(s / n) ORDER BY idx) AS mv FROM
         |          (SELECT seed_id, idx, sum(q) AS s, count(*) AS n
         |           FROM g$r GROUP BY 1, 2) GROUP BY seed_id),
         |c$r AS (SELECT c.seed_id, coalesce(m.mv, c.sv) AS sv
         |        FROM c${r - 1} c LEFT JOIN m$r m USING (seed_id))""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
       |n0 AS (SELECT vec_id, v,
       |         sqrt(list_sum(list_transform(v, x -> x * x))) AS norm,
       |         list_transform(v, x -> floor(x * 1e6)) AS vq FROM e),
       |c0 AS (SELECT vec_id AS seed_id, vq AS sv FROM n0 WHERE vec_id < $k),
       |$roundCtes,
       |fin AS (SELECT n0.vec_id, cc.seed_id,
       |          list_dot_product(n0.v, cc.sv) / (n0.norm * cc.snorm) AS cos,
       |          row_number() OVER (PARTITION BY n0.vec_id
       |            ORDER BY list_dot_product(n0.v, cc.sv) / (n0.norm * cc.snorm) DESC,
       |                     cc.seed_id) AS rk
       |        FROM n0 CROSS JOIN ${withNorm(s"c$rounds")} cc)
       |SELECT seed_id AS cell, CAST(count(*) AS BIGINT) AS n,
       |  round(avg(cos), 4) + 0.0 AS avg_cos,
       |  round(min(cos), 4) + 0.0 AS min_cos,
       |  round(max(cos), 4) + 0.0 AS max_cos
       |FROM fin WHERE rk = 1 GROUP BY 1 ORDER BY cell""".stripMargin
  }

  /** pos/steps/dp/tb/em CTE chain for one unigram Viterbi usage pass over
    * vocabulary table `vTab` (piece, freq), suffixed `sfx` so
    * q_unigram_prune can chain two passes. Reformulated r12 (verdict #7:
    * the sf0.1 pass 2 ran ~25 s): the vocabulary join happens ONCE,
    * non-recursively — each (token, position) row pivots its candidate
    * piece weights into a fixed `[w1..w4]` list — and both the DP and the
    * shortest-piece traceback (the engine's tie rule) recurse JOIN-FREE
    * over pure array indexing, which cuts the pass ~150x (0.17 s at
    * sf0.1). NULL weights fall out of `least`/the CASE equality
    * three-valued-ly, matching the old explicit sentinels; single-char
    * pieces always exist (every corpus char is in every vocab), so the
    * traceback CASE's ELSE 4 branch is only reached when length 4 is the
    * genuine shortest optimum. Output bit-identical to the r11
    * formulation (probed at sf0.01 AND sf0.1). NOT list_reduce: DuckDB
    * 1.0 evaluates complex-accumulator folds inconsistently across plan
    * shapes (observed first-hand), so an oracle cannot stand on it. */
  private def unigramUsageCtes(sfx: String, vTab: String): String = {
    val lp =
      s"""(CASE
         |        WHEN t.costs[CAST(t.pos + 1 AS INT)] =
         |             t.costs[CAST(t.pos AS INT)] + t.steps[CAST(t.pos AS INT)][1] THEN 1
         |        WHEN t.pos >= 2 AND t.costs[CAST(t.pos + 1 AS INT)] =
         |             t.costs[CAST(t.pos - 1 AS INT)] + t.steps[CAST(t.pos AS INT)][2] THEN 2
         |        WHEN t.pos >= 3 AND t.costs[CAST(t.pos + 1 AS INT)] =
         |             t.costs[CAST(t.pos - 2 AS INT)] + t.steps[CAST(t.pos AS INT)][3] THEN 3
         |        ELSE 4 END)""".stripMargin
    s"""pos$sfx AS (
       |  SELECT tok, c, i,
       |    [max(CASE WHEN l = 1 THEN w END), max(CASE WHEN l = 2 THEN w END),
       |     max(CASE WHEN l = 3 THEN w END), max(CASE WHEN l = 4 THEN w END)] AS ws
       |  FROM (
       |    SELECT tc.tok, tc.c, x.i, x.l, 1099511627776 - v.freq AS w
       |    FROM tc
       |    CROSS JOIN LATERAL (
       |      SELECT ii.i, ll.l
       |      FROM (SELECT unnest(range(1, len(tc.tok) + 1)) AS i) ii,
       |           (SELECT unnest([1, 2, 3, 4]) AS l) ll
       |      WHERE ll.l <= ii.i) x
       |    JOIN $vTab v ON v.piece = substr(tc.tok, x.i - x.l + 1, x.l))
       |  GROUP BY 1, 2, 3),
       |steps$sfx AS (
       |  SELECT tok, c, list(ws ORDER BY i) AS steps FROM pos$sfx GROUP BY 1, 2),
       |dp$sfx AS (
       |  SELECT tok, c, steps, 0 AS i, [CAST(0 AS BIGINT)] AS costs FROM steps$sfx
       |  UNION ALL
       |  SELECT tok, c, steps, i + 1, costs || [least(
       |      costs[i + 1] + steps[i + 1][1],
       |      CASE WHEN i >= 1 THEN costs[i] + steps[i + 1][2] END,
       |      CASE WHEN i >= 2 THEN costs[i - 1] + steps[i + 1][3] END,
       |      CASE WHEN i >= 3 THEN costs[i - 2] + steps[i + 1][4] END)]
       |  FROM dp$sfx WHERE i < len(tok)),
       |dpf$sfx AS (SELECT tok, c, steps, costs FROM dp$sfx WHERE i = len(tok)),
       |tb$sfx AS (
       |  SELECT tok, c, steps, costs, CAST(len(tok) AS BIGINT) AS pos,
       |    CAST(NULL AS VARCHAR) AS piece FROM dpf$sfx
       |  UNION ALL
       |  SELECT t.tok, t.c, t.steps, t.costs, t.pos - $lp,
       |    substr(t.tok, CAST(t.pos - $lp + 1 AS INT), CAST($lp AS INT))
       |  FROM tb$sfx t WHERE t.pos > 0),
       |em$sfx AS (SELECT piece, CAST(sum(c) AS BIGINT) AS em_freq
       |           FROM tb$sfx WHERE piece IS NOT NULL GROUP BY 1)""".stripMargin
  }

  /** The shared corpus/vocabulary preamble of the unigram-trainer oracles. */
  private val unigramSeedCtes: String =
    """t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |tc AS (SELECT tok, count(*) AS c FROM t WHERE len(tok) > 0 GROUP BY 1),
      |p AS (SELECT unnest(flatten(list_transform(range(1, len(tok) + 1),
      |        i -> list_transform(range(i, least(i + 3, len(tok)) + 1),
      |          j -> substr(tok, i, j - i + 1))))) AS piece, c
      |      FROM tc),
      |f AS (SELECT piece, CAST(sum(c) AS BIGINT) AS freq FROM p GROUP BY 1),
      |top AS (SELECT piece, freq FROM f ORDER BY freq DESC, piece LIMIT 64),
      |v AS (SELECT piece, max(freq) AS freq FROM (
      |        SELECT piece, freq FROM top
      |        UNION ALL
      |        SELECT piece, freq FROM f WHERE len(piece) = 1) u
      |      GROUP BY piece)""".stripMargin

  private def bpeFitOracle(merges: Int): String = {
    val union = (1 to merges)
      .map(r => s"SELECT $r AS r, a, b, merged, freq FROM b$r")
      .mkString("\n UNION ALL ")
    s"""WITH ${bpeRoundCtes(merges, lastVocab = false)}
       |SELECT r AS round, a AS "left", b AS "right", merged, freq
       |FROM ($union) ORDER BY round""".stripMargin
  }

  private def bpeEncodeOracle(merges: Int): String = {
    val encodeChain = (1 to merges).map { r =>
      s"""enc$r AS (SELECT tok, ${bpeFoldSql(s"b$r")} AS syms
         |          FROM enc${r - 1} CROSS JOIN b$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${bpeRoundCtes(merges, lastVocab = false)},
       |w AS (SELECT DISTINCT tok FROM
       |        (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)),
       |enc0 AS (SELECT tok, string_split(tok, '') AS syms FROM w),
       |$encodeChain,
       |lens AS (SELECT tok, CAST(len(syms) AS BIGINT) AS n_sym FROM enc$merges),
       |d AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       |        unnest(string_split(text, ' ')) AS tok FROM documents),
       |agg AS (SELECT doc_id, n_chars, CAST(count(*) AS BIGINT) AS n_words,
       |          CAST(sum(n_sym) AS BIGINT) AS n_tokens
       |        FROM d JOIN lens USING (tok) GROUP BY 1, 2)
       |SELECT doc_id, n_words, n_tokens,
       |  round(CAST(n_chars AS DOUBLE) / n_tokens, 4) AS chars_per_token
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  private def oracleSqlBase: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_join_topk" ->
      """SELECT o_orderkey, o_orderdate,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2 ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q5_multijoin" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey AS top_order, round(o_totalprice, 2) AS top_price
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q_window_running" ->
      """SELECT user_id, event_id,
        | CAST(round(sum(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100, 0) AS BIGINT) AS running_cents,
        | lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id) AS prev_event
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))) * 100, 0) AS BIGINT) AS total_cents
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (n_name))
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        | round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
        | round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS error,
        | round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
        | round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
        | round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_unpivot" ->
      """SELECT p_partkey, 'p_size' AS attr, round(CAST(p_size AS DOUBLE), 2) AS val
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS attr, round(p_retailprice, 2) AS val
        |FROM part
        |ORDER BY p_partkey, attr""".stripMargin,

    "q_range_join" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id AS v_user, ts AS v_ts FROM events WHERE event_type = 'view')
        |SELECT purchase_id, user_id, count(v_ts) AS n_views
        |FROM p LEFT JOIN v ON user_id = v_user
        |  AND v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts < p_ts
        |GROUP BY 1, 2 ORDER BY purchase_id""".stripMargin,

    "q_conditional_agg" ->
      """SELECT o_orderpriority,
        | CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
        | round(CAST(count_if(o_totalprice > 200000) AS BIGINT) / count(*), 4) AS big_share,
        | round(avg(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS avg_f,
        | bool_or(o_totalprice > 500000) AS any_jumbo
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_date_buckets" ->
      """SELECT EXTRACT(year FROM o_orderdate) AS yr,
        | EXTRACT(month FROM o_orderdate) AS mon,
        | EXTRACT(quarter FROM o_orderdate) AS qtr,
        | count(*) AS n,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))) * 100, 0) AS BIGINT) AS revenue_cents
        |FROM orders GROUP BY 1, 2, 3 ORDER BY yr, mon""".stripMargin,

    "q_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id,
        |        CAST(greatest(len(t) - 2, 0) AS BIGINT) AS n_grams,
        |        CAST(len(list_distinct(list_transform(generate_series(1, len(t) - 2),
        |          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS BIGINT) AS n_distinct
        |      FROM d)
        |SELECT doc_id, n_grams, n_distinct,
        | CASE WHEN n_grams > 0
        |      THEN round(CAST(n_grams - n_distinct AS DOUBLE) / n_grams, 4)
        |      ELSE 0.0 END AS rep_ratio
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_array_funcs" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        | CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        | list_sort(list_distinct(toks))[1] AS first_alpha,
        | toks[1] AS first_tok,
        | toks[-1] AS last_tok,
        | coalesce(array_to_string(toks[1:3], '_'), '') AS head3,
        | CAST(len(list_filter(toks, t -> length(t) > 5)) AS BIGINT) AS n_long,
        | array_to_string(list_transform(toks[1:2], t -> upper(t)), ' ') AS up2
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_tfidf" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |              FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT doc_id, token,
        |        round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS score
        |      FROM tf JOIN dfreq USING (token) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, token) AS rank FROM s)
        |SELECT doc_id, rank, token, score FROM r WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,

    "q_train_test_split" ->
      """SELECT CASE WHEN ((doc_id % 2147483647) * 2654435761) % 100 < 80
        |            THEN 'train' ELSE 'test' END AS split,
        | count(*) AS n_docs,
        | round(avg(length(text)), 4) AS avg_chars,
        | round(avg(len(string_split(text, ' '))), 4) AS avg_tokens
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS n_cust,
        | count(DISTINCT o_orderpriority) AS n_prio,
        | count(DISTINCT o_orderstatus) AS n_status FROM orders""".stripMargin,

    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
        |FROM lineitem ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | round(coalesce(sum(o_totalprice), 0), 2) AS total
        |FROM customer LEFT JOIN orders
        |  ON o_custkey = c_custkey AND o_totalprice > 400000
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_semi_join" ->
      """SELECT c_nationkey, count(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_except_diff" ->
      """SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 150
        |EXCEPT
        |SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY k""".stripMargin,

    "q_intersect" ->
      """SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 300000
        |INTERSECT
        |SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY k""".stripMargin,

    "q_udaf_wavg" ->
      """SELECT l_returnflag,
        | round(sum(l_extendedprice * l_quantity)
        |   / sum(CASE WHEN l_extendedprice IS NOT NULL THEN l_quantity END), 2)
        |   AS wavg_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_scalar_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u, substring(p_name, 1, 5) AS name5,
        | CAST(length(p_name) AS BIGINT) AS name_len,
        | p_brand || '#' || p_type AS bt,
        | abs(p_size - 25) AS size_dev,
        | p_partkey % 7 AS k7,
        | round(p_retailprice * 1.1, 2) AS price_up
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_json" ->
      """SELECT CAST(props->>'$.k' AS BIGINT) % 10 AS k_bucket,
        | count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_explode" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY 1 ORDER BY n DESC, token LIMIT 25""".stripMargin,

    "q_string_agg" ->
      """SELECT n_name, string_agg(c_name, ',' ORDER BY c_name) AS names,
        | count(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_gapfill" ->
      """WITH e AS (SELECT user_id,
        |        CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day FROM events),
        |d AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS n
        |      FROM e GROUP BY 1, 2),
        |s AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM e GROUP BY 1),
        |g AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM s)
        |SELECT g.user_id, g.day, CAST(coalesce(d.n, 0) AS BIGINT) AS n_events
        |FROM g LEFT JOIN d USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin,

    "q_time_window" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_start,
        | event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_session_window" ->
      """WITH m AS (
        | SELECT user_id, ts, value,
        |   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |          OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |             > INTERVAL 30 MINUTE
        |        THEN 1 ELSE 0 END AS new_sess
        | FROM events WHERE ts IS NOT NULL),
        |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |      FROM m)
        |SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
        | count(*) AS n, round(sum(value), 2) AS total
        |FROM s GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_start""".stripMargin,

    "q_percentile" ->
      """SELECT o_orderpriority,
        | round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
        | round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // the approx estimates are engine-specific; the gate-checked contract
    // is exact values + error-bound verdicts Spark computes and the oracle
    // pins to TRUE (a sketch past its bound fails the hash compare)
    "q_approx_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS exact_cust, TRUE AS within_5pct
        |FROM orders""".stripMargin,

    "q_approx_percentile" ->
      """SELECT o_orderpriority,
        | round(quantile_cont(o_totalprice, 0.5), 2) AS median_exact,
        | round(quantile_cont(o_totalprice, 0.9), 2) AS p90_exact,
        | CASE WHEN quantile_cont(o_totalprice, 0.5) IS NOT NULL THEN TRUE END AS median_ok,
        | CASE WHEN quantile_cont(o_totalprice, 0.9) IS NOT NULL THEN TRUE END AS p90_ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_check_counts" ->
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .map(t => s"SELECT '$t' AS tbl, count(*) AS cnt FROM $t")
        .mkString("", " UNION ALL ", " ORDER BY tbl"),

    "q_project_coerce" ->
      """SELECT event_id AS id, user_id, event_type AS op_type,
        | CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
        | strftime(ts, '%Y-%m-%d') AS ts_date
        |FROM events ORDER BY id""".stripMargin,

    "q_filter" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type IN ('click', 'purchase') AND value > 100
        |ORDER BY event_id""".stripMargin,

    "q_dedup_lww" ->
      """SELECT user_id, event_id AS last_event, event_type AS last_type
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_cdc_apply" ->
      """WITH tagged AS (
        | SELECT *, CASE WHEN event_type = 'signup' THEN 'create'
        |                WHEN event_type = 'error' THEN 'delete'
        |                ELSE 'update' END AS op,
        |   row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events)
        |SELECT user_id, op AS last_op, event_id, round(value, 2) AS value
        |FROM tagged WHERE rn = 1 AND op <> 'delete' ORDER BY user_id""".stripMargin,

    "q_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT event_id AS s_event_id, user_id AS s_user_id, ts AS s_ts
        |      FROM events WHERE event_type = 'signup'),
        |j AS (SELECT p.event_id, p.user_id, s.s_event_id, s.s_ts
        |      FROM p LEFT JOIN s ON s.s_user_id = p.user_id AND s.s_ts <= p.ts),
        |r AS (SELECT event_id, user_id, s_event_id,
        |        row_number() OVER (PARTITION BY event_id
        |          ORDER BY s_ts DESC NULLS LAST, s_event_id DESC NULLS LAST) AS rn
        |      FROM j)
        |SELECT event_id AS purchase_id, user_id, s_event_id AS signup_id
        |FROM r WHERE rn = 1 ORDER BY purchase_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS copies
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin,

    // regexp_replace needs the 'g' flag in DuckDB to match Spark's
    // replace-all semantics
    "q_dedup_norm" ->
      """WITH n AS (SELECT doc_id, text,
        |        trim(regexp_replace(regexp_replace(lower(text),
        |          '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')) AS norm
        |      FROM documents)
        |SELECT md5(norm) AS h, min(doc_id) AS keeper,
        |  CAST(count(*) AS BIGINT) AS copies,
        |  CAST(count(DISTINCT text) AS BIGINT) AS raw_variants
        |FROM n GROUP BY 1 ORDER BY h""".stripMargin,

    "q_dedup_ngram" -> ngramJaccardOracle,

    // Same oracle as q_dedup_ngram: the prefix-filtered formulation must be
    // output-identical (the gate proves the equivalence at sf0.01).
    "q_dedup_ngram_prefix" -> ngramJaccardOracle,

    // Same oracle as q_dedup_ngram: minhashLsh carries the SAME
    // stop-shingle dfCap as the exact tier (r12: capped sets for
    // signatures and overlap, full-size denominators — an all-duplicate
    // corpus yields 0 pairs on both sides instead of an O(N²) divergence),
    // so its output differs from the exact pair set only if a true pair
    // misses every LSH band. At the gate scales banding recall is 1.0 —
    // probed empirically: exceptAll in both directions is empty.
    "q_dedup_minhash" -> ngramJaccardOracle,

    // SymSpell deletion-neighborhood edit dedup: distinct 12-char prefix
    // keys, each key emits itself + its single-deletion variants, the
    // variant equi-join is the complete distance<=1 candidate set, and
    // levenshtein verifies. Pairs across distinct keys are genuine 1-edit
    // links (distance 0 impossible by construction).
    "q_edit_dedup" ->
      """WITH k AS (SELECT doc_id, substr(lower(text), 1, 12) AS k
        |           FROM documents),
        |cls AS (SELECT k, min(doc_id) AS rep FROM k GROUP BY 1),
        |v AS (SELECT rep, k,
        |        unnest(list_append(list_transform(range(1, length(k) + 1),
        |          i -> substr(k, 1, i - 1) || substr(k, i + 1)), k)) AS vr
        |      FROM cls),
        |cand AS (SELECT DISTINCT a.rep AS doc_a, b.rep AS doc_b,
        |           a.k AS key_a, b.k AS key_b
        |         FROM v a JOIN v b ON a.vr = b.vr AND a.rep < b.rep)
        |SELECT doc_a, doc_b, CAST(levenshtein(key_a, key_b) AS INT) AS dist
        |FROM cand WHERE levenshtein(key_a, key_b) <= 1
        |ORDER BY doc_a, doc_b""".stripMargin,

    // A checkpointed Structured Streaming ingest (two crawl-batch files ->
    // two micro-batches through the incremental LSH index) graded against
    // the SAME closed form: the LSH union over batches equals the one-shot
    // exact pair set (see q_dedup_minhash above; the stream's
    // degenerate-bucket cap and the oracle's dfCap agree on pure identical
    // clusters, where bucket width == shingle df).
    "q_dedup_stream" -> ngramJaccardOracle,

    "q_dedup_pipeline" ->
      """WITH sv AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
        |d AS (SELECT doc_id, string_split(text, ' ') AS t FROM sv),
        |s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d),
        |p AS (SELECT doc_id, n_sh, shingle FROM
        |        (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM s)
        |      QUALIFY count(*) OVER (PARTITION BY shingle) <= 128),
        |j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
        |        count(*) AS c
        |      FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2, 3, 4)
        |SELECT doc_a, doc_b, round(CAST(c AS DOUBLE) / (na + nb - c), 4) AS jaccard
        |FROM j WHERE round(CAST(c AS DOUBLE) / (na + nb - c), 4) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_cluster" ->
      """WITH RECURSIVE d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d),
        |p AS (SELECT doc_id, n_sh, shingle FROM
        |        (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM s)
        |      QUALIFY count(*) OVER (PARTITION BY shingle) <= 128),
        |j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
        |        count(*) AS c
        |      FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2, 3, 4),
        |pr AS (SELECT doc_a, doc_b FROM j
        |       WHERE round(CAST(c AS DOUBLE) / (na + nb - c), 4) >= 0.5),
        |e AS (SELECT doc_a AS a, doc_b AS b FROM pr
        |      UNION ALL SELECT doc_b, doc_a FROM pr),
        |reach(src, dst) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM e)
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.dst)
        |SELECT src AS doc_id, min(dst) AS cluster
        |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,

    // The dedup ACTION: q_dedup_cluster's component labels left-joined back
    // to the corpus — kept = doc is its cluster's min-id representative.
    "q_dedup_apply" ->
      """WITH RECURSIVE d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d),
        |p AS (SELECT doc_id, n_sh, shingle FROM
        |        (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM s)
        |      QUALIFY count(*) OVER (PARTITION BY shingle) <= 128),
        |j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
        |        count(*) AS c
        |      FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2, 3, 4),
        |pr AS (SELECT doc_a, doc_b FROM j
        |       WHERE round(CAST(c AS DOUBLE) / (na + nb - c), 4) >= 0.5),
        |e AS (SELECT doc_a AS a, doc_b AS b FROM pr
        |      UNION ALL SELECT doc_b, doc_a FROM pr),
        |reach(src, dst) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM e)
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.dst),
        |cl AS (SELECT src AS doc_id, min(dst) AS cluster FROM reach GROUP BY 1)
        |SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster,
        |  coalesce(cl.cluster, d.doc_id) = d.doc_id AS kept
        |FROM d LEFT JOIN cl ON d.doc_id = cl.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_embed_dup" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, label, v,
        |        sqrt(list_sum(list_transform(v, x -> x * x))) AS norm,
        |        CAST(v[1] > 0 AS INT) * 8 + CAST(v[2] > 0 AS INT) * 4 +
        |        CAST(v[3] > 0 AS INT) * 2 + CAST(v[4] > 0 AS INT) AS cell
        |      FROM e)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        | round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 4) AS cosine
        |FROM n a JOIN n b ON a.label = b.label AND a.cell = b.cell AND a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 4) >= 0.3
        |ORDER BY vec_a, vec_b""".stripMargin,

    // Multi-table multi-probe SRP LSH, engine-exact end to end: the ±1
    // hyperplane matrix is rebuilt from md5 (sign(p,i) = bit 0 of the
    // 60-bit md5 prefix of 'srp:p:i'), dots accumulate as floor(x*1e6)
    // micro-unit BIGINTs (order-independent), buckets are assembled per
    // table (p // 8) so no shift ever reaches DuckDB's checked bit 63,
    // and the surviving candidates are scored by the same sequential
    // double cosine as q_ann_topk.
    "q_ann_lsh" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |sg AS (SELECT p, list_transform(range(64), i ->
        |         CASE WHEN CAST('0x' || substr(md5('srp:' || p || ':' || i), 1, 15) AS BIGINT) % 2 = 0
        |              THEN 1 ELSE -1 END) AS sgn
        |       FROM range(64) rp(p)),
        |dots AS (SELECT e.vec_id, sg.p,
        |           list_sum(list_transform(range(64), i ->
        |             sgn[i + 1] * CAST(floor(v[i + 1] * 1e6) AS BIGINT))) AS s
        |         FROM e CROSS JOIN sg),
        |bk AS (SELECT vec_id, p // 8 AS t,
        |         CAST(sum(CASE WHEN s > 0 THEN (1 << (p % 8)) ELSE 0 END) AS BIGINT) AS bucket
        |       FROM dots GROUP BY 1, 2),
        |probes AS (SELECT vec_id, t, bucket AS probe FROM bk WHERE vec_id < 10
        |           UNION ALL
        |           SELECT vec_id, t, xor(bucket, CAST(1 << b AS BIGINT)) AS probe
        |           FROM bk CROSS JOIN range(8) rb(b) WHERE vec_id < 10),
        |cand AS (SELECT DISTINCT p.vec_id AS q_id, c.vec_id AS n_id
        |         FROM probes p JOIN bk c ON p.t = c.t AND p.probe = c.bucket
        |           AND c.vec_id <> p.vec_id),
        |s AS (SELECT cand.q_id, cand.n_id,
        |        list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
        |      FROM cand JOIN n q ON q.vec_id = cand.q_id
        |                JOIN n c ON c.vec_id = cand.n_id),
        |r AS (SELECT q_id, n_id, cos,
        |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id, round(cos, 4) AS cosine
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // max over a group is order-independent, so the semantic screen is
    // engine-exact before the 4-dp round; the flag compares the RAW max
    // on both sides
    "q_decontaminate_embed" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |q AS (SELECT * FROM n WHERE ((vec_id % 2147483647) * 2654435761) % 100 >= 80),
        |c AS (SELECT * FROM n WHERE ((vec_id % 2147483647) * 2654435761) % 100 < 80),
        |s AS (SELECT q.vec_id AS doc_id,
        |        max(list_dot_product(q.v, c.v) / (q.norm * c.norm)) AS mc
        |      FROM q, c GROUP BY 1)
        |SELECT doc_id, round(mc, 4) + 0.0 AS max_train_cos,
        |  mc >= 0.5 AS contaminated
        |FROM s ORDER BY doc_id""".stripMargin,

    // IVF probe-cut tier of the semantic screen: q_ann_ivf's deterministic
    // coarse quantizer indexes both splits; max train-cosine within each
    // test vector's nProbe=4 closest cells (of 8). Cell assignment and
    // probing replay q_bitext_mine_ivf's row_number formulation.
    "q_decontaminate_embed_ivf" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |sd AS (SELECT vec_id AS seed_id, v AS sv, norm AS snorm FROM n
        |       WHERE vec_id < 8),
        |c AS (SELECT vec_id, v, norm, seed_id AS cell FROM (
        |        SELECT t.vec_id, t.v, t.norm, sd.seed_id,
        |          row_number() OVER (PARTITION BY t.vec_id
        |            ORDER BY list_dot_product(t.v, sd.sv) / (t.norm * sd.snorm) DESC,
        |                     sd.seed_id) AS r
        |        FROM n t CROSS JOIN sd
        |        WHERE ((t.vec_id % 2147483647) * 2654435761) % 100 < 80) WHERE r = 1),
        |q AS (SELECT vec_id, v, norm, seed_id AS cell FROM (
        |        SELECT t.vec_id, t.v, t.norm, sd.seed_id,
        |          row_number() OVER (PARTITION BY t.vec_id
        |            ORDER BY list_dot_product(t.v, sd.sv) / (t.norm * sd.snorm) DESC,
        |                     sd.seed_id) AS r
        |        FROM n t CROSS JOIN sd
        |        WHERE ((t.vec_id % 2147483647) * 2654435761) % 100 >= 80) WHERE r <= 4),
        |s AS (SELECT q.vec_id AS doc_id,
        |        max(list_dot_product(q.v, c.v) / (q.norm * c.norm)) AS mc
        |      FROM q JOIN c ON q.cell = c.cell GROUP BY 1),
        |ids AS (SELECT vec_id AS doc_id FROM n
        |        WHERE ((vec_id % 2147483647) * 2654435761) % 100 >= 80)
        |SELECT ids.doc_id, round(s.mc, 4) + 0.0 AS max_train_cos,
        |  coalesce(s.mc >= 0.5, false) AS contaminated
        |FROM ids LEFT JOIN s ON s.doc_id = ids.doc_id
        |ORDER BY ids.doc_id""".stripMargin,

    // ANN eval: the exact and IVF rankings replayed side by side, joined
    // on (q_id, n_id); recall@5 per query plus 1/rank of the true top-1
    // in the approximate list (0 when missed).
    "q_ann_recall" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |ex AS (SELECT q_id, rank AS e_rank, n_id FROM (
        |    SELECT q_id, n_id,
        |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        |    FROM (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |            list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
        |          FROM n q JOIN n c ON c.vec_id <> q.vec_id
        |          WHERE q.vec_id < 10))
        |  WHERE rank <= 5),
        |sd AS (SELECT vec_id AS seed_id, v AS sv, norm AS snorm FROM n
        |       WHERE vec_id < 8),
        |asn AS (SELECT vec_id, v, norm, seed_id AS cell FROM (
        |          SELECT c.vec_id, c.v, c.norm, sd.seed_id,
        |            row_number() OVER (PARTITION BY c.vec_id
        |              ORDER BY list_dot_product(c.v, sd.sv) / (c.norm * sd.snorm) DESC,
        |                       sd.seed_id) AS r
        |          FROM n c CROSS JOIN sd) WHERE r = 1),
        |pr AS (SELECT vec_id, v, norm, seed_id AS cell FROM (
        |          SELECT q.vec_id, q.v, q.norm, sd.seed_id,
        |            row_number() OVER (PARTITION BY q.vec_id
        |              ORDER BY list_dot_product(q.v, sd.sv) / (q.norm * sd.snorm) DESC,
        |                       sd.seed_id) AS r
        |          FROM n q CROSS JOIN sd WHERE q.vec_id < 10) WHERE r <= 2),
        |av AS (SELECT q_id, rank AS a_rank, n_id FROM (
        |    SELECT q_id, n_id,
        |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        |    FROM (SELECT pr.vec_id AS q_id, c.vec_id AS n_id,
        |            list_dot_product(pr.v, c.v) / (pr.norm * c.norm) AS cos
        |          FROM pr JOIN asn c ON pr.cell = c.cell
        |            AND c.vec_id <> pr.vec_id))
        |  WHERE rank <= 5),
        |h AS (SELECT av.q_id, av.a_rank, ex.e_rank
        |      FROM av JOIN ex ON av.q_id = ex.q_id AND av.n_id = ex.n_id),
        |p AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_hits,
        |        min(CASE WHEN e_rank = 1 THEN a_rank END) AS t1
        |      FROM h GROUP BY 1),
        |qs AS (SELECT DISTINCT q_id FROM ex)
        |SELECT qs.q_id, coalesce(n_hits, 0) AS n_hits,
        |  round(coalesce(n_hits, 0) / 5.0, 4) + 0.0 AS recall,
        |  round(coalesce(1.0 / t1, 0.0), 4) + 0.0 AS rr
        |FROM qs LEFT JOIN p USING (q_id) ORDER BY q_id""".stripMargin,

    // nDCG@5: same exact/IVF ranking chain as q_ann_recall; graded
    // relevance 6 - e_rank for hits (0 for misses), DCG over the approx
    // ranks, normalized by the exact ranking's own DCG.
    "q_ann_ndcg" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |ex AS (SELECT q_id, rank AS e_rank, n_id FROM (
        |    SELECT q_id, n_id,
        |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        |    FROM (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |            list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
        |          FROM n q JOIN n c ON c.vec_id <> q.vec_id
        |          WHERE q.vec_id < 10))
        |  WHERE rank <= 5),
        |sd AS (SELECT vec_id AS seed_id, v AS sv, norm AS snorm FROM n
        |       WHERE vec_id < 8),
        |asn AS (SELECT vec_id, v, norm, seed_id AS cell FROM (
        |          SELECT c.vec_id, c.v, c.norm, sd.seed_id,
        |            row_number() OVER (PARTITION BY c.vec_id
        |              ORDER BY list_dot_product(c.v, sd.sv) / (c.norm * sd.snorm) DESC,
        |                       sd.seed_id) AS r
        |          FROM n c CROSS JOIN sd) WHERE r = 1),
        |pr AS (SELECT vec_id, v, norm, seed_id AS cell FROM (
        |          SELECT q.vec_id, q.v, q.norm, sd.seed_id,
        |            row_number() OVER (PARTITION BY q.vec_id
        |              ORDER BY list_dot_product(q.v, sd.sv) / (q.norm * sd.snorm) DESC,
        |                       sd.seed_id) AS r
        |          FROM n q CROSS JOIN sd WHERE q.vec_id < 10) WHERE r <= 2),
        |av AS (SELECT q_id, rank AS a_rank, n_id FROM (
        |    SELECT q_id, n_id,
        |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        |    FROM (SELECT pr.vec_id AS q_id, c.vec_id AS n_id,
        |            list_dot_product(pr.v, c.v) / (pr.norm * c.norm) AS cos
        |          FROM pr JOIN asn c ON pr.cell = c.cell
        |            AND c.vec_id <> pr.vec_id))
        |  WHERE rank <= 5),
        |dg AS (SELECT av.q_id,
        |         sum(CAST(coalesce(6 - ex.e_rank, 0) AS DOUBLE)
        |           / (ln(av.a_rank + 1.0) / ln(2.0))) AS dcg
        |       FROM av LEFT JOIN ex ON ex.q_id = av.q_id AND ex.n_id = av.n_id
        |       GROUP BY 1),
        |ig AS (SELECT q_id,
        |         sum(CAST(6 - e_rank AS DOUBLE)
        |           / (ln(e_rank + 1.0) / ln(2.0))) AS idcg
        |       FROM ex GROUP BY 1),
        |qs AS (SELECT DISTINCT q_id FROM ex)
        |SELECT qs.q_id, round(coalesce(dg.dcg, 0.0) / ig.idcg, 4) AS ndcg
        |FROM qs LEFT JOIN dg USING (q_id) JOIN ig USING (q_id)
        |ORDER BY q_id""".stripMargin,

    // SQ8: codes are integers, per-element squared errors quantize to
    // integer 1e-8 units before the sum, so no partial-agg float drift.
    "q_embed_sq8" ->
      """WITH e AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
        |             generate_subscripts(embedding, 1) - 1 AS dim
        |           FROM embeddings),
        |st AS (SELECT dim, min(x) AS dmin, max(x) AS dmax FROM e GROUP BY 1),
        |c AS (SELECT e.dim, e.x, st.dmin, st.dmax,
        |        CASE WHEN st.dmax = st.dmin THEN 0
        |             ELSE least(CAST(floor((e.x - st.dmin) * 255.0
        |               / (st.dmax - st.dmin)) AS BIGINT), 255) END AS code
        |      FROM e JOIN st USING (dim)),
        |r AS (SELECT dim, x, dmin, dmax, code,
        |        dmin + (code + 0.5) * (dmax - dmin) / 255.0 AS recon FROM c),
        |a AS (SELECT dim, count(*) AS n, CAST(sum(code) AS BIGINT) AS sc,
        |        CAST(sum(CAST(round((x - recon) * (x - recon) * 1e8)
        |          AS BIGINT)) AS BIGINT) AS se,
        |        round(min(dmin), 4) + 0.0 AS dmin,
        |        round(max(dmax), 4) + 0.0 AS dmax
        |      FROM r GROUP BY 1)
        |SELECT CAST(dim AS INT) AS dim, dmin, dmax,
        |  round(CAST(sc AS DOUBLE) / n, 4) + 0.0 AS mean_code,
        |  round(CAST(se AS DOUBLE) / n / 1e8, 10) + 0.0 AS mse
        |FROM a ORDER BY dim""".stripMargin,

    // MMR greedy selection replayed as a recursive CTE carrying the
    // selected-id list; integer micro-unit scoring (7·cmq − 3·max cm)
    // with lowest-id ties makes the order engine-exact. The first pick
    // is the plain relevance argmax (empty selected set).
    "q_mmr_rerank" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |q AS (SELECT * FROM n WHERE vec_id = 0),
        |cq AS (SELECT c.vec_id AS id,
        |         CAST(round(10000 * list_dot_product(q.v, c.v)
        |           / (q.norm * c.norm)) AS BIGINT) AS cmq,
        |         c.v AS v, c.norm AS norm
        |       FROM n c, q WHERE c.vec_id <> 0
        |       ORDER BY cmq DESC, id LIMIT 20),
        |pw AS (SELECT a.id AS ida, b.id AS idb,
        |         CAST(round(10000 * list_dot_product(a.v, b.v)
        |           / (a.norm * b.norm)) AS BIGINT) AS cm
        |       FROM cq a JOIN cq b ON a.id <> b.id),
        |r AS (
        |  SELECT 1 AS rank, f.id, f.cmq, [f.id] AS sel
        |  FROM (SELECT id, cmq FROM cq ORDER BY cmq DESC, id LIMIT 1) f
        |  UNION ALL
        |  SELECT r.rank + 1, p.id, p.cmq, list_append(r.sel, p.id)
        |  FROM r, LATERAL (
        |    SELECT c.id, c.cmq
        |    FROM cq c
        |    WHERE NOT list_contains(r.sel, c.id)
        |    ORDER BY 7 * c.cmq - 3 * (SELECT max(cm) FROM pw
        |              WHERE pw.ida = c.id AND list_contains(r.sel, pw.idb))
        |      DESC, c.id
        |    LIMIT 1) p
        |  WHERE r.rank < 5
        |)
        |SELECT CAST(rank AS INT) AS rank, id AS doc_id,
        |  cmq / 10000.0 AS relevance
        |FROM r ORDER BY rank""".stripMargin,

    "q_ann_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |s AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |        list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
        |      FROM n q JOIN n c ON c.vec_id <> q.vec_id WHERE q.vec_id < 10),
        |r AS (SELECT q_id, n_id, cos,
        |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id, round(cos, 4) AS cosine
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "q_contrastive_pairs" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |ch AS (SELECT doc_id, i AS chunk_id,
        |         array_to_string(toks[i * 48 + 1 : i * 48 + 48], ' ') AS ct
        |       FROM (SELECT doc_id, toks,
        |               unnest(generate_series(0, (len(toks) - 1) // 48)) AS i
        |             FROM d)),
        |p AS (SELECT doc_id, chunk_id, ct,
        |        lead(ct) OVER (PARTITION BY doc_id ORDER BY chunk_id) AS pos
        |      FROM ch)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS pair_id,
        |  CAST(len(string_split(ct, ' ')) AS BIGINT) AS n_anchor_tokens,
        |  md5(ct) AS anchor_md5, md5(pos) AS pos_md5,
        |  CAST(CAST('0x' || substr(md5('graft_cp:' || CAST(doc_id AS VARCHAR)
        |    || ':' || CAST(chunk_id AS VARCHAR)), 1, 8) AS BIGINT) % 8 AS INT)
        |    AS batch_shard
        |FROM p WHERE pos IS NOT NULL ORDER BY doc_id, pair_id""".stripMargin,

    "q_text_normalize" ->
      """SELECT doc_id, nfc_normalize(text) <> text AS changed,
        | CAST(length(nfc_normalize(text)) AS BIGINT) AS nfc_chars,
        | md5(nfc_normalize(text)) AS nfc_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // ROUGE-2: keyed candidate/reference pairing (doc_id vs doc_id+1),
    // multiset bigram min-overlap, F1 = 2m/(nc+nr). Left joins keep
    // zero-overlap and sub-bigram docs (metrics 0, not dropped).
    "q_rouge" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS t
        |           FROM documents),
        |bg AS (SELECT doc_id,
        |         unnest(CASE WHEN len(t) >= 2
        |           THEN list_transform(range(1, len(t)),
        |                  i -> t[i] || ' ' || t[i + 1])
        |           ELSE [] END) AS big
        |       FROM t),
        |bc AS (SELECT doc_id, big, count(*) AS c FROM bg GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(c) AS n FROM bc GROUP BY 1),
        |pairs AS (SELECT c.doc_id AS cid, r.doc_id AS rid
        |          FROM documents c JOIN documents r
        |            ON r.doc_id = c.doc_id + 1),
        |ov AS (SELECT p.cid, p.rid, sum(least(cb.c, rb.c)) AS m
        |       FROM pairs p
        |       JOIN bc cb ON cb.doc_id = p.cid
        |       JOIN bc rb ON rb.doc_id = p.rid AND rb.big = cb.big
        |       GROUP BY 1, 2)
        |SELECT p.cid AS doc_cand, p.rid AS doc_ref,
        |  CAST(coalesce(ov.m, 0) AS BIGINT) AS n_match,
        |  CAST(coalesce(tc.n, 0) AS BIGINT) AS n_cand,
        |  CAST(coalesce(tr.n, 0) AS BIGINT) AS n_ref,
        |  CASE WHEN coalesce(tc.n, 0) > 0
        |    THEN round(coalesce(ov.m, 0)::DOUBLE / tc.n, 4) ELSE 0.0 END
        |    AS rouge2_p,
        |  CASE WHEN coalesce(tr.n, 0) > 0
        |    THEN round(coalesce(ov.m, 0)::DOUBLE / tr.n, 4) ELSE 0.0 END
        |    AS rouge2_r,
        |  CASE WHEN coalesce(tc.n, 0) + coalesce(tr.n, 0) > 0
        |    THEN round(2.0 * coalesce(ov.m, 0) /
        |           (coalesce(tc.n, 0) + coalesce(tr.n, 0)), 4)
        |    ELSE 0.0 END AS rouge2_f
        |FROM pairs p
        |LEFT JOIN ov ON ov.cid = p.cid AND ov.rid = p.rid
        |LEFT JOIN tot tc ON tc.doc_id = p.cid
        |LEFT JOIN tot tr ON tr.doc_id = p.rid
        |ORDER BY doc_cand""".stripMargin,

    "q_data_card" ->
      """WITH d AS (SELECT source, lang, md5(text) AS dg,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |        CAST(length(text) AS BIGINT) AS b FROM documents)
        |SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(sum(b) AS BIGINT) AS total_bytes,
        |  round(1.0 - CAST(count(DISTINCT dg) AS DOUBLE) / count(*), 4)
        |    + 0.0 AS dup_rate,
        |  round(CAST(sum(n_tok) AS DOUBLE) / count(*), 4) + 0.0 AS avg_tokens,
        |  CAST(min(n_tok) AS BIGINT) AS min_tokens,
        |  CAST(max(n_tok) AS BIGINT) AS max_tokens
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // chunk-level language consistency: q_lang_id's marker scoring per
    // 48-token chunk, majority ties by count DESC then the fixed language
    // priority — the same deterministic chain as the doc-level argmax.
    "q_lang_mix" -> {
      def occ(m: String) =
        s"CAST((length(pt) - length(replace(pt, '$m', ''))) / ${m.length} AS BIGINT)"
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |ch AS (SELECT doc_id,
        |         ' ' || array_to_string(toks[i * 48 + 1 : i * 48 + 48], ' ')
        |           || ' ' AS pt
        |       FROM (SELECT doc_id, toks,
        |               unnest(generate_series(0, (len(toks) - 1) // 48)) AS i
        |             FROM d)),
        |sc AS (SELECT doc_id,
        |  OCC_EN AS s_en, OCC_ES AS s_es, OCC_DE AS s_de, OCC_FR AS s_fr
        |  FROM ch),
        |p AS (SELECT doc_id,
        |        CASE WHEN s_en >= greatest(s_es, s_de, s_fr) THEN 'en'
        |             WHEN s_es >= greatest(s_de, s_fr) THEN 'es'
        |             WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS lang
        |      FROM sc),
        |c AS (SELECT doc_id, lang, count(*) AS cnt,
        |        CASE lang WHEN 'en' THEN 0 WHEN 'es' THEN 1 WHEN 'de' THEN 2
        |          ELSE 3 END AS pri
        |      FROM p GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY cnt DESC, pri) AS r FROM c)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chunks,
        |  CAST(count(*) AS BIGINT) AS n_langs,
        |  max(CASE WHEN r = 1 THEN lang END) AS majority,
        |  count(*) > 1 AS mixed,
        |  round(1.0 - CAST(max(CASE WHEN r = 1 THEN cnt END) AS DOUBLE)
        |    / sum(cnt), 4) + 0.0 AS minority_share
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin
        .replace("OCC_EN", s"${occ(" the ")} + ${occ(" and ")}")
        .replace("OCC_ES", s"${occ(" el ")} + ${occ(" la ")}")
        .replace("OCC_DE", s"${occ(" der ")} + ${occ(" und ")}")
        .replace("OCC_FR", s"${occ(" le ")} + ${occ(" et ")}")
    },

    "q_lang_id" -> {
      def occ(m: String) =
        s"CAST((length(pt) - length(replace(pt, '$m', ''))) / ${m.length} AS BIGINT)"
      """WITH d AS (SELECT doc_id, ' ' || text || ' ' AS pt FROM documents),
        |sc AS (SELECT doc_id,
        |  OCC_EN AS s_en, OCC_ES AS s_es, OCC_DE AS s_de, OCC_FR AS s_fr FROM d)
        |SELECT doc_id, s_en, s_es, s_de, s_fr,
        | CASE WHEN s_en >= greatest(s_es, s_de, s_fr) THEN 'en'
        |      WHEN s_es >= greatest(s_de, s_fr) THEN 'es'
        |      WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS predicted
        |FROM sc ORDER BY doc_id""".stripMargin
        .replace("OCC_EN", s"${occ(" the ")} + ${occ(" and ")}")
        .replace("OCC_ES", s"${occ(" el ")} + ${occ(" la ")}")
        .replace("OCC_DE", s"${occ(" der ")} + ${occ(" und ")}")
        .replace("OCC_FR", s"${occ(" le ")} + ${occ(" et ")}")
    },

    "q_text_quality" ->
      """WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        | round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks), 4) AS avg_tok_len,
        | round(CAST((length(text) - length(replace(text, '.', '')))
        |   + (length(text) - length(replace(text, ',', '')))
        |   + (length(text) - length(replace(text, '!', '')))
        |   + (length(text) - length(replace(text, '?', ''))) AS DOUBLE)
        |   / greatest(length(text), 1), 4) AS punct_ratio,
        | round(CAST(len(list_filter(toks,
        |     t -> t IN ('the', 'a', 'and', 'of', 'to', 'in'))) AS DOUBLE)
        |   / len(toks), 4) AS stop_ratio
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT)
        |   AS bpeish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_chunk" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, unnest(generate_series(0, (len(toks) - 1) // 48)) AS chunk_id,
        |        toks FROM d)
        |SELECT doc_id, chunk_id,
        | CAST(len(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS BIGINT) AS n_chunk_tokens,
        | md5(array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // The Spark side builds GENUINE containers (javax.imageio PNG,
    // javax.sound.sampled WAV, raw text by doc_id % 3) and sniffs their
    // magic bytes; the oracle pins that the sniff recovered the modality
    // the id dictates for every row.
    "q_multimodal_meta" ->
      """SELECT doc_id,
        | CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
        |   ELSE 'txt' END AS format,
        | CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
        |   ELSE 'txt' END AS expected,
        | TRUE AS container_ok
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Real-codec PNG roundtrip: the Spark side ENCODES a deterministic
    // grayscale image per doc and DECODES it with javax.imageio; the
    // oracle recomputes the shape and pixel checksum analytically — PNG
    // is lossless, so any codec deviation hash-mismatches.
    "q_multimodal_decode" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 13 + 1 AS INT) AS width,
        |             CAST(doc_id % 7 + 1 AS INT) AS height FROM documents),
        |px AS (SELECT d.doc_id,
        |         CAST(sum((d.doc_id + 31 * rx.x + 17 * ry.y) % 256) AS BIGINT) AS px_sum
        |       FROM d, range(13) rx(x), range(7) ry(y)
        |       WHERE rx.x < d.width AND ry.y < d.height GROUP BY 1)
        |SELECT d.doc_id, TRUE AS is_png, width, height, px_sum
        |FROM d JOIN px USING (doc_id) ORDER BY doc_id""".stripMargin,

    // binaryFile ingestion audit: same lossless-roundtrip grading as
    // q_multimodal_decode, restricted to the 64 staged files
    "q_png_binaryfile" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 13 + 1 AS INT) AS width,
        |             CAST(doc_id % 7 + 1 AS INT) AS height FROM documents
        |           WHERE doc_id < 64),
        |px AS (SELECT d.doc_id,
        |         CAST(sum((d.doc_id + 31 * rx.x + 17 * ry.y) % 256) AS BIGINT) AS px_sum
        |       FROM d, range(13) rx(x), range(7) ry(y)
        |       WHERE rx.x < d.width AND ry.y < d.height GROUP BY 1)
        |SELECT d.doc_id, TRUE AS is_png, width, height, px_sum
        |FROM d JOIN px USING (doc_id) ORDER BY doc_id""".stripMargin,

    // wal2json-over-text decode: the oracle recomputes the expected decode
    // output straight from orders — any row/field lost in the engine's
    // build -> text write -> text scan -> envelope decode chain mismatches
    "q_jsonl_decode" ->
      """SELECT CASE o_orderkey % 3 WHEN 0 THEN 'create'
        |         WHEN 1 THEN 'update' ELSE 'delete' END AS op,
        |  'orders' AS table_name,
        |  '0/' || CAST(o_orderkey // 8 AS VARCHAR) AS nextlsn,
        |  o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 2 THEN NULL
        |    ELSE o_custkey END AS o_custkey,
        |  CASE WHEN o_orderkey % 3 = 2 THEN NULL
        |    ELSE round(o_totalprice, 2) END AS o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // End-to-end CDC schema evolution through the real pipeline: phase 1
    // inserts (o_orderkey, o_totalprice); phase 2 — after the sync schema
    // gains o_custkey and the stream restarts on the same checkpoint —
    // updates keys %3==1 with ONLY (o_orderkey, o_custkey) (presence mask
    // keeps phase-1 o_totalprice) and deletes keys %3==2. The sink's
    // evolution rewrite runs inside the graded query; untouched keys must
    // read NULL for the new column.
    "q_cdc_evolve" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
        |  CASE WHEN o_orderkey % 3 = 1 THEN o_custkey END AS o_custkey
        |FROM orders WHERE o_orderkey % 3 <> 2 ORDER BY o_orderkey""".stripMargin,

    // Manifest time travel: version 1 is the key-grouped snapshot of
    // orders; version 2 updates keys %3==1 to CAST(max custkey AS DOUBLE)
    // and deletes keys %3==2. val_v1 must be the PINNED v1 value for every
    // key; val_now mirrors v2 (NULL where deleted). ((k%3)+3)%3 keeps the
    // branch well-defined if a fixture ever mints negative keys (DuckDB's
    // % keeps the dividend's sign; Spark-side uses pmod).
    "q_manifest_timetravel" ->
      """WITH b AS (SELECT o_orderkey,
        |             max(round(o_totalprice, 2)) AS val,
        |             max(o_custkey) AS ck
        |           FROM orders GROUP BY o_orderkey)
        |SELECT o_orderkey, val AS val_v1,
        |  CASE WHEN ((o_orderkey % 3) + 3) % 3 = 1 THEN CAST(ck AS DOUBLE)
        |       WHEN ((o_orderkey % 3) + 3) % 3 = 2 THEN NULL
        |       ELSE val END AS val_now
        |FROM b ORDER BY o_orderkey""".stripMargin,

    // Manifest change data feed over the same two-version store: deletes
    // carry the v1 value (updated keys' old rows, removed keys' rows),
    // inserts the v2 value; an "update" that wrote the identical value
    // cancels in the engine's null-safe set difference — IS DISTINCT FROM
    // mirrors that. Untouched keys (%3==0) never appear.
    "q_manifest_cdf" ->
      """WITH b AS (SELECT o_orderkey,
        |             max(round(o_totalprice, 2)) AS val,
        |             max(o_custkey) AS ck
        |           FROM orders GROUP BY o_orderkey),
        |m AS (SELECT o_orderkey, val, CAST(ck AS DOUBLE) AS nv,
        |        ((o_orderkey % 3) + 3) % 3 AS r FROM b)
        |SELECT o_orderkey, val, 'delete' AS _change FROM m WHERE r = 2
        |UNION ALL
        |SELECT o_orderkey, val, 'delete' FROM m
        |WHERE r = 1 AND val IS DISTINCT FROM nv
        |UNION ALL
        |SELECT o_orderkey, nv AS val, 'insert' FROM m
        |WHERE r = 1 AND val IS DISTINCT FROM nv
        |ORDER BY o_orderkey, _change""".stripMargin,

    // Optimistic concurrent writers over the manifest store: the final
    // state after two racing writer threads (2 commits each) is
    // deterministic because the key sets are disjoint — each key's final
    // value depends only on WHICH writer owns it, never on the commit
    // interleaving. A lost update (the class the claim protocol prevents)
    // leaves the base `val` behind and hash-mismatches.
    "q_occ_writers" ->
      """WITH b AS (SELECT o_orderkey,
        |             max(round(o_totalprice, 2)) AS val,
        |             max(o_custkey) AS ck
        |           FROM orders GROUP BY o_orderkey)
        |SELECT o_orderkey,
        |  CASE ((o_orderkey % 4) + 4) % 4
        |    WHEN 0 THEN CAST(ck AS DOUBLE) + 0.5
        |    WHEN 1 THEN val + 1.0
        |    WHEN 2 THEN CAST(ck AS DOUBLE) + 0.25
        |    ELSE val + 2.0 END AS val
        |FROM b ORDER BY o_orderkey""".stripMargin,

    // Real-codec WAV roundtrip: the Spark side ENCODES deterministic
    // 16-bit PCM per doc and DECODES it with javax.sound.sampled; the
    // oracle recomputes rate/channels/frames and the sample checksum
    // analytically — PCM WAV is lossless, so any codec deviation
    // hash-mismatches.
    "q_multimodal_audio" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 50 + 10 AS BIGINT) AS nf,
        |             CAST(doc_id % 2 + 1 AS INT) AS ch FROM documents),
        |sm AS (SELECT d.doc_id,
        |         CAST(sum((d.doc_id * 7 + 31 * t.i + 17 * u.c) % 65536
        |           - 32768) AS BIGINT) AS sample_sum
        |       FROM d, range(60) t(i), range(2) u(c)
        |       WHERE t.i < d.nf AND u.c < d.ch GROUP BY 1)
        |SELECT d.doc_id, TRUE AS is_wav,
        |  CAST(8000 * (d.doc_id % 3 + 1) AS INT) AS sample_rate,
        |  d.ch AS channels, d.nf AS n_frames, sm.sample_sum
        |FROM d JOIN sm USING (doc_id) ORDER BY doc_id""".stripMargin,

    // Capstone composition: exact dedup -> near-dup removal -> quality
    // FIM: md5-derived start in [2, n-1] and len in [1, n-start], list
    // slicing mirrors Spark's slice() bounds exactly.
    "q_fim_split" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |n AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM t
        |      WHERE len(t) >= 4),
        |h AS (SELECT doc_id, t, n,
        |        2 + (CAST('0x' || substr(md5('graft_fim:s:' ||
        |          CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % (n - 2))
        |          AS start
        |      FROM n),
        |l AS (SELECT *,
        |        1 + (CAST('0x' || substr(md5('graft_fim:l:' ||
        |          CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % (n - start))
        |          AS len
        |      FROM h)
        |SELECT doc_id, n AS n_tokens, start, len,
        |  array_to_string(t[1:CAST(start - 1 AS INT)], ' ') AS prefix,
        |  array_to_string(t[CAST(start AS INT):CAST(start + len - 1 AS INT)],
        |    ' ') AS middle,
        |  array_to_string(t[CAST(start + len AS INT):CAST(n AS INT)], ' ')
        |    AS suffix
        |FROM l ORDER BY doc_id""".stripMargin,

    // Context packing: 48-token/32-step chunks, integer term-overlap
    // relevance, top-64 cut, greedy prefix pack under 256 tokens.
    "q_context_pack" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |c AS (SELECT doc_id, CAST(r AS BIGINT) AS chunk_id,
        |        toks[CAST(r * 32 + 1 AS INT):CAST(r * 32 + 48 AS INT)] AS chunk
        |      FROM d, LATERAL (SELECT unnest(range(0,
        |        (len(toks) - 1) // 32 + 1)) AS r) u),
        |s AS (SELECT doc_id, chunk_id, CAST(len(chunk) AS BIGINT) AS n_tok,
        |        CAST(len(list_filter(chunk, x -> x IN
        |          ('data', 'model', 'system', 'result', 'analysis')))
        |          AS BIGINT) AS overlap
        |      FROM c),
        |top AS (SELECT * FROM s WHERE overlap > 0
        |        ORDER BY overlap DESC, doc_id, chunk_id LIMIT 64),
        |r AS (SELECT *,
        |        CAST(row_number() OVER (ORDER BY overlap DESC, doc_id,
        |          chunk_id) AS BIGINT) AS rank,
        |        sum(n_tok) OVER (ORDER BY overlap DESC, doc_id, chunk_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS cum_tok
        |      FROM top)
        |SELECT rank, doc_id, chunk_id, overlap, n_tok,
        |  CAST(cum_tok AS BIGINT) AS cum_tok
        |FROM r WHERE cum_tok <= 256 ORDER BY rank""".stripMargin,

    // Erasure audit: per-source conservation proof over the 2% md5 split.
    "q_erasure_audit" ->
      """WITH d AS (SELECT source,
        |  CAST(CAST('0x' || substr(md5('graft_erasure:' ||
        |    CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 50 = 0 AS INT)
        |    AS erase
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_before,
        |  CAST(sum(erase) AS BIGINT) AS n_erased,
        |  CAST(sum(1 - erase) AS BIGINT) AS n_after,
        |  CAST(count(*) = sum(erase) + sum(1 - erase) AS INT) AS balanced
        |FROM d GROUP BY 1 ORDER BY source""".stripMargin,

    // filter -> decontamination -> packing, as one manifest. Each stage
    // reuses a formulation whose standalone oracle already matches.
    "q_train_manifest" ->
      """WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS t,
        |             ((doc_id % 2147483647) * 2654435761) % 100 < 80 AS tr FROM documents),
        |k1 AS (SELECT min(doc_id) AS doc_id FROM d WHERE tr GROUP BY text),
        |d1 AS (SELECT d.* FROM d JOIN k1 USING (doc_id)),
        |s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d1),
        |p AS (SELECT doc_id, n_sh, shingle FROM
        |        (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM s)
        |      QUALIFY count(*) OVER (PARTITION BY shingle) <= 128),
        |j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
        |        count(*) AS c
        |      FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2, 3, 4),
        |drop2 AS (SELECT DISTINCT doc_b AS doc_id FROM j
        |          WHERE round(CAST(c AS DOUBLE) / (na + nb - c), 4) >= 0.5),
        |d2 AS (SELECT * FROM d1 WHERE doc_id NOT IN (SELECT doc_id FROM drop2)),
        |m AS (SELECT *, length(text) AS chars, len(t) AS n_tok,
        |        CASE WHEN len(t) - 2 > 0 THEN
        |          (len(t) - 2 - len(list_distinct(list_transform(generate_series(1, len(t) - 2),
        |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))))::DOUBLE / (len(t) - 2)
        |          ELSE 0.0 END AS rep
        |      FROM d2),
        |d3 AS (SELECT * FROM m WHERE chars >= 120 AND n_tok >= 30 AND rep <= 0.01),
        |tst AS (SELECT DISTINCT unnest(list_transform(generate_series(1, len(t) - 4),
        |          i -> t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4])) AS g
        |        FROM d WHERE NOT tr),
        |sh5 AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t) - 4),
        |          i -> t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]))) AS g
        |        FROM d3),
        |cont AS (SELECT DISTINCT sh5.doc_id FROM sh5 JOIN tst USING (g)),
        |d4 AS (SELECT * FROM d3 WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
        |c5 AS (SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
        |         CAST(n_tok AS BIGINT) AS n_tok2,
        |         sum(CAST(n_tok AS BIGINT)) OVER (PARTITION BY doc_id % 8
        |           ORDER BY doc_id) - n_tok AS start_tok
        |       FROM d4)
        |SELECT shard, CAST(start_tok // 512 AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(n_tok2) AS BIGINT) AS n_tokens
        |FROM c5 GROUP BY 1, 2 ORDER BY shard, bin""".stripMargin,

    "q_window_analytics" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |             epoch_us(ts) AS ts_us FROM events)
        |SELECT user_id, event_id,
        |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts_us NULLS FIRST, event_id) AS next_type,
        |  first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts_us NULLS FIRST, event_id) AS first_event,
        |  last_value(event_id) OVER (PARTITION BY user_id ORDER BY ts_us NULLS FIRST, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event,
        |  CAST(round(sum(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY user_id ORDER BY ts_us NULLS FIRST
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) * 100, 0) AS BIGINT) AS hour_cents
        |FROM e ORDER BY user_id, event_id""".stripMargin,

    "q_mix_deciles" ->
      """WITH d AS (SELECT doc_id,
        |             CASE WHEN ((doc_id % 2147483647) * 2654435761) % 100 < 80
        |               THEN 'train' ELSE 'test' END AS split,
        |             CAST(doc_id % 8 AS INT) AS shard,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents),
        |r AS (SELECT *, ntile(10) OVER (PARTITION BY split, shard
        |        ORDER BY n_tok NULLS FIRST, doc_id) AS decile FROM d)
        |SELECT split, decile, count(*) AS n_docs,
        |  CAST(count_if(((doc_id % 2147483647) * 40503) % 100 < decile * 10) AS BIGINT) AS n_sampled,
        |  round(avg(n_tok), 4) AS avg_tok
        |FROM r GROUP BY 1, 2 ORDER BY split, decile""".stripMargin,

    // Deterministic IVF (seed centroids = vec_id < 8, ties to lowest seed):
    // unlike the hash-seeded LSH variant this is exactly reproducible.
    "q_ann_ivf" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |sd AS (SELECT vec_id AS seed_id, v AS sv, norm AS snorm FROM n WHERE vec_id < 8),
        |asn AS (SELECT vec_id, v, norm, seed_id AS cell FROM (
        |          SELECT c.vec_id, c.v, c.norm, sd.seed_id,
        |            row_number() OVER (PARTITION BY c.vec_id
        |              ORDER BY list_dot_product(c.v, sd.sv) / (c.norm * sd.snorm) DESC,
        |                       sd.seed_id) AS r
        |          FROM n c CROSS JOIN sd) WHERE r = 1),
        |pr AS (SELECT vec_id, v, norm, seed_id AS cell FROM (
        |          SELECT q.vec_id, q.v, q.norm, sd.seed_id,
        |            row_number() OVER (PARTITION BY q.vec_id
        |              ORDER BY list_dot_product(q.v, sd.sv) / (q.norm * sd.snorm) DESC,
        |                       sd.seed_id) AS r
        |          FROM n q CROSS JOIN sd WHERE q.vec_id < 10) WHERE r <= 2),
        |s AS (SELECT pr.vec_id AS q_id, c.vec_id AS n_id,
        |        list_dot_product(pr.v, c.v) / (pr.norm * c.norm) AS cos
        |      FROM pr JOIN asn c ON pr.cell = c.cell AND c.vec_id <> pr.vec_id),
        |r AS (SELECT q_id, n_id, cos,
        |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id, round(cos, 4) AS cosine
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // Word-5-gram containment of the hash-derived test split in the train
    // split. Spark computes it on xxhash64 shingles, the oracle on strings:
    // equal modulo 64-bit collisions, like the Jaccard family.
    "q_decontaminate" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t,
        |             ((doc_id % 2147483647) * 2654435761) % 100 < 80 AS tr FROM documents),
        |s AS (SELECT doc_id, tr, list_distinct(list_transform(generate_series(1, len(t) - 4),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS sh
        |      FROM d),
        |trn AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE tr),
        |te AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE NOT tr),
        |h AS (SELECT te.doc_id, count(trn.g) AS n_hit
        |      FROM te LEFT JOIN trn ON te.g = trn.g GROUP BY 1)
        |SELECT s.doc_id, CAST(len(sh) AS BIGINT) AS n_sh,
        |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
        |  round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / greatest(len(sh), 1), 4) AS contam_ratio
        |FROM s LEFT JOIN h ON s.doc_id = h.doc_id
        |WHERE NOT s.tr ORDER BY s.doc_id""".stripMargin,

    "q_pack_sequences" ->
      """WITH d AS (SELECT doc_id,
        |             CASE WHEN ((doc_id % 2147483647) * 2654435761) % 100 < 80
        |               THEN 'train' ELSE 'test' END AS split,
        |             CAST(doc_id % 8 AS INT) AS shard,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents),
        |c AS (SELECT *, sum(n_tok) OVER (PARTITION BY split, shard
        |        ORDER BY doc_id) - n_tok AS start_tok FROM d)
        |SELECT split, shard, CAST(floor(start_tok / 512) AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM c GROUP BY 1, 2, 3 ORDER BY split, shard, bin""".stripMargin,

    "q_filter_funnel" ->
      """WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |m AS (SELECT length(text) AS chars, len(t) AS n_tok,
        |        CASE WHEN len(t) - 2 > 0 THEN
        |          (len(t) - 2 - len(list_distinct(list_transform(generate_series(1, len(t) - 2),
        |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))))::DOUBLE / (len(t) - 2)
        |          ELSE 0.0 END AS rep
        |      FROM d),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n0,
        |        -- coalesce (r12 fuzz): count_if over an EMPTY relation is
        |        -- NULL in DuckDB where the engine's count(when) is 0
        |        CAST(coalesce(count_if(chars >= 120), 0) AS BIGINT) AS n1,
        |        CAST(coalesce(count_if(chars >= 120 AND n_tok >= 30), 0) AS BIGINT) AS n2,
        |        CAST(coalesce(count_if(chars >= 120 AND n_tok >= 30 AND rep <= 0.01), 0)
        |          AS BIGINT) AS n3
        |      FROM m)
        |SELECT * FROM (
        |  SELECT '0_all' AS stage, n0 AS n_docs,
        |    round(CAST(n0 AS DOUBLE) / n0, 4) AS yield_pct FROM a
        |  UNION ALL SELECT '1_chars_ge_120', n1, round(CAST(n1 AS DOUBLE) / n0, 4) FROM a
        |  UNION ALL SELECT '2_tokens_ge_30', n2, round(CAST(n2 AS DOUBLE) / n0, 4) FROM a
        |  UNION ALL SELECT '3_rep_le_0.01', n3, round(CAST(n3 AS DOUBLE) / n0, 4) FROM a
        |) ORDER BY stage""".stripMargin,

    "q_stats_agg" ->
      """SELECT l_returnflag,
        | round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
        | round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_cov,
        | round(stddev_samp(l_extendedprice), 2) AS price_sd,
        | round(var_samp(l_discount), 6) AS disc_var,
        | count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        | count(*) AS n,
        | round(min(o_totalprice), 2) AS lo,
        | round(max(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_winsorize" ->
      """WITH b AS (SELECT o_orderpriority AS prio,
        |             quantile_cont(o_totalprice, 0.05) AS p05,
        |             quantile_cont(o_totalprice, 0.95) AS p95
        |           FROM orders GROUP BY 1)
        |SELECT o_orderpriority,
        | round(avg(o_totalprice), 2) AS avg_raw,
        | round(avg(greatest(least(o_totalprice, p95), p05)), 2) AS avg_winsor,
        | round(min(p05), 2) AS p05, round(min(p95), 2) AS p95
        |FROM orders JOIN b ON o_orderpriority = prio
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_lang_balance" ->
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        |    ORDER BY ((doc_id % 2147483647) * 40503) % 997, doc_id) AS rn FROM documents)
        |WHERE rn <= 100 ORDER BY lang, doc_id""".stripMargin,

    "q_pii_scrub" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[0-9]{2,}')) AS BIGINT) AS n_redactions,
        | md5(regexp_replace(text, '[0-9]{2,}', '<NUM>', 'g')) AS scrub_md5,
        | CAST(length(regexp_replace(text, '[0-9]{2,}', '<NUM>', 'g')) AS BIGINT)
        |   AS scrub_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_boilerplate" ->
      """WITH s AS (SELECT doc_id, unnest(string_split(text, '. ')) AS s
        |           FROM documents)
        |SELECT md5(s) AS h, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        | count(*) AS n_occ
        |FROM s WHERE s <> ''
        |GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2 ORDER BY h""".stripMargin,

    "q_containment" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d),
        |p AS (SELECT doc_id, n_sh, shingle FROM
        |        (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM s)
        |      QUALIFY count(*) OVER (PARTITION BY shingle) <= 128),
        |j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
        |        count(*) AS c
        |      FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2, 3, 4)
        |SELECT doc_a, doc_b,
        | round(CAST(c AS DOUBLE) / least(na, nb), 4) AS containment
        |FROM j WHERE round(CAST(c AS DOUBLE) / least(na, nb), 4) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Output-identical to q_dedup_cluster by construction (same pair graph,
    // same min-of-component labels) — the gate proves the large-star/
    // small-star formulation equivalent to the recursive-CTE oracle.
    "q_cluster_bigstar" ->
      """WITH RECURSIVE d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d),
        |p AS (SELECT doc_id, n_sh, shingle FROM
        |        (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM s)
        |      QUALIFY count(*) OVER (PARTITION BY shingle) <= 128),
        |j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
        |        count(*) AS c
        |      FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2, 3, 4),
        |pr AS (SELECT doc_a, doc_b FROM j
        |       WHERE round(CAST(c AS DOUBLE) / (na + nb - c), 4) >= 0.5),
        |e AS (SELECT doc_a AS a, doc_b AS b FROM pr
        |      UNION ALL SELECT doc_b, doc_a FROM pr),
        |reach(src, dst) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM e)
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.dst)
        |SELECT src AS doc_id, min(dst) AS cluster
        |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_mix_weights" ->
      """WITH d AS (SELECT source, len(string_split(text, ' ')) AS n_tok
        |           FROM documents),
        |a AS (SELECT source, count(*) AS n_docs,
        |        CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot,
        |        sum(pow(CAST(n_tokens AS DOUBLE), 0.7)) AS totw FROM a)
        |SELECT source, n_docs, n_tokens,
        | round(CAST(n_tokens AS DOUBLE) / tot, 4) AS token_share,
        | round(pow(CAST(n_tokens AS DOUBLE), 0.7) / totw, 4) AS weight
        |FROM a CROSS JOIN t ORDER BY source""".stripMargin,

    "q_vec_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |sd AS (SELECT vec_id AS seed_id, v AS sv, norm AS snorm FROM n WHERE vec_id < 8),
        |sc AS (SELECT c.vec_id, sd.seed_id,
        |         list_dot_product(c.v, sd.sv) / (c.norm * sd.snorm) AS cos,
        |         row_number() OVER (PARTITION BY c.vec_id
        |           ORDER BY list_dot_product(c.v, sd.sv) / (c.norm * sd.snorm) DESC,
        |                    sd.seed_id) AS r
        |       FROM n c CROSS JOIN sd),
        |asn AS (SELECT vec_id, seed_id AS cell, cos FROM sc WHERE r = 1)
        |SELECT cell, count(*) AS n, round(avg(cos), 4) + 0.0 AS avg_cos,
        | round(min(cos), 4) + 0.0 AS min_cos, round(max(cos), 4) + 0.0 AS max_cos
        |FROM asn GROUP BY 1 ORDER BY cell""".stripMargin,

    // Spherical k-means (5 Lloyd rounds, k=8), oracle'd by unrolling: the
    // corpus is quantized once to floor(x*1e6) micro-units, each round is
    // (argmax-cosine assignment -> integer component sums -> floor-divided
    // centroid), and integer accumulation is order-exact, so the trained
    // centroids — and hence the final profile — are engine-identical.
    // Early stop in the Spark fit needs no counterpart here: a stable
    // integer centroid set is a fixed point, so extra rounds are no-ops.
    "q_kmeans_profile" -> kmeansOracle(k = 8, rounds = 5),

    // Salting is a physical-plan device; the oracle is the PLAIN join —
    // the gate proves the salted formulation output-identical.
    "q_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))) * 100, 0) AS BIGINT) AS revenue_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // First-order Markov transitions within (user, day): lead over the
    // bounded journey partitions (event_id tiebreak), counts
    // row-normalized against the per-source total.
    "q_markov_paths" ->
      """WITH e AS (SELECT user_id,
        |             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
        |             ts, event_id, event_type
        |           FROM events),
        |s AS (SELECT event_type AS src,
        |        lead(event_type) OVER (PARTITION BY user_id, day
        |          ORDER BY ts, event_id) AS dst
        |      FROM e),
        |tc AS (SELECT src, dst, count(*) AS n_trans FROM s
        |       WHERE dst IS NOT NULL GROUP BY 1, 2),
        |rs AS (SELECT src, CAST(sum(n_trans) AS BIGINT) AS rt
        |       FROM tc GROUP BY 1)
        |SELECT tc.src, tc.dst, tc.n_trans,
        |  round(tc.n_trans::DOUBLE / rs.rt, 4) AS prob
        |FROM tc JOIN rs ON rs.src = tc.src
        |ORDER BY tc.src, tc.dst""".stripMargin,

    "q_funnel" ->
      """WITH u AS (SELECT user_id,
        |        min(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts,
        |        max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_p
        |      FROM events GROUP BY 1),
        |a AS (SELECT count(*) AS n0, count(s_ts) AS n1,
        |        -- coalesce (r12 fuzz): count_if over an EMPTY relation is
        |        -- NULL in DuckDB where the engine's count(when) is 0
        |        CAST(coalesce(count_if(last_p > s_ts), 0) AS BIGINT) AS n2 FROM u)
        |SELECT * FROM (
        |  SELECT '0_all_users' AS stage, n0 AS n_users,
        |    round(CAST(n0 AS DOUBLE) / n0, 4) AS pct_of_all FROM a
        |  UNION ALL SELECT '1_signed_up', n1, round(CAST(n1 AS DOUBLE) / n0, 4) FROM a
        |  UNION ALL SELECT '2_purchased_after_signup', n2,
        |    round(CAST(n2 AS DOUBLE) / n0, 4) FROM a
        |) ORDER BY stage""".stripMargin,

    // Interpolated Kneser-Ney bigram scoring: integer model statistics
    // (bigram counts, context totals, forward/backward continuation type
    // counts), the discount formula written with all-double literals
    // identically to the Spark expression, one rounded avg(ln) per doc.
    "q_kn_lm" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT doc_id,
        |         unnest(CASE WHEN len(t) >= 2
        |           THEN list_transform(range(1, len(t)),
        |                  i -> t[i] || ' ' || t[i + 1])
        |           ELSE [] END) AS big
        |       FROM t),
        |sp AS (SELECT doc_id, string_split(big, ' ')[1] AS w1,
        |         string_split(big, ' ')[2] AS w2 FROM bg),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM sp GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1,
        |         count(*) AS n1fw FROM c2 GROUP BY 1),
        |bw AS (SELECT w2, count(*) AS n1bw FROM c2 GROUP BY 1),
        |tot AS (SELECT count(*) AS n1tot FROM c2)
        |SELECT sp.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(ln(
        |    greatest(c2.c2 - 0.75::DOUBLE, 0.0::DOUBLE) / c1.c1 +
        |    0.75::DOUBLE * c1.n1fw / c1.c1 * (bw.n1bw / (tot.n1tot::DOUBLE))
        |  )), 4) AS avg_logp_kn
        |FROM sp JOIN c2 ON c2.w1 = sp.w1 AND c2.w2 = sp.w2
        |JOIN c1 ON c1.w1 = sp.w1 JOIN bw ON bw.w2 = sp.w2 CROSS JOIN tot
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Zipf head fit: top-100 tokens by (count desc, token), least-squares
    // slope/intercept/R2 of (ln rank, ln count) from five raw moments.
    "q_zipf" ->
      """WITH v AS (SELECT tok, count(*) AS c FROM (
        |       SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |     WHERE len(tok) > 0 GROUP BY 1),
        |h AS (SELECT tok, c FROM v ORDER BY c DESC, tok LIMIT 100),
        |r AS (SELECT CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT)
        |        AS rnk, c FROM h),
        |x AS (SELECT ln(rnk::DOUBLE) AS x, ln(c::DOUBLE) AS y FROM r),
        |s AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
        |        sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        |      FROM x)
        |SELECT CAST(n AS BIGINT) AS n_head,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
        |    AS intercept,
        |  round(pow(n * sxy - sx * sy, 2) /
        |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r2
        |FROM s""".stripMargin,

    "q_lm_score" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |         i -> t[i] || ' ' || t[i+1])) AS big FROM d),
        |cb AS (SELECT big, count(*) AS c2 FROM bg GROUP BY 1),
        |cu AS (SELECT string_split(big, ' ')[1] AS w1, count(*) AS c1
        |       FROM bg GROUP BY 1),
        |s AS (SELECT doc_id, ln(CAST(c2 AS DOUBLE) / c1) AS lp
        |      FROM bg JOIN cb USING (big)
        |      JOIN cu ON string_split(bg.big, ' ')[1] = cu.w1)
        |SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 4) AS avg_logp
        |FROM s GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "q_text_embed_join" ->
      """SELECT doc_id, lang,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        | round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 4)
        |   AS norm,
        | label
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id""".stripMargin,

    "q_gopher_rules" ->
      """WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
        |        len(toks) BETWEEN 30 AND 10000 AS ok_ntok,
        |        CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks)
        |          BETWEEN 4.3 AND 10.0 AS ok_wlen,
        |        CAST(len(list_filter(toks,
        |            t -> t IN ('the', 'a', 'and', 'of', 'to', 'in'))) AS DOUBLE)
        |          / len(toks) >= 0.02 AS ok_stop,
        |        CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.4 AS ok_ttr
        |      FROM d)
        |SELECT doc_id, n_tok, ok_ntok, ok_wlen, ok_stop, ok_ttr,
        |  ok_ntok AND ok_wlen AND ok_stop AND ok_ttr AS keep
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_reshard" ->
      """SELECT CAST((((doc_id % 2147483647) * 2654435761) % 1000003) % 16 AS INT) AS shard,
        |  count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin,

    "q_novelty" ->
      """WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM t0),
        |e AS (SELECT doc_id, unnest(sh) AS gm FROM s),
        |f AS (SELECT gm, count(*) AS cnt FROM e GROUP BY 1),
        |u AS (SELECT e.doc_id, count(*) AS n_unique FROM e JOIN f ON e.gm = f.gm
        |      WHERE f.cnt = 1 GROUP BY 1)
        |SELECT s.doc_id, CAST(len(sh) AS BIGINT) AS n_sh,
        |  CAST(coalesce(u.n_unique, 0) AS BIGINT) AS n_unique,
        |  round(CAST(coalesce(u.n_unique, 0) AS DOUBLE) / greatest(len(sh), 1), 4)
        |    AS novelty_ratio
        |FROM s LEFT JOIN u ON s.doc_id = u.doc_id ORDER BY s.doc_id""".stripMargin,

    "q_scd2" ->
      """SELECT user_id, event_id AS version_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS valid_from,
        |  CAST(floor(epoch(lead(ts, 1) OVER
        |    (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id))) AS BIGINT)
        |    AS valid_to,
        |  lead(ts, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts NULLS FIRST, event_id) IS NULL AS is_current,
        |  round(value, 2) AS value
        |FROM events ORDER BY user_id, valid_from, version_id""".stripMargin,

    // AS OF over the q_scd2 history at the event-time-range midpoint:
    // interval-containment filter, no join
    "q_scd2_asof" ->
      """WITH h AS (SELECT user_id, event_id AS version_id,
        |        CAST(floor(epoch(ts)) AS BIGINT) AS valid_from,
        |        CAST(floor(epoch(lead(ts, 1) OVER
        |          (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
        |          AS valid_to,
        |        round(value, 2) AS value
        |      FROM events),
        |t AS (SELECT CAST((min(CAST(floor(epoch(ts)) AS BIGINT)) +
        |        max(CAST(floor(epoch(ts)) AS BIGINT))) // 2 AS BIGINT) AS mid
        |      FROM events)
        |SELECT user_id, version_id, valid_from, value
        |FROM h CROSS JOIN t
        |WHERE valid_from <= mid AND (valid_to IS NULL OR valid_to > mid)
        |ORDER BY user_id""".stripMargin,

    "q_entropy" ->
      """WITH e AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM e GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
        |        sum(c * log2(c)) AS clog FROM c GROUP BY 1)
        |SELECT doc_id, n_tok, round(log2(n_tok) - clog / n_tok, 4) AS entropy
        |FROM a ORDER BY doc_id""".stripMargin,

    "q_source_profile" ->
      """SELECT source, count(*) AS n_docs,
        |  round(avg(n_chars), 2) AS avg_chars,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(DISTINCT text) AS BIGINT) AS n_uniq,
        |  round(CAST(count(*) - count(DISTINCT text) AS DOUBLE) / count(*), 4)
        |    AS dup_ratio
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // One-shot pair set (no df cap) restricted to pairs with a new-side doc
    // (doc_b > median split) — grades IncrementalDedup.twoBatchPairs'
    // incremental = one-shot contract.
    "q_dedup_incr" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d),
        |p AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM s),
        |j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
        |        count(*) AS c
        |      FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2, 3, 4)
        |SELECT doc_a, doc_b, round(CAST(c AS DOUBLE) / (na + nb - c), 4) AS jaccard
        |FROM j WHERE round(CAST(c AS DOUBLE) / (na + nb - c), 4) >= 0.5
        |  AND doc_b > (SELECT max(doc_id) // 2 FROM documents)
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_dup_spans" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id, r['pos'] AS pos, r['gm'] AS gm FROM
        |        (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 4),
        |           i -> struct_pack(pos := i - 1,
        |             gm := t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
        |               || ' ' || t[i+4]))) AS r FROM d)),
        |dup AS (SELECT gm FROM (SELECT gm, count(DISTINCT doc_id) AS dd
        |          FROM g GROUP BY 1) WHERE dd >= 2),
        |f AS (SELECT doc_id, pos FROM g WHERE gm IN (SELECT gm FROM dup)),
        |runs AS (SELECT doc_id,
        |           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |         FROM f),
        |r AS (SELECT doc_id, count(*) AS rl FROM runs GROUP BY doc_id, grp),
        |agg AS (SELECT doc_id, CAST(sum(rl) AS BIGINT) AS n_dup_pos,
        |          CAST(max(rl) AS BIGINT) AS longest_run FROM r GROUP BY 1),
        |base AS (SELECT doc_id, CAST(CASE WHEN t IS NULL THEN NULL
        |          ELSE greatest(len(t) - 4, 0) END AS BIGINT) AS n_pos FROM d)
        |SELECT base.doc_id, n_pos,
        |  coalesce(n_dup_pos, 0) AS n_dup_pos,
        |  coalesce(longest_run, 0) AS longest_run,
        |  round(CAST(coalesce(n_dup_pos, 0) AS DOUBLE)
        |    / greatest(coalesce(n_pos, 0), 1), 4)
        |    AS dup_ratio
        |FROM base LEFT JOIN agg ON base.doc_id = agg.doc_id
        |ORDER BY base.doc_id""".stripMargin,

    // Same gram construction as q_dup_spans (proven aligned with the
    // codegen'd positional hashes by that gate); scrub policy: the minimum
    // doc_id containing a gram keeps it, every other doc drops all tokens
    // covered by a shared gram, and the survivors rejoin in order.
    "q_scrub_spans" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id, r['pos'] AS pos, r['gm'] AS gm FROM
        |        (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 4),
        |           i -> struct_pack(pos := i - 1,
        |             gm := t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
        |               || ' ' || t[i+4]))) AS r FROM d)),
        |m AS (SELECT gm, min(doc_id) AS first_doc FROM g GROUP BY 1),
        |f AS (SELECT g.doc_id, g.pos FROM g JOIN m ON g.gm = m.gm
        |      WHERE g.doc_id > m.first_doc),
        |cov AS (SELECT DISTINCT doc_id, pos + u AS tpos
        |        FROM f, (SELECT unnest(generate_series(0, 4)) AS u)),
        |tok AS (SELECT doc_id, r['tpos'] AS tpos, r['tok'] AS tok FROM
        |        (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)),
        |           i -> struct_pack(tpos := i - 1, tok := t[i]))) AS r FROM d)),
        |k AS (SELECT * FROM tok WHERE NOT EXISTS (SELECT 1 FROM cov
        |        WHERE cov.doc_id = tok.doc_id AND cov.tpos = tok.tpos)),
        |c AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean_text,
        |        count(*) AS n_kept FROM k GROUP BY 1),
        |base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM d)
        |SELECT base.doc_id, n_tokens,
        |  CAST(n_tokens - coalesce(n_kept, 0) AS BIGINT) AS n_scrubbed,
        |  coalesce(clean_text, '') AS clean_text
        |FROM base LEFT JOIN c ON base.doc_id = c.doc_id
        |ORDER BY base.doc_id""".stripMargin,

    // Paragraph-block dedup: non-overlapping 16-token segments, global
    // keep-first by (doc_id, seg_idx); md5 keys both engines identically.
    "q_para_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        |), idx AS (
        |  SELECT doc_id, ts,
        |    UNNEST(range(CAST(ceil(len(ts) / 16.0) AS BIGINT))) AS seg_idx
        |  FROM toks
        |), segs AS (
        |  SELECT doc_id, seg_idx,
        |    array_to_string(ts[seg_idx * 16 + 1 : seg_idx * 16 + 16], ' ') AS seg
        |  FROM idx
        |), flagged AS (
        |  SELECT doc_id, seg_idx, seg,
        |    row_number() OVER (PARTITION BY md5(seg) ORDER BY doc_id, seg_idx) = 1 AS keep
        |  FROM segs
        |)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_segs,
        |  CAST(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segs,
        |  coalesce(string_agg(CASE WHEN keep THEN seg END, ' ' ORDER BY seg_idx), '')
        |    AS clean_text
        |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // SimHash over md5-prefix feature hashes: the fingerprint is a pure
    // integer function of the distinct word-3-gram set, so DuckDB rebuilds
    // it bit by bit — 60 per-bit majority sums folded into one BIGINT
    // (features are 60-bit non-negative, so no sign handling anywhere).
    // Docs with no shingles (< 3 tokens) carry fingerprint 0 via the left
    // join, mirroring graft_simhash64 of an empty array.
    "q_simhash" ->
      ("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |sh AS (SELECT doc_id,
        |         unnest(list_distinct(list_transform(generate_series(1, len(ts) - 2),
        |           i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS s
        |       FROM d),
        |feat AS (SELECT doc_id,
        |           CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h FROM sh),
        |fp AS (SELECT doc_id, BITSUM AS simhash FROM feat GROUP BY doc_id)
        |SELECT d2.doc_id,
        |  CASE WHEN d2.text IS NULL THEN NULL
        |       ELSE coalesce(fp.simhash, 0) END AS simhash
        |FROM documents d2 LEFT JOIN fp ON d2.doc_id = fp.doc_id
        |ORDER BY d2.doc_id""".stripMargin)
        .replace("BITSUM", (0 until 60).map(j =>
          s"(CASE WHEN sum(((h >> $j) & 1) * 2 - 1) > 0 " +
            s"THEN CAST(1 AS BIGINT) << $j ELSE 0 END)").mkString(" + ")),

    // Banded simhash pairs: 4 x 16-bit blocks, candidate join on a shared
    // block, exact hamming verify via bit_count(xor). Same fingerprint CTE
    // as q_simhash; zero-shingle docs are excluded like the Spark side's
    // n_sh > 0 filter.
    "q_simhash_pairs" ->
      ("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |sh AS (SELECT doc_id,
        |         unnest(list_distinct(list_transform(generate_series(1, len(ts) - 2),
        |           i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS s
        |       FROM d),
        |feat AS (SELECT doc_id,
        |           CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h FROM sh),
        |fp AS (SELECT doc_id, BITSUM AS simhash FROM feat GROUP BY doc_id),
        |blk AS (SELECT doc_id, simhash, b AS block_id,
        |          (simhash >> (b * 16)) & 65535 AS block_v
        |        FROM fp, unnest([0, 1, 2, 3]) AS t(b))
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        |FROM blk a JOIN blk b
        |  ON a.block_id = b.block_id AND a.block_v = b.block_v
        |  AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
        |ORDER BY doc_a, doc_b""".stripMargin)
        .replace("BITSUM", (0 until 60).map(j =>
          s"(CASE WHEN sum(((h >> $j) & 1) * 2 - 1) > 0 " +
            s"THEN CAST(1 AS BIGINT) << $j ELSE 0 END)").mkString(" + ")),

    // Winnowing fingerprints over md5-prefix gram hashes: k-char grams,
    // min per sliding window of w=8 (full windows only), distinct per doc.
    // The window-frame min reproduces graft_sliding_min_distinct exactly;
    // docs with fewer than w grams select nothing in both engines.
    "q_winnow" ->
      """WITH g AS (SELECT doc_id, text,
        |             unnest(range(1, greatest(length(text) - 5 + 1, 1) + 1)) AS i
        |           FROM documents),
        |h AS (SELECT doc_id, i,
        |        CAST('0x' || substr(md5(substr(text, CAST(i AS INTEGER), 5)), 1, 15)
        |          AS BIGINT) AS gh
        |      FROM g),
        |n AS (SELECT doc_id, count(*) AS ng FROM h GROUP BY doc_id),
        |wm AS (SELECT doc_id, i,
        |         min(gh) OVER (PARTITION BY doc_id ORDER BY i
        |           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS m
        |       FROM h)
        |SELECT DISTINCT wm.doc_id, wm.m AS fp
        |FROM wm JOIN n ON wm.doc_id = n.doc_id
        |WHERE wm.i <= n.ng - 8 + 1
        |ORDER BY wm.doc_id, fp""".stripMargin,

    // Frozen-weight logistic quality score; ln/exp on doubles agree across
    // engines and the 4 dp rounding absorbs any last-ulp libm drift.
    "q_quality_classify" -> {
      def occ(m: String) =
        s"((length(pt) - length(replace(pt, '$m', ''))) / ${m.length})"
      """WITH d AS (SELECT doc_id, text, ' ' || text || ' ' AS pt,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents),
        |f AS (SELECT doc_id, n_tok,
        |        round(CAST(length(text) - (n_tok - 1) AS DOUBLE) / n_tok, 4)
        |          AS mean_tok_len,
        |        round(CAST(STOPS AS DOUBLE) / n_tok, 4) AS stop_ratio
        |      FROM d),
        |z AS (SELECT *, -3.1 + 0.6 * ln(1.0 + n_tok) + 0.8 * mean_tok_len / 5.0
        |        + 1.5 * stop_ratio AS z FROM f)
        |SELECT doc_id, n_tok, mean_tok_len, stop_ratio,
        |  round(1.0 / (1.0 + exp(-z)), 4) AS quality,
        |  round(1.0 / (1.0 + exp(-z)), 4) >= 0.5 AS keep
        |FROM z ORDER BY doc_id""".stripMargin
        .replace("STOPS", s"${occ(" the ")} + ${occ(" a ")}")
    },

    // BM25 with Lucene's idf; corpus stats are exact (integer-valued
    // doubles), so only the per-doc <=|Q|-term sum is float-order-sensitive
    // and 4 dp rounding absorbs it (the entropy/lm_score precedent).
    "q_bm25" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |s AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(len(t)) AS avgdl FROM d),
        |e AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl, unnest(t) AS w FROM d),
        |tf AS (SELECT doc_id, dl, w, CAST(count(*) AS DOUBLE) AS tf FROM e
        |       WHERE w IN ('spark', 'join', 'stream') GROUP BY 1, 2, 3),
        |df AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id,
        |         ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) * tf.tf * (1.2 + 1.0) /
        |           (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sco
        |       FROM tf JOIN df USING (w), s)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms, round(sum(sco), 4) AS bm25
        |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Reciprocal-rank fusion of the BM25 leg (q_bm25's oracle, ranked) and
    // a single-query cosine leg (q_ann_topk's shape): both rank lists are
    // assigned on 4-dp-rounded scores with id tie-breaks, and absent-list
    // membership is rank 0, so the fused surface is engine-deterministic.
    "q_rrf_fusion" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |s AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(len(t)) AS avgdl FROM d),
        |e AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl, unnest(t) AS w FROM d),
        |tf AS (SELECT doc_id, dl, w, CAST(count(*) AS DOUBLE) AS tf FROM e
        |       WHERE w IN ('spark', 'join', 'stream') GROUP BY 1, 2, 3),
        |df AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id,
        |         ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) * tf.tf * (1.2 + 1.0) /
        |           (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sco
        |       FROM tf JOIN df USING (w), s),
        |bm AS (SELECT doc_id, round(sum(sco), 4) AS bm25 FROM sc GROUP BY 1),
        |lex AS (SELECT id, lex_rank FROM
        |          (SELECT doc_id AS id, CAST(row_number() OVER
        |             (ORDER BY bm25 DESC, doc_id) AS INT) AS lex_rank
        |           FROM bm WHERE doc_id <> 0)
        |        WHERE lex_rank <= 50),
        |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM ev),
        |cs AS (SELECT c.vec_id AS id,
        |         round(list_dot_product(q.v, c.v) / (q.norm * c.norm), 4) + 0.0 AS cos
        |       FROM n c JOIN n q ON q.vec_id = 0 AND c.vec_id <> 0),
        |sem AS (SELECT id, sem_rank FROM
        |          (SELECT id, CAST(row_number() OVER
        |             (ORDER BY cos DESC, id) AS INT) AS sem_rank FROM cs)
        |        WHERE sem_rank <= 50),
        |f AS (SELECT coalesce(lex.id, sem.id) AS doc_id,
        |        coalesce(lex_rank, 0) AS lex_rank, coalesce(sem_rank, 0) AS sem_rank
        |      FROM lex FULL OUTER JOIN sem ON lex.id = sem.id),
        |r AS (SELECT doc_id, lex_rank, sem_rank,
        |        round((CASE WHEN lex_rank > 0
        |                 THEN CAST(1.0 AS DOUBLE) / (60 + lex_rank) ELSE 0.0 END)
        |            + (CASE WHEN sem_rank > 0
        |                 THEN CAST(1.0 AS DOUBLE) / (60 + sem_rank) ELSE 0.0 END), 4) AS rrf
        |      FROM f)
        |SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank,
        |  doc_id, lex_rank, sem_rank, rrf
        |FROM r ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    // Hard negatives: q_ann_topk's exact-cosine ranking with the label
    // exclusion as the join predicate; ranks on unrounded cosine (the
    // sequential-fold dot is bit-identical across engines), id tie-break.
    "q_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, label, v,
        |        sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |s AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id, c.label AS n_label,
        |        list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
        |      FROM n q JOIN n c ON q.label <> c.label WHERE q.vec_id < 10),
        |r AS (SELECT q_id, n_id, n_label, cos,
        |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        |      FROM s)
        |SELECT q_id, CAST(rank AS INT) AS rank, n_id, n_label,
        |  round(cos, 4) + 0.0 AS cosine
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // PMI collocations: integer corpus counts feed one fixed-order double
    // expression (joint / (marginal*marginal)) rounded at 4 dp; ties broken
    // by the word pair.
    "q_pmi_collocations" ->
      """WITH d AS (SELECT string_split(text, ' ') AS t FROM documents),
        |uni AS (SELECT w, count(*) AS cw FROM
        |          (SELECT unnest(t) AS w FROM d) GROUP BY 1),
        |tot AS (SELECT CAST(sum(cw) AS DOUBLE) AS n_tok FROM uni),
        |bp AS (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
        |         i -> t[i] || ' ' || t[i+1])) AS pr
        |       FROM d WHERE len(t) >= 2),
        |big AS (SELECT split_part(pr, ' ', 1) AS w1, split_part(pr, ' ', 2) AS w2,
        |          count(*) AS cab FROM bp GROUP BY 1, 2),
        |np AS (SELECT CAST(sum(cab) AS DOUBLE) AS n_pair FROM big),
        |sc AS (SELECT w1, w2, cab,
        |         round(ln((cab / np.n_pair) /
        |           ((c1.cw / tot.n_tok) * (c2.cw / tot.n_tok))), 4) + 0.0 AS pmi
        |       FROM big JOIN uni c1 ON big.w1 = c1.w
        |         JOIN uni c2 ON big.w2 = c2.w, tot, np
        |       WHERE cab >= 5),
        |r AS (SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rank FROM sc)
        |SELECT CAST(rank AS INT) AS rank, w1, w2, CAST(cab AS BIGINT) AS pair_count, pmi
        |FROM r WHERE rank <= 25 ORDER BY rank""".stripMargin,

    // SemDeDup disposition: deterministic sign-cell clusters stand in for
    // the paper's seed-bound k-means; keep-rule comparisons run on
    // 4-dp-rounded cos-to-centroid with vec_id tie-breaks, so the kept
    // flag is engine-exact. Centroid reassembly pairs unnest with
    // generate_subscripts positionally (the q_embed_pool pattern).
    "q_sem_dedup" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, label, v,
        |        sqrt(list_sum(list_transform(v, x -> x * x))) AS norm,
        |        CAST(v[1] > 0 AS INT) * 8 + CAST(v[2] > 0 AS INT) * 4 +
        |        CAST(v[3] > 0 AS INT) * 2 + CAST(v[4] > 0 AS INT) AS cell
        |      FROM e),
        |cd AS (SELECT label, cell, CAST(generate_subscripts(v, 1) AS INT) AS dim,
        |         unnest(v) AS x FROM n),
        |cm AS (SELECT label, cell, dim, avg(x) AS m FROM cd GROUP BY 1, 2, 3),
        |c AS (SELECT label, cell, list(m ORDER BY dim) AS cv FROM cm GROUP BY 1, 2),
        |s AS (SELECT n.vec_id, n.label, n.cell,
        |        round(list_dot_product(n.v, c.cv) /
        |          (n.norm * sqrt(list_sum(list_transform(c.cv, x -> x * x)))), 4) + 0.0
        |          AS cos_centroid
        |      FROM n JOIN c USING (label, cell)),
        |p AS (SELECT a.vec_id AS i, b.vec_id AS j
        |      FROM n a JOIN n b ON a.label = b.label AND a.cell = b.cell
        |        AND a.vec_id < b.vec_id
        |      WHERE round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 4) >= 0.3),
        |sym AS (SELECT i, j FROM p UNION ALL SELECT j, i FROM p),
        |g AS (SELECT sym.i AS vec_id, count(*) AS n_dups,
        |        bool_or(sj.cos_centroid < si.cos_centroid OR
        |          (sj.cos_centroid = si.cos_centroid AND sym.j < sym.i)) AS has_better
        |      FROM sym JOIN s si ON si.vec_id = sym.i JOIN s sj ON sj.vec_id = sym.j
        |      GROUP BY 1)
        |SELECT s.vec_id, s.label, s.cell, s.cos_centroid,
        |  CAST(coalesce(g.n_dups, 0) AS BIGINT) AS n_dups,
        |  NOT coalesce(g.has_better, FALSE) AS kept
        |FROM s LEFT JOIN g USING (vec_id)
        |ORDER BY s.vec_id""".stripMargin,

    // Unigram-LM (SentencePiece) candidate inventory: substrings of length
    // 1..4 over the distinct-word table, weighted by word frequency —
    // exact integer oracle, ties broken by piece.
    "q_unigram_counts" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |tc AS (SELECT tok, count(*) AS c FROM t WHERE len(tok) > 0 GROUP BY 1),
        |p AS (SELECT unnest(flatten(list_transform(range(1, len(tok) + 1),
        |        i -> list_transform(range(i, least(i + 3, len(tok)) + 1),
        |          j -> substr(tok, i, j - i + 1))))) AS piece, c
        |      FROM tc),
        |f AS (SELECT piece, CAST(sum(c) AS BIGINT) AS freq FROM p GROUP BY 1),
        |r AS (SELECT piece, freq,
        |        row_number() OVER (ORDER BY freq DESC, piece) AS rank FROM f)
        |SELECT CAST(rank AS INT) AS rank, piece, CAST(len(piece) AS INT) AS len,
        |  freq
        |FROM r WHERE rank <= 64 ORDER BY rank""".stripMargin,

    // Viterbi unigram segmentation: fewest pieces, ties toward the highest
    // path frequency mass, as a packed-integer DP. The recursive CTE
    // carries the last four best-costs as columns (maxLen = 4), which is
    // the SQL shape of the Spark side's aggregate fold.
    // Hard-EM round: the q_unigram_encode DP carrying the FULL prefix-cost
    // list, then a LATERAL traceback walk picking the shortest piece that
    // reproduces the optimum at each boundary (the engine's tie rule), and
    // one corpus-weighted piece re-count. All-integer scores make the
    // round engine-exact.
    "q_unigram_em" ->
      s"""WITH RECURSIVE
         |$unigramSeedCtes,
         |${unigramUsageCtes("1", "v")}
         |SELECT v.piece, v.freq, CAST(coalesce(em1.em_freq, 0) AS BIGINT) AS em_freq
         |FROM v LEFT JOIN em1 USING (piece) ORDER BY piece""".stripMargin,

    // The SentencePiece prune step as one chained statement: usage pass 1
    // over the seed vocabulary, rank multi-char pieces by usage and keep
    // the top ceil(0.8 * n) (chars always survive), re-weight survivors
    // with their EM counts, usage pass 2 over the pruned vocabulary. The
    // 0.8 is the same double literal the engine uses, so even the ceil's
    // representation error matches bit for bit.
    "q_unigram_prune" ->
      s"""WITH RECURSIVE
         |$unigramSeedCtes,
         |${unigramUsageCtes("1", "v")},
         |em1f AS (SELECT v.piece, CAST(coalesce(em1.em_freq, 0) AS BIGINT) AS em1
         |         FROM v LEFT JOIN em1 USING (piece)),
         |m AS (SELECT piece, em1, row_number() OVER (ORDER BY em1 DESC, piece) AS rk,
         |        count(*) OVER () AS nm FROM em1f WHERE len(piece) > 1),
         |v2 AS (SELECT piece, em1 AS freq FROM m
         |       WHERE rk <= CAST(ceil(0.8 * nm) AS BIGINT)
         |       UNION ALL
         |       SELECT piece, em1 AS freq FROM em1f WHERE len(piece) = 1),
         |${unigramUsageCtes("2", "v2")}
         |SELECT em1f.piece, em1f.em1,
         |  (m.rk IS NULL OR m.rk <= CAST(ceil(0.8 * m.nm) AS BIGINT)) AS kept,
         |  CAST(coalesce(em2.em_freq, 0) AS BIGINT) AS em2
         |FROM em1f LEFT JOIN m USING (piece) LEFT JOIN em2 USING (piece)
         |ORDER BY piece""".stripMargin,

    "q_unigram_encode" ->
      """WITH RECURSIVE
        |t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |tc AS (SELECT tok, count(*) AS c FROM t WHERE len(tok) > 0 GROUP BY 1),
        |p AS (SELECT unnest(flatten(list_transform(range(1, len(tok) + 1),
        |        i -> list_transform(range(i, least(i + 3, len(tok)) + 1),
        |          j -> substr(tok, i, j - i + 1))))) AS piece, c
        |      FROM tc),
        |f AS (SELECT piece, CAST(sum(c) AS BIGINT) AS freq FROM p GROUP BY 1),
        |top AS (SELECT piece, freq FROM f ORDER BY freq DESC, piece LIMIT 64),
        |-- explicit GROUP BY dedup: under WITH RECURSIVE DuckDB executes a
        |-- plain UNION here without cross-branch dedup (measured), which
        |-- would double every char lookup in the recursion below
        |v AS (SELECT piece, max(freq) AS freq FROM (
        |        SELECT piece, freq FROM top
        |        UNION ALL
        |        SELECT piece, freq FROM f WHERE len(piece) = 1) u
        |      GROUP BY piece),
        |dp AS (
        |  SELECT tok, c, 0 AS i, CAST(0 AS BIGINT) AS b0,
        |    CAST(2305843009213693951 AS BIGINT) AS b1,
        |    CAST(2305843009213693951 AS BIGINT) AS b2,
        |    CAST(2305843009213693951 AS BIGINT) AS b3
        |  FROM tc
        |  UNION ALL
        |  SELECT dp.tok, dp.c, dp.i + 1,
        |    least(
        |      CASE WHEN v1.freq IS NOT NULL
        |        THEN dp.b0 + 1099511627776 - v1.freq
        |        ELSE 2305843009213693951 END,
        |      CASE WHEN dp.i >= 1 AND v2.freq IS NOT NULL
        |        THEN dp.b1 + 1099511627776 - v2.freq
        |        ELSE 2305843009213693951 END,
        |      CASE WHEN dp.i >= 2 AND v3.freq IS NOT NULL
        |        THEN dp.b2 + 1099511627776 - v3.freq
        |        ELSE 2305843009213693951 END,
        |      CASE WHEN dp.i >= 3 AND v4.freq IS NOT NULL
        |        THEN dp.b3 + 1099511627776 - v4.freq
        |        ELSE 2305843009213693951 END),
        |    dp.b0, dp.b1, dp.b2
        |  FROM dp
        |  LEFT JOIN v v1 ON v1.piece = substr(dp.tok, dp.i + 1, 1)
        |  LEFT JOIN v v2 ON dp.i >= 1 AND v2.piece = substr(dp.tok, dp.i, 2)
        |  LEFT JOIN v v3 ON dp.i >= 2 AND v3.piece = substr(dp.tok, dp.i - 1, 3)
        |  LEFT JOIN v v4 ON dp.i >= 3 AND v4.piece = substr(dp.tok, dp.i - 2, 4)
        |  WHERE dp.i < len(dp.tok))
        |SELECT tok, CAST(c AS BIGINT) AS n_occ, CAST(len(tok) AS INT) AS n_chars,
        |  CAST((b0 // 1099511627776) + 1 AS INT) AS n_pieces,
        |  CAST(((b0 // 1099511627776) + 1) * 1099511627776 - b0 AS BIGINT)
        |    AS piece_freq_sum
        |FROM dp WHERE i = len(tok) ORDER BY tok""".stripMargin,

    // BPE merge statistic: integer-weighted char-pair counts over the
    // distinct-token table — exact in any engine; ties broken by pair.
    "q_bpe_pairs" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |tc AS (SELECT tok, count(*) AS c FROM t GROUP BY 1),
        |p AS (SELECT tc.c, unnest(list_transform(generate_series(1, length(tok) - 1),
        |        i -> substr(tok, i, 2))) AS pair
        |      FROM tc WHERE length(tok) >= 2),
        |a AS (SELECT pair, CAST(sum(c) AS BIGINT) AS freq FROM p GROUP BY 1),
        |r AS (SELECT *, row_number() OVER (ORDER BY freq DESC, pair) AS rank FROM a)
        |SELECT CAST(rank AS INT) AS rank, pair, freq
        |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // Iterative BPE training, oracle'd by unrolling rounds (the q_pagerank
    // trick): each round is a closed-form CTE triple — pair stats, the
    // (freq DESC, a, b) argmax, and the greedy left-to-right re-fold — and
    // every count is an integer, so the learned table is engine-exact.
    "q_bpe_fit" -> bpeFitOracle(3),

    // The encoder half: the same unrolled fit derives the 8-merge table,
    // then every DISTINCT word is re-folded through the merges in learned
    // order and docs pay one word-keyed join — mirroring the Spark shape.
    "q_bpe_encode" -> bpeEncodeOracle(8),

    // Mean-pooled centroids; generate_subscripts pairs positionally with
    // unnest, matching posexplode's (dim, value) fan-out.
    "q_embed_pool" ->
      """WITH e AS (SELECT label, unnest(embedding) AS v,
        |             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim
        |           FROM embeddings)
        |SELECT label, dim, CAST(count(*) AS BIGINT) AS n_vecs,
        |  round(avg(CAST(v AS DOUBLE)), 4) + 0.0 AS centroid
        |FROM e GROUP BY 1, 2 ORDER BY label, dim""".stripMargin,

    // DSIR unigram importance weights: target = lang 'en', add-0.5
    // smoothing over the joint vocabulary.
    "q_dsir_weights" ->
      """WITH e0 AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
        |e AS (SELECT * FROM e0 WHERE len(w) > 0),
        |raw AS (SELECT w, count(*) AS c_raw FROM e GROUP BY 1),
        |tgt AS (SELECT w, count(*) AS c_tgt FROM e WHERE lang = 'en' GROUP BY 1),
        |lp AS (SELECT raw.w, c_raw, coalesce(c_tgt, 0) AS c_tgt
        |       FROM raw LEFT JOIN tgt USING (w)),
        |tot AS (SELECT CAST(sum(c_raw) AS DOUBLE) AS t_raw,
        |          CAST(sum(c_tgt) AS DOUBLE) AS t_tgt,
        |          CAST(count(*) AS DOUBLE) AS v FROM lp),
        |r AS (SELECT w, ln((c_tgt + 0.5) / (t_tgt + 0.5 * v))
        |        - ln((c_raw + 0.5) / (t_raw + 0.5 * v)) AS lr FROM lp, tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |  round(sum(lr), 4) AS log_weight
        |FROM e JOIN r USING (w) GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Deterministic hash-order sampling: md5 ranks identically everywhere.
    "q_stratified_sample" ->
      """WITH h AS (SELECT doc_id, lang, source,
        |             md5('graft_sample:' || CAST(doc_id AS VARCHAR)) AS h
        |           FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
        |        AS rank FROM h)
        |SELECT lang, CAST(rank AS INT) AS rank, doc_id, source
        |FROM r WHERE rank <= 40 ORDER BY lang, rank""".stripMargin,

    "q_pagerank" -> pageRankOracle,

    // k-core peel over the triangles graph (threshold 0.15): 8 unrolled
    // MATERIALIZED peel rounds (inlined CTEs would double the subtree per
    // round — 2^8 scans); rounds past the fixed point are no-ops, so the
    // unrolled chain equals Spark's early-stopped peel (the kmeans
    // early-stop argument).
    "q_kcore" -> {
      val base =
        """WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
          |nr AS (SELECT vec_id, label, v,
          |        sqrt(list_sum(list_transform(v, x -> x * x))) AS norm,
          |        CAST(v[1] > 0 AS INT) * 8 + CAST(v[2] > 0 AS INT) * 4 +
          |        CAST(v[3] > 0 AS INT) * 2 + CAST(v[4] > 0 AS INT) AS cell
          |      FROM e0),
          |pr AS MATERIALIZED (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
          |       FROM nr a JOIN nr b ON a.label = b.label AND a.cell = b.cell
          |         AND a.vec_id < b.vec_id
          |       WHERE round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 4)
          |         >= 0.15),
          |g0 AS MATERIALIZED (SELECT vec_a AS src, vec_b AS dst FROM pr
          |       UNION ALL SELECT vec_b, vec_a FROM pr)""".stripMargin
      val rounds = (1 to 8).map { i =>
        s"""k$i AS MATERIALIZED (SELECT src FROM g${i - 1} GROUP BY src
           |  HAVING count(*) >= 2),
           |g$i AS MATERIALIZED (SELECT e.src, e.dst FROM g${i - 1} e
           |  JOIN k$i a ON a.src = e.src JOIN k$i b ON b.src = e.dst)"""
          .stripMargin
      }.mkString(",\n")
      base + ",\n" + rounds +
        "\nSELECT src AS node, CAST(count(*) AS BIGINT) AS core_degree " +
        "FROM g8 GROUP BY 1 ORDER BY 1"
    },

    // Synchronous LPA, 4 unrolled rounds: per round, count neighbor
    // labels, keep the most frequent with ties toward the smallest —
    // the portable argmax (max-count join-back + min), no struct
    // ordering. MATERIALIZED per round (the kcore inlining lesson).
    "q_label_prop" -> {
      val base =
        """WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
          |nr AS (SELECT vec_id, label, v,
          |        sqrt(list_sum(list_transform(v, x -> x * x))) AS norm,
          |        CAST(v[1] > 0 AS INT) * 8 + CAST(v[2] > 0 AS INT) * 4 +
          |        CAST(v[3] > 0 AS INT) * 2 + CAST(v[4] > 0 AS INT) AS cell
          |      FROM e0),
          |pr AS MATERIALIZED (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
          |       FROM nr a JOIN nr b ON a.label = b.label AND a.cell = b.cell
          |         AND a.vec_id < b.vec_id
          |       WHERE round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 4)
          |         >= 0.15),
          |g0 AS MATERIALIZED (SELECT vec_a AS src, vec_b AS dst FROM pr
          |       UNION ALL SELECT vec_b, vec_a FROM pr),
          |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM g0)"""
          .stripMargin
      val rounds = (1 to 4).map { i =>
        s"""nc$i AS MATERIALIZED (SELECT e.dst, l.lbl, count(*) AS c
           |  FROM g0 e JOIN l${i - 1} l ON l.node = e.src GROUP BY 1, 2),
           |mx$i AS (SELECT dst, max(c) AS mc FROM nc$i GROUP BY 1),
           |l$i AS MATERIALIZED (SELECT nc.dst AS node, min(nc.lbl) AS lbl
           |  FROM nc$i nc JOIN mx$i m ON m.dst = nc.dst AND nc.c = m.mc
           |  GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      base + ",\n" + rounds +
        """
          |, sz AS (SELECT lbl, count(*) AS community_size FROM l4 GROUP BY 1)
          |SELECT l.node, l.lbl AS community, sz.community_size
          |FROM l4 l JOIN sz ON sz.lbl = l.lbl
          |ORDER BY l.node""".stripMargin
    },

    // DBSCAN: core = degree >= 3 on the eps-graph, clusters = min-label
    // CC over the core-core subgraph (8 unrolled MATERIALIZED rounds),
    // border attaches to its minimum core neighbor, noise = -1.
    "q_dbscan" -> {
      val base =
        """WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
          |nr AS (SELECT vec_id, label, v,
          |        sqrt(list_sum(list_transform(v, x -> x * x))) AS norm,
          |        CAST(v[1] > 0 AS INT) * 8 + CAST(v[2] > 0 AS INT) * 4 +
          |        CAST(v[3] > 0 AS INT) * 2 + CAST(v[4] > 0 AS INT) AS cell
          |      FROM e0),
          |pr AS MATERIALIZED (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
          |       FROM nr a JOIN nr b ON a.label = b.label AND a.cell = b.cell
          |         AND a.vec_id < b.vec_id
          |       WHERE round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 4)
          |         >= 0.15),
          |g0 AS MATERIALIZED (SELECT vec_a AS src, vec_b AS dst FROM pr
          |       UNION ALL SELECT vec_b, vec_a FROM pr),
          |deg AS (SELECT src AS node, count(*) AS d FROM g0 GROUP BY 1),
          |core AS MATERIALIZED (SELECT node FROM deg WHERE d >= 3),
          |gcc AS MATERIALIZED (SELECT e.src, e.dst FROM g0 e
          |       JOIN core a ON a.node = e.src JOIN core b ON b.node = e.dst),
          |l0 AS MATERIALIZED (SELECT node, node AS lbl FROM core)""".stripMargin
      val rounds = (1 to 8).map { i =>
        s"""l$i AS MATERIALIZED (SELECT node, min(lbl) AS lbl FROM (
           |  SELECT node, lbl FROM l${i - 1}
           |  UNION ALL SELECT e.dst AS node, l.lbl
           |  FROM gcc e JOIN l${i - 1} l ON l.node = e.src) GROUP BY 1)"""
          .stripMargin
      }.mkString(",\n")
      base + ",\n" + rounds +
        """
          |, border AS (SELECT e.src AS node, min(l.lbl) AS lbl
          |    FROM g0 e JOIN l8 l ON l.node = e.dst
          |    WHERE e.src NOT IN (SELECT node FROM core) GROUP BY 1),
          |noise AS (SELECT DISTINCT src AS node FROM g0
          |    WHERE src NOT IN (SELECT node FROM core)
          |      AND src NOT IN (SELECT node FROM border))
          |SELECT node AS vec_id, 'core' AS role, lbl AS cluster FROM l8
          |UNION ALL SELECT node, 'border', lbl FROM border
          |UNION ALL SELECT node, 'noise', CAST(-1 AS BIGINT) FROM noise
          |ORDER BY vec_id""".stripMargin
    },

    // Degree-oriented triangle counting: each triangle produced once at
    // its lowest-(deg, id) vertex; integer counts, single-division
    // clustering coefficient. Threshold 0.15, looser than the dup cut —
    // the density diagnostic needs a graph that closes wedges.
    "q_triangles" ->
      """WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |nr AS (SELECT vec_id, label, v,
        |        sqrt(list_sum(list_transform(v, x -> x * x))) AS norm,
        |        CAST(v[1] > 0 AS INT) * 8 + CAST(v[2] > 0 AS INT) * 4 +
        |        CAST(v[3] > 0 AS INT) * 2 + CAST(v[4] > 0 AS INT) AS cell
        |      FROM e0),
        |pr AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |       FROM nr a JOIN nr b ON a.label = b.label AND a.cell = b.cell
        |         AND a.vec_id < b.vec_id
        |       WHERE round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 4) >= 0.15),
        |e AS (SELECT vec_a AS src, vec_b AS dst FROM pr
        |      UNION ALL SELECT vec_b, vec_a FROM pr),
        |deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
        |o AS (SELECT CASE WHEN da.deg < db.deg
        |               OR (da.deg = db.deg AND pr.vec_a < pr.vec_b)
        |             THEN pr.vec_a ELSE pr.vec_b END AS u,
        |        CASE WHEN da.deg < db.deg
        |               OR (da.deg = db.deg AND pr.vec_a < pr.vec_b)
        |             THEN pr.vec_b ELSE pr.vec_a END AS v,
        |        CASE WHEN da.deg < db.deg
        |               OR (da.deg = db.deg AND pr.vec_a < pr.vec_b)
        |             THEN db.deg ELSE da.deg END AS dv
        |      FROM pr JOIN deg da ON da.node = pr.vec_a
        |              JOIN deg db ON db.node = pr.vec_b),
        |w AS (SELECT o1.u AS a, o1.v AS b, o2.v AS c
        |      FROM o o1 JOIN o o2 ON o1.u = o2.u
        |        AND (o1.dv < o2.dv OR (o1.dv = o2.dv AND o1.v < o2.v))),
        |t AS (SELECT w.a, w.b, w.c FROM w
        |      JOIN o ON o.u = w.b AND o.v = w.c),
        |x AS (SELECT a AS node FROM t UNION ALL SELECT b FROM t
        |      UNION ALL SELECT c FROM t),
        |pn AS (SELECT node, count(*) AS n_tri FROM x GROUP BY 1)
        |SELECT deg.node AS vec_id, deg.deg,
        |  coalesce(pn.n_tri, 0) AS n_tri,
        |  CASE WHEN deg.deg > 1 THEN
        |    round(2.0 * coalesce(pn.n_tri, 0) / (deg.deg * (deg.deg - 1)), 4)
        |  ELSE 0.0 END AS clustering
        |FROM deg LEFT JOIN pn ON pn.node = deg.node
        |ORDER BY vec_id""".stripMargin,

    // Deterministic epoch-shuffle order: epoch-keyed md5 shard + in-shard
    // hash order; gpos is the round-robin interleaved read position.
    "q_epoch_order" ->
      """WITH h AS (SELECT doc_id,
        |             md5('graft_epoch:1:' || CAST(doc_id AS VARCHAR)) AS h
        |           FROM documents),
        |s AS (SELECT doc_id, h,
        |        CAST(CAST('0x' || substr(h, 1, 8) AS BIGINT) % 8 AS INT) AS shard
        |      FROM h),
        |r AS (SELECT doc_id, shard,
        |        CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
        |          AS INT) AS pos
        |      FROM s)
        |SELECT doc_id, shard, pos,
        |  CAST(pos - 1 AS BIGINT) * 8 + shard AS gpos
        |FROM r ORDER BY shard, pos""".stripMargin,

    // Deequ-style constraint suite: every metric is exact SQL, so the
    // fused-aggregate engine path is graded against the naive form.
    // k-anonymity audit: equivalence classes on (lang, source, 64-char
    // length bucket), at_risk = size < 5, per-language at-risk doc share.
    "q_kanon" ->
      """WITH cls AS (SELECT lang, source, n_chars // 64 AS len_b,
        |               count(*) AS n_docs
        |             FROM documents GROUP BY 1, 2, 3),
        |c2 AS (SELECT lang, source, len_b, n_docs,
        |         CAST(n_docs < 5 AS INT) AS at_risk FROM cls),
        |pl AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS lang_docs,
        |         CAST(sum(CASE WHEN at_risk = 1 THEN n_docs ELSE 0 END)
        |           AS BIGINT) AS risk_docs
        |       FROM c2 GROUP BY 1)
        |SELECT c2.lang, c2.source, c2.len_b, c2.n_docs, c2.at_risk,
        |  round(pl.risk_docs::DOUBLE / pl.lang_docs, 4) AS lang_risk_share
        |FROM c2 JOIN pl ON pl.lang = c2.lang
        |ORDER BY c2.lang, c2.source, c2.len_b""".stripMargin,

    // Apriori pair-tier association rules over (user, day) event-type
    // baskets: singleton support cut first, pair counts from the keyed
    // basket self-join, confidence/lift joined back; both rule
    // directions emitted.
    "q_assoc_rules" ->
      """WITH b AS (SELECT DISTINCT user_id,
        |             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
        |             event_type AS item
        |           FROM events),
        |nb AS (SELECT count(*) AS n_baskets
        |       FROM (SELECT DISTINCT user_id, day FROM b)),
        |items AS (SELECT item, count(*) AS ci FROM b GROUP BY 1),
        |fi AS (SELECT item, ci FROM items, nb
        |       WHERE ci >= n_baskets * 0.05),
        |fb AS (SELECT b.* FROM b JOIN fi ON fi.item = b.item),
        |p0 AS (SELECT a.item AS ia, c.item AS ib, count(*) AS cp
        |      FROM fb a JOIN fb c ON a.user_id = c.user_id
        |        AND a.day = c.day AND a.item < c.item
        |      GROUP BY 1, 2),
        |p AS (SELECT ia, ib, cp FROM p0, nb
        |      WHERE cp >= n_baskets * 0.05),
        |d AS (SELECT ia AS antecedent, ib AS consequent, cp FROM p
        |      UNION ALL SELECT ib, ia, cp FROM p)
        |SELECT d.antecedent, d.consequent, d.cp AS n_pair,
        |  round(d.cp::DOUBLE / nb.n_baskets, 4) AS support,
        |  round(d.cp::DOUBLE / fa.ci, 4) AS confidence,
        |  round(d.cp::DOUBLE * nb.n_baskets / (fa.ci * fc.ci), 4) AS lift
        |FROM d
        |JOIN fi fa ON fa.item = d.antecedent
        |JOIN fi fc ON fc.item = d.consequent
        |CROSS JOIN nb
        |ORDER BY d.antecedent, d.consequent""".stripMargin,

    "q_dq_checks" ->
      """WITH o AS (SELECT count(*) AS n,
        |    sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS ck,
        |    count(DISTINCT o_orderkey) AS od,
        |    sum(CASE WHEN o_totalprice >= 0 THEN 1 ELSE 0 END) AS pok
        |  FROM orders),
        |l AS (SELECT count(*) AS n,
        |    sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END) AS fok,
        |    sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS qok
        |  FROM lineitem),
        |ri AS (SELECT count(*) AS orphans FROM orders
        |       WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
        |u AS (
        |  -- the verdict compares the UNROUNDED metric (raw); round() is
        |  -- display-only — same rule as the engine (review r11)
        |  SELECT 'completeness' AS "check", 'orders.o_custkey' AS "column",
        |    CAST(ck AS DOUBLE) / n AS raw, 1.0 AS threshold FROM o
        |  UNION ALL SELECT 'uniqueness', 'orders.o_orderkey',
        |    CAST(od AS DOUBLE) / n, 1.0 FROM o
        |  UNION ALL SELECT 'non_negative', 'orders.o_totalprice',
        |    CAST(pok AS DOUBLE) / n, 1.0 FROM o
        |  UNION ALL SELECT 'min_size', 'orders',
        |    CAST(n AS DOUBLE), 1.0 FROM o
        |  UNION ALL SELECT 'accepted_values', 'lineitem.l_returnflag',
        |    CAST(fok AS DOUBLE) / n, 1.0 FROM l
        |  UNION ALL SELECT 'in_range', 'lineitem.l_quantity',
        |    CAST(qok AS DOUBLE) / n, 1.0 FROM l
        |  UNION ALL SELECT 'referential_integrity', 'orders.o_custkey->customer',
        |    1.0 - CAST(orphans AS DOUBLE) / (SELECT n FROM o), 1.0
        |  FROM ri)
        |SELECT "check", "column", round(raw, 6) AS metric,
        |  CAST(threshold AS DOUBLE) AS threshold,
        |  raw >= threshold AS pass
        |FROM u ORDER BY "check", "column"""".stripMargin,

    // The stream-stream join graded as an ACTUAL checkpointed streaming
    // run (the q_dedup_stream promotion pattern): median-time batch split
    // means the watermark never drops a row, so streamed == batch join.
    "q_stream_join" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
        |           FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
        |      FROM events WHERE event_type = 'signup')
        |SELECT e.event_id AS p_id, s.event_id AS s_id, e.user_id,
        |  CAST(floor(epoch(e.ts)) AS BIGINT) AS p_sec,
        |  CAST(floor(epoch(s.ts)) AS BIGINT) AS s_sec,
        |  CAST(floor(epoch(e.ts)) - floor(epoch(s.ts)) AS BIGINT) AS lag_sec
        |FROM e JOIN s ON e.user_id = s.user_id
        |  AND e.ts >= s.ts AND e.ts <= s.ts + INTERVAL 1 HOUR
        |ORDER BY p_id, s_id""".stripMargin,

    // PSI drift between the two corpus halves: laplace-smoothed bucket
    // shares, one ln per bucket, per-feature sums.
    // Day-over-day PSI, p = previous day / q = current on a dense 10-bin
    // grid; integer counts in, one ln per bin out, 6-dp round + the
    // negative-zero guard on both sides.
    "q_drift_windowed" ->
      """WITH e AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
        |        CAST(greatest(least(floor(value / 50.0), 9), 0) AS BIGINT) AS bucket
        |      FROM events),
        |c AS (SELECT day, bucket, CAST(count(*) AS BIGINT) AS n
        |      FROM e GROUP BY 1, 2),
        |d AS (SELECT day, lag(day) OVER (ORDER BY day) AS prev
        |      FROM (SELECT DISTINCT day FROM e)),
        |g AS (SELECT day, prev, unnest(range(0, 10)) AS bucket
        |      FROM d WHERE prev IS NOT NULL),
        |j AS (SELECT g.day, g.bucket,
        |        coalesce(cc.n, 0) AS cn, coalesce(cp.n, 0) AS pn
        |      FROM g LEFT JOIN c cc ON cc.day = g.day AND cc.bucket = g.bucket
        |             LEFT JOIN c cp ON cp.day = g.prev AND cp.bucket = g.bucket),
        |t AS (SELECT day, CAST(sum(cn) AS BIGINT) AS nc,
        |        CAST(sum(pn) AS BIGINT) AS np FROM j GROUP BY 1),
        |x AS (SELECT j.day,
        |        (pn + 1) / CAST(np + 10 AS DOUBLE) AS p,
        |        (cn + 1) / CAST(nc + 10 AS DOUBLE) AS q,
        |        nc
        |      FROM j JOIN t USING (day))
        |SELECT day, CAST(max(nc) AS BIGINT) AS n_events,
        |  round(sum((p - q) * ln(p / q)), 6) + 0.0 AS psi
        |FROM x GROUP BY 1 ORDER BY day""".stripMargin,

    // Welch A/B: md5-derived arm, integer centi-unit moments (exact
    // BIGINT sums), t from UNROUNDED means, means rounded for output.
    "q_ab_test" ->
      """WITH e AS (SELECT event_type,
        |             CAST('0x' || substr(md5('graft_ab:' ||
        |               CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2 AS arm,
        |             CAST(floor(value * 100) AS BIGINT) AS vc
        |           FROM events),
        |a AS (SELECT event_type,
        |        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |        -- HUGEINT moments (r12 extremes fuzz): DuckDB's BIGINT
        |        -- multiply is CHECKED, so vc*vc must widen explicitly —
        |        -- the engine accumulates DECIMAL(38,0); both exact; these
        |        -- are intermediates, the outputs below are doubles
        |        sum(CASE WHEN arm = 0 THEN vc::HUGEINT ELSE 0 END) AS sa,
        |        sum(CASE WHEN arm = 1 THEN vc::HUGEINT ELSE 0 END) AS sb,
        |        sum(CASE WHEN arm = 0 THEN vc::HUGEINT * vc ELSE 0 END) AS qa,
        |        sum(CASE WHEN arm = 1 THEN vc::HUGEINT * vc ELSE 0 END) AS qb
        |      FROM e GROUP BY 1),
        |m AS (SELECT event_type, na, nb,
        |        sa::DOUBLE / NULLIF(na, 0) / 100.0 AS mean_a,
        |        sb::DOUBLE / NULLIF(nb, 0) / 100.0 AS mean_b,
        |        (qa::DOUBLE - sa::DOUBLE * sa / NULLIF(na, 0))
        |          / NULLIF(na - 1, 0) / 10000.0 AS var_a,
        |        (qb::DOUBLE - sb::DOUBLE * sb / NULLIF(nb, 0))
        |          / NULLIF(nb - 1, 0) / 10000.0 AS var_b
        |      FROM a),
        |s AS (SELECT *, var_a / na + var_b / nb AS se2 FROM m)
        |SELECT event_type, na, nb,
        |  round(mean_a, 4) AS mean_a, round(mean_b, 4) AS mean_b,
        |  round((mean_a - mean_b) / sqrt(se2), 4) + 0.0 AS t_stat,
        |  round(se2 * se2 /
        |    (var_a * var_a / (na * na) / (na - 1) +
        |     var_b * var_b / (nb * nb) / (nb - 1)), 4) AS welch_df
        |FROM s ORDER BY event_type""".stripMargin,

    // Benford screen: first digit from the exact integer centi-unit
    // string head (no float log10 boundary), chi2 carried on every row.
    "q_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(floor(abs(value) * 100) AS BIGINT)
        |             AS VARCHAR), 1, 1) AS INT) AS digit
        |           FROM events),
        |o0 AS (SELECT digit, count(*) AS n_obs FROM d WHERE digit >= 1
        |      GROUP BY 1),
        |o AS (SELECT CAST(r.range AS INT) AS digit,
        |        CAST(coalesce(o0.n_obs, 0) AS BIGINT) AS n_obs
        |      FROM range(1, 10) r LEFT JOIN o0 ON o0.digit = r.range),
        |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM o),
        |w AS (SELECT o.digit, o.n_obs, t.n,
        |        ln(1.0 + 1.0 / o.digit) / ln(10.0) AS p_benford
        |      FROM o CROSS JOIN t),
        |x AS (SELECT *, (n_obs - p_benford * n) * (n_obs - p_benford * n)
        |        / (p_benford * NULLIF(n, 0)) AS chi_term FROM w),
        |c AS (SELECT round(sum(chi_term), 4) AS chi2 FROM x)
        |SELECT x.digit, x.n_obs,
        |  round(x.n_obs::DOUBLE / NULLIF(x.n, 0), 4) AS share,
        |  round(x.p_benford, 4) AS p_benford, c.chi2
        |FROM x CROSS JOIN c ORDER BY x.digit""".stripMargin,

    "q_drift" ->
      """WITH mm AS (SELECT (min(doc_id) + max(doc_id)) // 2 AS mid FROM documents),
        |fb AS (SELECT CASE WHEN doc_id <= mid THEN 'b' ELSE 'c' END AS side,
        |         unnest(['len:' || CAST(least(CAST(floor(
        |                    len(string_split(text, ' ')) / 10) AS BIGINT),
        |                  19) AS VARCHAR),
        |                 'lang:' || lang, 'src:' || source]) AS fb
        |       FROM documents, mm),
        |ct AS (SELECT string_split(fb, ':')[1] AS feature, fb AS bucket,
        |         sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS cb,
        |         sum(CASE WHEN side = 'c' THEN 1 ELSE 0 END) AS cc
        |       FROM fb GROUP BY 1, 2),
        |st AS (SELECT feature, count(*) AS nbkt, sum(cb) AS nb, sum(cc) AS nc
        |       FROM ct GROUP BY 1),
        |t AS (SELECT ct.feature, st.nbkt,
        |        CAST(cb + 1 AS DOUBLE) / (nb + nbkt) AS p,
        |        CAST(cc + 1 AS DOUBLE) / (nc + nbkt) AS q
        |      FROM ct JOIN st USING (feature))
        |SELECT feature, CAST(nbkt AS INT) AS n_buckets,
        |  round(sum((p - q) * ln(p / q)), 4) + 0.0 AS psi,
        |  round(sum((p - q) * ln(p / q)), 4) >= 0.1 AS drifted
        |FROM t GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // IVF probe-cut bitext mining: q_ann_ivf's deterministic coarse
    // quantizer as the candidate generator, q_bitext_mine's micro-unit
    // margin machinery over the candidate table.
    "q_bitext_mine_ivf" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, label, v,
        |        sqrt(list_sum(list_transform(v, z -> z * z))) AS norm FROM e),
        |sd AS (SELECT vec_id AS seed_id, v AS sv, norm AS snorm FROM n
        |       WHERE vec_id < 8),
        |asn AS (SELECT vec_id, v, norm, seed_id AS cell FROM (
        |          SELECT c.vec_id, c.v, c.norm, sd.seed_id,
        |            row_number() OVER (PARTITION BY c.vec_id
        |              ORDER BY list_dot_product(c.v, sd.sv) / (c.norm * sd.snorm) DESC,
        |                       sd.seed_id) AS r
        |          FROM n c CROSS JOIN sd WHERE c.label = 1) WHERE r = 1),
        |pr AS (SELECT vec_id, v, norm, seed_id AS cell FROM (
        |          SELECT q.vec_id, q.v, q.norm, sd.seed_id,
        |            row_number() OVER (PARTITION BY q.vec_id
        |              ORDER BY list_dot_product(q.v, sd.sv) / (q.norm * sd.snorm) DESC,
        |                       sd.seed_id) AS r
        |          FROM n q CROSS JOIN sd WHERE q.label = 0) WHERE r <= 4),
        |s AS (SELECT pr.vec_id AS src_id, c.vec_id AS tgt_id,
        |        CAST(round(list_dot_product(pr.v, c.v) / (pr.norm * c.norm)
        |          * 10000) AS BIGINT) AS cm
        |      FROM pr JOIN asn c ON pr.cell = c.cell),
        |sx AS (SELECT src_id, sum(cm) AS sx FROM (
        |        SELECT src_id, cm, row_number() OVER
        |          (PARTITION BY src_id ORDER BY cm DESC, tgt_id) AS r FROM s) z
        |       WHERE r <= 4 GROUP BY 1),
        |sy AS (SELECT tgt_id, sum(cm) AS sy FROM (
        |        SELECT tgt_id, cm, row_number() OVER
        |          (PARTITION BY tgt_id ORDER BY cm DESC, src_id) AS r FROM s) z
        |       WHERE r <= 4 GROUP BY 1),
        |m AS (SELECT s.src_id, s.tgt_id, cm, (cm * 80000) // (sx + sy) AS mm
        |      FROM s JOIN sx USING (src_id) JOIN sy USING (tgt_id)
        |      WHERE cm > 0 AND sx + sy > 0),
        |sel AS (SELECT *, row_number() OVER
        |          (PARTITION BY src_id ORDER BY mm DESC, tgt_id) AS r FROM m)
        |SELECT src_id, tgt_id, round(cm / 10000.0, 4) AS cosine,
        |  round(mm / 10000.0, 4) AS margin
        |FROM sel WHERE r = 1 AND mm >= 10000 ORDER BY src_id""".stripMargin,

    // Margin-based bitext mining in integer micro-units: per-source argmax
    // of cos/(neighborhood avg), kept when margin >= 1.0.
    "q_bitext_mine" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, label, v,
        |        sqrt(list_sum(list_transform(v, z -> z * z))) AS norm FROM e),
        |x AS (SELECT * FROM n WHERE label = 0),
        |y AS (SELECT * FROM n WHERE label = 1),
        |s AS (SELECT x.vec_id AS src_id, y.vec_id AS tgt_id,
        |        CAST(round(list_dot_product(x.v, y.v) / (x.norm * y.norm)
        |          * 10000) AS BIGINT) AS cm
        |      FROM x, y),
        |sx AS (SELECT src_id, sum(cm) AS sx FROM (
        |        SELECT src_id, cm, row_number() OVER
        |          (PARTITION BY src_id ORDER BY cm DESC, tgt_id) AS r FROM s) z
        |       WHERE r <= 4 GROUP BY 1),
        |sy AS (SELECT tgt_id, sum(cm) AS sy FROM (
        |        SELECT tgt_id, cm, row_number() OVER
        |          (PARTITION BY tgt_id ORDER BY cm DESC, src_id) AS r FROM s) z
        |       WHERE r <= 4 GROUP BY 1),
        |m AS (SELECT s.src_id, s.tgt_id, cm, (cm * 80000) // (sx + sy) AS mm
        |      FROM s JOIN sx USING (src_id) JOIN sy USING (tgt_id)
        |      WHERE cm > 0 AND sx + sy > 0),
        |sel AS (SELECT *, row_number() OVER
        |          (PARTITION BY src_id ORDER BY mm DESC, tgt_id) AS r FROM m)
        |SELECT src_id, tgt_id, round(cm / 10000.0, 4) AS cosine,
        |  round(mm / 10000.0, 4) AS margin
        |FROM sel WHERE r = 1 AND mm >= 10000 ORDER BY src_id""".stripMargin,

    // WordPiece greedy longest-match-first segmentation, replayed as a
    // carried-position recursive CTE over the distinct-word table; the
    // vocabulary is the top-64 piece-frequency head WITHOUT the all-chars
    // union, so the [UNK] branch is exercised for real.
    "q_wordpiece_encode" ->
      """WITH RECURSIVE
        |t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |tc AS (SELECT tok, count(*) AS c FROM t WHERE len(tok) > 0 GROUP BY 1),
        |p AS (SELECT unnest(flatten(list_transform(range(1, len(tok) + 1),
        |        i -> list_transform(range(i, least(i + 3, len(tok)) + 1),
        |          j -> substr(tok, i, j - i + 1))))) AS piece, c
        |      FROM tc),
        |f AS (SELECT piece FROM (SELECT piece, CAST(sum(c) AS BIGINT) AS freq
        |                         FROM p GROUP BY 1)
        |      ORDER BY freq DESC, piece LIMIT 64),
        |g AS (
        |  SELECT tok, c, 1 AS pos, 0 AS np, 0 AS nu FROM tc
        |  UNION ALL
        |  SELECT g.tok, g.c,
        |    g.pos + greatest(CASE WHEN v4.piece IS NOT NULL THEN 4
        |      WHEN v3.piece IS NOT NULL THEN 3
        |      WHEN v2.piece IS NOT NULL THEN 2
        |      WHEN v1.piece IS NOT NULL THEN 1 ELSE 0 END, 1),
        |    g.np + 1,
        |    g.nu + CASE WHEN v1.piece IS NULL AND v2.piece IS NULL
        |      AND v3.piece IS NULL AND v4.piece IS NULL THEN 1 ELSE 0 END
        |  FROM g
        |  LEFT JOIN f v1 ON v1.piece = substr(g.tok, g.pos, 1)
        |  LEFT JOIN f v2 ON g.pos + 1 <= len(g.tok)
        |    AND v2.piece = substr(g.tok, g.pos, 2)
        |  LEFT JOIN f v3 ON g.pos + 2 <= len(g.tok)
        |    AND v3.piece = substr(g.tok, g.pos, 3)
        |  LEFT JOIN f v4 ON g.pos + 3 <= len(g.tok)
        |    AND v4.piece = substr(g.tok, g.pos, 4)
        |  WHERE g.pos <= len(g.tok))
        |SELECT tok, CAST(c AS BIGINT) AS n_occ, CAST(len(tok) AS INT) AS n_chars,
        |  CAST(np AS INT) AS n_pieces, CAST(nu AS INT) AS n_unk
        |FROM g WHERE pos = len(tok) + 1 ORDER BY tok""".stripMargin,

    // Exact heavy hitters (Misra-Gries candidates + exact recount): the
    // sketch only affects WHICH tokens get recounted, never the answer,
    // so the oracle is the plain exact form.
    "q_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT tok, count(*) AS cnt FROM t WHERE len(tok) > 0 GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS n FROM c)
        |SELECT tok, cnt, round(CAST(cnt AS DOUBLE) / n, 6) AS share
        |FROM c, tot WHERE cnt >= ceil(0.01 * n)
        |ORDER BY cnt DESC, tok""".stripMargin,

    // A-ES weighted sampling without replacement: key = -ln(u)/w with a
    // 48-bit md5-derived uniform and w = token count; sample = k smallest.
    "q_weighted_sample" ->
      """WITH d AS (SELECT doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents WHERE text IS NOT NULL),
        |k AS (SELECT doc_id, n_tok,
        |        -ln((CAST('0x' || substr(md5('graft_wsample:' ||
        |              CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) + 0.5)
        |            / 281474976710656.0) / n_tok AS key
        |      FROM d),
        |r AS (SELECT *, row_number() OVER (ORDER BY key, doc_id) AS rank FROM k)
        |SELECT CAST(rank AS INT) AS rank, doc_id, n_tok, round(key, 6) AS key
        |FROM r WHERE rank <= 48 ORDER BY rank""".stripMargin,

    // Histogram-ECDF quantile normalization: width-16 token-count buckets,
    // cumulative window over the bounded (lang, bucket) histogram only,
    // midpoint ECDF (2*cum_below + cnt) / (2*n_lang) joined back by bucket.
    "q_quantile_norm" ->
      """WITH d AS (SELECT doc_id, lang,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents),
        |db AS (SELECT doc_id, lang, n_tok, n_tok // 16 AS b FROM d
        |      WHERE n_tok IS NOT NULL),
        |hist AS (SELECT lang, b, count(*) AS c FROM db GROUP BY 1, 2),
        |nl AS (SELECT lang, count(*) AS n_lang FROM db GROUP BY 1),
        |ecdf AS (SELECT lang, b,
        |           coalesce(sum(c) OVER (PARTITION BY lang ORDER BY b
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |             AS cb, c
        |         FROM hist)
        |SELECT db.doc_id, db.lang, db.n_tok,
        |  round((2 * ecdf.cb + ecdf.c)::DOUBLE / (2 * nl.n_lang), 4) AS pct
        |FROM db
        |JOIN ecdf ON ecdf.lang = db.lang AND ecdf.b = db.b
        |JOIN nl ON nl.lang = db.lang
        |ORDER BY db.doc_id""".stripMargin,

    "q_corpus_sample" ->
      """WITH h AS (SELECT doc_id, lang, source,
        |             md5('graft_sample:' || CAST(doc_id AS VARCHAR)) AS h
        |           FROM documents),
        |r AS (SELECT *, row_number() OVER (ORDER BY h, doc_id) AS rank FROM h)
        |SELECT CAST(rank AS INT) AS rank, doc_id, lang, source
        |FROM r WHERE rank <= 64 ORDER BY rank""".stripMargin,

    // Per-source quota: cap = greatest(minCap=10, ceil(0.03 * corpus)),
    // survivors are each source's cap-prefix in graft_cap md5 order.
    "q_source_cap" ->
      """WITH d AS (SELECT doc_id, source,
        |             md5('graft_cap:' || CAST(doc_id AS VARCHAR)) AS h
        |           FROM documents),
        |c AS (SELECT source, count(*) AS n_docs FROM d GROUP BY 1),
        |t AS (SELECT sum(n_docs) AS total FROM c),
        |cap AS (SELECT source, n_docs,
        |          greatest(10, CAST(ceil(total * 0.03) AS BIGINT)) AS cap
        |        FROM c, t),
        |r AS (SELECT doc_id, source,
        |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
        |          AS rank FROM d)
        |SELECT r.source, CAST(r.rank AS INT) AS rank, r.doc_id,
        |  cap.n_docs, cap.cap
        |FROM r JOIN cap USING (source)
        |WHERE r.rank <= cap.cap ORDER BY r.source, r.rank""".stripMargin,

    // Token-budget selection: greedy quality-ordered prefix under a 15k
    // token budget; the oracle is the single-window form the histogram
    // refinement is spec-proven equal to.
    "q_token_budget" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |           WHERE text IS NOT NULL),
        |s AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,
        |        round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 4)
        |          AS score
        |      FROM d),
        |c AS (SELECT *, sum(n_tok) OVER (ORDER BY score DESC, doc_id) AS cum
        |      FROM s)
        |SELECT doc_id, n_tok, score, cum <= 15000 AS kept
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_vocab" ->
      """WITH e AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |f AS (SELECT tok, count(*) AS tf FROM e GROUP BY 1),
        |tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS tot FROM f),
        |r AS (SELECT tok, tf, row_number() OVER (ORDER BY tf DESC, tok) AS rank FROM f)
        |SELECT rank, tok, tf, round(tf / tot.tot, 4) AS share,
        |  round(CAST(sum(tf) OVER (ORDER BY rank) AS DOUBLE) / tot.tot, 4) AS cum_share
        |FROM r, tot WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // PQ-ADC with deterministic seed codebooks; distances are integer
    // micro-units so the ADC sum is order-independent (exact oracle).
    "q_ann_pq" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |sub AS (SELECT vec_id, s, v[s * 8 + 1 : s * 8 + 8] AS sv,
        |          list_dot_product(v[s * 8 + 1 : s * 8 + 8],
        |            v[s * 8 + 1 : s * 8 + 8]) AS nn
        |        FROM e, (SELECT unnest(range(0, 8)) AS s)),
        |cb AS (SELECT vec_id AS j, s, sv AS cv, nn AS cnn FROM sub WHERE vec_id < 16),
        |enc AS (SELECT c.vec_id, c.s, cb.j,
        |          c.nn + cb.cnn - 2 * list_dot_product(c.sv, cb.cv) AS dist
        |        FROM sub c JOIN cb ON c.s = cb.s),
        |codes AS (SELECT vec_id, s, j AS code FROM
        |          (SELECT *, row_number() OVER (PARTITION BY vec_id, s
        |             ORDER BY dist, j) AS rn FROM enc) WHERE rn = 1),
        |dt AS (SELECT q.vec_id AS q_id, cb.s, cb.j,
        |         CAST(round((q.nn + cb.cnn - 2 * list_dot_product(q.sv, cb.cv)) * 1e6)
        |           AS BIGINT) AS di
        |       FROM sub q JOIN cb ON q.s = cb.s WHERE q.vec_id < 10),
        |adc AS (SELECT dt.q_id, codes.vec_id AS n_id,
        |          CAST(sum(dt.di) AS BIGINT) AS adist_micro
        |        FROM codes JOIN dt ON codes.s = dt.s AND codes.code = dt.j
        |        WHERE dt.q_id <> codes.vec_id GROUP BY 1, 2),
        |r AS (SELECT q_id, n_id, adist_micro,
        |        row_number() OVER (PARTITION BY q_id
        |          ORDER BY adist_micro, n_id) AS rank FROM adc)
        |SELECT q_id, rank, n_id, adist_micro
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // IVF-PQ composite (FAISS IVFADC): the q_ann_ivf probe cut feeding the
    // q_ann_pq integer micro-unit ADC — candidates restricted to each
    // query's probed cells, ranked by code distance.
    "q_ann_ivfpq" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |sd AS (SELECT vec_id AS seed_id, v AS sv, norm AS snorm FROM n WHERE vec_id < 8),
        |asn AS (SELECT vec_id, seed_id AS cell FROM (
        |          SELECT c.vec_id, sd.seed_id,
        |            row_number() OVER (PARTITION BY c.vec_id
        |              ORDER BY list_dot_product(c.v, sd.sv) / (c.norm * sd.snorm) DESC,
        |                       sd.seed_id) AS r
        |          FROM n c CROSS JOIN sd) WHERE r = 1),
        |pr AS (SELECT vec_id, seed_id AS cell FROM (
        |          SELECT q.vec_id, sd.seed_id,
        |            row_number() OVER (PARTITION BY q.vec_id
        |              ORDER BY list_dot_product(q.v, sd.sv) / (q.norm * sd.snorm) DESC,
        |                       sd.seed_id) AS r
        |          FROM n q CROSS JOIN sd WHERE q.vec_id < 10) WHERE r <= 2),
        |cand AS (SELECT pr.vec_id AS q_id, c.vec_id AS n_id
        |         FROM pr JOIN asn c ON pr.cell = c.cell AND c.vec_id <> pr.vec_id),
        |sub AS (SELECT vec_id, s, v[s * 8 + 1 : s * 8 + 8] AS sv,
        |          list_dot_product(v[s * 8 + 1 : s * 8 + 8],
        |            v[s * 8 + 1 : s * 8 + 8]) AS nn
        |        FROM e, (SELECT unnest(range(0, 8)) AS s)),
        |cb AS (SELECT vec_id AS j, s, sv AS cv, nn AS cnn FROM sub WHERE vec_id < 16),
        |enc AS (SELECT c.vec_id, c.s, cb.j,
        |          c.nn + cb.cnn - 2 * list_dot_product(c.sv, cb.cv) AS dist
        |        FROM sub c JOIN cb ON c.s = cb.s),
        |codes AS (SELECT vec_id, s, j AS code FROM
        |          (SELECT *, row_number() OVER (PARTITION BY vec_id, s
        |             ORDER BY dist, j) AS rn FROM enc) WHERE rn = 1),
        |dt AS (SELECT q.vec_id AS q_id, cb.s, cb.j,
        |         CAST(round((q.nn + cb.cnn - 2 * list_dot_product(q.sv, cb.cv)) * 1e6)
        |           AS BIGINT) AS di
        |       FROM sub q JOIN cb ON q.s = cb.s WHERE q.vec_id < 10),
        |adc AS (SELECT cand.q_id, cand.n_id, CAST(sum(dt.di) AS BIGINT) AS adist_micro
        |        FROM cand JOIN codes ON codes.vec_id = cand.n_id
        |          JOIN dt ON dt.q_id = cand.q_id AND codes.s = dt.s
        |            AND codes.code = dt.j
        |        GROUP BY 1, 2),
        |r AS (SELECT q_id, n_id, adist_micro,
        |        row_number() OVER (PARTITION BY q_id
        |          ORDER BY adist_micro, n_id) AS rank FROM adc)
        |SELECT q_id, CAST(rank AS INT) AS rank, n_id, adist_micro
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // JL projection: md5-hex-digit-parity sign matrix, sequential-fold
    // dot so doubles match bit-for-bit before the 4-dp round.
    "q_jl_project" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings WHERE embedding IS NOT NULL),
        |mr AS (SELECT r, list_transform(range(0, 64), d ->
        |         CASE WHEN CAST('0x' || substr(
        |             md5('graft_jl:' || r || ':' || d), 1, 1) AS BIGINT) % 2 = 0
        |           THEN 1.0 ELSE -1.0 END) AS srow
        |       FROM (SELECT unnest(range(0, 16)) AS r)),
        |p AS (SELECT e.vec_id, mr.r,
        |        round(list_sum(list_transform(range(1, 65),
        |          d -> mr.srow[d] * e.v[d])) / sqrt(16.0), 4) + 0.0 AS value
        |      FROM e, mr)
        |SELECT vec_id, CAST(r AS INT) AS r, value
        |FROM p ORDER BY vec_id, r""".stripMargin,

    "q_retention" ->
      """WITH c AS (SELECT user_id,
        |        min(CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT)) AS cohort_week
        |      FROM events WHERE event_type = 'signup' GROUP BY 1),
        |a AS (SELECT e.user_id, c.cohort_week,
        |        CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) - c.cohort_week
        |          AS week_offset
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) >= c.cohort_week)
        |SELECT cohort_week, week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
        |FROM a GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

    // Thresholds from ROUNDED moments: exact decimals both engines agree
    // on (raw float mean/stddev differ in the last ulp across engines).
    "q_outliers" ->
      """WITH s AS (SELECT event_type, count(*) AS n,
        |        round(avg(value), 2) AS mu, round(stddev_samp(value), 2) AS sd
        |      FROM events GROUP BY 1)
        |SELECT e.event_type, max(s.n) AS n, max(s.mu) AS mu, max(s.sd) AS sd,
        |  CAST(count_if(e.value < s.mu - 3 * s.sd OR e.value > s.mu + 3 * s.sd)
        |    AS BIGINT) AS n_outliers
        |FROM events e JOIN s ON e.event_type = s.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_knn_graph" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, label, v,
        |        sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |s AS (SELECT q.vec_id AS src_id, c.vec_id AS n_id,
        |        list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
        |      FROM n q JOIN n c ON c.label = q.label AND c.vec_id <> q.vec_id),
        |r AS (SELECT src_id, n_id, cos,
        |        row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, n_id)
        |          AS rank
        |      FROM s)
        |SELECT src_id, rank, n_id, round(cos, 4) AS cosine
        |FROM r WHERE rank <= 3 ORDER BY src_id, rank""".stripMargin,

    // Hubness: k-occurrence over the same label-blocked kNN ranking as
    // q_knn_graph; antihubs (0 occurrences) kept by the left join.
    "q_hubness" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, label, v,
        |        sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |s AS (SELECT q.vec_id AS src_id, c.vec_id AS n_id,
        |        list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
        |      FROM n q JOIN n c ON c.label = q.label AND c.vec_id <> q.vec_id),
        |r AS (SELECT src_id, n_id,
        |        row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, n_id)
        |          AS rank
        |      FROM s),
        |occ AS (SELECT n_id AS vec_id, CAST(count(*) AS BIGINT) AS k_occ
        |        FROM r WHERE rank <= 3 GROUP BY 1)
        |SELECT e.vec_id, coalesce(occ.k_occ, 0) AS k_occ,
        |  CAST(coalesce(occ.k_occ, 0) >= 6 AS INT) AS is_hub
        |FROM e LEFT JOIN occ ON occ.vec_id = e.vec_id
        |ORDER BY e.vec_id""".stripMargin,

    // Ordered 3-step funnel: earliest qualifying anchor per step, integer
    // epoch-microsecond comparisons, conversion vs the step-1 base.
    "q_funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type,
        |             CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.us) AS t2 FROM e
        |       JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.us > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.us) AS t3 FROM e
        |       JOIN s2 ON s2.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.us > s2.t2 GROUP BY 1),
        |st AS (SELECT '1_signup' AS step, CAST(count(*) AS BIGINT) AS n
        |       FROM s1
        |       UNION ALL SELECT '2_click_after', count(*) FROM s2
        |       UNION ALL SELECT '3_purchase_after', count(*) FROM s3),
        |b AS (SELECT CAST(count(*) AS BIGINT) AS base FROM s1)
        |SELECT st.step, st.n AS n_users,
        |  round(st.n::DOUBLE / b.base, 4) AS conv_rate
        |FROM st CROSS JOIN b ORDER BY st.step""".stripMargin,

    // The identical range-scale + bit-interleave arithmetic as
    // graft.ops.Layout.{scaledDims,zvalue}, the interleave rendered by the
    // shared zvalueSql generator so the two cannot drift. Integer `//`
    // division mirrors Spark's `div` exactly.
    "q_zorder" ->
      s"""WITH o AS (SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS x,
         |        CAST(date_diff('day', DATE '1992-01-01', o_orderdate::DATE)
         |          AS BIGINT) AS y
         |      FROM orders),
         |st AS (SELECT max(x) AS mx, max(y) AS my FROM o),
         |sc AS (SELECT o_orderkey, (x * 65536) // (mx + 1) AS xs,
         |         (y * 65536) // (my + 1) AS ys FROM o CROSS JOIN st),
         |z AS (SELECT o_orderkey, ${graft.ops.Layout.zvalueSql("xs", "ys")} AS zval
         |      FROM sc)
         |SELECT o_orderkey, zval, CAST(zval >> 26 AS INT) AS zshard
         |FROM z ORDER BY o_orderkey""".stripMargin,

    // Code-vs-prose screen: translate-difference char-class densities,
    // integer is_code = sym_n*50 >= n_chars.
    "q_code_detect" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(length(text) - length(translate(text, '{}();=<>[]', ''))
        |    AS BIGINT) AS sym_n,
        |  CAST(length(text) - length(translate(text, '0123456789', ''))
        |    AS BIGINT) AS digit_n,
        |  CASE WHEN length(text) > 0 THEN
        |    round((length(text) - length(translate(text, '{}();=<>[]', '')))
        |      ::DOUBLE / length(text), 4) ELSE 0.0 END AS sym_share,
        |  CASE WHEN length(text) > 0 THEN
        |    round((length(text) - length(translate(text, '0123456789', '')))
        |      ::DOUBLE / length(text), 4) ELSE 0.0 END AS digit_share,
        |  CAST((length(text) - length(translate(text, '{}();=<>[]', ''))) * 50
        |    >= length(text) AND length(text) > 0 AS INT) AS is_code
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Cross-source duplication matrix: deduped (prefix-64 md5, source)
    // table, digest-keyed pair join, overlap vs the smaller source.
    "q_source_overlap" ->
      """WITH dg AS (SELECT DISTINCT md5(substr(lower(text), 1, 64)) AS d,
        |              source
        |            FROM documents),
        |tot AS (SELECT source, count(*) AS n FROM dg GROUP BY 1),
        |sh AS (SELECT a.source AS source_a, b.source AS source_b,
        |         count(*) AS n_shared
        |       FROM dg a JOIN dg b ON a.d = b.d AND a.source < b.source
        |       GROUP BY 1, 2)
        |SELECT sh.source_a, sh.source_b, sh.n_shared,
        |  round(sh.n_shared::DOUBLE / least(ta.n, tb.n), 4) AS overlap
        |FROM sh JOIN tot ta ON ta.source = sh.source_a
        |JOIN tot tb ON tb.source = sh.source_b
        |ORDER BY sh.source_a, sh.source_b""".stripMargin,

    // Zone-map pruning eval: the q_zone_map manifest CTE + 16 stripe
    // probes (first quarter of each stripe); a shard is pruned when its
    // custkey range misses the probe entirely.
    "q_prune_rate" ->
      s"""WITH o AS (SELECT CAST(o_custkey AS BIGINT) AS x,
         |        CAST(date_diff('day', DATE '1992-01-01', o_orderdate::DATE)
         |          AS BIGINT) AS y
         |      FROM orders),
         |st AS (SELECT max(x) AS mx0, max(y) AS my FROM o),
         |sc AS (SELECT x, y, (x * 65536) // (mx0 + 1) AS xs,
         |         (y * 65536) // (my + 1) AS ys FROM o CROSS JOIN st),
         |z AS (SELECT x, y, ${graft.ops.Layout.zvalueSql("xs", "ys")} AS zval
         |      FROM sc),
         |zm AS (SELECT CAST(zval >> 26 AS INT) AS zshard,
         |         min(x) AS min_custkey, max(x) AS max_custkey
         |       FROM z GROUP BY 1),
         |mx AS (SELECT max(max_custkey) AS mx FROM zm),
         |pb AS (SELECT CAST(r.range AS BIGINT) AS probe_id,
         |         r.range * ((mx + 1) // 16) AS lo,
         |         r.range * ((mx + 1) // 16) + ((mx + 1) // 16) // 4 AS hi
         |       FROM range(0, 16) r CROSS JOIN mx)
         |SELECT pb.probe_id, pb.lo, pb.hi,
         |  CAST(count(*) AS BIGINT) AS n_shards,
         |  CAST(sum(CASE WHEN zm.max_custkey < pb.lo
         |    OR zm.min_custkey > pb.hi THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pruned,
         |  round(sum(CASE WHEN zm.max_custkey < pb.lo
         |    OR zm.min_custkey > pb.hi THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*), 4) AS prune_rate
         |FROM pb CROSS JOIN zm GROUP BY 1, 2, 3
         |ORDER BY probe_id""".stripMargin,

    "q_zone_map" ->
      s"""WITH o AS (SELECT CAST(o_custkey AS BIGINT) AS x,
         |        CAST(date_diff('day', DATE '1992-01-01', o_orderdate::DATE)
         |          AS BIGINT) AS y
         |      FROM orders),
         |st AS (SELECT max(x) AS mx, max(y) AS my FROM o),
         |sc AS (SELECT x, y, (x * 65536) // (mx + 1) AS xs,
         |         (y * 65536) // (my + 1) AS ys FROM o CROSS JOIN st),
         |z AS (SELECT x, y, ${graft.ops.Layout.zvalueSql("xs", "ys")} AS zval
         |      FROM sc)
         |SELECT CAST(zval >> 26 AS INT) AS zshard,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  min(x) AS min_custkey, max(x) AS max_custkey,
         |  min(y) AS min_day, max(y) AS max_day
         |FROM z GROUP BY 1 ORDER BY zshard""".stripMargin,

    "q_corr_matrix" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
        yield (cols(i), cols(j))
      pairs.map { case (a, b) =>
        s"SELECT '$a' AS col_a, '$b' AS col_b, round(corr($a, $b), 6) AS pearson_r FROM lineitem"
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
    },

    "q_skew_report" ->
      """WITH c AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
        |      FROM orders GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |        CAST(sum(n) AS BIGINT) AS n_rows, max(n) AS max_mult,
        |        round(avg(n), 4) AS mean_mult FROM c),
        |h AS (SELECT o_custkey, n,
        |        CAST(row_number() OVER (ORDER BY n DESC, o_custkey) AS INT)
        |          AS rank
        |      FROM c ORDER BY n DESC, o_custkey LIMIT 5)
        |SELECT h.rank, h.o_custkey AS hot_key, h.n AS hot_n,
        |  s.n_keys, s.n_rows, s.max_mult, s.mean_mult,
        |  round(CAST(s.max_mult AS DOUBLE) / s.mean_mult, 4) AS skew_ratio,
        |  round(CAST(h.n AS DOUBLE) / s.n_rows, 6) AS hot_share,
        |  CAST(ceil(CAST(s.max_mult AS DOUBLE) / s.mean_mult) AS INT)
        |    AS salt_factor
        |FROM h CROSS JOIN s ORDER BY rank""".stripMargin,

    "q_compaction_plan" ->
      """WITH d AS (SELECT doc_id % 64 AS shard,
        |        CAST(length(text) AS BIGINT) AS b FROM documents),
        |s AS (SELECT shard, CAST(sum(b) AS BIGINT) AS bytes
        |      FROM d GROUP BY 1),
        |p AS (SELECT shard, bytes,
        |        CAST(coalesce(sum(bytes) OVER (ORDER BY shard
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS prefix
        |      FROM s)
        |SELECT shard, bytes, prefix // 32768 AS bin
        |FROM p ORDER BY shard""".stripMargin,

    // The applied compaction's audit must equal the rewrite's binning
    // re-run in pure SQL: the Spark side reads the POST-rewrite files, so
    // a mis-executed bin (split, merged, or dropped rows) hash-mismatches.
    // Row bin = shard prefix-bin + within-shard offset bin (the oversized-
    // shard split term; 0 for every shard that fits the target).
    "q_compaction_apply" ->
      """WITH d AS (SELECT doc_id % 64 AS shard, doc_id,
        |        CAST(length(text) AS BIGINT) AS b FROM documents),
        |s AS (SELECT shard, CAST(sum(b) AS BIGINT) AS bytes
        |      FROM d GROUP BY 1),
        |p AS (SELECT shard,
        |        CAST(coalesce(sum(bytes) OVER (ORDER BY shard
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS prefix
        |      FROM s),
        |r AS (SELECT d.shard, d.b,
        |        p.prefix // 32768
        |          + CAST(coalesce(sum(d.b) OVER (PARTITION BY d.shard
        |              ORDER BY d.doc_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |            AS BIGINT) // 32768 AS bin
        |      FROM d JOIN p USING (shard))
        |SELECT bin, CAST(count(DISTINCT shard) AS BIGINT) AS n_shards,
        |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(b) AS BIGINT) AS bytes
        |FROM r GROUP BY 1 ORDER BY bin""".stripMargin,

    // The split path under real pressure: 8 shards of ~18 KiB against an
    // 8 KiB target — every shard is oversized, so bins ≈ total/target
    // instead of saturating at the shard count.
    "q_compaction_split" ->
      """WITH d AS (SELECT doc_id % 8 AS shard, doc_id,
        |        CAST(length(text) AS BIGINT) AS b FROM documents),
        |s AS (SELECT shard, CAST(sum(b) AS BIGINT) AS bytes
        |      FROM d GROUP BY 1),
        |p AS (SELECT shard,
        |        CAST(coalesce(sum(bytes) OVER (ORDER BY shard
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS prefix
        |      FROM s),
        |r AS (SELECT d.shard, d.b,
        |        p.prefix // 8192
        |          + CAST(coalesce(sum(d.b) OVER (PARTITION BY d.shard
        |              ORDER BY d.doc_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |            AS BIGINT) // 8192 AS bin
        |      FROM d JOIN p USING (shard))
        |SELECT bin, CAST(count(DISTINCT shard) AS BIGINT) AS n_shards,
        |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(b) AS BIGINT) AS bytes
        |FROM r GROUP BY 1 ORDER BY bin""".stripMargin,

    "q_oov_rate" ->
      """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |      FROM documents),
        |lt AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS n
        |       FROM t GROUP BY 1, 2),
        |v AS (SELECT tok FROM
        |        (SELECT tok, sum(n) AS tf FROM lt GROUP BY 1)
        |      ORDER BY tf DESC, tok LIMIT 50),
        |a AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_tokens,
        |        CAST(sum(CASE WHEN lt.tok IN (SELECT tok FROM v) THEN 0
        |                 ELSE n END) AS BIGINT) AS oov_tokens
        |      FROM lt GROUP BY 1)
        |SELECT lang, n_tokens, oov_tokens,
        |  round(CAST(oov_tokens AS DOUBLE) / n_tokens, 4) AS oov_rate
        |FROM a ORDER BY lang""".stripMargin,

    "q_stream_hh" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY 1 HAVING count(*) >= 75
        |ORDER BY user_id""".stripMargin,

    // gap-grouping in MILLISECOND precision (the processor compares
    // java.sql.Timestamp.getTime values), emitted bounds floored to
    // seconds exactly like the processor's /1000
    "q_stream_sessions" ->
      """WITH o AS (SELECT user_id, epoch_ms(ts) AS ms,
        |        lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts)
        |          AS pms
        |      FROM events
        |      WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |f AS (SELECT user_id, ms,
        |        CASE WHEN pms IS NULL OR ms - pms > 86400000 THEN 1
        |             ELSE 0 END AS new_s
        |      FROM o),
        |g AS (SELECT user_id, ms,
        |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ms
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM f)
        |SELECT user_id, CAST(min(ms) // 1000 AS BIGINT) AS start_sec,
        |  CAST(max(ms) // 1000 AS BIGINT) AS end_sec,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, start_sec""".stripMargin,

    // trailing-k per user, latest-first (ts desc, id desc), ts floored to
    // seconds from ms exactly like the processor's /1000
    "q_stream_traillog" ->
      """WITH r AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, value,
        |        CAST(row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS INT) AS rank
        |      FROM events
        |      WHERE user_id IS NOT NULL AND event_id IS NOT NULL
        |        AND ts IS NOT NULL AND value IS NOT NULL)
        |SELECT user_id, rank, event_id,
        |  CAST(ms // 1000 AS BIGINT) AS ts_sec, round(value, 2) AS value
        |FROM r WHERE rank <= 5 ORDER BY user_id, rank""".stripMargin
  )
}
