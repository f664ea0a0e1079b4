package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling over `documents` — the subset-selection ops a
  * training-data pipeline runs constantly (eval slices, ablation corpora,
  * per-source quotas) and the reference has no analog for. Randomness is
  * replaced by a keyed hash order: `md5("graft_sample:" || doc_id)` ranks
  * every row identically in any engine and on any cluster layout, so a
  * sample is reproducible across reruns, re-partitions and engine swaps —
  * the property seeded `rand()` loses the moment partitioning changes.
  */
object Sampling {

  /** The deterministic sampling order: uniform-ish over docs, stable across
    * engines (md5 is in every SQL dialect; xxhash64 is Spark-only). */
  private def sampleKey: Column =
    md5(concat(lit("graft_sample:"), col("doc_id").cast("string")))

  /** Stratified k-per-group sample (group = `lang`): the first `k` docs of
    * each language in sample-hash order — the per-stratum eval-slice
    * selector.
    *
    * Shape at scale: a single `row_number` window per language would funnel
    * each language's WHOLE corpus slice through one reducer (5 languages =
    * 5 tasks at 100 TB — the window-skew regime). Two-stage salted top-k
    * instead: stage 1 ranks within (lang, doc_id % salt) cells and keeps at
    * most `k` per cell — every cell's ordered prefix is a superset of the
    * global per-lang top-k, so correctness is unaffected — and stage 2
    * ranks the surviving ≤ salt·k rows per language. The heavy shuffle is
    * spread over `salt` reducers per group; the skewed window only ever
    * sees a bounded candidate set. Output is identical to the single
    * window (spec-asserted). */
  def stratifiedSample(spark: SparkSession, dir: String, k: Int = 40,
                       salt: Int = 32): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"))
      .withColumn("h", sampleKey)
    val w1 = Window.partitionBy(col("lang"), pmod(col("doc_id"), lit(salt)))
      .orderBy(col("h"), col("doc_id"))
    val w2 = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    d.withColumn("rn1", row_number().over(w1)).filter(col("rn1") <= k)
      .withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("doc_id"), col("source"))
      .orderBy(col("lang"), col("rank"))
  }

  /** Per-source corpus quota (the RefinedWeb/CCNet-style domain cap): no
    * single source may contribute more than `ceil(alpha * corpus)` docs
    * (floored at `minCap` so tiny sources are never wiped out), and the
    * docs a capped source DOES contribute are its first `cap` in the
    * deterministic sample-hash order — reproducible curation, not seeded
    * `rand()`. Emits the surviving corpus with per-source accounting
    * (`n_docs`, `cap`, `rank`): the table a pipeline materializes before
    * mixing, where one over-crawled domain would otherwise dominate the
    * training distribution.
    *
    * Shape at scale: per-source counts are one map-side-combined aggregate;
    * the corpus total is a broadcast 1-row; the caps table is
    * sources-sized, broadcast back onto the corpus. Ranking reuses the
    * salted two-stage top-k of [[stratifiedSample]] — an over-crawled
    * source is EXACTLY the window-skew regime a single per-source window
    * would funnel through one reducer, and stage 1 discards everything
    * past each salt cell's `cap`-prefix before the real window runs
    * (cell prefixes are supersets of the global per-source prefix, so the
    * output is identical — spec-asserted). */
  def sourceCap(spark: SparkSession, dir: String, alpha: Double = 0.03,
                minCap: Int = 10, salt: Int = 32): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("h", md5(concat(lit("graft_cap:"), col("doc_id").cast("string"))))
    val counts = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).as("total"))
    val caps = counts.crossJoin(broadcast(total))
      .withColumn("cap",
        greatest(lit(minCap.toLong), ceil(col("total") * lit(alpha))))
      .select(col("source"), col("n_docs"), col("cap"))
    val withCap = d.join(broadcast(caps), "source")
    val w1 = Window.partitionBy(col("source"), pmod(col("doc_id"), lit(salt)))
      .orderBy(col("h"), col("doc_id"))
    val w2 = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    withCap.withColumn("rn1", row_number().over(w1)).filter(col("rn1") <= col("cap"))
      .withColumn("rank", row_number().over(w2)).filter(col("rank") <= col("cap"))
      .select(col("source"), col("rank"), col("doc_id"), col("n_docs"), col("cap"))
      .orderBy(col("source"), col("rank"))
  }

  /** Token-budget corpus selection: greedily keep the highest-quality
    * documents (quality = type-token ratio, the distinct-word share — a
    * standard cheap diversity signal; ties by doc_id) until the training
    * token budget is spent — i.e. the prefix of the quality-ordered corpus
    * whose cumulative token count fits `budget`. The "we can afford N
    * tokens, which documents?" cut every training run makes. Emits a TOTAL
    * disposition (doc_id, n_tok, score, kept).
    *
    * Shape at scale: the naive form is ONE GLOBAL ordered prefix-sum — a
    * single-reducer window funnel over the whole corpus. This runs the
    * histogram refinement instead: bucket scores (tiny, score-range-sized
    * table), take cumulative token mass per bucket from the top (a window
    * over ~100 rows), broadcast it back, and decide whole buckets in a
    * map-side comparison. Only the ONE boundary bucket that straddles the
    * budget needs an exact ordered prefix-sum, and that window runs over a
    * single bucket's docs, not the corpus (bucket width bounds the skew;
    * recurse the refinement if a bucket is still too fat). Spec-proven
    * identical to the single-window form. Bucketing by floor(score*100)
    * is monotone in score, so the decomposition is exact whatever IEEE
    * does to the product. */
  def tokenBudget(spark: SparkSession, dir: String,
                  budget: Long = 15000L): DataFrame = {
    // materialized: the bucket aggregate AND the three union branches of
    // the broadcast join-back all consume the scored table — without the
    // checkpoint the text scan + per-doc array_distinct (the operator's
    // dominant cost) ran four times (review r11; the quantileNorm
    // one-scan discipline)
    val s = Tables(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tok"),
        round(size(array_distinct(col("t"))).cast("double") / size(col("t")), 4)
          .as("score"))
      // docs without text cannot be selected under a token budget —
      // EXPLICIT (r12 fuzz: they previously fell out via the null-unsafe
      // bucket join, a silent drop one refactor away from breaking)
      .filter(col("n_tok").isNotNull)
      .withColumn("bucket", floor(col("score") * 100).cast("int"))
      .localCheckpoint(true)
    val wb = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val buckets = s.groupBy(col("bucket")).agg(sum(col("n_tok")).as("btok"))
      .withColumn("above", coalesce(sum(col("btok")).over(wb), lit(0L)))
    val joined = s.join(broadcast(buckets), "bucket")
    val whole = joined.filter(col("above") + col("btok") <= budget)
      .withColumn("kept", lit(true))
    val dead = joined.filter(col("above") >= budget)
      .withColumn("kept", lit(false))
    val wB = Window.partitionBy(col("bucket"))
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val boundary = joined
      .filter(col("above") < budget && col("above") + col("btok") > budget)
      .withColumn("kept", col("above") + sum(col("n_tok")).over(wB) <= budget)
    whole.unionByName(dead).unionByName(boundary)
      .select(col("doc_id"), col("n_tok"), col("score"), col("kept"))
      .orderBy(col("doc_id"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * "Weighted random sampling with a reservoir"): each doc draws a key
    * `-ln(u) / w` from its own deterministic uniform `u` and weight `w`
    * (token count — sample docs proportional to token mass, the mixture-
    * sampling primitive), and the sample is the `k` SMALLEST keys. One
    * pass, no sequential draw-and-remove: the A-ES key order realizes
    * exactly the successive weighted-draw-without-replacement process.
    * `u` is md5-derived (first 12 hex digits → 48-bit uniform), so the
    * sample is reproducible across engines, reruns and repartitions —
    * seeded `rand()` would not survive a partitioning change.
    *
    * Shape at scale: key derivation is per-row codegen'd builtins (md5 /
    * conv / ln — no UDF); the selection is `orderBy(key).limit(k)` which
    * lowers to TakeOrderedAndProject (per-partition k-row heaps, driver
    * merges k) — NO global sort, no full shuffle, whatever the corpus
    * size. The trailing rank window runs over exactly `k` survivors. */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 48): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      // a doc with no text has no weight and cannot be drawn (r12 fuzz:
      // NULL keys otherwise sort FIRST under Spark's null ordering and
      // null-text docs accidentally WIN the sample)
      .filter(col("n_tok").isNotNull)
      .withColumn("u",
        (expr("cast(conv(substring(md5(concat('graft_wsample:', " +
          "cast(doc_id as string))), 1, 12), 16, 10) as double)") + 0.5d) /
          lit(281474976710656.0d))
      .withColumn("key", -log(col("u")) / col("n_tok"))
    d.orderBy(col("key"), col("doc_id")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("key"), col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("n_tok"),
        round(col("key"), 6).as("key"))
      .orderBy(col("rank"))
  }

  /** Deterministic epoch-shuffle order: materialize the training-read
    * order for one epoch as (shard, pos) — every doc hashed into one of
    * `nShards` shards by an epoch-keyed md5 and ordered within its shard
    * by the same hash. Reading the shards round-robin realizes a global
    * shuffled order (`gpos` is that interleaved position, with holes where
    * shards differ in size) WITHOUT a global sort: this is the "shuffle
    * the corpus for epoch N" materialization every training run performs,
    * reproducible across engines and reruns because the permutation is
    * the hash, not a seeded in-memory shuffle.
    *
    * Shape at scale: the hash and shard assignment are per-row codegen'd
    * builtins; the only shuffle is the per-shard window, and the hash is
    * uniform so the `nShards` windows are skew-free by construction (in
    * production nShards is thousands — each window is corpus/nShards).
    * Changing `epoch` re-keys the hash and yields an independent order. */
  def epochOrder(spark: SparkSession, dir: String, epoch: Int = 1,
                 nShards: Int = 8): DataFrame = {
    val d = Tables(spark, dir, "documents").select(col("doc_id"))
      .withColumn("h",
        md5(concat(lit(s"graft_epoch:$epoch:"), col("doc_id").cast("string"))))
      .withColumn("shard",
        pmod(expr("cast(conv(substring(h, 1, 8), 16, 10) as bigint)"),
          lit(nShards.toLong)).cast("int"))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    d.withColumn("pos", row_number().over(w))
      .withColumn("gpos",
        ((col("pos") - 1).cast("long") * nShards + col("shard")).as("gpos"))
      .select(col("doc_id"), col("shard"), col("pos"), col("gpos"))
      .orderBy(col("shard"), col("pos"))
  }

  /** Fixed-size whole-corpus sample: the globally first `n` docs in
    * sample-hash order, with their rank. `orderBy(h).limit(n)` lowers to
    * `TakeOrderedAndProject` — per-partition heaps of n rows, driver merges
    * n — so no global sort and no full shuffle ever happens; the trailing
    * rank window runs over exactly `n` surviving rows. */
  def corpusSample(spark: SparkSession, dir: String, n: Int = 64): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"))
      .withColumn("h", sampleKey)
    d.orderBy(col("h"), col("doc_id")).limit(n)
      .withColumn("rank", row_number().over(Window.orderBy(col("h"), col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("lang"), col("source"))
      .orderBy(col("rank"))
  }

  /** Histogram-ECDF quantile normalization of a per-doc quality signal
    * (token count) WITHIN its language — the score-calibration step before
    * cross-language mixing or thresholding (a 200-token Chinese doc and a
    * 200-token English doc sit at very different quantiles; filters must
    * compare percentiles, not raw scores).
    *
    * The exact form — `percent_rank()` over each language partition — is
    * the window-skew regime (one reducer per language at 100 TB), so this
    * uses the two-pass histogram ECDF instead: bucket scores at width
    * `bucketW`, aggregate one bounded (lang x bucket) count table, run the
    * cumulative window over THAT table only, and join the per-bucket
    * percentile back to docs by (lang, bucket). Every doc in a bucket gets
    * the bucket's midpoint ECDF value `(2*cum_below + cnt) / (2*n_lang)` —
    * resolution is the bucket width, the documented trade that buys a plan
    * with no corpus-sized window anywhere. Integer numerator/denominator,
    * one final rounded division: engine-exact. */
  def quantileNorm(spark: SparkSession, dir: String, bucketW: Int = 16): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      // null-token docs are outside the distribution: they were already
      // dropped from the OUTPUT by the null-unsafe bucket join, but they
      // still inflated n_lang and (nulls-first) shifted every cum count —
      // the ECDF was wrong for every real doc of the lang (r12 fuzz)
      .filter(col("n_tok").isNotNull)
      .withColumn("b", expr(s"n_tok div $bucketW"))
      .localCheckpoint(true) // one text scan feeds hist, totals, and docs
    val hist = d.groupBy(col("lang"), col("b")).agg(count(lit(1)).as("c"))
    val nl = d.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val wCum = Window.partitionBy(col("lang")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ecdf = hist
      .withColumn("cb", coalesce(sum(col("c")).over(wCum), lit(0L)))
      .join(nl, Seq("lang"))
      .select(col("lang"), col("b"),
        round((lit(2L) * col("cb") + col("c")).cast("double") /
          (lit(2L) * col("n_lang")), 4).as("pct"))
    d.join(ecdf, Seq("lang", "b"))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("pct"))
      .orderBy(col("doc_id"))
  }
}
