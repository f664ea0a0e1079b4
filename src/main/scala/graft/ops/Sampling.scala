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
}
