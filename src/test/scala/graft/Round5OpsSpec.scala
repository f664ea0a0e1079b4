package graft

import graft.ops.{Dedup, Sampling, Tables, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions: paragraph-block dedup scrub, deterministic sampling,
  * the frozen-weight quality classifier, and the Bloom-prefiltered
  * decontamination path. The DuckDB oracle pins exact values; these specs
  * pin the structural contracts and the equivalences the scale-shaped
  * variants must preserve. */
class Round5OpsSpec extends SparkSpec {

  test("paragraph dedup: untouched docs reassemble verbatim, counts " +
    "reconcile, fixture contains cross-doc duplicate segments") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextAnalysis.paragraphDedup(spark, sf).collect()
    assert(rows.length === docs.size, "every doc must report")
    rows.foreach { r =>
      val (id, nSegs, nDup, clean) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(nDup >= 0 && nDup <= nSegs)
      // block segmentation partitions the tokens, so zero dropped segments
      // must reassemble the original text exactly
      if (nDup == 0) assert(clean === docs(id), s"doc $id")
    }
    assert(rows.exists(_.getLong(2) > 0),
      "fixture is known to contain duplicated segments")
  }

  test("paragraph dedup: keep-first policy on a crafted corpus") {
    val dir = tmpDir("paradedup")
    // 16 tokens per block: b1/b2 are one full block each
    val b1 = (1 to 16).map(i => s"w$i").mkString(" ")
    val b2 = (21 to 36).map(i => s"v$i").mkString(" ")
    spark.createDataFrame(Seq(
      (10L, s"$b1 $b2"), // first occurrence of both blocks: kept in full
      (20L, b1),         // copy of block 1: fully scrubbed
      (30L, s"$b2 tail tokens"), // block copy + a short unique tail block
      (40L, "unique little doc") // single sub-16 block, untouched
    )).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.paragraphDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(10L) === ((2L, 0L, s"$b1 $b2")))
    assert(got(20L) === ((1L, 1L, "")))
    assert(got(30L) === ((2L, 1L, "tail tokens")))
    assert(got(40L) === ((1L, 0L, "unique little doc")))
  }

  test("stratified sample: salted two-stage output equals the plain " +
    "per-group window, k per group, ranks contiguous") {
    val k = 40
    val got = Sampling.stratifiedSample(spark, sf, k).collect()
    // reference: the single-window formulation the salted variant replaces
    val h = md5(concat(lit("graft_sample:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    val ref = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("source")).withColumn("h", h)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("doc_id"), col("source"))
      .orderBy(col("lang"), col("rank")).collect()
    assert(got.toSeq === ref.toSeq)
    val counts = Tables(spark, sf, "documents")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      assert(rows.length.toLong === math.min(k.toLong, counts(lang)))
      assert(rows.map(_.getInt(1)).sorted.toSeq === (1 to rows.length).toSeq)
    }
  }

  test("corpus sample: top-n lowers to TakeOrderedAndProject (no global " +
    "sort shuffle) and reruns are byte-identical") {
    val df = Sampling.corpusSample(spark, sf, 64)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
    val a = df.collect()
    assert(a.length === 64)
    assert(a.map(_.getInt(0)).toSeq === (1 to 64).toSeq)
    assert(Sampling.corpusSample(spark, sf, 64).collect().toSeq === a.toSeq,
      "hash-order sampling must be deterministic across runs")
  }

  test("bloom decontamination: output identical to the exact join-only " +
    "operator (no false negatives survive the verify join)") {
    val exact = Dedup.decontaminate(spark, sf).collect()
    val bloom = Dedup.decontaminateBloom(spark, sf).collect()
    assert(bloom.toSeq === exact.toSeq)
  }

  test("paragraph dedup: scrubbing is a fixed point — a second pass over " +
    "the scrubbed corpus drops nothing") {
    // the keep-first policy removes every later occurrence in pass 1, so
    // pass 2 must find zero duplicated segments (the idempotence contract
    // a pipeline relies on when re-running a stage after a crash)
    val dir = tmpDir("parafixpoint")
    TextAnalysis.paragraphDedup(spark, sf)
      .filter(length(col("clean_text")) > 0)
      .select(col("doc_id"), col("clean_text").as("text"))
      .write.parquet(s"$dir/documents.parquet")
    val second = TextAnalysis.paragraphDedup(spark, dir)
      .agg(sum(col("n_dup_segs"))).collect()(0).getLong(0)
    assert(second === 0L, "re-scrub of a scrubbed corpus must be a no-op")
  }

  test("bm25: only query-term docs score, scores positive, n_terms bounded " +
    "by the query size") {
    val query = Seq("spark", "join", "stream")
    val rows = TextAnalysis.bm25(spark, sf, query).collect()
    val withTerm = Tables(spark, sf, "documents")
      .filter(query.map(t => array_contains(split(col("text"), " "), t))
        .reduce(_ || _)).count()
    assert(rows.length.toLong === withTerm,
      "exactly the docs containing >=1 query term must score")
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= query.length)
      assert(r.getDouble(2) > 0.0, "lucene idf is bounded below by ln(1)=0+")
    }
  }

  test("dsir weights: every doc reports and target-language docs carry " +
    "higher importance than the rest") {
    val langs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.ops.TrainingPipeline.dsirWeights(spark, sf).collect()
    assert(rows.length === langs.size)
    val (en, rest) = rows.partition(r => langs(r.getLong(0)) == "en")
    def mean(xs: Array[org.apache.spark.sql.Row]) =
      xs.map(_.getDouble(2)).sum / xs.length
    assert(mean(en) > mean(rest),
      "importance sampling must rank the target domain above the raw corpus")
  }

  test("bpe pair stats: ranks contiguous, frequencies non-increasing, " +
    "pairs are two chars, weighting matches a direct corpus count") {
    val rows = TextAnalysis.bpePairStats(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to rows.length).toSeq)
    assert(rows.sliding(2).forall {
      case Array(a, b) => a.getLong(2) >= b.getLong(2)
      case _           => true
    })
    rows.foreach(r => assert(r.getString(1).length === 2))
    // the distinct-token weighting must equal counting pairs over the raw
    // corpus directly (the equivalence that makes the cheap shape correct)
    val top = rows.head
    val direct = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"))
      .filter(col("pair") === top.getString(1)).count()
    assert(direct === top.getLong(2))
  }

  test("bpe fit: the textbook corpus learns the textbook merges in order") {
    // 'low low lower': pairs lo/ow tie at 3, lexicographic tie-break takes
    // lo; then (lo,w) at 3 makes low; then (e,r) beats (low,e) on the
    // a-column tie-break. The greedy fold must merge left-to-right.
    val dir = tmpDir("bpefit")
    spark.createDataFrame(Seq((1L, "low low lower")))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.bpeFit(spark, dir, merges = 3).collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    assert(got.toSeq === Seq((1, "lo", 3L), (2, "low", 3L), (3, "er", 1L)))
  }

  test("bpe fit: round 1 agrees with the pair-stat scan's argmax") {
    val stats = TextAnalysis.bpePairStats(spark, sf, topK = 1).collect()(0)
    val fit = TextAnalysis.bpeFit(spark, sf, merges = 1).collect()(0)
    assert(fit.getString(1) + fit.getString(2) === stats.getString(1))
    assert(fit.getLong(4) === stats.getLong(2))
  }

  test("embed pool: one row per (label, dim), counts consistent, centroid " +
    "norm below the member mean norm (averaging shrinks)") {
    val rows = graft.ops.Similarity.embedPool(spark, sf).collect()
    val labels = Tables(spark, sf, "embeddings")
      .groupBy(col("label")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val dim = Tables(spark, sf, "embeddings")
      .select(size(col("embedding"))).head.getInt(0)
    assert(rows.length === labels.size * dim)
    rows.foreach { r =>
      assert(r.getLong(2) === labels(r.getInt(0)), "n_vecs must be the label size")
    }
    // centroids of near-random unit-ish vectors concentrate near 0: the
    // pooled norm must be far below the individual vectors' mean norm
    val centroidNormSq = rows.groupBy(_.getInt(0)).map { case (_, rs) =>
      rs.map(r => r.getDouble(3) * r.getDouble(3)).sum
    }
    assert(centroidNormSq.forall(_ < 1.0),
      "mean-pooling random-ish vectors must shrink the norm")
  }

  test("quality classifier: scores in (0,1), keep consistent, every doc " +
    "reports") {
    val rows = TextAnalysis.qualityClassify(spark, sf).collect()
    assert(rows.length.toLong === Tables(spark, sf, "documents").count())
    rows.foreach { r =>
      val q = r.getDouble(4)
      assert(q > 0.0 && q < 1.0)
      assert(r.getBoolean(5) === (q >= 0.5))
    }
    // the frozen weights must actually separate the corpus, not saturate
    assert(rows.exists(_.getBoolean(5)) && rows.exists(!_.getBoolean(5)),
      "classifier should split the fixture corpus")
  }
}
