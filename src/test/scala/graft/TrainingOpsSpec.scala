package graft

import graft.ops.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-3 training-pipeline operators: IVF ANN, decontamination, sequence
  * packing, and the filter funnel. The DuckDB oracle pins exact values; these
  * specs pin the CONTRACTS (what the numbers mean). */
class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("ivf ANN: full result shape, per-query ranking, cells restrict the search") {
    val rows = Similarity.ivfTopK(spark, sf).collect()
    assert(rows.length === 50) // 10 queries x k=5 (corpus >> k per probed cell)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to 5)) // dense ranks
      val cos = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }) // non-increasing
    }
    // IVF cosines can never beat the exact brute-force top-1
    val bf = Similarity.bruteForceTopK(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getDouble(3)).max }
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getDouble(3)).max <= bf(q) + 1e-9)
    }
  }

  test("decontamination: a copied train doc is fully contaminated, fresh text is clean") {
    // (id*2654435761)%100: 3 -> 83 and 8 -> 88 land in the test split;
    // 1 -> 61 lands in train.
    val dir = tmpDir("decon")
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // train
      (3L, "alpha beta gamma delta epsilon zeta eta theta"), // test: verbatim copy
      (8L, "one two three four five six seven eight"))       // test: disjoint
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val r = Dedup.decontaminate(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r.keySet === Set(3L, 8L)) // only test-split docs report
    assert(r(3L) === ((4L, 4L, 1.0))) // 8 tokens -> 4 5-gram shingles, all hit
    assert(r(8L) === ((4L, 0L, 0.0)))
  }

  test("sequence packing: bins partition each shard's token stream exactly") {
    val d = ops.Tables(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val totTok = d.agg(sum("n_tok")).head().getLong(0)
    val nDocs = d.count()
    val bins = TextAnalysis.packSequences(spark, sf).collect()
    assert(bins.map(_.getLong(4)).sum === totTok) // every token lands in a bin
    assert(bins.map(_.getLong(3)).sum === nDocs)  // every doc lands in a bin
    // per (split, shard): bin ids start at 0, strictly increasing; a doc
    // longer than the budget legitimately STRADDLES and skips ids (review
    // r11: exact contiguity contradicted the operator's documented
    // straddling contract)
    bins.groupBy(r => (r.getString(0), r.getInt(1))).foreach { case (_, rs) =>
      val ids = rs.map(_.getLong(2)).sorted
      assert(ids.head === 0L && ids.distinct.length === ids.length &&
        ids.toSeq === ids.sorted.toSeq)
    }
  }

  test("train manifest: the composition is consistent with its stage operators") {
    val bins = graft.ops.TrainingPipeline.trainManifest(spark, sf).collect()
    assert(bins.nonEmpty)
    // upper bound: the FULL-corpus funnel survivors (the funnel runs over
    // train+test, so this is a weaker bound than train-only survivors —
    // review r11 corrected the comment; the manifest's own stages 1/2/4
    // only remove more)
    val funnelFinal = TextAnalysis.filterFunnel(spark, sf).collect()
      .find(_.getString(0) == "3_rep_le_0.01").get.getLong(1)
    val manifestDocs = bins.map(_.getLong(2)).sum
    assert(manifestDocs <= funnelFinal)
    assert(manifestDocs > 0)
    // packing invariant post-filtering: ids start at 0, distinct (straddle
    // gaps legal — review r11)
    bins.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      val ids = rs.map(_.getLong(1)).sorted
      assert(ids.head === 0L && ids.distinct.length === ids.length)
    }
  }

  test("filter funnel: cumulative stages only ever shrink, yields match counts") {
    val rows = TextAnalysis.filterFunnel(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("0_all", "1_chars_ge_120", "2_tokens_ge_30", "3_rep_le_0.01"))
    val n = rows.map(_.getLong(1))
    assert(n(0) === ops.Tables(spark, sf, "documents").count())
    assert(n.zip(n.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      // HALF_UP like Spark's round(), not math.rint's HALF_EVEN (review
      // r11: an exact .5-tie ratio would diverge spuriously)
      assert(r.getDouble(2) ===
        BigDecimal(r.getLong(1).toDouble / n(0))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("gopher rules: keep is the conjunction and each rule matches its definition") {
    val rows = TextAnalysis.gopherRules(spark, sf).collect()
    assert(rows.length === ops.Tables(spark, sf, "documents").count()) // total
    rows.foreach { r =>
      assert(r.getBoolean(6) ===
        (r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5)))
      assert(r.getBoolean(2) === (r.getLong(1) >= 30 && r.getLong(1) <= 10000))
    }
    // the thresholds actually discriminate on this corpus
    assert(rows.exists(_.getBoolean(6)) && rows.exists(!_.getBoolean(6)))
  }

  test("novelty: shared shingles score zero, unique text scores one") {
    // two verbatim copies (every 3-gram has df >= 2 -> zero novelty) plus a
    // disjoint doc (every 3-gram unique -> novelty 1)
    val dir = tmpDir("novelty")
    Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "one two three four five six"),
      (4L, "hi there")) // < 3 tokens: no shingles, reports 0/0
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val r = Dedup.novelty(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L) === ((3L, 0L, 0.0)))
    assert(r(2L) === ((3L, 0L, 0.0)))
    assert(r(3L) === ((4L, 4L, 1.0)))
    assert(r(4L) === ((0L, 0L, 0.0)))
  }

  test("reshard: deterministic total partition with in-range shards") {
    val docs = ops.Tables(spark, sf, "documents")
    val rows = TextAnalysis.reshard(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === docs.count()) // every doc in a shard
    rows.foreach(r => assert(r.getInt(0) >= 0 && r.getInt(0) < 16))
    // deterministic: a second run yields the identical result set
    assert(TextAnalysis.reshard(spark, sf).collect().toSeq === rows.toSeq)
  }
}
