package graft

import graft.ops.{Graph, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Edge posture of the round-8 operators: degenerate candidate sets,
  * constant dimensions, cores above the max degree, sub-chunk documents.
  * Small adversarial fixtures staged as parquet dirs so the operators run
  * their real read paths. */
class Round8EdgeSpec extends SparkSpec {

  private def stage(dir: String, table: String)(df: org.apache.spark.sql.DataFrame): String = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$table.parquet")
    dir
  }

  test("mmr: k larger than the candidate pool returns every candidate " +
    "once, ranks contiguous; exact relevance ties resolve to the lowest id") {
    import spark.implicits._
    val dir = tmpDir("mmr-edge")
    // query 0; candidates 1 and 2 are the SAME vector, 3 is its mirror
    // across the query axis — all three have IDENTICAL relevance, so the
    // first pick is purely the id tie-break and the second is purely the
    // diversity term (the twin is maximally redundant, the mirror is not)
    stage(dir, "embeddings")(Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.9f, -0.1f), 0))
      .toDF("vec_id", "embedding", "label"))
    val rows = Similarity.mmrRerank(spark, dir, topN = 10, k = 5).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.length === 3, "only three candidates exist")
    assert(rows.map(_._1).toSeq === Seq(1, 2, 3), "ranks stay contiguous")
    assert(rows.head._2 === 1L, "relevance tie must pick the lowest id")
    assert(rows(1)._2 === 3L, s"equal relevance: MMR must prefer the " +
      s"diverse mirror over the exact twin: ${rows.toSeq}")
    assert(rows(2)._2 === 2L)
  }

  test("bounded-driver-work guards: mmrRerank and contextPack refuse " +
    "parameters that would unbound their documented driver-side work " +
    "(r8 verdict #3 — the lshTopK require precedent)") {
    val dir = "/root/testdata/sf0.001"
    val eMmr = intercept[IllegalArgumentException] {
      graft.ops.Similarity.mmrRerank(spark, dir, topN = 1000000)
    }
    assert(eMmr.getMessage.contains("topN"))
    val ePack = intercept[IllegalArgumentException] {
      graft.ops.TrainingPipeline.contextPack(spark, dir, cand = 1000000)
    }
    assert(ePack.getMessage.contains("cand"))
    // zero/negative are rejected too, not silently empty
    intercept[IllegalArgumentException] {
      graft.ops.Similarity.mmrRerank(spark, dir, topN = 0)
    }
    intercept[IllegalArgumentException] {
      graft.ops.TrainingPipeline.contextPack(spark, dir, cand = 0)
    }
  }

  test("sq8: a constant dimension codes to 0 with zero reconstruction " +
    "error instead of dividing by a zero range") {
    import spark.implicits._
    val dir = tmpDir("sq8-edge")
    // dim 0 constant, dim 1 varies
    stage(dir, "embeddings")(Seq(
      (0L, Array(0.5f, 0.1f), 0),
      (1L, Array(0.5f, 0.9f), 0),
      (2L, Array(0.5f, 0.4f), 0))
      .toDF("vec_id", "embedding", "label"))
    val rows = Similarity.embedSq8(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.length === 2)
    val const = rows.find(_._1 === 0).get
    assert(const._2 === 0.5 && const._3 === 0.5)
    assert(const._4 === 0.0, "constant dim must code to 0")
    assert(const._5 === 0.0, "constant dim reconstructs exactly")
    val varying = rows.find(_._1 === 1).get
    assert(varying._4 > 0.0 && varying._5 > 0.0)
  }

  test("k-core: k above the maximum degree peels the graph empty without " +
    "error; k = 1 keeps every connected node") {
    val empty = Graph.kCore(spark, sf, k = 1000).collect()
    assert(empty.isEmpty, "an impossible core must come back empty")
    val all = Graph.kCore(spark, sf, k = 1).collect()
    val connected = graft.ops.Dedup.embedDup(spark, sf, 0.15)
      .select(col("vec_a").as("n"))
      .union(graft.ops.Dedup.embedDup(spark, sf, 0.15)
        .select(col("vec_b").as("n")))
      .distinct().count()
    assert(all.length.toLong === connected,
      "the 1-core is every node with at least one edge")
  }

  test("contrastive pairs: a document shorter than two chunks emits no " +
    "pair; a two-chunk doc emits exactly one") {
    import spark.implicits._
    val dir = tmpDir("cp-edge")
    stage(dir, "documents")(Seq(
      (0L, "short doc"),                      // 1 chunk -> no pair
      (1L, (("w " * 96).trim)))               // 96 tokens = 2 chunks -> 1 pair
      .toDF("doc_id", "text"))
    val rows = TextAnalysis.contrastivePairs(spark, dir).collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === 1L && rows.head.getLong(1) === 0L)
  }

  test("ann recall: a query whose true neighbors all land outside the " +
    "probed cells reports recall 0 and rr 0, not a missing row") {
    import spark.implicits._
    val dir = tmpDir("annrecall-edge")
    // 12 vectors; query ids < 10. Construct id 9 so its true nearest
    // (id 11) sits in a different coarse cell than 9 probes: with 8 seeds
    // (ids 0-7) spanning axes, vectors cluster by axis.
    val vecs = (0 until 8).map { i =>
      val a = new Array[Float](8); a(i) = 1.0f; (i.toLong, a, 0)
    } ++ Seq(
      (8L, Array(1.0f, 0.05f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
      (9L, Array(0f, 1.0f, 0.05f, 0f, 0f, 0f, 0f, 0f), 0),
      (10L, Array(1.0f, 0.04f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
      (11L, Array(0f, 1.0f, 0.04f, 0f, 0f, 0f, 0f, 0f), 0))
    stage(dir, "embeddings")(vecs.toDF("vec_id", "embedding", "label"))
    val rows = Similarity.annRecall(spark, dir, numQueries = 10, k = 5)
      .collect()
    assert(rows.length === 10, "every query id reports a row")
    rows.foreach { r =>
      val (nh, rec, rr) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(nh >= 0L && rec >= 0.0 && rec <= 1.0 && rr >= 0.0 && rr <= 1.0)
    }
  }
}
