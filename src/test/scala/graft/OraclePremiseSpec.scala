package graft

import graft.ops.{Dedup, Tables}
import org.apache.spark.sql.functions._

/** Pins the PREMISE behind the q_dedup_minhash / q_dedup_stream oracle at
  * BOTH graded scales — the driver's correctness gate (sf0.01) and the
  * bench snapshot (sf0.1): those entries reuse the df-capped exact-Jaccard
  * closed form on the grounds that (1) the 128 df cap never binds on the
  * fixture, and (2) LSH banding recall is exactly 1.0, so the LSH answer
  * equals the uncapped exact answer. Both were empirically probed when the
  * oracle was written; if a fixture or scale change ever invalidates them
  * at either scale, THIS spec fails and points at the stale premise —
  * instead of the gate failing and pointing (wrongly) at the operator. */
class OraclePremiseSpec extends SparkSpec {

  private val dirs = Seq(
    "gate sf0.01" -> "/root/testdata/sf0.01",
    "bench sf0.1" -> "/root/testdata/sf0.1")

  for ((scale, dir) <- dirs) {
    test(s"premise 1 ($scale): no shingle's document frequency reaches " +
      "the oracle's 128 cap") {
      graft.functions.TextFunctions.register(spark)
      val maxDf = Tables(spark, dir, "documents")
        .select(explode(expr("graft_shingle_hashes(text, 3)")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("df"))
        .agg(max(col("df"))).head().getLong(0)
      // <= 128, not < (review r11): production's filter is the INCLUSIVE
      // between(2, 128), so df exactly 128 is still kept and the capped
      // closed form still equals the uncapped answer — only df > 128 binds
      assert(maxDf <= 128,
        s"max shingle df $maxDf > 128 at $scale: the closed-form oracle's " +
          "df cap now BINDS — q_dedup_minhash/q_dedup_stream need the capped " +
          "oracle split from the LSH queries")
    }

    test(s"premise 3 ($scale): dbscan's unrolled-8-round oracle form " +
      "equals the production big-star CC tier — every core component " +
      "has diameter <= 8 at this scale (r8 verdict #2/#7)") {
      val cols = Seq(col("vec_id"), col("role"), col("cluster"))
      val prod = graft.ops.Graph.dbscan(spark, dir).select(cols: _*)
      val unrolled = graft.ops.Graph.dbscan(spark, dir, ccTier = "unrolled")
        .select(cols: _*)
      val missed = unrolled.exceptAll(prod).count()
      val extra = prod.exceptAll(unrolled).count()
      assert(missed === 0L && extra === 0L,
        s"dbscan big-star vs unrolled differ at $scale (missed=$missed " +
          s"extra=$extra): a core component's diameter exceeds the oracle's " +
          "8-round unroll — raise the oracle's round count (big-star is " +
          "exact; the ORACLE premise is what broke)")
    }

    test(s"premise 4 ($scale): labelProp communities never cross connected " +
      "components — the documented invariant of the fixed 4-round unroll " +
      "(r8 verdict #7; probed distributed, never a driver union-find)") {
      // NOTE the probe that was asked for — round-4 == round-5 — was run
      // and FAILS by design: synchronous min-tie-break LPA oscillates
      // (period-2 cycle reached by round 4 at sf0.01; still in transient
      // at sf0.1). The operator's contract never premised convergence —
      // both engines unroll the same fixed rounds (scaladoc: "the fixed
      // round count makes oscillation harmless to the contract") — so the
      // scale-checkable premise is the component-consistency invariant.
      val pairs = Dedup.embedDup(spark, dir, 0.15)
        .select(col("vec_b").as("u"), col("vec_a").as("v"))
      val comp = Dedup.bigStarComponents(pairs, maxIter = 20,
          what = s"labelProp premise $scale")
        .withColumnRenamed("doc_id", "node").withColumnRenamed("cluster", "cc")
      val lp = graft.ops.Graph.labelProp(spark, dir)
      val crossers = lp
        .join(comp, Seq("node"))
        .join(comp.select(col("node").as("community"), col("cc").as("cc_lbl")),
          Seq("community"))
        .filter(col("cc") =!= col("cc_lbl")).count()
      assert(crossers === 0L,
        s"$crossers nodes at $scale carry a community label from a " +
          "DIFFERENT connected component — the LPA update leaked labels " +
          "across the eps-graph's components")
    }

    test(s"premise 2 ($scale): LSH banding recall is 1.0 (pair set " +
      "identical to the uncapped exact answer)") {
      val cols = Seq(col("doc_a"), col("doc_b"), col("jaccard"))
      val lsh = Dedup.minhashLsh(spark, dir).select(cols: _*)
      val exact = Dedup.ngramJaccard(spark, dir, threshold = 0.5,
        dfCap = Int.MaxValue).select(cols: _*)
      val missed = exact.exceptAll(lsh).count()
      val extra = lsh.exceptAll(exact).count()
      assert(missed === 0L && extra === 0L,
        s"LSH vs exact symmetric difference at $scale: missed=$missed " +
          s"extra=$extra — banding recall is no longer 1.0; the " +
          "exact-Jaccard oracle premise for q_dedup_minhash/q_dedup_stream " +
          "is stale")
    }

    test(s"premise 5 ($scale): no zero-norm embedding — every cosine in " +
      "the ANN/dedup family divides by norm products, and ANSI mode " +
      "raises on a zero divisor instead of nulling; a fixture or encoder " +
      "change that mints an all-zeros vector must fail HERE, naming the " +
      "premise, not in an arbitrary downstream query (r9 review)") {
      graft.functions.VectorFunctions.register(spark)
      val zeroNorm = Tables(spark, dir, "embeddings")
        .filter(expr("graft_norm(cast(embedding as array<double>))") === 0.0)
        .count()
      assert(zeroNorm === 0L,
        s"$zeroNorm zero-norm embeddings at $scale: cosine is undefined " +
          "for them — screen them upstream or null-guard the cosine sites")
    }
  }
}
