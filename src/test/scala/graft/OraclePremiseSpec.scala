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
      assert(maxDf < 128,
        s"max shingle df $maxDf >= 128 at $scale: the closed-form oracle's " +
          "df cap now BINDS — q_dedup_minhash/q_dedup_stream need the capped " +
          "oracle split from the LSH queries")
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
  }
}
