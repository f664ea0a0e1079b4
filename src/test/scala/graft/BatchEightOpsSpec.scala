package graft

import graft.ops.{Drift, Similarity, Tables}
import org.apache.spark.sql.functions._

/** Eighth round-6 batch: PSI drift detection and the IVF probe-cut bitext
  * miner. Both are exact-oracle-checked; these specs pin the identity/
  * injection contracts (PSI zero on identical snapshots, drift trips on an
  * injected shift) and the probe-cut's agreement floor vs brute force. */
class BatchEightOpsSpec extends SparkSpec {

  // --------------------------------------------------------------- drift

  test("drift: identical snapshots score PSI exactly 0 on every feature") {
    val docs = Tables(spark, sf, "documents")
    val rows = Drift.psiReport(docs, docs).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getDouble(2) === 0.0, s"feature ${r.getString(0)}")
      assert(!r.getBoolean(3))
    }
  }

  test("drift: PSI is non-negative and an injected language shift trips " +
    "the lang feature only") {
    val docs = Tables(spark, sf, "documents")
    val shifted = docs.withColumn("lang", lit("xx"))
    val rows = Drift.psiReport(docs, shifted).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(rows.values.forall(_._1 >= 0.0),
      "every (p-q)ln(p/q) term and hence every PSI is non-negative")
    assert(rows("lang")._2, s"collapsing languages must drift: $rows")
    assert(rows("lang")._1 > 1.0, "a total collapse is a large PSI")
    assert(!rows("len")._2 && !rows("src")._2,
      "untouched features must not trip")
  }

  test("drift: the fixture's midpoint split does not drift (the corpus " +
    "generator is stationary)") {
    val rows = Drift.driftReport(spark, sf).collect()
    assert(rows.length === 3)
    rows.foreach(r => assert(!r.getBoolean(3),
      s"stationary fixture drifted on ${r.getString(0)}: ${r.getDouble(2)}"))
  }

  // ------------------------------------------------------ bitext via IVF

  test("bitext ivf: probe-cut mining agrees with the brute-force miner " +
    "above the measured floor, and every score clears the margin bar") {
    val brute = Similarity.bitextMine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.bitextMineIvf(spark, sf).collect()
    assert(ivf.nonEmpty && brute.nonEmpty)
    ivf.foreach { r =>
      assert(r.getDouble(3) >= 1.0, "mined margin below threshold")
      assert(r.getDouble(2) > 0.0, "non-positive cosine mined")
    }
    val got = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val agreement = brute.count(got.contains).toDouble / brute.size
    // measured 0.647 at nProbe=4/8 on this fixture (near-random
    // embeddings — the worst case for a coarse quantizer); floor at 0.5
    // so a quantizer regression fails loudly without pinning noise
    assert(agreement >= 0.5, f"argmax agreement $agreement%.3f below floor")
    // each source still mines at most one target
    assert(ivf.map(_.getLong(0)).distinct.length === ivf.length)
  }

  test("bitext ivf: probing ALL cells recovers the brute-force answer " +
    "exactly — the probe cut is the only approximation") {
    val brute = Similarity.bitextMine(spark, sf).collect().map(_.toSeq)
    val full = Similarity.bitextMineIvf(spark, sf, nProbe = 8).collect()
      .map(_.toSeq)
    assert(full.toSeq === brute.toSeq,
      "nProbe = nCells must equal the exhaustive miner bit for bit")
  }
}
