package graft

import graft.ops.{Dedup, IncrementalDedup, Relational, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-4 additions: SCD2 history materialization, word-entropy quality
  * scoring, per-source corpus profiling, and the gate-checked incremental
  * dedup contract. The DuckDB oracle pins exact values; these specs pin
  * the structural contracts. */
class Round4OpsSpec extends SparkSpec {

  test("scd2: one version per event, intervals chain, exactly one current per key") {
    val rows = Relational.scd2(spark, sf).collect()
    val nEvents = ops.Tables.events(spark, sf).count()
    assert(rows.length.toLong === nEvents)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, vs) =>
      // ordered output: valid_to of version i == valid_from of version i+1
      vs.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(3) === b.getLong(2))
        case _           =>
      }
      // exactly one open (current) version, and it is the last one
      assert(vs.count(_.getBoolean(4)) === 1)
      assert(vs.last.getBoolean(4))
      assert(vs.init.forall(v => !v.isNullAt(3)))
    }
  }

  test("entropy: bounded by log2(n_tok), zero iff all tokens identical") {
    val rows = TextAnalysis.entropy(spark, sf).collect()
    assert(rows.length.toLong === ops.Tables(spark, sf, "documents").count())
    rows.foreach { r =>
      val (n, h) = (r.getLong(1), r.getDouble(2))
      assert(h >= -1e-9)
      assert(h <= math.log(n.toDouble) / math.log(2.0) + 1e-4)
    }
  }

  test("source profile: partitions the corpus, dup accounting consistent") {
    val rows = TextAnalysis.sourceProfile(spark, sf).collect()
    val total = ops.Tables(spark, sf, "documents").count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      val (nDocs, nUniq, dupRatio) = (r.getLong(1), r.getLong(4), r.getDouble(5))
      assert(nUniq >= 1L && nUniq <= nDocs)
      assert(math.abs(dupRatio - (nDocs - nUniq).toDouble / nDocs) < 1e-3)
    }
  }

  test("incremental two-batch pairs == one-shot pairs with a new side") {
    val docs = ops.Tables(spark, sf, "documents")
    val split = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    val oneShot = Dedup.ngramJaccard(spark, sf, 0.5, dfCap = Int.MaxValue)
      .filter(col("doc_b") > split)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val incr = IncrementalDedup.twoBatchPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incr === oneShot)
  }
}
