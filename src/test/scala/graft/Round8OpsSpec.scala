package graft

import graft.ops.Similarity

/** Round-8 additions: the IVF probe-cut decontamination tier. */
class Round8OpsSpec extends SparkSpec {

  test("decontaminate ivf: probing ALL cells recovers the brute-force " +
    "screen exactly — the probe cut is the only approximation") {
    val brute = Similarity.decontaminateEmbed(spark, sf).collect().map(_.toSeq)
    val full = Similarity.decontaminateEmbedIvf(spark, sf, nProbe = 8)
      .collect().map(_.toSeq)
    assert(full.toSeq === brute.toSeq,
      "nProbe = nCells must equal the exhaustive screen bit for bit")
  }

  test("decontaminate ivf: probe cut covers the whole test split and " +
    "never overstates the brute-force max cosine") {
    val brute = Similarity.decontaminateEmbed(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cut = Similarity.decontaminateEmbedIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    // every probed test doc has >= 1 train candidate on this fixture
    // (4 of 8 cells probed, train = 80% of the corpus), so the screen
    // stays total even under the cut
    assert(cut.map(_._1).toSet === brute.keySet,
      "probe cut must still screen every test-split doc")
    cut.foreach { case (id, mc, flag) =>
      // a subset of candidates can only lower the max (<= up to the 4-dp
      // round on both sides)
      assert(mc <= brute(id) + 5e-5,
        s"doc $id: probed max $mc exceeds brute-force ${brute(id)}")
      // the flag is computed on the RAW max; away from the 4-dp rounding
      // boundary the reported (rounded) value decides it too
      if (math.abs(mc - 0.5) > 1e-4)
        assert(flag === (mc >= 0.5), s"doc $id: flag disagrees at mc=$mc")
    }
  }

  test("decontaminate ivf: the candidate join is keyed on the cell, " +
    "not broadcast — the scale contract the brute tier cannot make") {
    val plan = Similarity.decontaminateEmbedIvf(spark, sf)
      .queryExecution.executedPlan.toString
    // the only BroadcastExchange inputs allowed are the one-row seed
    // aggregates; a broadcast of a corpus split would show a scan-side
    // exchange feeding the candidate join. We pin the declared (pre-AQE)
    // shape: no broadcast HINT anywhere in the logical plan.
    val logical = Similarity.decontaminateEmbedIvf(spark, sf)
      .queryExecution.analyzed.toString
    val hints = "(?i)broadcast".r.findAllIn(logical).length
    // exactly the three seed broadcasts (train assign, test probe) — the
    // seed frame is one row of nCells structs; never a corpus side
    assert(hints <= 3, s"unexpected broadcast hints in logical plan:\n$logical")
    assert(plan.nonEmpty)
  }
}
