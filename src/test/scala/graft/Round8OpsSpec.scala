package graft

import graft.ops.{Maintenance, Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Round-8 additions: the IVF probe-cut decontamination tier, the
  * oversized-shard compaction split, and the real-WAV audio tier. */
class Round8OpsSpec extends SparkSpec {

  test("wav view: payloads are genuine RIFF/WAVE containers, not " +
    "repackaged PCM") {
    val rows = Multimodal.wavView(spark, sf).take(20)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.payload
      assert(p.length > 44, s"doc ${r.doc_id}: payload too short for a WAV")
      assert(new String(p.slice(0, 4), "US-ASCII") === "RIFF",
        s"doc ${r.doc_id}: missing RIFF magic")
      assert(new String(p.slice(8, 12), "US-ASCII") === "WAVE",
        s"doc ${r.doc_id}: missing WAVE form type")
      // a fmt chunk must exist in the header region
      assert(new String(p.slice(12, 16), "US-ASCII") === "fmt ",
        s"doc ${r.doc_id}: missing fmt chunk")
    }
  }

  test("wav decode: javax.sound.sampled roundtrip reproduces the " +
    "generator's rate/channels/frames and sample checksum exactly " +
    "(PCM WAV is lossless)") {
    val metas = Multimodal.decodeWav(spark, sf).collect()
    val total = ops.Tables(spark, sf, "documents").count()
    assert(metas.length.toLong === total)
    metas.foreach { m =>
      val id = m.doc_id
      assert(m.is_wav, s"doc $id: sniff failed on a genuine container")
      assert(m.sample_rate === 8000 * ((id % 3).toInt + 1))
      assert(m.channels === (id % 2).toInt + 1)
      assert(m.n_frames === (id % 50) + 10)
      var expected = 0L
      var i = 0
      while (i < m.n_frames) {
        var c = 0
        while (c < m.channels) {
          expected += ((id * 7 + 31L * i + 17L * c) % 65536L) - 32768L
          c += 1
        }
        i += 1
      }
      assert(m.sample_sum === expected,
        s"doc $id: decoded sample checksum drifted")
    }
  }

  test("compaction apply: an oversized shard SPLITS into ~ceil(bytes/target) " +
    "bins instead of one giant file, and content survives the rewrite") {
    import spark.implicits._
    val root = tmpDir("graft-split")
    val live = s"$root/docs"
    val target = 1000L
    // shard 0: tiny; shard 1: ~5x target across 50 rows; shard 2: tiny —
    // the giant must fan out while the neighbors still pack
    val docs = (Seq((0L, 0L, "x" * 100), (2L, 2L, "z" * 100)) ++
      (0 until 50).map(i => (10L + i, 1L, "y" * 100)))
      .toDF("doc_id", "shard", "text")
    docs.repartition(col("shard")).write.partitionBy("shard").parquet(live)
    val manifest = Maintenance.compactApply(spark, live, target).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bins = manifest.map(_._1).sorted
    // 5200 total bytes / 1000 target => 6 bins, NOT 3 (= shards)
    assert(bins.length === 6, s"expected ~total/target bins, got: $manifest")
    assert(bins.toSeq === (bins.head to bins.last), "bins are consecutive")
    // no bin exceeds target + one row (the row-granular first-fit bound)
    manifest.foreach { case (bin, _, bytes) =>
      assert(bytes <= target + 100, s"bin $bin overflows: $bytes bytes")
    }
    // content identity through the split rewrite
    val after = spark.read.parquet(live)
    assert(after.count() === 52L)
    assert(after.agg(sum(length(col("text")))).head().getLong(0) === 5200L)
    // each bin is exactly one file
    val binDirs = new java.io.File(live).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("bin="))
    assert(binDirs.length === 6)
  }

  test("compaction apply: binning is bit-identical to the shard-granular " +
    "policy when every shard fits the target") {
    import spark.implicits._
    val root = tmpDir("graft-nosplit")
    val live = s"$root/docs"
    val target = 1000L
    // 6 shards of 300 bytes: whole-shard first-fit packs 300|600|900 ->
    // prefix bins 0,0,0,0(900<1000? prefix 900//1000=0),1,1
    val docs = (0 until 6).map(i => (i.toLong, i.toLong, "a" * 300))
      .toDF("doc_id", "shard", "text")
    docs.repartition(col("shard")).write.partitionBy("shard").parquet(live)
    val manifest = Maintenance.compactApply(spark, live, target).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // shard prefixes 0,300,600,900,1200,1500 -> bins 0,0,0,0,1,1
    assert(manifest.map(_._1).sorted.toSeq === Seq(0L, 1L))
    assert(manifest.toMap === Map(0L -> 4L, 1L -> 2L), "one row per shard")
    val byBin = spark.read.parquet(live)
      // partition discovery reads the bin dir value back as INT
      .groupBy(col("bin").cast("long").as("bin"))
      .agg(countDistinct("shard").as("ns")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byBin === Map(0L -> 4L, 1L -> 2L),
      s"whole-shard packing must be unchanged: $byBin")
  }

  test("k-core: every survivor keeps >= k in-core neighbors, the peel " +
    "actually drops nodes, and rounds past the fixed point change nothing") {
    import graft.ops.{Dedup, Graph}
    val core = Graph.kCore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(core.nonEmpty, "the 0.15 graph must have a 2-core")
    core.foreach { case (n, d) =>
      assert(d >= 2L, s"node $n survives with in-core degree $d < k")
    }
    val allNodes = Dedup.embedDup(spark, sf, 0.15)
      .select("vec_a").union(
        Dedup.embedDup(spark, sf, 0.15).select("vec_b"))
      .distinct().count()
    assert(core.length < allNodes, "the peel must drop some nodes")
    // fixed point: a deeper round bound yields the identical core
    val deeper = Graph.kCore(spark, sf, maxRounds = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(deeper.toSeq === core.toSeq)
  }

  test("nfc normalize: decomposed unicode collapses to the composed form, " +
    "ASCII and already-composed text pass through unchanged (and the " +
    "digests then agree across representations)") {
    import spark.implicits._
    import graft.ops.TextAnalysis
    val dir = tmpDir("nfc")
    val composed = "caf\u00e9 touch\u00e9"     // \u00e9 = composed e-acute
    val decomposed = "cafe\u0301 touche\u0301" // e + combining acute
    Seq((0L, "plain ascii"), (1L, composed), (2L, decomposed))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.textNormalize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(!rows(0)._2 && !rows(1)._2, "ascii/composed must be unchanged")
    assert(rows(2)._2, "decomposed text must be rewritten")
    assert(rows(1)._3 === rows(2)._3 && rows(1)._4 === rows(2)._4,
      "both representations must normalize to the identical digest")
    // the codegen'd expression agrees with the JDK reference directly
    val viaExpr = spark.range(1).selectExpr(s"graft_nfc('$decomposed') AS n")
      .head().getString(0)
    assert(viaExpr === java.text.Normalizer.normalize(decomposed,
      java.text.Normalizer.Form.NFC))
  }

  test("lang mix: an injected code-switched doc is flagged with the right " +
    "majority and minority share; single-language docs stay clean") {
    import spark.implicits._
    import graft.ops.TextAnalysis
    val dir = tmpDir("langmix")
    val en = ("the cat and the dog and the bird " * 6).trim   // 48 en tokens
    val de = ("der hund und der vogel und die katze " * 6).trim // 48 de tokens
    Seq(
      (0L, s"$en $en $en"),      // 3 chunks en
      (1L, s"$en $de $en"),      // mixed: 2 en + 1 de
      (2L, de))                  // 1 chunk de
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.langMix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getBoolean(4), r.getDouble(5))).sortBy(_._1)
    assert(rows(0) === ((0L, 3L, 1L, "en", false, 0.0)))
    assert(rows(1)._3 === 2L && rows(1)._4 === "en" && rows(1)._5,
      s"code-switched doc must flag mixed: ${rows(1)}")
    assert(math.abs(rows(1)._6 - 0.3333) < 1e-9, "minority share = 1/3")
    assert(rows(2) === ((2L, 1L, 1L, "de", false, 0.0)))
  }

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
