package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Round-7 additions: the real-codec multimodal tier. */
class Round7OpsSpec extends SparkSpec {

  test("png view: payloads are genuine PNG containers, not repackaged text") {
    val rows = Multimodal.pngView(spark, sf).take(20)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.payload
      // PNG signature + IHDR chunk header — a real container layout
      assert(p.length > 16, s"doc ${r.doc_id}: payload too short for a PNG")
      assert((p(0) & 0xff) === 0x89 && p(1) === 'P'.toByte &&
        p(2) === 'N'.toByte && p(3) === 'G'.toByte,
        s"doc ${r.doc_id}: missing PNG signature")
      assert(new String(p.slice(12, 16), "US-ASCII") === "IHDR",
        s"doc ${r.doc_id}: missing IHDR chunk")
    }
  }

  test("png decode: javax.imageio roundtrip reproduces the generator's " +
    "shape and pixel checksum exactly (PNG is lossless)") {
    val metas = Multimodal.decodePng(spark, sf).collect()
    val total = ops.Tables(spark, sf, "documents").count()
    assert(metas.length.toLong === total)
    metas.foreach { m =>
      val id = m.doc_id
      val (w, h) = ((id % 13).toInt + 1, (id % 7).toInt + 1)
      assert(m.is_png, s"doc $id: signature sniff failed")
      assert(m.width === w && m.height === h,
        s"doc $id: decoder shape ${m.width}x${m.height}, generated ${w}x$h")
      var want = 0L
      for (y <- 0 until h; x <- 0 until w)
        want += (id + 31L * x + 17L * y) % 256L
      assert(m.px_sum === want, s"doc $id: decoded pixel checksum drifted")
    }
  }

  test("gap-fill: every user's day axis is dense from first to last " +
    "event, zero-filled, and sums back to the raw event count") {
    val rows = ops.Relational.gapFill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = ops.Tables.events(spark, sf).count()
    assert(rows.map(_._3).sum === total, "zero-fill must not invent events")
    rows.groupBy(_._1).foreach { case (u, ds) =>
      val days = ds.map(_._2).sorted
      assert(days.last - days.head + 1 === days.length.toLong,
        s"user $u: day axis has gaps")
      assert(days.distinct.length === days.length, s"user $u: duplicate days")
    }
    assert(rows.exists(_._3 == 0L),
      "the fixture spans quiet days; at least one zero row must appear")
  }

  test("unigram hard-EM round: re-estimated mass equals the Viterbi piece " +
    "budget exactly, and no piece is used more often than it occurs") {
    import graft.ops.TextAnalysis
    val em = TextAnalysis.unigramEmRound(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(em.nonEmpty)
    // usage is a subset of raw substring occurrence
    em.foreach { case (p, freq, emFreq) =>
      assert(emFreq <= freq, s"piece '$p' used $emFreq > occurs $freq")
    }
    // the M-step conserves mass: total piece usage == the corpus-weighted
    // Viterbi piece count the encoder reports (same DP, same tie rule)
    val enc = TextAnalysis.unigramEncode(spark, sf).collect()
    val budget = enc.map(r =>
      r.getAs[Long]("n_occ") * r.getAs[Int]("n_pieces")).sum
    assert(em.map(_._3).sum === budget,
      "EM usage mass must equal the encoder's corpus-weighted piece count")
    // the E-step is selective: some seed piece must lose all its usage
    assert(em.exists(_._3 == 0L),
      "the fixture vocabulary overlaps; at least one piece must re-estimate to 0")
  }

  test("unigram prune: chars always survive, exactly the top-80% of " +
    "multi-char pieces are kept, dropped pieces lose all usage, and " +
    "segmentations can only lengthen") {
    import graft.ops.TextAnalysis
    val rows = TextAnalysis.unigramPrune(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    val (chars, multi) = rows.partition(_._1.length == 1)
    assert(chars.nonEmpty && chars.forall(_._3), "every char must survive")
    val keptMulti = multi.count(_._3)
    assert(keptMulti === math.ceil(0.8 * multi.length).toLong,
      s"kept $keptMulti of ${multi.length} multi-char pieces")
    rows.filterNot(_._3).foreach { case (p, _, _, em2) =>
      assert(em2 === 0L, s"dropped piece '$p' still used $em2 times")
    }
    // fewer pieces available => each word needs at least as many pieces
    assert(rows.map(_._4).sum >= rows.map(_._2).sum,
      "pruning cannot shorten optimal segmentations")
  }

  test("embedding decontamination: every test-split doc is screened once " +
    "and the flag matches a driver-side brute force") {
    import graft.ops.Similarity
    val rows = Similarity.decontaminateEmbed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    val emb = ops.Tables(spark, sf, "embeddings").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray.map(_.toDouble)))
    // mirrors TextAnalysis.splitHash (review r11: the spec replication
    // was missed when the production hash gained its overflow wrap)
    val testIds = emb.map(_._1)
      .filter(id => Math.floorMod((id % 2147483647L) * 2654435761L, 100L) >= 80)
      .toSet
    assert(rows.map(_._1).toSet === testIds, "screen must cover the test split")
    assert(rows.length === testIds.size)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val train = emb.filterNot(e => testIds(e._1))
    val byId = emb.toMap
    rows.take(5).foreach { case (id, mcRounded, flag) =>
      val mc = train.map(t => cos(byId(id), t._2)).max
      assert(math.abs(mcRounded - math.rint(mc * 10000) / 10000) < 1e-9,
        s"doc $id: reported $mcRounded vs brute-force $mc")
      assert(flag === (mc >= 0.5), s"doc $id: flag disagrees at mc=$mc")
    }
  }

  test("windowed drift: one row per day after the first, PSI non-negative " +
    "(each term has matching signs), day totals exact") {
    import graft.ops.Drift
    val rows = Drift.driftWindowed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val dayCounts = ops.Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("day").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length === dayCounts.size - 1,
      "every day but the first must score against its predecessor")
    rows.foreach { case (day, n, psi) =>
      assert(psi >= 0.0, s"day $day: PSI $psi negative")
      assert(n === dayCounts(day), s"day $day: n_events $n")
    }
  }

  test("png decode fails loud on a corrupt payload") {
    import spark.implicits._
    val bad = Seq(Multimodal.PngRow(1L, Array[Byte](1, 2, 3, 4))).toDS()
    val ex = intercept[org.apache.spark.SparkException] {
      // same decode body as decodePng, driven through the public dataset
      bad.mapPartitions(_.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"doc ${r.doc_id}: payload is not a decodable image")
        r.doc_id
      }).collect()
    }
    assert(ex.getMessage.contains("not a decodable image") ||
      Option(ex.getCause).exists(_.getMessage.contains("not a decodable image")))
  }
}
