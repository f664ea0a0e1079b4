package graft

import scala.collection.mutable

import graft.ops.{FrequentItems, Graph, Sampling, Tables, TextAnalysis}
import org.apache.spark.sql.functions._

/** Fifth round-6 batch: A-ES weighted sampling, Misra-Gries exact heavy
  * hitters, WordPiece greedy encoding, integer-micro-unit PageRank. Each
  * op is oracle-checked by the driver; these specs pin the driver-side
  * closed forms and the sketch/greedy/power-iteration contracts so a
  * fixture change points at the violated property, not a hash mismatch. */
class BatchFiveOpsSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def tokensOf(text: String): Array[String] =
    text.split(" ", -1).filter(_.nonEmpty)

  private def corpus(): Array[(Long, String)] =
    Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  // ---------------------------------------------------------------- A-ES

  test("weighted sample: equals the driver-side Efraimidis-Spirakis " +
    "closed form, ranks contiguous, keys non-decreasing") {
    val expect = corpus().map { case (id, text) =>
      val w = text.split(" ", -1).length.toLong
      val u = (java.lang.Long.parseLong(
        md5hex(s"graft_wsample:$id").take(12), 16) + 0.5) / 281474976710656.0
      (id, w, -math.log(u) / w)
    }.sortBy { case (id, _, k) => (k, id) }.take(48)
    val got = Sampling.weightedSample(spark, sf).collect()
    assert(got.length === 48)
    got.zip(expect).zipWithIndex.foreach { case ((g, (id, w, k)), i) =>
      assert(g.getInt(0) === i + 1, "ranks contiguous from 1")
      assert(g.getLong(1) === id && g.getLong(2) === w)
      assert(g.getDouble(3) ===
        BigDecimal(k).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val keys = got.map(_.getDouble(3))
    assert(keys.zip(keys.tail).forall { case (a, b) => a <= b },
      "A-ES keys must be non-decreasing in rank order")
  }

  // ----------------------------------------------------- heavy hitters

  test("heavy hitters: equals the exact groupBy answer at gate support") {
    val counts = mutable.HashMap.empty[String, Long]
    corpus().foreach { case (_, t) =>
      tokensOf(t).foreach(tok => counts.update(tok, counts.getOrElse(tok, 0L) + 1))
    }
    val total = counts.values.sum
    val threshold = math.ceil(0.01 * total).toLong
    val expect = counts.filter(_._2 >= threshold).toArray
      .sortBy { case (tok, c) => (-c, tok) }
    val got = FrequentItems.heavyHitters(spark, sf).collect()
    assert(got.length === expect.length && got.length > 0)
    got.zip(expect).foreach { case (g, (tok, c)) =>
      assert(g.getString(0) === tok && g.getLong(1) === c)
      assert(g.getDouble(2) === BigDecimal(c.toDouble / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("heavy hitters: answer is partitioning-invariant even though the " +
    "candidate set is not") {
    val toks = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val exact = mutable.HashMap.empty[String, Long]
    corpus().foreach { case (_, t) =>
      tokensOf(t).foreach(tok => exact.update(tok, exact.getOrElse(tok, 0L) + 1))
    }
    val total = exact.values.sum
    val threshold = math.ceil(0.01 * total).toLong
    val trueHH = exact.filter(_._2 >= threshold).keySet
    val answers = Seq(1, 7, 32).map { p =>
      val (n, summary) =
        FrequentItems.mgCandidates(spark, toks.repartition(p), capacity = 128)
      assert(n === total, "stream length is exact under any partitioning")
      assert(summary.size <= 128)
      // superset guarantee: 0.01 > 1/129, so candidates cover the truth...
      assert(trueHH.subsetOf(summary.keySet),
        s"true heavy hitters must survive the merged summary at p=$p")
      // ...and the exact recount of candidates is the one deterministic answer
      summary.keySet.filter(t => exact(t) >= threshold)
    }
    assert(answers.distinct.size === 1 && answers.head === trueHH,
      "the recounted answer is partitioning-invariant and exact")
  }

  test("misra-gries kernel: superset guarantee and capacity bound on an " +
    "adversarial decrement-heavy stream") {
    import spark.implicits._
    // 60% one hot key, the rest a long tail of singletons: every insert of
    // a fresh tail key at capacity triggers a decrement-all
    val stream = Array.fill(300)("hot") ++ (1 to 200).map(i => s"tail$i")
    val toks = spark.createDataset(stream.toSeq).toDF("tok").repartition(5)
    val (n, summary) = FrequentItems.mgCandidates(spark, toks, capacity = 4)
    assert(n === 500)
    assert(summary.size <= 4, "summary never exceeds capacity")
    assert(summary.contains("hot"),
      "an item with count > n/(capacity+1) must survive the merged summary")
    // and the surviving estimate is within the MG error bound
    assert(summary("hot") >= 300 - 500 / 5, "estimate >= count - n/(C+1)")
  }

  // -------------------------------------------------- wordpiece encode

  test("wordpiece encode: matches the driver-side greedy longest-match " +
    "closed form against the top-64 piece vocabulary") {
    val freqs = mutable.HashMap.empty[String, Long]
    val words = mutable.HashMap.empty[String, Long]
    corpus().foreach { case (_, t) =>
      tokensOf(t).foreach { w => words.update(w, words.getOrElse(w, 0L) + 1) }
    }
    words.foreach { case (w, c) =>
      for (i <- 0 until w.length; j <- i + 1 to math.min(i + 4, w.length)) {
        val p = w.substring(i, j)
        freqs.update(p, freqs.getOrElse(p, 0L) + c)
      }
    }
    val vocab = freqs.toArray.sortBy { case (p, f) => (-f, p) }
      .take(64).map(_._1).toSet
    def greedy(w: String): (Int, Int) = {
      var pos = 0; var np = 0; var nu = 0
      while (pos < w.length) {
        val l = (math.min(4, w.length - pos) to 1 by -1)
          .find(l => vocab.contains(w.substring(pos, pos + l))).getOrElse(0)
        if (l == 0) { nu += 1; pos += 1 } else pos += l
        np += 1
      }
      (np, nu)
    }
    val got = TextAnalysis.wordpieceEncode(spark, sf).collect()
    assert(got.length === words.size)
    got.foreach { r =>
      val (tok, nOcc, nChars, nPieces, nUnk) =
        (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4))
      val (np, nu) = greedy(tok)
      assert(nOcc === words(tok) && nChars === tok.length)
      assert(nPieces === np, s"greedy piece count for '$tok'")
      assert(nUnk === nu, s"greedy unk count for '$tok'")
      assert(nPieces >= (nChars + 3) / 4 && nPieces <= nChars,
        "piece count bounded by maxLen and by characters")
      assert(nUnk <= nPieces)
    }
  }

  test("wordpiece encode: greedy is never better than the unigram Viterbi " +
    "optimum under a superset vocabulary") {
    // unigramEncode's vocabulary is the same top-64 UNION all single chars,
    // and Viterbi minimizes pieces — so its n_pieces is a lower bound.
    val viterbi = TextAnalysis.unigramEncode(spark, sf).collect()
      .map(r => r.getString(0) -> r.getInt(3)).toMap
    val greedy = TextAnalysis.wordpieceEncode(spark, sf).collect()
    assert(greedy.nonEmpty)
    greedy.foreach { r =>
      assert(r.getInt(3) >= viterbi(r.getString(0)),
        s"greedy(${r.getString(0)}) can't beat the optimal segmentation")
    }
  }

  // ------------------------------------------------------------ pagerank

  test("pagerank: equals the driver-side integer power iteration and " +
    "conserves mass up to floor leakage") {
    val emb = Tables(spark, sf, "embeddings").collect().map { r =>
      (r.getLong(0), r.getInt(2), r.getSeq[Float](1).map(_.toDouble).toArray)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def cell(v: Array[Double]): Int =
      (if (v(0) > 0) 8 else 0) + (if (v(1) > 0) 4 else 0) +
        (if (v(2) > 0) 2 else 0) + (if (v(3) > 0) 1 else 0)
    val edges = for {
      a <- emb; b <- emb
      if a._1 < b._1 && a._2 == b._2 && cell(a._3) == cell(b._3)
      c = BigDecimal(cos(a._3, b._3))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= 0.3
    } yield (a._1, b._1)
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
      adj.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += a
    }
    val n = adj.size.toLong
    val scale = 1000000000000L
    var r = adj.keys.map(k => k -> scale / n).toMap
    for (_ <- 1 to 6) {
      val next = mutable.HashMap.empty[Long, Long]
      adj.foreach { case (src, dsts) =>
        val contrib = (85L * r(src)) / (100L * dsts.length)
        dsts.foreach(d => next.update(d, next.getOrElse(d, 0L) + contrib))
      }
      r = next.map { case (k, s) => k -> (15000000000000L / (100L * n) + s) }.toMap
    }
    val got = Graph.pageRank(spark, sf).collect()
    assert(got.length === n.toInt && n > 0)
    got.foreach { row =>
      val (id, micro, rank) = (row.getLong(0), row.getLong(1), row.getDouble(2))
      assert(micro === r(id), s"integer rank for node $id is engine-exact")
      assert(rank === BigDecimal(micro.toDouble / scale)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(micro >= 15000000000000L / (100L * n), "rank >= teleport floor")
    }
    // mass conservation: floors only ever LOSE micro-units — at most one
    // per teleport term and one per directed-edge contribution, geometric
    // in the damping — so total mass sits just under 1.0
    val mass = got.map(_.getLong(1)).sum
    assert(mass <= scale &&
      mass >= scale - 10L * (n + 2L * edges.length) - n,
      "total mass bounded above by 1.0 and below by floor leakage")
  }
}
