package graft

import graft.ops.{Dedup, Similarity, Tables, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-6 additions: hybrid retrieval (reciprocal-rank fusion of the BM25
  * and cosine legs), hard-negative mining, and PMI collocation mining. The
  * DuckDB oracle pins exact values; these specs pin the closed forms and
  * the structural contracts driver-side, so a fixture change points at the
  * violated property rather than a bare hash mismatch. */
class Round6OpsSpec extends SparkSpec {

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def embeddings(): Array[(Long, Int, Array[Double])] =
    Tables(spark, sf, "embeddings").collect().map { r =>
      (r.getLong(0),
        r.getInt(2),
        r.getSeq[Float](1).map(_.toDouble).toArray)
    }

  // the same sequential-fold dot/norm graft_dot/graft_norm evaluate, so the
  // doubles are bit-identical with the operator's
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("rrf fusion: score is the closed form of its two rank legs, ranks " +
    "contiguous, both legs represented in the fixture's fused head") {
    val rows = Similarity.hybridRetrieve(spark, sf).collect()
    assert(rows.length === 20)
    rows.zipWithIndex.foreach { case (r, i) =>
      val (rank, lex, sem, rrf) =
        (r.getInt(0), r.getInt(2), r.getInt(3), r.getDouble(4))
      assert(rank === i + 1, "ranks must be contiguous from 1")
      assert(lex > 0 || sem > 0, "membership only ever comes from a leg")
      val expect = round4(
        (if (lex > 0) 1.0 / (60 + lex) else 0.0) +
          (if (sem > 0) 1.0 / (60 + sem) else 0.0))
      assert(rrf === expect, s"row $r must equal its closed form")
    }
    val rrfs = rows.map(_.getDouble(4))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b },
      "fused scores must be non-increasing")
    assert(rows.exists(_.getInt(2) > 0) && rows.exists(_.getInt(3) > 0),
      "fixture head must draw from both the lexical and the semantic leg")
    // docs in BOTH legs outrank a doc seen by one leg at the same position
    assert(rows.exists(r => r.getInt(2) > 0 && r.getInt(3) > 0),
      "fixture is known to have lexical-semantic overlap in the head")
  }

  test("rrf fusion: the lexical leg is exactly the standalone BM25 " +
    "operator's top-50 ranking") {
    val lexRank = TextAnalysis.bm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy { case (id, s) => (-s, id) }
      .take(50).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    Similarity.hybridRetrieve(spark, sf).collect().foreach { r =>
      assert(r.getInt(2) === lexRank.getOrElse(r.getLong(1), 0),
        s"lex_rank mismatch for doc ${r.getLong(1)}")
    }
  }

  test("rrf fusion: the semantic leg is the rounded-cosine ranking " +
    "against query vector 0") {
    val e = embeddings()
    val q = e.find(_._1 == 0L).get._3
    val semRank = e.filter(_._1 != 0L)
      .map { case (id, _, v) => (id, round4(cos(q, v))) }
      .sortBy { case (id, c) => (-c, id) }
      .take(50).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    Similarity.hybridRetrieve(spark, sf).collect().foreach { r =>
      assert(r.getInt(3) === semRank.getOrElse(r.getLong(1), 0),
        s"sem_rank mismatch for doc ${r.getLong(1)}")
    }
  }

  test("hard negatives: every negative crosses the label boundary and " +
    "each query's list is the true different-label cosine top-5") {
    val e = embeddings()
    val labelOf = e.map { case (id, l, _) => id -> l }.toMap
    val byQuery = Similarity.hardNegatives(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(byQuery.keySet === (0L until 10L).toSet)
    byQuery.foreach { case (qid, rows) =>
      val qVec = e.find(_._1 == qid).get._3
      val qLabel = labelOf(qid)
      val expect = e.filter { case (id, l, _) => l != qLabel }
        .map { case (id, l, v) => (id, l, cos(qVec, v)) }
        .sortBy { case (id, _, c) => (-c, id) }
        .take(5)
      val got = rows.sortBy(_.getInt(1))
      assert(got.length === 5)
      got.zip(expect).zipWithIndex.foreach { case ((g, (id, l, c)), i) =>
        assert(g.getInt(1) === i + 1)
        assert(g.getLong(2) === id, s"query $qid rank ${i + 1}")
        assert(g.getInt(3) === l)
        assert(g.getInt(3) !== qLabel, "a negative must cross the label boundary")
        assert(g.getDouble(4) === round4(c) + 0.0)
      }
    }
  }

  test("dedup apply: total disposition, representatives are cluster " +
    "minima and are themselves kept, drops exist in the fixture") {
    val clusters = Dedup.nearDupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Dedup.dedupApply(spark, sf).collect()
    assert(rows.length === Tables(spark, sf, "documents").count())
    rows.foreach { r =>
      val (id, cl, kept) = (r.getLong(0), r.getLong(1), r.getBoolean(2))
      assert(cl === clusters.getOrElse(id, id), s"doc $id cluster label")
      assert(kept === (cl == id), s"doc $id kept flag")
    }
    val keptSet = rows.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    rows.foreach(r => assert(keptSet.contains(r.getLong(1)),
      "every cluster label must itself be a kept representative"))
    assert(rows.exists(!_.getBoolean(2)),
      "fixture is known to contain near-dup clusters to drop")
  }

  test("sem dedup: total disposition, cos-to-centroid matches the " +
    "driver-side closed form, every dup pair loses a member, singletons " +
    "survive") {
    val rows = Dedup.semDedup(spark, sf).collect()
    val e = embeddings()
    assert(rows.length === e.length, "disposition must be total")
    def cellOf(v: Array[Double]): Int =
      (if (v(0) > 0) 8 else 0) + (if (v(1) > 0) 4 else 0) +
        (if (v(2) > 0) 2 else 0) + (if (v(3) > 0) 1 else 0)
    val cents = e.groupBy { case (_, label, v) => (label, cellOf(v)) }
      .map { case (k, ms) =>
        val dim = ms.head._3.length
        k -> Array.tabulate(dim)(d => ms.map(_._3(d)).sum / ms.length)
      }
    val byId = rows.map(r => r.getLong(0) ->
      ((r.getInt(1), r.getInt(2), r.getDouble(3), r.getLong(4), r.getBoolean(5)))).toMap
    e.foreach { case (id, label, v) =>
      val (gotLabel, gotCell, gotCos, _, _) = byId(id)
      assert(gotLabel === label)
      assert(gotCell === cellOf(v))
      assert(gotCos === round4(cos(v, cents((label, cellOf(v))))) + 0.0,
        s"vec $id cos-to-centroid")
    }
    val pairs = Dedup.embedDup(spark, sf).collect()
      .map(p => (p.getLong(0), p.getLong(1)))
    val neigh = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val ns = neigh.getOrElse(id, Array.empty[(Long, Long)].map(_._1))
      assert(r.getLong(4) === ns.length.toLong, s"vec $id n_dups")
      val hasBetter = ns.exists { j =>
        byId(j)._3 < r.getDouble(3) ||
          (byId(j)._3 == r.getDouble(3) && j < id)
      }
      assert(r.getBoolean(5) === !hasBetter, s"vec $id kept flag")
    }
    pairs.foreach { case (a, b) =>
      assert(!(byId(a)._5 && byId(b)._5),
        s"pair ($a,$b): both members kept — the keep-rule must drop one")
    }
    rows.filter(_.getLong(4) == 0L)
      .foreach(r => assert(r.getBoolean(5), "singletons must survive"))
    assert(rows.exists(!_.getBoolean(5)),
      "fixture is known to contain semantic dups to drop")
  }

  test("source cap: survivors are each source's cap-prefix in md5 order " +
    "(driver-side closed form), the fixture really gets capped, and the " +
    "salted two-stage ranking equals the single-window form") {
    val rows = graft.ops.Sampling.sourceCap(spark, sf).collect()
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def h(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft_cap:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val cap = math.max(10L, math.ceil(docs.length * 0.03).toLong)
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.sortBy { case (id, _) => (h(id), id) }.take(cap.toInt)
        .zipWithIndex
        .map { case ((id, _), i) => (src, i + 1, id, ds.length.toLong, cap) }
    }.toSet
    val got = rows.map(r => (r.getString(0), r.getInt(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet
    assert(got === expect)
    assert(rows.exists(r => r.getLong(3) > r.getLong(4)),
      "fixture must contain a source that actually gets capped")
    val unsalted = graft.ops.Sampling.sourceCap(spark, sf, salt = 1)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(unsalted === got,
      "salted two-stage must equal the single-window form")
  }

  test("source cap: an over-crawled source is cut to the alpha share " +
    "while the minCap floor keeps tiny sources whole") {
    // synthetic skew the uniform fixture can't produce: one source with
    // 180 of 200 docs, one with 15, one with 5
    val base = tmpDir("srccap")
    spark.range(200).selectExpr(
      "id AS doc_id",
      """CASE WHEN id < 180 THEN 'big' WHEN id < 195 THEN 'mid'
        |     ELSE 'tiny' END AS source""".stripMargin,
      "'x' AS text", "'en' AS lang", "1L AS n_chars")
      .write.mode("overwrite").parquet(s"$base/documents.parquet")
    // alpha 0.05 of 200 = cap 10 = the minCap floor
    val rows = graft.ops.Sampling.sourceCap(spark, base, alpha = 0.05)
      .collect()
    val kept = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(kept("big") === 10, "the over-crawled source is cut to the cap")
    assert(kept("mid") === 10, "mid source capped at the floor")
    assert(kept("tiny") === 5, "sources under the floor survive whole")
    rows.foreach(r => assert(r.getInt(1) <= r.getLong(4),
      "no survivor may rank past its source's cap"))
  }

  test("ivf-pq composite: equals the driver-side closed form — PQ ADC " +
    "ranking restricted to each query's probed IVF cells") {
    val rows = Similarity.ivfPqTopK(spark, sf).collect()
    val e = embeddings().map { case (id, _, v) => (id, v) }.sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); i += 1 }
      d
    }
    val norms = e.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val seeds = e.filter(_._1 < 8)
    // strict-> fold over seeds in id order: first max wins, like the
    // operator's assignStruct
    def cellOf(v: Array[Double], nv: Double): Long = {
      var best = -2.0; var cell = -1L
      seeds.foreach { case (sid, sv) =>
        val c = dot(v, sv) / (nv * norms(sid))
        if (c > best) { best = c; cell = sid }
      }
      cell
    }
    val cells = e.map { case (id, v) => id -> cellOf(v, norms(id)) }.toMap
    val probes = e.filter(_._1 < 10).map { case (qid, v) =>
      qid -> seeds.map { case (sid, sv) =>
        (dot(v, sv) / (norms(qid) * norms(sid)), sid)
      }.sortBy { case (c, sid) => (-c, sid) }.take(2).map(_._2).toSet
    }.toMap
    // PQ over m=8 subspaces of 8 dims with the 16 seed codewords
    def subv(v: Array[Double], s: Int): Array[Double] =
      v.slice(s * 8, s * 8 + 8)
    val cb = e.filter(_._1 < 16).flatMap { case (j, v) =>
      (0 until 8).map(s => (s, j, subv(v, s)))
    }
    def codeOf(v: Array[Double], s: Int): Long = {
      val sv = subv(v, s); val nn = dot(sv, sv)
      cb.filter(_._1 == s).map { case (_, j, cv) =>
        (nn + dot(cv, cv) - 2.0 * dot(sv, cv), j)
      }.minBy(identity)._2
    }
    val codes = e.map { case (id, v) =>
      id -> Array.tabulate(8)(s => codeOf(v, s))
    }.toMap
    // mirror Spark's Round(HALF_UP over the decimal string form) exactly
    def di(qv: Array[Double], s: Int, j: Long): Long = {
      val sv = subv(qv, s)
      val cv = cb.find(c => c._1 == s && c._2 == j).get._3
      val d = (dot(sv, sv) + dot(cv, cv) - 2.0 * dot(sv, cv)) * 1e6
      java.math.BigDecimal.valueOf(d)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    }
    val expect = probes.toSeq.flatMap { case (qid, pcs) =>
      val qv = e.find(_._1 == qid).get._2
      e.collect { case (id, _) if id != qid && pcs(cells(id)) =>
        (id, (0 until 8).map(s => di(qv, s, codes(id)(s))).sum)
      }.sortBy { case (id, d) => (d, id) }.take(5).zipWithIndex
        .map { case ((id, d), i) => (qid, i + 1, id, d) }
    }.toSet
    val got = rows.map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expect)
    assert(rows.length === 50, "10 queries x top-5, all cells populated")
  }

  test("ivf-pq composite: the probe cut loses little vs unrestricted PQ " +
    "on the fixture (the accuracy knob is nProbe, not the dataflow)") {
    val full = Similarity.pqTopK(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val cut = Similarity.ivfPqTopK(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val overlap = full.keys.toSeq
      .map(q => cut(q).intersect(full(q)).size.toDouble / full(q).size)
      .sum / full.size
    // measured 0.66 with nProbe=2 of 8 cells; chance would be ~nProbe/nCells
    // of the PQ list only when cells are balanced — well above that floor
    assert(overlap >= 0.4, s"probe-cut overlap with full PQ: $overlap")
  }

  // corpus substring inventory: piece -> word-frequency-weighted count,
  // the closed form shared by the two unigram-tokenizer specs
  private def pieceFreqs(): (Map[String, Long], Map[String, Long]) = {
    val toks = Tables(spark, sf, "documents").select(col("text")).collect()
      .flatMap(_.getString(0).split(" ")).filter(_.nonEmpty)
    val tc = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pf = collection.mutable.Map.empty[String, Long]
    tc.foreach { case (w, c) =>
      for (i <- 0 until w.length; j <- (i + 1) to math.min(i + 4, w.length)) {
        val p = w.substring(i, j)
        pf(p) = pf.getOrElse(p, 0L) + c
      }
    }
    (tc, pf.toMap)
  }

  test("unigram counts: the ranked inventory equals the driver-side " +
    "substring fold") {
    val rows = TextAnalysis.unigramCounts(spark, sf).collect()
    val (_, pf) = pieceFreqs()
    val top = pf.toSeq.sortBy { case (p, f) => (-f, p) }.take(64)
    assert(rows.length === top.length)
    rows.zip(top).zipWithIndex.foreach { case ((r, (p, f)), i) =>
      assert(r.getInt(0) === i + 1, "ranks contiguous")
      assert(r.getString(1) === p, s"piece at rank ${i + 1}")
      assert(r.getInt(2) === p.length)
      assert(r.getLong(3) === f, s"freq of $p")
    }
  }

  test("unigram encode: the packed-integer Viterbi DP matches the " +
    "driver-side closed form — fewest pieces, ties toward path mass") {
    val rows = TextAnalysis.unigramEncode(spark, sf).collect()
    val (tc, pf) = pieceFreqs()
    val vocab = (pf.toSeq.sortBy { case (p, f) => (-f, p) }.take(64) ++
      pf.filter(_._1.length == 1)).toMap
    val stride = 1L << 40
    val big = Long.MaxValue / 4
    def dp(w: String): (Int, Long) = {
      val best = Array.fill(w.length + 1)(big); best(0) = 0L
      for (i <- 1 to w.length; l <- 1 to math.min(4, i)) {
        vocab.get(w.substring(i - l, i)).foreach { f =>
          val cand = best(i - l) + stride - f
          if (cand < best(i)) best(i) = cand
        }
      }
      val n = (best(w.length) / stride + 1).toInt
      (n, n * stride - best(w.length))
    }
    val got = rows.map(r => r.getString(0) ->
      ((r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    assert(got.size === tc.size, "one disposition row per distinct word")
    tc.foreach { case (w, c) =>
      val (n, mass) = dp(w)
      assert(got(w) === ((c, w.length, n, mass)), s"word $w")
      assert(n >= (w.length + 3) / 4 && n <= w.length, s"piece bounds for $w")
    }
    assert(rows.exists(_.getInt(3) > 1),
      "fixture must contain words the vocabulary cannot cover whole")
  }

  test("token budget: the histogram refinement equals the single-window " +
    "greedy prefix, the budget binds tight, and the disposition is total") {
    val rows = graft.ops.Sampling.tokenBudget(spark, sf).collect()
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val t = r.getString(1).split(" ", -1)
        (r.getLong(0), t.length.toLong,
          java.math.BigDecimal.valueOf(t.distinct.length.toDouble / t.length)
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue)
      }
    assert(rows.length === docs.length, "disposition must be total")
    // the single-window closed form: greedy quality-ordered prefix
    var cum = 0L
    val kept = docs.sortBy { case (id, _, s) => (-s, id) }.map {
      case (id, n, _) => cum += n; id -> (cum <= 15000L)
    }.toMap
    val got = rows.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    docs.foreach { case (id, n, s) =>
      assert(got(id) === ((n, s, kept(id))), s"doc $id")
    }
    val keptTok = docs.filter(d => kept(d._1)).map(_._2).sum
    assert(keptTok <= 15000L, "budget respected")
    // tight: the next doc in greedy order would not have fit
    val firstDropped = docs.sortBy { case (id, _, s) => (-s, id) }
      .find(d => !kept(d._1))
    firstDropped.foreach(d =>
      assert(keptTok + d._2 > 15000L, "greedy prefix is maximal"))
    assert(rows.exists(!_.getBoolean(3)) && rows.exists(_.getBoolean(3)),
      "fixture must straddle the budget")
  }

  test("jl projection: exact md5-sign closed form per component, and " +
    "pairwise distances preserved in the JL sense on sampled pairs") {
    val rows = Similarity.jlProject(spark, sf).collect()
    val e = embeddings()
    assert(rows.length === e.length * 16)
    def sgn(r: Int, d: Int): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft_jl:$r:$d".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
    }
    val mat = Array.tabulate(16, 64)((r, d) => sgn(r, d))
    def projRaw(v: Array[Double]): Array[Double] =
      Array.tabulate(16) { r =>
        var acc = 0.0; var d = 0
        while (d < 64) { acc += mat(r)(d) * v(d); d += 1 }
        acc / 4.0
      }
    val byKey = rows.map(r =>
      (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val raw = e.map { case (id, _, v) => id -> projRaw(v) }.toMap
    e.foreach { case (id, _, _) =>
      (0 until 16).foreach { r =>
        val expect = java.math.BigDecimal.valueOf(raw(id)(r))
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue + 0.0
        assert(byKey((id, r)) === expect, s"vec $id component $r")
      }
    }
    // JL guarantee (k = 16): E[||p(a)-p(b)||^2] = ||a-b||^2; the mean
    // ratio over sampled pairs concentrates near 1
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val sample = e.take(40)
    val ratios = for {
      i <- sample.indices; j <- (i + 1) until sample.length
    } yield d2(raw(sample(i)._1), raw(sample(j)._1)) /
      d2(sample(i)._3, sample(j)._3)
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2,
      s"mean projected/original distance ratio $mean must concentrate near 1")
  }

  test("bpe encode: driver-side re-encode with the learned merge table " +
    "reproduces every doc's token stats exactly") {
    val table = TextAnalysis.bpeFit(spark, sf, 8).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2)))
    assert(table.nonEmpty, "the fixture must yield learnable merges")
    // the same greedy left-to-right single-merge fold the operator (and
    // the trainer) applies, re-implemented independently
    def encode(tok: String): Long = {
      var syms: Vector[String] = tok.split("").toVector
      table.foreach { case (a, b) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (out.nonEmpty && out.last == a && x == b)
            out(out.length - 1) = a + b
          else out += x
        }
        syms = out.toVector
      }
      syms.length.toLong
    }
    val texts = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
    val got = TextAnalysis.bpeEncode(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size === texts.length, "every doc must report")
    texts.foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val words = text.split(" ", -1)
      val nTok = words.map(encode).sum
      assert(got(id) === ((words.length.toLong, nTok,
        round4(text.length.toDouble / nTok))), s"doc $id")
    }
    // and the merges must actually compress: fewer BPE tokens than chars
    assert(texts.exists { r =>
      got(r.getLong(0))._2 < r.getString(1).replace(" ", "").length
    }, "learned merges should compress at least one fixture doc")
  }

  test("bpe encode: a corpus with no learnable merges (all 1-char words) " +
    "degrades to character tokenization instead of failing analysis") {
    val dir = tmpDir("bpedegen")
    spark.createDataFrame(Seq((1L, "a b c"), (2L, "x y")))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.bpeEncode(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((3L, 3L, round4(5.0 / 3))))
    assert(got(2L) === ((2L, 2L, round4(3.0 / 2))))
  }

  test("pmi collocations: counts respect the floor and pmi equals the " +
    "closed form over driver-recomputed corpus counts") {
    val texts = Tables(spark, sf, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val big = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val w = t.split(" ", -1)
      w.foreach(x => uni(x) = uni.getOrElse(x, 0L) + 1)
      w.sliding(2).foreach {
        case Array(a, b) => big((a, b)) = big.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    val nTok = uni.values.sum.toDouble
    val nPair = big.values.sum.toDouble
    val got = TextAnalysis.pmiCollocations(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 25)
    got.zipWithIndex.foreach { case (r, i) =>
      val (rank, w1, w2, cab, pmi) = (r.getInt(0), r.getString(1),
        r.getString(2), r.getLong(3), r.getDouble(4))
      assert(rank === i + 1)
      assert(cab >= 5, "minCount floor")
      assert(cab === big((w1, w2)), s"pair count for ($w1,$w2)")
      val expect = round4(math.log(
        (cab / nPair) / ((uni(w1) / nTok) * (uni(w2) / nTok)))) + 0.0
      assert(pmi === expect, s"pmi closed form for ($w1,$w2)")
    }
    val pmis = got.map(_.getDouble(4))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b })
    // and the head is the true argmax over ALL eligible pairs
    val best = big.filter(_._2 >= 5).map { case ((a, b), c) =>
      ((a, b), round4(math.log((c / nPair) / ((uni(a) / nTok) * (uni(b) / nTok)))) + 0.0)
    }.toSeq.sortBy { case ((a, b), p) => (-p, a, b) }.head
    assert((got.head.getString(1), got.head.getString(2)) === best._1)
    assert(got.head.getDouble(4) === best._2)
  }
}
