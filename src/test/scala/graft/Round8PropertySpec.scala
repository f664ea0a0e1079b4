package graft

import org.apache.spark.sql.functions._

/** Property pins for the round-8 operators — each test verifies a
  * MATHEMATICAL contract against an independent (usually driver-side
  * brute-force) derivation, not a remembered output: FastSS candidate
  * completeness, Kneser-Ney properness, histogram-ECDF error bounds,
  * DBSCAN role geometry, association-rule symmetry, transition-matrix
  * stochasticity. These are the claims the scaladocs make; here they are
  * checked. */
class Round8PropertySpec extends SparkSpec {


  /** Union-find component identity over an undirected pair list — shared
    * by the dbscan and label-prop geometry tests (review r11: two
    * byte-identical inline copies). */
  private def unionFind(pairs: Array[(Long, Long)]): Long => Long = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    find
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("edit dedup: the SymSpell candidate set is COMPLETE — equals " +
    "brute-force all-pairs levenshtein <= 1 over the distinct keys") {
    val keys = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "substring(lower(text), 1, 12) as k")
      .groupBy(col("k")).agg(min(col("doc_id")).as("rep"))
      .collect().map(r => (r.getAs[Long]("rep"), r.getAs[String]("k")))
    val brute = (for {
      (ra, ka) <- keys; (rb, kb) <- keys
      if ra < rb && lev(ka, kb) <= 1
    } yield (ra, rb)).toSet
    val got = graft.ops.Dedup.editDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute,
      s"FastSS exactness: missing=${brute -- got} extra=${got -- brute}")
  }

  test("kneser-ney: knLmScore reproduces the closed-form P(w2|w1) on a " +
    "STAGED single-bigram corpus, and P(.|w1) is a proper distribution " +
    "(review r11: the old test recomputed its own formula driver-side and " +
    "never called the production op at all)") {
    import spark.implicits._
    // 6 single-bigram docs: each doc's avg_logp_kn IS log P(w2|w1), so the
    // production statistics (c2, c1, n1fw, n1bw, n1tot) are fully exposed
    val corpus = Seq("a b", "a b", "a c", "b c", "b a", "c a")
    val dir = tmpDir("kn-closed")
    corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val bigrams = corpus.map(_.split(" ")).map(t => (t(0), t(1)))
    val c2 = bigrams.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val c1 = bigrams.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n1fw = c2.keys.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n1bw = c2.keys.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val n1tot = c2.size.toDouble
    def p(w1: String, w2: String): Double =
      math.max(c2.getOrElse((w1, w2), 0.0) - 0.75, 0.0) / c1(w1) +
        0.75 * n1fw(w1) / c1(w1) * (n1bw(w2) / n1tot)
    val got = graft.ops.TextAnalysis.knLmScore(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === corpus.indices.map(_.toLong).toSet)
    corpus.zipWithIndex.foreach { case (t, i) =>
      val Array(w1, w2) = t.split(" ")
      val (nBig, avgLogp) = got(i.toLong)
      assert(nBig === 1L)
      assert(math.abs(avgLogp -
        BigDecimal(math.log(p(w1, w2)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) <= 1e-9,
        s"doc $i ('$t'): knLmScore $avgLogp vs closed form ${math.log(p(w1, w2))}")
    }
    // and the closed form itself is proper for every context
    val vocab = c2.keys.map(_._2).toSeq.distinct
    for (w1 <- c1.keys) {
      val total = vocab.map(p(w1, _)).sum
      assert(math.abs(total - 1.0) < 1e-12,
        s"KN must be proper for context '$w1': $total")
    }
  }

  test("quantile norm: the histogram ECDF is within the largest bucket's " +
    "half-share of the exact per-doc midpoint percentile") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "lang",
        "cast(size(split(text, ' ')) as long) as n_tok")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_tok")))
    val byLang = docs.groupBy(_._2)
    // exact midpoint percentile of each doc's score within its language
    val exact = docs.map { case (id, lang, s) =>
      val xs = byLang(lang).map(_._3)
      val below = xs.count(_ < s).toDouble
      val eq = xs.count(_ === s).toDouble
      id -> (below + eq / 2.0) / xs.length
    }.toMap
    // the doc's OWN (lang, bucket) share, not the global max (review r11:
    // the global bound ~0.127 was loose enough to miss one-bucket-off
    // assignment errors)
    val ownShare = docs.map { case (id, lang, s) =>
      val xs = byLang(lang).map(_._3)
      id -> xs.count(_ / 16 == s / 16).toDouble / xs.length
    }.toMap
    val got = graft.ops.Sampling.quantileNorm(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got.keySet === exact.keySet,
      "quantileNorm must score every doc — a dropped-doc regression must " +
        "not pass as a smaller loop")
    got.foreach { case (id, pct) =>
      assert(math.abs(pct - exact(id)) <= ownShare(id) / 2 + 1e-4,
        s"doc $id: ecdf $pct vs exact ${exact(id)}, " +
          s"bound ${ownShare(id) / 2}")
    }
  }

  test("dbscan: roles partition the graph correctly — cores have degree " +
    ">= minPts, borders touch a core, noise touches none, and every " +
    "cluster label is a core id in the member's own component") {
    val pairs = graft.ops.Dedup.embedDup(spark, sf, 0.15).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val cores = adj.filter(_._2.size >= 3).keySet
    val find = unionFind(pairs)
    val rows = graft.ops.Graph.dbscan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._1).toSet === adj.keySet, "exactly the graph nodes")
    rows.foreach { case (n, role, c) =>
      role match {
        case "core" =>
          assert(cores(n) && cores(c) && find(c) == find(n),
            s"core $n -> $c must label with a same-component core")
        case "border" =>
          assert(!cores(n) && adj(n).exists(cores), s"border $n needs a core")
          assert(cores(c) && adj(n).exists(m => cores(m) && find(m) == find(c)),
            s"border $n cluster $c must come from an adjacent core's component")
        case "noise" =>
          assert(!cores(n) && !adj(n).exists(cores) && c == -1L,
            s"noise $n must touch no core")
      }
    }
  }

  test("association rules: lift and pair support are direction-symmetric " +
    "and confidence never exceeds 1") {
    val rows = graft.ops.FrequentItems.assocRules(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((a, b), (n, sup, conf, lift)) =>
      val rev = rows((b, a))
      assert(rev._1 === n && rev._2 === sup && rev._4 === lift,
        s"($a,$b) vs ($b,$a): support/lift must be symmetric")
      assert(conf > 0.0 && conf <= 1.0, s"confidence out of range: $conf")
    }
  }

  test("markov paths: every source state's outgoing probabilities sum " +
    "to 1 within rounding resolution") {
    val rows = graft.ops.Relational.markovPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(3)))
    assert(rows.nonEmpty) // a zero-row regression must not pass vacuously
    rows.groupBy(_._1).foreach { case (src, ps) =>
      val total = ps.map(_._2).sum
      assert(math.abs(total - 1.0) <= 0.00005 * ps.length + 1e-9,
        s"$src: rounded row must stay stochastic, got $total")
    }
  }

  test("label prop: every community label is a member of the node's own " +
    "connected component and community sizes total the node count") {
    val pairs = graft.ops.Dedup.embedDup(spark, sf, 0.15).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    val find = unionFind(pairs)
    val rows = graft.ops.Graph.labelProp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exact node coverage (review r11): an empty or partial result must
    // not pass the per-row loops vacuously
    assert(rows.map(_._1).toSet === pairs.flatMap(p => Seq(p._1, p._2)).toSet,
      "labelProp must cover exactly the graph nodes")
    rows.foreach { case (n, c, _) =>
      assert(find(c) == find(n),
        s"node $n labeled $c from a different component")
    }
    val sizes = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (n, c, sz) =>
      assert(sizes(c) === sz, s"node $n community_size drifted")
    }
  }
}
