package graft

import java.sql.Timestamp

import graft.ops.{Dedup, FrequentItems, Graph, QualityChecks, Sampling, TextAnalysis}

/** Semantics + edge posture of the round-8 third batch: LPA communities,
  * SymSpell edit dedup, ROUGE-2 pairs, histogram-ECDF quantile norm,
  * k-anonymity audit, Apriori association rules. Hand-built fixtures with
  * closed-form expected outputs, staged as parquet so the real read paths
  * run. */
class BatchTenOpsSpec extends SparkSpec {

  private def stage(dir: String, table: String)(df: org.apache.spark.sql.DataFrame): String = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$table.parquet")
    dir
  }

  private def docs(dir: String, rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    stage(dir, "documents")(rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
  }

  test("label propagation: two blocked cliques each converge to their " +
    "minimum id; an isolated vector never enters the graph") {
    import spark.implicits._
    val dir = tmpDir("lpa")
    // cliques blocked apart by `label`; all-positive components keep each
    // clique in one sign cell, and near-parallel vectors clear cosine 0.15
    stage(dir, "embeddings")(Seq(
      (10L, Array(1.0f, 0.1f, 0.1f, 0.1f), 0),
      (11L, Array(0.9f, 0.2f, 0.1f, 0.1f), 0),
      (12L, Array(1.0f, 0.15f, 0.05f, 0.1f), 0),
      (20L, Array(0.1f, 1.0f, 0.1f, 0.1f), 1),
      (21L, Array(0.2f, 0.9f, 0.1f, 0.1f), 1),
      (22L, Array(0.1f, 1.0f, 0.2f, 0.1f), 1),
      (99L, Array(1.0f, 1.0f, 1.0f, 1.0f), 2)) // alone in its label: no edge
      .toDF("vec_id", "embedding", "label"))
    val rows = Graph.labelProp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.map(_._1).sorted === Seq(10L, 11L, 12L, 20L, 21L, 22L),
      s"graph nodes only (no isolated 99): $rows")
    assert(rows.filter(_._1 < 20).forall(r => r._2 === 10L && r._3 === 3L),
      s"first clique converges to min id 10, size 3: $rows")
    assert(rows.filter(_._1 >= 20).forall(r => r._2 === 20L && r._3 === 3L),
      s"second clique converges to min id 20, size 3: $rows")
  }

  test("edit dedup: substitution, trailing-char and cross-variant links " +
    "are found; exact duplicates collapse to one class representative") {
    val dir = docs(tmpDir("editdd"), Seq(
      (1L, "abcdefghijkl tail one", "en", "s1", 21L),
      (2L, "abcdefghijkl tail one", "en", "s1", 21L), // exact dup of 1
      (3L, "abcdefghijkX tail two", "en", "s1", 21L), // sub at key pos 12
      (4L, "abcdefghijk tail three", "en", "s1", 22L), // key ends "k "
      (5L, "zzzzzzzzzzzz other", "en", "s1", 18L)))
    val rows = Dedup.editDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(rows === Seq((1L, 3L, 1), (1L, 4L, 1), (3L, 4L, 1)),
      s"three 1-edit class links, dup id 2 folded into rep 1: $rows")
  }

  test("rouge-2: multiset overlap counts repeats once per matched copy; " +
    "sub-bigram docs score zero instead of dropping; identical pair " +
    "scores exactly 1.0") {
    val dir = docs(tmpDir("rouge"), Seq(
      (1L, "a b c d", "en", "s1", 7L),
      (2L, "a b c e", "en", "s1", 7L),
      (10L, "x x x", "en", "s1", 5L),
      (11L, "x x y", "en", "s1", 5L),
      (20L, "one", "en", "s1", 3L),
      (21L, "two words", "en", "s1", 9L),
      (30L, "k l m", "en", "s1", 5L),
      (31L, "k l m", "en", "s2", 5L)))
    val rows = TextAnalysis.rouge(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toSeq
    assert(rows.map(r => (r._1, r._2)) ===
      Seq((1L, 2L), (10L, 11L), (20L, 21L), (30L, 31L)),
      s"keyed doc_id+1 pairing, nothing else: $rows")
    assert(rows(0) === ((1L, 2L, 2L, 3L, 3L, 0.6667, 0.6667, 0.6667)))
    // "x x x" has bigram (x,x) twice; "x x y" has it once -> min = 1
    assert(rows(1) === ((10L, 11L, 1L, 2L, 2L, 0.5, 0.5, 0.5)),
      s"multiset min, not set intersection: ${rows(1)}")
    assert(rows(2) === ((20L, 21L, 0L, 0L, 1L, 0.0, 0.0, 0.0)),
      s"sub-bigram candidate scores zero, stays in output: ${rows(2)}")
    assert(rows(3) === ((30L, 31L, 2L, 2L, 2L, 1.0, 1.0, 1.0)),
      s"identical candidate/reference scores 1.0: ${rows(3)}")
  }

  test("quantile norm: bucket-mates share the midpoint ECDF value and " +
    "buckets step through (2*below + count) / (2*n)") {
    val dir = docs(tmpDir("qnorm"), Seq(
      (1L, "w", "en", "s1", 1L),
      (2L, Seq.fill(20)("t").mkString(" "), "en", "s1", 39L),
      (3L, Seq.fill(20)("u").mkString(" "), "en", "s1", 39L),
      (4L, Seq.fill(40)("v").mkString(" "), "en", "s1", 79L)))
    val rows = Sampling.quantileNorm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(rows === Map(1L -> 0.125, 2L -> 0.5, 3L -> 0.5, 4L -> 0.875),
      s"b0: 1/8, b1 midpoint: (2+2)/8, b2: 7/8: $rows")
  }

  test("k-anonymity: a singleton quasi-identifier class is flagged and " +
    "the language risk share counts its documents") {
    val dir = docs(tmpDir("kanon"),
      (1L to 6L).map(i => (i, s"doc $i", "en", "s1", 10L + i)) :+
        ((7L, "outlier", "en", "s1", 100L)))
    val rows = QualityChecks.kAnonymity(spark, dir).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getInt(4), r.getDouble(5))).toSeq
    assert(rows === Seq((0L, 6L, 0, 0.1429), (1L, 1L, 1, 0.1429)),
      s"class of 6 safe, singleton at risk, share 1/7 on both rows: $rows")
  }

  test("dbscan: cores by degree, border attaches to its only core " +
    "neighbor, a mutually-similar isolated pair is noise") {
    import spark.implicits._
    val dir = tmpDir("dbscan")
    // rotation lives in dims 5-6, outside the 4-dim sign-cell window, so
    // one cell holds the whole label-0 family. a1..a4 within 15 degrees
    // (all pairwise edges); x at -78 degrees reaches only a1
    // (cos 78 = .21 >= .15, cos 83 = .12 < .15)
    def v(deg: Double) = Array(0.01f, 0.01f, 0.01f, 0.01f,
      math.cos(math.toRadians(deg)).toFloat, math.sin(math.toRadians(deg)).toFloat)
    stage(dir, "embeddings")(Seq(
      (1L, v(0), 0), (2L, v(5), 0), (3L, v(10), 0), (4L, v(15), 0),
      (9L, v(-78), 0),
      (20L, v(40), 1), (21L, v(42), 1)) // own label: one edge, both degree 1
      .toDF("vec_id", "embedding", "label"))
    val rows = Graph.dbscan(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows === Seq(
      (1L, "core", 1L), (2L, "core", 1L), (3L, "core", 1L), (4L, "core", 1L),
      (9L, "border", 1L), (20L, "noise", -1L), (21L, "noise", -1L)),
      s"4 cores one cluster, single-edge border, isolated pair noise: $rows")
  }

  test("kneser-ney: a twice-seen bigram scores the discounted ML mass " +
    "plus backoff, a once-seen one mostly backoff — hand-computed") {
    val dir = docs(tmpDir("knlm"), Seq(
      (1L, "a b", "en", "s1", 3L),
      (2L, "a b", "en", "s1", 3L),
      (3L, "a c", "en", "s1", 3L)))
    val rows = TextAnalysis.knLmScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // P(b|a) = (2-.75)/3 + .75*(2/3)*(1/2) = 2/3; P(c|a) = .25/3 + .25 = 1/3
    assert(rows === Seq((1L, 1L, -0.4055), (2L, 1L, -0.4055),
      (3L, 1L, -1.0986)), s"ln(2/3), ln(1/3): $rows")
  }

  test("zipf: least-squares fit over the frequency head matches the " +
    "closed-form moments") {
    val dir = docs(tmpDir("zipf"),
      Seq((1L, (Seq.fill(8)("aa") ++ Seq.fill(4)("bb") ++ Seq.fill(2)("cc") ++
        Seq("dd")).mkString(" "), "en", "s1", 40L)))
    val rows = TextAnalysis.zipfFit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(rows === Seq((4L, -1.459, 2.1989, 0.9608)),
      s"n=4 head, slope/intercept/R2 from the raw moments: $rows")
  }

  test("markov paths: transitions stay inside a (user, day) journey and " +
    "rows normalize per source state") {
    import spark.implicits._
    val dir = tmpDir("markov")
    val day = 86400L
    def ev(id: Long, d: Long, u: Long, t: String) =
      (id, Timestamp.from(java.time.Instant.ofEpochSecond(d * day + id)), u, t,
        1.0, "{}")
    // u1 d1: A->B->A; u1 d2: B->A; u2 d1: A->C; day boundary never links
    stage(dir, "events")(Seq(
      ev(1, 1, 1, "A"), ev(2, 1, 1, "B"), ev(3, 1, 1, "A"),
      ev(4, 2, 1, "B"), ev(5, 2, 1, "A"),
      ev(6, 1, 2, "A"), ev(7, 1, 2, "C"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = graft.ops.Relational.markovPaths(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows === Seq(("A", "B", 1L, 0.5), ("A", "C", 1L, 0.5),
      ("B", "A", 2L, 1.0)), s"no cross-day transition, rows sum to 1: $rows")
  }

  test("ann ndcg: matches a driver-side recomputation from the two " +
    "rankings and stays in [0, 1]") {
    import graft.ops.Similarity
    val k = 5
    val exact = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("n_id")))
    val approx = Similarity.ivfTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("n_id")))
    val eByQ = exact.groupBy(_._1)
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val expected = eByQ.map { case (q, ex) =>
      val rankOf = ex.map(t => t._3 -> t._2).toMap
      val dcg = approx.filter(_._1 == q).map { case (_, ar, nid) =>
        rankOf.get(nid).map(er => (k + 1 - er).toDouble).getOrElse(0.0) /
          log2(ar + 1.0)
      }.sum
      val idcg = ex.map(t => (k + 1 - t._2).toDouble / log2(t._2 + 1.0)).sum
      q -> BigDecimal(dcg / idcg).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val got = Similarity.annNdcg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (q, v) =>
      assert(v >= 0.0 && v <= 1.0, s"q=$q ndcg=$v out of range")
      assert(math.abs(v - expected(q)) < 1e-9,
        s"q=$q got $v expected ${expected(q)}")
    }
  }

  test("ab test: welch moments match a driver-side recomputation over " +
    "the same md5 arm split") {
    import spark.implicits._
    val dir = tmpDir("abtest")
    val day = 86400L
    val evs = (1L to 40L).map(i =>
      (i, Timestamp.from(java.time.Instant.ofEpochSecond(day + i)), i % 20,
        "A", i.toDouble / 3.0, "{}"))
    stage(dir, "events")(
      evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    // recompute with the SAME arm expression the operator uses
    val arms = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id",
        "cast(conv(substring(md5(concat('graft_ab:', cast(user_id as string))), 1, 15), 16, 10) as bigint) % 2 as arm")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (a, b) = evs.map(e => (arms(e._3), math.floor(e._5 * 100).toLong))
      .partition(_._1 == 0L)
    def stats(xs: Seq[Long]) = {
      val n = xs.length.toDouble
      val s = xs.sum.toDouble
      val q = xs.map(x => x * x).sum.toDouble
      (n, s / n / 100.0, (q - s * s / n) / (n - 1) / 10000.0)
    }
    val (na, ma, va) = stats(a.map(_._2))
    val (nb, mb, vb) = stats(b.map(_._2))
    val se2 = va / na + vb / nb
    val t = (ma - mb) / math.sqrt(se2)
    val row = graft.ops.Drift.abTest(spark, dir).collect().head
    assert(row.getLong(1) === na.toLong && row.getLong(2) === nb.toLong)
    assert(math.abs(row.getDouble(5) -
      (BigDecimal(t).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        + 0.0)) < 1e-9, s"t: ${row.getDouble(5)} vs $t")
  }

  test("benford: first digits come from the exact integer path (sub-cent " +
    "values drop), shares and chi2 match hand computation") {
    import spark.implicits._
    val dir = tmpDir("benford")
    val day = 86400L
    val vals = Seq(1.00, 2.5, 19.99, 0.05, 0.004) // digits 1, 2, 1, 5, drop
    stage(dir, "events")(vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, Timestamp.from(java.time.Instant.ofEpochSecond(day + i)),
        1L, "A", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = graft.ops.Drift.benford(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(4)))
    val counts = Map(1 -> 2L, 2 -> 1L, 5 -> 1L).withDefaultValue(0L)
    assert(rows.map(t => (t._1, t._2)).toSeq ===
      (1 to 9).map(d => (d, counts(d))),
      s"dense 1-9 frame, sub-cent value dropped: ${rows.toSeq}")
    def pb(d: Int) = math.log(1.0 + 1.0 / d) / math.log(10.0)
    val n = 4.0
    // unobserved digits still owe their expected mass: term = e
    val chi = (1 to 9).map { d =>
      val e = pb(d) * n; val o = counts(d)
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(rows.head._4 -
      BigDecimal(chi).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
      s"chi2 ${rows.head._4} vs $chi")
  }

  test("code detect: punctuation/digit densities via translate-diff, " +
    "integer is_code flag, zero-length guard") {
    val code = "int main() { return 0; }"
    val dir = docs(tmpDir("codedet"), Seq(
      (1L, code, "en", "s1", code.length.toLong),
      (2L, "hello world there", "en", "s1", 17L),
      (3L, "", "en", "s1", 0L)))
    val rows = TextAnalysis.codeDetect(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(6))).toSeq
    assert(rows === Seq((1L, 24L, 5L, 1L, 1), (2L, 17L, 0L, 0L, 0),
      (3L, 0L, 0L, 0L, 0)),
      s"5 code symbols + 1 digit in the snippet, prose/empty clean: $rows")
  }

  test("source overlap: a shared 64-char prefix across sources makes one " +
    "matrix row with the min-denominator overlap coefficient") {
    val common = "x" * 70
    val dir = docs(tmpDir("srcov"), Seq(
      (1L, common + " tail a", "en", "s1", 77L),
      (2L, common + " tail b", "en", "s2", 77L),
      (3L, "unique one", "en", "s1", 10L),
      (4L, "unique two", "en", "s2", 10L),
      (5L, "other", "en", "s3", 5L)))
    val rows = Dedup.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(("s1", "s2", 1L, 0.5)),
      s"one shared fingerprint over min(2, 2) digests: ${rows.toSeq}")
  }

  test("prune rate: narrow custkey probes against the z-layout manifest " +
    "prune most shards (the layout does its job)") {
    val rows = graft.ops.Layout.pruneRate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.length === 16)
    val nShards = graft.ops.Layout.zoneMap(spark, sf).count()
    assert(rows.forall(_._2 === nShards), "every probe sees the manifest")
    assert(rows.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    val mean = rows.map(_._4).sum / rows.length
    assert(mean >= 0.7,
      s"z-order top bits stripe custkey into 1/8 bands; a 1/64 probe " +
        s"should prune >= ~7/8 of shards, got mean $mean")
  }

  test("fim split: parts reassemble to the original text and the span " +
    "bounds hold on every document") {
    import graft.ops.TrainingPipeline
    val rows = TrainingPipeline.fimSplit(spark, sf).collect()
    assert(rows.nonEmpty)
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    rows.foreach { r =>
      val (id, n, start, len) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (p, m, s) = (r.getString(4), r.getString(5), r.getString(6))
      assert(start >= 2 && start <= n - 1, s"doc $id start $start out of [2, ${n - 1}]")
      assert(len >= 1 && start + len <= n, s"doc $id len $len overruns")
      assert(m.split(" ", -1).length.toLong === len, s"doc $id middle width")
      assert(Seq(p, m, s).mkString(" ") === texts(id),
        s"doc $id parts must reassemble losslessly")
    }
  }

  test("context pack: ranked greedy prefix under the budget; zero-overlap " +
    "chunks never enter the candidate set") {
    import graft.ops.TrainingPipeline
    val dir = docs(tmpDir("ctxpack"), Seq(
      (1L, "data data data", "en", "s1", 14L),
      (2L, "model x", "en", "s1", 7L),
      (3L, "nothing here at all", "en", "s1", 19L)))
    val tight = TrainingPipeline.contextPack(spark, dir, budget = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(5))).toSeq
    assert(tight === Seq((1L, 1L, 3L, 3L)),
      s"rank-2 chunk would overflow the 4-token budget: $tight")
    val loose = TrainingPipeline.contextPack(spark, dir, budget = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(5))).toSeq
    assert(loose === Seq((1L, 1L, 3L, 3L), (2L, 2L, 1L, 5L)),
      s"overlap-desc order, cumulative tokens, doc 3 excluded: $loose")
  }

  test("erasure audit: every source balances (before = erased + after) " +
    "and the deterministic split is ~2%") {
    val rows = graft.ops.TrainingPipeline.erasureAudit(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(rows.forall(_._4 === 1), "conservation proof on every row")
    assert(rows.forall(r => r._1 === r._2 + r._3))
    val (tot, erased) = (rows.map(_._1).sum, rows.map(_._2).sum)
    assert(erased > 0 && erased < tot / 10,
      s"2% md5 split: $erased of $tot erased")
  }

  test("hubness: k-occurrences conserve the kNN edge count and an " +
    "isolated vector stays visible as an antihub") {
    import graft.ops.Similarity
    import spark.implicits._
    val rows = Similarity.hubness(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val edges = Similarity.knnGraph(spark, sf).count()
    assert(rows.map(_._2).sum === edges,
      "every kNN edge lands on exactly one k-occurrence")
    assert(rows.forall(r => (r._3 === 1) === (r._2 >= 6)), "hub cut at 2k")
    val dir = tmpDir("hub")
    stage(dir, "embeddings")(Seq(
      (1L, Array(1.0f, 0.1f), 0), (2L, Array(0.9f, 0.2f), 0),
      (3L, Array(1.0f, 0.15f), 0),
      (99L, Array(0.5f, 0.5f), 7)) // alone in its label: never a neighbor
      .toDF("vec_id", "embedding", "label"))
    val iso = Similarity.hubness(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(iso(99L) === 0L, s"antihub must appear with 0 occurrences: $iso")
    assert(iso(1L) === 2L && iso(2L) === 2L && iso(3L) === 2L,
      s"each of the 3-clique members is in both others' lists: $iso")
  }

  test("funnel steps: anchors are the earliest qualifying events and a " +
    "step only counts activity strictly after the previous anchor") {
    import spark.implicits._
    val dir = tmpDir("fsteps")
    def ev(id: Long, sec: Long, u: Long, t: String) =
      (id, Timestamp.from(java.time.Instant.ofEpochSecond(86400 + sec)), u, t,
        1.0, "{}")
    stage(dir, "events")(Seq(
      ev(1, 10, 1, "signup"), ev(2, 20, 1, "click"), ev(3, 30, 1, "purchase"),
      ev(4, 10, 2, "signup"), ev(5, 5, 2, "click"), // click BEFORE signup
      ev(6, 10, 3, "signup"), ev(7, 20, 3, "click"), ev(8, 15, 3, "purchase"),
      ev(9, 1, 4, "click"), ev(10, 2, 4, "purchase")) // never signed up
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = graft.ops.Relational.funnelSteps(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows === Seq(("1_signup", 3L, 1.0), ("2_click_after", 2L, 0.6667),
      ("3_purchase_after", 1L, 0.3333)),
      s"u2's early click and u3's early purchase must not count: $rows")
  }

  test("association rules: supports, confidences and lifts are exact on a " +
    "closed-form basket set; a higher support cut prunes the rare item " +
    "before any pair work") {
    import spark.implicits._
    val dir = tmpDir("assoc")
    val day = 86400L
    def ev(id: Long, d: Long, u: Long, t: String) =
      (id, Timestamp.from(java.time.Instant.ofEpochSecond(d * day + id)), u, t,
        1.0, "{}")
    // baskets: u1d1{A,B} u1d2{A,B} u2d1{A,B} u2d2{A} u3d1{B,C}
    stage(dir, "events")(Seq(
      ev(1, 1, 1, "A"), ev(2, 1, 1, "B"),
      ev(3, 2, 1, "A"), ev(4, 2, 1, "B"),
      ev(5, 1, 2, "A"), ev(6, 1, 2, "B"),
      ev(7, 2, 2, "A"),
      ev(8, 1, 3, "B"), ev(9, 1, 3, "C"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = FrequentItems.assocRules(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(rows === Seq(
      ("A", "B", 3L, 0.6, 0.75, 0.9375),
      ("B", "A", 3L, 0.6, 0.75, 0.9375),
      ("B", "C", 1L, 0.2, 0.25, 1.25),
      ("C", "B", 1L, 0.2, 1.0, 1.25)), s"n=5 baskets: $rows")
    val cut = FrequentItems.assocRules(spark, dir, minSupport = 0.3).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cut === Seq(("A", "B"), ("B", "A")),
      s"support 0.3 prunes item C (1/5) before pair generation: $cut")
    // both items frequent but the PAIR below threshold: A 0.8, B 1.0,
    // pair (A,B) 0.6 < 0.7 — the Apriori contract cuts the rule too
    // (review r11: only singletons were filtered)
    val pairCut = FrequentItems.assocRules(spark, dir, minSupport = 0.7)
    assert(pairCut.isEmpty,
      s"a sub-support pair of frequent items must not ship: " +
        pairCut.collect().toSeq)
  }

  test("benford: a feed whose every |value| < 0.01 observes NO digit — " +
    "the dense frame still emits 9 rows with null share/chi2 instead of " +
    "dividing by the zero total (r9 review)") {
    import spark.implicits._
    val dir = tmpDir("benford0")
    val day = 86400L
    stage(dir, "events")(Seq(0.004, -0.009, 0.0).zipWithIndex.map {
      case (v, i) =>
        (i.toLong, Timestamp.from(java.time.Instant.ofEpochSecond(day + i)),
          1L, "A", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = graft.ops.Drift.benford(spark, dir).collect()
    assert(rows.length === 9, "the dense 1-9 frame survives an empty feed")
    assert(rows.forall(_.getLong(1) === 0L), "no digit observed")
    assert(rows.forall(r => r.isNullAt(2) && r.isNullAt(4)),
      "share and chi2 must be null, not a zero-division artifact")
    assert(rows.forall(r => !r.isNullAt(3)),
      "the Benford expectation itself is total-free and stays present")
  }

  test("nearDupClusters: a corpus with ZERO near-dup pairs converges to " +
    "the empty labeling instead of NPEing on the null checksum (r9 review)") {
    val dir = docs(tmpDir("nodups"), Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "s1", 36L),
      (2L, "one two three four five six seven", "en", "s1", 33L),
      (3L, "red orange yellow green blue indigo", "en", "s2", 35L)))
    assert(Dedup.nearDupClusters(spark, dir).collect().isEmpty,
      "no pairs => no labeled docs, and no crash")
  }

  test("driftReport: an empty documents table yields the empty report, " +
    "not an NPE on the null min/max midpoint (r9 review)") {
    val dir = tmpDir("driftempty")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    stage(dir, "documents")(spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
    assert(graft.ops.Drift.driftReport(spark, dir).collect().isEmpty)
  }
}
