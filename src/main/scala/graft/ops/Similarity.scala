package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`embedding: ARRAY<FLOAT>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the full corpus; one pass, no corpus shuffle. The correct
  *    baseline and the oracle-checkable one.
  *  - [[lshTopK]]: random-hyperplane LSH (sign-random-projection) — corpus
  *    is bucketed by L independent b-bit tables; queries probe their own
  *    bucket plus hamming-1 neighbors in each table. The sub-linear scale
  *    path: at 100 TB the bucket joins replace the full scan per query.
  *
  * Cosine is computed in double precision with sequential folds so the
  * DuckDB oracle matches bit-for-bit before rounding.
  */
object Similarity {

  /** Null-vector policy (r12 adversarial-fixture finding): a row with a
    * NULL `embedding` is NOT an index member — every similarity-index op
    * (ANN, kNN graph, cells, dedup, rerank) excludes it at load, and the
    * DuckDB oracles carry the same `WHERE embedding IS NOT NULL`. Without
    * the filter null vectors leaked NULL cosines into top-k windows
    * (Spark ranks them by null-ordering accident) and crashed the typed
    * rerank encoders; the principled contract is "no vector, no
    * membership" — a caller who wants them handled repairs or filters
    * upstream, explicitly. */
  private def withVec(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    Tables(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("norm", expr("graft_norm(v)"))
  }

  private def cosine: Column =
    expr("graft_dot(q.v, c.v)") / (col("q.norm") * col("c.norm"))

  /** Exact top-k neighbors for each query vector (vec_id < numQueries).
    * The query side is broadcast; the corpus is scanned once — no shuffle of
    * the big side. Per-query ranking is a window over ~numQueries*k rows. */
  def bruteForceTopK(spark: SparkSession, dir: String,
                     numQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = withVec(spark, dir)
    val q = e.filter(col("vec_id") < numQueries).alias("q")
    val c = e.alias("c")
    val scored = c.join(broadcast(q), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("q_id"), col("c.vec_id").as("n_id"),
        cosine.as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 4).as("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Sign-random-projection code: bit p = sign of <h_p, q(v)> where
    * hyperplane h_p is an md5-derived ±1 vector and q quantizes to the
    * micro-unit lattice (floor(x*1e6) — integer accumulation, so the sign
    * is engine-exact and the DuckDB oracle rebuilds the identical codes).
    * Runs in [[graft.functions.SrpCodeSigns]] — one codegen'd O(bits*dim)
    * loop per row; the ±1 matrix is a plan-time literal (bits×dim booleans,
    * ~4 KB), never a join side. */
  private def srpCode(vCol: String, bits: Int, dim: Int): Column =
    call_function("graft_srp_code_signs", col(vCol),
      typedLit(graft.functions.VectorFunctions.srpSigns(bits, dim)))

  /** Per-row argmax over a broadcast seed array: no shuffle, no per-vector
    * join row amplification; cosine via the same sequential-fold dot as the
    * oracle. Yields `(best: max cosine, cell: argmax seed_id)`; strict `>`
    * keeps the lowest seed_id on ties (seeds sorted by id). */
  /** m must partition the fixture's 64-dim embeddings exactly (review
    * r11): a non-dividing m silently excluded trailing dimensions from
    * every ADC distance, and m > 64 made every subvector empty (all
    * distances 0 — "top-k" degenerating to lowest ids). */
  private def requirePqM(m: Int): Unit =
    require(m >= 1 && 64 % m == 0,
      s"pq: m must divide the embedding dim 64 exactly, got m=$m")

  private val assignStruct =
    """aggregate(
      |  transform(cells, s -> named_struct(
      |    'score', if(norm * s.snorm = 0D, cast(-1.5 as double),
      |               graft_dot(v, s.sv) / (norm * s.snorm)),
      |    'cell', s.seed_id)),
      |  named_struct('best', cast(-2.0 as double), 'cell', -1L),
      |  (acc, s) -> if(s.score > acc.best,
      |    named_struct('best', s.score, 'cell', s.cell),
      |    acc))""".stripMargin
  // transform-then-fold, not dots inlined into both fold branches:
  // Catalyst does not CSE across lambda branches, so the inlined form
  // evaluated every seed's dot product twice (the halfFold lesson, r9).
  // The 0-norm guard (review r11, mirroring Dedup.productCellAssign): a
  // zero-norm seed or centroid otherwise yields NaN cosine, and Spark
  // orders NaN above every double — one zero vector in the seed set would
  // capture EVERY row's assignment (one giant cell, quadratic probe).

  /** IVF-style ANN (the FAISS coarse-quantizer pattern): the corpus is
    * partitioned into `nCells` cells by max-cosine against a deterministic
    * seed set (the first `nCells` corpus vectors — a stand-in for trained
    * k-means centroids, which would be a separate fit job); each query
    * searches only its `nProbe` closest cells.
    *
    * Scale shape: cell assignment is ONE broadcast of the (tiny) seed set
    * folded per corpus row — no corpus shuffle, O(nCells * dim) per row;
    * the probe join is again a broadcast of the query probes against the
    * assigned corpus. At 100 TB with nCells ~ sqrt(N), each query touches
    * nProbe/nCells of the data instead of all of it.
    *
    * Fully deterministic (seed order fixed, ties broken by seed_id), so the
    * DuckDB oracle reproduces it exactly — unlike the hash-seeded LSH path.
    */
  /** One row holding all `nCells` deterministic seed centroids, sorted by
    * seed_id so the assignment fold's tie-break (strict >) keeps the lowest
    * seed_id — the coarse quantizer shared by [[ivfTopK]] and
    * [[ivfPqTopK]]. */
  private def seedCells(e: DataFrame, nCells: Int): DataFrame =
    e.filter(col("vec_id") < nCells)
      .agg(sort_array(collect_list(
        struct(col("vec_id").as("seed_id"), col("v").as("sv"), col("norm").as("snorm"))))
        .as("cells"))

  /** Corpus rows with their assigned coarse cell: one broadcast fold per
    * row, no shuffle. */
  private def cellAssign(e: DataFrame, seeds: DataFrame): DataFrame =
    e.crossJoin(broadcast(seeds))
      .withColumn("cell", expr(assignStruct + ".cell"))
      .select(col("vec_id"), col("v"), col("norm"), col("cell"))

  /** Each query's top-`nProbe` cells (rank over the same seed scores the
    * assignment fold uses). */
  private def cellProbes(e: DataFrame, seeds: DataFrame, numQueries: Int,
                         nProbe: Int): DataFrame =
    probesOf(e.filter(col("vec_id") < numQueries), seeds, nProbe)

  /** Top-`nProbe` cells for every row of an arbitrary query frame. */
  private def probesOf(qf: DataFrame, seeds: DataFrame,
                       nProbe: Int): DataFrame = {
    val q = qf.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("v"), col("norm"),
        explode(col("cells")).as("s"))
      .withColumn("cos_seed", expr("graft_dot(v, s.sv)") / (col("norm") * col("s.snorm")))
    val wq = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_seed").desc, col("s.seed_id"))
    q.withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= nProbe)
      .select(col("vec_id"), col("v"), col("norm"), col("s.seed_id").as("cell"))
  }

  def ivfTopK(spark: SparkSession, dir: String, numQueries: Int = 10, k: Int = 5,
              nCells: Int = 8, nProbe: Int = 2): DataFrame = {
    val e = withVec(spark, dir)
    val seeds = seedCells(e, nCells)
    val assigned = cellAssign(e, seeds)
    val probes = cellProbes(e, seeds, numQueries, nProbe).alias("q")
    val c = assigned.alias("c")
    val scored = c.join(broadcast(probes),
        col("q.cell") === col("c.cell") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("q_id"), col("c.vec_id").as("n_id"), cosine.as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 4).as("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** ANN index evaluation: recall@k and top-1 reciprocal rank of the IVF
    * probe cut against the exact brute-force ranking — the retrieval-
    * quality report every index deployment gates on before swapping the
    * exact scan for the approximate one (FAISS's own benchmark metric).
    * Both tiers are deterministic here, so the metric itself is
    * oracle-exact — unusual for ANN eval, and exactly why the engine's
    * deterministic-seed quantizer pays off. Per query: how many of the
    * true top-k the index returned, the recall fraction, and 1/rank of
    * the true nearest neighbor in the approximate list (0 when missed).
    *
    * Shape at scale: both sub-rankings are the broadcast-query/one-scan
    * shape of their operators; the metric join runs over numQueries·k
    * rows. */
  def annRecall(spark: SparkSession, dir: String, numQueries: Int = 10,
                k: Int = 5): DataFrame = {
    // materialized: the hits join AND the distinct q_id base both consume
    // the brute-force ranking — without the checkpoint the corpus scan
    // (the operator's dominant cost) executes twice (review r11; the
    // annNdcg pattern)
    val exact = bruteForceTopK(spark, dir, numQueries, k)
      .select(col("q_id"), col("rank").as("e_rank"), col("n_id"))
      .localCheckpoint(true)
    val approx = ivfTopK(spark, dir, numQueries, k)
      .select(col("q_id"), col("rank").as("a_rank"), col("n_id"))
    val hits = approx.join(exact, Seq("q_id", "n_id"))
    val perQ = hits.groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_hits"),
        min(when(col("e_rank") === 1, col("a_rank"))).as("t1"))
    exact.select(col("q_id")).distinct()
      .join(perQ, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (round(coalesce(col("n_hits"), lit(0L)) / lit(k.toDouble), 4) + 0.0)
          .as("recall"),
        (round(coalesce(lit(1.0) / col("t1"), lit(0.0)), 4) + 0.0).as("rr"))
      .orderBy(col("q_id"))
  }

  /** nDCG@k of the IVF probe cut against the exact ranking — the graded
    * companion to [[annRecall]]: recall treats every exact-top-k hit
    * equally, while nDCG (Järvelin & Kekäläinen 2002) credits retrieving
    * the BEST neighbors early. Graded relevance of a retrieved item is
    * its exact-ranking credit `k+1 - e_rank` (0 for misses);
    * `DCG = Σ rel_i / log2(a_rank_i + 1)` over the approximate ranking,
    * normalized by the exact ranking's own DCG. Both tiers are
    * deterministic, so the eval metric is oracle-exact like the rest of
    * the ANN family. Shape: two bounded rankings (numQueries × k rows)
    * joined keyed — the corpus cost is the rankings themselves. */
  def annNdcg(spark: SparkSession, dir: String, numQueries: Int = 10,
              k: Int = 5): DataFrame = {
    val exact = bruteForceTopK(spark, dir, numQueries, k)
      .select(col("q_id"), col("rank").as("e_rank"), col("n_id"))
      .localCheckpoint(true) // three consumers of a numQueries*k table
    val approx = ivfTopK(spark, dir, numQueries, k)
      .select(col("q_id"), col("rank").as("a_rank"), col("n_id"))
    val dcg = approx.join(exact, Seq("q_id", "n_id"), "left")
      .withColumn("rel",
        coalesce(lit(k + 1) - col("e_rank"), lit(0)).cast("double"))
      .groupBy(col("q_id"))
      .agg(sum(col("rel") /
        (log(col("a_rank") + lit(1.0)) / log(lit(2.0)))).as("dcg"))
    val idcg = exact.groupBy(col("q_id"))
      .agg(sum((lit(k + 1) - col("e_rank")).cast("double") /
        (log(col("e_rank") + lit(1.0)) / log(lit(2.0)))).as("idcg"))
    exact.select(col("q_id")).distinct()
      .join(dcg, Seq("q_id"), "left")
      .join(idcg, Seq("q_id"))
      .select(col("q_id"),
        round(coalesce(col("dcg"), lit(0.0)) / col("idcg"), 4).as("ndcg"))
      .orderBy(col("q_id"))
  }

  /** Hubness diagnostic (Radovanović et al. 2010) of the embedding space —
    * the k-occurrence count N_k(x): how many OTHER vectors list x among
    * their k nearest neighbors. High-dimensional spaces concentrate
    * neighbor lists onto a few hub vectors, which silently distorts every
    * kNN-derived artifact (dup clusters, hard negatives, bitext margins);
    * this is the report that catches it before they ship. `is_hub` flags
    * vectors at ≥ 2k occurrences (the standard heavy-tail cut).
    *
    * Shape at scale: one aggregate over the already cell-blocked
    * [[knnGraph]] edges (k rows per vector, never all-pairs), left-joined
    * back to the pruned id column so antihubs (N_k = 0) stay visible —
    * the hub/antihub asymmetry IS the diagnostic. */
  def hubness(spark: SparkSession, dir: String, k: Int = 3,
              blocking: String = "label", nCells: Int = graft.ops.Dedup.AutoCells): DataFrame = {
    val occ = knnGraph(spark, dir, k, blocking, nCells)
      .groupBy(col("n_id").as("vec_id")).agg(count(lit(1)).as("k_occ"))
    // null-vector rows are not index members (see withVec): they are
    // ABSENT from the report, not "antihubs"
    Tables(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull).select(col("vec_id"))
      .join(occ, Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("k_occ"), lit(0L)).as("k_occ"),
        (coalesce(col("k_occ"), lit(0L)) >= 2L * k).cast("int").as("is_hub"))
      .orderBy(col("vec_id"))
  }

  /** Vector quantization profile: assign every embedding to its nearest of
    * `nCells` deterministic seed centroids (the [[ivfTopK]] coarse
    * quantizer) and report per-cell population and cosine-to-centroid
    * stats — the index-quality diagnostic run before committing to an IVF
    * layout (empty/overfull cells or low centroid cosines mean re-train).
    * Same scale shape as assignment in [[ivfTopK]]: one broadcast fold per
    * corpus row, then a tiny aggregate keyed by nCells values. */
  def vecQuantize(spark: SparkSession, dir: String, nCells: Int = 8): DataFrame = {
    val e = withVec(spark, dir)
    quantizeProfile(e, e.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("seed_id"), col("v").as("sv")))
  }

  /** Per-cell population + cosine-to-centroid stats of `corpus` against an
    * arbitrary centroid set `(seed_id, sv)` — the index-quality profile for
    * both the deterministic seed quantizer and [[kmeansFit]]'s output. */
  def quantizeProfile(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val seeds = centroids
      .withColumn("snorm", expr("graft_norm(sv)"))
      .agg(sort_array(collect_list(
        struct(col("seed_id"), col("sv"), col("snorm")))).as("cells"))
    corpus.crossJoin(broadcast(seeds))
      .withColumn("asn", expr(assignStruct))
      .select(col("vec_id"), col("asn.cell").as("cell"), col("asn.best").as("cos"))
      .groupBy(col("cell"))
      // + 0.0 AFTER the round: a stat that rounds to exactly zero from
      // below is -0.0 in one engine and 0.0 in the other (the r5 trap)
      .agg(count(lit(1)).as("n"),
        (round(avg(col("cos")), 4) + 0.0).as("avg_cos"),
        (round(min(col("cos")), 4) + 0.0).as("min_cos"),
        (round(max(col("cos")), 4) + 0.0).as("max_cos"))
      .orderBy(col("cell"))
  }

  /** Spherical k-means fit (Lloyd's) in integer micro-units: the real
    * trainer behind the IVF coarse quantizer — deterministic init (the
    * first `k` corpus vectors on the floor(x*1e6) lattice), cosine
    * assignment via the broadcast fold, mean update, stop on stable
    * assignments or `maxIter`. Cosine against an unnormalized mean equals
    * cosine against the normalized mean (scale-invariance), so the mean
    * update IS the spherical k-means step and the objective (mean cosine to
    * assigned centroid) is non-decreasing — the spec asserts it.
    *
    * Engine-exact since round 7 (the q_pagerank trick): component sums
    * accumulate the corpus's floor(x*1e6) micro-units as integers — exact
    * in any order — and centroids are floor(sum / n) micro-unit values, so
    * no float partial-aggregation order can perturb a round. Assignment
    * cosines stay float, but both engines fold identical doubles in the
    * same sequential order, so the argmax matches bit for bit; the DuckDB
    * oracle unrolls the rounds as chained CTEs. Early stop needs no oracle
    * counterpart: stable integer centroids are a FIXED POINT (same
    * assignment -> same sums -> same floor-divs), so rounds past
    * convergence are no-ops and the oracle can always run all `maxIter`.
    *
    * Scale shape per iteration: one broadcast fold over the corpus (no
    * shuffle) + one (cell, dim)-keyed aggregate whose explode factor is the
    * vector dimension — linear in corpus size, k*dim driver state only.
    * Empty cells keep their previous centroid (the standard dead-cell
    * rule), so k never silently shrinks. */
  def kmeansFit(spark: SparkSession, dir: String, k: Int = 8,
                maxIter: Int = 10): DataFrame = {
    // vq: the micro-unit lattice image of v. Kept alongside v: assignment
    // scores use v (scale-invariant), mean updates sum vq (order-exact).
    val e = withVec(spark, dir)
      .withColumn("vq", expr("transform(v, x -> floor(x * 1e6))"))
    var centroids = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("seed_id"),
        expr("transform(vq, q -> cast(q as double))").as("sv"))
      // lazy (r15): the checksum below is the first action and doubles as
      // the materializer — the eager form paid one dedicated caching job
      // per round on a loop whose cost is sequential job latency
      .localCheckpoint(false)
    // Convergence reads the CENTROIDS (k rows, materialized), not a second
    // corpus scan: new centroids identical to the old ones means the
    // assignments were stable, and the per-iteration corpus cost stays at
    // exactly one assignment scan (the mean update). Integer centroids make
    // the checksum exact — a converged fit really does stop.
    def centroidChecksum(c: DataFrame): (Long, Long) = {
      val r = c.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(seed_id, to_json(sv)))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var iter = 0
    var converged = false
    var checksum = centroidChecksum(centroids)
    while (!converged && iter < maxIter) {
      val seeds = centroids
        .withColumn("snorm", expr("graft_norm(sv)"))
        .agg(sort_array(collect_list(
          struct(col("seed_id"), col("sv"), col("snorm")))).as("cells"))
      // integer micro-unit mean per (cell, dim), reassembled in dim order;
      // floor(double-division) rather than integer div so the oracle's
      // identical double op sequence yields the identical centroid even
      // when the true quotient sits on a representability boundary. Dead
      // cells fall back to their previous centroid via left join+coalesce.
      val means = e.crossJoin(broadcast(seeds))
        .withColumn("cell", expr(assignStruct + ".cell"))
        .select(col("cell"), posexplode(col("vq")).as(Seq("idx", "q")))
        .groupBy(col("cell"), col("idx"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("cnt"))
        .withColumn("m", floor(col("s").cast("double") / col("cnt")))
        .groupBy(col("cell"))
        .agg(expr("transform(sort_array(collect_list(struct(idx, m))), " +
          "p -> cast(p.m as double))").as("mv"))
      centroids = centroids.join(means,
          centroids("seed_id") === means("cell"), "left")
        .select(col("seed_id"), coalesce(col("mv"), col("sv")).as("sv"))
        .localCheckpoint(false) // lazy: the checksum materializes it
      val nextSum = centroidChecksum(centroids)
      converged = nextSum == checksum // stable centroids => stable assignments
      checksum = nextSum
      iter += 1
    }
    centroids
  }

  /** Embedding-space decontamination — the SEMANTIC companion to the
    * n-gram [[graft.ops.Dedup.decontaminate]]: an exact-substring check
    * misses paraphrased or lightly-rewritten eval leakage, so the test
    * split is also screened by maximum cosine against any train vector
    * (the embedding-similarity contamination audit run before publishing
    * eval numbers). Same deterministic hash split as the n-gram op, so
    * the two screens audit the same partition.
    *
    * Scale shape — READ THE PREMISE: broadcasting the test side is right
    * ONLY when the eval set is genuinely small (real decontamination runs
    * screen eval suites of thousands of docs against the corpus — that is
    * when one broadcast + one train scan is the optimal plan). THIS demo
    * split makes the test side 20% OF THE CORPUS by construction, so the
    * broadcast tier here is the oracle baseline, not the production plan:
    * at scale use [[decontaminateEmbedIvf]], whose probe-cut candidate
    * join is keyed on the coarse cell — both sides shuffle, nothing
    * broadcasts, nothing is all-pairs. `max` is order-independent, so the
    * score is engine-exact before rounding on both tiers. */
  def decontaminateEmbed(spark: SparkSession, dir: String,
                         threshold: Double = 0.5): DataFrame = {
    val e = withVec(spark, dir)
    val split = TextAnalysis.splitHash(col("vec_id"))
    val test = e.filter(split >= 80).alias("q")
    val train = e.filter(split < 80).alias("c")
    train.join(broadcast(test))
      .select(col("q.vec_id").as("doc_id"), cosine.as("cos"))
      .groupBy(col("doc_id"))
      .agg(max(col("cos")).as("mc"))
      .select(col("doc_id"),
        (round(col("mc"), 4) + 0.0).as("max_train_cos"),
        (col("mc") >= threshold).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** The production embedding-decontamination screen: [[decontaminateEmbed]]
    * restricted to the IVF probe cut — the same swap [[bitextMineIvf]] makes
    * for [[bitextMine]]. The shared deterministic coarse quantizer
    * ([[ivfTopK]]'s seed cells) indexes BOTH splits: every train vector is
    * assigned to its one nearest cell, every test vector probes its `nProbe`
    * closest cells, and max train-cosine is taken within the probed cells
    * only.
    *
    * Scale shape — and the fix for the brute tier's false premise: the
    * candidate join is KEYED on the cell (an equi-join; no `broadcast`
    * hint on either side), so it scales even when the test split is a
    * constant fraction of the corpus: both sides shuffle once by cell, pair
    * volume drops from O(|train|·|test|) to O(|train|·|test|·nProbe/nCells)
    * and is spread across cells, and no executor ever holds a split in
    * memory. nProbe is the recall dial; nProbe = nCells degenerates to the
    * exact screen (every cell probed => every train candidate scored —
    * the equality spec pins this bit-for-bit against the brute tier), so
    * the probe cut is the ONLY approximation and the op stays
    * DuckDB-oracle-checkable end to end.
    *
    * Report totality (r8 ADVICE): the candidate join is inner on the cell,
    * so a test doc whose nProbe probed cells hold no train vector would
    * simply vanish from the report — indistinguishable from "screened
    * clean". Every test id is therefore left-joined back in and emitted
    * with a NULL max_train_cos and contaminated = false: the null score is
    * the explicit "no candidate was scored" marker (visible to the
    * auditor), distinct from a real low cosine. */
  def decontaminateEmbedIvf(spark: SparkSession, dir: String,
                            threshold: Double = 0.5, nCells: Int = 8,
                            nProbe: Int = 4): DataFrame = {
    val e = withVec(spark, dir)
    val split = TextAnalysis.splitHash(col("vec_id"))
    val seeds = seedCells(e, nCells)
    val train = cellAssign(e.filter(split < 80), seeds).alias("c")
    val test = probesOf(e.filter(split >= 80), seeds, nProbe).alias("q")
    val maxes = train.join(test, col("q.cell") === col("c.cell"))
      .select(col("q.vec_id").as("doc_id"), cosine.as("cos"))
      .groupBy(col("doc_id"))
      .agg(max(col("cos")).as("mc"))
    e.filter(split >= 80).select(col("vec_id").as("doc_id"))
      .join(maxes, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (round(col("mc"), 4) + 0.0).as("max_train_cos"),
        coalesce(col("mc") >= threshold, lit(false)).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Quantization profile of the TRAINED quantizer ([[kmeansFit]]) — the
    * bench/driver surface for the k-means path. Oracle-exact since round 7:
    * integer micro-unit centroids unroll to chained DuckDB CTEs, so the
    * gate hash-checks the full Lloyd iteration; the spec keeps the
    * contracts (partition totality, objective improvement over seeds). */
  def kmeansProfile(spark: SparkSession, dir: String, k: Int = 8,
                    maxIter: Int = 10): DataFrame =
    quantizeProfile(withVec(spark, dir), kmeansFit(spark, dir, k, maxIter))

  /** Approximate top-k with `tables` independent b-bit SRP tables plus
    * hamming-1 multi-probe per table — the classic multi-table LSH recipe:
    * a true neighbor missed by one table's bucket is recovered by another
    * (candidate recall 1-(1-p)^L vs a single table's p), and flipping one
    * bit probes the buckets a near-hyperplane vector fell into. One 64-bit
    * SRP code per vector carries all tables (table t = bits [t*b, t*b+b)),
    * so the corpus is coded in a single codegen'd pass.
    *
    * Scale shape: ids-only through the band join (a pair colliding in
    * several tables ships 16 bytes per collision, deduped before any
    * vector moves), queries broadcast, then ONE keyed join-back to score
    * surviving candidates with exact cosine. Candidate fraction per query
    * ~ L*(b+1)/2^b of the corpus — tunable; recall < 1 by design; the
    * bench companion to the exact baseline. */
  def lshTopK(spark: SparkSession, dir: String, numQueries: Int = 10,
              k: Int = 5, bits: Int = 8, tables: Int = 8,
              dim: Int = 64): DataFrame = {
    require(bits >= 1 && tables >= 1 && bits * tables <= 64,
      "bits * tables must fit in one long code")
    // -1L >>> (64 - bits), not (1L << bits) - 1: a shift by 64 is mod-64 in
    // the JVM, so the latter wraps to mask 0 at bits = 64 (every vector in
    // bucket 0 => a silent full scan per query)
    val mask = -1L >>> (64 - bits)
    val e = withVec(spark, dir).withColumn("code", srpCode("v", bits * tables, dim))
    // corpus index: (table, bucket) per vector — ids only through the join
    val c = e.select(col("vec_id"), col("code"))
      .withColumn("t", explode(expr(s"sequence(0, ${tables - 1})")))
      .select(col("vec_id"), col("t"),
        expr(s"(code >> (t * $bits)) & $mask").as("bucket"))
      .alias("c")
    // each query probes its own bucket + the b hamming-1 buckets, per table
    val q = e.filter(col("vec_id") < numQueries).select(col("vec_id"), col("code"))
      .withColumn("t", explode(expr(s"sequence(0, ${tables - 1})")))
      .withColumn("sub", expr(s"(code >> (t * $bits)) & $mask"))
      .withColumn("probe", explode(expr(
        s"concat(array(sub), transform(sequence(0, ${bits - 1}), " +
          "b -> sub ^ shiftleft(1L, b)))")))
      .select(col("vec_id"), col("t"), col("probe"))
      .alias("p")
    val cand = c.join(broadcast(q),
        col("p.t") === col("c.t") && col("p.probe") === col("c.bucket") &&
          col("p.vec_id") =!= col("c.vec_id"))
      .select(col("p.vec_id").as("q_id"), col("c.vec_id").as("n_id"))
      .dropDuplicates("q_id", "n_id")
    // exact-cosine verify: vectors join back once per surviving pair
    val qv = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v"), col("norm")).alias("q")
    val cv = e.select(col("vec_id").as("n_id"), col("v"), col("norm")).alias("c")
    val scored = cand.join(broadcast(qv), Seq("q_id")).join(cv, Seq("n_id"))
      .select(col("q_id"), col("n_id"), cosine.as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 4).as("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Product-quantization ANN with asymmetric distance computation (ADC) —
    * the memory-side of the FAISS IVF-PQ pattern: each vector is stored as
    * `m` small codes (here m=8 codes over 16-entry codebooks = 8 bytes
    * instead of 512), and query-to-vector distance is approximated by
    * summing per-subspace query-to-codeword distances from an m×ks lookup
    * table. At 100 TB this is THE trick that keeps the index in memory:
    * the corpus scan during search touches codes, never raw vectors.
    *
    * Codebooks are deterministic seed subvectors (the first `ks` corpus
    * vectors per subspace — same convention as the IVF coarse cells), so
    * unlike trained-k-means PQ the whole operator has a closed-form DuckDB
    * oracle. Distances move as integer MICRO-UNITS (round(d*1e6) per table
    * entry, summed as longs): integer addition is order-independent, so
    * the ADC sum cannot drift with partial-aggregation order — which is
    * exactly what makes the oracle exact. Argmin encoding ties break on
    * the lower codeword id via the (dist, j) struct-min.
    *
    * Scale shape: the codebook (m·ks subvectors) and the query distance
    * tables (numQueries·m·ks longs) broadcast; the corpus is exploded m×
    * and aggregated by (vec_id, s) with partial min — one keyed shuffle to
    * build codes (amortized: a real deployment stores codes), then ADC is
    * a broadcast join + integer sum, one more keyed shuffle. Nothing
    * quadratic in the corpus anywhere. */
  /** Subspace view: one row per (id, subspace) with the 8-dim subvector
    * and its squared norm. */
  private def subspacesOf(df: DataFrame, idCol: String, m: Int, sub: Int): DataFrame = df
    .select(col("vec_id").as(idCol), explode(expr(
      s"transform(sequence(0, ${m - 1}), s -> " +
        s"struct(s AS s, slice(v, s * $sub + 1, $sub) AS sv))")).as("p"))
    .select(col(idCol), col("p.s").as("s"), col("p.sv").as("sv"))
    .withColumn("nn", expr("graft_dot(sv, sv)"))

  /** Encode the corpus against codebook `cb` ((j, s, cv, cnn) rows) and
    * rank queries by ADC distance — the shared back half of both PQ tiers. */
  /** Encode: nearest codeword per (vec_id, s); ||a-b||^2 = <a,a>+<b,b>-2<a,b>
    * via the codegen'd dot, no interpreted per-dim lambda in the hot path.
    * Argmin ties break on the lower codeword id via the (dist, j)
    * struct-min. */
  private def pqEncode(corpusSub: DataFrame, cb: DataFrame): DataFrame =
    corpusSub.join(broadcast(cb), Seq("s"))
      .withColumn("dist", col("nn") + col("cnn") - lit(2.0) * expr("graft_dot(sv, cv)"))
      .groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("dist"), col("j"))).as("mn"))
      .select(col("vec_id"), col("s"), col("mn.j").as("code"))

  /** ADC lookup tables in integer micro-units: per (query, subspace,
    * codeword), the rounded query-to-codeword squared distance. */
  private def pqDistTables(querySub: DataFrame, cb: DataFrame): DataFrame =
    querySub
      .join(broadcast(cb), Seq("s"))
      .select(col("q_id"), col("s"), col("j"),
        round((col("nn") + col("cnn") - lit(2.0) * expr("graft_dot(sv, cv)")) * 1e6)
          .cast("long").as("di"))

  private def pqAdcTopK(corpusSub: DataFrame, querySub: DataFrame,
                        cb: DataFrame, k: Int): DataFrame = {
    val codes = pqEncode(corpusSub, cb)
    val dt = pqDistTables(querySub, cb)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adist_micro"), col("n_id"))
    codes.join(broadcast(dt), codes("s") === dt("s") && codes("code") === dt("j"))
      .filter(col("q_id") =!= col("vec_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("di")).as("adist_micro"))
      .withColumn("n_id", col("vec_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("adist_micro"))
      .orderBy(col("q_id"), col("rank"))
  }

  def pqTopK(spark: SparkSession, dir: String, numQueries: Int = 10, k: Int = 5,
             m: Int = 8, ks: Int = 16): DataFrame = {
    val e = withVec(spark, dir)
    requirePqM(m)
    val sub = 64 / m // fixture embedding dim
    val cb = subspacesOf(e.filter(col("vec_id") < ks), "j", m, sub)
      .select(col("j"), col("s"), col("sv").as("cv"), col("nn").as("cnn"))
    pqAdcTopK(subspacesOf(e, "vec_id", m, sub),
      subspacesOf(e.filter(col("vec_id") < numQueries), "q_id", m, sub), cb, k)
  }

  /** Train all `m` sub-codebooks JOINTLY with one Lloyd loop: centroids are
    * keyed (s, j), assignment is one broadcast join + (vec, s)-keyed argmin
    * over the whole subspace view, and the mean update is one
    * (s, j, dim)-keyed aggregate — per iteration the corpus is scanned
    * once regardless of m, instead of m separate k-means runs. Dead
    * codewords keep their previous centroid (the standard rule, same as
    * [[kmeansFit]]). Fixed iteration count — the bench measures a bounded
    * fit, and PQ quality saturates in a few rounds. */
  def pqTrainCodebooks(spark: SparkSession, dir: String, m: Int = 8,
                       ks: Int = 16, maxIter: Int = 4): DataFrame = {
    val e = withVec(spark, dir)
    requirePqM(m)
    val sub = 64 / m
    val corpusSub = subspacesOf(e, "vec_id", m, sub)
    var cb = subspacesOf(e.filter(col("vec_id") < ks), "j", m, sub)
      .select(col("j"), col("s"), col("sv").as("cv"), col("nn").as("cnn"))
      .localCheckpoint(true)
    var iter = 0
    while (iter < maxIter) {
      val assigned = corpusSub.join(broadcast(cb), Seq("s"))
        .withColumn("dist",
          col("nn") + col("cnn") - lit(2.0) * expr("graft_dot(sv, cv)"))
        .groupBy(col("vec_id"), col("s"))
        // sv is constant within the (vec_id, s) group; carry it through the
        // argmin instead of joining the subspace view a second time
        .agg(min(struct(col("dist"), col("j"))).as("mn"), first(col("sv")).as("sv"))
        .select(col("s"), col("mn.j").as("j"), col("sv"))
      val means = assigned
        .select(col("s"), col("j"), posexplode(col("sv")).as(Seq("idx", "x")))
        .groupBy(col("s"), col("j"), col("idx")).agg(avg(col("x")).as("mv"))
        .groupBy(col("s"), col("j"))
        .agg(expr("transform(sort_array(collect_list(struct(idx, mv))), p -> p.mv)")
          .as("cv2"))
      cb = cb.join(means, Seq("s", "j"), "left")
        .select(col("j"), col("s"),
          coalesce(col("cv2"), col("cv")).as("cv"))
        .withColumn("cnn", expr("graft_dot(cv, cv)"))
        .localCheckpoint(true) // truncate per-round lineage (see kmeansFit)
      iter += 1
    }
    cb
  }

  /** [[pqTopK]] with TRAINED sub-codebooks — the quality path (float Lloyd
    * iterations mean no closed-form oracle; the spec compares its recall
    * against the seed-codebook tier on the same queries). */
  def pqTopKTrained(spark: SparkSession, dir: String, numQueries: Int = 10,
                    k: Int = 5, m: Int = 8, ks: Int = 16,
                    maxIter: Int = 4): DataFrame = {
    val e = withVec(spark, dir)
    requirePqM(m)
    val sub = 64 / m
    val cb = pqTrainCodebooks(spark, dir, m, ks, maxIter)
    pqAdcTopK(subspacesOf(e, "vec_id", m, sub),
      subspacesOf(e.filter(col("vec_id") < numQueries), "q_id", m, sub), cb, k)
  }

  /** IVF-PQ composite — the production ANN shape (the full FAISS IVFADC
    * pattern): the coarse quantizer restricts each query to its `nProbe`
    * closest cells, and candidates inside those cells are ranked by PQ
    * asymmetric distance over codes, never raw vectors. This is the index
    * that actually runs at 100 TB: the probe cut means a query touches
    * ~nProbe/nCells of the corpus, and the PQ cut means what it touches is
    * m bytes per vector, memory-resident. Both halves reuse the
    * deterministic constructions of [[ivfTopK]] (seed cells, strict->
    * assignment fold, probe ranking) and [[pqTopK]] (seed sub-codebooks,
    * struct-min encode, integer micro-unit ADC), so the composite keeps
    * their closed-form DuckDB oracle. Classic IVFADC encodes the RESIDUAL
    * v - centroid; encoding raw vectors instead changes the accuracy
    * constant, not the dataflow shape, and keeps the oracle exact — the
    * trained analog is [[pqTopKTrained]]'s tier.
    *
    * Scale shape: seeds, codebook and the query distance tables all
    * broadcast; cell assignment is a per-row fold (no corpus shuffle); the
    * candidate cut is a broadcast join of the (queries x nProbe) probe
    * table onto the assigned corpus BEFORE any code join, so ADC work is
    * candidate-sized, not corpus-sized; codes attach by one keyed join on
    * vec_id. In a real deployment assignment and codes are computed once
    * at ingest and stored — here they are part of the query for
    * oracle-checkability. */
  def ivfPqTopK(spark: SparkSession, dir: String, numQueries: Int = 10,
                k: Int = 5, nCells: Int = 8, nProbe: Int = 2,
                m: Int = 8, ks: Int = 16): DataFrame = {
    val e = withVec(spark, dir)
    requirePqM(m)
    val sub = 64 / m
    val seeds = seedCells(e, nCells)
    val assigned = cellAssign(e, seeds).select(col("vec_id"), col("cell"))
    val probes = cellProbes(e, seeds, numQueries, nProbe)
      .select(col("vec_id").as("q_id"), col("cell"))
    val cand = assigned.join(broadcast(probes),
        assigned("cell") === probes("cell") && col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"))
    val cb = subspacesOf(e.filter(col("vec_id") < ks), "j", m, sub)
      .select(col("j"), col("s"), col("sv").as("cv"), col("nn").as("cnn"))
    val codes = pqEncode(subspacesOf(e, "vec_id", m, sub), cb)
    val dt = pqDistTables(
      subspacesOf(e.filter(col("vec_id") < numQueries), "q_id", m, sub), cb)
      .withColumnRenamed("q_id", "dq").withColumnRenamed("s", "ds")
      .withColumnRenamed("j", "dj")
    val w = Window.partitionBy(col("q_id")).orderBy(col("adist_micro"), col("n_id"))
    cand.join(codes, Seq("vec_id"))
      .join(broadcast(dt), col("q_id") === col("dq") &&
        col("s") === col("ds") && col("code") === col("dj"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("di")).as("adist_micro"))
      .withColumn("n_id", col("vec_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("adist_micro"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Johnson-Lindenstrauss random projection: reduce every embedding to
    * `outDim` dimensions with a dense +-1 sign matrix (Achlioptas 2003 —
    * database-friendly random projections), scaled by 1/sqrt(outDim) so
    * pairwise distances are preserved in expectation. The cheap first
    * stage in front of ANN indexing and clustering when 64 dims are still
    * too many per candidate. The sign matrix is md5-keyed
    * (`graft_jl:<r>:<d>` hex-digit parity), so it is not engine-internal
    * hash state: any engine rebuilds the exact matrix and the operator
    * keeps an exact oracle.
    *
    * Shape at scale: the outDim x 64 matrix folds into ONE broadcast row;
    * projection is a per-row HOF fold over the corpus — zero shuffles, no
    * join row-amplification, nothing corpus-keyed anywhere (the output
    * sort is the only exchange). Sums run as sequential folds so the
    * doubles match the oracle bit-for-bit before the 4-dp round. */
  def jlProject(spark: SparkSession, dir: String, outDim: Int = 16): DataFrame = {
    val e = withVec(spark, dir)
    val m = spark.range(1)
      .select(explode(expr(s"sequence(0, ${outDim - 1})")).as("r"))
      .select(col("r"), explode(expr("sequence(0, 63)")).as("d"))
      .select(col("r"), col("d"), when(
        expr("cast(conv(substring(md5(concat('graft_jl:', r, ':', d)), 1, 1), 16, 10) as int) % 2 = 0"),
        lit(1.0)).otherwise(lit(-1.0)).as("sgn"))
      .groupBy(col("r"))
      .agg(expr("transform(array_sort(collect_list(struct(d, sgn))), s -> s.sgn)")
        .as("srow"))
      .agg(expr("transform(array_sort(collect_list(struct(r, srow))), s -> s.srow)")
        .as("mat"))
    e.crossJoin(broadcast(m))
      .select(col("vec_id"), posexplode(expr(
        s"""transform(sequence(0, ${outDim - 1}), r ->
           |  round(aggregate(sequence(0, 63), cast(0.0 as double),
           |    (acc, d) -> acc + element_at(element_at(mat, r + 1), d + 1)
           |      * element_at(v, d + 1))
           |    / sqrt(cast($outDim as double)), 4) + 0.0d)""".stripMargin))
        .as(Seq("r", "value")))
      .orderBy(col("vec_id"), col("r"))
  }

  /** Per-label mean-pooled embedding centroids — the pooling/centroid
    * report behind class prototypes, cluster summaries and nearest-
    * centroid classification: element-wise mean per (label, dimension),
    * with the member count. Float components are cast to double BEFORE
    * averaging (matching the oracle engine's arithmetic, like the whole
    * embedding family).
    *
    * Shape at scale: posexplode fans each vector into (dim, value) rows —
    * x dim, linear — and the centroid is ONE two-phase aggregate keyed on
    * (label, dim): partial sums map-side, then a shuffle of
    * labels x dims partial buffers, independent of corpus size. For
    * very high dim x label cardinality the alternative is a fixed-width
    * vector-sum aggregator (MLlib Summarizer shape); at embedding dims the
    * exploded two-phase agg is the simpler plan with the same single
    * shuffle. */
  def embedPool(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      // explode the raw float array and cast the SCALAR: a transform()
      // here would materialize a second 64-element array per row just to
      // explode it (float->double is exact per element either way)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "f")))
      .withColumn("v", col("f").cast("double"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        // + 0.0 collapses IEEE negative zero: round(-0.00004, 4) is -0.0
        // in one engine and 0.0 in the other, and the gate's sort keys
        // distinguish them even though -0.0 == 0.0
        (round(avg(col("v")), 4) + lit(0.0)).as("centroid"))
      .orderBy(col("label"), col("dim"))

  /** Hybrid retrieval with reciprocal-rank fusion (Cormack et al., SIGIR
    * 2009): fuse the lexical BM25 ranking ([[TextAnalysis.bm25]]) with the
    * semantic cosine ranking against one query embedding by
    * `rrf(d) = Σ_lists 1 / (rrfK + rank_list(d))` — the standard RAG
    * retrieval front end (sparse+dense fusion), which neither list alone
    * provides. Documents absent from a list contribute 0 for it and report
    * rank 0 (never null, so the fused row set is total).
    *
    * Shape at scale: each leg is already scale-correct on its own — BM25 is
    * one tf shuffle with broadcast df/corpus stats, the semantic leg is a
    * broadcast single-query corpus scan — and each is cut to its top-N by
    * TakeOrderedAndProject BEFORE fusion, so the full-outer fusion join and
    * final re-rank run over ≤ 2N rows regardless of corpus size. Ranks are
    * assigned on 4-dp-rounded scores with id tie-breaks, so both rank lists
    * (and hence the fusion) are engine-deterministic. */
  def hybridRetrieve(spark: SparkSession, dir: String,
                     query: Seq[String] = Seq("spark", "join", "stream"),
                     queryVecId: Long = 0L, topN: Int = 50, k: Int = 20,
                     rrfK: Int = 60): DataFrame = {
    val wLex = Window.orderBy(col("bm25").desc, col("doc_id"))
    // the query's own document is excluded from BOTH legs (review r11):
    // excluding it only from the semantic leg let it re-enter the fusion
    // through BM25 with sem_rank 0 — a retrieval hit that IS the query
    val lex = TextAnalysis.bm25(spark, dir, query)
      .filter(col("doc_id") =!= queryVecId)
      .orderBy(col("bm25").desc, col("doc_id")).limit(topN)
      .select(col("doc_id").as("id"), row_number().over(wLex).as("lex_rank"))
    val e = withVec(spark, dir)
    val q = e.filter(col("vec_id") === queryVecId).alias("q")
    val c = e.filter(col("vec_id") =!= queryVecId).alias("c")
    val wSem = Window.orderBy(col("cos").desc, col("id"))
    // + 0.0 collapses IEEE negative zero BEFORE the rank sort: Spark's
    // double comparator orders -0.0 < 0.0 while the oracle engine may not,
    // and a rounded cosine near zero can land on either
    val sem = c.join(broadcast(q))
      .select(col("c.vec_id").as("id"), (round(cosine, 4) + lit(0.0)).as("cos"))
      .orderBy(col("cos").desc, col("id")).limit(topN)
      .select(col("id"), row_number().over(wSem).as("sem_rank"))
    val wFin = Window.orderBy(col("rrf").desc, col("doc_id"))
    lex.join(sem, Seq("id"), "full_outer")
      .select(col("id").as("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(0)).as("sem_rank"))
      // lex term first, then sem: fixed addition order so the rounded sum
      // is bit-identical in any engine evaluating the same two terms
      .withColumn("rrf", round(
        when(col("lex_rank") > 0,
          lit(1.0) / (lit(rrfK) + col("lex_rank"))).otherwise(lit(0.0)) +
          when(col("sem_rank") > 0,
            lit(1.0) / (lit(rrfK) + col("sem_rank"))).otherwise(lit(0.0)), 4))
      .orderBy(col("rrf").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(wFin))
      .select(col("rank"), col("doc_id"), col("lex_rank"), col("sem_rank"),
        col("rrf"))
      .orderBy(col("rank"))
  }

  /** MMR-diversified retrieval (Carbonell & Goldstein 1998, the standard
    * RAG re-rank): greedily select k of the query's top-N candidates,
    * each pick maximizing `λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)` — high
    * relevance, low redundancy against what is already selected. The raw
    * cosine top-k hands a RAG context window five near-copies of the same
    * passage; MMR is the fix every retrieval stack ships.
    *
    * All scoring is integer micro-units on 4-dp cosines (λ = 7/10 becomes
    * the integer form `7·cm(q,d) − 3·max cm(d,s)`), with ties to the
    * lowest id — fully deterministic, so the greedy ORDER ITSELF is
    * DuckDB-oracle-checked (a recursive CTE replays the selection).
    * The first pick is the plain relevance argmax (empty selected set).
    *
    * Shape at scale: relevance scoring is the [[bruteForceTopK]] shape
    * (query broadcast, one corpus scan — or the [[ivfTopK]] probe cut as
    * the candidate generator at 100 TB), cut to top-N by the integer
    * relevance BEFORE anything pairwise; the pairwise matrix and the
    * greedy loop run over the BY-CONSTRUCTION bounded N-candidate set
    * (N² = 400 rows at the default), driver-side like every other
    * O(bounded) selection in the repo — never the corpus. */
  def mmrRerank(spark: SparkSession, dir: String, queryVecId: Long = 0L,
                topN: Int = 20, k: Int = 5): DataFrame = {
    // the pairwise matrix and greedy loop are driver-side O(topN^2) BY
    // PREMISE; make the premise mechanical so a caller cannot silently
    // turn the bounded collect into a corpus-sized one (lshTopK precedent)
    require(topN >= 1 && topN <= 4096,
      s"mmrRerank topN must be in [1, 4096] (driver holds topN^2 pair rows); got $topN")
    val e = withVec(spark, dir)
    val q = e.filter(col("vec_id") === queryVecId).alias("q")
    val c = e.filter(col("vec_id") =!= queryVecId).alias("c")
    // integer micro-unit relevance BEFORE the cut: the top-N boundary must
    // not depend on float ordering
    val cand = c.join(broadcast(q))
      .select(col("c.vec_id").as("id"),
        round(cosine * 10000).cast("long").as("cmq"),
        col("c.v").as("v"), col("c.norm").as("norm"))
      .orderBy(col("cmq").desc, col("id")).limit(topN)
      .localCheckpoint(true)
    val pw = cand.alias("c").join(broadcast(cand.alias("q")),
        col("q.id") =!= col("c.id"))
      .select(col("q.id").as("ida"), col("c.id").as("idb"),
        round(cosine * 10000).cast("long").as("cm"))
    val rel = cand.select(col("id"), col("cmq")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sim = pw.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    var selected = Vector.empty[Long]
    val picks = (1 to math.min(k, rel.length)).map { rank =>
      val (id, cmq) =
        if (selected.isEmpty) rel.minBy { case (i, s) => (-s, i) }
        else rel.filterNot(r => selected.contains(r._1)).minBy { case (i, s) =>
          val maxSel = selected.map(sid => sim((i, sid))).max
          (-(7L * s - 3L * maxSel), i)
        }
      selected :+= id
      (rank, id, cmq / 10000.0)
    }
    import spark.implicits._
    picks.toDF("rank", "doc_id", "relevance")
      .select(col("rank").cast("int").as("rank"), col("doc_id"),
        col("relevance"))
      .orderBy(col("rank"))
  }

  /** Int8 scalar quantization of the embedding corpus (the FAISS
    * `SQ8` codec): per-dimension min/max train the affine code
    * `code = floor((x − min)·255/(max − min))` (clamped at 255 for the
    * max-ulp edge), reconstruction decodes the bucket midpoint, and the
    * report carries per-dimension code statistics + reconstruction MSE —
    * the memory-4x-reduction audit run before switching an ANN index from
    * float32 to int8 storage.
    *
    * Engine-exact: min/max are order-independent; codes are integers;
    * per-element squared reconstruction errors are quantized to integer
    * 1e-8 units before summation (both engines evaluate the identical
    * per-row double expression, then sum integers — partial-aggregation
    * order cannot drift the MSE).
    *
    * Shape at scale: one posexplode pass (× dim, linear), ONE (dim)-keyed
    * two-phase aggregate for the stats, a 64-row broadcast back, and one
    * more (dim)-keyed aggregate for the code/error report — nothing
    * shuffles on a high-cardinality key, no driver state beyond dim
    * rows. */
  def embedSq8(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), posexplode(
        expr("transform(embedding, x -> cast(x as double))")).as(Seq("dim", "x")))
    val stats = e.groupBy(col("dim"))
      .agg(min(col("x")).as("dmin"), max(col("x")).as("dmax"))
    e.join(broadcast(stats), Seq("dim"))
      .withColumn("code", when(col("dmax") === col("dmin"), lit(0L))
        .otherwise(least(floor((col("x") - col("dmin")) * 255.0
          / (col("dmax") - col("dmin"))).cast("long"), lit(255L))))
      .withColumn("recon", col("dmin")
        + (col("code") + 0.5) * (col("dmax") - col("dmin")) / 255.0)
      .withColumn("em",
        round((col("x") - col("recon")) * (col("x") - col("recon")) * 1e8)
          .cast("long"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("code")).as("sc"),
        sum(col("em")).as("se"),
        (round(min(col("dmin")), 4) + 0.0).as("dmin"),
        (round(max(col("dmax")), 4) + 0.0).as("dmax"))
      .select(col("dim").cast("int").as("dim"), col("dmin"), col("dmax"),
        (round(col("sc").cast("double") / col("n"), 4) + 0.0).as("mean_code"),
        (round(col("se").cast("double") / col("n") / 1e8, 10) + 0.0).as("mse"))
      .orderBy(col("dim"))
  }

  /** Hard-negative mining for contrastive training (the DPR/Contriever
    * recipe): for each query vector, the top-k most-similar corpus vectors
    * with a DIFFERENT label — the near-miss negatives a bi-encoder learns
    * most from (random negatives are trivially separable; same-label rows
    * are positives, not negatives). Same broadcast-query/one-corpus-scan
    * shape as [[bruteForceTopK]] — no corpus shuffle, per-query ranking
    * over ~numQueries·k rows — with the label exclusion as a join
    * predicate, so same-label rows are dropped before the dot-product fold
    * ever runs. */
  def hardNegatives(spark: SparkSession, dir: String,
                    numQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = withVec(spark, dir)
    val q = e.filter(col("vec_id") < numQueries).alias("q")
    val c = e.alias("c")
    val scored = c.join(broadcast(q), col("q.label") =!= col("c.label"))
      .select(col("q.vec_id").as("q_id"), col("c.vec_id").as("n_id"),
        col("c.label").as("n_label"), cosine.as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      // + 0.0: a near-zero negative cosine rounds to IEEE -0.0, which the
      // gate's sort keys distinguish from 0.0 even though -0.0 == 0.0
      .select(col("q_id"), col("rank"), col("n_id"), col("n_label"),
        (round(col("cos"), 4) + lit(0.0)).as("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, the
    * LASER/CCMatrix parallel-corpus miner): for every source-side vector,
    * find the target-side candidate maximizing the MARGIN score —
    * cos(x,y) normalized by the average cosine of each side's k-nearest
    * neighborhood — and keep it when the margin clears 1.0. The margin
    * kills the "hub" false positives a raw cosine threshold mines (a
    * vector cosine-close to EVERYTHING scores high against all queries;
    * dividing by its neighborhood average cancels exactly that). Labels
    * stand in for languages: `srcLabel` is the query corpus, `tgtLabel`
    * the candidate pool.
    *
    * All scoring is integer micro-units on 4-dp cosines (ratio via
    * truncating integer division over positive operands), so the mined
    * set and every score are engine-exact — the float ratio would
    * diverge in the last ulp.
    *
    * Shape at scale: the cross-scoring table here is the brute-force
    * EXACT tier (source side broadcast, target corpus scanned once, same
    * as [[bruteForceTopK]]); at web scale the [[ivfPqTopK]] probe cut
    * replaces it as the candidate generator and everything downstream —
    * neighborhood sums, margins, per-source argmax — is unchanged. The
    * kNN sums are two keyed window/agg passes over the scored table, and
    * the final selection is one per-source window over candidate rows. */
  def bitextMine(spark: SparkSession, dir: String, srcLabel: Int = 0,
                 tgtLabel: Int = 1, k: Int = 4,
                 thresholdMicro: Long = 10000L): DataFrame = {
    val e = withVec(spark, dir)
    val x = e.filter(col("label") === srcLabel).alias("q")
    val y = e.filter(col("label") === tgtLabel).alias("c")
    // the brute-force scoring tier is consumed THREE times (margins + the
    // two neighborhood sums); eager localCheckpoint materializes it once —
    // without it each consumer re-runs the cross scoring (verified in the
    // plan: three nested-loop joins instead of one)
    val scored = y.crossJoin(broadcast(x))
      .select(col("q.vec_id").as("src_id"), col("c.vec_id").as("tgt_id"),
        round(cosine * 10000).cast("long").as("cm"))
      .localCheckpoint(true)
    marginSelect(scored, k, thresholdMicro)
  }

  /** The margin scorer + per-source argmax over a (src_id, tgt_id, cm)
    * candidate table — shared verbatim by the brute-force and IVF miners,
    * so "same margin machinery, different candidate generator" stays true
    * by construction. */
  private def marginSelect(scored: DataFrame, k: Int,
                           thresholdMicro: Long): DataFrame = {
    val wx = Window.partitionBy(col("src_id"))
      .orderBy(col("cm").desc, col("tgt_id"))
    val wy = Window.partitionBy(col("tgt_id"))
      .orderBy(col("cm").desc, col("src_id"))
    val sx = scored.withColumn("r", row_number().over(wx)).filter(col("r") <= k)
      .groupBy(col("src_id")).agg(sum(col("cm")).as("sx"))
    val sy = scored.withColumn("r", row_number().over(wy)).filter(col("r") <= k)
      .groupBy(col("tgt_id")).agg(sum(col("cm")).as("sy"))
    val margins = scored.join(sx, "src_id").join(sy, "tgt_id")
      // positive-cosine candidates with positive neighborhood mass only:
      // keeps the truncating `div` on positive operands, where floor and
      // truncation agree in both engines
      .filter(col("cm") > 0 && col("sx") + col("sy") > 0)
      .withColumn("mm", expr(s"(cm * ${2 * k}L * 10000L) div (sx + sy)"))
    val wSel = Window.partitionBy(col("src_id"))
      .orderBy(col("mm").desc, col("tgt_id"))
    margins.withColumn("sel", row_number().over(wSel))
      .filter(col("sel") === 1 && col("mm") >= thresholdMicro)
      .select(col("src_id"), col("tgt_id"),
        round(col("cm") / lit(10000.0), 4).as("cosine"),
        round(col("mm") / lit(10000.0), 4).as("margin"))
      .orderBy(col("src_id"))
  }

  /** The production bitext miner: [[bitextMine]]'s margin machinery over
    * the IVF probe-cut candidate set instead of the full cross join — the
    * swap the brute-force tier's scaladoc promises. The coarse quantizer
    * is the same deterministic seed construction [[ivfTopK]] uses, SHARED
    * across both language sides (the cross-lingual analog of a shared
    * FAISS index): targets are assigned to their one nearest cell, each
    * source probes its `nProbe` closest cells, and candidates are the
    * keyed (cell) join of the two — fac^2 cross-pair volume becomes
    * fac^2/nCells, and at real scale cells are thousands. Neighborhood
    * sums for the margin come from the CANDIDATE table, exactly what a
    * FAISS-retrieval miner computes (the margin's kNN is the retrieved
    * neighborhood). Fully deterministic, so the probe-cut mining is
    * DuckDB-oracle-checkable end to end, like [[ivfTopK]].
    *
    * nProbe is the recall/cost dial: on the near-random fixture
    * embeddings the coarse quantizer is weakly informative, and measured
    * argmax agreement with the brute-force miner is 0.27/0.49/0.65 at
    * nProbe 2/3/4 of 8 cells — the default probes half the cells (2x
    * candidate reduction, 0.65 agreement, spec floor 0.5); real
    * clustered embedding spaces sit far higher at far lower probe
    * fractions, which is the entire FAISS premise. */
  def bitextMineIvf(spark: SparkSession, dir: String, srcLabel: Int = 0,
                    tgtLabel: Int = 1, k: Int = 4,
                    thresholdMicro: Long = 10000L, nCells: Int = 8,
                    nProbe: Int = 4): DataFrame = {
    val e = withVec(spark, dir)
    val seeds = seedCells(e, nCells)
    val y = cellAssign(e.filter(col("label") === tgtLabel), seeds).alias("c")
    val xp = probesOf(e.filter(col("label") === srcLabel), seeds, nProbe)
      .alias("q")
    val scored = y.join(broadcast(xp), col("q.cell") === col("c.cell"))
      .select(col("q.vec_id").as("src_id"), col("c.vec_id").as("tgt_id"),
        round(cosine * 10000).cast("long").as("cm"))
      .localCheckpoint(true)
    marginSelect(scored, k, thresholdMicro)
  }

  /** KNN graph: every vector's top-k cosine neighbors WITHIN its coarse
    * cell — the all-corpus analog of [[bruteForceTopK]] (which ranks only a
    * small query set) and the backbone structure SemDeDup-style pipelines
    * and graph clustering consume. The label column stands in for the
    * coarse cell (on a real corpus the cell is [[kmeansFit]]'s assignment,
    * exactly [[ivfTopK]]'s partitioner).
    *
    * Scale posture: one shuffle of the corpus by cell, then a per-cell
    * self-join — quadratic ONLY in cell size (corpus/nCells), never in the
    * corpus; the per-source ranking is a window inside the same cell
    * partitioning, so the join output never reshuffles. This is the
    * standard blocked KNN-graph build: total work Σ|cell|², tuned by
    * nCells, and each cell's block is independent — embarrassingly
    * parallel across 1000 executors. No broadcast of the corpus, no
    * nested loop: the self-join is a hash equi-join on cell.
    *
    * Per-source ranking uses the bounded [[graft.functions.TopKAgg]]
    * aggregate, NOT a window: partial buffers cap at k map-side, so the
    * src_id exchange moves k rows per source instead of the whole
    * candidate set (cell size per source). [[knnGraphWindow]] keeps the
    * window formulation as the semantic reference; a spec pins them
    * byte-identical. */
  def knnGraph(spark: SparkSession, dir: String, k: Int = 3,
               blocking: String = "label", nCells: Int = graft.ops.Dedup.AutoCells): DataFrame = {
    val scored = knnCandidates(spark, dir, blocking, nCells)
    scored.groupBy(col("src_id"))
      .agg(graft.functions.TopKAgg(k, col("cos"), col("n_id")).as("nn"))
      .select(col("src_id"), posexplode(col("nn")).as(Seq("pos", "s")))
      .select(col("src_id"), (col("pos") + 1).cast("int").as("rank"),
        col("s._2").as("n_id"), round(col("s._1"), 4).as("cosine"))
      .orderBy(col("src_id"), col("rank"))
  }

  /** The window-ranked formulation of [[knnGraph]] — same answer, but the
    * exchange carries every candidate pair; kept as the reference
    * semantics for the equality spec. */
  def knnGraphWindow(spark: SparkSession, dir: String, k: Int = 3,
                     blocking: String = "label", nCells: Int = graft.ops.Dedup.AutoCells): DataFrame = {
    val scored = knnCandidates(spark, dir, blocking, nCells)
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src_id"), col("rank"), col("n_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("src_id"), col("rank"))
  }

  /** Candidate pairs for the kNN graph: `blocking = "label"` is the
    * gate/oracle form (frozen blocks — per-block quadratic at corpus
    * scale); `"cells"` rides the cells-SCALED two-level product quantizer
    * ([[graft.ops.Dedup.productCellAssign]], the r8 verdict #1 posture) —
    * nCells tracks the corpus, per-cell candidate volume constant. */
  private def knnCandidates(spark: SparkSession, dir: String,
                            blocking: String = "label",
                            nCells: Int = graft.ops.Dedup.AutoCells): DataFrame = {
    val (e, key) = blocking match {
      case "label" => (withVec(spark, dir), "label")
      case "cells" => (graft.ops.Dedup.productCellAssign(spark, dir,
        graft.ops.Dedup.resolveCells(spark, dir, nCells)), "cell")
      case other => throw new IllegalArgumentException(
        s"knn blocking must be 'label' or 'cells'; got '$other'")
    }
    val a = e.alias("c")
    val b = e.alias("q")
    a.join(b,
      col(s"q.$key") === col(s"c.$key") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("src_id"), col("c.vec_id").as("n_id"),
        cosine.as("cos"))
  }
}
