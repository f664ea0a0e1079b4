package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** The governable headline tier (r8 verdict #6): the heavy tail plus one
    * representative per operator family — a low-variance core whose total
    * is comparable round over round without adjudicating drift across all
    * 180 queries. Members chosen from the committed r8 per-query snapshot:
    * everything >= ~2 s (the tail that dominates the total) plus one rep
    * each for relational agg/join, CDC apply, ANN, k-means, simhash, text
    * stats, layout pruning, and the r9 ingestion path. Both totals print:
    * `value` (full surface) and `headline`. */
  val Headline: Set[String] = Set(
    "q_compaction_split", "q_dedup_incr", "q_stream_join",
    "q_stream_traillog", "q_compaction_apply", "q_bpe_encode",
    "q_stream_sessions", "q_cluster_bigstar", "q_dedup_pipeline",
    "q_dedup_stream", "q_dedup_cluster", "q_train_manifest",
    "q_dedup_apply", "q_stream_hh", "q_pagerank", "q_dbscan",
    "q_dedup_ngram", "q_label_prop", "q_kcore", "q_kmeans_profile",
    "q_simhash_pairs", "q_tfidf", "q_ann_ivfpq", "q_prune_rate",
    "q5_multijoin", "q1_agg", "q_cdc_apply", "q_jsonl_decode")

  /** Checkpointed-streaming lifecycle ops whose wall time is a MEASURED
    * fixed floor (SCALE.md: start/stop + checkpoint + state-store setup
    * dominates; e.g. q_stream_join's 3.9 s two-trigger lifecycle floor),
    * not data-scale throughput. Re-running them buys no precision — their
    * variance is the lifecycle's, and drift on them is adjudicated by
    * Profile floors, not the sweep (r9 verdict #6) — so each gets ONE
    * timed rep (warm: the warmup pass still covers them, since a cold
    * first run pays codegen/JIT ON TOP of the floor) and skips the second
    * timed pass, trimming ~17 s of fixed cost from the sweep without
    * losing per-query coverage. */
  val FloorBound: Set[String] = Set(
    "q_stream_join", "q_stream_sessions", "q_stream_traillog",
    "q_dedup_stream", "q_stream_hh", "q_dedup_incr")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.get(s"local[$cpus]", cpus.toInt)
    // Warmup (untimed): touch every table once so parquet footer reads, JVM
    // JIT and codegen paths don't land on whichever query happens to run
    // first.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try { spark.read.parquet(s"$sfDir/$t.parquet").count(); () }
      catch { case _: Throwable => () }
    }
    // Second warmup tier: run EVERY query once untimed, then measure the
    // second run. Each distinct plan shape pays a one-time 2-5 s
    // codegen-compile + JIT cost on its first execution (measured at
    // sf0.1: q_dedup_ngram 7.2 s cold -> 2.2 s steady, q_kmeans_profile
    // 5.5 -> 2.6, q_containment 11.5 -> 1.6) — a fixed per-JVM overhead
    // that says nothing about data-scale throughput, which is what the
    // numbers are for. A representative-subset warmup (rounds 2-3) still
    // left first-run spikes on whichever heavy queries it skipped.
    // FloorBound ops warm up too: their plans still pay first-run
    // codegen/JIT on top of the lifecycle floor (measured: a cold
    // q_stream_traillog ran 5.8 s where its warm same-day Profile floor
    // was 3.4 s — skipping the warmup biased the single timed rep high)
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count(); () }
      catch { case _: Throwable => () }
    }
    // Drop the warmup pass's leftovers before timing: cached plans via the
    // CacheManager, and localCheckpoint blocks via ContextCleaner (which
    // only reaps them after their references are GC'd — hence the explicit
    // GC + settle pause). Without this, the timed pass runs under the
    // storage+GC pressure of ~90 warmup executions and the iterative
    // queries' numbers swing 2-4x run to run.
    spark.catalog.clearCache()
    System.gc()
    Thread.sleep(2000)
    // Min of two timed passes: single-shot numbers on a shared host carry
    // one-off scheduler/contention spikes (measured: the same warm query
    // swinging 2.5 s <-> 30 s between runs with an idle JVM); the min is
    // the standard noise-robust throughput estimator and both passes run
    // against identical warm state.
    // A rep that THROWS is never timed (review r11): an erroring query
    // completes in ~ms, so recording its elapsed time would report a
    // regression-into-error as a SPEEDUP and the mover gate could never
    // fire on it. Failed reps land in `errs`; a query with no successful
    // rep in any pass it ran is reported in the JSON `errors` list.
    def timedPass(skip: Set[String]): (Map[String, Double], Set[String]) = {
      val times = Map.newBuilder[String, Double]
      val errs = Set.newBuilder[String]
      SparkEntry.queries.foreach { case (name, fn) =>
        if (!skip(name)) {
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
                   catch { case e: Throwable =>
                     System.err.println(s"bench: $name failed: $e"); false }
          if (ok) times += name -> (System.nanoTime() - t0) / 1e9
          else errs += name
        }
      }
      (times.result(), errs.result())
    }
    // FloorBound ops run once (in p1); everything else takes min-of-two
    val (p1, e1) = timedPass(Set.empty)
    val (p2, e2) = timedPass(FloorBound ++ e1)
    val results = p1.map { case (k, v) => k -> math.min(v, p2.getOrElse(k, v)) }
    // only queries with ZERO successful reps are errors (r12 ADVICE): a
    // query that succeeded in pass 1 but threw in pass 2 keeps its pass-1
    // time in `queries` — listing it in `errors` too would make the JSON
    // ambiguous (the same name simultaneously timed and errored)
    val errors = ((e1 ++ e2) -- results.keySet).toSeq.sorted
    // Locale.ROOT: the default-locale format would print "0,123" on
    // comma-decimal locales — invalid JSON, the parsed:null failure all
    // over again.
    def f(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))
    // JSON string escape for interpolated paths (review r11): a quote or
    // backslash in SPARK_GRAFT_SF_DIR / user.dir would otherwise emit
    // malformed JSON and zero the round's bench parse.
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // ---- automated headline-drift adjudication (r10 verdict #3) ----
    // The r9 gate (scripts/bench_compare.py) flags headline movers >1.3x
    // vs the committed per-query snapshot, but the Profile-floor check on
    // each mover was a manual step. Here the sweep adjudicates inline:
    // for every flagged mover it re-runs the query 3 more times against
    // the same warm state and takes the MIN (the Profile floor — the
    // noise-free estimator on a shared host); a floor at or below the
    // prior snapshot (10% tolerance for sub-second jitter) means the
    // capacity is unchanged and the sweep number was host drift, anything
    // above is a genuine suspect. The verdicts ship in the JSON as
    // `movers_adjudicated`, so the round verdict cites measured floors
    // instead of hand-run ones. Prior = the BENCH_QUERIES.json on disk
    // BEFORE this run overwrites it (the protocol keeps the fastest
    // committed snapshot there).
    val MoverRatio = 1.3
    val MoverAbsSecs = 0.3
    val DriftTolerance = 1.10
    def priorQueries(path: String): Map[String, Double] =
      try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(new java.io.File(path)).get("queries")
        if (node == null) Map.empty
        else {
          val it = node.fields()
          val b = Map.newBuilder[String, Double]
          while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble() }
          b.result()
        }
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
    // a rep that THROWS is excluded, never timed (review r11): a failed
    // run completes in ~ms, and min() over it would mint a near-zero
    // "floor" that adjudicates any regression as drift — an erroring
    // query is the opposite of exonerated
    def floorOf(name: String, reps: Int = 3): Option[Double] = {
      val ok = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        val succeeded =
          try { SparkEntry.queries(name)(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        if (succeeded) Some((System.nanoTime() - t0) / 1e9) else None
      }
      ok.minOption
    }
    // ---- headline Profile floors (r11 verdict #2) ----
    // The sweep carries a 121-146 s same-code host-drift band — wide
    // enough that r11's mover gate fired 7 times and every verdict was
    // "drift". The 3-rep Profile floor (min of reps against warm state)
    // is the noise-robust estimator those adjudications already trusted;
    // compute it for the WHOLE headline tier every run and ship it in the
    // JSON, so bench_compare.py can gate floor-vs-floor instead of
    // sweep-vs-sweep. Floor = min(sweep reps, 3 dedicated reps): min over
    // more warm samples can only tighten the estimator, and both sides of
    // a floor-vs-floor compare are built the same way.
    val floors: Map[String, Double] =
      Headline.toSeq.sorted.flatMap { k =>
        if (!results.contains(k)) None
        else floorOf(k).map(fl => k -> math.min(fl, results(k)))
      }.toMap
    // ---- reported per-query numbers: min over ALL warm reps (r14) ----
    // The sweep passes and the dedicated floor reps run against identical
    // warm state, so the min over every successful rep is the same
    // estimator min-of-two already is — just over more samples where they
    // exist (the headline tier, whose 3 floor reps run regardless). On a
    // noisy host the old report mixed estimators: `floors` carried the
    // robust number while `value`/`queries` kept one-shot spikes the
    // FloorBound single rep and 2-rep sweeps can't reject (this session,
    // measured: q_stream_traillog swept 22.3 s with a same-run floor of
    // 3.2 s — 19 s of pure scheduler noise in the reported total). The
    // raw sweep mins are preserved in BENCH_QUERIES.json as
    // `queries_swept` so both estimators stay comparable round over round
    // (OPTIMIZATION_r14.md documents the change; BENCH_r13 and earlier
    // are sweep-estimator numbers).
    val resultsF = results.map { case (k, v) =>
      k -> math.min(v, floors.getOrElse(k, v)) }
    def adjudicateMovers(prior: Map[String, Double]): String = {
      val movers = resultsF.keys.toSeq
        .filter(Headline)
        .flatMap { k =>
          prior.get(k).collect {
            case p if p > 0 && resultsF(k) / math.max(p, 1e-3) > MoverRatio &&
              resultsF(k) - p > MoverAbsSecs => (k, p)
          }
        }
        // WORST movers first (review r11: an alphabetical cut could leave
        // the largest regression unadjudicated), then bounded so the
        // stdout line stays inside the driver's 2000-char window (6, down
        // from 8, since r12's `floors` dict now shares that window — and
        // floor-gating in bench_compare.py covers every headline query,
        // so the cut no longer loses adjudication coverage)
        .sortBy { case (k, p) => -(resultsF(k) / math.max(p, 1e-3)) }
        .take(6)
      movers.map { case (k, p) =>
        // reuse the headline floors computed above (movers are headline
        // members by construction) — no extra reps
        val fl = floors.get(k)
        // no successful rep => the query now ERRORS at floor time: that is
        // a regression suspect by definition, never drift
        val verdict = fl match {
          case Some(v) if v <= p * DriftTolerance => "drift"
          case _ => "regression_suspect"
        }
        val flJson = fl.map(f).getOrElse("null")
        s"""{"query":"$k","prior":${f(p)},"swept":${f(resultsF(k))},"floor":$flJson,"verdict":"$verdict"}"""
      }.mkString("[", ",", "]")
    }
    val total = if (resultsF.nonEmpty) resultsF.values.sum else 0.0
    val headlineHit = resultsF.view.filterKeys(Headline).toMap
    val headlineTotal = if (headlineHit.nonEmpty) headlineHit.values.sum else 0.0
    // The driver's output-tail window is a hard 2000 chars (BENCH_r03 and
    // r04 tails both captured exactly 2000, truncating the line's HEAD).
    // 92 query names alone exceed that at any decimal precision, so the
    // per-query map cannot live on stdout: write it to BENCH_QUERIES.json
    // next to the repo root, and keep the final stdout line a compact
    // totals-only summary (~100 chars — can never overflow the window).
    val perQuery = resultsF.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    // raw sweep estimator (min of the timed passes only, no floor reps) —
    // kept so the r13-and-earlier snapshots stay comparable
    val perQuerySwept = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    // Anchor at the launch directory (sbt runs from the repo root, and any
    // other checkout gets a path that exists there too — a hardcoded
    // absolute path broke outside this container); overridable for tests.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERIES",
      new java.io.File(sys.props("user.dir"), "BENCH_QUERIES.json").getPath)
    // the prior snapshot must be read BEFORE the overwrite below
    val movers = adjudicateMovers(priorQueries(outPath))
    val errorsJson = errors.map(jstr).mkString("[", ",", "]")
    // stdout carries at most 10 error names (review r12): with the r12
    // floors dict (~765 chars) sharing the driver's hard 2000-char output
    // window, an error STORM (20+ failing queries) would push the line's
    // HEAD out of the captured tail and zero the whole bench parse —
    // exactly when the errors matter most. The full list lives in the
    // per_query file; stdout keeps the count and the first names.
    // truncation is signalled by the SEPARATE numeric errors_truncated
    // field, never by a sentinel element inside the array — any consumer
    // of the stdout JSON may treat every element as a query name
    // (ADVICE r12)
    val errorsStdout = errors.take(10).map(jstr).mkString("[", ",", "]")
    val errorsTruncated = math.max(0, errors.size - 10)
    val floorsJson = floors.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val fileJson =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","n":${resultsF.size},"headline":${f(headlineTotal)},"n_headline":${headlineHit.size},"errors":$errorsJson,"movers_adjudicated":$movers,"floors":$floorsJson,"queries":$perQuery,"queries_swept":$perQuerySwept,"sf":${jstr(sfDir)}}"""
    // per_query advertises the path actually WRITTEN, and null if the write
    // failed — a fixed pointer would present a stale committed file as this
    // run's timings.
    val wrote =
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outPath),
          (fileJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        true
      } catch {
        case e: Throwable =>
          System.err.println(s"bench: could not write $outPath: $e"); false
      }
    val perQueryRef = if (wrote) jstr(outPath) else "null"
    val out =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","n":${resultsF.size},"headline":${f(headlineTotal)},"n_headline":${headlineHit.size},"errors":$errorsStdout,"errors_truncated":$errorsTruncated,"movers_adjudicated":$movers,"floors":$floorsJson,"sf":${jstr(sfDir)},"per_query":$perQueryRef}"""
    // Stop Spark BEFORE printing so no shutdown logging can land after the
    // JSON line: it must be the last line of stdout for the driver's parser.
    spark.stop()
    println(out)
    Console.out.flush()
  }
}
