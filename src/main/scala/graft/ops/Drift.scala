package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus snapshots — the
  * population stability index (PSI), the standard train/serve-skew and
  * crawl-drift monitor: for each feature, bucket both snapshots, compare
  * bucket shares, PSI = Σ (p−q)·ln(p/q) (non-negative, 0 iff identical;
  * the industry rule of thumb flags ≥ 0.1 as drift). The validation
  * counterpart to [[QualityChecks]]: DQ asks "is this drop well-formed",
  * drift asks "is it the same distribution we trained on".
  */
object Drift {

  /** The standing report over the fixtures: split `documents` at the
    * midpoint doc_id ("yesterday's crawl" vs "today's") and compare
    * token-length, language and source distributions. */
  def driftReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val mm = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    // an empty corpus aggregates to (null, null) — getLong would NPE; any
    // midpoint splits the empty frame into two empty snapshots (PSI of
    // nothing vs nothing = the empty report, not a crash)
    val mid = if (mm.isNullAt(0)) 0L else (mm.getLong(0) + mm.getLong(1)) / 2
    psiReport(docs.filter(col("doc_id") <= mid),
      docs.filter(col("doc_id") > mid))
  }

  /** PSI per feature between a baseline and a current snapshot — the spec
    * entry point (identical frames must score exactly 0).
    *
    * Laplace smoothing (+1 per bucket over n+B) keeps every share
    * positive whichever side a bucket is missing from — deterministic,
    * engine-exact inputs into the one float ln per bucket.
    *
    * Shape at scale: per-feature bucketing is a per-row projection
    * (explode of a 3-element literal-shaped array); the counts are one
    * two-phase aggregate keyed by (feature, bucket) — buckets are
    * BOUNDED (length caps at 20, languages and sources are small
    * vocabularies), so everything after the first aggregate is
    * bucket-table-sized, and the per-feature stats broadcast back onto
    * it. Nothing corpus-sized survives the first aggregate. */
  def psiReport(base: DataFrame, curr: DataFrame): DataFrame = {
    def buckets(df: DataFrame, side: String): DataFrame =
      df.select(explode(array(
          concat(lit("len:"),
            least(floor(size(split(col("text"), " ")) / 10), lit(19))),
          concat(lit("lang:"), col("lang")),
          concat(lit("src:"), col("source")))).as("fb"))
        .select(split(col("fb"), ":").getItem(0).as("feature"),
          col("fb").as("bucket"), lit(side).as("side"))
    val counts = buckets(base, "b").unionByName(buckets(curr, "c"))
      .groupBy(col("feature"), col("bucket"))
      .agg(sum(when(col("side") === "b", 1L).otherwise(0L)).as("cb"),
        sum(when(col("side") === "c", 1L).otherwise(0L)).as("cc"))
    val stats = counts.groupBy(col("feature"))
      .agg(count(lit(1)).as("nbkt"), sum(col("cb")).as("nb"),
        sum(col("cc")).as("nc"))
    counts.join(broadcast(stats), "feature")
      .withColumn("p", (col("cb") + 1) / (col("nb") + col("nbkt")))
      .withColumn("q", (col("cc") + 1) / (col("nc") + col("nbkt")))
      .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
      .groupBy(col("feature"))
      // + 0.0 collapses IEEE negative zero before the hash gate (the
      // driftWindowed/abTest discipline — review r11)
      .agg(max(col("nbkt")).cast("int").as("n_buckets"),
        (round(sum(col("term")), 4) + 0.0).as("psi"))
      .withColumn("drifted", col("psi") >= 0.1)
      .orderBy(col("feature"))
  }

  /** WINDOWED drift — PSI of each day's event-value distribution against
    * the previous observed day: the continuous-monitoring form of
    * [[driftReport]] (a crawl/ingest pipeline alarms on day-over-day
    * shift, not on hand-picked snapshot pairs). Fixed value grid
    * (`bins` buckets of `binWidth`), Laplace smoothing over the DENSE
    * grid so both days share one bucket universe, p = previous day,
    * q = current (the [[psiReport]] convention).
    *
    * Shape at scale: one (day, bucket)-keyed count over the events (the
    * only corpus-sized step), then everything is days x bins: the
    * previous-day pairing is a lag over the O(days) distinct-day table
    * (bounded window), the dense grid an explode of a `bins`-element
    * range, and the PSI one aggregate over 10 terms per day. */
  def driftWindowed(spark: SparkSession, dir: String, bins: Int = 10,
                    binWidth: Double = 50.0): DataFrame = {
    // clamp BOTH ends of the grid: a negative value must not mint a
    // negative bucket outside the dense universe (silently breaking the
    // shared-bucket premise of the PSI)
    val ev = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        greatest(least(floor(col("value") / binWidth), lit(bins - 1)), lit(0))
          .cast("long").as("bucket"))
    // localCheckpoint: the count table feeds the day list AND both join
    // sides (current + previous), and AQE exchange reuse does not fire
    // across broadcast boundaries — without it the event log is scanned
    // four times. The materialized table is days x bins.
    val counts = ev.groupBy(col("day"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val days = counts.select(col("day")).distinct()
      .withColumn("prev", lag(col("day"), 1).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("day"))))
      .filter(col("prev").isNotNull)
    val grid = days.select(col("day"), col("prev"),
      explode(expr(s"sequence(cast(0 as bigint), cast(${bins - 1} as bigint))"))
        .as("bucket"))
    val cc = counts.select(col("day").as("cday"),
      col("bucket").as("cbucket"), col("n").as("cn"))
    val cp = counts.select(col("day").as("pday"),
      col("bucket").as("pbucket"), col("n").as("pn"))
    val j = grid
      .join(cc, grid("day") === cc("cday") && grid("bucket") === cc("cbucket"), "left")
      .join(cp, grid("prev") === cp("pday") && grid("bucket") === cp("pbucket"), "left")
      .select(grid("day"), grid("bucket"),
        coalesce(col("cn"), lit(0L)).as("cn"),
        coalesce(col("pn"), lit(0L)).as("pn"))
    val tot = j.groupBy(col("day"))
      .agg(sum(col("cn")).as("nc"), sum(col("pn")).as("np"))
    j.join(broadcast(tot), "day")
      .withColumn("p", (col("pn") + 1) / (col("np") + bins))
      .withColumn("q", (col("cn") + 1) / (col("nc") + bins))
      .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
      .groupBy(col("day"))
      .agg(max(col("nc")).as("n_events"),
        (round(sum(col("term")), 6) + 0.0).as("psi"))
      .orderBy(col("day"))
  }

  /** Welch two-sample test of the event value between deterministic
    * experiment arms — the A/B readout a pipeline runs per event type:
    * arm = md5-derived user split (the house cross-engine hash, so
    * assignment is reproducible anywhere), then mean difference, Welch
    * t-statistic and Welch–Satterthwaite degrees of freedom per type.
    *
    * Order-proof arithmetic: values quantize to integer centi-units
    * (floor(value·100)) and the moments accumulate EXACTLY in
    * DECIMAL(38,0) (DuckDB side: HUGEINT) — partial-aggregation order
    * cannot drift them, and a LONG square would overflow past ~$30M
    * per-row values (r12 extremes fuzz caught exactly that crash). The
    * t/df formulas are one identical double expression per engine.
    * One fused two-phase aggregate over the events scan; the arm pivot
    * happens inside the aggregate (conditional sums), no join at all. */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("cast(conv(substring(md5(concat('graft_ab:', " +
          "cast(user_id as string))), 1, 15), 16, 10) as bigint) % 2")
          .as("arm"),
        floor(col("value") * 100).cast("long").as("vc"))
    // moments accumulate in DECIMAL(38,0) (r12 extremes fuzz): vc is
    // centi-units, so vc*vc overflows a LONG at values past ~$30.4M
    // (sqrt(2^63) ≈ 3.04e9 centi-units) — reachable on real money columns,
    // and an ANSI crash killed the whole report. Decimal sums stay EXACT
    // to 1e38 (the oracle's
    // DuckDB side promotes BIGINT products to HUGEINT natively), and the
    // downstream double casts are unchanged, so cross-engine association
    // order still matches bit for bit.
    val dec = "decimal(38,0)"
    val a = e.groupBy(col("event_type")).agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
      sum(when(col("arm") === 0, col("vc")).otherwise(0L).cast(dec)).as("sa"),
      sum(when(col("arm") === 1, col("vc")).otherwise(0L).cast(dec)).as("sb"),
      sum(when(col("arm") === 0, col("vc").cast(dec) * col("vc"))
        .otherwise(lit(0)).cast(dec)).as("qa"),
      sum(when(col("arm") === 1, col("vc").cast(dec) * col("vc"))
        .otherwise(lit(0)).cast(dec)).as("qb"))
    // sample variance in centi^2 units: (q - s^2/n) / (n - 1); the whole
    // chain is written once and reused via columns so both engines see
    // the same association order. Degenerate arms (every user hashed to
    // one side, or a single-row arm) yield NULL moments on BOTH engines —
    // the explicit when() guards here mirror NULLIF in the oracle, so a
    // zero-division never throws under ANSI and never diverges cross-
    // engine (r8 ADVICE).
    a.select(col("event_type"), col("na"), col("nb"),
        when(col("na") > 0,
          col("sa").cast("double") / col("na") / 100.0).as("mean_a"),
        when(col("nb") > 0,
          col("sb").cast("double") / col("nb") / 100.0).as("mean_b"),
        when(col("na") > 1,
          (col("qa").cast("double") - col("sa").cast("double") *
            col("sa") / col("na")) / (col("na") - 1) / 10000.0).as("var_a"),
        when(col("nb") > 1,
          (col("qb").cast("double") - col("sb").cast("double") *
            col("sb") / col("nb")) / (col("nb") - 1) / 10000.0).as("var_b"))
      .withColumn("se2", col("var_a") / col("na") + col("var_b") / col("nb"))
      .select(col("event_type"), col("na"), col("nb"),
        round(col("mean_a"), 4).as("mean_a"),
        round(col("mean_b"), 4).as("mean_b"),
        // se2 = 0 (both arms zero-variance — e.g. a constant-valued event
        // type) would divide by zero, an ANSI crash: the test statistic is
        // undefined there, so emit null (review r11)
        when(col("se2") > 0,
          round((col("mean_a") - col("mean_b")) / sqrt(col("se2")), 4) + 0.0)
          .as("t_stat"),
        when(col("se2") > 0,
          round(col("se2") * col("se2") /
            (col("var_a") * col("var_a") / (col("na") * col("na")) /
              (col("na") - 1) +
             col("var_b") * col("var_b") / (col("nb") * col("nb")) /
              (col("nb") - 1)), 4)).as("welch_df"))
      .orderBy(col("event_type"))
  }

  /** Benford first-digit screen over the event values — the forensic DQ
    * check for fabricated or truncated numeric feeds: observed
    * first-significant-digit shares against Benford's log10(1 + 1/d)
    * expectation, with the chi-square statistic carried on every row.
    * The first digit comes from the exact integer centi-unit path
    * (string head of floor(|value|·100)), never from float log10 — no
    * power-of-ten boundary hazard; abs() first, because a negative value's
    * string head is '-', which Spark's cast nulls but DuckDB's raises —
    * Benford is sign-blind anyway (r8 ADVICE). One fused aggregate into
    * 9 rows. */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val obs = Tables.events(spark, dir)
      .select(expr(
        "cast(substring(cast(cast(floor(abs(value) * 100) as bigint) as string), 1, 1) as int)")
        .as("digit"))
      .filter(col("digit") >= 1)
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    // dense 1-9 frame: an unobserved digit still owes its expected mass
    // to the chi-square (a feed that NEVER produces a digit is exactly
    // the fabrication signal this screen exists for)
    val d = spark.range(1, 10).select(col("id").cast("int").as("digit"))
      .join(obs, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"))
      .localCheckpoint(true) // consumed by totals and the chi2 fold
    val tot = d.agg(sum(col("n_obs")).cast("long").as("n"))
    // n > 0 guards: a feed whose every |value| < 0.01 observes NO digit at
    // all (n = 0) — Spark's x/0 is null but DuckDB raises, so the shares
    // and chi-square go explicitly null on both engines (NULLIF in the
    // oracle) instead of diverging — the abTest degenerate-arm discipline
    val withExp = d.crossJoin(broadcast(tot))
      .withColumn("p_benford",
        log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)))
      .withColumn("chi_term",
        when(col("n") > 0,
          (col("n_obs") - col("p_benford") * col("n")) *
            (col("n_obs") - col("p_benford") * col("n")) /
            (col("p_benford") * col("n"))))
    val chi2 = withExp.agg(round(sum(col("chi_term")), 4).as("chi2"))
    withExp.crossJoin(broadcast(chi2))
      .select(col("digit"), col("n_obs"),
        when(col("n") > 0,
          round(col("n_obs").cast("double") / col("n"), 4)).as("share"),
        round(col("p_benford"), 4).as("p_benford"), col("chi2"))
      .orderBy(col("digit"))
  }
}
