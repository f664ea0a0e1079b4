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
    val mid = (mm.getLong(0) + mm.getLong(1)) / 2
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
      .agg(max(col("nbkt")).cast("int").as("n_buckets"),
        round(sum(col("term")), 4).as("psi"))
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
}
