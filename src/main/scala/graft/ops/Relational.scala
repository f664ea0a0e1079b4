package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2.2): the categories the
  * reference lacks, provided natively through Catalyst. Every query here is
  * declarative DataFrame API — predicate pushdown, column pruning, join
  * strategy selection, partial aggregation and whole-stage codegen come from
  * the optimizer, not hand-scheduling.
  *
  * All computed columns are aliased identically to the DuckDB oracle SQL in
  * [[graft.SparkEntry.oracleSql]]; money/ratio aggregates are rounded so
  * double accumulation-order differences between engines can't flip a hash.
  */
object Relational {
  private def t(spark: SparkSession, dir: String, name: String) =
    Tables(spark, dir, name)

  /** TPC-H Q1-shaped pricing summary: hash aggregate with partial+final
    * phases (map-side combine) — one shuffle on the two low-cardinality keys. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-shaped: two joins + agg + deterministic top-k. `customer` is
    * small → Catalyst broadcasts it; lineitem-orders shuffles on orderkey. */
  def q3JoinTopk(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(spark, dir, "orders")
    val l = t(spark, dir, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped: five-way join; dims broadcast, facts shuffle once. */
  def q5MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val r = t(spark, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(spark, dir, "nation")
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    val l = t(spark, dir, "lineitem")
    val s = t(spark, dir, "supplier")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey") &&
                          c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("n_name"))
  }

  /** Ranking window: top order per customer (row_number frame). */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("top_order"),
        round(col("o_totalprice"), 2).as("top_price"))
      .orderBy(col("o_custkey"))
  }

  /** Analytic window: running sum + lag over each user's event history. */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      // INTEGER-CENTS cumulative sum (r13 composed fuzz): at extremes
      // magnitudes (value x1e9) a double running sum's last bits depend on
      // the engine's frame-evaluation association (Spark sequential vs
      // DuckDB segment tree), and even a DECIMAL sum diverges at the final
      // decimal->double cast once cents are sub-ulp (~1e14) — DuckDB's
      // conversion is not correctly rounded. BIGINT cents are exact in
      // both engines at any reachable magnitude.
      .withColumn("running_cents",
        round(sum(col("value").cast("decimal(38,6)"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)) * 100, 0)
          .cast("long"))
      .withColumn("prev_event", lag(col("event_id"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("running_cents"), col("prev_event"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Window analytics beyond ranking/running: lead, first/last value with
    * an explicit full frame, and a RANGE frame over event time (trailing
    * one-hour sum per user — the sliding-aggregate shape). Event time is
    * compared as epoch MICROSECONDS, so the range bound is 3.6e9. All
    * frames are per-user partitions: no global window anywhere. */
  def windowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wHour = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0L)
    e.select(
        col("user_id"), col("event_id"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        first(col("event_id")).over(w).as("first_event"),
        last(col("event_id")).over(wFull).as("last_event"),
        // INTEGER-CENTS for the same reason as windowRunning (r13 fuzz)
        round(sum(col("value").cast("decimal(38,6)")).over(wHour) * 100, 0)
          .cast("long").as("hour_cents"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** ANSI grouping semantics on EMPTY input: ROLLUP/CUBE include the `()`
    * grouping set, which aggregates an empty relation to ONE grand-total
    * row (count 0, null sums) — DuckDB and Postgres emit it; Spark's
    * Expand-based implementation emits zero rows (r12 adversarial-fixture
    * fuzz finding: the `single`/`empty` variants diverged on exactly
    * this). The repair reuses the rollup's OWN output: its `()` row
    * exists iff the input was non-empty, so the constant grand-total row
    * enters via a left-anti probe against the (checkpointed,
    * aggregate-sized) result — never a second scan of the input, at any
    * scale. */
  private def withEmptyGrandTotal(rolled: DataFrame, grand: DataFrame): DataFrame = {
    val ck = rolled.localCheckpoint()
    ck.union(grand.join(
      broadcast(ck.limit(1).select(lit(1).as("__probe"))), lit(true), "left_anti"))
  }

  /** Grouping sets via ROLLUP(region, nation) over the customer dimension. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    val r = t(spark, dir, "region")
    val n = t(spark, dir, "nation")
    val c = t(spark, dir, "customer")
    val rolled = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("acctbal"))
    val grand = spark.range(1).select(
      lit(null).cast("string").as("r_name"), lit(null).cast("string").as("n_name"),
      lit(0L).as("n_cust"), lit(null).cast("double").as("acctbal"))
    withEmptyGrandTotal(rolled, grand)
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** Grouping sets via CUBE over order status x priority. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame = {
    val cubed = t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      // INTEGER-CENTS sum (r13 composed fuzz): 15k-row groups of x1e6
      // magnitudes put a double sum's association-order noise ABOVE the
      // cent, and a DECIMAL sum still diverges at the decimal->double cast
      // once cents are sub-ulp — BIGINT cents are exact in both engines
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(38,6)")) * 100, 0)
          .cast("long").as("total_cents"))
    val grand = spark.range(1).select(
      lit(null).cast("string").as("o_orderstatus"),
      lit(null).cast("string").as("o_orderpriority"),
      lit(0L).as("n"), lit(null).cast("long").as("total_cents"))
    withEmptyGrandTotal(cubed, grand)
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  /** GROUPING SETS proper (neither rollup nor cube): independent per-region
    * and per-nation aggregates in ONE pass over the join — Catalyst expands
    * to a single Expand + hash aggregate, not two scans. */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame = {
    val r = t(spark, dir, "region")
    val n = t(spark, dir, "nation")
    val c = t(spark, dir, "customer")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupingSets(Seq(Seq(col("r_name")), Seq(col("n_name"))),
        col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("acctbal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** Pivot: per-user event-type value matrix. Explicit pivot values keep the
    * schema static (no extra distinct-values job) — the form that scales. */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(round(sum(col("value")), 2))
      .orderBy(col("user_id"))

  /** Unpivot/melt: wide part attributes to long (attr, val) form — the
    * inverse of pivot, a narrow Expand with no shuffle at all. */
  def unpivotAttrs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")), Array(col("p_size"), col("p_retailprice")),
        "attr", "raw")
      .select(col("p_partkey"), col("attr"), round(col("raw"), 2).as("val"))
      .orderBy(col("p_partkey"), col("attr"))

  /** Range (interval) join: views attributed to a purchase of the same user
    * within the preceding hour. The user_id equality keeps this a hash/SMJ
    * join with a range residual — NOT a nested-loop — so it shuffles once on
    * the key and scales; the pure-inequality form would be quadratic. */
  def rangeJoinCount(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    p.join(v, col("user_id") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("v_ts") < col("p_ts"), "left")
      .groupBy(col("purchase_id"), col("user_id"))
      .agg(count(col("v_ts")).as("n_views"))
      .orderBy(col("purchase_id"))
  }

  /** Filtered/conditional aggregation: count_if + CASE-gated avg + bool_or
    * in one hash aggregate (no self-joins, no multi-pass). */
  def conditionalAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count_if(col("o_totalprice") > 200000).as("n_big"),
        round(count_if(col("o_totalprice") > 200000) / count(lit(1)), 4).as("big_share"),
        round(avg(when(col("o_orderstatus") === "F", col("o_totalprice"))), 2).as("avg_f"),
        bool_or(col("o_totalprice") > 500000).as("any_jumbo"))
      .orderBy(col("o_orderpriority"))

  /** Date-part bucketing: monthly order volume/revenue (year/month/quarter
    * extraction — pushdown-friendly scalar date functions). */
  def dateBuckets(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mon"),
        quarter(col("o_orderdate")).as("qtr"))
      // INTEGER-CENTS revenue — same extremes-magnitude class as cubeAgg
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(38,6)")) * 100, 0)
          .cast("long").as("revenue_cents"))
      .orderBy(col("yr"), col("mon"))

  /** Approximate distinct (HyperLogLog++). The sketch estimate itself is
    * engine-specific, so the oracle-comparable output is the EXACT count
    * plus a Spark-computed error-bound verdict: `within_5pct` must be true
    * (2.5σ of the 2% target rsd), and the oracle emits literal TRUE — an
    * estimate drifting past the bound flips the boolean and fails the hash
    * gate, turning the error contract into a driver-checked property. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").agg(
      approx_count_distinct(col("o_custkey"), 0.02).as("approx_cust"),
      countDistinct(col("o_custkey")).as("exact_cust"))
      .select(col("exact_cust"),
        // exact_cust = 0 (empty table) divides by zero — an ANSI crash;
        // the error bound is vacuously met on an empty table (review r11)
        when(col("exact_cust") =!= 0,
          abs(col("approx_cust") - col("exact_cust")).cast("double") /
            col("exact_cust") <= 0.05)
          .otherwise(lit(true)).as("within_5pct"))

  /** Exact distinct aggregation (expand + two-phase agg under the hood). */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").agg(
      countDistinct(col("o_custkey")).as("n_cust"),
      countDistinct(col("o_orderpriority")).as("n_prio"),
      countDistinct(col("o_orderstatus")).as("n_status"))

  /** Deterministic top-k → TakeOrderedAndProject (no global sort shuffle:
    * per-partition top-k then merge on the driver). */
  def topK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("price"))
      .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)

  /** Left-anti join: customers with no large order (NOT EXISTS). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))
  }

  /** Left-outer join + null-preserving aggregation: every customer with
    * their count/total of large orders (0 where none). */
  def outerJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0d)), 2).as("total"))
      .orderBy(col("c_custkey"))
  }

  /** Left-semi join + agg: customers having orders, counted per nation. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("c_nationkey"))
  }

  /** Set operation: EXCEPT (hash-distinct anti semantics). */
  def exceptDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    o.filter(col("o_totalprice") > 150).select(col("o_orderkey").as("k"))
      .except(o.filter(col("o_orderstatus") === "F").select(col("o_orderkey").as("k")))
      .orderBy(col("k"))
  }

  /** Set operation: INTERSECT. */
  def intersectOp(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    o.filter(col("o_totalprice") > 300000).select(col("o_orderkey").as("k"))
      .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_orderkey").as("k")))
      .orderBy(col("k"))
  }

  /** Custom typed UDAF (weighted average Aggregator) in a grouped agg. */
  def udafWavg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(graft.functions.WeightedAvg(col("l_extendedprice"), col("l_quantity")), 2)
        .as("wavg_price"))
      .orderBy(col("l_returnflag"))

  /** Scalar function coverage: string/math/modulo — all codegen'd built-ins. */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part").select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      substring(col("p_name"), 1, 5).as("name5"),
      length(col("p_name")).as("name_len"),
      concat(col("p_brand"), lit("#"), col("p_type")).as("bt"),
      abs(col("p_size") - 25).as("size_dev"),
      (col("p_partkey") % 7).as("k7"),
      round(col("p_retailprice") * 1.1, 2).as("price_up"))
      .orderBy(col("p_partkey"))

  /** JSON payload extraction (the reference's Postgres JSON-column parse,
    * `postgres.py:103-105`, generalized): parse, bucket, aggregate. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k"))
      .withColumn("k_bucket", col("k") % 10)
      .groupBy(col("k_bucket"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("k_bucket"))

  /** Event-time tumbling window aggregate (batch form; the streaming form
    * with watermark is exercised in StreamingSpec). Hour-aligned windows ==
    * date_trunc, keeping the oracle portable. */
  def timeWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("hour_start"), col("event_type"))

  /** Exact interpolated percentiles (median / p90) per group. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("median_price"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90_price"))
      .orderBy(col("o_orderpriority"))

  /** Z-score outlier profile per event type — the standard data-quality
    * monitor: per-type mean/stddev (one partial+final aggregate over a
    * handful of groups) broadcast back onto the feed, and a second scan
    * counts values outside mu ± 3·sd. Thresholds derive from the ROUNDED
    * moments so the boundary is an exact decimal both engines agree on —
    * raw float mean/stddev differ across engines in the last ulp, and a
    * threshold sitting on a raw value would make the count
    * accumulation-order-dependent. */
  def outliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 2).as("mu"),
        round(stddev(col("value")), 2).as("sd"))
    ev.join(broadcast(stats), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("mu")).as("mu"), max(col("sd")).as("sd"),
        sum(when(col("value") < col("mu") - lit(3) * col("sd") ||
                 col("value") > col("mu") + lit(3) * col("sd"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** Sketch-based percentiles (`approx_percentile`, 1000-bin accuracy) —
    * the single-pass mergeable path that replaces the exact percentile's
    * per-group sort at scale: sketch state is O(accuracy) per group and
    * merges associatively across partitions. Sketch merge order makes the
    * estimates engine-specific, so the oracle-comparable output is the
    * EXACT interpolated percentiles (parity with DuckDB's quantile_cont is
    * proven by q_percentile) plus Spark-computed 2%-error verdicts; the
    * oracle emits literal TRUE — an estimate past the bound flips the
    * boolean and fails the hash gate. */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame =
    // Verdicts are RANK-based, not value-relative (r13 composed fuzz): the
    // sketch's guarantee is rank error <= 1/accuracy, and on a heavy-tailed
    // column (extremes: 1e5 and 2.6e11 clusters) a within-bound rank slip
    // crosses a 1e6x value gap — the old 2%-of-value check failed a
    // CORRECT sketch. ok := estimate lands between the exact 48th/52nd
    // (88th/92nd) percentiles — 20x the sketch's rank bound, distribution-
    // free. An all-null group has no percentiles: verdicts are NULL and
    // the oracle mirrors that (never a vacuous TRUE).
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(expr("approx_percentile(o_totalprice, array(0.5, 0.9), 1000)").as("ap"),
        expr("percentile(o_totalprice, 0.5)").as("ex_med"),
        expr("percentile(o_totalprice, 0.9)").as("ex_p90"),
        expr("percentile(o_totalprice, 0.48)").as("lo_med"),
        expr("percentile(o_totalprice, 0.52)").as("hi_med"),
        expr("percentile(o_totalprice, 0.88)").as("lo_p90"),
        expr("percentile(o_totalprice, 0.92)").as("hi_p90"))
      .select(col("o_orderpriority"),
        round(col("ex_med"), 2).as("median_exact"),
        round(col("ex_p90"), 2).as("p90_exact"),
        (col("ap").getItem(0) >= col("lo_med") &&
          col("ap").getItem(0) <= col("hi_med")).as("median_ok"),
        (col("ap").getItem(1) >= col("lo_p90") &&
          col("ap").getItem(1) <= col("hi_p90")).as("p90_ok"))
      .orderBy(col("o_orderpriority"))

  /** Session windows in batch mode (gap-based, 30 min): Spark's
    * `session_window` — oracle-checkable because the gaps-and-islands SQL
    * formulation defines the identical grouping. */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("sess_start"),
        col("n"), col("total"))
      .orderBy(col("user_id"), col("sess_start"))

  /** Generator / UDTF row: explode tokens and count the top terms. */
  def explodeTokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(25)

  /** Ordered string aggregation per group. */
  def stringAgg(spark: SparkSession, dir: String): DataFrame = {
    val n = t(spark, dir, "nation")
    val c = t(spark, dir, "customer")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(array_join(array_sort(collect_list(col("c_name"))), ",").as("names"),
        count(lit(1)).as("n_cust"))
      .orderBy(col("n_name"))
  }

  /** Counts across all fixture tables — the `check` command's source side
    * (S5) widened to every table. */
  def checkCounts(spark: SparkSession, dir: String): DataFrame = {
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.map { n =>
      t(spark, dir, n).agg(count(lit(1)).as("cnt")).select(lit(n).as("tbl"), col("cnt"))
    }.reduce(_.unionAll(_)).orderBy(col("tbl"))
  }

  /** P1/P2 projection + rename + coercion over events (the reference's
    * `mapping_data`, `schemas.py:18-30`): timestamp -> epoch seconds int,
    * date -> 'yyyy-MM-dd' string. */
  def projectCoerce(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id").as("id"),
      col("user_id"),
      col("event_type").as("op_type"),
      unix_timestamp(col("ts")).as("ts_epoch"),
      date_format(col("ts"), "yyyy-MM-dd").as("ts_date"))
      .orderBy(col("id"))

  /** F1+F2 combined filter (pushable predicates — reach the parquet scan). */
  def filters(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase") && col("value") > 100)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  /** B1 last-write-wins compaction over the events stream viewed as a CDC
    * log keyed by user_id (`event.py:10-13`). */
  def dedupLww(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event"),
        col("event_type").as("last_type"))
      .orderBy(col("user_id"))
  }

  /** K1 upsert semantics as a batch query: treat events as a CDC log
    * (signup=create, error=delete, else update); final state = last
    * non-delete event per key, absent if the last event is a delete. */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("op",
        when(col("event_type") === "signup", "create")
          .when(col("event_type") === "error", "delete")
          .otherwise("update"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "delete")
      .select(col("user_id"), col("op").as("last_op"),
        col("event_id"), round(col("value"), 2).as("value"))
      .orderBy(col("user_id"))
  }

  /** Skew-resistant join, proved output-identical to the plain join by the
    * oracle: the build side is replicated once per salt value and the
    * probe side joins on (key, deterministic salt), so one hot key's rows
    * spread over `salt` reducers instead of one. This is the manual form
    * of what AQE's skew-join split does at runtime — kept explicit because
    * a window/aggregate AFTER the join can't always be re-split by AQE.
    * Salt derives from the probe row's own id — deterministic under
    * replay, no RNG state. */
  def saltedJoin(spark: SparkSession, dir: String, salt: Int = 8): DataFrame = {
    val o = t(spark, dir, "orders")
      .withColumn("__salt", pmod(col("o_orderkey"), lit(salt)))
    val c = t(spark, dir, "customer")
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    o.join(c, o("o_custkey") === c("c_custkey") && o("__salt") === c("__salt"))
      .groupBy(col("c_mktsegment"))
      // INTEGER-CENTS revenue — same extremes-magnitude class as cubeAgg
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(38,6)")) * 100, 0)
          .cast("long").as("revenue_cents"))
      .orderBy(col("c_mktsegment"))
  }

  /** First-order Markov transition matrix of event types within a
    * (user, day) journey — the behavioral fingerprint next to [[funnel]]'s
    * single path: every adjacent event pair in time order becomes a
    * transition, counted and row-normalized into P(next | current).
    * Drift in this matrix is how a pipeline notices a client change or
    * bot traffic without hand-written funnels.
    *
    * Shape at scale: the lead window partitions by (user, day) — bounded,
    * high-cardinality, skew-free partitions (the session-window shape,
    * never a per-type funnel); transition counts are one two-phase
    * aggregate into the #types² matrix, and row totals join back from a
    * broadcast-sized table. Ordering ties are impossible at microsecond
    * resolution in the fixture but `event_id` breaks them anyway —
    * determinism must not rest on data luck. */
  def markovPaths(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 86400L).as("day"),
        col("ts"), col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    val tc = e.withColumn("dst", lead(col("event_type"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n_trans"))
    val rs = tc.groupBy(col("src")).agg(sum(col("n_trans")).cast("long").as("rt"))
    tc.join(broadcast(rs), Seq("src"))
      .select(col("src"), col("dst"), col("n_trans"),
        round(col("n_trans").cast("double") / col("rt"), 4).as("prob"))
      .orderBy(col("src"), col("dst"))
  }

  /** Ordered multi-step funnel — the k-step sequential companion to
    * [[funnel]]'s single condition: users who signed up, then CLICKED
    * strictly after their first signup, then PURCHASED strictly after
    * that first qualifying click. Each step's anchor is the EARLIEST
    * qualifying event (the standard product-analytics semantics: a user
    * converts on the first opportunity, later activity cannot resurrect
    * an expired path).
    *
    * Shape at scale: timestamps compare as integer epoch microseconds
    * (cross-engine exact); each step is one filtered two-phase min
    * aggregate plus one user-keyed equi-join against the previous step's
    * bounded (user, anchor) table — step count is fixed, so the whole
    * funnel is a constant number of keyed passes however large the feed. */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    // checkpoint the BOUNDED per-step (user, anchor) tables, not the
    // corpus-sized event projection (review r11): materializing every
    // event into executor storage to save two column-pruned scans is the
    // wrong trade at the 100 TB posture — the three filters re-scan three
    // pruned columns; s1/s2 (O(users)) are the multi-consumer subtrees
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
      .localCheckpoint(true) // consumed by s2's join, n1 and the base
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, Seq("user_id")).filter(col("us") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
      .localCheckpoint(true) // consumed by s3's join and n2
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id")).filter(col("us") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
    val n1 = s1.agg(count(lit(1)).as("n")).withColumn("step", lit("1_signup"))
    val n2 = s2.agg(count(lit(1)).as("n")).withColumn("step", lit("2_click_after"))
    val n3 = s3.agg(count(lit(1)).as("n")).withColumn("step", lit("3_purchase_after"))
    val steps = n1.unionByName(n2).unionByName(n3)
    steps.crossJoin(broadcast(s1.agg(count(lit(1)).as("base"))))
      .select(col("step"), col("n").as("n_users"),
        // base = 0 (no signup events at all) is an ANSI divide-by-zero:
        // the rate is undefined, emit null (review r11)
        when(col("base") > 0,
          round(col("n").cast("double") / col("base"), 4)).as("conv_rate"))
      .orderBy(col("step"))
  }

  /** Conversion funnel: of all users, how many ever signed up, and how many
    * purchased AFTER their first signup — the sequential-condition count a
    * product-analytics pipeline runs constantly. ONE scan: the per-user
    * conditional min/max aggregate reduces "any purchase after the first
    * signup" to `max(purchase ts) > min(signup ts)`, then a 1-row aggregate
    * explodes into stage rows — no joins, no repeated scans, no
    * driver-side loop. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("s_ts"),
        max(when(col("event_type") === "purchase", col("ts"))).as("last_p"))
    perUser
      .agg(count(lit(1)).as("n0"), count(col("s_ts")).as("n1"),
        count(when(col("last_p") > col("s_ts"), 1)).as("n2"))
      .select(explode(array(
        struct(lit("0_all_users").as("stage"), col("n0").as("n_users")),
        struct(lit("1_signed_up").as("stage"), col("n1").as("n_users")),
        struct(lit("2_purchased_after_signup").as("stage"), col("n2").as("n_users"))))
        .as("s"), col("n0"))
      .select(col("s.stage").as("stage"), col("s.n_users").as("n_users"),
        // n0 = 0 (empty events) is an ANSI divide-by-zero (review r11)
        when(col("n0") > 0,
          round(col("s.n_users").cast("double") / col("n0"), 4)).as("pct_of_all"))
      .orderBy(col("stage"))
  }

  /** Statistical aggregates beyond sum/avg: Pearson correlation, sample
    * covariance, sample stddev/variance — all single-pass partial+final
    * hash aggregates (one shuffle on the group key, map-side moments). */
  def statsAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("qty_price_cov"),
        round(stddev_samp(col("l_extendedprice")), 2).as("price_sd"),
        round(var_samp(col("l_discount")), 6).as("disc_var"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** Fixed-width histogram: arithmetic binning (floor(x / width)) keeps the
    * whole computation inside one partial+final aggregate — at 100 TB this
    * is the cheapest possible full-scan profile (no sort, one tiny shuffle
    * keyed by ~dozens of buckets). */
  def histogram(spark: SparkSession, dir: String, width: Double = 50000.0): DataFrame =
    t(spark, dir, "orders")
      .groupBy(floor(col("o_totalprice") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
      .orderBy(col("bucket"))

  /** Winsorized means: clip each group's values at its own p05/p95 before
    * averaging — outlier-robust statistics. Two aggregates over one scan:
    * the per-group percentile aggregate is a handful of rows, broadcast
    * back onto the fact table, so the fact table is read once and never
    * shuffled on a high-cardinality key. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val bounds = o.groupBy(col("o_orderpriority").as("prio"))
      .agg(expr("percentile(o_totalprice, 0.05)").as("p05"),
        expr("percentile(o_totalprice, 0.95)").as("p95"))
    o.join(broadcast(bounds), col("o_orderpriority") === col("prio"))
      .groupBy(col("o_orderpriority"))
      .agg(
        round(avg(col("o_totalprice")), 2).as("avg_raw"),
        round(avg(greatest(least(col("o_totalprice"), col("p95")), col("p05"))), 2)
          .as("avg_winsor"),
        round(first(col("p05")), 2).as("p05"),
        round(first(col("p95")), 2).as("p95"))
      .orderBy(col("o_orderpriority"))
  }

  /** Cohort retention matrix — signup week × week offset → distinct active
    * users: the standard product-analytics rollup. One equi-join keyed on
    * user_id and one partial+final count-distinct aggregate on the
    * (cohort, offset) key; the events feed is scanned twice (once for
    * cohorts, once for activity) but never shuffled on a high-cardinality
    * key. The cohorts side is one row per user who ever signed up —
    * unbounded at scale — so the join hint is left to the broadcast
    * threshold / AQE: small cohort sets broadcast, large ones fall back to
    * a shuffle join instead of OOMing the driver. Weeks are epoch-day
    * divisions (not date_trunc) for exact oracle parity across engines'
    * week conventions. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(floor(unix_timestamp(col("ts")) / 604800L)).as("cohort_week"))
    ev.select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 604800L).as("act_week"))
      .join(cohorts, Seq("user_id"))
      .filter(col("act_week") >= col("cohort_week"))
      .select(col("user_id"), col("cohort_week"),
        (col("act_week") - col("cohort_week")).as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count_distinct(col("user_id")).as("active_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** SCD type-2 history materialization from the CDC feed — the standard
    * warehouse shape for "what did this row look like at time T": every
    * change event becomes a version row with a [valid_from, valid_to)
    * interval, closed by the NEXT event on the same key (lead window) and
    * open (null valid_to, is_current) for the latest version. One shuffle
    * on the key — the window's partitionBy — which is the minimal shuffle
    * the semantics allow; at 100 TB the events feed is already
    * partitioned by key in the lakehouse layout, making this map-side.
    * Timestamps are emitted as epoch seconds (the sink coercion rule the
    * reference applies, schemas.py:21-22). */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"),
        col("event_id").as("version_id"),
        unix_timestamp(col("ts")).as("valid_from"),
        unix_timestamp(col("valid_to_ts")).as("valid_to"),
        col("valid_to_ts").isNull.as("is_current"),
        round(col("value"), 2).as("value"))
      .orderBy(col("user_id"), col("valid_from"), col("version_id"))
  }

  /** Time-travel (AS OF) read over the [[scd2]] history table: the state
    * of every key at instant T — rows whose validity interval contains T
    * (`valid_from <= T < valid_to`, open intervals current). T is the
    * data-derived midpoint of the event-time range so the query is
    * deterministic on any fixture. This is the lakehouse snapshot-read
    * semantic (`VERSION AS OF`/`TIMESTAMP AS OF`) expressed over the SCD2
    * layout: at 100 TB the filter prunes on valid_from/valid_to zone maps
    * (both monotone-ish within a key's file run), and the history table is
    * read once with no join — a per-row interval test. */
  def scd2AsOf(spark: SparkSession, dir: String): DataFrame = {
    val hist = scd2(spark, dir)
    // an empty event log has a null midpoint (getLong would NPE); any T
    // works — the history is empty too, so the snapshot read is empty
    val midRow = Tables.events(spark, dir)
      .agg(((min(unix_timestamp(col("ts"))) +
        max(unix_timestamp(col("ts")))) / 2).cast("long")).head()
    val mid = if (midRow.isNullAt(0)) 0L else midRow.getLong(0)
    hist.filter(col("valid_from") <= mid &&
        (col("valid_to").isNull || col("valid_to") > mid))
      .select(col("user_id"), col("version_id"), col("valid_from"),
        col("value"))
      .orderBy(col("user_id"))
  }

  /** Pairwise Pearson correlation matrix over lineitem's numeric measures,
    * in ONE corpus scan: all C(4,2)=6 `corr` aggregates run inside a single
    * two-phase hash aggregate (each keeps a constant-size moment buffer —
    * n, Σx, Σy, Σxy, Σx², Σy² — merged associatively), then the 1-row
    * result unpivots to long form with `stack`, a driver-free per-row op.
    * The profiling pattern for a 100 TB feature audit: cost is exactly one
    * scan regardless of how many pairs are requested, vs one scan PER pair
    * if issued naively. */
  def corrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      round(corr(col(a), col(b)), 6).as(s"${a}__$b")
    }
    val one = Tables(spark, dir, "lineitem").agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs.map { case (a, b) =>
      s"'$a', '$b', ${a}__$b"
    }.mkString(", ")
    one.select(expr(
      s"stack(${pairs.size}, $stackArgs) AS (col_a, col_b, pearson_r)"))
      .orderBy(col("col_a"), col("col_b"))
  }

  /** Time-series gap-fill (resample): per-user DAILY event counts with
    * missing days materialized as zero rows — the regularization every
    * downstream window/forecast op needs before it can assume a dense
    * axis. Span explosion is per-user `sequence(min_day, max_day)` —
    * bounded by the time horizon, never by event volume — and the count
    * join-back is keyed on (user, day). At 100 TB the generated frame is
    * users × days, orders of magnitude smaller than the event log it
    * summarizes. */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
    // localCheckpoint: the daily table feeds BOTH the span derivation and
    // the join-back, and AQE exchange reuse does not fire across a
    // broadcast boundary — without it the event log is scanned twice
    // (the oovRate/bitextMine lesson). The materialized table is
    // users x days, tiny at any corpus size.
    val daily = ev.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"))
      .localCheckpoint(true)
    // spans derive from the DAILY table, not a second corpus pass: the
    // per-user min/max day is an aggregate over users x days rows, so the
    // event log is scanned exactly once
    val spans = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    spans.select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
      .join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("user_id"), col("day"))
  }
}
