package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ design, Schelter et
  * al. VLDB 2018): completeness / uniqueness / accepted-values / range /
  * referential-integrity checks evaluated as METRICS with thresholds, one
  * row per constraint — the validation gate a pipeline runs before letting
  * a new data drop anywhere near training. The reference has no validation
  * surface at all; its closest shape is the `check` count command
  * (`main.py:179-208`), which is exactly one of these constraints
  * (row-count parity) generalized.
  *
  * Shape at scale — the Deequ trick is that metrics FUSE: every per-table
  * constraint compiles into one aggregate over that table (count, nulls,
  * distincts, in-range counts all in the same codegen'd pass), so a
  * 40-constraint suite over 3 tables costs 3 scans, not 40. The one join
  * (referential integrity) keys on the dimension and broadcasts it. The
  * output is constraints-sized — nothing corpus-sized survives the aggs. */
object QualityChecks {

  /** The standing suite over the TPC-H-ish fixtures: one row per
    * constraint with its measured metric, threshold and verdict. */
  def dqChecks(spark: SparkSession, dir: String): DataFrame =
    suite(Tables(spark, dir, "orders"), Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "customer"))

  /** The constraint suite over explicit frames — the spec entry point, so
    * violation injection (nulls, dup keys, orphans, out-of-range values)
    * can prove each constraint actually trips. */
  def suite(orders: DataFrame, lineitem: DataFrame,
            customer: DataFrame): DataFrame = {
    // one fused aggregate pass per table
    val o = orders.agg(
      count(lit(1)).as("n"),
      sum(when(col("o_custkey").isNotNull, 1L).otherwise(0L)).as("custkey_nn"),
      countDistinct(col("o_orderkey")).as("orderkey_d"),
      sum(when(col("o_totalprice") >= 0, 1L).otherwise(0L)).as("price_ok"))
    val l = lineitem.agg(
      count(lit(1)).as("n"),
      sum(when(col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L))
        .as("flag_ok"),
      sum(when(col("l_quantity").between(1, 50), 1L).otherwise(0L))
        .as("qty_ok"))
    // referential integrity: orphaned orders (no matching customer) via a
    // broadcast anti join on the dimension key. NON-NULL keys only — a
    // null key is a completeness violation, not a dangling reference
    // (also the SQL NOT IN semantics the oracle uses)
    val orphans = orders.filter(col("o_custkey").isNotNull)
      .join(broadcast(customer),
        orders("o_custkey") === customer("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphans"))

    // the verdict compares the UNROUNDED metric (review r11): rounding
    // first would let threshold-1.0 checks pass with violation rates below
    // 5e-7 — on a 10M-row table, 3 null keys round to 1.000000 and the
    // gate waves them through. round() is display-only.
    def row(check: String, column: String, metric: org.apache.spark.sql.Column,
            threshold: Double) =
      struct(lit(check).as("check"), lit(column).as("column"),
        round(metric, 6).as("metric"), lit(threshold).as("threshold"),
        (metric >= threshold).as("pass"))

    // nullif denominators (r12 fuzz): an EMPTY table made every ratio an
    // ANSI divide-by-zero that killed the whole suite — a null metric
    // (verdict unknowable on no rows) is the honest report, and min_size
    // still fails loudly on n = 0
    val oRows = o.select(explode(array(
      row("completeness", "orders.o_custkey",
        col("custkey_nn") / nullif(col("n"), lit(0L)), 1.0),
      row("uniqueness", "orders.o_orderkey",
        col("orderkey_d") / nullif(col("n"), lit(0L)), 1.0),
      row("non_negative", "orders.o_totalprice",
        col("price_ok") / nullif(col("n"), lit(0L)), 1.0),
      row("min_size", "orders",
        col("n").cast("double"), 1.0))).as("r"))
    val lRows = l.select(explode(array(
      row("accepted_values", "lineitem.l_returnflag",
        col("flag_ok") / nullif(col("n"), lit(0L)), 1.0),
      row("in_range", "lineitem.l_quantity",
        col("qty_ok") / nullif(col("n"), lit(0L)), 1.0))).as("r"))
    // reuse the fused aggregate's row count (review r11): a fresh
    // orders.agg here was a third full scan of the fact table, against
    // the file's own "3 scans, not 40" contract
    val riRows = orphans.crossJoin(broadcast(o.select(col("n"))))
      .select(explode(array(
        row("referential_integrity", "orders.o_custkey->customer",
          lit(1.0) - col("orphans") / nullif(col("n"), lit(0L)), 1.0))).as("r"))

    oRows.unionByName(lRows).unionByName(riRows)
      .select(col("r.check").as("check"), col("r.column").as("column"),
        col("r.metric").as("metric"), col("r.threshold").as("threshold"),
        col("r.pass").as("pass"))
      .orderBy(col("check"), col("column"))
  }

  /** k-anonymity audit (Sweeney 2002) over the release quasi-identifiers
    * — the privacy gate a dataset card cites before publishing: any
    * combination of externally-knowable attributes shared by fewer than
    * `k` documents is a re-identification handle and its rows must be
    * suppressed or generalized. Quasi-identifier here: (lang, source,
    * width-`widthChars` length bucket) — attributes an adversary can
    * observe without reading the text.
    *
    * Output is the per-equivalence-class audit table: class size, an
    * `at_risk` flag (size < k), and the per-language share of documents
    * sitting in at-risk classes (`lang_risk_share` — the number a release
    * checklist actually quotes). One fused two-phase aggregate builds the
    * class table; the risk share is a second aggregate over the BOUNDED
    * class table joined back — no corpus-sized second pass, no windows. */
  def kAnonymity(spark: SparkSession, dir: String, k: Int = 5,
                 widthChars: Int = 64): DataFrame = {
    val cls = Tables(spark, dir, "documents")
      .select(col("lang"), col("source"),
        expr(s"n_chars div $widthChars").as("len_b"))
      .groupBy(col("lang"), col("source"), col("len_b"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("at_risk", (col("n_docs") < k).cast("int"))
    val perLang = cls.groupBy(col("lang")).agg(
      sum(col("n_docs")).as("lang_docs"),
      sum(when(col("at_risk") === 1, col("n_docs")).otherwise(lit(0L)))
        .as("risk_docs"))
    cls.join(perLang, Seq("lang"))
      .select(col("lang"), col("source"), col("len_b"), col("n_docs"),
        col("at_risk"),
        round(col("risk_docs").cast("double") / col("lang_docs"), 4)
          .as("lang_risk_share"))
      .orderBy(col("lang"), col("source"), col("len_b"))
  }
}
