package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering and zone-map
  * manifests — the write-side half of scan pruning at 100 TB.
  *
  * The reference has no layout story (it applies events row-at-a-time to a
  * search index; `meilisync/main.py:71-140` never writes files), but a
  * 100 TB Spark corpus lives or dies by how much of it a query can SKIP.
  * Parquet row-group and file-level min/max statistics prune only along
  * dimensions the data is physically sorted by; a single-column sort gives
  * one prunable dimension and leaves every other filter a full scan. The
  * Morton curve interleaves the bits of two (or more) key columns so that
  * range-partitioning by the interleaved value yields files whose
  * bounding boxes are tight in BOTH dimensions — a date filter AND a key
  * filter each touch O(few) files. This is the layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`, built here from plain codegen'd
  * integer expressions (shift/mask/or), no UDF.
  *
  * Scale posture: [[zvalue]] is a per-row expression chain (free);
  * [[zorderWrite]] is one range shuffle on the z-value — the same single
  * shuffle a plain sorted write costs, so two-dimensional prunability is
  * bought for zero extra passes. [[zoneMap]] is a two-phase groupBy over
  * shard ids, output = O(shards), and stands in for the parquet footer
  * stats a cluster reader would consult.
  */
object Layout {

  /** Morton/Z-value of two non-negative ints, `bits` bits each, as a Long:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Built by folding
    * shift/mask/or columns, so the whole thing is one codegen'd integer
    * expression — no UDF, and the identical arithmetic is expressible in
    * ANSI SQL for the oracle. Inputs wider than `bits` bits are clamped by
    * the mask (callers quantile-bucket real keys down to `bits` bits first;
    * the fixtures fit 16 bits raw). */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column = {
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The same fold rendered as ANSI SQL (DuckDB-compatible), for oracles. */
  def zvalueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Orders with both clustering dimensions range-scaled to the full
    * 16-bit domain before interleaving — the Delta/Iceberg ZORDER recipe
    * (each column is rank/range-bucketed first, else the narrower column's
    * high z bits are constant zero and the curve degenerates to a
    * single-dimension sort). The per-column max arrives by broadcasting a
    * 1-row stats aggregate back onto the scan — one extra reduce, no
    * driver collect, so the whole computation stays a distributed
    * two-scan plan at any corpus size. */
  private def scaledDims(spark: SparkSession, dir: String,
                         bits: Int): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderkey"),
        col("o_custkey").cast("long").as("x"),
        datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("y"))
    val stats = o.agg(max(col("x")).as("mx"), max(col("y")).as("my"))
    val dom = 1L << bits
    o.crossJoin(broadcast(stats))
      // integer div (`div`, not `/`): exact at any magnitude, and the
      // oracle's `//` mirrors it bit-for-bit where a double round-trip
      // could diverge past 2^53
      .withColumn("xs", expr(s"(x * ${dom}L) div (mx + 1)"))
      .withColumn("ys", expr(s"(y * ${dom}L) div (my + 1)"))
  }

  /** Per-row z-value and the shard the row lands in under a 64-shard
    * layout (top 6 z bits), the deterministic analog of
    * `repartitionByRange(64, zval)` on range-scaled dims — output is
    * full-table, so the oracle checks every placement. */
  def zorderKeys(spark: SparkSession, dir: String, bits: Int = 16,
                 shardBits: Int = 6): DataFrame =
    scaledDims(spark, dir, bits)
      .withColumn("zval", zvalue(col("xs"), col("ys"), bits))
      .withColumn("zshard", shiftright(col("zval"), 2 * bits - shardBits).cast("int"))
      .select(col("o_orderkey"), col("zval"), col("zshard"))
      .orderBy(col("o_orderkey"))

  /** Physically rewrite `orders` in z-order: one range shuffle on zval,
    * sort within partitions, write. Returns the output path. The written
    * files' footer min/max on BOTH o_custkey and o_orderdate are tight —
    * [[LayoutSpec]] proves a date-range filter prunes most shards under
    * this layout and none under a custkey-sorted one. */
  def zorderWrite(spark: SparkSession, dir: String, outPath: String,
                  shards: Int = 64, bits: Int = 16): String = {
    scaledDims(spark, dir, bits)
      .withColumn("zval", zvalue(col("xs"), col("ys"), bits))
      .select(col("o_orderkey"), col("x").as("o_custkey"),
        col("y").as("day_off"), col("zval"))
      .repartitionByRange(shards, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")
      .write.mode("overwrite").parquet(outPath)
    outPath
  }

  /** Zone-map manifest of the 64-shard z-layout: per-shard min/max/count
    * over both clustered dimensions — exactly the footer statistics a
    * cluster-side reader consults to skip files. Output is O(shards);
    * the groupBy is two-phase (partial min/max map-side), so the manifest
    * build is a single scan however large the table. */
  def zoneMap(spark: SparkSession, dir: String, bits: Int = 16,
              shardBits: Int = 6): DataFrame =
    scaledDims(spark, dir, bits)
      .withColumn("zval", zvalue(col("xs"), col("ys"), bits))
      .withColumn("zshard", shiftright(col("zval"), 2 * bits - shardBits).cast("int"))
      .groupBy(col("zshard"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("x")).as("min_custkey"),
        max(col("x")).as("max_custkey"),
        min(col("y")).as("min_day"),
        max(col("y")).as("max_day"))
      .orderBy(col("zshard"))

  /** Zone-map pruning-rate eval — the layout-quality number an OPTIMIZE
    * decision actually consumes: for a deterministic battery of narrow
    * custkey range probes (probe i covers the first quarter of stripe i
    * of the key space), what share of shards does the [[zoneMap]]
    * manifest let a reader SKIP? A well-clustered z-layout prunes most
    * shards per narrow probe; a random layout prunes none — this query
    * turns that claim into a measured rate.
    *
    * Everything after the manifest build is O(probes × shards): the
    * manifest is checkpointed and bounded, the probe table derives from
    * a broadcast 1-row max, and the probe×shard evaluation is the only
    * (deliberate, 16×64-row) cross join. */
  def pruneRate(spark: SparkSession, dir: String, nProbes: Int = 16): DataFrame = {
    val m = zoneMap(spark, dir).localCheckpoint(true)
    val mx = m.agg(max(col("max_custkey")).as("mx"))
    val probes = spark.range(0, nProbes).select(col("id").as("probe_id"))
      .crossJoin(broadcast(mx))
      .select(col("probe_id"),
        expr(s"probe_id * ((mx + 1) div $nProbes)").as("lo"),
        expr(s"probe_id * ((mx + 1) div $nProbes) + " +
          s"((mx + 1) div $nProbes) div 4").as("hi"))
    probes.crossJoin(broadcast(m))
      .groupBy(col("probe_id"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_shards"),
        sum(when(col("max_custkey") < col("lo") ||
          col("min_custkey") > col("hi"), 1L).otherwise(0L)).as("n_pruned"))
      .select(col("probe_id"), col("lo"), col("hi"), col("n_shards"),
        col("n_pruned"),
        round(col("n_pruned").cast("double") / col("n_shards"), 4)
          .as("prune_rate"))
      .orderBy(col("probe_id"))
  }
}
