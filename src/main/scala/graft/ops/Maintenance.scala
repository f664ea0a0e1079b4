package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operational diagnostics for cluster-scale layout and shuffle health:
  * join-key skew profiling and small-file compaction planning. Neither has
  * a reference analog (the reference syncs one row at a time and never
  * plans a shuffle); both are the tooling a 100 TB deployment consults
  * before letting a job loose — the skew report decides whether a join
  * needs salting (see [[Relational.saltedJoin]]), and the compaction plan
  * is the OPTIMIZE/bin-packing step every lakehouse ingest ends with.
  */
object Maintenance {

  /** Join-key skew diagnostic over orders.o_custkey (the key
    * [[Relational.saltedJoin]] salts): per-key frequency reduced to the
    * distribution stats a planner needs — max/mean multiplicity, the
    * skew ratio between them, the share of rows carried by the single
    * hottest key, and the salt factor [[Relational.saltedJoin]] would
    * need to level the hottest key down to the mean.
    *
    * Shape at scale: one two-phase count per key (map-side combine), then
    * a single-row reduce over the O(keys) count table — the corpus is
    * touched once, the driver sees one row. The hot-key list is a
    * separate bounded top-k (TakeOrderedAndProject), never a full sort. */
  def skewReport(spark: SparkSession, dir: String, topK: Int = 5): DataFrame = {
    val counts = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("n")).as("n_rows"),
      max(col("n")).as("max_mult"),
      round(avg(col("n")), 4).as("mean_mult"))
    val hot = counts.orderBy(col("n").desc, col("o_custkey")).limit(topK)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("o_custkey"))))
    hot.crossJoin(broadcast(stats))
      .select(
        col("rank"), col("o_custkey").as("hot_key"), col("n").as("hot_n"),
        col("n_keys"), col("n_rows"), col("max_mult"), col("mean_mult"),
        round(col("max_mult") / col("mean_mult"), 4).as("skew_ratio"),
        round(col("n") / col("n_rows"), 6).as("hot_share"),
        ceil(col("max_mult") / col("mean_mult")).cast("int").as("salt_factor"))
      .orderBy(col("rank"))
  }

  /** Small-file compaction plan: given per-shard sizes (the `documents`
    * corpus sharded by `doc_id % shards`, bytes approximated by text
    * length), greedily bin consecutive shards into output files of at
    * most `targetBytes` — the deterministic first-fit-by-order policy
    * every lakehouse OPTIMIZE uses, expressed as a prefix-sum: output
    * bin = floor(cumulative_bytes_before_shard / target).
    *
    * A shard larger than the target gets a bin of its own (the cumsum
    * jump covers it) and never blocks its neighbors. Output is O(shards):
    * shard -> (bytes, bin), plus the bin's running total for audit.
    *
    * Shape at scale: per-shard sizes are one two-phase agg; the prefix
    * sum runs over the O(shards) size table — a window over shards, not
    * rows, so the single-partition window funnel holds thousands of
    * shard rows, not the corpus. */
  def compactionPlan(spark: SparkSession, dir: String, shards: Int = 64,
                     targetBytes: Long = 32768): DataFrame = {
    val sizes = Tables(spark, dir, "documents")
      .select(pmod(col("doc_id"), lit(shards)).as("shard"),
        length(col("text")).cast("long").as("bytes"))
      .groupBy(col("shard")).agg(sum(col("bytes")).as("bytes"))
    val w = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sizes
      .withColumn("prefix", coalesce(sum(col("bytes")).over(w), lit(0L)))
      // integer div: exact at any corpus size (a double round-trip loses
      // bits past 2^53 of cumulative bytes — reachable at 100 TB)
      .withColumn("bin", expr(s"prefix div ${targetBytes}L"))
      .select(col("shard"), col("bytes"), col("bin"))
      .orderBy(col("shard"))
  }
}
