package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the document/embedding similarity graph — the
  * second graph operator class next to the connected-component dup
  * clustering in [[Dedup]]: where CC answers "which docs are the same",
  * PageRank answers "which docs are CENTRAL" — the representative-
  * selection / curriculum-weighting signal a pipeline derives from a
  * near-dup or citation graph (Page et al. 1999).
  *
  * All arithmetic is integer micro-units (rank mass scaled by 1e12 and
  * floor-divided), the same trick the PQ asymmetric distance uses: integer
  * addition is associative, so per-node sums are identical whatever order
  * an engine reduces in — the float formulation would diverge between
  * engines in the last ulp and is exactly what a hash-matching oracle
  * cannot absorb.
  */
object Graph {

  private val Scale = 1000000000000L // 1e12 micro-units of rank mass

  /** PageRank (damping 0.85, `iters` fixed power iterations) over the
    * symmetrized eps-neighbor graph [[Dedup.embedDup]] emits — every
    * cosine-similar pair within a (label, sign-cell) block becomes an
    * undirected edge. Symmetry means no dangling nodes: every node in the
    * graph has out-degree >= 1, so no mass-leak correction term is needed
    * and the teleport constant is exact.
    *
    * Shape at scale: the edge list is built once (cell-blocked pair join,
    * never all-pairs), joined with the degree table, and persisted; each
    * iteration is ONE keyed equi-join (edges x current ranks on src) plus
    * ONE map-side-combined sum per destination — the canonical distributed
    * power iteration, linear in edges per round with no driver-side state
    * at all. Iterations are fixed, so the whole computation is one lazy
    * plan; the node count rides along as a carried column off a broadcast
    * 1-row aggregate rather than a driver collect. */
  def pageRank(spark: SparkSession, dir: String, iters: Int = 6,
               threshold: Double = 0.3): DataFrame = {
    val pairs = Dedup.embedDup(spark, dir, threshold)
      .select(col("vec_a"), col("vec_b"))
    val e = pairs.select(col("vec_a").as("src"), col("vec_b").as("dst"))
      .unionByName(pairs.select(col("vec_b").as("src"), col("vec_a").as("dst")))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nTotal = deg.agg(count(lit(1)).as("n"))
    // eager localCheckpoint, the iterative-op house rule (see
    // Dedup.nearDupClusters): caches the edge list all six iterations
    // reuse AND leaves no session-lifetime cache entry behind — the
    // blocks are freed when the reference is GC'd, unlike an unreleased
    // persist() which would pin executor memory across later queries
    val edges = e.join(deg, "src").localCheckpoint(true)
    var ranks = deg.crossJoin(broadcast(nTotal))
      .select(col("src").as("node"), expr(s"${Scale}L div n").as("r"), col("n"))
    for (_ <- 1 to iters) {
      ranks = edges.join(ranks, edges("src") === ranks("node"))
        .select(col("dst"),
          expr("(85L * r) div (100L * outdeg)").as("contrib"), col("n"))
        .groupBy(col("dst"), col("n")).agg(sum(col("contrib")).as("c"))
        .select(col("dst").as("node"),
          (expr("15000000000000L div (100L * n)") + col("c")).as("r"),
          col("n"))
    }
    ranks.select(col("node").as("vec_id"), col("r").as("rank_micro"),
        round(col("r") / lit(Scale.toDouble), 6).as("rank"))
      .orderBy(col("vec_id"))
  }
}
