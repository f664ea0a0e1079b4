package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE fixture replication recipe, shared by ScaleCurve and StageFixture
  * (review r11: two verbatim copies meant a perturbation change in one
  * would silently leave the other staging a different similarity
  * structure, making Profile numbers on StageFixture output incomparable
  * to ScaleCurve's curves).
  *
  * fac-x replica with shifted keys; replicas grow the corpus in DISTINCT
  * content, never duplicates:
  *  - key columns shift by `__r * Shift` (disjoint id ranges per replica);
  *  - `perturbText`: every token is rewritten with the replica id —
  *    replicas must be DISSIMILAR (an appended-word perturbation leaves
  *    replicas ~98% similar and the near-dup tier then correctly finds
  *    fac^2/2 REAL pairs per original — measuring the duplicate pathology,
  *    not scan scaling);
  *  - `perturbEmbedding`: deterministic per-replica sign REFLECTION keyed
  *    on (__r, dim) — within-replica cosines (including the fixture's real
  *    dup structure) are preserved exactly while cross-replica cosines
  *    collapse toward 0, so the eps-pair graph grows linearly in fac, not
  *    quadratically in duplicate multiplicity. Replica 0 is the untouched
  *    base. */
private[tools] object Replica {
  val Shift = 10000000L

  def apply(spark: SparkSession, df: DataFrame, keyCols: Set[String],
            fac: Int, perturbText: Boolean,
            perturbEmbedding: Boolean = false): DataFrame =
    df.crossJoin(spark.range(fac.toLong).select(col("id").as("__r")))
      .select(df.columns.map {
        case k if keyCols(k) => (col(k) + col("__r") * Shift).as(k)
        case "embedding" if perturbEmbedding =>
          expr("""transform(embedding, (x, i) ->
                 CASE WHEN __r = 0L OR pmod(hash(__r, i), 2) = 0 THEN x
                      ELSE -x END)""").as("embedding")
        case "text" if perturbText =>
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1r"), col("__r"))).as("text")
        case c => col(c)
      }.toSeq: _*)
}
