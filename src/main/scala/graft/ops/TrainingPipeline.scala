package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The capstone composition: assemble a training corpus end-to-end —
  *
  *  1. exact dedup of the train split (min doc_id per identical text)
  *  2. near-dup removal (n-gram Jaccard pairs at t=0.5, df cap 128;
  *     greedy: drop the larger id of every pair)
  *  3. quality filter (chars >= 120, tokens >= 30, repetition <= 0.01)
  *  4. decontamination (drop any survivor sharing a word-5-gram with ANY
  *     test-split document)
  *  5. sequence packing (512-token bins per shard = doc_id % 8)
  *
  * emitted as the per-(shard, bin) manifest a trainer consumes. Every stage
  * reuses the standalone operator's formulation, so the stage semantics are
  * individually oracle-pinned elsewhere and the composition is pinned here.
  *
  * Shape at scale: stages 1-4 are each one or two hash-keyed shuffles over
  * a monotonically SHRINKING survivor set (each stage's anti-join keys on
  * 8-byte ids/hashes); packing windows per shard. Nothing is quadratic in
  * the corpus and nothing collects.
  */
object TrainingPipeline {

  def trainManifest(spark: SparkSession, dir: String, budget: Int = 512,
                    shards: Int = 8, threshold: Double = 0.5,
                    dfCap: Int = 128): DataFrame = {
    graft.functions.TextFunctions.register(spark)
    val d = Tables(spark, dir, "documents")
      .withColumn("tr", (col("doc_id") * lit(2654435761L)) % 100 < 80)

    // 1. exact tier among train docs
    val keep1 = d.filter(col("tr"))
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("text"))

    // 2. near-dup pairs among survivors; drop the doc_b side
    val pairs = Dedup.ngramPairsOn(Dedup.hashShingledOf(keep1), threshold, dfCap)
    val dropped = pairs.select(col("doc_b").as("doc_id")).distinct()
    val keep2 = keep1.join(dropped, Seq("doc_id"), "left_anti")

    // 3. quality filter (same metrics as the funnel's final stage)
    val keep3 = keep2
      .withColumn("chars", length(col("text")))
      .withColumn("n_tok", size(split(col("text"), " ")))
      .withColumn("n_grams", greatest(col("n_tok") - 2, lit(0)))
      .withColumn("rep", when(col("n_grams") > 0,
        (col("n_grams") - size(expr("graft_shingle_hashes(text, 3)"))).cast("double") /
          col("n_grams")).otherwise(lit(0.0)))
      .filter(col("chars") >= 120 && col("n_tok") >= 30 && col("rep") <= 0.01)

    // 4. decontamination against the FULL test split (not deduped — any
    // leaked n-gram counts); one hash-keyed semi-join each side
    val testSh = d.filter(!col("tr"))
      .select(explode(expr("graft_shingle_hashes(text, 5)")).as("g")).distinct()
    val survSh = keep3.select(col("doc_id"),
      explode(expr("graft_shingle_hashes(text, 5)")).as("g"))
    val contaminated = survSh.join(testSh, Seq("g"), "left_semi")
      .select(col("doc_id")).distinct()
    val keep4 = keep3.join(contaminated, Seq("doc_id"), "left_anti")

    // 5. pack into budget-token bins per shard
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
    keep4
      .select(col("doc_id"), (col("doc_id") % shards).cast("int").as("shard"),
        col("n_tok").cast("long").as("n_tok"))
      .withColumn("start_tok", sum(col("n_tok")).over(w) - col("n_tok"))
      .groupBy(col("shard"),
        floor(col("start_tok") / budget).cast("long").as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy(col("shard"), col("bin"))
  }
}
