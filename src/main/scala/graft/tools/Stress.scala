package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Repeatable dedup stress bench: 10x duplicate structure at configurable
  * scale (nOrig originals, each with 7 byte-identical copies and 3
  * one-word-perturbed near-copies — crawl-like duplication density, far
  * above the driver fixtures'). Deterministic texts via a per-original LCG
  * over a small vocabulary, so runs are comparable across rounds.
  *
  * Usage: runMain graft.tools.Stress [nOrig] [tier...]
  *   (default 5000 originals = 50k docs; default tiers: all)
  */
object Stress {
  private val vocab: Array[String] =
    ("the a and of to in is was for on with as by at from up about into over after " +
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda sigma tau " +
      "river stone cloud forest meadow harbor lantern compass anchor saddle ember " +
      "quartz cedar falcon walrus juniper marble onyx prairie tundra basalt " +
      "seven nine eleven thirteen").split(' ')

  /** Deterministic doc text for an original id: 40-90 tokens via an LCG. */
  private def text(orig: Long): String = {
    var s = orig * 6364136223846793005L + 1442695040888963407L
    def next(): Int = { s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % vocab.length).toInt }
    val n = 40 + (math.abs(orig * 2654435761L) % 51).toInt
    (0 until n).map(_ => vocab(next())).mkString(" ")
  }

  def writeDocs(spark: SparkSession, dir: String, nOrig: Int): Unit = {
    import spark.implicits._
    spark.range(nOrig.toLong * 10).map { i =>
      val orig = i / 10
      val variant = (i % 10).toInt
      val base = text(orig)
      val t = variant match {
        case v if v <= 6 => base // byte-identical copies
        case 7 => base + " ember"                       // appended word
        case 8 => base.replaceFirst("\\w+", "quartz")   // head swapped
        case _ => { val w = base.split(' '); w(w.length / 2) = "onyx"
                    w.mkString(" ") }                   // middle swapped
      }
      (i, t)
    }.toDF("doc_id", "text")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val nOrig = if (args.nonEmpty) args(0).toInt else 5000
    val tiers = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    def want(t: String): Boolean = tiers.isEmpty || tiers(t)
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.quietBoundedWindowWarnings()
    val dir = s"/tmp/graft-stress-${nOrig}"
    writeDocs(spark, dir, nOrig)
    println(s"STRESS corpus: ${nOrig * 10} docs at $dir")
    def time(name: String)(f: => Long): Unit = if (want(name)) {
      val t0 = System.nanoTime()
      val n = f
      println(f"STRESS $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    time("exact")(graft.ops.Dedup.exact(spark, dir).count())
    time("simhash_pairs")(graft.ops.Dedup.simhashPairs(spark, dir).count())
    time("minhash_lsh")(graft.ops.Dedup.minhashLsh(spark, dir).count())
    time("winnow")(graft.ops.TextAnalysis.winnow(spark, dir).count())
    time("ngram")(graft.ops.Dedup.ngramJaccard(spark, dir).count())
    time("ngram_prefix")(graft.ops.Dedup.ngramJaccardPrefix(spark, dir).count())
    time("pipeline")(graft.ops.Dedup.dedupPipeline(spark, dir).count())
    time("cluster")(graft.ops.Dedup.nearDupClusters(spark, dir).count())
    time("cluster_bigstar")(graft.ops.Dedup.nearDupClustersBigStar(spark, dir).count())
    time("decontaminate")(graft.ops.Dedup.decontaminate(spark, dir).count())
    time("tfidf")(graft.ops.TextAnalysis.tfidfTop(spark, dir).count())
    time("dup_spans")(graft.ops.TextAnalysis.dupSpans(spark, dir).count())
    if (want("incremental")) {
      // the operational claim: a FIXED-SIZE arrival batch (5k docs) against
      // a growing corpus costs ~the batch, while the one-shot recompute
      // grows with the corpus — run at several nOrig to see the asymptote.
      // The batch must stay FIXED across nOrig for the numbers to form a
      // curve, so small corpora fail loud instead of silently measuring a
      // full one-shot build as "inc-batch-5k" (review r11: at nOrig=100
      // every doc_id is < 5000, "inc-index-rest" indexed nothing).
      val batchDocs = 5000L
      require(nOrig.toLong * 10 > batchDocs * 2,
        s"incremental tier needs > ${batchDocs * 2} docs for a meaningful " +
          s"resident-corpus/arrival-batch split, got ${nOrig * 10} — run " +
          "with nOrig >= 1001")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val old = docs.filter(col("doc_id") >= batchDocs)
      val batch = docs.filter(col("doc_id") < batchDocs)
      val st = s"$dir/lsh-state"
      org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(st), true)
      def t2(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"STRESS $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
      }
      graft.ops.Dedup.minhashLsh(spark, dir).count() // JIT/codegen warmup
      t2("inc-index-rest")(
        graft.ops.IncrementalDedup.updateLsh(spark, st, old).count())
      t2(s"inc-batch-${batchDocs / 1000}k")(
        graft.ops.IncrementalDedup.updateLsh(spark, st, batch).count())
      t2("oneshot-lsh-full")(graft.ops.Dedup.minhashLsh(spark, dir).count())
    }
    spark.stop()
  }
}
