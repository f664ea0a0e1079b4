package graft.tools

import org.apache.spark.sql.DataFrame

/** Dev-only stage profiler: times named sub-plans of the slow bench queries
  * (count() each, like Bench) so optimization targets the measured stage,
  * not a guess. Not part of the engine surface.
  *
  * Usage: runMain graft.tools.Profile <sfDir> <which>
  */
object Profile {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val which = if (args.length > 1) args(1) else "prefix"
    val spark = graft.GraftSession.get()
    import org.apache.spark.sql.functions._
    graft.functions.TextFunctions.register(spark)
    val docs = graft.ops.Tables(spark, sfDir, "documents")
    docs.count() // warm footer/JIT

    which match {
      case "prefix" =>
        val s = docs.select(col("doc_id"), expr("graft_shingle_hashes(text, 3)").as("hs"))
          .withColumn("n_sh", size(col("hs")))
        time("shingle-only")(s.count())
        val posts = s.select(col("doc_id"), col("n_sh"), explode(col("hs")).as("shingle"))
        time("posts")(posts.count())
        val dfs = posts.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df").between(2, 128))
        time("dfs")(dfs.count())
        val eff = posts.join(dfs, "shingle")
        time("eff-join")(eff.count())
        val perDoc = eff.groupBy(col("doc_id"), col("n_sh"))
          .agg(array_sort(collect_list(struct(col("df"), col("shingle")))).as("eord"))
          .withColumn("m", size(col("eord")))
          .withColumn("plen", col("m") - ceil(col("n_sh") * lit(0.5)).cast("int") + lit(1))
        time("perDoc")(perDoc.count())
        val prefixes = perDoc.filter(col("plen") >= 1)
          .select(col("doc_id"), explode(expr("slice(eord, 1, plen)")).as("p"))
          .select(col("doc_id"), col("p.shingle").as("shingle"))
        time("prefixes")(prefixes.count())
        val a = prefixes.alias("a"); val b = prefixes.alias("b")
        val cand = a.join(b,
            col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        time("cand-raw")(cand.count())
        val candD = cand.dropDuplicates("doc_a", "doc_b")
        time("cand-dedup")(candD.count())
        time("full-query")(graft.ops.Dedup.ngramJaccardPrefix(spark, sfDir).count())
      case "ngram" =>
        val s = docs.select(col("doc_id"), expr("graft_shingle_hashes(text, 3)").as("hs"))
          .withColumn("n_sh", size(col("hs")))
        val posts = s.select(col("doc_id"), col("n_sh"), explode(col("hs")).as("shingle"))
        time("posts")(posts.count())
        val grouped = posts.groupBy(col("shingle"))
          .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh")))).as("ds"))
          .filter(size(col("ds")).between(2, 128))
        time("grouped")(grouped.count())
        val pairs = grouped.select(explode(expr(
          """flatten(transform(ds, (a, i) ->
            |  transform(slice(ds, i + 2, size(ds)),
            |    b -> struct(a.doc_id AS doc_a, a.n_sh AS na,
            |                b.doc_id AS doc_b, b.n_sh AS nb))))""".stripMargin)).as("p"))
        time("pair-expand")(pairs.count())
        val agg = pairs.filter(col("p.doc_a") =!= col("p.doc_b"))
          .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
            col("p.na").as("na"), col("p.nb").as("nb"))
          .agg(count(lit(1)).as("c"))
        time("pair-agg")(agg.count())
        time("full-ngram")(graft.ops.Dedup.ngramJaccard(spark, sfDir).count())
        time("full-ngram-2")(graft.ops.Dedup.ngramJaccard(spark, sfDir).count())
      case "cluster" =>
        time("pairs-only")(graft.ops.Dedup.ngramJaccard(spark, sfDir).count())
        time("full-cluster")(graft.ops.Dedup.nearDupClusters(spark, sfDir).count())
      case "tfidf" =>
        val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        time("toks")(toks.count())
        val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
        time("tf")(tf.count())
        val dfreq = toks.groupBy(col("token")).agg(count_distinct(col("doc_id")).as("df"))
        time("dfreq")(dfreq.count())
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val scored = tf.join(dfreq, "token").crossJoin(broadcast(n))
          .withColumn("score",
            round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
        time("scored")(scored.count())
        time("tfidf-1")(graft.SparkEntry.queries("q_tfidf")(spark, sfDir).count())
        time("tfidf-2")(graft.SparkEntry.queries("q_tfidf")(spark, sfDir).count())
      case "pipeline" =>
        time("pipeline")(graft.SparkEntry.queries("q_dedup_pipeline")(spark, sfDir).count())
      case q =>
        time(q)(graft.SparkEntry.queries(q)(spark, sfDir).count())
    }
    spark.stop()
  }
}
