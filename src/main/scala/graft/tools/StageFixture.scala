package graft.tools

import org.apache.spark.sql.functions._

/** Stage a fac-x replica of the sf0.1 fixture as an end-to-end spot-bench
  * dir (the SCALE.md "sf1 datapoint" for the heavy bench tail): the three
  * tables the expensive queries consume (`documents`, `events`,
  * `embeddings`) are replicated with shifted keys — documents with
  * per-replica-rewritten text and embeddings sign-reflected, so corpora
  * grow in DISTINCT content (the ScaleCurve convention: duplicate
  * replicas would measure the dup pathology, not scan scaling) — and the
  * remaining tables are copied verbatim. Events keep (event_id, user_id)
  * shifted together so sessions/trail windows gain users, not duplicate
  * timelines. Dev tool, not part of the engine surface.
  *
  * Usage: runMain graft.tools.StageFixture [srcDir] [dstDir] [fac]
  * then:  runMain graft.tools.Profile <dstDir> queries <reps> <q1,...>
  */
object StageFixture {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val fac = if (args.length > 2) args(2).toInt else 10
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")

    // the recipe is the shared [[Replica]] (review r11: this was a
    // verbatim copy of ScaleCurve's — one drifting would silently break
    // cross-tool comparability of Profile numbers)
    def replicate(table: String, keyCols: Set[String],
                  perturbText: Boolean, perturbEmbedding: Boolean): Unit = {
      val df = spark.read.parquet(s"$src/$table.parquet")
      Replica(spark, df, keyCols, fac, perturbText, perturbEmbedding)
        .repartition(64)
        .write.mode("overwrite").parquet(s"$dst/$table.parquet")
      println(s"STAGED $table x$fac")
    }

    replicate("documents", Set("doc_id"), perturbText = true,
      perturbEmbedding = false)
    replicate("events", Set("event_id", "user_id"), perturbText = false,
      perturbEmbedding = false)
    replicate("embeddings", Set("vec_id"), perturbText = false,
      perturbEmbedding = true)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"COPIED $t")
    }
    spark.stop()
  }
}
