package graft.tools

/** Dev tool: run a SUBSET of SparkEntry.queries and dump results + their
  * oracle SQL in Verify's exact output layout, so scripts/check_oracle.py
  * can gate individual queries while iterating without paying for the full
  * 120+-query sweep. Not part of the engine surface.
  *
  * Usage: runMain graft.tools.VerifySome <sfDir> <outDir> <name> [name ...]
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.quietBoundedWindowWarnings()
    new java.io.File(outDir).mkdirs()
    // Verify.dump's exact failure semantics (r12): a throwing query is
    // recorded and its stale dump removed, instead of aborting the whole
    // subset run mid-way — which left oracle_sql.json unmerged and
    // earlier dumps in this run ungradable (bit the fuzz-variant
    // iteration, where loud contract refusals are an EXPECTED outcome).
    val failed = scala.collection.mutable.Map[String, String]()
    names.foreach { name =>
      try {
        graft.SparkEntry.queries(name)(spark, sfDir)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        println(s"[verify-some] wrote $name")
      } catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify-some] $name failed: $msg")
        failed += name -> msg
        deleteRecursively(new java.io.File(s"$outDir/$name"))
      }
    }
    // one escaper for every dump tool (review r12: a local copy here would
    // drift from the shared one on the next escaping fix)
    def q(x: String): String = graft.Verify.q(x)
    // MERGE into any existing oracle_sql.json (review r11): overwriting
    // with only this run's names would downgrade an earlier dump in the
    // same outDir from value-checked to rows-only — a wrong-valued query
    // from a prior VerifySome would then pass check_oracle green.
    val jsonPath = java.nio.file.Paths.get(s"$outDir/oracle_sql.json")
    val prior: Map[String, String] =
      if (java.nio.file.Files.exists(jsonPath)) {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(jsonPath.toFile)
        val it = node.fields()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
        b.result()
      } else Map.empty
    val sqls = prior ++
      names.flatMap(n => graft.SparkEntry.oracleSql.get(n).map(n -> _))
    val json = sqls.toSeq.sortBy(_._1).map { case (n, s) => s"${q(n)}: ${q(s)}" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.write(jsonPath, json.getBytes("UTF-8"))
    // maintain errors.json the same way (FuzzGate's layout): re-run names
    // drop their stale entry; failures (re)register with the live message
    val errPath = java.nio.file.Paths.get(s"$outDir/errors.json")
    val priorErrs: Map[String, String] =
      if (java.nio.file.Files.exists(errPath)) {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(errPath.toFile)
        val it = node.fields()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
        b.result()
      } else Map.empty
    val errs = (priorErrs -- names) ++ failed.view.mapValues(_.take(400))
    java.nio.file.Files.write(errPath,
      errs.toSeq.sortBy(_._1).map { case (n, m) => s"${q(n)}: ${q(m)}" }
        .mkString("{", ", ", "}").getBytes("UTF-8"))
    spark.stop()
    // no sys.exit: under a non-forked sbt multi-command run it would kill
    // the whole sbt session and every queued command after this one
    if (failed.nonEmpty)
      println(s"[verify-some] ${failed.size} failed: " +
        failed.keys.toSeq.sorted.mkString(", "))
  }

  private def deleteRecursively(f: java.io.File): Unit =
    graft.Verify.deleteRecursively(f)
}
