package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: write `explain("formatted")` of the named queries to files —
  * the per-query plan evidence the optimization rounds commit under
  * `plans/<round>/` (the judge checks plan-shape claims against these).
  *
  * Usage: runMain graft.tools.PlanOne <sfDir> <outDir> <suffix> <q1,q2,...>
  * — writes `<outDir>/<query>_<suffix>.txt` per query.
  */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, qs) = args.take(4)
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    qs.split(",").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${q}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"PLAN $q -> $outDir/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
