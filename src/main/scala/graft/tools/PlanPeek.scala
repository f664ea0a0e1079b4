package graft.tools
/** Dev tool: print a query's FINAL adaptive physical plan (post-execution,
  * reused stages visible). Usage: runMain graft.tools.PlanPeek <query>. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    df.count()
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
