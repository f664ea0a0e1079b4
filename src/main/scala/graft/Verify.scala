package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: graft.Verify <sfDir> <outDir>")
      sys.exit(2)
    }
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.get(s"local[$cpus]", cpus.toInt)
    dump(spark, sfDir, outDir)
    spark.stop()
  }

  /** Run every query against `sfDir`, dump each result under
    * `outDir/<name>`, write `oracle_sql.json`, and return the per-query
    * error messages for the queries that failed (their dump dirs are
    * removed — a missing dump is a loud failure downstream, a stale dump
    * would be a silent pass). Shared by the driver-shaped [[main]] and the
    * adversarial-fixture fuzz runner ([[graft.tools.FuzzGate]]), so the
    * fuzz gate exercises the EXACT dump path the round gate grades. */
  def dump(spark: SparkSession, sfDir: String,
           outDir: String): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val errs = Map.newBuilder[String, String]
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: $msg")
        errs += name -> msg
        // A plan-time failure never reaches the overwrite, so a PREVIOUS
        // run's parquet under the same outDir would pass the oracle as
        // this run's result (review r11). Remove it.
        deleteRecursively(new java.io.File(s"$outDir/$name"))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    errs.result()
  }

  private[graft] def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Shared by the dump tools (VerifySome, FuzzGate) — one copy, so the
    * stale-dump removal discipline cannot drift between them. */
  private[graft] def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }
}
