package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one per suite, lazily created). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("local[4]", 4)
  lazy val sf: String = "/root/testdata/sf0.001"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Flatten a throwable's cause chain into one searchable diagnostic —
    * the shared failure-text walker (review r13: two specs grew private
    * near-copies that had already drifted). */
  def causeChain(t: Throwable): String = {
    val sb = new StringBuilder
    var c: Throwable = t
    while (c != null) { sb.append(c.toString).append('\n'); c = c.getCause }
    sb.toString
  }
}
