ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "meilisyncspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked JVM's stdout through unprefixed: the bench/verify drivers
// parse the single JSON line Bench.main prints, and sbt's default logger
// would wrap it as "[info] {...}" which is not valid JSON to a line parser.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Suppress sbt's trailing "[success] Total time: ..." line so the bench
// JSON printed by Bench.main is the LAST line of stdout — the bench driver
// reads the output tail and a trailing non-JSON line breaks its parse
// (BENCH_r01..r03 all recorded parsed:null with the success line last).
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Java 17 derives the default charset from the locale (JEP 400 made
  // UTF-8 the default only in 18+): under a POSIX locale file.encoding
  // becomes US-ASCII and Spark's variant-to-JSON path — which consults the
  // default charset — mangles every non-ASCII character into U+FFFD
  // (found by WireDecoderFuzzSpec; plain string/parquet paths use explicit
  // UTF-8 and were unaffected). Pin the charset the way any production
  // spark-submit environment has it.
  "-Dfile.encoding=UTF-8",
  "-Dsun.jnu.encoding=UTF-8",
  // 16g default: the bench JVM executes every query twice (warmup + timed)
  // at local[32]; at 8g the timed pass ran under GC pressure from warmup
  // leftovers and iterative-query times swung 2-4x run to run.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
