package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver fixtures (TESTDATA.md). Column pruning + predicate
  * pushdown reach the parquet scan automatically since all queries stay
  * declarative on these DataFrames.
  *
  * The resolved PLAN is memoized per (session, file identity) — r14: every
  * `spark.read.parquet` call re-lists the path and re-reads the footer to
  * infer the schema, a fixed ~10-40 ms of driver work each of the ~1,300
  * times a bench run resolves a fixture table. What is cached is the lazy
  * DataFrame (a logical plan — metadata only); every action on it still
  * computes from the parquet file, so this is a catalog, not a result
  * cache. The key carries the file's (mtime, length): a fixture rewritten
  * in place (fuzz staging, test scratch) misses the cache and re-resolves,
  * exactly like the manifest parse cache (r13). Keyed by session too — a
  * cloned or restarted session must not serve plans whose attribute ids
  * another session minted. */
object Tables {
  private final case class TKey(session: Int, path: String,
                                mtime: Long, len: Long)
  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[TKey, DataFrame](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[TKey, DataFrame]): Boolean = size() > 64
      })

  private def resolve(spark: SparkSession, path: String)
                     (build: => DataFrame): DataFrame = {
    val key =
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        val st = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getFileStatus(p)
        Some(TKey(System.identityHashCode(spark), path,
          st.getModificationTime, st.getLen))
      } catch { case _: java.io.IOException => None } // missing/odd: no cache
    key match {
      case None => build
      case Some(k) =>
        val hit = cache.get(k)
        if (hit != null) hit
        else { val df = build; cache.put(k, df); df }
    }
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else {
      val path = s"$dir/$name.parquet"
      resolve(spark, path)(spark.read.parquet(path))
    }

  /** The `events` fixture stores TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by [[graft.GraftSession]])
    * the `ts` column reads as a long of epoch-nanos. Normalize it to a real
    * TimestampType (microsecond truncation — matches DuckDB's
    * TIMESTAMP_NS -> TIMESTAMP cast, so oracles agree). */
  def events(spark: SparkSession, dir: String): DataFrame =
    resolve(spark, s"$dir/events.parquet") {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        // parquet naive timestamps arrive as TIMESTAMP_NTZ; the session tz is
        // pinned UTC, so the cast is a value-identity that restores the
        // TIMESTAMP type the time functions (unix_micros etc.) require
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast(
              org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    }
}
