package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver fixtures (TESTDATA.md). Column pruning + predicate
  * pushdown reach the parquet scan automatically since all queries stay
  * declarative on these DataFrames. */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The `events` fixture stores TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by [[graft.GraftSession]])
    * the `ts` column reads as a long of epoch-nanos. Normalize it to a real
    * TimestampType (microsecond truncation — matches DuckDB's
    * TIMESTAMP_NS -> TIMESTAMP cast, so oracles agree). */
  def events(spark: SparkSession, dir: String): DataFrame = {
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
