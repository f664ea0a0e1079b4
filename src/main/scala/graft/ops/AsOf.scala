package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time join): for each left row, the latest right row
  * with the same key and right.time <= left.time.
  *
  * Composed from built-ins (preference (a) of the custom-operator ladder):
  * an equi-join on the key with a range predicate, then a per-left-row
  * argmax window. Catalyst plans the equi part as a shuffled hash / SMJ on
  * the key, so at 100 TB this scales with key cardinality; the range filter
  * is applied post-join. For highly duplicated keys the windowed argmax is
  * the standard formulation (Flink temporal join / Pandas merge_asof do the
  * same under the hood).
  */
object AsOf {

  /** @param left       probe side
    * @param right      build side (its columns are prefixed `r_` on output)
    * @param key        join key column name (same name both sides)
    * @param leftTime   left event-time column name
    * @param rightTime  right event-time column name
    * @param leftId     unique left row id (window partition key)
    * @param rightId    deterministic tie-break id on the right
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               leftId: String, rightId: String): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    val joined = l.join(r,
      col(s"l.$key") === col(s"r.$key") && col(s"r.$rightTime") <= col(s"l.$leftTime"),
      "left_outer")
    val w = Window.partitionBy(col(s"l.$leftId"))
      .orderBy(col(s"r.$rightTime").desc_nulls_last, col(s"r.$rightId").desc_nulls_last)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Fixture query: each purchase event as-of-joined to the user's most
    * recent signup at-or-before it. */
  def purchaseToSignup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_event_id"), col("user_id").as("s_user_id"),
        col("ts").as("s_ts"))
    val joined = purchases.join(signups,
      purchases("user_id") === signups("s_user_id") && signups("s_ts") <= purchases("ts"),
      "left_outer")
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("s_ts").desc_nulls_last, col("s_event_id").desc_nulls_last)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("s_event_id").as("signup_id"))
      .orderBy(col("purchase_id"))
  }
}
