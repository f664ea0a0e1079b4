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

  /** @param left       probe side (must not already contain `r_`-prefixed
    *                    names that collide with the renamed right columns)
    * @param right      build side — EVERY right column is renamed `r_<name>`
    *                    on output, so key/time name collisions with the
    *                    left are impossible (review r11: the doc promised
    *                    this prefixing but the old body never did it, so
    *                    any caller got duplicate column names and
    *                    AMBIGUOUS_REFERENCE on select-by-name)
    * @param key        join key column name (same name both sides)
    * @param leftTime   left event-time column name
    * @param rightTime  right event-time column name
    * @param leftId     unique left row id (window partition key)
    * @param rightId    deterministic tie-break id on the right
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               leftId: String, rightId: String): DataFrame = {
    val r0 = right.select(right.columns.map(c => col(c).as(s"r_$c"))
      .toIndexedSeq: _*)
    val joined = left.join(r0,
      col(key) === col(s"r_$key") && col(s"r_$rightTime") <= col(leftTime),
      "left_outer")
    val w = Window.partitionBy(col(leftId))
      .orderBy(col(s"r_$rightTime").desc_nulls_last,
        col(s"r_$rightId").desc_nulls_last)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Fixture query: each purchase event as-of-joined to the user's most
    * recent signup at-or-before it — routed through [[asofJoin]] (review
    * r11: this used to re-implement the generic join inline line-for-line,
    * so a fix to one silently missed the other). */
  def purchaseToSignup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("ts"))
    asofJoin(purchases, signups, key = "user_id",
        leftTime = "ts", rightTime = "ts",
        leftId = "event_id", rightId = "event_id")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("r_event_id").as("signup_id"))
      .orderBy(col("purchase_id"))
  }
}
