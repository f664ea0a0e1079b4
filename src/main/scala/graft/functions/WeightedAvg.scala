package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY.md §2.2 — the reference has none): a
  * weighted average as an `Aggregator`, the user-facing custom-aggregate
  * API. Partial aggregation (`reduce`) runs map-side, `merge` combines
  * partition buffers — the same two-phase shape Catalyst gives built-ins. */
object WeightedAvg extends Aggregator[
    (java.lang.Double, java.lang.Double), (Double, Double), java.lang.Double] {
  def zero: (Double, Double) = (0.0, 0.0)
  // boxed input + null skip (review r11): the primitive-tuple encoder
  // wrapped inputs in AssertNotNull, so ONE null value or weight crashed
  // the whole query — built-in avg (the stated contract) skips nulls
  def reduce(b: (Double, Double),
             in: (java.lang.Double, java.lang.Double)): (Double, Double) =
    if (in._1 == null || in._2 == null) b
    else (b._1 + in._1 * in._2, b._2 + in._2)
  def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  // null — not 0/0 = NaN — when the group's weight mass is zero (all-zero
  // weights, or an empty global aggregate), matching built-in avg's
  // empty-group contract so consumers never meet a silent NaN (r9 review)
  def finish(b: (Double, Double)): java.lang.Double =
    if (b._2 == 0.0) null else java.lang.Double.valueOf(b._1 / b._2)
  def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(
    Encoders.scalaDouble, Encoders.scalaDouble)
  def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE

  /** `wavg(value, weight)` as a Column aggregate. */
  def apply(value: Column, weight: Column): Column =
    udaf(WeightedAvg).apply(value, weight)
}
