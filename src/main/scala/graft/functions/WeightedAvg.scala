package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY.md §2.2 — the reference has none): a
  * weighted average as an `Aggregator`, the user-facing custom-aggregate
  * API. Partial aggregation (`reduce`) runs map-side, `merge` combines
  * partition buffers — the same two-phase shape Catalyst gives built-ins. */
object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
  def zero: (Double, Double) = (0.0, 0.0)
  def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  def finish(b: (Double, Double)): Double = b._1 / b._2
  def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(
    Encoders.scalaDouble, Encoders.scalaDouble)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** `wavg(value, weight)` as a Column aggregate. */
  def apply(value: Column, weight: Column): Column =
    udaf(WeightedAvg).apply(value, weight)
}
