package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregate: keeps the k largest (score, id) pairs — score
  * descending, id ascending on ties — in a k-capped buffer. The point is
  * the SHUFFLE shape: a window-function top-k must move every candidate
  * row to its group's partition before ranking, while this Aggregator's
  * partial buffers cap at k entries map-side, so the exchange carries at
  * most k rows per (input partition, group) no matter how many candidates
  * a group has. For [[graft.ops.Similarity.knnGraph]] that turns a
  * cell-size-per-source shuffle into a k-per-source shuffle — the
  * difference between moving the candidate graph and moving the answer.
  */
class TopKAgg(k: Int)
  extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"TopKAgg needs k > 0, got $k") // else buf.last on Nil
  // throws an opaque executor-side error on the first input row

  // NaN-aware via Double.compare — NaN ranks ABOVE every double, the same
  // rule Spark's sort applies (nanSafeCompareDoubles), so the aggregator
  // stays byte-identical to the window formulation even when a zero-norm
  // vector mints a NaN cosine (review r11: primitive > and == are both
  // false on NaN, so a NaN candidate was dropped by the full-buffer fast
  // path while the window ranked it first)
  // `+ 0.0` collapses -0.0 to 0.0 (NaN is unaffected): Double.compare
  // orders -0.0 below 0.0 while Spark's sort (SQLOrderingUtil, x == y
  // short-circuit) treats them equal and falls to the id tie-break — on a
  // +0.0/-0.0 tie at the k boundary the two formulations would keep
  // different ids (cosine of opposed vectors can mint -0.0)
  private def order(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1 + 0.0, b._1 + 0.0)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  def zero: Seq[(Double, Long)] = Nil

  def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    // fast path first: once the buffer is full, almost every candidate
    // loses to the current kth and must cost O(k) comparisons, zero
    // allocation — the resort only runs for the few that displace
    if (buf.length >= k && !order(in, buf.last)) buf
    // k is small (3-100): insertion into a sorted k-list is O(k log k)
    // on the rare displace — cheaper than a heap at these sizes
    else (in +: buf).sortWith(order).take(k)

  def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sortWith(order).take(k)

  def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortWith(order)

  def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAgg {
  /** `topk(score, id)` as a Column aggregate returning
    * `array<struct<_1: double, _2: bigint>>` sorted best-first. */
  def apply(k: Int, score: Column, id: Column): Column =
    udaf(new TopKAgg(k)).apply(score, id)
}
