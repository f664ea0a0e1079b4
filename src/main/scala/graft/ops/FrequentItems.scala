package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact heavy hitters at sketch cost — the "which tokens exceed s of the
  * corpus" query a tokenizer-vocabulary or contamination audit runs, answered
  * WITHOUT shuffling the full vocabulary. Two passes:
  *
  *   1. a Misra-Gries summary (Misra & Gries 1982; merge rule per Agarwal et
  *      al. 2012 "Mergeable Summaries") of capacity C runs as a typed
  *      `Aggregator`: per-partition partials, tree-merged by Spark's normal
  *      partial-aggregation machinery, ONE summary of ≤ C counters reaching
  *      the driver. MG guarantees every token with true count > n/(C+1)
  *      survives the merged summary, so with support s > 1/(C+1) the
  *      summary keys are a SUPERSET of the true heavy hitters — whatever
  *      the partitioning.
  *   2. an exact count of ONLY the candidate tokens: the `isin(candidates)`
  *      filter sits directly on the tokenizer's generate output — before
  *      any exchange — so the groupBy shuffle carries candidate rows alone,
  *      O(C) distinct keys, instead of the full vocabulary.
  *
  * The final `count >= ceil(s*n)` cut makes the output exact and
  * deterministic (partitioning changes the candidate set, never the
  * answer). The reference has no sketch surface at all; Spark's built-in
  * `count_min_sketch` answers point queries but cannot enumerate, which is
  * the operation a pipeline actually needs.
  */
object FrequentItems {

  /** Mergeable Misra-Gries: buffer = (stream length, up to `capacity`
    * surviving counters). `reduce` is textbook MG insert; `merge` sums
    * counters pointwise and, when over capacity, subtracts the (C+1)-th
    * largest count from every counter and drops the non-positive — the
    * Agarwal et al. merge that preserves the n/(C+1) error bound. */
  class MisraGries(capacity: Int)
      extends Aggregator[String, (Long, Map[String, Long]), (Long, Map[String, Long])] {

    override def zero: (Long, Map[String, Long]) = (0L, Map.empty)

    override def reduce(b: (Long, Map[String, Long]), tok: String): (Long, Map[String, Long]) = {
      val (n, m) = b
      m.get(tok) match {
        case Some(c) => (n + 1, m.updated(tok, c + 1))
        case None if m.size < capacity => (n + 1, m.updated(tok, 1L))
        case None =>
          // decrement-all: every counter loses 1, zeros fall out
          (n + 1, m.iterator.map { case (k, c) => (k, c - 1) }
            .filter(_._2 > 0).toMap)
      }
    }

    override def merge(b1: (Long, Map[String, Long]),
                       b2: (Long, Map[String, Long])): (Long, Map[String, Long]) = {
      val summed = mutable.HashMap.from(b1._2)
      b2._2.foreach { case (k, c) => summed.update(k, summed.getOrElse(k, 0L) + c) }
      val reduced: Map[String, Long] =
        if (summed.size <= capacity) summed.toMap
        else {
          val d = summed.values.toArray.sorted(Ordering.Long.reverse).apply(capacity)
          summed.iterator.map { case (k, c) => (k, c - d) }.filter(_._2 > 0).toMap
        }
      (b1._1 + b2._1, reduced)
    }

    override def finish(b: (Long, Map[String, Long])): (Long, Map[String, Long]) = b
    override def bufferEncoder: Encoder[(Long, Map[String, Long])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.kryo[Map[String, Long]])
    override def outputEncoder: Encoder[(Long, Map[String, Long])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.kryo[Map[String, Long]])
  }

  /** MG candidate pass over an already-tokenized Dataset — exposed for the
    * spec's partitioning-invariance and superset-property checks. Returns
    * (total token count, candidate summary). */
  def mgCandidates(spark: SparkSession, toks: DataFrame,
                   capacity: Int): (Long, Map[String, Long]) = {
    import spark.implicits._
    toks.as[String].select(new MisraGries(capacity).toColumn).head()
  }

  /** Tokens whose corpus frequency is at least `support` of all tokens,
    * with exact counts and corpus share. `capacity` must exceed
    * 1/support (enforced) for the MG superset guarantee to hold. */
  def heavyHitters(spark: SparkSession, dir: String, support: Double = 0.01,
                   capacity: Int = 256): DataFrame = {
    require(capacity + 1 > 1.0 / support,
      s"capacity $capacity too small for support $support: need capacity+1 > 1/s")
    val toks = Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val (total, summary) = mgCandidates(spark, toks, capacity)
    val threshold = math.ceil(support * total).toLong
    val candidates = summary.keys.toSeq
    toks.filter(col("tok").isin(candidates: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .withColumn("share", round(col("cnt") / lit(total.toDouble), 6))
      .orderBy(col("cnt").desc, col("tok"))
  }

  /** Association rules (Agrawal & Srikant 1994 Apriori, pair tier) over
    * per-(user, day) event-type baskets — the co-occurrence miner behind
    * "users who error also churn"-style diagnostics, and the same shape a
    * pipeline uses for tag/domain co-occurrence. Baskets are (user, day)
    * rather than whole users: at any realistic horizon every user touches
    * every event type, so the day-scoped basket is what carries signal.
    *
    * Apriori downward closure does the scaling work: singleton supports
    * are counted first (one hash aggregate over the deduped basket-item
    * table), items below `minSupport` are dropped, and only the filtered
    * baskets enter the pair self-join — keyed on the basket, with
    * per-basket fanout bounded by the (post-filter) basket width, never a
    * cross join. Confidence and lift come from joining pair counts back
    * to the bounded item-count table; both directions of every surviving
    * pair are emitted. Counts are integers; the three ratios are one
    * rounded division each. */
  def assocRules(spark: SparkSession, dir: String,
                 minSupport: Double = 0.05): DataFrame = {
    val b = Tables.events(spark, dir)
      .select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 86400L).as("day"),
        col("event_type").as("item"))
      .distinct()
      .localCheckpoint(true) // consumed by totals, item counts, both join sides
    val nb = b.select(col("user_id"), col("day")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    // checkpointed: three consumers (basket filter, antecedent counts,
    // consequent counts) would otherwise each replay the 1-row support
    // fold; the table is bounded by the item vocabulary
    val items = b.groupBy(col("item")).agg(count(lit(1)).as("ci"))
      .crossJoin(broadcast(nb))
      .filter(col("ci") >= col("n_baskets") * minSupport)
      .select(col("item"), col("ci"))
      .localCheckpoint(true)
    val fb = b.join(broadcast(items.select(col("item"))), Seq("item"))
    val pairs = fb.alias("a")
      .join(fb.alias("b"),
        col("a.user_id") === col("b.user_id") && col("a.day") === col("b.day") &&
          col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("ia"), col("b.item").as("ib"))
      .agg(count(lit(1)).as("cp"))
    val directed = pairs.select(col("ia").as("antecedent"),
        col("ib").as("consequent"), col("cp"))
      .unionByName(pairs.select(col("ib").as("antecedent"),
        col("ia").as("consequent"), col("cp")))
    directed
      .join(broadcast(items.select(col("item").as("antecedent"),
        col("ci").as("ca"))), Seq("antecedent"))
      .join(broadcast(items.select(col("item").as("consequent"),
        col("ci").as("cb"))), Seq("consequent"))
      .crossJoin(broadcast(nb))
      // pair support is ALSO cut at minSupport (review r11): the Apriori
      // contract promises every emitted rule meets the support threshold —
      // two individually-frequent items co-occurring once must not ship.
      // Applied at the existing nb cross join (the plan contract allows
      // exactly one broadcast-nested-loop join in this query).
      .filter(col("cp") >= col("n_baskets") * minSupport)
      .select(col("antecedent"), col("consequent"), col("cp").as("n_pair"),
        round(col("cp").cast("double") / col("n_baskets"), 4).as("support"),
        round(col("cp").cast("double") / col("ca"), 4).as("confidence"),
        round(col("cp").cast("double") * col("n_baskets") /
          (col("ca") * col("cb")), 4).as("lift"))
      .orderBy(col("antecedent"), col("consequent"))
  }
}
