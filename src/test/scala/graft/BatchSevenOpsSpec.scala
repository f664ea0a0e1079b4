package graft

import graft.ops.{QualityChecks, Tables}
import graft.streaming.StreamJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Seventh round-6 batch: the Deequ-style constraint suite and the
  * oracle-graded stream-stream join. The suite's violation-injection cases
  * prove every constraint actually trips; the join's crash-resume case
  * extends the DedupStream contract to two-sided watermarked state. */
class BatchSevenOpsSpec extends SparkSpec {

  // ------------------------------------------------------------ dq checks

  test("dq checks: the fixture passes every constraint and metrics are " +
    "the exact ratios") {
    val rows = QualityChecks.dqChecks(spark, sf).collect()
    assert(rows.length === 7)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"fixture must pass ${r.getString(0)}")
      if (r.getString(0) != "min_size") {
        assert(r.getDouble(2) === 1.0)
      }
    }
    val sizes = rows.filter(_.getString(0) == "min_size")
    assert(sizes.length === 1 && sizes.head.getDouble(2) >= 1.0)
  }

  test("dq checks: every constraint trips on an injected violation with " +
    "the exact degraded metric") {
    import spark.implicits._
    val orders = Tables(spark, sf, "orders")
    val lineitem = Tables(spark, sf, "lineitem")
    val customer = Tables(spark, sf, "customer")
    val nOrders = orders.count()
    val nLines = lineitem.count()
    // corrupt: one null custkey, one duplicated orderkey, one negative
    // price, one orphaned custkey; one bad returnflag, one qty 99
    val firstKey = orders.select(min(col("o_orderkey"))).head().getLong(0)
    val badOrders = orders
      .withColumn("o_custkey",
        when(col("o_orderkey") === firstKey, lit(null)).otherwise(col("o_custkey")))
      .unionByName(orders.filter(col("o_orderkey") === firstKey)
        .withColumn("o_custkey", lit(-999999L))
        .withColumn("o_totalprice", lit(-1.0)))
    val firstLine = lineitem.limit(1)
    val badLines = lineitem
      .unionByName(firstLine.withColumn("l_returnflag", lit("X"))
        .withColumn("l_quantity", lit(99.0)))
    val got = QualityChecks.suite(badOrders, badLines, customer).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getBoolean(4))).toMap
    val nb = (nOrders + 1).toDouble
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("completeness") === ((r6(nOrders / nb), false)))
    assert(got("uniqueness") === ((r6(nOrders / nb), false)))
    assert(got("non_negative") === ((r6(nOrders / nb), false)))
    assert(got("referential_integrity") === ((r6((nb - 1) / nb), false)),
      "the orphan key must be counted, the null key must not")
    assert(got("accepted_values") === ((r6(nLines / (nLines + 1).toDouble), false)))
    assert(got("in_range") === ((r6(nLines / (nLines + 1).toDouble), false)))
    assert(got("min_size") === ((nb, true)), "size check unaffected")
  }

  // ---------------------------------------------------------- stream join

  private def batchJoin() = {
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase").alias("p")
    val s = ev.filter(col("event_type") === "signup").alias("s")
    p.join(s, col("p.user_id") === col("s.user_id") &&
        col("p.ts") >= col("s.ts") &&
        col("p.ts") <= col("s.ts") + expr("INTERVAL 1 hour"))
      .select(col("p.event_id").as("p_id"), col("s.event_id").as("s_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("stream join: the checkpointed streamed run emits exactly the " +
    "batch interval join") {
    val streamed = StreamJoin.streamedAttribution(spark, sf).collect()
    assert(streamed.nonEmpty)
    assert(streamed.map(r => (r.getLong(0), r.getLong(1))).toSet === batchJoin())
    streamed.foreach { r =>
      val lag = r.getLong(5)
      assert(lag >= 0 && lag <= 3600, s"attribution lag $lag outside horizon")
      assert(r.getLong(3) - r.getLong(4) === lag)
    }
  }

  test("stream join: killed with a lost commit, the resumed match log " +
    "equals the uninterrupted run") {
    val root = tmpDir("streamjoin_crash")
    val feed = s"$root/feed"
    StreamJoin.stageEventFeed(spark, sf, feed)
    val ckpt = s"$root/ckpt"
    val q1 = StreamJoin.start(spark, feed, s"$root/out", ckpt,
      maxFilesPerTrigger = Some(2), trigger = Trigger.ProcessingTime(0L))
    CkptCrash.awaitCommits(ckpt, 2)
    q1.stop()
    CkptCrash.simulateCrashAtLastCommit(spark, ckpt)
    val q2 = StreamJoin.start(spark, feed, s"$root/out", ckpt,
      maxFilesPerTrigger = Some(2))
    q2.processAllAvailable(); q2.stop()
    val log = StreamJoin.matches(spark, s"$root/out")
    val resumed = log.select(col("p_id"), col("s_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(resumed.toSet === batchJoin())
    assert(resumed.length === resumed.toSet.size,
      "replayed batch must not double its matches")
  }
}
