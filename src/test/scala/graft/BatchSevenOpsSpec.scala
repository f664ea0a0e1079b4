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

  test("dq checks: a violation rate below the 6-dp display precision " +
    "still FAILS the gate — the verdict compares the unrounded metric " +
    "(review r11: round-then-compare waved through <5e-7 rates)") {
    import spark.implicits._
    // 2,000,001 orders, ONE null custkey: raw completeness 0.9999995...
    // rounds HALF_UP to exactly 1.000000 at 6 dp
    val orders = spark.range(2000001L).select(
      col("id").as("o_orderkey"),
      when(col("id") === 0L, lit(null)).otherwise(lit(7L)).as("o_custkey"),
      lit(1.0).as("o_totalprice"))
    val lineitem = Seq(("A", 1.0)).toDF("l_returnflag", "l_quantity")
    val customer = Seq(7L).toDF("c_custkey")
    val got = QualityChecks.suite(orders, lineitem, customer).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getBoolean(4))).toMap
    assert(got("completeness") === ((1.0, false)),
      "metric displays 1.000000 but the gate must still fail: " +
        got("completeness"))
    assert(got("uniqueness") === ((1.0, true)))
    assert(got("referential_integrity") === ((1.0, true)))
  }

  test("asofJoin: every right column lands r_-prefixed (no ambiguous " +
    "names), the latest at-or-before row wins with the id tie-break, and " +
    "purchaseToSignup equals the generic operator (review r11)") {
    import spark.implicits._
    val left = Seq((10L, 1L, 100L), (11L, 1L, 50L), (12L, 2L, 100L))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (20L, 1L, 40L),  // older
      (21L, 1L, 100L), // exactly at left ts 100 — eligible, ties on ts...
      (22L, 1L, 100L), // ...broken by the HIGHER right id
      (23L, 2L, 150L)) // after every left row for user 2 — no match
      .toDF("event_id", "user_id", "ts")
    val got = graft.ops.AsOf.asofJoin(left, right, key = "user_id",
        leftTime = "ts", rightTime = "ts",
        leftId = "event_id", rightId = "event_id")
    assert(got.columns.count(_ == "user_id") === 1 &&
      got.columns.toSet === Set("event_id", "user_id", "ts",
        "r_event_id", "r_user_id", "r_ts"),
      s"right columns must be r_-prefixed: ${got.columns.toSeq}")
    val rows = got.select(col("event_id"), col("r_event_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows === Map(10L -> Some(22L), 11L -> Some(20L), 12L -> None),
      s"latest-at-or-before with max-id tie-break: $rows")
    // the fixture query is the generic operator, not a divergent copy
    val viaOp = graft.ops.AsOf.purchaseToSignup(spark, sf).collect()
    assert(viaOp.nonEmpty && viaOp.head.schema.fieldNames.toSeq ===
      Seq("purchase_id", "user_id", "signup_id"))
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
