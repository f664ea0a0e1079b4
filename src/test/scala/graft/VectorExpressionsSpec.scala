package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot / graft_norm match the HOF formulation bit-for-bit") {
    VectorFunctions.register(spark)
    val df = ops.Tables(spark, sf, "embeddings")
      .select(expr("transform(embedding, x -> cast(x as double))").as("v"))
      .limit(50)
      .select(
        expr("graft_dot(v, v)").as("dot_native"),
        expr("aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (s, x) -> s + x)").as("dot_hof"),
        expr("graft_norm(v)").as("norm_native"),
        expr("sqrt(aggregate(v, 0D, (s, x) -> s + x * x))").as("norm_hof"))
    df.collect().foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1)) // exact equality by design
      assert(r.getDouble(2) === r.getDouble(3))
    }
  }

  test("graft_dot participates in whole-stage codegen") {
    VectorFunctions.register(spark)
    val df = ops.Tables(spark, sf, "embeddings")
      .select(expr("transform(embedding, x -> cast(x as double))").as("v"))
      .select(expr("graft_dot(v, v)").as("d"))
    // a `*(n)` prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[graft_dot""".r.findFirstIn(plan).isDefined, plan)
  }

  test("type checking rejects non-double arrays") {
    VectorFunctions.register(spark)
    val err = intercept[Exception] {
      Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
        .select(expr("graft_dot(a, b)")).collect()
    }
    assert(err.getMessage.contains("array<double>"))
  }

  test("null vector yields null, not a crash") {
    VectorFunctions.register(spark)
    val rows = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(expr("graft_dot(a, b)").as("d"))
      .collect()
    assert(rows.head.isNullAt(0))
  }

  test("graft_dot: mismatched dimensions yield NULL, never a truncated " +
    "partial product (r9 review — parity with the zip_with formulation, " +
    "which pads the shorter side with nulls)") {
    VectorFunctions.register(spark)
    val rows = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 1.0)),      // mismatch -> null
      (Seq(1.0, 2.0), Seq(3.0, 4.0)))           // match -> 11.0
      .toDF("a", "b")
      .select(expr("graft_dot(a, b)").as("d"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
          .as("hof"))
      .collect()
    assert(rows(0).isNullAt(0), "mismatch must be null")
    assert(rows(0).isNullAt(1), "…exactly like the HOF formulation")
    assert(rows(1).getDouble(0) === 11.0 && rows(1).getDouble(1) === 11.0)
  }

  test("WeightedAvg: a zero weight mass yields NULL (built-in avg's " +
    "empty-group contract), not a silent NaN (r9 review)") {
    val df = Seq(
      ("a", 10.0, 0.0), ("a", 20.0, 0.0), // all-zero weights
      ("b", 10.0, 1.0), ("b", 20.0, 3.0))
      .toDF("g", "v", "w")
    val out = df.groupBy(col("g"))
      .agg(graft.functions.WeightedAvg(col("v"), col("w")).as("wavg"))
      .orderBy(col("g")).collect()
    assert(out(0).isNullAt(1), "zero-weight group must be null, not NaN")
    assert(out(1).getDouble(1) === 17.5)
  }

  test("WeightedAvg: null values/weights are SKIPPED like built-in avg, " +
    "not a query-killing AssertNotNull (review r11)") {
    val df = Seq(
      ("a", Some(10.0), Some(1.0)),
      ("a", None, Some(9.0)),        // null value: skipped
      ("a", Some(99.0), None),       // null weight: skipped
      ("a", Some(30.0), Some(3.0)))
      .toDF("g", "v", "w")
    val out = df.groupBy(col("g"))
      .agg(graft.functions.WeightedAvg(col("v"), col("w")).as("wavg"))
      .collect()
    assert(out(0).getDouble(1) === 25.0, // (10*1 + 30*3) / 4
      s"null pairs must be skipped: ${out.toSeq}")
  }

  test("TopKAgg: NaN scores rank FIRST (Spark's sort rule) so the bounded " +
    "aggregate stays byte-identical to the window formulation, and k <= 0 " +
    "is rejected at construction (review r11)") {
    import graft.functions.TopKAgg
    val agg = new TopKAgg(2)
    val fed = Seq((1.0, 10L), (Double.NaN, 20L), (2.0, 30L), (Double.NaN, 5L))
      .foldLeft(agg.zero)(agg.reduce)
    // compare ids + NaN-ness (tuple == on NaN is always false)
    def shape(s: Seq[(Double, Long)]) = s.map(p => (p._1.isNaN, p._2))
    assert(shape(agg.finish(fed)) === Seq((true, 5L), (true, 20L)),
      "NaN candidates must displace finite scores, id-ascending on ties")
    // merge path agrees
    val m = agg.merge(Seq((2.0, 30L), (1.0, 10L)), Seq((Double.NaN, 7L)))
    assert(shape(m) === Seq((true, 7L), (false, 30L)))
    val err = intercept[IllegalArgumentException](new TopKAgg(0))
    assert(err.getMessage.contains("k > 0"), err.getMessage)
  }
}
