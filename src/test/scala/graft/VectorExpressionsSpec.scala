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
}
