package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared register-if-absent helper for the engine's temp functions:
  * `createOrReplaceTempFunction` on an existing name logs a replacement
  * WARN per call, and the register entry points run from every operator. */
private[functions] object Registration {
  def registerIfAbsent(spark: SparkSession)(
      name: String, builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
