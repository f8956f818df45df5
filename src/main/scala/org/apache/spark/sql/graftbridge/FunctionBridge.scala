package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers function builders into an EXISTING session's
  * FunctionRegistry (`sessionState` is `private[sql]`, hence this shim in
  * the `org.apache.spark.sql` namespace). The cluster-deployment path is
  * `graft.functions.GraftExtensions` via `spark.sql.extensions`, which
  * injects the same builders at session build; this bridge covers
  * sessions that already exist (tests, notebooks, the driver contract's
  * `SparkEntry` entry points). */
object FunctionBridge {
  def register(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name),
      builder)
}
