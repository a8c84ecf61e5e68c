package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Spark 4 internals the library needs:
  * Column ↔ Expression conversion (for the custom Catalyst
  * expression family) and the session's FunctionRegistry.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    classic.ClassicConversions.castToImpl(spark)
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Register a table-valued function (`SELECT * FROM name(...)`):
    * the builder maps the call's argument expressions to the logical
    * plan the FROM clause resolves to.
    */
  def registerTableFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => catalyst.plans.logical.LogicalPlan): Unit =
    classic.ClassicConversions.castToImpl(spark)
      .sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Inject a planner strategy into a live session (tried before the
    * built-in strategies). Session-creation-time alternative:
    * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
    */
  def addStrategy(spark: SparkSession,
      s: execution.SparkStrategy): Unit = {
    val exp = classic.ClassicConversions.castToImpl(spark).experimental
    if (!exp.extraStrategies.contains(s))
      exp.extraStrategies = exp.extraStrategies :+ s
  }
}
