package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.operators.Ranges

/** SQL surface for the two TABLE operators ([[Ranges.flattenRanges]]
  * A1 and [[Ranges.mergeAdjacent]] A2) — every scalar/agg graft adds
  * is SQL-registered, and with these the headline range ops are too:
  *
  * {{{
  * SELECT * FROM flatten_ranges('blocks_view', 'dataset,family')
  * SELECT * FROM merge_adjacent('ranges_view')           -- no groups
  * SELECT * FROM flatten_ranges('v', '', 'start', 'stop') -- col names
  * }}}
  *
  * Arguments: (table-or-view name, [comma-separated group columns],
  * [lo column, hi column]). Table-valued functions resolve a FROM
  * clause, so the call site composes with joins/filters like any
  * table. The view-name-argument shape (rather than a TABLE(...)
  * argument) keeps the builder a plain Catalyst
  * `TableFunctionRegistry` entry with no analyzer extension.
  */
object RangeTableFunctions {

  def register(spark: SparkSession): Unit = {
    GraftBridge.registerTableFunction(spark, "flatten_ranges",
      build(Ranges.flattenRanges))
    GraftBridge.registerTableFunction(spark, "merge_adjacent",
      build(Ranges.mergeAdjacent))
  }

  private def strArg(es: Seq[Expression], i: Int,
      default: String): String =
    if (es.length > i) {
      val e = es(i)
      require(e.foldable && e.dataType ==
        org.apache.spark.sql.types.StringType,
        s"argument ${i + 1} must be a string literal, got $e")
      String.valueOf(e.eval())
    } else default

  private def build(
      op: (org.apache.spark.sql.DataFrame, Seq[String], String, String) =>
        org.apache.spark.sql.DataFrame)
      (es: Seq[Expression]): LogicalPlan = {
    require(es.nonEmpty, "first argument: table or view name")
    val session = SparkSession.active
    val table = strArg(es, 0, "")
    val groups = strArg(es, 1, "").split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq
    val lo = strArg(es, 2, "lo")
    val hi = strArg(es, 3, "hi")
    op(session.table(table), groups, lo, hi).queryExecution.analyzed
  }
}
