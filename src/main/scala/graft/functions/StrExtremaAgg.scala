package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `str_min(col)` / `str_max(col)`: EXACT string extrema as a custom
  * Catalyst aggregate (TypedImperativeAggregate, the [[MinHashAgg]]
  * class), because the built-in declarative `min`/`max` over
  * StringType carries a var-length aggregation buffer HashAggregate
  * cannot hold — Spark silently downgrades the whole aggregate to
  * SortAggregate, paying an O(n log n) per-partition sort of the
  * input stream just to take a running min. This buffer is one
  * object (the current extremum), so the plan is
  * ObjectHashAggregate: one O(n) pass, map-side combined, identical
  * binary (UTF8String) ordering to the built-in — same answer, no
  * sort. Used by [[graft.operators.ColStats]] and
  * [[graft.operators.ZoneMap]], whose profile passes aggregate
  * corpus-scale exploded rows.
  */
case class StrExtremaAgg(child: Expression, isMin: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[UTF8String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  // one-slot holder: null = no non-null input seen yet
  override def createAggregationBuffer(): Array[UTF8String] =
    new Array[UTF8String](1)

  private def better(a: UTF8String, b: UTF8String): Boolean =
    if (isMin) a.compareTo(b) < 0 else a.compareTo(b) > 0

  override def update(buf: Array[UTF8String],
      input: InternalRow): Array[UTF8String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      // clone: eval may hand back a buffer-backed slice that the
      // scanner reuses for the next row
      if (buf(0) == null || better(s, buf(0))) buf(0) = s.clone()
    }
    buf
  }

  override def merge(a: Array[UTF8String],
      b: Array[UTF8String]): Array[UTF8String] = {
    if (b(0) != null && (a(0) == null || better(b(0), a(0))))
      a(0) = b(0)
    a
  }

  override def eval(buf: Array[UTF8String]): Any = buf(0)

  override def serialize(buf: Array[UTF8String]): Array[Byte] =
    if (buf(0) == null) Array.emptyByteArray
    else {
      val b = buf(0).getBytes
      val out = new Array[Byte](b.length + 1)
      out(0) = 1
      System.arraycopy(b, 0, out, 1, b.length)
      out
    }

  override def deserialize(bytes: Array[Byte]): Array[UTF8String] = {
    val buf = new Array[UTF8String](1)
    if (bytes.nonEmpty)
      buf(0) = UTF8String.fromBytes(bytes, 1, bytes.length - 1)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): StrExtremaAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StrExtremaAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): StrExtremaAgg = copy(child = cs.head)
  override def prettyName: String = if (isMin) "str_min" else "str_max"
}

object StrExtremaAgg {
  /** Exact min over strings, ObjectHashAggregate-planned. */
  def str_min(c: Column): Column =
    GraftBridge.column(
      StrExtremaAgg(GraftBridge.expression(c), isMin = true)
        .toAggregateExpression())

  /** Exact max over strings, ObjectHashAggregate-planned. */
  def str_max(c: Column): Column =
    GraftBridge.column(
      StrExtremaAgg(GraftBridge.expression(c), isMin = false)
        .toAggregateExpression())

  def register(spark: SparkSession): Unit = {
    GraftBridge.registerFunction(spark, "str_min", exprs =>
      StrExtremaAgg(exprs.head, isMin = true).toAggregateExpression())
    GraftBridge.registerFunction(spark, "str_max", exprs =>
      StrExtremaAgg(exprs.head, isMin = false).toAggregateExpression())
  }
}
