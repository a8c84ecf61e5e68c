package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen helper for [[CharNgrams]]: one pass over the UTF-8 bytes.
  *
  * The Column-algebra formulation
  * `transform(sequence(1, n-k+1), i => substr(s, i, k))` is
  * QUADRATIC per document: `substr` is codepoint-indexed, so each
  * call re-scans the string to find its start — the gram explosion
  * (not the hashing) dominated the near-dup pipeline. Here codepoint
  * byte-offsets are collected once and every gram is a byte slice.
  */
object TextOps {
  def charNgrams(s: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    val bytes = s.getBytes
    // codepoint start offsets (+ terminal end offset), single pass
    var count = 0
    var i = 0
    while (i < bytes.length) {
      count += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    val offs = new Array[Int](count + 1)
    i = 0
    var c = 0
    while (i < bytes.length) {
      offs(c) = i; c += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(count) = bytes.length
    // mirror the substr formulation's short-string edge: fewer than
    // k chars (including empty) → one gram holding the whole string
    if (count < k) return new GenericArrayData(Array[Any](s))
    val n = count - k + 1
    if (!distinct) {
      val out = new Array[Any](n)
      var j = 0
      while (j < n) {
        out(j) = UTF8String.fromBytes(bytes, offs(j), offs(j + k) - offs(j))
        j += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new mutable.LinkedHashSet[UTF8String]
      var j = 0
      while (j < n) {
        seen += UTF8String.fromBytes(bytes, offs(j), offs(j + k) - offs(j))
        j += 1
      }
      new GenericArrayData(seen.toArray[Any])
    }
  }
}

/** char_ngrams(str, k, distinct) → ARRAY<STRING> of the k-codepoint
  * character grams, in order (first occurrence when distinct).
  */
case class CharNgrams(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {
  require(k > 0, "char_ngrams: k must be positive")
  // analysis-time type check: registered for SQL, so a wrong-typed
  // argument must fail analysis, not ClassCastException on executors
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_ngrams requires a STRING argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextOps.charNgrams(v.asInstanceOf[UTF8String], k, distinct)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.TextOps.charNgrams($c, $k, $distinct);"
    })
  override protected def withNewChildInternal(c: Expression): CharNgrams =
    copy(c)
  override def prettyName: String = "char_ngrams"
}

/** Column API + SQL registration for the text expressions. */
object TextFunctions {
  private def col(e: Expression): Column = GraftBridge.column(e)
  private def ex(c: Column): Expression = GraftBridge.expression(c)

  def char_ngrams(c: Column, k: Int, distinct: Boolean = false): Column =
    col(CharNgrams(ex(c), k, distinct))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftBridge.registerFunction(spark, "char_ngrams", { es =>
      if (es.length < 2 || es.length > 3)
        throw new IllegalArgumentException(
          s"char_ngrams(str, k[, distinct]) takes 2 or 3 arguments, " +
            s"got ${es.length}")
      val k = es(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"char_ngrams: k must be an integer literal, got $other")
      }
      val distinct = if (es.length > 2) es(2) match {
        case Literal(v: Boolean, BooleanType) => v
        case other => throw new IllegalArgumentException(
          s"char_ngrams: distinct must be a boolean literal, got $other")
      } else false
      CharNgrams(es.head, k, distinct)
    })
}
