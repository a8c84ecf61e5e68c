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

/** Codegen helper for [[LangIdTokens]]: ONE pass over the token
  * array scoring every language profile at once.
  *
  * The Column-algebra formulation (one `filter(toks, isin(words))`
  * per language) rescans the array per language — 4 profiles × 10
  * stopwords = 40 UTF8String comparisons per token. Here each token
  * is one hash lookup in a static word→profiles table, and the
  * argmax / tie-break reproduces `array_max` over
  * `struct(score, lang)` exactly: max hits wins, ties go to the
  * lexicographically greatest language name (profile names are
  * scored in sorted order), zero hits → "und".
  */
object LangIdOps {
  private val langs: Array[String] =
    graft.operators.TextAnalysis.LangProfiles.keys.toArray.sorted
  private val langU: Array[UTF8String] = langs.map(UTF8String.fromString)
  private val Und = UTF8String.fromString("und")
  private val lookup: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    for ((lang, i) <- langs.zipWithIndex;
        w <- graft.operators.TextAnalysis.LangProfiles(lang)) {
      val k = UTF8String.fromString(w)
      val prev = m.get(k)
      m.put(k, if (prev == null) Array(i) else prev :+ i)
    }
    m
  }

  def langId(toks: ArrayData): UTF8String = {
    val n = toks.numElements()
    val hits = new Array[Int](langs.length)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val ls = lookup.get(toks.getUTF8String(i))
        if (ls != null) {
          var j = 0
          while (j < ls.length) { hits(ls(j)) += 1; j += 1 }
        }
      }
      i += 1
    }
    // ascending scan with >= : equal hit counts resolve to the later
    // (lexicographically greater) language, matching array_max over
    // struct(score DESC, lang DESC)
    var best = -1
    var bestHits = 0
    var k = 0
    while (k < hits.length) {
      if (hits(k) > 0 && hits(k) >= bestHits) { best = k; bestHits = hits(k) }
      k += 1
    }
    if (best < 0) Und else langU(best)
  }
}

/** lang_id_tokens(array<string>) → STRING: [[LangIdOps]]'s single-pass
  * stopword-profile argmax ("und" when no profile scores).
  */
case class LangIdTokens(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lang_id_tokens requires ARRAY<STRING>, got $other")
    }
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    LangIdOps.langId(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.LangIdOps.langId($c);"
    })
  override protected def withNewChildInternal(c: Expression): LangIdTokens =
    copy(c)
  override def prettyName: String = "lang_id_tokens"
}

/** Column API + SQL registration for the text expressions. */
object TextFunctions {
  private def col(e: Expression): Column = GraftBridge.column(e)
  private def ex(c: Column): Expression = GraftBridge.expression(c)

  def char_ngrams(c: Column, k: Int, distinct: Boolean = false): Column =
    col(CharNgrams(ex(c), k, distinct))

  /** NULL token arrays identify as "und", matching the composed
    * Column formulation (where every per-language score nulls out to
    * 0.0 and the `best.score > 0` gate falls through).
    */
  def lang_id_tokens(c: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    coalesce(col(LangIdTokens(ex(c))), lit("und"))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
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
    GraftBridge.registerFunction(spark, "lang_id_tokens", { es =>
      if (es.length != 1)
        throw new IllegalArgumentException(
          s"lang_id_tokens(toks) takes 1 argument, got ${es.length}")
      // same null semantics as the Scala Column API (lang_id_tokens
      // above): a NULL token array is 'und', not NULL — the two
      // surfaces must agree
      Coalesce(Seq(LangIdTokens(es.head), Literal("und")))
    })
  }
}
