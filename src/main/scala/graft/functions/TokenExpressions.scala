package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen helpers for the token-statistics expression family.
  *
  * The Column-algebra formulations walk interpreted lambda chains —
  * and the per-distinct-token ones ([[TopTokenFraction]],
  * [[TokenEntropy]]) are O(distinct × tokens) PER ROW, which turns a
  * single 100k-token document into ~10⁹ comparisons. These helpers
  * are one-pass (hash-counted) primitive loops, each property-locked
  * bit-identical to its kept composed reference (TokenExpressionsSpec
  * / the TextAnalysis parity tests) on the null-free token arrays the
  * operators produce.
  */
object TokenOps {

  /** Java regex `\s` (the tokenizer's separator class): ASCII-only,
    * so a byte-level scan is UTF-8-safe (multibyte chars never match).
    */
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' ||
      b == '\r'

  /** One pass over the raw string: (n_tokens, sum of token codepoint
    * lengths, tokens ∈ `words`) — the fused core of tokenCount /
    * meanTokenLen / wordHitRatio.
    */
  def tokenStats(s: UTF8String,
      words: java.util.HashSet[UTF8String]): GenericInternalRow = {
    val bytes = s.getBytes
    var nTokens = 0
    var sumChars = 0L
    var hits = 0
    var i = 0
    while (i < bytes.length) {
      if (isWs(bytes(i))) i += 1
      else {
        val start = i
        var chars = 0L
        while (i < bytes.length && !isWs(bytes(i))) {
          chars += 1
          i += UTF8String.numBytesForFirstByte(bytes(i))
        }
        nTokens += 1
        sumChars += chars
        if (!words.isEmpty &&
            words.contains(UTF8String.fromBytes(bytes, start, i - start)))
          hits += 1
      }
    }
    new GenericInternalRow(Array[Any](nTokens, sumChars, hits))
  }

  private def tokenArray(toks: ArrayData): Array[UTF8String] = {
    val n = toks.numElements()
    val out = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      out(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    out
  }

  /** max token count / total tokens (0.0 when empty) — hash-counted
    * instead of the composed O(distinct × tokens) rescan.
    */
  def topTokenFraction(toks: ArrayData): Double = {
    val ts = tokenArray(toks)
    if (ts.isEmpty) return 0.0
    val counts = new java.util.HashMap[UTF8String, Int]()
    var max = 0
    var i = 0
    while (i < ts.length) {
      if (ts(i) != null) {
        val c = counts.merge(ts(i), 1, (a, b) => a + b)
        if (c > max) max = c
      }
      i += 1
    }
    max.toDouble / ts.length.toDouble
  }

  /** 1 − distinct/total over word n-grams (0.0 when no complete
    * n-gram), gram identity = tokens joined with one space exactly
    * like the composed `concat_ws`.
    */
  def dupNgramFraction(toks: ArrayData, n: Int): Double = {
    val ts = tokenArray(toks)
    val m = ts.length - (n - 1)
    if (m <= 0) return 0.0
    val sep = UTF8String.fromString(" ")
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      System.arraycopy(ts, i, parts, 0, n)
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    (m - seen.size).toDouble / m.toDouble
  }

  /** Shannon entropy in bits/token, summed over the SORTED distinct
    * tokens with the composed chain's exact double sequence
    * (p·(ln p / ln 2) terms, left-to-right fold, final negation) —
    * bit-for-bit oracle-reproducible.
    */
  def tokenEntropy(toks: ArrayData): Double = {
    val ts = tokenArray(toks)
    if (ts.isEmpty) return 0.0
    val counts = new java.util.TreeMap[UTF8String, Int]()
    var i = 0
    while (i < ts.length) {
      if (ts(i) != null) counts.merge(ts(i), 1, (a, b) => a + b)
      i += 1
    }
    val n = ts.length.toDouble
    // StrictMath, not Math: Spark's Log expression evaluates through
    // StrictMath.log, and the two can differ in the last ulp — the
    // oracle contract is bit-exact
    val ln2 = StrictMath.log(2.0)
    var sum = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      sum += p * (StrictMath.log(p) / ln2)
    }
    0.0 - sum
  }
}

/** token_stats(str) → STRUCT<n_tokens INT, sum_chars BIGINT,
  * hits INT> over the `\s+` tokenizer, hits counted against the
  * baked word set.
  */
case class TokenStats(child: Expression, words: Seq[String])
    extends UnaryExpression {
  private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_stats requires a STRING argument, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_chars", LongType, nullable = false),
    StructField("hits", IntegerType, nullable = false)))
  override protected def nullSafeEval(v: Any): Any =
    TokenOps.tokenStats(v.asInstanceOf[UTF8String], wordSet)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("words", wordSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenOps.tokenStats($c, $ref);")
  }
  override protected def withNewChildInternal(c: Expression): TokenStats =
    copy(c)
  override def prettyName: String = "token_stats"
}

/** Shared base for the ARRAY<STRING> → DOUBLE token signals. */
abstract class TokenArrayDoubleExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRING>, got $other")
    }
  override def dataType: DataType = DoubleType
}

/** top_token_fraction(array<string>) → DOUBLE. */
case class TopTokenFraction(child: Expression)
    extends TokenArrayDoubleExpression {
  override protected def nullSafeEval(v: Any): Any =
    TokenOps.topTokenFraction(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenOps.topTokenFraction($c);")
  override protected def withNewChildInternal(c: Expression)
      : TopTokenFraction = copy(c)
  override def prettyName: String = "top_token_fraction"
}

/** dup_ngram_fraction(array<string>) → DOUBLE for baked n. */
case class DupNgramFraction(child: Expression, n: Int)
    extends TokenArrayDoubleExpression {
  require(n >= 1, s"dup_ngram_fraction: n must be positive, got $n")
  override protected def nullSafeEval(v: Any): Any =
    TokenOps.dupNgramFraction(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenOps.dupNgramFraction($c, $n);")
  override protected def withNewChildInternal(c: Expression)
      : DupNgramFraction = copy(c)
  override def prettyName: String = "dup_ngram_fraction"
}

/** token_entropy(array<string>) → DOUBLE bits/token. */
case class TokenEntropy(child: Expression)
    extends TokenArrayDoubleExpression {
  override protected def nullSafeEval(v: Any): Any =
    TokenOps.tokenEntropy(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenOps.tokenEntropy($c);")
  override protected def withNewChildInternal(c: Expression)
      : TokenEntropy = copy(c)
  override def prettyName: String = "token_entropy"
}

/** Column API. The double signals coalesce a NULL input to 0.0,
  * matching the composed formulations' when/otherwise collapse.
  */
object TokenFunctions {
  import org.apache.spark.sql.functions.{coalesce, lit}
  private def col(e: Expression): Column = GraftBridge.column(e)
  private def ex(c: Column): Expression = GraftBridge.expression(c)

  def token_stats(c: Column, words: Seq[String] = Nil): Column =
    col(TokenStats(ex(c), words))
  def top_token_fraction(c: Column): Column =
    coalesce(col(TopTokenFraction(ex(c))), lit(0.0))
  def dup_ngram_fraction(c: Column, n: Int): Column =
    coalesce(col(DupNgramFraction(ex(c), n)), lit(0.0))
  def token_entropy(c: Column): Column =
    coalesce(col(TokenEntropy(ex(c))), lit(0.0))
}
