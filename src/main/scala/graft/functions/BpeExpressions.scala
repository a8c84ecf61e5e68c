package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime BPE application over a trained merge table.
  *
  * The Column-algebra encoder builds ONE nested expression layer per
  * merge (`merges.foldLeft(chars)(applyMerge)`), which plans fine at
  * toy budgets but is unplannable at a real tokenizer's 32k–50k
  * merges — the expression tree itself blows the constant-pool /
  * 64KB-method codegen limits long before any data flows. This codec
  * is the same leftmost-non-overlapping fold executed as a RUNTIME
  * loop: the ranked merge table rides the (one) plan node as a
  * reference object, so the plan is a single projection at any merge
  * budget. Property-locked bit-identical to the kept composed
  * reference ([[graft.operators.TextAnalysis.bpeEncodeStatsComposed]])
  * in BpeSpec — the [[TokenOps]] composed-reference discipline.
  *
  * Exactness of the candidate prune: every symbol is a CONTIGUOUS
  * substring of the original word, so a merge (l, r) can only ever
  * fuse if l+r occurs as a contiguous character window of the word.
  * Per word the codec therefore looks up every character window (≤
  * len × maxMergedChars of them, independent of the merge budget) in
  * the merged-string table and runs the sequential per-rank passes
  * ONLY for those candidate ranks, in ascending rank order — skipped
  * ranks are provably identity passes, so the result equals the full
  * sequential fold bit-for-bit (string-equal merge products from
  * distinct merge paths keep a rank LIST, preserving fold order even
  * under collisions).
  */
final class BpeCodec(lefts: Array[String], rights: Array[String])
    extends Serializable {
  private val n = lefts.length

  @transient private lazy val leftU: Array[UTF8String] =
    lefts.map(UTF8String.fromString)
  @transient private lazy val rightU: Array[UTF8String] =
    rights.map(UTF8String.fromString)

  /** merged string → ASCENDING ranks whose l+r equals it. */
  @transient private lazy val byMerged
      : java.util.HashMap[UTF8String, Array[Int]] = {
    val tmp =
      new java.util.HashMap[UTF8String, java.util.ArrayList[Integer]]()
    var i = 0
    while (i < n) {
      val m = UTF8String.concat(leftU(i), rightU(i))
      var l = tmp.get(m)
      if (l == null) { l = new java.util.ArrayList[Integer](); tmp.put(m, l) }
      l.add(i)
      i += 1
    }
    val out = new java.util.HashMap[UTF8String, Array[Int]](
      tmp.size() * 2 + 1)
    tmp.forEach { (k, v) =>
      val a = new Array[Int](v.size())
      var j = 0
      while (j < a.length) { a(j) = v.get(j); j += 1 }
      out.put(k, a)
    }
    out
  }

  /** Longest merged string in characters — bounds the window scan. */
  @transient private lazy val maxMergedChars: Int = {
    var m = 0
    val it = byMerged.keySet().iterator()
    while (it.hasNext) m = math.max(m, it.next().numChars())
    m
  }

  /** Symbol count of `word` after applying every applicable merge in
    * rank order, leftmost-non-overlapping per pass — the
    * [[graft.operators.TextAnalysis]] fold semantics.
    */
  def encodedLen(word: UTF8String): Int = {
    val bytes = word.getBytes
    if (bytes.length == 0) return 0
    // split into code-point symbols (the fold's substr(i, 1) unit)
    var count = 0
    var i = 0
    while (i < bytes.length) {
      i += UTF8String.numBytesForFirstByte(bytes(i)); count += 1
    }
    if (count == 1 || n == 0) return count
    val chars = new Array[UTF8String](count)
    val offs = new Array[Int](count + 1)
    i = 0; var c = 0
    while (i < bytes.length) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i)); c += 1
    }
    offs(count) = bytes.length
    c = 0
    while (c < count) {
      chars(c) = UTF8String.fromBytes(bytes, offs(c),
        offs(c + 1) - offs(c))
      c += 1
    }
    // candidate ranks: merges whose merged string is a character
    // window of the word (cost independent of the merge budget)
    var cand: Array[Int] = null
    var candLen = 0
    val maxW = math.min(maxMergedChars, count)
    var s = 0
    while (s < count) {
      var e = s + 2 // windows of ≥ 2 chars (a merge product has both)
      while (e <= count && e - s <= maxW) {
        val ranks = byMerged.get(UTF8String.fromBytes(bytes, offs(s),
          offs(e) - offs(s)))
        if (ranks != null) {
          var j = 0
          while (j < ranks.length) {
            if (cand == null) cand = new Array[Int](8)
            else if (candLen == cand.length)
              cand = java.util.Arrays.copyOf(cand, cand.length * 2)
            cand(candLen) = ranks(j); candLen += 1
            j += 1
          }
        }
        e += 1
      }
      s += 1
    }
    if (candLen == 0) return count
    java.util.Arrays.sort(cand, 0, candLen)
    // sequential leftmost-non-overlapping pass per candidate rank
    var syms = chars
    var len = count
    var k = 0
    var prevRank = -1
    while (k < candLen && len > 1) {
      val r = cand(k)
      if (r != prevRank) { // dedupe after the sort
        prevRank = r
        val l = leftU(r); val rr = rightU(r)
        var m = 1
        var t = 1
        while (t < len) {
          val x = syms(t)
          if (syms(m - 1).equals(l) && x.equals(rr))
            syms(m - 1) = UTF8String.concat(l, rr)
          else { syms(m) = x; m += 1 }
          t += 1
        }
        len = m
      }
      k += 1
    }
    len
  }

  /** Σ encodedLen over the word array (null words contribute 0 —
    * the tokenizer never emits them).
    */
  def totalTokens(words: ArrayData): Long = {
    val m = words.numElements()
    var sum = 0L
    var i = 0
    while (i < m) {
      if (!words.isNullAt(i)) sum += encodedLen(words.getUTF8String(i))
      i += 1
    }
    sum
  }
}

/** bpe_token_count(array<string>) → BIGINT: total symbols after
  * applying the baked ranked merge table to every word — ONE plan
  * node at any merge budget (the trained table rides as a reference
  * object, not as nested expression layers).
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  @transient private lazy val codec =
    new BpeCodec(merges.map(_._1).toArray, merges.map(_._2).toArray)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_token_count requires ARRAY<STRING>, got $other")
    }
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    codec.totalTokens(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codec", codec,
      "graft.functions.BpeCodec")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.totalTokens($c);")
  }
  override protected def withNewChildInternal(c: Expression)
      : BpeTokenCount = copy(c)
  override def prettyName: String = "bpe_token_count"
}

/** Column API. */
object BpeFunctions {
  def bpe_token_count(c: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeTokenCount(GraftBridge.expression(c), merges))
}
