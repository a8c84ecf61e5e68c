package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for dedup/linkage preprocessing: the same
  * text arrives from crawls in composed (é) and decomposed (e +
  * U+0301) forms — byte-level dedup misses those unless keys are
  * NFC/NFKC-normalized first, and accent folding is the standard
  * extra step before fuzzy matching. Spark SQL has no built-in for
  * either; these are codegen scalar expressions over the JDK
  * normalizer (no UDF, no Python).
  */
object TextNorm {
  /** Canonical composition (NFC). */
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      Normalizer.normalize(s.toString, Normalizer.Form.NFC))

  /** Compatibility composition (NFKC — also folds ligatures, full-
    * width forms, superscripts).
    */
  def nfkc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      Normalizer.normalize(s.toString, Normalizer.Form.NFKC))

  /** Accent folding: canonical-decompose, drop combining marks
    * (Unicode category M) — é→e, ñ→n, Ü→U; matches DuckDB's
    * `strip_accents` on latin text.
    */
  def stripAccents(s: UTF8String): UTF8String = {
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      val t = Character.getType(c)
      if (t != Character.NON_SPACING_MARK &&
        t != Character.COMBINING_SPACING_MARK &&
        t != Character.ENCLOSING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Shared shape for the three string→string normalizers. */
abstract class TextNormExpression extends UnaryExpression {
  /** Static method name on [[TextNorm]] the codegen calls. */
  protected def method: String
  override def dataType: DataType = StringType
  override protected def nullSafeEval(s: Any): Any = s match {
    case u: UTF8String => call(u)
    case _ => null
  }
  protected def call(u: UTF8String): UTF8String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNorm.$method($c);")
}

case class NfcNormalize(child: Expression) extends TextNormExpression {
  override protected def method: String = "nfc"
  override protected def call(u: UTF8String): UTF8String = TextNorm.nfc(u)
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

case class NfkcNormalize(child: Expression) extends TextNormExpression {
  override protected def method: String = "nfkc"
  override protected def call(u: UTF8String): UTF8String = TextNorm.nfkc(u)
  override protected def withNewChildInternal(c: Expression): NfkcNormalize =
    copy(child = c)
  override def prettyName: String = "nfkc_normalize"
}

case class StripAccents(child: Expression) extends TextNormExpression {
  override protected def method: String = "stripAccents"
  override protected def call(u: UTF8String): UTF8String =
    TextNorm.stripAccents(u)
  override protected def withNewChildInternal(c: Expression): StripAccents =
    copy(child = c)
  override def prettyName: String = "strip_accents"
}

/** Column API. */
object TextNormFunctions {
  private def ex(c: Column): Expression = GraftBridge.expression(c)
  def nfc_normalize(c: Column): Column =
    GraftBridge.column(NfcNormalize(ex(c)))
  def nfkc_normalize(c: Column): Column =
    GraftBridge.column(NfkcNormalize(ex(c)))
  def strip_accents(c: Column): Column =
    GraftBridge.column(StripAccents(ex(c)))
}
