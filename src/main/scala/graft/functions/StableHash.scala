package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** The engine's one cross-engine-stable string→integer hash: the
  * first 15 hex chars of md5 as a 60-bit BIGINT, identically
  * computable in DuckDB as
  * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
  *
  * Every operator whose output must agree with an external oracle
  * (deterministic sampling, train/val/test splits, the sketch-query
  * md5 cores) derives from THIS definition — changing the width or
  * construction in one caller and not the others would silently
  * break oracle parity, so there is exactly one copy.
  *
  * The Column API compiles to [[Md5Int60]], a codegen expression that
  * takes the top 60 bits straight off the digest bytes — no hex
  * string, no substring, no conv parse — bit-identical to the
  * composed-functions definition (property-locked in
  * TextExpressionsSpec) and markedly cheaper on exploded hot paths
  * (one hash per bigram/shingle in dedup, sampling, DSIR).
  */
object StableHash {
  def md5Int60(c: Column): Column =
    GraftBridge.column(Md5Int60(
      GraftBridge.expression(c.cast("binary"))))

  /** The reference definition the expression must match; kept for the
    * parity spec and for documentation of the DuckDB contract.
    */
  def md5Int60Composed(c: Column): Column = {
    import org.apache.spark.sql.functions._
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
  }
}

/** Static, Java-callable digest helper for [[Md5Int60]]'s generated
  * code. MessageDigest instances are thread-local: codegen invokes
  * this once per row from many task threads.
  */
object Md5Ops {
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(bytes) — the value of the first 15 lowercase
    * hex chars parsed base-16: bytes 0..6 whole (56 bits) then the
    * high nibble of byte 7. Always non-negative (60 < 63 bits).
    */
  def int60(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xffL) >>> 4)
  }
}

/** md5_int60(binary) → BIGINT: [[StableHash]]'s 60-bit md5 prefix as
  * a single codegen expression.
  */
case class Md5Int60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_int60 requires a BINARY argument, got ${child.dataType}")
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Md5Ops.int60(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Ops.int60($c)")

  override protected def withNewChildInternal(c: Expression): Md5Int60 =
    copy(c)
  override def prettyName: String = "md5_int60"
}
