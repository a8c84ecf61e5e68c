package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen bridge: static, Java-callable wrappers over [[IpMath]]
  * working in Catalyst-native types (UTF8String / byte[]). Generated
  * code calls these directly, so the expressions stay inside
  * whole-stage codegen with one virtual-call-free helper each.
  */
object IpOps {
  def ipToBin(s: UTF8String): Array[Byte] = IpMath.parseIp(s.toString)
  def ipFormat(b: Array[Byte]): UTF8String = {
    val r = IpMath.formatIp(b)
    if (r == null) null else UTF8String.fromString(r)
  }
  def cidrLo(s: UTF8String): Array[Byte] = {
    val r = IpMath.cidrToRange(s.toString)
    if (r == null) null else r._1
  }
  def cidrHi(s: UTF8String): Array[Byte] = {
    val r = IpMath.cidrToRange(s.toString)
    if (r == null) null else r._2
  }
  def rangeToCidr(lo: Array[Byte], hi: Array[Byte]): UTF8String = {
    val r = IpMath.rangeToCidr(lo, hi)
    if (r == null) null else UTF8String.fromString(r)
  }
  def ipAdd(b: Array[Byte], d: Long): Array[Byte] = IpMath.ipAdd(b, d)
  def maskCidr(b: Array[Byte], v4Len: Int, v6Len: Int): UTF8String = {
    val r = IpMath.maskCidr(b, v4Len, v6Len)
    if (r == null) null else UTF8String.fromString(r)
  }
  def ip6to4(s: UTF8String): UTF8String = {
    val r = IpMath.ip6to4(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  def family(b: Array[Byte]): Int = IpMath.family(b)
  def longToBin(v: Long): Array[Byte] = {
    val x = v ^ java.lang.Long.MIN_VALUE // flip sign bit
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = (x >>> (56 - 8 * i)).toByte; i += 1 }
    out
  }
}

/** Base for unary IP expressions: child-null-safe, result-nullable
  * (invalid input → NULL), codegen via a static [[IpOps]] call.
  */
abstract class IpUnaryExpression extends UnaryExpression {
  /** simple name of the IpOps method implementing this expression */
  def op: String

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.IpOps.$op($c);
         |${ev.isNull} = (${ev.value} == null);
         |if (${ev.isNull}) { ${ev.value} = ${CodeGenerator.defaultValue(dataType)}; }
       """.stripMargin
    })
}

/** ip_to_bin(str) → BINARY(16) canonical v6-mapped; NULL on invalid
  * (P1, iputils.go:96-108).
  */
case class IpToBin(child: Expression) extends IpUnaryExpression {
  override def dataType: DataType = BinaryType
  override def op = "ipToBin"
  override protected def nullSafeEval(v: Any): Any =
    IpOps.ipToBin(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): IpToBin = copy(c)
  override def prettyName: String = "ip_to_bin"
}

/** ip_format(bin) → canonical string (Go net.IP.String parity). */
case class IpFormat(child: Expression) extends IpUnaryExpression {
  override def dataType: DataType = StringType
  override def op = "ipFormat"
  override protected def nullSafeEval(v: Any): Any =
    IpOps.ipFormat(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): IpFormat = copy(c)
  override def prettyName: String = "ip_format"
}

/** cidr_lo('1.0.0.0/24') → BINARY(16) low bound (P2). */
case class CidrLo(child: Expression) extends IpUnaryExpression {
  override def dataType: DataType = BinaryType
  override def op = "cidrLo"
  override protected def nullSafeEval(v: Any): Any =
    IpOps.cidrLo(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): CidrLo = copy(c)
  override def prettyName: String = "cidr_lo"
}

/** cidr_hi('1.0.0.0/24') → BINARY(16) high bound (P2). */
case class CidrHi(child: Expression) extends IpUnaryExpression {
  override def dataType: DataType = BinaryType
  override def op = "cidrHi"
  override protected def nullSafeEval(v: Any): Any =
    IpOps.cidrHi(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): CidrHi = copy(c)
  override def prettyName: String = "cidr_hi"
}

/** ip6to4('2002:xxyy:zzww::') → 'x.y.z.w'; NULL outside 2002::/16
  * (P6, handler.go:179-190).
  */
case class Ip6to4(child: Expression) extends IpUnaryExpression {
  override def dataType: DataType = StringType
  override def op = "ip6to4"
  override protected def nullSafeEval(v: Any): Any =
    IpOps.ip6to4(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Ip6to4 = copy(c)
  override def prettyName: String = "ip6to4"
}

/** ip_family(bin) → 4 | 6 (family dispatch, geo-ip.go:134-137). */
case class IpFamily(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    IpOps.family(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IpOps.family($c)")
  override protected def withNewChildInternal(c: Expression): IpFamily = copy(c)
  override def prettyName: String = "ip_family"
}

/** range_to_cidr(lo, hi) → 'ip/mask' (P3, iputils.go:295-315). */
case class RangeToCidr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(lo: Any, hi: Any): Any =
    IpOps.rangeToCidr(lo.asInstanceOf[Array[Byte]], hi.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      s"""
         |${ev.value} = graft.functions.IpOps.rangeToCidr($l, $r);
         |${ev.isNull} = (${ev.value} == null);
         |if (${ev.isNull}) { ${ev.value} = ${CodeGenerator.defaultValue(dataType)}; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): RangeToCidr = copy(l, r)
  override def prettyName: String = "range_to_cidr"
}

/** ip_add(bin, delta) → bin ± delta with carry (P4, iputils.go:318-337). */
case class IpAdd(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(b: Any, d: Any): Any =
    IpOps.ipAdd(b.asInstanceOf[Array[Byte]], d.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, d) => {
      s"""
         |${ev.value} = graft.functions.IpOps.ipAdd($b, $d);
         |${ev.isNull} = (${ev.value} == null);
         |if (${ev.isNull}) { ${ev.value} = ${CodeGenerator.defaultValue(dataType)}; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): IpAdd = copy(l, r)
  override def prettyName: String = "ip_add"
}

/** ip_mask_cidr(bin, v4len, v6len) → masked CIDR string (P7,
  * site.go:130-139; site networks are /26 v4, /64 v6).
  */
case class IpMaskCidr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(b: Any, v4: Any, v6: Any): Any =
    IpOps.maskCidr(b.asInstanceOf[Array[Byte]],
      v4.asInstanceOf[Int], v6.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, v4, v6) => {
      s"""
         |${ev.value} = graft.functions.IpOps.maskCidr($b, $v4, $v6);
         |${ev.isNull} = (${ev.value} == null);
         |if (${ev.isNull}) { ${ev.value} = ${CodeGenerator.defaultValue(dataType)}; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): IpMaskCidr = copy(f, s, t)
  override def prettyName: String = "ip_mask_cidr"
}

/** long_to_bin(x) → 8-byte big-endian with the sign bit flipped, so
  * unsigned-lexicographic binary order equals signed long order.
  * Lets any long-keyed table reuse the binary range machinery.
  */
case class LongToBin(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    IpOps.longToBin(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IpOps.longToBin($c)")
  override protected def withNewChildInternal(c: Expression): LongToBin = copy(c)
  override def prettyName: String = "long_to_bin"
}
