package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions.{coalesce, lit, split, substring_index}

/** Public Column API over the IP expression family (SURVEY §2.2
  * P1–P7), plus SQL registration so every function is usable from
  * `spark.sql`.
  */
object IpFunctions {
  private def col(e: Expression): Column = GraftBridge.column(e)
  private def ex(c: Column): Expression = GraftBridge.expression(c)

  def ip_to_bin(c: Column): Column = col(IpToBin(ex(c)))
  def ip_format(c: Column): Column = col(IpFormat(ex(c)))
  def cidr_lo(c: Column): Column = col(CidrLo(ex(c)))
  def cidr_hi(c: Column): Column = col(CidrHi(ex(c)))
  def range_to_cidr(lo: Column, hi: Column): Column =
    col(RangeToCidr(ex(lo), ex(hi)))
  def ip_add(c: Column, delta: Column): Column = col(IpAdd(ex(c), ex(delta)))
  def ip_plus_one(c: Column): Column = ip_add(c, lit(1L))
  def ip_minus_one(c: Column): Column = ip_add(c, lit(-1L))
  def ip_mask_cidr(c: Column, v4Len: Int = 26, v6Len: Int = 64): Column =
    col(IpMaskCidr(ex(c), ex(lit(v4Len)), ex(lit(v6Len))))
  def ip_mask_cidr(c: Column, v4Len: Column, v6Len: Column): Column =
    col(IpMaskCidr(ex(c), ex(v4Len), ex(v6Len)))

  /** Canonicalize a CIDR string the way `net.ParseCIDR → .String()`
    * does: parse the address, mask host bits by the entry's OWN
    * prefix length, re-format. "10.0.0.90/26" → "10.0.0.64/26",
    * uppercase/uncompressed v6 → compressed lowercase; NULL for
    * malformed input. Formatting is normalized but the prefix length
    * is preserved — a /28 entry stays /28.
    */
  def cidr_canonical(c: Column): Column = {
    val len = split(c, "/").getItem(1).cast("int")
    ip_mask_cidr(ip_to_bin(substring_index(c, "/", 1)), len, len)
  }
  def ip6to4(c: Column): Column = col(Ip6to4(ex(c)))
  def ip_family(c: Column): Column = col(IpFamily(ex(c)))
  def long_to_bin(c: Column): Column = col(LongToBin(ex(c)))

  /** 6to4 rewrite as applied to request IPs (handler.go:211-214):
    * 2002::/16 addresses are replaced by their embedded v4, all
    * others pass through.
    */
  def rewrite6to4(ipStr: Column): Column = coalesce(ip6to4(ipStr), ipStr)

  /** Register all IP functions for SQL use on this session. */
  def register(spark: SparkSession): Unit = {
    def one(name: String, f: Seq[Expression] => Expression): Unit =
      GraftBridge.registerFunction(spark, name, f)
    one("ip_to_bin", e => IpToBin(e.head))
    one("ip_format", e => IpFormat(e.head))
    one("cidr_lo", e => CidrLo(e.head))
    one("cidr_hi", e => CidrHi(e.head))
    one("range_to_cidr", e => RangeToCidr(e(0), e(1)))
    one("ip_add", e => IpAdd(e(0), e(1)))
    one("ip_mask_cidr", e => IpMaskCidr(e(0), e(1), e(2)))
    one("ip6to4", e => Ip6to4(e.head))
    one("ip_family", e => IpFamily(e.head))
    one("long_to_bin", e => LongToBin(e.head))
  }
}
