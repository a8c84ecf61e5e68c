package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Golden + property tests for the pure IP math, mirroring the
  * reference's test strategy (iputils_test.go: golden fixtures +
  * cidr→range→cidr round trips over a corpus).
  */
class IpMathSpec extends AnyFunSuite {
  import IpMath._

  private def p(s: String): Array[Byte] = {
    val r = parseIp(s)
    assert(r != null, s"parseIp($s) returned null")
    r
  }

  test("parse + format round-trips canonical text") {
    for (s <- Seq("1.0.0.0", "255.255.255.255", "10.0.0.1",
        "2001:db8::1", "::", "::1", "fe80::1:2:3:4", "2002:101:202::"))
      assert(formatIp(p(s)) == s)
  }

  test("v4 parses to v4-mapped 16 bytes") {
    val b = p("1.2.3.4")
    assert(b.length == 16 && isV4Mapped(b) && family(b) == 4)
    assert(b.slice(12, 16).toSeq == Seq[Byte](1, 2, 3, 4))
  }

  test("v4-mapped text form formats as dotted quad (Go parity)") {
    assert(formatIp(p("::ffff:1.2.3.4")) == "1.2.3.4")
  }

  test("invalid inputs → null") {
    for (s <- Seq("", "1.2.3", "1.2.3.4.5", "1.2.3.256", "hello",
        "1:2:3:4:5:6:7:8:9", "::1::2", "2001:zz::", null))
      assert(parseIp(s) == null, s"parseIp($s)")
  }

  test("cidrToRange basic blocks (rangeCIDR parity)") {
    val (lo, hi) = cidrToRange("1.0.0.0/24")
    assert(formatIp(lo) == "1.0.0.0" && formatIp(hi) == "1.0.0.255")
    val (lo2, hi2) = cidrToRange("1.0.0.2/26")
    // lo is the literal address, not the masked network (iputils.go:270-276)
    assert(formatIp(lo2) == "1.0.0.2" && formatIp(hi2) == "1.0.0.63")
    val (lo3, hi3) = cidrToRange("2001:db8::/32")
    assert(formatIp(lo3) == "2001:db8::")
    assert(formatIp(hi3) == "2001:db8:ffff:ffff:ffff:ffff:ffff:ffff")
  }

  test("cidrToRange invalid → null") {
    for (s <- Seq("1.0.0.0", "1.0.0.0/33", "2001::/129", "x/24", "1.0.0.0/",
        "1.0.0.0/ 24", null))
      assert(cidrToRange(s) == null, s"cidrToRange($s)")
  }

  test("rangeToCidr golden (CIDRRange parity)") {
    assert(rangeToCidr(p("1.0.0.0"), p("1.0.0.255")) == "1.0.0.0/24")
    assert(rangeToCidr(p("1.0.0.0"), p("1.0.0.0")) == "1.0.0.0/32")
    val (lo, hi) = cidrToRange("2001:db8::/32")
    assert(rangeToCidr(lo, hi) == "2001:db8::/32")
  }

  test("ipAdd carry and borrow (plusOne/minusOne parity)") {
    assert(formatIp(ipAdd(p("1.0.0.255"), 1)) == "1.0.1.0")
    assert(formatIp(ipAdd(p("1.0.1.0"), -1)) == "1.0.0.255")
    assert(formatIp(ipAdd(p("1.255.255.255"), 1)) == "2.0.0.0")
    assert(formatIp(ipAdd(p("::ffff:ffff"), 1)) == "::1:0:0")
    assert(formatIp(ipAdd(p("1.0.0.0"), 256)) == "1.0.1.0")
  }

  test("maskCidr /26 v4, /64 v6 (site.go parity)") {
    assert(maskCidr(p("192.168.1.77"), 26, 64) == "192.168.1.64/26")
    assert(maskCidr(p("192.168.1.10"), 26, 64) == "192.168.1.0/26")
    assert(maskCidr(p("2001:db8:1:2:3:4:5:6"), 26, 64) == "2001:db8:1:2::/64")
  }

  test("ip6to4 extracts embedded v4 only inside 2002::/16") {
    assert(ip6to4("2002:101:202::") == "1.1.2.2")
    assert(ip6to4("2002:c000:0204::") == "192.0.2.4")
    assert(ip6to4("2001:db8::1") == null)
    assert(ip6to4("1.2.3.4") == null)
    assert(ip6to4("junk") == null)
  }

  test("compare is unsigned bytewise (bytes.Compare parity)") {
    assert(compare(p("9.0.0.0"), p("128.0.0.0")) < 0)
    assert(compare(p("128.0.0.0"), p("9.0.0.0")) > 0)
    assert(compare(p("1.2.3.4"), p("1.2.3.4")) == 0)
    // v4-mapped addresses live in ::ffff:0:0/96, below 2000::/3 v6 space
    assert(compare(p("2001:db8::"), p("0.0.0.0")) > 0)
    assert(compare(p("::1"), p("0.0.0.0")) < 0)
  }

  private def maskBytes(b: Array[Byte], len: Int): Array[Byte] = {
    val out = b.clone()
    var i = 0
    while (i < 16) { // zero host bits so the block is CIDR-aligned
      val maskByte =
        if (len >= 8 * (i + 1)) 0xff
        else if (len <= 8 * i) 0x00
        else 0xff << (8 * (i + 1) - len) & 0xff
      out(i) = (out(i) & maskByte).toByte
      i += 1
    }
    out
  }

  test("property: cidr → range → cidr identity (v4 corpus, seed 42)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 1000) {
      val ip = rnd.nextLong() & 0xffffffffL
      val len = rnd.nextInt(33)
      val masked = if (len == 0) 0L else ip & (-1L << (32 - len)) & 0xffffffffL
      val q = Array(24, 16, 8, 0).map(sh => (masked >> sh) & 0xff)
      val cidr = s"${q(0)}.${q(1)}.${q(2)}.${q(3)}/$len"
      val r = cidrToRange(cidr)
      assert(r != null, cidr)
      assert(rangeToCidr(r._1, r._2) == cidr, cidr)
    }
  }

  test("property: cidr → range → cidr identity (v6 corpus, seed 42)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 1000) {
      val b = Array.fill(16)(rnd.nextInt(256).toByte)
      val len = rnd.nextInt(129)
      val base = maskBytes(b, len)
      if (!isV4Mapped(base)) {
        val cidr = s"${formatIp(base)}/$len"
        val r = cidrToRange(cidr)
        assert(r != null, cidr)
        assert(rangeToCidr(r._1, r._2) == cidr, cidr)
      }
    }
  }

  test("property: parse → format → parse identity (seed 42)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 1000) {
      val b = Array.fill(16)(rnd.nextInt(256).toByte)
      val b2 = parseIp(formatIp(b))
      assert(b2 != null && b2.toSeq == b.toSeq, formatIp(b))
    }
  }

  test("property: rangeToCidrs is an exact minimal cover (seed 42)") {
    val rnd = new scala.util.Random(42)
    def toBytes(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    for (iter <- 1 to 1000) {
      val a = rnd.nextLong() & 0xffffffffL
      val b = rnd.nextLong() & 0xffffffffL
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val blocks = rangeToCidrs(toBytes(lo), toBytes(hi))
      assert(blocks.size <= 62, s"iter $iter")
      var cursor = lo
      blocks.foreach { case (addr, len) =>
        val base = addr.foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xff))
        val size = 1L << (32 - len)
        assert(base == cursor, s"iter $iter: gap or overlap at /$len")
        assert(base % size == 0, s"iter $iter: unaligned /$len")
        cursor = base + size
      }
      assert(cursor == hi + 1, s"iter $iter: cover ends at $cursor")
    }
    // degenerate cases: single address and the full space
    val single = rangeToCidrs(toBytes(7), toBytes(7))
    assert(single.map(_._2) == Seq(32) &&
      single.head._1.toSeq == toBytes(7).toSeq)
    assert(rangeToCidrs(toBytes(0), toBytes(0xffffffffL)).map(_._2) ==
      Seq(0))
  }
}
