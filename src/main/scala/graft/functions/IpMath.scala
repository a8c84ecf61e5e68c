package graft.functions

/** Pure 16-byte IP arithmetic — zero Spark dependencies.
  *
  * Canonical form everywhere: 16 bytes, IPv4 mapped into v6 space
  * (`::ffff:a.b.c.d`), compared bytewise-unsigned. This matches the
  * reference's use of Go `net.IP` + `bytes.Compare`
  * (/root/reference/iputils/iputils.go:111-128,341-343) and makes
  * Spark's unsigned-lexicographic BinaryType ordering semantically
  * exact.
  */
object IpMath {
  /** v4-mapped prefix ::ffff: */
  private[graft] val V4Prefix: Array[Byte] =
    Array[Byte](0, 0, 0, 0, 0, 0, 0, 0, 0, 0, -1, -1)

  def isV4Mapped(b: Array[Byte]): Boolean =
    b.length == 16 && {
      var i = 0
      while (i < 10 && b(i) == 0) i += 1
      i == 10 && b(10) == -1 && b(11) == -1
    }

  /** 4 if v4-mapped, else 6; -1 for malformed length. */
  def family(b: Array[Byte]): Int =
    if (b == null || b.length != 16) -1 else if (isV4Mapped(b)) 4 else 6

  /** Parse dotted-quad or RFC-4291 textual IPv6 into canonical 16
    * bytes; null when unparseable or empty (the caller maps null to
    * its error class, mirroring ErrEmptyIP/ErrInvalidIP at
    * iputils.go:96-108).
    */
  def parseIp(s: String): Array[Byte] = {
    if (s == null || s.isEmpty) return null
    if (s.indexOf(':') < 0) parseV4(s) else parseV6(s)
  }

  private def parseV4(s: String): Array[Byte] = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return null
    val out = new Array[Byte](16)
    System.arraycopy(V4Prefix, 0, out, 0, 12)
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return null
      // Go's net.ParseIP rejects leading zeros in dotted quads since
      // 1.17; we accept them (harmless superset for CSV ingest).
      val v = p.toInt
      if (v > 255) return null
      out(12 + i) = v.toByte
      i += 1
    }
    out
  }

  private def parseV6(s: String): Array[Byte] = {
    // Handle "::" compression and an optional trailing dotted quad.
    var str = s
    var zone = str.indexOf('%')
    if (zone >= 0) str = str.substring(0, zone)
    val dc = str.indexOf("::")
    if (dc >= 0 && str.indexOf("::", dc + 1) >= 0) return null
    val (head, tail) =
      if (dc >= 0) (str.substring(0, dc), str.substring(dc + 2)) else (str, "")
    def groups(part: String): Array[String] =
      if (part.isEmpty) Array.empty else part.split(":", -1)
    val hg = groups(head)
    val tg = groups(tail)
    if (hg.exists(_.isEmpty) || tg.exists(_.isEmpty)) return null
    // expand a possible trailing IPv4 in the last group
    def expand(gs: Array[String]): Array[Int] = {
      if (gs.isEmpty) return Array.empty
      val last = gs.last
      if (last.indexOf('.') >= 0) {
        val v4 = parseV4(last)
        if (v4 == null) return null
        gs.init.map(hex16) ++ Array(
          ((v4(12) & 0xff) << 8) | (v4(13) & 0xff),
          ((v4(14) & 0xff) << 8) | (v4(15) & 0xff))
      } else gs.map(hex16)
    }
    def hex16(g: String): Int = {
      if (g.isEmpty || g.length > 4) return -1
      var v = 0
      var i = 0
      while (i < g.length) {
        val d = Character.digit(g.charAt(i), 16)
        if (d < 0) return -1
        v = (v << 4) | d
        i += 1
      }
      v
    }
    val he = expand(hg)
    val te = expand(tg)
    if (he == null || te == null || he.contains(-1) || te.contains(-1))
      return null
    val total = he.length + te.length
    if (dc < 0 && total != 8) return null
    if (dc >= 0 && total > 7 && !(total == 8 && he.isEmpty && te.isEmpty))
      return null
    val full = he ++ Array.fill(8 - total)(0) ++ te
    if (full.length != 8) return null
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = (full(i) >> 8).toByte
      out(2 * i + 1) = full(i).toByte
      i += 1
    }
    out
  }

  /** Canonical text form, mirroring Go net.IP.String(): dotted quad
    * for v4-mapped, RFC 5952 (lowercase, longest ≥2-group zero run
    * compressed, leftmost on tie) otherwise.
    */
  def formatIp(b: Array[Byte]): String = {
    if (b == null || b.length != 16) return null
    if (isV4Mapped(b))
      return s"${b(12) & 0xff}.${b(13) & 0xff}.${b(14) & 0xff}.${b(15) & 0xff}"
    val g = new Array[Int](8)
    var i = 0
    while (i < 8) {
      g(i) = ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff)
      i += 1
    }
    // find longest run of zeros (length >= 2)
    var bestStart = -1; var bestLen = 0
    var s = -1
    i = 0
    while (i <= 8) {
      if (i < 8 && g(i) == 0) { if (s < 0) s = i }
      else {
        if (s >= 0 && i - s > bestLen && i - s >= 2) {
          bestStart = s; bestLen = i - s
        }
        s = -1
      }
      i += 1
    }
    val sb = new StringBuilder
    i = 0
    while (i < 8) {
      if (i == bestStart) {
        sb.append("::")
        i += bestLen
      } else {
        if (sb.nonEmpty && sb.charAt(sb.length - 1) != ':') sb.append(':')
        sb.append(Integer.toHexString(g(i)))
        i += 1
      }
    }
    if (sb.isEmpty) "::" else sb.toString
  }

  /** "1.0.0.5/24" → (lo=1.0.0.5, hi=1.0.0.255), both canonical 16B.
    * Mirrors rangeCIDR (iputils.go:266-290): lo is the *literal*
    * address, not the masked network; hi ORs the inverted mask over
    * the family's bytes. null on invalid.
    */
  def cidrToRange(cidr: String): (Array[Byte], Array[Byte]) = {
    if (cidr == null) return null
    val slash = cidr.lastIndexOf('/')
    if (slash < 0) return null
    val ipPart = cidr.substring(0, slash)
    val lenPart = cidr.substring(slash + 1)
    if (lenPart.isEmpty || !lenPart.forall(_.isDigit) || lenPart.length > 3)
      return null
    val len = lenPart.toInt
    val v4 = ipPart.indexOf(':') < 0
    if (v4 && len > 32) return null
    if (!v4 && len > 128) return null
    val lo = parseIp(ipPart)
    if (lo == null) return null
    val hi = lo.clone()
    val bits = if (v4) len + 96 else len // offset v4 masks into the 16B form
    var i = 0
    while (i < 16) {
      val maskByte =
        if (bits >= 8 * (i + 1)) 0xff
        else if (bits <= 8 * i) 0x00
        else 0xff << (8 * (i + 1) - bits) & 0xff
      hi(i) = (hi(i) | (~maskByte & 0xff)).toByte
      i += 1
    }
    (lo, hi)
  }

  /** (lo, hi) → "lo/mask" where mask = familyBits − popcount(lo^hi).
    * Mirrors CIDRRange (iputils.go:295-315) — exact only when the
    * range is a CIDR-aligned block, approximate otherwise, by design.
    */
  def rangeToCidr(lo: Array[Byte], hi: Array[Byte]): String = {
    if (lo == null || hi == null || lo.length != 16 || hi.length != 16)
      return null
    var c = 0
    var i = 0
    while (i < 16) {
      c += Integer.bitCount((lo(i) ^ hi(i)) & 0xff)
      i += 1
    }
    val mask = if (isV4Mapped(lo)) 32 - c else 128 - c
    s"${formatIp(lo)}/$mask"
  }

  /** Minimal CIDR cover of an arbitrary inclusive [lo, hi] range over
    * a fixed address width (lo.length bytes): the standard greedy —
    * from `lo`, take the largest block both aligned at the cursor and
    * contained in the range, emit, advance. Exact inverse of block
    * expansion: re-reading the emitted prefixes reconstructs [lo, hi]
    * precisely, unlike [[rangeToCidr]]'s single approximate block.
    * Driver/dimension-scale utility (the cover of any range has at
    * most 2·width − 2 blocks).
    */
  def rangeToCidrs(lo: Array[Byte], hi: Array[Byte])
      : Seq[(Array[Byte], Int)] = {
    require(lo != null && hi != null && lo.length == hi.length)
    val width = lo.length * 8
    val end = BigInt(1, hi)
    var cur = BigInt(1, lo)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Int)]
    while (cur <= end) {
      val alignK =
        if (cur == 0) width
        else math.min(cur.lowestSetBit, width)
      var k = alignK
      while (k > 0 && cur + (BigInt(1) << k) - 1 > end) k -= 1
      val bytes = {
        val raw = cur.toByteArray.dropWhile(_ == 0)
        val a = new Array[Byte](lo.length)
        System.arraycopy(raw, 0, a, a.length - raw.length, raw.length)
        a
      }
      out += ((bytes, width - k))
      cur += BigInt(1) << k
    }
    out.toSeq
  }

  /** value ± delta with byte carry/borrow over an arbitrary-length
    * big-endian array; mirrors plusOne/minusOne (iputils.go:318-337)
    * for 16-byte IPs and works for any unsigned-comparable binary
    * key (e.g. 8-byte long_to_bin). Wraps at the array boundary.
    */
  def ipAdd(b: Array[Byte], delta: Long): Array[Byte] = {
    if (b == null || b.length == 0) return null
    val out = b.clone()
    var rem = delta
    var i = out.length - 1
    while (i >= 0 && rem != 0) {
      val sum = (out(i) & 0xff) + (rem & 0xff)
      out(i) = sum.toByte
      rem = (rem >> 8) + (if (sum > 0xff) 1 else 0)
      i -= 1
    }
    // negative deltas propagate borrow via the arithmetic shift above
    out
  }

  /** Mask to the site-network prefix (/26 for v4, /64 for v6) and
    * render as CIDR — mirrors site.go:130-139.
    */
  def maskCidr(b: Array[Byte], v4Len: Int, v6Len: Int): String = {
    if (b == null || b.length != 16) return null
    val v4 = isV4Mapped(b)
    val len = if (v4) v4Len else v6Len
    val bits = if (v4) len + 96 else len
    val out = b.clone()
    var i = 0
    while (i < 16) {
      val maskByte =
        if (bits >= 8 * (i + 1)) 0xff
        else if (bits <= 8 * i) 0x00
        else 0xff << (8 * (i + 1) - bits) & 0xff
      out(i) = (out(i) & maskByte).toByte
      i += 1
    }
    // a masked v4 keeps its ::ffff: prefix, so formatIp stays dotted
    if (v4) {
      out(10) = -1; out(11) = -1
    }
    s"${formatIp(out)}/$len"
  }

  /** 6to4: "2002:xxyy:zzww:…" → "x.y.z.w"; null when the address is
    * unparseable or outside 2002::/16 (mirrors handler.go:179-190,
    * which returns "" — callers here coalesce with the original).
    */
  def ip6to4(s: String): String = {
    val b = parseIp(s)
    if (b == null || (b(0) & 0xff) != 0x20 || (b(1) & 0xff) != 0x02) null
    else s"${b(2) & 0xff}.${b(3) & 0xff}.${b(4) & 0xff}.${b(5) & 0xff}"
  }

  /** True iff every byte is zero — the minimum key, where
    * `ipAdd(b, -1)` would wrap to the maximum key.
    */
  def isZero(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) {
      if (b(i) != 0) return false
      i += 1
    }
    true
  }

  /** Unsigned bytewise compare — same contract as Go bytes.Compare. */
  def compare(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return Integer.signum(d)
      i += 1
    }
    Integer.signum(a.length - b.length)
  }
}
