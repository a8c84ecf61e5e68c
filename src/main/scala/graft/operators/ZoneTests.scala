package graft.operators

import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan,
  LessThanOrEqual, StringStartsWith}

/** The conservative ZONE TEST shared by every zone-shaped pruner:
  * "can a unit (file / kb partition) whose column zone is [min, max]
  * with these null counts contain a row matching this data-source
  * [[Filter]]?" — false only when PROVABLY not. One definition,
  * two consumers: [[ZoneMap]]'s per-FILE pruning and
  * [[graft.plans.AggViewRewrite]]'s per-kb-PARTITION pruning of the
  * rollup, so the prefix/range/null semantics (and the UTF-8
  * byte-order contract) can never drift between them.
  */
private[graft] object ZoneTests {

  /** One column's zone in one prunable unit. `kind` is "num"
    * (integral, zoned on the long value) or "str" (zoned on UTF-8
    * byte order — the order [[graft.functions.StrExtremaAgg]]
    * aggregated the extrema under). `nRows`/`nNulls` feed the
    * IsNull/IsNotNull tests.
    */
  final case class Zone(kind: String, nRows: Long, nNulls: Long,
      minN: Option[Long], maxN: Option[Long],
      minS: Option[String], maxS: Option[String])

  /** Unsigned lexicographic compare of UTF-8 byte strings — the
    * ordering the zone extrema were AGGREGATED under
    * ([[graft.functions.StrExtremaAgg]] compares `UTF8String`s =
    * UTF-8 bytes = code points). Java's `String.compareTo` is UTF-16
    * code-UNIT order, which DISAGREES above the BMP (a surrogate
    * pair's 0xD800-range units sort below U+E000..U+FFFF singles), so
    * zone tests must compare in byte space or a unit holding a
    * supplementary-plane value can be pruned while it matches.
    */
  private def byteCmp(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** The smallest byte string GREATER than every string with prefix
    * `p` (in byte space): increment p's last non-0xFF byte, truncate
    * after it. None when every byte is 0xFF (no upper bound). The
    * prefix interval is then [p, next(p)).
    */
  private def nextPrefix(p: Array[Byte]): Option[Array[Byte]] = {
    var i = p.length - 1
    while (i >= 0 && p(i) == 0xff.toByte) i -= 1
    if (i < 0) None
    else {
      val out = java.util.Arrays.copyOf(p, i + 1)
      out(i) = (out(i) + 1).toByte
      Some(out)
    }
  }

  /** Can a unit described by `z` contain a row matching `f`?
    * Conservative per-filter test on a single column's zone.
    */
  def mayMatch(f: Filter, z: Zone): Boolean = {
    def asLong(v: Any): Option[Long] = v match {
      case l: java.lang.Long => Some(l.longValue)
      case i: java.lang.Integer => Some(i.longValue)
      case s: java.lang.Short => Some(s.longValue)
      case b: java.lang.Byte => Some(b.longValue)
      // date filter values arrive as the external date types; date
      // zones carry days-since-epoch ([[AggView.keyZones]]'s num
      // path), and both conversions below ARE that day count
      case d: java.time.LocalDate => Some(d.toEpochDay)
      case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
      case _ => None
    }
    def numZone(test: (Long, Long) => Boolean): Boolean =
      // no non-null values ⇒ a null-rejecting predicate matches none
      (z.minN, z.maxN) match {
        case (Some(lo), Some(hi)) => test(lo, hi)
        case _ => false
      }
    // zone tests in UTF-8 byte order — the order the extrema carry
    def strZone(test: (Array[Byte], Array[Byte]) => Boolean): Boolean =
      (z.minS, z.maxS) match {
        case (Some(lo), Some(hi)) => test(utf8(lo), utf8(hi))
        case _ => false
      }
    def strContains(v: String): Boolean = {
      val b = utf8(v)
      strZone((lo, hi) => byteCmp(lo, b) <= 0 && byteCmp(b, hi) <= 0)
    }
    f match {
      case IsNull(_) => z.nNulls > 0
      case IsNotNull(_) => z.nNulls < z.nRows
      case EqualTo(_, v) if z.kind == "num" =>
        asLong(v).forall(x => numZone((lo, hi) => lo <= x && x <= hi))
      case EqualTo(_, v: String) if z.kind == "str" => strContains(v)
      case In(_, vs) if z.kind == "num" =>
        vs.exists(v => asLong(v)
          .forall(x => numZone((lo, hi) => lo <= x && x <= hi)))
      case In(_, vs) if z.kind == "str" =>
        vs.exists {
          case v: String => strContains(v)
          case _ => true
        }
      case GreaterThan(_, v) if z.kind == "num" =>
        asLong(v).forall(x => numZone((_, hi) => hi > x))
      case GreaterThanOrEqual(_, v) if z.kind == "num" =>
        asLong(v).forall(x => numZone((_, hi) => hi >= x))
      case LessThan(_, v) if z.kind == "num" =>
        asLong(v).forall(x => numZone((lo, _) => lo < x))
      case LessThanOrEqual(_, v) if z.kind == "num" =>
        asLong(v).forall(x => numZone((lo, _) => lo <= x))
      case GreaterThan(_, v: String) if z.kind == "str" =>
        strZone((_, hi) => byteCmp(hi, utf8(v)) > 0)
      case GreaterThanOrEqual(_, v: String) if z.kind == "str" =>
        strZone((_, hi) => byteCmp(hi, utf8(v)) >= 0)
      case LessThan(_, v: String) if z.kind == "str" =>
        strZone((lo, _) => byteCmp(lo, utf8(v)) < 0)
      case LessThanOrEqual(_, v: String) if z.kind == "str" =>
        strZone((lo, _) => byteCmp(lo, utf8(v)) <= 0)
      // LIKE 'p%': strings with prefix p form the byte interval
      // [p, nextPrefix(p)) — a unit survives iff its zone intersects
      case StringStartsWith(_, p) if z.kind == "str" =>
        strZone { (lo, hi) =>
          val pb = utf8(p)
          byteCmp(hi, pb) >= 0 &&
            nextPrefix(pb).forall(np => byteCmp(lo, np) < 0)
        }
      case _ => true // unrecognized ⇒ never prune on it
    }
  }

  /** The single column a recognized filter constrains, if any. */
  def colOf(f: Filter): Option[String] = f match {
    case EqualTo(a, _) => Some(a)
    case In(a, _) => Some(a)
    case GreaterThan(a, _) => Some(a)
    case GreaterThanOrEqual(a, _) => Some(a)
    case LessThan(a, _) => Some(a)
    case LessThanOrEqual(a, _) => Some(a)
    case IsNull(a) => Some(a)
    case IsNotNull(a) => Some(a)
    case StringStartsWith(a, _) => Some(a)
    case _ => None
  }
}
