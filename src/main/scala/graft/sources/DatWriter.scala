package graft.sources

import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/** Sink-side twin of [[LegacyDat]]: serializes a range table into the
  * public legacy MaxMind `.dat` binary layout (libGeoIP GeoIP.c /
  * GeoIPCity.c, LGPL — same format notes as [[LegacyDat]]). Used to
  * build deterministic golden fixtures for LegacyDatSpec and the q67
  * declared query, and usable as an export sink for systems that still
  * consume legacy `.dat` snapshots.
  *
  * Driver/executor-local utility: a `.dat` is a single unsplittable
  * blob, so the builder works on in-memory entries (dimension-scale —
  * the reference's own files hold <10M ranges).
  */
object DatWriter {

  /** City-record payload (GeoIPCity.c `_extract_record` order).
    * `metroArea` is written only for REV1 US records, as libGeoIP's
    * writer does (combo = metro*1000 + area).
    */
  final case class CityPayload(countryIdx: Int, region: String,
      city: String, postal: String, lat: Double, lon: Double,
      metroArea: Option[(Int, Int)] = None)

  /** MSB-first bit string ("0"/"1") of the first `len` bits of `ip` —
    * dotted IPv4 for 32-bit editions, any IPv6 literal for 128-bit.
    */
  def prefixBits(ip: String, len: Int): String =
    addrBits(java.net.InetAddress.getByName(ip).getAddress, len)

  private def addrBits(addr: Array[Byte], len: Int): String = {
    val sb = new StringBuilder(len)
    var bit = 0
    while (bit < len) {
      sb.append(if ((addr(bit / 8) & (0x80 >> (bit % 8))) != 0) '1' else '0')
      bit += 1
    }
    sb.toString
  }

  // ---- binary trie ------------------------------------------------
  private final class Node {
    var left: Node = _        // bit 0
    var right: Node = _       // bit 1
    var leaf: Int = -1        // record ordinal (city) / country index
    def isLeaf: Boolean = leaf >= 0
  }

  private def insert(root: Node, bits: String, value: Int): Unit = {
    var n = root
    var i = 0
    while (i < bits.length) {
      require(!n.isLeaf, s"overlapping prefixes at ${bits.take(i)}")
      val next = if (bits.charAt(i) == '1') {
        if (n.right == null) n.right = new Node
        n.right
      } else {
        if (n.left == null) n.left = new Node
        n.left
      }
      n = next
      i += 1
    }
    require(n.left == null && n.right == null && !n.isLeaf,
      s"overlapping prefixes at $bits")
    n.leaf = value
  }

  private def countInternal(n: Node): Int =
    if (n == null || n.isLeaf) 0
    else 1 + countInternal(n.left) + countInternal(n.right)

  private def le3(out: ArrayBuffer[Byte], v: Int): Unit = {
    require(v >= 0 && v < (1 << 24), s"value $v exceeds 3 bytes")
    out += (v & 0xff).toByte
    out += ((v >> 8) & 0xff).toByte
    out += ((v >> 16) & 0xff).toByte
  }

  /** Serialize nodes in pre-order (root = node 0). `leafValue` maps a
    * leaf's stored ordinal to the on-disk pointer; `noData` is the
    * pointer for an absent child.
    */
  private def writeNodes(root: Node, out: ArrayBuffer[Byte],
      noData: Int)(leafValue: Int => Int): Unit = {
    // pre-assign ids in pre-order so pointers are known up front
    val ids = new java.util.IdentityHashMap[Node, Integer]()
    val order = ArrayBuffer.empty[Node]
    def assign(n: Node): Unit = if (n != null && !n.isLeaf) {
      ids.put(n, order.length); order += n
      assign(n.left); assign(n.right)
    }
    assign(root)
    order.foreach { n =>
      def ptr(c: Node): Int =
        if (c == null) noData
        else if (c.isLeaf) leafValue(c.leaf)
        else ids.get(c).intValue()
      le3(out, ptr(n.left))
      le3(out, ptr(n.right))
    }
  }

  /** Build a city-edition `.dat` (REV0 or REV1, v4 or v6) from
    * (CIDR, payload) entries. Equal payloads share one on-disk record,
    * so adjacent equal-payload blocks exercise the reader's merge.
    */
  def buildCity(entries: Seq[(String, Int, CityPayload)],
      dbType: Int = LegacyDat.CityEditionRev1): Array[Byte] =
    buildCityFromBits(
      entries.map { case (ip, len, p) => (prefixBits(ip, len), p) }, dbType)

  private[sources] def buildCityFromBits(
      entries: Seq[(String, CityPayload)], dbType: Int): Array[Byte] = {
    require(Set(LegacyDat.CityEditionRev0, LegacyDat.CityEditionRev1,
      LegacyDat.CityEditionRev0V6, LegacyDat.CityEditionRev1V6)(dbType))
    val rev1 = dbType == LegacyDat.CityEditionRev1 ||
      dbType == LegacyDat.CityEditionRev1V6

    // dedupe payloads, preserving first-seen order
    val recordOf = LinkedHashMap.empty[CityPayload, Int]
    val root = new Node
    entries.foreach { case (bits, p) =>
      val ord = recordOf.getOrElseUpdate(p, recordOf.size)
      insert(root, bits, ord)
    }
    val segments = math.max(countInternal(root), 1)

    // records section: 1 pad byte, then each record; remember offsets
    val recBytes = ArrayBuffer.empty[Byte]
    recBytes += 0
    val recOffset = recordOf.keys.map { p =>
      val off = recBytes.length
      require(p.countryIdx >= 0 && p.countryIdx < LegacyTables.size)
      recBytes += p.countryIdx.toByte
      Seq(p.region, p.city, p.postal).foreach { s =>
        recBytes ++= s.getBytes("ISO-8859-1"); recBytes += 0
      }
      le3(recBytes, math.round((p.lat + 180.0) * 10000.0).toInt)
      le3(recBytes, math.round((p.lon + 180.0) * 10000.0).toInt)
      if (rev1 && LegacyTables.code(p.countryIdx) == "US")
        le3(recBytes, p.metroArea.map { case (m, a) => m * 1000 + a }
          .getOrElse(0))
      off
    }.toIndexedSeq

    // leaf pointer = record file pos - (2*rl-1)*segments; the records
    // section starts right after the 6*segments node bytes, so a
    // record at recBytes offset `off` sits at file pos 6*segments+off
    // and its pointer is segments + off
    val out = ArrayBuffer.empty[Byte]
    writeNodes(root, out, noData = segments)(ord =>
      segments + recOffset(ord))
    out ++= recBytes
    out += -1; out += -1; out += -1
    out += dbType.toByte
    le3(out, segments)
    out.toArray
  }

  /** Build a country-edition `.dat` (v4 or v6) from
    * (CIDR, countryIndex) entries.
    */
  def buildCountry(entries: Seq[(String, Int, Int)],
      v6: Boolean = false): Array[Byte] =
    buildCountryFromBits(
      entries.map { case (ip, len, c) => (prefixBits(ip, len), c) }, v6)

  private[sources] def buildCountryFromBits(entries: Seq[(String, Int)],
      v6: Boolean): Array[Byte] = {
    val root = new Node
    entries.foreach { case (bits, cIdx) =>
      require(cIdx > 0 && cIdx < LegacyTables.size)
      insert(root, bits, cIdx)
    }
    val out = ArrayBuffer.empty[Byte]
    writeNodes(root, out, noData = LegacyDat.CountryBegin)(
      LegacyDat.CountryBegin + _)
    out += -1; out += -1; out += -1
    out += (if (v6) LegacyDat.CountryEditionV6
      else LegacyDat.CountryEdition).toByte
    out.toArray
  }

  // ---- export: range table → .dat ---------------------------------

  private def isV6Type(dbType: Int): Boolean =
    dbType == LegacyDat.CountryEditionV6 ||
      dbType == LegacyDat.CityEditionRev0V6 ||
      dbType == LegacyDat.CityEditionRev1V6

  private def rangeBits(r: LegacyDat.LegacyRow, v6: Boolean)
      : Seq[String] = {
    val (lo, hi) =
      if (v6) (r.lo, r.hi)
      else {
        // a genuinely-v6 row cannot be narrowed into a 32-bit edition:
        // silently dropping 12 bytes would export a bogus v4 range, so
        // exporting a mixed-family table under a v4 dbType is an error
        def v4Mapped(b: Array[Byte]) = b.length == 16 &&
          b.take(12).sameElements(graft.functions.IpMath.V4Prefix)
        require(v4Mapped(r.lo) && v4Mapped(r.hi),
          s"cannot export non-v4-mapped range to a 32-bit edition: " +
            s"${graft.functions.IpMath.formatIp(r.lo)}-" +
            s"${graft.functions.IpMath.formatIp(r.hi)}")
        (r.lo.drop(12), r.hi.drop(12)) // strip the v4-mapped prefix
      }
    graft.functions.IpMath.rangeToCidrs(lo, hi).map { case (a, len) =>
      addrBits(a, len)
    }
  }

  /** Export decoded legacy rows back to a `.dat` blob — the sink-side
    * inverse of [[LegacyDat.ranges]]. Ranges need not be CIDR-aligned
    * (each is decomposed into its minimal CIDR cover; the cover's
    * blocks share one record, so a re-read merges them back to the
    * original rows). Driver-side and dimension-scale by design: the
    * reference holds the same table fully in memory (geoip.go:89).
    */
  def exportCity(rows: Seq[LegacyDat.LegacyRow],
      dbType: Int = LegacyDat.CityEditionRev1): Array[Byte] =
    buildCityFromBits(rows.flatMap { r =>
      val p = CityPayload(LegacyTables.indexOf.getOrElse(r.country_code, 0),
        r.region, r.city, r.postal_code,
        if (r.latitude == null) 0.0 else r.latitude.doubleValue,
        if (r.longitude == null) 0.0 else r.longitude.doubleValue,
        if (r.metro_code == null || r.area_code == null ||
            (r.metro_code == 0L && r.area_code == 0L)) None
        else Some((r.metro_code.intValue, r.area_code.intValue)))
      rangeBits(r, isV6Type(dbType)).map(_ -> p)
    }, dbType)

  /** Country-edition export: only the country index survives. */
  def exportCountry(rows: Seq[LegacyDat.LegacyRow],
      v6: Boolean = false): Array[Byte] =
    buildCountryFromBits(rows.flatMap { r =>
      val idx = LegacyTables.indexOf.getOrElse(r.country_code, 0)
      if (idx == 0) Seq.empty // "--" / unknown = no-data in this format
      else rangeBits(r, v6).map(_ -> idx)
    }, v6)

  /** File sink: collect a (dimension-scale) decoded range table in
    * [[LegacyDat.read]]'s output shape and write one `.dat` file.
    */
  def writeCityFile(df: org.apache.spark.sql.DataFrame, path: String,
      dbType: Int = LegacyDat.CityEditionRev1): Unit = {
    val rows = df.collect().map { r =>
      LegacyDat.LegacyRow(
        r.getAs[Array[Byte]]("lo"), r.getAs[Array[Byte]]("hi"),
        r.getAs[String]("country_code"), r.getAs[String]("country_code3"),
        r.getAs[String]("country_name"), r.getAs[String]("region"),
        r.getAs[String]("city"), r.getAs[String]("postal_code"),
        r.getAs[java.lang.Double]("latitude"),
        r.getAs[java.lang.Double]("longitude"),
        r.getAs[java.lang.Long]("metro_code"),
        r.getAs[java.lang.Long]("area_code"),
        r.getAs[String]("continent_code"))
    }.toSeq
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      exportCity(rows, dbType))
  }
}
