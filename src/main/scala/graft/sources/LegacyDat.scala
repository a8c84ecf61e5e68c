package graft.sources

import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.functions.IpMath

/** S11: pure-JVM reader for the legacy MaxMind GeoIP binary `.dat`
  * format — the one piece of the legacy path the reference delegates
  * to cgo/libgeoip (legacy/geoip.go:88-134 opens the file with
  * `GeoIP_open`; GetRecord at geoip.go:227-278 does per-IP lookups).
  *
  * The on-disk format is public (libGeoIP, LGPL — GeoIP.c
  * `_setup_segments` / `_GeoIP_seek_record_gl`, GeoIPCity.c
  * `_extract_record`):
  *
  *   - a binary search tree of `segments` nodes, each node holding
  *     two little-endian `recordLength`-byte child pointers (left =
  *     next address bit 0, right = bit 1), walked MSB-first over the
  *     32-bit (v4 editions) or 128-bit (v6 editions) address;
  *   - a pointer value `< segments` is the next node id; a value
  *     `>= segments` is a leaf. For city editions the leaf's record
  *     starts at file byte `value + (2*recordLength - 1) * segments`;
  *     `value == segments` means "no data". For country editions the
  *     leaf is `COUNTRY_BEGIN + countryIndex`;
  *   - a city record is: country index byte, then NUL-terminated
  *     region / city / postal strings (ISO-8859-1), then two 3-byte
  *     little-endian fixed-point coords (`v/10000 - 180`), then —
  *     REV1, US only — a 3-byte metro*1000+area combo;
  *   - the file ends with a structure-info trailer located by
  *     scanning at most 20 bytes back from EOF for 0xFF 0xFF 0xFF:
  *     one database-type byte (minus 105 when >= 106) and, for
  *     city/org editions, 3 little-endian segment-count bytes.
  *
  * Instead of the reference's per-IP lookups, this reader walks the
  * whole tree once (in-order DFS) and emits the complete [lo, hi] →
  * record range table in [[Ingest.legacyGeo]]'s exact output schema,
  * so [[graft.api.Annotate.buildLegacySnapshot]] consumes either
  * source unchanged. Adjacent leaves sharing a record are merged
  * during the walk, so the output is at most one row per tree leaf
  * run — dimension-scale, like every other loader.
  *
  * Robustness: every byte access is bounds-checked and structural
  * violations raise [[CorruptDat]]; [[read]] catches per-file parse
  * failures and counts them against the S4 per-file error budget
  * ([[Ingest.ErrorBudget]], csv-reader.go:17-20 semantics) instead of
  * letting a truncated blob kill the executor stage.
  *
  * Scale shape: one `.dat` file is one unsplittable ~50 MB blob (the
  * reference memory-caches it whole too, geoip.go:89). We read via
  * Spark's `binaryFile` source and parse per file on executors — a
  * daily-snapshot directory of hundreds of files parses in parallel,
  * one task per file, nothing on the driver.
  */
object LegacyDat {

  // Database-type ids, GeoIP.h (public libGeoIP).
  val CountryEdition    = 1
  val CityEditionRev1   = 2
  val CityEditionRev0   = 6
  val CountryEditionV6  = 12
  val CityEditionRev1V6 = 30
  val CityEditionRev0V6 = 31

  val CountryBegin         = 16776960
  val StandardRecordLength = 3
  val StructureInfoMaxSize = 20

  /** Longest NUL-terminated string a well-formed record can hold
    * (GeoIPCity.c FULL_RECORD_LENGTH bounds each record far below
    * this) — a runaway scan past it is corruption, not data.
    */
  val MaxCStringLen = 256

  final case class Meta(dbType: Int, recordLength: Int, segments: Int,
      bits: Int) {
    def isCity: Boolean = dbType == CityEditionRev0 ||
      dbType == CityEditionRev1 || dbType == CityEditionRev0V6 ||
      dbType == CityEditionRev1V6
    def isRev1: Boolean =
      dbType == CityEditionRev1 || dbType == CityEditionRev1V6
  }

  final class UnsupportedEdition(t: Int)
    extends RuntimeException(s"unsupported legacy edition type $t " +
      "(supported: country v4/v6, city rev0/rev1 v4/v6)")

  /** Structural corruption in a `.dat` blob (truncated file, pointer
    * past EOF, unterminated string, cyclic tree). Carries enough
    * context for the error-budget report; never escapes [[read]].
    */
  final class CorruptDat(msg: String) extends RuntimeException(msg)

  private def le3(b: Array[Byte], off: Int): Int = {
    if (off < 0 || off + 3 > b.length)
      throw new CorruptDat(s"3-byte read at $off past EOF (${b.length})")
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16)
  }

  /** Locate and decode the structure-info trailer
    * (GeoIP.c `_setup_segments`): scan backwards from EOF-3, at most
    * 20 positions, for the 0xFF 0xFF 0xFF delimiter.
    */
  def readMeta(bytes: Array[Byte]): Meta = {
    if (bytes.length < 4)
      throw new CorruptDat(s"file too short (${bytes.length} bytes)")
    // start so the edition byte at found+3 is always in bounds
    // (country files end FF FF FF <type>; city files append the
    // 3-byte segment count after the type)
    var pos = bytes.length - 4
    var found = -1
    var i = 0
    while (found < 0 && i < StructureInfoMaxSize && pos >= 0) {
      if (bytes(pos) == -1 && bytes(pos + 1) == -1 && bytes(pos + 2) == -1)
        found = pos
      else { pos -= 1; i += 1 }
    }
    if (found < 0)
      // libGeoIP defaults to a country edition; we refuse instead —
      // a missing trailer on our inputs is corruption, not a v1 file
      throw new UnsupportedEdition(-1)
    var t = bytes(found + 3) & 0xff
    if (t >= 106) t -= 105
    val meta = t match {
      case CountryEdition | CountryEditionV6 =>
        Meta(t, StandardRecordLength, CountryBegin,
          if (t == CountryEditionV6) 128 else 32)
      case CityEditionRev0 | CityEditionRev1 |
           CityEditionRev0V6 | CityEditionRev1V6 =>
        Meta(t, StandardRecordLength, le3(bytes, found + 4),
          if (t == CityEditionRev0V6 || t == CityEditionRev1V6) 128 else 32)
      case other => throw new UnsupportedEdition(other)
    }
    if (meta.isCity &&
        (meta.segments <= 0 ||
          meta.segments.toLong * 2 * meta.recordLength > bytes.length))
      throw new CorruptDat(
        s"segment count ${meta.segments} inconsistent with file size " +
          s"${bytes.length}")
    meta
  }

  /** One decoded leaf payload, already resolved through the country
    * tables. Field names match [[Ingest.legacyGeoSchema]] tail.
    */
  final case class LegacyRow(
      lo: Array[Byte], hi: Array[Byte],
      country_code: String, country_code3: String, country_name: String,
      region: String, city: String, postal_code: String,
      latitude: java.lang.Double, longitude: java.lang.Double,
      metro_code: java.lang.Long, area_code: java.lang.Long,
      continent_code: String)

  private def readCString(b: Array[Byte], off: Int): (String, Int) = {
    if (off < 0 || off >= b.length)
      throw new CorruptDat(s"string read at $off past EOF (${b.length})")
    val limit = math.min(b.length, off + MaxCStringLen)
    var end = off
    while (end < limit && b(end) != 0) end += 1
    if (end == limit)
      throw new CorruptDat(s"unterminated string at $off")
    // on-disk strings are ISO-8859-1; libGeoIP iconv-converts under
    // GEOIP_CHARSET_UTF8 (set by the reference at geoip.go:119) —
    // decoding Latin-1 into JVM strings is the same conversion
    (new String(b, off, end - off, "ISO-8859-1"), end + 1)
  }

  /** Decode a city record (GeoIPCity.c `_extract_record`). */
  private def cityRecord(bytes: Array[Byte], meta: Meta,
      recordPtr: Int): LegacyRow = {
    if (recordPtr < 0 || recordPtr >= bytes.length)
      throw new CorruptDat(
        s"record pointer $recordPtr past EOF (${bytes.length})")
    val cIdx = bytes(recordPtr) & 0xff
    var pos = recordPtr + 1
    val (region, p1) = readCString(bytes, pos); pos = p1
    val (city, p2) = readCString(bytes, pos); pos = p2
    val (postal, p3) = readCString(bytes, pos); pos = p3
    // decoded at full double precision, intentionally NOT narrowed
    // through float32 the way the reference does (geoip.go GetRecord
    // stores float32(latitude) before its 3-decimal round): the
    // format's 1e-4 fixed point is exact in a double, so keeping the
    // double is strictly more faithful to the on-disk value. A
    // boundary coordinate can therefore differ from the reference
    // service in the third decimal — by being MORE accurate.
    val lat = le3(bytes, pos) / 10000.0 - 180.0; pos += 3
    val lon = le3(bytes, pos) / 10000.0 - 180.0; pos += 3
    val code = LegacyTables.code(cIdx)
    // city records default metro/area to 0, not null — the reference's
    // record struct zero-fills them (geoip.go:268 skips the combo for
    // REV0 and non-US, leaving Go zero values in GeoIPRecord)
    var metro: java.lang.Long = java.lang.Long.valueOf(0L)
    var area: java.lang.Long = java.lang.Long.valueOf(0L)
    if (meta.isRev1 && code == "US") {
      // REV1 writes the combo only for US records (GeoIPCity.c)
      val combo = le3(bytes, pos)
      metro = java.lang.Long.valueOf(combo / 1000L)
      area = java.lang.Long.valueOf(combo % 1000L)
    }
    LegacyRow(null, null, code, LegacyTables.code3(cIdx),
      LegacyTables.name(cIdx), region, city, postal, lat, lon,
      metro, area, LegacyTables.continent(cIdx))
  }

  private def countryRecord(cIdx: Int): LegacyRow =
    LegacyRow(null, null, LegacyTables.code(cIdx),
      LegacyTables.code3(cIdx), LegacyTables.name(cIdx),
      "", "", "", null, null, null, null, LegacyTables.continent(cIdx))

  /** Walk the whole search tree and emit the merged range table.
    * In-order DFS (left = bit 0 first) yields leaves in ascending
    * address order, so the adjacent-merge is a single linear pass.
    */
  def ranges(bytes: Array[Byte]): Vector[LegacyRow] = {
    val meta = readMeta(bytes)
    val rl = meta.recordLength
    val out = ArrayBuffer.empty[LegacyRow]

    // A well-formed tree visits each of `segments` nodes once; a
    // corrupt/malicious pointer structure (DAG/cycle) could revisit
    // nodes exponentially, so cap total visits.
    val maxVisits: Long =
      if (meta.isCity) 4L * meta.segments + 16 else bytes.length.toLong
    var visits = 0L

    // pending run of adjacent leaves sharing one leaf value
    var pendLo: Array[Byte] = null
    var pendHi: Array[Byte] = null
    var pendVal = -1

    def addrBytes(path: Array[Byte], depth: Int, fillOnes: Boolean):
        Array[Byte] = {
      val n = meta.bits / 8
      val a = new Array[Byte](n)
      System.arraycopy(path, 0, a, 0, n)
      // zero/one-fill bits [depth, bits)
      var bit = depth
      while (bit < meta.bits) {
        val byteIdx = bit / 8
        val mask = (0x80 >> (bit % 8)).toByte
        if (fillOnes) a(byteIdx) = (a(byteIdx) | mask).toByte
        else a(byteIdx) = (a(byteIdx) & ~mask).toByte
        bit += 1
      }
      a
    }

    def toKey(a: Array[Byte]): Array[Byte] =
      if (a.length == 16) a
      else {
        val k = new Array[Byte](16)
        System.arraycopy(IpMath.V4Prefix, 0, k, 0, 12)
        System.arraycopy(a, 0, k, 12, 4)
        k
      }

    def contiguous(hi: Array[Byte], lo: Array[Byte]): Boolean = {
      // lo == hi + 1 over the raw address bytes
      val inc = java.util.Arrays.copyOf(hi, hi.length)
      var i = inc.length - 1
      var carry = true
      while (carry && i >= 0) {
        inc(i) = ((inc(i) & 0xff) + 1).toByte
        carry = inc(i) == 0
        i -= 1
      }
      !carry && java.util.Arrays.equals(inc, lo)
    }

    // many leaf runs share one on-disk record; decode each record
    // once and let the emitted rows share the immutable payload
    // (strings included — copy() below is shallow)
    val recCache = new java.util.HashMap[Integer, LegacyRow]()

    def flush(): Unit = if (pendVal >= 0) {
      val row = recCache.computeIfAbsent(pendVal, v =>
        if (meta.isCity)
          cityRecord(bytes, meta, v + (2 * rl - 1) * meta.segments)
        else countryRecord(v - CountryBegin))
      out += row.copy(lo = toKey(pendLo), hi = toKey(pendHi))
      pendVal = -1
    }

    def leaf(path: Array[Byte], depth: Int, v: Int): Unit = {
      val isData =
        if (meta.isCity) v != meta.segments
        else v > CountryBegin // country index 0 is "--" / no data
      if (!isData) { flush(); return }
      val lo = addrBytes(path, depth, fillOnes = false)
      val hi = addrBytes(path, depth, fillOnes = true)
      if (pendVal == v && contiguous(pendHi, lo)) pendHi = hi
      else { flush(); pendLo = lo; pendHi = hi; pendVal = v }
    }

    // recursive in-order walk — depth is bounded by the address
    // width (≤128), so the JVM stack is never at risk
    def walk(node: Int, depth: Int, path: Array[Byte]): Unit = {
      visits += 1
      if (visits > maxVisits)
        throw new CorruptDat(
          s"tree walk exceeded $maxVisits node visits — cyclic or " +
            "corrupt pointer structure")
      val base = node * 2 * rl
      var side = 0
      while (side < 2) {
        val v = le3(bytes, base + side * rl)
        val childPath =
          if (side == 0) path
          else {
            val p = java.util.Arrays.copyOf(path, path.length)
            p(depth / 8) = (p(depth / 8) | (0x80 >> (depth % 8))).toByte
            p
          }
        if (v < meta.segments && depth + 1 < meta.bits)
          walk(v, depth + 1, childPath)
        else if (v < meta.segments)
          // pointer at max depth — malformed; treat as no-data
          flush()
        else leaf(childPath, depth + 1, v)
        side += 1
      }
    }
    walk(0, 0, new Array[Byte](meta.bits / 8))
    flush()
    out.toVector
  }

  /** One file's parse outcome: either rows or a budget-countable
    * error. Encodes as (file, err, rows ARRAY&lt;STRUCT&gt;).
    */
  // private[sources], not private: the cached Dataset's codegen'd
  // deserializer constructs this from another class (JVM-public is
  // required; Scala `private` nested in an object is JVM-private)
  private[sources] final case class FileParse(file: String, err: String,
      rows: Array[LegacyRow])

  /** Read one or many `.dat` files into the [[Ingest.legacyGeo]]
    * range-table shape: (lo BINARY, hi BINARY, payload…), canonical
    * 16-byte v4-mapped keys. Parsing runs per file on executors via
    * the `binaryFile` source; a file that fails to parse counts as a
    * bad record against the per-file budget (S4 semantics — default
    * budget 0 bad records, so corruption aborts the load with
    * [[Ingest.ErrorBudgetExceeded]] naming the file, exactly like the
    * CSV loaders, instead of an executor ArrayIndexOutOfBounds).
    */
  def read(spark: SparkSession, path: String,
      budget: Ingest.ErrorBudget = Ingest.ErrorBudget()): DataFrame =
    read(spark, Seq(path), budget)

  /** Multi-path variant (a refresh batch may deliver several files).
    *
    * Each blob is parsed exactly ONCE: the parse stage is cached
    * across the failure-budget action and the row emission, and the
    * emitted range table is persisted and counted (materialized)
    * before the blob cache is released — downstream consumers
    * (snapshot builds, repeated probes) read the cached dimension
    * table. Lineage is kept intact deliberately: if executor churn
    * drops a cached block, it recomputes from the source files rather
    * than failing the probe (see the persist note in the body).
    */
  def read(spark: SparkSession, paths: Seq[String],
      budget: Ingest.ErrorBudget): DataFrame = {
    import spark.implicits._
    val parsed = spark.read.format("binaryFile").load(paths: _*)
      .select("path", "content").as[(String, Array[Byte])]
      .map { case (file, bytes) =>
        try FileParse(file, null, ranges(bytes).toArray)
        catch {
          case NonFatal(e) =>
            FileParse(file, s"${e.getClass.getSimpleName}: ${e.getMessage}",
              Array.empty)
        }
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // dimension-scale action: one row per FILE, not per range
      val failures = parsed.filter(_.err != null)
        .map(p => (p.file, p.err)).collect()
      if (failures.length > budget.maxBadRecords)
        throw new Ingest.ErrorBudgetExceeded(
          failures.map { case (f, e) => s"$f: $e" }
            .mkString(s"${failures.length} unreadable .dat file(s) > " +
              s"${budget.maxBadRecords}: ", "; ", ""))
      // persist + count, NOT localCheckpoint: the returned range table
      // is held long-term by the streaming refresh ref, and a
      // checkpointed table's blocks live only on the executors that
      // computed them — losing one (decommission/OOM) would fail every
      // later probe until the next .dat drop. A persisted table keeps
      // its lineage: an evicted/lost block recomputes from the source
      // files (at re-parse cost — the right trade for a table that
      // must survive executor churn). The count materializes every
      // partition NOW, while the blob parse above is still cached, so
      // the ~50 MB blobs are still parsed exactly once.
      val out = parsed.filter(_.err == null)
        .flatMap(_.rows)
        .toDF()
        .select(Ingest.legacyGeoSchema.fieldNames.drop(2)
          .foldLeft(Seq(col("lo"), col("hi")))((acc, c) => acc :+ col(c)): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count()
      out
    } finally parsed.unpersist(false)
  }
}
