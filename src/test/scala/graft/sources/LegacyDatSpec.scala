package graft.sources

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

import graft.SparkTestSession
import graft.api.Annotate
import graft.functions.IpMath
import graft.sources.DatWriter.CityPayload

/** S11 golden-fixture coverage for the legacy `.dat` binary reader —
  * the path the reference covers with legacy/geoip_test.go and
  * legacy/legacy-dataset_test.go. Fixtures are synthesized with
  * [[DatWriter]], so every byte of the on-disk layout (trailer,
  * node pointers, record encoding) is exercised round-trip.
  */
class LegacyDatSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val US = LegacyTables.indexOf("US")
  private val DE = LegacyTables.indexOf("DE")

  private def fmt(r: LegacyDat.LegacyRow): (String, String) =
    (IpMath.formatIp(r.lo), IpMath.formatIp(r.hi))

  /** The 1e-4 fixed-point quantization every coordinate goes through
    * on disk (GeoIPCity.c stores round((v+180)*10000); readers —
    * libGeoIP and ours alike — decode v/10000-180 in binary floating
    * point, so 43.6615 comes back as 43.66149999999999).
    */
  private def q(v: Double): Double =
    math.round((v + 180.0) * 10000.0) / 10000.0 - 180.0

  private def tmpDatDir(files: (String, Array[Byte])*): String = {
    val dir = Files.createTempDirectory("legacydat")
    files.foreach { case (name, bytes) =>
      Files.write(dir.resolve(name), bytes)
    }
    dir.toString
  }

  // ---------------------------------------------------------------

  test("LegacyTables structural invariants (libGeoIP table shape)") {
    assert(LegacyTables.size == 255) // GeoIP.c num_GeoIP_countries
    // codes are unique, so indexOf is total over them
    assert(LegacyTables.indexOf.size == LegacyTables.size)
    val continents = Set("--", "AF", "AN", "AS", "EU", "NA", "OC", "SA")
    for (i <- 0 until LegacyTables.size) {
      assert(LegacyTables.code(i).length == 2, s"index $i")
      assert(LegacyTables.code3(i).length >= 2 &&
        LegacyTables.code3(i).length <= 3, s"index $i")
      assert(LegacyTables.name(i).nonEmpty, s"index $i")
      assert(continents(LegacyTables.continent(i)), s"index $i")
    }
    // anchor slots: the sentinel, the pseudo-countries, and the
    // historically reused slots the format depends on
    assert(LegacyTables.code(0) == "--")
    assert(LegacyTables.code(1) == "AP" && LegacyTables.code(2) == "EU")
    assert(LegacyTables.indexOf("US") == 225)
    assert(LegacyTables.indexOf("GB") == 77)
    assert(LegacyTables.indexOf("DE") == 56)
    assert(LegacyTables.code(10) == "CW") // ex-AN slot
    assert(LegacyTables.code(75) == "SX") // ex-FX slot
    assert(LegacyTables.code(239) == "RS") // ex-YU slot
    assert(LegacyTables.code(254) == "SS") // last slot
    // out-of-range indices resolve to the sentinel, never throw
    assert(LegacyTables.code(-1) == "--" && LegacyTables.code(255) == "--")
  }

  test("country v4: walk emits ranges; adjacent same-country merge") {
    val bytes = DatWriter.buildCountry(Seq(
      ("1.0.0.0", 24, US), ("1.0.1.0", 24, US), // adjacent, same value
      ("5.5.5.0", 24, DE)))
    val rows = LegacyDat.ranges(bytes)
    assert(rows.map(fmt) == Vector(
      ("1.0.0.0", "1.0.1.255"), // merged across the two /24s
      ("5.5.5.0", "5.5.5.255")))
    val us = rows(0)
    assert((us.country_code, us.country_code3, us.country_name,
      us.continent_code) == ("US", "USA", "United States", "NA"))
    assert(us.region == "" && us.city == "" && us.latitude == null)
    val de = rows(1)
    assert((de.country_code, de.country_code3, de.country_name,
      de.continent_code) == ("DE", "DEU", "Germany", "EU"))
  }

  test("city rev1 v4: record decode; US metro/area combo; non-US zero") {
    val portland = CityPayload(US, "23", "Portland", "04101",
      43.6615, -70.2553, Some((500, 207)))
    val stuttgart = CityPayload(DE, "01", "Stuttgart", "",
      48.7758459, 9.1829321)
    val bytes = DatWriter.buildCity(Seq(
      ("1.0.0.0", 24, portland), ("5.5.5.0", 24, stuttgart)))
    val rows = LegacyDat.ranges(bytes)
    assert(rows.map(fmt) == Vector(
      ("1.0.0.0", "1.0.0.255"), ("5.5.5.0", "5.5.5.255")))
    val p = rows(0)
    assert(p.region == "23" && p.city == "Portland" &&
      p.postal_code == "04101")
    assert(p.latitude == q(43.6615) && p.longitude == q(-70.2553))
    assert(p.metro_code == 500L && p.area_code == 207L)
    val s = rows(1)
    // fixed-point 1e-4 quantization on the way in
    assert(s.latitude == q(48.7758459) && s.longitude == q(9.1829321))
    // reference zero-fills metro/area outside REV1-US (geoip.go:268)
    assert(s.metro_code == 0L && s.area_code == 0L)
    assert(s.postal_code == "")
  }

  test("city rev0: no metro combo even for US") {
    val bytes = DatWriter.buildCity(
      Seq(("1.0.0.0", 24, CityPayload(US, "23", "Portland", "04101",
        43.6615, -70.2553, Some((500, 207))))),
      dbType = LegacyDat.CityEditionRev0)
    val r = LegacyDat.ranges(bytes).head
    assert(r.city == "Portland")
    assert(r.metro_code == 0L && r.area_code == 0L)
  }

  test("city rev1: adjacent equal-payload leaves merge into one range") {
    val p = CityPayload(US, "23", "Portland", "04101", 43.6615, -70.2553)
    val bytes = DatWriter.buildCity(Seq(
      ("9.0.0.0", 25, p), ("9.0.0.128", 25, p)))
    assert(LegacyDat.ranges(bytes).map(fmt) ==
      Vector(("9.0.0.0", "9.0.0.255")))
  }

  test("city rev1 v6: 128-bit walk emits v6 bounds") {
    val p = CityPayload(DE, "01", "Stuttgart", "", 48.7758, 9.1829)
    val bytes = DatWriter.buildCity(
      Seq(("2001:db8::", 32, p)),
      dbType = LegacyDat.CityEditionRev1V6)
    val Vector(r) = LegacyDat.ranges(bytes)
    assert(IpMath.formatIp(r.lo) == "2001:db8::")
    assert(IpMath.formatIp(r.hi) ==
      "2001:db8:ffff:ffff:ffff:ffff:ffff:ffff")
    assert(r.city == "Stuttgart")
  }

  test("differential: .dat → buildLegacySnapshot ≡ CSV → " +
      "buildLegacySnapshot (legacy-dataset_test.go analogue)") {
    // same three ranges as fixtures/legacy-geo.csv
    val entries = Seq(
      ("1.0.0.0", 24, "1.0.0.255", CityPayload(US, "23", "Portland",
        "04101", 43.6615, -70.2553, Some((500, 207)))),
      ("1.0.1.0", 25, "1.0.1.127", CityPayload(US, "09", "Hartford",
        "06101", 41.76371, -72.68509, Some((533, 860)))),
      ("5.5.5.0", 24, "5.5.5.255", CityPayload(DE, "01", "Stuttgart",
        "", 48.7758459, 9.1829321, None)))
    val bytes = DatWriter.buildCity(
      entries.map { case (ip, len, _, p) => (ip, len, p) })
    // CSV twin of the SAME data: the tabular form is the unpacked dump
    // of the binary, so its coordinates carry the on-disk 1e-4
    // quantization, not the pre-encode decimals
    val csv = ("ip_lo,ip_hi,country_code,country_code3,country_name," +
      "region,city,postal_code,latitude,longitude,metro_code," +
      "area_code,continent_code") +:
      entries.map { case (lo, _, hi, p) =>
        val (m, a) = p.metroArea.getOrElse((0, 0))
        val cc = LegacyTables.code(p.countryIdx)
        s"$lo,$hi,$cc,${LegacyTables.code3(p.countryIdx)}," +
          s"${LegacyTables.name(p.countryIdx)},${p.region},${p.city}," +
          s"${p.postal},${q(p.lat)},${q(p.lon)},$m,$a," +
          s"${LegacyTables.continent(p.countryIdx)}"
      }
    val csvDir = Files.createTempDirectory("legacycsv")
    Files.write(csvDir.resolve("legacy.csv"),
      csv.mkString("\n").getBytes("UTF-8"))
    val fips = Ingest.fipsMap(spark,
      getClass.getResource("/fixtures/fips.csv").getPath)

    def snap(legacy: org.apache.spark.sql.DataFrame): Set[Any] =
      Annotate.buildLegacySnapshot(legacy, fips).collect().map { r =>
        val g = r.getAs[Row]("geo")
        (IpMath.formatIp(r.getAs[Array[Byte]]("lo")),
          IpMath.formatIp(r.getAs[Array[Byte]]("hi")),
          g.getAs[String]("country_code"), g.getAs[String]("country_code3"),
          g.getAs[String]("country_name"), g.getAs[String]("region"),
          g.getAs[String]("subdivision1_iso_code"),
          g.getAs[String]("city"),
          // CSV empty cells read as null; the binary format can only
          // hold "" — normalize for the compare
          Option(g.getAs[String]("postal_code")).getOrElse(""),
          g.getAs[Double]("latitude"), g.getAs[Double]("longitude"),
          g.getAs[Long]("metro_code"), g.getAs[Long]("area_code"))
      }.toSet[Any]

    val fromDat = snap(LegacyDat.read(spark, tmpDatDir("a.dat" -> bytes)))
    val fromCsv = snap(Ingest.legacyGeo(spark,
      csvDir.resolve("legacy.csv").toString))
    assert(fromDat == fromCsv)
    assert(fromDat.size == 3)
  }

  /** LegacyRow holds byte arrays, whose == is reference equality —
    * project to a comparable tuple for roundtrip asserts.
    */
  private def key(r: LegacyDat.LegacyRow) =
    (IpMath.formatIp(r.lo), IpMath.formatIp(r.hi), r.country_code,
      r.country_code3, r.country_name, r.region, r.city, r.postal_code,
      r.latitude, r.longitude, r.metro_code, r.area_code,
      r.continent_code)

  private def v4key(ip: String): Array[Byte] =
    IpMath.V4Prefix ++ java.net.InetAddress.getByName(ip).getAddress

  test("export roundtrip: non-CIDR-aligned ranges decompose, re-read " +
      "merges them back to the original rows") {
    // 1.0.0.3–1.0.2.17 is no CIDR block: the cover needs many blocks,
    // all sharing one record, so ranges() must merge them back
    val rows = Vector(
      LegacyDat.LegacyRow(v4key("1.0.0.3"), v4key("1.0.2.17"),
        "US", "USA", "United States", "23", "Portland", "04101",
        q(43.6615), q(-70.2553), 500L, 207L, "NA"),
      LegacyDat.LegacyRow(v4key("5.5.5.0"), v4key("5.5.5.255"),
        "DE", "DEU", "Germany", "01", "Stuttgart", "",
        q(48.25), q(9.75), 0L, 0L, "EU"))
    val back = LegacyDat.ranges(DatWriter.exportCity(rows))
    assert(back.map(key) == rows.map(key))
  }

  test("export to a 32-bit edition rejects a genuinely-v6 row instead " +
      "of silently truncating it into a bogus v4 range") {
    val v6lo = java.net.InetAddress.getByName("2001:db8::").getAddress
    val v6hi = java.net.InetAddress.getByName("2001:db8::ff").getAddress
    val row = LegacyDat.LegacyRow(v6lo, v6hi,
      "US", "USA", "United States", "23", "Portland", "04101",
      q(43.6615), q(-70.2553), 500L, 207L, "NA")
    val e = intercept[IllegalArgumentException] {
      DatWriter.exportCity(Vector(row))
    }
    assert(e.getMessage.contains("32-bit edition"))
    // the same row exports fine under the v6 edition
    val back = LegacyDat.ranges(
      DatWriter.exportCity(Vector(row), LegacyDat.CityEditionRev1V6))
    assert(back.map(key) == Vector(row).map(key))
  }

  test("export roundtrip: country edition") {
    val rows = Vector(
      LegacyDat.LegacyRow(v4key("1.0.0.0"), v4key("1.0.1.255"),
        "US", "USA", "United States", "", "", "",
        null, null, null, null, "NA"),
      LegacyDat.LegacyRow(v4key("9.1.2.3"), v4key("9.7.1.0"),
        "JP", "JPN", "Japan", "", "", "",
        null, null, null, null, "AS"))
    val back = LegacyDat.ranges(DatWriter.exportCountry(rows))
    assert(back.map(key) == rows.map(key))
  }

  test("writeCityFile sink: DataFrame range table → .dat file → read " +
      "roundtrip through Spark") {
    val src = DatWriter.buildCity(Seq(
      ("1.0.0.0", 24, CityPayload(US, "23", "Portland", "04101",
        43.6615, -70.2553, Some((500, 207)))),
      ("5.5.5.0", 24, CityPayload(DE, "01", "Stuttgart", "",
        48.25, 9.75))))
    val dir = tmpDatDir("src.dat" -> src)
    val table = LegacyDat.read(spark, dir)
    val out = java.nio.file.Files.createTempDirectory("datexport")
      .resolve("20170401T000000Z-GeoLiteCity.dat")
    DatWriter.writeCityFile(table, out.toString)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        (IpMath.formatIp(r.getAs[Array[Byte]]("lo")),
          IpMath.formatIp(r.getAs[Array[Byte]]("hi")),
          r.toSeq.drop(2))
      }.toSet
    val reread = LegacyDat.read(spark, out.getParent.toString)
    assert(rows(reread) == rows(table))
    assert(reread.count() == 2)
  }

  // ---- corruption / error budget --------------------------------

  private def validCity: Array[Byte] = DatWriter.buildCity(
    Seq(("1.0.0.0", 24, CityPayload(US, "23", "Portland", "04101",
      43.6615, -70.2553, Some((500, 207))))))

  test("truncated blob (no trailer) → UnsupportedEdition, not AIOOBE") {
    val cut = validCity.take(validCity.length / 2)
    intercept[LegacyDat.UnsupportedEdition](LegacyDat.ranges(cut))
  }

  test("dangling record pointer → CorruptDat, not AIOOBE") {
    val full = validCity
    val meta = LegacyDat.readMeta(full)
    // keep nodes + trailer, drop the records section entirely
    val cut = full.take(6 * meta.segments) ++ full.takeRight(7)
    intercept[LegacyDat.CorruptDat](LegacyDat.ranges(cut))
  }

  test("unsupported edition type → UnsupportedEdition") {
    val bytes = DatWriter.buildCountry(Seq(("1.0.0.0", 24, US)))
    bytes(bytes.length - 1) = 3 // GEOIP_REGION_EDITION_REV0
    intercept[LegacyDat.UnsupportedEdition](LegacyDat.ranges(bytes))
  }

  test("read(): corrupt file exceeds default budget of 0 bad records " +
      "(csv-reader.go:17-20 semantics)") {
    val dir = tmpDatDir("bad.dat" -> validCity.take(validCity.length / 2))
    val e = intercept[Ingest.ErrorBudgetExceeded](
      LegacyDat.read(spark, dir))
    assert(e.getMessage.contains("bad.dat"))
  }

  test("read(): budget of 1 bad file skips it and loads the rest") {
    val dir = tmpDatDir(
      "good.dat" -> validCity,
      "bad.dat" -> validCity.take(validCity.length / 2))
    val rows = LegacyDat.read(spark, dir,
      Ingest.ErrorBudget(maxBadRecords = 1)).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("city") == "Portland")
  }
}
