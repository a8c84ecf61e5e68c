package graft.sources

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class CatalogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("listing filters: regex keep + date cutoffs prune before read (S1/F1/F3)") {
    import spark.implicits._
    val listing = Seq(
      "RouteViewIPv4/2019/01/routeviews-rv2-20190101-1200.pfx2as.gz",
      "RouteViewIPv4/2008/01/routeviews-rv2-20080101-1200.pfx2as.gz", // too old
      "RouteViewIPv4/2019/01/routeviews-rv2-20190115-1200.pfx2as.gz", // not 1st
      "RouteViewIPv6/2019/01/routeviews-rv6-20190101-1200.pfx2as.gz", // v6 regex
      "SomethingElse/readme.txt").toDF("path")
    val got = Catalog.acceptPaths(listing,
        Catalog.AsnV4Regex.regex, Ingest.pathDateAsn,
        notBefore = Some(Catalog.AsnV4StartDate))
      .select("path").as[String].collect()
    assert(got.toSeq == Seq(
      "RouteViewIPv4/2019/01/routeviews-rv2-20190101-1200.pfx2as.gz"))
  }

  test("geolite2 regex matches the reference's accepted names (F1)") {
    import spark.implicits._
    val listing = Seq(
      "Maxmind/2017/09/07/20170907T023620Z-GeoLite2-City-CSV.zip",
      "Maxmind/2017/09/07/20170907T023620Z-GeoLite2-Country-CSV.zip",
      "Maxmind/2017/09/07/20170907T023620Z-GeoLiteCity.dat.gz").toDF("path")
    val got = Catalog.acceptPaths(listing, Catalog.GeoLite2Regex.regex,
      Ingest.pathDateGeo).select("path").as[String].collect()
    assert(got.toSeq == Seq(
      "Maxmind/2017/09/07/20170907T023620Z-GeoLite2-City-CSV.zip"))
  }

  test("incremental refresh loads only new paths (O6)") {
    import spark.implicits._
    val accepted = Seq("a", "b", "c").toDF("path")
    val loaded = Seq("a", "c").toDF("path")
    val got = Catalog.newPaths(accepted, loaded)
      .select("path").as[String].collect()
    assert(got.toSeq == Seq("b"))
  }

  test("zip member extraction by substring (S2)") {
    val dir = java.nio.file.Files.createTempDirectory("zip")
    val zipPath = s"$dir/test.zip"
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zipPath))
    for ((name, content) <- Seq(
        "GeoLite2-City-Blocks-IPv4.csv" -> "network,geoname_id\n1.0.0.0/24,1",
        "GeoLite2-City-Locations-en.csv" -> "geoname_id\n1",
        "COPYRIGHT.txt" -> "x")) {
      zos.putNextEntry(new java.util.zip.ZipEntry(s"sub/$name"))
      zos.write(content.getBytes)
      zos.closeEntry()
    }
    zos.close()
    val members = Catalog.extractZipMembers(zipPath,
      Seq("Blocks-IPv4", "Locations-en"))
    assert(members.keySet == Set("Blocks-IPv4", "Locations-en"))
    val blocks = scala.io.Source.fromFile(members("Blocks-IPv4")).mkString
    assert(blocks.startsWith("network,geoname_id"))
  }
}
