package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.functions.IpMath

class IngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  test("geoliteBlocks: CIDR bounds, empty lat/lon → 0, junk row dropped") {
    val df = Ingest.geoliteBlocks(spark, fixture("geolite2-blocks-v4.csv"))
    val rows = df.collect().map(r =>
      (IpMath.formatIp(r.getAs[Array[Byte]]("lo")),
        IpMath.formatIp(r.getAs[Array[Byte]]("hi")),
        Option(r.getAs[Integer]("geoname_id")).map(_.toInt),
        r.getAs[Double]("latitude")))
      .sortBy(_._1)
    // 5 input rows, 1 dropped ("notanumber" latitude = field error)
    assert(rows.length == 4)
    assert(rows.contains(("1.0.0.0", "1.0.0.255", Some(5000001), 42.1)))
    // empty lat/lon → 0.0, null geoname_id survives (fallback key J3)
    assert(rows.contains(("1.0.1.0", "1.0.1.255", None, 0.0)))
    assert(rows.contains(("2.0.0.0", "2.0.255.255", Some(5000003), 25.79)))
  }

  test("geoliteLocations: caps/country-name validation, empty metro → 0") {
    val df = Ingest.geoliteLocations(spark, fixture("geolite2-locations.csv"))
    val byId = df.collect().map(r =>
      r.getInt(0) -> (r.getAs[String]("country_name"),
        r.getAs[Long]("metro_code"))).toMap
    // 6 input rows; "xx" continent and "G3rmany9" country name dropped
    assert(byId.keySet == Set(5000001, 5000002, 5000003, 4000001))
    assert(byId(5000001)._2 == 500L)
    assert(byId(5000002)._2 == 0L) // empty metro_code
  }

  test("pfx2as: prefix/len → bounds; systems decode; best ASN (P9/P10)") {
    val df = Ingest.pfx2as(spark, fixture("routeviews.pfx2as"))
      .withColumn("systems", Ingest.decodeAsnSystems(col("asn_string")))
      .withColumn("best", Ingest.bestAsn(col("systems")))
    val rows = df.collect().map { r =>
      val sysIdx = r.fieldIndex("systems")
      val systems = r.getSeq[org.apache.spark.sql.Row](sysIdx)
        .map(s => s.getSeq[Long](s.fieldIndex("asns")).toList).toList
      (IpMath.formatIp(r.getAs[Array[Byte]]("lo")), systems,
        r.getAs[Long]("best"))
    }.sortBy(_._1)
    assert(rows.length == 3)
    // single ASN
    assert(rows.exists(r => r._1 == "1.0.0.0" &&
      r._2 == Seq(Seq(2500L)) && r._3 == 2500L))
    // AS set "367,1479" → one system with two ASNs
    assert(rows.exists(r => r._1 == "1.0.128.0" &&
      r._2 == Seq(Seq(367L, 1479L)) && r._3 == 367L))
    // MOAS of sets "55967_38365,64512" → two systems
    assert(rows.exists(r => r._1 == "2001:200::" &&
      r._2 == Seq(Seq(55967L), Seq(38365L, 64512L)) && r._3 == 55967L))
  }

  test("asNames: AS-prefix parse, bad rows dropped") {
    val df = Ingest.asNames(spark, fixture("asnames.csv"))
    val m = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(2500L -> "WIDE Project",
      367L -> "DoD Network Information Center",
      55967L -> "Beijing Baidu Netcom"))
  }

  test("fipsMap: composite country-fips key (P11)") {
    val df = Ingest.fipsMap(spark, fixture("fips.csv"))
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("US-23" -> "ME", "US-09" -> "CT", "DE-01" -> "BW"))
  }

  test("siteinfo: current ∪ retired, invalid CIDR rows dropped (S10)") {
    val df = Ingest.siteinfo(spark, fixture("siteinfo.json"),
      fixture("siteinfo-retired.json"))
    val rows = df.collect().map(r =>
      (r.getAs[String]("cidr"), r.getAs[String]("site")))
    // abc01 contributes v4+v6, old03 v4+v6; xyz02 dropped (bad v4, empty v6)
    assert(rows.toSet == Set(
      ("64.86.148.128/26", "abc01"), ("2001:5a0:4400::/64", "abc01"),
      ("5.6.7.0/26", "old03"), ("2001:db8:77::/64", "old03")))
  }

  test("error budget: bad-record budget of 0 aborts the load") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("budget").toFile
    val f = new java.io.File(dir, "bad.csv")
    // second row has too many columns for the 2-col schema → corrupt
    java.nio.file.Files.writeString(f.toPath, "a,1\nb,2,EXTRA,EXTRA2\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.IntegerType)))
    intercept[Ingest.ErrorBudgetExceeded] {
      Ingest.readCsvWithBudget(spark, f.getPath, schema)(_ => lit(true))
        .collect()
    }
  }

  test("path date extraction (P8)") {
    import spark.implicits._
    val df = Seq(
      "gs://bucket/Maxmind/2017/09/07/20170907T023620Z-GeoLite2-City-CSV.zip",
      "RouteViews/routeviews-rv2-20190101-1200.pfx2as.gz")
      .toDF("path")
      .select(Ingest.pathDateGeo(col("path")).as("g"),
        Ingest.pathDateAsn(col("path")).as("a"))
    val rows = df.collect()
    assert(rows(0).getDate(0).toString == "2017-09-07" && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).getDate(1).toString == "2019-01-01")
  }
}
