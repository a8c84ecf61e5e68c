package graft.api

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.sources.Ingest

class ApiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  private def snap(d: String) = Api.Snapshot(Date.valueOf(d),
    Annotate.buildGeoSnapshot(
      Ingest.geoliteBlocks(spark, fixture("geolite2-blocks-v4.csv")),
      Ingest.geoliteLocations(spark, fixture("geolite2-locations.csv"))),
    Annotate.buildAsnSnapshot(
      Ingest.pfx2as(spark, fixture("routeviews.pfx2as")),
      Ingest.asNames(spark, fixture("asnames.csv"))))

  test("directory as-of pick + clamp (directory.go:230-240)") {
    val dir = Api.Directory(Seq(snap("2020-01-01"), snap("2021-01-01")))
    assert(dir.forDate(Date.valueOf("2020-06-01")).date.toString == "2020-01-01")
    assert(dir.forDate(Date.valueOf("2021-01-01")).date.toString == "2021-01-01")
    assert(dir.forDate(Date.valueOf("2019-01-01")).date.toString == "2020-01-01")
  }

  test("v2 response JSON: original-key map, omit-empty nulls (S12)") {
    import spark.implicits._
    val dir = Api.Directory(Seq(snap("2020-01-01")))
    val out = Api.annotateV2(spark, dir, Date.valueOf("2021-01-01"),
      Seq("1.0.0.200", "2002:100:c8::", "9.9.9.9").toDF("ip"))
    val json = Api.toV2ResponseJson(out, Date.valueOf("2020-01-01"))
    assert(json.contains(""""AnnotatorDate":"2020-01-01""""))
    // keyed by the ORIGINAL 2002: string, not the rewritten v4
    assert(json.contains(""""2002:100:c8::":{"Geo":"""))
    assert(json.contains(""""city":"Scarborough""""))
    // miss → {"missing":true} with null fields dropped (omitempty)
    assert(json.contains(""""9.9.9.9":{"Geo":{"missing":true}"""))
    assert(!json.contains("null"))
  }

  test("v1 keys are ip + base36 seconds; bad IP rejects the batch (P15/F5)") {
    import spark.implicits._
    val dir = Api.Directory(Seq(snap("2020-01-01")))
    val ts = java.sql.Timestamp.valueOf("2021-01-01 00:00:00")
    val reqs = Seq(("1.0.0.200", ts)).toDF("ip", "ts")
    val out = Api.annotateV1(spark, dir, reqs)
    val key = out.select("key").collect()(0).getString(0)
    val expectSuffix = java.lang.Long.toString(ts.getTime / 1000, 36)
    assert(key == s"1.0.0.200$expectSuffix")

    val bad = Seq(("nope", ts)).toDF("ip", "ts")
    intercept[IllegalArgumentException] {
      Api.annotateV1(spark, dir, bad)
    }
  }

  test("v2 response tolerates duplicate IPs in a batch") {
    import spark.implicits._
    val dir = Api.Directory(Seq(snap("2020-01-01")))
    val out = Api.annotateV2(spark, dir, Date.valueOf("2021-01-01"),
      Seq("1.0.0.200", "1.0.0.200", "9.9.9.9").toDF("ip"))
    val json = Api.toV2ResponseJson(out, Date.valueOf("2020-01-01"))
    assert(json.contains(""" "1.0.0.200":{"Geo": """.trim))
  }

  test("batch size buckets (P18)") {
    import spark.implicits._
    val got = Seq(1, 7, 50, 200, 999).toDF("n")
      .select(Api.batchSizeBucket(col("n"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("<5", "5+", "20+", "100+", "400+"))
  }
}
