package graft.api

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.metrics.Metrics
import graft.sources.Ingest

class SplitMetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  test("server-vs-client split: semi/anti against site networks (F6)") {
    import spark.implicits._
    val sites = Ingest.siteinfo(spark, fixture("siteinfo.json"),
      fixture("siteinfo-retired.json"))
    val facts = Seq("64.86.148.130", "8.8.8.8", "5.6.7.20").toDF("ip")
    val (server, client) = Split.splitServerIps(facts, sites, col("ip"))
    assert(server.select("ip").as[String].collect().toSet ==
      Set("64.86.148.130", "5.6.7.20"))
    assert(client.select("ip").as[String].collect().toSet == Set("8.8.8.8"))
  }

  test("response merge: server-side rows win per key (J10)") {
    import spark.implicits._
    val server = Seq(("a", "server")).toDF("ip", "src")
    val remote = Seq(("a", "remote"), ("b", "remote")).toDF("ip", "src")
    val got = Split.mergeResponses(server, remote).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "server", "b" -> "remote"))
  }

  test("metrics: listener counts queries; histogram + missing stats (S14/A5/A6)") {
    import spark.implicits._
    val before = Metrics.registry.get("queries_total")
    Metrics.install(spark)
    Seq(1, 2, 3).toDF("x").count()
    // listener fires asynchronously; spin briefly
    val deadline = System.currentTimeMillis() + 10000
    while (Metrics.registry.get("queries_total") <= before &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(Metrics.registry.get("queries_total") > before)

    val hist = Metrics.latencyHistogram(
      Seq(3L, 5L, 17L, 300L).toDF("d"), col("d")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist.values.sum == 4)

    val ann = Seq((true, false), (false, false), (true, true))
      .toDF("gm", "nm")
      .select(struct(col("gm").as("missing")).as("geo"),
        struct(col("nm").as("missing")).as("network"))
    val ms = Metrics.missingStats(ann).collect()(0)
    assert(ms.getLong(0) == 3 && ms.getLong(1) == 2 && ms.getLong(2) == 1)
  }
}
