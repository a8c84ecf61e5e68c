package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[UrlOps]] edge cases the arithmetic oracle of q169 can't reach:
  * userinfo, fragments, IPv4 hosts, deep suffixes, missing scheme.
  */
class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def parse(url: String): (String, Any, String, Int, Int) = {
    val r = Seq(url).toDF("u").select(
      UrlOps.host(col("u")),
      UrlOps.port(col("u")),
      UrlOps.etld1(UrlOps.host(col("u"))),
      UrlOps.pathDepth(col("u")),
      UrlOps.queryParamCount(col("u"))).head
    (r.getString(0), if (r.isNullAt(1)) null else r.getInt(1),
      r.getString(2), r.getInt(3), r.getInt(4))
  }

  test("plain host, no port/path/query") {
    assert(parse("https://example.com") ===
      (("example.com", null, "example.com", 0, 0)))
  }

  test("userinfo, port, deep path, query, fragment") {
    assert(parse("http://user:pw@a.b.example.co.uk:8080/x/y/z?a=1&b=2#frag")
      === (("a.b.example.co.uk", 8080, "example.co.uk", 3, 2)))
  }

  test("trailing slash and empty segments don't count") {
    assert(parse("https://example.org/a//b/") ===
      (("example.org", null, "example.org", 2, 0)))
  }

  test("IPv4 host passes through etld1 untouched") {
    // 4 labels but the last two are digits, not a multi-part suffix:
    // documented limitation — a numeric host needs the caller's
    // is-IP guard; etld1 applies the label rule blindly
    assert(parse("http://192.168.0.1:81/p") ===
      (("192.168.0.1", 81, "0.1", 1, 0)))
  }

  test("github.io is a multi-part suffix") {
    assert(parse("https://proj.user.github.io/docs")._3
      === "user.github.io")
  }

  test("missing scheme yields null host") {
    assert(parse("example.com/path") === ((null, null, null, 0, 0)))
  }

  test("query without path; fragment excluded from params") {
    assert(parse("https://example.com?only=1#x=2&y=3") ===
      (("example.com", null, "example.com", 0, 1)))
  }

  test("domainCap keeps exactly the k smallest order keys per domain") {
    val df = (0 until 100).map(i => (i.toLong, s"d${i % 3}")).toDF("id", "dom")
      .withColumn("h", md5(col("id").cast("string")))
    val exact = UrlOps.domainCap(df, col("dom"), col("h"), 5)
      .select("id").as[Long].collect().sorted.toSeq
    val trimmed = UrlOps.domainCap(df, col("dom"), col("h"), 5,
      preTrimFactor = 4)
      .select("id").as[Long].collect().sorted.toSeq
    assert(exact.length === 15)
    // pre-trim sharding is a pure optimization: identical keep-set
    assert(trimmed === exact)
    // and it really is the k smallest hashes per domain
    val want = df.collect().map(r => (r.getString(1), r.getString(2),
        r.getLong(0)))
      .groupBy(_._1).values.flatMap(_.sortBy(_._2).take(5).map(_._3))
      .toSeq.sorted
    assert(exact === want)
  }
}
