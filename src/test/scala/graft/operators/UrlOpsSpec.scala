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

  test("full PSL: wildcard and exception rules follow the " +
      "publicsuffix.org algorithm") {
    val psl = Psl.parse(Seq(
      "// comment line", "", "com", "co.uk", "jp",
      "*.nagoya.jp", "*.ck", "!www.ck"))
    // wildcard: *.ck makes every <x>.ck a public suffix
    assert(psl.registrable("foo.bar.ck") === "foo.bar.ck")
    assert(psl.registrable("bar.ck") === null) // IS a public suffix
    // exception: !www.ck carves www.ck back out
    assert(psl.registrable("www.ck") === "www.ck")
    assert(psl.registrable("sub.www.ck") === "www.ck")
    // *.nagoya.jp (the compiled subset's documented miss case):
    // b.nagoya.jp is the public suffix, so one MORE label registers
    assert(psl.registrable("a.b.nagoya.jp") === "a.b.nagoya.jp")
    assert(psl.registrable("b.nagoya.jp") === null)
    assert(psl.registrable("nagoya.jp") === "nagoya.jp") // exact jp rule
    // exact multi-part + default rule
    assert(psl.registrable("x.y.co.uk") === "y.co.uk")
    assert(psl.registrable("co.uk") === null)
    assert(psl.registrable("a.example.org") === "example.org")
    assert(psl.registrable("org") === null)
    // malformed
    assert(psl.registrable(".leading.dot") === null)
    assert(psl.registrable("trailing.dot.") === null)
    assert(psl.registrable("") === null)
  }

  test("registrableDomain expression runs the broadcast PSL in-plan " +
      "and agrees with etld1 on subset-covered hosts") {
    val bc = UrlOps.broadcastPsl(spark)
    val hosts = Seq("a.b.example.co.uk", "x.github.io", "a.example.org",
      "deep.a.example.org", "example.com", null)
    val got = hosts.toDF("h")
      .select(UrlOps.registrableDomain(col("h"), bc).as("rd"),
        UrlOps.etld1(col("h")).as("e"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    got.foreach { case (rd, e) => assert(rd === e) }
    // and the spec-correct divergence: a public-suffix host is NULL
    // through the full algorithm, passthrough through the subset fn
    val ps = Seq("co.uk").toDF("h")
      .select(UrlOps.registrableDomain(col("h"), bc).as("rd"),
        UrlOps.etld1(col("h")).as("e")).head
    assert(ps.isNullAt(0) && ps.getString(1) === "co.uk")
  }

  test("Psl.fromFile loads a PSL-format file") {
    val f = java.io.File.createTempFile("psl", ".dat")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("// test list")
    w.println("uk")
    w.println("co.uk")
    w.println("*.sch.uk")
    w.println("!known.sch.uk")
    w.close()
    val psl = Psl.fromFile(f.getPath)
    assert(psl.registrable("a.b.sch.uk") === "a.b.sch.uk")
    assert(psl.registrable("known.sch.uk") === "known.sch.uk")
    assert(psl.registrable("shop.co.uk") === "shop.co.uk")
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
