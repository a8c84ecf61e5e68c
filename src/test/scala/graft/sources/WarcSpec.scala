package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.warc.Warc

/** WARC DataSource V2: round-trip fidelity, column pruning and filter
  * pushdown REACHING the scan (plan-asserted, the parquet-discipline
  * bar from SURVEY §4), tolerant truncation, multi-file parallelism.
  */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def entry(k: Int, uri: String, status: Int = 200,
      body: String = ""): Warc.Entry =
    Warc.Entry("response", s"<urn:uuid:rec-$k>", uri,
      "2024-01-15T10:00:00Z", status, "text/html",
      (if (body.isEmpty) s"<html><body>doc $k</body></html>" else body)
        .getBytes("UTF-8"))

  private def writeFixture(gzip: Boolean): String = {
    val dir = Files.createTempDirectory("graft-warc")
    val ext = if (gzip) ".warc.gz" else ".warc"
    (0 until 3).foreach { f =>
      val entries =
        Warc.Entry("warcinfo", s"<urn:uuid:info-$f>", "",
          "2024-01-15T09:00:00Z", 0, "",
          s"software: graft-test $f\r\n".getBytes("UTF-8")) +:
        (0 until 5).map(i => entry(f * 10 + i,
          s"https://site$f.example/page$i",
          status = if (i == 4) 404 else 200))
      Files.write(dir.resolve(f"part-$f%05d$ext"),
        Warc.build(entries, gzip))
    }
    dir.toString
  }

  test("round-trip: gzip and plain files parse to identical rows") {
    val plain = spark.read.format("warc").load(writeFixture(gzip = false))
    val gz = spark.read.format("warc").load(writeFixture(gzip = true))
    assert(plain.count() === 18) // 3 files × (1 warcinfo + 5 responses)
    val norm = (df: org.apache.spark.sql.DataFrame) => df
      .select(col("record_index"), col("warc_type"), col("record_id"),
        col("target_uri"), col("warc_date"), col("content_length"),
        col("http_status"), col("http_content_type"),
        decode(col("payload"), "UTF-8").as("body"))
      .orderBy("record_id").collect().toSeq
    assert(norm(plain) === norm(gz))
    val r = plain.filter(col("record_id") === "<urn:uuid:rec-11>")
      .select(decode(col("payload"), "UTF-8"), col("http_status"),
        col("http_content_type"), col("target_uri")).head
    assert(r.getString(0) === "<html><body>doc 11</body></html>")
    assert(r.getInt(1) === 200)
    assert(r.getString(2) === "text/html")
    assert(r.getString(3) === "https://site1.example/page1")
  }

  test("column pruning and filter pushdown reach the scan") {
    val df = spark.read.format("warc").load(writeFixture(gzip = true))
      .filter(col("warc_type") === "response" && col("http_status") === 200)
      .select("target_uri", "content_length")
    val plan = df.queryExecution.executedPlan.toString
    // DSv2 scan description carries our pushed filters + read schema
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("EqualTo(warc_type,response)"), plan)
    assert(plan.contains("EqualTo(http_status,200)"), plan)
    assert(!plan.contains("payload:"), s"payload not pruned:\n$plan")
    assert(df.count() === 12) // 4 × 200-status per file × 3
    // warcinfo records have null target_uri (absent header)
    val all = spark.read.format("warc").load(writeFixture(gzip = true))
    assert(all.filter(col("target_uri").isNull).count() === 3)
  }

  test("pushed prefix filter selects one site") {
    val df = spark.read.format("warc").load(writeFixture(gzip = true))
      .filter(col("target_uri").startsWith("https://site2.example/"))
    assert(df.count() === 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("StringStartsWith(target_uri,https://site2"), plan)
  }

  test("tolerant mode treats a truncated tail record as EOF") {
    val dir = Files.createTempDirectory("graft-warc-trunc")
    val whole = Warc.build(
      (0 until 4).map(i => entry(i, s"https://t.example/$i")),
      gzip = false)
    // cut mid-way through the last record's body
    Files.write(dir.resolve("part-00000.warc"),
      whole.take(whole.length - 20))
    val strict = spark.read.format("warc").load(dir.toString)
    intercept[org.apache.spark.SparkException] { strict.count() }
    val tolerant = spark.read.format("warc")
      .option("tolerant", "true").load(dir.toString)
    assert(tolerant.count() === 3)
  }

  test("one input partition per archive file") {
    val df = spark.read.format("warc").load(writeFixture(gzip = true))
    assert(df.rdd.getNumPartitions === 3)
  }

  test("charset detection: BOM > header param > meta declaration > " +
      "UTF-8 default, and text decodes per-record") {
    val dir = Files.createTempDirectory("graft-warc-cs")
    val recs = (0 until 8).map { n =>
      val (ct, body) = Warc.fixtureHtmlCharset(n)
      Warc.Entry("response", f"<urn:uuid:cs-$n%03d>",
        s"https://cs$n.example/", "2024-01-15T10:00:00Z", 200, ct, body)
    }
    Files.write(dir.resolve("part-0.warc.gz"), Warc.build(recs, gzip = true))
    val rows = spark.read.format("warc").load(dir.toString)
      .select("record_id", "charset", "text")
      .orderBy("record_id").collect()
    val wantCs = Seq("utf-8", "iso-8859-1", "windows-1252", "utf-16le")
    rows.zipWithIndex.foreach { case (r, n) =>
      assert(r.getString(1) === wantCs(n % 4), s"record $n")
      val want = s"x Café número $n naïve ${"söt " * (n % 3 + 1)}end"
      assert(r.getString(2) === want, s"record $n")
    }
  }

  test("detectCharset unit edges: UTF-16BE BOM, header alias " +
      "normalization, meta scan window, and the UTF-8 default") {
    import java.nio.charset.StandardCharsets
    def d(ct: Option[String], body: Array[Byte]): String =
      Warc.detectCharset(ct, body)
    // BE BOM (no LE fixture mode covers this branch)
    assert(d(None, ("\uFEFFhi").getBytes(StandardCharsets.UTF_16BE))
      === "utf-16be")
    // BOM beats a contradicting header param
    assert(d(Some("text/html; charset=iso-8859-1"),
      ("\uFEFFhi").getBytes(StandardCharsets.UTF_16LE)) === "utf-16le")
    // header aliases normalize
    assert(d(Some("text/html; charset=LATIN1"), "x".getBytes) ===
      "iso-8859-1")
    assert(d(Some("text/html; charset=UTF8"), "x".getBytes) === "utf-8")
    // meta outside the 1024-byte sniff window is ignored → default
    val far = (" " * 1100) +
      "<meta charset=\"iso-8859-1\"><html></html>"
    assert(d(Some("text/html"), far.getBytes) === "utf-8")
    // quoted meta value inside the window
    val near = "<html><head><meta charset='windows-1252'></head>"
    assert(d(Some("text/html"), near.getBytes) === "windows-1252")
    // nothing declared → UTF-8
    assert(d(Some("text/html"), "<html>plain</html>".getBytes) ===
      "utf-8")
  }

  test("text column without payload still forces the body read; " +
      "body-derived filters are NOT pushed") {
    val dir = Files.createTempDirectory("graft-warc-txt")
    val recs = (0 until 3).map { n =>
      val (ct, body) = Warc.fixtureHtmlCharset(n)
      Warc.Entry("response", f"<urn:uuid:t-$n>",
        s"https://t$n.example/", "2024-01-15T10:00:00Z", 200, ct, body)
    }
    Files.write(dir.resolve("part-0.warc.gz"), Warc.build(recs, gzip = true))
    val df = spark.read.format("warc").load(dir.toString)
      .filter(col("text").contains("Café")) // body-derived: residual
      .select(col("record_id"), length(col("text")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // the text predicate must stay OUT of PushedFilters (it would
    // otherwise be evaluated before the body exists)
    val pushedList = "PushedFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("MISSING")
    assert(!pushedList.contains("text"), pushedList)
    assert(df.count() === 3)
  }

  test("tolerant mode also stops at a corrupt mid-file header") {
    val dir = Files.createTempDirectory("graft-warc-corrupt")
    val good = Warc.build(
      (0 until 3).map(i => entry(i, s"https://c.example/$i")),
      gzip = false)
    val corrupt = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: not-a-number\r\n\r\n").getBytes("US-ASCII")
    Files.write(dir.resolve("part-00000.warc"), good ++ corrupt)
    val strict = spark.read.format("warc").load(dir.toString)
    intercept[org.apache.spark.SparkException] { strict.count() }
    val tolerant = spark.read.format("warc")
      .option("tolerant", "true").load(dir.toString)
    assert(tolerant.count() === 3)
  }

  test("pushed string range filters follow UTF-8 binary order on " +
      "supplementary-plane characters") {
    val dir = Files.createTempDirectory("graft-warc-utf")
    // U+FFFD (BMP, 3-byte UTF-8) vs U+10000 (supplementary, 4-byte):
    // UTF-16 code-unit order puts U+10000 (surrogate D800) BELOW
    // U+FFFD; UTF-8 binary order puts it ABOVE
    val uris = Seq("https://x.example/�", "https://x.example/𐀀")
    val recs = uris.zipWithIndex.map { case (u, i) =>
      entry(i, u)
    }
    Files.write(dir.resolve("part-0.warc"), Warc.build(recs, gzip = false))
    val got = spark.read.format("warc").load(dir.toString)
      .filter(col("target_uri") > s"https://x.example/�")
      .select("target_uri").collect().map(_.getString(0)).toSeq
    // Spark's own semantics (UTF8String binary): the supplementary
    // char sorts above U+FFFD, so exactly that row survives
    assert(got === Seq("https://x.example/𐀀"))
  }

  test("payload-pruned scan still evaluates body-independent filters") {
    // metadata-only aggregate over a pushed warc_type filter
    val got = spark.read.format("warc").load(writeFixture(gzip = true))
      .filter(col("warc_type") === "response")
      .agg(sum("content_length")).head.getLong(0)
    val want = spark.read.format("warc").load(writeFixture(gzip = true))
      .filter(col("warc_type") === "response")
      .select(octet_length(col("payload")).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    // content_length covers the embedded HTTP header too, so it is
    // strictly larger than the body bytes
    assert(got > want)
  }
}
