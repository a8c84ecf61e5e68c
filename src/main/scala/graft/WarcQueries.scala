package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.UrlOps
import graft.sources.warc.Warc

/** Declared queries for the WARC DataSource V2
  * ([[graft.sources.warc.WarcDataSource]]): crawl-archive ingest is
  * the first stage of a web-scale training-data pipeline (Common
  * Crawl ships everything as `.warc.gz`), and these two queries pin
  * the full path — writer → gzip member stream → DSv2 scan (with
  * pruning/pushdown) → header fields + exact payload bytes →
  * HTML-to-text — under the DuckDB hash contract.
  *
  * Fixture recipe (the q67/q76 discipline): one `.warc.gz` per nation
  * key (25 files — dimension-scale driver synthesis), each holding a
  * warcinfo record plus `n%4+2` HTTP response records whose HTML
  * bodies derive deterministically from the key
  * ([[Warc.fixtureHtml]]), so the oracle REBUILDS every body with
  * string arithmetic and pins md5(payload), content_length (62-byte
  * HTTP header + digits + body), and the text-extraction counts.
  */
object WarcQueries {
  import Tables._

  private val FixtureDate = "2024-01-15T10:00:00Z"

  /** Writes the 25-file fixture tree; driver-side, dimension-scale. */
  private def warcFixture(s: SparkSession, d: String): String = {
    val keys = nation(s, d).select(col("n_nationkey")).collect()
      .map(_.getAs[Number](0).intValue).sorted
    val dir = java.nio.file.Files.createTempDirectory("graft-warc")
    keys.foreach { n =>
      val recs =
        Warc.Entry("warcinfo", f"<urn:uuid:info-$n%03d>", "",
          FixtureDate, 0, "",
          s"software: graft $n\r\n".getBytes("UTF-8")) +:
        (0 until (n % 4 + 2)).map { i =>
          Warc.Entry("response", f"<urn:uuid:rec-$n%03d-$i>",
            s"https://n$n.example/p$i", FixtureDate,
            if (i == 0 && n % 5 == 0) 404 else 200, "text/html",
            Warc.fixtureHtml(n * 10 + i, i % 3 + 1))
        }
      java.nio.file.Files.write(dir.resolve(f"part-$n%03d.warc.gz"),
        Warc.build(recs, gzip = true))
    }
    dir.toString
  }

  /** The shared DuckDB CTE rebuilding each response body exactly as
    * [[Warc.fixtureHtml]] does (ASCII only, so char = byte counts).
    */
  private val HtmlCte =
    """WITH k AS (SELECT CAST(n_nationkey AS INTEGER) AS n FROM nation),
      |recs AS (
      |  SELECT n, CAST(i AS INTEGER) AS i, n*10 + CAST(i AS INTEGER) AS key,
      |         CAST(i AS INTEGER) % 3 + 1 AS np
      |  FROM k, range(0, 6) t(i) WHERE i < n % 4 + 2),
      |paras AS (
      |  SELECT r.n, r.i, string_agg(
      |    '<p>paragraph ' || CAST(r.key*31 + j AS VARCHAR) ||
      |    ' of document ' || CAST(r.key AS VARCHAR) || ' ' ||
      |    repeat('lorem ', CAST((r.key + j) % 3 + 1 AS INTEGER)) || '</p>',
      |    '' ORDER BY j) AS body
      |  FROM recs r, range(0, 3) s(j) WHERE j < r.np
      |  GROUP BY r.n, r.i, r.key),
      |h AS (
      |  SELECT r.n, r.i,
      |    '<html><head><title>Doc ' || CAST(r.key AS VARCHAR) ||
      |    '</title><style>body{color:red}</style></head><body>' || p.body ||
      |    '<script>var x=1;</script></body></html>' AS html
      |  FROM paras p JOIN recs r ON r.n = p.n AND r.i = p.i)
      |""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    /** Metadata + exact-payload scan: every response record's header
      * fields and body md5 through the DSv2 reader. `warc_type` is a
      * PUSHED filter (evaluated before the body read — rejected
      * warcinfo blocks are skipped, not allocated); payload md5 pins
      * the gzip-member framing, HTTP-header split, and
      * Content-Length accounting bit-for-bit.
      */
    "q167_warc_scan" -> ((s, d) => {
      val dir = warcFixture(s, d)
      s.read.format("warc").load(dir)
        .filter(col("warc_type") === "response")
        .select(col("record_id"), col("target_uri"),
          col("http_status").cast("long").as("http_status"),
          col("content_length"),
          octet_length(col("payload")).cast("long").as("body_len"),
          md5(col("payload")).as("body_md5"))
        .orderBy("record_id")
    }),

    /** HTML→text extraction over the 200-status slice (both filters
      * pushed to the scan): drop script/style blocks, strip tags,
      * collapse whitespace — the boilerplate-removal first step of
      * every crawl-curation pipeline — then count chars, whitespace
      * tokens, and 'lorem' hits. Same regex semantics on both
      * engines (non-greedy alternation + global replace).
      */
    "q168_warc_text" -> ((s, d) => {
      val dir = warcFixture(s, d)
      s.read.format("warc").load(dir)
        .filter(col("warc_type") === "response" &&
          col("http_status") === 200)
        .select(col("record_id"),
          decode(col("payload"), "UTF-8").as("html"))
        .select(col("record_id"),
          trim(regexp_replace(regexp_replace(regexp_replace(col("html"),
            "<script>.*?</script>|<style>.*?</style>", " "),
            "<[^>]*>", " "), " +", " ")).as("text"))
        .select(col("record_id"),
          length(col("text")).cast("long").as("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          ((length(col("text")) -
            length(regexp_replace(col("text"), "lorem", ""))) / 5)
            .cast("long").as("n_lorem"))
        .orderBy("record_id")
    }),

    /** Mixed-charset crawl decode through the source's body-derived
      * columns: the fixture cycles the four charset-declaration modes
      * a real crawl mixes (meta charset → UTF-8, meta http-equiv →
      * ISO-8859-1, HTTP header param → windows-1252, BOM → UTF-16LE;
      * [[Warc.fixtureHtmlCharset]]) while every body DECODES to the
      * same accented text — so the oracle rebuilds `text` by string
      * arithmetic and the only way Spark matches is detecting each
      * record's charset correctly ([[Warc.detectCharset]]) before
      * the WET-style extraction ([[Warc.payloadText]]).
      */
    "q172_warc_charset" -> ((s, d) => {
      val dir = warcCharsetFixture(s, d)
      s.read.format("warc").load(dir)
        .filter(col("warc_type") === "response")
        .select(col("record_id"), col("charset"), col("text"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .withColumn("n_accents",
          (length(col("text")) -
            length(regexp_replace(col("text"), "[éúïö]", "")))
            .cast("long"))
        .orderBy("record_id")
    }),

    /** URL decomposition ([[UrlOps]]): host, explicit port, eTLD+1
      * (multi-part-suffix aware), path depth, query-param count —
      * over URLs synthesized arithmetically from doc_id, so the
      * oracle derives each field by CASE arithmetic INDEPENDENTLY of
      * the parser (it never re-runs the regexes — a real
      * ground-truth check, not a parity check). All codegen
      * built-ins; no UDF.
      */
    "q169_url_parse" -> ((s, d) => {
      val k = col("doc_id")
      val url = synthUrl(k)
      documents(s, d).select(k, url.as("url"))
        .select(k,
          UrlOps.host(col("url")).as("host"),
          UrlOps.port(col("url")).cast("long").as("port"),
          UrlOps.etld1(UrlOps.host(col("url"))).as("etld1"),
          UrlOps.pathDepth(col("url")).cast("long").as("path_depth"),
          UrlOps.queryParamCount(col("url")).cast("long").as("n_params"))
        .orderBy("doc_id")
    }),

    /** Per-domain cap ([[UrlOps.domainCap]]) — the domain-diversity
      * sampler: at most 8 docs per eTLD+1, chosen by md5(doc_id)
      * order (deterministic unbiased sample, the q53 hash-split
      * discipline). Output pins WHICH rows were kept (sum of kept
      * doc_ids), not just how many — the oracle replays the same
      * row_number window. One shuffle on domain; the preTrim shard
      * pass bounds a monster domain's single-task input at scale.
      */
    "q170_domain_caps" -> ((s, d) => {
      val k = col("doc_id")
      val base = documents(s, d).select(k, synthUrl(k).as("url"))
        .select(k, UrlOps.etld1(UrlOps.host(col("url"))).as("domain"),
          md5(k.cast("string")).as("h"))
      UrlOps.domainCap(base, col("domain"), col("h"), 8, preTrimFactor = 4)
        .groupBy("domain")
        .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("kept_sum"))
        .join(base.groupBy("domain").agg(count(lit(1)).as("n_total")),
          Seq("domain"))
        .select(col("domain"), col("n_total"), col("n_kept"),
          col("kept_sum"))
        .orderBy("domain")
    }))

  /** One-file mixed-charset fixture: per nation key, one response in
    * charset mode `n % 4` ([[Warc.fixtureHtmlCharset]]).
    */
  private def warcCharsetFixture(s: SparkSession, d: String): String = {
    val keys = nation(s, d).select(col("n_nationkey")).collect()
      .map(_.getAs[Number](0).intValue).sorted
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-cs")
    val recs = keys.map { n =>
      val (ct, body) = Warc.fixtureHtmlCharset(n)
      Warc.Entry("response", f"<urn:uuid:cs-$n%03d>",
        s"https://cs$n.example/", FixtureDate, 200, ct, body)
    }
    java.nio.file.Files.write(dir.resolve("part-000.warc.gz"),
      Warc.build(recs.toSeq, gzip = true))
    dir.toString
  }

  /** Deterministic absolute URL from doc_id: optional www, 40 slds ×
    * 5 tlds (incl. a multi-part suffix), optional :8443, 0–3 path
    * segments, optional 2-param query — every branch CASE-derivable.
    */
  private def synthUrl(k: org.apache.spark.sql.Column) = {
    val tld = element_at(
      typedLit(Seq("com", "org", "co.uk", "com.au", "io")),
      (pmod(k, lit(5)) + 1).cast("int"))
    concat(lit("https://"),
      when(pmod(k, lit(3)) === 0, lit("www.")).otherwise(lit("")),
      lit("s"), pmod(k, lit(40)).cast("string"), lit("."), tld,
      when(pmod(k, lit(11)) === 0, lit(":8443")).otherwise(lit("")),
      when(pmod(k, lit(4)) === 0, lit(""))
        .when(pmod(k, lit(4)) === 1, lit("/a"))
        .when(pmod(k, lit(4)) === 2, lit("/a/b"))
        .otherwise(lit("/a/b/c")),
      when(pmod(k, lit(7)) === 0, lit("?q=1&lang=en")).otherwise(lit("")))
  }

  val oracleSql: Map[String, String] = Map(
    "q167_warc_scan" -> (HtmlCte +
      """SELECT
        |  '<urn:uuid:rec-' || lpad(CAST(n AS VARCHAR), 3, '0') || '-' ||
        |    CAST(i AS VARCHAR) || '>' AS record_id,
        |  'https://n' || CAST(n AS VARCHAR) || '.example/p' ||
        |    CAST(i AS VARCHAR) AS target_uri,
        |  CAST(CASE WHEN i = 0 AND n % 5 = 0 THEN 404 ELSE 200 END
        |    AS BIGINT) AS http_status,
        |  CAST(62 + length(CAST(length(html) AS VARCHAR)) + length(html)
        |    AS BIGINT) AS content_length,
        |  CAST(length(html) AS BIGINT) AS body_len,
        |  md5(html) AS body_md5
        |FROM h ORDER BY record_id""".stripMargin),
    "q168_warc_text" -> (HtmlCte +
      """, txt AS (
        |  SELECT n, i, trim(regexp_replace(regexp_replace(regexp_replace(
        |    html, '<script>.*?</script>|<style>.*?</style>', ' ', 'g'),
        |    '<[^>]*>', ' ', 'g'), ' +', ' ', 'g')) AS text
        |  FROM h WHERE NOT (i = 0 AND n % 5 = 0))
        |SELECT
        |  '<urn:uuid:rec-' || lpad(CAST(n AS VARCHAR), 3, '0') || '-' ||
        |    CAST(i AS VARCHAR) || '>' AS record_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST((length(text) - length(replace(text, 'lorem', ''))) / 5
        |    AS BIGINT) AS n_lorem
        |FROM txt ORDER BY record_id""".stripMargin),
    // ground truth: decoded text + charset label rebuilt by CASE
    // arithmetic — only correct per-record charset detection on the
    // Spark side can reproduce these strings from the mixed bytes
    "q172_warc_charset" ->
      """WITH k AS (SELECT CAST(n_nationkey AS INTEGER) AS n FROM nation),
        |t AS (SELECT n,
        |  CASE n % 4 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'iso-8859-1'
        |    WHEN 2 THEN 'windows-1252' ELSE 'utf-16le' END AS charset,
        |  'x Café número ' || CAST(n AS VARCHAR) || ' naïve ' ||
        |    repeat('söt ', n % 3 + 1) || 'end' AS text
        |  FROM k)
        |SELECT '<urn:uuid:cs-' || lpad(CAST(n AS VARCHAR), 3, '0') ||
        |    '>' AS record_id,
        |  charset, text,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(length(text) -
        |    length(regexp_replace(text, '[éúïö]', '', 'g'))
        |    AS BIGINT) AS n_accents
        |FROM t ORDER BY record_id""".stripMargin,
    // ground truth derived by CASE arithmetic from doc_id — the
    // oracle never runs a URL parser, so a parser bug can't cancel out
    "q169_url_parse" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE doc_id % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
        |      WHEN 2 THEN 'co.uk' WHEN 3 THEN 'com.au' ELSE 'io' END AS tld,
        |    's' || CAST(doc_id % 40 AS VARCHAR) AS sld,
        |    doc_id % 3 = 0 AS www
        |  FROM documents)
        |SELECT doc_id,
        |  (CASE WHEN www THEN 'www.' ELSE '' END) || sld || '.' || tld
        |    AS host,
        |  CAST(CASE WHEN doc_id % 11 = 0 THEN 8443 END AS BIGINT) AS port,
        |  sld || '.' || tld AS etld1,
        |  CAST(doc_id % 4 AS BIGINT) AS path_depth,
        |  CAST(CASE WHEN doc_id % 7 = 0 THEN 2 ELSE 0 END AS BIGINT)
        |    AS n_params
        |FROM u ORDER BY doc_id""".stripMargin,
    "q170_domain_caps" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    's' || CAST(doc_id % 40 AS VARCHAR) || '.' ||
        |    CASE doc_id % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
        |      WHEN 2 THEN 'co.uk' WHEN 3 THEN 'com.au' ELSE 'io' END
        |      AS domain,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |r AS (SELECT doc_id, domain,
        |        row_number() OVER (PARTITION BY domain ORDER BY h) AS rn
        |      FROM b),
        |kept AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_kept,
        |           CAST(sum(doc_id) AS BIGINT) AS kept_sum
        |         FROM r WHERE rn <= 8 GROUP BY domain),
        |tot AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_total
        |        FROM b GROUP BY domain)
        |SELECT k.domain, t.n_total, k.n_kept, k.kept_sum
        |FROM kept k JOIN tot t ON k.domain = t.domain
        |ORDER BY k.domain""".stripMargin)
}
