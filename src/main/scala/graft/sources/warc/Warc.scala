package graft.sources.warc

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException,
  InputStream}
import java.nio.charset.StandardCharsets
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Pure-JVM WARC (ISO 28500 / WARC 1.0–1.1) record model, stream
  * parser, and fixture writer.
  *
  * WARC is the canonical web-crawl interchange format (Common Crawl,
  * Internet Archive) and therefore the ingest format of a large-scale
  * training-data pipeline. A record is an ASCII header block
  * (`WARC/1.0\r\n` + `Name: value` lines + blank line), a content
  * block of exactly `Content-Length` bytes, and a `\r\n\r\n` trailer.
  * Archives are usually member-concatenated gzip (`.warc.gz`, one
  * gzip member per record) — `GZIPInputStream` consumes concatenated
  * members natively, so one sequential pass decodes the whole file.
  *
  * The reference engine has no crawl ingest (its sources are
  * GeoLite2/RouteViews archives, `/root/reference/loader/loader.go`);
  * this module is part of the beyond-reference training-data surface.
  *
  * Scale shape: crawls ship as many ~1 GiB `.warc.gz` files; gzip
  * members have no mid-file sync marker, so the unit of parallelism
  * is the FILE (the industry pattern — Common Crawl fans out one task
  * per archive). The [[WarcDataSource]] plans one partition per file
  * and streams records without ever materializing more than one
  * content block, so executor memory is bounded by the largest single
  * record, not the file.
  */
object Warc {

  /** One parsed record. `payload` is the HTTP body for `response`
    * records whose block is an HTTP message, else the raw block;
    * `httpStatus`/`httpContentType` come from the embedded HTTP
    * header when present. `payload` is null when the reader was told
    * to skip it (column pruned).
    */
  final case class Record(
      file: String,
      recordIndex: Long,
      warcType: String,
      recordId: String,
      targetUri: String,
      date: String,
      contentType: String,
      contentLength: Long,
      httpStatus: Option[Int],
      httpContentType: Option[String],
      payload: Array[Byte])

  /** Reads one CRLF-terminated header line; None at clean EOF.
    * Decoded UTF-8 — WARC 1.1 allows UTF-8 header values (non-ASCII
    * target URIs), and UTF-8 is ASCII-transparent for 1.0 files.
    */
  private def readLine(in: InputStream): Option[String] = {
    val buf = new ByteArrayOutputStream(96)
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') { buf.write(c); c = in.read() }
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes.last == '\r') bytes.length - 1
            else bytes.length
    Some(new String(bytes, 0, n, UTF_8))
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val k = in.read(out, off, n - off)
      if (k < 0) throw new EOFException(
        s"WARC content block truncated at $off/$n bytes")
      off += k
    }
    out
  }

  /** Skips exactly n bytes (payload pruned away). */
  private def skipFully(in: InputStream, n: Long): Unit = {
    var left = n
    while (left > 0) {
      val k = in.skip(left)
      if (k > 0) left -= k
      else if (in.read() < 0) throw new EOFException(
        s"WARC content block truncated with $left bytes left")
      else left -= 1
    }
  }

  /** Iterates records off a (possibly member-concatenated gzip)
    * stream. `wantPayload=false` skips content blocks without
    * allocating them — the column-pruned scan path. `tolerant=true`
    * turns a mid-record truncation into end-of-iteration instead of a
    * throw (the corrupt-tail-file budget, same stance as the CSV
    * error budget in SURVEY §2.1 S4).
    */
  def records(
      in0: InputStream,
      file: String,
      wantPayload: Boolean,
      tolerant: Boolean = false,
      keep: Record => Boolean = _ => true): Iterator[Record] = {
    val gz = file.endsWith(".gz")
    val in = new BufferedInputStream(
      if (gz) new GZIPInputStream(in0, 1 << 16) else in0, 1 << 16)
    new Iterator[Record] {
      private var nextRec: Record = _
      private var done = false
      private var recIndex = 0L

      /** Returns the next record PASSING `keep`, or null at EOF. The
        * predicate sees the record with `payload == null` — every
        * header field (incl. the embedded HTTP status line) is parsed
        * before the body, so a rejected record's body is SKIPPED, not
        * read: pushed filters save payload I/O and allocation, not
        * just row construction.
        */
      private def parseNext(): Record = {
        var out: Record = null
        var eof = false
        while (out == null && !eof) { out = parseOne(); eof = atEof }
        out
      }
      private var atEof = false

      /** Parses ONE record; null means either EOF (`atEof` set) or a
        * record rejected by `keep` (body skipped — caller loops).
        */
      private def parseOne(): Record = {
        // seek the version line, skipping inter-record blank lines
        var line = readLine(in)
        while (line.exists(_.isEmpty)) line = readLine(in)
        line match {
          case None => atEof = true; null
          case Some(v) if !v.startsWith("WARC/") =>
            if (tolerant) { atEof = true; null }
            else throw new IllegalArgumentException(
              s"$file: expected WARC version line, got '${v.take(40)}'")
          case Some(_) =>
            var warcType, recordId, targetUri, date, contentType = ""
            var contentLength = -1L
            var h = readLine(in).getOrElse(
              throw new EOFException(s"$file: EOF in WARC header"))
            while (h.nonEmpty) {
              val i = h.indexOf(':')
              if (i > 0) {
                val name = h.substring(0, i).trim.toLowerCase
                val value = h.substring(i + 1).trim
                name match {
                  case "warc-type" => warcType = value
                  case "warc-record-id" => recordId = value
                  case "warc-target-uri" => targetUri = value
                  case "warc-date" => date = value
                  case "content-type" => contentType = value
                  case "content-length" => contentLength = value.toLong
                  case _ => ()
                }
              }
              h = readLine(in).getOrElse(
                throw new EOFException(s"$file: EOF in WARC header"))
            }
            require(contentLength >= 0, s"$file: record without Content-Length")
            require(contentLength <= Int.MaxValue,
              s"$file: content block over 2 GiB unsupported")
            val isHttp = warcType == "response" &&
              contentType.startsWith("application/http")
            var httpStatus: Option[Int] = None
            var httpCt: Option[String] = None
            var bodyLen = contentLength
            if (isHttp) {
              // HTTP header lines are part of the content block;
              // read them line-by-line, body = remainder.
              var consumed = 0L
              def rl(): String = {
                val buf = new ByteArrayOutputStream(96)
                var c = in.read()
                while (c >= 0 && c != '\n') { buf.write(c); c = in.read() }
                if (c < 0) throw new EOFException(s"$file: EOF in HTTP header")
                consumed += buf.size() + 1
                val b = buf.toByteArray
                val n = if (b.nonEmpty && b.last == '\r') b.length - 1
                        else b.length
                new String(b, 0, n, US_ASCII)
              }
              val status = rl()
              httpStatus = status.split(" ").lift(1).flatMap(s =>
                scala.util.Try(s.toInt).toOption)
              var hl = rl()
              while (hl.nonEmpty) {
                val i = hl.indexOf(':')
                if (i > 0 && hl.substring(0, i).trim
                      .equalsIgnoreCase("content-type"))
                  httpCt = Some(hl.substring(i + 1).trim)
                hl = rl()
              }
              bodyLen = contentLength - consumed
              require(bodyLen >= 0, s"$file: HTTP header overruns block")
            }
            val pre = Record(file, recIndex, warcType, recordId, targetUri,
              date, contentType, contentLength, httpStatus, httpCt, null)
            recIndex += 1
            if (!keep(pre)) { skipFully(in, bodyLen); null }
            else if (wantPayload)
              pre.copy(payload = readFully(in, bodyLen.toInt))
            else { skipFully(in, bodyLen); pre }
        }
      }

      override def hasNext: Boolean = {
        if (done) return false
        if (nextRec == null) {
          nextRec =
            try parseNext()
            catch {
              // the tolerant budget covers truncation AND mid-file
              // header corruption (non-numeric / missing
              // Content-Length surfaces as NumberFormatException /
              // require's IllegalArgumentException): iteration stops
              // at the last clean record either way
              case _: EOFException if tolerant => null
              case _: java.util.zip.ZipException if tolerant => null
              case _: NumberFormatException if tolerant => null
              case _: IllegalArgumentException if tolerant => null
            }
          if (nextRec == null) { done = true; in.close() }
        }
        nextRec != null
      }
      override def next(): Record = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Fixture record for [[build]]. */
  final case class Entry(
      warcType: String,
      recordId: String,
      targetUri: String,
      date: String,
      httpStatus: Int,
      httpContentType: String,
      body: Array[Byte])

  /** Serializes entries to WARC bytes; `gzip=true` emits one gzip
    * member per record (the `.warc.gz` convention, which is what
    * makes per-record random access possible given an offset index).
    */
  def build(entries: Seq[Entry], gzip: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream(4096)
    entries.foreach { e =>
      val isResp = e.warcType == "response"
      val httpHeader =
        if (isResp)
          (s"HTTP/1.1 ${e.httpStatus} OK\r\n" +
            s"Content-Type: ${e.httpContentType}\r\n" +
            s"Content-Length: ${e.body.length}\r\n\r\n").getBytes(US_ASCII)
        else Array.emptyByteArray
      val block = httpHeader ++ e.body
      val header =
        ("WARC/1.0\r\n" +
          s"WARC-Type: ${e.warcType}\r\n" +
          s"WARC-Record-ID: ${e.recordId}\r\n" +
          (if (e.targetUri.nonEmpty) s"WARC-Target-URI: ${e.targetUri}\r\n"
           else "") +
          s"WARC-Date: ${e.date}\r\n" +
          (if (isResp)
             "Content-Type: application/http;msgtype=response\r\n"
           else "Content-Type: application/warc-fields\r\n") +
          s"Content-Length: ${block.length}\r\n\r\n").getBytes(UTF_8)
      val recBytes = header ++ block ++ "\r\n\r\n".getBytes(US_ASCII)
      if (gzip) {
        val g = new GZIPOutputStream(out, 1 << 14)
        g.write(recBytes); g.finish(); g.close()
      } else out.write(recBytes)
    }
    out.toByteArray
  }

  /** Charset of an HTTP payload, WHATWG-sniff precedence: byte-order
    * mark beats the `Content-Type; charset=` header param beats an
    * in-document `<meta … charset=…>` declaration (scanned in the
    * first 1024 bytes, latin-1-decoded so arbitrary bytes can't
    * break the scan) beats the UTF-8 default. Returned lowercase
    * with the common latin-1 aliases normalized.
    */
  def detectCharset(httpContentType: Option[String],
      payload: Array[Byte]): String = {
    def b(i: Int): Int = payload(i) & 0xff
    if (payload != null && payload.length >= 3 &&
      b(0) == 0xEF && b(1) == 0xBB && b(2) == 0xBF) "utf-8"
    else if (payload != null && payload.length >= 2 &&
      b(0) == 0xFF && b(1) == 0xFE) "utf-16le"
    else if (payload != null && payload.length >= 2 &&
      b(0) == 0xFE && b(1) == 0xFF) "utf-16be"
    else {
      val fromHeader = httpContentType.flatMap(charsetParam)
      val fromMeta =
        if (fromHeader.isDefined || payload == null) None
        else {
          val n = math.min(payload.length, 1024)
          metaCharsetParam(
            new String(payload, 0, n, StandardCharsets.ISO_8859_1))
        }
      fromHeader.orElse(fromMeta).getOrElse("utf-8")
    }
  }

  private val CharsetRe =
    "(?i)charset\\s*=\\s*[\"']?([a-z0-9_.:\\-]+)".r

  /** `charset=` anywhere inside a `<meta ...>` tag — both the HTML5
    * form `<meta charset=utf-8>` and the legacy http-equiv form
    * `<meta http-equiv=... content="text/html; charset=utf-8">`.
    * Anchored to the tag so an incidental `charset=` in body text, a
    * link URL, or a JS string can't override the UTF-8 default (the
    * WHATWG sniff only honors meta declarations).
    */
  private val MetaCharsetRe =
    "(?i)<meta[^>]*charset\\s*=\\s*[\"']?([a-z0-9_.:\\-]+)".r

  private def charsetParam(s: String): Option[String] =
    CharsetRe.findFirstMatchIn(s).map(m => normCharset(m.group(1)))

  private def metaCharsetParam(s: String): Option[String] =
    MetaCharsetRe.findFirstMatchIn(s).map(m => normCharset(m.group(1)))

  private def normCharset(raw: String): String = raw.toLowerCase match {
    case "latin1" | "latin-1" | "iso8859-1" | "l1" => "iso-8859-1"
    case "utf8" => "utf-8"
    case x => x
  }

  private def charsetFor(name: String): java.nio.charset.Charset =
    try java.nio.charset.Charset.forName(name)
    catch { case _: Exception => UTF_8 }

  /** WET-style plain text of an HTML document: script/style blocks
    * and tags stripped, the five common entities decoded, whitespace
    * collapsed, BOM char dropped. Same regex semantics as the q168
    * declared query so both stay oracle-replicable.
    */
  def extractText(html: String): String = {
    val noBom =
      if (html.nonEmpty && html.charAt(0) == '\uFEFF') html.substring(1)
      else html
    noBom
      .replaceAll("(?is)<script.*?</script>|<style.*?</style>", " ")
      .replaceAll("<[^>]*>", " ")
      .replaceAll("&amp;", "&").replaceAll("&lt;", "<")
      .replaceAll("&gt;", ">").replaceAll("&quot;", "\"")
      .replaceAll("&nbsp;", " ")
      .replaceAll("\\s+", " ").trim
  }

  /** The DataSource's `text` column: HTML payloads are charset-
    * decoded ([[detectCharset]]) then boilerplate-stripped
    * ([[extractText]]); other `text/ *` payloads decode as-is (BOM
    * dropped, whitespace preserved); non-text payloads are NULL.
    */
  def payloadText(httpContentType: Option[String],
      payload: Array[Byte]): String = {
    if (payload == null) return null
    val ct = httpContentType.map(_.toLowerCase).getOrElse("")
    lazy val decoded =
      new String(payload, charsetFor(detectCharset(httpContentType, payload)))
    if (ct.contains("html")) extractText(decoded)
    else if (ct.startsWith("text/")) {
      if (decoded.nonEmpty && decoded.charAt(0) == '\uFEFF')
        decoded.substring(1)
      else decoded
    } else null
  }

  /** Deterministic HTML body for fixtures: title + n paragraphs whose
    * text derives from (key, i) — same determinism discipline as the
    * q67/q76 blob builders.
    */
  def fixtureHtml(key: Int, paragraphs: Int): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(s"<html><head><title>Doc $key</title>")
    sb.append("<style>body{color:red}</style></head><body>")
    var i = 0
    while (i < paragraphs) {
      sb.append(s"<p>paragraph ${key * 31 + i} of document $key ")
      sb.append("lorem " * ((key + i) % 3 + 1))
      sb.append("</p>")
      i += 1
    }
    sb.append("<script>var x=1;</script></body></html>")
    sb.toString.getBytes(UTF_8)
  }

  /** The four charset-declaration modes a crawl actually mixes, keyed
    * `key % 4`: (0) UTF-8 via `<meta charset>`, (1) ISO-8859-1 via
    * `<meta http-equiv>`, (2) windows-1252 via the HTTP Content-Type
    * param (body carries NO meta), (3) UTF-16LE via BOM. Returns
    * (httpContentType, bodyBytes); the decoded TEXT is charset-
    * independent — "Café número N naïve –" + padding words — so an
    * oracle rebuilds it with string arithmetic while the bytes differ
    * per mode.
    */
  def fixtureHtmlCharset(key: Int): (String, Array[Byte]) = {
    val text = s"Café número $key naïve ${"söt " * (key % 3 + 1)}end"
    val mode = key % 4
    val meta = mode match {
      case 0 => "<meta charset=\"utf-8\">"
      case 1 => "<meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=ISO-8859-1\">"
      case _ => ""
    }
    val html = s"<html><head>$meta<title>x</title></head>" +
      s"<body><p>$text</p><script>var y=2;</script></body></html>"
    mode match {
      case 0 => ("text/html", html.getBytes(UTF_8))
      case 1 => ("text/html", html.getBytes(StandardCharsets.ISO_8859_1))
      case 2 => ("text/html; charset=windows-1252",
        html.getBytes(java.nio.charset.Charset.forName("windows-1252")))
      case _ => ("text/html",
        ("\uFEFF" + html).getBytes(StandardCharsets.UTF_16LE))
    }
  }
}
