package graft

import graft.extract.{Http, PageMeta, Robots}
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** HTTP response parsing, robots.txt evaluation (RFC 9309), page-metadata
  * harvest, and sitemap parsing — the protocol layer between the WARC
  * container and HTML extraction.
  */
class WebIngestSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val CRLF = "\r\n"

  // --------------------------------------------------------------------
  // HTTP
  // --------------------------------------------------------------------

  test("http: status/reason split, case-insensitive headers, media-type and " +
    "quoted charset params, body digest") {
    val msg = "HTTP/1.1 301 Moved Permanently" + CRLF +
      "LOCATION: https://x.example/new" + CRLF +
      "CoNtEnT-TyPe:  Text/HTML ; Charset=\"ISO-8859-1\" ; boundary=x" + CRLF +
      CRLF + "tiny body"
    val r = Http.parseResponse(1L, msg.getBytes("ISO-8859-1")).get
    assert(r.status == 301 && r.reason == "Moved Permanently")
    assert(r.content_type == "text/html" && r.charset == "iso-8859-1")
    assert(r.n_headers == 2 && r.body_len == "tiny body".length)
  }

  test("http: malformed status line / missing blank line -> None, never a " +
    "fabricated record") {
    assert(Http.parseResponse(1L, ("junk" + CRLF + CRLF).getBytes).isEmpty)
    assert(Http.parseResponse(1L, "HTTP/1.1 200 OK\r\nA: b".getBytes).isEmpty)
    assert(Http.parseResponse(1L, "HTTP/1.1 abc X\r\n\r\n".getBytes).isEmpty)
    // status line without a reason phrase is legal
    val r = Http.parseResponse(1L, ("HTTP/1.0 204" + CRLF + CRLF).getBytes).get
    assert(r.status == 204 && r.reason == "" && r.body_len == 0L)
  }

  // --------------------------------------------------------------------
  // robots.txt
  // --------------------------------------------------------------------

  private val policy =
    """# friendly crawler policy
      |User-agent: GraftBot
      |User-agent: otherbot
      |Disallow: /
      |Allow: /pub
      |
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/ok
      |Disallow:
      |Crawl-delay: 5
      |""".stripMargin

  test("robots: named group (shared by stacked user-agents, case-insensitive) " +
    "beats the * fallback; longest match wins") {
    assert(Robots.isAllowed(policy, "graftbot", "/pub/x") == (true, "/pub"))
    assert(Robots.isAllowed(policy, "OTHERBOT", "/anything") == (false, "/"))
    assert(Robots.isAllowed(policy, "stranger", "/private/no")._1 == false)
    assert(Robots.isAllowed(policy, "stranger", "/private/okay") == (true, "/private/ok"))
    assert(Robots.isAllowed(policy, "stranger", "/open") == (true, ""))
  }

  test("robots: empty Disallow matches nothing; allow wins an exact-length tie") {
    val p = "User-agent: *\nDisallow:\n"
    assert(Robots.isAllowed(p, "any", "/x") == (true, ""))
    val tie = "User-agent: *\nDisallow: /a\nAllow: /a\n"
    assert(Robots.isAllowed(tie, "any", "/a/b") == (true, "/a"))
    // no groups at all -> allowed
    assert(Robots.isAllowed("# empty file\n", "any", "/x") == (true, ""))
  }

  test("robots frontierGate: one parse per distinct host, agent group " +
    "preferred over *, absent policy allows, verdicts match isAllowed") {
    val policies = Seq(
      ("a.example", "User-agent: graftbot\nDisallow: /x\n\nUser-agent: *\nDisallow: /\n"),
      ("b.example", "User-agent: *\nDisallow: /priv/\nAllow: /priv/ok\n"))
      .toDF("host", "robots_txt")
    val urls = Seq(
      (1L, "a.example", "/x/1"),    // named group: disallowed by /x
      (2L, "a.example", "/y"),      // named group: no match -> allowed
      (3L, "b.example", "/priv/no"),// * group: disallowed
      (4L, "b.example", "/priv/okay"), // longer Allow wins
      (5L, "c.example", "/priv/no") // no policy -> allowed
    ).toDF("doc_id", "host", "path")
    val got = graft.extract.Robots.frontierGate(urls, policies, "GraftBot")
      .as[(Long, String, String, Boolean, String)].collect().sortBy(_._1).toSeq
    assert(got.map(r => (r._1, r._4, r._5)) == Seq(
      (1L, false, "/x"), (2L, true, ""), (3L, false, "/priv/"),
      (4L, true, "/priv/ok"), (5L, true, "")))
    // per-row parity with the single-policy evaluator
    got.filter(_._2 == "b.example").foreach { r =>
      val (a, rule) = graft.extract.Robots.isAllowed(
        "User-agent: *\nDisallow: /priv/\nAllow: /priv/ok\n", "graftbot", r._3)
      assert((a, rule) == ((r._4, r._5)))
    }
  }

  // --------------------------------------------------------------------
  // page metadata
  // --------------------------------------------------------------------

  test("metadata: both attribute orders and quote styles extract; decoy " +
    "metas don't bleed; absent fields come back empty") {
    val html =
      """<html><head><TITLE> My Page </TITLE>
        |<meta name="robots" content="noindex">
        |<meta content='The real description' name='description'>
        |<link href="https://c.example/x" rel='canonical'>
        |<meta property="og:title" content="OG name"/>
        |</head></html>""".stripMargin
    val row = Seq(html).toDF("h").select(
      PageMeta.title(F.col("h")).as("t"),
      PageMeta.metaContent(F.col("h"), "description").as("d"),
      PageMeta.metaContent(F.col("h"), "keywords").as("k"),
      PageMeta.canonicalLink(F.col("h")).as("c"),
      PageMeta.metaProperty(F.col("h"), "og:title").as("o"))
      .as[(String, String, String, String, String)].head()
    assert(row == (("My Page", "The real description", "",
      "https://c.example/x", "OG name")))
  }

  // --------------------------------------------------------------------
  // sitemap
  // --------------------------------------------------------------------

  test("sitemap: entries in order, whitespace-padded locs trimmed, optional " +
    "fields empty, loc-less urls skipped") {
    val xml =
      """<?xml version="1.0"?><urlset>
        |<url><loc>  https://a.example/1  </loc><lastmod>2024-01-02</lastmod></url>
        |<url><priority>0.9</priority></url>
        |<url><loc>https://a.example/2</loc><priority>0.5</priority></url>
        |</urlset>""".stripMargin
    val got = PageMeta.parseSitemap(9L, xml)
    assert(got.map(e => (e.url_idx, e.loc, e.lastmod, e.priority)) == Seq(
      (0, "https://a.example/1", "2024-01-02", ""),
      (1, "https://a.example/2", "", "0.5")))
    assert(PageMeta.parseSitemap(1L, "<html>not a sitemap</html>").isEmpty)
    assert(PageMeta.parseSitemap(1L, null).isEmpty)
  }

  // --------------------------------------------------------------------
  // fused ingest chain
  // --------------------------------------------------------------------

  private def segment(charset: String, html: String): Array[Byte] = {
    val body = html.getBytes(charset)
    val head = ("HTTP/1.1 200 OK" + CRLF +
      s"Content-Type: text/html; charset=$charset" + CRLF + CRLF)
      .getBytes("ISO-8859-1")
    val payload = head ++ body
    val warcHead = ("WARC/1.0" + CRLF + "WARC-Type: response" + CRLF +
      "WARC-Target-URI: http://i.example/x" + CRLF +
      s"Content-Length: ${payload.length}" + CRLF + CRLF).getBytes("ISO-8859-1")
    val meta = ("WARC/1.0" + CRLF + "WARC-Type: metadata" + CRLF +
      "Content-Length: 4" + CRLF + CRLF + "m: 1" + CRLF + CRLF).getBytes("ISO-8859-1")
    warcHead ++ payload ++ (CRLF + CRLF).getBytes ++ meta
  }

  test("ingest: declared charset is APPLIED — latin-1 and UTF-8 encodings of " +
    "the same accented page extract to the identical text; metadata records " +
    "are skipped") {
    val html = "<html><body><h1>Doc 7</h1><p>café Ü value 23</p></body></html>"
    val utf8 = graft.extract.Ingest.ingestSegment(1L, segment("UTF-8", html))
    val latin = graft.extract.Ingest.ingestSegment(2L, segment("ISO-8859-1", html))
    assert(utf8.size == 1 && latin.size == 1) // metadata record skipped
    val (a, b) = (utf8.head, latin.head)
    assert(a.charset == "utf-8" && b.charset == "iso-8859-1")
    assert(a.text_md5 == b.text_md5 && a.n_cp == b.n_cp)
    assert(a.status == 200 && a.content_type == "text/html" &&
      a.uri == "http://i.example/x")
    // the extracted text itself is the closed-form the oracle reconstructs
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest("Doc 7\ncafé Ü value 23".getBytes("UTF-8"))
      .map(x => f"${x & 0xff}%02x").mkString
    assert(a.text_md5 == want && a.n_cp == "Doc 7\ncafé Ü value 23".length)
    // a chain that IGNORED the charset would differ: latin-1 bytes decoded
    // as UTF-8 lose the accents to U+FFFD
    val wrong = new String(html.getBytes("ISO-8859-1"), "UTF-8")
    assert(wrong.contains('�') && wrong != html)
  }

  test("ingest: unknown charset label falls back to UTF-8; non-response-" +
    "shaped payloads (no HTTP head) are dropped truthfully") {
    val html = "<p>plain</p>"
    val seg = segment("UTF-8", html)
    val relabeled = new String(seg, "ISO-8859-1")
      .replace("charset=UTF-8", "charset=bogus-cs").getBytes("ISO-8859-1")
    val out = graft.extract.Ingest.ingestSegment(1L, relabeled)
    assert(out.size == 1 && out.head.charset == "utf-8")
    // response record whose payload is not an HTTP message -> no page
    val raw = ("WARC/1.0" + CRLF + "WARC-Type: response" + CRLF +
      "Content-Length: 5" + CRLF + CRLF + "xxxxx" + CRLF + CRLF).getBytes("ISO-8859-1")
    assert(graft.extract.Ingest.ingestSegment(1L, raw).isEmpty)
  }

  test("dechunk: multi-chunk bodies, chunk extensions, malformed frames") {
    def dc(s: String): Option[String] = {
      val b = s.getBytes("ISO-8859-1")
      Http.dechunk(b, 0, b.length).map(new String(_, "ISO-8859-1"))
    }
    assert(dc("5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n").contains("hello world"))
    assert(dc("5;x=1\r\nhello\r\n0\r\n\r\n").contains("hello")) // extension ignored
    assert(dc("0\r\n\r\n").contains("")) // empty body
    assert(dc("A\r\n0123456789\r\n0\r\n\r\n").contains("0123456789")) // hex size
    assert(dc("zz\r\nhello\r\n0\r\n\r\n").isEmpty) // bad hex
    assert(dc("9\r\nhello\r\n0\r\n\r\n").isEmpty) // size overruns CRLF position
    assert(dc("5\r\nhell").isEmpty) // truncated chunk
    assert(dc("5\r\nhello").isEmpty) // missing chunk CRLF
    assert(dc("5\r\nhelloXX0\r\n\r\n").isEmpty) // corrupt inter-chunk CRLF
  }

  test("decodeBody: layering order chunked(gzip(body)), identity passthrough") {
    val text = "compressed crawl body " * 20
    val gz = graft.queries.HttpBodyFixture.gzipBytes(text.getBytes("UTF-8"))
    val framed = graft.queries.HttpBodyFixture.chunkFrame(gz, 64, ext = false)
    val msg = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
      "Content-Encoding: gzip\r\n\r\n").getBytes("ISO-8859-1") ++ framed
    val h = Http.parseHead(msg, 0, msg.length).get
    val body = Http.decodeBody(msg, 0, msg.length, h).get
    assert(new String(body, "UTF-8") == text)
    // identity: body bytes pass through verbatim
    val plain = ("HTTP/1.1 200 OK\r\nContent-Length: 3\r\n\r\nabc").getBytes("ISO-8859-1")
    val hp = Http.parseHead(plain, 0, plain.length).get
    assert(Http.decodeBody(plain, 0, plain.length, hp)
      .map(new String(_, "UTF-8")).contains("abc"))
    // corrupt gzip stream -> truthful None
    val bad = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot-gzip")
      .getBytes("ISO-8859-1")
    val hb = Http.parseHead(bad, 0, bad.length).get
    assert(Http.decodeBody(bad, 0, bad.length, hb).isEmpty)
  }
}
