package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset, functions => F}

/** HTTP response parsing + robots.txt evaluation — the two protocol-level
  * steps between the WARC container ([[Warc]]) and HTML extraction in a
  * crawl-ingest pipeline: a `response` record's payload is a full HTTP
  * message (status line, headers, body), and whether a URL's content may be
  * used at all is decided by its host's robots policy (RFC 9309).
  *
  * Both are per-row byte/string work: a `flatMap`/projection with ZERO
  * shuffle at any corpus size. Bodies leave [[Http.parseResponse]] as an
  * md5 digest + length — the same metadata-sized-exchange discipline as the
  * WARC parser. Reference anchor: chilon starts from ready-made RDF dumps
  * (`/root/reference/src/main.rs`); the web-scale KG build owns these
  * earlier stages itself.
  */
object Http {

  /** One parsed HTTP response (body reduced to digest + length). */
  final case class HttpResp(
      doc_id: Long,
      status: Int,
      reason: String,
      content_type: String,
      charset: String,
      n_headers: Int,
      body_len: Long,
      body_md5: String)

  /** Parsed status line + headers of one message at `bytes[off, off+len)`;
    * `bodyStart` is absolute. Internal form shared by [[parseResponse]] and
    * the fused ingest chain ([[Ingest]]) — body bytes never leave the
    * narrow stage that holds them.
    */
  final case class Head(
      status: Int,
      reason: String,
      mediaType: String,
      charset: String,
      nHeaders: Int,
      bodyStart: Int)

  /** Parse the head of one HTTP/1.x response message in a byte range.
    * Header names are case-insensitive; the media type is lowercased with
    * its parameters stripped; `charset` is the lowercased `charset=`
    * parameter ("" when absent). Returns None on a malformed status line or
    * a missing blank line (a truthful parse failure, never a fabricated
    * record).
    */
  def parseHead(bytes: Array[Byte], off: Int, len: Int): Option[Head] = {
    val s = new String(bytes, off, len, "ISO-8859-1")
    val headEnd = s.indexOf("\r\n\r\n")
    if (headEnd < 0) return None
    val lines = s.substring(0, headEnd).split("\r\n", -1)
    val status = lines.head.split(" ", 3)
    if (status.length < 2 || !status(0).startsWith("HTTP/")) return None
    val code = try status(1).toInt catch { case _: NumberFormatException => return None }
    val reason = if (status.length == 3) status(2) else ""
    var ctypeRaw = ""
    var n = 0
    lines.tail.foreach { line =>
      val colon = line.indexOf(':')
      if (colon > 0) {
        n += 1
        if (line.substring(0, colon).trim.equalsIgnoreCase("content-type"))
          ctypeRaw = line.substring(colon + 1).trim
      }
    }
    val parts = ctypeRaw.split(";").map(_.trim)
    val mediaType = parts.headOption.getOrElse("").toLowerCase
    val charset = parts.tail
      .find(_.toLowerCase.startsWith("charset="))
      .map(_.substring("charset=".length).trim.toLowerCase.stripPrefix("\"").stripSuffix("\""))
      .getOrElse("")
    Some(Head(code, reason, mediaType, charset, n, off + headEnd + 4))
  }

  /** Lowercased value of header `name` in the head block at
    * `bytes[off, off+len)`, "" when absent — the probe [[decodeBody]] uses
    * for `Transfer-Encoding` / `Content-Encoding` without widening the
    * shared [[Head]] shape.
    */
  def headerValue(bytes: Array[Byte], off: Int, len: Int, name: String): String = {
    val s = new String(bytes, off, len, "ISO-8859-1")
    val headEnd = s.indexOf("\r\n\r\n")
    if (headEnd < 0) return ""
    s.substring(0, headEnd).split("\r\n", -1).iterator.drop(1).map { line =>
      val colon = line.indexOf(':')
      if (colon > 0 && line.substring(0, colon).trim.equalsIgnoreCase(name))
        line.substring(colon + 1).trim.toLowerCase
      else ""
    }.find(_.nonEmpty).getOrElse("")
  }

  /** Undo `Transfer-Encoding: chunked` framing on `bytes[from, to)`:
    * hex-size line (chunk extensions after ';' ignored per RFC 9112), chunk
    * bytes, CRLF, ..., terminated by a zero-size chunk. None on malformed
    * framing (bad hex, truncated chunk, missing CRLF) — truthful failure,
    * never a partial body.
    */
  def dechunk(bytes: Array[Byte], from: Int, to: Int): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var pos = from
    while (true) {
      var eol = pos
      while (eol + 1 < to && !(bytes(eol) == '\r' && bytes(eol + 1) == '\n')) eol += 1
      if (eol + 1 >= to) return None
      val sizeLine = new String(bytes, pos, eol - pos, "ISO-8859-1")
      val hexPart = sizeLine.takeWhile(_ != ';').trim
      val size = try Integer.parseInt(hexPart, 16)
        catch { case _: NumberFormatException => return None }
      if (size < 0) return None
      pos = eol + 2
      if (size == 0) return Some(out.toByteArray) // trailer section ignored
      if (pos + size + 2 > to) return None
      out.write(bytes, pos, size)
      pos += size
      if (!(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) return None
      pos += 2
    }
    None // unreachable
  }

  /** Undo `Content-Encoding: gzip`. None on corrupt streams. */
  def gunzip(b: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }

  /** Decoded message body of a response at `bytes[off, off+len)` whose head
    * is `h`: `Transfer-Encoding: chunked` framing is undone first, then
    * `Content-Encoding: gzip` (RFC order — transfer coding wraps content
    * coding). Identity encodings pass through. None when either layer is
    * malformed.
    *
    * Scale shape: like every protocol step in the ingest chain this is
    * per-row byte work inside the stage that holds the payload — callers
    * emit digests/lengths, not decoded bytes.
    */
  def decodeBody(bytes: Array[Byte], off: Int, len: Int, h: Head): Option[Array[Byte]] = {
    val chunked = headerValue(bytes, off, len, "transfer-encoding").contains("chunked")
    val gzipped = headerValue(bytes, off, len, "content-encoding").contains("gzip")
    val end = off + len
    val framed: Option[Array[Byte]] =
      if (chunked) dechunk(bytes, h.bodyStart, end)
      else Some(java.util.Arrays.copyOfRange(bytes, h.bodyStart, end))
    if (gzipped) framed.flatMap(gunzip) else framed
  }

  /** Parse one full HTTP/1.x response (body reduced to digest + length). */
  def parseResponse(docId: Long, bytes: Array[Byte]): Option[HttpResp] =
    parseHead(bytes, 0, bytes.length).map { h =>
      val bodyLen = bytes.length - h.bodyStart
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(bytes, h.bodyStart, bodyLen)
      val md5 = md.digest().map(b => f"${b & 0xff}%02x").mkString
      HttpResp(docId, h.status, h.reason, h.mediaType, h.charset, h.nHeaders,
        bodyLen.toLong, md5)
    }

  /** Responses of every row in `df` (`idCol` long, `respCol` binary). */
  def responses(df: DataFrame, idCol: String, respCol: String): Dataset[HttpResp] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(F.col(idCol).cast("long"), F.col(respCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        parseResponse(id, if (b == null) Array.emptyByteArray else b)
      }
  }
}

/** RFC 9309 robots-exclusion evaluation. A crawl corpus at 10^12 documents
  * carries ~10^8 distinct hosts' robots.txt files; the policy check is a
  * broadcast-sized table of parsed rule groups applied as a per-row
  * function — never a shuffle of the corpus.
  */
object Robots {

  /** One rule: `allow=false` is a Disallow. Empty path = matches nothing
    * (RFC 9309: an empty Disallow means allow-all, i.e. the rule never
    * matches, so the no-match default — allowed — applies).
    */
  final case class Rule(allow: Boolean, path: String)

  /** Parsed groups: lowercased agent token -> rules, in file order. */
  def parse(robotsTxt: String): Map[String, Vector[Rule]] = {
    val groups = scala.collection.mutable.Map.empty[String, Vector[Rule]]
    var currentAgents: List[String] = Nil
    var inHeader = false // consecutive User-agent lines share one group
    robotsTxt.split("\r?\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            val a = value.toLowerCase
            currentAgents = if (inHeader) a :: currentAgents else List(a)
            inHeader = true
            currentAgents.foreach(ag => groups.getOrElseUpdate(ag, Vector.empty))
          case "allow" | "disallow" =>
            inHeader = false
            if (value.nonEmpty && currentAgents.nonEmpty) {
              val r = Rule(allow = key == "allow", path = value)
              currentAgents.foreach(ag => groups(ag) = groups(ag) :+ r)
            }
          case _ => inHeader = false // crawl-delay, sitemap, unknown keys
        }
      }
    }
    groups.toMap
  }

  /** RFC 9309 verdict: pick the group for `agent` (exact lowercase token,
    * falling back to `*`), then the LONGEST rule path that prefixes `path`
    * wins; on an exact length tie, Allow wins; no matching rule = allowed.
    * Returns (allowed, matched rule path — "" when none matched).
    */
  def evaluate(groups: Map[String, Vector[Rule]], agent: String, path: String)
      : (Boolean, String) = {
    val rules = groups.getOrElse(agent.toLowerCase, groups.getOrElse("*", Vector.empty))
    val matching = rules.filter(r => path.startsWith(r.path))
    if (matching.isEmpty) (true, "")
    else {
      val best = matching.maxBy(r => (r.path.length, r.allow))
      (best.allow, best.path)
    }
  }

  /** One-call verdict on raw robots.txt text (parse + evaluate). */
  def isAllowed(robotsTxt: String, agent: String, path: String): (Boolean, String) =
    evaluate(parse(robotsTxt), agent, path)

  /** The production frontier gate: verdicts for a URL table against a
    * per-host policy table, crawling as ONE agent. Each DISTINCT host's
    * policy is parsed ONCE (the policy relation is host-vocabulary-sized —
    * ~10^8 rows at a 10^12-page crawl, never corpus-sized) and reduced to
    * the agent's effective rule list; the corpus then equi-joins on host
    * (AQE broadcasts a policy table that fits, hash-joins otherwise) and the
    * longest-match verdict evaluates per row over the joined rule array.
    * A URL whose host has no policy is allowed (RFC 9309 §2.3.1.4: absent
    * robots.txt means no restrictions).
    *
    * `urls` columns: `idCol` (long), `hostCol`, `pathCol`; `policies`
    * columns: `hostCol`, `robotsCol`. Output: (id, host, path, allowed,
    * matched_rule).
    */
  def frontierGate(
      urls: DataFrame,
      policies: DataFrame,
      agent: String,
      idCol: String = "doc_id",
      hostCol: String = "host",
      pathCol: String = "path",
      robotsCol: String = "robots_txt"): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val a = agent.toLowerCase
    val ruleTable = policies
      .select(F.col(hostCol).cast("string"), F.col(robotsCol).cast("string"))
      .as[(String, String)]
      .map { case (h, txt) =>
        val groups = parse(if (txt == null) "" else txt)
        val rules = groups.getOrElse(a, groups.getOrElse("*", Vector.empty))
        (h, rules.map(r => (r.allow, r.path)))
      }
      .toDF(hostCol, "rules")
    urls
      .select(F.col(idCol).cast("long"), F.col(hostCol).cast("string"),
        F.col(pathCol).cast("string"))
      .join(ruleTable, Seq(hostCol), "left")
      .select(F.col(idCol), F.col(hostCol), F.col(pathCol), F.col("rules"))
      .as[(Long, String, String, Option[Seq[(Boolean, String)]])]
      .map { case (id, h, p, rules) =>
        val matching = rules.getOrElse(Seq.empty).filter(r => p.startsWith(r._2))
        if (matching.isEmpty) (id, h, p, true, "")
        else {
          val best = matching.maxBy(r => (r._2.length, r._1))
          (id, h, p, best._1, best._2)
        }
      }
      .toDF(idCol, hostCol, pathCol, "allowed", "matched_rule")
  }
}
