package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset, functions => F}

/** WARC (Web ARChive, ISO 28500) container parsing — the wire format
  * Common Crawl actually ships. A crawl segment is a sequence of records:
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: response\r\n
  * WARC-Target-URI: http://...\r\n
  * Content-Length: N\r\n
  * ...more named headers...\r\n
  * \r\n
  * <N payload bytes>\r\n\r\n
  * }}}
  *
  * The parser is length-delimited, exactly as the spec requires: after the
  * header block, `Content-Length` bytes are consumed VERBATIM — a payload
  * containing the literal string "WARC/1.0" must not resync the scanner
  * (HTML pages quoting WARC examples exist in the real crawl). Header names
  * are case-insensitive per RFC-style field semantics; unknown headers and
  * any header order are tolerated; a record missing `Content-Length` or a
  * malformed version line ends the segment scan truthfully (records parsed
  * so far are kept — a truncated tail never poisons the preceding records).
  *
  * Scale shape: one `flatMap` over the binary column — per-row work, ZERO
  * shuffle at any corpus size, and records stay co-partitioned with the
  * pages that carried them. Payloads leave the operator as an md5 digest +
  * length (fixed width), never as raw bytes, so downstream exchanges are
  * metadata-sized. Reference anchor: chilon reads ready-made RDF dumps
  * (`/root/reference/src/main.rs`); a web-scale KG build starts one step
  * earlier, at the crawl container itself.
  */
object Warc {

  /** One parsed record (payload reduced to digest + length). */
  final case class WarcRec(
      doc_id: Long,
      rec_idx: Int,
      warc_type: String,
      target_uri: String,
      content_type: String,
      content_length: Long,
      payload_md5: String)

  private val CR = '\r'.toByte
  private val LF = '\n'.toByte

  /** Index just past the next CRLF at/after `from`, or -1. */
  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == CR && b(i + 1) == LF) return i + 2
      i += 1
    }
    -1
  }

  private def hex(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach(x => sb.append(f"${x & 0xff}%02x"))
    sb.toString
  }

  /** One record's header fields + payload byte range (internal form shared
    * by the digest-emitting API and the fused ingest chain — payload BYTES
    * stay inside the narrow stage that found them, by construction).
    */
  final case class RawRec(
      recIdx: Int,
      warcType: String,
      targetUri: String,
      contentType: String,
      payloadStart: Int,
      payloadLen: Int)

  /** Parse every record in one segment's bytes (empty on garbage input). */
  def parseSegment(docId: Long, bytes: Array[Byte]): Seq[WarcRec] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    parseSegmentRaw(bytes).map { r =>
      md.reset()
      md.update(bytes, r.payloadStart, r.payloadLen)
      WarcRec(docId, r.recIdx, r.warcType, r.targetUri, r.contentType,
        r.payloadLen.toLong, hex(md.digest()))
    }
  }

  /** Record headers + payload ranges in one segment's bytes. */
  def parseSegmentRaw(bytes: Array[Byte]): Seq[RawRec] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[RawRec]
    var pos = 0
    var idx = 0
    var ok = true
    while (ok && pos < bytes.length) {
      // version line
      val vEnd = lineEnd(bytes, pos)
      val vLine =
        if (vEnd < 0) "" else new String(bytes, pos, vEnd - 2 - pos, "ISO-8859-1")
      if (vEnd < 0 || !vLine.startsWith("WARC/")) ok = false
      else {
        pos = vEnd
        // named headers until the blank line
        var warcType: String = null
        var uri: String = null
        var ctype: String = null
        var clen: Long = -1L
        var headersDone = false
        while (ok && !headersDone) {
          val hEnd = lineEnd(bytes, pos)
          if (hEnd < 0) ok = false
          else if (hEnd - pos == 2) { headersDone = true; pos = hEnd }
          else {
            val line = new String(bytes, pos, hEnd - 2 - pos, "ISO-8859-1")
            pos = hEnd
            val colon = line.indexOf(':')
            if (colon > 0) {
              val name = line.substring(0, colon).trim.toLowerCase
              val value = line.substring(colon + 1).trim
              name match {
                case "warc-type" => warcType = value.toLowerCase
                case "warc-target-uri" => uri = value
                case "content-type" => ctype = value
                case "content-length" =>
                  clen = try value.toLong catch { case _: NumberFormatException => -1L }
                case _ => () // unknown headers tolerated
              }
            } // colon-less lines tolerated (skipped)
          }
        }
        if (ok) {
          if (clen < 0 || pos + clen > bytes.length) ok = false
          else {
            out += RawRec(idx, warcType, uri, ctype, pos, clen.toInt)
            idx += 1
            pos += clen.toInt
            // spec: two CRLFs close a record; tolerate a truncated tail
            var skipped = 0
            while (skipped < 2 && pos + 1 < bytes.length &&
                bytes(pos) == CR && bytes(pos + 1) == LF) {
              pos += 2; skipped += 1
            }
            if (pos + 1 >= bytes.length) pos = bytes.length
          }
        }
      }
    }
    out.toSeq
  }

  /** MD5 of a byte range as lowercase hex (public for the writer round-trip
    * and segment-digest queries).
    */
  def md5Hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    hex(md.digest(bytes))
  }

  /** Serialize one record in the exact grammar [[parseSegmentRaw]] consumes:
    * version line, the four named headers (fixed order), blank line,
    * `Content-Length` payload bytes VERBATIM, double-CRLF terminator. The
    * writer is the crawl-archival EXPORT leg: `parseSegment(writeRecord(r))`
    * returns `r`'s metadata and payload digest byte-for-byte
    * (WarcLayoutSpec pins the round trip, including payloads that QUOTE
    * WARC headers — length-delimited framing must not resync).
    *
    * Scale shape: pure per-row byte assembly — records serialize inside the
    * partition that holds their payload, zero shuffle; a segment writer
    * downstream is a plain binary-file sink.
    */
  def writeRecord(
      warcType: String,
      targetUri: String,
      contentType: String,
      payload: Array[Byte]
  ): Array[Byte] = {
    val header = ("WARC/1.0\r\n" +
      s"WARC-Type: $warcType\r\n" +
      s"WARC-Target-URI: $targetUri\r\n" +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("ISO-8859-1")
    val out = new Array[Byte](header.length + payload.length + 4)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(payload, 0, out, header.length, payload.length)
    out(out.length - 4) = CR; out(out.length - 3) = LF
    out(out.length - 2) = CR; out(out.length - 1) = LF
    out
  }

  /** Concatenate records into one segment (the on-disk WARC file body). */
  def writeSegment(records: Seq[Array[Byte]]): Array[Byte] =
    records.foldLeft(Array.emptyByteArray)(_ ++ _)

  /** Records of every segment in `df` (`idCol` long, `warcCol` binary). */
  def records(df: DataFrame, idCol: String, warcCol: String): Dataset[WarcRec] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(F.col(idCol).cast("long"), F.col(warcCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        parseSegment(id, if (bytes == null) Array.emptyByteArray else bytes)
      }
  }
}
