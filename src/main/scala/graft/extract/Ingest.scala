package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset, functions => F}

/** The fused crawl-ingest chain: WARC container → HTTP message → charset
  * decode → HTML text extraction, as ONE `flatMap` — the architecture
  * statement of the whole ingest layer. Payload bytes exist only inside the
  * narrow stage that parsed them: what leaves the operator is fixed-width
  * metadata plus a text digest, so no exchange anywhere downstream ever
  * carries a body. At 10^12 documents this is the difference between a
  * pipeline whose first shuffle moves ~100 TB and one whose first shuffle
  * moves a few TB of keys.
  *
  * Charset handling is the part a naive chain gets wrong: the HTTP
  * `charset=` parameter (harvested by [[Http.parseHead]]) decides how body
  * bytes become text. A latin-1 page decoded as UTF-8 turns every accented
  * character into U+FFFD — the q_ingest_e2e oracle pins the CORRECT decode
  * by making latin-1 and UTF-8 encodings of the same accented text hash to
  * the same digest.
  */
object Ingest {

  /** One ingested page (text reduced to codepoint count + digest). */
  final case class IngestedPage(
      doc_id: Long,
      uri: String,
      status: Int,
      content_type: String,
      charset: String,
      n_cp: Long,
      text_md5: String)

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def charsetOrUtf8(name: String): java.nio.charset.Charset =
    if (name.isEmpty) Utf8
    else try java.nio.charset.Charset.forName(name)
    catch { case _: Exception => Utf8 } // unknown label -> the web's default

  /** Ingest every `response` record of one segment's bytes. */
  def ingestSegment(docId: Long, bytes: Array[Byte]): Seq[IngestedPage] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Warc.parseSegmentRaw(bytes)
      .filter(_.warcType == "response")
      .flatMap { r =>
        Http.parseHead(bytes, r.payloadStart, r.payloadLen).map { h =>
          val bodyLen = r.payloadStart + r.payloadLen - h.bodyStart
          val cs = charsetOrUtf8(h.charset)
          val html = new String(bytes, h.bodyStart, bodyLen, cs)
          val text = HtmlText.extractText(html)
          md.reset()
          val digest = md.digest(text.getBytes(Utf8))
            .map(b => f"${b & 0xff}%02x").mkString
          IngestedPage(docId, r.targetUri, h.status, h.mediaType,
            cs.name.toLowerCase, text.codePointCount(0, text.length).toLong, digest)
        }
      }
  }

  /** Ingested pages of every segment in `df` (`idCol` long, `warcCol`
    * binary). One narrow stage; zero shuffle at any corpus size.
    */
  def ingestSegments(df: DataFrame, idCol: String, warcCol: String): Dataset[IngestedPage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(F.col(idCol).cast("long"), F.col(warcCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        ingestSegment(id, if (b == null) Array.emptyByteArray else b)
      }
  }
}
