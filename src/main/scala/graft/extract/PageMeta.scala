package graft.extract

import org.apache.spark.sql.{Column, DataFrame, Dataset, functions => F}

/** Page-metadata harvest (title / meta description / canonical link /
  * OpenGraph) and sitemap-XML parsing — the discovery-and-labeling layer of
  * a crawl-ingest pipeline: canonical links feed URL dedup, titles and
  * descriptions feed document quality and KG labels, sitemaps feed the
  * frontier.
  *
  * The metadata extractors are pure `Column` regexps (whole-stage codegen,
  * ZERO shuffle); attribute order and quote style both vary on the real web,
  * so every field coalesces an attr-order pair of patterns. The sitemap
  * parser is a per-row `flatMap`. Oracles never re-run these regexes — they
  * reconstruct expected values closed-form from the fixture generation rule,
  * so any extraction drift fails the hash.
  */
object PageMeta {

  private def first(c1: Column, c2: Column): Column =
    F.when(c1 =!= "", c1).otherwise(c2)

  /** `<title>` text (first match, trimmed; "" when absent). */
  def title(html: Column): Column =
    F.trim(F.regexp_extract(html, "(?i)<title[^>]*>([^<]*)</title>", 1))

  /** `content` of `<meta name=...>` — both attribute orders, both quote
    * styles ("" when absent).
    */
  def metaContent(html: Column, name: String): Column = {
    val n = java.util.regex.Pattern.quote(name)
    first(
      F.regexp_extract(html,
        s"""(?i)<meta[^>]*name\\s*=\\s*["']$n["'][^>]*content\\s*=\\s*["']([^"']*)["']""", 1),
      F.regexp_extract(html,
        s"""(?i)<meta[^>]*content\\s*=\\s*["']([^"']*)["'][^>]*name\\s*=\\s*["']$n["']""", 1))
  }

  /** `content` of `<meta property=...>` (OpenGraph family). */
  def metaProperty(html: Column, prop: String): Column = {
    val p = java.util.regex.Pattern.quote(prop)
    first(
      F.regexp_extract(html,
        s"""(?i)<meta[^>]*property\\s*=\\s*["']$p["'][^>]*content\\s*=\\s*["']([^"']*)["']""", 1),
      F.regexp_extract(html,
        s"""(?i)<meta[^>]*content\\s*=\\s*["']([^"']*)["'][^>]*property\\s*=\\s*["']$p["']""", 1))
  }

  /** `href` of `<link rel="canonical">` — both attribute orders. */
  def canonicalLink(html: Column): Column =
    first(
      F.regexp_extract(html,
        """(?i)<link[^>]*rel\s*=\s*["']canonical["'][^>]*href\s*=\s*["']([^"']*)["']""", 1),
      F.regexp_extract(html,
        """(?i)<link[^>]*href\s*=\s*["']([^"']*)["'][^>]*rel\s*=\s*["']canonical["']""", 1))

  /** One sitemap `<url>` entry ("" for absent optional fields). */
  final case class SitemapEntry(
      doc_id: Long,
      url_idx: Int,
      loc: String,
      lastmod: String,
      priority: String)

  private val UrlBlock =
    java.util.regex.Pattern.compile("(?is)<url\\s*>(.*?)</url\\s*>")

  private def tagText(block: String, tag: String): String = {
    val m = java.util.regex.Pattern
      .compile(s"(?is)<$tag\\s*>\\s*(.*?)\\s*</$tag\\s*>").matcher(block)
    if (m.find()) m.group(1) else ""
  }

  /** Parse one sitemap document's `<url>` entries in order. */
  def parseSitemap(docId: Long, xml: String): Seq[SitemapEntry] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[SitemapEntry]
    val m = UrlBlock.matcher(if (xml == null) "" else xml)
    var i = 0
    while (m.find()) {
      val block = m.group(1)
      val loc = tagText(block, "loc")
      if (loc.nonEmpty) { // a <url> without <loc> is meaningless per the spec
        out += SitemapEntry(docId, i, loc, tagText(block, "lastmod"),
          tagText(block, "priority"))
        i += 1
      }
    }
    out.toSeq
  }

  /** Entries of every sitemap in `df` (`idCol` long, `xmlCol` string). */
  def sitemapEntries(df: DataFrame, idCol: String, xmlCol: String): Dataset[SitemapEntry] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(F.col(idCol).cast("long"), F.col(xmlCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, xml) => parseSitemap(id, xml) }
  }
}
