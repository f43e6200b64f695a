package graft.extract

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Anchor-link extraction over raw crawl HTML — the web-graph construction
  * stage of a Common-Crawl-style pipeline (host-level link graph, PageRank
  * seeds, spam-farm detection, crawl-frontier expansion all start from the
  * per-page outlink set).
  *
  * Extraction is a pure `Column` regex (whole-stage codegen, zero shuffle at
  * any corpus size); RFC 3986 reference resolution is a deterministic UDF
  * over `java.net.URI` (dot-segment normalization, rooted/relative/absolute
  * forms — string surgery can't express the merge algorithm, and the JDK
  * implementation is the pinned public reference for it).
  */
object Links {

  /** `href` attribute values of `<a>` elements, in document order
    * (double-quoted attributes — the form crawl-normalized HTML emits).
    */
  def hrefs(html: Column): Column =
    F.regexp_extract_all(html, F.lit("<a\\s[^>]*href=\"([^\"]*)\""), F.lit(1))

  /** Schemes (and pseudo-links) a crawler never fetches. */
  val NonFetchable: Seq[String] = Seq("mailto:", "javascript:", "tel:", "data:")

  /** True for hrefs worth resolving: non-empty, not fragment-only, not a
    * non-fetchable scheme.
    */
  def isFetchable(href: Column): Column =
    href =!= "" && !href.startsWith("#") &&
      NonFetchable.map(s => !href.startsWith(s)).reduce(_ && _)

  /** RFC 3986 resolution of `href` against `base`, fragment dropped;
    * null when either side is unparseable (crawl HTML is hostile — a bad
    * link must never kill the task).
    */
  val resolve: UserDefinedFunction = F.udf { (base: String, href: String) =>
    try {
      val r = new java.net.URI(base).resolve(new java.net.URI(href)).toString
      val cut = r.indexOf('#')
      if (cut >= 0) r.substring(0, cut) else r
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Per-page outlink relation: one row per fetchable anchor with the raw
    * href, the resolved absolute URL and the target host. Input: any frame
    * with an id column, a base-URL column and an HTML column.
    *
    * Scale shape: extract + filter + resolve + host are all per-row
    * projections (the UDF is deterministic and allocation-light); the
    * posexplode fan-out is bounded by the page's own anchor count. ZERO
    * shuffle — the host-graph roll-up ([[hostGraph]]) owns the aggregation.
    */
  def pageLinks(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      urlCol: String,
      htmlCol: String
  ): org.apache.spark.sql.DataFrame =
    df.select(F.col(idCol).cast("long").as("id"), F.col(urlCol).as("base"),
        F.posexplode(hrefs(F.col(htmlCol))).as(Seq("pos", "href")))
      .filter(isFetchable(F.col("href")))
      .withColumn("resolved", resolve(F.col("base"), F.col("href")))
      .filter(F.col("resolved").isNotNull)
      .select(F.col("id"), F.col("href"), F.col("resolved"),
        UrlOps.host(F.col("resolved")).as("tgt_host"),
        UrlOps.host(F.col("base")).as("src_host"))

  /** Host-level link graph: distinct (src_host, tgt_host) with the link
    * count — the web-graph artifact ranking/spam pipelines consume.
    *
    * Scale shape: one algebraic `count` aggregation on the host pair key —
    * a hub host pair with 10^9 links collapses map-side; nothing else
    * shuffles.
    */
  def hostGraph(links: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    links.groupBy("src_host", "tgt_host")
      .agg(F.count(F.lit(1)).as("n_links"))

  private val AnchorRe = "<a\\s[^>]*href=\"([^\"]*)\"[^>]*>([^<]*)</a>"

  /** Per-page (resolved target, anchor text) relation — the classic
    * entity-linking / ranking signal ("what does the web call this URL").
    * Same extraction discipline as [[pageLinks]]: one codegen'd regex pass
    * (group 1 = href, group 2 = inner text, paired positionally), fetchable
    * filter, RFC 3986 resolution. ZERO shuffle — aggregation is owned by
    * [[anchorTextProfile]].
    */
  def anchors(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      urlCol: String,
      htmlCol: String
  ): org.apache.spark.sql.DataFrame =
    df.select(F.col(idCol).cast("long").as("id"), F.col(urlCol).as("base"),
        F.regexp_extract_all(F.col(htmlCol), F.lit(AnchorRe), F.lit(2)).as("texts"),
        F.posexplode(F.regexp_extract_all(F.col(htmlCol), F.lit(AnchorRe), F.lit(1)))
          .as(Seq("pos", "href")))
      .withColumn("anchor", F.element_at(F.col("texts"), F.col("pos") + 1))
      .filter(isFetchable(F.col("href")))
      .withColumn("resolved", resolve(F.col("base"), F.col("href")))
      .filter(F.col("resolved").isNotNull)
      .select(F.col("id"), F.col("resolved"), F.col("anchor"))

  /** Per-target anchor-text profile: total in-link count, distinct anchor
    * texts, and the most frequent text (ties by text, ascending) — argmax as
    * an algebraic struct-MIN over `(-n, text)`, so a target with 10^9
    * identical-text in-links collapses map-side; no window ever sees the
    * link relation.
    */
  def anchorTextProfile(anchors: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    anchors.groupBy("resolved", "anchor")
      .agg(F.count(F.lit(1)).as("n"))
      .groupBy("resolved")
      .agg(
        F.sum("n").as("n_links"),
        F.count(F.lit(1)).as("n_texts"),
        F.min(F.struct((-F.col("n")).as("nn"), F.col("anchor").as("t"))).as("x"))
      .select(F.col("resolved").as("tgt"), F.col("n_links"), F.col("n_texts"),
        F.col("x.t").as("top_text"), (-F.col("x.nn")).as("top_n"))
}
