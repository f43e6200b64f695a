package graft.extract

import graft.model.Page
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic Common-Crawl-style page corpus in the exact input
  * shape of BASELINE.json `input_hint`:
  * `(url string, warc_ts timestamp, html binary, text string, lang string)`.
  *
  * Every field derives from `(seed, id)` via splitmix64 — no RNG state, no
  * wall clock — so any two runs (and any two parallelism levels) generate
  * byte-identical rows, which is what the `extractText(html) == text`
  * per-row invariant is tested against.
  */
object Synth {

  /** splitmix64 — public-domain mixing function (Steele et al.). */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def h(seed: Long, id: Long, k: Long): Long = mix64(mix64(seed ^ id) + k)
  private def pick[A](xs: Vector[A], r: Long): A = xs(((r % xs.size) + xs.size).toInt % xs.size)

  val Langs = Vector("en", "pt", "de", "fr")
  private val FixedEpochMs = 1700000000000L // pinned, never wall-clock

  final case class PageSpec(
      id: Long,
      url: String,
      topic: String,
      sentences: Vector[String],
      lang: String,
      tsMs: Long
  )

  /** The pinned content of page `id`: topic + 3-6 relation/attribute sentences. */
  def pageSpec(id: Long, seed: Long = 42L): PageSpec = {
    val topic = pick(Dict.topics, h(seed, id, 1))
    val urlName = topic.replace(' ', '_')
    val url = s"https://pages.example.com/wiki/${urlName}/$id"
    val nRel = 2 + (Math.floorMod(h(seed, id, 2), 3L)).toInt // 2..4 relation sentences
    val rels = (0 until nRel).map { k =>
      val phrase = pick(Dict.relationPhrases, h(seed, id, 10 + k))
      val obj = pick(Dict.objects, h(seed, id, 20 + k))
      s"$topic $phrase $obj."
    }.toVector
    val year = 1800 + Math.floorMod(h(seed, id, 3), 200L).toInt
    val born = s"$topic was born in $year."
    val abstractS = s"$topic is described on page $id."
    val someone = s"Someone knows $topic."
    // the Mercury pages carry a disambiguation context word
    val ctx =
      if (topic == "Mercury") {
        if (Math.floorMod(h(seed, id, 4), 2L) == 0L) Vector("It is a planet in orbit.")
        else Vector("It is a liquid metal.")
      } else Vector.empty
    // long-tail gadget sentences (Dict.longTail): only ids >= 100000 — the
    // bench-scale id range — carry them, so every small fixture and golden
    // stays byte-identical. Rate 8/1009 of pages, one gadget per page: at
    // the bench's 800k pages each gadget IRI occurs ~694 times (below the
    // bench minNsSize=1000, so none is a suitable child on its own) while
    // the eight together are well above it — the round-2 inference trigger.
    val tail =
      if (id >= 100000L && Math.floorMod(id, 1009L) < 8L)
        Vector(s"Someone knows Tachyon Spool ${Math.floorMod(id, 1009L)}.")
      else Vector.empty
    val sentences = rels ++ Vector(born, abstractS, someone) ++ ctx ++ tail
    val lang = pick(Langs, h(seed, id, 5))
    val tsMs = FixedEpochMs + Math.floorMod(h(seed, id, 6), 365L * 24 * 3600) * 1000L
    PageSpec(id, url, topic, sentences, lang, tsMs)
  }

  /** Ground-truth text: title line + one sentence per line (what extractText
    * must reproduce byte-for-byte from the HTML).
    */
  def textOf(spec: PageSpec): String =
    (spec.topic +: spec.sentences).mkString("\n")

  /** Template HTML embedding the text; includes markup noise (comments, a
    * script element, entities) that extraction must strip deterministically.
    */
  def htmlOf(spec: PageSpec): String = {
    val paras = spec.sentences.map(s => s"  <p>${escape(s)}</p>").mkString("\n")
    s"""<html><head><title>${escape(spec.topic)}</title>
<script>var t = ${spec.id};</script>
<style>p { color: black; }</style>
</head>
<body>
<!-- synthetic page ${spec.id} -->
<h1>${escape(spec.topic)}</h1>
$paras
</body></html>"""
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def page(id: Long, seed: Long = 42L): Page = {
    val spec = pageSpec(id, seed)
    Page(
      url = spec.url,
      warc_ts = new java.sql.Timestamp(spec.tsMs),
      html = htmlOf(spec).getBytes(java.nio.charset.StandardCharsets.UTF_8),
      text = textOf(spec),
      lang = spec.lang
    )
  }

  /** Distributed generation: `spark.range` keeps it partition-parallel and lazy. */
  def pages(spark: SparkSession, n: Long, seed: Long = 42L, partitions: Int = 0): Dataset[Page] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    base.map(id => page(id, seed))
  }

  /** The (url, text) projection of page `id` WITHOUT building the HTML
    * payload. html is the fattest field of the page row, and an opaque typed
    * `map` cannot be column-pruned by Catalyst — so consumers whose plans
    * provably never read html (the OpenIE extraction path projects
    * (url, text); PlanSpec pins the pruned ReadSchema) would otherwise pay
    * full page construction per row (guide §1.2: don't compute what you
    * throw away). Derives through [[pageSpec]]/[[textOf]], so the values are
    * byte-identical to `page(id).url` / `page(id).text` by construction.
    */
  def pageUrlText(id: Long, seed: Long = 42L): (String, String) = {
    val spec = pageSpec(id, seed)
    (spec.url, textOf(spec))
  }

  def pagesUrlText(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[(String, String)] = {
    import spark.implicits._
    spark.range(n).map(id => pageUrlText(id, seed))
  }

  /** The (url, warc_ts) projection of page `id` without text/html
    * construction — the capture-history consumers (latest-capture, SCD2,
    * fact intervals) read exactly these two fields. Derives through
    * [[pageSpec]], so values are identical to `page(id)` by construction.
    */
  def pagesUrlTs(spark: SparkSession, n: Long, seed: Long = 42L): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(n).map { id =>
      val spec = pageSpec(id, seed)
      (spec.url, new java.sql.Timestamp(spec.tsMs))
    }.toDF("url", "warc_ts")
  }
}
