package graft.extract

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** jusText-class HTML block classification — the content-extraction stage
  * between raw HTML and the cleaned training corpus (Pomikálek 2011; the
  * same block taxonomy trafilatura/jusText production extractors use):
  * split a page into paragraph blocks, score each block's link density and
  * stopword density, and classify it `good` (body content), `bad`
  * (navigation / boilerplate) or `near_good` (short or link-adjacent
  * content a second pass would resolve by context).
  *
  * All metrics are exact integers (per-mille densities via `div` on
  * non-negative operands ≡ DuckDB `//`), so verdicts are engine-exact:
  *   - `link_pm`  = chars inside `<a>` × 1000 div text chars
  *   - `stop_pm`  = stopword tokens × 1000 div tokens
  *   - `bad`       when link_pm > 500 or fewer than 4 words
  *   - `good`      when ≥ 10 words, stop_pm ≥ 200 and link_pm ≤ 300
  *   - `near_good` otherwise
  *
  * Scale shape: ONE codegen'd Column pipeline — regexp block split,
  * posexplode, higher-order-function metrics — a pure per-row projection
  * with zero shuffle at any corpus size (the [[HtmlText]] discipline);
  * classification never sees another row.
  */
object Blocks {

  /** The pinned stopword set the densities are defined over (per-language
    * sets swap in the same way jusText ships per-language frequency lists).
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "on", "over", "with", "this")

  /** Per-block profile rows: (id, block_idx, text_chars, link_chars,
    * n_words, n_stop, link_pm, stop_pm, verdict).
    */
  def blockProfiles(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    // (?s): paragraph and anchor bodies legitimately contain newlines
    val blocks = F.regexp_extract_all(F.col(htmlCol), F.lit("(?s)<p>(.*?)</p>"), F.lit(1))
    val linkTexts = F.regexp_extract_all(F.col("inner"),
      F.lit("(?s)<a [^>]*>(.*?)</a>"), F.lit(1))
    val stripped = F.trim(F.regexp_replace(
      F.regexp_replace(F.col("inner"), "<[^>]*>", ""), "\\s+", " "))
    val stopLit = F.typedlit(Stopwords)
    df.select(F.col(idCol).cast("long").as("doc_id"),
        F.posexplode(blocks).as(Seq("block_idx", "inner")))
      .withColumn("link_chars",
        F.aggregate(F.transform(linkTexts, (t: Column) => F.length(t).cast("long")),
          F.lit(0L), (acc, x) => acc + x))
      .withColumn("text", stripped)
      .withColumn("text_chars", F.length(F.col("text")).cast("long"))
      .withColumn("words", F.split(F.lower(F.col("text")), " "))
      .withColumn("n_words", F.size(F.col("words")).cast("long"))
      .withColumn("n_stop",
        F.size(F.filter(F.col("words"),
          (w: Column) => F.array_contains(stopLit, w))).cast("long"))
      .withColumn("link_pm",
        F.expr("link_chars * 1000L div greatest(text_chars, 1L)"))
      .withColumn("stop_pm",
        F.expr("n_stop * 1000L div greatest(n_words, 1L)"))
      .withColumn("verdict",
        F.when(F.col("link_pm") > 500 || F.col("n_words") < 4, "bad")
          .when(F.col("n_words") >= 10 && F.col("stop_pm") >= 200 &&
            F.col("link_pm") <= 300, "good")
          .otherwise("near_good"))
      .select("doc_id", "block_idx", "text_chars", "link_chars",
        "n_words", "n_stop", "link_pm", "stop_pm", "verdict")
  }
}
