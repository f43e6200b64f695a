package graft.textops

import org.apache.spark.sql.{DataFrame, functions => F}

/** BM25 document retrieval over the corpus — the lexical-retrieval operator
  * a training-data pipeline needs for targeted curation (pull documents
  * about X), retrieval-based decontamination, and quality probes. Scoring is
  * engine-exact by the fixed-point discipline this codebase uses everywhere
  * (cf. [[TextOps.unigramLogProb]]): the ONLY transcendental is the per-term
  * idf, quantized once to integer micro-nats; the tf/length normalization is
  * pure integer arithmetic (`div` truncation ≡ DuckDB `//` floor on positive
  * operands), and the per-document fold is an integer sum — order-independent
  * across partitionings and engines.
  *
  * Per query term t with document frequency df over N documents:
  *   idf_micro(t) = round(ln((N - df + 0.5) / (df + 0.5) + 1) * 10^6)
  * Per (document d, term t) with term frequency tf, |d| = dl tokens,
  * avgdl_q = total_tokens div N (integer-quantized average length),
  * k1 = 1.2, b = 0.75:
  *   ratio_micro = (tf * 2_200_000 * avgdl_q)
  *                   div (tf * 1_000_000 * avgdl_q
  *                        + 12_000 * (25 * avgdl_q + 75 * dl))
  *   — the BM25 saturation tf·(k1+1) / (tf + k1·((1-b) + b·dl/avgdl)) scaled
  *   to micro-units with every rational kept integral (≤ 2.2e6; overflow-safe
  *   for any real corpus: the factors are per-document quantities, never
  *   corpus totals).
  *   score_micro(d,t) = (idf_micro * ratio_micro) div 1_000_000
  * Document score = Σ_t score_micro — documents matching no term are absent.
  *
  * Scale shape: one tokenized scan builds (doc, term, tf); corpus stats are
  * two collected scalars and the per-term dfs a |query|-row collect (both
  * bounded by the query, not the corpus); scoring touches only the query
  * terms' postings (a broadcast-pruned filter); final selection is
  * `TakeOrderedAndProject` — per-partition top-k then a k·#partitions driver
  * merge, never a global sort or single-partition window.
  */
object Bm25 {

  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k: Int
  ): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    require(k > 0, "k must be positive")
    // materialize the (doc, term, tf) relation ONCE (r6): the stats and
    // per-term-df collects below are separate actions, so without the
    // checkpoint each re-ran the corpus tokenize + aggregation — three full
    // corpus passes per call (guide §1.2). The materialized bytes are the
    // same order as the aggregation's own shuffle output.
    val docTok = df
      .select(F.col(idCol).cast("long").as("id"),
        F.explode(TextOps.tokens(F.col(textCol))).as("tok"))
      .groupBy("id", "tok").agg(F.count(F.lit(1)).as("tf"))
      .localCheckpoint()
    val dl = docTok.groupBy("id").agg(F.sum("tf").as("dl"))

    val stats = dl.agg(F.count(F.lit(1)).as("n"), F.sum("dl").as("total"))
      .collect().head
    val nDocs = stats.getLong(0)
    val avgdlQ = math.max(1L, stats.getLong(1) / nDocs)

    val dft = docTok.filter(F.col("tok").isin(query: _*))
      .groupBy("tok").agg(F.count(F.lit(1)).as("dft"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val idf = query.distinct.flatMap { t =>
      dft.get(t).map { d =>
        t -> Math.round(Math.log((nDocs - d + 0.5) / (d + 0.5) + 1.0) * 1e6)
      }
    }
    val idfCol = idf.foldLeft(F.lit(null).cast("long")) { case (acc, (t, v)) =>
      F.when(F.col("tok") === t, F.lit(v)).otherwise(acc)
    }

    docTok.filter(F.col("tok").isin(idf.map(_._1): _*))
      .join(dl, "id")
      .withColumn("idf", idfCol)
      .withColumn("ratio",
        F.expr(s"(tf * 2200000 * $avgdlQ) div " +
          s"(tf * 1000000 * $avgdlQ + 12000 * (25 * $avgdlQ + 75 * dl))"))
      .withColumn("sc", F.expr("(idf * ratio) div 1000000"))
      .groupBy("id")
      .agg(F.sum("sc").as("score"), F.count(F.lit(1)).as("n_terms"))
      .orderBy(F.col("score").desc, F.col("id").asc)
      .limit(k)
  }
}
