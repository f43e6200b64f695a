package graft.textops

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** DSIR-style data-selection importance weights (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling"): score every
  * raw-corpus document by how much more likely its hashed n-gram features
  * are under a small TARGET corpus (the distribution you want more of —
  * eval-adjacent, curated, high-quality) than under the RAW corpus itself.
  * Per-bucket log-likelihood ratio with add-one smoothing:
  *
  *   q_b = ln((t_b + 1)/(T + B)) - ln((r_b + 1)/(R + B))
  *
  * where t_b/r_b are target/raw counts of hashed feature bucket `b`, T/R the
  * corpus feature totals and B the bucket count. A document's weight is the
  * mean of q over its features (unigrams + adjacent bigrams — the same
  * feature family as [[HashedLinearScore]]).
  *
  * Scale shape — the hashing trick is what makes this 100-TB-safe: the
  * learned model is B longs (B = 2^16 → 512 KiB), NOT a vocabulary-sized
  * table. (1) Two counting scans (raw, target) each aggregate
  * explode(feature buckets) → groupBy(bucket): map-side combine collapses
  * every task's slice to ≤B partial rows, so the shuffle is B-bounded no
  * matter the corpus size — no zipf-hot key can concentrate more than its
  * bucket row per task. (2) The q-table join is two ≤B-row relations — the
  * collect into a long[] is B-bounded by construction (the same bounded-
  * collect class as the catalog's #partitions-sized offsets). (3) Scoring is
  * ONE codegen'd scalar per row ([[DsirScore]]) over the broadcast array —
  * the corpus NEVER shuffles for scoring (the explode → join alternative
  * would shuffle ~2 feature rows per token: ~10^15 rows at 10^12 docs — the
  * exact mistake [[HashedLinearScore]]'s Scaladoc rules out).
  *
  * Engine-exact arithmetic: q is quantized to integer micro-nats per
  * COMPONENT — q_b = qln(t_b+1) - qln(r_b+1) - C with qln(x) =
  * round(ln(x)·1e6) and C = qln(T+B) - qln(R+B) — so every transcendental
  * is rounded once, on an exact-integer argument, before any subtraction
  * (the unigram-LM fixed-point trick; ADVICE-r4 flake class). The per-doc
  * fold is exact long arithmetic plus one correctly-rounded division.
  */
object Dsir {

  /** Catalog defaults (Queries and the DuckDB oracle must agree). B = 2^16
    * buckets ≈ the DSIR paper's hashed-feature range; seed decorrelated from
    * [[HashedLinearScore.DefaultSeed]].
    */
  val DefaultBuckets: Int = 1 << 16
  val DefaultSeed: Long = 11L

  /** Bucket of one feature: polyhash ([[TextOps.fingerprintLocal]], exact in
    * DuckDB via integer ascii arithmetic) → splitmix64 → unsigned mod B.
    */
  def bucketOf(feature: String, buckets: Long, seed: Long): Long =
    java.lang.Long.remainderUnsigned(
      graft.extract.Synth.mix64(TextOps.fingerprintLocal(feature) ^ seed), buckets)

  /** Per-row feature-bucket array the counting scans explode: one bucket id
    * per unigram + adjacent bigram, in token order.
    */
  def featureBuckets(arr: ArrayData, buckets: Long, seed: Long): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](if (n == 0) 0 else 2 * n - 1)
    var i = 0
    var j = 0
    var prev: String = null
    while (i < n) {
      val tok = arr.getUTF8String(i).toString
      out(j) = bucketOf(tok, buckets, seed); j += 1
      if (prev != null) { out(j) = bucketOf(prev + " " + tok, buckets, seed); j += 1 }
      prev = tok
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Static per-row scorer the generated code calls: Σ q(bucket(feature))
    * in exact long arithmetic over the broadcast micro-nat table.
    */
  def foldQ(arr: ArrayData, q: Array[Long], buckets: Long, seed: Long): Long = {
    val n = arr.numElements()
    var sum = 0L
    var i = 0
    var prev: String = null
    while (i < n) {
      val tok = arr.getUTF8String(i).toString
      sum += q(bucketOf(tok, buckets, seed).toInt)
      if (prev != null) sum += q(bucketOf(prev + " " + tok, buckets, seed).toInt)
      prev = tok
      i += 1
    }
    sum
  }

  private def checkToks(dt: DataType, who: String): TypeCheckResult = dt match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$who expects array<string>, got $other")
  }

  /** Codegen'd `array<string> → array<long>` of feature bucket ids — the
    * counting scans explode THIS (8-byte rows) instead of the feature
    * strings themselves.
    */
  case class FeatureBuckets(child: Expression, buckets: Long, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      checkToks(child.dataType, "dsir_feature_buckets")
    override def nullSafeEval(a: Any): Any =
      Dsir.featureBuckets(a.asInstanceOf[ArrayData], buckets, seed)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.textops.Dsir.featureBuckets($a, ${buckets}L, ${seed}L);")
    override protected def withNewChildInternal(newChild: Expression): FeatureBuckets =
      copy(child = newChild)
  }

  /** Codegen'd scalar: Σ micro-nat q over the row's features. The learned
    * table rides into generated code as a reference object (one long[] per
    * executor, broadcast with the closure — 512 KiB at the default B).
    */
  case class DsirScore(child: Expression, q: Array[Long], buckets: Long, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      checkToks(child.dataType, "dsir_score")
    override def nullSafeEval(a: Any): Any =
      Dsir.foldQ(a.asInstanceOf[ArrayData], q, buckets, seed)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val qRef = ctx.addReferenceObj("dsirQ", q, "long[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.textops.Dsir.foldQ($a, $qRef, ${buckets}L, ${seed}L);")
    }
    override protected def withNewChildInternal(newChild: Expression): DsirScore =
      copy(child = newChild)
  }

  def featureBucketsCol(toks: Column, buckets: Long, seed: Long): Column =
    ColumnShim.column(FeatureBuckets(ColumnShim.expression(toks), buckets, seed))

  def scoreCol(toks: Column, q: Array[Long], buckets: Long, seed: Long): Column =
    ColumnShim.column(DsirScore(ColumnShim.expression(toks), q, buckets, seed))

  /** Learn the micro-nat bucket table from one counting scan of each corpus.
    * Returned array has an entry for every bucket (buckets absent from both
    * corpora get the all-smoothing ratio — never accessed when scoring the
    * raw corpus itself, but correct if scoring held-out text).
    */
  def learnQ(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      buckets: Int = DefaultBuckets,
      seed: Long = DefaultSeed
  ): Array[Long] = {
    def bucketCounts(df: DataFrame): DataFrame =
      df.select(F.explode(
          featureBucketsCol(TextOps.tokens(F.col(textCol)), buckets, seed)).as("b"))
        .groupBy("b").agg(F.count(F.lit(1)).as("c"))

    def qln(x: Column): Column = F.round(F.log(x.cast("double")) * 1e6, 0).cast("long")

    val rc = bucketCounts(raw)
    val tc = bucketCounts(target)
    // ≤B rows each; the join and collect are B-bounded by construction
    val rows = rc.as("r").join(tc.as("t"), Seq("b"), "full_outer")
      .select(F.col("b"),
        (qln(F.coalesce(F.col("t.c"), F.lit(0L)) + 1L) -
          qln(F.coalesce(F.col("r.c"), F.lit(0L)) + 1L)).as("qtr"),
        F.coalesce(F.col("r.c"), F.lit(0L)).as("r"),
        F.coalesce(F.col("t.c"), F.lit(0L)).as("t"))
      .collect()
    val totR = rows.iterator.map(_.getLong(2)).sum
    val totT = rows.iterator.map(_.getLong(3)).sum
    def qlnL(x: Double): Long = math.round(math.log(x) * 1e6)
    val c = qlnL((totT + buckets).toDouble) - qlnL((totR + buckets).toDouble)
    val smoothOnly = -c // t=0, r=0 bucket: qln(1) - qln(1) - c
    val q = Array.fill[Long](buckets)(smoothOnly)
    rows.foreach(r => q(r.getLong(0).toInt) = r.getLong(1) - c)
    q
  }

  /** Score `raw` against a learned table: one projection, zero shuffles.
    * Documents with no tokens have no features and drop out (mirrored by the
    * oracle's feature-relation inner join).
    */
  def weights(
      raw: DataFrame,
      q: Array[Long],
      idCol: String,
      textCol: String,
      buckets: Int = DefaultBuckets,
      seed: Long = DefaultSeed
  ): DataFrame = {
    val toks = TextOps.tokens(F.col(textCol))
    raw.select(F.col(idCol).as("doc_id"), toks.as("toks"))
      .where(F.size(F.col("toks")) > 0)
      .select(F.col("doc_id"),
        (F.size(F.col("toks")).cast("long") * 2L - 1L).as("n_feats"),
        scoreCol(F.col("toks"), q, buckets, seed).as("q_milli"))
      .withColumn("dsir_w",
        F.col("q_milli").cast("double") / (F.col("n_feats").cast("double") * 1e6))
  }

  /** End-to-end: learn from (raw, target), score raw. */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = DefaultBuckets,
      seed: Long = DefaultSeed
  ): DataFrame =
    weights(raw, learnQ(raw, target, textCol, buckets, seed), idCol, textCol, buckets, seed)
}
