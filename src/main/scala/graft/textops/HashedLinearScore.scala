package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Hashed-feature linear text classifier (the fastText / FineWeb-Edu-style
  * quality-scoring shape): every unigram and adjacent bigram of the token
  * array hashes into one of `buckets` weight slots via the hashing trick,
  * and the document's score is the sum of its feature weights. Weights here
  * are derived deterministically from the bucket id (splitmix64 → integer
  * per-mille in [-1000, 1000]) rather than learned — the ENGINE work a real
  * trained classifier needs (feature extraction, hashing, bucket lookup,
  * per-doc fold) is exactly this; swapping in trained weights is a broadcast
  * array lookup with the same plan shape.
  *
  * Scale shape: the entire score is ONE codegen'd scalar over the token
  * array — a pure per-row projection. The corpus NEVER shuffles and no
  * weight table materializes anywhere (at 10^12 docs the explode → hash join
  * alternative would shuffle ~10^15 feature rows). Integer milli-weights
  * make the per-doc fold exact: the emitted sum is engine-reproducible
  * bit-for-bit, so the DuckDB oracle checks full values, not tolerances.
  *
  * Feature hash = the repo's polynomial rolling hash over the feature's
  * first 64 UTF-16 units ([[TextOps.fingerprintLocal]] — exact in DuckDB via
  * integer `ascii()` arithmetic); bucket = splitmix64(hash ^ seed) mod
  * buckets; weight = splitmix64(bucket + WeightSalt) mod 2001 - 1000.
  */
case class HashedLinearScore(child: Expression, buckets: Long, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_linear_score expects array<string>, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    HashedLinearScore.scoreMilli(a.asInstanceOf[ArrayData], buckets, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.textops.HashedLinearScore.scoreMilli($a, ${buckets}L, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): HashedLinearScore =
    copy(child = newChild)
}

object HashedLinearScore {

  /** Salt separating the bucket→weight mix from the feature→bucket mix. */
  val WeightSalt: Long = 0x632be59bd9b4e019L

  /** Catalog defaults (Queries and the DuckDB oracle must agree). */
  val DefaultBuckets: Long = 1L << 18
  val DefaultSeed: Long = 7L

  /** Integer per-mille weight of one feature: polyhash → bucket → weight.
    * All wrapping JVM long arithmetic — replicated unsigned in DuckDB HUGEINT
    * by [[graft.queries.HashSql]].
    */
  def weightOf(featureHash: Long, buckets: Long, seed: Long): Long = {
    val b = java.lang.Long.remainderUnsigned(
      graft.extract.Synth.mix64(featureHash ^ seed), buckets)
    java.lang.Long.remainderUnsigned(
      graft.extract.Synth.mix64(b + WeightSalt), 2001L) - 1000L
  }

  /** Static per-row scorer the generated code calls: sum of unigram +
    * adjacent-bigram feature weights (bigram feature text = "w1 w2").
    */
  def scoreMilli(arr: ArrayData, buckets: Long, seed: Long): Long = {
    val n = arr.numElements()
    var sum = 0L
    var i = 0
    var prev: String = null
    while (i < n) {
      val tok = arr.getUTF8String(i).toString
      sum += weightOf(TextOps.fingerprintLocal(tok), buckets, seed)
      if (prev != null)
        sum += weightOf(TextOps.fingerprintLocal(prev + " " + tok), buckets, seed)
      prev = tok
      i += 1
    }
    sum
  }

  /** Column wrapper: codegen'd classifier score over an array<string>. */
  def column(toks: Column, buckets: Long, seed: Long): Column =
    ColumnShim.column(
      HashedLinearScore(ColumnShim.expression(toks), buckets, seed))
}
