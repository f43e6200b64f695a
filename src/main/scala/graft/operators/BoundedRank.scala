package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, functions => F}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-key bottom-k selection — the scale-safe replacement for
  * `row_number().over(Window.partitionBy(key).orderBy(rank, id))` when the
  * key can be pathologically hot (a content-farm domain with 10^9 documents
  * serializes ALL its rows through one window reducer; the bounded
  * aggregation reduces each map task's slice to <= k rows BEFORE the
  * shuffle, so the final merge per key sees only k * #partitions rows).
  *
  * Same partial-aggregation idea as [[graft.sim.Similarity.TopKAgg]]
  * (VERDICT r3: bounded top-k for ANN selection), generalized to an
  * arbitrary long-valued rank key with ascending (rk, id) order — the
  * (deterministic-pseudo-random rank, id tiebreak) shape crawl-curation
  * caps use.
  */
object BoundedRank {

  /** One candidate: rank key + row id (both exact longs — no NaN/-0.0
    * ordering subtleties, unlike the double-scored TopKAgg).
    */
  final case class RankedId(rk: Long, id: Long)
  final case class RankBuf(items: Seq[RankedId])

  /** Keep the k smallest (rk, id) pairs per group; the buffer never exceeds
    * ~2k entries (compacted on overflow and on every merge), so this is a
    * true partial aggregation — bounded memory per task, bounded shuffle.
    */
  final class BottomKAgg(k: Int) extends Aggregator[RankedId, RankBuf, RankBuf] {
    private def compact(s: Seq[RankedId]): Seq[RankedId] =
      s.sortBy(r => (r.rk, r.id)).take(k)
    override def zero: RankBuf = RankBuf(Nil)
    override def reduce(b: RankBuf, a: RankedId): RankBuf = {
      val grown = a +: b.items
      RankBuf(if (grown.length >= 2 * k) compact(grown) else grown)
    }
    override def merge(a: RankBuf, b: RankBuf): RankBuf = RankBuf(compact(a.items ++ b.items))
    override def finish(r: RankBuf): RankBuf = RankBuf(compact(r.items))
    override def bufferEncoder: org.apache.spark.sql.Encoder[RankBuf] = Encoders.product[RankBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[RankBuf] = Encoders.product[RankBuf]
  }

  /** Per-key bottom-k as a relation: (keyCols..., id, rank) with rank 1..k by
    * (rkCol asc, idCol asc) within each key. Scale shape: the aggregation
    * input is the narrow (key, rk, id) projection; each map task emits <= k
    * rows per key it saw, and no reducer ever materializes a full key group.
    */
  def bottomKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      rkCol: Column,
      idCol: Column,
      k: Int
  ): DataFrame = {
    val agg = F.udaf(new BottomKAgg(k), Encoders.product[RankedId])
    df.groupBy(keyCols.map(F.col): _*)
      .agg(agg(rkCol, idCol).as("top"))
      .select(keyCols.map(F.col) :+ F.posexplode(F.col("top.items")): _*)
      .select(keyCols.map(F.col) ++ Seq(
        F.col("col.id").as("id"),
        (F.col("pos") + 1).cast("int").as("rank")): _*)
  }

  /** [[bottomKPerKey]] also emitting the rank-key value as `rkName` — for
    * callers whose order key IS the deliverable (an ADC distance, a score),
    * saving the re-join the id-only form would force.
    */
  def bottomKPerKeyWithValue(
      df: DataFrame,
      keyCols: Seq[String],
      rkCol: Column,
      idCol: Column,
      k: Int,
      rkName: String
  ): DataFrame = {
    val agg = F.udaf(new BottomKAgg(k), Encoders.product[RankedId])
    df.groupBy(keyCols.map(F.col): _*)
      .agg(agg(rkCol, idCol).as("top"))
      .select(keyCols.map(F.col) :+ F.posexplode(F.col("top.items")): _*)
      .select(keyCols.map(F.col) ++ Seq(
        F.col("col.id").as("id"),
        F.col("col.rk").as(rkName),
        (F.col("pos") + 1).cast("int").as("rank")): _*)
  }
}
