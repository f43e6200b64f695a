package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Range (interval-containment) join — `point BETWEEN lo AND hi` — via
  * bucket decomposition. Spark plans a bare theta join as
  * BroadcastNestedLoopJoin (every point against every interval: quadratic,
  * and the build side must fit in memory); the bucketed form turns it into
  * ONE equi-join plus a residual filter:
  *
  *   - each interval explodes to the fixed-width buckets it overlaps
  *     (fan-out <= span/bucket + 1, bounded by the caller's bucket choice —
  *     pick it near the typical interval width so the fan-out is ~2);
  *   - each point lands in exactly ONE bucket, so every qualifying
  *     (interval, point) pair meets in precisely one bucket and is emitted
  *     exactly once — no post-dedup.
  *
  * The equi-join shuffles on the bucket id; clustered intervals make hot
  * buckets, which AQE's skew-join split handles (bucket rows carry no
  * payload beyond the join columns). This is the same decomposition
  * Databricks' range-join hint and the published interval-join literature
  * use — expressed with stock `sequence`/`explode`/equi-join so Catalyst
  * plans it natively.
  */
object RangeJoin {

  /** Inner containment join: rows of `points` (with long column `pCol`)
    * matched to rows of `intervals` (with long columns `loCol` <= `hiCol`),
    * emitting each qualifying pair once with all columns of both inputs.
    */
  def bucketedRangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pCol: String,
      loCol: String,
      hiCol: String,
      bucket: Long): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    val ib = intervals.withColumn("__b",
      F.explode(F.sequence(
        F.floor(F.col(loCol) / bucket), F.floor(F.col(hiCol) / bucket))))
    val pb = points.withColumn("__b", F.floor(F.col(pCol) / bucket))
    pb.join(ib, "__b")
      .filter(F.col(pCol) >= F.col(loCol) && F.col(pCol) <= F.col(hiCol))
      .drop("__b")
  }
}
