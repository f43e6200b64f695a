package graft.layout

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Physical-layout operators for the 100-TB table: multi-dimensional
  * clustering keys and small-file compaction planning — the table
  * maintenance a petabyte corpus needs continuously (every incremental
  * crawl ingest fragments the layout; every selective scan wants
  * min/max-prunable files).
  */
object Layout {

  /** Spread the low 16 bits of `c` so bit i lands at position 2i — the
    * classic mask-shift cascade, pure integer Column arithmetic inside
    * whole-stage codegen (and replayable verbatim in any engine with
    * shift/and/or, which is how the oracle checks it).
    */
  def spread16(c: Column): Column = {
    var x = c.cast("long").bitwiseAND(F.lit(0xffffL))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00ff00ffL))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0f0f0f0fL))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333L))
    x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555L))
  }

  /** Morton (Z-order) interleave of two 16-bit dimensions into one 32-bit
    * clustering key: `x` takes the even bit positions, `y` the odd. Rows
    * close in BOTH dimensions land close on the curve, so a
    * `repartitionByRange(zValue)` write yields files whose per-file min/max
    * statistics prune 2-D range predicates — the standard lakehouse answer
    * to "cluster by (domain, fetch-time) without paying two sorts". A pure
    * projection: ZERO shuffle to compute; the one range exchange is the
    * write's own and replaces the shuffle a 1-D sort would cost anyway.
    */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(F.shiftleft(spread16(y), 1))

  /** Compaction plan: assign files to target-size output bins, per table
    * partition — the Iceberg/Delta `binpack` maintenance step. Within each
    * partition key, files are taken in `fileCol` order and a file starts a
    * new bin whenever the running size crosses `targetBytes`
    * (`bin = floor(exclusive-prefix-sum / target)` — an oversized file
    * claims its bin and pushes the remainder forward, never silently
    * splits).
    *
    * Scale shape: input rows here are FILES, i.e. table METADATA — at
    * 100 TB with 128 MB files that is ~10^6 rows total and a few thousand
    * per partition key, so the per-key ordered window is bounded by the
    * manifest size, never by corpus rows (contrast with the corpus-row
    * windows this repo eliminated from capPerDomain/dedupLines). The plan
    * is deterministic in (partition, file id) — re-running it over the same
    * manifest snapshot is idempotent, which is what makes the compaction
    * job itself resumable.
    */
  /** Snapshot-expiry plan — the Iceberg `expireSnapshots` maintenance step
    * beside [[compactionPlan]]: per table, KEEP the `keepLast` most recent
    * snapshots (rank by (ts desc, snapshot id desc) — total-ordered, so the
    * plan is deterministic) plus every snapshot within `retainMs` of that
    * table's NEWEST snapshot (retention anchored to the table's own head,
    * the way a periodically-run expiry job behaves); everything else
    * expires. Emits every snapshot with its rank, verdict and reason
    * (`recent_n` / `in_window` / `expire` — rank wins when both apply), so
    * the plan is an auditable table, not a side effect.
    *
    * Scale shape: input rows are SNAPSHOTS — table metadata, thousands per
    * table at worst — so the per-table window is manifest-bounded, never
    * corpus-bounded (the [[compactionPlan]] argument). Determinism in
    * (table, ts, snapshot id) makes the expiry job idempotent/resumable.
    */
  def snapshotExpiryPlan(
      snapshots: DataFrame,
      tableCol: String,
      snapCol: String,
      tsCol: String,
      keepLast: Int,
      retainMs: Long): DataFrame = {
    require(keepLast >= 1 && retainMs >= 0, "keepLast >= 1, retainMs >= 0")
    val part = Window.partitionBy(tableCol)
    val w = part.orderBy(F.col(tsCol).desc, F.col(snapCol).desc)
    snapshots
      .select(F.col(tableCol), F.col(snapCol),
        F.col(tsCol).cast("long").as(tsCol))
      .withColumn("rank_desc", F.row_number().over(w).cast("long"))
      .withColumn("head_ts", F.max(tsCol).over(part))
      .withColumn("reason",
        F.when(F.col("rank_desc") <= keepLast, "recent_n")
          .when(F.col(tsCol) >= F.col("head_ts") - retainMs, "in_window")
          .otherwise("expire"))
      .withColumn("keep", F.col("reason") =!= "expire")
      .drop("head_ts")
  }

  def compactionPlan(
      files: DataFrame,
      partCol: String,
      fileCol: String,
      sizeCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = Window.partitionBy(partCol).orderBy(fileCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .select(F.col(partCol), F.col(fileCol),
        F.col(sizeCol).cast("long").as(sizeCol))
      .withColumn("cum_before",
        F.coalesce(F.sum(sizeCol).over(w), F.lit(0L)))
      .withColumn("bin", F.floor(F.col("cum_before") / targetBytes))
  }
}
