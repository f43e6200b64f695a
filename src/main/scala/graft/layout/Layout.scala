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
