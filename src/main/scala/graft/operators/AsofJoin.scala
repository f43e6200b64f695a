package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** As-of join — the most-recent-prior time-series join Spark's built-in
  * operators lack: every probe row `(key, ts)` picks the single state row
  * with the greatest state ts <= probe ts for the same key (inclusive, so a
  * state row stamped exactly at the probe instant matches).
  *
  * Implemented as the union-tag form rather than a theta join: state and
  * probe rows interleave on `(key, ts, tag)` and one running
  * `last(state, ignoreNulls)` carries each state row forward to every probe
  * that follows it. ONE shuffle on the key, no per-probe search, and no
  * range explosion — the shape Spark would otherwise plan for
  * `probe.ts >= state.ts` is a BroadcastNestedLoopJoin, which is quadratic
  * per key. Per-key window cardinality is the key's own series length
  * (|probes_k| + |state_k|) — the same bound sessionization already lives
  * with; a genuinely hot key is a hot *series* and splits upstream by time
  * range, not by this operator.
  *
  * Contract: state rows must be unique per `(key, ts)` — pre-aggregate with
  * an algebraic argmax upstream if not (ambiguity at equal timestamps is a
  * data-model question this operator refuses to answer silently).
  */
object AsofJoin {

  /** Left as-of join. Output: `key`, every `probeCols` column, every
    * `stateCols` column (null when no state row precedes the probe).
    * `probeCols`/`stateCols` must be disjoint, pre-aliased projections of
    * their frames; `tsCol` must exist in both.
    */
  def asofJoin(
      probes: DataFrame,
      state: DataFrame,
      key: String,
      tsCol: String,
      probeCols: Seq[String],
      stateCols: Seq[String]): DataFrame = {
    val probeStruct = F.struct(probeCols.map(F.col): _*)
    val stateStruct = F.struct(stateCols.map(F.col): _*)
    val probeType = probes.select(probeStruct).schema.head.dataType
    val stateType = state.select(stateStruct).schema.head.dataType

    val tagged = state.select(
      F.col(key), F.col(tsCol).as("__ts"), F.lit(0).as("__tag"),
      F.lit(null).cast(probeType).as("__probe"), stateStruct.as("__state"))
      .unionByName(probes.select(
        F.col(key), F.col(tsCol).as("__ts"), F.lit(1).as("__tag"),
        probeStruct.as("__probe"), F.lit(null).cast(stateType).as("__state")))

    // state (tag 0) sorts before probes (tag 1) at equal ts => inclusive asof
    val w = Window.partitionBy(key).orderBy("__ts", "__tag")
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = tagged
      .withColumn("__asof", F.last("__state", ignoreNulls = true).over(w))
      .filter(F.col("__tag") === 1)

    val probeOut = probeCols.map(c => F.col(s"__probe.$c").as(c))
    val stateOut = stateCols.map(c => F.col(s"__asof.$c").as(c))
    carried.select(F.col(key) +: F.col("__ts").as(tsCol) +: (probeOut ++ stateOut): _*)
  }
}
