package graft.sketch

import graft.dedup.Dedup
import graft.extract.Synth
import graft.textops.TextOps
import org.apache.spark.sql.{DataFrame, functions => F}

/** Count-min sketch — sublinear heavy-hitter counting for streams whose key
  * space is too large to shuffle (the regime where the exact
  * `groupBy(token)` behind a vocabulary table stops being affordable: URL
  * tails, raw shingles, user ids).
  *
  * The sketch is `depth` rows of `width` counters; an occurrence increments
  * one counter per row (bucket = row-seeded splitmix64 of the key, masked to
  * the power-of-two width); a key's estimate is the MIN over its `depth`
  * counters — an overestimate with the classic (e/width, 1-e^-depth)
  * guarantee, never an under-estimate.
  *
  * Scale shape: counter addition is commutative+associative, so the cell
  * table builds with ONE occurrence-level scan whose map-side combine
  * collapses every task to <= depth x width rows BEFORE the shuffle — the
  * exchange is sketch-sized (a few KB) regardless of corpus size or key
  * cardinality, which is the entire point. Estimation broadcasts the cells
  * (bounded, depth x width) and probes as a pure projection — zero shuffle
  * on the probe side.
  */
object Sketch {

  val Depth = 4
  /** Per-row seeds (arbitrary odd 64-bit constants, pinned). */
  val RowSeeds: Array[Long] = Array(
    0xc3a5c85c97cb3127L, 0xb492b66fbe98f273L, 0x9ae16a3b2f90404fL, 0x165667b19e3779f9L)
  val CmsSeed = 0xc0117edL

  /** Bucket of `key` in sketch row `d` (splitmix64 of the shingle-fold base,
    * re-seeded per row, masked to the power-of-two width).
    */
  def bucketOf(key: String, d: Int, width: Int): Int = {
    val base = Dedup.hashShingle(key, CmsSeed)
    (Synth.mix64(base ^ RowSeeds(d)) & (width - 1)).toInt
  }

  /** The cell table (d, bucket, total) over the lowercase-alnum token stream
    * of `textCol`. One scan; the (d, bucket) exchange is bounded by
    * depth x width per map task.
    */
  def cmsCells(df: DataFrame, textCol: String, width: Int): DataFrame = {
    require(width > 0 && (width & (width - 1)) == 0, "width must be a power of two")
    val bucketsUdf = F.udf((t: String) =>
      (0 until Depth).map(d => bucketOf(t, d, width)))
    df.select(F.explode(TextOps.tokens(F.col(textCol))).as("tok"))
      .select(F.posexplode(bucketsUdf(F.col("tok"))).as(Seq("d", "bucket")))
      .groupBy("d", "bucket")
      .agg(F.count(F.lit(1)).as("total"))
  }

  /** Point estimates for a probe relation: min over the key's depth cells.
    * The cell table collects to a bounded depth x width map and broadcasts;
    * probing is a zero-shuffle projection.
    */
  def cmsEstimate(probes: DataFrame, tokCol: String, cells: DataFrame, width: Int): DataFrame = {
    val cellMap: Map[(Int, Int), Long] = cells
      .collect() // bounded: depth x width cells by construction
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val bc = probes.sparkSession.sparkContext.broadcast(cellMap)
    val estUdf = F.udf((t: String) =>
      (0 until Depth).map(d => bc.value.getOrElse((d, bucketOf(t, d, width)), 0L)).min)
    probes.withColumn("cms_est", estUdf(F.col(tokCol)))
  }

  // --------------------------------------------------------------------
  // Portable Bloom filter — engine-exact membership bits
  // --------------------------------------------------------------------

  /** Seed for the Bloom hash family; the i-th hash re-seeds with
    * `mix64(BloomSeed + i)` so every position is closed-form replicable.
    */
  val BloomSeed = 0xb10f11e5L

  /** The k bit positions of `key` in an m-bit filter (m a power of two).
    * Unlike Spark's built-in `stat.bloomFilter` (whose internal hashing is
    * not specified for cross-engine replay), this family is pinned
    * splitmix64 — an external auditor can rebuild the exact filter.
    */
  def bloomPositions(key: String, k: Int, m: Int): Seq[Int] = {
    require(m > 0 && (m & (m - 1)) == 0, "m must be a power of two")
    val base = Dedup.hashShingle(key, BloomSeed)
    (0 until k).map(i => (Synth.mix64(base ^ Synth.mix64(BloomSeed + i)) & (m - 1)).toInt)
  }

  /** Bloom decontamination verdict per corpus row: `dropped_bloom` is true
    * iff ALL k positions of the row's text are set by the blocklist. The
    * bit set builds from the blocklist only (distinct positions, <= m, so
    * the collect is filter-bounded like a real bloom broadcast) and applies
    * map-side — the corpus never shuffles. One-sided by construction:
    * a blocklisted text sets its own bits, so false negatives cannot occur;
    * false positives drop extra rows at the load-factor rate.
    */
  def portableBloomVerdict(
      corpus: DataFrame, textCol: String,
      blocklist: DataFrame, blockTextCol: String,
      k: Int, m: Int): DataFrame = {
    val posUdf = F.udf((t: String) => bloomPositions(t, k, m))
    val bits: Set[Int] = blocklist
      .select(F.explode(posUdf(F.col(blockTextCol))).as("pos"))
      .distinct()
      .collect() // bounded: <= m bit positions by construction
      .map(_.getInt(0)).toSet
    val bc = corpus.sparkSession.sparkContext.broadcast(bits)
    val verdict = F.udf((t: String) => bloomPositions(t, k, m).forall(bc.value.contains))
    corpus.withColumn("dropped_bloom", verdict(F.col(textCol)))
  }

  // --------------------------------------------------------------------
  // HyperLogLog — distinct counting in 256 registers
  // --------------------------------------------------------------------

  /** Register precision: p = 8 bits -> m = 256 registers (~6.5% std error),
    * the remaining 56 hash bits feed the leading-zero rank.
    */
  val HllP = 8
  val HllM = 256
  val HllSeed = 0x4711dadaL
  /** alpha_256 (Flajolet et al. 2007), computed once and round-tripped
    * through its shortest decimal so the oracle uses the bit-identical
    * IEEE constant.
    */
  val HllAlpha: Double = 0.7213 / (1.0 + 1.079 / HllM)

  /** (register index, rank): low p bits route, the 56-bit suffix's
    * leading-zero count + 1 is the rank (57 when the suffix is zero).
    */
  def hllRegisterOf(key: String): (Int, Int) = {
    val h = Dedup.hashShingle(key, HllSeed)
    val j = (h & (HllM - 1)).toInt
    val w = h >>> HllP
    val rho = if (w == 0L) 57 else 57 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (j, rho)
  }

  /** Register table (j, m_j = max rank). `max` is algebraic, so the shuffle
    * is bounded at m rows per map task — like the CMS cells, sketch-sized
    * regardless of stream cardinality.
    */
  def hllRegisters(df: DataFrame, keyCol: String): DataFrame = {
    val regUdf = F.udf((k: String) => { val (j, r) = hllRegisterOf(k); Seq(j, r) })
    df.select(regUdf(F.col(keyCol)).as("jr"))
      .select(F.col("jr")(0).as("j"), F.col("jr")(1).as("rho"))
      .groupBy("j").agg(F.max("rho").as("m_j"))
  }

  /** One-row summary: the raw HLL estimate (no small-range correction — a
    * deliberate engine-exactness choice: the correction's `m ln(m/V)` is a
    * cross-engine transcendental; callers in the linear-counting regime
    * have `v_zero` right here to apply it), the register digest, and the
    * exact distinct count for validation.
    */
  def hllSummary(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val regs = hllRegisters(df, keyCol)
      .collect() // bounded: <= m registers by construction
      .map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1)
    val regMap = regs.toMap
    // defined-order fold (ascending j) of exact power-of-two reciprocals:
    // both engines run the identical IEEE addition sequence
    val harm = (0 until HllM).foldLeft(0.0)((acc, j) =>
      acc + 1.0 / (1L << regMap.getOrElse(j, 0)).toDouble)
    val est = HllAlpha * (HllM.toDouble * HllM.toDouble) / harm
    val vZero = (HllM - regs.length).toLong
    val csv = regs.map { case (j, m) => s"$j:$m" }.mkString(",")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(csv.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val nExact = df.select(keyCol).distinct().count()
    import spark.implicits._
    Seq((HllM.toLong, vZero, est, nExact, md5))
      .toDF("m", "v_zero", "hll_est", "n_exact", "regs_md5")
  }

  /** Heavy hitters with their exact counts alongside the sketch estimate:
    * every distinct token whose CMS estimate clears `threshold`, with the
    * true count for over-estimate accounting. (The exact count exists here
    * to VALIDATE the sketch — a production 100-TB run keeps only the
    * sketch path and the estimate.)
    */
  def cmsHeavyHitters(df: DataFrame, textCol: String, width: Int, threshold: Long): DataFrame = {
    val cells = cmsCells(df, textCol, width)
    val exact = df.select(F.explode(TextOps.tokens(F.col(textCol))).as("token"))
      .groupBy("token").agg(F.count(F.lit(1)).as("n_exact"))
    cmsEstimate(exact, "token", cells, width)
      .filter(F.col("cms_est") >= threshold)
      .select("token", "cms_est", "n_exact")
  }
}
