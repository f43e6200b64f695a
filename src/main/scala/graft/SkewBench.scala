package graft

import graft.ns.Inference
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Skew-stress microbench for the A2 prefix aggregation (SURVEY A2 / N1):
  * a zipf-heavy corpus where one domain carries ~90% of all IRI occurrences
  * (the dbpedia/schema.org shape at Common-Crawl scale), exercising the salt
  * knob and AQE skew handling. Alternating measured runs, per-variant minimum
  * reported. Results table lives in BASELINE.md.
  *
  * Usage: `runMain graft.SkewBench [nIris] [reps]`
  */
object SkewBench {

  /** One hot domain with near-unique deep paths (90%), plus a long tail of
    * rare domains: the hot depth-1 prefix is both row-skewed and
    * distinct-value-skewed, so neither map-side combine nor AQE alone
    * collapses its distinct-descendant set.
    */
  def zipfIris(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, 32).map { i =>
      if (i % 10 != 0) s"http://hot.example.org/a/p$i"
      else s"http://rare${i % 50000}.example.io/t/x$i"
    }.toDF("iri")
  }

  /** Content-farm corpus for the boilerplate-strip A/B: one host carries 90%
    * of all pages, every page of it sharing one banner line — the hot
    * (host, line) key [[graft.textops.TextOps.stripHostBoilerplate]]'s
    * salted joins exist for. salt=1 degenerates to the unsalted join (the
    * banner's instances all probe one reducer); salt=16 spreads them.
    */
  def farmDocs(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, 32).map { i =>
      if (i % 10 != 0)
        (i, "farm.example.org", s"mega banner line\nsecond shared footer\narticle $i body text")
      else
        (i, s"host${i % 5000}.example.net", s"cold prose $i\nbody $i")
    }.toDF("doc_id", "host", "text")
  }

  private def time(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val rows = f
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-skew-bench")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val iris = zipfIris(spark, n).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    iris.count() // materialize outside the timed region

    val docs = farmDocs(spark, n / 8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()

    def strip(salt: Int): Long =
      graft.textops.TextOps.stripHostBoilerplate(
        docs, "doc_id", "host", "text", 2L, 3L, 5L, salt = salt).count()

    val variants: Seq[(String, () => Long)] = Seq(
      "counts_unsalted" -> (() => Inference.prefixCounts(iris, salt = 0).count()),
      "counts_salt32" -> (() => Inference.prefixCounts(iris, salt = 32).count()),
      "stats_exact" -> (() => Inference.prefixStats(iris).count()),
      "stats_hll" -> (() => Inference.prefixStats(iris, approxUnique = true).count()),
      "boiler_salt1" -> (() => strip(1)),
      "boiler_salt16" -> (() => strip(16))
    )
    // warmup once each, then alternating measured reps (shared-host drift hits
    // all variants equally)
    variants.foreach { case (_, f) => f() }
    val best = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
    (1 to reps).foreach { _ =>
      variants.foreach { case (name, f) =>
        val (t, _) = time(f())
        best(name) = math.min(best(name), t)
      }
    }
    val json = variants.map { case (name, _) => s""""$name":${f"${best(name)}%.3f"}""" }
      .mkString("{", ",", s""","n_iris":$n,"reps":$reps}""")
    println(json)
    spark.stop()
  }
}
