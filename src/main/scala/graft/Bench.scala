package graft

import graft.extract.Synth
import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query seconds on
  * `SPARK_GRAFT_SF_DIR`, plus KG-pipeline throughput at two parallelism levels
  * — `local[8]` vs `local[32]` as the sandbox proxy for N vs 4N executors
  * (BASELINE.json north_rule: scaling efficiency >= 0.8).
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full pipeline run; returns (wallSec, nTriples). */
  private def pipelineRun(spark: SparkSession, nPages: Long): (Double, Long) = {
    val out = java.nio.file.Files.createTempDirectory("graft-bench").toString
    val t0 = System.nanoTime()
    val res = Pipeline.run(spark, Synth.pages(spark, nPages),
      Pipeline.Config(outDir = out, minOccurs = 10, resume = false,
        minNsSize = 1000, minDomainOccurs = 100))
    val triples = res.triples.count()
    val wall = (System.nanoTime() - t0) / 1e9
    res.triples.unpersist()
    res.summary.unpersist()
    (wall, triples)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nPages = sys.env.getOrElse("SPARK_GRAFT_PAGES", "100000").toLong

    // ---- headline queries at the configured parallelism --------------------
    val spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // ---- KG-pipeline throughput at 4N (JIT-warmed) --------------------------
    pipelineRun(spark, math.min(nPages / 20, 10000L).max(1000L)) // warmup
    val (t4n, triples) = pipelineRun(spark, nPages)
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // ---- same job at N cores ------------------------------------------------
    val sparkN = session(math.max(cpus / 4, 1))
    pipelineRun(sparkN, math.min(nPages / 20, 10000L).max(1000L)) // warmup
    val (tN, _) = pipelineRun(sparkN, nPages)
    sparkN.stop()

    val thr4n = triples / t4n
    val thrN = triples / tN
    val efficiency = (thr4n / thrN) / 4.0

    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","pipeline":{"pages":$nPages,"triples":$triples,"wall_sec_4n":$t4n%.3f,"wall_sec_n":$tN%.3f,"triples_per_sec_4n":$thr4n%.1f,"triples_per_sec_n":$thrN%.1f,"scaling_efficiency":$efficiency%.3f,"cores_4n":$cpus,"cores_n":${math.max(cpus / 4, 1)}}}""")
  }
}
