package graft

import graft.extract.Synth
import graft.pipeline.Pipeline

/** Ad-hoc stage profiler: runs the pipeline at a page count and prints the
  * per-stage wall times (tuning aid for the scaling-efficiency target).
  */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(pages: Long): (Double, Pipeline.Result) = {
      val out = java.nio.file.Files.createTempDirectory("graft-prof").toString
      val t0 = System.nanoTime()
      val res = Pipeline.run(spark, Synth.pages(spark, pages),
        Pipeline.Config(outDir = out, resume = false))
      res.triples.count()
      val total = (System.nanoTime() - t0) / 1e9
      res.triples.unpersist()
      (total, res)
    }
    once(n / 8); once(n / 8) // warmup
    val (total, res) = (1 to 3).map(_ => once(n)).minBy(_._1)
    println(Pipeline.metricsJson(res.metrics))
    println(f"total: $total%.2f s, triples: ${res.triples.count()}")
    spark.stop()
  }
}
