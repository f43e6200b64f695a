package graft.probe

import graft.extract.Synth
import graft.pipeline.Pipeline

/** One-decade scale-up evidence run (OPTIMIZATION_r06): the full pipeline at
  * ~10x the bench's 800k pages, staged to parquet exactly like the bench,
  * recording per-stage walls, infer_rounds and shuffle totals — one measured
  * decade of extrapolation under the 100-TB shuffle-budget table.
  *   sbt -batch "Test/runMain graft.probe.ScaleUpProbeMain 8000000"
  */
object ScaleUpProbeMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 8000000L
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft-scaleup-$n").toString
    val t0 = System.nanoTime()
    Synth.pages(spark, n, partitions = 64).write.mode("overwrite").parquet(dir)
    val stageWall = (System.nanoTime() - t0) / 1e9
    println(f"staged $n pages in $stageWall%.1f s")
    // shuffle totals via listener
    val shufWrite = new java.util.concurrent.atomic.AtomicLong()
    val shufRead = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })
    val out = java.nio.file.Files.createTempDirectory("graft-scaleup-out").toString
    val t1 = System.nanoTime()
    val pages = spark.read.parquet(dir).as[graft.model.Page]
    val res = Pipeline.run(spark, pages,
      Pipeline.Config(outDir = out, minOccurs = 10, resume = false,
        minNsSize = 1000, minDomainOccurs = 100))
    val triples = res.triples.count()
    val wall = (System.nanoTime() - t1) / 1e9
    res.triples.unpersist()
    Thread.sleep(1000)
    println(Pipeline.metricsJson(res.metrics))
    println(f"pipeline wall $wall%.1f s, triples $triples, tps ${triples / wall}%.0f")
    println(f"shuffle write ${shufWrite.get / 1e6}%.1f MB, read ${shufRead.get / 1e6}%.1f MB")
    spark.stop()
  }
}
