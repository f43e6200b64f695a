package graft.probe

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-job wall-time probe: runs one catalog query and prints every Spark
  * job's duration — pinpoints which of an iterative operator's jobs carry
  * the wall time. Usage:
  *   sbt -batch "Test/runMain graft.probe.JobTimeProbeMain q_kg_hits"
  */
object JobTimeProbeMain {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q_kg_hits"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = starts.getOrDefault(j.jobId, j.time)
        lines.add(f"job ${j.jobId}%3d  ${(j.time - t0) / 1000.0}%7.3f s")
      }
    })
    val fn = graft.SparkEntry.queries(name)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fn(spark, dir).count() // warmup
    lines.clear()
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    lines.forEach(l => println(l))
    println(f"TOTAL $name $wall%.3f s, jobs=${lines.size}")
    spark.stop()
  }
}
