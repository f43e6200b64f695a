package graft.probe

import org.apache.spark.sql.{SparkSession, functions => F}

/** Empirically pin Spark's append-mode watermark semantics under
  * Trigger.AvailableNow with a deterministic file→micro-batch schedule:
  * which late rows are dropped, when windows emit, and what the final
  * watermark flush does. Feeds the q_stream_late oracle design.
  */
object WatermarkProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // bucket k  →  batch k (maxFilesPerTrigger=1, lexical listing order)
    // minute offsets per bucket; watermark delay 10 min; window 10 min
    val data = Seq(
      (0, Seq(2, 50)),              // m0=50 → wmEvict(b1)=40
      (1, Seq(30, 39)),             // [30,40) end==40: emitted at b1 iff rule is <=
      (2, Seq(35)),                 // dropped iff [30,40) already evicted
      (3, Seq(70))
    ).flatMap { case (b, mins) => mins.map(m => (b, m)) }
    val df = data.toDF("bucket", "min")
      .withColumn("ts", F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,min,0)"))
    val dir = java.nio.file.Files.createTempDirectory("wm-probe").toString
    df.write.mode("overwrite").partitionBy("bucket").parquet(dir)

    val src = spark.readStream
      .schema("min INT, ts TIMESTAMP, bucket INT")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    val agg = src.withWatermark("ts", "10 minutes")
      .groupBy(F.window(F.col("ts"), "10 minutes"))
      .agg(F.count(F.lit(1)).as("n"), F.sort_array(F.collect_list("min")).as("mins"))
    val q = agg
      .select(F.col("window.start").cast("string").as("ws"), F.col("n"), F.col("mins"))
      .writeStream.outputMode("append").format("memory").queryName("wm_probe")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      println(s"batch=${p.batchId} rows=${p.numInputRows} watermark=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")} dropped=${Option(p.stateOperators).map(_.toSeq.map(_.numRowsDroppedByWatermark).sum)}")
    }
    println("RESULT:")
    spark.table("wm_probe").orderBy("ws").show(50, false)
    spark.stop()
  }
}
