package graft.probe

import org.apache.spark.sql.{SparkSession, functions => F}

/** Reproduce q_stream_late's staging at sf0.01 and print the actual
  * micro-batch schedule (rows, event-time max, watermark) to diagnose the
  * emission-horizon mismatch.
  */
object LateProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"

    import org.apache.spark.sql.expressions.Window
    val stage = java.nio.file.Files.createTempDirectory("late-probe")
    val tmpRoot = java.nio.file.Files.createTempDirectory("late-probe-tmp")
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", F.lit(null).cast("string"))
    val bNat = F.ntile(8).over(Window.orderBy("ts", "event_id")) - 1
    val staged = ev.withColumn("b_nat", bNat)
      .withColumn("bucket", F.when(F.col("event_id") % 37 === 0,
        (F.col("b_nat") + 3) % 8).otherwise(F.col("b_nat")))
      .localCheckpoint()
    (0 until 8).foreach { k =>
      val tmp = s"$tmpRoot/seg-$k"
      staged.filter(F.col("bucket") === k).drop("b_nat", "bucket")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val parts = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      println(s"bucket $k: ${parts.length} part files")
      val dest = new java.io.File(stage.toFile, f"seg-$k%d.parquet")
      java.nio.file.Files.move(parts.head.toPath, dest.toPath)
      val ok = dest.setLastModified(1700000000000L + k * 1000L)
      println(s"  setLastModified ok=$ok now=${dest.lastModified()}")
    }
    // expected per-bucket maxima
    staged.groupBy("bucket").agg(F.max("ts").as("mx"), F.count(F.lit(1)).as("n"))
      .orderBy("bucket").collect()
      .foreach(r => println(s"bucket ${r.get(0)}: n=${r.get(2)} max=${r.get(1)}"))

    val name = "late_probe"
    val q = graft.streaming.EventStream.startMemoryLateWindows(
      spark, stage.toString, name, maxFilesPerTrigger = 2)
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      println(s"batch=${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")}")
    }
    println("emitted rows: " + spark.table(name).count())
    spark.stop()
  }
}
