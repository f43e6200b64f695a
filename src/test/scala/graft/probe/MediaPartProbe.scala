package graft.probe

/** One-off: partition count of the media query input (a small parquet file
  * reads as one partition -> the whole encode/decode pipeline serializes).
  */
object MediaPartProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSuite.spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").as[Long]
    println("input partitions = " + ids.rdd.getNumPartitions)
    val t0 = System.nanoTime()
    graft.queries.Queries.mediaResize(spark, dir).count()
    println(f"mediaResize wall ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
