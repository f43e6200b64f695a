package graft.probe

/** Throwaway diagnostic: dump q_url_normalize's Spark result for a focused
  * DuckDB parity check without a full Verify cycle.
  */
object UrlDumpMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("urldump")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.queries.Queries.urlCanonicalize(spark, "/root/testdata/sf0.001")
      .coalesce(1).write.mode("overwrite").parquet("/tmp/url_spark_out")
    spark.stop()
  }
}
