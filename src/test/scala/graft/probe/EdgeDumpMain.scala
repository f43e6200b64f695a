package graft.probe

import org.apache.spark.sql.SparkSession

/** Dumps minhash/simhash engine results over an edge-case fixture dir
  * (token-less documents) for oracle cross-validation.
  */
object EdgeDumpMain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("q_dedup_minhash", "q_dedup_simhash").foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
    }
    spark.stop()
  }
}
