package graft.probe

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans of the scale-critical queries (manual
  * explain audit; see BASELINE.md / ROUND_NOTES).
  */
object PlanDumpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    args.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
