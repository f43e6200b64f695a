package graft.probe

object SemDedupPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSuite.spark
    val df = graft.queries.Queries.semanticDedup(spark, "/root/testdata/sf0.001")
    df.collect()
    println("==== FINAL ====")
    println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    spark.stop()
  }
}
