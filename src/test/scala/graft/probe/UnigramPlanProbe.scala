package graft.probe

/** One-off diagnostic: print the executed plan of TextOps.unigramLogProb to
  * see whether the (id,tok) exchange is reused across the freq/score branches.
  */
object UnigramPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSuite.spark
    val df = graft.queries.Queries.textUnigramLm(spark, "/root/testdata/sf0.001")
    df.collect()
    println("==== EXECUTED ====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
