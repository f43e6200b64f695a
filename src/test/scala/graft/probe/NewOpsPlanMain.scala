package graft.probe

import graft.textops.TextOps
import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic: dump formatted plans of the round-3b text operators
  * (repetitionMetrics / shingleOverlap) to eyeball exchange reuse + partial
  * aggregation before pinning them in PlanSpec.
  */
object NewOpsPlanMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    println("==== repetitionMetrics ====")
    TextOps.repetitionMetrics(docs, "doc_id", "text").explain("formatted")
    println("==== shingleOverlap ====")
    val so = TextOps.shingleOverlap(docs, "doc_id", "text")
    so.explain("formatted")
    so.collect()
    println("==== shingleOverlap executed (AQE) ====")
    println(so.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
