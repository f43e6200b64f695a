package graft.probe

import org.apache.spark.sql.SparkSession

/** Times selected driver queries in isolation (diagnosis aid). */
object QueryTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_n3_infer_ns", "q_o1_stmt_ids", "q_p4_resolve_ns", "q_p3_canonicalize", "q_sim_topk")
    (1 to 2).foreach { rep =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        println(f"PROBE rep$rep $n ${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
