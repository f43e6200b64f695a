package graft.probe

import org.apache.spark.sql.SparkSession

/** Diagnostic: dump q_rdf_parse rows to decide/check the pinned oracle. */
object RdfParseDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.Queries.rdfParse(spark, "/root/testdata/sf0.001")
    df.orderBy("file", "s", "p", "o").collect().foreach { r =>
      println(Seq(r.get(0), r.get(1), r.get(2), r.get(3), r.get(4), r.get(5), r.get(6), r.get(7))
        .map(v => if (v == null) "NULL" else v.toString).mkString(" | "))
    }
    spark.stop()
  }
}
