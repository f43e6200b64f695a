package graft.probe

import graft.sim.Similarity
import org.apache.spark.sql.{functions => F}

/** r6 profiling probe: where does q_embed_mutual_knn's time go?
  * (a) scored crossJoin (cosine only), (b) + round, (c) + TopKAgg,
  * (d) the full mutual-knn query. Run:
  *   sbt -batch "Test/runMain graft.probe.TopKProbeMain"
  */
object TopKProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"n embeddings = ${emb.count()}, dim = ${emb.selectExpr("size(embedding)").head().getInt(0)}")
    def time(name: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%.3f s  (rows=$n)")
      }
    }
    val q = emb.select(F.col("vec_id").as("query_id"), F.col("embedding").as("qv"))
    val c = emb.select(F.col("vec_id").as("neighbor_id"), F.col("embedding").as("cv"))
    val joined = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") =!= F.col("query_id"))
    time("crossJoin+cosine") {
      joined.withColumn("sim", Similarity.cosine(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "sim")
        .write.format("noop").mode("overwrite").save(); 0L
    }
    time("crossJoin+cosine+round") {
      joined.withColumn("sim", F.round(Similarity.cosine(F.col("qv"), F.col("cv")), 6))
        .select("query_id", "neighbor_id", "sim")
        .write.format("noop").mode("overwrite").save(); 0L
    }
    time("bruteTopK (k=5)") {
      Similarity.bruteTopK(emb, emb, "vec_id", "embedding", 5).count()
    }
    time("mutual-knn full") {
      graft.queries.Queries.embedMutualKnn(spark, dir).count()
    }
    spark.stop()
  }
}
