package graft.probe

import graft.sim.Similarity
import org.apache.spark.sql.{functions => F, SparkSession}

/** A/B: codegen'd CosineSim vs the higher-order-function Column form over
  * the same 1M synthetic 64-dim pairs, same session.
  */
object CosineAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = spark.range(1, 1000001).select(
      F.transform(F.sequence(F.lit(1), F.lit(64)),
        i => ((F.pmod(F.col("id") * i, F.lit(97)) + 1) / 98.0).cast("float")).as("va"),
      F.transform(F.sequence(F.lit(1), F.lit(64)),
        i => ((F.pmod(F.col("id") * i + 13, F.lit(89)) + 1) / 90.0).cast("float")).as("vb"))
      .cache()
    d.count()
    def time(label: String, c: org.apache.spark.sql.Column): Unit = {
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        d.select(F.sum(c)).collect()
        println(f"AB rep$rep $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("codegen", Similarity.cosine($"va", $"vb"))
    time("hof    ", Similarity.cosineColumns($"va", $"vb"))
    spark.stop()
  }
}
