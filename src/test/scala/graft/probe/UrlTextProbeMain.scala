package graft.probe

import graft.extract.{Mentions, OpenIE, Synth}

/** Bisect the q_kg_mentions / q_kg_temporal regression: old Page path vs new
  * (url, text) tuple path, with and without ordering.
  */
object UrlTextProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 20000L
    def time(name: String)(f: => Long): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val r = f
        println(f"$name%-34s run$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($r rows)")
      }
    time("pages.count") { Synth.pages(spark, n).count() }
    time("pagesUrlText.count") { Synth.pagesUrlText(spark, n).count() }
    time("old mentions: pages.flatMap") {
      Synth.pages(spark, n).flatMap(p => Mentions.mentionsOf(p.url, p.text)).count()
    }
    time("new mentions: urlText.flatMap") {
      Synth.pagesUrlText(spark, n)
        .flatMap { case (u, t) => Mentions.mentionsOf(u, t) }.count()
    }
    time("old triples") {
      graft.pipeline.Pipeline.extractTriples(Synth.pages(spark, n)).count()
    }
    time("new triples") {
      graft.pipeline.Pipeline.extractTriplesUrlText(Synth.pagesUrlText(spark, n)).count()
    }
    spark.stop()
  }
}
