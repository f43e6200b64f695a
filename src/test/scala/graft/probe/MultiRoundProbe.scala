package graft.probe

/** One-off diagnostic: does the bench-scale synthetic corpus (with the
  * Dict.longTail gadgets on ids >= 100000) drive the inference loop through
  * >= 2 distributed rounds under the bench thresholds (minNsSize=1000,
  * minDomainOccurs=100)? Prints per-round stage metrics, the rounds count,
  * and the inferred namespaces.
  */
object MultiRoundProbe {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.nonEmpty) args(0).toLong else 300000L
    val spark = graft.SparkSuite.spark
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-mr").toString
    val pages = graft.extract.Synth.pages(spark, nPages, partitions = 32)
    val res = graft.pipeline.Pipeline.run(spark, pages,
      graft.pipeline.Pipeline.Config(outDir = out, minOccurs = 10,
        resume = false, minNsSize = 1000, minDomainOccurs = 100))
    res.metrics.foreach(m => println(s"STAGE ${m.name} rows=${m.rows} wall=${m.wallMs}ms"))
    println(s"ROUNDS ${res.metrics.count(_.name.startsWith("infer_round"))}")
    println(s"INFERRED ${res.inferredNamespaces.sorted.mkString(", ")}")
    spark.stop()
  }
}
