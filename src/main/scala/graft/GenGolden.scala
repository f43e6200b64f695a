package graft

import graft.extract.Synth
import graft.pipeline.Pipeline
import java.nio.file.{Files, Paths}

/** One-shot generator for the golden end-to-end fixtures (FIXTURES.md §6):
  * 1k-page corpus -> output.ttl / vis-data.json / all-prefixes.json / summary
  * CSV checked into src/test/resources/golden and compared byte-exactly by
  * GoldenSpec from then on.
  */
object GenGolden {
  val GoldenDir = "src/test/resources/golden"
  val Pages = 1000L
  def config(outDir: String): Pipeline.Config =
    Pipeline.Config(outDir = outDir, minOccurs = 10,
      minNsSize = 200, minDomainOccurs = 20, resume = false)

  def summaryCsv(rows: Seq[graft.model.SummaryRow]): String =
    "s_ns,p_ns,o_ns,is_datatype,occurs\n" + rows
      .sortBy(r => (r.s_ns, r.p_ns, r.o_ns, r.is_datatype))
      .map(r => s"${r.s_ns},${r.p_ns},${r.o_ns},${r.is_datatype},${r.occurs}")
      .mkString("\n") + "\n"

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = Files.createTempDirectory("golden").toString
    val res = Pipeline.run(spark, Synth.pages(spark, Pages), config(out))
    Files.createDirectories(Paths.get(GoldenDir))
    Seq("output.ttl", "vis-data.json", "all-prefixes.json").foreach { f =>
      Files.copy(Paths.get(out, f), Paths.get(GoldenDir, f),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val rows = graft.sinks.TtlSink.collectRows(res.summary)
    Files.write(Paths.get(GoldenDir, "summary.csv"), summaryCsv(rows).getBytes("UTF-8"))
    println(s"golden files written to $GoldenDir (${rows.size} summary rows)")
    spark.stop()
  }
}
