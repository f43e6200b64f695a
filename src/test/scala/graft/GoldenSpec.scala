package graft

import graft.extract.Synth
import graft.pipeline.Pipeline
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Golden end-to-end regression (FIXTURES.md §6): the full pipeline over the
  * pinned 1k-page corpus must reproduce the checked-in artifacts byte-exactly.
  * Regenerate intentionally with `runMain graft.GenGolden` after a deliberate
  * semantic change.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def read(p: String) =
    new String(Files.readAllBytes(Paths.get(GenGolden.GoldenDir, p)), "UTF-8")

  test("pipeline output matches the golden files byte-exactly") {
    assume(Files.exists(Paths.get(GenGolden.GoldenDir, "output.ttl")),
      "golden files not generated yet (runMain graft.GenGolden)")
    val out = SparkSuite.tmpDir("golden-check")
    val res = Pipeline.run(spark, Synth.pages(spark, GenGolden.Pages), GenGolden.config(out))
    Seq("output.ttl", "vis-data.json", "all-prefixes.json").foreach { f =>
      val got = new String(Files.readAllBytes(Paths.get(out, f)), "UTF-8")
      assert(got == read(f), s"$f diverged from golden")
    }
    val rows = graft.sinks.TtlSink.collectRows(res.summary)
    assert(GenGolden.summaryCsv(rows) == read("summary.csv"))
  }
}
