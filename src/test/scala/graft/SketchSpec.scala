package graft

import graft.sketch.Sketch
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "alpha alpha alpha beta beta gamma"),
    (1L, "alpha beta delta delta epsilon"),
    (2L, "alpha zeta eta theta iota kappa lambda mu nu xi")
  ).toDF("doc_id", "text")

  test("CMS never under-estimates; exact at collision-free width") {
    val hh = Sketch.cmsHeavyHitters(docs, "text", width = 1024, threshold = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(hh.nonEmpty)
    hh.foreach { case (tok, est, exact) =>
      assert(est >= exact, s"under-estimate for $tok: $est < $exact")
    }
    // 17 distinct tokens in 4x1024 cells: collision-free => estimates exact
    assert(hh.forall { case (_, est, exact) => est == exact })
    assert(hh.find(_._1 == "alpha").map(_._3).contains(5L))
  }

  test("tiny width forces collisions: over-estimates appear, floor holds") {
    val hh = Sketch.cmsHeavyHitters(docs, "text", width = 2, threshold = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(hh.exists { case (_, est, exact) => est > exact },
      "17 keys in 4x2 cells produced no over-estimate — hashing is broken")
    hh.foreach { case (tok, est, exact) => assert(est >= exact, tok) }
  }

  test("cell table is sketch-bounded and additive") {
    val cells = Sketch.cmsCells(docs, "text", width = 8).collect()
    assert(cells.length <= Sketch.Depth * 8)
    val totalPerRow = cells.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum)
    // every sketch row sums to the total occurrence count
    val n = docs.select(F.explode(graft.textops.TextOps.tokens(F.col("text")))).count()
    (0 until Sketch.Depth).foreach(d => assert(totalPerRow(d) == n, s"row $d"))
  }

  test("cell build partial-aggregates before the exchange (map-side combine)") {
    val plan = Sketch.cmsCells(docs, "text", width = 8)
      .queryExecution.executedPlan.toString
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"no partial aggregation phase in:\n$plan")
  }

  test("width must be a power of two") {
    intercept[IllegalArgumentException] {
      Sketch.cmsCells(docs, "text", width = 100)
    }
  }
}
