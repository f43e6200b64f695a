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

  test("portable bloom: no false negative ever, false positives at tight m") {
    val spark2 = spark
    import spark2.implicits._
    val corpus = (0 until 400).map(i => (i.toLong, s"document body $i")).toDF("doc_id", "text")
    val bl = corpus.filter($"doc_id" % 5 === 0).select("text")
    val got = Sketch.portableBloomVerdict(corpus, "text", bl, "text", k = 4, m = 128)
      .select("doc_id", "dropped_bloom").as[(Long, Boolean)].collect().toMap
    // every blocklisted doc is dropped (one-sided guarantee)
    (0 until 400 by 5).foreach(i => assert(got(i.toLong), s"false negative at $i"))
    // 80 keys x 4 hashes in 128 bits: load factor forces false positives
    assert((0 until 400).count(i => i % 5 != 0 && got(i.toLong)) > 0,
      "tight filter produced no false positive — hashing is broken")
  }

  test("portable bloom positions: pinned family, within range, key-sensitive") {
    val a = Sketch.bloomPositions("alpha", 4, 256)
    assert(a.length == 4 && a.forall(p => p >= 0 && p < 256))
    assert(a == Sketch.bloomPositions("alpha", 4, 256))
    assert(a != Sketch.bloomPositions("alphb", 4, 256))
  }

  test("HLL register rank: leading zeros of the 56-bit suffix, 57 floor") {
    // rank bounds: 1..57 for any key; register index within [0, m)
    (0 until 200).foreach { i =>
      val (j, rho) = Sketch.hllRegisterOf(s"key-$i")
      assert(j >= 0 && j < Sketch.HllM)
      assert(rho >= 1 && rho <= 57, s"rank $rho out of range for key-$i")
    }
  }

  test("HLL estimate lands within the 3-sigma band of its 6.5% std error") {
    val spark2 = spark
    import spark2.implicits._
    val n = 5000
    val keys = (0 until n).map(i => s"user-$i").toDF("key")
      .union((0 until n).map(i => s"user-$i").toDF("key")) // dups must not move it
    val row = Sketch.hllSummary(keys, "key").collect().head
    val est = row.getDouble(2)
    val exact = row.getLong(3)
    assert(exact == n)
    assert(math.abs(est - n) / n < 0.20, s"estimate $est too far from $n")
  }

  test("HLL summary is deterministic and register-bounded") {
    val spark2 = spark
    import spark2.implicits._
    val keys = (0 until 1000).map(i => s"k$i").toDF("key")
    val a = Sketch.hllSummary(keys, "key").collect().head
    val b = Sketch.hllSummary(keys, "key").collect().head
    assert(a == b)
    assert(a.getLong(0) == Sketch.HllM && a.getLong(1) >= 0)
    assert(Sketch.hllRegisters(keys, "key").count() <= Sketch.HllM)
  }
}
