package graft

import graft.operators.{AsofJoin, RangeJoin}
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** As-of and range joins: semantics on hand-built cases, parity with the
  * brute-force theta-join definitions, and the plan-shape pins that make
  * them scale (one equi-shuffle, never a nested-loop product).
  */
class JoinOpsSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  // --------------------------------------------------------------------
  // As-of join
  // --------------------------------------------------------------------

  private def asofToy = {
    val probes = Seq((1L, 10L, 100L), (1L, 25L, 101L), (1L, 5L, 102L), (2L, 7L, 103L))
      .toDF("k", "t", "pid")
    val state = Seq((1L, 10L, 900L), (1L, 20L, 901L), (2L, 50L, 902L))
      .toDF("k", "t", "sid")
    AsofJoin.asofJoin(probes, state, "k", "t", Seq("pid"), Seq("sid"))
      .select("pid", "sid").as[(Long, Option[Long])].collect().toMap
  }

  test("asof join: inclusive match, carry-forward, null when nothing precedes") {
    val got = asofToy
    assert(got(100L).contains(900L)) // exact-ts state row matches (inclusive)
    assert(got(101L).contains(901L)) // latest prior wins, not just any prior
    assert(got(102L).isEmpty)        // probe before all state => null
    assert(got(103L).isEmpty)        // state exists but only in the future
  }

  test("asof join: parity with the brute-force argmax theta join") {
    val probes = (0L until 400L)
      .map(i => (i % 7, (i * 131) % 997, i)).toDF("k", "t", "pid")
    val state = (0L until 150L)
      .map(j => (j % 7, (j * 241) % 991, 1000L + j)).toDF("k", "t", "sid")
      .groupBy("k", "t").agg(F.max("sid").as("sid")) // unique per (k, t)
    val fast = AsofJoin.asofJoin(probes, state, "k", "t", Seq("pid"), Seq("sid"))
      .select("pid", "sid").as[(Long, Option[Long])].collect().toMap
    val brute = probes.as("p")
      .join(state.as("s"), $"p.k" === $"s.k" && $"s.t" <= $"p.t", "left")
      .groupBy($"p.pid")
      .agg(F.max(F.struct($"s.t", $"s.sid")).getField("sid").as("sid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(fast == brute)
  }

  test("asof join plans one key shuffle, never a nested-loop join") {
    val probes = (0L until 50L).map(i => (i % 3, i, i)).toDF("k", "t", "pid")
    val state = (0L until 20L).map(j => (j % 3, j * 2, 100L + j)).toDF("k", "t", "sid")
    val plan = AsofJoin.asofJoin(probes, state, "k", "t", Seq("pid"), Seq("sid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop join in asof plan:\n$plan")
  }

  // --------------------------------------------------------------------
  // Range join
  // --------------------------------------------------------------------

  test("range join: boundary inclusivity and multi-bucket intervals") {
    val points = Seq((0L, 0L), (1L, 10L), (2L, 20L), (3L, 21L), (4L, 512L), (5L, 1023L))
      .toDF("pid", "p")
    // interval B spans 3 buckets at width 512; A tests exact lo/hi endpoints
    val intervals = Seq(("A", 10L, 20L), ("B", 500L, 1100L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.bucketedRangeJoin(points, intervals, "p", "lo", "hi", 512L)
      .select("iid", "pid").as[(String, Long)].collect().toSet
    assert(got == Set(("A", 1L), ("A", 2L), ("B", 4L), ("B", 5L)))
  }

  test("range join: parity with the BETWEEN theta join, each pair emitted once") {
    val points = (0L until 500L).map(i => (i, (i * 101) % 4096)).toDF("pid", "p")
    val intervals = (0L until 120L)
      .map(j => (j, (j * 211) % 4096, (j * 211) % 4096 + j % 300)).toDF("iid", "lo", "hi")
    val fast = RangeJoin.bucketedRangeJoin(points, intervals, "p", "lo", "hi", 256L)
      .select("iid", "pid").as[(Long, Long)].collect().toSeq
    val brute = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
      .select("iid", "pid").as[(Long, Long)].collect().toSeq
    assert(fast.size == fast.toSet.size, "bucketed form emitted a duplicate pair")
    assert(fast.toSet == brute.toSet)
    assert(fast.size == brute.size)
  }

  test("range join plans an equi-join, never a nested-loop product") {
    val points = (0L until 100L).map(i => (i, i * 7 % 1000)).toDF("pid", "p")
    val intervals = (0L until 30L).map(j => (j, j * 31 % 1000, j * 31 % 1000 + 50)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.bucketedRangeJoin(points, intervals, "p", "lo", "hi", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop join in range-join plan:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"no equi-join in range-join plan:\n$plan")
  }
}
