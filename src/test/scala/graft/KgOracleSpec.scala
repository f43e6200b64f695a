package graft

import graft.extract.{Dict, Synth}
import graft.pipeline.Pipeline
import graft.ns.NsSource
import org.scalatest.funsuite.AnyFunSuite

/** Pins the assumptions baked into the q_kg_* DuckDB oracles
  * (queries/KgSql.scala): the inference outcome over the synthesized corpus
  * family is exactly {pages-wiki, kgraft-res} with the first-host-label
  * aliases, at every scale the driver exercises.
  */
class KgOracleSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def runAt(n: Long) = {
    val out = java.nio.file.Files.createTempDirectory(s"graft-kgoracle-$n").toString
    val cfg = Pipeline.Config(outDir = out, minOccurs = 5,
      minNsSize = 100, minDomainOccurs = 10, resume = false)
    Pipeline.run(spark, Synth.pages(spark, n), cfg)
  }

  test("inference infers exactly {pages wiki, kgraft res} with pinned aliases (oracle contract)") {
    // n=400 is below the smallest driver corpus (4 * 500 docs); the outcome is
    // ratio-driven (counts scale linearly in n), so stability here + the
    // driver's sf0.001/0.01/0.1 value checks cover the whole range.
    val r = runAt(400)
    assert(r.inferredNamespaces.toSet ==
      Set("https://pages.example.com/wiki/", Dict.inferNs))
    val aliasOf = r.registry.byNs.map { case (ns, e) => ns -> e.alias }
    assert(aliasOf("https://pages.example.com/wiki/") == "pages")
    assert(aliasOf(Dict.inferNs) == "kgraft")
    assert(r.registry.byNs(Dict.inferNs).source == NsSource.Inference)
    // every summary group key the oracle's CASE emits, nothing else
    val keys = r.summary.collect().flatMap(row =>
      Seq(row.getString(0), row.getString(1), row.getString(2))).toSet
    assert(keys.subsetOf(Set("dbr", "wd", "kgraft", "BLANK",
      "dbo", "schema", "foaf", "rdfs", "example", "pages", "xsd", "rdf")))
    assert(!keys.contains("UNKNOWN"))
  }

  test("domain/range induction: algebraic struct-min argmax ≡ window argmax") {
    // the engine's map-side-combining argmax (min over (-n, ns)) must pick
    // exactly the row a (n DESC, ns ASC) window rank-1 would — the oracle
    // contract of KgSql.domainRangeSql
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.{functions => F}
    val r = runAt(400)
    val bc = spark.sparkContext.broadcast(r.registry)
    val norm = graft.summarize.Normalize.normalize(r.triples, bc)
      .select("p", "s_ns", "o_ns").cache()
    def windowArgmax(col: String): Map[String, (String, Long)] = {
      val w = Window.partitionBy("p")
        .orderBy(F.col("n").desc, F.col(col).asc)
      norm.groupBy("p", col).agg(F.count(F.lit(1)).as("n"))
        .withColumn("rn", F.row_number().over(w)).filter(F.col("rn") === 1)
        .collect().map(x => x.getString(0) -> ((x.getString(1), x.getLong(2)))).toMap
    }
    def algArgmax(col: String): Map[String, (String, Long)] =
      norm.groupBy(F.col("p"), F.col(col).as("ns"))
        .agg(F.count(F.lit(1)).as("n"))
        .groupBy("p")
        .agg(F.min(F.struct((-F.col("n")).as("nn"), F.col("ns").as("ns"))).as("x"))
        .select(F.col("p"), F.col("x.ns"), (-F.col("x.nn")).as("n"))
        .collect().map(x => x.getString(0) -> ((x.getString(1), x.getLong(2)))).toMap
    assert(algArgmax("s_ns") == windowArgmax("s_ns"))
    assert(algArgmax("o_ns") == windowArgmax("o_ns"))
    norm.unpersist()
  }

  test("kg page corpus scales with the documents table (4x)") {
    val n = graft.queries.Queries.kgPageCount(spark, "/root/testdata/sf0.001")
    assert(n == 2000L)
  }
}
