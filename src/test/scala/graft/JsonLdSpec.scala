package graft

import graft.extract.JsonLd
import org.scalatest.funsuite.AnyFunSuite

class JsonLdSpec extends AnyFunSuite {

  test("parser: escapes, unicode, numbers, booleans, null, nesting") {
    val json =
      """{ "a": "x\"y\\z\nA", "n": -3.5e2, "b": true, "z": null,
        |  "arr": [1, "two", {"@id": "http://x/e"}] }""".stripMargin
    val Some(JsonLd.JObj(fields)) = JsonLd.parseJson(json)
    val m = fields.toMap
    assert(m("a") == JsonLd.JStr("x\"y\\z\nA"))
    assert(m("n") == JsonLd.JNum("-3.5e2"))
    assert(m("b") == JsonLd.JBool(true))
    assert(m("z") == JsonLd.JNull)
    val JsonLd.JArr(items) = m("arr")
    assert(items(0) == JsonLd.JNum("1") && items(1) == JsonLd.JStr("two"))
  }

  test("parser: malformed blocks rejected, never thrown") {
    assert(JsonLd.parseJson("""{"a": }""").isEmpty)
    assert(JsonLd.parseJson("""{"a": 1""").isEmpty)
    assert(JsonLd.parseJson("""{"a": 1} trailing""").isEmpty)
    assert(JsonLd.parseJson("").isEmpty)
  }

  test("block discovery: ld+json found regardless of quote style/case, decoys ignored") {
    val html =
      """<script>var x = '{"@id":"decoy"}';</script>
        |<SCRIPT TYPE='application/ld+json'>{"@id":"http://x/a","p":"1"}</SCRIPT>
        |<script async type="application/ld+json">{"@id":"http://x/b","p":"2"}</script>""".stripMargin
    assert(JsonLd.scriptBlocks(html).size == 2)
    val subjects = JsonLd.triples(html).map(_._1).toSet
    assert(subjects == Set("http://x/a", "http://x/b"))
  }

  test("triple mapping: @type resolution, nested @id recursion, arrays, no-@id dropped") {
    val html =
      """<script type="application/ld+json">
        |{ "@context": "https://schema.org",
        |  "@id": "http://x/e1",
        |  "@type": "Person",
        |  "name": "Ann \"A\"",
        |  "age": 41,
        |  "alumni": false,
        |  "worksFor": { "@id": "http://x/org1", "@type": "https://schema.org/Org" },
        |  "address": { "street": "no id, contributes nothing" },
        |  "sameAs": ["http://y/e1", "http://z/e1"] }
        |</script>""".stripMargin
    val ts = JsonLd.triples(html).toSet
    val S = "https://schema.org/"
    val T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert(ts == Set(
      ("http://x/e1", T, S + "Person"),
      ("http://x/e1", S + "name", "Ann \"A\""),
      ("http://x/e1", S + "age", "41"),
      ("http://x/e1", S + "alumni", "false"),
      ("http://x/e1", S + "worksFor", "http://x/org1"),
      ("http://x/org1", T, S + "Org"),      // nested entity recursed
      ("http://x/e1", S + "sameAs", "http://y/e1"),
      ("http://x/e1", S + "sameAs", "http://z/e1")))
  }

  test("top-level arrays (@graph-style lists) map element-wise") {
    val html =
      """<script type="application/ld+json">
        |[ {"@id": "http://x/a", "k": "1"}, {"@id": "http://x/b", "k": "2"}, "stray" ]
        |</script>""".stripMargin
    assert(JsonLd.triples(html).map(_._1).sorted == Vector("http://x/a", "http://x/b"))
  }

  test("distributed surface is a zero-shuffle projection with pruned scan") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val df = Seq((7L, """<script type="application/ld+json">{"@id":"http://x/e7","p":"v"}</script>"""))
      .toDF("doc_id", "html")
    val out = JsonLd.jsonLdTriples(df, "doc_id", "html")
    assert(out.collect().map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSeq
      == Seq((7L, "http://x/e7", "v")))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
