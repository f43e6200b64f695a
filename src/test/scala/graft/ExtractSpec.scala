package graft

import graft.extract._
import graft.model.Kind
import org.scalatest.funsuite.AnyFunSuite

class ExtractSpec extends AnyFunSuite {

  test("extractText strips tags, scripts, comments, entities deterministically") {
    val html =
      """<html><head><title>T</title><script>var x = "<p>";</script></head>
        |<body><!-- c --><h1>Hello &amp; welcome</h1>
        |<p>Line   one.</p><p>Two &lt;3.</p>
        |<div>  spaced   out  </div></body></html>""".stripMargin
    assert(HtmlText.extractText(html) == "Hello & welcome\nLine one.\nTwo <3.\nspaced out")
  }

  test("extractText handles numeric entities and nbsp") {
    assert(HtmlText.extractText("<p>a&#65;&#x42;&nbsp;c</p>") == "aAB c")
  }

  test("per-row invariant: extractText(html) == text for synthesized pages") {
    (0L until 500L).foreach { id =>
      val p = Synth.page(id)
      val got = HtmlText.extractText(p.html)
      assert(got == p.text, s"page $id:\n---got---\n$got\n---want---\n${p.text}")
    }
    // bench-range ids: the long-tail gadget line (ids >= 100000, id % 1009 < 8)
    // must round-trip too — the q_html_extract oracle reconstructs it
    (100000L until 100000L + 2018L).foreach { id =>
      val p = Synth.page(id)
      assert(HtmlText.extractText(p.html) == p.text, s"tail page $id")
    }
    assert((100000L until 102018L).exists(id => Synth.page(id).text.contains("Tachyon Spool")))
  }

  test("pageUrlText: projection parity with the full page (no-html fast path)") {
    // the r6 extraction prefix skips html construction for consumers that
    // provably never read it — the projection must stay byte-identical
    ((0L until 500L) ++ (100000L until 100200L)).foreach { id =>
      val p = Synth.page(id)
      val (url, text) = Synth.pageUrlText(id)
      assert(url == p.url && text == p.text, s"page $id url/text projection drift")
    }
  }

  test("synthesis is deterministic across calls") {
    val a = Synth.page(123L)
    val b = Synth.page(123L)
    assert(a.url == b.url && a.text == b.text && java.util.Arrays.equals(a.html, b.html)
      && a.warc_ts == b.warc_ts && a.lang == b.lang)
  }

  test("grapheme truncation caps at 200 clusters (prefixes.rs:431-444)") {
    val longIri = "http://x.org/" + "a" * 300
    assert(Canonical.graphemeTruncate(longIri).length == 200)
    val short = "http://x.org/abc"
    assert(Canonical.graphemeTruncate(short) eq short)
    // combining sequence: e + U+0301 is ONE grapheme; 200 such = 400 chars survive
    val combining = "é" * 250
    val truncated = Canonical.graphemeTruncate(combining)
    assert(truncated == "é" * 200)
  }

  test("mention detection: greedy longest match at word boundaries") {
    val ms = Mentions.detect("Ada Lovelace knows Alan Turing.")
    assert(ms.map(_.surface) == Vector("Ada Lovelace", "Alan Turing"))
    // no partial-word match
    assert(Mentions.detect("XLondonY is not a mention").isEmpty)
    assert(Mentions.detect("but London is").map(_.surface) == Vector("London"))
  }

  test("entity linking: prior wins without context, context flips the choice") {
    val noCtx = Mentions.link("Mercury", Set("it", "shines"))
    assert(noCtx.map(_._1).contains(Dict.dbr + "Mercury_(planet)"))
    val metalCtx = Mentions.link("Mercury", Set("liquid", "metal"))
    assert(metalCtx.map(_._1).contains(Dict.dbr + "Mercury_(element)"))
    assert(metalCtx.exists(_._2 > 1.3))
  }

  test("OpenIE R1: relation between two mentions") {
    val ts = OpenIE.extract("http://u", "Ada Lovelace was born in London.")
    val rel = ts.filter(_.p == Dict.dbo + "birthPlace")
    assert(rel.size == 1)
    assert(rel.head.s == Dict.dbr + "Ada_Lovelace")
    assert(rel.head.o == Dict.dbr + "London")
    assert(rel.head.sKind == Kind.IRI && rel.head.oKind == Kind.IRI)
  }

  test("OpenIE R2: birth-year typed literal") {
    val ts = OpenIE.extract("http://u", "Grace Hopper was born in 1906.")
    val lit = ts.filter(_.p == Dict.dbo + "birthYear")
    assert(lit.size == 1)
    assert(lit.head.o == "1906" && lit.head.oKind == Kind.LIT_TYPED)
    assert(lit.head.oDt.contains(Dict.xsd + "integer"))
  }

  test("OpenIE R3/R5/R6: abstract plain literal, label lang literal, provenance IRI") {
    val ts = OpenIE.extract("http://u/1", "Alan Turing is described on page 7.")
    assert(ts.exists(t => t.p == Dict.dbo + "abstract" && t.oKind == Kind.LIT_PLAIN))
    val label = ts.filter(_.p == Dict.rdfs + "label")
    assert(label.size == 1 && label.head.oKind == Kind.LIT_LANG
      && label.head.oLang.contains("en") && label.head.o == "Alan Turing")
    assert(ts.exists(t => t.p == Dict.schemaNs + "mainEntityOfPage" && t.o == "http://u/1"))
  }

  test("OpenIE R4: blank-node subject") {
    val ts = OpenIE.extract("http://u", "Someone knows Data Forge.")
    val blanks = ts.filter(_.sKind == Kind.BLANK)
    assert(blanks.size == 1)
    assert(blanks.head.p == Dict.foaf + "knows")
    assert(blanks.head.o == Dict.inferNs + "Data_Forge")
  }

  test("OpenIE is deterministic and pure per page") {
    val spec = Synth.pageSpec(42L)
    val text = Synth.textOf(spec)
    val a = OpenIE.extract(spec.url, text)
    val b = OpenIE.extract(spec.url, text)
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("expected triples exist for every synthetic page (P/R support)") {
    (0L until 200L).foreach { id =>
      val p = Synth.page(id)
      val ts = OpenIE.extract(p.url, p.text)
      // every page has: >=2 relation sentences, birthYear, abstract, blank, label, provenance
      assert(ts.count(_.oKind == Kind.IRI) >= 3, s"page $id")
      assert(ts.exists(_.oKind == Kind.LIT_TYPED), s"page $id")
      assert(ts.exists(_.oKind == Kind.LIT_PLAIN), s"page $id")
      assert(ts.exists(_.oKind == Kind.LIT_LANG), s"page $id")
      assert(ts.exists(_.sKind == Kind.BLANK), s"page $id")
    }
  }

  test("Blocks.blockProfiles: verdicts on handcrafted blocks; messy " +
    "whitespace and attributes survive; zero shuffle") {
    val spark2 = SparkSuite.spark
    import spark2.implicits._
    val html =
      "<html><body>" +
        // link-dense nav with attribute noise -> bad
        "<p><a class=\"x\" href=\"/a\">home page link</a> <a href=\"/b\">more</a></p>" +
        // long stopword-rich content with messy whitespace -> good
        "<p>the  cat sat on the\n mat and the dog lay in the sun of the day</p>" +
        // tiny -> bad
        "<p>tiny row</p>" +
        // wordy but stopword-poor -> near_good
        "<p>alpha beta gamma delta epsilon zeta eta theta iota kappa lambda</p>" +
        "</body></html>"
    val got = graft.extract.Blocks.blockProfiles(
        Seq((7L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .collect().map(r => r.getInt(1) -> ((r.getLong(4), r.getString(8)))).toMap
    assert(got(0)._2 == "bad")
    assert(got(1)._2 == "good")
    assert(got(1)._1 == 16L) // whitespace collapsed before tokenizing
    assert(got(2)._2 == "bad")
    assert(got(3)._2 == "near_good")
    val plan = graft.extract.Blocks.blockProfiles(
        Seq((7L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shuffle in a pure projection:\n$plan")
  }
}
