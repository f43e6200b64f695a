package graft

import graft.model.{Kind, Triple}
import graft.rdf.{NTriples, Turtle}
import org.scalatest.funsuite.AnyFunSuite

/** W3C Turtle test-suite subset (the public conformance suite at
  * w3.org/2013/TurtleTests/), vendored as inline fixtures — zero-egress, so
  * the cases are faithful reconstructions named after the official tests
  * (`name ~ w3c test id`). Three families:
  *
  *   - eval: parse Turtle, compare triples against the expected N-Triples
  *     modulo blank-node relabeling (graph isomorphism; labels are never
  *     significant);
  *   - negative syntax: the parser must reject;
  *   - positive syntax: the parser must accept.
  *
  * Known deliberate divergences from full conformance, each asserted below
  * so a behavior change is caught (see the conformance table in
  * ROUND_NOTES.md): (1) `@base`-less documents do not use the document URL
  * as base (the scan layer owns source URLs; relative IRIs pass through);
  * (2) PN_LOCAL/PN_PREFIX character-class checks are lenient (junk local
  * names resolve instead of failing — the extraction side truncates and
  * classifies downstream, chilon `src/iri_trunc.rs` spirit).
  */
class TurtleW3cSpec extends AnyFunSuite {

  // --- graph isomorphism modulo blank labels -------------------------------

  private def key(t: Triple, m: Map[String, String]): String = {
    def term(v: String, k: Byte) =
      if (k == Kind.BLANK) "B:" + m.getOrElse(v, v) else s"$k:$v"
    Seq(term(t.s, t.sKind), t.p, term(t.o, t.oKind),
      t.oLang.getOrElse(""), t.oDt.getOrElse("")).mkString("\u0001")
  }

  private def bnodes(ts: Seq[Triple]): Vector[String] =
    ts.flatMap(t => Seq(t.s -> t.sKind, t.o -> t.oKind))
      .collect { case (v, k) if k == Kind.BLANK => v }.distinct.toVector

  /** Multiset equality under some bijection of blank labels (fixture graphs
    * are tiny, so backtracking over injections is fine).
    */
  private def isomorphic(a: Seq[Triple], b: Seq[Triple]): Boolean = {
    if (a.size != b.size) return false
    val ab = bnodes(a); val bb = bnodes(b)
    if (ab.size != bb.size) return false
    val bKeys = b.map(t => key(t, Map.empty)).sorted
    def assignRec(rem: List[String], used: Set[String], m: Map[String, String]): Boolean =
      rem match {
        case Nil => a.map(t => key(t, m)).sorted == bKeys
        case h :: t =>
          bb.exists(c => !used(c) && assignRec(t, used + c, m + (h -> c)))
      }
    assignRec(ab.toList, Set.empty, Map.empty)
  }

  private def nt(doc: String): Vector[Triple] =
    doc.linesIterator.flatMap(l => NTriples.parseLine(l)).toVector

  private var evalPass = 0
  private def evalCase(name: String, ttl: String, expected: String): Unit =
    test(s"w3c eval ~ $name") {
      val got = Turtle.parse(ttl).triples
      val want = nt(expected)
      assert(isomorphic(got, want),
        s"NOT isomorphic\ngot:\n${got.mkString("\n")}\nwant:\n${want.mkString("\n")}")
      evalPass += 1
    }

  private def negativeCase(name: String, ttl: String): Unit =
    test(s"w3c negative syntax ~ $name") {
      intercept[Exception] { Turtle.parse(ttl) }
    }

  private def positiveCase(name: String, ttl: String): Unit =
    test(s"w3c positive syntax ~ $name") { Turtle.parse(ttl) }

  // --- eval: IRIs, prefixes, escapes ---------------------------------------

  evalCase("IRI_subject",
    "<http://a.example/s> <http://a.example/p> <http://a.example/o> .",
    "<http://a.example/s> <http://a.example/p> <http://a.example/o> .")

  evalCase("IRI_with_four_digit_numeric_escape",
    "<http://a.example/\\u0073> <http://a.example/p> <http://a.example/o> .",
    "<http://a.example/s> <http://a.example/p> <http://a.example/o> .")

  evalCase("IRI_with_eight_digit_numeric_escape",
    "<http://a.example/\\U00000073> <http://a.example/p> <http://a.example/o> .",
    "<http://a.example/s> <http://a.example/p> <http://a.example/o> .")

  evalCase("bareword_a_predicate",
    "<http://a.example/s> a <http://a.example/o> .",
    "<http://a.example/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://a.example/o> .")

  evalCase("old_style_prefix",
    "@prefix p: <http://a.example/> .\np:s <http://a.example/p> <http://a.example/o> .",
    "<http://a.example/s> <http://a.example/p> <http://a.example/o> .")

  evalCase("SPARQL_style_prefix",
    "PREFIX p: <http://a.example/>\np:s <http://a.example/p> <http://a.example/o> .",
    "<http://a.example/s> <http://a.example/p> <http://a.example/o> .")

  evalCase("prefixed_IRI_object",
    "@prefix p: <http://a.example/> .\n<http://a.example/s> <http://a.example/p> p:o .",
    "<http://a.example/s> <http://a.example/p> <http://a.example/o> .")

  evalCase("prefix_only_IRI",
    "@prefix p: <http://a.example/s> .\np: <http://a.example/p> <http://a.example/o> .",
    "<http://a.example/s> <http://a.example/p> <http://a.example/o> .")

  evalCase("default_namespace_IRI",
    "@prefix : <http://a.example/> .\n:s <http://a.example/p> :o .",
    "<http://a.example/s> <http://a.example/p> <http://a.example/o> .")

  evalCase("prefix_reassigned_and_used",
    "@prefix p: <http://a.example/> .\n@prefix p: <http://b.example/> .\np:s <http://a.example/p> <http://a.example/o> .",
    "<http://b.example/s> <http://a.example/p> <http://a.example/o> .")

  evalCase("percent_escaped_localName",
    "@prefix p: <http://a.example/> .\np:%25 <http://a.example/p> <http://a.example/o> .",
    "<http://a.example/%25> <http://a.example/p> <http://a.example/o> .")

  evalCase("HYPHEN_MINUS_in_localName",
    "@prefix p: <http://a.example/> .\np:s-a-b <http://a.example/p> <http://a.example/o> .",
    "<http://a.example/s-a-b> <http://a.example/p> <http://a.example/o> .")

  evalCase("underscore_in_localName",
    "@prefix p: <http://a.example/> .\np:s_a <http://a.example/p> <http://a.example/o> .",
    "<http://a.example/s_a> <http://a.example/p> <http://a.example/o> .")

  evalCase("localname_with_COLON",
    "@prefix p: <http://a.example/> .\np:s:a <http://a.example/p> <http://a.example/o> .",
    "<http://a.example/s:a> <http://a.example/p> <http://a.example/o> .")

  evalCase("localName_with_leading_underscore",
    "@prefix p: <http://a.example/> .\np:_s <http://a.example/p> <http://a.example/o> .",
    "<http://a.example/_s> <http://a.example/p> <http://a.example/o> .")

  evalCase("localName_with_leading_digit",
    "@prefix p: <http://a.example/> .\np:0 <http://a.example/p> <http://a.example/o> .",
    "<http://a.example/0> <http://a.example/p> <http://a.example/o> .")

  evalCase("localName_with_PN_LOCAL_ESC",
    "@prefix p: <http://a.example/> .\np:s\\~a\\!b <http://a.example/p> <http://a.example/o> .",
    "<http://a.example/s~a!b> <http://a.example/p> <http://a.example/o> .")

  evalCase("dots_in_localName (turtle-subm spirit)",
    "@prefix p: <http://a.example/> .\np:s.a.b <http://a.example/p> p:o.c .",
    "<http://a.example/s.a.b> <http://a.example/p> <http://a.example/o.c> .")

  // --- eval: numbers and booleans ------------------------------------------

  evalCase("negative_numeric",
    "<http://a.example/s> <http://a.example/p> -1 .",
    "<http://a.example/s> <http://a.example/p> \"-1\"^^<http://www.w3.org/2001/XMLSchema#integer> .")

  evalCase("positive_numeric",
    "<http://a.example/s> <http://a.example/p> +1 .",
    "<http://a.example/s> <http://a.example/p> \"+1\"^^<http://www.w3.org/2001/XMLSchema#integer> .")

  evalCase("numeric_with_leading_0",
    "<http://a.example/s> <http://a.example/p> 07 .",
    "<http://a.example/s> <http://a.example/p> \"07\"^^<http://www.w3.org/2001/XMLSchema#integer> .")

  evalCase("decimal (turtle-subm-18 spirit)",
    "<http://a.example/s> <http://a.example/p> 1.5 .",
    "<http://a.example/s> <http://a.example/p> \"1.5\"^^<http://www.w3.org/2001/XMLSchema#decimal> .")

  evalCase("bare_decimal_leading_dot",
    "<http://a.example/s> <http://a.example/p> .5 .",
    "<http://a.example/s> <http://a.example/p> \".5\"^^<http://www.w3.org/2001/XMLSchema#decimal> .")

  evalCase("double_lower_case_e",
    "<http://a.example/s> <http://a.example/p> 1e0 .",
    "<http://a.example/s> <http://a.example/p> \"1e0\"^^<http://www.w3.org/2001/XMLSchema#double> .")

  evalCase("double_empty_fraction (grammar [21]: [0-9]+ '.' [0-9]* EXPONENT)",
    "<http://a.example/s> <http://a.example/p> 1.e3 .",
    "<http://a.example/s> <http://a.example/p> \"1.e3\"^^<http://www.w3.org/2001/XMLSchema#double> .")

  evalCase("double_empty_fraction_signed_exponent",
    "<http://a.example/s> <http://a.example/p> -42.E-2 .",
    "<http://a.example/s> <http://a.example/p> \"-42.E-2\"^^<http://www.w3.org/2001/XMLSchema#double> .")

  evalCase("integer_dot_terminates (grammar [19]: `1.` is 1 then DOT)",
    "<http://a.example/s> <http://a.example/p> 1. <http://a.example/s2> <http://a.example/p2> <http://a.example/o2> .",
    """<http://a.example/s> <http://a.example/p> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .
      |<http://a.example/s2> <http://a.example/p2> <http://a.example/o2> .""".stripMargin)

  evalCase("literal_true",
    "<http://a.example/s> <http://a.example/p> true .",
    "<http://a.example/s> <http://a.example/p> \"true\"^^<http://www.w3.org/2001/XMLSchema#boolean> .")

  evalCase("literal_false",
    "<http://a.example/s> <http://a.example/p> false .",
    "<http://a.example/s> <http://a.example/p> \"false\"^^<http://www.w3.org/2001/XMLSchema#boolean> .")

  // --- eval: strings and language tags -------------------------------------

  evalCase("langtagged_non_LONG",
    "<http://a.example/s> <http://a.example/p> \"chat\"@en .",
    "<http://a.example/s> <http://a.example/p> \"chat\"@en .")

  evalCase("langtagged_LONG_with_subtag",
    "<http://a.example/s> <http://a.example/p> \"\"\"Cheers\"\"\"@en-UK .",
    "<http://a.example/s> <http://a.example/p> \"Cheers\"@en-UK .")

  evalCase("literal_with_escaped_newline_and_tab",
    "<http://a.example/s> <http://a.example/p> \"a\\nb\\tc\" .",
    "<http://a.example/s> <http://a.example/p> \"a\\nb\\tc\" .")

  evalCase("literal_with_numeric_escape4",
    "<http://a.example/s> <http://a.example/p> \"\\u006F\" .",
    "<http://a.example/s> <http://a.example/p> \"o\" .")

  evalCase("LITERAL1_all_quote_styles_agree",
    "<http://a.example/s> <http://a.example/p> 'x', \"x\", '''x''', \"\"\"x\"\"\" .",
    """<http://a.example/s> <http://a.example/p> "x" .
      |<http://a.example/s> <http://a.example/p> "x" .
      |<http://a.example/s> <http://a.example/p> "x" .
      |<http://a.example/s> <http://a.example/p> "x" .""".stripMargin)

  evalCase("LITERAL_LONG2_with_embedded_quotes",
    "<http://a.example/s> <http://a.example/p> \"\"\"a\"b''c\"\"\" .",
    "<http://a.example/s> <http://a.example/p> \"a\\\"b''c\" .")

  evalCase("typed_literal_with_prefixed_datatype",
    "@prefix x: <http://www.w3.org/2001/XMLSchema#> .\n<http://a.example/s> <http://a.example/p> \"5\"^^x:byte .",
    "<http://a.example/s> <http://a.example/p> \"5\"^^<http://www.w3.org/2001/XMLSchema#byte> .")

  // --- eval: blank nodes ----------------------------------------------------

  evalCase("labeled_blank_node_subject",
    "_:s <http://a.example/p> <http://a.example/o> .",
    "_:s <http://a.example/p> <http://a.example/o> .")

  evalCase("anonymous_blank_node_subject",
    "[] <http://a.example/p> <http://a.example/o> .",
    "_:b <http://a.example/p> <http://a.example/o> .")

  evalCase("anonymous_blank_node_object",
    "<http://a.example/s> <http://a.example/p> [] .",
    "<http://a.example/s> <http://a.example/p> _:b .")

  evalCase("sole_blankNodePropertyList",
    "[ <http://a.example/p> <http://a.example/o> ] .",
    "_:b <http://a.example/p> <http://a.example/o> .")

  evalCase("blankNodePropertyList_as_object",
    "<http://a.example/s> <http://a.example/p> [ <http://a.example/p2> <http://a.example/o2> ] .",
    """<http://a.example/s> <http://a.example/p> _:b .
      |_:b <http://a.example/p2> <http://a.example/o2> .""".stripMargin)

  evalCase("nested_blankNodePropertyLists",
    "[ <http://a.example/p1> [ <http://a.example/p2> <http://a.example/o2> ] ; <http://a.example/p> <http://a.example/o> ] .",
    """_:a <http://a.example/p1> _:b .
      |_:b <http://a.example/p2> <http://a.example/o2> .
      |_:a <http://a.example/p> <http://a.example/o> .""".stripMargin)

  // --- eval: collections ----------------------------------------------------

  evalCase("empty_collection",
    "<http://a.example/s> <http://a.example/p> () .",
    "<http://a.example/s> <http://a.example/p> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .")

  evalCase("collection_object",
    "<http://a.example/s> <http://a.example/p> (<http://a.example/o1> <http://a.example/o2>) .",
    """<http://a.example/s> <http://a.example/p> _:c1 .
      |_:c1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> <http://a.example/o1> .
      |_:c1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:c2 .
      |_:c2 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> <http://a.example/o2> .
      |_:c2 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .""".stripMargin)

  evalCase("collection_subject",
    "(<http://a.example/o>) <http://a.example/p> <http://a.example/o2> .",
    """_:c1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> <http://a.example/o> .
      |_:c1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
      |_:c1 <http://a.example/p> <http://a.example/o2> .""".stripMargin)

  // --- eval: base resolution ------------------------------------------------

  evalCase("IRI-resolution against @base (turtle-subm-27 spirit)",
    "@base <http://example.org/ns/> .\n<s> <p> <../o> .",
    "<http://example.org/ns/s> <http://example.org/ns/p> <http://example.org/o> .")

  evalCase("base_chain (second @base relative to nothing, absolute)",
    "@base <http://example.org/a/> .\n<s1> <p> <o> .\n@base <http://other.example/b/> .\n<s2> <p2> <o2> .",
    """<http://example.org/a/s1> <http://example.org/a/p> <http://example.org/a/o> .
      |<http://other.example/b/s2> <http://other.example/b/p2> <http://other.example/b/o2> .""".stripMargin)

  evalCase("SPARQL_style_base",
    "BASE <http://example.org/ns/>\n<s> <p> <o> .",
    "<http://example.org/ns/s> <http://example.org/ns/p> <http://example.org/ns/o> .")

  // --- eval: lists of predicates/objects ------------------------------------

  evalCase("objectList_with_two_objects",
    "<http://a.example/s> <http://a.example/p> <http://a.example/o1>, <http://a.example/o2> .",
    """<http://a.example/s> <http://a.example/p> <http://a.example/o1> .
      |<http://a.example/s> <http://a.example/p> <http://a.example/o2> .""".stripMargin)

  evalCase("predicateObjectList_with_two_objectLists",
    "<http://a.example/s> <http://a.example/p1> <http://a.example/o1> ; <http://a.example/p2> <http://a.example/o2> .",
    """<http://a.example/s> <http://a.example/p1> <http://a.example/o1> .
      |<http://a.example/s> <http://a.example/p2> <http://a.example/o2> .""".stripMargin)

  evalCase("trailing_semicolon (turtle-syntax-struct-09 spirit)",
    "<http://a.example/s> <http://a.example/p> <http://a.example/o> ; .",
    "<http://a.example/s> <http://a.example/p> <http://a.example/o> .")

  evalCase("repeated_semis (turtle-syntax-struct-10 spirit)",
    "<http://a.example/s> <http://a.example/p1> <http://a.example/o1> ;; <http://a.example/p2> <http://a.example/o2> .",
    """<http://a.example/s> <http://a.example/p1> <http://a.example/o1> .
      |<http://a.example/s> <http://a.example/p2> <http://a.example/o2> .""".stripMargin)

  // --- positive syntax ------------------------------------------------------

  positiveCase("turtle-syntax-file-01 (empty document)", "")
  positiveCase("turtle-syntax-file-02 (comment only)", "#Empty file.\n")
  positiveCase("turtle-syntax-str-esc-01", "<http://a.example/s> <http://a.example/p> \"a\\n\" .")
  positiveCase("turtle-syntax-bnode-01", "[] <http://a.example/p> <http://a.example/o> .")
  positiveCase("comment between statements",
    "<http://a.example/s> <http://a.example/p> <http://a.example/o> . # trailing\n# line\n")

  // --- negative syntax ------------------------------------------------------

  negativeCase("turtle-syntax-bad-prefix-01 (undefined prefix in subject)",
    ":s <http://a.example/p> <http://a.example/o> .")
  negativeCase("turtle-syntax-bad-prefix-02 (@prefix without IRI)",
    "@prefix p: .")
  negativeCase("turtle-syntax-bad-struct-01 (graph term — Turtle is not N-Quads)",
    "<http://a.example/s> <http://a.example/p> <http://a.example/o> <http://a.example/g> .")
  negativeCase("turtle-syntax-bad-struct-02 (missing final dot)",
    "<http://a.example/s> <http://a.example/p> <http://a.example/o>")
  negativeCase("turtle-syntax-bad-struct-03 (missing object)",
    "<http://a.example/s> <http://a.example/p> .")
  negativeCase("turtle-syntax-bad-kw-04 (boolean as predicate)",
    "<http://a.example/s> true <http://a.example/o> .")
  negativeCase("turtle-syntax-bad-lang-01 (langtag starts with a digit)",
    "<http://a.example/s> <http://a.example/p> \"x\"@1 .")
  negativeCase("turtle-syntax-bad-string-04 (unterminated literal)",
    "<http://a.example/s> <http://a.example/p> \"abc .")
  negativeCase("turtle-syntax-bad-esc-02 (bad string escape)",
    "<http://a.example/s> <http://a.example/p> \"a\\zb\" .")
  negativeCase("turtle-syntax-bad-uri-01 (space inside IRIREF)",
    "<http://a.example/ s> <http://a.example/p> <http://a.example/o> .")
  negativeCase("turtle-syntax-bad-num-05 (bare sign is not a number)",
    "<http://a.example/s> <http://a.example/p> + .")
  negativeCase("turtle-syntax-bad-n3-extras-07 (N3 @keywords is not Turtle)",
    "@keywords a .\nx <http://a.example/p> <http://a.example/o> .")

  // --- documented divergences (pinned so silent drift is caught) ------------

  test("divergence: no document-URL default base (relative IRIs pass through)") {
    // W3C eval tests resolve a bare <s> against the test-file URL; this
    // parser resolves only against an explicit @base/BASE — the Spark scan
    // layer owns file URLs and records them as lineage (Triple.srcUrl)
    val r = Turtle.parse("<s> <p> <o> .", srcUrl = "http://files.example/f.ttl")
    assert(r.triples.head.s == "s" && r.triples.head.srcUrl == "http://files.example/f.ttl")
  }

  test("divergence: lenient PN_LOCAL character classes (junk resolves, not fails)") {
    // rio rejects e.g. a local name starting with '-'; this parser resolves
    // it (downstream classification/truncation handles junk IRIs)
    val r = Turtle.parse("@prefix p: <http://a.example/> .\np:-x <http://a.example/p> <http://a.example/o> .")
    assert(r.triples.head.s == "http://a.example/-x")
  }
}
