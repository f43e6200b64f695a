package graft

import graft.model.Kind
import graft.rdf.NTriples
import org.scalatest.funsuite.AnyFunSuite

/** W3C N-Triples test-suite subset (the public conformance suite at
  * w3.org/2013/N-TriplesTests/), vendored as inline reconstructions named
  * after the official test ids — the line-format counterpart of
  * TurtleW3cSpec. Positive cases must parse to the expected terms; negative
  * cases must be rejected.
  *
  * Documented divergence (reference parity, not laxity): the N-Quads graph
  * term is ACCEPTED and projected away — chilon feeds .nq files through the
  * same per-line path (`src/parse.rs:40-47`), so `nt-syntax-bad-string-05`
  * style "fourth term" cases are deliberately accepted here; asserted below
  * so drift is caught.
  */
class NTriplesW3cSpec extends AnyFunSuite {

  private def ok(name: String, line: String)(check: graft.model.Triple => Unit): Unit =
    test(s"w3c nt ~ $name") { check(NTriples.parseLine(line).get) }

  private def bad(name: String, line: String): Unit =
    test(s"w3c nt negative ~ $name") {
      intercept[Exception] { NTriples.parseLine(line) }
    }

  ok("nt-syntax-uri-01", "<http://example/s> <http://example/p> <http://example/o> .") { t =>
    assert(t.s == "http://example/s" && t.p == "http://example/p" && t.o == "http://example/o")
    assert(t.sKind == Kind.IRI && t.oKind == Kind.IRI)
  }

  ok("nt-syntax-uri-02 (numeric escape \\u)",
    "<http://example/\\u0053> <http://example/p> <http://example/o> .") { t =>
    assert(t.s == "http://example/S")
  }

  ok("nt-syntax-uri-03 (numeric escape \\U)",
    "<http://example/\\U00000053> <http://example/p> <http://example/o> .") { t =>
    assert(t.s == "http://example/S")
  }

  ok("nt-syntax-string-01 (simple literal)",
    "<http://example/s> <http://example/p> \"string\" .") { t =>
    assert(t.oKind == Kind.LIT_PLAIN && t.o == "string")
  }

  ok("nt-syntax-string-02 (langString)",
    "<http://example/s> <http://example/p> \"string\"@en .") { t =>
    assert(t.oKind == Kind.LIT_LANG && t.oLang.contains("en"))
  }

  ok("nt-syntax-string-03 (langString with region)",
    "<http://example/s> <http://example/p> \"string\"@en-uk .") { t =>
    assert(t.oLang.contains("en-uk"))
  }

  ok("nt-syntax-str-esc-01 (tab/newline escapes)",
    "<http://example/s> <http://example/p> \"a\\n\\t\" .") { t =>
    assert(t.o == "a\n\t")
  }

  ok("nt-syntax-str-esc-02 (\\u escape)",
    "<http://example/s> <http://example/p> \"a\\u0020b\" .") { t =>
    assert(t.o == "a b")
  }

  ok("nt-syntax-str-esc-03 (\\U escape)",
    "<http://example/s> <http://example/p> \"a\\U00000020b\" .") { t =>
    assert(t.o == "a b")
  }

  ok("nt-syntax-bnode-01 (subject bnode)",
    "_:a <http://example/p> <http://example/o> .") { t =>
    assert(t.sKind == Kind.BLANK && t.s == "a")
  }

  ok("nt-syntax-bnode-02 (object bnode)",
    "<http://example/s> <http://example/p> _:bnode1 .") { t =>
    assert(t.oKind == Kind.BLANK && t.o == "bnode1")
  }

  ok("nt-syntax-bnode-03 (digit-leading label)",
    "_:1a <http://example/p> <http://example/o> .") { t =>
    assert(t.sKind == Kind.BLANK && t.s == "1a")
  }

  ok("nt-syntax-datatypes-01 (xsd:byte)",
    "<http://example/s> <http://example/p> \"123\"^^<http://www.w3.org/2001/XMLSchema#byte> .") { t =>
    assert(t.oKind == Kind.LIT_TYPED && t.oDt.contains("http://www.w3.org/2001/XMLSchema#byte"))
  }

  ok("nt-syntax-datatypes-02 (xsd:string typed)",
    "<http://example/s> <http://example/p> \"string\"^^<http://www.w3.org/2001/XMLSchema#string> .") { t =>
    assert(t.o == "string" && t.oDt.contains("http://www.w3.org/2001/XMLSchema#string"))
  }

  ok("literal_all_controls (escaped quotes and backslash)",
    "<http://example/s> <http://example/p> \"a \\\"q\\\" \\\\ b\" .") { t =>
    assert(t.o == "a \"q\" \\ b")
  }

  ok("comment_following_triple",
    "<http://example/s> <http://example/p> <http://example/o> . # comment") { t =>
    assert(t.o == "http://example/o")
  }

  test("w3c nt ~ nt-syntax-file-01/02/03 (empty and comment lines)") {
    assert(NTriples.parseLine("").isEmpty)
    assert(NTriples.parseLine("#Empty file.").isEmpty)
    assert(NTriples.parseLine("   ").isEmpty)
  }

  bad("nt-syntax-bad-uri-01 (space in IRI)",
    "<http://example/ space> <http://example/p> <http://example/o> .")
  bad("nt-syntax-bad-uri-06 (bad escape in IRI)",
    "<http://example/\\z> <http://example/p> <http://example/o> .")
  bad("nt-syntax-bad-prefix-01 (Turtle @prefix is not N-Triples)",
    "@prefix : <http://example/> .")
  bad("nt-syntax-bad-base-01 (Turtle @base is not N-Triples)",
    "@base <http://example/> .")
  bad("nt-syntax-bad-struct-01 (object list)",
    "<http://example/s> <http://example/p> <http://example/o>, <http://example/o2> .")
  bad("nt-syntax-bad-struct-02 (predicate list)",
    "<http://example/s> <http://example/p> <http://example/o>; <http://example/p2> <http://example/o2> .")
  bad("nt-syntax-bad-lang-01 (langtag starts with digit)",
    "<http://example/s> <http://example/p> \"string\"@1 .")
  bad("nt-syntax-bad-esc-01 (bad string escape)",
    "<http://example/s> <http://example/p> \"a\\zb\" .")
  bad("nt-syntax-bad-string-02 (bare literal subject)",
    "\"abc\" <http://example/p> <http://example/o> .")
  bad("nt-syntax-bad-string-04 (missing closing quote)",
    "<http://example/s> <http://example/p> \"abc .")
  bad("nt-syntax-bad-num-01 (Turtle number shorthand is not N-Triples)",
    "<http://example/s> <http://example/p> 1 .")
  bad("minus_sign_outside_literal",
    "<http://example/s> <http://example/p> -1 .")

  test("divergence: N-Quads graph term accepted and projected (parse.rs:40-47)") {
    val t = NTriples.parseLine(
      "<http://example/s> <http://example/p> <http://example/o> <http://example/g> .").get
    assert(t.o == "http://example/o") // graph term dropped, like the reference
  }
}
