package graft.rdf

import graft.model.{Kind, PrefixDecl, Triple}
import scala.collection.mutable

/** Minimal Turtle parser for the common subset (reference format dispatch,
  * chilon_rs `src/parse.rs:63-86`; `@prefix` capture `src/parse.rs:53-61`).
  *
  * Turtle is stateful (`@prefix` scopes the whole document), so it parses
  * per-file — the Spark source wraps this in a one-file-per-task flatMap
  * (`wholeTextFiles`-style), unlike line-splittable N-Triples.
  *
  * Supported: `@prefix` / `@base` (and SPARQL-style PREFIX/BASE), IRIs,
  * prefixed names, `a`, blank-node labels, anonymous blank nodes and property
  * lists `[ ... ]` (fresh `genidN` labels), collections `( ... )` (expanded to
  * the standard rdf:first/rdf:rest/rdf:nil chain), literals with language tag
  * or datatype (both quote styles, long strings), numeric/boolean shorthand,
  * `;` and `,` predicate/object lists, comments. Not supported (rejected):
  * RDF-star — the reference rejects RDF-star too (`src/prefixes.rs:394-396`).
  */
object Turtle {

  final case class Result(triples: Vector[Triple], prefixes: Vector[PrefixDecl])

  /** Document state threaded across incremental parses of ONE file
    * ([[TurtleStream]] feeds statement batches through the same parser with
    * the `@prefix`/`@base`/fresh-blank state carried over, so a chunked parse
    * equals the whole-document parse).
    */
  final class State extends Serializable {
    var base: String = ""
    val prefixes: mutable.Map[String, String] = mutable.Map.empty
    var genId: Int = 0
  }

  def parse(doc: String, srcUrl: String = ""): Result =
    parseWith(doc, srcUrl, new State)

  def parseWith(doc: String, srcUrl: String, state: State): Result = {
    val p = new Parser(doc, srcUrl, state)
    p.document()
    Result(p.out.result(), p.decls.result())
  }

  private val XsdInteger = "http://www.w3.org/2001/XMLSchema#integer"
  private val XsdDecimal = "http://www.w3.org/2001/XMLSchema#decimal"
  private val XsdDouble = "http://www.w3.org/2001/XMLSchema#double"
  private val XsdBoolean = "http://www.w3.org/2001/XMLSchema#boolean"
  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  private val RdfFirst = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
  private val RdfRest = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
  private val RdfNil = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"

  private final class Parser(s: String, srcUrl: String, st: State) {
    var i = 0
    def base: String = st.base
    def base_=(b: String): Unit = st.base = b
    def prefixes: mutable.Map[String, String] = st.prefixes
    val out = Vector.newBuilder[Triple]
    val decls = Vector.newBuilder[PrefixDecl]

    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"Turtle parse error at pos $i: $msg")

    def ws(): Unit = {
      var go = true
      while (go) {
        go = false
        while (i < s.length && s.charAt(i).isWhitespace) { i += 1; go = true }
        if (i < s.length && s.charAt(i) == '#') {
          while (i < s.length && s.charAt(i) != '\n') i += 1
          go = true
        }
      }
    }

    def document(): Unit = {
      ws()
      while (i < s.length) {
        if (peekKeyword("@prefix") || peekKeyword("PREFIX")) prefixDecl()
        else if (peekKeyword("@base") || peekKeyword("BASE")) baseDecl()
        else statement()
        ws()
      }
    }

    /** Keyword match requires a boundary after it: whitespace, the following
      * IRI's '<', a '#' comment, or — for the prefix keywords only — the ':'
      * of the empty-alias form (`@prefix: <ns> .`), recognized by the IRI
      * that must follow it. Without the boundary a statement whose subject
      * alias merely STARTS with a keyword (`base:thing a ex:T .`,
      * `prefixes:x ...`) would be misparsed as a declaration and fail the
      * whole file; `base:`/`BASE:` is never a declaration (BASE takes a bare
      * IRI, not an alias).
      */
    private def peekKeyword(k: String): Boolean =
      s.regionMatches(true, i, k, 0, k.length) && {
        val j = i + k.length
        if (j >= s.length) true
        else {
          val c = s.charAt(j)
          c.isWhitespace || c == '<' || c == '#' ||
            (c == ':' && (k == "@prefix" || k == "PREFIX") && {
              var m = j + 1
              while (m < s.length && s.charAt(m).isWhitespace) m += 1
              m < s.length && s.charAt(m) == '<'
            })
        }
      }

    private def prefixDecl(): Unit = {
      val atStyle = s.charAt(i) == '@'
      i += (if (atStyle) "@prefix".length else "PREFIX".length)
      ws()
      val start = i
      while (i < s.length && s.charAt(i) != ':') i += 1
      val alias = s.substring(start, i).trim
      i += 1 // ':'
      ws()
      val ns = iriRef()
      prefixes(alias) = ns
      decls += PrefixDecl(alias, ns)
      ws()
      if (atStyle) { if (i < s.length && s.charAt(i) == '.') i += 1 }
    }

    private def baseDecl(): Unit = {
      val atStyle = s.charAt(i) == '@'
      i += (if (atStyle) "@base".length else "BASE".length)
      ws()
      base = iriRef()
      ws()
      if (atStyle) { if (i < s.length && s.charAt(i) == '.') i += 1 }
    }

    private def statement(): Unit = {
      ws()
      val wasBracket = i < s.length && s.charAt(i) == '['
      val (subj, subjKind) = subject()
      ws()
      // `[ p o ] .` is a complete statement: the property list already emitted
      if (!(wasBracket && i < s.length && s.charAt(i) == '.'))
        predicateObjectList(subj, subjKind)
      ws()
      if (i < s.length && s.charAt(i) == '.') i += 1 else fail("expected '.'")
    }

    private def predicateObjectList(subj: String, subjKind: Byte): Unit = {
      var more = true
      while (more) {
        ws()
        val pred = predicate()
        var moreObjs = true
        while (moreObjs) {
          ws()
          val (o, k, lang, dt) = objectTerm()
          out += Triple(subj, subjKind, pred, o, k, lang, dt, srcUrl)
          ws()
          if (i < s.length && s.charAt(i) == ',') { i += 1 } else moreObjs = false
        }
        if (i < s.length && s.charAt(i) == ';') {
          // the verb after ';' is optional (grammar [7]): consume any run of
          // semicolons, then stop only at '.' (or ']' in a bnode list)
          while (i < s.length && s.charAt(i) == ';') { i += 1; ws() }
          if (i < s.length && (s.charAt(i) == '.' || s.charAt(i) == ']'))
            more = false
        } else more = false
      }
    }

    /** Generated labels live in a namespace no parsed label can reach: '!'
      * is outside BLANK_NODE_LABEL, so a document-supplied `_:genid1` (a
      * common skolem label) can never merge with an anonymous `[...]` or
      * collection node (rio/Jena make the same separation).
      */
    private def freshBlank(): String = { st.genId += 1; s"!genid${st.genId}" }

    /** `[ ... ]`: a fresh blank node; inner predicate/object pairs (if any)
      * are emitted with it as subject. Positioned at '['.
      */
    private def blankNodePropertyList(): String = {
      i += 1 // '['
      ws()
      val label = freshBlank()
      if (i < s.length && s.charAt(i) == ']') { i += 1; return label }
      predicateObjectList(label, Kind.BLANK)
      ws()
      if (i < s.length && s.charAt(i) == ']') i += 1 else fail("expected ']'")
      label
    }

    /** `( e1 e2 ... )`: expanded to the standard rdf:first/rdf:rest chain of
      * fresh blank nodes; `()` is rdf:nil. Positioned at '('. Returns the
      * head node.
      */
    private def collection(): (String, Byte) = {
      i += 1 // '('
      ws()
      if (i < s.length && s.charAt(i) == ')') { i += 1; return (RdfNil, Kind.IRI) }
      val items = Vector.newBuilder[(String, Byte, Option[String], Option[String])]
      while (i < s.length && s.charAt(i) != ')') {
        items += objectTerm()
        ws()
      }
      if (i >= s.length) fail("unterminated collection")
      i += 1 // ')'
      val its = items.result()
      val nodes = its.map(_ => freshBlank())
      its.indices.foreach { idx =>
        val (o, k, lang, dt) = its(idx)
        out += Triple(nodes(idx), Kind.BLANK, RdfFirst, o, k, lang, dt, srcUrl)
        val (ro, rk) =
          if (idx + 1 < its.length) (nodes(idx + 1), Kind.BLANK) else (RdfNil, Kind.IRI)
        out += Triple(nodes(idx), Kind.BLANK, RdfRest, ro, rk, None, None, srcUrl)
      }
      (nodes.head, Kind.BLANK)
    }

    private def subject(): (String, Byte) = {
      ws()
      if (i >= s.length) fail("unexpected EOF")
      s.charAt(i) match {
        case '<' => (iriRef(), Kind.IRI)
        case '_' => (blankLabel(), Kind.BLANK)
        case '[' => (blankNodePropertyList(), Kind.BLANK)
        case '(' => collection()
        case _   => (prefixedName(), Kind.IRI)
      }
    }

    private def predicate(): String = {
      if (s.charAt(i) == '<') iriRef()
      else if (s.charAt(i) == 'a' && i + 1 < s.length &&
               (s.charAt(i + 1).isWhitespace)) { i += 1; RdfType }
      else prefixedName()
    }

    private def objectTerm(): (String, Byte, Option[String], Option[String]) = {
      s.charAt(i) match {
        case '<' => (iriRef(), Kind.IRI, None, None)
        case '_' => (blankLabel(), Kind.BLANK, None, None)
        case '[' => (blankNodePropertyList(), Kind.BLANK, None, None)
        case '(' => val (n, k) = collection(); (n, k, None, None)
        case '"' | '\'' => literal()
        case c if c.isDigit || c == '+' || c == '-' || c == '.' => numericLiteral()
        case 't' if s.regionMatches(i, "true", 0, 4) && boolBoundary(i + 4)  =>
          i += 4; ("true", Kind.LIT_TYPED, None, Some(XsdBoolean))
        case 'f' if s.regionMatches(i, "false", 0, 5) && boolBoundary(i + 5) =>
          i += 5; ("false", Kind.LIT_TYPED, None, Some(XsdBoolean))
        case _ => (prefixedName(), Kind.IRI, None, None)
      }
    }

    /** INTEGER / DECIMAL / DOUBLE per the W3C grammar ([19]-[21]): a '.' is
      * part of the number only when digits follow it (so `1.` is the integer
      * 1 and the statement terminator, as the spec requires), and an
      * exponent needs at least one digit (else it is not consumed).
      */
    /** `true`/`false` are keywords only at a token boundary: `truely:x` is a
      * prefixed name, not the boolean followed by garbage.
      */
    private def boolBoundary(j: Int): Boolean =
      j >= s.length || {
        val c = s.charAt(j)
        !(c.isLetterOrDigit || c == '_' || c == '-' || c == ':')
      }

    /** True when position `j` starts a complete EXPONENT ([154s]:
      * [eE] [+-]? [0-9]+) — lookahead only, consumes nothing.
      */
    private def exponentAt(j: Int): Boolean =
      j < s.length && (s.charAt(j) == 'e' || s.charAt(j) == 'E') && {
        var k = j + 1
        if (k < s.length && (s.charAt(k) == '+' || s.charAt(k) == '-')) k += 1
        k < s.length && s.charAt(k).isDigit
      }

    private def numericLiteral(): (String, Byte, Option[String], Option[String]) = {
      val start = i
      if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
      val digitsStart = i
      while (i < s.length && s.charAt(i).isDigit) i += 1
      val hadIntDigits = i > digitsStart
      var isDecimal = false
      if (i + 1 < s.length && s.charAt(i) == '.' && s.charAt(i + 1).isDigit) {
        isDecimal = true
        i += 1
        while (i < s.length && s.charAt(i).isDigit) i += 1
      } else if (hadIntDigits && i < s.length && s.charAt(i) == '.' && exponentAt(i + 1)) {
        // DOUBLE with an empty fraction ([21]: [0-9]+ '.' [0-9]* EXPONENT),
        // e.g. `1.e3` — without this the '.' would be taken as the statement
        // terminator and `e3` would corrupt the next statement (ADVICE r4).
        // `.e3` (no integer digits) stays invalid: [21] requires [0-9]+
        // on one side of the '.'.
        i += 1
      }
      var isDouble = false
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        val save = i
        i += 1
        if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        if (i < s.length && s.charAt(i).isDigit) {
          isDouble = true
          while (i < s.length && s.charAt(i).isDigit) i += 1
        } else i = save
      }
      val lex = s.substring(start, i)
      if (!lex.exists(_.isDigit)) fail(s"bad numeric literal near '$lex'")
      val dt = if (isDouble) XsdDouble else if (isDecimal) XsdDecimal else XsdInteger
      (lex, Kind.LIT_TYPED, None, Some(dt))
    }

    private def literal(): (String, Byte, Option[String], Option[String]) = {
      val q = s.charAt(i)
      val long = s.regionMatches(i, s"$q$q$q", 0, 3)
      val lex = if (long) longString(q) else shortString(q)
      if (s.startsWith("^^", i)) {
        i += 2
        val dt = if (s.charAt(i) == '<') iriRef() else prefixedName()
        (lex, Kind.LIT_TYPED, None, Some(dt))
      } else if (i < s.length && s.charAt(i) == '@') {
        i += 1
        val start = i
        // LANGTAG = [a-zA-Z]+ ('-' [a-zA-Z0-9]+)* — the leading char must be
        // a letter (W3C Turtle [144s]; `"x"@1` is turtle-syntax-bad-lang-01)
        if (i >= s.length || !s.charAt(i).isLetter) fail("language tag must start with a letter")
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-')) i += 1
        (lex, Kind.LIT_LANG, Some(s.substring(start, i)), None)
      } else (lex, Kind.LIT_PLAIN, None, None)
    }

    private def shortString(q: Char): String = {
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != q) {
        if (s.charAt(i) == '\\') sb.append(escape()) else { sb.append(s.charAt(i)); i += 1 }
      }
      i += 1
      sb.toString
    }

    private def longString(q: Char): String = {
      i += 3
      val sb = new StringBuilder
      while (i < s.length && !s.regionMatches(i, s"$q$q$q", 0, 3)) {
        if (s.charAt(i) == '\\') sb.append(escape()) else { sb.append(s.charAt(i)); i += 1 }
      }
      i += 3
      sb.toString
    }

    private def escape(): String = {
      i += 1
      val c = s.charAt(i)
      c match {
        case 't'  => i += 1; "\t"
        case 'b'  => i += 1; "\b"
        case 'n'  => i += 1; "\n"
        case 'r'  => i += 1; "\r"
        case 'f'  => i += 1; "\f"
        case '"'  => i += 1; "\""
        case '\'' => i += 1; "'"
        case '\\' => i += 1; "\\"
        case 'u'  => i += 1; val h = s.substring(i, i + 4); i += 4; new String(Character.toChars(Integer.parseInt(h, 16)))
        case 'U'  => i += 1; val h = s.substring(i, i + 8); i += 8; new String(Character.toChars(Integer.parseInt(h, 16)))
        case _    => fail(s"bad escape \\$c")
      }
    }

    private def iriRef(): String = {
      if (s.charAt(i) != '<') fail("expected '<'")
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '>') {
        val c = s.charAt(i)
        // IRIREF excludes control/space and <"{}|^` (W3C Turtle [18]; only
        // \u/\U escapes can reach them) — rio rejects these too
        if (c <= ' ' || "<\"{}|^`".indexOf(c) >= 0) fail(s"character '$c' in IRIREF")
        if (c == '\\') sb.append(escape()) else { sb.append(c); i += 1 }
      }
      if (i >= s.length) fail("unterminated IRIREF")
      i += 1
      resolveAgainstBase(sb.toString)
    }

    private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*:".r

    /** RFC 3986 reference resolution against `@base` (dot segments, absolute
      * paths, network-path refs — java.net.URI implements the algorithm);
      * string concat only as the fallback for refs URI cannot parse.
      */
    private def resolveAgainstBase(iri: String): String =
      if (base.isEmpty || SchemeRe.findFirstIn(iri).isDefined) iri
      else
        try new java.net.URI(base).resolve(new java.net.URI(iri)).toString
        catch { case _: Exception => base + iri }

    private def blankLabel(): String = {
      i += 2
      val start = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' || s.charAt(i) == '-')) i += 1
      s.substring(start, i)
    }

    /** PN_LOCAL terminators: whitespace plus every punctuation that starts the
      * next token in the grammar (they can only appear in a local name via a
      * `\`-escape or %-encoding).
      */
    private def isLocalStop(c: Char): Boolean =
      c.isWhitespace || ";,)]([\"'#<>{}^".indexOf(c) >= 0

    /** Characters reachable through a PN_LOCAL_ESC backslash escape. */
    private val LocalEsc = "_~.-!$&'()*+,;=/?#@%"

    private def prefixedName(): String = {
      val start = i
      while (i < s.length && s.charAt(i) != ':' && !s.charAt(i).isWhitespace) i += 1
      if (i >= s.length || s.charAt(i) != ':') fail(s"expected prefixed name near '${s.substring(start, math.min(start + 20, s.length))}'")
      val alias = s.substring(start, i)
      i += 1
      // PN_LOCAL: interior dots allowed (never trailing — a dot run is only
      // consumed when a name character follows it), backslash escapes of the
      // PN_LOCAL_ESC set, %XX percent-encoding kept verbatim (rio keeps the
      // encoded form in the expanded IRI).
      val sb = new StringBuilder
      var done = false
      while (!done && i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length && LocalEsc.indexOf(s.charAt(i + 1)) >= 0) {
          sb.append(s.charAt(i + 1)); i += 2
        } else if (c == '.') {
          var j = i
          while (j < s.length && s.charAt(j) == '.') j += 1
          if (j < s.length && !isLocalStop(s.charAt(j)) && s.charAt(j) != '.') {
            sb.append(s.substring(i, j)); i = j
          } else done = true // trailing dots terminate the statement, not the name
        } else if (isLocalStop(c)) done = true
        else { sb.append(c); i += 1 }
      }
      val local = sb.toString
      val ns = prefixes.getOrElse(alias, fail(s"undefined prefix '$alias:'"))
      ns + local
    }
  }
}
