package graft.rdf

import graft.model.{Kind, Triple}

/** Canonical N-Triples serializer — the inverse of [[NTriples.parseLine]]
  * (round-trip `parseLine(line(t)) == t` pinned in RdfSpec for every term
  * kind and the full ECHAR set). This is the KG-materialize EXPORT path:
  * after extraction/canonicalization the triple table leaves the engine as
  * interchange N-Triples that the reference (or any RDF stack) can ingest
  * (cf. chilon_rs consuming `.nt` inputs, `src/parse.rs:63-86`).
  *
  * Escaping follows the W3C N-Triples grammar: STRING_LITERAL_QUOTE bodies
  * use ECHAR for `\\ \" \n \r \t \b \f` and `\uXXXX` for the remaining
  * C0 controls; IRIREF bodies leave every excluded character (controls,
  * space, `<>"{}|^`, backtick, backslash) as UCHAR `\uXXXX`.
  *
  * Scale shape: serialization is a pure per-row function — the export is
  * scan → project → write with zero shuffle at any corpus size.
  */
object NtWriter {

  private def hex4(sb: StringBuilder, c: Char): Unit =
    sb.append(f"\\u${c.toInt}%04X")

  /** STRING_LITERAL_QUOTE body (W3C N-Triples [9]). */
  def escapeLiteral(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '"'  => sb.append("\\\"")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < ' ' => hex4(sb, c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private val IriExcluded = "<>\"{}|^`\\"

  /** IRIREF body (W3C N-Triples [8]): excluded characters as UCHAR. */
  def escapeIri(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c <= ' ' || IriExcluded.indexOf(c) >= 0) hex4(sb, c) else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** One RDF term in N-Triples surface form. */
  def term(value: String, kind: Byte, lang: Option[String], dt: Option[String]): String =
    kind match {
      case Kind.IRI       => "<" + escapeIri(value) + ">"
      case Kind.BLANK     => "_:" + value
      case Kind.LIT_PLAIN => "\"" + escapeLiteral(value) + "\""
      case Kind.LIT_LANG  => "\"" + escapeLiteral(value) + "\"@" + lang.getOrElse("")
      case _              => "\"" + escapeLiteral(value) + "\"^^<" + escapeIri(dt.getOrElse("")) + ">"
    }

  /** One complete N-Triples statement line (no trailing newline). */
  def line(t: Triple): String =
    term(t.s, t.sKind, None, None) + " <" + escapeIri(t.p) + "> " +
      term(t.o, t.oKind, t.oLang, t.oDt) + " ."

  /** One N-Quads line with the triple's lineage URL as the graph term — the
    * provenance-preserving dump (the parser reads quads and projects the
    * graph term away, so `parseLine(quadLine(t)) == t.copy(srcUrl = "")`
    * round-trips modulo lineage, pinned in RdfSpec).
    */
  def quadLine(t: Triple): String =
    term(t.s, t.sKind, None, None) + " <" + escapeIri(t.p) + "> " +
      term(t.o, t.oKind, t.oLang, t.oDt) + " <" + escapeIri(t.srcUrl) + "> ."
}
