package graft.extract

import org.apache.spark.sql.{DataFrame, functions => F}

/** JSON-LD structured-data extraction — the schema.org `<script
  * type="application/ld+json">` blocks that are the highest-precision triple
  * source on the real web (the reference corpus's pages carry their KG facts
  * in prose; production Common-Crawl pipelines harvest the markup first).
  *
  * Deterministic and dependency-free like [[HtmlText]]: a pinned
  * recursive-descent JSON parser (objects, arrays, strings with the standard
  * escapes incl. `\uXXXX`, numbers kept as their raw lexeme, booleans,
  * null) — no library whose version could drift, no locale. Malformed
  * blocks are skipped, never fatal: web markup is adversarial.
  *
  * Triple mapping (the @vocab-less schema.org subset):
  *   - an object with `"@id"` is an entity; objects without one contribute
  *     nothing (blank-node minting is a policy choice deferred to the
  *     caller);
  *   - `"@type": "T"` emits `(id, rdf:type, schema:T)` (absolute IRIs pass
  *     through);
  *   - any other non-`@` key `k` emits `(id, schema:k, value)` — strings as
  *     written, numbers/booleans as their lexeme, object values with an
  *     `@id` as that IRI (and the nested entity recurses), arrays
  *     element-wise;
  *   - `@context` and other `@`-keys are ignored.
  *
  * Scale shape: a pure per-row flatMap — zero shuffle; the scan prunes to
  * (id, html) and triples flow out co-partitioned with it.
  */
object JsonLd {

  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  // -- minimal JSON ----------------------------------------------------------

  sealed trait JVal
  final case class JStr(s: String) extends JVal
  final case class JNum(raw: String) extends JVal
  final case class JBool(b: Boolean) extends JVal
  case object JNull extends JVal
  final case class JArr(items: Vector[JVal]) extends JVal
  final case class JObj(fields: Vector[(String, JVal)]) extends JVal

  /** Parse one JSON document; None on any syntax error (tolerant caller). */
  def parseJson(text: String): Option[JVal] = {
    val p = new Parser(text)
    try {
      p.skipWs()
      val v = p.value()
      p.skipWs()
      if (p.atEnd) Some(v) else None
    } catch { case _: ParseErr => None }
  }

  private final class ParseErr extends RuntimeException

  private final class Parser(s: String) {
    private var i = 0
    def atEnd: Boolean = i >= s.length
    private def fail(): Nothing = throw new ParseErr
    private def peek: Char = if (atEnd) fail() else s.charAt(i)
    private def next(): Char = { val c = peek; i += 1; c }
    private def expect(c: Char): Unit = if (next() != c) fail()
    def skipWs(): Unit =
      while (!atEnd && (s.charAt(i) == ' ' || s.charAt(i) == '\t'
        || s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1

    def value(): JVal = peek match {
      case '{' => obj()
      case '[' => arr()
      case '"' => JStr(str())
      case 't' => lit("true", JBool(true))
      case 'f' => lit("false", JBool(false))
      case 'n' => lit("null", JNull)
      case c if c == '-' || (c >= '0' && c <= '9') => num()
      case _ => fail()
    }

    private def lit(word: String, v: JVal): JVal = {
      if (!s.startsWith(word, i)) fail()
      i += word.length; v
    }

    private def num(): JNum = {
      val start = i
      if (peek == '-') i += 1
      while (!atEnd && { val c = s.charAt(i); (c >= '0' && c <= '9') || c == '.' ||
        c == 'e' || c == 'E' || c == '+' || c == '-' }) i += 1
      if (i == start) fail()
      JNum(s.substring(start, i))
    }

    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (true) {
        val c = next()
        if (c == '"') return sb.toString
        else if (c == '\\') next() match {
          case '"' => sb.append('"')
          case '\\' => sb.append('\\')
          case '/' => sb.append('/')
          case 'b' => sb.append('\b')
          case 'f' => sb.append('\f')
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case 't' => sb.append('\t')
          case 'u' =>
            if (i + 4 > s.length) fail()
            val hex = s.substring(i, i + 4); i += 4
            sb.append(Integer.parseInt(hex, 16).toChar)
          case _ => fail()
        }
        else sb.append(c)
      }
      sb.toString // unreachable
    }

    private def obj(): JObj = {
      expect('{'); skipWs()
      val fields = Vector.newBuilder[(String, JVal)]
      if (peek == '}') { i += 1; return JObj(fields.result()) }
      while (true) {
        skipWs()
        val k = str()
        skipWs(); expect(':'); skipWs()
        fields += ((k, value()))
        skipWs()
        next() match {
          case ',' => ()
          case '}' => return JObj(fields.result())
          case _ => fail()
        }
      }
      JObj(fields.result()) // unreachable
    }

    private def arr(): JArr = {
      expect('['); skipWs()
      val items = Vector.newBuilder[JVal]
      if (peek == ']') { i += 1; return JArr(items.result()) }
      while (true) {
        skipWs()
        items += value()
        skipWs()
        next() match {
          case ',' => ()
          case ']' => return JArr(items.result())
          case _ => fail()
        }
      }
      JArr(items.result()) // unreachable
    }
  }

  // -- JSON-LD block discovery + triple mapping ------------------------------

  private val ScriptRe =
    """(?is)<script[^>]*type\s*=\s*["']application/ld\+json["'][^>]*>(.*?)</script>""".r

  /** The raw payloads of every ld+json script block, document order. */
  def scriptBlocks(html: String): Seq[String] =
    ScriptRe.findAllMatchIn(html).map(_.group(1)).toVector

  private def iriOrSchema(t: String): String =
    if (t.startsWith("http://") || t.startsWith("https://")) t
    else Dict.schemaNs + t

  private def entityTriples(o: JObj): Vector[(String, String, String)] =
    o.fields.collectFirst { case ("@id", JStr(id)) => id } match {
      case None => Vector.empty
      case Some(id) =>
        o.fields.flatMap {
          case ("@type", JStr(t)) => Vector((id, RdfType, iriOrSchema(t)))
          case (k, _) if k.startsWith("@") => Vector.empty
          case (k, v) => valueTriples(id, Dict.schemaNs + k, v)
        }
    }

  private def valueTriples(
      subj: String, pred: String, v: JVal): Vector[(String, String, String)] = v match {
    case JStr(s) => Vector((subj, pred, s))
    case JNum(raw) => Vector((subj, pred, raw))
    case JBool(b) => Vector((subj, pred, b.toString))
    case JNull => Vector.empty
    case JArr(items) => items.flatMap(valueTriples(subj, pred, _))
    case nested: JObj =>
      nested.fields.collectFirst { case ("@id", JStr(nid)) => nid } match {
        case Some(nid) => (subj, pred, nid) +: entityTriples(nested)
        case None => Vector.empty
      }
  }

  /** Every (s, p, o) from every well-formed ld+json block in the page. */
  def triples(html: String): Vector[(String, String, String)] =
    scriptBlocks(html).toVector.flatMap { block =>
      parseJson(block) match {
        case Some(o: JObj) => entityTriples(o)
        case Some(JArr(items)) =>
          items.flatMap { case o: JObj => entityTriples(o); case _ => Vector.empty }
        case _ => Vector.empty
      }
    }

  /** Distributed surface: (idCol, s, p, o) per extracted triple. */
  def jsonLdTriples(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(F.col(idCol).cast("long"), F.col(htmlCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, html) => triples(html).map(t => (id, t._1, t._2, t._3)) }
      .toDF(idCol, "s", "p", "o")
  }
}
