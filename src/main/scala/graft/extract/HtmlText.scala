package graft.extract

import java.nio.charset.StandardCharsets

/** Deterministic HTML -> text extraction.
  *
  * The per-row invariant of the whole pipeline (BASELINE.json `input_hint`):
  * `extractText(html) == text` byte-identical per url, across runs and
  * parallelism levels. The algorithm is pinned — pure string processing over
  * UTF-8, no locale, no default charset, no library whose version could drift:
  *
  *   1. decode UTF-8;
  *   2. drop `<script>`, `<style>`, `<head>` elements and `<!-- -->` comments;
  *   3. block-level closers/openers (`p, h1-h6, li, div, tr, br, title`) become
  *      newlines;
  *   4. strip every remaining tag;
  *   5. decode the five named entities plus numeric `&#NNN;`/`&#xHH;`;
  *   6. collapse horizontal whitespace, trim lines, collapse blank lines, trim.
  */
object HtmlText {

  private val BlockTags = Set(
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "div", "tr", "br",
    "title", "table", "ul", "ol", "blockquote", "pre", "section", "article"
  )

  def extractText(html: Array[Byte]): String =
    extractText(new String(html, StandardCharsets.UTF_8))

  def extractText(html: String): String = {
    val noComments = stripBetween(html, "<!--", "-->")
    val noScript = stripElement(stripElement(stripElement(noComments, "script"), "style"), "head")
    val sb = new StringBuilder(noScript.length)
    var i = 0
    val n = noScript.length
    while (i < n) {
      val c = noScript.charAt(i)
      if (c == '<') {
        val close = noScript.indexOf('>', i)
        if (close < 0) { i = n } // truncated tag: drop the tail
        else {
          val inner = noScript.substring(i + 1, close)
          val name = inner.stripPrefix("/").takeWhile(ch => ch.isLetterOrDigit).toLowerCase
          if (BlockTags.contains(name)) sb.append('\n')
          i = close + 1
        }
      } else { sb.append(c); i += 1 }
    }
    normalizeWhitespace(decodeEntities(sb.toString))
  }

  private def stripElement(s: String, tag: String): String = {
    val lower = s.toLowerCase
    val open = "<" + tag
    val close = "</" + tag + ">"
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val start = lower.indexOf(open, i)
      // must be a real tag boundary: "<script>" or "<script ..."
      val isTag = start >= 0 && {
        val after = start + open.length
        after >= lower.length || lower.charAt(after) == '>' || lower.charAt(after) == ' ' ||
        lower.charAt(after) == '\t' || lower.charAt(after) == '\n' || lower.charAt(after) == '/'
      }
      if (!isTag) { sb.append(s.substring(i)); i = s.length }
      else {
        sb.append(s.substring(i, start))
        val end = lower.indexOf(close, start)
        i = if (end < 0) s.length else end + close.length
      }
    }
    sb.toString
  }

  private def stripBetween(s: String, open: String, close: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val start = s.indexOf(open, i)
      if (start < 0) { sb.append(s.substring(i)); i = s.length }
      else {
        sb.append(s.substring(i, start))
        val end = s.indexOf(close, start + open.length)
        i = if (end < 0) s.length else end + close.length
      }
    }
    sb.toString
  }

  private[extract] def decodeEntities(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val decoded: Option[String] = ent match {
            case "amp"  => Some("&")
            case "lt"   => Some("<")
            case "gt"   => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case "nbsp" => Some(" ")
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try Some(new String(Character.toChars(Integer.parseInt(e.drop(2), 16))))
              catch { case _: Exception => None }
            case e if e.startsWith("#") =>
              try Some(new String(Character.toChars(Integer.parseInt(e.drop(1)))))
              catch { case _: Exception => None }
            case _ => None
          }
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None    => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** One line per non-empty block: horizontal whitespace collapsed, lines
    * trimmed, blank lines dropped entirely (pinned — the synthesizer's
    * ground-truth `text` is defined against exactly this).
    */
  private val HorizWs = java.util.regex.Pattern.compile("[ \\t\\x0B\\f\\r\\u00a0]+")

  private[extract] def normalizeWhitespace(s: String): String = {
    val lines = s.split('\n').iterator.map { line =>
      HorizWs.matcher(line).replaceAll(" ").trim
    }
    lines.filter(_.nonEmpty).mkString("\n")
  }
}
