package graft.extract

import java.text.BreakIterator
import java.util.Locale

/** IRI canonicalization.
  *
  * The reference truncates IRIs longer than 200 characters to their first 200
  * *grapheme clusters* (`normalize_iri`, chilon_rs `src/prefixes.rs:431-444`,
  * limit at `:433`, using unicode-segmentation). We pin the JDK's
  * `BreakIterator.getCharacterInstance(Locale.ROOT)` — deterministic across
  * executors, locale-independent.
  *
  * Canonicalization additionally (KG-construction stage, north rule):
  * trims surrounding whitespace and angle brackets, and percent-encodes raw
  * spaces — the minimum needed so minted IRIs are parseable and stable.
  */
object Canonical {

  val MaxGraphemes = 200

  def graphemeTruncate(s: String, limit: Int = MaxGraphemes): String = {
    if (s.length <= limit) return s // char count <= limit implies graphemes <= limit
    val it = BreakIterator.getCharacterInstance(Locale.ROOT)
    it.setText(s)
    var count = 0
    var pos = it.first()
    var next = it.next()
    while (next != BreakIterator.DONE && count < limit) {
      pos = next
      count += 1
      next = it.next()
    }
    if (count < limit) s else s.substring(0, pos)
  }

  def canonicalizeIri(raw: String): String = {
    var s = raw.trim
    if (s.startsWith("<") && s.endsWith(">") && s.length >= 2) s = s.substring(1, s.length - 1)
    s = s.replace(" ", "%20")
    graphemeTruncate(s)
  }

  private val WsRun = java.util.regex.Pattern.compile("\\s+")

  /** Mint a deterministic entity IRI from a surface form (KG-construction stage). */
  def mintIri(ns: String, surface: String): String =
    canonicalizeIri(ns + WsRun.matcher(surface.trim).replaceAll("_"))
}
