package graft.extract

import graft.model.Mention

/** Mention detection + entity-link scoring (north-rule KG-construction stages).
  *
  * Detection: greedy longest-match scan of the dictionary's surface forms at
  * word boundaries, case-sensitive, left to right — deterministic and
  * batched per partition (the dictionary rides in a broadcast upstream).
  *
  * Linking: every candidate entity of a surface is scored
  * `prior + 0.5 * |context words present in the sentence|`; argmax wins, ties
  * break on lexicographic IRI. Pure function of (sentence, surface).
  */
object Mentions {

  final case class Found(surface: String, start: Int, end: Int)

  private def isWordChar(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'

  /** Surfaces indexed by first char, longest first — the scan only probes
    * candidates that can possibly match at a position (hot path of the
    * extraction stage).
    */
  private def index(surfaces: Seq[String]): Map[Char, Array[String]] =
    surfaces.filter(_.nonEmpty).groupBy(_.head)
      .map { case (c, ss) => c -> ss.sortBy(s => (-s.length, s)).toArray }

  private val defaultIndex: Map[Char, Array[String]] = index(Dict.surfacesByLength)

  /** All dictionary mentions in `text`, greedy longest-match, non-overlapping. */
  def detect(text: String, surfaces: Seq[String] = Dict.surfacesByLength): Vector[Found] = {
    val idx = if (surfaces eq Dict.surfacesByLength) defaultIndex else index(surfaces)
    val out = Vector.newBuilder[Found]
    var i = 0
    val n = text.length
    while (i < n) {
      if (isWordChar(text.charAt(i)) && (i == 0 || !isWordChar(text.charAt(i - 1)))) {
        var matched: String = null
        val cands = idx.getOrElse(text.charAt(i), null)
        if (cands != null) {
          var j = 0
          while (matched == null && j < cands.length) {
            val s = cands(j)
            if (text.startsWith(s, i) &&
                (i + s.length == n || !isWordChar(text.charAt(i + s.length)))) {
              matched = s
            }
            j += 1
          }
        }
        if (matched != null) {
          out += Found(matched, i, i + matched.length)
          i += matched.length
        } else {
          while (i < n && isWordChar(text.charAt(i))) i += 1
        }
      } else i += 1
    }
    out.result()
  }

  /** Entity-link score for one candidate against the sentence's word set. */
  def score(cand: Dict.Candidate, sentenceWords: Set[String]): Double =
    cand.prior + 0.5 * cand.context.count(sentenceWords.contains)

  private val NonAlnum = java.util.regex.Pattern.compile("[^a-z0-9]+")

  def sentenceWords(sentence: String): Set[String] =
    NonAlnum.split(sentence.toLowerCase).iterator.filter(_.nonEmpty).toSet

  /** Link a detected surface to its best entity IRI within a context:
    * highest score wins, ties break on lexicographically smallest IRI.
    * Linear argmax (r6): the former sortBy over the candidate list allocated
    * tuple arrays per call on the extraction hot path — same total order
    * (score desc via Double total ordering, IRI asc), one pass, zero
    * allocation beyond the result.
    */
  def link(surface: String, contextWords: Set[String]): Option[(String, Double)] =
    Dict.entities.get(surface).map { cands =>
      var bestIri: String = null
      var bestScore = 0.0
      cands.foreach { c =>
        val s = score(c, contextWords)
        val cmp = java.lang.Double.compare(s, bestScore)
        if (bestIri == null || cmp > 0 || (cmp == 0 && c.iri < bestIri)) {
          bestIri = c.iri
          bestScore = s
        }
      }
      (bestIri, bestScore)
    }

  /** Mentions of a page text with linked entities and scores. */
  def mentionsOf(srcUrl: String, text: String): Vector[Mention] = {
    val pageWords = sentenceWords(text)
    detect(text).flatMap { f =>
      link(f.surface, pageWords).map { case (iri, s) =>
        Mention(srcUrl, f.surface, f.start, f.end, iri, s)
      }
    }
  }
}
