package graft.extract

import graft.model.{Kind, Triple}

/** Rule-based OpenIE-style (subject, predicate, object) triple extraction
  * (north-rule KG-construction stage). Deterministic, pure per page — the
  * pipeline runs it as a `flatMap` on `Dataset[Page]`, so Catalyst sees a
  * generator feeding a typed triple stream (cf. reference triple iterator,
  * chilon_rs `src/parse.rs:24-51`, re-expressed Spark-first).
  *
  * Pinned extraction rules per sentence:
  *   R1 relation:  mention REL-PHRASE mention           -> (s, rel, o) IRI triple
  *   R2 birthyear: mention "was born in" DDDD           -> (s, dbo:birthYear, "DDDD"^^xsd:integer)
  *   R3 abstract:  mention "is described on page" N     -> (s, dbo:abstract, sentence) plain literal
  *   R4 blank:     "Someone" REL-PHRASE mention         -> (_:b<hash>, rel, o) blank subject
  * Per page:
  *   R5 label:     first mention m                      -> (m, rdfs:label, surface@en)
  *   R6 provenance: first mention m                     -> (m, schema:mainEntityOfPage, url)
  *
  * Subject/object IRIs pass through [[Canonical.canonicalizeIri]] (200-grapheme
  * cap, cf. reference `src/prefixes.rs:431-444`).
  */
object OpenIE {

  private val YearRe = "^was born in (\\d{4})\\.?$".r
  // precompiled: String.split(String) recompiles its pattern per call, and
  // this runs once per line of every page in the corpus
  private val SentenceSplit = java.util.regex.Pattern.compile("(?<=\\.) ")

  def sentencesOf(text: String): Vector[String] =
    text.split('\n').toVector.flatMap(l => SentenceSplit.split(l).toVector)
      .map(_.trim).filter(_.nonEmpty)

  def extract(url: String, text: String): Vector[Triple] = {
    val out = Vector.newBuilder[Triple]
    val sents = sentencesOf(text)
    var firstMention: Option[(String, String)] = None // (iri, surface)
    var blankCounter = 0

    sents.foreach { sent =>
      val ms = Mentions.detect(sent)
      // the word set only feeds link scoring — skip building it for
      // mention-free sentences (r6; at crawl scale most sentences are)
      val words = if (ms.isEmpty) Set.empty[String] else Mentions.sentenceWords(sent)
      val linked = ms.flatMap(f => Mentions.link(f.surface, words).map(l => (f, l._1)))

      if (firstMention.isEmpty && linked.nonEmpty)
        firstMention = Some((linked.head._2, linked.head._1.surface))

      // R1: mention REL mention
      linked.sliding(2).foreach {
        case Vector((f1, iri1), (f2, iri2)) =>
          val between = sent.substring(f1.end, f2.start).trim
          Dict.relations.get(between).foreach { pred =>
            out += Triple(
              Canonical.canonicalizeIri(iri1), Kind.IRI, pred,
              Canonical.canonicalizeIri(iri2), Kind.IRI, None, None, url)
          }
        case _ =>
      }

      // R2 / R3: attribute rules on the trailing text after a single mention
      if (linked.size == 1) {
        val (f, iri) = linked.head
        val tail = sent.substring(f.end).trim
        tail match {
          case YearRe(year) =>
            out += Triple(
              Canonical.canonicalizeIri(iri), Kind.IRI, Dict.dbo + "birthYear",
              year, Kind.LIT_TYPED, None, Some(Dict.xsd + "integer"), url)
          case t if t.startsWith("is described on page") =>
            out += Triple(
              Canonical.canonicalizeIri(iri), Kind.IRI, Dict.dbo + "abstract",
              sent, Kind.LIT_PLAIN, None, None, url)
          case _ =>
        }
        // R4: blank-node subject
        if (sent.startsWith("Someone ")) {
          val beforeMention = sent.substring("Someone ".length, f.start).trim
          Dict.relations.get(beforeMention).foreach { pred =>
            blankCounter += 1
            out += Triple(
              s"b${Synth.mix64(url.hashCode.toLong) & 0xffffffL}_$blankCounter", Kind.BLANK,
              pred, Canonical.canonicalizeIri(iri), Kind.IRI, None, None, url)
          }
        }
      }
    }

    firstMention.foreach { case (iri, surface) =>
      val s = Canonical.canonicalizeIri(iri)
      out += Triple(s, Kind.IRI, Dict.rdfs + "label", surface, Kind.LIT_LANG, Some("en"), None, url)
      out += Triple(s, Kind.IRI, Dict.schemaNs + "mainEntityOfPage",
        Canonical.canonicalizeIri(url), Kind.IRI, None, None, url)
    }

    out.result()
  }
}
