package graft.extract

/** Closed entity / relation dictionaries driving mention detection, entity-link
  * scoring and OpenIE extraction. Everything is deterministic and versioned —
  * the extraction spec these encode is what the P/R >= 0.95 gate measures
  * against (BASELINE.json north_rule).
  */
object Dict {

  final case class Candidate(iri: String, prior: Double, context: Set[String])

  val dbr = "http://dbpedia.org/resource/"
  val dbo = "http://dbpedia.org/ontology/"
  val foaf = "http://xmlns.com/foaf/0.1/"
  val schemaNs = "https://schema.org/"
  val wd = "http://www.wikidata.org/entity/"
  val rdfs = "http://www.w3.org/2000/01/rdf-schema#"
  val xsd = "http://www.w3.org/2001/XMLSchema#"
  /** Unregistered namespace that inference must discover at scale. */
  val inferNs = "http://kgraft.example.net/res/"

  /** LONG-TAIL inference targets (multi-round trigger, reference
    * `src/prefixes.rs:209-247`): entity IRIs directly under the unregistered
    * DOMAIN root (no shared sub-segment), each individually rare. On a
    * corpus where the domain's big `res/` subtree expands in round 1, these
    * stay unresolved (each IRI is below `minNsSize`, so none is a suitable
    * child) and — their SUM being above `minNsSize` — force a round-2
    * domain-level re-candidacy: the genuine multi-round maintenance path.
    * Synth attaches their sentences only to ids >= 100000, so every small
    * fixture and golden is byte-identical.
    */
  val inferDomainRoot = "http://kgraft.example.net/"
  val longTail: Map[String, Vector[Candidate]] = (0 until 8).map { k =>
    s"Tachyon Spool $k" ->
      Vector(Candidate(inferDomainRoot + s"Tachyon_Spool_$k", 0.9, Set.empty))
  }.toMap

  /** surface form -> linkable candidates (most surfaces unambiguous). */
  val entities: Map[String, Vector[Candidate]] = Map(
    "Ada Lovelace" -> Vector(Candidate(dbr + "Ada_Lovelace", 0.9, Set.empty)),
    "Alan Turing" -> Vector(Candidate(dbr + "Alan_Turing", 0.9, Set.empty)),
    "Grace Hopper" -> Vector(Candidate(dbr + "Grace_Hopper", 0.9, Set.empty)),
    "Charles Babbage" -> Vector(Candidate(dbr + "Charles_Babbage", 0.9, Set.empty)),
    "London" -> Vector(Candidate(dbr + "London", 0.9, Set.empty)),
    "Paris" -> Vector(Candidate(dbr + "Paris", 0.9, Set.empty)),
    "Lisbon" -> Vector(Candidate(dbr + "Lisbon", 0.9, Set.empty)),
    "Berlin" -> Vector(Candidate(dbr + "Berlin", 0.9, Set.empty)),
    "Marie Curie" -> Vector(Candidate(wd + "Q7186", 0.9, Set.empty)),
    "Albert Einstein" -> Vector(Candidate(wd + "Q937", 0.9, Set.empty)),
    "Warsaw" -> Vector(Candidate(wd + "Q270", 0.9, Set.empty)),
    "Analytical Engine" -> Vector(Candidate("http://example.org/Analytical_Engine", 0.9, Set.empty)),
    "Difference Engine" -> Vector(Candidate("http://example.org/Difference_Engine", 0.9, Set.empty)),
    // ambiguous surface: context words decide, prior breaks the tie
    "Mercury" -> Vector(
      Candidate(dbr + "Mercury_(planet)", 0.6, Set("planet", "orbit", "sun")),
      Candidate(dbr + "Mercury_(element)", 0.4, Set("metal", "chemical", "liquid"))
    ),
    // high-frequency entities in an unregistered namespace -> inference target
    "Quantum Widget" -> Vector(Candidate(inferNs + "Quantum_Widget", 0.9, Set.empty)),
    "Flux Capacitor" -> Vector(Candidate(inferNs + "Flux_Capacitor", 0.9, Set.empty)),
    "Neural Loom" -> Vector(Candidate(inferNs + "Neural_Loom", 0.9, Set.empty)),
    "Data Forge" -> Vector(Candidate(inferNs + "Data_Forge", 0.9, Set.empty))
  ) ++ longTail

  /** Longest surface first for greedy longest-match scanning. */
  val surfacesByLength: Vector[String] =
    entities.keys.toVector.sortBy(s => (-s.length, s))

  /** relation phrase -> predicate IRI. */
  val relations: Map[String, String] = Map(
    "was born in" -> (dbo + "birthPlace"),
    "works at" -> (schemaNs + "worksFor"),
    "knows" -> (foaf + "knows"),
    "created" -> (dbo + "created"),
    "lives in" -> (dbo + "residence"),
    "collaborated with" -> (schemaNs + "colleague")
  )

  /** Subject entities used as page topics (ordered, for deterministic synth). */
  val topics: Vector[String] = Vector(
    "Ada Lovelace", "Alan Turing", "Grace Hopper", "Charles Babbage",
    "Marie Curie", "Albert Einstein", "Quantum Widget", "Flux Capacitor",
    "Neural Loom", "Data Forge", "Mercury"
  )

  /** Object entities for relation sentences. */
  val objects: Vector[String] = Vector(
    "London", "Paris", "Lisbon", "Berlin", "Warsaw",
    "Analytical Engine", "Difference Engine", "Alan Turing", "Ada Lovelace",
    "Quantum Widget", "Data Forge"
  )

  val relationPhrases: Vector[String] = relations.keys.toVector.sorted
}
