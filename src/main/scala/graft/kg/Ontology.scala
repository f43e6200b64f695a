package graft.kg

import graft.extract.Dict

/** Fixed subsumption ontology + asserted-class map for the entailment /
  * constraint-QA queries over the synthesized page corpus.
  *
  * Web-scale reality this models: the ONTOLOGY is vocabulary-sized and ships
  * with the pipeline (DBpedia's class tree is ~800 classes; schema.org ~900),
  * while the instance-type relation is corpus-sized. Both the engine
  * ([[GraphOps.rdfsTypeClosure]]) and the DuckDB oracle
  * ([[graft.queries.KgSql]]) are generated from THESE constants, so the two
  * sides cannot drift.
  *
  * The hierarchy exercises the closure's hard cases: a diamond
  * (Scientist ⊑ {Person, Worker} ⊑ Agent — the DAG/dedup path) and a depth-4
  * chain (City ⊑ Settlement ⊑ PopulatedPlace ⊑ Place ⊑ Thing — needs 2
  * pointer-squaring rounds, so `rounds = 1` is provably insufficient and the
  * spec pins that).
  */
object Ontology {

  val owlThing = "http://www.w3.org/2002/07/owl#Thing"
  private val dbo = Dict.dbo

  /** Direct `rdfs:subClassOf` edges (sub, sup). */
  val subClassEdges: Seq[(String, String)] = Seq(
    dbo + "Scientist" -> (dbo + "Person"),
    dbo + "Scientist" -> (dbo + "Worker"), // diamond
    dbo + "Person" -> (dbo + "Agent"),
    dbo + "Worker" -> (dbo + "Agent"),
    dbo + "Agent" -> owlThing,
    dbo + "City" -> (dbo + "Settlement"),
    dbo + "Settlement" -> (dbo + "PopulatedPlace"),
    dbo + "PopulatedPlace" -> (dbo + "Place"),
    dbo + "Place" -> owlThing,
    dbo + "Planet" -> (dbo + "CelestialBody"),
    dbo + "CelestialBody" -> owlThing,
    dbo + "ChemicalSubstance" -> owlThing,
    dbo + "Device" -> (dbo + "Artifact"),
    dbo + "Artifact" -> owlThing
  )

  /** Asserted `rdf:type` per entity IRI of the closed [[Dict]]. Ada Lovelace
    * deliberately carries a REDUNDANT direct Person assertion (also derivable
    * via Scientist) — the assertion-wins `min(is_inferred)` path must bind.
    */
  val assertedClasses: Seq[(String, String)] = {
    val sci = Seq("Ada_Lovelace", "Alan_Turing", "Grace_Hopper",
      "Charles_Babbage").map(e => (Dict.dbr + e) -> (dbo + "Scientist")) ++
      Seq("Q7186", "Q937").map(q => (Dict.wd + q) -> (dbo + "Scientist"))
    val city = Seq("London", "Paris", "Lisbon", "Berlin")
      .map(e => (Dict.dbr + e) -> (dbo + "City")) :+
      ((Dict.wd + "Q270") -> (dbo + "City"))
    val dev = Seq("Analytical_Engine", "Difference_Engine")
      .map(e => s"http://example.org/$e" -> (dbo + "Device")) ++
      Seq("Quantum_Widget", "Flux_Capacitor", "Neural_Loom", "Data_Forge")
        .map(e => (Dict.inferNs + e) -> (dbo + "Device"))
    sci ++ city ++ dev ++ Seq(
      (Dict.dbr + "Ada_Lovelace") -> (dbo + "Person"), // redundant assertion
      (Dict.dbr + "Mercury_(planet)") -> (dbo + "Planet"),
      (Dict.dbr + "Mercury_(element)") -> (dbo + "ChemicalSubstance")
    )
  }

  /** Max-cardinality constraints (predicate IRI, max distinct object terms)
    * for [[GraphOps.constraintViolations]] — birthPlace is functional,
    * mainEntityOfPage nearly so, knows bounded for QA purposes. On the
    * synthesized corpus every topic entity violates all three (pages
    * re-assert with fresh objects), which is the point: the QA report must
    * count DISTINCT terms per subject without a per-subject reducer.
    */
  val maxCardinality: Seq[(String, Long)] = Seq(
    (Dict.dbo + "birthPlace") -> 1L,
    (Dict.schemaNs + "mainEntityOfPage") -> 1L,
    (Dict.relations("knows")) -> 3L
  )

  /** Functional predicates for source-count fact fusion
    * ([[GraphOps.fuseFacts]]): slots where conflicting web evidence must be
    * resolved to one value by majority vote.
    */
  val functionalPredicates: Seq[String] = Seq(
    Dict.dbo + "birthPlace",
    Dict.dbo + "residence"
  )

  /** Declared rdfs:domain per relation predicate ([[GraphOps
    * .domainViolations]]). Person-domain predicates genuinely fire on the
    * synthesized corpus: page topics include devices, cities and the two
    * Mercury senses, none of which entail Person.
    */
  val predicateDomains: Seq[(String, String)] = Seq(
    (Dict.dbo + "birthPlace") -> (Dict.dbo + "Person"),
    (Dict.schemaNs + "worksFor") -> (Dict.dbo + "Person"),
    (Dict.relations("knows")) -> (Dict.dbo + "Person"),
    (Dict.dbo + "residence") -> (Dict.dbo + "Person"),
    (Dict.schemaNs + "colleague") -> (Dict.dbo + "Person"),
    (Dict.dbo + "created") -> (Dict.dbo + "Agent")
  )
}
