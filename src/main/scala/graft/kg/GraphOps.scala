package graft.kg

import org.apache.spark.sql.{DataFrame, functions => F}

/** Graph analytics over the materialized triple table — the KG-construction
  * counterpart of the text-pipeline family: once triples are extracted and
  * canonicalized, a training-data / KG-curation pipeline needs node-level
  * structure (degrees, centrality, co-mention structure) to filter, weight
  * and sample entities at corpus scale. The reference stops at the namespace
  * summary; these operators extend the same triple relation with the graph
  * measurements a 10^12-page crawl graph needs, all as Catalyst-planned
  * aggregations/joins (no driver-side graph materialization — node and edge
  * sets never leave the cluster).
  *
  * Node domain convention shared by all operators here: graph nodes are IRI
  * and blank-node terms (Kind 0 and 1); literals are attributes, not nodes.
  */
object GraphOps {

  private val NodeKinds = Seq(0, 1)

  /** Per-node degree statistics: out-degree (triples with the node as
    * subject — any object kind, literals included: attribute edges count as
    * outgoing statements, matching SPARQL `?s ?p ?o` degree semantics),
    * in-degree (triples with the node as an IRI/blank object), and the
    * number of distinct predicates the node emits.
    *
    * Scale shape: ONE union-projected scan into one hash aggregation —
    * `sum` is algebraic so partial aggregation absorbs hot entities
    * (a dbpedia-style hub with 10^9 incident triples collapses map-side);
    * `count(DISTINCT p)` expands per-node only over the node's own distinct
    * predicate set (bounded by the vocabulary, not the corpus).
    */
  def entityDegrees(triples: DataFrame): DataFrame = {
    val subj = triples
      .filter(F.col("sKind").isin(NodeKinds: _*))
      .select(F.col("s").as("node"), F.lit(1L).as("outc"), F.lit(0L).as("inc"),
        F.col("p"))
    val obj = triples
      .filter(F.col("oKind").isin(NodeKinds: _*))
      .select(F.col("o").as("node"), F.lit(0L).as("outc"), F.lit(1L).as("inc"),
        F.lit(null).cast("string").as("p"))
    subj.union(obj)
      .groupBy("node")
      .agg(
        F.sum("outc").as("out_deg"),
        F.sum("inc").as("in_deg"),
        F.countDistinct("p").as("n_preds"))
  }

  /** Fixed-point integer PageRank over the entity graph, engine-exact by
    * construction (the unigram-LM micro-nat trick applied to iteration):
    * ranks live in integer micro-units, every step is integer arithmetic
    * (`div` truncation on positive operands ≡ DuckDB `//` floor), and
    * integer sums are order-independent — so the emitted ranks are
    * bit-identical across engines, partitionings and summation orders,
    * something float PageRank can never promise across two engines.
    *
    * Semantics: edges are DISTINCT (s, o) pairs over IRI/blank terms;
    * nodes are every IRI/blank subject or object (isolated-from-edges nodes
    * rank too). r_0 = 1_000_000 for all nodes; per iteration
    * `r_{k+1}(n) = 150_000 + Σ_{m→n} (r_k(m) * 17) div (20 * outdeg(m))`
    * (damping 0.85 = 17/20, teleport (1-d)·10^6 = 150_000; dangling mass
    * leaks — the deterministic variant both engines implement identically).
    *
    * Scale shape: the edge+outdeg relation is built once and
    * `localCheckpoint`ed (on a cluster: a reliable checkpoint / parquet
    * materialization); each iteration is one shuffle join on the subject key
    * plus one algebraic `sum` groupBy on the target key — a celebrity node's
    * 10^9 incoming contributions combine map-side, and a hub's outgoing
    * fan-out streams through the 1:N join (AQE skew split applies). Ranks
    * are re-checkpointed per iteration to keep lineage flat.
    */
  def pageRank(triples: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    val nodes = triples
      .filter(F.col("sKind").isin(NodeKinds: _*)).select(F.col("s").as("node"))
      .union(triples
        .filter(F.col("oKind").isin(NodeKinds: _*)).select(F.col("o").as("node")))
      .distinct()
      .localCheckpoint()
    val edges = triples
      .filter(F.col("sKind").isin(NodeKinds: _*) &&
        F.col("oKind").isin(NodeKinds: _*))
      .select("s", "o").distinct()
    val outdeg = edges.groupBy("s").agg(F.count(F.lit(1)).as("outdeg"))
    val edgesOd = edges.join(outdeg, "s").localCheckpoint()

    var ranks = nodes.withColumn("rank", F.lit(1000000L))
    for (_ <- 1 to iters) {
      // one exchange per iteration (r6): the former
      //   contrib.groupBy(node) → nodes ⟕ contrib
      // shape paid a groupBy exchange plus a node-keyed left join (two more
      // exchanges under AQE). Union-in a zero contribution for every node
      // instead: the single aggregation both sums the contributions and
      // keeps zero-in-degree nodes alive — integer sum + 0 is exact, so the
      // emitted ranks are bit-identical.
      val contrib = edgesOd
        .join(ranks.withColumnRenamed("node", "s"), "s")
        .select(F.col("o").as("node"),
          F.expr("(`rank` * 17) div (20 * outdeg)").as("c"))
      ranks = contrib
        .unionByName(nodes.select(F.col("node"), F.lit(0L).as("c")))
        .groupBy("node")
        .agg((F.lit(150000L) + F.sum("c")).as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** Personalized PageRank in the same engine-exact integer micro-unit
    * scheme as [[pageRank]], with restart mass concentrated on a seed set —
    * topic-conditioned entity importance ("how central is this node to the
    * dbpedia neighborhood", the entity-salience signal KG curation uses
    * where global PageRank would reward generic hubs). `r_0 = 10^6` on
    * seeds, 0 elsewhere; per iteration
    * `r_{k+1}(n) = (n seed ? 150_000 : 0) + Σ (r_k(m)·17) div (20·outdeg(m))`
    * — every op exact-integer, so ranks are bit-identical across engines
    * and row orders.
    *
    * Scale shape: identical to [[pageRank]] — checkpointed edge+outdeg
    * relation, one join + one algebraic sum per iteration; the seed
    * indicator is a pure predicate column on the node relation (no join).
    */
  def personalizedPageRank(
      triples: DataFrame,
      isSeed: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      iters: Int
  ): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    val nodes = triples
      .filter(F.col("sKind").isin(NodeKinds: _*)).select(F.col("s").as("node"))
      .union(triples
        .filter(F.col("oKind").isin(NodeKinds: _*)).select(F.col("o").as("node")))
      .distinct()
      .withColumn("is_seed", isSeed(F.col("node")))
      .localCheckpoint()
    val edges = triples
      .filter(F.col("sKind").isin(NodeKinds: _*) &&
        F.col("oKind").isin(NodeKinds: _*))
      .select("s", "o").distinct()
    val outdeg = edges.groupBy("s").agg(F.count(F.lit(1)).as("outdeg"))
    val edgesOd = edges.join(outdeg, "s").localCheckpoint()

    var ranks = nodes.select(F.col("node"),
      F.when(F.col("is_seed"), 1000000L).otherwise(0L).as("rank"))
    for (_ <- 1 to iters) {
      // same one-exchange union shape as [[pageRank]] (r6): the restart term
      // re-derives from the pure `isSeed` predicate on the grouping key, so
      // no node-keyed left join is needed; integer sum + 0 is exact and the
      // ranks stay bit-identical.
      val contrib = edgesOd
        .join(ranks.withColumnRenamed("node", "s"), "s")
        .select(F.col("o").as("node"),
          F.expr("(`rank` * 17) div (20 * outdeg)").as("c"))
      ranks = contrib
        .unionByName(nodes.select(F.col("node"), F.lit(0L).as("c")))
        .groupBy("node")
        .agg((F.when(isSeed(F.col("node")), 150000L).otherwise(0L) +
          F.sum("c")).as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** Per-node triangle counts over the undirected entity graph (self-loops
    * dropped, parallel/reverse edges collapsed) — the clustering-structure
    * measurement KG curation uses to separate genuinely interlinked entity
    * communities from star-shaped extraction noise.
    *
    * Scale shape: the classic degree-ordered orientation — every undirected
    * edge is directed from its lower-(degree, node) endpoint to the higher
    * one, which bounds every out-neighborhood by O(√m) REGARDLESS of hub
    * degree, so the wedge self-join (the quadratic step) never explodes on a
    * celebrity node; wedges are confirmed by one equi-join back to the
    * oriented edge set, and the per-node roll-up is an algebraic sum. The
    * oracle states the semantics as the naive a<b<c three-way join — same
    * triangle set, different (scale-unsafe) plan.
    */
  def triangleCounts(triples: DataFrame): DataFrame = {
    val eu = triples
      .filter(F.col("sKind").isin(NodeKinds: _*) &&
        F.col("oKind").isin(NodeKinds: _*) && F.col("s") =!= F.col("o"))
      .select(F.least(F.col("s"), F.col("o")).as("a"),
        F.greatest(F.col("s"), F.col("o")).as("b"))
      .distinct()
    val deg = eu.select(F.col("a").as("n"))
      .union(eu.select(F.col("b").as("n")))
      .groupBy("n").agg(F.count(F.lit(1)).as("deg"))
    val withDeg = eu
      .join(deg.select(F.col("n").as("a"), F.col("deg").as("da")), "a")
      .join(deg.select(F.col("n").as("b"), F.col("deg").as("db")), "b")
    val oriented = withDeg.select(
      F.when(F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b")),
          F.struct(F.col("a").as("src"), F.col("b").as("dst"), F.col("db").as("ddeg")))
        .otherwise(
          F.struct(F.col("b").as("src"), F.col("a").as("dst"), F.col("da").as("ddeg")))
        .as("e"))
      .select("e.src", "e.dst", "e.ddeg")
    val o1 = oriented.select(F.col("src"), F.col("dst").as("v"), F.col("ddeg").as("dv"))
    val o2 = oriented.select(F.col("src"), F.col("dst").as("w"), F.col("ddeg").as("dw"))
    val wedges = o1.join(o2, "src")
      .filter(F.struct(F.col("dv"), F.col("v")) < F.struct(F.col("dw"), F.col("w")))
      .select(F.col("src").as("u"), F.col("v"), F.col("w"))
    val tris = wedges.join(
      oriented.select(F.col("src").as("v"), F.col("dst").as("w")),
      Seq("v", "w"))
    tris.select(F.explode(F.array(F.col("u"), F.col("v"), F.col("w"))).as("node"))
      .groupBy("node").agg(F.count(F.lit(1)).as("n_tri"))
  }

  /** Per-node local clustering coefficient in integer ppm — the
    * triangle-density QA signal beside [[triangleCounts]] (a KG whose
    * entities have near-zero clustering is a star-shaped provenance dump;
    * organic entity graphs cluster): `cc_ppm = n_tri·2·10^6 div
    * (deg·(deg−1))` over the distinct undirected entity graph, 0 for
    * deg < 2. Exact integer arithmetic end to end (`div` on non-negative
    * operands ≡ DuckDB `//`) — no IEEE ratio between engines; n_tri ≤
    * C(deg, 2), so the numerator stays far under Long range even for
    * 10^5-degree hubs.
    *
    * Scale shape: degree is algebraic over the distinct edge relation; the
    * triangle side is [[triangleCounts]]'s degree-oriented wedge join
    * (each wedge counted once, fan-out bounded by orientation); the final
    * join is node-vocabulary-sized.
    */
  def clusteringCoefficients(triples: DataFrame): DataFrame = {
    val eu = triples
      .filter(F.col("sKind").isin(NodeKinds: _*) &&
        F.col("oKind").isin(NodeKinds: _*) && F.col("s") =!= F.col("o"))
      .select(F.least(F.col("s"), F.col("o")).as("a"),
        F.greatest(F.col("s"), F.col("o")).as("b"))
      .distinct()
    val deg = eu.select(F.col("a").as("node"))
      .union(eu.select(F.col("b").as("node")))
      .groupBy("node").agg(F.count(F.lit(1)).as("deg"))
    deg.join(triangleCounts(triples), Seq("node"), "left")
      .select(F.col("node"), F.col("deg"),
        F.coalesce(F.col("n_tri"), F.lit(0L)).as("n_tri"))
      .withColumn("cc_ppm",
        F.when(F.col("deg") >= 2,
          F.expr("n_tri * 2000000L div (deg * (deg - 1))"))
          .otherwise(0L))
  }

  /** Entity co-occurrence: unordered pairs of distinct entities linked on the
    * same page, with the number of co-mentioning pages. The mention-graph
    * projection KG pipelines feed into relatedness scoring and
    * entity-disambiguation priors.
    *
    * Scale shape: dedup to (page, entity) first (algebraic), then a
    * self-equi-join on the page key — per-page fan-out is C(entities-on-page,
    * 2), bounded by the page length, never by the corpus; the pair count is
    * an algebraic sum. A viral entity appearing on 10^9 pages is spread
    * across all of them (the join key is the page, not the entity).
    */
  def cooccurrence(mentions: DataFrame): DataFrame = {
    val pe = mentions.select(F.col("srcUrl").as("url"),
      F.col("entityIri").as("iri")).distinct()
    pe.as("a").join(pe.as("b"),
        F.col("a.url") === F.col("b.url") && F.col("a.iri") < F.col("b.iri"))
      .groupBy(F.col("a.iri").as("e1"), F.col("b.iri").as("e2"))
      .agg(F.count(F.lit(1)).as("n_pages"))
  }

  /** Entity-linking commonness prior P(entity | surface) — the Milne-Witten
    * table that seeds every anchor-dictionary linker: for each (surface form,
    * entity) pair observed in the mention stream, the link count, the
    * surface's total mention count and candidate-entity count (ambiguity),
    * and the prior as ONE IEEE divide of two exact longs (so both engines
    * compute the identical double).
    *
    * Scale shape: one algebraic count over (surface, entity) — a surface
    * mentioned on 10^9 pages collapses map-side — then per-surface totals
    * over the VOCABULARY-sized pair table, joined back on surface (both
    * sides post-aggregation, AQE broadcasts). The mention stream itself is
    * touched exactly once; no window ever sees it.
    */
  def mentionPriors(mentions: DataFrame): DataFrame = {
    val pair = mentions
      .groupBy(F.col("surface"), F.col("entityIri").as("entity_iri"))
      .agg(F.count(F.lit(1)).as("n"))
    val tot = pair.groupBy("surface")
      .agg(F.sum("n").as("n_surface"), F.count(F.lit(1)).as("n_entities"))
    pair.join(tot, "surface")
      .select(F.col("surface"), F.col("entity_iri"), F.col("n"),
        F.col("n_surface"), F.col("n_entities"),
        (F.col("n").cast("double") / F.col("n_surface")).as("prior"))
  }

  /** Cross-KB identity resolution by shared surface labels — the
    * `owl:sameAs`-closure step of KG construction: two entity IRIs observed
    * under the same label anywhere in the corpus are merged, transitively
    * through entities carrying several labels. Returns the complete
    * `(entity, canon)` map over every entity in `pairs` (singletons map to
    * themselves); `canon` is the lexicographic minimum IRI of the
    * equivalence class — deterministic, engine-independent, and stable
    * under re-runs.
    *
    * Scale shape: the label↔entity graph is first collapsed to DISTINCT
    * pairs (bounded by the alias vocabulary, never the corpus — a label on
    * 10^9 pages contributes one row), then each label's entity set becomes
    * a star on the label's min entity (`min` is algebraic — a hot label
    * collapses map-side), and the star edges feed the pointer-jumping
    * connected components (O(log diameter) rounds over the bounded edge
    * relation). The corpus itself is touched exactly once, by the distinct.
    */
  def resolveByLabel(
      pairs: DataFrame,
      labelCol: String = "surface",
      entityCol: String = "entityIri",
      driverThreshold: Long = 100000L
  ): DataFrame = {
    val pe = pairs.select(F.col(labelCol).as("label"),
      F.col(entityCol).as("entity")).distinct().localCheckpoint()
    val n = pe.count()
    if (n <= driverThreshold) {
      // scale-adaptive cutover (the Dedup.connectedComponents precedent):
      // the DISTINCT label↔entity relation is alias-vocabulary-sized here,
      // so star-edge construction + min-root union-find run on the driver in
      // one collect — replacing the ~5-jobs-per-stage distributed path
      // (reps agg, edge join, CC's own persist/count/collect, mapping join)
      // with one job. Semantics identical: canon = min entity of the
      // label-connected component (min-root union-find), entities outside
      // any merge map to themselves.
      val spark = pairs.sparkSession
      import spark.implicits._
      val rows = pe.collect().map(r => (r.getString(0), r.getString(1)))
      val parent = scala.collection.mutable.Map.empty[String, String]
      def find(x: String): String = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      def union(a: String, b: String): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      rows.groupBy(_._1).foreach { case (_, es) =>
        val ents = es.map(_._2)
        val rep = ents.min
        ents.foreach(e => if (e != rep) union(e, rep))
      }
      val mapping = rows.map(_._2).distinct.sorted.map(e => (e, find(e)))
      return mapping.toSeq.toDF("entity", "canon")
    }
    val reps = pe.groupBy("label").agg(F.min("entity").as("rep"))
    val edges = pe.join(reps, "label")
      .filter(F.col("entity") =!= F.col("rep"))
      .select("entity", "rep").distinct()
    val cc = graft.dedup.Dedup.connectedComponents(edges, "entity", "rep")
    pe.select("entity").distinct()
      .join(cc.withColumnRenamed("id", "entity"), Seq("entity"), "left")
      .select(F.col("entity"),
        F.coalesce(F.col("component"), F.col("entity")).as("canon"))
  }

  /** Canonical display-label selection per resolved entity — the
    * `rdfs:label`-election step after [[resolveByLabel]]: every mention
    * instance votes for its surface form, votes roll up to the entity's
    * canonical id, and the winner is the most frequent label (label asc on
    * ties — total order, engine-independent). Output: one row per canonical
    * entity with the elected label and its vote count.
    *
    * Scale shape: the instance-level vote count is an algebraic `count` on
    * (canon, label) — a label mentioned on 10^9 pages collapses map-side;
    * the mapping join is broadcast (alias-vocabulary-sized); the election is
    * an algebraic `min` of a (-votes, label) struct, so each map task
    * reduces its slice of an entity to ONE candidate before the shuffle.
    * Never a per-entity window.
    */
  def canonicalLabels(
      mentions: DataFrame,
      mapping: DataFrame,
      labelCol: String = "surface",
      entityCol: String = "entityIri"
  ): DataFrame = {
    val m = F.broadcast(mapping.select(F.col("entity"), F.col("canon")))
    val votes = mentions
      .select(F.col(entityCol).as("entity"), F.col(labelCol).as("label"))
      .join(m, Seq("entity"), "left")
      .select(F.coalesce(F.col("canon"), F.col("entity")).as("canon"), F.col("label"))
      .groupBy("canon", "label").agg(F.count(F.lit(1)).as("votes"))
    votes
      .groupBy("canon")
      .agg(F.min(F.struct((-F.col("votes")).as("nv"), F.col("label"))).as("w"))
      .select(F.col("canon"), F.col("w.label").as("label"),
        (-F.col("w.nv")).as("n_mentions"))
  }

  /** Crawl-snapshot delta over two materialized triple tables — the
    * incremental-maintenance measurement a recurring crawl needs: which
    * distinct triples appeared, vanished, or changed occurrence count
    * between snapshot `old` and snapshot `new`. Statuses: `added` (new
    * only), `removed` (old only), `changed` (both, counts differ), `kept`
    * (both, counts equal).
    *
    * Scale shape: each side collapses to (triple-key, count) with an
    * algebraic aggregation BEFORE the diff join — the join carries one row
    * per distinct triple, never per occurrence, and both sides hash on the
    * same key so the full-outer join co-partitions with no extra exchange.
    */
  def snapshotDiff(oldT: DataFrame, newT: DataFrame): DataFrame = {
    val key = Seq("s", "sKind", "p", "o", "oKind", "oLang", "oDt")
    def counted(df: DataFrame, as: String) =
      df.groupBy(key.map(F.col): _*).agg(F.count(F.lit(1)).as(as))
    val a = counted(oldT, "old_n").as("a")
    val b = counted(newT, "new_n").as("b")
    // null-safe key equality: oLang/oDt are legitimately NULL on most rows
    val cond = key.map(k => F.col(s"a.$k") <=> F.col(s"b.$k")).reduce(_ && _)
    a.join(b, cond, "full_outer")
      .select(key.map(k => F.coalesce(F.col(s"a.$k"), F.col(s"b.$k")).as(k)) ++ Seq(
        F.coalesce(F.col("a.old_n"), F.lit(0L)).as("old_n"),
        F.coalesce(F.col("b.new_n"), F.lit(0L)).as("new_n"),
        F.when(F.col("a.old_n").isNull, F.lit("added"))
          .when(F.col("b.new_n").isNull, F.lit("removed"))
          .when(F.col("a.old_n") === F.col("b.new_n"), F.lit("kept"))
          .otherwise(F.lit("changed")).as("status")): _*)
  }

  /** Bounded n-hop neighborhood expansion from a seed entity set over the
    * undirected entity graph — the subgraph-extraction step KG curation uses
    * to carve a training slice around seed entities. Output: every node
    * within `maxHops` of a seed, with its minimum hop distance.
    *
    * Scale shape: edges collapse to DISTINCT undirected pairs once
    * (bounded by the entity graph, not the corpus) and are checkpointed;
    * each of the `maxHops` rounds is one equi-join of the CURRENT frontier
    * (nodes first reached last round — monotonically shrinking) against the
    * edge relation plus an algebraic `min` — a celebrity hub's fan-out
    * streams through the 1:N join (AQE skew split applies), and reached
    * nodes never re-enter the frontier, so work is proportional to the
    * reachable set, not hops × graph.
    */
  def neighborhood(triples: DataFrame, seeds: Seq[String], maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    val spark = triples.sparkSession
    import spark.implicits._
    val dir = triples
      .filter(F.col("sKind").isin(NodeKinds: _*) &&
        F.col("oKind").isin(NodeKinds: _*) && F.col("s") =!= F.col("o"))
      .select("s", "o")
    val edges = dir.union(dir.select(F.col("o"), F.col("s")))
      .toDF("src", "dst").distinct().localCheckpoint()

    var reached = seeds.toDF("node").distinct()
      .withColumn("dist", F.lit(0)).localCheckpoint()
    var frontier = reached
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val next = frontier
        .join(edges, frontier("node") === edges("src"))
        .select(F.col("dst").as("node")).distinct()
        .join(reached.select(F.col("node"), F.lit(1).as("seen")), Seq("node"), "left")
        .filter(F.col("seen").isNull)
        .select(F.col("node"), F.lit(hop).as("dist"))
        .localCheckpoint()
      reached = reached.union(next).localCheckpoint()
      frontier = next
    }
    reached
  }

  /** IRI canonicalization into the materialized triple table (the
    * north-star's closing stage): rewrite subject and object IRIs through a
    * `(entity, canon)` map — e.g. [[resolveByLabel]]'s output — and emit the
    * canonical DISTINCT triple relation with occurrence counts. Literal
    * objects and blank nodes pass through untouched (the map keys are
    * entity IRIs only); provenance columns are dropped by the distinct —
    * this is the graph-shaped artifact, the raw table keeps lineage.
    *
    * Scale shape: the mapping is alias-vocabulary-sized → both rewrites are
    * broadcast left joins (no corpus shuffle); the closing groupBy is one
    * hash aggregation on the rewritten key with algebraic `count` (a hot
    * canonical triple collapses map-side).
    */
  def canonicalizeTriples(triples: DataFrame, mapping: DataFrame): DataFrame = {
    val m = F.broadcast(mapping.select(F.col("entity"), F.col("canon")))
    triples
      .join(m.withColumnRenamed("entity", "s").withColumnRenamed("canon", "s_c"),
        Seq("s"), "left")
      .join(m.withColumnRenamed("entity", "o").withColumnRenamed("canon", "o_c"),
        Seq("o"), "left")
      .select(
        F.when(F.col("sKind") === 0, F.coalesce(F.col("s_c"), F.col("s")))
          .otherwise(F.col("s")).as("s"),
        F.col("sKind"), F.col("p"),
        F.when(F.col("oKind") === 0, F.coalesce(F.col("o_c"), F.col("o")))
          .otherwise(F.col("o")).as("o"),
        F.col("oKind"), F.col("oLang"), F.col("oDt"))
      .groupBy("s", "sKind", "p", "o", "oKind", "oLang", "oDt")
      .agg(F.count(F.lit(1)).as("occurs"))
  }

  /** Predicate-signature schema discovery — the type-induction primitive KG
    * construction runs after materializing triples: entities sharing the
    * SAME distinct-predicate set almost always share a latent type, so
    * grouping subjects by their sorted predicate signature surfaces the
    * emergent schema (and its long tail of malformed extractions) without
    * any ontology. Emits one row per signature with its entity count and
    * predicate arity, plus the canonical (min) example subject.
    *
    * Scale shape: (1) dedup to the distinct (subject, predicate) relation
    * first — algebraic, map-side combined; (2) the per-subject
    * `sort_array(collect_set(p))` is bounded by the PREDICATE VOCABULARY
    * (thousands), never by the subject's triple count — a celebrity entity
    * with 10^9 triples still folds to one vocab-bounded row per map task
    * after the distinct; (3) the signature roll-up is an algebraic
    * count + min on a md5-keyed aggregation.
    */
  def predicateSignatures(triples: DataFrame): DataFrame = {
    val sp = triples
      .filter(F.col("sKind").isin(NodeKinds: _*))
      .select(F.col("s"), F.col("p")).distinct()
    sp.groupBy("s")
      .agg(F.sort_array(F.collect_set(F.col("p"))).as("preds"))
      .select(F.col("s"),
        F.md5(F.array_join(F.col("preds"), ",")).as("sig_md5"),
        F.size(F.col("preds")).cast("long").as("n_preds"))
      .groupBy("sig_md5", "n_preds")
      .agg(F.count(F.lit(1)).as("n_entities"), F.min(F.col("s")).as("example"))
  }

  /** Per-predicate cardinality profile — the KG-QA pass that decides which
    * predicates are functional (≤1 object per subject: birthDate-like),
    * which are multi-valued (starredIn-like), and which are extraction
    * noise (huge object fan-in). Emits per predicate: triple count,
    * distinct subjects, distinct objects, and the subjects-per-triple
    * functionality ratio.
    *
    * Scale shape: each distinct count is computed as its own algebraic
    * pre-dedup — `distinct(p, s)` / `distinct(p, o)` collapse map-side,
    * then count by p — instead of `count_distinct` inside one group-by
    * (which Spark plans as an `expand` tripling the shuffle). The three
    * per-predicate relations are PREDICATE-VOCAB-sized; their join is
    * trivially broadcastable. The ratio is one double division of exact
    * longs — engine-identical.
    */
  def predicateStats(triples: DataFrame): DataFrame = {
    val base = triples.filter(F.col("sKind").isin(NodeKinds: _*))
    val tot = base.groupBy("p").agg(F.count(F.lit(1)).as("n_triples"))
    val ns = base.select("p", "s").distinct()
      .groupBy("p").agg(F.count(F.lit(1)).as("n_subj"))
    val no = base.select("p", "o").distinct()
      .groupBy("p").agg(F.count(F.lit(1)).as("n_obj"))
    tot.join(ns, "p").join(no, "p")
      .select(F.col("p"), F.col("n_triples"), F.col("n_subj"), F.col("n_obj"),
        (F.col("n_subj").cast("double") / F.col("n_triples").cast("double"))
          .as("functionality"))
  }

  /** Predicate-pair association strength (lift) on shared subjects — the
    * association-mining side of schema discovery (where
    * [[predicateSignatures]] finds exact type signatures, this finds the
    * GRADIENT: predicate pairs that co-occur on the same entities far more
    * (or less) often than independence predicts, the signal that proposes
    * property groupings and flags extraction noise). For every unordered
    * predicate pair `(p1 < p2)`:
    * `lift = P(p1,p2) / (P(p1)·P(p2)) = n_pair·n_subj / (n1·n2)` over the
    * distinct (subject, predicate) relation. Counts are exact longs; `lift`
    * is ONE IEEE-754 double multiply-divide of exact integers — identical
    * on both engines (log-PMI would put a transcendental between them).
    *
    * Scale shape: dedup to distinct (s, p) first (algebraic); the pair
    * generation is a self-equi-join on the subject key — per-subject
    * fan-out is C(preds-on-subject, 2), bounded by the predicate
    * VOCABULARY, never the corpus; pair/marginal counts are algebraic and
    * the marginal join sides are vocab-sized (broadcastable).
    */
  def predicatePairLift(triples: DataFrame): DataFrame = {
    val sp = triples
      .filter(F.col("sKind").isin(NodeKinds: _*))
      .select(F.col("s"), F.col("p")).distinct()
      .localCheckpoint()
    val nSubj = sp.select("s").distinct().count()
    val marg = sp.groupBy("p").agg(F.count(F.lit(1)).as("n"))
    val pairs = sp.as("a").join(sp.as("b"),
        F.col("a.s") === F.col("b.s") && F.col("a.p") < F.col("b.p"))
      .groupBy(F.col("a.p").as("p1"), F.col("b.p").as("p2"))
      .agg(F.count(F.lit(1)).as("n_pair"))
    pairs
      .join(marg.select(F.col("p").as("p1"), F.col("n").as("n1")), "p1")
      .join(marg.select(F.col("p").as("p2"), F.col("n").as("n2")), "p2")
      .select(F.col("p1"), F.col("p2"), F.col("n_pair"), F.col("n1"), F.col("n2"),
        (F.col("n_pair").cast("double") * F.lit(nSubj.toDouble) /
          (F.col("n1").cast("double") * F.col("n2").cast("double"))).as("lift"))
  }

  /** Fixed-round integer HITS over the directed entity graph — hub and
    * authority scores, the second centrality lens beside [[pageRank]]
    * (PageRank finds globally-endorsed entities; HITS separates CURATORS —
    * pages/entities that point at many good things — from the good things
    * themselves, the distinction a crawl-frontier or source-quality ranker
    * needs). Engine-exact by the same micro-unit contract: scores live in
    * integer micro-units, each half-round is an exact integer sum followed
    * by max-normalization `x·10^6 div max(x)` (all operands non-negative,
    * so Spark `div` truncation ≡ DuckDB `//` floor), and `rounds` is fixed
    * so the oracle unrolls the identical iterations.
    *
    * Semantics: edges are DISTINCT (s, o) node-node pairs; the score domain
    * is every edge endpoint. h_0 = 10^6; per round: `auth_raw(n) =
    * Σ_{m→n} hub(m)` then max-normalize; `hub_raw(n) = Σ_{n→m} auth(m)`
    * then max-normalize. Output `(node, hub, auth)` after `rounds` rounds
    * (nodes with no in-edges have auth 0; no out-edges, hub 0).
    *
    * Scale shape: the edge relation is materialized once; each half-round
    * is one shuffle join on the edge key plus an algebraic sum (celebrity
    * fan-in combines map-side) and the normalizing max is a single-scalar
    * aggregate (never data to the driver). Bounds: sums stay under 2^63
    * while n_nodes·10^12 does — i.e. up to ~9·10^6 nodes per connected
    * normalization domain in the worst all-to-one case; real graphs are
    * orders below the worst case (documented operating envelope).
    */
  def hits(triples: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val edges = triples
      .filter(F.col("sKind").isin(NodeKinds: _*) &&
        F.col("oKind").isin(NodeKinds: _*))
      .select("s", "o").distinct().localCheckpoint()
    val nodes = edges.select(F.col("s").as("node"))
      .union(edges.select(F.col("o").as("node")))
      .distinct().localCheckpoint()
    val spark = triples.sparkSession
    import spark.implicits._
    // One exchange + one checkpoint job per half-round (r6): contributions
    // union a zero row per node (keeping isolated-side nodes alive without
    // the former node-keyed left join and its extra exchanges), the single
    // aggregation sums them, and the per-partition MAX folds into the same
    // pass that materializes the checkpoint (accumulator — the separate
    // max-collect job per half-round is gone; duplicated task-retry entries
    // are harmless under max). Integer sums + max are order-independent, so
    // scores stay bit-identical.
    def halfRound(contrib: DataFrame, out: String): DataFrame = {
      val maxAcc = spark.sparkContext.collectionAccumulator[Long](s"hits-$out-max")
      val cp = contrib
        .unionByName(nodes.select(F.col("node"), F.lit(0L).as("v")))
        .groupBy("node").agg(F.sum("v").as(out))
        .as[(String, Long)]
        .mapPartitions { it =>
          val ctx = org.apache.spark.TaskContext.get()
          var mx = Long.MinValue
          ctx.addTaskCompletionListener[Unit] { c =>
            if (!c.isFailed() && !c.isInterrupted() && mx != Long.MinValue) maxAcc.add(mx)
          }
          it.map { r => if (r._2 > mx) mx = r._2; r }
        }
        .toDF("node", out)
        .localCheckpoint(true)
      val mx = {
        import scala.jdk.CollectionConverters._
        val vs = maxAcc.value.asScala
        math.max(if (vs.isEmpty) 1L else vs.max, 1L)
      }
      // integer `div`, not `/` (which Spark widens to double division)
      cp.select(F.col("node"), F.expr(s"($out * 1000000L) div ${mx}L").as(out))
    }
    var hub = nodes.withColumn("hub", F.lit(1000000L))
    var auth: DataFrame = null
    for (_ <- 1 to rounds) {
      auth = halfRound(
        edges.join(hub.withColumnRenamed("node", "s"), "s")
          .select(F.col("o").as("node"), F.col("hub").as("v")), "auth")
      hub = halfRound(
        edges.join(auth.withColumnRenamed("node", "o"), "o")
          .select(F.col("s").as("node"), F.col("auth").as("v")), "hub")
    }
    hub.join(auth, "node").select("node", "hub", "auth")
  }

  /** Contiguous-id encoding of the node-node triple relation — the input
    * artifact KG-embedding training (TransE/DistMult/RotatE-style) consumes:
    * every entity and relation gets a dense long id, ids assigned by
    * (frequency desc, term asc) so id order doubles as a popularity order
    * (frequency-bucketed negative sampling, curriculum schedules). Emits one
    * row per DISTINCT node-node triple with both the ids and the original
    * terms: `(h_id, r_id, t_id, h, r, t)`.
    *
    * Entity frequency = number of distinct triples the term participates in,
    * counting each endpoint (a self-referential edge contributes 2);
    * relation frequency = distinct triple count. Both are exact longs, and
    * (freq desc, term asc) is a total order — the encoding is deterministic
    * and engine-independent.
    *
    * Scale shape: the dictionaries are assigned by the SAME two-pass
    * distributed prefix-sum rank as [[graft.textops.TextOps.rankBuckets]]
    * (range-partition on the order, per-partition counts to the driver —
    * #partitions rows, never data — broadcast offsets, local index): a
    * billion-entity vocabulary never collapses into one `row_number`
    * partition. The final encodes are two shuffle equi-joins on the term
    * keys (entity dictionary reused for both endpoints); at 10^12-triple
    * scale the dictionary side is the smaller relation and AQE picks the
    * join strategy from observed sizes.
    */
  def encodeForEmbedding(triples: DataFrame): DataFrame = {
    val et = distinctNodeTriples(triples).localCheckpoint()
    val entFreq = et.select(F.col("s").as("term"))
      .union(et.select(F.col("o").as("term")))
      .groupBy("term").agg(F.count(F.lit(1)).as("freq"))
    val relFreq = et.groupBy(F.col("p").as("term"))
      .agg(F.count(F.lit(1)).as("freq"))
    val entIds = rankDense(entFreq)
    val relIds = rankDense(relFreq)
    et.join(entIds.select(F.col("term").as("s"), F.col("id").as("h_id")), "s")
      .join(relIds.select(F.col("term").as("p"), F.col("id").as("r_id")), "p")
      .join(entIds.select(F.col("term").as("o"), F.col("id").as("t_id")), "o")
      .select(F.col("h_id"), F.col("r_id"), F.col("t_id"),
        F.col("s").as("h"), F.col("p").as("r"), F.col("o").as("t"))
  }

  /** The encoded entity-pair relation only — [[encodeForEmbedding]] minus
    * the relation dictionary, for consumers that discard `r_id` entirely
    * (random walks traverse (h_id, t_id) edges): building and joining the
    * relation-id dictionary there was pure thrown-away work (guide §1.2).
    * Entity ids are assigned by the identical (freq desc, term asc) rank, so
    * the (h_id, t_id) pairs are bit-identical to the full encoding's.
    */
  def encodeEntityPairs(triples: DataFrame): DataFrame = {
    val et = distinctNodeTriples(triples).localCheckpoint()
    val entFreq = et.select(F.col("s").as("term"))
      .union(et.select(F.col("o").as("term")))
      .groupBy("term").agg(F.count(F.lit(1)).as("freq"))
    val entIds = rankDense(entFreq)
    et.select("s", "o").distinct()
      .join(entIds.select(F.col("term").as("s"), F.col("id").as("h_id")), "s")
      .join(entIds.select(F.col("term").as("o"), F.col("id").as("t_id")), "o")
      .select(F.col("h_id"), F.col("t_id"))
  }

  /** The DISTINCT node-node (IRI/blank endpoints) triple relation. */
  private def distinctNodeTriples(triples: DataFrame): DataFrame =
    triples
      .filter(F.col("sKind").isin(NodeKinds: _*) &&
        F.col("oKind").isin(NodeKinds: _*))
      .select("s", "p", "o").distinct()

  /** Dense ids 0..n-1 over (freq desc, term asc) via the two-pass
    * distributed prefix-sum rank — never a global single-partition window.
    */
  private def rankDense(freq: DataFrame): DataFrame = {
    val spark = freq.sparkSession
    import spark.implicits._
    // per-partition counts fold into the checkpoint materialization pass
    // (same accumulator shape as TextOps.selectToBudget — one job, not two)
    val cntAcc = spark.sparkContext
      .collectionAccumulator[(Int, Long)]("rankDense-partition-counts")
    val rows = freq
      .select(F.col("term"), F.col("freq").cast("long").as("freq"))
      .repartitionByRange(F.col("freq").desc, F.col("term").asc)
      .sortWithinPartitions(F.col("freq").desc, F.col("term").asc)
      .as[(String, Long)]
      .mapPartitions { it =>
        val ctx = org.apache.spark.TaskContext.get()
        var cnt = 0L
        ctx.addTaskCompletionListener[Unit] { c =>
          if (!c.isFailed() && !c.isInterrupted()) cntAcc.add((c.partitionId(), cnt))
        }
        it.map { r => cnt += 1; r }
      }
      .toDF("term", "freq")
      .localCheckpoint()
    val perPart = {
      import scala.jdk.CollectionConverters._
      cntAcc.value.asScala.toMap.toSeq.sortBy(_._1)
    }
    val offsets = new java.util.HashMap[Int, Long]()
    var acc = 0L
    perPart.foreach { case (pid, cnt) => offsets.put(pid, acc); acc += cnt }
    val bc = spark.sparkContext.broadcast(offsets)
    rows.as[(String, Long)].mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var i = bc.value.getOrDefault(pid, 0L)
      it.map { case (term, f) => val id = i; i += 1; (term, f, id) }
    }.toDF("term", "freq", "id")
  }

  /** Deterministic filtered negative sampling over the encoded triple table
    * ([[encodeForEmbedding]]'s output) — the contrastive counterpart every
    * KG-embedding trainer needs: for each positive `(h, r, t)`, corrupt the
    * tail to `t' = mix64(seed ^ (h·P1 + r·P2 + t)) mod |E|` (splitmix64 —
    * the repo-wide deterministic sampling primitive, bit-exact in the
    * DuckDB oracle), and mark whether the corruption collides with a true
    * triple (`is_clean` — "filtered" negative sampling keeps only clean
    * rows; the flag makes the collision rate auditable instead of silently
    * dropping rows).
    *
    * Scale shape: |E| is one scalar aggregate; the corruption is a pure
    * integer projection (no shuffle); the collision check is ONE left join
    * of (h_id, r_id, t_neg) against the positive set on the identical
    * 3-int key — both sides hash-partition on the same key, and the
    * positive side is the same relation, so the exchange is reused. Nothing
    * ever concentrates: the corrupted tail is splitmix-uniform over the
    * entity space by construction.
    */
  def negativeSamples(encoded: DataFrame, seed: Long): DataFrame = {
    val nEnt = encoded
      .select(F.greatest(F.max("h_id"), F.max("t_id")).as("m"))
      .collect()(0).getLong(0) + 1L
    val corrupt = F.udf((h: Long, r: Long, t: Long) =>
      java.lang.Long.remainderUnsigned(
        graft.extract.Synth.mix64(seed ^ (h * 1000003L + r * 7919L + t)), nEnt))
    val cand = encoded.select(F.col("h_id"), F.col("r_id"), F.col("t_id"),
      corrupt(F.col("h_id"), F.col("r_id"), F.col("t_id")).as("t_neg"))
    val pos = encoded.select(F.col("h_id"), F.col("r_id"),
      F.col("t_id").as("t_neg"), F.lit(1).as("hit"))
    cand.join(pos, Seq("h_id", "r_id", "t_neg"), "left")
      .select(F.col("h_id"), F.col("r_id"), F.col("t_id"), F.col("t_neg"),
        F.col("hit").isNull.as("is_clean"))
  }

  /** TransE plausibility scoring under pinned hash embeddings — the
    * eval-prep diagnostic of a KG-embedding pipeline (does the candidate
    * triple score better than its corrupted negative?), made engine-exact:
    * entity/relation vectors are CLOSED-FORM integer grids
    * `emb(id, d) = mix64(seed ^ (id·1000003 + d)) mod 2001 − 1000`
    * (the hash-embedding trick — no parameter table exists anywhere; a
    * production run swaps in trained vectors broadcast the same way), the
    * score is the exact integer L1 distance `Σ_d |h_d + r_d − t_d|`, and
    * the negative is [[negativeSamples]]' splitmix tail corruption, so
    * (score_pos, score_neg, margin) are bit-identical across engines and
    * row orders.
    *
    * Scale shape: a pure per-row projection over the encoded triple
    * relation (embeddings are arithmetic, not data) plus the ONE
    * vocabulary-collision left join negativeSamples already pays — zero
    * additional shuffle at any corpus size.
    */
  def transeScores(
      encoded: DataFrame,
      dim: Int,
      entSeed: Long,
      relSeed: Long,
      negSeed: Long
  ): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    def emb(seed: Long, id: Long, d: Int): Long =
      java.lang.Long.remainderUnsigned(
        graft.extract.Synth.mix64(seed ^ (id * 1000003L + d)), 2001L) - 1000L
    val score = F.udf { (h: Long, r: Long, t: Long) =>
      var s = 0L
      var d = 0
      while (d < dim) {
        s += math.abs(emb(entSeed, h, d) + emb(relSeed, r, d) - emb(entSeed, t, d))
        d += 1
      }
      s
    }
    negativeSamples(encoded, negSeed)
      .withColumn("score_pos", score(F.col("h_id"), F.col("r_id"), F.col("t_id")))
      .withColumn("score_neg", score(F.col("h_id"), F.col("r_id"), F.col("t_neg")))
      .withColumn("margin", F.col("score_neg") - F.col("score_pos"))
  }

  /** Link-prediction evaluation over the encoded triples — the standard
    * KG-embedding benchmark loop (hits@1/3/10, rank sum) under the same
    * pinned closed-form hash embeddings as [[transeScores]], RAW setting
    * (candidates are not filtered against the positive set; the filtered
    * variant adds one semi join per candidate — documented, not needed for
    * an engine-exactness surface). For each triple, `numCands` splitmix
    * tail corruptions are scored by exact integer L1 and the true tail's
    * rank is 1 + #{candidates strictly better, score ties broken by
    * candidate id} — every quantity is an integer, so both engines agree
    * bit-for-bit.
    *
    * Scale shape: one pure projection over the triple relation (the
    * candidate/score loop is arithmetic on constants — no data joins, no
    * explode reaches the shuffle) followed by ONE relation-vocabulary-sized
    * aggregation. The driver-side nEnt lookup is a 1-row max.
    */
  def linkPredictionEval(
      encoded: DataFrame,
      dim: Int,
      entSeed: Long,
      relSeed: Long,
      candSeed: Long,
      numCands: Int
  ): DataFrame = {
    require(dim >= 1 && numCands >= 1, "dim and numCands must be >= 1")
    // NULL-safe on an empty encoded relation (ADVICE r5: max() is NULL there
    // — getLong threw NPE; on empty input the aggregation below is empty and
    // the UDF never evaluates, so the placeholder nEnt is never used)
    val nEnt = encoded
      .select(F.coalesce(F.greatest(F.max("h_id"), F.max("t_id")), F.lit(-1L)).as("m"))
      .collect()(0).getLong(0) + 1L
    def emb(seed: Long, id: Long, d: Int): Long =
      java.lang.Long.remainderUnsigned(
        graft.extract.Synth.mix64(seed ^ (id * 1000003L + d)), 2001L) - 1000L
    val rankU = F.udf { (h: Long, r: Long, t: Long) =>
      def score(tt: Long): Long = {
        var s = 0L
        var d = 0
        while (d < dim) {
          s += math.abs(emb(entSeed, h, d) + emb(relSeed, r, d) - emb(entSeed, tt, d))
          d += 1
        }
        s
      }
      val st = score(t)
      var better = 0L
      var j = 1
      while (j <= numCands) {
        val tc = java.lang.Long.remainderUnsigned(
          graft.extract.Synth.mix64(
            candSeed ^ (h * 1000003L + r * 7919L + t + j * 104729L)), nEnt)
        val sc = score(tc)
        if (sc < st || (sc == st && tc < t)) better += 1
        j += 1
      }
      1L + better
    }
    encoded
      .withColumn("rank", rankU(F.col("h_id"), F.col("r_id"), F.col("t_id")))
      .groupBy("r_id")
      .agg(F.count(F.lit(1)).as("n_triples"),
        F.sum(F.when(F.col("rank") <= 1, 1L).otherwise(0L)).as("hits1"),
        F.sum(F.when(F.col("rank") <= 3, 1L).otherwise(0L)).as("hits3"),
        F.sum(F.when(F.col("rank") <= 10, 1L).otherwise(0L)).as("hits10"),
        F.sum("rank").as("rank_sum"))
  }

  /** FILTERED link-prediction evaluation — the standard benchmark setting
    * ([[linkPredictionEval]] is the raw one): a corruption that happens to
    * form a TRUE triple is excluded from the rank count (it is not an
    * error to rank a real answer above the test answer). The exclusion
    * needs one join against the positive set: candidates explode to
    * `numCands` bare-key rows, left-join positives on (h, r, t_c) — a 1:1
    * keyed join, no fan-out — then the rank aggregation collapses the
    * 16 rows per triple back to one (numCands:1 reduction, map-side
    * partial before its shuffle). Both shuffles carry bare keys + one
    * boolean; scores are arithmetic on constants, never joined data.
    */
  def linkPredictionEvalFiltered(
      encoded: DataFrame,
      dim: Int,
      entSeed: Long,
      relSeed: Long,
      candSeed: Long,
      numCands: Int
  ): DataFrame = {
    require(dim >= 1 && numCands >= 1, "dim and numCands must be >= 1")
    // NULL-safe on empty input — same rationale as [[linkPredictionEval]]
    val nEnt = encoded
      .select(F.coalesce(F.greatest(F.max("h_id"), F.max("t_id")), F.lit(-1L)).as("m"))
      .collect()(0).getLong(0) + 1L
    def emb(seed: Long, id: Long, d: Int): Long =
      java.lang.Long.remainderUnsigned(
        graft.extract.Synth.mix64(seed ^ (id * 1000003L + d)), 2001L) - 1000L
    def score(h: Long, r: Long, tt: Long): Long = {
      var s = 0L
      var d = 0
      while (d < dim) {
        s += math.abs(emb(entSeed, h, d) + emb(relSeed, r, d) - emb(entSeed, tt, d))
        d += 1
      }
      s
    }
    val candsU = F.udf { (h: Long, r: Long, t: Long) =>
      (1 to numCands).map { j =>
        java.lang.Long.remainderUnsigned(
          graft.extract.Synth.mix64(
            candSeed ^ (h * 1000003L + r * 7919L + t + j * 104729L)), nEnt)
      }
    }
    val betterU = F.udf { (h: Long, r: Long, t: Long, tc: Long) =>
      val st = score(h, r, t)
      val sc = score(h, r, tc)
      sc < st || (sc == st && tc < t)
    }
    val cand = encoded
      .select(F.col("h_id"), F.col("r_id"), F.col("t_id"),
        F.explode(candsU(F.col("h_id"), F.col("r_id"), F.col("t_id"))).as("t_c"))
    val pos = encoded.select(F.col("h_id"), F.col("r_id"),
      F.col("t_id").as("t_c"), F.lit(1).as("is_pos"))
    cand
      .join(pos, Seq("h_id", "r_id", "t_c"), "left")
      .withColumn("counted",
        (F.col("is_pos").isNull || F.col("t_c") === F.col("t_id")) &&
          betterU(F.col("h_id"), F.col("r_id"), F.col("t_id"), F.col("t_c")))
      .groupBy("h_id", "r_id", "t_id")
      .agg((F.sum(F.when(F.col("counted"), 1L).otherwise(0L)) + 1L).as("rank"))
      .groupBy("r_id")
      .agg(F.count(F.lit(1)).as("n_triples"),
        F.sum(F.when(F.col("rank") <= 1, 1L).otherwise(0L)).as("hits1"),
        F.sum(F.when(F.col("rank") <= 3, 1L).otherwise(0L)).as("hits3"),
        F.sum(F.when(F.col("rank") <= 10, 1L).otherwise(0L)).as("hits10"),
        F.sum("rank").as("rank_sum"))
  }

  /** k-core decomposition by fixed-round peeling over the undirected entity
    * graph (self-loops dropped, parallel edges collapsed): each round
    * removes every node whose degree in the SURVIVING subgraph is below `k`,
    * and `rounds` is fixed so the oracle can unroll the identical
    * iterations (the PageRank engine-exactness contract; on this corpus the
    * peel converges well inside the budget and the spec pins the fixed
    * point). Output: nodes still standing after `rounds` peels, with their
    * final within-core degree.
    *
    * Scale shape: one distinct-edge materialization (`localCheckpoint`ed,
    * reused every round); each round is an algebraic degree count plus two
    * semi joins of the edge relation against the shrinking survivor set —
    * the survivor side only ever shrinks, a hub's fan-out streams through
    * the 1:N join, and no per-node window exists anywhere.
    */
  /** Deterministic DeepWalk-style random-walk corpus over the encoded
    * entity graph ([[encodeForEmbedding]]'s dense ids) — the
    * sequence-generation stage of DeepWalk/node2vec KG-embedding training,
    * made engine-exact: one walk starts at every node with out-edges, and
    * step `t` moves from `cur` to
    * `nbrs[ mix64(seed ^ (cur·1000003 + start·7919 + t)) mod deg ]`
    * (splitmix64 — the repo-wide deterministic sampling primitive, bit-exact
    * in the DuckDB oracle), where `nbrs` is the SORTED distinct out-neighbor
    * array capped to the `maxDeg` smallest tail ids. Walks are fully
    * reproducible from `(seed, start)` — re-running the corpus generation
    * yields byte-identical training sequences, which is what makes embedding
    * runs comparable across pipeline versions. A walk ends early at a sink
    * (no out-edges). Output: one row per visited position,
    * `(start_id, step, node_id)` with step 0 = the start itself.
    *
    * Scale shape: the degree cap is [[graft.operators.BoundedRank]] — a
    * bounded partial aggregation, so a 10^6-out-degree hub collapses to
    * maxDeg rows map-side and the adjacency relation is node-sized with
    * ≤ maxDeg-wide arrays (the cap is part of the operator CONTRACT, not a
    * sampling artifact — determinism survives it). Each step is ONE
    * equi-join of the walk frontier (1:1 per walk row) against the
    * node-sized adjacency (AQE broadcasts it when it fits); no window, no
    * per-walk state, no driver-side iteration over data.
    */
  def randomWalks(
      encoded: DataFrame,
      seed: Long,
      len: Int,
      maxDeg: Int
  ): DataFrame = {
    require(len >= 1 && maxDeg >= 1, "len and maxDeg must be >= 1")
    val edges = encoded
      .select(F.col("h_id").as("src"), F.col("t_id").as("dst"))
      .distinct()
    val capped = graft.operators.BoundedRank.bottomKPerKey(
      edges, Seq("src"), F.col("dst"), F.col("dst"), maxDeg)
    val adj = capped.groupBy("src")
      .agg(F.sort_array(F.collect_list("id")).as("nbrs"))
      .localCheckpoint()
    val pick = F.udf { (cur: Long, start: Long, t: Int, deg: Int) =>
      java.lang.Long.remainderUnsigned(
        graft.extract.Synth.mix64(seed ^ (cur * 1000003L + start * 7919L + t)),
        deg.toLong).toInt
    }
    var frontier = adj.select(F.col("src").as("start_id"), F.col("src").as("node_id"))
    var out = frontier.withColumn("step", F.lit(0))
    for (t <- 1 to len) {
      // checkpoint each frontier (r6): step t feeds BOTH the output union
      // and step t+1 — un-materialized, the final union re-derived step 1
      // `len` times and step 2 `len-1` times (triangular recompute of the
      // walk joins); with the checkpoint every step's join runs exactly once
      val nxt = frontier
        .join(adj, frontier("node_id") === adj("src"))
        .select(F.col("start_id"),
          F.element_at(F.col("nbrs"),
            pick(F.col("node_id"), F.col("start_id"), F.lit(t),
              F.size(F.col("nbrs"))) + 1).as("node_id"))
        .localCheckpoint(true)
      out = out.unionByName(nxt.withColumn("step", F.lit(t)))
      frontier = nxt
    }
    out.select(F.col("start_id"), F.col("step"), F.col("node_id"))
  }

  def kCore(triples: DataFrame, k: Long, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val eu = triples
      .filter(F.col("sKind").isin(NodeKinds: _*) &&
        F.col("oKind").isin(NodeKinds: _*) && F.col("s") =!= F.col("o"))
      .select(F.least(F.col("s"), F.col("o")).as("a"),
        F.greatest(F.col("s"), F.col("o")).as("b"))
      .distinct().localCheckpoint()
    var edges = eu
    var deg: DataFrame = null
    for (_ <- 1 to rounds) {
      deg = edges.select(F.col("a").as("node"))
        .union(edges.select(F.col("b").as("node")))
        .groupBy("node").agg(F.count(F.lit(1)).as("deg"))
      val keep = deg.filter(F.col("deg") >= k).select("node")
      edges = edges
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .localCheckpoint()
    }
    // final degree within the surviving subgraph, re-thresholded (the last
    // peel may have dropped neighbors of still-listed nodes)
    edges.select(F.col("a").as("node"))
      .union(edges.select(F.col("b").as("node")))
      .groupBy("node").agg(F.count(F.lit(1)).as("deg"))
      .filter(F.col("deg") >= k)
  }

  /** Community detection by synchronous label propagation (LPA) over the
    * undirected entity graph — the clustering pass KG curation runs after
    * the structural measurements (degrees, triangles, k-core): entities that
    * sit inside the same densely-linked region converge to one label, which
    * becomes the community key for per-community sampling, spam-farm
    * excision and topic-balanced corpus mixing.
    *
    * Semantics, fully deterministic (the asynchronous/random-order LPA of
    * the original paper is not reproducible across engines; this is the
    * synchronous variant with a total-order tiebreak): every edge-connected
    * node starts with its own term as label; each round, every node
    * simultaneously adopts the most frequent label among its neighbors'
    * CURRENT labels, ties broken by the lexicographically smallest label.
    * `rounds` is fixed so the oracle can unroll the identical iterations
    * (the PageRank engine-exactness contract). Output: `(node, lbl)`.
    *
    * Scale shape: the bidirectional neighbor relation is materialized once
    * (`localCheckpoint`; reliable checkpoint on a cluster) and reused every
    * round; a round is one shuffle join on the neighbor key (a celebrity
    * node's 10^9 incident rows stream through the 1:N join — AQE skew split
    * applies) followed by an algebraic `count` on (node, label) and an
    * algebraic struct-min argmax on node — both collapse map-side, so no
    * per-node window and no single-reducer label lists exist anywhere.
    */
  def labelPropagation(triples: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val eu = triples
      .filter(F.col("sKind").isin(NodeKinds: _*) &&
        F.col("oKind").isin(NodeKinds: _*) && F.col("s") =!= F.col("o"))
      .select(F.least(F.col("s"), F.col("o")).as("a"),
        F.greatest(F.col("s"), F.col("o")).as("b"))
      .distinct()
    val nb = eu.select(F.col("a").as("u"), F.col("b").as("v"))
      .union(eu.select(F.col("b").as("u"), F.col("a").as("v")))
      .localCheckpoint()
    var labels = nb.select(F.col("u").as("node")).distinct()
      .select(F.col("node"), F.col("node").as("lbl"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val cnt = nb
        .join(labels.withColumnRenamed("node", "v"), "v")
        .groupBy("u", "lbl").agg(F.count(F.lit(1)).as("c"))
      // argmax by (count desc, label asc) as an algebraic struct-MIN over
      // (-count, label) — partial-aggregates map-side, never a window
      labels = cnt
        .groupBy(F.col("u").as("node"))
        .agg(F.min(F.struct((-F.col("c")).as("nc"), F.col("lbl").as("l"))).as("m"))
        .select(F.col("node"), F.col("m.l").as("lbl"))
        .localCheckpoint()
    }
    labels
  }

  /** Entity-pair neighborhood Jaccard over the undirected entity graph — the
    * structural-similarity primitive KG curation uses for link prediction
    * and duplicate-entity candidates beyond shared labels: two entities are
    * similar when their neighbor SETS overlap, with
    * `jacc = |N(a)∩N(b)| / (|N(a)| + |N(b)| - |N(a)∩N(b)|)`.
    *
    * Hub cap: a neighbor adjacent to more than `maxDeg` entities is excluded
    * from the graph entirely (degrees AND pair generation — one consistent
    * filtered-graph semantics, mirrored exactly by the oracle). A hub's pair
    * fan-out is quadratic in its degree, and "shares dbpedia:United_States
    * as a neighbor" carries no similarity signal — the same explicit
    * observable-cap contract as the df-capped n-gram index (Dedup).
    *
    * Scale shape: (1) the hub list is ≤ 2m/maxDeg ids — the exclusion is a
    * small anti join (AQE broadcasts it from observed size, the
    * exactDecontaminate precedent); (2) pair generation self-joins the
    * hub-filtered adjacency on the NEIGHBOR key — per-key fan-out is
    * ≤ C(maxDeg, 2) by construction, so no reducer sees an unbounded key;
    * (3) shared-count and degree roll-ups are algebraic sums; (4) the
    * `minShared` filter prunes the long tail of coincidental single-shared
    * pairs before the two degree joins.
    */
  /** Resource-Allocation link-prediction index — the exact-integer
    * counterpart of Adamic-Adar: `RA(u,v) = Σ_{z ∈ N(u)∩N(v)} 1/deg(z)`,
    * scored in integer micro-units (`1000000 div deg(z)` summed exactly, no
    * transcendental log between the engines). High-degree shared neighbors
    * contribute least, so the hub cap that bounds pair generation drops only
    * the near-zero tail of the score — same one-consistent-semantics rule as
    * [[neighborJaccard]] (hubs are excluded from pair generation AND the
    * score on both engine and oracle sides).
    *
    * Scale shape: identical to neighborJaccard — distinct undirected edges,
    * hub-capped inverted adjacency (per-neighbor fan-out ≤ C(maxDeg, 2)),
    * algebraic count + sum roll-up; the per-neighbor weight rides the
    * adjacency row so scoring adds no join.
    */
  def resourceAllocation(
      triples: DataFrame,
      maxDeg: Long = 64L,
      minShared: Long = 2L
  ): DataFrame = {
    val eu = triples
      .filter(F.col("sKind").isin(NodeKinds: _*) &&
        F.col("oKind").isin(NodeKinds: _*) && F.col("s") =!= F.col("o"))
      .select(F.least(F.col("s"), F.col("o")).as("a"),
        F.greatest(F.col("s"), F.col("o")).as("b"))
      .distinct()
    val adj = eu.select(F.col("a").as("e"), F.col("b").as("n"))
      .union(eu.select(F.col("b").as("e"), F.col("a").as("n")))
    val nd = adj.groupBy("n").agg(F.count(F.lit(1)).as("dn"))
    val cold = adj.join(nd.filter(F.col("dn") <= maxDeg), "n")
      .withColumn("w", F.expr("1000000 div dn"))
    cold.as("x").join(cold.as("y"),
        F.col("x.n") === F.col("y.n") && F.col("x.e") < F.col("y.e"))
      .groupBy(F.col("x.e").as("e1"), F.col("y.e").as("e2"))
      .agg(F.count(F.lit(1)).as("shared"), F.sum(F.col("x.w")).as("ra_micro"))
      .filter(F.col("shared") >= minShared)
  }

  /** Transitive closure of a subsumption relation (`rdfs:subClassOf` /
    * `rdfs:subPropertyOf`) by pointer squaring: after round r the closure
    * holds every path of length ≤ 2^r, so a hierarchy of depth d needs
    * ⌈log2 d⌉ rounds — 20 rounds cover any ontology a crawl will ever see.
    * Strict closure (no reflexive pairs); DAGs (multiple inheritance,
    * diamonds) are handled by the distinct.
    *
    * Scale shape: this runs over the ONTOLOGY, not the corpus — a schema
    * graph is vocabulary-sized (10^5-10^6 edges for the largest public
    * ontologies), so each squaring round is a small self-join; the result
    * exists to be broadcast against the corpus-sized instance relation
    * ([[rdfsTypeClosure]]). `localCheckpoint` keeps the doubling lineage
    * flat.
    */
  def subClassClosure(subClass: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    var cl = subClass.select(F.col("sub"), F.col("sup")).distinct()
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val step = cl.as("x").join(cl.as("y"), F.col("x.sup") === F.col("y.sub"))
        .select(F.col("x.sub").as("sub"), F.col("y.sup").as("sup"))
      cl = cl.union(step).distinct().localCheckpoint()
    }
    cl.filter(F.col("sub") =!= F.col("sup"))
  }

  /** RDFS type entailment — materialize the inferred `rdf:type` relation:
    * every subject asserted to be of class C is also of every (strict)
    * superclass of C. The KG-construction step that makes "find all
    * Organizations" queries complete without per-query ontology reasoning.
    * Output `(s, cls, is_inferred)` — one row per entailed (subject, class)
    * pair; `is_inferred` is false when the pair is directly asserted
    * (assertion wins when a class is both asserted and derivable).
    *
    * Scale shape: the closure runs on the vocabulary-sized ontology
    * ([[subClassClosure]]) and is explicitly broadcast — the corpus-sized
    * type relation gets ONE map-side hash join and never shuffles for the
    * inference itself; the final distinct/min groups on (s, cls), a key
    * whose per-subject group count is bounded by the ontology depth, and
    * `min` is algebraic so it partial-aggregates map-side.
    */
  def rdfsTypeClosure(
      types: DataFrame,
      subClass: DataFrame,
      rounds: Int
  ): DataFrame = {
    val cl = subClassClosure(subClass, rounds)
    val asserted = types.select(F.col("s"), F.col("cls"),
      F.lit(false).as("inf"))
    val inferred = types
      .join(F.broadcast(cl).withColumnRenamed("sub", "cls"), "cls")
      .select(F.col("s"), F.col("sup").as("cls"), F.lit(true).as("inf"))
    asserted.union(inferred)
      .groupBy("s", "cls")
      .agg(F.min(F.col("inf").cast("int")).cast("boolean").as("is_inferred"))
  }

  /** SHACL-lite cardinality validation: subjects exceeding a declared
    * per-predicate max object cardinality (counting DISTINCT object terms —
    * re-asserting the same statement on many pages is not a violation).
    * Output `(s, p, n_objs, max_card)` for violators only — the QA report a
    * KG build gates a publish on.
    *
    * Scale shape: the constraint table is schema-vocabulary-sized and
    * broadcast; the corpus side pre-dedups (s, p, o) map-side (distinct on
    * the full key partial-aggregates before the exchange), then one
    * algebraic count per (s, p). A celebrity subject with 10^6 distinct
    * values for one predicate is exactly what this op must report, and its
    * count combines map-side — no single-reducer row concentration.
    */
  def constraintViolations(
      triples: DataFrame,
      constraints: Seq[(String, Long)]
  ): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val cons = constraints.toDF("p", "max_card")
    triples
      .join(F.broadcast(cons), "p")
      .select("s", "p", "o", "oKind", "oLang", "oDt", "max_card")
      .distinct()
      .groupBy("s", "p", "max_card")
      .agg(F.count(F.lit(1)).as("n_objs"))
      .filter(F.col("n_objs") > F.col("max_card"))
      .select("s", "p", "n_objs", "max_card")
  }

  /** Dangling-reference QA: IRI object terms never seen as a subject —
    * references into nothing (unfetched pages, typo'd IRIs, external
    * entities), with how often each is referenced. The completeness report
    * that tells a crawl scheduler what to fetch next.
    *
    * Scale shape: the object side pre-aggregates to (iri, n_refs) map-side
    * (algebraic count — a 10^9-reference hub collapses per task); the
    * subject side pre-dedups the same way; the anti join then runs on two
    * vocabulary-sized relations, not the corpus.
    */
  def danglingRefs(triples: DataFrame): DataFrame = {
    val refs = triples.filter(F.col("oKind") === 0)
      .groupBy(F.col("o").as("iri"))
      .agg(F.count(F.lit(1)).as("n_refs"))
    val subjects = triples.filter(F.col("sKind").isin(NodeKinds: _*))
      .select(F.col("s").as("iri")).distinct()
    refs.join(subjects, Seq("iri"), "left_anti")
  }

  /** Source-count fact fusion (truth discovery, Knowledge-Vault shape): for
    * each (subject, functional predicate), elect the object value supported
    * by the most DISTINCT source pages — majority vote over independent web
    * evidence — plus how contested the slot is (`n_values` distinct
    * candidates, `n_total` total supporting pages).
    *
    * Scale shape: the vote count pre-dedups (s, p, o, srcUrl) map-side and
    * counts algebraically (never `count_distinct`'s expand plan); the
    * election is the (-votes, o) struct-min, so a celebrity subject's 10^6
    * evidence rows collapse to one candidate per map task before the
    * shuffle. Never a per-slot window.
    */
  def fuseFacts(triples: DataFrame, predicates: Seq[String]): DataFrame = {
    val votes = triples
      .filter(F.col("p").isin(predicates: _*) && F.col("sKind") === 0)
      .select("s", "p", "o", "oKind", "srcUrl").distinct()
      .groupBy("s", "p", "o", "oKind")
      .agg(F.count(F.lit(1)).as("n_sources"))
    votes
      .groupBy("s", "p")
      .agg(
        F.min(F.struct((-F.col("n_sources")).as("nn"), F.col("o"),
          F.col("oKind"))).as("w"),
        F.count(F.lit(1)).as("n_values"),
        F.sum(F.col("n_sources")).as("n_total"))
      .select(F.col("s"), F.col("p"), F.col("w.o").as("o"),
        (-F.col("w.nn")).as("n_sources"), F.col("n_values"), F.col("n_total"))
  }

  /** Class-instance statistics over the entailed type relation
    * ([[rdfsTypeClosure]] output): per class, total entailed instances and
    * directly-asserted instances — the KG-card table. Input is one row per
    * (s, cls), so both counts are plain algebraic aggregates.
    */
  def typeCounts(entailed: DataFrame): DataFrame =
    entailed.groupBy("cls").agg(
      F.count(F.lit(1)).as("n_total"),
      F.sum(F.when(!F.col("is_inferred"), 1L).otherwise(0L)).as("n_direct"))

  /** Declared-domain QA: IRI subjects using a constrained predicate whose
    * entailed types do NOT include the declared domain class (subjects with
    * no type information at all also violate — truthfully unverifiable).
    * Blank-node subjects are out of scope (no type assertions by
    * construction).
    *
    * Scale shape: the (s, p) usage relation pre-dedups map-side to
    * entity-vocabulary size before any join; the domain table is broadcast;
    * the conformance check is a left-anti join against the entailed type
    * relation on (s, dom_cls) — vocabulary-sized on both sides.
    */
  def domainViolations(
      triples: DataFrame,
      entailed: DataFrame,
      domains: Seq[(String, String)]
  ): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val doms = F.broadcast(domains.toDF("p", "dom_cls"))
    val usage = triples.filter(F.col("sKind") === 0)
      .join(doms, "p")
      .select("s", "p", "dom_cls").distinct()
    val ok = entailed.select(F.col("s"), F.col("cls").as("dom_cls"))
    usage.join(ok, Seq("s", "dom_cls"), "left_anti")
      .select("s", "p", "dom_cls")
  }

  /** Temporal fact intervals — the fact-currency table a recurring crawl
    * maintains: per distinct graph fact (s, p, o) with a predicate in
    * `predicates`, the first/last capture time (epoch millis) and the number
    * of distinct supporting pages. `pages` is the corpus (url, warc_ts).
    *
    * Scale shape: evidence pre-dedups (s, p, o, srcUrl) map-side; the
    * lineage join runs on `srcUrl = url` — unique per page on the pages
    * side, bounded by statements-per-page on the triple side, so no hot
    * key; min/max/count are algebraic, so a celebrity fact's 10^9 capture
    * rows combine per map task.
    */
  def factIntervals(
      triples: DataFrame,
      pages: DataFrame,
      predicates: Seq[String]
  ): DataFrame = {
    val ev = triples
      .filter(F.col("p").isin(predicates: _*) &&
        F.col("sKind") === 0 && F.col("oKind") === 0)
      .select("s", "p", "o", "srcUrl").distinct()
    val ts = pages.select(F.col("url").as("srcUrl"),
      F.unix_millis(F.col("warc_ts")).as("ts_ms"))
    ev.join(ts, "srcUrl")
      .groupBy("s", "p", "o")
      .agg(F.min("ts_ms").as("first_ms"), F.max("ts_ms").as("last_ms"),
        F.count(F.lit(1)).as("n_pages"))
  }

  def neighborJaccard(
      triples: DataFrame,
      maxDeg: Long = 64L,
      minShared: Long = 2L
  ): DataFrame = {
    val eu = triples
      .filter(F.col("sKind").isin(NodeKinds: _*) &&
        F.col("oKind").isin(NodeKinds: _*) && F.col("s") =!= F.col("o"))
      .select(F.least(F.col("s"), F.col("o")).as("a"),
        F.greatest(F.col("s"), F.col("o")).as("b"))
      .distinct()
    val adj = eu.select(F.col("a").as("e"), F.col("b").as("n"))
      .union(eu.select(F.col("b").as("e"), F.col("a").as("n")))
    val hubs = adj.groupBy("n").agg(F.count(F.lit(1)).as("dn"))
      .filter(F.col("dn") > maxDeg).select("n")
    val cold = adj.join(hubs, Seq("n"), "left_anti")
    val deg = cold.groupBy("e").agg(F.count(F.lit(1)).as("d"))
    val pairs = cold.as("x").join(cold.as("y"),
        F.col("x.n") === F.col("y.n") && F.col("x.e") < F.col("y.e"))
      .groupBy(F.col("x.e").as("e1"), F.col("y.e").as("e2"))
      .agg(F.count(F.lit(1)).as("shared"))
      .filter(F.col("shared") >= minShared)
    pairs
      .join(deg.select(F.col("e").as("e1"), F.col("d").as("d1")), "e1")
      .join(deg.select(F.col("e").as("e2"), F.col("d").as("d2")), "e2")
      .select(F.col("e1"), F.col("e2"), F.col("shared"),
        (F.col("shared").cast("double") /
          (F.col("d1") + F.col("d2") - F.col("shared")).cast("double")).as("jacc"))
  }

  /** Predicate-path mining: for every ordered predicate pair (p1, p2), count
    * the length-2 paths `s -p1-> m -p2-> t` in the entity graph plus the
    * number of distinct middle entities carrying them — the AMIE-style
    * composition-rule signal ("director-of ∘ born-in" etc.) and a schema
    * diagnostic beside the exact signature discovery (q_kg_signatures) and
    * the co-occurrence lift (q_kg_pred_lift).
    *
    * Semantics (mirrored exactly by the oracle): edges are the DISTINCT
    * (s, p, o) entity-to-entity statements with self-loops dropped; a middle
    * entity with in-degree or out-degree above `maxMid` is excluded entirely
    * (a hub like dbr:United_States composes every pair of its 10^6 incident
    * predicates at zero signal — the [[neighborJaccard]] observable-cap
    * contract); pairs below `minPaths` total paths prune.
    *
    * Scale shape: (1) edge dedup is the usual map-side-combining distinct;
    * (2) the path join keys on the MIDDLE entity, and the hub cap bounds its
    * fan-out at ≤ maxMid² rows per key, so no reducer sees an unbounded key;
    * (3) the per-(p1,p2,m) pre-aggregation collapses those ≤ maxMid² rows
    * map-side, and the final rollup gets the distinct-mid count as an
    * algebraic `count(*)` over it — never a count_distinct Expand over the
    * path stream; (4) no window anywhere.
    */
  def predPathPairs(
      triples: DataFrame,
      maxMid: Long = 64L,
      minPaths: Long = 2L
  ): DataFrame = {
    val e = triples
      .filter(F.col("sKind").isin(NodeKinds: _*) &&
        F.col("oKind").isin(NodeKinds: _*) && F.col("s") =!= F.col("o"))
      .select("s", "p", "o").distinct()
    val outd = e.groupBy(F.col("s").as("m")).agg(F.count(F.lit(1)).as("outd"))
    val ind = e.groupBy(F.col("o").as("m")).agg(F.count(F.lit(1)).as("ind"))
    val mids = ind.join(outd, "m")
      .filter(F.col("ind") <= maxMid && F.col("outd") <= maxMid)
      .select("m")
    val perMid = e.select(F.col("p").as("p1"), F.col("o").as("m"))
      .join(mids, "m")
      .join(e.select(F.col("s").as("m"), F.col("p").as("p2")), "m")
      .groupBy("p1", "p2", "m").agg(F.count(F.lit(1)).as("n"))
    perMid.groupBy("p1", "p2")
      .agg(F.sum("n").as("n_paths"), F.count(F.lit(1)).as("n_mids"))
      .filter(F.col("n_paths") >= minPaths)
  }

  /** Skolemization (RDF 1.1 §3.5): every blank node becomes a globally
    * unique `/.well-known/genid/` IRI so the graph can merge with other
    * datasets without label capture. Blank labels are DOCUMENT-scoped, so
    * the Skolem id hashes (srcUrl, label) — the same label in two documents
    * gets two IRIs, while every occurrence within one document maps to one
    * (spec-pinned). Output rows carry kind IRI for skolemized positions.
    *
    * Scale shape: a pure column projection (md5 concat inside whole-stage
    * codegen) — zero shuffle at any corpus size.
    */
  def skolemize(triples: DataFrame, authority: String): DataFrame = {
    val base = s"https://$authority/.well-known/genid/"
    def sk(term: org.apache.spark.sql.Column, kind: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      F.when(kind === F.lit(graft.model.Kind.BLANK),
        F.concat(F.lit(base),
          F.md5(F.concat(F.col("srcUrl"), F.lit("|"), term))))
        .otherwise(term)
    def skKind(kind: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      F.when(kind === F.lit(graft.model.Kind.BLANK),
        F.lit(graft.model.Kind.IRI)).otherwise(kind)
    triples.select(
      sk(F.col("s"), F.col("sKind")).as("s"),
      skKind(F.col("sKind")).as("sKind"),
      F.col("p"),
      sk(F.col("o"), F.col("oKind")).as("o"),
      skKind(F.col("oKind")).as("oKind"),
      F.col("oLang"), F.col("oDt"), F.col("srcUrl"))
  }

  /** VoID dataset statistics — the one-row dataset card (void:triples,
    * void:distinctSubjects, void:properties, void:distinctObjects split by
    * node vs literal) a published KG dump ships with its description.
    *
    * Scale shape: each distinct is its own map-side-combining dedup followed
    * by a single-row count — never one aggregate with multiple
    * count(DISTINCT ...) (whose Expand plan multiplies the corpus by the
    * number of distinct clauses); the final assembly cross-joins five
    * one-row relations.
    */
  /** Elementwise max over packed HLL register arrays — the HyperANF merge.
    * Algebraic (commutative + associative + idempotent), so Spark plans it
    * as a partial aggregation: every map task collapses its slice of a
    * node's incoming sketches to ONE 256-byte array before the shuffle —
    * a hub with 10^9 in-edges contributes one array per task, never 10^9
    * rows, to its reducer. `reduce` mutates the buffer in place (the
    * standard Aggregator contract); `zero` allocates fresh per buffer.
    */
  final class RegMaxAgg extends org.apache.spark.sql.expressions.Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    import org.apache.spark.sql.Encoders
    private def mergeInto(b: Array[Byte], a: Array[Byte]): Array[Byte] = {
      var j = 0
      while (j < b.length) {
        if ((a(j) & 0xff) > (b(j) & 0xff)) b(j) = a(j)
        j += 1
      }
      b
    }
    override def zero: Array[Byte] = new Array[Byte](graft.sketch.Sketch.HllM)
    override def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = mergeInto(b, a)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeInto(a, b)
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** HyperANF (Boldi–Vigna, WWW 2011): the per-node neighborhood function
    * N(v, t) — how many nodes lie within <= t hops of v — estimated with one
    * 256-register HLL sketch per node ([[graft.sketch.Sketch]] hash chain:
    * splitmix64 shingle fold, low 8 bits route, 56-bit suffix rank). Round
    * 0 seeds each node's sketch with itself; every round unions each node's
    * sketch with its neighbors' via [[RegMaxAgg]]; after `rounds` rounds the
    * sketch describes exactly the radius-`rounds` ball. This is the
    * canonical way centralities (harmonic, closeness, effective diameter)
    * are computed on web-scale graphs, where exact per-node BFS is
    * Sum(|ball(v)|) rows — quadratic on hubby crawl graphs.
    *
    * Scale shape: state is #nodes x 256 B, the per-round shuffle carries at
    * most one register array per (node, map task) — the elementwise max is
    * algebraic, so map-side combine absorbs hubs — and NO ball is ever
    * materialized on either side of the plan. Contrast [[neighborhood]]
    * (exact, per-seed-set) — HyperANF is the all-nodes variant that stays
    * linear in edges per round.
    *
    * Emitted per node, all derived from the final registers and exactly
    * replicable cross-engine with zero transcendentals:
    *  - `v_zero`: count of untouched registers (the linear-counting input);
    *  - `harm_num`: the EXACT integer 2^57 * Sum_j 2^-rho_j (register
    *    reciprocal mass; order-independent integer sum, no IEEE fold);
    *  - `regs_md5`: digest of the ascending-j "j:rho" register dump;
    *  - `ball_est`: the raw HLL estimate alpha_m * m^2 / harm, where harm
    *    folds ascending-j in a DEFINED IEEE order of exact power-of-two
    *    reciprocals (the [[graft.sketch.Sketch.hllSummary]] technique — the
    *    oracle replays the identical addition sequence, so the double is
    *    bit-identical). Raw estimate, no small-range correction: the
    *    correction's `m ln(m/V)` is a cross-engine transcendental; callers
    *    in that regime have `v_zero` right here (GraphOpsSpec applies it
    *    and pins accuracy against exact ball sizes).
    */
  /** One HyperANF round: each node's sketch absorbs its neighbors' via the
    * algebraic [[RegMaxAgg]]. Package-visible so the plan spec can pin the
    * round's aggregation shape directly (the driving loop localCheckpoints
    * each round, which truncates the visible plan).
    */
  private[graft] def anfRound(state: DataFrame, edges: DataFrame): DataFrame = {
    val regMax = F.udaf(new RegMaxAgg())
    val prop = state.join(edges, state("node") === edges("src"))
      .select(F.col("dst").as("node"), F.col("regs"))
    state.select("node", "regs").union(prop)
      .groupBy("node").agg(regMax(F.col("regs")).as("regs"))
  }

  def hyperAnf(triples: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    val m = graft.sketch.Sketch.HllM
    val dir0 = triples
      .filter(F.col("sKind").isin(NodeKinds: _*) &&
        F.col("oKind").isin(NodeKinds: _*) && F.col("s") =!= F.col("o"))
      .select("s", "o")
    val edges = dir0.union(dir0.select(F.col("o"), F.col("s")))
      .toDF("src", "dst").distinct().localCheckpoint()

    val initUdf = F.udf((n: String) => {
      val a = new Array[Byte](m)
      val (j, rho) = graft.sketch.Sketch.hllRegisterOf(n)
      a(j) = rho.toByte
      a
    })
    var state = edges.select(F.col("src").as("node")).distinct()
      .withColumn("regs", initUdf(F.col("node"))).localCheckpoint()
    var r = 0
    while (r < rounds) {
      r += 1
      state = anfRound(state, edges).localCheckpoint()
    }

    val finishUdf = F.udf((regs: Array[Byte]) => {
      var vZero = 0
      var harmNum = java.math.BigInteger.ZERO
      var harm = 0.0
      val dump = new StringBuilder
      var j = 0
      while (j < m) {
        val rho = regs(j) & 0xff
        if (rho == 0) vZero += 1
        else {
          if (dump.nonEmpty) dump.append(',')
          dump.append(j).append(':').append(rho)
        }
        harmNum = harmNum.add(java.math.BigInteger.ONE.shiftLeft(57 - rho))
        harm += 1.0 / (1L << rho).toDouble
        j += 1
      }
      val est = graft.sketch.Sketch.HllAlpha * (m.toDouble * m.toDouble) / harm
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(dump.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (vZero, harmNum.toString, md5, est)
    })
    state
      .withColumn("fin", finishUdf(F.col("regs")))
      .select(F.col("node"), F.col("fin._1").as("v_zero"),
        F.col("fin._2").as("harm_num"), F.col("fin._3").as("regs_md5"),
        F.col("fin._4").as("ball_est"))
  }

  /** The ANF deliverable [[hyperAnf]] exists for: the neighborhood-function
    * growth curve N(t) — one row per radius t = 0..rounds summarizing every
    * node's sketch at that radius. The curve's saturation point is the
    * graph's effective diameter; its growth rate separates expander-like
    * crawl cores from chain-like link farms. All four statistics are
    * order-free integer aggregates (node count, Sum v_zero, Sum rho, and
    * Sum of the exact register mass mod 2^31-1), so the rollup is ONE
    * algebraic hash aggregation per round over sketch-sized rows — no
    * sort, no single-reducer digest, no float — and any register anywhere
    * changing at any radius moves rho_sum and mass_mod_sum.
    */
  def anfCurve(triples: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    val m = graft.sketch.Sketch.HllM
    val dir0 = triples
      .filter(F.col("sKind").isin(NodeKinds: _*) &&
        F.col("oKind").isin(NodeKinds: _*) && F.col("s") =!= F.col("o"))
      .select("s", "o")
    val edges = dir0.union(dir0.select(F.col("o"), F.col("s")))
      .toDF("src", "dst").distinct().localCheckpoint()
    val initUdf = F.udf((n: String) => {
      val a = new Array[Byte](m)
      val (j, rho) = graft.sketch.Sketch.hllRegisterOf(n)
      a(j) = rho.toByte
      a
    })
    val modP = 2147483647L
    val statUdf = F.udf((regs: Array[Byte]) => {
      var vZero = 0L
      var rhoSum = 0L
      var mass = java.math.BigInteger.ZERO
      var j = 0
      while (j < m) {
        val rho = regs(j) & 0xff
        if (rho == 0) vZero += 1L else rhoSum += rho.toLong
        mass = mass.add(java.math.BigInteger.ONE.shiftLeft(57 - rho))
        j += 1
      }
      (vZero, rhoSum, mass.mod(java.math.BigInteger.valueOf(modP)).longValue)
    })
    def summarize(state: DataFrame, t: Int): DataFrame =
      state.withColumn("st", statUdf(F.col("regs")))
        .agg(F.count(F.lit(1)).as("n_nodes"),
          F.sum("st._1").as("v_zero_sum"),
          F.sum("st._2").as("rho_sum"),
          F.sum("st._3").as("mass_mod_sum"))
        .select(F.lit(t).cast("int").as("t"), F.col("n_nodes"),
          F.col("v_zero_sum"), F.col("rho_sum"), F.col("mass_mod_sum"))
    var state = edges.select(F.col("src").as("node")).distinct()
      .withColumn("regs", initUdf(F.col("node"))).localCheckpoint()
    var out = summarize(state, 0)
    var r = 0
    while (r < rounds) {
      r += 1
      state = anfRound(state, edges).localCheckpoint()
      out = out.union(summarize(state, r))
    }
    out
  }

  /** Per-predicate edge reciprocity over the distinct directed entity graph
    * — the KG-QA signal separating symmetric relations (colleague, knows)
    * from functional/asymmetric ones (birthPlace): for each predicate, the
    * distinct (s, o) edge count, how many of those edges have their exact
    * reverse (o, s) present under the SAME predicate, and the ratio in
    * integer parts-per-million (`n_recip * 10^6 div n_edges` — positive
    * operands, so Spark `div` ≡ DuckDB `//`; no IEEE op on either side).
    *
    * Scale shape: edges pre-dedup to the distinct (p, s, o) relation
    * (vocabulary-pair-bounded, never statement-multiplicity-sized); the
    * reverse check is ONE self equi-join on the full (p, s, o) key — unique
    * on both sides, so no key is ever hot regardless of hub degree — and
    * the per-predicate rollup is algebraic.
    */
  def reciprocity(triples: DataFrame): DataFrame = {
    val e = triples
      .filter(F.col("sKind").isin(NodeKinds: _*) &&
        F.col("oKind").isin(NodeKinds: _*) && F.col("s") =!= F.col("o"))
      .select("p", "s", "o").distinct()
    val rev = e.select(F.col("p"), F.col("o").as("s"), F.col("s").as("o"),
      F.lit(1).as("hit"))
    e.join(rev, Seq("p", "s", "o"), "left")
      .groupBy("p")
      .agg(F.count(F.lit(1)).as("n_edges"),
        F.sum(F.when(F.col("hit").isNotNull, 1L).otherwise(0L)).as("n_recip"))
      .withColumn("recip_ppm",
        F.expr("n_recip * 1000000L div n_edges"))
  }

  /** Log2-bucketed total-degree histogram — the KG-card shape statistic
    * (web-graph degree distributions are judged on their log-log slope,
    * and the histogram is the artifact that shows it). Total degree =
    * out + in statements per node ([[entityDegrees]] semantics); bucket =
    * floor(log2(deg)) computed EXACTLY as `length(bin(deg)) - 1` — integer
    * bit-length arithmetic, never a transcendental log between engines.
    *
    * Scale shape: the degree aggregation is algebraic (hubs combine
    * map-side); the histogram re-aggregates the node-sized relation into
    * ~64 buckets — nothing is ever sorted, no reducer sees a full group.
    */
  def degreeDistribution(triples: DataFrame): DataFrame =
    entityDegrees(triples)
      .select((F.col("out_deg") + F.col("in_deg")).as("deg"))
      .withColumn("bucket", (F.length(F.bin(F.col("deg"))) - 1).cast("long"))
      .groupBy("bucket")
      .agg(F.count(F.lit(1)).as("n_nodes"),
        F.min("deg").as("min_deg"),
        F.max("deg").as("max_deg"),
        F.sum("deg").as("sum_deg"))

  /** Degree-assortativity moment sums over the distinct directed entity
    * graph: for every edge (s, o), x = total degree of s, y = total degree
    * of o; emits ONE row of exact BIGINT sums (n_edges, Σx, Σy, Σxy, Σx²,
    * Σy²) — the sufficient statistics of the Pearson degree correlation.
    * The coefficient itself is one IEEE formula away on the consumer side;
    * keeping the emitted values integer makes the result bit-identical
    * across engines and summation orders (the repo's engine-exactness
    * contract — a float correlation could never promise that).
    *
    * Scale shape: the degree table is node-vocabulary-sized and joins the
    * edge relation on each endpoint (AQE broadcasts it when it fits; a
    * hub's fan-out streams through the 1:N join); the final fold is one
    * algebraic aggregation into a single row.
    */
  def assortativitySums(triples: DataFrame): DataFrame = {
    val deg = entityDegrees(triples)
      .select(F.col("node"), (F.col("out_deg") + F.col("in_deg")).as("deg"))
    val e = triples
      .filter(F.col("sKind").isin(NodeKinds: _*) &&
        F.col("oKind").isin(NodeKinds: _*) && F.col("s") =!= F.col("o"))
      .select("s", "o").distinct()
    e.join(deg.select(F.col("node").as("s"), F.col("deg").as("dx")), "s")
      .join(deg.select(F.col("node").as("o"), F.col("deg").as("dy")), "o")
      .agg(F.count(F.lit(1)).as("n_edges"),
        F.sum("dx").as("sum_x"), F.sum("dy").as("sum_y"),
        F.sum(F.col("dx") * F.col("dy")).as("sum_xy"),
        F.sum(F.col("dx") * F.col("dx")).as("sum_x2"),
        F.sum(F.col("dy") * F.col("dy")).as("sum_y2"))
  }

  def voidStats(triples: DataFrame): DataFrame = {
    def c1(df: DataFrame, name: String): DataFrame =
      df.select(F.count(F.lit(1)).as(name))
    val nT = c1(triples, "n_triples")
    val nS = c1(triples.select("s").distinct(), "n_subjects")
    val nP = c1(triples.select("p").distinct(), "n_predicates")
    val nO = c1(triples.filter(F.col("oKind").isin(NodeKinds: _*))
      .select("o").distinct(), "n_node_objects")
    val nL = c1(triples.filter(!F.col("oKind").isin(NodeKinds: _*))
      .select("o", "oKind", "oLang", "oDt").distinct(), "n_literals")
    nT.crossJoin(nS).crossJoin(nP).crossJoin(nO).crossJoin(nL)
  }
}
