package graft.queries

import graft.extract.Dict

/** DuckDB oracle SQL for the q_kg_* queries — full value-level replication of
  * the KG-construction path (synthesized pages -> mentions -> OpenIE triples
  * -> namespace summary) from first principles.
  *
  * [[graft.extract.Synth]] derives every page field from `(seed=42, id)` via
  * splitmix64, so the oracle regenerates the identical page specs in SQL
  * (HUGEINT mod-2^64 arithmetic from [[HashSql]]) over ids scaled from the
  * `documents` table (`id = doc_id * 4 + j, j < 4` — contiguous `0..4N-1`,
  * so the corpus grows with the scale factor). Mention offsets and extraction
  * rules are closed-form for this page family: every sentence shape is pinned
  * (`Synth.pageSpec`), the dictionary is closed ([[Dict]]), and the entity/
  * relation CASE expressions below are GENERATED from the same [[Dict]] the
  * engine uses, so the two sides cannot drift.
  *
  * Linking semantics replicated (cf. `Mentions.link`, `OpenIE.extract`):
  * mentions link against WHOLE-PAGE words (Mercury pages score 0.6+0.5*2 on
  * the planet branch, 0.4+0.5*2 on the metal branch), while OpenIE links
  * per-sentence (no context words in any relation/attribute sentence, so
  * Mercury always resolves to the higher-prior planet entity there).
  */
object KgSql {

  private val Two64 = "18446744073709551616"
  private val Two63 = "9223372036854775808"

  /** floorMod of a HUGEINT u64 column through signed-long reinterpretation
    * (mirror of Synth.pick's `((r % n) + n).toInt % n`).
    */
  private def fm(h: String, n: Int): String =
    s"CAST((((CASE WHEN $h >= $Two63 THEN $h - $Two64 ELSE $h END) % $n + $n) % $n) AS INT)"

  private def values(xs: Seq[String]): String =
    xs.zipWithIndex.map { case (x, i) => s"($i, '$x')" }.mkString(", ")

  private val mercury = Dict.entities("Mercury")
  private val planetIri = mercury.maxBy(_.prior).iri
  private val elementIri = mercury.minBy(_.prior).iri

  /** Entity IRI of a surface column; `mercuryExpr` supplies the
    * context-disambiguated IRI for the one ambiguous surface.
    */
  private def iriCase(surf: String, mercuryExpr: String): String = {
    val whens = Dict.entities.toSeq.sortBy(_._1).collect {
      case (s, cands) if s != "Mercury" => s"WHEN '$s' THEN '${cands.head.iri}'"
    }.mkString(" ")
    s"(CASE $surf $whens WHEN 'Mercury' THEN $mercuryExpr END)"
  }

  private def predCase(phrase: String): String = {
    val whens = Dict.relations.toSeq.sortBy(_._1)
      .map { case (ph, iri) => s"WHEN '$ph' THEN '$iri'" }.mkString(" ")
    s"(CASE $phrase $whens END)"
  }

  /** Mercury link scores with whole-page context (ctx sentence contributes 2
    * context-word hits to its branch's candidate). Emitted via Scala Double
    * arithmetic + shortest round-trip formatting so DuckDB parses back the
    * bit-identical IEEE value the engine computes.
    */
  private def dbl(d: Double): String = s"CAST('${d.toString}' AS DOUBLE)"
  private val planetScore = dbl(mercury.maxBy(_.prior).prior + 0.5 * 2)
  private val elementScore = dbl(mercury.minBy(_.prior).prior + 0.5 * 2)
  private val plainScore = dbl(0.9)

  /** Shared CTE chain: ids -> splitmix page spec -> relation sentences.
    * Columns: pg(id, ti, nrel, year, mb, topic, url), rels(id, k, phrase, obj).
    * `mb = 0` is the Mercury planet branch (`h(seed,id,4) % 2 == 0`).
    */
  val pagesCtes: String = {
    val hb = HashSql.mix64(s"CAST(xor(CAST(42 AS BIGINT), CAST(id AS BIGINT)) AS HUGEINT)")
    def hk(k: String) = HashSql.mix64(s"((hb + $k) % $Two64)")
    s"""ids AS (SELECT doc_id * 4 + u.j AS id FROM documents, UNNEST([0,1,2,3]) AS u(j)),
       |base AS (SELECT id, $hb AS hb FROM ids),
       |hh AS (SELECT id, hb, ${hk("1")} AS h1, ${hk("2")} AS h2,
       |              ${hk("3")} AS h3, ${hk("4")} AS h4 FROM base),
       |topics (ti, topic) AS (VALUES ${values(Dict.topics)}),
       |phr (pi, phrase) AS (VALUES ${values(Dict.relationPhrases)}),
       |objs (oi, obj) AS (VALUES ${values(Dict.objects)}),
       |pg0 AS (SELECT id, ${fm("h1", Dict.topics.size)} AS ti,
       |               2 + ${fm("h2", 3)} AS nrel,
       |               1800 + ${fm("h3", 200)} AS year,
       |               ${fm("h4", 2)} AS mb
       |        FROM hh),
       |pg AS (SELECT pg0.*, t.topic,
       |         'https://pages.example.com/wiki/' || replace(t.topic, ' ', '_')
       |           || '/' || pg0.id AS url
       |       FROM pg0 JOIN topics t USING (ti)),
       |relh AS (SELECT p.id, u.k, ${hk("10 + u.k")} AS hp, ${hk("20 + u.k")} AS ho
       |         FROM pg p JOIN base USING (id), UNNEST([0,1,2,3]) AS u(k)
       |         WHERE u.k < p.nrel),
       |relk AS (SELECT id, k, ${fm("hp", Dict.relationPhrases.size)} AS pi,
       |                ${fm("ho", Dict.objects.size)} AS oi FROM relh),
       |rels AS (SELECT r.id, r.k, ph.phrase, ob.obj
       |         FROM relk r JOIN phr ph USING (pi) JOIN objs ob USING (oi))""".stripMargin
  }

  /** Oracle for Queries.kgMentions: detection offsets are closed-form from the
    * pinned line shapes (title; nrel relation lines; born; abstract; someone),
    * with starts from a cumulative line-length window.
    */
  val mentionsSql: String = {
    val mercIri = s"(CASE WHEN mb = 0 THEN '$planetIri' ELSE '$elementIri' END)"
    // NOTE: composed strings concatenate PRE-stripped chunks — applying
    // stripMargin to a string that embeds already-stripped SQL would re-strip
    // at any interior `||` operator.
    s"WITH $pagesCtes,\n" +
    s"""lines AS (
       |  SELECT id, 0 AS idx, len(topic) AS ll FROM pg
       |  UNION ALL
       |  SELECT r.id, r.k + 1, len(p.topic) + len(r.phrase) + len(r.obj) + 3
       |    FROM rels r JOIN pg p USING (id)
       |  UNION ALL SELECT id, nrel + 1, len(topic) + 18 FROM pg
       |  UNION ALL SELECT id, nrel + 2, len(topic) + 23 + len(CAST(id AS VARCHAR)) FROM pg
       |  UNION ALL SELECT id, nrel + 3, len(topic) + 15 FROM pg),
       |offs AS (
       |  SELECT id, idx, COALESCE(sum(ll + 1) OVER (PARTITION BY id ORDER BY idx
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS soff
       |  FROM lines),
       |m AS (
       |  SELECT o.id, p.topic AS surface, o.soff AS s0
       |    FROM offs o JOIN pg p USING (id) WHERE o.idx = 0
       |  UNION ALL
       |  SELECT r.id, p.topic, o.soff
       |    FROM rels r JOIN pg p USING (id) JOIN offs o ON o.id = r.id AND o.idx = r.k + 1
       |  UNION ALL
       |  SELECT r.id, r.obj, o.soff + len(p.topic) + len(r.phrase) + 2
       |    FROM rels r JOIN pg p USING (id) JOIN offs o ON o.id = r.id AND o.idx = r.k + 1
       |  UNION ALL
       |  SELECT o.id, p.topic, o.soff
       |    FROM offs o JOIN pg p USING (id) WHERE o.idx = p.nrel + 1
       |  UNION ALL
       |  SELECT o.id, p.topic, o.soff
       |    FROM offs o JOIN pg p USING (id) WHERE o.idx = p.nrel + 2
       |  UNION ALL
       |  SELECT o.id, p.topic, o.soff + 14
       |    FROM offs o JOIN pg p USING (id) WHERE o.idx = p.nrel + 3)
       |SELECT p.url AS "srcUrl", m.surface,
       |  CAST(m.s0 AS INT) AS "start",
       |  CAST(m.s0 + len(m.surface) AS INT) AS "end",
       |  ${iriCase("m.surface", mercIri)} AS "entityIri",
       |  CASE WHEN m.surface = 'Mercury'
       |       THEN CASE WHEN mb = 0 THEN $planetScore ELSE $elementScore END
       |       ELSE $plainScore END AS score
       |FROM m JOIN pg p USING (id)""".stripMargin
  }

  /** CTE chain producing the exact OpenIE triple multiset (R1-R6). The blank
    * subject label replicates `b{mix64(url.hashCode) & 0xffffff}_1`: Java
    * String.hashCode as a 31-fold with 32-bit wrap (ASCII urls), sign-extended
    * to u64, through the splitmix finalizer.
    */
  val triplesCtes: String = {
    val subj = iriCase("topic", s"'$planetIri'")
    val obj = iriCase("obj", s"'$planetIri'")
    val jh = s"""list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |      list_transform(range(1, len(url) + 1),
       |        i -> CAST(ascii(substr(url, CAST(i AS INT), 1)) AS HUGEINT))),
       |      (h, c) -> (h * 31 + c) % 4294967296)""".stripMargin
    val u64 = s"(CASE WHEN jh >= 2147483648 THEN jh + $Two64 - 4294967296 ELSE jh END)"
    val blank = s"'b' || (${HashSql.mix64(u64)} % 16777216) || '_1'"
    s"$pagesCtes,\n" +
    s"""pgb AS (SELECT pg.*, $jh AS jh FROM pg),
       |tr AS (
       |  SELECT $subj AS s, 0 AS k_s, ${predCase("phrase")} AS p,
       |         $obj AS o, 0 AS k_o, NULL AS lang, NULL AS dt, url
       |    FROM rels JOIN pg USING (id)
       |  UNION ALL
       |  SELECT $subj, 0, '${Dict.dbo}birthYear', CAST(year AS VARCHAR), 4,
       |         NULL, '${Dict.xsd}integer', url FROM pg
       |  UNION ALL
       |  SELECT $subj, 0, '${Dict.dbo}abstract',
       |         topic || ' is described on page ' || id || '.', 2, NULL, NULL, url FROM pg
       |  UNION ALL
       |  SELECT $blank, 1, '${Dict.relations("knows")}', $subj, 0, NULL, NULL, url FROM pgb
       |  UNION ALL
       |  SELECT $subj, 0, '${Dict.rdfs}label', topic, 3, 'en', NULL, url FROM pg
       |  UNION ALL
       |  SELECT $subj, 0, '${Dict.schemaNs}mainEntityOfPage', url, 0, NULL, NULL, url FROM pg)""".stripMargin
  }

  /** Oracle for Queries.kgTriples (column names/case match Triple.toDF). */
  val triplesSql: String =
    s"WITH $triplesCtes\n" +
    s"""SELECT s, CAST(k_s AS TINYINT) AS "sKind", p, o, CAST(k_o AS TINYINT) AS "oKind",
       |  lang AS "oLang", dt AS "oDt", url AS "srcUrl"
       |FROM tr""".stripMargin

  /** Oracle for Queries.kgPropTable: the RDF property-table pivot — per
    * entity subject, one conditional-min column per pinned predicate plus
    * the statement count. Same algebraic shape on both engines.
    */
  val propTableSql: String =
    s"WITH $triplesCtes\n" +
    s"""SELECT s AS subject,
       |  min(CASE WHEN p = '${Dict.dbo}birthYear' THEN o END) AS birth_year,
       |  min(CASE WHEN p = '${Dict.rdfs}label' THEN o END) AS label,
       |  min(CASE WHEN p = '${Dict.schemaNs}mainEntityOfPage' THEN o END) AS page,
       |  CAST(count(*) AS BIGINT) AS n_stmts
       |FROM tr WHERE k_s = 0 GROUP BY 1""".stripMargin

  /** Oracle for Queries.kgSummary: alias-level normalization + group count.
    *
    * The alias CASEs mirror the registry outcome for THIS corpus, which is
    * pinned and scale-stable: the community map resolves dbr/dbo/wd/schema/
    * foaf/rdfs/xsd/example directly, and inference adds exactly
    * `https://pages.example.com/wiki/` (alias `pages`) and
    * `http://kgraft.example.net/res/` (alias `kgraft`) — each domain expands
    * once (single suitable child), deeper levels never fit the maxNs=5 budget
    * (11 per-topic wiki children, 4 per-entity res children), and the
    * fixed-point exit ends round 2 (PipelineSpec + KgOracleSpec pin this).
    */
  /** Shared normalized-statement CTE (predicate IRI retained alongside the
    * namespace keys) — used by [[summarySql]] and [[domainRangeSql]].
    */
  private val normCte: String =
    s"""norm AS (
       |  SELECT p,
       |    CASE WHEN k_s = 1 THEN 'BLANK'
       |         WHEN s LIKE '${Dict.dbr}%' THEN 'dbr'
       |         WHEN s LIKE '${Dict.wd}%' THEN 'wd'
       |         WHEN s LIKE '${Dict.inferNs}%' THEN 'kgraft'
       |         ELSE 'UNKNOWN' END AS s_ns,
       |    CASE WHEN p LIKE '${Dict.dbo}%' THEN 'dbo'
       |         WHEN p LIKE '${Dict.schemaNs}%' THEN 'schema'
       |         WHEN p LIKE '${Dict.foaf}%' THEN 'foaf'
       |         WHEN p LIKE '${Dict.rdfs}%' THEN 'rdfs'
       |         ELSE 'UNKNOWN' END AS p_ns,
       |    CASE WHEN k_o = 2 THEN 'xsd'
       |         WHEN k_o = 3 THEN 'rdf'
       |         WHEN k_o = 4 THEN 'xsd'
       |         WHEN o LIKE '${Dict.dbr}%' THEN 'dbr'
       |         WHEN o LIKE '${Dict.wd}%' THEN 'wd'
       |         WHEN o LIKE 'http://example.org/%' THEN 'example'
       |         WHEN o LIKE '${Dict.inferNs}%' THEN 'kgraft'
       |         WHEN o LIKE 'https://pages.example.com/wiki/%' THEN 'pages'
       |         ELSE 'UNKNOWN' END AS o_ns,
       |    k_o IN (2, 3, 4) AS is_datatype
       |  FROM tr)""".stripMargin

  val summarySql: String =
    s"WITH $triplesCtes,\n$normCte\n" +
    """SELECT s_ns, p_ns, o_ns, is_datatype, count(*) AS occurs
      |FROM norm GROUP BY 1, 2, 3, 4""".stripMargin

  /** Oracle for Queries.kgDomainRange: per-predicate namespace-level
    * domain/range induction — the most frequent subject namespace and object
    * namespace/literal group per predicate IRI, ties broken by namespace
    * name (the engine's algebraic struct-min argmax uses the same
    * (n DESC, ns ASC) order).
    */
  val domainRangeSql: String =
    s"WITH $triplesCtes,\n$normCte,\n" +
    """tot AS (SELECT p, count(*) AS n_stmts FROM norm GROUP BY 1),
      |d AS (SELECT p, s_ns, count(*) AS n FROM norm GROUP BY 1, 2),
      |dr AS (SELECT p, s_ns, n,
      |         row_number() OVER (PARTITION BY p ORDER BY n DESC, s_ns) AS rn
      |       FROM d),
      |r AS (SELECT p, o_ns, count(*) AS n FROM norm GROUP BY 1, 2),
      |rr AS (SELECT p, o_ns, n,
      |         row_number() OVER (PARTITION BY p ORDER BY n DESC, o_ns) AS rn
      |       FROM r)
      |SELECT t.p, CAST(t.n_stmts AS BIGINT) AS n_stmts,
      |  d.s_ns AS domain_ns, CAST(d.n AS BIGINT) AS domain_n,
      |  r.o_ns AS range_ns, CAST(r.n AS BIGINT) AS range_n
      |FROM tot t
      |JOIN (SELECT * FROM dr WHERE rn = 1) d USING (p)
      |JOIN (SELECT * FROM rr WHERE rn = 1) r USING (p)""".stripMargin

  /** Oracle for Queries.kgDegrees (graft.kg.GraphOps.entityDegrees): nodes
    * are IRI/blank terms (k 0/1); out-degree counts ALL outgoing statements
    * (attribute edges included), in-degree only IRI/blank objects; n_preds =
    * distinct outgoing predicates (NULL p from object rows is ignored by
    * count(DISTINCT ...) on both engines).
    */
  val degreesSql: String =
    s"WITH $triplesCtes,\n" +
    s"""dn AS (
       |  SELECT s AS node, 1 AS outc, 0 AS inc, p FROM tr WHERE k_s IN (0, 1)
       |  UNION ALL
       |  SELECT o, 0, 1, NULL FROM tr WHERE k_o IN (0, 1))
       |SELECT node, CAST(sum(outc) AS BIGINT) AS out_deg,
       |  CAST(sum(inc) AS BIGINT) AS in_deg,
       |  CAST(count(DISTINCT p) AS BIGINT) AS n_preds
       |FROM dn GROUP BY 1""".stripMargin

  /** Oracle for Queries.kgReciprocity: distinct (p, s, o) entity edges,
    * same-predicate reverse-edge existence via self left join on the full
    * key, ppm ratio in pure integer arithmetic (`//` ≡ Spark `div` on
    * positive operands).
    */
  val reciprocitySql: String =
    s"WITH $triplesCtes,\n" +
    """e AS (SELECT DISTINCT p, s, o FROM tr
      |      WHERE k_s IN (0, 1) AND k_o IN (0, 1) AND s <> o)
      |SELECT e.p, CAST(count(*) AS BIGINT) AS n_edges,
      |  CAST(sum(CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_recip,
      |  (CAST(sum(CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1000000) // CAST(count(*) AS BIGINT) AS recip_ppm
      |FROM e LEFT JOIN e r ON e.p = r.p AND e.s = r.o AND e.o = r.s
      |GROUP BY e.p""".stripMargin

  /** Oracle for Queries.kgDegreeDist: total degree per node (entityDegrees
    * semantics), bucket = exact integer floor(log2(deg)) via bit length
    * (`length(bin(deg)) - 1` on both engines — no transcendental log).
    */
  val degreeDistSql: String =
    s"WITH $triplesCtes,\n" +
    s"""dn AS (
       |  SELECT s AS node, 1 AS outc, 0 AS inc FROM tr WHERE k_s IN (0, 1)
       |  UNION ALL
       |  SELECT o, 0, 1 FROM tr WHERE k_o IN (0, 1)),
       |dg AS (SELECT node, CAST(sum(outc) + sum(inc) AS BIGINT) AS deg
       |       FROM dn GROUP BY 1)
       |SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_nodes,
       |  CAST(min(deg) AS BIGINT) AS min_deg,
       |  CAST(max(deg) AS BIGINT) AS max_deg,
       |  CAST(sum(deg) AS BIGINT) AS sum_deg
       |FROM dg GROUP BY 1""".stripMargin

  /** Oracle for Queries.kgAssortativity: exact BIGINT moment sums of
    * endpoint total degrees over the distinct directed entity edge set.
    */
  val assortativitySql: String =
    s"WITH $triplesCtes,\n" +
    s"""dn AS (
       |  SELECT s AS node, 1 AS outc, 0 AS inc FROM tr WHERE k_s IN (0, 1)
       |  UNION ALL
       |  SELECT o, 0, 1 FROM tr WHERE k_o IN (0, 1)),
       |dg AS (SELECT node, CAST(sum(outc) + sum(inc) AS BIGINT) AS deg
       |       FROM dn GROUP BY 1),
       |e0 AS (SELECT DISTINCT s, o FROM tr
       |       WHERE k_s IN (0, 1) AND k_o IN (0, 1) AND s <> o)
       |SELECT CAST(count(*) AS BIGINT) AS n_edges,
       |  CAST(sum(dx.deg) AS BIGINT) AS sum_x,
       |  CAST(sum(dy.deg) AS BIGINT) AS sum_y,
       |  CAST(sum(dx.deg * dy.deg) AS BIGINT) AS sum_xy,
       |  CAST(sum(dx.deg * dx.deg) AS BIGINT) AS sum_x2,
       |  CAST(sum(dy.deg * dy.deg) AS BIGINT) AS sum_y2
       |FROM e0
       |JOIN dg dx ON dx.node = e0.s
       |JOIN dg dy ON dy.node = e0.o""".stripMargin

  /** Oracle for Queries.kgPageRank: the 5 fixed-point integer iterations of
    * graft.kg.GraphOps.pageRank unrolled as CTEs. `//` (DuckDB floor
    * division) ≡ Spark `div` (truncation) because every operand is positive;
    * integer sums make each iteration order-independent, so the two engines
    * agree bit-for-bit — see the GraphOps scaladoc for the recurrence.
    */
  val pageRankSql: String = {
    val head = s"WITH $triplesCtes,\n" +
      s"""nd AS (SELECT DISTINCT node FROM (
         |  SELECT s AS node FROM tr WHERE k_s IN (0, 1)
         |  UNION ALL SELECT o FROM tr WHERE k_o IN (0, 1))),
         |e0 AS (SELECT DISTINCT s, o FROM tr WHERE k_s IN (0, 1) AND k_o IN (0, 1)),
         |od AS (SELECT s, CAST(count(*) AS BIGINT) AS outdeg FROM e0 GROUP BY 1),
         |ed AS (SELECT e0.s, e0.o, od.outdeg FROM e0 JOIN od USING (s)),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nd)""".stripMargin
    val steps = (1 to 5).map { i =>
      s"""r$i AS (SELECT nd.node,
         |  CAST(150000 + COALESCE(c.inc, 0) AS BIGINT) AS rank
         |  FROM nd LEFT JOIN (
         |    SELECT ed.o AS node,
         |      CAST(sum((r.rank * 17) // (20 * ed.outdeg)) AS BIGINT) AS inc
         |    FROM ed JOIN r${i - 1} r ON r.node = ed.s GROUP BY 1) c USING (node))""".stripMargin
    }
    (head +: steps).mkString(",\n") + "\nSELECT node, rank FROM r5"
  }

  /** Oracle for Queries.kgPprDbr: personalized PageRank restarted on the
    * dbr namespace, 3 unrolled integer rounds — same exact recurrence shape
    * as [[pageRankSql]] with the seed CASE in r0 and the teleport term.
    */
  val pprSql: String = {
    val seed = s"node LIKE '${Dict.dbr}%'"
    val head = s"WITH $triplesCtes,\n" +
      s"""nd AS (SELECT DISTINCT node FROM (
         |  SELECT s AS node FROM tr WHERE k_s IN (0, 1)
         |  UNION ALL SELECT o FROM tr WHERE k_o IN (0, 1))),
         |e0 AS (SELECT DISTINCT s, o FROM tr WHERE k_s IN (0, 1) AND k_o IN (0, 1)),
         |od AS (SELECT s, CAST(count(*) AS BIGINT) AS outdeg FROM e0 GROUP BY 1),
         |ed AS (SELECT e0.s, e0.o, od.outdeg FROM e0 JOIN od USING (s)),
         |r0 AS (SELECT node,
         |  CAST(CASE WHEN $seed THEN 1000000 ELSE 0 END AS BIGINT) AS rank
         |  FROM nd)""".stripMargin
    val steps = (1 to 3).map { i =>
      s"""r$i AS (SELECT nd.node,
         |  CAST(CASE WHEN $seed THEN 150000 ELSE 0 END
         |       + COALESCE(c.inc, 0) AS BIGINT) AS rank
         |  FROM nd LEFT JOIN (
         |    SELECT ed.o AS node,
         |      CAST(sum((r.rank * 17) // (20 * ed.outdeg)) AS BIGINT) AS inc
         |    FROM ed JOIN r${i - 1} r ON r.node = ed.s GROUP BY 1) c USING (node))""".stripMargin
    }
    (head +: steps).mkString(",\n") + "\nSELECT node, rank FROM r3"
  }

  /** Oracle for Queries.kgTriangles: the naive a<b<c three-way join — the
    * SEMANTIC definition of the triangle set; the engine finds the same set
    * with the degree-ordered orientation (GraphOps.triangleCounts scaladoc).
    */
  val trianglesSql: String =
    s"WITH $triplesCtes,\n" +
    s"""eu AS (SELECT DISTINCT least(s, o) AS a, greatest(s, o) AS b
       |  FROM tr WHERE k_s IN (0, 1) AND k_o IN (0, 1) AND s <> o),
       |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |  FROM eu e1 JOIN eu e2 ON e2.a = e1.b
       |  JOIN eu e3 ON e3.a = e1.a AND e3.b = e2.b),
       |pn AS (SELECT x AS node FROM tri
       |  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
       |SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM pn GROUP BY 1""".stripMargin

  /** Oracle for Queries.kgClustering (GraphOps.clusteringCoefficients):
    * same distinct undirected edge relation; triangles by the canonical
    * a<b<c join; cc in exact integer ppm (`//` ≡ Spark `div` on the
    * non-negative operands).
    */
  val clusteringSql: String =
    s"WITH $triplesCtes,\n" +
    s"""eu AS MATERIALIZED (SELECT DISTINCT least(s, o) AS a, greatest(s, o) AS b
       |  FROM tr WHERE k_s IN (0, 1) AND k_o IN (0, 1) AND s <> o),
       |dg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
       |  SELECT a AS node FROM eu UNION ALL SELECT b FROM eu) GROUP BY 1),
       |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |  FROM eu e1 JOIN eu e2 ON e2.a = e1.b
       |  JOIN eu e3 ON e3.a = e1.a AND e3.b = e2.b),
       |tc AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
       |  SELECT x AS node FROM tri
       |  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri) GROUP BY 1)
       |SELECT dg.node, dg.deg,
       |  CAST(COALESCE(tc.n_tri, 0) AS BIGINT) AS n_tri,
       |  CAST(CASE WHEN dg.deg >= 2
       |    THEN COALESCE(tc.n_tri, 0) * 2000000 // (dg.deg * (dg.deg - 1))
       |    ELSE 0 END AS BIGINT) AS cc_ppm
       |FROM dg LEFT JOIN tc ON tc.node = dg.node""".stripMargin

  /** Oracle for Queries.kgSignatures: per-subject sorted distinct-predicate
    * signature, grouped. ASCII predicates sort identically in both engines;
    * md5 of the comma-joined list is byte-deterministic.
    */
  val signaturesSql: String =
    s"WITH $triplesCtes,\n" +
    s"""sp AS (SELECT DISTINCT s, p FROM tr WHERE k_s IN (0, 1)),
       |sig AS (SELECT s,
       |    md5(string_agg(p, ',' ORDER BY p)) AS sig_md5,
       |    CAST(count(*) AS BIGINT) AS n_preds
       |  FROM sp GROUP BY s)
       |SELECT sig_md5, n_preds,
       |  CAST(count(*) AS BIGINT) AS n_entities,
       |  min(s) AS example
       |FROM sig GROUP BY 1, 2""".stripMargin

  /** Oracle for Queries.kgPredStats: per-predicate cardinality profile
    * (GraphOps.predicateStats); the ratio is one double division of exact
    * longs.
    */
  val predStatsSql: String =
    s"WITH $triplesCtes,\n" +
    s"""pst AS (SELECT s, p, o FROM tr WHERE k_s IN (0, 1)),
       |tot AS (SELECT p, CAST(count(*) AS BIGINT) AS n_triples FROM pst GROUP BY 1),
       |ns AS (SELECT p, CAST(count(*) AS BIGINT) AS n_subj
       |  FROM (SELECT DISTINCT p, s FROM pst) GROUP BY 1),
       |no AS (SELECT p, CAST(count(*) AS BIGINT) AS n_obj
       |  FROM (SELECT DISTINCT p, o FROM pst) GROUP BY 1)
       |SELECT tot.p, tot.n_triples, ns.n_subj, no.n_obj,
       |  CAST(ns.n_subj AS DOUBLE) / CAST(tot.n_triples AS DOUBLE) AS functionality
       |FROM tot JOIN ns USING (p) JOIN no USING (p)""".stripMargin

  /** Oracle for Queries.kgNeighborJaccard: neighborhood Jaccard on the
    * hub-filtered undirected entity graph (neighbors with degree > maxDeg
    * excluded from degrees AND pair generation — one consistent semantics;
    * GraphOps.neighborJaccard scaladoc). jacc is one double division of
    * exact integers — engine-identical.
    */
  def neighborJaccardSql(maxDeg: Long, minShared: Long): String =
    s"WITH $triplesCtes,\n" +
    s"""eu AS (SELECT DISTINCT least(s, o) AS a, greatest(s, o) AS b
       |  FROM tr WHERE k_s IN (0, 1) AND k_o IN (0, 1) AND s <> o),
       |adj AS (SELECT a AS e, b AS n FROM eu UNION ALL SELECT b, a FROM eu),
       |nd AS (SELECT n, count(*) AS dn FROM adj GROUP BY 1),
       |cold AS (SELECT adj.e, adj.n FROM adj JOIN nd USING (n)
       |  WHERE nd.dn <= $maxDeg),
       |dg AS (SELECT e, count(*) AS d FROM cold GROUP BY 1),
       |pr AS (SELECT x.e AS e1, y.e AS e2, count(*) AS shared
       |  FROM cold x JOIN cold y ON y.n = x.n AND x.e < y.e
       |  GROUP BY 1, 2 HAVING count(*) >= $minShared)
       |SELECT pr.e1, pr.e2, CAST(pr.shared AS BIGINT) AS shared,
       |  CAST(pr.shared AS DOUBLE) /
       |    CAST(d1.d + d2.d - pr.shared AS DOUBLE) AS jacc
       |FROM pr JOIN dg d1 ON d1.e = pr.e1 JOIN dg d2 ON d2.e = pr.e2""".stripMargin

  /** Oracle for Queries.kgResourceAlloc: Resource-Allocation index in exact
    * integer micro-units over the same hub-filtered undirected graph as
    * [[neighborJaccardSql]] — `1000000 // deg(z)` summed per shared
    * neighbor; no IEEE op at all, both engines sum identical longs.
    */
  def resourceAllocSql(maxDeg: Long, minShared: Long): String =
    s"WITH $triplesCtes,\n" +
    s"""eu AS (SELECT DISTINCT least(s, o) AS a, greatest(s, o) AS b
       |  FROM tr WHERE k_s IN (0, 1) AND k_o IN (0, 1) AND s <> o),
       |adj AS (SELECT a AS e, b AS n FROM eu UNION ALL SELECT b, a FROM eu),
       |nd AS (SELECT n, count(*) AS dn FROM adj GROUP BY 1),
       |cold AS (SELECT adj.e, adj.n, 1000000 // nd.dn AS w
       |  FROM adj JOIN nd USING (n) WHERE nd.dn <= $maxDeg)
       |SELECT x.e AS e1, y.e AS e2, CAST(count(*) AS BIGINT) AS shared,
       |  CAST(sum(x.w) AS BIGINT) AS ra_micro
       |FROM cold x JOIN cold y ON y.n = x.n AND x.e < y.e
       |GROUP BY 1, 2 HAVING count(*) >= $minShared""".stripMargin

  /** Oracle for Queries.kgCooccur: unordered same-page entity pairs over the
    * distinct (page, entity) mention projection. mentionsSql is embedded as a
    * pre-stripped subquery (NEVER re-stripMargin'd — see the mentionsSql
    * NOTE); `<` on ASCII IRIs is the same binary order in both engines.
    */
  val cooccurSql: String =
    "WITH pe AS (SELECT DISTINCT \"srcUrl\" AS url, \"entityIri\" AS iri FROM (\n" +
      mentionsSql + "\n) m)\n" +
    s"""SELECT a.iri AS e1, b.iri AS e2, CAST(count(*) AS BIGINT) AS n_pages
       |FROM pe a JOIN pe b ON a.url = b.url AND a.iri < b.iri
       |GROUP BY 1, 2""".stripMargin

  /** Oracle for Queries.elPriors: the Milne-Witten commonness prior per
    * (surface, entity) over the mention stream (mentionsSql embedded as a
    * pre-stripped subquery — see the mentionsSql NOTE). Counts are exact
    * BIGINTs; the prior is the identical single IEEE divide the engine
    * performs (DOUBLE/DOUBLE of two exact longs).
    */
  val elPriorSql: String =
    "WITH pair AS (\n" +
    "  SELECT surface, \"entityIri\" AS entity_iri, count(*) AS n\n" +
    "  FROM (\n" + mentionsSql + "\n) m GROUP BY 1, 2),\n" +
    s"""tot AS (SELECT surface, sum(n) AS ns, count(*) AS ne FROM pair GROUP BY 1)
       |SELECT p.surface, p.entity_iri, CAST(p.n AS BIGINT) AS n,
       |  CAST(t.ns AS BIGINT) AS n_surface, CAST(t.ne AS BIGINT) AS n_entities,
       |  CAST(p.n AS DOUBLE) / CAST(t.ns AS DOUBLE) AS prior
       |FROM pair p JOIN tot t USING (surface)""".stripMargin

  /** Shared CTE list for the sameAs-closure queries: distinct label↔entity
    * pairs from the mention relation (embedded as a pre-stripped subquery —
    * see the mentionsSql NOTE), per-label min-entity star edges, and the
    * recursive transitive closure with min-of-component canon — the SEMANTIC
    * definition GraphOps.resolveByLabel's pointer-jumping CC must equal.
    */
  private val sameAsCtes: String =
    "pe AS (SELECT DISTINCT surface AS label, \"entityIri\" AS entity FROM (\n" +
      mentionsSql + "\n) mm),\n" +
    s"""reps AS (SELECT label, min(entity) AS rep FROM pe GROUP BY 1),
       |edges AS (
       |  SELECT entity AS a, rep AS b FROM pe JOIN reps USING (label)
       |    WHERE entity <> rep
       |  UNION
       |  SELECT rep AS a, entity AS b FROM pe JOIN reps USING (label)
       |    WHERE entity <> rep),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b),
       |comp AS (SELECT a, min(b) AS mb FROM reach GROUP BY 1),
       |canon AS (
       |  SELECT q.entity, least(q.entity, COALESCE(c.mb, q.entity)) AS canon
       |  FROM (SELECT DISTINCT entity FROM pe) q
       |  LEFT JOIN comp c ON c.a = q.entity)""".stripMargin

  /** Oracle for Queries.crawlLatest: newest capture per logical wiki slug.
    * The capture timestamp replicates Synth.pageSpec's
    * `FixedEpochMs + floorMod(h(42, id, 6), 365*24*3600) * 1000`; the engine
    * computes the argmax with an algebraic struct-max, the oracle states the
    * semantics as the (scale-unsafe) per-key window.
    */
  val crawlLatestSql: String = {
    val h6 = HashSql.mix64(s"((hb + 6) % $Two64)")
    s"WITH $pagesCtes,\n" +
    s"""caps AS (SELECT p.id, replace(p.topic, ' ', '_') AS slug, p.url,
       |  1700000000000 + CAST(${fm(h6, 31536000)} AS BIGINT) * 1000 AS ts_ms
       |  FROM pg p JOIN base USING (id)),
       |sel AS (SELECT slug, ts_ms, id, url,
       |  row_number() OVER (PARTITION BY slug ORDER BY ts_ms DESC, id DESC) AS rn
       |  FROM caps)
       |SELECT slug, CAST(ts_ms AS BIGINT) AS ts_ms, CAST(id AS BIGINT) AS id, url
       |FROM sel WHERE rn = 1""".stripMargin
  }

  /** Oracle for Queries.scd2HistoryQ: the same closed-form capture relation
    * as [[crawlLatestSql]], validity intervals as a lead window over
    * (ts_ms, id) per slug.
    */
  val scd2Sql: String = {
    val h6 = HashSql.mix64(s"((hb + 6) % $Two64)")
    s"WITH $pagesCtes,\n" +
    s"""caps AS (SELECT p.id, replace(p.topic, ' ', '_') AS slug,
       |  1700000000000 + CAST(${fm(h6, 31536000)} AS BIGINT) * 1000 AS ts_ms
       |  FROM pg p JOIN base USING (id))
       |SELECT slug, CAST(id AS BIGINT) AS id,
       |  CAST(ts_ms AS BIGINT) AS valid_from,
       |  CAST(lead(ts_ms) OVER (PARTITION BY slug ORDER BY ts_ms, id)
       |    AS BIGINT) AS valid_to,
       |  lead(ts_ms) OVER (PARTITION BY slug ORDER BY ts_ms, id) IS NULL
       |    AS is_current
       |FROM caps""".stripMargin
  }

  /** Oracle for Queries.kgEntityResolve. */
  val entityResolveSql: String =
    s"WITH RECURSIVE $sameAsCtes\nSELECT entity, canon FROM canon"

  /** Oracle for Queries.kgLabels: instance-level label votes rolled up to the
    * sameAs-canonical entity, winner by (votes desc, label asc). The engine
    * computes the election as an algebraic struct-min; the oracle states the
    * semantics as the per-entity window.
    */
  val labelsSql: String =
    s"WITH RECURSIVE $sameAsCtes,\n" +
    // NOTE: mentionsSql is PRE-stripped — concatenate, never re-stripMargin
    // (its interior `||` concat operators would lose a bar).
    "votes AS (\n  SELECT COALESCE(c.canon, m.\"entityIri\") AS canon," +
    " m.surface AS label, count(*) AS votes\n  FROM (\n" + mentionsSql +
    "\n  ) m LEFT JOIN canon c ON c.entity = m.\"entityIri\"\n  GROUP BY 1, 2),\n" +
    s"""sel AS (SELECT canon, label, votes,
       |  row_number() OVER (PARTITION BY canon ORDER BY votes DESC, label) AS rn
       |  FROM votes)
       |SELECT canon, label, CAST(votes AS BIGINT) AS n_mentions
       |FROM sel WHERE rn = 1""".stripMargin

  /** Oracle for Queries.kgSnapshotDiff: two crawl snapshots cut from the same
    * triple table by page-id quarter (old drops quarter 3, new drops quarter
    * 1 — so all four statuses occur), counted per distinct triple and
    * full-outer-joined with null-safe key equality (oLang/oDt are NULL-bearing
    * key columns).
    */
  val snapshotDiffSql: String =
    s"WITH $triplesCtes,\n" +
    s"""wid AS (SELECT tr.*,
       |    CAST(regexp_extract(url, '/([0-9]+)$$', 1) AS BIGINT) AS pid FROM tr),
       |oc AS (SELECT s, k_s, p, o, k_o, lang, dt, CAST(count(*) AS BIGINT) AS old_n
       |       FROM wid WHERE pid % 4 < 3 GROUP BY 1, 2, 3, 4, 5, 6, 7),
       |nc AS (SELECT s, k_s, p, o, k_o, lang, dt, CAST(count(*) AS BIGINT) AS new_n
       |       FROM wid WHERE pid % 4 <> 1 GROUP BY 1, 2, 3, 4, 5, 6, 7)
       |SELECT COALESCE(oc.s, nc.s) AS s,
       |  CAST(COALESCE(oc.k_s, nc.k_s) AS TINYINT) AS "sKind",
       |  COALESCE(oc.p, nc.p) AS p, COALESCE(oc.o, nc.o) AS o,
       |  CAST(COALESCE(oc.k_o, nc.k_o) AS TINYINT) AS "oKind",
       |  COALESCE(oc.lang, nc.lang) AS "oLang", COALESCE(oc.dt, nc.dt) AS "oDt",
       |  COALESCE(oc.old_n, 0) AS old_n, COALESCE(nc.new_n, 0) AS new_n,
       |  CASE WHEN oc.old_n IS NULL THEN 'added'
       |       WHEN nc.new_n IS NULL THEN 'removed'
       |       WHEN oc.old_n = nc.new_n THEN 'kept' ELSE 'changed' END AS status
       |FROM oc FULL OUTER JOIN nc
       |  ON oc.s IS NOT DISTINCT FROM nc.s
       | AND oc.k_s IS NOT DISTINCT FROM nc.k_s
       | AND oc.p IS NOT DISTINCT FROM nc.p
       | AND oc.o IS NOT DISTINCT FROM nc.o
       | AND oc.k_o IS NOT DISTINCT FROM nc.k_o
       | AND oc.lang IS NOT DISTINCT FROM nc.lang
       | AND oc.dt IS NOT DISTINCT FROM nc.dt""".stripMargin

  /** Oracle for Queries.kgNeighborhood: 2-hop undirected BFS from the Mercury
    * planet IRI, min-distance per node, unrolled hop-by-hop (the engine's
    * frontier loop states the same recurrence).
    */
  val neighborhoodSql: String =
    s"WITH $triplesCtes,\n" +
    s"""ed0 AS (SELECT DISTINCT s AS src, o AS dst FROM tr
       |        WHERE k_s IN (0, 1) AND k_o IN (0, 1) AND s <> o),
       |ed AS (SELECT src, dst FROM ed0 UNION SELECT dst, src FROM ed0),
       |d0 AS (SELECT '$planetIri' AS node),
       |d1 AS (SELECT DISTINCT e.dst AS node FROM ed e JOIN d0 ON e.src = d0.node
       |       WHERE e.dst NOT IN (SELECT node FROM d0)),
       |d2 AS (SELECT DISTINCT e.dst AS node FROM ed e JOIN d1 ON e.src = d1.node
       |       WHERE e.dst NOT IN (SELECT node FROM d0 UNION ALL SELECT node FROM d1))
       |SELECT node, 0 AS dist FROM d0
       |UNION ALL SELECT node, 1 AS dist FROM d1
       |UNION ALL SELECT node, 2 AS dist FROM d2""".stripMargin

  /** Oracle for Queries.kgAnf (GraphOps.hyperAnf): the oracle can afford
    * what the engine never materializes — EXACT radius-`rounds` balls per
    * node, unrolled hop by hop over the whitelisted undirected entity edge
    * set — and then rebuilds the per-node HLL registers with the engine's
    * exact hash chain (splitmix64 shingle fold, low-8-bit route, 56-bit
    * suffix rank), digests them, sums the exact integer reciprocal mass
    * `2^57 * Sum 2^-rho_j` (order-independent), and re-derives the raw
    * estimate through the SAME ascending-j IEEE fold of exact power-of-two
    * reciprocals as Sketch.hllSummary — every emitted value bit-identical.
    */
  /** Shared CTE chain for the ANF oracles: whitelisted undirected entity
    * edges, node set, and exact balls b0..b`rounds` unrolled hop by hop.
    */
  private def anfBallCtes(rounds: Int, preds: Seq[String]): String = {
    val predList = preds.map(p => s"'$p'").mkString(", ")
    val balls = (1 to rounds).map { i =>
      val prev = s"b${i - 1}"
      s"""b$i AS (SELECT node, member FROM $prev
         |       UNION
         |       SELECT p.node, e.dst AS member FROM $prev p JOIN ed e ON e.src = p.member)"""
        .stripMargin
    }.mkString(",\n")
    val sep = if (rounds > 0) ",\n" else ""
    s"""ed0 AS (SELECT DISTINCT s AS src, o AS dst FROM tr
       |        WHERE k_s IN (0, 1) AND k_o IN (0, 1) AND s <> o
       |          AND p IN ($predList)),
       |ed AS (SELECT src, dst FROM ed0 UNION SELECT dst, src FROM ed0),
       |nodes AS (SELECT DISTINCT src AS node FROM ed),
       |b0 AS (SELECT node, node AS member FROM nodes),
       |$balls$sep""".stripMargin
  }

  def hyperAnfSql(rounds: Int, preds: Seq[String]): String = {
    val m = graft.sketch.Sketch.HllM
    val alpha = s"CAST('${graft.sketch.Sketch.HllAlpha.toString}' AS DOUBLE)"
    s"WITH $triplesCtes,\n" +
    anfBallCtes(rounds, preds) + "\n" +
    s"""hb AS (SELECT node, ${HashSql.hashShingleSql("member", graft.sketch.Sketch.HllSeed)} AS h
       |       FROM b$rounds),
       |jr AS (SELECT node, CAST(h % $m AS INT) AS j,
       |         CASE WHEN h // $m = 0 THEN 57
       |              ELSE 57 - length(format('{:b}', CAST(h // $m AS BIGINT))) END AS rho
       |       FROM hb),
       |regs AS (SELECT node, j, max(rho) AS m_j FROM jr GROUP BY 1, 2),
       |fullr AS (SELECT n.node, CAST(r.r AS INT) AS j, coalesce(g.m_j, 0) AS mj
       |          FROM nodes n CROSS JOIN (SELECT UNNEST(range(0, $m)) AS r) r
       |          LEFT JOIN regs g ON g.node = n.node AND g.j = r.r),
       |s AS (SELECT node,
       |        CAST(sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS INT) AS v_zero,
       |        CAST(sum(CAST(1 AS BIGINT) << (57 - mj)) AS VARCHAR) AS harm_num,
       |        list_reduce(
       |          list_prepend(CAST(0.0 AS DOUBLE),
       |            list(1.0 / CAST((CAST(1 AS BIGINT) << mj) AS DOUBLE) ORDER BY j)),
       |          (a, b) -> a + b) AS harm
       |      FROM fullr GROUP BY node),
       |dig AS (SELECT node, md5(string_agg(j || ':' || m_j, ',' ORDER BY j)) AS regs_md5
       |        FROM regs GROUP BY node)
       |SELECT s.node, s.v_zero, s.harm_num, dig.regs_md5,
       |  $alpha * ${m.toDouble * m.toDouble} / s.harm AS ball_est
       |FROM s JOIN dig ON dig.node = s.node""".stripMargin
  }

  /** Oracle for Queries.kgAnfCurve (GraphOps.anfCurve): first-appearance
    * radius per exact (node, member) pair (min over the tagged unrolled
    * balls), registers at every radius t from pairs with first_t <= t,
    * then the same four order-free integer aggregates — the per-node
    * register mass folds the absent-register 2^57 terms in closed form
    * (`(m - n_present) * 2^57`), so no 256-way expansion is needed.
    */
  def anfCurveSql(rounds: Int, preds: Seq[String]): String = {
    val m = graft.sketch.Sketch.HllM
    val tagged = (0 to rounds)
      .map(t => s"SELECT node, member, $t AS t FROM b$t").mkString("\n  UNION ALL\n  ")
    s"WITH $triplesCtes,\n" +
    anfBallCtes(rounds, preds) + "\n" +
    s"""tagged AS (
       |  $tagged),
       |minr AS (SELECT node, member, min(t) AS first_t FROM tagged GROUP BY 1, 2),
       |hb AS (SELECT node, first_t,
       |         ${HashSql.hashShingleSql("member", graft.sketch.Sketch.HllSeed)} AS h
       |       FROM minr),
       |jr AS (SELECT node, first_t, CAST(h % $m AS INT) AS j,
       |         CASE WHEN h // $m = 0 THEN 57
       |              ELSE 57 - length(format('{:b}', CAST(h // $m AS BIGINT))) END AS rho
       |       FROM hb),
       |rt AS (SELECT tt.t, jr.node, jr.j, max(jr.rho) AS m_j
       |       FROM jr JOIN (SELECT UNNEST(range(0, ${rounds + 1})) AS t) tt
       |         ON jr.first_t <= tt.t
       |       GROUP BY 1, 2, 3),
       |pern AS (SELECT t, node, count(*) AS n_present,
       |           CAST(sum(m_j) AS BIGINT) AS rho_s,
       |           CAST((sum(CAST((CAST(1 AS BIGINT) << (57 - m_j)) AS HUGEINT))
       |             + CAST($m - count(*) AS HUGEINT)
       |               * CAST((CAST(1 AS BIGINT) << 57) AS HUGEINT))
       |             % 2147483647 AS BIGINT) AS mass_mod
       |         FROM rt GROUP BY 1, 2)
       |SELECT CAST(t AS INT) AS t, CAST(count(*) AS BIGINT) AS n_nodes,
       |  CAST(sum($m - n_present) AS BIGINT) AS v_zero_sum,
       |  CAST(sum(rho_s) AS BIGINT) AS rho_sum,
       |  CAST(sum(mass_mod) AS BIGINT) AS mass_mod_sum
       |FROM pern GROUP BY t""".stripMargin
  }

  /** Oracle for Queries.kgCanonTriples: triples rewritten through the sameAs
    * closure (IRI terms only), distinct with occurrence counts.
    */
  val canonTriplesSql: String =
    s"WITH RECURSIVE $triplesCtes,\n$sameAsCtes,\n" +
    s"""rw AS (
       |  SELECT
       |    CASE WHEN t.k_s = 0 THEN COALESCE(cs.canon, t.s) ELSE t.s END AS s,
       |    t.k_s, t.p,
       |    CASE WHEN t.k_o = 0 THEN COALESCE(co.canon, t.o) ELSE t.o END AS o,
       |    t.k_o, t.lang, t.dt
       |  FROM tr t
       |  LEFT JOIN canon cs ON cs.entity = t.s
       |  LEFT JOIN canon co ON co.entity = t.o)
       |SELECT s, CAST(k_s AS TINYINT) AS "sKind", p, o,
       |  CAST(k_o AS TINYINT) AS "oKind", lang AS "oLang", dt AS "oDt",
       |  CAST(count(*) AS BIGINT) AS occurs
       |FROM rw GROUP BY 1, 2, 3, 4, 5, 6, 7""".stripMargin

  /** Shared CTE list for the embedding-encode queries: distinct node-node
    * triples, entity/relation dictionaries by (freq desc, term asc) — the
    * oracle assigns ids with window row_number (the SEMANTIC definition);
    * the engine assigns the identical ids with the distributed prefix-sum
    * rank (GraphOps.rankDense scaladoc).
    */
  private val encodeCtes: String =
    s"""et AS (SELECT DISTINCT s, p, o FROM tr
       |       WHERE k_s IN (0, 1) AND k_o IN (0, 1)),
       |ef AS (SELECT term, count(*) AS freq FROM (
       |         SELECT s AS term FROM et UNION ALL SELECT o FROM et) GROUP BY 1),
       |ei AS (SELECT term,
       |         CAST(row_number() OVER (ORDER BY freq DESC, term ASC) - 1 AS BIGINT) AS id
       |       FROM ef),
       |rf AS (SELECT p AS term, count(*) AS freq FROM et GROUP BY 1),
       |ri AS (SELECT term,
       |         CAST(row_number() OVER (ORDER BY freq DESC, term ASC) - 1 AS BIGINT) AS id
       |       FROM rf),
       |enc AS (SELECT he.id AS h_id, ri.id AS r_id, te.id AS t_id,
       |         et.s AS h, et.p AS r, et.o AS t
       |       FROM et JOIN ei he ON he.term = et.s
       |       JOIN ri ON ri.term = et.p
       |       JOIN ei te ON te.term = et.o)""".stripMargin

  /** Oracle for Queries.kgEncode (GraphOps.encodeForEmbedding). */
  val encodeSql: String =
    s"WITH $triplesCtes,\n$encodeCtes\n" +
    "SELECT h_id, r_id, t_id, h, r, t FROM enc"

  /** Oracle for Queries.kgNegatives (GraphOps.negativeSamples, seed 13):
    * tail corruption `mix64(seed ^ (h·1000003 + r·7919 + t)) mod |E|` in
    * bit-exact HUGEINT splitmix64, collision-flagged against the positive
    * set. The mix key is a plain positive BIGINT on both engines (dense ids
    * are far below overflow), so the u64 reinterpretation is the identity.
    */
  def negativesSql(seed: Long): String = {
    val key = s"CAST(h_id * 1000003 + r_id * 7919 + t_id AS HUGEINT)"
    val mixed = HashSql.mix64(HashSql.xor64(key, s"CAST(${java.lang.Long.toUnsignedString(seed)} AS HUGEINT)"))
    s"WITH $triplesCtes,\n$encodeCtes,\n" +
    s"""ne AS (SELECT count(*) AS n FROM ei),
       |cand AS (SELECT h_id, r_id, t_id,
       |    CAST(($mixed) % (SELECT n FROM ne) AS BIGINT) AS t_neg
       |  FROM enc)
       |SELECT c.h_id, c.r_id, c.t_id, c.t_neg,
       |  (p.h_id IS NULL) AS is_clean
       |FROM cand c LEFT JOIN enc p
       |  ON p.h_id = c.h_id AND p.r_id = c.r_id AND p.t_id = c.t_neg""".stripMargin
  }

  /** Oracle for Queries.kgTranse (GraphOps.transeScores): the identical
    * splitmix tail corruption, then per-dimension closed-form hash
    * embeddings expanded over `range(dim)` and folded with an exact integer
    * abs-sum — every value BIGINT, no IEEE op anywhere.
    */
  def transeSql(dim: Int, entSeed: Long, relSeed: Long, negSeed: Long): String = {
    def embE(idExpr: String, seed: Long): String =
      s"(CAST((${HashSql.mix64(HashSql.xor64(
        s"CAST($idExpr * 1000003 + d AS HUGEINT)",
        s"CAST(${java.lang.Long.toUnsignedString(seed)} AS HUGEINT)"))}) % 2001 AS BIGINT) - 1000)"
    val negKey = s"CAST(h_id * 1000003 + r_id * 7919 + t_id AS HUGEINT)"
    val negMixed = HashSql.mix64(HashSql.xor64(negKey,
      s"CAST(${java.lang.Long.toUnsignedString(negSeed)} AS HUGEINT)"))
    s"WITH $triplesCtes,\n$encodeCtes,\n" +
    s"""ne AS (SELECT count(*) AS n FROM ei),
       |cand AS (SELECT h_id, r_id, t_id,
       |    CAST(($negMixed) % (SELECT n FROM ne) AS BIGINT) AS t_neg
       |  FROM enc),
       |cn AS MATERIALIZED (SELECT c.h_id, c.r_id, c.t_id, c.t_neg,
       |    (p.h_id IS NULL) AS is_clean
       |  FROM cand c LEFT JOIN enc p
       |    ON p.h_id = c.h_id AND p.r_id = c.r_id AND p.t_id = c.t_neg),
       |sc AS (SELECT cn.h_id, cn.r_id, cn.t_id, cn.t_neg, cn.is_clean,
       |    CAST(sum(abs(${embE("cn.h_id", entSeed)} + ${embE("cn.r_id", relSeed)}
       |      - ${embE("cn.t_id", entSeed)})) AS BIGINT) AS score_pos,
       |    CAST(sum(abs(${embE("cn.h_id", entSeed)} + ${embE("cn.r_id", relSeed)}
       |      - ${embE("cn.t_neg", entSeed)})) AS BIGINT) AS score_neg
       |  FROM cn CROSS JOIN range($dim) r(d)
       |  GROUP BY 1, 2, 3, 4, 5)
       |SELECT h_id, r_id, t_id, t_neg, is_clean, score_pos, score_neg,
       |  score_neg - score_pos AS margin
       |FROM sc""".stripMargin
  }

  /** Oracle for Queries.kgLinkPred (GraphOps.linkPredictionEval): the
    * identical closed-form embeddings and splitmix candidate stream in
    * HUGEINT, ranks as 1 + strictly-better counts (score asc, candidate-id
    * tiebreak), relation-level hits@k / rank sums — exact integers
    * throughout.
    */
  def linkPredSql(
      dim: Int, entSeed: Long, relSeed: Long,
      candSeed: Long, numCands: Int): String = {
    def embE(idExpr: String, seed: Long): String =
      s"(CAST((${HashSql.mix64(HashSql.xor64(
        s"CAST($idExpr * 1000003 + d AS HUGEINT)",
        s"CAST(${java.lang.Long.toUnsignedString(seed)} AS HUGEINT)"))}) % 2001 AS BIGINT) - 1000)"
    val candKey = s"CAST(h_id * 1000003 + r_id * 7919 + t_id + j * 104729 AS HUGEINT)"
    val candMixed = HashSql.mix64(HashSql.xor64(candKey,
      s"CAST(${java.lang.Long.toUnsignedString(candSeed)} AS HUGEINT)"))
    s"WITH $triplesCtes,\n$encodeCtes,\n" +
    s"""ne AS (SELECT count(*) AS n FROM ei),
       |st AS (SELECT h_id, r_id, t_id,
       |    CAST(sum(abs(${embE("h_id", entSeed)} + ${embE("r_id", relSeed)}
       |      - ${embE("t_id", entSeed)})) AS BIGINT) AS s_true
       |  FROM enc CROSS JOIN range($dim) r(d) GROUP BY 1, 2, 3),
       |cd AS (SELECT h_id, r_id, t_id, j,
       |    CAST(($candMixed) % (SELECT n FROM ne) AS BIGINT) AS t_c
       |  FROM enc CROSS JOIN range(1, ${numCands + 1}) rj(j)),
       |sc AS (SELECT cd.h_id, cd.r_id, cd.t_id, cd.j, cd.t_c,
       |    CAST(sum(abs(${embE("cd.h_id", entSeed)} + ${embE("cd.r_id", relSeed)}
       |      - ${embE("cd.t_c", entSeed)})) AS BIGINT) AS s_c
       |  FROM cd CROSS JOIN range($dim) r(d) GROUP BY 1, 2, 3, 4, 5),
       |rk AS (SELECT sc.h_id, sc.r_id, sc.t_id,
       |    1 + sum(CASE WHEN sc.s_c < st.s_true
       |        OR (sc.s_c = st.s_true AND sc.t_c < sc.t_id)
       |      THEN 1 ELSE 0 END) AS rank
       |  FROM sc JOIN st USING (h_id, r_id, t_id) GROUP BY 1, 2, 3)
       |SELECT r_id, CAST(count(*) AS BIGINT) AS n_triples,
       |  CAST(sum(CASE WHEN rank <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits1,
       |  CAST(sum(CASE WHEN rank <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS hits3,
       |  CAST(sum(CASE WHEN rank <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS hits10,
       |  CAST(sum(rank) AS BIGINT) AS rank_sum
       |FROM rk GROUP BY 1""".stripMargin
  }

  /** Oracle for Queries.kgLinkPredFiltered: [[linkPredSql]] plus the
    * filtered-setting exclusion — corruptions forming TRUE triples (other
    * than the test tail itself) never count against the rank.
    */
  def linkPredFilteredSql(
      dim: Int, entSeed: Long, relSeed: Long,
      candSeed: Long, numCands: Int): String = {
    def embE(idExpr: String, seed: Long): String =
      s"(CAST((${HashSql.mix64(HashSql.xor64(
        s"CAST($idExpr * 1000003 + d AS HUGEINT)",
        s"CAST(${java.lang.Long.toUnsignedString(seed)} AS HUGEINT)"))}) % 2001 AS BIGINT) - 1000)"
    val candKey = s"CAST(h_id * 1000003 + r_id * 7919 + t_id + j * 104729 AS HUGEINT)"
    val candMixed = HashSql.mix64(HashSql.xor64(candKey,
      s"CAST(${java.lang.Long.toUnsignedString(candSeed)} AS HUGEINT)"))
    s"WITH $triplesCtes,\n$encodeCtes,\n" +
    s"""ne AS (SELECT count(*) AS n FROM ei),
       |st AS (SELECT h_id, r_id, t_id,
       |    CAST(sum(abs(${embE("h_id", entSeed)} + ${embE("r_id", relSeed)}
       |      - ${embE("t_id", entSeed)})) AS BIGINT) AS s_true
       |  FROM enc CROSS JOIN range($dim) r(d) GROUP BY 1, 2, 3),
       |cd AS (SELECT h_id, r_id, t_id, j,
       |    CAST(($candMixed) % (SELECT n FROM ne) AS BIGINT) AS t_c
       |  FROM enc CROSS JOIN range(1, ${numCands + 1}) rj(j)),
       |cf AS (SELECT cd.*, (p.h_id IS NOT NULL AND cd.t_c <> cd.t_id)
       |    AS is_filtered
       |  FROM cd LEFT JOIN enc p
       |    ON p.h_id = cd.h_id AND p.r_id = cd.r_id AND p.t_id = cd.t_c),
       |sc AS (SELECT cf.h_id, cf.r_id, cf.t_id, cf.j, cf.t_c, cf.is_filtered,
       |    CAST(sum(abs(${embE("cf.h_id", entSeed)} + ${embE("cf.r_id", relSeed)}
       |      - ${embE("cf.t_c", entSeed)})) AS BIGINT) AS s_c
       |  FROM cf CROSS JOIN range($dim) r(d) GROUP BY 1, 2, 3, 4, 5, 6),
       |rk AS (SELECT sc.h_id, sc.r_id, sc.t_id,
       |    1 + sum(CASE WHEN NOT sc.is_filtered AND (sc.s_c < st.s_true
       |        OR (sc.s_c = st.s_true AND sc.t_c < sc.t_id))
       |      THEN 1 ELSE 0 END) AS rank
       |  FROM sc JOIN st USING (h_id, r_id, t_id) GROUP BY 1, 2, 3)
       |SELECT r_id, CAST(count(*) AS BIGINT) AS n_triples,
       |  CAST(sum(CASE WHEN rank <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits1,
       |  CAST(sum(CASE WHEN rank <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS hits3,
       |  CAST(sum(CASE WHEN rank <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS hits10,
       |  CAST(sum(rank) AS BIGINT) AS rank_sum
       |FROM rk GROUP BY 1""".stripMargin
  }

  /** Oracle for Queries.kgWalks (GraphOps.randomWalks): the deg-capped
    * sorted adjacency re-derived with a window row_number + ordered list,
    * then the fixed walk steps unrolled as CTEs — each step picks
    * `nbrs[mix64(seed ^ (cur·1000003 + start·7919 + t)) mod deg + 1]` in
    * bit-exact HUGEINT splitmix64 (the negativesSql contract: the mix key
    * is a plain positive BIGINT on both engines, so the u64
    * reinterpretation is the identity).
    */
  def walksSql(seed: Long, len: Int, maxDeg: Int): String = {
    def mixed(t: Int): String = HashSql.mix64(HashSql.xor64(
      s"CAST(w.node_id * 1000003 + w.start_id * 7919 + $t AS HUGEINT)",
      s"CAST(${java.lang.Long.toUnsignedString(seed)} AS HUGEINT)"))
    val steps = (1 to len).map { t =>
      s"""w$t AS (SELECT w.start_id,
         |    list_extract(a.nbrs,
         |      CAST((${mixed(t)}) % len(a.nbrs) AS BIGINT) + 1) AS node_id
         |  FROM w${t - 1} w JOIN adj a ON a.src = w.node_id)""".stripMargin
    }.mkString(",\n")
    val sel = (0 to len).map { t =>
      s"SELECT start_id, CAST($t AS INT) AS step, node_id FROM w$t"
    }.mkString("\nUNION ALL ")
    s"WITH $triplesCtes,\n$encodeCtes,\n" +
    s"""ed AS MATERIALIZED (SELECT DISTINCT h_id AS src, t_id AS dst FROM enc),
       |adc AS (SELECT src, dst FROM (
       |  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY dst) AS rn
       |  FROM ed) WHERE rn <= $maxDeg),
       |adj AS MATERIALIZED (SELECT src, list(dst ORDER BY dst) AS nbrs
       |  FROM adc GROUP BY 1),
       |w0 AS (SELECT src AS start_id, src AS node_id FROM adj),
       |$steps
       |$sel""".stripMargin
  }

  /** Oracle for Queries.kgPredLift (GraphOps.predicatePairLift): exact
    * integer counts; `lift` is one IEEE-754 multiply-divide of exact
    * integers in the SAME association order as the engine.
    */
  val predPairLiftSql: String =
    s"WITH $triplesCtes,\n" +
    s"""sp AS MATERIALIZED (SELECT DISTINCT s, p FROM tr WHERE k_s IN (0, 1)),
       |nsub AS (SELECT count(DISTINCT s) AS n FROM sp),
       |mg AS (SELECT p, count(*) AS n FROM sp GROUP BY 1),
       |pr AS (SELECT a.p AS p1, b.p AS p2, count(*) AS n_pair
       |  FROM sp a JOIN sp b ON a.s = b.s AND a.p < b.p GROUP BY 1, 2)
       |SELECT pr.p1, pr.p2, CAST(pr.n_pair AS BIGINT) AS n_pair,
       |  CAST(m1.n AS BIGINT) AS n1, CAST(m2.n AS BIGINT) AS n2,
       |  CAST(pr.n_pair AS DOUBLE) * CAST((SELECT n FROM nsub) AS DOUBLE)
       |    / (CAST(m1.n AS DOUBLE) * CAST(m2.n AS DOUBLE)) AS lift
       |FROM pr JOIN mg m1 ON m1.p = pr.p1 JOIN mg m2 ON m2.p = pr.p2""".stripMargin

  /** Oracle for Queries.kgHits (GraphOps.hits): the fixed integer
    * half-rounds unrolled as CTEs — exact integer sums, max-normalization
    * by `// greatest(max, 1)` on non-negative operands (≡ Spark `div`).
    */
  def hitsSql(rounds: Int): String = {
    val head = s"WITH $triplesCtes,\n" +
      s"""ed AS MATERIALIZED (SELECT DISTINCT s, o FROM tr
         |  WHERE k_s IN (0, 1) AND k_o IN (0, 1)),
         |nd AS MATERIALIZED (SELECT DISTINCT node FROM (
         |  SELECT s AS node FROM ed UNION ALL SELECT o FROM ed)),
         |h0 AS (SELECT node, CAST(1000000 AS HUGEINT) AS hub FROM nd)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""ar$i AS (SELECT nd.node, COALESCE(x.a, 0) AS auth FROM nd LEFT JOIN (
         |    SELECT ed.o AS node, sum(h.hub) AS a
         |    FROM ed JOIN h${i - 1} h ON h.node = ed.s GROUP BY 1) x USING (node)),
         |am$i AS (SELECT greatest(max(auth), 1) AS m FROM ar$i),
         |a$i AS MATERIALIZED (SELECT node,
         |  (auth * 1000000) // (SELECT m FROM am$i) AS auth FROM ar$i),
         |hr$i AS (SELECT nd.node, COALESCE(x.h, 0) AS hub FROM nd LEFT JOIN (
         |    SELECT ed.s AS node, sum(a.auth) AS h
         |    FROM ed JOIN a$i a ON a.node = ed.o GROUP BY 1) x USING (node)),
         |hm$i AS (SELECT greatest(max(hub), 1) AS m FROM hr$i),
         |h$i AS MATERIALIZED (SELECT node,
         |  (hub * 1000000) // (SELECT m FROM hm$i) AS hub FROM hr$i)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"""
         |SELECT h.node, CAST(h.hub AS BIGINT) AS hub, CAST(a.auth AS BIGINT) AS auth
         |FROM h$rounds h JOIN a$rounds a USING (node)""".stripMargin
  }

  /** Oracle for Queries.kgCommunities (GraphOps.labelPropagation): the
    * fixed synchronous LPA rounds unrolled as CTEs. The per-round argmax
    * (most frequent neighbor label, min-label tiebreak) is stated as a
    * window row_number here — the SEMANTIC definition; the engine computes
    * the same argmax as an algebraic struct-min (scale plan).
    */
  def communitiesSql(rounds: Int): String = {
    val head = s"WITH $triplesCtes,\n" +
      s"""eu AS MATERIALIZED (SELECT DISTINCT least(s, o) AS a, greatest(s, o) AS b
         |  FROM tr WHERE k_s IN (0, 1) AND k_o IN (0, 1) AND s <> o),
         |nb AS MATERIALIZED (SELECT a AS u, b AS v FROM eu
         |  UNION ALL SELECT b, a FROM eu),
         |l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM nb)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""cn$i AS (SELECT nb.u, l.lbl, count(*) AS c
         |  FROM nb JOIN l${i - 1} l ON l.node = nb.v GROUP BY 1, 2),
         |l$i AS MATERIALIZED (SELECT u AS node, lbl FROM (
         |  SELECT u, lbl, row_number() OVER (PARTITION BY u ORDER BY c DESC, lbl) AS rn
         |  FROM cn$i) WHERE rn = 1)""".stripMargin
    }
    (head +: steps).mkString(",\n") + s"\nSELECT node, lbl FROM l$rounds"
  }

  /** Oracle for Queries.kgKCore (GraphOps.kCore): the fixed peeling rounds
    * unrolled as CTEs (the PageRank engine-exactness contract), then the
    * final within-core degree re-thresholded exactly as the engine does.
    */
  def kCoreSql(k: Long, rounds: Int): String = {
    // MATERIALIZED: every euN is referenced twice by round N+1 (degree scan
    // + semi-join) — default CTE inlining would re-derive the whole page-
    // synthesis chain 2^rounds times
    val head = s"WITH $triplesCtes,\n" +
      s"""eu0 AS MATERIALIZED (SELECT DISTINCT least(s, o) AS a, greatest(s, o) AS b
         |  FROM tr WHERE k_s IN (0, 1) AND k_o IN (0, 1) AND s <> o)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""dg$i AS (SELECT node, count(*) AS deg FROM (
         |    SELECT a AS node FROM eu${i - 1} UNION ALL SELECT b FROM eu${i - 1}) GROUP BY 1),
         |kp$i AS MATERIALIZED (SELECT node FROM dg$i WHERE deg >= $k),
         |eu$i AS MATERIALIZED (SELECT e.a, e.b FROM eu${i - 1} e
         |  JOIN kp$i x ON x.node = e.a JOIN kp$i y ON y.node = e.b)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"""
         |SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
         |  SELECT a AS node FROM eu$rounds UNION ALL SELECT b FROM eu$rounds)
         |GROUP BY 1 HAVING count(*) >= $k""".stripMargin
  }

  /** Oracle for Queries.htmlExtract — the north-rule per-row invariant
    * (`extractText(html) == text`, byte-identical per url) surfaced through
    * the driver gate. Reconstructs the expected extracted text closed-form
    * from the generation rule (title line, relation sentences in k order,
    * born/abstract/someone lines, the Mercury disambiguation-context line,
    * the long-tail gadget line for bench-range ids) and md5-hashes it; the
    * ENGINE hashes what its real HTML parser extracted from the html BYTES,
    * so a single flipped byte in the extractor or the synthesizer fails the
    * rows+schema+hash compare.
    */
  /** Oracle for Queries.kgBgp: the same basic graph pattern evaluated as
    * plain SQL joins over the DISTINCT triple set (SPARQL set semantics).
    */
  val bgpSql: String =
    s"WITH $triplesCtes,\n" +
    s"""k AS (SELECT DISTINCT s AS a, o AS b FROM tr
       |      WHERE p = '${Dict.foaf}knows' AND k_s = 0),
       |bp AS (SELECT DISTINCT s AS b, o AS city FROM tr
       |       WHERE p = '${Dict.dbo}birthPlace'),
       |w AS (SELECT DISTINCT s AS a, o AS org FROM tr
       |      WHERE p = '${Dict.schemaNs}worksFor')
       |SELECT k.a, k.b, bp.city, w.org
       |FROM k JOIN bp USING (b) JOIN w ON w.a = k.a""".stripMargin

  val extractSql: String =
    s"WITH $pagesCtes,\n" +
    s"""relagg AS (
       |  SELECT r.id,
       |    string_agg(p.topic || ' ' || r.phrase || ' ' || r.obj || '.',
       |               chr(10) ORDER BY r.k) AS rtext
       |  FROM rels r JOIN pg p USING (id) GROUP BY r.id),
       |txt AS (
       |  SELECT p.url,
       |    p.topic || chr(10) || ra.rtext || chr(10)
       |      || p.topic || ' was born in ' || p.year || '.' || chr(10)
       |      || p.topic || ' is described on page ' || p.id || '.' || chr(10)
       |      || 'Someone knows ' || p.topic || '.'
       |      || CASE WHEN p.topic = 'Mercury'
       |           THEN chr(10) || CASE WHEN p.mb = 0 THEN 'It is a planet in orbit.'
       |                                ELSE 'It is a liquid metal.' END
       |           ELSE '' END
       |      || CASE WHEN p.id >= 100000 AND p.id % 1009 < 8
       |           THEN chr(10) || 'Someone knows Tachyon Spool ' || (p.id % 1009) || '.'
       |           ELSE '' END AS text
       |  FROM pg p JOIN relagg ra ON ra.id = p.id)
       |SELECT url, md5(text) AS text_md5,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  TRUE AS matches
       |FROM txt""".stripMargin

  // --- ontology entailment / constraint QA (graft.kg.Ontology) -------------

  private def pairValues(ps: Seq[(String, String)]): String =
    ps.map { case (a, b) => s"('$a', '$b')" }.mkString(",\n    ")

  private val ontoCtes: String =
    s"""onto (sub, sup) AS (VALUES ${pairValues(graft.kg.Ontology.subClassEdges)}),
       |cl AS (SELECT sub, sup FROM onto
       |       UNION
       |       SELECT c.sub, o.sup FROM cl c JOIN onto o ON c.sup = o.sub)""".stripMargin

  /** Oracle for Queries.kgSubClassClosure: the engine's pointer-squaring
    * closure vs a genuinely independent recursive-CTE fixpoint over the same
    * edge list.
    */
  val subClassClosureSql: String =
    s"WITH RECURSIVE $ontoCtes\nSELECT sub, sup FROM cl WHERE sub <> sup"

  /** Shared entailed-type CTE chain (`etypes`): recursive-CTE closure, the
    * same asserted-class VALUES map, assertion-wins `min` over the union.
    */
  private val typesCtes: String =
    s"$triplesCtes,\n$ontoCtes,\n" +
    s"""nodes AS (SELECT DISTINCT s AS iri FROM tr WHERE k_s = 0
       |          UNION SELECT DISTINCT o FROM tr WHERE k_o = 0),
       |tm (iri, cls) AS (VALUES ${pairValues(graft.kg.Ontology.assertedClasses)}),
       |asserted AS (SELECT n.iri AS s, t.cls, FALSE AS inf
       |             FROM nodes n JOIN tm t USING (iri)),
       |strict AS (SELECT sub, sup FROM cl WHERE sub <> sup),
       |inferred AS (SELECT a.s, c.sup AS cls, TRUE AS inf
       |             FROM asserted a JOIN strict c ON c.sub = a.cls),
       |etypes AS (
       |  SELECT s, cls, CAST(min(CAST(inf AS INT)) AS BOOLEAN) AS is_inferred
       |  FROM (SELECT * FROM asserted UNION ALL SELECT * FROM inferred) u
       |  GROUP BY s, cls)""".stripMargin

  /** Oracle for Queries.kgRdfsTypes. */
  val rdfsTypesSql: String =
    s"WITH RECURSIVE $typesCtes\nSELECT s, cls, is_inferred FROM etypes"

  /** Oracle for Queries.kgTypeCounts. */
  val typeCountsSql: String =
    s"WITH RECURSIVE $typesCtes\n" +
    s"""SELECT cls, CAST(count(*) AS BIGINT) AS n_total,
       |  CAST(sum(CASE WHEN NOT is_inferred THEN 1 ELSE 0 END) AS BIGINT) AS n_direct
       |FROM etypes GROUP BY cls""".stripMargin

  /** Oracle for Queries.kgDomainCheck: anti-join against the entailed types
    * on (subject, declared domain).
    */
  val domainCheckSql: String =
    s"WITH RECURSIVE $typesCtes,\n" +
    s"""doms (p, dom_cls) AS (VALUES ${pairValues(graft.kg.Ontology.predicateDomains)}),
       |usage AS (SELECT DISTINCT t.s, t.p, d.dom_cls
       |          FROM tr t JOIN doms d USING (p) WHERE t.k_s = 0)
       |SELECT u.s, u.p, u.dom_cls FROM usage u
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM etypes e WHERE e.s = u.s AND e.cls = u.dom_cls)""".stripMargin

  /** Oracle for Queries.kgFuse: the window statement of the engine's
    * (-votes, o, k_o) struct-min election.
    */
  val fuseSql: String = {
    val fp = graft.kg.Ontology.functionalPredicates
      .map(p => s"('$p')").mkString(", ")
    s"WITH $triplesCtes,\n" +
    s"""fp (p) AS (VALUES $fp),
       |ev AS (SELECT DISTINCT t.s, t.p, t.o, t.k_o, t.url
       |       FROM tr t JOIN fp USING (p) WHERE t.k_s = 0),
       |votes AS (SELECT s, p, o, k_o, count(*) AS n_sources
       |          FROM ev GROUP BY 1, 2, 3, 4),
       |r AS (SELECT s, p, o, n_sources,
       |        sum(n_sources) OVER (PARTITION BY s, p) AS n_total,
       |        count(*) OVER (PARTITION BY s, p) AS n_values,
       |        row_number() OVER (PARTITION BY s, p
       |                           ORDER BY n_sources DESC, o, k_o) AS rn
       |      FROM votes)
       |SELECT s, p, o, CAST(n_sources AS BIGINT) AS n_sources,
       |  CAST(n_values AS BIGINT) AS n_values, CAST(n_total AS BIGINT) AS n_total
       |FROM r WHERE rn = 1""".stripMargin
  }

  /** Oracle for Queries.kgTemporal: `warc_ts` regenerated closed-form
    * (epoch millis = FixedEpochMs + floorMod(h(seed,id,6), 365*24*3600) s),
    * evidence deduped per page, algebraic min/max/count.
    */
  val temporalSql: String = {
    val h6 = HashSql.mix64(s"((hb + 6) % $Two64)")
    val subj = iriCase("topic", s"'$planetIri'")
    val obj = iriCase("obj", s"'$planetIri'")
    s"WITH $pagesCtes,\n" +
    s"""tsq AS (SELECT id,
       |    1700000000000 + CAST(${fm(h6, 365 * 24 * 3600)} AS BIGINT) * 1000 AS ts_ms
       |  FROM base),
       |facts AS (
       |  SELECT DISTINCT $subj AS s, ${predCase("phrase")} AS p, $obj AS o,
       |    pg.url, q.ts_ms
       |  FROM rels JOIN pg USING (id) JOIN tsq q USING (id))
       |SELECT s, p, o, min(ts_ms) AS first_ms, max(ts_ms) AS last_ms,
       |  CAST(count(*) AS BIGINT) AS n_pages
       |FROM facts GROUP BY 1, 2, 3""".stripMargin
  }

  /** Oracle for Queries.kgConstraints: distinct object TERMS per (subject,
    * constrained predicate), violators only.
    */
  val constraintsSql: String = {
    val cons = graft.kg.Ontology.maxCardinality
      .map { case (p, m) => s"('$p', CAST($m AS BIGINT))" }.mkString(", ")
    s"WITH $triplesCtes,\n" +
    s"""cons (p, max_card) AS (VALUES $cons),
       |dd AS (SELECT DISTINCT t.s, t.p, t.o, t.k_o, t.lang, t.dt, c.max_card
       |       FROM tr t JOIN cons c USING (p))
       |SELECT s, p, CAST(count(*) AS BIGINT) AS n_objs, max_card
       |FROM dd GROUP BY s, p, max_card
       |HAVING count(*) > max_card""".stripMargin
  }

  /** Oracle for Queries.kgDangling: IRI objects never seen as a subject. */
  val danglingSql: String =
    s"WITH $triplesCtes,\n" +
    s"""refs AS (SELECT o AS iri, CAST(count(*) AS BIGINT) AS n_refs
       |         FROM tr WHERE k_o = 0 GROUP BY o),
       |subs AS (SELECT DISTINCT s AS iri FROM tr WHERE k_s IN (0, 1))
       |SELECT r.iri, r.n_refs FROM refs r
       |WHERE r.iri NOT IN (SELECT iri FROM subs)""".stripMargin

  /** Oracle for Queries.kgPathPairs: length-2 predicate-path counts through
    * hub-capped middle entities — the same distinct-edge / cap / two-level
    * rollup semantics as [[graft.kg.GraphOps.predPathPairs]].
    */
  def pathPairsSql(maxMid: Long, minPaths: Long): String = {
    val preds = graft.queries.Queries.PathMiningPreds
      .map(p => s"'$p'").mkString(", ")
    s"WITH $triplesCtes,\n" +
    s"""e AS (SELECT DISTINCT s, p, o FROM tr
       |  WHERE k_s IN (0, 1) AND k_o IN (0, 1) AND s <> o
       |    AND p IN ($preds)),
       |outd AS (SELECT s AS m, count(*) AS outd FROM e GROUP BY 1),
       |ind AS (SELECT o AS m, count(*) AS ind FROM e GROUP BY 1),
       |mids AS (SELECT m FROM ind JOIN outd USING (m)
       |  WHERE ind <= $maxMid AND outd <= $maxMid),
       |pm AS (SELECT x.p AS p1, y.p AS p2, mids.m, count(*) AS n
       |  FROM e x JOIN mids ON x.o = mids.m JOIN e y ON y.s = mids.m
       |  GROUP BY 1, 2, 3)
       |SELECT p1, p2, CAST(sum(n) AS BIGINT) AS n_paths,
       |  CAST(count(*) AS BIGINT) AS n_mids
       |FROM pm GROUP BY 1, 2 HAVING sum(n) >= $minPaths""".stripMargin
  }

  /** Oracle for Queries.kgSkolem: Skolem IRIs rebuilt closed-form —
    * `genid/md5(url || '|' || label)` under the fixed authority, kinds
    * rewritten to IRI, every non-blank position untouched.
    */
  val skolemSql: String = {
    val base = "https://graft.invalid/.well-known/genid/"
    s"WITH $triplesCtes\n" +
    s"""SELECT
       |  CASE WHEN k_s = 1 THEN '$base' || md5(url || '|' || s) ELSE s END AS s,
       |  CAST(CASE WHEN k_s = 1 THEN 0 ELSE k_s END AS TINYINT) AS "sKind",
       |  p,
       |  CASE WHEN k_o = 1 THEN '$base' || md5(url || '|' || o) ELSE o END AS o,
       |  CAST(CASE WHEN k_o = 1 THEN 0 ELSE k_o END AS TINYINT) AS "oKind",
       |  lang AS "oLang", dt AS "oDt"
       |FROM tr""".stripMargin
  }

  /** Oracle for Queries.kgVoid: the five dataset-card counts as scalar
    * subqueries over the regenerated triple relation.
    */
  val voidSql: String =
    s"WITH $triplesCtes\n" +
    """SELECT
      |  (SELECT CAST(count(*) AS BIGINT) FROM tr) AS n_triples,
      |  (SELECT CAST(count(DISTINCT s) AS BIGINT) FROM tr) AS n_subjects,
      |  (SELECT CAST(count(DISTINCT p) AS BIGINT) FROM tr) AS n_predicates,
      |  (SELECT CAST(count(DISTINCT o) AS BIGINT) FROM tr WHERE k_o IN (0, 1))
      |    AS n_node_objects,
      |  (SELECT CAST(count(*) AS BIGINT) FROM
      |    (SELECT DISTINCT o, k_o, lang, dt FROM tr WHERE k_o NOT IN (0, 1)))
      |    AS n_literals""".stripMargin

  /** Oracle for Queries.kgExportNt: every N-Triples line reconstructed
    * closed-form from the generation rule (the corpus's terms contain no
    * character the writer escapes, so the concatenation is exact; the
    * escaping itself is pinned by RdfSpec round-trips).
    */
  val exportNtSql: String =
    s"WITH $triplesCtes\n" +
    """SELECT (CASE WHEN k_s = 1 THEN '_:' || s ELSE '<' || s || '>' END)
      |  || ' <' || p || '> ' ||
      |  (CASE WHEN k_o = 0 THEN '<' || o || '>'
      |        WHEN k_o = 1 THEN '_:' || o
      |        WHEN k_o = 2 THEN '"' || o || '"'
      |        WHEN k_o = 3 THEN '"' || o || '"@' || lang
      |        ELSE '"' || o || '"^^<' || dt || '>' END)
      |  || ' .' AS line
      |FROM tr""".stripMargin

  /** Oracle for Queries.kgExportNq: the N-Triples line with the lineage URL
    * as graph term before the terminator.
    */
  val exportNqSql: String =
    s"WITH $triplesCtes\n" +
    """SELECT (CASE WHEN k_s = 1 THEN '_:' || s ELSE '<' || s || '>' END)
      |  || ' <' || p || '> ' ||
      |  (CASE WHEN k_o = 0 THEN '<' || o || '>'
      |        WHEN k_o = 1 THEN '_:' || o
      |        WHEN k_o = 2 THEN '"' || o || '"'
      |        WHEN k_o = 3 THEN '"' || o || '"@' || lang
      |        ELSE '"' || o || '"^^<' || dt || '>' END)
      |  || ' <' || url || '> .' AS line
      |FROM tr""".stripMargin
}
