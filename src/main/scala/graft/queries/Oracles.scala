package graft.queries

import graft.textops.TextOps

/** DuckDB oracle SQL for [[Queries]] — each statement recomputes the expected
  * result independently over the same parquet tables (registered by the driver
  * as bare table names). Chilon-semantics oracles re-derive the group keys with
  * explicit longest-prefix CASE logic, validating the engine's broadcast-trie
  * path against a from-first-principles computation.
  */
object Oracles {

  /** Shared CTE: derived triples from `documents` (mirror of
    * [[Queries.derivedTriples]]).
    */
  val derivedTriplesCte: String =
    """t AS (
      |  SELECT
      |    CASE WHEN doc_id % 7 = 3 THEN 'b' || doc_id
      |         ELSE 'http://dbpedia.org/resource/E' || (doc_id % 50) END AS s,
      |    CASE WHEN doc_id % 7 = 3 THEN 1 ELSE 0 END AS s_kind,
      |    CASE WHEN doc_id % 3 = 0 THEN 'http://dbpedia.org/ontology/knows'
      |         WHEN doc_id % 3 = 1 THEN 'https://schema.org/worksFor'
      |         ELSE 'http://unreg.example.net/p/rel' END AS p,
      |    CASE WHEN doc_id % 5 = 0 THEN 'http://dbpedia.org/resource/E' || (doc_id % 40)
      |         WHEN doc_id % 5 = 1 THEN 'http://www.wikidata.org/entity/Q' || (doc_id % 30)
      |         WHEN doc_id % 5 = 2 THEN 'lit-' || doc_id
      |         WHEN doc_id % 5 = 3 THEN 'texto-' || doc_id
      |         ELSE '42' END AS o,
      |    CASE WHEN doc_id % 5 IN (0, 1) THEN 0
      |         WHEN doc_id % 5 = 2 THEN 2
      |         WHEN doc_id % 5 = 3 THEN 3
      |         ELSE 4 END AS o_kind,
      |    CASE WHEN doc_id % 5 = 4 THEN
      |           (CASE WHEN doc_id % 11 = 0 THEN 'http://unknown.example.org/dt'
      |                 ELSE 'http://www.w3.org/2001/XMLSchema#integer' END)
      |         END AS o_dt
      |  FROM documents)""".stripMargin

  /** Shared CTE: normalized group keys (longest-prefix CASE against the
    * community fixture registry — mirror of the broadcast-trie resolution).
    */
  val normCte: String =
    """norm AS (
      |  SELECT
      |    CASE WHEN s_kind = 1 THEN 'BLANK'
      |         WHEN s LIKE 'http://dbpedia.org/resource/%' THEN 'dbr'
      |         ELSE 'UNKNOWN' END AS s_ns,
      |    CASE WHEN p LIKE 'http://dbpedia.org/ontology/%' THEN 'dbo'
      |         WHEN p LIKE 'https://schema.org/%' THEN 'schema'
      |         ELSE 'UNKNOWN' END AS p_ns,
      |    CASE WHEN o_kind = 2 THEN 'xsd'
      |         WHEN o_kind = 3 THEN 'rdf'
      |         WHEN o_kind = 4 THEN
      |           (CASE WHEN o_dt LIKE 'http://www.w3.org/2001/XMLSchema#%' THEN 'xsd'
      |                 ELSE 'UNKNOWN' END)
      |         WHEN o LIKE 'http://dbpedia.org/resource/%' THEN 'dbr'
      |         WHEN o LIKE 'http://www.wikidata.org/entity/%' THEN 'wd'
      |         ELSE 'UNKNOWN' END AS o_ns,
      |    o_kind IN (2, 3, 4) AS is_datatype
      |  FROM t)""".stripMargin

  val summaryCte: String =
    s"""summary AS (
       |  SELECT s_ns, p_ns, o_ns, is_datatype, count(*) AS occurs
       |  FROM norm GROUP BY 1, 2, 3, 4)""".stripMargin

  private def withT(body: String) = s"WITH $derivedTriplesCte, $normCte, $summaryCte\n$body"

  /** Shared CTE: token-derived IRIs + their segment prefixes (mirror of
    * [[Queries.inferenceIris]] + `Inference.segPrefixes` for these shapes).
    */
  val irisCte: String =
    """toks AS (
      |  SELECT doc_id, u.tok FROM documents,
      |    UNNEST(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                       x -> len(x) > 0)) AS u(tok)),
      |iris AS (
      |  SELECT CASE WHEN len(tok) >= 4 THEN
      |           'http://big.example.org/' ||
      |           (CASE WHEN len(tok) >= 5 THEN 'a/' ELSE 'b/' END) ||
      |           tok || '_' || (doc_id % 50)
      |         ELSE 'http://rare' || (doc_id % 97) || '.example.io/t/' || tok
      |         END AS iri
      |  FROM toks),
      |prefixes AS (
      |  SELECT regexp_extract(iri, '^(https?://[^/]+/)', 1) AS prefix, 1 AS depth FROM iris
      |  UNION ALL
      |  SELECT regexp_extract(iri, '^(https?://[^/]+/[^/]+/)', 1), 2 FROM iris
      |  UNION ALL
      |  SELECT iri, 3 FROM iris)""".stripMargin

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The raw vendored TSV rows as SQL VALUES (idx, status, prefix, namespace)
    * — the oracle's input data; all the registry LOGIC (fix_pv, dedup,
    * prefix-free keep) is recomputed independently in SQL.
    */
  lazy val communityValuesSql: String =
    graft.ns.Registry.communityRows().zipWithIndex
      .map { case ((st, p, ns), i) => s"  ($i, ${sqlStr(st)}, ${sqlStr(p)}, ${sqlStr(ns)})" }
      .mkString(",\n")

  /** Native session_window semantics relationally (strict-overlap merge,
    * window end = last event + gap) — shared by the batch (q_session_window)
    * and streaming-drain (q_stream_sessions) checks.
    */
  val sessionWindowSql: String =
    """WITH g AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, value,
      |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM g)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_micro
      |FROM s GROUP BY user_id, sid""".stripMargin

  val sqls: Map[String, String] = Map(
    "q_p4_resolve_ns" ->
      s"""WITH $derivedTriplesCte
         |SELECT DISTINCT s AS iri,
         |  CASE WHEN s LIKE 'http://dbpedia.org/resource/%' THEN 'dbr' ELSE 'UNKNOWN' END AS alias,
         |  CASE WHEN s LIKE 'http://dbpedia.org/resource/%' THEN 'http://dbpedia.org/resource/' END AS ns
         |FROM t WHERE s_kind = 0""".stripMargin,

    "q_a1_summary" -> withT(
      "SELECT s_ns, p_ns, o_ns, is_datatype, occurs FROM summary"),

    // incremental merge (prev-snapshot + delta) must equal the full recompute
    "q_incr_summary" -> withT(
      "SELECT s_ns, p_ns, o_ns, is_datatype, occurs FROM summary"),

    "q_o1_stmt_ids" -> withT(
      """SELECT printf('#t%04d', CAST(row_number() OVER
        |    (ORDER BY s_ns, p_ns, o_ns, is_datatype) AS INT)) AS stmt_id,
        |  s_ns, p_ns, o_ns, is_datatype, occurs
        |FROM summary WHERE occurs >= 10""".stripMargin),

    "q_a5_vis_nodes" -> withT(
      """SELECT name, CAST(sum(occurs) AS BIGINT) AS count FROM (
        |  SELECT s_ns AS name, occurs FROM summary
        |  UNION ALL SELECT o_ns, occurs FROM summary)
        |GROUP BY 1""".stripMargin),

    "q_a6_vis_edges" -> withT(
      """SELECT s_ns AS source, o_ns AS target, occurs AS count, p_ns AS label, is_datatype,
        |  (CASE WHEN s_ns = least(s_ns, o_ns) THEN 1 ELSE -1 END) *
        |  CAST(row_number() OVER (PARTITION BY least(s_ns, o_ns), greatest(s_ns, o_ns)
        |       ORDER BY occurs DESC, p_ns, is_datatype, s_ns) AS INT) AS link_num
        |FROM summary""".stripMargin),

    "q_a2_prefix_counts" ->
      s"""WITH $irisCte
         |SELECT prefix, depth, count(*) AS count FROM prefixes
         |GROUP BY 1, 2 HAVING count(*) >= 100""".stripMargin,

    "q_a2_prefix_stats" ->
      s"""WITH $irisCte,
         |pp AS (
         |  SELECT iri, prefix, depth FROM (
         |    SELECT iri, regexp_extract(iri, '^(https?://[^/]+/)', 1) AS prefix, 1 AS depth FROM iris
         |    UNION ALL
         |    SELECT iri, regexp_extract(iri, '^(https?://[^/]+/[^/]+/)', 1), 2 FROM iris
         |    UNION ALL
         |    SELECT iri, iri, 3 FROM iris))
         |SELECT prefix, CAST(min(depth) AS INT) AS depth,
         |  CAST(sum(CASE WHEN iri = prefix THEN 1 ELSE 0 END) AS BIGINT) AS own,
         |  CAST(sum(CASE WHEN iri <> prefix THEN 1 ELSE 0 END) AS BIGINT) AS "desc",
         |  CAST(count(DISTINCT CASE WHEN iri <> prefix THEN iri END) AS BIGINT) AS uniq_desc
         |FROM pp GROUP BY prefix
         |HAVING sum(CASE WHEN iri = prefix THEN 1 ELSE 0 END)
         |     + sum(CASE WHEN iri <> prefix THEN 1 ELSE 0 END) >= 100""".stripMargin,

    "q_n3_infer_ns" ->
      s"""WITH $irisCte,
         |pc AS (SELECT prefix, depth, count(*) AS c FROM prefixes GROUP BY 1, 2),
         |doms AS (SELECT prefix, c FROM pc WHERE depth = 1 AND c >= 1000),
         |kids AS (SELECT p.prefix, p.c FROM pc p JOIN doms d
         |           ON p.prefix LIKE d.prefix || '%' WHERE p.depth = 2 AND p.c >= 1000)
         |SELECT ns, size FROM (
         |  SELECT prefix AS ns, c AS size FROM kids
         |    WHERE (SELECT count(*) FROM kids) BETWEEN 1 AND 4
         |  UNION ALL
         |  SELECT prefix, c FROM doms
         |    WHERE NOT ((SELECT count(*) FROM kids) BETWEEN 1 AND 4))""".stripMargin,

    "q_p3_canonicalize" ->
      """SELECT doc_id, CAST(least(24 + doc_id % 300, 200) AS INT) AS canon_len
        |FROM documents""".stripMargin,

    "q_p5_literal_class" -> withT(
      "SELECT o_ns AS group_key, count(*) AS n FROM norm GROUP BY 1"),

    "q_p6_ignore_unknown" -> withT(
      """SELECT (SELECT count(*) FROM norm
        |          WHERE s_ns <> 'UNKNOWN' AND p_ns <> 'UNKNOWN' AND o_ns <> 'UNKNOWN') AS kept,
        |       (SELECT count(*) FROM t) AS total""".stripMargin),

    "q_p12_metrics" ->
      s"""WITH $derivedTriplesCte
         |SELECT
         |  CAST(sum(CASE WHEN s_kind = 0 THEN 1 ELSE 0 END) + count(*) +
         |    sum(CASE WHEN o_kind = 0 THEN 1 ELSE 0 END) AS BIGINT) AS iris,
         |  CAST(sum(CASE WHEN s_kind = 1 THEN 1 ELSE 0 END) +
         |    sum(CASE WHEN o_kind = 1 THEN 1 ELSE 0 END) AS BIGINT) AS blanks,
         |  CAST(sum(CASE WHEN o_kind IN (2, 3, 4) THEN 1 ELSE 0 END) AS BIGINT) AS literals
         |FROM t""".stripMargin,

    // S5/S6: recompute the registry from the SAME raw TSV rows with
    // independent SQL logic — fix_pv filters, duplicate-namespace
    // first-alias-wins (min input idx), prefix-free keep set. "Kept iff no
    // other distinct namespace is a proper prefix" is equivalent to the
    // engine's sequential shortest-first insert: if any input namespace is a
    // proper prefix of ns, the SHORTEST one in that chain is always kept
    // (nothing can block it), and it blocks ns.
    "q_s5_registry" ->
      s"""WITH raw(idx, status, prefix, ns) AS (VALUES
         |$communityValuesSql),
         |fixed AS (
         |  SELECT idx, prefix, ns FROM raw
         |  WHERE status = 'canonical'
         |    AND NOT (position('walmart' IN prefix) > 0 AND position('amazon' IN ns) > 0)
         |    AND NOT (position('movie' IN prefix) > 0
         |             AND position('data.linkedmdb.org/resource/movie' IN ns) > 0)
         |    AND NOT regexp_matches(ns, '#.*#')),
         |firsts AS (
         |  SELECT ns, prefix AS alias FROM (
         |    SELECT ns, prefix, row_number() OVER (PARTITION BY ns ORDER BY idx) AS rn
         |    FROM fixed) WHERE rn = 1),
         |kept AS (
         |  SELECT f.alias, f.ns FROM firsts f
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM firsts g
         |    WHERE g.ns <> f.ns AND substr(f.ns, 1, length(g.ns)) = g.ns))
         |SELECT alias, ns, 'community' AS source FROM kept""".stripMargin,

    // N4/P8: the alias each engineered namespace must receive, as a pure CASE
    // over the k-grid (insertion order = k ascending, so every genAlias
    // conflict outcome is determined by k alone; the skip inputs produce no
    // rows). Mirrors Queries.p8AliasGen's fixture derivation 1:1.
    "q_p8_alias_gen" ->
      """WITH ks AS (SELECT DISTINCT CAST(doc_id % 12 AS INT) AS k FROM documents)
        |SELECT
        |  'http://alpha' || CAST(k % 4 AS VARCHAR) || '.example-' || CAST(k % 3 AS VARCHAR)
        |    || '.' || (CASE WHEN k % 4 = 3 AND k > 3 THEN 'net' ELSE 'org' END)
        |    || '/' || (CASE WHEN k % 4 = 1 THEN 'p1' ELSE 'p' || CAST(k AS VARCHAR) END)
        |    || '/' AS ns,
        |  CASE k
        |    WHEN 0 THEN 'alpha0'   -- first-label grant
        |    WHEN 1 THEN 'alpha1'
        |    WHEN 2 THEN 'alpha2'
        |    WHEN 3 THEN 'alpha3'
        |    WHEN 4 THEN 'alphap4'  -- same TLD -> path-segment disambiguation
        |    WHEN 5 THEN 'alpha4'   -- same TLD + same segment -> numeric fallback
        |    WHEN 6 THEN 'alphap6'
        |    WHEN 7 THEN 'alphanet' -- TLD disambiguation (net vs org)
        |    WHEN 8 THEN 'alphap8'
        |    WHEN 9 THEN 'alpha5'   -- numeric fallback, next free count
        |    WHEN 10 THEN 'alphap10'
        |    WHEN 11 THEN 'alphap11' -- alphanet taken -> segment fallthrough
        |  END AS alias,
        |  'inference' AS source
        |FROM ks""".stripMargin,

    // S1-S4: the expected triple multiset for the pinned two-file RDF fixture
    // (hand-derived from N-Triples/Turtle semantics: RFC 3986 @base
    // resolution incl. dot segments, PN_LOCAL interior dots / %-encoding /
    // PN_LOCAL_ESC, rdf:first/rest collection expansion, long strings).
    "q_rdf_parse" ->
      """SELECT * FROM (VALUES
        |  ('data.nt.gz', 'http://s.example.org/1', 0, 'http://p.example.org/knows', 'http://o.example.org/2', 0, NULL, NULL),
        |  ('data.nt.gz', 'http://s.example.org/1', 0, 'http://p.example.org/name', 'Alice', 2, NULL, NULL),
        |  ('data.nt.gz', 'x', 1, 'http://p.example.org/age', '30', 4, NULL, 'http://www.w3.org/2001/XMLSchema#integer'),
        |  ('data.nt.gz', 'http://s.example.org/3', 0, 'http://p.example.org/label', 'café', 3, 'fr', NULL),
        |  ('mixed.ttl', 'http://ex.example.org/ns#v1.2', 0, 'http://ex.example.org/ns#p', 'plain', 2, NULL, NULL),
        |  ('mixed.ttl', 'http://default.example.org/alpha', 0, 'http://ex.example.org/ns#q', 'hola', 3, 'es', NULL),
        |  ('mixed.ttl', 'http://default.example.org/alpha', 0, 'http://ex.example.org/ns#r', '42', 4, NULL, 'http://www.w3.org/2001/XMLSchema#integer'),
        |  ('mixed.ttl', 'http://base.example.org/dir/rel/x', 0, 'http://ex.example.org/ns#s', 'http://base.example.org/up', 0, NULL, NULL),
        |  ('mixed.ttl', 'http://ex.example.org/ns#a%20b', 0, 'http://ex.example.org/ns#t', 'b1', 1, NULL, NULL),
        |  ('mixed.ttl', 'b1', 1, 'http://ex.example.org/ns#u', '!genid1', 1, NULL, NULL),
        |  ('mixed.ttl', '!genid1', 1, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', 'http://ex.example.org/ns#one', 0, NULL, NULL),
        |  ('mixed.ttl', '!genid1', 1, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest', '!genid2', 1, NULL, NULL),
        |  ('mixed.ttl', '!genid2', 1, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', 'http://ex.example.org/ns#two', 0, NULL, NULL),
        |  ('mixed.ttl', '!genid2', 1, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#nil', 0, NULL, NULL),
        |  ('mixed.ttl', '!genid3', 1, 'http://ex.example.org/ns#v', 'in-bnode', 2, NULL, NULL),
        |  ('mixed.ttl', '!genid3', 1, 'http://ex.example.org/ns#w', 'http://ex.example.org/ns#long~name', 0, NULL, NULL),
        |  ('mixed.ttl', 'http://ex.example.org/ns#m', 0, 'http://ex.example.org/ns#text', 'two' || chr(10) || 'lines', 2, NULL, NULL)
        |) AS v(file, s, s_kind, p, o, o_kind, o_lang, o_dt)""".stripMargin,

    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY text""".stripMargin,

    // streaming content dedup: survivor CONTENT set == batch distinct
    // (which instance survives a within-batch tie is arbitrary on both paths)
    "q_stream_dedup" ->
      """SELECT DISTINCT md5(text) AS content_md5,
        |  CAST(length(text) AS BIGINT) AS len
        |FROM documents""".stripMargin,

    // watermarked stream-stream join: drained AvailableNow result must equal
    // the relational attribution join (inclusive 1-hour window, same-user)
    "q_stream_join" ->
      """SELECT s.user_id, s.event_id AS signup_event_id,
        |  p.event_id AS purchase_event_id, p.value AS purchase_value
        |FROM events s JOIN events p
        |  ON p.user_id = s.user_id
        | AND s.event_type = 'signup' AND p.event_type = 'purchase'
        | AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR""".stripMargin,

    // n-gram decontamination: text-level shared-5-gram NOT IN (engine probes
    // splitmix shingle hashes — a collision would surface here)
    "q_decontam_ngram" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS ts
        |  FROM documents),
        |sh AS (SELECT doc_id, UNNEST(CASE
        |    WHEN len(ts) >= 5 THEN list_transform(range(1, len(ts) - 3), i ->
        |      ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4])
        |    WHEN len(ts) >= 1 THEN [array_to_string(ts, ' ')]
        |    ELSE CAST([] AS VARCHAR[]) END) AS s
        |  FROM t),
        |bl AS (SELECT DISTINCT s FROM sh WHERE doc_id % 7 = 0)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM sh JOIN bl USING (s))""".stripMargin,

    // per-eval-doc contamination fraction: distinct shared 5-grams against
    // the eval-excluded corpus (string shingles here; the engine's 64-bit
    // shingle hashes are collision-exposed by this text-level comparison)
    "q_contam_report" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS ts
        |  FROM documents),
        |sh AS (SELECT doc_id, UNNEST(CASE
        |    WHEN len(ts) >= 5 THEN list_transform(range(1, len(ts) - 3), i ->
        |      ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4])
        |    WHEN len(ts) >= 1 THEN [array_to_string(ts, ' ')]
        |    ELSE CAST([] AS VARCHAR[]) END) AS s
        |  FROM t),
        |ev AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % 7 = 0),
        |cs AS (SELECT DISTINCT s FROM sh WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM ev GROUP BY 1),
        |h AS (SELECT ev.doc_id, CAST(count(*) AS BIGINT) AS n_hit
        |  FROM ev JOIN cs USING (s) GROUP BY 1)
        |SELECT n.doc_id, n.n_shingles,
        |  coalesce(h.n_hit, 0) AS n_hit,
        |  CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(n.n_shingles AS DOUBLE) AS contam_frac
        |FROM n LEFT JOIN h USING (doc_id)""".stripMargin,

    // exact decontamination: content-level anti join (hash equality == text
    // equality absent 64-bit collisions, which the oracle would expose)
    "q_decontam_exact" ->
      """SELECT doc_id FROM documents
        |WHERE text NOT IN (SELECT text FROM documents WHERE doc_id % 7 = 0)""".stripMargin,

    // line-level dedup: first (doc_id, idx) occurrence of each distinct line
    // wins (the engine groups by xxhash64(line) — hash equality == line
    // equality absent collisions); docs reassemble in line order
    "q_dedup_lines" ->
      """WITH aug AS (SELECT doc_id,
        |    text || chr(10) || 'common boilerplate ' || (doc_id % 7)
        |         || chr(10) || 'footer ' || (doc_id % 3) AS t
        |  FROM documents),
        |p AS (SELECT doc_id, string_split(t, chr(10)) AS parts FROM aug),
        |l AS (SELECT doc_id, CAST(i - 1 AS INT) AS idx, parts[CAST(i AS INT)] AS line
        |      FROM p, UNNEST(range(1, len(parts) + 1)) AS u(i)),
        |k AS (SELECT doc_id, idx, line,
        |        row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) AS rn
        |      FROM l)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |  md5(string_agg(line, chr(10) ORDER BY idx)) AS kept_md5
        |FROM k WHERE rn = 1 GROUP BY doc_id""".stripMargin,

    // per-domain cap: bit-exact splitmix64 rank replication
    "q_domain_cap" -> HashSql.domainCapSql(cap = 15, seed = 7L),

    // token-budget selection: inclusive running sum over (quality desc, id)
    // order — the global window IS the semantics the engine's two-pass
    // distributed prefix sum must reproduce; quality = the 6-dp-rounded
    // composite, so the sort key agrees bitwise
    "q_select_budget" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    round(
         |      least(length(text) / 500.0, 1.0) * 0.4 +
         |      (CASE WHEN length(text) > 0 THEN
         |         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / length(text)
         |       ELSE 0.0 END) * 0.4 +
         |      (CASE WHEN ${tokCountSql("text")} > 0 THEN
         |         ${stopHitsSql("text", "en")} * 1.0 / ${tokCountSql("text")}
         |       ELSE 0.0 END) * 0.2,
         |    6) AS quality,
         |    CAST(${tokCountSql("text")} AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, quality, n_tokens,
         |    sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
         |  FROM m)
         |SELECT doc_id, quality, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
         |FROM c WHERE cum_tokens <= 20000""".stripMargin,

    "q_dedup_token_jaccard" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 60),
        |toks AS (SELECT DISTINCT doc_id, u.tok FROM d,
        |  UNNEST(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     x -> len(x) > 0)) AS u(tok)),
        |sz AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
        |FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.85""".stripMargin,

    "q_dedup_containment" ->
      s"""WITH d AS (SELECT doc_id, ${toksSql("text")} AS toks
         |  FROM documents WHERE doc_id < 200),
         |sh AS (SELECT DISTINCT doc_id, u.s FROM d, UNNEST(
         |  CASE WHEN len(toks) = 0 THEN []
         |       WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |       ELSE list_transform(range(1, len(toks) - 1),
         |         i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1]
         |           || ' ' || toks[CAST(i AS INT) + 2])
         |  END) AS u(s)),
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(count(*) AS BIGINT) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, inter, sa.sz AS sz_a, sb.sz AS sz_b,
         |  CAST(inter * 1000 // sa.sz AS BIGINT) AS cont_a_pm,
         |  CAST(inter * 1000 // sb.sz AS BIGINT) AS cont_b_pm
         |FROM inter JOIN sz sa ON sa.doc_id = id_a
         |JOIN sz sb ON sb.doc_id = id_b
         |WHERE greatest(inter * 1000 // sa.sz, inter * 1000 // sb.sz) >= 500""".stripMargin,

    "q_dedup_ngram" ->
      """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id < 40),
        |grams AS (
        |  SELECT DISTINCT doc_id, u.g FROM d, UNNEST(
        |    CASE WHEN length(t) = 0 THEN []
        |         WHEN length(t) < 3 THEN [t]
        |         ELSE list_transform(range(1, length(t) - 1), i -> substr(t, CAST(i AS INT), 3))
        |    END) AS u(g)),
        |sz AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
        |FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.6""".stripMargin,

    "q_dedup_embedding" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200)
        |SELECT id_a, id_b, sim FROM (
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(
        |    list_aggregate(list_transform(range(1, len(a.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum')
        |    / (sqrt(list_aggregate(list_transform(range(1, len(a.embedding) + 1),
        |         i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), 'sum'))
        |     * sqrt(list_aggregate(list_transform(range(1, len(b.embedding) + 1),
        |         i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum'))),
        |    6) AS sim
        |FROM e a, e b WHERE a.vec_id < b.vec_id)
        |WHERE sim >= 0.35""".stripMargin,

    "q_sim_topk" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(
        |      list_aggregate(list_transform(range(1, len(q.embedding) + 1),
        |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), 'sum')
        |      / (sqrt(list_aggregate(list_transform(range(1, len(q.embedding) + 1),
        |           i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), 'sum'))
        |       * sqrt(list_aggregate(list_transform(range(1, len(c.embedding) + 1),
        |           i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), 'sum'))),
        |      6) AS sim
        |  FROM q, embeddings c WHERE c.vec_id <> q.vec_id)
        |SELECT query_id, rank, neighbor_id, sim FROM (
        |  SELECT query_id, neighbor_id, sim,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,

    // dead-letter replay: the corrupted lines reconstructed byte-for-byte
    // from the k%13 / k%3 rule (backslash literal in single quotes)
    "q_rdf_dead_letter" ->
      """WITH k AS (SELECT doc_id AS k FROM documents WHERE doc_id % 13 = 0),
        |l AS (SELECT k,
        |    CASE WHEN k % 3 = 0 THEN '<http://ex.org/s/' || k
        |        || '> <http://ex.org/p/p' || (k % 7) || '> "doc ' || k || '"'
        |      WHEN k % 3 = 1 THEN '<http://ex.org/s/' || k
        |        || ' <http://ex.org/p/x> "y" .'
        |      ELSE '<http://ex.org/s/' || k
        |        || '> <http://ex.org/p/x> "doc BSLASH' || k || '" .'
        |    END AS line
        |  FROM k)
        |SELECT md5(line) AS line_md5, CAST(length(line) AS BIGINT) AS line_len
        |FROM l""".stripMargin.replace("BSLASH", "\\"),

    // KG-construction path: bit-exact splitmix page-corpus replication (KgSql)
    "q_html_extract" -> KgSql.extractSql,
    "q_kg_mentions" -> KgSql.mentionsSql,
    "q_el_priors" -> KgSql.elPriorSql,
    "q_kg_triples" -> KgSql.triplesSql,
    "q_kg_prop_table" -> KgSql.propTableSql,
    "q_kg_bgp" -> KgSql.bgpSql,
    "q_kg_summary" -> KgSql.summarySql,
    "q_kg_domain_range" -> KgSql.domainRangeSql,
    "q_kg_degrees" -> KgSql.degreesSql,
    "q_kg_reciprocity" -> KgSql.reciprocitySql,
    "q_kg_degree_dist" -> KgSql.degreeDistSql,
    "q_kg_assortativity" -> KgSql.assortativitySql,
    "q_kg_pagerank" -> KgSql.pageRankSql,
    "q_kg_ppr" -> KgSql.pprSql,
    "q_kg_triangles" -> KgSql.trianglesSql,
    "q_kg_clustering" -> KgSql.clusteringSql,
    "q_kg_jaccard" -> KgSql.neighborJaccardSql(maxDeg = 64L, minShared = 2L),
    "q_kg_resource_alloc" -> KgSql.resourceAllocSql(maxDeg = 64L, minShared = 2L),
    "q_kg_signatures" -> KgSql.signaturesSql,
    "q_kg_pred_stats" -> KgSql.predStatsSql,
    // ontology entailment / constraint QA: recursive-CTE closure + VALUES
    // class map in the oracle vs pointer-squaring + broadcast in the engine
    "q_kg_subclass" -> KgSql.subClassClosureSql,
    "q_kg_rdfs_types" -> KgSql.rdfsTypesSql,
    "q_kg_constraints" -> KgSql.constraintsSql,
    "q_kg_dangling" -> KgSql.danglingSql,
    "q_kg_type_counts" -> KgSql.typeCountsSql,
    "q_kg_domain_check" -> KgSql.domainCheckSql,
    // fact fusion: window election in the oracle vs the engine's algebraic
    // (-votes, o) struct-min; temporal intervals: warc_ts regenerated
    // closed-form from the splitmix rule
    "q_kg_fuse" -> KgSql.fuseSql,
    "q_kg_temporal" -> KgSql.temporalSql,
    "q_kg_cooccur" -> KgSql.cooccurSql,
    // sameAs closure + canonical triple table: recursive-CTE transitive
    // closure vs the engine's pointer-jumping CC over the same star edges
    "q_kg_entity_resolve" -> KgSql.entityResolveSql,
    "q_kg_canon_triples" -> KgSql.canonTriplesSql,
    // label election / snapshot delta / bounded BFS: window-argmax,
    // null-safe full-outer diff, and hop-unrolled closures in the oracle vs
    // algebraic struct-min, <=> join, and frontier loop in the engine
    "q_kg_labels" -> KgSql.labelsSql,
    "q_kg_diff" -> KgSql.snapshotDiffSql,
    "q_kg_neighbors" -> KgSql.neighborhoodSql,
    // embedding-training prep: dictionary ids by window row_number in the
    // oracle (semantics) vs the distributed prefix-sum rank in the engine;
    // negative tails by bit-exact HUGEINT splitmix64
    "q_kg_encode" -> KgSql.encodeSql,
    "q_kg_negatives" -> KgSql.negativesSql(seed = 13L),
    "q_kg_walks" -> KgSql.walksSql(seed = 17L, len = 3, maxDeg = 8),
    "q_kg_transe" -> KgSql.transeSql(dim = 8, entSeed = 101L,
      relSeed = 202L, negSeed = 13L),
    "q_kg_linkpred" -> KgSql.linkPredSql(dim = 8, entSeed = 101L,
      relSeed = 202L, candSeed = 31L, numCands = 16),
    "q_kg_linkpred_filtered" -> KgSql.linkPredFilteredSql(dim = 8,
      entSeed = 101L, relSeed = 202L, candSeed = 31L, numCands = 16),

    // JSON property extraction: per-row parity of the extracted integer
    "q_event_props" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,

    // ordered conversion funnel: conditional mins composed by user-keyed
    // joins — the same three levels, relationally
    "q_event_funnel" ->
      """WITH t1 AS (SELECT user_id, min(ts) AS signup_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(e.ts) AS view_ts
        |  FROM events e JOIN t1 ON t1.user_id = e.user_id
        |  WHERE e.event_type = 'view' AND e.ts >= t1.signup_ts GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(e.ts) AS purchase_ts
        |  FROM events e JOIN t2 ON t2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= t2.view_ts GROUP BY 1)
        |SELECT t1.user_id, t1.signup_ts, t2.view_ts, t3.purchase_ts,
        |  CAST(1 + (t2.user_id IS NOT NULL)::INT
        |    + (t3.user_id IS NOT NULL)::INT AS INT) AS stage
        |FROM t1 LEFT JOIN t2 ON t2.user_id = t1.user_id
        |LEFT JOIN t3 ON t3.user_id = t1.user_id""".stripMargin,
    // k-core: fixed peeling rounds unrolled as CTEs (engine-exactness via
    // the fixed-round contract, same as PageRank)
    "q_kg_kcore" -> KgSql.kCoreSql(k = 2L, rounds = 4),
    // LPA communities: fixed synchronous rounds unrolled; per-round argmax
    // stated as a window in the oracle, algebraic struct-min in the engine
    "q_kg_communities" -> KgSql.communitiesSql(rounds = 3),
    // predicate-pair lift: exact counts + one IEEE multiply-divide
    "q_kg_pred_lift" -> KgSql.predPairLiftSql,
    // integer HITS: fixed max-normalized half-rounds unrolled as CTEs
    "q_kg_hits" -> KgSql.hitsSql(rounds = 3),
    // length-2 predicate paths through hub-capped middle entities
    "q_kg_path_pairs" -> KgSql.pathPairsSql(maxMid = 64L, minPaths = 2L),
    "q_kg_anf" -> KgSql.hyperAnfSql(rounds = 2, preds = Queries.PathMiningPreds),
    "q_kg_anf_curve" -> KgSql.anfCurveSql(rounds = 3, preds = Queries.PathMiningPreds),
    // canonical N-Triples export, every line rebuilt closed-form
    "q_kg_export_nt" -> KgSql.exportNtSql,
    // provenance-preserving N-Quads export (graph term = lineage URL)
    "q_kg_export_nq" -> KgSql.exportNqSql,
    // skolemization: genid IRIs rebuilt closed-form from (url, label)
    "q_kg_skolem" -> KgSql.skolemSql,
    // VoID dataset card: five counts, each a pre-deduped single-row relation
    "q_kg_void" -> KgSql.voidSql,
    // newest capture per logical page: engine argmax = algebraic struct-max,
    // oracle = per-key window (semantics statement, not the scale plan)
    "q_crawl_latest" -> KgSql.crawlLatestSql,
    "q_scd2_history" -> KgSql.scd2Sql,
    // streaming path over the same corpus MUST reproduce the batch summary
    "q_stream_summary" -> KgSql.summarySql,

    // hash-blocked dedup/similarity: bit-exact splitmix64 replication (HashSql)
    "q_dedup_simhash" -> HashSql.simhashPairsSql(maxDist = 3, maxBucket = 1000),
    "q_dedup_minhash" -> HashSql.minhashLshSql(k = 3, threshold = 0.6, maxBucket = 1000),

    // clusters = transitive closure over the SAME pair derivation (the
    // engine's iterative min-label propagation vs a recursive-CTE closure)
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE pairs AS (
         |${HashSql.minhashLshSql(k = 3, threshold = 0.6, maxBucket = 1000)}
         |),
         |edges AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION
         |  SELECT id_b AS a, id_a AS b FROM pairs),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b)
         |SELECT CAST(a AS BIGINT) AS id,
         |  CAST(least(a, min(b)) AS BIGINT) AS component
         |FROM reach GROUP BY a""".stripMargin,
    // cluster-size histogram: same closure, sizes -> histogram + the
    // relationally-derived singleton row
    "q_dedup_cluster_stats" ->
      s"""WITH RECURSIVE pairs AS (
         |${HashSql.minhashLshSql(k = 3, threshold = 0.6, maxBucket = 1000)}
         |),
         |edges AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION
         |  SELECT id_b AS a, id_a AS b FROM pairs),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b),
         |comp AS (SELECT CAST(a AS BIGINT) AS id,
         |    CAST(least(a, min(b)) AS BIGINT) AS component
         |  FROM reach GROUP BY a),
         |sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS size
         |  FROM comp GROUP BY 1),
         |hist AS (SELECT size, CAST(count(*) AS BIGINT) AS n_clusters
         |  FROM sizes GROUP BY 1
         |  UNION ALL
         |  SELECT CAST(1 AS BIGINT),
         |    (SELECT count(*) FROM documents) - (SELECT count(*) FROM comp))
         |SELECT size, n_clusters, size * n_clusters AS n_docs FROM hist""".stripMargin,

    // cluster representative selection: same pair relation + closure as
    // q_dedup_clusters, then longest-member-min-id per component plus all
    // singletons (engine: algebraic struct-max, never a window)
    "q_dedup_rep" ->
      s"""WITH RECURSIVE pairs AS (
         |${HashSql.minhashLshSql(k = 3, threshold = 0.6, maxBucket = 1000)}
         |),
         |edges AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION
         |  SELECT id_b AS a, id_a AS b FROM pairs),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b),
         |comp AS (SELECT CAST(a AS BIGINT) AS id,
         |    CAST(least(a, min(b)) AS BIGINT) AS component
         |  FROM reach GROUP BY a),
         |base AS (SELECT doc_id AS id, CAST(length(text) AS BIGINT) AS len
         |  FROM documents),
         |members AS (SELECT base.id, base.len, comp.component
         |  FROM base JOIN comp USING (id)),
         |agg AS (SELECT component, CAST(count(*) AS BIGINT) AS n_members,
         |    max(len) AS maxlen
         |  FROM members GROUP BY 1),
         |reps AS (SELECT min(m.id) AS doc_id, a.n_members, a.maxlen AS len
         |  FROM members m JOIN agg a
         |    ON a.component = m.component AND m.len = a.maxlen
         |  GROUP BY m.component, a.n_members, a.maxlen)
         |SELECT doc_id, n_members, len FROM reps
         |UNION ALL
         |SELECT base.id AS doc_id, CAST(1 AS BIGINT) AS n_members, base.len
         |FROM base LEFT JOIN comp ON comp.id = base.id
         |WHERE comp.id IS NULL""".stripMargin,

    "q_sim_lsh" -> HashSql.srpLshSql(dim = 64, nPlanes = 10, nTables = 4,
      minSim = 0.3, maxBucket = 1000),
    "q_sim_ivf" -> HashSql.ivfFixedSql(dim = 64, nCells = 16, nProbe = 4, k = 5, nQueries = 10),
    "q_sem_dedup" -> HashSql.semanticDedupSql(dim = 64, nCells = 16, tau = 0.3, maxCell = 2000),

    // int8 max-abs quantization: identical double arithmetic (float32 widens
    // exactly), same HALF-AWAY-FROM-ZERO code rounding, ordered list_reduce
    // summation; scale/mse compared as RAW doubles (%.9g canon) — engine
    // round(,9) algorithms disagree at half boundaries, the raw bits don't
    "q_embed_quant" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
        |      'max') AS DOUBLE) / 127 AS scale
        |  FROM embeddings),
        |c AS (
        |  SELECT vec_id, scale, embedding,
        |    list_transform(embedding, x -> CASE WHEN scale = 0 THEN 0
        |      ELSE CAST(greatest(-127.0, least(127.0,
        |        round(CAST(x AS DOUBLE) / scale, 0))) AS INT) END) AS codes
        |  FROM q)
        |SELECT vec_id, scale,
        |  md5(array_to_string(codes, ',')) AS codes_md5,
        |  list_reduce(list_transform(
        |    list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE)
        |           - CAST(codes[CAST(i AS INT)] AS DOUBLE) * scale),
        |    d -> d * d), (acc, x) -> acc + x)
        |    / len(embedding) AS mse
        |FROM c""".stripMargin,

    // engine-exact integer Lloyd k-means (k=4, 2 assignment rounds): the
    // fixed rounds unrolled as CTEs; the per-vector argmin is a window here
    // (semantics) vs the array_position projection in the engine
    "q_kmeans" -> kmeansSql(k = 4, rounds = 2, dim = 64),

    "q_text_langid" -> langIdSql,

    // language-ID confusion matrix: the same argmax CTE joined back to the
    // declared lang, counted
    "q_langid_confusion" ->
      s"""WITH pl AS ($langIdSql)
         |SELECT d.lang, pl.pred_lang, CAST(count(*) AS BIGINT) AS n
         |FROM documents d JOIN pl ON pl.doc_id = d.doc_id
         |GROUP BY 1, 2""".stripMargin,

    "q_text_filter" ->
      s"""WITH lang AS ($langIdSql),
         |m AS (
         |  SELECT doc_id,
         |    CAST(${tokCountSql("text")} AS BIGINT) AS n_tokens,
         |    round(
         |      least(length(text) / 500.0, 1.0) * 0.4 +
         |      (CASE WHEN length(text) > 0 THEN
         |         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / length(text)
         |       ELSE 0.0 END) * 0.4 +
         |      (CASE WHEN ${tokCountSql("text")} > 0 THEN
         |         ${stopHitsSql("text", "en")} * 1.0 / ${tokCountSql("text")}
         |       ELSE 0.0 END) * 0.2,
         |    6) AS quality
         |  FROM documents)
         |SELECT m.doc_id, m.n_tokens, m.quality
         |FROM m JOIN lang ON lang.doc_id = m.doc_id
         |WHERE m.n_tokens >= 20 AND m.quality >= 0.5 AND lang.pred_lang = 'en'""".stripMargin,

    "q_split_train_val" -> HashSql.splitSql(valPermille = 50, seed = 42L),

    // corpus unigram LM: mirrors the engine's single-scan shape — aggregate
    // to (doc, tok, cnt) pairs, derive freq/total from that relation, and
    // score with the fixed-point micro-nat table: per-token
    // q = round(-ln(freq/total)*1e6) as BIGINT (DuckDB round = half away
    // from zero = Spark HALF_UP for these non-negative values), per-doc
    // fold = exact integer sum(cnt*q) over one correctly-rounded division —
    // the emitted raw double is bit-identical across engines, with no
    // boundary-seeking round() of a float sum (ADVICE r4 flake class)
    "q_text_unigram_lm" -> unigramLmSql,

    // positional inverted index: the position list is emitted as the
    // canonical ascending CSV (deterministic wire form the hasher can
    // compare); 0-based positions on both engines
    "q_index_postings" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
         |q AS (SELECT doc_id, u.pos AS pos, u.tok AS term FROM (
         |  SELECT doc_id, UNNEST(list_transform(range(len(toks)),
         |    i -> struct_pack(pos := i, tok := toks[CAST(i + 1 AS INT)]))) AS u
         |  FROM t))
         |SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
         |  array_to_string(list(pos ORDER BY pos), ',') AS positions
         |FROM q GROUP BY 1, 2""".stripMargin,

    // container round-trips: the oracle recomputes the hostile-payload
    // digest closed-form from the parquet table — it never reads the
    // CSV/JSON files, so any quoting loss in either engine direction fails
    "q_csv_roundtrip" ->
      """SELECT doc_id,
        |  md5(text || ', "q"' || chr(10) || '#' || (doc_id % 7)) AS payload_md5,
        |  CAST(length(text || ', "q"' || chr(10) || '#' || (doc_id % 7)) AS BIGINT)
        |    AS payload_len,
        |  lang
        |FROM documents""".stripMargin,

    "q_orc_roundtrip" ->
      """SELECT doc_id,
        |  md5(text || ', "q"' || chr(10) || '#' || (doc_id % 7)) AS payload_md5,
        |  CAST(length(text || ', "q"' || chr(10) || '#' || (doc_id % 7)) AS BIGINT)
        |    AS payload_len,
        |  lang
        |FROM documents""".stripMargin,

    "q_json_roundtrip" ->
      """SELECT doc_id,
        |  md5(text || ', "q"' || chr(10) || '#' || (doc_id % 7)) AS payload_md5,
        |  CAST(length(text || ', "q"' || chr(10) || '#' || (doc_id % 7)) AS BIGINT)
        |    AS payload_len,
        |  lang
        |FROM documents""".stripMargin,

    // event-rate anomaly: integer z-squared cross-multiplication — no
    // division or float anywhere
    "q_event_anomaly" ->
      """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS h,
        |    CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS sq
        |  FROM hourly GROUP BY 1)
        |SELECT hourly.event_type, hourly.hour, hourly.n,
        |  CAST((h * n - s) * (h * n - s) AS BIGINT) AS dev_num,
        |  CAST(h * sq - s * s AS BIGINT) AS var_num,
        |  (h * n - s) * (h * n - s) > 4 * (h * sq - s * s) AS is_anomaly
        |FROM hourly JOIN st ON st.event_type = hourly.event_type""".stripMargin,

    // first-order Markov transitions: per-user lag in (ts, event_id)
    // order, |types|^2 rollup, integer per-mille row normalization
    "q_event_markov" ->
      """WITH s AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |tr AS (SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_from
        |  FROM tr GROUP BY 1)
        |SELECT tr.prev_type, tr.event_type, tr.n, tot.n_from,
        |  CAST(tr.n * 1000 // tot.n_from AS BIGINT) AS p_pm
        |FROM tr JOIN tot USING (prev_type)""".stripMargin,

    // weekly retention cohorts: per-user min week, distinct activity set,
    // integer per-mille of the cohort size — all-integer, engine-exact
    "q_retention_cohorts" ->
      """WITH f AS (SELECT user_id,
        |    CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
        |  FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT e.user_id, f.cohort,
        |    CAST(date_diff('day', f.cohort,
        |      CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INT) AS week_offset
        |  FROM events e JOIN f USING (user_id)),
        |s AS (SELECT cohort, count(*) AS cu FROM a WHERE week_offset = 0
        |  GROUP BY 1)
        |SELECT a.cohort, a.week_offset, CAST(count(*) AS BIGINT) AS active_users,
        |  CAST(count(*) * 1000 // s.cu AS BIGINT) AS retention_pm
        |FROM a JOIN s USING (cohort) GROUP BY 1, 2, s.cu""".stripMargin,

    // MERGE/upsert: the delta is closed-form in the snapshot, the merge is
    // one FULL OUTER JOIN + coalesce on both engines
    "q_merge_upsert" ->
      """WITH b AS (SELECT doc_id, text, lang FROM documents),
        |u AS (SELECT doc_id, text || ' [rev2]' AS text, lang FROM b
        |  WHERE doc_id % 10 = 0),
        |i AS (SELECT doc_id + 1000000 AS doc_id,
        |    'fresh crawl ' || doc_id AS text, 'en' AS lang
        |  FROM b WHERE doc_id % 7 = 3),
        |d AS (SELECT * FROM u UNION ALL SELECT * FROM i)
        |SELECT doc_id, md5(coalesce(d.text, b.text)) AS text_md5,
        |  coalesce(d.lang, b.lang) AS lang,
        |  CASE WHEN d.text IS NOT NULL AND b.text IS NOT NULL THEN 'updated'
        |       WHEN b.text IS NULL THEN 'inserted' ELSE 'kept' END AS op
        |FROM b FULL OUTER JOIN d USING (doc_id)""".stripMargin,

    // Iceberg-class manifest pruning: file-level min/max stats + the
    // inclusive-projection verdict + ground-truth match counts
    "q_partition_prune" ->
      """SELECT CAST(doc_id % 16 AS INT) AS file_id,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  min(lang) AS min_lang, max(lang) AS max_lang,
        |  (min(lang) <= 'en' AND 'en' <= max(lang)
        |    AND max(n_chars) >= 500 AND min(n_chars) <= 2000) AS must_read,
        |  CAST(sum(CASE WHEN lang = 'en' AND n_chars BETWEEN 500 AND 2000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_matching
        |FROM documents GROUP BY 1""".stripMargin,

    // hopping windows: the 4-overlapping-window assignment expanded from
    // epoch arithmetic (w=3600s, s=900s, epoch-0 aligned, UTC session)
    "q_hopping_window" ->
      """WITH k AS (SELECT unnest(range(0, 4)) AS k),
        |w AS (SELECT e.event_type, e.user_id,
        |    TIMESTAMP '1970-01-01 00:00:00'
        |      + ((CAST(floor(epoch(e.ts)) AS BIGINT) // 900 - k.k) * 900)
        |        * INTERVAL 1 SECOND AS wstart
        |  FROM events e, k)
        |SELECT wstart, wstart + INTERVAL 3600 SECOND AS wend, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(user_id) AS BIGINT) AS user_sum
        |FROM w GROUP BY 1, 2, 3""".stripMargin,

    "q_stream_hopping" ->
      """WITH k AS (SELECT unnest(range(0, 4)) AS k),
        |w AS (SELECT e.event_type, e.user_id,
        |    TIMESTAMP '1970-01-01 00:00:00'
        |      + ((CAST(floor(epoch(e.ts)) AS BIGINT) // 900 - k.k) * 900)
        |        * INTERVAL 1 SECOND AS wstart
        |  FROM events e, k)
        |SELECT wstart, wstart + INTERVAL 3600 SECOND AS wend, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(user_id) AS BIGINT) AS user_sum
        |FROM w GROUP BY 1, 2, 3""".stripMargin,

    // update-mode history replay: per (window, type, batch) contributions,
    // running sums over the batch order, one emitted row per contributing
    // batch (cumulative counts strictly increase -> rows unique)
    "q_stream_update" ->
      """WITH e AS (SELECT *, CAST((event_id % 8) // 2 AS INT) AS batch,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 * 3600 AS ws
        |  FROM events),
        |g AS (SELECT ws, event_type, batch, count(*) AS nb,
        |    sum(user_id) AS ub
        |  FROM e GROUP BY 1, 2, 3)
        |SELECT TIMESTAMP '1970-01-01 00:00:00' + ws * INTERVAL 1 SECOND
        |    AS wstart,
        |  TIMESTAMP '1970-01-01 00:00:00' + (ws + 3600) * INTERVAL 1 SECOND
        |    AS wend,
        |  event_type,
        |  CAST(sum(nb) OVER (PARTITION BY ws, event_type ORDER BY batch)
        |    AS BIGINT) AS n_events,
        |  CAST(sum(ub) OVER (PARTITION BY ws, event_type ORDER BY batch)
        |    AS BIGINT) AS user_sum
        |FROM g""".stripMargin,

    // custom-state replay: cumulative event counts + distinct-type counts
    // per (user, contributing batch) over the deterministic schedule
    "q_stream_state" ->
      """WITH e AS (SELECT *, CAST((event_id % 8) // 2 AS INT) AS batch
        |  FROM events),
        |g AS (SELECT user_id, batch, count(*) AS nb FROM e GROUP BY 1, 2),
        |cum AS (SELECT user_id, batch,
        |    CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY batch)
        |      AS BIGINT) AS n_events
        |  FROM g),
        |ty AS (SELECT user_id, event_type, min(batch) AS fb
        |  FROM e GROUP BY 1, 2),
        |tc AS (SELECT c.user_id, c.batch, c.n_events,
        |    CAST(count(*) AS BIGINT) AS n_types
        |  FROM cum c JOIN ty ON ty.user_id = c.user_id AND ty.fb <= c.batch
        |  GROUP BY 1, 2, 3)
        |SELECT user_id, n_events, n_types FROM tc""".stripMargin,

    // mutual-kNN: both-direction top-5 membership from the all-pairs
    // cosine ranking
    "q_embed_mutual_knn" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(
        |      list_aggregate(list_transform(range(1, len(q.embedding) + 1),
        |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), 'sum')
        |      / (sqrt(list_aggregate(list_transform(range(1, len(q.embedding) + 1),
        |           i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), 'sum'))
        |       * sqrt(list_aggregate(list_transform(range(1, len(c.embedding) + 1),
        |           i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), 'sum'))),
        |      6) AS sim
        |  FROM embeddings q, embeddings c WHERE c.vec_id <> q.vec_id),
        |t AS (SELECT query_id, neighbor_id, sim,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS INT) AS rank
        |  FROM scored QUALIFY rank <= 5)
        |SELECT a.query_id AS a, a.neighbor_id AS b,
        |  a.rank AS rank_ab, b.rank AS rank_ba, a.sim
        |FROM t a JOIN t b
        |  ON b.query_id = a.neighbor_id AND b.neighbor_id = a.query_id
        |WHERE a.query_id < a.neighbor_id""".stripMargin,

    // append-mode watermark replay: batch maxima -> lagged eviction
    // watermark -> late-filter -> final emission horizon, all exact ms
    // integers (Spark's two-watermark rule, probe-pinned)
    "q_stream_late" ->
      """WITH base AS (SELECT event_id, ts, user_id, event_type,
        |    ntile(8) OVER (ORDER BY ts, event_id) - 1 AS b_nat
        |  FROM events),
        |bb AS (SELECT *,
        |    CAST((CASE WHEN event_id % 37 = 0 THEN (b_nat + 3) % 8
        |          ELSE b_nat END) // 2 AS INT) AS batch,
        |    epoch_ms(ts) AS ems,
        |    (CAST(floor(epoch(ts)) AS BIGINT) // 600 * 600 + 600) * 1000
        |      AS wend_ms
        |  FROM base),
        |bm AS (SELECT batch, max(ems) AS bmax FROM bb GROUP BY 1),
        |wmx AS (SELECT batch,
        |    max(bmax) OVER (ORDER BY batch
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 600000
        |      AS wm_evict
        |  FROM bm),
        |wl AS (SELECT batch, wm_evict,
        |    lag(wm_evict) OVER (ORDER BY batch) AS wm_late FROM wmx),
        |fin AS (SELECT max(bmax) - 600000 AS wm_final FROM bm),
        |kept AS (SELECT bb.* FROM bb JOIN wl USING (batch)
        |  WHERE wl.wm_late IS NULL OR bb.wend_ms > wl.wm_late)
        |SELECT TIMESTAMP '1970-01-01 00:00:00'
        |    + (kept.wend_ms // 1000 - 600) * INTERVAL 1 SECOND AS wstart,
        |  TIMESTAMP '1970-01-01 00:00:00'
        |    + (kept.wend_ms // 1000) * INTERVAL 1 SECOND AS wend,
        |  event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(user_id) AS BIGINT) AS user_sum
        |FROM kept, fin WHERE kept.wend_ms <= fin.wm_final
        |GROUP BY 1, 2, 3""".stripMargin,

    // collocation lift: integer PMI transform, support filter before joins
    "q_colloc_lift" ->
      s"""WITH toks AS (SELECT ${toksSql("text")} AS toks FROM documents),
         |uni AS (SELECT u.tok, CAST(count(*) AS BIGINT) AS n_tok
         |  FROM toks, UNNEST(toks) AS u(tok) GROUP BY 1),
         |pr AS (SELECT toks[CAST(r.i AS INT)] AS a,
         |    toks[CAST(r.i AS INT) + 1] AS b
         |  FROM toks, UNNEST(range(1, len(toks))) AS r(i)
         |  WHERE len(toks) >= 2),
         |pc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab FROM pr
         |  GROUP BY 1, 2 HAVING count(*) >= 5),
         |t AS (SELECT CAST(sum(len(toks) - 1) AS BIGINT) AS t_pairs
         |  FROM toks WHERE len(toks) >= 2)
         |SELECT pc.a, pc.b, pc.n_ab, ua.n_tok AS n_a, ub.n_tok AS n_b,
         |  CAST(pc.n_ab * t.t_pairs * 1000 // (ua.n_tok * ub.n_tok) AS BIGINT)
         |    AS lift_pm
         |FROM pc
         |JOIN uni ua ON ua.tok = pc.a
         |JOIN uni ub ON ub.tok = pc.b
         |CROSS JOIN t""".stripMargin,

    // salted join parity: the oracle is the PLAIN unsalted join — salting
    // must change the shuffle distribution and nothing else
    "q_salted_join" ->
      """WITH dim AS (SELECT DISTINCT event_type,
        |    CAST(length(event_type) AS BIGINT) AS type_weight FROM events)
        |SELECT e.event_type, dim.type_weight, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(e.user_id) AS BIGINT) AS user_sum
        |FROM events e JOIN dim USING (event_type) GROUP BY 1, 2""".stripMargin,

    // windowed PCM features: the generation rule expanded over a frame
    // series the oracle builds itself — every column is an exact integer
    // from decoded samples; win = f*4/nf, crossings attributed to the
    // window of the LATER frame
    "q_audio_energy" ->
      """WITH m AS (SELECT doc_id AS id, 256 + (doc_id * 7) % 512 AS nf
        |  FROM documents),
        |s AS (SELECT id, nf, f,
        |    (id * 31 + f * 17) % 65536 - 32768 AS v,
        |    CASE WHEN f = 0 THEN NULL
        |         ELSE (id * 31 + (f - 1) * 17) % 65536 - 32768 END AS pv,
        |    CAST(f * 4 // nf AS INT) AS win
        |  FROM m, LATERAL (SELECT unnest(range(0, CAST(nf AS BIGINT))) AS f) t)
        |SELECT id, win, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(abs(v)) AS BIGINT) AS abs_energy,
        |  CAST(max(abs(v)) AS INT) AS peak,
        |  CAST(sum(CASE WHEN pv IS NOT NULL AND ((v < 0) <> (pv < 0))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross
        |FROM s GROUP BY 1, 2""".stripMargin,

    // unpivot: wide -> long reshape, one UNION ALL per metric on the
    // oracle side, the stack generator on the engine side
    "q_unpivot" ->
      s"""WITH m AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
         |    CAST(${tokCountSql("text")} AS BIGINT) AS toks,
         |    n_chars AS chars
         |  FROM documents)
         |SELECT doc_id, 'len' AS metric, len AS value FROM m
         |UNION ALL SELECT doc_id, 'toks', toks FROM m
         |UNION ALL SELECT doc_id, 'chars', chars FROM m""".stripMargin,

    // corpus drift: exact integer TV distance — cross-multiplied absolute
    // differences, no logarithm anywhere
    "q_corpus_drift" ->
      s"""WITH d AS (SELECT lang,
         |    CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 'a'
         |         ELSE 'b' END AS grp, text
         |  FROM documents),
         |tk AS (SELECT lang, grp, u.tok
         |  FROM d, UNNEST(${toksSql("text")}) AS u(tok)),
         |counts AS (SELECT lang, tok,
         |    CAST(sum(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         |    CAST(sum(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS c_b
         |  FROM tk GROUP BY 1, 2),
         |tot AS (SELECT lang, CAST(sum(c_a) AS BIGINT) AS n_a,
         |    CAST(sum(c_b) AS BIGINT) AS n_b
         |  FROM counts GROUP BY 1)
         |SELECT c.lang, t.n_a, t.n_b, CAST(count(*) AS BIGINT) AS vocab,
         |  CAST(sum(abs(c.c_a * t.n_b - c.c_b * t.n_a)) AS BIGINT) AS tv_num,
         |  CAST(sum(abs(c.c_a * t.n_b - c.c_b * t.n_a)) * 1000
         |    // (2 * t.n_a * t.n_b) AS BIGINT) AS tv_pm
         |FROM counts c JOIN tot t USING (lang) GROUP BY 1, 2, 3""".stripMargin,

    // integer readability profile: same sentence-run and token contracts as
    // q_text_sentences / q_text_tokens, per-mille composites via integer
    // division — engine-exact throughout
    "q_text_readability" ->
      s"""WITH a AS (SELECT doc_id, text,
         |    'Dr. No!! ' || replace(text, ' data ', '. Data? ')
         |      || chr(10) || 'Last line has no terminator' AS aug
         |  FROM documents),
         |c AS (SELECT doc_id,
         |    CAST(len(regexp_extract_all(aug, '[^.!?]*[.!?]+\\s*|[^.!?]+$$'))
         |      AS BIGINT) AS n_sents,
         |    CAST(${tokCountSql("text")} AS BIGINT) AS n_words,
         |    CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+')) AS BIGINT)
         |      AS n_vowel_groups,
         |    CAST(len(list_filter(${toksSql("text")}, x -> len(x) >= 7))
         |      AS BIGINT) AS n_long_words
         |  FROM a)
         |SELECT doc_id, n_sents, n_words, n_vowel_groups, n_long_words,
         |  CAST(n_words * 1000 // greatest(n_sents, 1)
         |    + n_vowel_groups * 1000 // greatest(n_words, 1) AS BIGINT)
         |    AS reading_pm,
         |  CAST(n_long_words * 1000 // greatest(n_words, 1) AS BIGINT)
         |    AS long_pm
         |FROM c""".stripMargin,

    // Kneser-Ney continuation counts: distinct-pair pre-dedup then
    // algebraic type counts
    "q_kn_counts" ->
      s"""WITH t AS (SELECT ${toksSql("text")} AS toks FROM documents),
         |f AS (SELECT UNNEST(toks) AS term FROM t),
         |freq AS (SELECT term, CAST(count(*) AS BIGINT) AS freq FROM f GROUP BY 1),
         |pr AS (SELECT DISTINCT
         |    toks[CAST(i + 1 AS INT)] AS prev, toks[CAST(i + 2 AS INT)] AS cur
         |  FROM (SELECT toks, UNNEST(range(len(toks) - 1)) AS i FROM t
         |        WHERE len(toks) >= 2)),
         |lt AS (SELECT cur AS term, CAST(count(*) AS BIGINT) AS n_left_types
         |  FROM pr GROUP BY 1),
         |rt AS (SELECT prev AS term, CAST(count(*) AS BIGINT) AS n_right_types
         |  FROM pr GROUP BY 1)
         |SELECT freq.term, freq.freq,
         |  CAST(COALESCE(lt.n_left_types, 0) AS BIGINT) AS n_left_types,
         |  CAST(COALESCE(rt.n_right_types, 0) AS BIGINT) AS n_right_types
         |FROM freq LEFT JOIN lt ON lt.term = freq.term
         |LEFT JOIN rt ON rt.term = freq.term""".stripMargin,

    // tokenizer fertility per language: exact integer per-mille
    "q_tokenizer_fertility" ->
      s"""WITH m AS (SELECT lang,
         |    CAST(${tokCountSql("text")} AS BIGINT) AS nt,
         |    CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]'))
         |      AS BIGINT) AS nb
         |  FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS n_tokens,
         |  CAST(sum(nb) AS BIGINT) AS n_subwords,
         |  CAST(sum(nb) * 1000 // greatest(sum(nt), 1) AS BIGINT)
         |    AS subwords_per_1000_tokens
         |FROM m GROUP BY 1""".stripMargin,

    // multi-round BPE merge training: three unrolled select-and-rewrite
    // rounds; argmax as a scalar subquery; replace() is left-to-right
    // non-overlapping on both engines
    "q_bpe_merges" -> {
      def pcte(i: Int): String =
        s"""p$i AS (SELECT UNNEST(list_transform(range(len(string_split(s, ' ')) - 1),
           |    i -> string_split(s, ' ')[CAST(i + 1 AS INT)] || ' ' ||
           |         string_split(s, ' ')[CAST(i + 2 AS INT)])) AS pair
           |  FROM t${i - 1} WHERE len(string_split(s, ' ')) >= 2),
           |g$i AS (SELECT pair FROM (
           |    SELECT pair, count(*) AS freq FROM p$i GROUP BY 1)
           |  ORDER BY freq DESC, pair ASC LIMIT 1),
           |t$i AS MATERIALIZED (SELECT doc_id,
           |    trim(replace(' ' || s || ' ',
           |      ' ' || (SELECT pair FROM g$i) || ' ',
           |      ' ' || replace((SELECT pair FROM g$i), ' ', '_') || ' ')) AS s
           |  FROM t${i - 1})""".stripMargin
      s"""WITH t0 AS MATERIALIZED (SELECT doc_id,
         |    array_to_string(${toksSql("text")}, ' ') AS s FROM documents),
         |${pcte(1)},
         |${pcte(2)},
         |${pcte(3)}
         |SELECT doc_id, md5(s) AS tok_md5,
         |  CAST(len(string_split(s, ' ')) AS BIGINT) AS n_tokens,
         |  (SELECT pair FROM g1) AS m1,
         |  (SELECT pair FROM g2) AS m2,
         |  (SELECT pair FROM g3) AS m3
         |FROM t3""".stripMargin
    },

    // MLM masking plan: bit-exact splitmix selection (mod 1000 < 150) and
    // 80-10-10 action draw (independent second mix, seed+1)
    "q_mlm_mask" -> {
      val key = "CAST(doc_id * 1000003 + pos AS HUGEINT)"
      val sel = HashSql.mix64(HashSql.xor64(key, "CAST(23 AS HUGEINT)"))
      val act = HashSql.mix64(HashSql.xor64(key, "CAST(24 AS HUGEINT)"))
      s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
         |q AS (SELECT doc_id, u.pos AS pos, u.tok AS term FROM (
         |  SELECT doc_id, UNNEST(list_transform(range(len(toks)),
         |    i -> struct_pack(pos := i, tok := toks[CAST(i + 1 AS INT)]))) AS u
         |  FROM t))
         |SELECT doc_id, CAST(pos AS INT) AS pos, term,
         |  CASE WHEN ($act) % 10 < 8 THEN 'mask'
         |       WHEN ($act) % 10 = 8 THEN 'random' ELSE 'keep' END AS action
         |FROM q WHERE ($sel) % 1000 < 150""".stripMargin
    },

    // Elias-Fano index sizing: exact integer bit accounting from
    // (df, universe) only — l = bit_length(universe // df) - 1
    "q_index_size" ->
      s"""WITH td AS (SELECT DISTINCT doc_id,
         |    UNNEST(${toksSql("text")}) AS term FROM documents),
         |u AS (SELECT count(*) AS n FROM documents),
         |f AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM td GROUP BY 1)
         |SELECT term, df,
         |  CAST(length(bin((SELECT n FROM u) // df)) - 1 AS BIGINT) AS l_bits,
         |  CAST(df * (length(bin((SELECT n FROM u) // df)) + 1) AS BIGINT) AS ef_bits,
         |  CAST((df * (length(bin((SELECT n FROM u) // df)) + 1) + 7) // 8 AS BIGINT)
         |    AS ef_bytes
         |FROM f""".stripMargin,

    // exact phrase adjacency: same position relation, one equi-join per
    // phrase term on (doc, aligned start position)
    "q_phrase_search" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
         |q AS (SELECT doc_id, u.pos AS pos, u.tok AS term FROM (
         |  SELECT doc_id, UNNEST(list_transform(range(len(toks)),
         |    i -> struct_pack(pos := i, tok := toks[CAST(i + 1 AS INT)]))) AS u
         |  FROM t)),
         |m0 AS (SELECT doc_id, pos AS p0 FROM q WHERE term = 'customer'),
         |m1 AS (SELECT doc_id, pos - 1 AS p0 FROM q WHERE term = 'vector'),
         |mm AS (SELECT m0.doc_id, m0.p0 FROM m0 JOIN m1 USING (doc_id, p0))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
         |  CAST(min(p0) AS BIGINT) AS first_pos
         |FROM mm GROUP BY 1""".stripMargin,

    // integer TF-IDF keywords: idf quantized once to micro-nats, score a
    // pure integer product; per-doc window group size is bounded by the
    // document's own distinct-term count (not a hot-key window)
    "q_keywords_tfidf" ->
      s"""WITH toks AS (
         |  SELECT doc_id AS id,
         |    UNNEST(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |      x -> len(x) > 0)) AS tok
         |  FROM documents),
         |dt AS (SELECT id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
         |nd AS (SELECT CAST(count(DISTINCT id) AS BIGINT) AS n FROM dt),
         |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY 1),
         |idf AS (SELECT tok,
         |  CAST(round(ln(CAST(n AS DOUBLE) / df) * 1000000) AS BIGINT) AS idf
         |  FROM dfq, nd),
         |sc AS (SELECT id, dt.tok, dt.tf * idf.idf AS score
         |  FROM dt JOIN idf USING (tok)),
         |rk AS (SELECT id, tok, score,
         |  row_number() OVER (PARTITION BY id ORDER BY score DESC, tok) AS rn
         |  FROM sc)
         |SELECT id AS doc_id, tok AS term, CAST(score AS BIGINT) AS score,
         |  CAST(rn AS BIGINT) AS rnk
         |FROM rk WHERE rn <= 3""".stripMargin,

    // BM25 with everything integral but the once-quantized per-term idf:
    // the tf/length saturation is pure integer arithmetic (`//` ≡ Spark
    // `div` on positive operands) and the per-doc fold an integer sum, so
    // ranking ties break identically; docs matching no query term are absent
    "q_bm25_topk" ->
      s"""WITH toks AS (
         |  SELECT doc_id AS id,
         |    UNNEST(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |      x -> len(x) > 0)) AS tok
         |  FROM documents),
         |dt AS (SELECT id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT id, CAST(sum(tf) AS BIGINT) AS dl FROM dt GROUP BY 1),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  greatest(CAST(1 AS BIGINT),
         |    CAST(sum(dl) AS BIGINT) // CAST(count(*) AS BIGINT)) AS avgdl FROM dl),
         |dft AS (SELECT tok, CAST(count(*) AS BIGINT) AS dft FROM dt
         |  WHERE tok IN ('customer', 'vector', 'dup') GROUP BY 1),
         |idf AS (SELECT tok,
         |  CAST(round(ln((st.n - dft + 0.5) / (dft + 0.5) + 1) * 1000000) AS BIGINT) AS idf
         |  FROM dft, st),
         |hit AS (SELECT dt.id, idf.idf, dt.tf, dl.dl, st.avgdl
         |  FROM dt JOIN idf USING (tok) JOIN dl USING (id), st),
         |sc AS (SELECT id,
         |  CAST(sum((idf * ((tf * 2200000 * avgdl)
         |    // (tf * 1000000 * avgdl + 12000 * (25 * avgdl + 75 * dl)))) // 1000000)
         |    AS BIGINT) AS score,
         |  CAST(count(*) AS BIGINT) AS n_terms
         |  FROM hit GROUP BY 1)
         |SELECT id AS doc_id, score, n_terms FROM sc
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // CCNet head/middle/tail: the oracle's global ntile window IS the
    // semantics the engine's distributed prefix-sum rank must reproduce
    // (rankBuckets' closed-form bucket = SQL ntile by construction)
    "q_ppl_buckets" ->
      s"""WITH nlp AS ($unigramLmSql)
         |SELECT doc_id, neg_logprob,
         |  CAST(row_number() OVER (ORDER BY neg_logprob, doc_id) AS BIGINT) AS rank,
         |  CAST(ntile(3) OVER (ORDER BY neg_logprob, doc_id) AS BIGINT) AS bucket
         |FROM nlp""".stripMargin,

    // pack_id = floor(exclusive id-ordered cumsum of tokens / budget); the
    // oracle's global window IS the semantics the engine's two-pass
    // distributed prefix sum must reproduce
    "q_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST(${tokCountSql("text")} AS BIGINT) AS n_tokens FROM documents)
         |SELECT doc_id AS id, n_tokens,
         |  CAST(COALESCE(sum(n_tokens) OVER
         |    (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512
         |    AS BIGINT) AS pack_id
         |FROM t""".stripMargin,

    // concat-and-chunk block spans: window prefix sum in the oracle
    // (semantics) vs the two-pass distributed prefix sum in the engine
    "q_chunk_blocks" ->
      s"""WITH t AS (
         |  SELECT doc_id AS id, CAST(${tokCountSql("text")} AS BIGINT) AS n FROM documents),
         |c AS (
         |  SELECT id, n, CAST(COALESCE(sum(n) OVER
         |    (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS BIGINT) AS g
         |  FROM t),
         |e AS (
         |  SELECT id, n, g,
         |    unnest(generate_series(g // 256, (g + n - 1) // 256)) AS block_id
         |  FROM c WHERE n > 0)
         |SELECT id, CAST(block_id AS BIGINT) AS block_id,
         |  CAST(greatest(block_id * 256, g) - g AS BIGINT) AS doc_start,
         |  CAST(least((block_id + 1) * 256, g + n) - greatest(block_id * 256, g)
         |    AS BIGINT) AS n_toks
         |FROM e""".stripMargin,

    // unicode + whitespace normalization over the same doc_id-derived dirt:
    // NFC via nfc_normalize (both engines implement the same Unicode
    // standard), then the identical global-regex step chain
    // per-script codepoint counts through RE2's Unicode script tables —
    // the identical subtraction form the engine runs through Java regex;
    // the fixed-priority dominant CASE chain is replicated verbatim
    "q_script_profile" ->
      """WITH t AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 7 = 1 THEN ' Привет мир дом'
        |         WHEN doc_id % 7 = 2 THEN ' 你好世界汉字'
        |         WHEN doc_id % 7 = 3 THEN ' مرحبا بالعالم'
        |         WHEN doc_id % 7 = 4 THEN ' Привет 你好 مرحبا'
        |         ELSE '' END AS t
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  CAST(len(t) AS BIGINT) AS n_cp,
        |  CAST(len(t) - len(regexp_replace(t, '\p{Latin}', '', 'g')) AS BIGINT) AS n_latin,
        |  CAST(len(t) - len(regexp_replace(t, '\p{Cyrillic}', '', 'g')) AS BIGINT) AS n_cyrillic,
        |  CAST(len(t) - len(regexp_replace(t, '\p{Han}', '', 'g')) AS BIGINT) AS n_han,
        |  CAST(len(t) - len(regexp_replace(t, '\p{Arabic}', '', 'g')) AS BIGINT) AS n_arabic
        |  FROM t)
        |SELECT doc_id, n_cp, n_latin, n_cyrillic, n_han, n_arabic,
        |  CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_han AND n_latin >= n_arabic THEN 'latin'
        |       WHEN n_cyrillic >= n_han AND n_cyrillic >= n_arabic THEN 'cyrillic'
        |       WHEN n_han >= n_arabic THEN 'han' ELSE 'arabic' END AS dominant
        |FROM c""".stripMargin,

    // WARC export round trip: the oracle rebuilds the record text the writer
    // must produce (fixed header order, CRLF framing) and hashes it — the
    // engine's values come from REPARSING its own written bytes
    "q_warc_export" ->
      """WITH r AS (SELECT doc_id,
        |    'http://docs.example.org/' || doc_id AS target_uri, text,
        |    'WARC/1.0' || chr(13) || chr(10) ||
        |    'WARC-Type: response' || chr(13) || chr(10) ||
        |    'WARC-Target-URI: http://docs.example.org/' || doc_id
        |      || chr(13) || chr(10) ||
        |    'Content-Type: text/plain' || chr(13) || chr(10) ||
        |    'Content-Length: ' || length(text) || chr(13) || chr(10)
        |      || chr(13) || chr(10) ||
        |    text || chr(13) || chr(10) || chr(13) || chr(10) AS rec
        |  FROM documents)
        |SELECT doc_id, target_uri,
        |  CAST(length(text) AS BIGINT) AS content_length,
        |  md5(text) AS payload_md5,
        |  CAST(length(rec) AS BIGINT) AS seg_len,
        |  md5(rec) AS seg_md5
        |FROM r""".stripMargin,

    // HTTP body decoding: decoded digest/length + parsed encoding flags all
    // pinned closed-form from the id rule (engine decodes real gzip/chunked)
    "q_http_body" ->
      """SELECT doc_id,
        |  (doc_id % 2 = 1) AS chunked,
        |  (doc_id % 4 >= 2) AS gzipped,
        |  md5(text) AS body_md5,
        |  CAST(length(text) AS BIGINT) AS body_len,
        |  TRUE AS matches
        |FROM documents""".stripMargin,

    // sentence segmentation: the same complete-partition pattern replayed
    // relationally — offsets by window prefix sum over raw match lengths
    "q_text_sentences" ->
      """WITH a AS (SELECT doc_id,
        |    'Dr. No!! ' || replace(text, ' data ', '. Data? ')
        |      || chr(10) || 'Last line has no terminator' AS aug
        |  FROM documents),
        |m AS (SELECT doc_id,
        |    regexp_extract_all(aug, '[^.!?]*[.!?]+\s*|[^.!?]+$') AS parts FROM a),
        |u AS (SELECT doc_id, CAST(u.i AS BIGINT) - 1 AS sent_idx, parts[u.i] AS part
        |  FROM m, UNNEST(range(1, len(parts) + 1)) AS u(i)),
        |w AS (SELECT doc_id, sent_idx,
        |    CAST(coalesce(sum(length(part)) OVER (PARTITION BY doc_id ORDER BY sent_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start,
        |    CAST(length(part) AS BIGINT) AS raw_len,
        |    rtrim(part, ' ' || chr(9) || chr(10) || chr(13)) AS sent
        |  FROM u)
        |SELECT doc_id, sent_idx, start, raw_len, md5(sent) AS sent_md5,
        |  CAST(length(sent) AS BIGINT) AS sent_len
        |FROM w""".stripMargin,

    // bitext URL-pattern mining: normalize away the language segment, drop
    // ambiguous (slug, lang) slots, pair distinct-language survivors under
    // the integer length-ratio band
    "q_bitext_pairs" ->
      """WITH p AS (SELECT
        |    'mirror.example.org/page' || CAST(doc_id // 8 AS VARCHAR) AS key,
        |    lang,
        |    'https://mirror.example.org/' || lang || '/page'
        |      || CAST(doc_id // 8 AS VARCHAR) AS url,
        |    CAST(length(text) AS BIGINT) AS len
        |  FROM documents),
        |u AS (SELECT key, lang, min(url) AS url, min(len) AS len
        |  FROM p GROUP BY key, lang HAVING count(*) = 1)
        |SELECT a.key, a.lang AS lang_a, a.url AS url_a, a.len AS len_a,
        |  b.lang AS lang_b, b.url AS url_b, b.len AS len_b
        |FROM u a JOIN u b ON a.key = b.key AND a.lang < b.lang
        |WHERE 2 * a.len >= b.len AND 2 * b.len >= a.len""".stripMargin,

    "q_text_normalize" ->
      s"""WITH a AS (
         |  SELECT doc_id,
         |    text || ' cafe' || chr(769) || '  x' || chr(8203) || chr(9) || 'y'
         |      || chr(13) || chr(10) || 'z '
         |      || CASE WHEN doc_id % 2 = 0 THEN chr(233) ELSE 'e' || chr(769) END AS aug
         |  FROM documents),
         |n AS (
         |  SELECT doc_id,
         |    trim(regexp_replace(regexp_replace(regexp_replace(
         |      nfc_normalize(aug),
         |      '[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]', '', 'g'),
         |      '\\r\\n?', E'\\n', 'g'),
         |      '[ \\t]+', ' ', 'g')) AS norm
         |  FROM a)
         |SELECT doc_id, md5(norm) AS norm_md5,
         |  CAST(length(norm) AS BIGINT) AS norm_len
         |FROM n""".stripMargin,

    // anchor extraction + RFC 3986 resolution: the oracle re-derives the
    // resolved URL set closed-form per href kind (the engine does real
    // regex extraction + java.net.URI reference resolution)
    "q_web_links" -> webLinksSql,

    // jusText-class block classification: the oracle rebuilds each block's
    // CLEAN text closed-form from the generation rule (no HTML parsing on
    // this side) and recomputes every integer metric + verdict
    "q_html_blocks" ->
      """WITH b AS (
        |  SELECT doc_id, 0 AS block_idx,
        |    'Nav ' || (doc_id % 5) || ' More links here' AS text,
        |    CAST(20 AS BIGINT) AS link_chars
        |  FROM documents
        |  UNION ALL SELECT doc_id, 1,
        |    'The quick brown fox number ' || (doc_id % 7) ||
        |    ' jumps over the lazy dog and the crowd watches in the warm sun of the valley',
        |    0 FROM documents
        |  UNION ALL SELECT doc_id, 2,
        |    'Copyright ' || (doc_id % 25 + 2000) || ' Site' || (doc_id % 3),
        |    0 FROM documents
        |  UNION ALL SELECT doc_id, 3,
        |    'Read more about topic ' || (doc_id % 9) || ' on this page now',
        |    9 FROM documents),
        |m AS (SELECT doc_id, CAST(block_idx AS INT) AS block_idx,
        |    CAST(length(text) AS BIGINT) AS text_chars, link_chars,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_words,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      w -> list_contains(['the','a','and','of','to','in','on','over','with','this'], w)))
        |      AS BIGINT) AS n_stop
        |  FROM b)
        |SELECT doc_id, block_idx, text_chars, link_chars, n_words, n_stop,
        |  CAST(link_chars * 1000 // greatest(text_chars, 1) AS BIGINT) AS link_pm,
        |  CAST(n_stop * 1000 // greatest(n_words, 1) AS BIGINT) AS stop_pm,
        |  CASE WHEN link_chars * 1000 // greatest(text_chars, 1) > 500
        |         OR n_words < 4 THEN 'bad'
        |       WHEN n_words >= 10
        |         AND n_stop * 1000 // greatest(n_words, 1) >= 200
        |         AND link_chars * 1000 // greatest(text_chars, 1) <= 300 THEN 'good'
        |       ELSE 'near_good' END AS verdict
        |FROM m""".stripMargin,

    // per-target anchor-text profile: targets/texts re-derived closed-form
    // per link kind; argmax replayed as a window over (n DESC, text ASC)
    "q_anchor_text" ->
      """WITH a AS (
        |  SELECT 'https://ext' || (doc_id % 20) || '.example.net/x/' || doc_id AS tgt,
        |         'e' AS anchor FROM documents
        |  UNION ALL
        |  SELECT 'https://site' || (doc_id % 50) || '.example.org/r/' || (doc_id % 10),
        |         'r' || (doc_id % 7) FROM documents
        |  UNION ALL
        |  SELECT 'https://site' || (doc_id % 50) || '.example.org/dir/a/b' || (doc_id % 5),
        |         'rel' || (doc_id % 3) FROM documents
        |  UNION ALL
        |  SELECT 'https://site' || (doc_id % 50) || '.example.org/up' || (doc_id % 3),
        |         'up' FROM documents),
        |c AS (SELECT tgt, anchor, count(*) AS n FROM a GROUP BY 1, 2),
        |p AS (SELECT tgt, anchor, n,
        |        row_number() OVER (PARTITION BY tgt ORDER BY n DESC, anchor) AS rn,
        |        sum(n) OVER (PARTITION BY tgt) AS n_links,
        |        count(*) OVER (PARTITION BY tgt) AS n_texts
        |      FROM c)
        |SELECT tgt, CAST(n_links AS BIGINT) AS n_links,
        |  CAST(n_texts AS BIGINT) AS n_texts,
        |  anchor AS top_text, CAST(n AS BIGINT) AS top_n
        |FROM p WHERE rn = 1""".stripMargin,

    // host-level link graph over the same fixture: per-doc 1 external +
    // 3 self-host links, aggregated
    "q_host_graph" ->
      """SELECT src_host, tgt_host, CAST(count(*) AS BIGINT) AS n_links FROM (
        |  SELECT 'site' || (doc_id % 50) || '.example.org' AS src_host,
        |         'ext' || (doc_id % 20) || '.example.net' AS tgt_host
        |  FROM documents
        |  UNION ALL
        |  SELECT 'site' || (doc_id % 50) || '.example.org',
        |         'site' || (doc_id % 50) || '.example.org'
        |  FROM documents, (VALUES (1), (2), (3)) v(k))
        |GROUP BY 1, 2""".stripMargin,

    "q_text_quality" ->
      s"""SELECT doc_id,
         |  round(
         |    least(length(text) / 500.0, 1.0) * 0.4 +
         |    (CASE WHEN length(text) > 0 THEN
         |       length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / length(text)
         |     ELSE 0.0 END) * 0.4 +
         |    (CASE WHEN ${tokCountSql("text")} > 0 THEN
         |       ${stopHitsSql("text", "en")} * 1.0 / ${tokCountSql("text")}
         |     ELSE 0.0 END) * 0.2,
         |  6) AS quality
         |FROM documents""".stripMargin,

    "q_text_tokens" ->
      s"""SELECT doc_id,
         |  CAST(${tokCountSql("text")} AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]')) AS BIGINT) AS n_bpeish
         |FROM documents""".stripMargin,

    "q_text_fingerprint" -> fingerprintSql,

    "q_stratified_sample" ->
      HashSql.stratifiedSampleSql(enPermille = 300, defaultPermille = 700, seed = 11L),

    // temperature mixture: sqrt-weighted quotas (defined-order fold) +
    // splitmix per-language rank selection — bit-exact
    "q_temperature_mix" -> HashSql.temperatureMixSql(seed = 23L),

    // shard layout + order-free xor checksums — bit-exact splitmix
    "q_shard_manifest" -> HashSql.shardManifestSql(nShards = 48, seed = 31L),

    // two-corpus weighted mix: per-source splitmix bucket, seed rotated by
    // source index — provenance tag + union, zero shuffle on either side
    "q_mix_corpora" ->
      HashSql.mixCorporaSql(seed = 7L, webPermille = 700, partsPermille = 300),

    // exact substring dedup (ExactSubstr, k=6): keeper per gram is the
    // min encoded (doc, pos); covered positions distinct-merged; span
    // starts = covered positions whose predecessor is uncovered
    "q_dedup_substr" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
         |nt AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens FROM t),
         |grams AS (
         |  SELECT doc_id, CAST(u.i AS BIGINT) AS p0,
         |    array_to_string(toks[CAST(u.i + 1 AS INT):CAST(u.i + 6 AS INT)], ' ') AS g
         |  FROM t, UNNEST(range(len(toks) - 5)) AS u(i)
         |  WHERE len(toks) >= 6),
         |keep AS (SELECT g, min(doc_id * 1000000000 + p0) AS m FROM grams GROUP BY 1),
         |dups AS (SELECT gr.doc_id, gr.p0 FROM grams gr JOIN keep USING (g)
         |         WHERE gr.doc_id * 1000000000 + gr.p0 <> keep.m),
         |cov AS (SELECT DISTINCT doc_id, p0 + u.j AS c
         |        FROM dups, UNNEST(range(6)) AS u(j)),
         |dt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_tokens
         |       FROM cov GROUP BY 1),
         |sp AS (SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans
         |       FROM cov a LEFT JOIN cov b ON b.doc_id = a.doc_id AND b.c = a.c - 1
         |       WHERE b.c IS NULL GROUP BY a.doc_id)
         |SELECT nt.doc_id, nt.n_tokens,
         |  COALESCE(dt.dup_tokens, 0) AS dup_tokens,
         |  COALESCE(sp.n_dup_spans, 0) AS n_dup_spans
         |FROM nt LEFT JOIN dt USING (doc_id) LEFT JOIN sp USING (doc_id)""".stripMargin,

    // top-500 vocabulary: total order (freq desc, token asc) on both sides,
    // contiguous ids from 0
    "q_vocab_topk" ->
      s"""WITH tf AS (
         |  SELECT UNNEST(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |    x -> len(x) > 0)) AS tok FROM documents),
         |freq AS (SELECT tok, count(*) AS freq FROM tf GROUP BY tok)
         |SELECT tok AS token,
         |  CAST(row_number() OVER (ORDER BY freq DESC, tok) - 1 AS INT) AS token_id,
         |  CAST(freq AS BIGINT) AS freq
         |FROM freq ORDER BY freq DESC, tok LIMIT 500""".stripMargin,

    // BPE merge-iteration pair counts: adjacent-token pairs over the same
    // pinned tokenizer, top-200 by (freq desc, pair asc)
    "q_bpe_pairs" ->
      s"""WITH t AS (SELECT ${toksSql("text")} AS toks FROM documents),
         |p AS (SELECT UNNEST(list_transform(range(1, len(toks)),
         |    i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1])) AS pair
         |  FROM t WHERE len(toks) >= 2)
         |SELECT pair, CAST(count(*) AS BIGINT) AS freq
         |FROM p GROUP BY 1 ORDER BY freq DESC, pair LIMIT 200""".stripMargin,

    // per-doc OOV rate under the SAME top-500 vocab; exact long counts plus
    // one engine-identical double division (zero-token docs → rate 0.0)
    "q_vocab_coverage" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
         |tf AS (SELECT UNNEST(toks) AS tok FROM t),
         |freq AS (SELECT tok, count(*) AS freq FROM tf GROUP BY tok),
         |voc AS (SELECT tok AS token FROM freq ORDER BY freq DESC, tok LIMIT 500),
         |ex AS (SELECT doc_id, UNNEST(toks) AS tok FROM t),
         |ov AS (SELECT ex.doc_id, count(*) AS n,
         |    sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS oov
         |  FROM ex LEFT JOIN voc v ON v.token = ex.tok GROUP BY 1)
         |SELECT t.doc_id,
         |  CAST(coalesce(ov.n, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(ov.oov, 0) AS BIGINT) AS n_oov,
         |  CASE WHEN coalesce(ov.n, 0) = 0 THEN 0.0
         |       ELSE CAST(ov.oov AS DOUBLE) / CAST(ov.n AS DOUBLE) END AS oov_rate
         |FROM t LEFT JOIN ov USING (doc_id)""".stripMargin,

    // per-doc token-id sequence under the SAME top-500 vocab (OOV = -1),
    // hashed in token order
    "q_tokenize_ids" ->
      s"""WITH tf AS (
         |  SELECT UNNEST(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |    x -> len(x) > 0)) AS tok FROM documents),
         |freq AS (SELECT tok, count(*) AS freq FROM tf GROUP BY tok),
         |v AS (SELECT tok, CAST(row_number() OVER (ORDER BY freq DESC, tok) - 1 AS INT) AS token_id
         |      FROM freq ORDER BY freq DESC, tok LIMIT 500),
         |mm AS (SELECT map(list(tok ORDER BY token_id), list(token_id ORDER BY token_id)) AS m FROM v)
         |SELECT doc_id,
         |  md5(array_to_string(list_transform(
         |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0),
         |    t -> CAST(COALESCE(map_extract(m, t)[1], -1) AS VARCHAR)), ',')) AS ids_md5
         |FROM documents, mm""".stripMargin,

    // Gopher-style repetition metrics: per-doc top-1-gram fraction and
    // duplicate-bigram fraction, same two-level grouped aggregation
    "q_text_repetition" ->
      s"""WITH t AS (
         |  SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
         |u AS (SELECT doc_id, UNNEST(toks) AS tok FROM t),
         |uc AS (SELECT doc_id, tok, count(*) AS c FROM u GROUP BY 1, 2),
         |um AS (SELECT doc_id, max(c) AS topc, sum(c) AS n FROM uc GROUP BY 1),
         |b AS (SELECT doc_id, UNNEST(list_transform(range(1, len(toks)),
         |        i -> toks[i] || ' ' || toks[i + 1])) AS bg
         |      FROM t WHERE len(toks) >= 2),
         |bc AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2),
         |bm AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup,
         |        sum(c) AS tot FROM bc GROUP BY 1)
         |SELECT um.doc_id, CAST(um.n AS BIGINT) AS n_tokens,
         |  um.topc * 1.0 / um.n AS top_tok_frac,
         |  COALESCE(bm.dup * 1.0 / bm.tot, 0.0) AS dup_bigram_frac
         |FROM um LEFT JOIN bm ON bm.doc_id = um.doc_id""".stripMargin,

    // cross-document trigram overlap: distinct (doc, shingle) -> shingle doc
    // frequency -> per-doc duplicated fraction
    "q_text_overlap" ->
      s"""WITH t AS (
         |  SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
         |s AS (SELECT DISTINCT doc_id, sh FROM (
         |  SELECT doc_id, UNNEST(list_transform(range(1, len(toks) - 1),
         |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS sh
         |  FROM t WHERE len(toks) >= 3)),
         |f AS (SELECT sh, count(*) AS n_docs FROM s GROUP BY 1)
         |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |  sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*)
         |    AS overlap_frac
         |FROM s JOIN f ON f.sh = s.sh
         |GROUP BY s.doc_id""".stripMargin,

    // corpus bigram LM (add-one smoothing): same fixed-point micro-nat
    // construction as q_text_unigram_lm — per-bigram
    // q = round(-ln((c12+1)/(c1+V))·1e6) as BIGINT, per-doc fold is exact
    // integer arithmetic over one correctly-rounded division. The hot/cold
    // split in the engine is a pure execution strategy: hot ∪ cold = all
    // bigram types, so this unsplit oracle IS the semantics.
    "q_text_bigram_lm" ->
      s"""WITH t AS (
         |  SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
         |db AS (
         |  SELECT doc_id, bg, count(*) AS cnt FROM (
         |    SELECT doc_id, UNNEST(list_transform(range(1, len(toks)),
         |      i -> toks[i] || ' ' || toks[i + 1])) AS bg
         |    FROM t WHERE len(toks) >= 2)
         |  GROUP BY doc_id, bg),
         |big AS (SELECT bg, sum(cnt) AS c12 FROM db GROUP BY bg),
         |ctx AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1
         |        FROM big GROUP BY 1),
         |voc AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM (
         |  SELECT split_part(bg, ' ', 1) AS tok FROM big
         |  UNION SELECT split_part(bg, ' ', 2) FROM big)),
         |q AS (SELECT big.bg,
         |  CAST(round(-ln(CAST(big.c12 + 1 AS DOUBLE) /
         |    (CAST(ctx.c1 AS DOUBLE) + (SELECT v FROM voc))) * 1000000.0)
         |    AS BIGINT) AS q
         |  FROM big JOIN ctx ON ctx.w1 = split_part(big.bg, ' ', 1))
         |SELECT db.doc_id,
         |  CAST(sum(db.cnt * q.q) AS DOUBLE)
         |    / (CAST(sum(db.cnt) AS DOUBLE) * 1000000.0) AS neg_logprob_bg
         |FROM db JOIN q ON q.bg = db.bg
         |GROUP BY db.doc_id""".stripMargin,

    // URL canonicalization: the raw-URL synthesis AND every normalization
    // step (fragment/tracking-param drop, case folds, default-port strip,
    // param sort, public-suffix+1) replicated in DuckDB string/list SQL;
    // url_raw in the output pins the synthesis itself
    "q_url_normalize" -> urlNormalizeSql,

    // redirect-chain walk to the terminal as a RECURSIVE CTE; the engine's
    // pointer jumping (3 doublings >= max chain 7) must land on the same
    // terminal with the same hop count
    // registrable domain reconstructed closed-form from the URL generation
    // rule (engine runs the real longest-suffix logic); exact count/sum
    // roll-ups + pre-deduped host counts
    "q_domain_stats" ->
      ("""WITH b AS (
        |  SELECT 'site' || (doc_id % 20) ||
        |           CASE WHEN doc_id % 4 = 0 THEN '.co.uk' ELSE '.org' END AS domain,
        |         'sub' || (doc_id % 3) || '.site' || (doc_id % 20) ||
        |           CASE WHEN doc_id % 4 = 0 THEN '.co.uk' ELSE '.org' END AS h,
        |         len(text) AS nc,
        |         """ + tokCountSql("text") + """ AS nt
        |  FROM documents),
        |a AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(nc) AS BIGINT) AS sum_chars,
        |        CAST(sum(nt) AS BIGINT) AS sum_tokens
        |      FROM b GROUP BY 1),
        |hh AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_hosts
        |       FROM (SELECT DISTINCT domain, h FROM b) GROUP BY 1)
        |SELECT a.domain, a.n_docs, hh.n_hosts, a.sum_chars, a.sum_tokens
        |FROM a JOIN hh USING (domain)""").stripMargin,

    "q_url_redirects" ->
      """WITH RECURSIVE e AS (
        |  SELECT 'https://r.example.org/u' || doc_id AS src,
        |         'https://r.example.org/u' || (doc_id - 1) AS dst
        |  FROM documents WHERE doc_id % 8 <> 0),
        |walk AS (
        |  SELECT src, dst AS cur, 1 AS hops FROM e
        |  UNION ALL
        |  SELECT w.src, e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.cur)
        |SELECT w.src, w.cur AS final_url, CAST(w.hops AS BIGINT) AS hops,
        |  TRUE AS resolved
        |FROM walk w
        |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = w.cur)""".stripMargin,

    // hashed-feature linear classifier: per-feature polyhash31 (exact
    // integer ascii arithmetic) -> splitmix64 bucket -> splitmix64 integer
    // per-mille weight, per-doc exact integer sum. The engine computes the
    // same fold inside one codegen'd scalar; this oracle materializes the
    // feature relation instead — same semantics, value-exact.
    "q_quality_classify" -> qualityClassifySql,

    // classifier-vs-C4 confusion: the filter rule as pseudo-label against
    // the hashed-linear keep verdict (token-less docs predict false)
    "q_quality_confusion" ->
      s"""WITH lang AS ($langIdSql),
         |m AS (
         |  SELECT doc_id,
         |    CAST(${tokCountSql("text")} AS BIGINT) AS n_tokens,
         |    round(
         |      least(length(text) / 500.0, 1.0) * 0.4 +
         |      (CASE WHEN length(text) > 0 THEN
         |         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / length(text)
         |       ELSE 0.0 END) * 0.4 +
         |      (CASE WHEN ${tokCountSql("text")} > 0 THEN
         |         ${stopHitsSql("text", "en")} * 1.0 / ${tokCountSql("text")}
         |       ELSE 0.0 END) * 0.2,
         |    6) AS quality
         |  FROM documents),
         |lab AS (SELECT m.doc_id,
         |    (m.n_tokens >= 20 AND m.quality >= 0.5 AND lang.pred_lang = 'en')
         |      AS label
         |  FROM m JOIN lang ON lang.doc_id = m.doc_id),
         |qc AS (SELECT * FROM ($qualityClassifySql)),
         |j AS (SELECT lab.doc_id, lab.label,
         |    coalesce(qc.keep, FALSE) AS pred
         |  FROM lab LEFT JOIN qc ON qc.doc_id = lab.doc_id),
         |c AS (SELECT
         |    CAST(sum(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN NOT pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |    CAST(sum(CASE WHEN NOT pred AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM j)
         |SELECT tp, fp, fn, tn,
         |  CAST(tp * 1000 // greatest(tp + fp, 1) AS BIGINT) AS precision_pm,
         |  CAST(tp * 1000 // greatest(tp + fn, 1) AS BIGINT) AS recall_pm
         |FROM c""".stripMargin,

    // DSIR importance weights: feature relation + learned micro-nat bucket
    // table materialized relationally (the engine folds the same table as a
    // codegen'd scalar); integer q_milli pins table + extraction exactly
    "q_dsir_weights" -> dsirSql,

    // PII counts + masked-text digest over the identically-derived augmented
    // corpus; replacement order (email, phone, ip) mirrors TextOps.redactPii
    "q_text_pii" ->
      s"""WITH a AS (
         |  SELECT doc_id,
         |    text || ' contact u' || CAST(doc_id AS VARCHAR) || '@mail' ||
         |    CAST(doc_id % 10 AS VARCHAR) || '.com or call 555-' ||
         |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
         |    CASE WHEN doc_id % 3 = 0 THEN ' ip 10.0.' ||
         |      CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR)
         |    ELSE '' END AS aug
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(aug, '$piiEmailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(aug, '$piiPhoneRe')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(aug, '$piiIpRe')) AS BIGINT) AS n_ips,
         |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
         |    '$piiEmailRe', '<EMAIL>', 'g'),
         |    '$piiPhoneRe', '<PHONE>', 'g'),
         |    '$piiIpRe', '<IP>', 'g')) AS redacted_md5
         |FROM a""".stripMargin,

    // grouped corpus stats; quantile_cont == Spark's exact `percentile`;
    // raw doubles — integer sums are exact, so avg/percentiles agree bitwise
    "q_corpus_stats" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  avg(n_chars) AS avg_chars,
        |  quantile_cont(n_chars, 0.5) AS p50_chars,
        |  quantile_cont(n_chars, 0.9) AS p90_chars
        |FROM documents GROUP BY 1, 2""".stripMargin,

    // real decode: the generation rule (Media.genWidth/genHeight/genFormat/
    // genRgb) recomputed in closed form; Spark recovers the same values from
    // the actual PNG/BMP bytes via javax.imageio — dims, container format,
    // and the two corner-pixel RGB probes (header parsing alone can't fake
    // px00/px_last)
    "q_media_meta" ->
      """WITH m AS (SELECT doc_id AS id,
        |  8 + doc_id % 57 AS w, 8 + (doc_id * 3) % 41 AS h FROM documents)
        |SELECT id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CASE WHEN id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
        |  CAST((id % 256) * 65536 + ((id * 3) % 256) * 256 + (id * 7) % 256
        |    AS INT) AS px00,
        |  CAST(((id + (w - 1) + 2 * (h - 1)) % 256) * 65536
        |     + ((id * 3 + 5 * (w - 1) + (h - 1)) % 256) * 256
        |     + ((id * 7 + (w - 1) + 3 * (h - 1)) % 256) AS INT) AS px_last
        |FROM m""".stripMargin,

    // real transcode: box-fit integer math over the generated dims; Spark's
    // emitted dims come from re-decoding the resampled, re-encoded bytes
    "q_media_resize" ->
      """WITH m AS (SELECT doc_id AS id,
        |  8 + doc_id % 57 AS w0, 8 + (doc_id * 3) % 41 AS h0 FROM documents)
        |SELECT id,
        |  CAST(CASE WHEN greatest(w0, h0) <= 24 THEN w0
        |       ELSE greatest(1, w0 * 24 // greatest(w0, h0)) END AS INT) AS width,
        |  CAST(CASE WHEN greatest(w0, h0) <= 24 THEN h0
        |       ELSE greatest(1, h0 * 24 // greatest(w0, h0)) END AS INT) AS height,
        |  CASE WHEN id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format
        |FROM m""".stripMargin,

    // real animated-GIF frame sampling: the generation rule in closed form —
    // Spark recovers the same dims + per-frame corner pixels from the actual
    // decoded GIF rasters (palette = Media.FramePalette in decimal)
    "q_media_frames" ->
      """WITH m AS (SELECT doc_id AS id, 8 + doc_id % 24 AS w,
        |    8 + (doc_id * 3) % 16 AS h, 1 + doc_id % 8 AS nf
        |  FROM documents WHERE doc_id < 1000),
        |f AS (SELECT id, w, h, CAST(u.i AS INT) AS frame_idx
        |      FROM m, UNNEST(range(0, nf, 2)) AS u(i))
        |SELECT id, frame_idx, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(([1122867, 4478310, 7833753, 11189196, 14544639, 1056816, 4214880, 7372944])
        |    [CAST((id + frame_idx) % 8 AS INT) + 1] AS INT) AS px00,
        |  CAST(([1122867, 4478310, 7833753, 11189196, 14544639, 1056816, 4214880, 7372944])
        |    [CAST((id + frame_idx + (w - 1) + (h - 1)) % 8 AS INT) + 1] AS INT) AS px_last
        |FROM f""".stripMargin,

    // real audio decode: the generation rule (Media.genRate/genChannels/
    // genAudioFrames/genSample) in closed form — Spark recovers the same
    // container type, stream parameters, and the three 16-bit amplitude
    // probes from the actual decoded PCM via javax.sound.sampled (header
    // parsing alone can't fake s0/s_mid/s_last); all-integer math, exact
    "q_media_audio" ->
      """WITH m AS (SELECT doc_id AS id, 256 + (doc_id * 7) % 512 AS nf,
        |    1 + doc_id % 2 AS ch FROM documents)
        |SELECT id,
        |  CASE WHEN id % 2 = 0 THEN 'WAVE' ELSE 'AIFF' END AS format,
        |  CAST(8000 + (id % 3) * 4000 AS INT) AS sample_rate,
        |  CAST(ch AS INT) AS channels,
        |  CAST(nf AS BIGINT) AS n_frames,
        |  CAST((id * 31) % 65536 - 32768 AS INT) AS s0,
        |  CAST((id * 31 + (nf // 2) * 17) % 65536 - 32768 AS INT) AS s_mid,
        |  CAST((id * 31 + (nf - 1) * 17 + (ch - 1) * 7919) % 65536 - 32768
        |    AS INT) AS s_last
        |FROM m""".stripMargin,

    // textual-SQL surface: the IDENTICAL statement runs on both engines
    "q_sql_surface" ->
      """SELECT r_name, CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY r_name, year(o_orderdate)""".stripMargin,

    "q_agg_lineitem" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  count(*) AS n
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1, 2""".stripMargin,

    "q_join_broadcast" ->
      """SELECT r_name, count(*) AS customers, round(sum(c_acctbal), 4) AS balance
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1""".stripMargin,

    // bucketed co-located join: values are layout-independent (bucketing
    // only removes the exchange, which PlanSpec pins), so a plain join
    "q_bucketed_join" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
        |  CAST(len(embedding) AS BIGINT) AS dim
        |FROM documents JOIN embeddings ON vec_id = doc_id""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin,

    "q_window_events" ->
      """SELECT user_id, rn, event_id, running_value FROM (
        |  SELECT user_id, event_id,
        |    CAST(row_number() OVER w AS INT) AS rn,
        |    round(sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
        |      AS running_value
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |WHERE rn <= 3""".stripMargin,

    "q_topk_events" ->
      """SELECT event_id, event_type, value FROM events
        |ORDER BY value DESC, event_id LIMIT 10""".stripMargin,

    "q_set_ops" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 150
        |EXCEPT
        |SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value > 150""".stripMargin,

    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR date_diff('second',
        |                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (
        |  SELECT user_id, value,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  round(sum(value), 4) AS session_value
        |FROM s GROUP BY 1, 2""".stripMargin,

    // intra-doc paragraph dedup: first occurrence per trimmed paragraph in
    // original order, reconstructed text digested
    "q_dedup_paras" ->
      """WITH a AS (SELECT doc_id,
        |    substr(text, 1, 40) || chr(10) || chr(10)
        |      || substr(text, 41, 40) || chr(10) || chr(10) || '  '
        |      || substr(text, 1, 40) || ' ' || chr(10) || chr(10)
        |      || 'Subscribe now' || chr(10) || chr(10) || 'Subscribe now' AS aug
        |  FROM documents),
        |p AS (SELECT doc_id, str_split(aug, chr(10) || chr(10)) AS ps FROM a),
        |u AS (SELECT doc_id, CAST(t.i AS BIGINT) AS idx, ps[t.i] AS para,
        |        trim(ps[t.i]) AS tp, len(ps) AS np
        |      FROM p, UNNEST(range(1, len(ps) + 1)) AS t(i)),
        |f AS (SELECT doc_id, idx, para, np,
        |        min(idx) OVER (PARTITION BY doc_id, tp) AS first_idx FROM u),
        |k AS (SELECT doc_id, any_value(np) AS np, count(*) AS n_kept,
        |        string_agg(para, chr(10) || chr(10) ORDER BY idx) AS clean
        |      FROM f WHERE idx = first_idx GROUP BY doc_id)
        |SELECT doc_id AS id, CAST(np AS BIGINT) AS n_paras,
        |  CAST(n_kept AS BIGINT) AS n_kept,
        |  CAST(length(clean) AS BIGINT) AS clean_len, md5(clean) AS clean_md5
        |FROM k""".stripMargin,

    // native session_window semantics: strict-overlap merge (a gap of
    // EXACTLY 30 min breaks, unlike q_sessionize's > 1800), end = last
    // event + gap; micro-unit value sum is order-free integer arithmetic
    // crawl-frontier politeness schedule: the per-host window form IS the
    // semantic definition at toy scale (the engine computes it as one
    // global distributed rank minus algebraic per-host bases)
    "q_crawl_schedule" ->
      """WITH u AS (SELECT
        |    CASE WHEN doc_id % 10 < 4 THEN 'hot.example.com'
        |         ELSE 'h' || (doc_id % 7) || '.example.org' END AS host,
        |    doc_id FROM documents),
        |f AS (SELECT host, 'https://' || host || '/p/' || doc_id AS url FROM u),
        |r AS (SELECT host, url,
        |    CAST(row_number() OVER (PARTITION BY host ORDER BY url) AS BIGINT)
        |      AS host_rank
        |  FROM f)
        |SELECT host, url, host_rank, (host_rank - 1) // 4 AS wave FROM r""".stripMargin,

    // code-vs-prose detection: reconstruct the augmented text closed-form,
    // replay every regex count and the integer per-mille score
    "q_code_detect" ->
      """WITH a AS (SELECT doc_id,
        |    text || CASE WHEN doc_id % 3 = 0
        |      THEN chr(10) || 'function f' || doc_id || '(x) {' || chr(10)
        |        || '  let y = x + ' || (doc_id % 7) || ';' || chr(10)
        |        || '  return y;' || chr(10) || '}'
        |      ELSE '' END AS aug
        |  FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(string_split(aug, chr(10))) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(string_split(aug, chr(10)),
        |      l -> regexp_matches(l, '[;{}]$'))) AS BIGINT) AS n_punct_lines,
        |    CAST(len(list_filter(string_split(aug, chr(10)),
        |      l -> regexp_matches(l, '^[ \t]{2}'))) AS BIGINT) AS n_indent_lines,
        |    CAST(len(regexp_extract_all(aug,
        |      '\b(function|return|import|class|const|var|let)\b'))
        |      AS BIGINT) AS n_kw
        |  FROM a)
        |SELECT doc_id, n_lines, n_punct_lines, n_indent_lines, n_kw,
        |  (n_punct_lines + n_indent_lines) * 1000 // n_lines AS code_pm,
        |  ((n_punct_lines + n_indent_lines) * 1000 // n_lines) >= 250
        |    OR n_kw >= 3 AS is_code
        |FROM m""".stripMargin,

    "q_session_window" -> sessionWindowSql,

    // the streaming drain must merge cross-micro-batch sessions through the
    // state store into EXACTLY the batch session set — same oracle
    "q_stream_sessions" -> sessionWindowSql,

    // stream-static broadcast enrichment: the Complete-mode drain over
    // 2-file micro-batches must equal the relational batch join + aggregate
    "q_stream_enrich" ->
      """SELECT c.c_mktsegment AS segment, e.event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(e.value * 1e6) AS BIGINT)) AS BIGINT) AS value_micro
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2""".stripMargin,

    // WebTables harvest: all nine expected cells per doc closed-form
    "q_html_tables" ->
      """WITH c(r, cc, hdr, t) AS (VALUES
        |  (0, 0, TRUE, 'entity'), (0, 1, TRUE, 'relation & role'), (0, 2, TRUE, 'value'))
        |SELECT doc_id, CAST(0 AS INT) AS table_idx, CAST(r AS INT) AS row_idx,
        |       CAST(cc AS INT) AS col_idx, hdr AS is_header, t AS cell_text
        |FROM documents, c
        |UNION ALL SELECT doc_id, 0, 1, 0, FALSE, 'E' || (doc_id % 50) FROM documents
        |UNION ALL SELECT doc_id, 0, 1, 1, FALSE, 'population' FROM documents
        |UNION ALL SELECT doc_id, 0, 1, 2, FALSE, ((doc_id * 13) % 97) || 'k' FROM documents
        |UNION ALL SELECT doc_id, 0, 2, 0, FALSE, 'E' || (doc_id % 50) FROM documents
        |UNION ALL SELECT doc_id, 0, 2, 1, FALSE, 'mayor' FROM documents
        |UNION ALL SELECT doc_id, 0, 2, 2, FALSE, 'Person ' || (doc_id % 30) FROM documents""".stripMargin,

    // WebTables lifting: four triples per doc closed-form
    "q_table_triples" ->
      """SELECT doc_id, 'E' || (doc_id % 50) AS subj, 'relation & role' AS pred,
        |       'population' AS obj FROM documents
        |UNION ALL SELECT doc_id, 'E' || (doc_id % 50), 'value',
        |       ((doc_id * 13) % 97) || 'k' FROM documents
        |UNION ALL SELECT doc_id, 'E' || (doc_id % 50), 'relation & role',
        |       'mayor' FROM documents
        |UNION ALL SELECT doc_id, 'E' || (doc_id % 50), 'value',
        |       'Person ' || (doc_id % 30) FROM documents""".stripMargin,

    // count-min sketch: identical splitmix64 row hashes + min-over-rows
    // estimate rebuilt relationally, alongside the exact counts
    "q_heavy_hitters" -> cmsSql(width = 8, threshold = 200L),

    // HyperLogLog: register table + defined-order-IEEE raw estimate
    "q_hll_distinct" -> hllSql,

    // portable Bloom: exact bit-set replay, per-row FP/no-FN verdicts
    "q_bloom_decontam" -> bloomSql(k = 4, m = 256),

    // JSON-LD harvest: the six expected triples per doc, reconstructed
    // closed-form from the generation rule (independent of the parser)
    "q_kg_jsonld" ->
      """WITH e AS (SELECT doc_id, 'http://example.org/e' || doc_id AS s FROM documents)
        |SELECT doc_id, s, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
        |       'https://schema.org/Person' AS o FROM e
        |UNION ALL SELECT doc_id, s, 'https://schema.org/name',
        |       'Entity "' || doc_id || '"' FROM e
        |UNION ALL SELECT doc_id, s, 'https://schema.org/age',
        |       CAST(doc_id % 90 AS VARCHAR) FROM e
        |UNION ALL SELECT doc_id, s, 'https://schema.org/worksFor',
        |       'http://example.org/org' || (doc_id % 20) FROM e
        |UNION ALL SELECT doc_id, s, 'https://schema.org/sameAs',
        |       'http://dbpedia.org/resource/E' || (doc_id % 50) FROM e
        |UNION ALL SELECT doc_id, s, 'https://schema.org/sameAs',
        |       'http://www.wikidata.org/entity/Q' || (doc_id % 30) FROM e""".stripMargin,

    // as-of join: DuckDB's NATIVE ASOF LEFT JOIN recomputes the
    // union-tag carry-forward independently (inclusive >= match)
    "q_asof_join" ->
      """WITH p AS (SELECT user_id, ts, event_id AS purchase_id FROM events
        |           WHERE event_type = 'purchase'),
        |s AS (SELECT user_id, ts, max(event_id) AS signup_id FROM events
        |      WHERE event_type = 'signup' GROUP BY 1, 2)
        |SELECT p.user_id, p.purchase_id,
        |  coalesce(s.signup_id, -1) AS signup_id,
        |  coalesce(date_diff('second', s.ts, p.ts), -1) AS lag_sec
        |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts""".stripMargin,

    // range join: plain BETWEEN theta join recomputes the bucketed
    // decomposition's matches
    "q_range_join" ->
      """WITH iv AS (SELECT doc_id AS iid, (doc_id * 211) % 100000 AS lo,
        |              (doc_id * 211) % 100000 + doc_id % 500 AS hi FROM documents),
        |pt AS (SELECT event_id AS pid, (event_id * 101) % 100000 AS p FROM events)
        |SELECT iid, count(*) AS n_points, CAST(sum(pid) AS BIGINT) AS sum_pid
        |FROM pt JOIN iv ON pt.p >= iv.lo AND pt.p <= iv.hi
        |GROUP BY iid""".stripMargin,

    // winnowing fingerprints: bit-exact splitmix64 k-gram hashes, relational
    // windowed-min selection with the rightmost tie rule
    "q_dedup_winnow" -> HashSql.winnowSql(k = 8, w = 4, seed = 0x5eed5eedL),
    "q_winnow_pairs" -> HashSql.winnowPairsSql(k = 8, w = 4, seed = 0x5eed5eedL,
      minShared = 30L, maxBucket = 100),

    // product-quantization codes: pinned closed-form integer codebook,
    // relational per-subspace argmin with the lowest-index tie rule
    "q_embed_pq" ->
      """WITH q AS (SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) + 1024) AS q
        |  FROM embeddings),
        |dims AS (SELECT vec_id, s.s, j.j, d.d,
        |    q[CAST(s.s * 16 + d.d + 1 AS INT)] AS qd
        |  FROM q,
        |    (SELECT UNNEST(range(0, 4)) AS s) s,
        |    (SELECT UNNEST(range(0, 16)) AS j) j,
        |    (SELECT UNNEST(range(0, 16)) AS d) d),
        |dist AS (SELECT vec_id, s, j,
        |    sum((qd - (24 + (211 * j + 97 * d + 59 * s) % 2001))
        |      * (qd - (24 + (211 * j + 97 * d + 59 * s) % 2001))) AS dist
        |  FROM dims GROUP BY 1, 2, 3),
        |best AS (SELECT vec_id, s, j, dist,
        |    row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, j) AS rn
        |  FROM dist)
        |SELECT vec_id,
        |  string_agg(j, ',' ORDER BY s) AS codes_csv,
        |  CAST(sum(dist) AS BIGINT) AS distortion
        |FROM best WHERE rn = 1 GROUP BY vec_id""".stripMargin,

    // PQ asymmetric-distance top-k: the q_embed_pq code CTEs, the query LUT
    // from the same dist relation (a query's LUT entry IS its slice-to-
    // centroid distance), dist = sum over subspaces of LUT[code], rank by
    // (dist, vec_id) — exact integers everywhere
    "q_embed_adc" ->
      """WITH q AS (SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) + 1024) AS q
        |  FROM embeddings),
        |dims AS (SELECT vec_id, s.s, j.j, d.d,
        |    q[CAST(s.s * 16 + d.d + 1 AS INT)] AS qd
        |  FROM q,
        |    (SELECT UNNEST(range(0, 4)) AS s) s,
        |    (SELECT UNNEST(range(0, 16)) AS j) j,
        |    (SELECT UNNEST(range(0, 16)) AS d) d),
        |dist AS (SELECT vec_id, s, j,
        |    sum((qd - (24 + (211 * j + 97 * d + 59 * s) % 2001))
        |      * (qd - (24 + (211 * j + 97 * d + 59 * s) % 2001))) AS dist
        |  FROM dims GROUP BY 1, 2, 3),
        |best AS (SELECT vec_id, s, j, dist,
        |    row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, j) AS rn
        |  FROM dist),
        |codes AS (SELECT vec_id, s, j AS code FROM best WHERE rn = 1),
        |qlut AS (SELECT vec_id AS query_id, s, j, dist FROM dist
        |         WHERE vec_id < 8),
        |adc AS (SELECT l.query_id, c.vec_id,
        |    CAST(sum(l.dist) AS BIGINT) AS adc_dist
        |  FROM codes c JOIN qlut l ON l.s = c.s AND l.j = c.code
        |  GROUP BY 1, 2),
        |rk AS (SELECT query_id, vec_id, adc_dist,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY adc_dist, vec_id) AS rn
        |  FROM adc)
        |SELECT query_id, vec_id, adc_dist, CAST(rn AS INT) AS rank
        |FROM rk WHERE rn <= 5""".stripMargin,

    // int8-grid embedding outliers: same quantization CTEs as q_embed_quant,
    // per-dimension BIGINT sums, floor-division centroid via the portable
    // positive-mod identity (both engines' % truncate), exact integer scores
    "q_embed_outliers" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
        |      'max') AS DOUBLE) / 127 AS scale
        |  FROM embeddings),
        |c AS (
        |  SELECT vec_id, scale,
        |    list_transform(embedding, x -> CASE WHEN scale = 0 THEN 0
        |      ELSE CAST(greatest(-127.0, least(127.0,
        |        round(CAST(x AS DOUBLE) / scale, 0))) AS INT) END) AS codes
        |  FROM q),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
        |e AS (SELECT UNNEST(range(len(codes))) AS pos,
        |             UNNEST(codes) AS code FROM c),
        |sums AS (SELECT pos, CAST(sum(CAST(code AS BIGINT)) AS BIGINT) AS s
        |         FROM e GROUP BY pos),
        |cent AS (SELECT pos, (s - ((s % n.n) + n.n) % n.n) // n.n AS m
        |         FROM sums, n),
        |cl AS (SELECT list(m ORDER BY pos) AS cm FROM cent)
        |SELECT vec_id,
        |  CAST(list_reduce(list_transform(range(1, len(codes) + 1),
        |    i -> (CAST(codes[CAST(i AS INT)] AS BIGINT) - cm[CAST(i AS INT)])
        |       * (CAST(codes[CAST(i AS INT)] AS BIGINT) - cm[CAST(i AS INT)])),
        |    (acc, x) -> acc + x) AS BIGINT) AS score
        |FROM c, cl
        |ORDER BY score DESC, vec_id LIMIT 50""".stripMargin,

    // SymSpell fuzzy vocab pairs: on the top-500 vocab the deletion-key
    // blocking is a COMPLETE cover for levenshtein <= 2 (any alignment with
    // k edits yields a shared variant of <= k deletions per side; the
    // maxBucket=1000 cap cannot bind at |V|=500), so the oracle is the
    // semantic definition — the verified all-pairs edit-distance set
    "q_fuzzy_vocab" ->
      """WITH tf AS (
        |  SELECT UNNEST(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |    x -> len(x) > 0)) AS tok FROM documents),
        |freq AS (SELECT tok, count(*) AS freq FROM tf GROUP BY tok),
        |v AS (SELECT tok, CAST(freq AS BIGINT) AS freq
        |      FROM freq ORDER BY freq DESC, tok LIMIT 500)
        |SELECT a.tok AS a, b.tok AS b,
        |  CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS dist,
        |  a.freq AS n_a, b.freq AS n_b
        |FROM v a JOIN v b ON a.tok < b.tok
        |WHERE levenshtein(a.tok, b.tok) <= 2""".stripMargin,

    // exact discrete quantiles: the window row_number form IS the semantic
    // definition the distributed prefix-sum selection must match; rank =
    // ceil(n*num/den) computed in integer arithmetic on both sides
    "q_exact_quantiles" ->
      """WITH v AS (SELECT doc_id AS id, CAST(strlen(text) AS BIGINT) AS value
        |           FROM documents),
        |r AS (SELECT id, value,
        |        CAST(row_number() OVER (ORDER BY value, id) AS BIGINT) AS rank FROM v),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |t AS (SELECT * FROM (VALUES ('p25', 1, 4), ('p50', 1, 2), ('p75', 3, 4),
        |        ('p90', 9, 10), ('p99', 99, 100), ('max', 1, 1)) AS q(p_label, num, den)),
        |tr AS (SELECT t.p_label,
        |         greatest(CAST(1 AS BIGINT), (n.n * t.num + t.den - 1) // t.den) AS rank
        |       FROM t, n)
        |SELECT tr.p_label, tr.rank, r.value FROM tr JOIN r USING (rank)""".stripMargin,

    // host-scoped boilerplate strip: host df / page counts recomputed
    // relationally; integer-ratio verdict (n_with*5 >= n_pages*3, hosts with
    // >= 2 pages); survivors reassembled in original line order
    "q_host_boilerplate" ->
      """WITH aug AS (SELECT doc_id,
        |    'site' || (doc_id % 50) || '.example.org' AS host,
        |    text || chr(10) || 'nav ' || (doc_id % 50)
        |         || chr(10) || 'promo ' || (doc_id % 100) AS t
        |  FROM documents),
        |hp AS (SELECT host, CAST(count(*) AS BIGINT) AS n_pages FROM aug GROUP BY host),
        |p AS (SELECT doc_id, host, string_split(t, chr(10)) AS parts FROM aug),
        |l AS (SELECT doc_id, host, CAST(i - 1 AS INT) AS idx, parts[CAST(i AS INT)] AS line
        |      FROM p, UNNEST(range(1, len(parts) + 1)) AS u(i)),
        |df AS (SELECT host, line, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_with
        |       FROM l GROUP BY host, line),
        |bp AS (SELECT df.host, df.line FROM df JOIN hp USING (host)
        |       WHERE hp.n_pages >= 2 AND df.n_with * 5 >= hp.n_pages * 3),
        |kept AS (SELECT l.doc_id, l.idx, l.line FROM l
        |         LEFT JOIN bp ON l.host = bp.host AND l.line = bp.line
        |         WHERE bp.line IS NULL)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |  md5(string_agg(line, chr(10) ORDER BY idx)) AS kept_md5
        |FROM kept GROUP BY doc_id""".stripMargin,

    // WARC container parse: the ENGINE runs the length-delimited byte
    // parser over the synthesized two-record segment; the oracle
    // reconstructs every field closed-form from the generation rule —
    // including the md5 of the payload whose body embeds a literal
    // "WARC/1.0\r\nContent-Length: 3\r\n\r\n" marker (a resync-based
    // parser shears there and fails the hash)
    "q_warc_records" ->
      """WITH crlf AS (SELECT chr(13) || chr(10) AS c),
        |b AS (SELECT doc_id,
        |    'http://w' || (doc_id % 20) || '.example.org/page/' || doc_id AS uri,
        |    '<html><body>doc ' || doc_id || ' cites WARC/1.0' || c ||
        |      'Content-Length: 3' || c || c || 'x</body></html>' AS p1,
        |    'fetchTimeMs: ' || ((doc_id * 37) % 1000) || c AS p2
        |  FROM documents, crlf)
        |SELECT doc_id, 0 AS rec_idx, 'response' AS warc_type, uri AS target_uri,
        |  'text/html' AS content_type, CAST(len(p1) AS BIGINT) AS content_length,
        |  md5(p1) AS payload_md5 FROM b
        |UNION ALL
        |SELECT doc_id, 1, 'metadata', uri, 'application/warc-fields',
        |  CAST(len(p2) AS BIGINT), md5(p2) FROM b""".stripMargin,

    // CDX crawl-index build: the ENGINE parses the messy capture URL with
    // the real SURT/canonicalization column logic; the oracle writes the
    // expected sort key directly from the generation rule (scheme+case
    // noise gone, www. stripped, default :80 dropped, utm_ param removed)
    "q_cdx_index" ->
      """SELECT (CASE WHEN doc_id % 2 = 0 THEN 'com' ELSE 'org' END) ||
        |    ',example,s' || (doc_id % 40) || ')/sec' || (doc_id % 7) ||
        |    '/item?id=' || (doc_id % 97) AS surt,
        |  1700000000 + (doc_id * 7919) % 31536000 AS ts_unix,
        |  md5(text) AS digest, doc_id
        |FROM documents""".stripMargin,

    // compaction binpack plan: per-partition exclusive prefix sum over the
    // FILE MANIFEST (metadata-sized by construction) + floor-division bin
    // snapshot-expiry plan: rank/window/head anchored per table, rank wins
    // over the retention window, ts ties broken by snapshot id desc
    "q_snapshot_expiry" ->
      """WITH s AS (SELECT 't' || CAST(doc_id % 5 AS VARCHAR) AS table_id,
        |    doc_id AS snapshot_id,
        |    1700000000000 + (doc_id * 3600000) % 7776000000 AS ts_ms
        |  FROM documents),
        |r AS (SELECT *,
        |    CAST(row_number() OVER (PARTITION BY table_id
        |      ORDER BY ts_ms DESC, snapshot_id DESC) AS BIGINT) AS rank_desc,
        |    max(ts_ms) OVER (PARTITION BY table_id) AS head_ts
        |  FROM s),
        |v AS (SELECT *,
        |    CASE WHEN rank_desc <= 3 THEN 'recent_n'
        |         WHEN ts_ms >= head_ts - 604800000 THEN 'in_window'
        |         ELSE 'expire' END AS reason
        |  FROM r)
        |SELECT table_id, snapshot_id, CAST(ts_ms AS BIGINT) AS ts_ms,
        |  rank_desc, reason, reason <> 'expire' AS keep
        |FROM v""".stripMargin,

    "q_compaction_plan" ->
      """WITH p AS (SELECT lang, doc_id AS file_id, n_chars AS bytes,
        |    CAST(coalesce(sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum_before
        |  FROM documents)
        |SELECT lang, file_id, bytes, cum_before,
        |  cum_before // 4000 AS bin FROM p""".stripMargin,

    // Z-order clustering key: the Morton mask-shift cascade replayed
    // verbatim in integer SQL (masks 0x00ff00ff / 0x0f0f0f0f / 0x33333333 /
    // 0x55555555 in decimal)
    "q_zorder_keys" ->
      """WITH b AS (SELECT doc_id, n_chars % 65536 AS zx,
        |    (doc_id * 7919) % 65536 AS zy FROM documents),
        |s1 AS (SELECT *, (zx | (zx << 8)) & 16711935 AS x1,
        |    (zy | (zy << 8)) & 16711935 AS y1 FROM b),
        |s2 AS (SELECT *, (x1 | (x1 << 4)) & 252645135 AS x2,
        |    (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1),
        |s3 AS (SELECT *, (x2 | (x2 << 2)) & 858993459 AS x3,
        |    (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2),
        |s4 AS (SELECT *, (x3 | (x3 << 1)) & 1431655765 AS x4,
        |    (y3 | (y3 << 1)) & 1431655765 AS y4 FROM s3)
        |SELECT doc_id, zx, zy, CAST(x4 | (y4 << 1) AS BIGINT) AS zval
        |FROM s4""".stripMargin,

    // HTTP response parse: the ENGINE runs the real message parser
    // (case-insensitive header names, media-type/charset split); the
    // oracle reconstructs every field closed-form
    "q_http_parse" ->
      """WITH b AS (SELECT doc_id, '{"doc":' || doc_id || '}' AS body FROM documents)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 0 THEN 301
        |       WHEN doc_id % 10 = 1 THEN 404 ELSE 200 END AS status,
        |  CASE WHEN doc_id % 10 = 0 THEN 'Moved Permanently'
        |       WHEN doc_id % 10 = 1 THEN 'Not Found' ELSE 'OK' END AS reason,
        |  CASE WHEN doc_id % 3 = 2 THEN 'application/json'
        |       ELSE 'text/html' END AS content_type,
        |  CASE WHEN doc_id % 3 = 0 THEN 'utf-8'
        |       WHEN doc_id % 3 = 1 THEN 'iso-8859-1' ELSE '' END AS charset,
        |  3 AS n_headers,
        |  CAST(len(body) AS BIGINT) AS body_len,
        |  md5(body) AS body_md5
        |FROM b""".stripMargin,

    // robots.txt: the ENGINE parses the real policy text and applies the
    // RFC 9309 longest-match rule; the oracle recomputes the verdict
    // closed-form (named-bot group vs * fallback, the Allow carve-out
    // winning by length, the empty Disallow ignored)
    "q_robots" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 0 THEN 'GraftBot' ELSE 'crawler-x' END AS agent,
        |  CASE WHEN doc_id % 5 = 0 THEN '/pub/page' || doc_id
        |       ELSE '/sec' || (doc_id % 7) || '/item' || (doc_id % 50) END AS path,
        |  CASE WHEN doc_id % 4 = 0 THEN (doc_id % 5 = 0)
        |       WHEN doc_id % 5 = 0 THEN TRUE
        |       WHEN doc_id % 7 = (doc_id % 10) % 7
        |            AND starts_with(CAST(doc_id % 50 AS VARCHAR),
        |                            CAST(doc_id % 10 AS VARCHAR)) THEN TRUE
        |       WHEN doc_id % 7 = (doc_id % 10) % 7 THEN FALSE
        |       ELSE TRUE END AS allowed,
        |  CASE WHEN doc_id % 4 = 0 THEN
        |         (CASE WHEN doc_id % 5 = 0 THEN '/pub' ELSE '/' END)
        |       WHEN doc_id % 5 = 0 THEN ''
        |       WHEN doc_id % 7 = (doc_id % 10) % 7
        |            AND starts_with(CAST(doc_id % 50 AS VARCHAR),
        |                            CAST(doc_id % 10 AS VARCHAR))
        |         THEN '/sec' || (doc_id % 7) || '/item' || (doc_id % 10)
        |       WHEN doc_id % 7 = (doc_id % 10) % 7 THEN '/sec' || (doc_id % 7) || '/'
        |       ELSE '' END AS matched_rule
        |FROM documents""".stripMargin,

    // page-metadata harvest: expected field values written directly from
    // the generation rule (the engine's attr-order/quote-style regexes and
    // the decoy meta tag are what's under test)
    "q_html_meta" ->
      """SELECT doc_id,
        |  'Doc ' || doc_id || ' of record' AS title,
        |  'Summary of document ' || doc_id AS description,
        |  'https://ex.org/canon/' || (doc_id % 100) AS canonical,
        |  'OG Doc ' || doc_id AS og_title
        |FROM documents""".stripMargin,

    // sitemap parse: every entry regenerated by a correlated range unnest
    "q_sitemap" ->
      """SELECT doc_id, CAST(j AS INT) AS url_idx,
        |  'https://s' || (doc_id % 40) || '.example.com/p/' || doc_id || '/' || j
        |    AS loc,
        |  CASE WHEN j % 2 = 0
        |       THEN '2024-0' || ((doc_id % 9) + 1) || '-0' || (j + 1)
        |       ELSE '' END AS lastmod,
        |  '0.' || ((doc_id + j) % 10) AS priority
        |FROM documents, UNNEST(range(0, 1 + doc_id % 3)) AS u(j)""".stripMargin,

    // fused ingest chain: expected extracted text reconstructed closed-form;
    // the SAME digest is pinned for the UTF-8 (even ids) and ISO-8859-1
    // (odd ids) encodings of the accented body — a chain that ignores the
    // declared charset produces U+FFFD for latin-1 docs and fails the hash
    "q_ingest_e2e" ->
      """WITH t AS (SELECT doc_id,
        |    'Doc ' || doc_id || chr(10) || 'café Ü value ' || ((doc_id * 31) % 97)
        |      AS text FROM documents)
        |SELECT doc_id,
        |  'http://w' || (doc_id % 20) || '.example.org/page/' || doc_id AS uri,
        |  200 AS status, 'text/html' AS content_type,
        |  CASE WHEN doc_id % 2 = 0 THEN 'utf-8' ELSE 'iso-8859-1' END AS charset,
        |  CAST(len(text) AS BIGINT) AS n_cp,
        |  md5(text) AS text_md5
        |FROM t""".stripMargin,

    // production robots gate: per-URL longest-match verdict recomputed
    // closed-form (h = host number, h%5=4 hosts have no policy -> allowed;
    // h%3=0 hosts carry the named-bot group GraftBot must prefer; others
    // fall back to *'s Disallow /sec{h%7}/ + longer Allow carve-out)
    "q_robots_frontier" ->
      """WITH u AS (SELECT doc_id, doc_id % 25 AS h,
        |    CASE WHEN doc_id % 6 = 0 THEN '/cgi/bin'
        |         WHEN doc_id % 6 = 1 THEN '/cgi/ok-page'
        |         ELSE '/sec' || (doc_id % 7) || '/item' || (doc_id % 50)
        |    END AS path
        |  FROM documents)
        |SELECT doc_id, 'h' || h AS host, path,
        |  CASE WHEN h % 5 = 4 THEN TRUE
        |       WHEN h % 3 = 0 THEN (doc_id % 6 <> 0)
        |       WHEN doc_id % 6 IN (0, 1) THEN TRUE
        |       WHEN doc_id % 7 = h % 7
        |            AND starts_with(CAST(doc_id % 50 AS VARCHAR),
        |                            CAST(h AS VARCHAR)) THEN TRUE
        |       WHEN doc_id % 7 = h % 7 THEN FALSE
        |       ELSE TRUE END AS allowed,
        |  CASE WHEN h % 5 = 4 THEN ''
        |       WHEN h % 3 = 0 THEN
        |         (CASE WHEN doc_id % 6 = 0 THEN '/cgi/'
        |               WHEN doc_id % 6 = 1 THEN '/cgi/ok'
        |               ELSE '' END)
        |       WHEN doc_id % 6 IN (0, 1) THEN ''
        |       WHEN doc_id % 7 = h % 7
        |            AND starts_with(CAST(doc_id % 50 AS VARCHAR),
        |                            CAST(h AS VARCHAR))
        |         THEN '/sec' || (doc_id % 7) || '/item' || h
        |       WHEN doc_id % 7 = h % 7 THEN '/sec' || (doc_id % 7) || '/'
        |       ELSE '' END AS matched_rule
        |FROM u""".stripMargin,

    // streaming ingest: stateless chain -> drained result must equal the
    // batch run bit-for-bit; SAME closed-form oracle as q_ingest_e2e
    "q_stream_ingest" ->
      """WITH t AS (SELECT doc_id,
        |    'Doc ' || doc_id || chr(10) || 'café Ü value ' || ((doc_id * 31) % 97)
        |      AS text FROM documents)
        |SELECT doc_id,
        |  'http://w' || (doc_id % 20) || '.example.org/page/' || doc_id AS uri,
        |  200 AS status, 'text/html' AS content_type,
        |  CASE WHEN doc_id % 2 = 0 THEN 'utf-8' ELSE 'iso-8859-1' END AS charset,
        |  CAST(len(text) AS BIGINT) AS n_cp,
        |  md5(text) AS text_md5
        |FROM t""".stripMargin,

    // corpus-mix rollup: all four grouping sets in one statement
    "q_mix_cube" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY CUBE(lang, source)""".stripMargin,

    // lang-by-source matrix: fixed source vocabulary as conditional counts
    "q_lang_source_pivot" ->
      ("""SELECT lang, """ +
        (0 until 20).map(i =>
          s"CAST(count(*) FILTER (WHERE source = 'src$i') AS BIGINT) AS src$i")
          .mkString(", ") +
        " FROM documents GROUP BY lang")
  )

  /** DuckDB replica of Similarity.kMeansInt: quantize to the same
    * non-negative integer grid, unroll the fixed Lloyd rounds as CTEs.
    * All arithmetic is integer (sums order-independent; `//` floor on
    * non-negative operands ≡ Spark `div`), so both engines emit
    * bit-identical assignments — see the kMeansInt scaladoc.
    */
  private def kmeansSql(k: Int, rounds: Int, dim: Int): String = {
    val head =
      s"""WITH qv AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) + 1024 AS BIGINT)) AS q
         |  FROM embeddings),
         |c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS k, q AS c
         |  FROM (SELECT vec_id, q FROM qv ORDER BY vec_id LIMIT $k))""".stripMargin
    val steps = (1 to rounds).map { i =>
      val assign =
        s"""d$i AS (
           |  SELECT qv.vec_id, c${i - 1}.k,
           |    list_reduce(list_transform(range(1, ${dim + 1}),
           |      i -> (q[CAST(i AS INT)] - c[CAST(i AS INT)])
           |         * (q[CAST(i AS INT)] - c[CAST(i AS INT)])),
           |      (a, b) -> a + b) AS dist2
           |  FROM qv CROSS JOIN c${i - 1}),
           |a$i AS MATERIALIZED (SELECT vec_id, k AS cluster, dist2 FROM (
           |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2, k) AS rn
           |  FROM d$i) WHERE rn = 1)""".stripMargin
      if (i == rounds) assign
      else assign + ",\n" +
        s"""s$i AS (SELECT a.cluster, i.i AS dim, sum(q[CAST(i.i AS INT)]) AS s,
           |    count(*) AS n
           |  FROM a$i a JOIN qv USING (vec_id), range(1, ${dim + 1}) i(i)
           |  GROUP BY 1, 2),
           |cp$i AS (SELECT cluster AS k, list(CAST(s // n AS BIGINT) ORDER BY dim) AS c
           |  FROM s$i GROUP BY 1),
           |c$i AS (SELECT c${i - 1}.k, COALESCE(cp$i.c, c${i - 1}.c) AS c
           |  FROM c${i - 1} LEFT JOIN cp$i USING (k))""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"""
         |SELECT vec_id, CAST(cluster AS INT) AS cluster,
         |  CAST(dist2 AS BIGINT) AS dist2
         |FROM a$rounds""".stripMargin
  }

  private def tokCountSql(col: String): String =
    s"len(list_filter(string_split_regex(lower($col), '[^a-z0-9]+'), x -> len(x) > 0))"

  private def toksSql(col: String): String =
    s"list_filter(string_split_regex(lower($col), '[^a-z0-9]+'), x -> len(x) > 0)"

  /** Portable Bloom: rebuild the exact bit set from the same splitmix64
    * family and replay the all-k-positions-set verdict per document
    * (duplicate positions join twice on both sides, so count = k is
    * exactly the engine's forall).
    */
  private def bloomSql(k: Int, m: Int): String = {
    val base = HashSql.hashShingleSql("text", graft.sketch.Sketch.BloomSeed)
    def posExpr(i: Int): String = {
      val seed = graft.extract.Synth.mix64(graft.sketch.Sketch.BloomSeed + i)
      val sc = s"CAST('${java.lang.Long.toUnsignedString(seed)}' AS HUGEINT)"
      s"(${HashSql.mix64(HashSql.xor64("base", sc))}) % $m"
    }
    val blPos = (0 until k).map(i => s"  SELECT ${posExpr(i)} AS pos FROM blh")
      .mkString("\n  UNION ALL\n")
    val docPos = (0 until k).map(i => s"  SELECT doc_id, ${posExpr(i)} AS pos FROM dh")
      .mkString("\n  UNION ALL\n")
    s"""WITH bl AS (SELECT DISTINCT text FROM documents WHERE doc_id % 11 = 0),
       |blh AS (SELECT $base AS base FROM bl),
       |bits AS (SELECT DISTINCT pos FROM (
       |$blPos)),
       |dh AS (SELECT doc_id, $base AS base FROM documents),
       |dp AS (
       |$docPos),
       |hits AS (SELECT doc_id, count(*) AS nhit FROM dp JOIN bits USING (pos)
       |         GROUP BY doc_id),
       |ex AS (SELECT DISTINCT d.doc_id FROM documents d JOIN bl ON d.text = bl.text)
       |SELECT d.doc_id, coalesce(h.nhit, 0) = $k AS dropped_bloom,
       |  (ex.doc_id IS NOT NULL) AS dropped_exact
       |FROM documents d
       |LEFT JOIN hits h ON h.doc_id = d.doc_id
       |LEFT JOIN ex ON ex.doc_id = d.doc_id""".stripMargin
  }

  /** HLL: rebuild the register table with the engine's exact hash chain and
    * re-derive the raw estimate through the SAME ascending-j IEEE fold of
    * exact power-of-two reciprocals (list_reduce is left-to-right like the
    * engine's foldLeft; every term and the alpha constant are bit-identical,
    * so the emitted double matches exactly).
    */
  private def hllSql: String = {
    val m = graft.sketch.Sketch.HllM
    val alpha = s"CAST('${graft.sketch.Sketch.HllAlpha.toString}' AS DOUBLE)"
    s"""WITH k AS (SELECT 'e' || (event_id // 3) AS key FROM events),
       |hb AS (SELECT ${HashSql.hashShingleSql("key", graft.sketch.Sketch.HllSeed)} AS h FROM k),
       |jr AS (SELECT CAST(h % $m AS INT) AS j,
       |         CASE WHEN h // $m = 0 THEN 57
       |              ELSE 57 - length(format('{:b}', CAST(h // $m AS BIGINT))) END AS rho
       |       FROM hb),
       |regs AS (SELECT j, max(rho) AS m_j FROM jr GROUP BY j),
       |fullr AS (SELECT CAST(r.r AS INT) AS j, coalesce(regs.m_j, 0) AS mj
       |          FROM (SELECT UNNEST(range(0, $m)) AS r) r LEFT JOIN regs ON regs.j = r.r),
       |s AS (SELECT list_reduce(
       |        list_prepend(CAST(0.0 AS DOUBLE),
       |          list(1.0 / CAST((CAST(1 AS BIGINT) << mj) AS DOUBLE) ORDER BY j)),
       |        (a, b) -> a + b) AS harm FROM fullr),
       |dig AS (SELECT md5(string_agg(j || ':' || m_j, ',' ORDER BY j)) AS regs_md5,
       |               count(*) AS n_regs FROM regs),
       |ex AS (SELECT CAST(count(DISTINCT key) AS BIGINT) AS n_exact FROM k)
       |SELECT CAST($m AS BIGINT) AS m, CAST($m - dig.n_regs AS BIGINT) AS v_zero,
       |  $alpha * ${m.toDouble * m.toDouble} / s.harm AS hll_est,
       |  ex.n_exact, dig.regs_md5
       |FROM s, dig, ex""".stripMargin
  }

  /** CMS heavy hitters: rebuild the sketch relationally with the engine's
    * exact hash chain (shingle-fold base, per-row splitmix64 re-seed, low
    * bits as the bucket) and compare min-over-rows estimates + exact counts.
    */
  private def cmsSql(width: Int, threshold: Long): String = {
    val rows = graft.sketch.Sketch.RowSeeds.zipWithIndex.map { case (s, d) =>
      val seed = s"CAST('${java.lang.Long.toUnsignedString(s)}' AS HUGEINT)"
      s"  SELECT tok, n, $d AS d,\n" +
      s"    CAST((${HashSql.mix64(HashSql.xor64("base", seed))}) % $width AS BIGINT) AS bucket FROM hb"
    }.mkString("\n  UNION ALL\n")
    s"""WITH occ AS (SELECT UNNEST(${toksSql("text")}) AS tok FROM documents),
       |cnt AS (SELECT tok, count(*) AS n FROM occ GROUP BY tok),
       |hb AS (SELECT tok, n, ${HashSql.hashShingleSql("tok", graft.sketch.Sketch.CmsSeed)} AS base FROM cnt),
       |rws AS (
       |$rows),
       |cells AS (SELECT d, bucket, CAST(sum(n) AS BIGINT) AS total FROM rws GROUP BY 1, 2),
       |est AS (SELECT tok, n, min(total) AS cms_est FROM rws JOIN cells USING (d, bucket)
       |        GROUP BY tok, n)
       |SELECT tok AS token, cms_est, CAST(n AS BIGINT) AS n_exact
       |FROM est WHERE cms_est >= $threshold""".stripMargin
  }

  // TextOps PII regexes with Scala escaping unwound (single-backslash form
  // embeds directly into DuckDB single-quoted strings)
  private def piiEmailRe: String = TextOps.EmailRe
  private def piiPhoneRe: String = TextOps.PhoneRe
  private def piiIpRe: String = TextOps.IpRe

  private def stopHitsSql(col: String, lang: String): String = {
    val list = TextOps.stopwords(lang).map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(string_split_regex(lower($col), '[^a-z0-9]+'), x -> list_contains($list, x)))"
  }

  private def langIdSql: String = {
    val langs = Seq("en", "de", "es", "fr", "pt")
    val hits = langs.map(l => s"${stopHitsSql("text", l)} AS h_$l").mkString(",\n    ")
    val caseExpr = langs.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1).map(r => s"h_$l >= h_$r").mkString(" AND ")
      if (rest.isEmpty) s"ELSE '$l'" else s"WHEN $rest THEN '$l'"
    }
    s"""SELECT doc_id, CASE ${caseExpr.init.mkString(" ")} ${caseExpr.last} END AS pred_lang
       |FROM (SELECT doc_id,
       |    $hits
       |  FROM documents)""".stripMargin
  }

  /** Corpus unigram LM (shared by q_text_unigram_lm and q_ppl_buckets):
    * mirrors the engine's single-scan shape — aggregate to (doc, tok, cnt)
    * pairs, derive freq/total from that relation, and score with the
    * fixed-point micro-nat table (see the q_text_unigram_lm comment).
    */
  private def unigramLmSql: String =
    s"""WITH dt AS (
       |  SELECT doc_id, tok, count(*) AS cnt FROM (
       |    SELECT doc_id, UNNEST(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |      x -> len(x) > 0)) AS tok
       |    FROM documents)
       |  GROUP BY doc_id, tok),
       |freq AS (SELECT tok, sum(cnt) AS freq FROM dt GROUP BY tok),
       |tot AS (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM freq),
       |q AS (SELECT tok,
       |  CAST(round(-ln(freq / (SELECT total FROM tot)) * 1000000.0) AS BIGINT) AS q
       |  FROM freq)
       |SELECT dt.doc_id,
       |  CAST(sum(dt.cnt * q.q) AS DOUBLE)
       |    / (CAST(sum(dt.cnt) AS DOUBLE) * 1000000.0) AS neg_logprob
       |FROM dt JOIN q ON q.tok = dt.tok
       |GROUP BY dt.doc_id""".stripMargin

  /** Closed-form resolution of the four fetchable anchor kinds in
    * Queries.webLinks's fixture (absolute / rooted / relative / parent;
    * fragment-only and mailto anchors are dropped by the engine and simply
    * absent here). Base page: `https://site{id%50}.example.org/dir/page{id}`.
    */
  private def webLinksSql: String =
    """SELECT doc_id, href, resolved, tgt_host FROM (
      |  SELECT doc_id,
      |    'https://ext' || (doc_id % 20) || '.example.net/x/' || doc_id AS href,
      |    'https://ext' || (doc_id % 20) || '.example.net/x/' || doc_id AS resolved,
      |    'ext' || (doc_id % 20) || '.example.net' AS tgt_host
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, '/r/' || (doc_id % 10),
      |    'https://site' || (doc_id % 50) || '.example.org/r/' || (doc_id % 10),
      |    'site' || (doc_id % 50) || '.example.org'
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, 'a/b' || (doc_id % 5),
      |    'https://site' || (doc_id % 50) || '.example.org/dir/a/b' || (doc_id % 5),
      |    'site' || (doc_id % 50) || '.example.org'
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, '../up' || (doc_id % 3),
      |    'https://site' || (doc_id % 50) || '.example.org/up' || (doc_id % 3),
      |    'site' || (doc_id % 50) || '.example.org'
      |  FROM documents)""".stripMargin

  /** DuckDB replica of graft.extract.UrlOps over the same synthesized messy
    * frontier as Queries.urlCanonicalize.
    */
  private def urlNormalizeSql: String = {
    import graft.extract.UrlOps
    val suffixes = UrlOps.MultiPartSuffixes.map(s => s"'$s'").mkString(", ")
    val trackFilter = UrlOps.TrackingPrefixes
      .map(t => s"NOT starts_with(p, '$t')").mkString(" AND ")
    s"""WITH raw AS (
       |  SELECT doc_id,
       |    (['https','HTTP','http','HTTPS'])[CAST(doc_id % 4 AS INT) + 1] || '://' ||
       |    CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END ||
       |    CASE WHEN doc_id % 2 = 0 THEN 'site' ELSE 'SiTe' END || CAST(doc_id % 50 AS VARCHAR) ||
       |    (['.co.uk','.com','.example.org','.github.io','.net'])[CAST(doc_id % 5 AS INT) + 1] ||
       |    ([':443',':80',':8080','','',''])[CAST(doc_id % 6 AS INT) + 1] ||
       |    '/Wiki/Page' || CAST(doc_id AS VARCHAR) ||
       |    CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END ||
       |    CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&b=2&a=1'
       |         WHEN doc_id % 4 = 1 THEN '?b=2&utm_campaign=x&fbclid=F' || CAST(doc_id AS VARCHAR)
       |         WHEN doc_id % 4 = 2 THEN '?a=1' ELSE '' END ||
       |    CASE WHEN doc_id % 2 = 0 THEN '#sec' || CAST(doc_id % 4 AS VARCHAR) ELSE '' END AS url_raw
       |  FROM documents),
       |p1 AS (SELECT doc_id, url_raw, regexp_replace(url_raw, '#.*$$', '') AS nofrag FROM raw),
       |p2 AS (SELECT doc_id, url_raw,
       |    lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
       |    regexp_extract(regexp_replace(nofrag, '\\?.*$$', ''),
       |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)', 1) AS hp,
       |    regexp_replace(regexp_extract(regexp_replace(nofrag, '\\?.*$$', ''),
       |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)?$$', 1), '/+$$', '') AS pth,
       |    regexp_extract(nofrag, '\\?(.*)$$', 1) AS q
       |  FROM p1),
       |p3 AS (SELECT doc_id, url_raw, sch, pth,
       |    regexp_replace(regexp_replace(lower(hp), ':[0-9]+$$', ''), '^www\\.', '') AS host,
       |    regexp_extract(hp, ':([0-9]+)$$', 1) AS port,
       |    array_to_string(list_sort(list_filter(string_split(q, '&'),
       |      p -> len(p) > 0 AND $trackFilter)), '&') AS q2
       |  FROM p2),
       |p4 AS (SELECT doc_id, url_raw, host, pth,
       |    sch || '://' || host ||
       |    CASE WHEN port <> '' AND NOT ((sch = 'http' AND port = '80')
       |                               OR (sch = 'https' AND port = '443'))
       |         THEN ':' || port ELSE '' END ||
       |    pth ||
       |    CASE WHEN q2 <> '' THEN '?' || q2 ELSE '' END AS url_canon,
       |    string_split(host, '.') AS labels
       |  FROM p3)
       |SELECT doc_id, url_raw, url_canon, host,
       |  CASE WHEN len(labels) >= 3 AND
       |            array_to_string(labels[greatest(len(labels) - 1, 1):len(labels)], '.')
       |              IN ($suffixes)
       |       THEN array_to_string(labels[greatest(len(labels) - 2, 1):len(labels)], '.')
       |       WHEN len(labels) >= 2
       |       THEN array_to_string(labels[greatest(len(labels) - 1, 1):len(labels)], '.')
       |       ELSE host END AS reg_domain,
       |  CAST(len(list_filter(string_split(pth, '/'), x -> len(x) > 0)) AS BIGINT) AS path_depth
       |FROM p4""".stripMargin
  }

  /** DuckDB replica of the HashedLinearScore fold: unigram + bigram
    * features, polyhash31 over the first 64 chars, splitmix64 bucket and
    * integer per-mille weight (graft.textops.HashedLinearScore).
    */
  private def qualityClassifySql: String = {
    import graft.textops.HashedLinearScore
    val p = TextOps.FpPrime
    val powList = (0 until TextOps.FpLen)
      .scanLeft(1L)((a, _) => a * 31 % p).init
      .mkString("[", ", ", "]")
    val polyhash =
      s"""CAST(list_aggregate(list_transform(range(0, least(len(f), ${TextOps.FpLen})),
         |      i -> (CAST(ascii(substr(f, CAST(i AS INT) + 1, 1)) AS BIGINT) * ($powList)[CAST(i AS INT) + 1]) % $p),
         |      'sum') % $p AS HUGEINT)""".stripMargin
    val two64 = "18446744073709551616"
    val seedU = java.lang.Long.toUnsignedString(HashedLinearScore.DefaultSeed)
    val saltU = java.lang.Long.toUnsignedString(HashedLinearScore.WeightSalt)
    val bucket = s"(${HashSql.mix64(HashSql.xor64("h", seedU))} % ${HashedLinearScore.DefaultBuckets})"
    val weight = s"((${HashSql.mix64(s"((b + $saltU) % $two64)")} % 2001) - 1000)"
    s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
       |f AS (SELECT doc_id, UNNEST(list_concat(toks,
       |        list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]))) AS f
       |      FROM t WHERE len(toks) > 0),
       |hf AS (SELECT doc_id, $polyhash AS h FROM f),
       |bf AS (SELECT doc_id, $bucket AS b FROM hf),
       |wf AS (SELECT doc_id, $weight AS w FROM bf)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_feats,
       |  CAST(sum(w) AS BIGINT) AS score_milli,
       |  CAST(sum(w) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000.0) AS score,
       |  sum(w) > 0 AS keep
       |FROM wf GROUP BY doc_id""".stripMargin
  }

  /** DuckDB replica of the DSIR importance-weight pipeline
    * (graft.textops.Dsir): the same unigram+bigram feature relation as
    * [[qualityClassifySql]] but bucketed at Dsir.DefaultBuckets with
    * Dsir.DefaultSeed, target = doc_id % 7 = 0, per-bucket micro-nat
    * log-ratio with per-COMPONENT qln rounding (every ln argument is an
    * exact integer ≥ 1 so DuckDB round = Spark HALF_UP), exact-integer
    * per-doc fold.
    */
  private def dsirSql: String = {
    import graft.textops.Dsir
    val p = TextOps.FpPrime
    val powList = (0 until TextOps.FpLen)
      .scanLeft(1L)((a, _) => a * 31 % p).init
      .mkString("[", ", ", "]")
    val polyhash =
      s"""CAST(list_aggregate(list_transform(range(0, least(len(f), ${TextOps.FpLen})),
         |      i -> (CAST(ascii(substr(f, CAST(i AS INT) + 1, 1)) AS BIGINT) * ($powList)[CAST(i AS INT) + 1]) % $p),
         |      'sum') % $p AS HUGEINT)""".stripMargin
    val seedU = java.lang.Long.toUnsignedString(Dsir.DefaultSeed)
    val b = Dsir.DefaultBuckets
    val bucket = s"(${HashSql.mix64(HashSql.xor64("h", seedU))} % $b)"
    def qln(x: String): String =
      s"CAST(round(ln(CAST(($x) AS DOUBLE)) * 1000000.0) AS BIGINT)"
    s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
       |f AS (SELECT doc_id, UNNEST(list_concat(toks,
       |        list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]))) AS f
       |      FROM t WHERE len(toks) > 0),
       |hf AS (SELECT doc_id, $polyhash AS h FROM f),
       |bf AS (SELECT doc_id, CAST($bucket AS BIGINT) AS b FROM hf),
       |rc AS (SELECT b, count(*) AS r FROM bf GROUP BY b),
       |tc AS (SELECT b, count(*) AS tt FROM bf WHERE doc_id % 7 = 0 GROUP BY b),
       |tot AS (SELECT (SELECT sum(r) FROM rc) AS totr,
       |               (SELECT coalesce(sum(tt), 0) FROM tc) AS tott),
       |cc AS (SELECT ${qln(s"tott + $b")} - ${qln(s"totr + $b")} AS c FROM tot),
       |q AS (SELECT rc.b,
       |        ${qln("coalesce(tc.tt, 0) + 1")} - ${qln("rc.r + 1")}
       |          - (SELECT c FROM cc) AS q
       |      FROM rc LEFT JOIN tc ON tc.b = rc.b)
       |SELECT bf.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_feats,
       |  CAST(sum(q.q) AS BIGINT) AS q_milli,
       |  CAST(sum(q.q) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0) AS dsir_w
       |FROM bf JOIN q ON q.b = bf.b
       |GROUP BY bf.doc_id""".stripMargin
  }

  private def fingerprintSql: String = {
    val powList = (0 until TextOps.FpLen)
      .scanLeft(1L)((a, _) => a * 31 % TextOps.FpPrime).init
      .mkString("[", ", ", "]")
    s"""SELECT doc_id,
       |  CAST(CASE WHEN text IS NULL OR length(text) = 0 THEN 0 ELSE
       |    list_aggregate(list_transform(range(0, least(length(text), ${TextOps.FpLen})),
       |      i -> (CAST(ascii(substr(text, CAST(i AS INT) + 1, 1)) AS BIGINT) * ($powList)[CAST(i AS INT) + 1])
       |           % ${TextOps.FpPrime}), 'sum') % ${TextOps.FpPrime} END AS BIGINT) AS fp
       |FROM documents""".stripMargin
  }
}
