package graft.queries

import graft.sim.Similarity

/** DuckDB SQL generators that replicate the engine's splitmix64-based hash
  * operators bit-exactly, so the hash-blocked dedup/similarity queries get
  * full value-level oracles instead of rows-only checks.
  *
  * DuckDB has no wrapping 64-bit arithmetic (BIGINT/UBIGINT overflow raises),
  * so u64 values travel as HUGEINT in [0, 2^64): addition is `% 2^64`,
  * multiplication splits the left operand at 2^32
  * (`a*b mod 2^64 = ((a%2^32)*b + ((a/2^32*b) mod 2^32)*2^32) mod 2^64`,
  * every intermediate <= 2^97 fits HUGEINT), and xor/shift round-trip through
  * UBIGINT. Character folds use `list_reduce` (sequential by definition,
  * matching the engine's left fold); fixed-width folds (band keys) unroll
  * into chained CTE stages. Validated step-by-step against an independent
  * reference implementation of splitmix64.
  */
object HashSql {

  private val Two64 = "18446744073709551616"
  private val Two63 = "9223372036854775808"
  private def uc(x: Long): String = java.lang.Long.toUnsignedString(x)
  private val Gold = uc(0x9e3779b97f4a7c15L)
  private val M1 = uc(0xbf58476d1ce4e5b9L)
  private val M2 = uc(0x94d049bb133111ebL)

  /** (a * b) mod 2^64 for HUGEINT-typed u64 expressions. */
  def mulmod(a: String, b: String): String =
    s"(((($a) % 4294967296) * $b + (((($a) // 4294967296) * $b) % 4294967296) * 4294967296) % $Two64)"

  def xor64(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"

  def shr(a: String, n: Int): String =
    s"CAST((CAST(($a) AS UBIGINT) >> $n) AS HUGEINT)"

  /** Full splitmix64 finalizer (graft.extract.Synth.mix64) over a HUGEINT
    * u64 expression.
    */
  def mix64(e: String): String = {
    val z1 = s"((($e) + $Gold) % $Two64)"
    val z2 = mulmod(xor64(z1, shr(z1, 30)), M1)
    val z3 = mulmod(xor64(z2, shr(z2, 27)), M2)
    xor64(z3, shr(z3, 31))
  }

  /** Dedup.hashShingle(col, seed): left fold of mix64(h ^ charCode) over the
    * string's characters (ASCII inputs; engine uses UTF-16 code units, which
    * coincide for the `[a-z0-9 ]` alphabet these tokens live in).
    */
  def hashShingleSql(col: String, seed: Long): String = {
    val lam = mix64(xor64("h", "c"))
    s"""CAST(list_reduce(list_prepend(CAST(${uc(seed)} AS HUGEINT),
       |      list_transform(range(1, len($col)+1), i -> CAST(ascii(substr($col, CAST(i AS INT), 1)) AS HUGEINT))),
       |      (h, c) -> $lam) AS HUGEINT)""".stripMargin
  }

  /** Oracle for Dedup.winnowFingerprints: character k-gram splitmix hashes
    * over the token-normalized text, per-w-window SIGNED min with the
    * rightmost-position tie rule, distinct selections in position order —
    * digested as (doc_id, n_fps, md5 of the ordered `pos:fp` CSV), pos
    * 0-based like the engine. The window scan is relational (a windowed
    * min + a bounded argmax join), bit-exact vs the engine's selection.
    */
  def winnowSql(k: Int, w: Int, seed: Long): String =
    s"""WITH ${winnowCtes(k, w, seed)}
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps,
       |  md5(string_agg((pos - 1) || ':' || fp, ',' ORDER BY pos)) AS fps_md5
       |FROM fp GROUP BY doc_id""".stripMargin

  /** Oracle for Dedup.winnowCandidates: distinct fingerprint VALUES per doc
    * from the same selection CTEs, df-capped (fingerprints shared by more
    * than maxBucket docs drop — the capBuckets mirror), paired a < b,
    * shared-key count thresholded.
    */
  def winnowPairsSql(k: Int, w: Int, seed: Long, minShared: Long, maxBucket: Int): String =
    s"""WITH ${winnowCtes(k, w, seed)},
       |vals AS (SELECT DISTINCT doc_id, fp AS v FROM fp),
       |caps AS (SELECT v FROM vals GROUP BY v HAVING count(*) <= $maxBucket),
       |cf AS (SELECT vals.doc_id, vals.v FROM vals JOIN caps USING (v))
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
       |FROM cf a JOIN cf b ON a.v = b.v AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= $minShared""".stripMargin

  /** Shared CTE chain: token-normalize, k-gram splitmix hashes (signed),
    * windowed min with rightmost tie, distinct (doc, pos, fp) selections.
    */
  private def winnowCtes(k: Int, w: Int, seed: Long): String = {
    val h = hashShingleSql("gram", seed)
    s"""c AS (SELECT doc_id,
       |    array_to_string(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |      x -> len(x) > 0), ' ') AS s FROM documents),
       |g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, substr(s, CAST(i AS INT), $k) AS gram
       |      FROM c, UNNEST(range(1, len(s) - $k + 2)) AS u(i)
       |      WHERE len(s) >= $k),
       |dg AS (SELECT DISTINCT gram FROM g),
       |dh AS (SELECT gram, $h AS uv FROM dg),
       |hu AS (SELECT g.doc_id, g.pos, dh.uv FROM g JOIN dh USING (gram)),
       |hs AS (SELECT doc_id, pos,
       |         CASE WHEN uv >= $Two63 THEN uv - $Two64 ELSE uv END AS sval FROM hu),
       |st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ng FROM hs GROUP BY 1),
       |wm AS (SELECT doc_id, pos AS j,
       |         min(sval) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS m
       |       FROM hs),
       |wins AS (SELECT wm.doc_id, wm.j, wm.m FROM wm JOIN st USING (doc_id)
       |         WHERE wm.j <= greatest(st.ng - $w + 1, 1)),
       |sel AS (SELECT w1.doc_id, max(h2.pos) AS pos, w1.m AS fp
       |        FROM wins w1 JOIN hs h2 ON h2.doc_id = w1.doc_id
       |          AND h2.pos BETWEEN w1.j AND w1.j + ${w - 1} AND h2.sval = w1.m
       |        GROUP BY w1.doc_id, w1.j, w1.m),
       |fp AS (SELECT DISTINCT doc_id, pos, fp FROM sel)""".stripMargin
  }

  /** Oracle for TextOps.capPerDomain over documents(source): deterministic
    * pseudo-random rank = (mix64(doc_id ^ seed) unsigned-mod 10^9, doc_id)
    * within each source — bit-exact vs the engine's splitmix64 rank.
    */
  def domainCapSql(cap: Int, seed: Long): String = {
    val rank =
      s"(${mix64(xor64("CAST(doc_id AS HUGEINT)", s"CAST('${uc(seed)}' AS HUGEINT)"))}) % 1000000000"
    s"""SELECT doc_id, source, domain_rank FROM (
       |  SELECT doc_id, source,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY $rank, doc_id) AS INT)
       |      AS domain_rank
       |  FROM documents)
       |WHERE domain_rank <= $cap""".stripMargin
  }

  /** Oracle for TextOps.shardManifest: splitmix shard id (unsigned mod) +
    * order-free bit_xor checksum over the SIGNED mix values — bit-exact.
    */
  def shardManifestSql(nShards: Int, seed: Long): String = {
    val u = mix64(xor64("CAST(doc_id AS HUGEINT)", s"CAST('${uc(seed)}' AS HUGEINT)"))
    s"""WITH m AS (
       |  SELECT ($u) AS u, len(text) AS nc FROM documents),
       |s AS (SELECT CAST(u % $nShards AS BIGINT) AS shard,
       |        CAST(CASE WHEN u >= $Two63 THEN u - $Two64 ELSE u END AS BIGINT) AS sm,
       |        nc FROM m)
       |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(nc) AS BIGINT) AS sum_chars,
       |  bit_xor(sm) AS checksum
       |FROM s GROUP BY 1""".stripMargin
  }

  /** Oracle for TextOps.temperatureSample (alpha = 0.5 mC4/ROOTS mixture):
    * quotas from the identical defined-order left fold over sqrt counts
    * (list_reduce ≡ the engine's Scala fold; sqrt is IEEE-exact in both),
    * per-language ranks from the same splitmix64 rank key — bit-exact.
    */
  def temperatureMixSql(seed: Long): String = {
    val mxr =
      s"(${mix64(xor64("CAST(doc_id AS HUGEINT)", s"CAST('${uc(seed)}' AS HUGEINT)"))}) % 1000000000"
    s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
       |tq AS (SELECT count(*) // 2 AS t FROM documents),
       |st AS (SELECT list_reduce(list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang),
       |         (a, b) -> a + b) AS stot FROM c),
       |q AS (SELECT lang, CAST(floor(CAST((SELECT t FROM tq) AS DOUBLE)
       |         * sqrt(CAST(n AS DOUBLE)) / (SELECT stot FROM st)) AS BIGINT) AS quota
       |       FROM c),
       |m AS (SELECT doc_id, lang, $mxr AS mxr FROM documents),
       |r AS (SELECT doc_id, lang,
       |        CAST(row_number() OVER (PARTITION BY lang ORDER BY mxr, doc_id) AS BIGINT)
       |          AS lang_rank FROM m)
       |SELECT r.doc_id, r.lang, r.lang_rank, q.quota,
       |  r.lang_rank <= q.quota AS selected
       |FROM r JOIN q USING (lang)""".stripMargin
  }

  /** Oracle for TextOps.trainValSplit: splitmix64 over (doc_id ^ seed),
    * unsigned mod 1000 vs the val permille — bit-exact.
    */
  def splitSql(valPermille: Int, seed: Long): String =
    s"""SELECT doc_id,
       |  CASE WHEN (${mix64(xor64("CAST(doc_id AS HUGEINT)", s"CAST('${uc(seed)}' AS HUGEINT)"))}) % 1000 < $valPermille
       |       THEN 'val' ELSE 'train' END AS split
       |FROM documents""".stripMargin

  /** Oracle for TextOps.stratifiedSample over documents(lang): the same
    * splitmix64 bucket as splitSql vs a per-stratum permille CASE —
    * bit-exact.
    */
  def stratifiedSampleSql(enPermille: Int, defaultPermille: Int, seed: Long): String =
    s"""SELECT doc_id, lang FROM documents
       |WHERE (${mix64(xor64("CAST(doc_id AS HUGEINT)", s"CAST('${uc(seed)}' AS HUGEINT)"))}) % 1000
       |  < CASE WHEN lang = 'en' THEN $enPermille ELSE $defaultPermille END""".stripMargin

  /** Oracle for TextOps.mixCorpora over (documents as 'web', part as
    * 'parts'): the same per-source splitmix bucket with the seed rotated by
    * source index — bit-exact.
    */
  def mixCorporaSql(seed: Long, webPermille: Int, partsPermille: Int): String = {
    def bucket(id: String, s: Long) =
      s"(${mix64(xor64(s"CAST($id AS HUGEINT)", s"CAST('${uc(s)}' AS HUGEINT)"))}) % 1000"
    s"""SELECT 'web' AS source, doc_id, text FROM documents
       |WHERE ${bucket("doc_id", seed)} < $webPermille
       |UNION ALL
       |SELECT 'parts' AS source, p_partkey AS doc_id, p_name AS text FROM part
       |WHERE ${bucket("p_partkey", seed + 1)} < $partsPermille""".stripMargin
  }

  /** Oracle for Dedup.simHashPairs over `documents`: per-token splitmix hash,
    * 64 bit votes, chunk-blocked (cap mirrored) candidate pairs, hamming
    * verify. The 4-chunk pigeonhole is complete for maxDist <= 3, so this
    * equals the engine output exactly.
    */
  def simhashPairsSql(maxDist: Int, maxBucket: Int): String = {
    val votes = (0 until 64)
      .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(",\n    ")
    val bits = (0 until 64)
      .map(b => s"CASE WHEN v$b > 0 THEN CAST(${uc(1L << b)} AS UBIGINT) ELSE CAST(0 AS UBIGINT) END")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, u.tok FROM documents,
       |    UNNEST(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS u(tok)),
       |dtok AS (SELECT DISTINCT tok FROM toks),
       |th AS (SELECT tok, CAST(${hashShingleSql("tok", 0x51e0a9L)} AS UBIGINT) AS h FROM dtok),
       |votes AS (
       |  SELECT t.doc_id, $votes
       |  FROM toks t JOIN th USING (tok) GROUP BY 1),
       |-- LEFT JOIN keeps token-less documents: every vote is NULL -> every
       |-- bit CASE falls to 0 -> sh = 0, exactly the engine's simHash("")
       |sh AS (
       |  SELECT d.doc_id, $bits AS sh
       |  FROM (SELECT doc_id FROM documents) d LEFT JOIN votes USING (doc_id)),
       |chunks AS (
       |  SELECT doc_id, ((sh >> (16*c)) & 65535) | (CAST(c AS UBIGINT) << 56) AS chunk
       |  FROM sh, UNNEST([0,1,2,3]) AS u(c)),
       |kept AS (
       |  SELECT doc_id, chunk FROM (
       |    SELECT doc_id, chunk, count(*) OVER (PARTITION BY chunk) AS n FROM chunks)
       |  WHERE n <= $maxBucket),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM kept a JOIN kept b ON a.chunk = b.chunk AND a.doc_id < b.doc_id)
       |SELECT c.id_a, c.id_b, CAST(bit_count(xor(sa.sh, sb.sh)) AS INT) AS dist
       |FROM cand c JOIN sh sa ON sa.doc_id = c.id_a JOIN sh sb ON sb.doc_id = c.id_b
       |WHERE bit_count(xor(sa.sh, sb.sh)) <= $maxDist""".stripMargin
  }

  /** Oracle for Dedup.minHashLsh over `documents`: word k-shingles, 64
    * min-hashes (SIGNED-long min, matching the engine's Long comparison),
    * 16 band keys via the unrolled mix64 fold, capped band buckets, exact
    * Jaccard verify over distinct shingle sets.
    */
  def minhashLshSql(k: Int, threshold: Double, maxBucket: Int): String = {
    val nHashes = 64
    val bands = 16
    val rows = nHashes / bands
    val jrows = (0 until nHashes)
      .map(j => s"($j, CAST('${uc(j * 0x9e3779b97f4a7c15L)}' AS HUGEINT))")
      .mkString(",")
    // token-less documents: the engine's signature stays all-Long.MaxValue,
    // so their band keys are CONSTANTS — computed here by the engine's own
    // bandKeys, so the two sides cannot drift
    val emptyBandRows = graft.dedup.Dedup
      .bandKeys(Array.fill(nHashes)(Long.MaxValue), bands)
      .zipWithIndex
      .map { case (key, b) => s"($b, CAST('${uc(key)}' AS HUGEINT))" }
      .mkString(",")
    s"""WITH docs AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS toks
       |  FROM documents),
       |doc_shingle AS (
       |  SELECT DISTINCT doc_id, sh FROM (
       |    SELECT doc_id, UNNEST(CASE
       |      WHEN len(toks) = 0 THEN []
       |      WHEN len(toks) < $k THEN [array_to_string(toks, ' ')]
       |      ELSE list_transform(range(1, len(toks) - $k + 2),
       |                          i -> array_to_string(list_slice(toks, i, i + ${k - 1}), ' '))
       |    END) AS sh FROM docs)),
       |dsh AS (SELECT DISTINCT sh FROM doc_shingle),
       |base AS (SELECT sh, ${hashShingleSql("sh", 0x5eed5eedL)} AS b FROM dsh),
       |jtab (j, cj) AS (VALUES $jrows),
       |h0 AS (SELECT sh, j, ((b + cj) % $Two64 + $Gold) % $Two64 AS z FROM base CROSS JOIN jtab),
       |h2 AS (SELECT sh, j, ${mulmod(xor64("z", shr("z", 30)), M1)} AS z FROM h0),
       |h3 AS (SELECT sh, j, ${mulmod(xor64("z", shr("z", 27)), M2)} AS z FROM h2),
       |h4 AS (SELECT sh, j, ${xor64("z", shr("z", 31))} AS u FROM h3),
       |hs AS (SELECT sh, j, CASE WHEN u >= $Two63 THEN u - $Two64 ELSE u END AS sval FROM h4),
       |sig AS (
       |  SELECT ds.doc_id, h.j, min(h.sval) AS sval
       |  FROM doc_shingle ds JOIN hs h ON h.sh = ds.sh
       |  GROUP BY 1, 2),
       |sigu AS (SELECT doc_id, j, CASE WHEN sval < 0 THEN sval + $Two64 ELSE sval END AS u FROM sig),
       |bandrows AS (
       |  SELECT doc_id, j // $rows AS band,
       |    max(CASE WHEN j % $rows = 0 THEN u END) AS s0,
       |    max(CASE WHEN j % $rows = 1 THEN u END) AS s1,
       |    max(CASE WHEN j % $rows = 2 THEN u END) AS s2,
       |    max(CASE WHEN j % $rows = 3 THEN u END) AS s3
       |  FROM sigu GROUP BY 1, 2),
       |f1 AS (SELECT doc_id, band, ${mix64(xor64(s"CAST(band AS HUGEINT) * ${0x100000001b3L}", "s0"))} AS h, s1, s2, s3 FROM bandrows),
       |f2 AS (SELECT doc_id, band, ${mix64(xor64("h", "s1"))} AS h, s2, s3 FROM f1),
       |f3 AS (SELECT doc_id, band, ${mix64(xor64("h", "s2"))} AS h, s3 FROM f2),
       |f4 AS (SELECT doc_id, band, ${mix64(xor64("h", "s3"))} AS bkey FROM f3),
       |ebk (band, bkey) AS (VALUES $emptyBandRows),
       |f4all AS (
       |  SELECT * FROM f4
       |  UNION ALL
       |  SELECT d.doc_id, e.band, e.bkey
       |  FROM (SELECT doc_id FROM docs WHERE len(toks) = 0) d CROSS JOIN ebk e),
       |kept AS (
       |  SELECT doc_id, band, bkey FROM (
       |    SELECT doc_id, band, bkey, count(*) OVER (PARTITION BY band, bkey) AS n FROM f4all)
       |  WHERE n <= $maxBucket),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM kept a JOIN kept b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |sz AS (SELECT doc_id, count(*) AS sz FROM doc_shingle GROUP BY 1),
       |inter AS (
       |  SELECT c.id_a, c.id_b, count(*) AS n
       |  FROM cand c
       |  JOIN doc_shingle a ON a.doc_id = c.id_a
       |  JOIN doc_shingle b ON b.doc_id = c.id_b AND b.sh = a.sh
       |  GROUP BY 1, 2),
       |-- LEFT JOINs keep candidate pairs with empty shingle sets:
       |-- jaccard(empty, empty) = 1.0, matching the engine
       |scored AS (
       |  SELECT c.id_a, c.id_b,
       |    COALESCE(i.n, 0) AS n,
       |    COALESCE(sa.sz, 0) AS sza, COALESCE(sb.sz, 0) AS szb
       |  FROM cand c
       |  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
       |  LEFT JOIN sz sa ON sa.doc_id = c.id_a
       |  LEFT JOIN sz sb ON sb.doc_id = c.id_b)
       |SELECT id_a, id_b,
       |  round(CASE WHEN sza + szb = 0 THEN 1.0 ELSE n * 1.0 / (sza + szb - n) END, 6) AS jaccard
       |FROM scored
       |WHERE (CASE WHEN sza + szb = 0 THEN 1.0 ELSE n * 1.0 / (sza + szb - n) END) >= $threshold""".stripMargin
  }

  /** Oracle for Similarity.lshNeighbors over `embeddings`: the SRP hyperplane
    * components are emitted as double literals straight from
    * Similarity.planeComponent (shortest round-trip formatting — DuckDB parses
    * back the identical double), dots fold sequentially like the engine loop,
    * buckets cap-mirrored, cosine verified on candidates. Engine filters on
    * the ROUNDED sim, so the oracle does too.
    */
  def srpLshSql(dim: Int, nPlanes: Int, nTables: Int, minSim: Double, maxBucket: Int): String = {
    val planeRows = (for {
      t <- 0 until nTables
      p <- 0 until nPlanes
    } yield {
      val comps = (0 until dim)
        .map(d => Similarity.planeComponent(t * nPlanes + p, d).toString)
        .mkString("[", ",", "]")
      s"($t, $p, $comps)"
    }).mkString(",\n")
    s"""WITH planes (t, p, comps) AS (VALUES $planeRows),
       |e AS (SELECT vec_id, embedding FROM embeddings),
       |dots AS (
       |  SELECT e.vec_id, pl.t, pl.p,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, $dim+1), i -> CAST(e.embedding[i] AS DOUBLE) * pl.comps[i])),
       |      (a, x) -> a + x) AS dot
       |  FROM e CROSS JOIN planes pl),
       |bk AS (
       |  SELECT vec_id, CAST(t AS BIGINT) * 72057594037927936 +
       |         CAST(sum(CASE WHEN dot > 0 THEN CAST(round(2 ** p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM dots GROUP BY vec_id, t),
       |kept AS (
       |  SELECT vec_id, bucket FROM (
       |    SELECT vec_id, bucket, count(*) OVER (PARTITION BY bucket) AS n FROM bk)
       |  WHERE n <= $maxBucket),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM kept a JOIN kept b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |sims AS (
       |  SELECT id_a, id_b, round(${cosineSql("ea.embedding", "eb.embedding", dim)}, 6) AS sim
       |  FROM cand JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b)
       |SELECT id_a, id_b, sim FROM sims WHERE sim >= $minSim""".stripMargin
  }

  /** cosine(a, b) over two float-list columns in double arithmetic (same
    * formula the other embedding oracles use).
    */
  def cosineSql(a: String, b: String, dim: Int): String =
    s"""list_aggregate(list_transform(range(1, $dim+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), 'sum')
       |    / (sqrt(list_aggregate(list_transform(range(1, $dim+1), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)), 'sum'))
       |     * sqrt(list_aggregate(list_transform(range(1, $dim+1), i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), 'sum')))""".stripMargin

  /** Oracle for Similarity.ivfTopKFixed over `embeddings` with centroids
    * pinned to the first `nCells` corpus vectors: squared-L2 assignment
    * (strict-less argmin -> ties to the lower cell), nProbe nearest cells per
    * query, rounded-cosine top-k within probed cells.
    */
  /** Oracle for Similarity.semanticDedup over `embeddings` with centroids
    * pinned to the first `nCells` corpus vectors: same squared-L2 assignment
    * contract as [[ivfFixedSql]]; within-cell pairs above `tau` (rounded
    * cosine) mark the HIGHER id as a duplicate; over-cap cells contribute no
    * pairs (their members are all kept).
    */
  def semanticDedupSql(dim: Int, nCells: Int, tau: Double, maxCell: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |cents AS (SELECT vec_id AS cell, embedding AS cv FROM e WHERE vec_id < $nCells),
       |dists AS (
       |  SELECT e.vec_id, c.cell,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, $dim+1),
       |        i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)))),
       |      (a, x) -> a + x) AS d
       |  FROM e CROSS JOIN cents c),
       |assign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn FROM dists)
       |  WHERE rn = 1),
       |sz AS (SELECT cell, count(*) AS c FROM assign GROUP BY cell),
       |ok AS (SELECT a.vec_id, a.cell FROM assign a JOIN sz ON sz.cell = a.cell
       |       WHERE sz.c <= $maxCell),
       |dups AS (SELECT DISTINCT r.vec_id AS dup_id
       |  FROM ok l JOIN ok r ON l.cell = r.cell AND l.vec_id < r.vec_id
       |  JOIN e el ON el.vec_id = l.vec_id
       |  JOIN e er ON er.vec_id = r.vec_id
       |  WHERE round(${cosineSql("el.embedding", "er.embedding", dim)}, 6) >= $tau)
       |SELECT a.vec_id, CAST(a.cell AS INT) AS cell
       |FROM assign a LEFT JOIN dups d ON d.dup_id = a.vec_id
       |WHERE d.dup_id IS NULL""".stripMargin

  def ivfFixedSql(dim: Int, nCells: Int, nProbe: Int, k: Int, nQueries: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |cents AS (SELECT vec_id AS cell, embedding AS cv FROM e WHERE vec_id < $nCells),
       |dists AS (
       |  SELECT e.vec_id, c.cell,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, $dim+1),
       |        i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)))),
       |      (a, x) -> a + x) AS d
       |  FROM e CROSS JOIN cents c),
       |assign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn FROM dists)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, cell FROM (
       |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn FROM dists
       |    WHERE vec_id < $nQueries)
       |  WHERE rn <= $nProbe),
       |scored AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    round(${cosineSql("eq.embedding", "ec.embedding", dim)}, 6) AS sim
       |  FROM probes p
       |  JOIN assign a ON a.cell = p.cell
       |  JOIN e eq ON eq.vec_id = p.query_id
       |  JOIN e ec ON ec.vec_id = a.vec_id
       |  WHERE a.vec_id <> p.query_id)
       |SELECT query_id, rank, neighbor_id, sim FROM (
       |  SELECT query_id, neighbor_id, sim,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
       |  FROM scored)
       |WHERE rank <= $k""".stripMargin
}
