package graft.queries

/** DuckDB oracles for the SQL-expressible [[Analytics]] queries.
  *
  * q23/q25/q39 run their operators in portable-hash mode (bits/planes/seeds
  * derived from md5 — [[graft.plans.PortableHashKernel]]), so their oracles
  * regenerate the same hashes with `('0x' || substr(md5(x), 1, 15))::BIGINT`
  * and replay the whole pipeline in SQL. Dot products go through DuckDB's
  * `list_dot_product`, whose sequential accumulation matches the codegen
  * [[graft.plans.DotProduct]] loop element for element, so even the SIGN of
  * a hyperplane projection is bit-identical.
  */
object AnalyticsOracles {

  /** DuckDB twin of PortableHashKernel.md5Head60 over a SQL expression. */
  private def md5Head60(expr: String): String = OracleUtil.md5Head60(expr)

  /** Shared CTEs: embeddings as double lists + sequential-order norms
    * (matches VectorFunctions.toDouble + l2Norm exactly).
    * `private[queries]`: q138's hybrid fusion re-reads the dense pipeline
    * from CurationOracles — one text, no drift. */
  private[queries] val vecCtes: String =
    """v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
      |  FROM embeddings),
      |n AS (SELECT vec_id, sqrt(list_dot_product(vv, vv)) AS nrm FROM v)""".stripMargin

  /** Exact rerank of a `cand(qid, nid)` CTE as a `ranked` CTE — same
    * rounding and tie-break as Similarity.rankTopK. Split from the final
    * SELECT so q138 can keep ranking as a CTE. */
  private[queries] val rerankCtes: String =
    """sims AS (
      |  SELECT qid, nid,
      |    round(list_dot_product(qv.vv, nv.vv) / (qn.nrm * nn.nrm), 6) AS sim
      |  FROM cand
      |  JOIN v qv ON qv.vec_id = qid
      |  JOIN v nv ON nv.vec_id = nid
      |  JOIN n qn ON qn.vec_id = qid
      |  JOIN n nn ON nn.vec_id = nid),
      |ranked AS (
      |  SELECT qid, nid, sim,
      |    CAST(row_number() OVER (PARTITION BY qid
      |                            ORDER BY sim DESC, nid) AS INTEGER) AS rank
      |  FROM sims)""".stripMargin

  /** Shared tail: [[rerankCtes]] plus the top-5 readout. */
  private val rerankTail: String =
    s"""$rerankCtes
      |SELECT qid, rank, nid, sim FROM ranked
      |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** The q103/q140 link-graph synthesis + out-degrees (Analytics.
    * linkEdges' twin — 3 modular out-links per doc). */
  private[queries] val linkGraphCtes: String =
    """nodes AS (SELECT doc_id AS id FROM documents),
      |mm AS (SELECT max(id) + 1 AS m FROM nodes),
      |edges AS (
      |  SELECT id AS src, unnest([
      |    (id * 7 + 3) % mm.m, (id * 13 + 5) % mm.m, (id + 1) % mm.m])
      |    AS dst
      |  FROM nodes, mm),
      |outd AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)""".stripMargin

  /** One fixed-point PageRank round (damping 85, the catalog's): contrib
    * sum into c<idx>, then r<idx> with the restart term `baseExpr` (a
    * constant for q103's uniform teleport, a seed-conditional CASE for
    * q140's personalized restart over `nodesRel`). Generated so the six
    * rounds across the two queries cannot drift. */
  private[queries] def prRound(prev: String, idx: Int, nodesRel: String,
                               baseExpr: String): String =
    s"""c$idx AS (
       |  SELECT dst, CAST(sum(r // outdeg) AS BIGINT) AS s
       |  FROM edges JOIN $prev ON $prev.id = edges.src
       |  JOIN outd ON outd.src = edges.src GROUP BY dst),
       |r$idx AS (
       |  SELECT n.id,
       |    CAST($baseExpr + (85 * coalesce(s, 0)) // 100 AS BIGINT) AS r
       |  FROM $nodesRel n LEFT JOIN c$idx ON c$idx.dst = n.id)""".stripMargin

  /** The portable-IVF index build (md5-picked seed cells, nearest-cell
    * assignment with smallest-cid ties) ending in `asg(vec_id, cid)` —
    * the twin of Similarity.ivfIndex, shared by q39/q138 (via
    * [[ivfCandCtes]]) and q139's cell-confined negative mining. */
  private[queries] val ivfAsgCtes: String =
    s"""seeds AS (
       |  SELECT v.vec_id AS cid, vv AS cv, nrm AS cn
       |  FROM v JOIN n ON n.vec_id = v.vec_id
       |  ORDER BY ${OracleUtil.md5Head60("CAST(v.vec_id AS VARCHAR)")}, v.vec_id
       |  LIMIT 16),
       |asg AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT v.vec_id, s.cid,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY list_dot_product(vv, cv) / (nrm * cn) DESC, s.cid)
       |        AS rn
       |    FROM v JOIN n ON n.vec_id = v.vec_id CROSS JOIN seeds s)
       |  WHERE rn = 1)""".stripMargin

  /** The portable-IVF candidate pipeline ([[ivfAsgCtes]] + nProbe probed
    * cells for queries matching `pred`) ending in `cand(qid, nid)` —
    * parameterized so the stored-index search (q144) replays the same
    * recipe at its own pred/nProbe without duplicating the text. */
  private[queries] def ivfCandCtesFor(pred: String, nProbe: Int): String =
    s"""$ivfAsgCtes,
       |probes AS (
       |  SELECT qid, cid FROM (
       |    SELECT v.vec_id AS qid, s.cid,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY list_dot_product(vv, cv) / (nrm * cn) DESC, s.cid)
       |        AS rn
       |    FROM v JOIN n ON n.vec_id = v.vec_id CROSS JOIN seeds s
       |    WHERE $pred)
       |  WHERE rn <= $nProbe),
       |cand AS (
       |  SELECT DISTINCT p.qid, a.vec_id AS nid
       |  FROM probes p JOIN asg a ON a.cid = p.cid
       |  WHERE a.vec_id <> p.qid)""".stripMargin

  /** The q39 instantiation (queries vec_id < 8, 14-of-16 probed cells) —
    * shared verbatim with q138. */
  private[queries] val ivfCandCtes: String =
    ivfCandCtesFor("v.vec_id < 8", 14)

  /** The assign-to-stored-grid INGEST census, parameterized on the
    * batch modulus — ONE text behind the keyed-upsert (q145), append
    * (q161), and compaction (q164) twins. */
  private def ivfIngestSql(mod: Int): String =
    s"""WITH $vecCtes,
         |$ivfAsgCtes,
         |off AS (SELECT max(vec_id) + 1 AS o FROM embeddings),
         |newv AS (
         |  SELECT vec_id + o AS vec_id,
         |    list_transform(embedding, x -> -CAST(x AS DOUBLE)) AS vv
         |  FROM embeddings, off WHERE vec_id % $mod = 0),
         |newn AS (
         |  SELECT vec_id, sqrt(list_dot_product(vv, vv)) AS nrm FROM newv),
         |nasg AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT nv.vec_id, s.cid,
         |      row_number() OVER (PARTITION BY nv.vec_id
         |        ORDER BY list_dot_product(nv.vv, cv) / (nn.nrm * cn) DESC,
         |                 s.cid) AS rn
         |    FROM newv nv JOIN newn nn ON nn.vec_id = nv.vec_id
         |    CROSS JOIN seeds s)
         |  WHERE rn = 1),
         |allasg AS (
         |  SELECT vec_id, cid FROM asg
         |  UNION ALL SELECT vec_id, cid FROM nasg)
         |SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(sum(vec_id) AS BIGINT) AS sum_ids
         |FROM allasg GROUP BY cid ORDER BY cid""".stripMargin

  /** The REBUILD-WITH-CARRYOVER census (q167): unlike [[ivfIngestSql]]
    * (batch assigned to the BASE grid), seeds are RE-PICKED over the
    * merged corpus and every vector re-assigned — the from-scratch build
    * the engine's ivfRebuildStored must converge to. */
  private def ivfRebuildSql(mod: Int): String =
    s"""WITH v0 AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
       |  FROM embeddings),
       |off AS (SELECT max(vec_id) + 1 AS o FROM embeddings),
       |newv AS (
       |  SELECT vec_id + o AS vec_id,
       |    list_transform(embedding, x -> -CAST(x AS DOUBLE)) AS vv
       |  FROM embeddings, off WHERE vec_id % $mod = 0),
       |v AS (SELECT * FROM v0 UNION ALL SELECT * FROM newv),
       |n AS (SELECT vec_id, sqrt(list_dot_product(vv, vv)) AS nrm FROM v),
       |$ivfAsgCtes
       |SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(sum(vec_id) AS BIGINT) AS sum_ids
       |FROM asg GROUP BY cid ORDER BY cid""".stripMargin

  /** One MMR greedy round: `selPrev` (qid, nid, rank, score) → pick the
    * argmax of 70·rel − 30·max-sim-to-selected among unselected shortlist
    * members, union into `selCur`. Generated so the five q153 rounds
    * cannot drift from each other. Every round CTE is MATERIALIZED: each
    * references its predecessor three times (anti-join, penalty join,
    * union), so inlined CTEs re-expand the whole upstream candidate
    * chain ~3^5 times across five rounds — the q153/q160 oracles burned
    * ~30 min of DuckDB CPU EACH at the 10× decade on exactly that
    * (results are identical either way; this is purely the oracle's
    * evaluation strategy). */
  private def mmrRound(selPrev: String, selCur: String, r: Int): String =
    s"""pick$r AS MATERIALIZED (
       |  SELECT qid, nid, $r AS rank, score FROM (
       |    SELECT rl.qid, rl.nid,
       |      70 * rl.rel - 30 * coalesce(mx.pen, 0) AS score,
       |      row_number() OVER (PARTITION BY rl.qid
       |        ORDER BY 70 * rl.rel - 30 * coalesce(mx.pen, 0) DESC,
       |                 rl.nid) AS rn
       |    FROM relp rl
       |    LEFT JOIN $selPrev s ON s.qid = rl.qid AND s.nid = rl.nid
       |    LEFT JOIN (
       |      SELECT p.qid, p.nid, max(p.psim) AS pen
       |      FROM ps p JOIN $selPrev t ON t.qid = p.qid AND t.nid = p.other
       |      GROUP BY p.qid, p.nid) mx
       |      ON mx.qid = rl.qid AND mx.nid = rl.nid
       |    WHERE s.nid IS NULL) x
       |  WHERE rn = 1),
       |$selCur AS MATERIALIZED (
       |  SELECT qid, nid, rank, score FROM $selPrev
       |  UNION ALL SELECT qid, nid, rank, score FROM pick$r)""".stripMargin

  /** Shared CTE list: exact all-pairs n-gram jaccard over a doc universe.
    * Tokens are exploded with positions (zip-unnest), trigrams built by
    * positional self-join, then an inverted-index join counts intersections.
    * Exposed as a CTE-list + final-select pair so q46 can embed it inside a
    * WITH RECURSIVE. */
  private def jaccardCtes(pred: String): String =
    s"""tok AS (
       |  SELECT doc_id,
       |    CAST(unnest(range(len(string_split(text,' ')))) AS INTEGER) AS pos,
       |    unnest(string_split(text,' ')) AS w
       |  FROM documents WHERE $pred),
       |tri AS (
       |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS sh
       |  FROM tok a
       |  JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |  JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM tri GROUP BY doc_id),
       |inter AS (
       |  SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS i
       |  FROM tri x JOIN tri y ON x.sh = y.sh AND x.doc_id < y.doc_id
       |  GROUP BY x.doc_id, y.doc_id)""".stripMargin

  private def jaccardSelect(threshold: String): String =
    s"""SELECT id1, id2,
       |  CAST(trunc((i * 1.0 / (sx.sz + sy.sz - i)) * 1000000.0) AS INTEGER) AS jaccard_ppm
       |FROM inter
       |JOIN sizes sx ON sx.doc_id = id1
       |JOIN sizes sy ON sy.doc_id = id2
       |WHERE (i * 1.0 / (sx.sz + sy.sz - i)) >= $threshold""".stripMargin

  private def jaccardSql(pred: String, threshold: String): String =
    s"WITH ${jaccardCtes(pred)}\n${jaccardSelect(threshold)}\nORDER BY id1, id2"

  val sql: Map[String, String] = Map(
    "q20_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS copies
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,

    // vocabulary growth replayed: per-BIGRAM first-seen doc + occurrence
    // count (positional self-join builds the bigram), decile rollup,
    // 10-row running total
    "q154_vocab_growth" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(unnest(range(len(string_split(text,' ')))) AS INTEGER)
        |      AS pos,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tok AS (
        |  SELECT a.doc_id, a.w || ' ' || b.w AS term
        |  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
        |mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
        |fs AS (
        |  SELECT term, min(doc_id) AS first_doc,
        |    CAST(count(*) AS BIGINT) AS occurrences
        |  FROM tok GROUP BY term),
        |pd AS (
        |  SELECT CAST(first_doc * 10 // mx.m AS BIGINT) AS decile,
        |    CAST(count(*) AS BIGINT) AS n_new_terms,
        |    CAST(sum(occurrences) AS BIGINT) AS occ_of_new
        |  FROM fs, mx GROUP BY 1)
        |SELECT decile, n_new_terms, occ_of_new,
        |  CAST(sum(n_new_terms) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_vocab
        |FROM pd ORDER BY decile""".stripMargin,

    // q154's hashed-key twin: identical decile rollup with the bigram
    // replaced by its 60-bit portable hash BEFORE the group-by — the
    // oracle replays the same hash, so a vocabulary collision would be
    // gated, not hidden
    "q159_vocab_growth_hashed" ->
      s"""WITH tk AS (
        |  SELECT doc_id,
        |    CAST(unnest(range(len(string_split(text,' ')))) AS INTEGER)
        |      AS pos,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tok AS (
        |  SELECT a.doc_id, ${md5Head60("a.w || ' ' || b.w")} AS term
        |  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
        |mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
        |fs AS (
        |  SELECT term, min(doc_id) AS first_doc,
        |    CAST(count(*) AS BIGINT) AS occurrences
        |  FROM tok GROUP BY term),
        |pd AS (
        |  SELECT CAST(first_doc * 10 // mx.m AS BIGINT) AS decile,
        |    CAST(count(*) AS BIGINT) AS n_new_terms,
        |    CAST(sum(occurrences) AS BIGINT) AS occ_of_new
        |  FROM fs, mx GROUP BY 1)
        |SELECT decile, n_new_terms, occ_of_new,
        |  CAST(sum(n_new_terms) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_vocab
        |FROM pd ORDER BY decile""".stripMargin,

    // MMR greedy selection replayed: the q24 sims recipe shortlisted to
    // 12, ppm-integer relevance and pair penalties, five generated
    // argmax rounds (tie: smaller nid) — the full trajectory must match
    "q153_mmr_diverse" ->
      s"""WITH el AS MATERIALIZED (
         |  SELECT vec_id,
         |    CAST(unnest(range(len(embedding))) AS INTEGER) AS pos,
         |    CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings),
         |nrm AS MATERIALIZED (
         |  SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM el GROUP BY vec_id),
         |dots AS (
         |  SELECT q.vec_id AS qid, d.vec_id AS nid, sum(q.v * d.v) AS dt
         |  FROM el q JOIN el d ON q.pos = d.pos AND d.vec_id <> q.vec_id
         |  WHERE q.vec_id < 8
         |  GROUP BY q.vec_id, d.vec_id),
         |relp AS MATERIALIZED (
         |  SELECT qid, nid,
         |    CAST(round(sim * 1000000) AS BIGINT) AS rel
         |  FROM (
         |    SELECT qid, nid, round(dt / (nq.nrm * nd.nrm), 6) AS sim,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY round(dt / (nq.nrm * nd.nrm), 6) DESC, nid)
         |        AS rank
         |    FROM dots
         |    JOIN nrm nq ON nq.vec_id = qid
         |    JOIN nrm nd ON nd.vec_id = nid) x
         |  WHERE rank <= 12),
         |ps AS MATERIALIZED (
         |  SELECT a.qid, a.nid, b.nid AS other,
         |    CAST(round(round(pd.dt / (na.nrm * nb.nrm), 6) * 1000000)
         |         AS BIGINT) AS psim
         |  FROM relp a
         |  JOIN relp b ON b.qid = a.qid AND b.nid <> a.nid
         |  JOIN (
         |    SELECT x.vec_id AS i, y.vec_id AS j, sum(x.v * y.v) AS dt
         |    FROM el x JOIN el y ON x.pos = y.pos AND y.vec_id <> x.vec_id
         |    WHERE x.vec_id IN (SELECT nid FROM relp)
         |      AND y.vec_id IN (SELECT nid FROM relp)
         |    GROUP BY x.vec_id, y.vec_id) pd
         |    ON pd.i = a.nid AND pd.j = b.nid
         |  JOIN nrm na ON na.vec_id = a.nid
         |  JOIN nrm nb ON nb.vec_id = b.nid),
         |sel0 AS (
         |  SELECT CAST(NULL AS BIGINT) AS qid, CAST(NULL AS BIGINT) AS nid,
         |    0 AS rank, CAST(0 AS BIGINT) AS score
         |  WHERE false),
         |${(1 to 5).map(r => mmrRound(s"sel${r - 1}", s"sel$r", r))
            .mkString(",\n")}
         |SELECT qid, CAST(rank AS INTEGER) AS rank, nid, score
         |FROM sel5 ORDER BY qid, rank""".stripMargin,

    // stored-index MMR replayed: the shortlist is the shared IVF
    // candidate + rerank chain at q160's own query window and probe
    // width (the q144 recipe), pair sims over the full vectors, then
    // the SAME five generated greedy rounds as q153
    "q160_mmr_stored" ->
      s"""WITH $vecCtes,
         |${ivfCandCtesFor("v.vec_id >= 24 AND v.vec_id < 32", 12)},
         |$rerankCtes,
         |relp AS MATERIALIZED (
         |  SELECT qid, nid, CAST(round(sim * 1000000) AS BIGINT) AS rel
         |  FROM ranked WHERE rank <= 12),
         |ps AS MATERIALIZED (
         |  SELECT a.qid, a.nid, b.nid AS other,
         |    CAST(round(round(list_dot_product(va.vv, vb.vv)
         |           / (na.nrm * nb.nrm), 6) * 1000000) AS BIGINT) AS psim
         |  FROM relp a
         |  JOIN relp b ON b.qid = a.qid AND b.nid <> a.nid
         |  JOIN v va ON va.vec_id = a.nid
         |  JOIN v vb ON vb.vec_id = b.nid
         |  JOIN n na ON na.vec_id = a.nid
         |  JOIN n nb ON nb.vec_id = b.nid),
         |sel0 AS (
         |  SELECT CAST(NULL AS BIGINT) AS qid, CAST(NULL AS BIGINT) AS nid,
         |    0 AS rank, CAST(0 AS BIGINT) AS score
         |  WHERE false),
         |${(1 to 5).map(r => mmrRound(s"sel${r - 1}", s"sel$r", r))
            .mkString(",\n")}
         |SELECT qid, CAST(rank AS INTEGER) AS rank, nid, score
         |FROM sel5 ORDER BY qid, rank""".stripMargin,

    // exact-substring span coverage replayed: positional 5-way self-join
    // builds the sliding 5-gram, the SAME md5 key, cross-doc = min≠max
    // doc per key, interval-union coverage via the lag sweep
    "q148_span_coverage" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |    CAST(unnest(range(len(string_split(text,' ')))) AS INTEGER)
         |      AS pos,
         |    unnest(string_split(text,' ')) AS w
         |  FROM documents),
         |tl AS (
         |  SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT)
         |    AS n_tokens
         |  FROM documents),
         |gram AS (
         |  SELECT a.doc_id, a.pos,
         |    ${OracleUtil.md5Head60(
              "a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w || ' ' || e.w")}
         |      AS gk
         |  FROM tok a
         |  JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
         |  JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
         |  JOIN tok d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
         |  JOIN tok e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4),
         |xd AS (
         |  SELECT gk FROM gram GROUP BY gk
         |  HAVING min(doc_id) <> max(doc_id)),
         |sh AS (SELECT g.doc_id, g.pos FROM gram g JOIN xd USING (gk)),
         |cov AS (
         |  SELECT doc_id,
         |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
         |              IS NULL THEN 5
         |         ELSE least(5,
         |           pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos))
         |    END AS cv
         |  FROM sh),
         |pd AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_starts,
         |    CAST(sum(cv) AS BIGINT) AS covered_tokens
         |  FROM cov GROUP BY doc_id)
         |SELECT t.doc_id AS id, t.n_tokens,
         |  coalesce(n_shared_starts, 0) AS n_shared_starts,
         |  coalesce(covered_tokens, 0) AS covered_tokens,
         |  CAST(coalesce(covered_tokens, 0) * 1000000 // t.n_tokens
         |       AS BIGINT) AS coverage_ppm
         |FROM tl t LEFT JOIN pd USING (doc_id)
         |ORDER BY id""".stripMargin,

    "q21_ngram_jaccard" -> jaccardSql("doc_id < 200", "0.2"),

    "q22_minhash_lsh" -> jaccardSql("true", "0.8"),

    // portable simhash (md5-derived 60-bit token hash, +1/-1 bit votes,
    // strictly-positive rule) recomputed per doc, then ALL-pairs Hamming —
    // which equals the engine's banded join exactly: pigeonhole banding has
    // recall 1 at hamming <= maxHamming, and the verify step drops the rest
    "q23_simhash_neardup" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |h AS (SELECT doc_id, ${md5Head60("w")} AS h FROM tok),
         |bits AS (SELECT CAST(unnest(range(60)) AS INTEGER) AS bit),
         |votes AS (
         |  SELECT doc_id, bit,
         |    sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM h CROSS JOIN bits GROUP BY doc_id, bit),
         |sh AS (
         |  SELECT doc_id,
         |    CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)
         |         AS BIGINT) AS s
         |  FROM votes GROUP BY doc_id)
         |SELECT x.doc_id AS id1, y.doc_id AS id2,
         |  CAST(bit_count(xor(x.s, y.s)) AS INTEGER) AS hamming
         |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.s, y.s)) <= 3
         |ORDER BY id1, id2""".stripMargin,

    // portable hyperplane LSH replayed end to end: the SAME md5-seeded
    // plane grid -> signatures -> 21x3-bit buckets -> candidate set ->
    // exact rerank. list() over an ORDER BY d grid keeps the dot-product
    // accumulation order identical to the codegen loop, so projection
    // signs (the signature bits) cannot diverge at the last ulp.
    "q25_knn_lsh" ->
      s"""WITH $vecCtes,
         |grid AS (
         |  SELECT p.p, d.d,
         |    ((${md5Head60("'hp:' || CAST(p.p AS VARCHAR) || ':' || CAST(d.d AS VARCHAR)")}
         |      % 2000005) - 1000002) / 1000003.0 AS w
         |  FROM (SELECT CAST(unnest(range(63)) AS INTEGER) AS p) p
         |  CROSS JOIN (SELECT CAST(unnest(range(64)) AS INTEGER) AS d) d),
         |planes AS (SELECT p, list(w ORDER BY d) AS wv FROM grid GROUP BY p),
         |sig AS (
         |  SELECT vec_id,
         |    CAST(sum(CASE WHEN list_dot_product(vv, wv) > 0
         |             THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS sig
         |  FROM v CROSS JOIN planes GROUP BY vec_id),
         |buckets AS (
         |  SELECT vec_id, t.tbl, (sig >> (3 * t.tbl)) & 7 AS bucket
         |  FROM sig
         |  CROSS JOIN (SELECT CAST(unnest(range(21)) AS INTEGER) AS tbl) t),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
         |  FROM buckets q
         |  JOIN buckets c ON q.tbl = c.tbl AND q.bucket = c.bucket
         |  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
         |$rerankTail""".stripMargin,

    // portable IVF replayed end to end: md5-picked seed cells, nearest-cell
    // assignment (tie: smallest cid), 14-of-16 probed cells per query,
    // exact rerank within probed cells only
    "q39_knn_ivf" ->
      s"""WITH $vecCtes,
         |$ivfCandCtes,
         |$rerankTail""".stripMargin,

    // stored-index build census: the engine persists the IVF structures
    // and reads its per-cell census BACK from disk; the twin replays the
    // same seed + assignment recipe from the raw corpus — equality proves
    // the stored posting lists hold exactly the assignment
    "q143_ivf_build_stored" ->
      s"""WITH $vecCtes,
         |$ivfAsgCtes
         |SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(sum(vec_id) AS BIGINT) AS sum_ids
         |FROM asg GROUP BY cid ORDER BY cid""".stripMargin,

    // deletion census: the base assignment minus the deleted ids — the
    // engine physically removed them from the stored posting lists
    "q149_ivf_delete_stored" ->
      s"""WITH $vecCtes,
         |$ivfAsgCtes
         |SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(sum(vec_id) AS BIGINT) AS sum_ids
         |FROM asg WHERE vec_id % 11 <> 0
         |GROUP BY cid ORDER BY cid""".stripMargin,

    // stored-index search: same candidate recipe as q39 at q144's own
    // query set (ids 8..15) and probe width (12-of-16) — the engine reads
    // the PREBUILT structures, the twin recomputes them, equal output
    // proves the offline/online split loses nothing
    "q144_ivf_search_stored" ->
      s"""WITH $vecCtes,
         |${ivfCandCtesFor("v.vec_id >= 8 AND v.vec_id < 16", 12)},
         |$rerankTail""".stripMargin,

    // O(batch) append: same census semantics as the extend twin at the
    // %23 batch recipe — the file-level append and the keyed upsert
    // must be indistinguishable on disk for genuinely-new ids
    "q161_ivf_append_stored" ->
      ivfIngestSql(23),

    // compaction census: the fold back into the clustered layout must
    // preserve every appended row — same oracle as the append it follows
    "q164_ivf_compact_stored" -> ivfIngestSql(23),

    // rebuild-with-carryover census: extend against the frozen grid,
    // then rebuild from the index's own posting lists — must equal a
    // from-scratch build (re-picked seeds) on the merged corpus
    "q167_ivf_rebuild_stored" -> ivfRebuildSql(17),

    // token-gated stored search: identical candidate recipe at q169's
    // own query window — the engine's O(1)-token path must lose nothing
    // vs the recomputed pipeline
    "q169_ivf_token_search" ->
      s"""WITH $vecCtes,
         |${ivfCandCtesFor("v.vec_id >= 32 AND v.vec_id < 40", 12)},
         |$rerankTail""".stripMargin,

    // incremental extend: the ingest batch (every 13th vector, elements
    // negated, ids offset by max+1) is assigned to the SAME seed grid —
    // no re-seed — and unioned into the census
    "q145_ivf_extend_stored" ->
      ivfIngestSql(13),

    "q24_knn_brute" ->
      """WITH el AS (
        |  SELECT vec_id,
        |    CAST(unnest(range(len(embedding))) AS INTEGER) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM el GROUP BY vec_id),
        |dots AS (
        |  SELECT q.vec_id AS qid, d.vec_id AS nid, sum(q.v * d.v) AS dt
        |  FROM el q JOIN el d ON q.pos = d.pos AND d.vec_id <> q.vec_id
        |  WHERE q.vec_id < 8
        |  GROUP BY q.vec_id, d.vec_id),
        |sims AS (
        |  SELECT qid, nid, round(dt / (nq.nrm * nd.nrm), 6) AS sim
        |  FROM dots
        |  JOIN nrm nq ON nq.vec_id = qid
        |  JOIN nrm nd ON nd.vec_id = nid),
        |ranked AS (
        |  SELECT qid, nid, sim,
        |    CAST(row_number() OVER (PARTITION BY qid
        |                            ORDER BY sim DESC, nid) AS INTEGER) AS rank
        |  FROM sims)
        |SELECT qid, rank, nid, sim FROM ranked
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q26_lang_id" ->
      """SELECT doc_id,
        |  CASE
        |    WHEN en = 0 AND es = 0 AND de = 0 THEN 'und'
        |    WHEN en >= es AND en >= de THEN 'en'
        |    WHEN es >= de THEN 'es'
        |    ELSE 'de' END AS lang_pred
        |FROM (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text,' '), x -> x = 'the'))
        |      + len(list_filter(string_split(text,' '), x -> x = 'a')) AS en,
        |    len(list_filter(string_split(text,' '), x -> x = 'data'))
        |      + len(list_filter(string_split(text,' '), x -> x = 'table')) AS es,
        |    len(list_filter(string_split(text,' '), x -> x = 'group'))
        |      + len(list_filter(string_split(text,' '), x -> x = 'fast')) AS de
        |  FROM documents) s
        |ORDER BY doc_id""".stripMargin,

    "q27_text_quality" ->
      """WITH s AS (
        |  SELECT doc_id, length(text) AS nc,
        |    len(string_split(text,' ')) AS n,
        |    len(list_filter(string_split(text,' '), x -> x = 'the'))
        |      + len(list_filter(string_split(text,' '), x -> x = 'a')) AS stop,
        |    length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS sym
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(n AS INTEGER) AS n_tokens,
        |  CAST(trunc((nc - (n - 1)) * 10000.0 / n) AS INTEGER) AS avg_token_len_bp,
        |  CAST(trunc(stop * 10000.0 / n) AS INTEGER) AS stopword_ratio_bp,
        |  CAST(sym AS INTEGER) AS symbol_count,
        |  CAST(trunc((CASE WHEN n BETWEEN 20 AND 80 THEN 2 ELSE 1 END)
        |             * (n - stop) * 10000.0 / (n * 2)) AS INTEGER) AS quality_bp
        |FROM s ORDER BY doc_id""".stripMargin,

    "q28_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS INTEGER) AS n_ws,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_re
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q29_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id""".stripMargin,

    "q30_event_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        |  event_type, count(*) AS n,
        |  round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) / 100.0, 2) AS total
        |FROM events
        |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "q31_embed_neardup" ->
      """WITH el AS (
        |  SELECT vec_id,
        |    CAST(unnest(range(len(embedding))) AS INTEGER) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings WHERE vec_id < 256),
        |nrm AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM el GROUP BY vec_id),
        |dots AS (
        |  SELECT x.vec_id AS id1, y.vec_id AS id2, sum(x.v * y.v) AS dt
        |  FROM el x JOIN el y ON x.pos = y.pos AND x.vec_id < y.vec_id
        |  GROUP BY x.vec_id, y.vec_id)
        |SELECT id1, id2, round(dt / (n1.nrm * n2.nrm), 6) AS sim
        |FROM dots
        |JOIN nrm n1 ON n1.vec_id = id1
        |JOIN nrm n2 ON n2.vec_id = id2
        |WHERE round(dt / (n1.nrm * n2.nrm), 6) >= 0.4
        |ORDER BY id1, id2""".stripMargin,

    "q32_event_dedup" ->
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events) x
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q52_split" ->
      """SELECT lang,
        |  CASE WHEN (doc_id * 1000003 + 12345) % 100 < 80 THEN 'train'
        |       WHEN (doc_id * 1000003 + 12345) % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,

    "q50_pivot" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q51_gapfill" ->
      """WITH mm AS (SELECT CAST(min(ts) AS DATE) AS d0,
        |                   CAST(max(ts) AS DATE) AS d1 FROM events),
        |days AS (
        |  SELECT strftime(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |                                         CAST(d1 AS TIMESTAMP),
        |                                         INTERVAL 1 DAY)), '%Y-%m-%d') AS day
        |  FROM mm),
        |types AS (SELECT DISTINCT event_type FROM events),
        |counts AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS cday, event_type AS ctype,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT day, event_type, coalesce(cnt, 0) AS n
        |FROM days CROSS JOIN types
        |LEFT JOIN counts ON day = cday AND event_type = ctype
        |ORDER BY day, event_type""".stripMargin,

    "q47_funnel" ->
      """SELECT user_id,
        |  (first_signup IS NOT NULL AND first_purchase IS NOT NULL
        |   AND first_purchase >= first_signup
        |   AND first_purchase <= first_signup + INTERVAL 7 DAY) AS converted_7d,
        |  strftime(first_signup, '%Y-%m-%d %H:%M:%S') AS signup_at,
        |  strftime(first_purchase, '%Y-%m-%d %H:%M:%S') AS purchase_at
        |FROM (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        |  FROM events GROUP BY user_id) f
        |ORDER BY user_id""".stripMargin,

    "q48_histogram" ->
      """SELECT CAST(floor(value / 25.0) AS INTEGER) AS bucket,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) / 100.0, 2) AS total
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q44_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,

    "q45_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  round(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0, 2)
        |    AS nearby_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q46_dedup_clusters" ->
      (s"""WITH RECURSIVE ${jaccardCtes("true")},
          |pairs AS (${jaccardSelect("0.8")}),
          |sym AS (SELECT id1 AS a, id2 AS b FROM pairs
          |        UNION ALL SELECT id2, id1 FROM pairs),
          |cnodes AS (SELECT DISTINCT a AS id FROM sym),
          |reach AS (
          |  SELECT id, id AS r FROM cnodes
          |  UNION
          |  SELECT s.a AS id, reach.r FROM reach JOIN sym s ON reach.id = s.b
          |)
          |SELECT id, min(r) AS cluster FROM reach GROUP BY id
          |ORDER BY id""".stripMargin),

    "q53_dedup_keep_best" ->
      (s"""WITH RECURSIVE ${jaccardCtes("true")},
          |pairs AS (${jaccardSelect("0.8")}),
          |sym AS (SELECT id1 AS a, id2 AS b FROM pairs
          |        UNION ALL SELECT id2, id1 FROM pairs),
          |cnodes AS (SELECT DISTINCT a AS id FROM sym),
          |reach AS (
          |  SELECT id, id AS r FROM cnodes
          |  UNION
          |  SELECT s.a AS id, reach.r FROM reach JOIN sym s ON reach.id = s.b
          |),
          |clu AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
          |qual AS (
          |  SELECT doc_id,
          |    CAST(trunc((CASE WHEN n BETWEEN 20 AND 80 THEN 2 ELSE 1 END)
          |               * (n - stop) * 10000.0 / (n * 2)) AS INTEGER) AS q
          |  FROM (
          |    SELECT doc_id, len(string_split(text,' ')) AS n,
          |      len(list_filter(string_split(text,' '), x -> x = 'the'))
          |        + len(list_filter(string_split(text,' '), x -> x = 'a')) AS stop
          |    FROM documents)),
          |joined AS (
          |  SELECT qual.doc_id AS id, coalesce(clu.cluster, qual.doc_id) AS cluster, qual.q
          |  FROM qual LEFT JOIN clu ON qual.doc_id = clu.id),
          |ranked AS (
          |  SELECT cluster, id, q,
          |    row_number() OVER (PARTITION BY cluster ORDER BY q DESC, id) AS rn,
          |    count(*) OVER (PARTITION BY cluster) AS n
          |  FROM joined)
          |SELECT cluster, id AS kept_id, q AS kept_quality_bp,
          |  CAST(n AS BIGINT) AS n_members
          |FROM ranked WHERE rn = 1 ORDER BY cluster""".stripMargin),

    "q54_stratified_sample" ->
      """WITH langs AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN en = 0 AND es = 0 AND de = 0 THEN 'und'
        |      WHEN en >= es AND en >= de THEN 'en'
        |      WHEN es >= de THEN 'es'
        |      ELSE 'de' END AS lang_pred
        |  FROM (
        |    SELECT doc_id,
        |      len(list_filter(string_split(text,' '), x -> x = 'the'))
        |        + len(list_filter(string_split(text,' '), x -> x = 'a')) AS en,
        |      len(list_filter(string_split(text,' '), x -> x = 'data'))
        |        + len(list_filter(string_split(text,' '), x -> x = 'table')) AS es,
        |      len(list_filter(string_split(text,' '), x -> x = 'group'))
        |        + len(list_filter(string_split(text,' '), x -> x = 'fast')) AS de
        |    FROM documents) s),
        |hashed AS (
        |  SELECT doc_id, lang_pred,
        |    substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 4) AS hh
        |  FROM langs)
        |SELECT doc_id, lang_pred FROM hashed
        |WHERE (lang_pred = 'en' AND hh < '4ccd')
        |   OR (lang_pred <> 'en' AND hh < 'cccc')
        |ORDER BY doc_id""".stripMargin,

    "q55_contamination" ->
      (s"""WITH ${jaccardCtes("true")}
          |SELECT c.doc_id AS doc_id, b.doc_id AS bench_id,
          |  count(*) AS shared_shingles
          |FROM tri c JOIN tri b ON c.sh = b.sh
          |WHERE c.doc_id >= 50 AND b.doc_id < 50
          |GROUP BY 1, 2 HAVING count(*) >= 10
          |ORDER BY doc_id, bench_id""".stripMargin),

    "q56_sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tok,
        |    coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
        |  FROM t)
        |SELECT doc_id, CAST(n_tok AS INTEGER) AS n_tok,
        |  CAST(start // 2048 AS INTEGER) AS chunk_id,
        |  CAST(start % 2048 AS INTEGER) AS chunk_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    "q57_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, upper(hex(encode(text))) AS h,
        |    octet_length(encode(text)) AS nb
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    CAST(unnest(range((nb + 63) // 64)) AS INTEGER) AS frame_idx, h
        |  FROM m WHERE nb > 0)
        |SELECT doc_id AS media_id, frame_idx,
        |  substring(h, frame_idx * 128 + 1, 128) AS frame_hex
        |FROM f WHERE frame_idx % 4 = 0
        |ORDER BY media_id, frame_idx""".stripMargin,

    "q35_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id AS id, unnest(string_split(text,' ')) AS term
        |  FROM documents),
        |tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY id, term),
        |dfreq AS (SELECT term, count(DISTINCT id) AS df FROM toks GROUP BY term),
        |total AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (
        |  SELECT id, tf.term, tf, df,
        |    tf * ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)) AS tfidf
        |  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN total),
        |ranked AS (
        |  SELECT id, term, tf, df, tfidf,
        |    CAST(row_number() OVER (PARTITION BY id
        |                            ORDER BY tfidf DESC, term) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT id, rank, term, tf, df, round(tfidf, 4) AS tfidf
        |FROM ranked WHERE rank <= 3 ORDER BY id, rank""".stripMargin,

    "q36_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 2) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 2) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 2) AS p75,
        |  round(quantile_cont(l_quantity, 0.9), 2) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q37_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,

    "q38_asof" ->
      """WITH tagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS side,
        |    CASE WHEN event_type = 'view' THEN event_id END AS view_id
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |carried AS (
        |  SELECT *,
        |    last_value(view_id IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, side, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_view
        |  FROM tagged)
        |SELECT event_id, asof_view AS view_id
        |FROM carried WHERE side = 1 ORDER BY event_id""".stripMargin,

    "q34_sessionize" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                      ORDER BY ts, event_id) IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                      ORDER BY ts, event_id) > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM f)
        |SELECT user_id, CAST(sess AS INTEGER) AS session_id, count(*) AS n,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) / 100.0, 2) AS total
        |FROM s GROUP BY user_id, sess
        |ORDER BY user_id, session_id""".stripMargin,

    "q33_multimodal" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  octet_length(encode(text)) AS n_bytes,
        |  upper(hex(encode(substring(text, 1, 8)))) AS header_hex
        |FROM documents ORDER BY media_id""".stripMargin,

    // forward as-of with tolerance: view side = 0 so a purchase at the
    // exact view time is inside the (current..following) frame, mirroring
    // the operator's side ordering; date_diff('microsecond') ≡ Spark's
    // unix_micros subtraction (native precision, no second truncation)
    "q63_asof_forward" ->
      """WITH tagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS side,
        |    CASE WHEN event_type = 'purchase' THEN event_id END AS pid,
        |    CASE WHEN event_type = 'purchase' THEN ts END AS pts
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |carried AS (
        |  SELECT *,
        |    first_value(pid IGNORE NULLS) OVER w AS nxt_id,
        |    first_value(pts IGNORE NULLS) OVER w AS nxt_ts
        |  FROM tagged
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
        |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id,
        |  CASE WHEN date_diff('microsecond', ts, nxt_ts) <= 3600000000
        |       THEN nxt_id END AS purchase_id
        |FROM carried WHERE side = 0 ORDER BY event_id""".stripMargin,

    // q26's langId + q27's quality gate + q20's canonical dedup + q56's
    // packing, composed as CTEs — the same operator oracles, chained.
    "q67_pipeline" ->
      """WITH scored AS (
        |  SELECT doc_id, text,
        |    len(string_split(text,' ')) AS n,
        |    len(list_filter(string_split(text,' '), x -> x = 'the'))
        |      + len(list_filter(string_split(text,' '), x -> x = 'a')) AS en,
        |    len(list_filter(string_split(text,' '), x -> x = 'data'))
        |      + len(list_filter(string_split(text,' '), x -> x = 'table')) AS es,
        |    len(list_filter(string_split(text,' '), x -> x = 'group'))
        |      + len(list_filter(string_split(text,' '), x -> x = 'fast')) AS de
        |  FROM documents),
        |kept AS (
        |  SELECT doc_id, text, n FROM scored
        |  WHERE NOT (en = 0 AND es = 0 AND de = 0) AND en >= es AND en >= de
        |    AND CAST(trunc((CASE WHEN n BETWEEN 20 AND 80 THEN 2 ELSE 1 END)
        |          * (n - en) * 10000.0 / (n * 2)) AS INTEGER) >= 5000),
        |dedup AS (
        |  SELECT min(doc_id) AS doc_id, CAST(min(n) AS BIGINT) AS n_tok
        |  FROM kept GROUP BY text),
        |c AS (
        |  SELECT doc_id, n_tok,
        |    coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
        |  FROM dedup)
        |SELECT doc_id, CAST(n_tok AS INTEGER) AS n_tok,
        |  CAST(start // 2048 AS INTEGER) AS chunk_id,
        |  CAST(start % 2048 AS INTEGER) AS chunk_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    // int8 quantization codes, checked cross-engine via integer checksums:
    // float→double promotion is value-exact, x/scale*127 is IEEE-identical,
    // and both engines round ties away from zero, so the TINYINT codes are
    // bit-equal and the integral sums hash-match
    "q75_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |s AS (
        |  SELECT vec_id, embedding,
        |    greatest(list_max(list_transform(embedding, x -> abs(x))),
        |             1e-12) AS scale
        |  FROM e),
        |q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) / scale * 127) AS TINYINT))
        |      AS qv
        |  FROM s)
        |SELECT vec_id,
        |  CAST(list_sum(list_transform(qv, y -> CAST(y AS BIGINT)))
        |    AS BIGINT) AS qsum,
        |  CAST(list_min(qv) AS INTEGER) AS qmin,
        |  CAST(list_max(qv) AS INTEGER) AS qmax,
        |  CAST(len(qv) AS INTEGER) AS dim
        |FROM q ORDER BY vec_id""".stripMargin,

    // exact twin of q70's approximate shapes — count(DISTINCT) and the
    // 0.5/0.9 quantiles on the same columns, q36's integral-quantity
    // interpolation convention
    "q78_exact_distinct_pct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  round(quantile_cont(l_quantity, 0.5), 2) AS qty_p50,
        |  round(quantile_cont(l_quantity, 0.9), 2) AS qty_p90,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // fixed-point k-means step replayed in SQL: the same round(x*1e6)
    // quantization (float->double promotion value-exact, ties away from
    // zero in both engines), md5-picked seeds, INTEGER squared-euclidean
    // argmin (ties to smallest cid), floor-of-exact-ratio centroid update.
    // sums go through explicit BIGINT casts (DuckDB sum(BIGINT) returns
    // HUGEINT); s / n_members is BIGINT/BIGINT -> DOUBLE, IEEE-identical
    // to Spark's long division, and floor of it is deterministic
    "q79_kmeans_step" ->
      s"""WITH q AS (
         |  SELECT vec_id AS id,
         |    ${OracleUtil.fixedPointVec()} AS qv
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |seeds AS (
         |  SELECT id AS cid, qv AS cv FROM q
         |  ORDER BY ${md5Head60("CAST(id AS VARCHAR)")}, id
         |  LIMIT 16),
         |el AS (
         |  SELECT id, CAST(unnest(range(len(qv))) AS INTEGER) AS pos,
         |    unnest(qv) AS v
         |  FROM q),
         |cel AS (
         |  SELECT cid, CAST(unnest(range(len(cv))) AS INTEGER) AS pos,
         |    unnest(cv) AS v
         |  FROM seeds),
         |dist AS (
         |  SELECT el.id, cel.cid,
         |    CAST(sum((el.v - cel.v) * (el.v - cel.v)) AS BIGINT) AS d2
         |  FROM el JOIN cel ON el.pos = cel.pos
         |  GROUP BY el.id, cel.cid),
         |asg AS (
         |  SELECT id, cid, d2 FROM (
         |    SELECT id, cid, d2,
         |      row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
         |    FROM dist) x
         |  WHERE rn = 1),
         |members AS (
         |  -- sum(BIGINT) is HUGEINT (128-bit exact, same as the Spark
         |  -- side's decimal(38,0) sum); the per-member integral-divide
         |  -- average is long-sized at any SF where the raw sum is not
         |  SELECT cid, count(*) AS n_members,
         |    CAST(sum(d2) // count(*) AS BIGINT) AS inertia_avg
         |  FROM asg GROUP BY cid),
         |sums AS (
         |  SELECT a.cid, el.pos, CAST(sum(el.v) AS BIGINT) AS s
         |  FROM asg a JOIN el ON el.id = a.id
         |  GROUP BY a.cid, el.pos),
         |newc AS (
         |  SELECT sums.cid, pos,
         |    CAST(floor(s / n_members) AS BIGINT) AS c
         |  FROM sums JOIN members ON members.cid = sums.cid),
         |chk AS (
         |  SELECT cid, CAST(sum(c) AS BIGINT) AS csum,
         |    min(c) AS cmin, max(c) AS cmax
         |  FROM newc GROUP BY cid)
         |SELECT m.cid, m.n_members, m.inertia_avg, chk.csum, chk.cmin, chk.cmax
         |FROM members m JOIN chk ON chk.cid = m.cid
         |ORDER BY m.cid""".stripMargin,

    // the adaptive operator's exact-fallback path IS a plain groupBy, so
    // the oracle is the same computation spelled directly
    "q80_heavy_fallback" ->
      """SELECT CAST(l_orderkey AS VARCHAR) || ':' ||
        |    CAST(l_linenumber AS VARCHAR) AS line_key,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1
        |ORDER BY n_rows DESC, line_key LIMIT 20""".stripMargin,

    // the sketch only nominates candidates; emitted counts are exact, so
    // the oracle is the plain distinct-bigram doc-frequency top-k
    "q69_heavy_hitters" ->
      """WITH d AS (
        |  SELECT string_split(text, ' ') AS a FROM documents),
        |g AS (
        |  SELECT unnest(list_distinct(
        |    list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])))
        |    AS gram
        |  FROM d)
        |SELECT gram, count(*) AS n_docs
        |FROM g GROUP BY gram
        |ORDER BY n_docs DESC, gram LIMIT 20""".stripMargin,

    // BM25: same association order as the DataFrame expression tree —
    // (idf * (tf*2.2)) / (tf + 1.2*(0.25 + 0.75*lennorm)), lennorm the
    // single double division of exact longs dl*N/tot_tok
    "q81_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id AS id, unnest(string_split(text,' ')) AS term
        |  FROM documents),
        |tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY id, term),
        |dl AS (SELECT id, sum(tf) AS dl FROM tf GROUP BY id),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |stats AS (SELECT sum(dl) AS tot_tok, count(*) AS n_docs FROM dl),
        |scored AS (
        |  SELECT id, tf.term, tf, df, dl,
        |    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        |      * (tf * 2.2)
        |      / (tf + 1.2 * (0.25 + 0.75 * ((dl * n_docs) / tot_tok)))
        |      AS bm25
        |  FROM tf JOIN dfreq ON tf.term = dfreq.term
        |          JOIN dl USING (id) CROSS JOIN stats),
        |ranked AS (
        |  SELECT id, term, tf, df, dl, bm25,
        |    CAST(row_number() OVER (PARTITION BY id
        |                            ORDER BY bm25 DESC, term) AS INTEGER)
        |      AS rank
        |  FROM scored)
        |SELECT id, rank, term, tf, df, CAST(dl AS BIGINT) AS dl,
        |  round(bm25, 4) AS bm25
        |FROM ranked WHERE rank <= 3 ORDER BY id, rank""".stripMargin,

    // quota sampling: fixed-width lowercase-hex prefix order ≡ the engine's
    // 48-bit numeric order (QuotaSampler ranks on the parsed value)
    "q82_source_quota" ->
      """WITH ranked AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY substr(md5(text), 1, 12), doc_id) AS rk
        |  FROM documents)
        |SELECT source, CAST(rk AS INTEGER) AS rank, doc_id
        |FROM ranked WHERE rk <= 10
        |ORDER BY source, rank""".stripMargin,

    // repetition filter: the engine computes the ratio as a per-row array
    // expression; the twin's explode+groupBy is the same math (split of ''
    // yields the one-element [''] list in both engines, so no doc drops out)
    "q83_repetition_filter" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_tok, count(DISTINCT term) AS n_uniq
        |  FROM toks GROUP BY doc_id)
        |SELECT doc_id, CAST(n_tok AS INTEGER) AS n_tok,
        |  CAST(n_uniq AS INTEGER) AS n_uniq,
        |  round(CAST(n_uniq AS DOUBLE) / n_tok, 4) AS uniq_ratio,
        |  (CAST(n_uniq AS DOUBLE) / n_tok >= 0.55) AS kept
        |FROM agg ORDER BY doc_id""".stripMargin,

    // PII scrub: identical per-row contact-line construction, then the same
    // Java∩RE2 patterns — DuckDB needs the 'g' flag Spark implies, and
    // counts come from regexp_extract_all (both engines scan
    // non-overlapping left to right)
    "q84_pii_redact" ->
      """WITH raw AS (
        |  SELECT doc_id, text || ' ' || concat_ws(' ', 'contact',
        |    'user' || CAST(doc_id AS VARCHAR) || '@mail-' || source
        |      || '.example',
        |    CASE WHEN doc_id % 3 <> 0
        |      THEN 'call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      ELSE 'nocall' END,
        |    CASE WHEN doc_id % 5 = 0
        |      THEN 'host 10.' || CAST(doc_id % 200 AS VARCHAR) || '.'
        |        || CAST((doc_id * 7) % 250 AS VARCHAR) || '.9'
        |      ELSE 'nohost' END) AS s
        |  FROM documents),
        |red AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(s,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |    len(regexp_extract_all(s, '555-[0-9]{4}')) AS n_phone,
        |    len(regexp_extract_all(s,
        |      '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS n_ip,
        |    regexp_replace(regexp_replace(regexp_replace(s,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '[EMAIL]', 'g'),
        |      '([0-9]{1,3}\.){3}[0-9]{1,3}', '[IP]', 'g'),
        |      '555-[0-9]{4}', '[PHONE]', 'g') AS r
        |  FROM raw)
        |SELECT doc_id, CAST(n_email AS INTEGER) AS n_email,
        |  CAST(n_phone AS INTEGER) AS n_phone, CAST(n_ip AS INTEGER) AS n_ip,
        |  md5(r) AS redacted_md5, CAST(length(r) AS INTEGER) AS redacted_len
        |FROM red ORDER BY doc_id""".stripMargin,

    // chunk dedup: same 8-token windows (list slice ≡ Spark slice, both
    // 1-based inclusive), same portable 60-bit md5 chunk key (r18 — the
    // q93 recipe; the engine shuffles and checkpoints the 8-byte key, and
    // the twin replays the identical hash so a collision merges the same
    // chunks in both), same BIGINT (doc_id, pos) encoding, keep-first by
    // min key
    "q85_chunk_dedup" ->
      s"""WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS a,
        |    CAST(len(string_split(text, ' ')) // 8 AS INTEGER) AS n_chunks
        |  FROM documents),
        |b AS (SELECT * FROM d WHERE n_chunks >= 1),
        |occ AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(n_chunks),
        |      i -> struct_pack(pos := i,
        |        chunk := array_to_string(a[8*i+1:8*i+8], ' ')))) AS o
        |  FROM b),
        |k AS (
        |  SELECT ${md5Head60("o.chunk")} AS h,
        |    min(doc_id * 1048576 + o.pos) AS k0
        |  FROM occ GROUP BY 1),
        |own AS (
        |  SELECT CAST(k0 // 1048576 AS BIGINT) AS doc_id, count(*) AS kept
        |  FROM k GROUP BY 1)
        |SELECT b.doc_id, n_chunks,
        |  CAST(coalesce(kept, 0) AS INTEGER) AS n_kept,
        |  CAST((n_chunks - coalesce(kept, 0)) * 1000000 // n_chunks
        |    AS INTEGER) AS dup_ppm
        |FROM b LEFT JOIN own USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // length buckets: the same explicit CASE ladder (integer-exact; no
    // float pow/log2 anywhere near the boundaries)
    "q86_length_buckets" ->
      """WITH n AS (
        |  SELECT CASE WHEN nt <= 16 THEN 16 WHEN nt <= 32 THEN 32
        |    WHEN nt <= 64 THEN 64 WHEN nt <= 128 THEN 128
        |    WHEN nt <= 256 THEN 256 WHEN nt <= 512 THEN 512
        |    WHEN nt <= 1024 THEN 1024 ELSE 2048 END AS bucket,
        |    least(nt, 2048) AS nt
        |  FROM (SELECT len(string_split(text, ' ')) AS nt FROM documents))
        |SELECT CAST(bucket AS INTEGER) AS bucket, count(*) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS sum_tok,
        |  CAST(count(*) * bucket AS BIGINT) AS padded,
        |  CAST((count(*) * bucket - sum(nt)) * 1000000
        |    // (count(*) * bucket) AS INTEGER) AS waste_ppm
        |FROM n GROUP BY bucket ORDER BY bucket""".stripMargin,

    // shard assignment: the engine's bucketed two-phase rank equals one
    // row_number per shard over the full key order
    "q87_shard_assign" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 15))
        |      ::BIGINT AS key
        |  FROM documents)
        |SELECT doc_id, CAST(key % 8 AS INTEGER) AS shard,
        |  CAST(row_number() OVER (PARTITION BY key % 8
        |    ORDER BY key, doc_id) AS INTEGER) AS pos
        |FROM k ORDER BY shard, pos""".stripMargin,

    // PQ-ADC: same fixed-point scaling, md5-seeded codebooks, per-subspace
    // argmin encode, integer asymmetric-distance sums, and exact rerank as
    // Similarity.pqAdcTopK — `dist` covers every (vector, centroid,
    // subspace) triple, so the query-side ADC tables are its id < 8 slice
    "q88_pq_adc" ->
      s"""WITH q AS (
         |  SELECT vec_id AS id,
         |    ${OracleUtil.fixedPointVec()} AS qv
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |seeds AS (
         |  SELECT id AS cid, qv AS cv FROM q
         |  ORDER BY ${md5Head60("CAST(id AS VARCHAR)")}, id
         |  LIMIT 16),
         |sub_q AS (
         |  SELECT id, s, qv[s*4+1 : s*4+4] AS sub
         |  FROM q CROSS JOIN (SELECT unnest(range(16)) AS s) ss),
         |sub_c AS (
         |  SELECT cid, s, cv[s*4+1 : s*4+4] AS csub
         |  FROM seeds CROSS JOIN (SELECT unnest(range(16)) AS s) ss),
         |els AS (
         |  SELECT id, s, CAST(unnest(range(len(sub))) AS INTEGER) AS pos,
         |    unnest(sub) AS v
         |  FROM sub_q),
         |cels AS (
         |  SELECT cid, s, CAST(unnest(range(len(csub))) AS INTEGER) AS pos,
         |    unnest(csub) AS v
         |  FROM sub_c),
         |dist AS (
         |  SELECT els.id, cels.cid, els.s,
         |    CAST(sum((els.v - cels.v) * (els.v - cels.v)) AS BIGINT) AS d2
         |  FROM els JOIN cels ON els.pos = cels.pos AND els.s = cels.s
         |  GROUP BY els.id, cels.cid, els.s),
         |codes AS (
         |  SELECT id, s, cid AS code FROM (
         |    SELECT id, s, cid,
         |      row_number() OVER (PARTITION BY id, s ORDER BY d2, cid) AS rn
         |    FROM dist) x
         |  WHERE rn = 1),
         |adc AS (
         |  SELECT t.id AS qid, c.id, CAST(sum(t.d2) AS BIGINT) AS adc
         |  FROM codes c JOIN dist t ON t.s = c.s AND t.cid = c.code
         |  WHERE t.id < 8
         |  GROUP BY t.id, c.id),
         |shortlist AS (
         |  SELECT qid, id, adc FROM (
         |    SELECT qid, id, adc,
         |      row_number() OVER (PARTITION BY qid ORDER BY adc, id) AS arank
         |    FROM adc) x
         |  WHERE arank <= 50),
         |elf AS (
         |  SELECT id, CAST(unnest(range(len(qv))) AS INTEGER) AS pos,
         |    unnest(qv) AS v
         |  FROM q),
         |ex AS (
         |  SELECT sl.qid, sl.id, sl.adc,
         |    CAST(sum((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS d2
         |  FROM shortlist sl
         |  JOIN elf a ON a.id = sl.qid
         |  JOIN elf b ON b.id = sl.id AND b.pos = a.pos
         |  GROUP BY sl.qid, sl.id, sl.adc),
         |rr AS (
         |  SELECT qid, id, adc, d2,
         |    CAST(row_number() OVER (PARTITION BY qid
         |      ORDER BY d2, id) AS INTEGER) AS rank
         |  FROM ex)
         |SELECT qid, rank, id, adc, d2 FROM rr
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // quality audit: same metric names, same thresholds; every value BIGINT
    "q89_quality_audit" ->
      """WITH one AS (
        |  SELECT count(*) AS row_count,
        |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
        |      AS null_shipdate,
        |    sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
        |      AS null_returnflag,
        |    sum(CASE WHEN NOT (l_returnflag IN ('A','N','R')) THEN 1
        |      ELSE 0 END) AS flag_domain_viol,
        |    sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1
        |      ELSE 0 END) AS qty_range_viol,
        |    sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS qty_over_45,
        |    sum(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END)
        |      AS discount_over_8pct,
        |    min(l_quantity) AS min_quantity,
        |    max(l_quantity) AS max_quantity
        |  FROM lineitem)
        |SELECT metric, CAST(value AS BIGINT) AS value FROM (
        |  SELECT 'row_count' AS metric, row_count AS value FROM one
        |  UNION ALL SELECT 'null_shipdate', null_shipdate FROM one
        |  UNION ALL SELECT 'null_returnflag', null_returnflag FROM one
        |  UNION ALL SELECT 'flag_domain_viol', flag_domain_viol FROM one
        |  UNION ALL SELECT 'qty_range_viol', qty_range_viol FROM one
        |  UNION ALL SELECT 'qty_over_45', qty_over_45 FROM one
        |  UNION ALL SELECT 'discount_over_8pct', discount_over_8pct FROM one
        |  UNION ALL SELECT 'min_quantity', min_quantity FROM one
        |  UNION ALL SELECT 'max_quantity', max_quantity FROM one
        |  UNION ALL SELECT 'distinct_orderkey', count(DISTINCT l_orderkey)
        |    FROM lineitem
        |  UNION ALL SELECT 'distinct_line_pairs', count(*) FROM
        |    (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)
        |  UNION ALL SELECT 'orphan_orderkeys', count(*) FROM
        |    (SELECT DISTINCT l_orderkey FROM lineitem
        |     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)))
        |ORDER BY metric""".stripMargin,

    // bloom prune: the mask is invisible in the result (prune + exact
    // rejoin ≡ the plain semi join), so the twin is the plain semi join
    "q90_bloom_prune" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_c,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 480000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // bigram rarity: same top-256 model (count desc, bigram asc — fully
    // deterministic), same OOV rank 512, same integer centirank gate
    "q91_bigram_rarity" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        |b AS (SELECT doc_id, a FROM d WHERE len(a) >= 2),
        |bgs AS (
        |  SELECT doc_id, unnest(list_transform(range(len(a) - 1),
        |    i -> a[i+1] || ' ' || a[i+2])) AS bg
        |  FROM b),
        |c AS (SELECT bg, count(*) AS c FROM bgs GROUP BY 1),
        |v AS (
        |  SELECT bg, rank FROM (
        |    SELECT bg, CAST(row_number() OVER (ORDER BY c DESC, bg)
        |      AS INTEGER) AS rank
        |    FROM c) x
        |  WHERE rank <= 256),
        |sc AS (
        |  SELECT t.doc_id, count(*) AS n_bigrams,
        |    sum(CASE WHEN v.rank IS NULL THEN 1 ELSE 0 END) AS n_oov,
        |    sum(coalesce(v.rank, 512)) AS sum_rank
        |  FROM bgs t LEFT JOIN v USING (bg)
        |  GROUP BY t.doc_id)
        |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
        |  CAST(n_oov AS BIGINT) AS n_oov,
        |  CAST(sum_rank AS BIGINT) AS sum_rank,
        |  CAST(sum_rank * 100 // n_bigrams AS INTEGER) AS avg_rank_c,
        |  (sum_rank * 100 // n_bigrams <= 12000) AS kept
        |FROM sc ORDER BY doc_id""".stripMargin,

    // mixture plan: same half-corpus uniform budget, same integer ppm
    // ladder (every division a BIGINT floor div, so no float drift)
    "q92_mixture_plan" ->
      """WITH pl AS (
        |  SELECT lang, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok
        |  FROM documents GROUP BY lang),
        |tot AS (
        |  SELECT CAST(sum(tok) AS BIGINT) AS tot_tok,
        |    count(*) AS n_langs
        |  FROM pl),
        |x AS (
        |  SELECT lang, n_docs, tok,
        |    CAST(tok * 1000000 // tot_tok AS INTEGER) AS share_ppm,
        |    CAST(tot_tok // (2 * n_langs) AS BIGINT) AS target_tok
        |  FROM pl, tot),
        |y AS (
        |  SELECT lang, n_docs, tok, share_ppm, target_tok,
        |    CAST(least(1000000, target_tok * 1000000 // tok) AS INTEGER)
        |      AS sample_ppm
        |  FROM x)
        |SELECT lang, n_docs, tok, share_ppm, target_tok, sample_ppm,
        |  CAST(tok * sample_ppm // 1000000 AS BIGINT) AS expect_tok
        |FROM y ORDER BY lang""".stripMargin,

    // boilerplate removal: same planted banner/footer, same 8-token
    // chunking as q85, same 60-bit portable chunk key, ≥3-distinct-doc
    // frequency rule, and ORDER BY pos reconstruction
    "q93_boilerplate" ->
      s"""WITH planted AS (
         |  SELECT doc_id, CASE
         |    WHEN doc_id % 4 = 0 THEN
         |      'subscribe to our newsletter for daily updates now ' || text
         |    WHEN doc_id % 10 = 0 THEN
         |      'all rights reserved by the site owner today ' || text
         |    ELSE text END AS text
         |  FROM documents),
         |d AS (
         |  SELECT doc_id, string_split(text, ' ') AS a,
         |    CAST(len(string_split(text, ' ')) // 8 AS INTEGER) AS n_chunks
         |  FROM planted),
         |b AS (SELECT * FROM d WHERE n_chunks >= 1),
         |occ AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(n_chunks),
         |      i -> struct_pack(pos := i,
         |        chunk := array_to_string(a[8*i+1:8*i+8], ' ')))) AS o
         |  FROM b),
         |oc AS (
         |  SELECT doc_id, CAST(o.pos AS INTEGER) AS pos, o.chunk AS chunk,
         |    ${md5Head60("o.chunk")} AS h
         |  FROM occ),
         |boiler AS (
         |  SELECT h FROM (
         |    SELECT h, count(DISTINCT doc_id) AS nd FROM oc GROUP BY h) x
         |  WHERE nd >= 3),
         |kept AS (
         |  SELECT * FROM oc WHERE h NOT IN (SELECT h FROM boiler)),
         |reb AS (
         |  SELECT doc_id, count(*) AS n_kept,
         |    string_agg(chunk, ' ' ORDER BY pos) AS cleaned
         |  FROM kept GROUP BY doc_id)
         |SELECT b.doc_id, n_chunks,
         |  CAST(coalesce(n_kept, 0) AS INTEGER) AS n_kept,
         |  md5(coalesce(cleaned, '')) AS cleaned_md5
         |FROM b LEFT JOIN reb USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // containment: q21's shingle CTEs with ordered pairs (<>) and the
    // |A|-only divisor; ratio compared raw, emitted as truncated ppm
    "q94_containment" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CAST(unnest(range(len(string_split(text,' ')))) AS INTEGER) AS pos,
        |    unnest(string_split(text,' ')) AS w
        |  FROM documents WHERE doc_id < 200),
        |tri AS (
        |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS sh
        |  FROM tok a
        |  JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM tri GROUP BY doc_id),
        |inter AS (
        |  SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS i
        |  FROM tri x JOIN tri y ON x.sh = y.sh AND x.doc_id <> y.doc_id
        |  GROUP BY x.doc_id, y.doc_id)
        |SELECT id1, id2, CAST(i AS BIGINT) AS inter,
        |  CAST(trunc((i * 1.0 / s1.sz) * 1000000.0) AS INTEGER)
        |    AS containment_ppm
        |FROM inter
        |JOIN sizes s1 ON s1.doc_id = id1
        |WHERE (i * 1.0 / s1.sz) >= 0.5
        |ORDER BY id1, id2""".stripMargin,

    // co-occurrence PMI replayed: position self-join for the +1/+2
    // window, HUGEINT integral divide for the PMI-monotone ppm ratio
    "q105_cooccur_pmi" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CAST(unnest(range(len(string_split(text,' ')))) AS INTEGER)
        |      AS pos,
        |    unnest(string_split(text,' ')) AS w
        |  FROM documents),
        |pairs AS (
        |  SELECT a.w AS w1, b.w AS w2
        |  FROM tok a JOIN tok b ON b.doc_id = a.doc_id
        |    AND (b.pos = a.pos + 1 OR b.pos = a.pos + 2)),
        |cxy AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy
        |  FROM pairs GROUP BY w1, w2),
        |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
        |tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM uni)
        |SELECT w1, w2, c_xy,
        |  CAST((CAST(c_xy AS HUGEINT) * tt.t * 1000000)
        |    // (CAST(cx.c AS HUGEINT) * cy.c) AS BIGINT) AS pmi_ppm
        |FROM cxy
        |CROSS JOIN tt
        |JOIN uni cx ON cx.w = cxy.w1
        |JOIN uni cy ON cy.w = cxy.w2
        |WHERE c_xy >= 5
        |ORDER BY pmi_ppm DESC, w1, w2 LIMIT 50""".stripMargin,

    // pooled two-proportion z replayed in HUGEINT — same cross-
    // multiplied inequality, same conditional-count single pass
    "q104_abtest" ->
      """WITH base AS (
        |  SELECT event_type,
        |    CAST(count(*) FILTER (user_id % 2 = 0) AS BIGINT) AS n_a,
        |    CAST(count(*) FILTER (user_id % 2 = 0 AND value > 250)
        |      AS BIGINT) AS c_a,
        |    CAST(count(*) FILTER (user_id % 2 <> 0) AS BIGINT) AS n_b,
        |    CAST(count(*) FILTER (user_id % 2 <> 0 AND value > 250)
        |      AS BIGINT) AS c_b
        |  FROM events GROUP BY event_type),
        |h AS (
        |  SELECT event_type, n_a, c_a, n_b, c_b,
        |    CAST(c_a AS HUGEINT) * n_b - CAST(c_b AS HUGEINT) * n_a
        |      AS diff,
        |    CAST(n_a AS HUGEINT) + n_b AS n,
        |    CAST(c_a AS HUGEINT) + c_b AS c
        |  FROM base)
        |SELECT event_type, n_a, c_a, n_b, c_b,
        |  10000 * diff * diff * n >
        |    38416 * CAST(n_a AS HUGEINT) * n_b * c * (n - c)
        |    AS significant
        |FROM h ORDER BY event_type""".stripMargin,

    // fixed-point PageRank unrolled as 3 chained CTEs: same integral
    // divisions (// ≡ Spark div on non-negative longs), same damping
    // arithmetic, contributions to id-gaps dropped identically
    "q103_pagerank" ->
      s"""WITH $linkGraphCtes,
        |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |${prRound("r0", 1, "nodes", "150000")},
        |${prRound("r1", 2, "nodes", "150000")},
        |${prRound("r2", 3, "nodes", "150000")}
        |SELECT id, r FROM r3 ORDER BY id""".stripMargin,

    // robust-scale stats replayed: same millibin quantization, same
    // nearest-rank k = ceil(n*q/100) picked off the windowed cumsum
    "q102_robust_scale" ->
      """WITH el AS (
        |  SELECT pos, mb FROM (
        |    SELECT CAST(unnest(range(len(embedding))) AS INTEGER) AS pos,
        |      unnest(list_transform(embedding,
        |        x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)))
        |        AS mb
        |    FROM embeddings WHERE embedding IS NOT NULL) t),
        |hist AS (
        |  SELECT pos, mb, count(*) AS c FROM el GROUP BY pos, mb),
        |ranked AS (
        |  SELECT pos, mb, c,
        |    CAST(sum(c) OVER (PARTITION BY pos) AS BIGINT) AS n,
        |    CAST(sum(c) OVER (PARTITION BY pos ORDER BY mb) AS BIGINT)
        |      AS cum
        |  FROM hist),
        |agg AS (
        |  SELECT pos, n, min(mb) AS min_mb, max(mb) AS max_mb,
        |    min(CASE WHEN cum >= (n * 25 + 99) // 100 THEN mb END) AS p25_mb,
        |    min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN mb END) AS p50_mb,
        |    min(CASE WHEN cum >= (n * 75 + 99) // 100 THEN mb END) AS p75_mb
        |  FROM ranked GROUP BY pos, n)
        |SELECT pos, n, min_mb, max_mb, p25_mb, p50_mb, p75_mb,
        |  p75_mb - p25_mb AS iqr_mb
        |FROM agg ORDER BY pos""".stripMargin,

    // CDC apply replayed as row_number over (seq DESC, op DESC) — the
    // same (seq, op) lexicographic race CdcMerge's max_by runs
    "q101_cdc_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
        |    CAST(0 AS BIGINT) AS seq, 'I' AS op
        |  FROM orders),
        |feed AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100) AS BIGINT) + 100000 AS price_c,
        |    CAST(1 AS BIGINT) AS seq, 'U' AS op
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, CAST(0 AS BIGINT),
        |    CAST(2 AS BIGINT), 'D'
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, CAST(9999 AS BIGINT),
        |    CAST(3 AS BIGINT), 'I'
        |  FROM orders WHERE o_orderkey % 14 = 0),
        |allr AS (SELECT * FROM base UNION ALL SELECT * FROM feed),
        |won AS (
        |  SELECT o_orderstatus, price_c FROM (
        |    SELECT o_orderstatus, price_c, op, row_number() OVER (
        |      PARTITION BY o_orderkey ORDER BY seq DESC, op DESC) AS rn
        |    FROM allr) x
        |  WHERE rn = 1 AND op <> 'D')
        |SELECT o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(price_c) AS BIGINT) AS sum_c
        |FROM won GROUP BY 1 ORDER BY 1""".stripMargin,

    // retention triangle: same anchored-Monday integer week indexing
    // (floor of day-diff / 7 — no date_trunc('week') dialect risk)
    "q100_retention_cohorts" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |first AS (
        |  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id),
        |cells AS (
        |  SELECT DISTINCT ev.user_id,
        |    CAST(floor(date_diff('day', DATE '2024-01-01', cohort_day)
        |      / 7.0) AS INTEGER) AS cohort_week,
        |    CAST(floor(date_diff('day', cohort_day, day) / 7.0)
        |      AS INTEGER) AS weeks_since
        |  FROM ev JOIN first ON first.user_id = ev.user_id)
        |SELECT cohort_week, weeks_since,
        |  count(DISTINCT user_id) AS n_users
        |FROM cells GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // inverted index: same (term, doc) tf stream, same (tf DESC, doc)
    // posting order — string_agg's ORDER BY mirrors the struct sort
    "q99_inverted_index" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS term
        |  FROM documents),
        |tfc AS (
        |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        |  FROM tok GROUP BY term, doc_id),
        |stats AS (
        |  SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
        |  FROM tfc GROUP BY term),
        |top3 AS (
        |  SELECT term, doc_id, tf FROM (
        |    SELECT term, doc_id, tf,
        |      row_number() OVER (PARTITION BY term
        |                         ORDER BY tf DESC, doc_id) AS rn
        |    FROM tfc) x
        |  WHERE rn <= 3),
        |posts AS (
        |  SELECT term,
        |    string_agg(CAST(doc_id AS VARCHAR) || ':' ||
        |               CAST(tf AS VARCHAR), ','
        |               ORDER BY tf DESC, doc_id) AS top_postings
        |  FROM top3 GROUP BY term)
        |SELECT s.term, s.df, s.cf, p.top_postings
        |FROM stats s JOIN posts p ON p.term = s.term
        |WHERE s.df >= 5
        |ORDER BY s.term""".stripMargin,

    // blocked levenshtein linkage: same first-token blocks, 3-token
    // names, classic insert/delete/substitute distance in both engines
    "q98_fuzzy_join" ->
      """WITH s AS (
        |  SELECT doc_id AS id, string_split(text,' ')[1] AS blk,
        |    array_to_string(string_split(text,' ')[1:3], ' ') AS nm
        |  FROM documents WHERE doc_id < 1000)
        |SELECT x.id AS id1, y.id AS id2,
        |  CAST(levenshtein(x.nm, y.nm) AS INTEGER) AS dist
        |FROM s x JOIN s y ON x.blk = y.blk AND x.id < y.id
        |WHERE levenshtein(x.nm, y.nm) <= 2
        |ORDER BY id1, id2""".stripMargin,

    // URL synth + the exact canonicalization chain (scheme → www →
    // tracking params → dangling separators → /?-fold → trailing slash);
    // regexp_replace needs the 'g' flag to match Spark's replace-all
    "q97_url_canonical" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
        |    || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
        |    || 'site-' || source || '.example/p/'
        |    || CAST(doc_id % 40 AS VARCHAR)
        |    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
        |    || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&ref=a'
        |             WHEN doc_id % 5 = 0 THEN '?id=' ||
        |               CAST(doc_id % 7 AS VARCHAR)
        |             ELSE '' END) AS url
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(url, '^https?://', ''),
        |              '^www\.', ''),
        |            '(utm_[a-z]+|ref)=[^&]*&?', '', 'g'),
        |          '[?&]+$', ''),
        |        '/?', '?'),
        |      '/$', '') AS canonical
        |  FROM u)
        |SELECT canonical, count(*) AS n_docs, min(doc_id) AS keeper
        |FROM c GROUP BY canonical ORDER BY canonical""".stripMargin,

    // rolling z-test replayed: identical trailing-rows window (ties broken
    // by event_id in both engines), value-cents integers, and the same
    // cross-multiplied 3-sigma test; sum() OVER returns HUGEINT in DuckDB
    // — cast back to BIGINT to match Spark's long window sums
    "q96_rolling_anomaly" ->
      """WITH c AS (
        |  SELECT event_id, user_id, ts,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events),
        |w AS (
        |  SELECT event_id, c,
        |    count(*) OVER win AS n_prev,
        |    CAST(coalesce(sum(c) OVER win, 0) AS BIGINT) AS s_prev,
        |    CAST(coalesce(sum(c * c) OVER win, 0) AS BIGINT) AS q_prev
        |  FROM c
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, n_prev, s_prev,
        |  (n_prev >= 4 AND
        |   (n_prev * c - s_prev) * (n_prev * c - s_prev)
        |     > 9 * (n_prev * q_prev - s_prev * s_prev)) AS anomaly
        |FROM w ORDER BY event_id""".stripMargin,

    // SemDeDup replayed: same 1e6 fixed-point quantization, adaptive
    // K = max(8, ceil(N/64)), md5-picked seeds ("sem:" prefix), integer
    // L2 argmin (ties to smallest cid), and the cross-multiplied cosine
    // test dot²·10⁴ ≥ 45²·|a|²·|b|² in HUGEINT (Spark: decimal(38,0))
    "q95_semantic_dedup" ->
      s"""WITH q AS (
         |  SELECT vec_id AS id,
         |    ${OracleUtil.fixedPointVec()} AS qv
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |${OracleUtil.semanticDedupCtes}
         |SELECT a.id, a.cid,
         |  coalesce(d.n_dups_lower, 0) AS n_dups_lower,
         |  coalesce(d.n_dups_lower, 0) = 0 AS kept
         |FROM asg a LEFT JOIN dups d ON d.id = a.id
         |ORDER BY a.id""".stripMargin,

    // covariance replayed: same millibin quantization, same upper-triangle
    // pairs, n·Σxy − Σx·Σy in HUGEINT (≡ Spark's decimal(38,0))
    "q106_covariance" ->
      """WITH el AS (
        |  SELECT rid, i, x FROM (
        |    SELECT vec_id AS rid,
        |      CAST(unnest(range(16)) AS INTEGER) AS i,
        |      unnest(list_transform(embedding[1:16],
        |        v -> CAST(round(CAST(v AS DOUBLE) * 1000) AS BIGINT))) AS x
        |    FROM embeddings WHERE embedding IS NOT NULL) t),
        |ps AS (
        |  SELECT a.i AS i, b.i AS j, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(a.x AS HUGEINT) * b.x) AS HUGEINT) AS sxy
        |  FROM el a JOIN el b ON b.rid = a.rid AND b.i >= a.i
        |  GROUP BY a.i, b.i),
        |ds AS (SELECT i, CAST(sum(x) AS HUGEINT) AS sx FROM el GROUP BY i)
        |SELECT ps.i, ps.j, ps.n,
        |  CAST(ps.n * ps.sxy - dx.sx * dy.sx AS BIGINT) AS cov_num
        |FROM ps JOIN ds dx ON dx.i = ps.i JOIN ds dy ON dy.i = ps.j
        |ORDER BY ps.i, ps.j""".stripMargin,

    // hashing trick replayed: same portable-md5 bucket, occurrences plus
    // distinct-doc counts per bucket
    "q107_feature_hash" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5('fh:' || w), 1, 15))::BIGINT % 256
        |      AS INTEGER) AS bucket
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents) t
        |  WHERE len(w) > 0)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM tok GROUP BY bucket ORDER BY bucket""".stripMargin,

    // incremental-rollup oracle: the FULL recompute the state merge must
    // equal — hash equality proves refresh ≡ rescan
    "q108_incr_agg" ->
      """SELECT o_orderpriority,
        |  CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER)
        |    AS ym,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS total_c,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    // count(*) AS BIGINT) AS avg_c
        |FROM orders
        |GROUP BY o_orderpriority, ym
        |ORDER BY o_orderpriority, ym""".stripMargin,

    // triangle census replayed: same synthesized edges, same low->high
    // orientation, wedge join + closing-edge mark
    "q109_triangles" ->
      """WITH nodes AS (SELECT doc_id AS id FROM documents),
        |mm AS (SELECT max(id) + 1 AS m FROM nodes),
        |dir_e AS (
        |  SELECT id AS src, (id * 7 + 3) % mm.m AS dst FROM nodes, mm
        |  UNION ALL
        |  SELECT id, (id * 13 + 5) % mm.m FROM nodes, mm
        |  UNION ALL
        |  SELECT id, (id + 1) % mm.m FROM nodes, mm),
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM dir_e WHERE src <> dst),
        |wedges AS (
        |  SELECT e1.a AS wa, e2.b AS wc
        |  FROM und e1 JOIN und e2 ON e2.a = e1.b),
        |marked AS (
        |  SELECT w.wa, w.wc,
        |    CASE WHEN e3.a IS NULL THEN 0 ELSE 1 END AS closed
        |  FROM wedges w
        |  LEFT JOIN und e3 ON e3.a = w.wa AND e3.b = w.wc)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
        |  CAST(count(*) AS BIGINT) AS n_wedges,
        |  CAST(sum(closed) AS BIGINT) AS n_triangles
        |FROM marked""".stripMargin,

    // BPE pair counting replayed: per-occurrence within-word adjacent
    // character pairs, top-30 with (count desc, pair) order
    "q110_bpe_pairs" ->
      """WITH toks AS (
        |  SELECT w FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |  WHERE len(w) >= 2),
        |pairs AS (
        |  SELECT substr(w, CAST(i AS INTEGER) + 1, 2) AS pair
        |  FROM (SELECT w, unnest(range(len(w) - 1)) AS i FROM toks) t)
        |SELECT pair, CAST(count(*) AS BIGINT) AS cnt
        |FROM pairs GROUP BY pair
        |ORDER BY cnt DESC, pair LIMIT 30""".stripMargin,

    // normalization replayed: same rule chain (lower, non-alnum -> space,
    // collapse, trim), md5 fingerprint; 'g' flags for replace-all parity
    "q111_normalize" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS fp,
        |  CAST(len(text) - len(norm) AS INTEGER) AS delta
        |FROM n ORDER BY doc_id""".stripMargin,

    // substring-window duplication replayed: same normalization chain,
    // 40-char windows at stride 20, md5 window keys, distinct-doc census
    "q112_window_dup" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS nt
        |  FROM documents),
        |occ AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(substr(nt, CAST(i AS INTEGER) * 20 + 1, 40)),
        |      1, 15))::BIGINT AS wh
        |  FROM (SELECT doc_id, nt,
        |          unnest(range(((len(nt) - 40) // 20) + 1)) AS i
        |        FROM n WHERE len(nt) >= 40) t),
        |pd AS (SELECT wh, doc_id, CAST(count(*) AS BIGINT) AS c
        |       FROM occ GROUP BY wh, doc_id),
        |wd AS (SELECT wh, count(*) AS nd FROM pd GROUP BY wh)
        |SELECT pd.doc_id,
        |  CAST(sum(pd.c) AS INTEGER) AS n_windows,
        |  CAST(sum(CASE WHEN wd.nd >= 2 THEN pd.c ELSE 0 END) AS INTEGER)
        |    AS n_dup_windows
        |FROM pd JOIN wd ON wd.wh = pd.wh
        |GROUP BY pd.doc_id ORDER BY pd.doc_id""".stripMargin,

    // systematic sampling replayed: same md5 shuffle order, token-count
    // weights, greatest(total//100, 1) step, multiple-of-step pick rule
    "q113_systematic_sample" ->
      """WITH k AS (
        |  SELECT doc_id, md5('sys:' || doc_id) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w
        |  FROM documents),
        |tot AS (SELECT greatest(sum(w) // 100, 1) AS step FROM k),
        |c AS (
        |  SELECT doc_id, w,
        |    COALESCE(sum(w) OVER (ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM k)
        |SELECT doc_id, CAST(w AS INTEGER) AS n_tok,
        |  CAST((cb + w) // step AS INTEGER) AS tick
        |FROM c, tot
        |WHERE (cb + w) // step > cb // step
        |ORDER BY doc_id""".stripMargin,

    // OLS replayed: exact HUGEINT moment sums, then the identical IEEE
    // double op sequence (parenthesization mirrored term by term)
    "q114_ols" ->
      """WITH li AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM li GROUP BY l_returnflag),
        |d AS (
        |  SELECT l_returnflag, n,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny,
        |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
        |    CAST(sy AS DOUBLE) AS syd
        |  FROM s)
        |SELECT l_returnflag, n,
        |  CASE WHEN den <> 0
        |    THEN CAST(round(num / den * 1e6) AS BIGINT) END AS slope_micro,
        |  CASE WHEN den <> 0
        |    THEN CAST(round((syd * den - num * sxd) / (nd * den) * 1e6)
        |      AS BIGINT) END AS icept_micro,
        |  CASE WHEN den * deny <> 0
        |    THEN CAST(round(num * num / (den * deny) * 1e6) AS BIGINT) END
        |    AS r2_ppm
        |FROM d ORDER BY l_returnflag""".stripMargin,

    // TV drift replayed: integer cross-multiplied numerators, one double
    // divide for the ppb readout, top-25 by (dnum DESC, w)
    "q115_tv_drift" ->
      """WITH tok AS (
        |  SELECT (doc_id % 2 = 0) AS h0, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents) t
        |  WHERE len(w) > 0),
        |counts AS (
        |  SELECT w,
        |    CAST(sum(CASE WHEN h0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN NOT h0 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |  FROM tok GROUP BY w),
        |tot AS (SELECT CAST(sum(c0) AS BIGINT) AS n0,
        |               CAST(sum(c1) AS BIGINT) AS n1 FROM counts),
        |drift AS (
        |  SELECT w, c0, c1,
        |    abs(CAST(c0 AS HUGEINT) * n1 - CAST(c1 AS HUGEINT) * n0) AS dnum,
        |    n0, n1
        |  FROM counts, tot),
        |tvd AS (
        |  SELECT CAST(floor(CAST(sum(dnum) AS DOUBLE) * 1e9
        |    / (2.0 * CAST(max(n0) AS DOUBLE) * CAST(max(n1) AS DOUBLE)))
        |    AS BIGINT) AS tvd_ppb
        |  FROM drift)
        |SELECT w, c0, c1, CAST(dnum AS BIGINT) AS drift_num, tvd_ppb
        |FROM (SELECT * FROM drift ORDER BY dnum DESC, w LIMIT 25) d, tvd
        |ORDER BY drift_num DESC, w""".stripMargin,

    // profiler replayed: per-column rows/nulls/distincts (md5-keyed) and
    // min/max string reprs
    "q116_profile" ->
      """WITH pairs AS (
        |  SELECT 'doc_id' AS name, CAST(doc_id AS VARCHAR) AS v
        |  FROM documents
        |  UNION ALL SELECT 'text', text FROM documents
        |  UNION ALL SELECT 'lang', lang FROM documents
        |  UNION ALL SELECT 'source', source FROM documents
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR)
        |  FROM documents),
        |basic AS (
        |  SELECT name, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_null,
        |    min(v) AS min_v, max(v) AS max_v
        |  FROM pairs GROUP BY name),
        |d AS (
        |  SELECT name, CAST(count(*) AS BIGINT) AS n_distinct FROM (
        |    SELECT DISTINCT name, md5(v) FROM pairs WHERE v IS NOT NULL) t
        |  GROUP BY name)
        |SELECT basic.name, n_rows, n_null,
        |  COALESCE(n_distinct, 0) AS n_distinct, min_v, max_v
        |FROM basic LEFT JOIN d ON d.name = basic.name
        |ORDER BY basic.name""".stripMargin,

    // BPE apply replayed: same char lattice (double-space separators),
    // same ordered replace-all merge chain, top-30 by (cnt DESC, unit)
    "q118_bpe_apply" ->
      """WITH toks AS (
        |  SELECT w FROM (
        |    SELECT unnest(string_split(trim(regexp_replace(regexp_replace(
        |      lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '))
        |      AS w
        |    FROM documents) t
        |  WHERE len(w) > 0),
        |lat AS (
        |  SELECT replace(replace(replace(replace(replace(replace(replace(
        |    replace(
        |      regexp_replace(w, '(.)', ' \1 ', 'g'),
        |    ' t  h ', ' th '), ' i  n ', ' in '), ' e  r ', ' er '),
        |    ' a  n ', ' an '), ' o  n ', ' on '), ' r  e ', ' re '),
        |    ' t  i ', ' ti '), ' th  e ', ' the ') AS s
        |  FROM toks)
        |SELECT unit, CAST(count(*) AS BIGINT) AS cnt
        |FROM (SELECT unnest(string_split(trim(s), '  ')) AS unit FROM lat) u
        |GROUP BY unit ORDER BY cnt DESC, unit LIMIT 30""".stripMargin,

    // k-core peeling replayed: same synthesized edges, four chained
    // degree/filter CTE rounds at k=3
    "q119_kcore" ->
      """WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
        |raw AS (
        |  SELECT doc_id AS src, (doc_id * 7 + 3) % mx.m AS dst
        |  FROM documents, mx
        |  UNION ALL
        |  SELECT doc_id, (doc_id * 13 + 5) % mx.m FROM documents, mx
        |  UNION ALL
        |  SELECT doc_id, (doc_id + 1) % mx.m FROM documents, mx),
        |e0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |       FROM raw WHERE src <> dst),
        |d1 AS (SELECT n, count(*) AS deg FROM
        |  (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0) t GROUP BY n),
        |a1 AS (SELECT n FROM d1 WHERE deg >= 3),
        |e1 AS (SELECT e0.a, e0.b FROM e0
        |  JOIN a1 x ON x.n = e0.a JOIN a1 y ON y.n = e0.b),
        |d2 AS (SELECT n, count(*) AS deg FROM
        |  (SELECT a AS n FROM e1 UNION ALL SELECT b FROM e1) t GROUP BY n),
        |a2 AS (SELECT n FROM d2 WHERE deg >= 3),
        |e2 AS (SELECT e1.a, e1.b FROM e1
        |  JOIN a2 x ON x.n = e1.a JOIN a2 y ON y.n = e1.b),
        |d3 AS (SELECT n, count(*) AS deg FROM
        |  (SELECT a AS n FROM e2 UNION ALL SELECT b FROM e2) t GROUP BY n),
        |a3 AS (SELECT n FROM d3 WHERE deg >= 3),
        |e3 AS (SELECT e2.a, e2.b FROM e2
        |  JOIN a3 x ON x.n = e2.a JOIN a3 y ON y.n = e2.b),
        |d4 AS (SELECT n, count(*) AS deg FROM
        |  (SELECT a AS n FROM e3 UNION ALL SELECT b FROM e3) t GROUP BY n),
        |a4 AS (SELECT n FROM d4 WHERE deg >= 3),
        |e4 AS (SELECT e3.a, e3.b FROM e3
        |  JOIN a4 x ON x.n = e3.a JOIN a4 y ON y.n = e3.b)
        |SELECT * FROM (
        |  SELECT 1 AS round, (SELECT CAST(count(*) AS BIGINT) FROM a1)
        |    AS n_nodes, (SELECT CAST(count(*) AS BIGINT) FROM e1) AS n_edges
        |  UNION ALL SELECT 2, (SELECT count(*) FROM a2),
        |    (SELECT count(*) FROM e2)
        |  UNION ALL SELECT 3, (SELECT count(*) FROM a3),
        |    (SELECT count(*) FROM e3)
        |  UNION ALL SELECT 4, (SELECT count(*) FROM a4),
        |    (SELECT count(*) FROM e4)) t
        |ORDER BY round""".stripMargin,

    // integer half-life decay replayed: same ⌊age/7⌋ right-shift weights
    // (values are non-negative so // matches Spark's div truncation)
    "q120_decay" ->
      """WITH mx AS (SELECT max(CAST(ts AS DATE)) AS d0 FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(vc // (CAST(1 AS BIGINT) << k)) AS BIGINT)
        |    AS decayed_cents,
        |  CAST(sum(1000 // (CAST(1 AS BIGINT) << k)) AS BIGINT)
        |    AS decayed_n_milli
        |FROM (
        |  SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS vc,
        |    least(date_diff('day', CAST(ts AS DATE), d0) // 7, 62) AS k
        |  FROM events, mx) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // incremental CC: the oracle is the FULL-GRAPH recursive-CTE
    // closure — equality proves the base+delta rep-graph merge ≡
    // recompute (same proof shape as q108/q117)
    "q121_cc_incremental" ->
      s"""WITH RECURSIVE ${OracleUtil.blockGraphCtes},
        |${OracleUtil.ccClosureCtes}
        |SELECT cluster, CAST(count(*) AS BIGINT) AS size
        |FROM cl GROUP BY cluster ORDER BY cluster""".stripMargin,

    // ECDF decile binning replayed: same $100 bins, same first-row
    // cumulative-rank decile
    "q122_price_bands" ->
      """WITH li AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) // 10000 AS usd100
        |  FROM lineitem),
        |hist AS (SELECT l_returnflag, usd100, CAST(count(*) AS BIGINT) AS c
        |         FROM li GROUP BY 1, 2),
        |r AS (
        |  SELECT l_returnflag, usd100, c,
        |    sum(c) OVER (PARTITION BY l_returnflag) AS n,
        |    sum(c) OVER (PARTITION BY l_returnflag ORDER BY usd100) AS cum
        |  FROM hist)
        |SELECT l_returnflag, CAST(((cum - c) * 10) // n AS INTEGER) AS band,
        |  CAST(sum(c) AS BIGINT) AS n_rows,
        |  min(usd100) AS lo_usd100, max(usd100) AS hi_usd100
        |FROM r GROUP BY 1, 2 ORDER BY l_returnflag, band""".stripMargin,

    // late-data audit replayed: same per-user running max in event_id
    // order, 600 s tolerance, exact floor-second arithmetic
    "q123_late_data" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events),
        |m AS (
        |  SELECT event_type, sec,
        |    max(sec) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM e),
        |l AS (
        |  SELECT event_type,
        |    CASE WHEN prev_max - sec > 600 THEN prev_max - sec END AS late_s
        |  FROM m)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(late_s) AS BIGINT) AS n_late,
        |  COALESCE(max(late_s), 0) AS max_late_s
        |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin,

    // percentile state-merge: the oracle is the FULL RESCAN — equality
    // proves merge-refresh ≡ recompute for order statistics
    "q117_pctl_state_merge" ->
      """SELECT l_returnflag,
        |  CAST(count(l_quantity) AS BIGINT) AS n,
        |  round(quantile_cont(l_quantity, 0.25), 2) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 2) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 2) AS p75,
        |  round(quantile_cont(l_quantity, 0.95), 2) AS p95
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )
}
