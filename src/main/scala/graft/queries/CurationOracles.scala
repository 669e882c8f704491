package graft.queries

/** DuckDB twins for [[Curation]] — same integer arithmetic, same window
  * frames, same tie-breaks, column names matched so the driver's
  * sort-columns-then-hash compare is exact. */
object CurationOracles {

  /** One synchronous min-label-propagation round: `cur` from `prev` over
    * the shared `sym` edge CTE (neighbors of v are {a | sym(a, b=v)}) —
    * generated so the four q134 rounds cannot drift from each other. */
  private def lpRound(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT l.id, least(l.label, coalesce(min(n.label), l.label)) AS label
       |  FROM $prev l
       |  LEFT JOIN sym s ON s.b = l.id
       |  LEFT JOIN $prev n ON n.id = s.a
       |  GROUP BY l.id, l.label)""".stripMargin

  /** One deterministic-random-walk step for q137: the same portable-hash
    * argmin draw the engine packs into a decimal HashAggregate, replayed
    * as a row_number over (md5Head60(walk:id:step:candidate), candidate). */
  private def walkStep(prev: String, cur: String, step: Int): String =
    s"""$cur AS (
       |  SELECT walk_id, $step AS step, node FROM (
       |    SELECT w.walk_id, s.b AS node,
       |      row_number() OVER (PARTITION BY w.walk_id ORDER BY
       |        ${OracleUtil.md5Head60(
              s"'walk:' || CAST(w.walk_id AS VARCHAR) || ':$step:' || CAST(s.b AS VARCHAR)")},
       |        s.b) AS rn
       |    FROM $prev w JOIN sym s ON s.a = w.node) x
       |  WHERE rn = 1)""".stripMargin

  /** The IVF-PQ index build (the q125 recipe): fixed-point vectors,
    * md5-seeded cells + integer-L2 assignment, md5-seeded codebooks +
    * per-subspace argmin encode — ends in `codes(id, s, code)` with
    * `asg(id, cid)`, `cd`, `elf`, `dist` available. ONE text behind
    * q125/q146/q147. */
  private val pqIndexCtes: String =
    s"""q AS (
       |  SELECT vec_id AS id,
       |    ${OracleUtil.fixedPointVec()} AS qv
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |cells AS (
       |  SELECT id AS cid, qv AS cv FROM q
       |  ORDER BY ${OracleUtil.md5Head60("'ivf:' || CAST(id AS VARCHAR)")}, id
       |  LIMIT 16),
       |elf AS (
       |  SELECT id, CAST(unnest(range(len(qv))) AS INTEGER) AS pos,
       |    unnest(qv) AS v
       |  FROM q),
       |clf AS (
       |  SELECT cid, CAST(unnest(range(len(cv))) AS INTEGER) AS pos,
       |    unnest(cv) AS v
       |  FROM cells),
       |cd AS (
       |  SELECT elf.id, clf.cid,
       |    CAST(sum((elf.v - clf.v) * (elf.v - clf.v)) AS BIGINT) AS d2
       |  FROM elf JOIN clf ON clf.pos = elf.pos
       |  GROUP BY elf.id, clf.cid),
       |asg AS (
       |  SELECT id, cid FROM (
       |    SELECT id, cid,
       |      row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
       |    FROM cd) x
       |  WHERE rn = 1),
       |seeds AS (
       |  SELECT id AS ccid, qv AS cv FROM q
       |  ORDER BY ${OracleUtil.md5Head60("'pq:' || CAST(id AS VARCHAR)")}, id
       |  LIMIT 16),
       |sub_q AS (
       |  SELECT id, s, qv[s*4+1 : s*4+4] AS sub
       |  FROM q CROSS JOIN (SELECT unnest(range(16)) AS s) ss),
       |sub_c AS (
       |  SELECT ccid, s, cv[s*4+1 : s*4+4] AS csub
       |  FROM seeds CROSS JOIN (SELECT unnest(range(16)) AS s) ss),
       |els AS (
       |  SELECT id, s, CAST(unnest(range(len(sub))) AS INTEGER) AS pos,
       |    unnest(sub) AS v
       |  FROM sub_q),
       |cels AS (
       |  SELECT ccid, s, CAST(unnest(range(len(csub))) AS INTEGER) AS pos,
       |    unnest(csub) AS v
       |  FROM sub_c),
       |dist AS (
       |  SELECT els.id, cels.ccid, els.s,
       |    CAST(sum((els.v - cels.v) * (els.v - cels.v)) AS BIGINT) AS d2
       |  FROM els JOIN cels ON els.pos = cels.pos AND els.s = cels.s
       |  GROUP BY els.id, cels.ccid, els.s),
       |codes AS (
       |  SELECT id, s, ccid AS code FROM (
       |    SELECT id, s, ccid,
       |      row_number() OVER (PARTITION BY id, s ORDER BY d2, ccid) AS rn
       |    FROM dist) x
       |  WHERE rn = 1)""".stripMargin

  /** The stored-grid/stored-codebook INGEST census (the q155 recipe),
    * parameterized on the batch modulus so the keyed-upsert (q155) and
    * append (q163) twins share one text. */
  private def pqIngestSql(mod: Int): String =
    s"""WITH $pqIndexCtes,
         |off AS (SELECT max(vec_id) + 1 AS o FROM embeddings),
         |nq AS (
         |  SELECT vec_id + o AS id,
         |    ${OracleUtil.fixedPointVec("list_transform(embedding, y -> -y)")}
         |      AS qv
         |  FROM embeddings, off
         |  WHERE embedding IS NOT NULL AND vec_id % $mod = 0),
         |nelf AS (
         |  SELECT id, CAST(unnest(range(len(qv))) AS INTEGER) AS pos,
         |    unnest(qv) AS v
         |  FROM nq),
         |ncd AS (
         |  SELECT nelf.id, clf.cid,
         |    CAST(sum((nelf.v - clf.v) * (nelf.v - clf.v)) AS BIGINT) AS d2
         |  FROM nelf JOIN clf ON clf.pos = nelf.pos
         |  GROUP BY nelf.id, clf.cid),
         |nasg AS (
         |  SELECT id, cid FROM (
         |    SELECT id, cid,
         |      row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
         |    FROM ncd) x
         |  WHERE rn = 1),
         |nsub AS (
         |  SELECT id, s, qv[s*4+1 : s*4+4] AS sub
         |  FROM nq CROSS JOIN (SELECT unnest(range(16)) AS s) ss),
         |nels AS (
         |  SELECT id, s, CAST(unnest(range(len(sub))) AS INTEGER) AS pos,
         |    unnest(sub) AS v
         |  FROM nsub),
         |ndist AS (
         |  SELECT nels.id, cels.ccid, nels.s,
         |    CAST(sum((nels.v - cels.v) * (nels.v - cels.v)) AS BIGINT) AS d2
         |  FROM nels JOIN cels ON nels.pos = cels.pos AND nels.s = cels.s
         |  GROUP BY nels.id, cels.ccid, nels.s),
         |ncodes AS (
         |  SELECT id, s, ccid AS code FROM (
         |    SELECT id, s, ccid,
         |      row_number() OVER (PARTITION BY id, s ORDER BY d2, ccid) AS rn
         |    FROM ndist) x
         |  WHERE rn = 1),
         |allc AS (
         |  SELECT a.cid, c.id, c.code FROM codes c JOIN asg a USING (id)
         |  UNION ALL
         |  SELECT na.cid, nc.id, nc.code
         |  FROM ncodes nc JOIN nasg na USING (id))
         |SELECT cid, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(id) AS BIGINT) AS sum_ids,
         |  CAST(sum(code) AS BIGINT) AS sum_codes
         |FROM allc GROUP BY cid ORDER BY cid""".stripMargin

  /** [[pqIndexCtes]] + probe/ADC/rerank for queries matching `pred` at
    * `nProbe` probed cells — the full q125-shaped search readout. */
  private def pqSearchSql(pred: String, nProbe: Int): String =
    s"""WITH $pqIndexCtes,
       |probes AS (
       |  SELECT id AS qid, cid FROM (
       |    SELECT id, cid,
       |      row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
       |    FROM cd WHERE $pred) x
       |  WHERE rn <= $nProbe),
       |members AS (
       |  SELECT p.qid, a.id FROM asg a JOIN probes p ON p.cid = a.cid),
       |adc AS (
       |  SELECT m.qid, m.id, CAST(sum(t.d2) AS BIGINT) AS adc
       |  FROM members m JOIN codes c ON c.id = m.id
       |  JOIN dist t ON t.id = m.qid AND t.s = c.s AND t.ccid = c.code
       |  GROUP BY m.qid, m.id),
       |shortlist AS (
       |  SELECT qid, id, adc FROM (
       |    SELECT qid, id, adc,
       |      row_number() OVER (PARTITION BY qid ORDER BY adc, id) AS arank
       |    FROM adc) x
       |  WHERE arank <= 30),
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
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** The sparse-retrieval scoring pipeline (TfIdf.sparseCosineTopK's
    * twin): integer reciprocal-df weights, df-capped candidacy for query
    * docs satisfying `pred` (over alias `q`), exact HUGEINT dot/norm
    * rescore — ends in `sscored(qid, nid, sim2_ppm)`. ONE text shared by
    * q136 and q138's hybrid fusion so the recipes cannot drift. */
  /** The tf → df → integer-weight prefix ending in `sw(id, term, df, w)`
    * + `sn2(id, n2)` — split from the scoring so q150's stored-index
    * census can replay the build alone. */
  private val sparseWeightCtes: String =
    """stoks AS (
       |  SELECT doc_id AS id, unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |stf AS (SELECT id, term, count(*) AS tf FROM stoks GROUP BY id, term),
       |sdf AS (SELECT term, count(*) AS df FROM stf GROUP BY term),
       |sw AS (
       |  SELECT id, stf.term, df, tf * (10000 // df) AS w
       |  FROM stf JOIN sdf ON stf.term = sdf.term),
       |sn2 AS (
       |  SELECT id, sum(CAST(w AS HUGEINT) * w) AS n2 FROM sw GROUP BY id)""".stripMargin

  /** The %29 stale-IDF append census — ONE text behind the append (q162)
    * and compaction (q165) twins, the [[AnalyticsOracles]] ivfIngestSql
    * discipline for the text store. */
  private val sparseAppendSql: String =
    s"""WITH $sparseWeightCtes,
       |off AS (SELECT max(doc_id) + 1 AS o FROM documents),
       |nstoks AS (
       |  SELECT doc_id,
       |    unnest(string_split(text || ' xfreshtok xfreshtok', ' '))
       |      AS term
       |  FROM documents WHERE doc_id % 29 = 0),
       |ntf AS (
       |  SELECT s.doc_id + o.o AS id, term, count(*) AS tf
       |  FROM nstoks s CROSS JOIN off o GROUP BY s.doc_id + o.o, term),
       |bdf AS (SELECT term, max(df) AS df FROM sw GROUP BY term),
       |nw AS (
       |  SELECT ntf.term, id, coalesce(bdf.df, 1) AS df,
       |    tf * (10000 // coalesce(bdf.df, 1)) AS w
       |  FROM ntf LEFT JOIN bdf ON bdf.term = ntf.term),
       |allw AS (
       |  SELECT term, id, df, w FROM sw
       |  UNION ALL SELECT term, id, df, w FROM nw)
       |SELECT df, CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
       |  CAST(count(*) AS BIGINT) AS n_postings,
       |  CAST(sum(w) AS BIGINT) AS sum_w
       |FROM allw GROUP BY df ORDER BY df""".stripMargin

  private def sparseScoredCtes(pred: String): String =
    s"""$sparseWeightCtes,
       |srare AS (SELECT * FROM sw WHERE df BETWEEN 2 AND 400),
       |scand AS (
       |  SELECT DISTINCT q.id AS qid, c.id AS nid
       |  FROM srare q JOIN srare c ON q.term = c.term
       |  WHERE $pred AND q.id <> c.id),
       |sdt AS (
       |  SELECT scand.qid, scand.nid,
       |    sum(CAST(wq.w AS HUGEINT) * wn.w) AS dot
       |  FROM scand
       |  JOIN sw wq ON wq.id = scand.qid
       |  JOIN sw wn ON wn.id = scand.nid AND wn.term = wq.term
       |  GROUP BY scand.qid, scand.nid),
       |sscored AS (
       |  SELECT sdt.qid, sdt.nid,
       |    CAST(sdt.dot * sdt.dot * 1000000 // (a.n2 * b.n2) AS BIGINT)
       |      AS sim2_ppm
       |  FROM sdt
       |  JOIN sn2 a ON a.id = sdt.qid
       |  JOIN sn2 b ON b.id = sdt.nid)""".stripMargin

  val sql: Map[String, String] = Map(

    // interval coalescing replayed: same (st, en) synthesis, same running-
    // max-end sweep, same two-level rollup
    "q124_interval_coalesce" ->
      """WITH iv AS (
        |  SELECT o_custkey AS k,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT)
        |      AS st,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT)
        |      + 1 + o_orderkey % 14 AS en
        |  FROM orders),
        |m AS (
        |  SELECT k, st, en,
        |    max(en) OVER (PARTITION BY k ORDER BY st, en
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        |f AS (
        |  SELECT k, st, en,
        |    CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END AS opens
        |  FROM m),
        |g AS (
        |  SELECT k, st, en,
        |    sum(opens) OVER (PARTITION BY k ORDER BY st, en
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
        |  FROM f),
        |segs AS (
        |  SELECT k, seg, min(st) AS s0, max(en) AS e1,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM g GROUP BY k, seg)
        |SELECT k AS o_custkey,
        |  CAST(sum(n) AS INTEGER) AS n_intervals,
        |  CAST(count(*) AS INTEGER) AS n_segments,
        |  CAST(sum(e1 - s0) AS BIGINT) AS covered_days
        |FROM segs GROUP BY k ORDER BY o_custkey""".stripMargin,

    // IVF-PQ replayed end to end: same fixed-point vectors, md5-seeded
    // cells ('ivf:') and codebooks ('pq:'), integer-L2 cell assignment and
    // probe ranking, per-subspace argmin encode, ADC restricted to probed-
    // cell members, exact integer rerank — q88's oracle with the routing
    // CTEs in front; parameterized so the stored-index twins (q146 census,
    // q147 search) replay the identical build without duplicating text
    "q125_knn_ivf_pq" -> pqSearchSql("id < 8", nProbe = 4),

    // stored-PQ build census: the engine persists cells/codebooks/codes
    // and reads its per-cell census BACK from disk; the twin recomputes
    // the identical build from the raw corpus — equality proves the
    // stored code rows hold exactly the encode + assignment
    "q146_ivf_pq_build_stored" ->
      s"""WITH $pqIndexCtes
         |SELECT a.cid, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(c.id) AS BIGINT) AS sum_ids,
         |  CAST(sum(c.code) AS BIGINT) AS sum_codes
         |FROM codes c JOIN asg a USING (id)
         |GROUP BY a.cid ORDER BY a.cid""".stripMargin,

    // stored-PQ search at q147's own query set — the engine reads the
    // prebuilt structures, the twin recomputes them
    "q147_ivf_pq_search_stored" ->
      pqSearchSql("id >= 8 AND id < 16", nProbe = 4),

    // stored inverted-index build census: per-df term/posting/weight
    // totals of the persisted lists vs the recomputed weight build
    "q150_sparse_build_stored" ->
      s"""WITH $sparseWeightCtes
         |SELECT df, CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
         |  CAST(count(*) AS BIGINT) AS n_postings,
         |  CAST(sum(w) AS BIGINT) AS sum_w
         |FROM sw GROUP BY df ORDER BY df""".stripMargin,

    // stale-IDF ingest census: the batch's weights computed against the
    // BUILD df (unseen terms df=1), unioned into the per-df census —
    // existing rows keep their build-time weights, the production
    // between-refreshes contract
    "q152_sparse_extend_stored" ->
      s"""WITH $sparseWeightCtes,
         |off AS (SELECT max(doc_id) + 1 AS o FROM documents),
         |nstoks AS (
         |  SELECT doc_id,
         |    unnest(string_split(text || ' xnewtok xnewtok', ' ')) AS term
         |  FROM documents WHERE doc_id % 17 = 0),
         |ntf AS (
         |  SELECT s.doc_id + o.o AS id, term, count(*) AS tf
         |  FROM nstoks s CROSS JOIN off o GROUP BY s.doc_id + o.o, term),
         |bdf AS (SELECT term, max(df) AS df FROM sw GROUP BY term),
         |nw AS (
         |  SELECT ntf.term, id, coalesce(bdf.df, 1) AS df,
         |    tf * (10000 // coalesce(bdf.df, 1)) AS w
         |  FROM ntf LEFT JOIN bdf ON bdf.term = ntf.term),
         |allw AS (
         |  SELECT term, id, df, w FROM sw
         |  UNION ALL SELECT term, id, df, w FROM nw)
         |SELECT df, CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
         |  CAST(count(*) AS BIGINT) AS n_postings,
         |  CAST(sum(w) AS BIGINT) AS sum_w
         |FROM allw GROUP BY df ORDER BY df""".stripMargin,

    // incremental PQ ingest: the q145 clone batch (every 13th vector
    // negated, ids offset by max+1) encoded against the BASE build's
    // codebooks and assigned to its cell grid — no re-train — and
    // unioned into the per-cell code census
    "q155_ivf_pq_extend_stored" -> pqIngestSql(13),

    // O(batch) PQ append: the identical ingest-census replay at the %31
    // batch — append and keyed upsert must be disk-indistinguishable
    // for genuinely-new ids
    "q163_ivf_pq_append_stored" -> pqIngestSql(31),

    // PQ compaction census: the fold back into the clustered layout must
    // preserve every code row — same oracle as the append it follows
    "q166_ivf_pq_compact_stored" -> pqIngestSql(31),

    // text stats-refresh rebuild census: a from-scratch weight build over
    // the MERGED corpus (fresh df everywhere — unlike the stale-IDF
    // ingest twins, where the batch rides the build-time df), which the
    // engine must reach from its stored tf rows without corpus access
    "q168_sparse_rebuild_stored" ->
      s"""WITH off AS (SELECT max(doc_id) + 1 AS o FROM documents),
         |mdocs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + o AS doc_id, text || ' xrebtok xrebtok' AS text
         |  FROM documents, off WHERE doc_id % 37 = 0),
         |stoks AS (
         |  SELECT doc_id AS id, unnest(string_split(text, ' ')) AS term
         |  FROM mdocs),
         |stf AS (SELECT id, term, count(*) AS tf FROM stoks GROUP BY id, term),
         |sdf AS (SELECT term, count(*) AS df FROM stf GROUP BY term),
         |sw AS (
         |  SELECT id, stf.term, df, tf * (10000 // df) AS w
         |  FROM stf JOIN sdf ON stf.term = sdf.term)
         |SELECT df, CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
         |  CAST(count(*) AS BIGINT) AS n_postings,
         |  CAST(sum(w) AS BIGINT) AS sum_w
         |FROM sw GROUP BY df ORDER BY df""".stripMargin,


    // PQ deletion census: the base build's code rows minus the deleted
    // ids — the engine physically dropped them from the stored bands
    "q156_ivf_pq_delete_stored" ->
      s"""WITH $pqIndexCtes
         |SELECT a.cid, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(c.id) AS BIGINT) AS sum_ids,
         |  CAST(sum(c.code) AS BIGINT) AS sum_codes
         |FROM codes c JOIN asg a USING (id)
         |WHERE c.id % 19 <> 2
         |GROUP BY a.cid ORDER BY a.cid""".stripMargin,

    // text-index deletion census: the build's weight rows minus the
    // forgotten docs' — surviving rows keep their build-time df/weights
    // (the stale-df contract), so the twin just filters the build
    "q157_sparse_delete_stored" ->
      s"""WITH $sparseWeightCtes
         |SELECT df, CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
         |  CAST(count(*) AS BIGINT) AS n_postings,
         |  CAST(sum(w) AS BIGINT) AS sum_w
         |FROM sw WHERE id % 13 <> 0
         |GROUP BY df ORDER BY df""".stripMargin,

    // stored-index hybrid fusion: q138's recipe — both arms replayed
    // from the SHARED texts (dense: the q144-parameterized IVF candidate
    // chain; sparse: sparseScoredCtes) at q158's own query set and probe
    // width, fused by integer reciprocal-rank
    "q158_hybrid_stored_rrf" ->
      s"""WITH ${AnalyticsOracles.vecCtes},
        |${AnalyticsOracles.ivfCandCtesFor(
             "v.vec_id >= 16 AND v.vec_id < 24", 12)},
        |${AnalyticsOracles.rerankCtes},
        |dense AS (SELECT qid, nid, rank FROM ranked WHERE rank <= 5),
        |${sparseScoredCtes("q.id >= 16 AND q.id < 24")},
        |sparse AS (
        |  SELECT qid, nid, rank FROM (
        |    SELECT qid, nid,
        |      row_number() OVER (PARTITION BY qid
        |        ORDER BY sim2_ppm DESC, nid) AS rank
        |    FROM sscored) x
        |  WHERE rank <= 5),
        |fused AS (
        |  SELECT coalesce(d.qid, s.qid) AS qid,
        |    coalesce(d.nid, s.nid) AS nid,
        |    coalesce(1000000 // (60 + d.rank), 0)
        |      + coalesce(1000000 // (60 + s.rank), 0) AS rrf_micro
        |  FROM dense d
        |  FULL OUTER JOIN sparse s ON s.qid = d.qid AND s.nid = d.nid)
        |SELECT qid, CAST(rank AS INTEGER) AS rank, nid,
        |  CAST(rrf_micro AS BIGINT) AS rrf_micro FROM (
        |  SELECT qid, nid, rrf_micro,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY rrf_micro DESC, nid) AS rank
        |  FROM fused) x
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // O(batch) text append: the q152 stale-IDF census semantics at the
    // %29 batch recipe — append and keyed upsert must be
    // indistinguishable on disk for genuinely-new doc ids
    "q162_sparse_append_stored" -> sparseAppendSql,

    // text compaction census: the fold back into the clustered layout
    // must preserve every posting row — same oracle as the append it
    // follows
    "q165_sparse_compact_stored" -> sparseAppendSql,

    // stored sparse search at q151's own query set — the SHARED scoring
    // text at a different pred
    "q151_sparse_search_stored" ->
      s"""WITH ${sparseScoredCtes("q.id % 89 = 3")}
        |SELECT qid, CAST(rank AS INTEGER) AS rank, nid, sim2_ppm FROM (
        |  SELECT qid, nid, sim2_ppm,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY sim2_ppm DESC, nid) AS rank
        |  FROM sscored) x
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // token-gated sparse serving at q170's own constant-size query
    // window — the engine's O(1)-token path must lose nothing vs the
    // recomputed pipeline
    "q170_sparse_token_search" ->
      s"""WITH ${sparseScoredCtes("q.id >= 40 AND q.id < 46")}
        |SELECT qid, CAST(rank AS INTEGER) AS rank, nid, sim2_ppm FROM (
        |  SELECT qid, nid, sim2_ppm,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY sim2_ppm DESC, nid) AS rank
        |  FROM sscored) x
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // token-gated PQ serving at q171's own query window
    "q171_ivf_pq_token_search" ->
      pqSearchSql("id >= 16 AND id < 24", nProbe = 4),

    // composed curation ladder replayed: the q67 quality gate over the
    // cloned corpus, min-id exact dedup, then the SHARED SemDeDup CTEs
    // over the survivors' embeddings; per-doc verdict joined back
    "q127_curation_pass" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents), text
         |  FROM documents
         |  WHERE doc_id % 7 = 0),
         |scored AS (
         |  SELECT doc_id, text,
         |    len(string_split(text,' ')) AS n,
         |    len(list_filter(string_split(text,' '), x -> x = 'the'))
         |      + len(list_filter(string_split(text,' '), x -> x = 'a')) AS en,
         |    len(list_filter(string_split(text,' '), x -> x = 'data'))
         |      + len(list_filter(string_split(text,' '), x -> x = 'table')) AS es,
         |    len(list_filter(string_split(text,' '), x -> x = 'group'))
         |      + len(list_filter(string_split(text,' '), x -> x = 'fast')) AS de
         |  FROM corpus),
         |qual AS (
         |  SELECT doc_id, text FROM scored
         |  WHERE NOT (en = 0 AND es = 0 AND de = 0) AND en >= es AND en >= de
         |    AND CAST(trunc((CASE WHEN n BETWEEN 20 AND 80 THEN 2 ELSE 1 END)
         |          * (n - en) * 10000.0 / (n * 2)) AS INTEGER) >= 5000),
         |exact AS (
         |  SELECT text, min(doc_id) AS keeper FROM qual GROUP BY text),
         |q AS (
         |  SELECT e.vec_id AS id,
         |    ${OracleUtil.fixedPointVec("e.embedding")} AS qv
         |  FROM embeddings e
         |  WHERE e.embedding IS NOT NULL
         |    AND e.vec_id IN (SELECT keeper FROM exact)),
         |${OracleUtil.semanticDedupCtes},
         |sem AS (
         |  SELECT a.id, a.cid, coalesce(d.n_dups_lower, 0) AS ndl
         |  FROM asg a LEFT JOIN dups d ON d.id = a.id)
         |SELECT c.doc_id,
         |  CASE WHEN e.keeper IS NULL THEN 'quality_drop'
         |       WHEN e.keeper <> c.doc_id THEN 'exact_dup'
         |       WHEN s.ndl > 0 THEN 'semantic_dup'
         |       ELSE 'kept' END AS stage,
         |  s.cid AS sem_cid, s.ndl AS n_dups_lower
         |FROM corpus c
         |LEFT JOIN exact e ON e.text = c.text
         |LEFT JOIN sem s ON s.id = c.doc_id
         |ORDER BY c.doc_id""".stripMargin,

    // deterministic weighted priority sampling replayed: same md5
    // priority, same integer floor division, same per-stratum top-10
    "q128_priority_sample" ->
      s"""WITH p AS (
         |  SELECT source, doc_id, n_chars AS weight,
         |    ${OracleUtil.md5Head60("'ps:' || CAST(doc_id AS VARCHAR)")}
         |      // n_chars AS priority
         |  FROM documents),
         |r AS (
         |  SELECT source, doc_id, weight, priority,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY priority, doc_id) AS INTEGER) AS rank
         |  FROM p)
         |SELECT source, rank, doc_id, weight, priority FROM r
         |WHERE rank <= 10 ORDER BY source, rank""".stripMargin,

    // bigram-LM surprisal replayed: positional dual-unnest zip, the SAME
    // 60-bit md5 bigram/head keys the engine shuffles, and the same
    // HUGEINT-widened (≡ decimal(38,0)) micro-unit floor divisions
    "q126_bigram_lm" ->
      s"""WITH tok AS (
        |  SELECT doc_id,
        |    CAST(unnest(range(len(string_split(text,' ')))) AS INTEGER)
        |      AS pos,
        |    unnest(string_split(text,' ')) AS w
        |  FROM documents),
        |bg AS (
        |  SELECT a.doc_id,
        |    ${OracleUtil.md5Head60("a.w || ' ' || b.w")} AS hbg,
        |    ${OracleUtil.md5Head60("a.w")} AS h1
        |  FROM tok a JOIN tok b
        |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
        |per_doc AS (
        |  SELECT doc_id, hbg, CAST(count(*) AS BIGINT) AS c
        |  FROM bg GROUP BY doc_id, hbg),
        |c2 AS (
        |  SELECT hbg, h1, CAST(count(*) AS BIGINT) AS c2
        |  FROM bg GROUP BY hbg, h1),
        |c1 AS (SELECT h1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY h1),
        |model AS (
        |  SELECT hbg, CAST(CAST(c1 AS HUGEINT) * 1000000 // c2.c2 AS BIGINT)
        |    AS sm
        |  FROM c2 JOIN c1 ON c1.h1 = c2.h1)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |  CAST(sum(CAST(c AS HUGEINT) * sm) // sum(c) AS BIGINT)
        |    AS mean_surprisal_micro
        |FROM per_doc JOIN model ON model.hbg = per_doc.hbg
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // BFS replayed as the bounded recursive closure; min(dist) per node is
    // first-reach depth, unreached docs fold in as dist -1. The edge
    // synthesis is the SHARED blockGraphCtes text (one copy for q121 and
    // q129, so the recipes cannot drift independently).
    "q129_bfs" ->
      s"""WITH RECURSIVE ${OracleUtil.blockGraphCtes},
        |bfs(id, dist) AS (
        |  SELECT doc_id, 0 FROM documents WHERE doc_id % 97 = 0
        |  UNION
        |  SELECT sym.b, bfs.dist + 1
        |  FROM bfs JOIN sym ON sym.a = bfs.id WHERE bfs.dist < 4),
        |md AS (SELECT id, CAST(min(dist) AS INTEGER) AS dist
        |       FROM bfs GROUP BY id),
        |alld AS (
        |  SELECT id, dist FROM md
        |  UNION ALL
        |  SELECT doc_id, -1 FROM documents
        |  WHERE doc_id NOT IN (SELECT id FROM md))
        |SELECT dist, CAST(count(*) AS BIGINT) AS n,
        |  min(id) AS min_id, max(id) AS max_id,
        |  CAST(sum(id) AS BIGINT) AS sum_id
        |FROM alld GROUP BY dist ORDER BY dist""".stripMargin,

    // transition matrix replayed: same (ts, event_id) order, same
    // HUGEINT-widened (≡ decimal(38,0)) ppb floor
    "q130_markov_transitions" ->
      """WITH tr AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS c
        |  FROM tr WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
        |tot AS (SELECT from_type, CAST(sum(c) AS BIGINT) AS n
        |        FROM c GROUP BY from_type)
        |SELECT c.from_type, to_type, c,
        |  CAST(CAST(c AS HUGEINT) * 1000000000 // n AS BIGINT) AS p_ppb
        |FROM c JOIN tot ON tot.from_type = c.from_type
        |ORDER BY c.from_type, to_type""".stripMargin,

    // last-touch attribution replayed: same (ts, event_id) order, same
    // aligned IGNORE-NULLS carried pair, same floor-second 3600 s cutoff
    "q131_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS value_c,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events),
        |m AS (
        |  SELECT event_id, event_type, value_c, sec,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |      THEN event_type END IGNORE NULLS) OVER w AS t_type,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |      THEN sec END IGNORE NULLS) OVER w AS t_sec
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |a AS (
        |  SELECT CASE WHEN t_sec IS NOT NULL AND sec - t_sec <= 3600
        |              THEN t_type ELSE 'none' END AS touch_type,
        |    value_c
        |  FROM m WHERE event_type = 'purchase')
        |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_conversions,
        |  CAST(sum(value_c) AS BIGINT) AS sum_value_c
        |FROM a GROUP BY touch_type ORDER BY touch_type""".stripMargin,

    // pareto frontier replayed: same cents bins, same max-size collapse,
    // same strict running-max sweep
    "q132_pareto_frontier" ->
      """WITH bp AS (
        |  SELECT p_brand,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
        |    max(p_size) AS max_size
        |  FROM part GROUP BY p_brand, price_c),
        |m AS (
        |  SELECT p_brand, price_c, max_size,
        |    max(max_size) OVER (PARTITION BY p_brand ORDER BY price_c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM bp)
        |SELECT p_brand, price_c, max_size FROM m
        |WHERE pmax IS NULL OR max_size > pmax
        |ORDER BY p_brand, price_c""".stripMargin,

    // star flatten replayed: the same 6-way join and cents checksums
    "q133_star_flatten" ->
      """SELECT r_name, l_returnflag, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_c,
        |  CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_retail_c,
        |  CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_acctbal_c
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation ON n_nationkey = c_nationkey
        |JOIN region ON r_regionkey = n_regionkey
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |GROUP BY r_name, l_returnflag, o_orderpriority
        |ORDER BY r_name, l_returnflag, o_orderpriority""".stripMargin,

    // 4 synchronous min-label rounds over the shared edge synthesis, then
    // the per-label community census
    "q134_label_prop" ->
      s"""WITH ${OracleUtil.blockGraphCtes},
        |l0 AS (SELECT doc_id AS id, doc_id AS label FROM documents),
        |${lpRound("l0", "l1")},
        |${lpRound("l1", "l2")},
        |${lpRound("l2", "l3")},
        |${lpRound("l3", "l4")}
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |  min(id) AS min_id, max(id) AS max_id,
        |  CAST(sum(id) AS BIGINT) AS sum_id
        |FROM l4 GROUP BY label ORDER BY label""".stripMargin,

    // the full ORDER BY the engine's two-pass selection avoids: the k-th
    // smallest cent value at k = 1 + floor(p·(n-1))
    "q135_exact_quantiles" ->
      """WITH v AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        |  FROM lineitem),
        |nn AS (SELECT count(*) AS n FROM v),
        |t(p_bp) AS (VALUES (2500), (5000), (9000), (9900)),
        |k AS (
        |  SELECT CAST(p_bp AS INTEGER) AS p_bp,
        |    1 + p_bp * (n - 1) // 10000 AS rank
        |  FROM t CROSS JOIN nn),
        |r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v)
        |SELECT k.p_bp, k.rank, r.c AS value_cents
        |FROM k JOIN r ON r.rn = k.rank ORDER BY k.p_bp""".stripMargin,

    // sparse cosine retrieval replayed: same integer reciprocal-df
    // weights, same df-capped candidate join, same HUGEINT (≡ decimal
    // (38,0)) dot/norm arithmetic and truncated cos²·10⁶ score — the
    // pipeline is the shared sparseScoredCtes text (q138 replays it too)
    "q136_sparse_retrieval" ->
      s"""WITH ${sparseScoredCtes("q.id % 97 = 0")}
        |SELECT qid, CAST(rank AS INTEGER) AS rank, nid, sim2_ppm FROM (
        |  SELECT qid, nid, sim2_ppm,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY sim2_ppm DESC, nid) AS rank
        |  FROM sscored) x
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // deterministic walks replayed: 3 chained argmin draws over the
    // shared edge synthesis
    "q137_random_walks" ->
      s"""WITH ${OracleUtil.blockGraphCtes},
        |w0 AS (
        |  SELECT doc_id AS walk_id, 0 AS step, doc_id AS node
        |  FROM documents WHERE doc_id % 61 = 0),
        |${walkStep("w0", "s1", 1)},
        |${walkStep("s1", "s2", 2)},
        |${walkStep("s2", "s3", 3)}
        |SELECT walk_id, CAST(step AS INTEGER) AS step, node FROM (
        |  SELECT * FROM w0 UNION ALL SELECT * FROM s1
        |  UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3) u
        |ORDER BY walk_id, step""".stripMargin,

    // hybrid retrieval: BOTH pipelines replayed from their shared texts
    // (the dense side is q39's exact CTE chain out of AnalyticsOracles,
    // the sparse side is q136's sparseScoredCtes) and fused by integer
    // reciprocal-rank — coalesced 10⁶ div (60 + rank) per list
    "q138_hybrid_rrf" ->
      s"""WITH ${AnalyticsOracles.vecCtes},
        |${AnalyticsOracles.ivfCandCtes},
        |${AnalyticsOracles.rerankCtes},
        |dense AS (SELECT qid, nid, rank FROM ranked WHERE rank <= 5),
        |${sparseScoredCtes("q.id < 8")},
        |sparse AS (
        |  SELECT qid, nid, rank FROM (
        |    SELECT qid, nid,
        |      row_number() OVER (PARTITION BY qid
        |        ORDER BY sim2_ppm DESC, nid) AS rank
        |    FROM sscored) x
        |  WHERE rank <= 5),
        |fused AS (
        |  SELECT coalesce(d.qid, s.qid) AS qid,
        |    coalesce(d.nid, s.nid) AS nid,
        |    coalesce(1000000 // (60 + d.rank), 0)
        |      + coalesce(1000000 // (60 + s.rank), 0) AS rrf_micro
        |  FROM dense d
        |  FULL OUTER JOIN sparse s ON s.qid = d.qid AND s.nid = d.nid)
        |SELECT qid, CAST(rank AS INTEGER) AS rank, nid,
        |  CAST(rrf_micro AS BIGINT) AS rrf_micro FROM (
        |  SELECT qid, nid, rrf_micro,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY rrf_micro DESC, nid) AS rank
        |  FROM fused) x
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // hard negatives replayed: the SHARED IVF index + candidate + rerank
    // texts give the anchor top-5 (exactly q39's) and the cell
    // assignment; the negative draw is the md5 order over same-cell
    // non-top-5 members
    "q139_hard_negatives" ->
      s"""WITH ${AnalyticsOracles.vecCtes},
        |${AnalyticsOracles.ivfCandCtes},
        |${AnalyticsOracles.rerankCtes},
        |top5 AS (SELECT qid, nid FROM ranked WHERE rank <= 5),
        |negcand AS (
        |  SELECT qa.vec_id AS qid, na.vec_id AS nid, qa.cid
        |  FROM asg qa JOIN asg na ON na.cid = qa.cid
        |  WHERE qa.vec_id < 8 AND na.vec_id <> qa.vec_id),
        |negs AS (
        |  SELECT nc.qid, nc.nid, nc.cid
        |  FROM negcand nc
        |  LEFT JOIN top5 t ON t.qid = nc.qid AND t.nid = nc.nid
        |  WHERE t.qid IS NULL)
        |SELECT qid, CAST(rank AS INTEGER) AS rank, nid, cid FROM (
        |  SELECT qid, nid, cid,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      ${OracleUtil.md5Head60(
             "'neg:' || CAST(qid AS VARCHAR) || ':' || CAST(nid AS VARCHAR)")},
        |      nid) AS rank
        |  FROM negs) x
        |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

    // personalized PageRank replayed: the shared link-graph text and the
    // SAME generated rounds as q103, with the restart term confined to
    // the seed set
    "q140_personalized_pagerank" -> {
      val seedBase = "CASE WHEN n.is_seed = 1 THEN 150000 ELSE 0 END"
      s"""WITH ${AnalyticsOracles.linkGraphCtes},
        |sd AS (
        |  SELECT id, CASE WHEN id % 97 = 0 THEN 1 ELSE 0 END AS is_seed
        |  FROM nodes),
        |r0 AS (
        |  SELECT id, CASE WHEN id % 97 = 0 THEN CAST(1000000 AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS r
        |  FROM nodes),
        |${AnalyticsOracles.prRound("r0", 1, "sd", seedBase)},
        |${AnalyticsOracles.prRound("r1", 2, "sd", seedBase)},
        |${AnalyticsOracles.prRound("r2", 3, "sd", seedBase)}
        |SELECT id, r FROM r3 ORDER BY id""".stripMargin
    },

    // perceptual-hash near-dup replayed: same 9×8 byte grid, same 63-bit
    // derivative hash, and the SAME pigeonhole banding (4 × 16-bit
    // chunks, the simhashBandStructs layout for h ≤ 3) with the SAME
    // 400-cap — the cap changes which pairs are in scope, so the twin
    // must replay it, not brute-force all pairs
    "q141_phash_neardup" ->
      """WITH corpus AS (
        |  SELECT doc_id AS id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
        |    'x' || substring(text, 2)
        |  FROM documents WHERE doc_id % 7 = 0),
        |media AS (
        |  SELECT id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n
        |  FROM corpus
        |  WHERE octet_length(encode(text)) >= 1),
        |grid AS (SELECT CAST(unnest(range(63)) AS BIGINT) AS bit),
        |samples AS (
        |  SELECT id, bit,
        |    ('0x' || substring(hx,
        |      CAST(2 * (((bit // 7) * 8 + bit % 7) * (n - 1) // 71) + 1
        |           AS INT), 2))::BIGINT AS g1,
        |    ('0x' || substring(hx,
        |      CAST(2 * (((bit // 7) * 8 + bit % 7 + 1) * (n - 1) // 71) + 1
        |           AS INT), 2))::BIGINT AS g2
        |  FROM media CROSS JOIN grid),
        |dh AS (
        |  SELECT id,
        |    CAST(sum(CASE WHEN g1 > g2 THEN (1::BIGINT << bit) ELSE 0 END)
        |         AS BIGINT) AS h
        |  FROM samples GROUP BY id),
        |bands AS (
        |  SELECT id, h, b, (h >> CAST(16 * b AS INT)) & 65535 AS bv
        |  FROM dh CROSS JOIN
        |    (SELECT CAST(unnest(range(4)) AS BIGINT) AS b) bb),
        |keep AS (
        |  SELECT b, bv FROM bands GROUP BY b, bv HAVING count(*) <= 400),
        |kb AS (
        |  SELECT bands.id, bands.h, bands.b, bands.bv
        |  FROM bands JOIN keep USING (b, bv))
        |SELECT DISTINCT x.id AS id1, y.id AS id2,
        |  CAST(bit_count(xor(x.h, y.h)) AS INTEGER) AS hamming
        |FROM kb x JOIN kb y ON x.b = y.b AND x.bv = y.bv AND x.id < y.id
        |WHERE bit_count(xor(x.h, y.h)) <= 3
        |ORDER BY id1, id2""".stripMargin,

    // leakage-safe split replayed: the SHARED recursive CC closure gives
    // every doc's cluster rep, the md5 split draw rides the rep
    "q142_leakage_safe_split" ->
      s"""WITH RECURSIVE ${OracleUtil.blockGraphCtes},
        |${OracleUtil.ccClosureCtes},
        |sp AS (
        |  SELECT id, cluster,
        |    CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM (
        |    SELECT id, cluster,
        |      ${OracleUtil.md5Head60("'split:' || CAST(cluster AS VARCHAR)")} % 10
        |        AS b
        |    FROM cl) x)
        |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters,
        |  CAST(sum(id) AS BIGINT) AS sum_id
        |FROM sp GROUP BY split ORDER BY split""".stripMargin
  )
}
