package graft.queries

/** DuckDB twins for [[Curation]] — same integer arithmetic, same window
  * frames, same tie-breaks, column names matched so the driver's
  * sort-columns-then-hash compare is exact. */
object CurationOracles {
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
        |ORDER BY r_name, l_returnflag, o_orderpriority""".stripMargin
  )
}
