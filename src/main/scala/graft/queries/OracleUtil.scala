package graft.queries

/** SQL fragments shared across the oracle files — one definition per
  * recipe, so an engine-side change can't silently drift one oracle copy
  * while another keeps the stale text (the q121/q129 edge synthesis was
  * duplicated verbatim before this object existed).
  */
private[queries] object OracleUtil {

  /** DuckDB twin of [[graft.plans.PortableHashKernel.md5Head60]] over a
    * SQL expression: value of the first 15 hex chars of md5 as a
    * non-negative BIGINT. */
  def md5Head60(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  /** DuckDB twin of the engine's fixed-point embedding quantization
    * ([[graft.operators.Similarity]].fixedPoint — round(x·scale) as long;
    * float→double promotion is value-exact and both engines round ties
    * away from zero, so the longs are bit-equal). ONE copy — five oracle
    * replays quantize this way and the recipe must never drift per-file. */
  def fixedPointVec(expr: String = "embedding",
                    scale: Long = 1000000L): String =
    s"list_transform($expr,\n      x -> CAST(round(CAST(x AS DOUBLE) * $scale) AS BIGINT))"

  /** The q121/q129 link-graph synthesis ([[Analytics.blockEdges]]):
    * canonical undirected edges `e0(a, b)` (a < b) plus the symmetrized
    * `sym(a, b)` both directions. The dst membership semi-join is
    * load-bearing — see blockEdges' scaladoc (phantom tail-block ids). */
  /** SemDeDup decision replay ([[graft.operators.Similarity.semanticDedup]]
    * at scale 1e6, targetCell 64, minK 8, threshold 45%): given a prior
    * CTE `q(id, qv)` of fixed-point long vectors, defines the adaptive-K
    * seed draw, √K super-cell routing, cell assignment `asg(id, cid)` and
    * lower-id near-dup census `dups(id, n_dups_lower)`. ONE copy shared by
    * q95 (full corpus) and q127 (curation survivors) so the two replays
    * cannot drift. */
  val semanticDedupCtes: String =
    s"""kk AS (
       |  SELECT GREATEST(8, CAST(ceil(count(*) / 64.0) AS BIGINT)) AS k
       |  FROM q),
       |ranked AS (
       |  SELECT id, qv, row_number() OVER (ORDER BY
       |    ${md5Head60("'sem:' || CAST(id AS VARCHAR)")}, id) AS rn
       |  FROM q),
       |seeds AS (
       |  SELECT id AS cid, qv AS cv FROM ranked
       |  WHERE rn <= (SELECT k FROM kk)),
       |supers AS (
       |  SELECT id AS sid, qv AS sv FROM ranked
       |  WHERE rn <= (SELECT CAST(ceil(sqrt(k)) AS BIGINT) FROM kk)),
       |el AS (
       |  SELECT id, CAST(unnest(range(len(qv))) AS INTEGER) AS pos,
       |    unnest(qv) AS v
       |  FROM q),
       |cel AS (
       |  SELECT cid, CAST(unnest(range(len(cv))) AS INTEGER) AS pos,
       |    unnest(cv) AS v
       |  FROM seeds),
       |sel AS (
       |  SELECT sid, CAST(unnest(range(len(sv))) AS INTEGER) AS pos,
       |    unnest(sv) AS v
       |  FROM supers),
       |sasg AS (
       |  SELECT cid, sid FROM (
       |    SELECT cel.cid, sel.sid,
       |      row_number() OVER (PARTITION BY cel.cid ORDER BY
       |        sum((cel.v - sel.v) * (cel.v - sel.v)), sel.sid) AS rn
       |    FROM cel JOIN sel ON sel.pos = cel.pos
       |    GROUP BY cel.cid, sel.sid) x
       |  WHERE rn = 1),
       |qsasg AS (
       |  SELECT id, sid FROM (
       |    SELECT el.id, sel.sid,
       |      row_number() OVER (PARTITION BY el.id ORDER BY
       |        sum((el.v - sel.v) * (el.v - sel.v)), sel.sid) AS rn
       |    FROM el JOIN sel ON sel.pos = el.pos
       |    GROUP BY el.id, sel.sid) x
       |  WHERE rn = 1),
       |dist AS (
       |  SELECT el.id, cel.cid,
       |    CAST(sum((el.v - cel.v) * (el.v - cel.v)) AS BIGINT) AS d2
       |  FROM el JOIN qsasg ON qsasg.id = el.id
       |  JOIN sasg ON sasg.sid = qsasg.sid
       |  JOIN cel ON cel.cid = sasg.cid AND cel.pos = el.pos
       |  GROUP BY el.id, cel.cid),
       |asg AS (
       |  SELECT id, cid FROM (
       |    SELECT id, cid,
       |      row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
       |    FROM dist) x
       |  WHERE rn = 1),
       |n2 AS (
       |  SELECT id, CAST(sum(v * v) AS BIGINT) AS n2
       |  FROM el GROUP BY id),
       |dots AS (
       |  SELECT ax.id AS id1, ay.id AS id2,
       |    CAST(sum(ex.v * ey.v) AS BIGINT) AS dot
       |  FROM asg ax JOIN asg ay ON ax.cid = ay.cid AND ax.id < ay.id
       |  JOIN el ex ON ex.id = ax.id
       |  JOIN el ey ON ey.id = ay.id AND ey.pos = ex.pos
       |  GROUP BY ax.id, ay.id),
       |near AS (
       |  SELECT d.id1, d.id2 FROM dots d
       |  JOIN n2 a ON a.id = d.id1 JOIN n2 b ON b.id = d.id2
       |  WHERE d.dot > 0 AND
       |    CAST(d.dot AS HUGEINT) * CAST(d.dot AS HUGEINT) * 10000
       |      >= CAST(a.n2 AS HUGEINT) * CAST(b.n2 AS HUGEINT) * 2025),
       |dups AS (
       |  SELECT id2 AS id, count(*) AS n_dups_lower FROM near GROUP BY id2)""".stripMargin

  /** Connected components over the blockGraph `sym` edges as a recursive
    * closure ending in `cl(id, cluster)` — min reachable id per doc,
    * isolated docs their own singleton. Shared by q121 (refresh ≡
    * recompute proof) and q142 (leakage-safe split assignment). Requires
    * WITH RECURSIVE and [[blockGraphCtes]] in scope. */
  val ccClosureCtes: String =
    """reach AS (
      |  SELECT doc_id AS id, doc_id AS r FROM documents
      |  UNION
      |  SELECT sym.b AS id, reach.r FROM reach JOIN sym ON sym.a = reach.id),
      |cl AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)""".stripMargin

  val blockGraphCtes: String =
    """e0 AS (
      |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |  FROM (
      |    SELECT doc_id AS src,
      |      (doc_id - (doc_id % 8)) + (doc_id * 5 + 1) % 8 AS dst
      |    FROM documents WHERE doc_id % 3 <> 0) t
      |  WHERE src <> dst
      |    AND dst IN (SELECT doc_id FROM documents)),
      |sym AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0)""".stripMargin
}
