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

  /** The q121/q129 link-graph synthesis ([[Analytics.blockEdges]]):
    * canonical undirected edges `e0(a, b)` (a < b) plus the symmetrized
    * `sym(a, b)` both directions. The dst membership semi-join is
    * load-bearing — see blockEdges' scaladoc (phantom tail-block ids). */
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
