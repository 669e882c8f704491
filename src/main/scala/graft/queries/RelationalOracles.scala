package graft.queries

/** DuckDB oracle SQL for [[Relational]] — same tables, same column names, same
  * row order. See the numeric-parity notes on [[Relational]]: integer-cents
  * aggregation, `trunc()` before int casts (DuckDB's cast rounds, Spark's
  * truncates), and no raw timestamp outputs.
  */
object RelationalOracles {
  val sql: Map[String, String] = Map(
    // prices through the cents ladder, like the Spark twin — HUGEINT sums
    // cast back to BIGINT before the double division
    "q01_grouped_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |    AS BIGINT) / 100.0, 2) AS sum_price,
        |  round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |    AS BIGINT) / 100.0 / count(*), 2) AS avg_price,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_broadcast_join" ->
      """SELECT r_name, count(*) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    // revenue through the 4-decimal integer ladder (see the Spark twin) —
    // HUGEINT sum cast back so pandas sees a plain integer column
    "q03_fact_join" ->
      """SELECT o_orderstatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |    * 10000) AS BIGINT)) AS BIGINT) / 10000.0, 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q04_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q05_left_outer_coalesce" ->
      """SELECT c_custkey, c_name,
        |  coalesce(cnt, 0) AS order_count,
        |  round(coalesce(sc, 0) / 100.0, 2) AS total_spent
        |FROM customer
        |LEFT JOIN (
        |  SELECT o_custkey, count(*) AS cnt,
        |         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sc
        |  FROM orders GROUP BY o_custkey) s ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q06_correlated_null" ->
      """SELECT c_custkey, deficit FROM (
        |  SELECT c_custkey,
        |    round((CAST(round(c_acctbal * 100, 0) AS BIGINT)
        |           - (SELECT CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |              FROM orders WHERE o_custkey = c_custkey)) / 100.0, 2) AS deficit
        |  FROM customer) d
        |WHERE deficit IS NOT NULL
        |ORDER BY c_custkey""".stripMargin,

    "q07_latest_value" ->
      """SELECT o_custkey, latest_orderkey, latest_price FROM (
        |  SELECT o_custkey, o_orderkey AS latest_orderkey,
        |         o_totalprice AS latest_price,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) x
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q08_row_number" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |                          ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS day_number
        |FROM orders
        |ORDER BY o_custkey, day_number""".stripMargin,

    "q09_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0, 0)
        |       AS INTEGER) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q10_union_header" ->
      """SELECT 0 AS ord, 'o_orderkey' AS k, 'o_orderstatus' AS status
        |UNION ALL
        |SELECT 1 AS ord, CAST(o_orderkey AS VARCHAR) AS k, o_orderstatus AS status
        |FROM orders
        |ORDER BY ord, k""".stripMargin,

    "q11_date_parts" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  strftime(o_orderdate, '%d-%b-%Y') AS date_label,
        |  strftime(o_orderdate, '%a') AS dow
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q12_date_sequence" ->
      """WITH mm AS (SELECT CAST(min(o_orderdate) AS DATE) AS d0,
        |                   CAST(max(o_orderdate) AS DATE) AS d1 FROM orders)
        |SELECT strftime(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |                                       CAST(d1 AS TIMESTAMP),
        |                                       INTERVAL 1 DAY)), '%Y-%m-%d') AS day
        |FROM mm ORDER BY day""".stripMargin,

    "q13_change_detection" ->
      """SELECT o_orderkey FROM (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS p
        |  FROM orders) n
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_orderkey = n.o_orderkey
        |                    AND o.o_totalprice = n.p)
        |ORDER BY o_orderkey""".stripMargin,

    "q14_upsert" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS price
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q15_explode_array" ->
      """SELECT vec_id,
        |  CAST(unnest(range(len(embedding))) AS INTEGER) AS pos,
        |  unnest(embedding) AS val
        |FROM embeddings ORDER BY vec_id, pos""".stripMargin,

    "q16_json_extract" ->
      """SELECT event_id, CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q17_date_between" ->
      """SELECT event_type, count(*) AS n,
        |  round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) / 100.0, 2) AS total
        |FROM events
        |WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00'
        |             AND TIMESTAMP '2024-01-20 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q18_topk" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10""".stripMargin,

    "q40_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q77_corr_suite" ->
      """SELECT l_returnflag,
        |  round(corr(CAST(l_quantity AS DOUBLE), l_extendedprice), 4)
        |    AS corr_qp,
        |  round(covar_pop(CAST(l_quantity AS DOUBLE), l_extendedprice), 4)
        |    AS covp_qp,
        |  round(covar_samp(CAST(l_quantity AS DOUBLE), l_extendedprice), 4)
        |    AS covs_qp,
        |  round(regr_slope(l_extendedprice, CAST(l_quantity AS DOUBLE)), 4)
        |    AS slope,
        |  round(regr_intercept(l_extendedprice,
        |    CAST(l_quantity AS DOUBLE)), 4) AS icept,
        |  round(regr_r2(l_extendedprice, CAST(l_quantity AS DOUBLE)), 4)
        |    AS r2,
        |  CAST(regr_count(l_extendedprice, CAST(l_quantity AS DOUBLE))
        |    AS BIGINT) AS n_pairs
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q76_rank_suite" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(rank() OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  CAST(round(percent_rank() OVER w * 10000) AS BIGINT)
        |    AS pct_rank_bp,
        |  CAST(round(cume_dist() OVER w * 10000) AS BIGINT) AS cume_bp,
        |  nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q41_string_suite" ->
      """SELECT c_custkey,
        |  upper(c_name) AS uname,
        |  substring(c_name, 1, 8) AS prefix,
        |  CAST(length(c_name) AS INTEGER) AS nlen,
        |  concat_ws('|', c_mktsegment, c_name) AS tagged,
        |  replace(c_name, 'Customer', 'Cst') AS shortened,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q42_stats_suite" ->
      """SELECT l_returnflag,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  count(CASE WHEN l_discount > 0.05 THEN 1 END) AS high_discount,
        |  min(l_quantity) AS min_qty,
        |  max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q43_null_suite" ->
      """SELECT o_custkey,
        |  count(*) AS n_rows,
        |  count(status_n) AS n_nonnull,
        |  count(CASE WHEN status_n IS NULL THEN 1 END) AS n_null,
        |  count(CASE WHEN status_n IS NOT DISTINCT FROM 'F' THEN 1 END) AS n_f_nullsafe,
        |  coalesce(max(status_n), 'none') AS max_status
        |FROM (SELECT o_custkey, nullif(o_orderstatus, 'O') AS status_n
        |      FROM orders) s
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q49_join_suite" ->
      """SELECT
        |  coalesce(s1.c_custkey, -1) AS open_customer,
        |  coalesce(s2.rich_key, -1) AS rich_customer
        |FROM (
        |  SELECT c_custkey FROM customer
        |  WHERE EXISTS (SELECT 1 FROM orders
        |                WHERE o_custkey = c_custkey AND o_orderstatus = 'O')) s1
        |FULL OUTER JOIN (
        |  SELECT c_custkey AS rich_key FROM customer WHERE c_acctbal > 5000) s2
        |ON s1.c_custkey = s2.rich_key
        |ORDER BY open_customer, rich_customer""".stripMargin,

    "q19_progress_report" ->
      """WITH latest AS (
        |  SELECT o_custkey, o_totalprice FROM (
        |    SELECT o_custkey, o_totalprice,
        |      row_number() OVER (PARTITION BY o_custkey
        |                         ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |    FROM orders) x WHERE rn = 1),
        |userstats AS (
        |  SELECT o_custkey AS custkey,
        |    CAST(round(1.2 * (10 * o_totalprice + 6.25 * 182 - 5 * 34 + 5) * 100, 0) AS BIGINT) AS rmr_cents
        |  FROM latest),
        |actual AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS actual_cents
        |  FROM lineitem GROUP BY l_orderkey),
        |burned AS (
        |  SELECT l_orderkey,
        |    CAST(round(sum(l_quantity) * 100, 0) AS BIGINT) AS burned_cents
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey),
        |base AS (
        |  SELECT o.o_custkey, o.o_orderkey, o.o_orderdate,
        |    CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS target_cents,
        |    u.rmr_cents, a.actual_cents,
        |    coalesce(b.burned_cents, 0) AS burned_cents
        |  FROM orders o
        |  JOIN userstats u ON o.o_custkey = u.custkey
        |  LEFT JOIN actual a ON o.o_orderkey = a.l_orderkey
        |  LEFT JOIN burned b ON o.o_orderkey = b.l_orderkey
        |  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND a.actual_cents IS NOT NULL),
        |win AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, target_cents, rmr_cents,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS day_number,
        |    target_cents - actual_cents + burned_cents AS deficit_cents,
        |    sum(coalesce(target_cents - actual_cents + burned_cents, 0))
        |      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS acc_cents
        |  FROM base)
        |SELECT o_custkey, day_number,
        |  strftime(o_orderdate, '%d-%b-%Y') AS date_label,
        |  target_cents / 100.0 AS target,
        |  rmr_cents / 100.0 AS rmr,
        |  CAST(trunc(deficit_cents / 100.0) AS INTEGER) AS deficit,
        |  CAST(round(acc_cents / 100.0, 0) AS INTEGER) AS deficit_accumulated
        |FROM win
        |ORDER BY o_custkey, day_number""".stripMargin,

    // the salt is join-internal, so the oracle is the PLAIN inner join —
    // identical results are the operator's correctness contract
    "q58_skew_join" ->
      """SELECT k, name, count(*) AS n,
        |  round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
        |        / 100.0, 2) AS revenue
        |FROM (SELECT CASE WHEN l_partkey % 10 = 0 THEN 0
        |             ELSE l_partkey % 100 END AS k,
        |             l_extendedprice
        |      FROM lineitem) big
        |JOIN (SELECT p_partkey - 1 AS k, p_name AS name
        |      FROM part WHERE p_partkey <= 100) small USING (k)
        |GROUP BY k, name
        |ORDER BY k""".stripMargin,

    // DuckDB's list() keeps CASE nulls and returns NULL over an empty
    // filtered set — FILTER + coalesce([]) matches Spark's collect_list
    "q59_array_suite" ->
      """SELECT o_custkey,
        |  CAST(len(ks) AS INTEGER) AS n_orders,
        |  ks[1] AS first_key,
        |  ks[-1] AS last_key,
        |  array_to_string(ks[1:3], ',') AS first3,
        |  CAST(len(list_intersect(ks, open_ks)) AS INTEGER) AS n_open,
        |  CAST(list_aggregate(ks, 'sum') AS BIGINT) AS key_sum
        |FROM (
        |  SELECT o_custkey,
        |    list_sort(list(o_orderkey)) AS ks,
        |    list_sort(coalesce(
        |      list(o_orderkey) FILTER (WHERE o_orderstatus = 'O'), [])) AS open_ks
        |  FROM orders GROUP BY o_custkey)
        |ORDER BY o_custkey""".stripMargin,

    // 'g' flag: DuckDB regexp_replace is first-match-only by default;
    // Spark replaces all occurrences
    "q60_regex_suite" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS noun,
        |  regexp_replace(p_brand, '[0-9]', '#', 'g') AS masked_brand,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS INTEGER)
        |    AS vowel_runs,
        |  CAST(regexp_matches(p_type, '^(PROMO|ECONOMY)') AS INTEGER)
        |    AS is_cheap
        |FROM part ORDER BY p_partkey""".stripMargin,

    // dayofweek: DuckDB is 0-based Sunday, Spark 1-based — shift by one
    "q61_time_suite" ->
      """SELECT o_orderkey,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        |  CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INTEGER)
        |    AS days_since,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q62_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       sum(l_quantity) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin,

    "q64_scd2" ->
      """SELECT o_custkey, o_orderkey,
        |  o_totalprice AS price,
        |  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |  coalesce(strftime(lead(o_orderdate, 1) OVER w, '%Y-%m-%d'),
        |           '9999-12-31') AS valid_to,
        |  CAST(lead(o_orderdate, 1) OVER w IS NULL AS INTEGER) AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // the bucketed layout never changes results — plain join oracle
    "q65_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // the Morton spread as a CTE chain of BIGINT mask-and-shift steps —
    // bit-identical to ZOrder.spread32 (masks are the 0x0000FFFF0000FFFF…
    // ladder in decimal). Inputs masked to 16 bits keep z < 2^33.
    "q66_zorder" ->
      """WITH base AS (
        |  SELECT l_orderkey, l_linenumber,
        |         (l_partkey & 65535) AS a, (l_suppkey & 65535) AS b
        |  FROM lineitem),
        |s1 AS (SELECT l_orderkey, l_linenumber,
        |  ((a | (a << 16)) & 281470681808895) AS a,
        |  ((b | (b << 16)) & 281470681808895) AS b FROM base),
        |s2 AS (SELECT l_orderkey, l_linenumber,
        |  ((a | (a << 8)) & 71777214294589695) AS a,
        |  ((b | (b << 8)) & 71777214294589695) AS b FROM s1),
        |s3 AS (SELECT l_orderkey, l_linenumber,
        |  ((a | (a << 4)) & 1085102592571150095) AS a,
        |  ((b | (b << 4)) & 1085102592571150095) AS b FROM s2),
        |s4 AS (SELECT l_orderkey, l_linenumber,
        |  ((a | (a << 2)) & 3689348814741910323) AS a,
        |  ((b | (b << 2)) & 3689348814741910323) AS b FROM s3),
        |s5 AS (SELECT l_orderkey, l_linenumber,
        |  ((a | (a << 1)) & 6148914691236517205) AS a,
        |  ((b | (b << 1)) & 6148914691236517205) AS b FROM s4)
        |SELECT l_orderkey, l_linenumber, (a | (b << 1)) AS z
        |FROM s5 ORDER BY z, l_orderkey, l_linenumber LIMIT 1000""".stripMargin,

    // the binning never changes results — plain inequality-join oracle
    "q68_range_join" ->
      """WITH r AS (
        |  SELECT o_orderkey,
        |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS lo
        |  FROM orders WHERE o_orderkey % 50 = 0),
        |p AS (
        |  SELECT datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
        |      AS d,
        |    l_quantity
        |  FROM lineitem),
        |m AS (
        |  SELECT o_orderkey, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM r JOIN p ON p.d BETWEEN r.lo AND r.lo + 7
        |  GROUP BY o_orderkey)
        |SELECT r.o_orderkey, coalesce(n, 0) AS n, coalesce(qty, 0) AS qty
        |FROM r LEFT JOIN m USING (o_orderkey) ORDER BY o_orderkey""".stripMargin,

    // brute-force inequality overlap join — DuckDB's optimizer handles the
    // small sampled sides; the Spark twin's bin-explode must match exactly
    "q74_interval_overlap" ->
      """WITH a AS (
        |  SELECT o_orderkey AS k1,
        |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS lo1
        |  FROM orders WHERE o_orderkey % 100 = 0),
        |aa AS (SELECT k1, lo1, lo1 + 14 AS hi1 FROM a),
        |b AS (
        |  SELECT o_orderkey AS k2,
        |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS lo2
        |  FROM orders WHERE o_orderkey % 100 = 1),
        |bb AS (SELECT k2, lo2, lo2 + 10 AS hi2 FROM b)
        |SELECT k1, count(*) AS n_overlap,
        |  CAST(sum(least(hi1, hi2) - greatest(lo1, lo2) + 1) AS BIGINT)
        |    AS overlap_days
        |FROM aa JOIN bb ON lo1 <= hi2 AND lo2 <= hi1
        |GROUP BY k1 ORDER BY k1""".stripMargin,

    // all four set semantics in one labeled result — INTERSECT/EXCEPT ALL
    // keep multiset multiplicity, which the sorted hash compare verifies
    "q71_setops" ->
      """WITH f AS (SELECT o_custkey AS custkey FROM orders
        |           WHERE o_orderstatus = 'F'),
        |o AS (SELECT o_custkey AS custkey FROM orders
        |      WHERE o_orderstatus = 'O')
        |SELECT 'intersect' AS set_kind, custkey FROM
        |  (SELECT custkey FROM f INTERSECT SELECT custkey FROM o)
        |UNION ALL
        |SELECT 'except', custkey FROM
        |  (SELECT custkey FROM f EXCEPT SELECT custkey FROM o)
        |UNION ALL
        |SELECT 'intersect_all', custkey FROM
        |  (SELECT custkey FROM f INTERSECT ALL SELECT custkey FROM o)
        |UNION ALL
        |SELECT 'except_all', custkey FROM
        |  (SELECT custkey FROM f EXCEPT ALL SELECT custkey FROM o)
        |ORDER BY set_kind, custkey""".stripMargin,

    // nested-object + array JSON paths over an identically-formatted
    // document (integer cents — no double formatting in the round-trip)
    "q72_json_path" ->
      """WITH j AS (
        |  SELECT event_id,
        |    '{"t":"' || event_type ||
        |    '","m":{"u":' || CAST(user_id AS VARCHAR) ||
        |    ',"c":' || CAST(CAST(round(value * 100, 0) AS BIGINT) AS VARCHAR) ||
        |    '},"ids":[' || CAST(event_id AS VARCHAR) ||
        |    ',' || CAST(user_id AS VARCHAR) || ']}' AS js
        |  FROM events)
        |SELECT event_id,
        |  json_extract_string(js, '$.t') AS t,
        |  CAST(json_extract(js, '$.m.u') AS BIGINT) AS u,
        |  CAST(json_extract(js, '$.m.c') AS BIGINT) AS c,
        |  CAST(json_extract(js, '$.ids[0]') AS BIGINT) AS first_id
        |FROM j ORDER BY event_id""".stripMargin
  )
}
