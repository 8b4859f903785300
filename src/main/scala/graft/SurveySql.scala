package graft

/** The 69-query operator contract from SURVEY.md §2 / survey/queries.json.
  *
  * GENERATED from survey/queries.json (validated 69/69 exact-match Spark
  * 4.1.2 vs DuckDB 1.0.0 on sf0.01, 2026-08-12), then amended round 2:
  * decimal OUTPUT columns carry a final CAST(... AS DOUBLE) on both sides
  * (driver's pandas compare renders DuckDB decimals as float64), array
  * outputs are string-joined, and join_asof gained the event_id DESC
  * equal-ts tie-break. Exact decimal math is unchanged — the casts apply
  * to the final projection only. survey/queries.json was re-synced from
  * this file round 3 (tools/DumpSql + tools/sync step), so the
  * machine-readable source and the embedded contract agree again.
  *
  * `spark` holds the reference Spark-SQL semantics each DataFrame-API
  * implementation in graft.ops must reproduce exactly (used by the
  * differential test suite); `duck` holds the DuckDB oracle SQL exported
  * via [[SparkEntry.oracleSql]] for the driver's correctness gate.
  */
object SurveySql {
  val spark: Map[String, String] = Map(
    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500""",
    "scan_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS d
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-03-01 00:00:00'
ORDER BY l_orderkey, l_linenumber""",
    "project_compute" ->
      """SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1000""",
    "filter_compound" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders
WHERE (o_orderstatus = 'F' OR o_totalprice > 200000.0)
  AND o_orderpriority IN ('1-URGENT','2-HIGH')
  AND o_orderkey BETWEEN 100 AND 12000
ORDER BY o_orderkey""",
    "filter_like_null" ->
      """SELECT p_partkey, p_name, NULLIF(p_brand, 'Brand#1') AS b
FROM part
WHERE p_name LIKE '%green%' AND p_type NOT LIKE 'SMALL%'
ORDER BY p_partkey""",
    "distinct_rows" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority
FROM orders ORDER BY o_orderstatus, o_orderpriority""",
    "join_inner" ->
      """SELECT o.o_orderkey, c.c_name, CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS p
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
ORDER BY o.o_orderkey LIMIT 2000""",
    "join_broadcast" ->
      """SELECT l.l_orderkey, l.l_linenumber, p.p_brand
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size <= 5
ORDER BY l.l_orderkey, l.l_linenumber LIMIT 2000""",
    "join_left" ->
      """SELECT c.c_custkey, COUNT(o.o_orderkey) AS n
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey ORDER BY c.c_custkey""",
    "join_full_outer" ->
      """SELECT COALESCE(a.k, b.k) AS k, a.na, b.nb
FROM (SELECT c_nationkey AS k, COUNT(*) AS na FROM customer GROUP BY c_nationkey) a
FULL OUTER JOIN (SELECT s_nationkey AS k, COUNT(*) AS nb FROM supplier GROUP BY s_nationkey) b
ON a.k = b.k
ORDER BY k""",
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
ORDER BY c_custkey""",
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey""",
    "join_theta" ->
      """SELECT s.s_suppkey, c.c_custkey
FROM supplier s JOIN customer c
  ON s.s_nationkey = c.c_nationkey AND s.s_acctbal < c.c_acctbal
ORDER BY s.s_suppkey, c.c_custkey LIMIT 5000""",
    "join_cross" ->
      """SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
ORDER BY r.r_name, n.n_name""",
    "join_multiway" ->
      """SELECT n.n_name, COUNT(*) AS cnt,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name ORDER BY n.n_name""",
    "join_asof" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     s AS (SELECT event_id AS s_event_id, user_id, ts AS s_ts, value AS s_value
           FROM events WHERE event_type = 'signup')
SELECT event_id, user_id, s_ts, CAST(CAST(s_value AS DECIMAL(18,2)) AS DOUBLE) AS s_value FROM (
  SELECT p.event_id, p.user_id, s.s_ts, s.s_value,
         ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY s.s_ts DESC, s.s_event_id DESC) AS rn
  FROM p JOIN s ON p.user_id = s.user_id AND p.ts >= s.s_ts
) WHERE rn = 1
ORDER BY event_id""",
    "join_interval" ->
      """SELECT a.event_id AS click_id, b.event_id AS purchase_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '30' MINUTE
ORDER BY click_id, purchase_id""",
    "agg_hash_q1" ->
      """SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc,
       COUNT(*) AS cnt
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",
    "agg_avg" ->
      """SELECT c_mktsegment,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_bal,
       COUNT(*) AS n
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "agg_minmax" ->
      """SELECT o_orderpriority,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mn,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mx,
       MIN(CAST(o_orderdate AS DATE)) AS dmn,
       MAX(CAST(o_orderdate AS DATE)) AS dmx
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "agg_count_distinct" ->
      """SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS nations,
       COUNT(DISTINCT c_nationkey / 5) AS regions_approx
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "agg_having" ->
      """SELECT o_custkey, COUNT(*) AS n
FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 20
ORDER BY o_custkey""",
    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS q
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "agg_stddev" ->
      """SELECT c_mktsegment, ROUND(STDDEV_SAMP(c_acctbal), 2) AS sd, ROUND(VAR_SAMP(c_acctbal), 1) AS vr
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "agg_collect_list" ->
      """SELECT l_orderkey,
       array_join(transform(sort_array(collect_list(l_linenumber)), x -> CAST(x AS STRING)), ',') AS lines
FROM lineitem WHERE l_orderkey < 200
GROUP BY l_orderkey ORDER BY l_orderkey""",
    "win_row_number" ->
      """SELECT c_custkey, c_mktsegment, rn FROM (
  SELECT c_custkey, c_mktsegment,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey) AS rn
  FROM customer) t
WHERE rn <= 10 ORDER BY c_mktsegment, rn""",
    "win_rank_dense" ->
      """SELECT p_brand, p_size,
       RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS rk,
       DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS drk
FROM part ORDER BY p_brand, p_size, rk LIMIT 1000""",
    "win_lag_lead" ->
      """SELECT user_id, event_id,
       LAG(event_id) OVER w AS prev_id,
       LEAD(event_id) OVER w AS next_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id LIMIT 3000""",
    "win_running_sum" ->
      """SELECT o_custkey, o_orderkey,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS DOUBLE) AS run
FROM orders ORDER BY o_custkey, o_orderkey LIMIT 3000""",
    "win_sliding_avg" ->
      """SELECT o_custkey, o_orderkey,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / COUNT(*) OVER w, 4) AS mavg
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey LIMIT 3000""",
    "win_range_frame" ->
      """SELECT o_orderkey,
       COUNT(*) OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2))
                      RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS near_cnt
FROM orders ORDER BY o_orderkey LIMIT 2000""",
    "win_ntile_cume" ->
      """SELECT c_custkey, NTILE(4) OVER w AS quart,
       ROUND(CUME_DIST() OVER w, 6) AS cd,
       ROUND(PERCENT_RANK() OVER w, 6) AS pr
FROM customer WINDOW w AS (ORDER BY c_custkey)
ORDER BY c_custkey LIMIT 1000""",
    "win_first_last" ->
      """SELECT user_id, event_id,
       FIRST_VALUE(event_type) OVER w AS first_ev,
       LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id LIMIT 3000""",
    "topk_per_group" ->
      """SELECT c_nationkey, c_custkey, bal FROM (
  SELECT c_nationkey, c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey) AS rn
  FROM customer) t
WHERE rn <= 3 ORDER BY c_nationkey, bal DESC, c_custkey""",
    "sort_multi" ->
      """SELECT s_suppkey, s_nationkey, CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
FROM supplier
ORDER BY s_nationkey ASC, bal DESC, s_suppkey ASC""",
    "limit_offset" ->
      """SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100""",
    "topk_global" ->
      """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS p
FROM orders ORDER BY p DESC, o_orderkey LIMIT 25""",
    "set_union_all" ->
      """SELECT k, v FROM (
  SELECT c_custkey AS k, 'c' AS v FROM customer WHERE c_nationkey = 1
  UNION ALL
  SELECT s_suppkey AS k, 's' AS v FROM supplier WHERE s_nationkey = 1) t
ORDER BY k, v""",
    "set_union_distinct" ->
      """SELECT k FROM (
  SELECT c_nationkey AS k FROM customer
  UNION
  SELECT s_nationkey AS k FROM supplier) t
ORDER BY k""",
    "set_intersect" ->
      """SELECT c_nationkey AS k FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
ORDER BY k""",
    "set_except" ->
      """SELECT c_nationkey AS k FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
ORDER BY k""",
    "fn_string" ->
      """SELECT p_partkey,
       UPPER(p_brand) AS u, LOWER(p_type) AS lo,
       SUBSTRING(p_name, 1, 8) AS sub,
       TRIM(CONCAT('  ', p_brand, '  ')) AS tr,
       REPLACE(p_type, ' ', '_') AS rep,
       LENGTH(p_name) AS len,
       LPAD(CAST(p_size AS STRING), 4, '0') AS pad
FROM part ORDER BY p_partkey LIMIT 500""",
    "fn_regexp" ->
      """SELECT p_partkey, REGEXP_REPLACE(p_name, '[aeiou]', '*') AS starred
FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""",
    "fn_date" ->
      """SELECT o_orderkey,
       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mon,
       EXTRACT(YEAR FROM o_orderdate) AS y,
       EXTRACT(MONTH FROM o_orderdate) AS m,
       EXTRACT(DAY FROM o_orderdate) AS d,
       CAST(o_orderdate + INTERVAL '90' DAY AS DATE) AS due
FROM orders ORDER BY o_orderkey LIMIT 2000""",
    "fn_math" ->
      """SELECT o_orderkey,
       CAST(ABS(CAST(o_totalprice AS DECIMAL(18,2)) - 150000.00) AS DOUBLE) AS dist,
       CAST(CEIL(o_totalprice / 1000.0) AS BIGINT) AS ceil_k,
       CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT) AS floor_k,
       MOD(o_orderkey, 7) AS m7,
       ROUND(SQRT(o_orderkey), 6) AS rt
FROM orders ORDER BY o_orderkey LIMIT 2000""",
    "fn_case_coalesce" ->
      """SELECT o_orderkey,
       CASE WHEN o_totalprice > 250000.0 THEN 'big'
            WHEN o_totalprice > 100000.0 THEN 'mid'
            ELSE 'small' END AS bucket,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS st,
       GREATEST(o_orderkey, o_custkey) AS g,
       LEAST(o_orderkey, o_custkey) AS l
FROM orders ORDER BY o_orderkey LIMIT 2000""",
    "fn_cast" ->
      """SELECT c_custkey,
       CAST(c_custkey AS STRING) AS s,
       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS STRING) AS bal_s,
       CAST(SUBSTRING(CAST(c_custkey AS STRING), 1, 2) AS INT) AS pre
FROM customer ORDER BY c_custkey LIMIT 500""",
    "fn_json" ->
      """SELECT event_id, CAST(get_json_object(props, '$.k') AS BIGINT) AS k
FROM events ORDER BY event_id LIMIT 3000""",
    "fn_array" ->
      """SELECT vec_id, size(embedding) AS dim,
       ROUND(CAST(element_at(embedding, 1) AS DOUBLE), 6) AS first_el,
       ROUND(aggregate(embedding, CAST(0.0 AS DOUBLE), (s, x) -> s + CAST(x AS DOUBLE)), 4) AS vsum
FROM embeddings ORDER BY vec_id""",
    "stream_tumbling" ->
      """SELECT window.start AS ws, event_type, COUNT(*) AS cnt,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sv
FROM (SELECT window(ts, '1 hour') AS window, event_type, value FROM events) t
GROUP BY window.start, event_type ORDER BY ws, event_type""",
    "stream_sliding" ->
      """SELECT window.start AS ws, COUNT(*) AS cnt
FROM (SELECT window(ts, '1 hour', '15 minutes') AS window FROM events) t
GROUP BY window.start ORDER BY ws""",
    "stream_session" ->
      """SELECT user_id, session_window.start AS ss, COUNT(*) AS cnt
FROM events
GROUP BY user_id, session_window(ts, '30 minutes')
ORDER BY user_id, ss""",
    "stream_dedup" ->
      """SELECT user_id, event_type, MIN(event_id) AS first_id
FROM events GROUP BY user_id, event_type
ORDER BY user_id, event_type""",
    "text_tokenize" ->
      """SELECT token, COUNT(*) AS cnt
FROM (SELECT explode(split(text, ' ')) AS token FROM documents WHERE lang = 'en') t
WHERE token <> ''
GROUP BY token ORDER BY cnt DESC, token LIMIT 50""",
    "text_stats" ->
      """SELECT lang, COUNT(*) AS docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars,
       MIN(n_chars) AS mn, MAX(n_chars) AS mx
FROM documents GROUP BY lang ORDER BY lang""",
    "text_tfidf" ->
      """WITH tokens AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, explode(split(text, ' ')) AS token FROM documents) t WHERE token <> ''),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tokens GROUP BY doc_id, token),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY token),
n AS (SELECT COUNT(*) AS n FROM documents)
SELECT tf.doc_id, tf.token, ROUND(tf.tf * LN(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
WHERE tf.doc_id < 20
ORDER BY tf.doc_id, tfidf DESC, tf.token""",
    "dedup_exact" ->
      """SELECT text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS dupes
FROM (SELECT doc_id, MD5(text) AS text_hash FROM documents) t
GROUP BY text_hash HAVING COUNT(*) >= 1
ORDER BY keep_id""",
    "dedup_keep_latest" ->
      """SELECT user_id, event_type, event_id, ts FROM (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1 ORDER BY user_id, event_type""",
    "sim_jaccard" ->
      """WITH toks AS (
  SELECT doc_id, collect_set(token) AS s FROM (
    SELECT doc_id, explode(split(text, ' ')) AS token FROM documents WHERE doc_id < 30) t
  WHERE token <> '' GROUP BY doc_id)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       ROUND(CAST(size(array_intersect(a.s, b.s)) AS DOUBLE) / size(array_union(a.s, b.s)), 6) AS jac
FROM toks a JOIN toks b ON a.doc_id < b.doc_id
ORDER BY a_id, b_id""",
    "sim_cosine_topk" ->
      """WITH v AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         aggregate(zip_with(a.e, b.e, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (s, x) -> s + x)
         / (SQRT(aggregate(a.e, CAST(0.0 AS DOUBLE), (s, x) -> s + x * x))
            * SQRT(aggregate(b.e, CAST(0.0 AS DOUBLE), (s, x) -> s + x * x))) AS cos
  FROM v a JOIN v b ON a.vec_id <> b.vec_id WHERE a.vec_id < 50)
SELECT a_id, b_id, ROUND(cos, 6) AS cos FROM (
  SELECT a_id, b_id, cos, ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY cos DESC, b_id) AS rn
  FROM pairs) t
WHERE rn <= 5 ORDER BY a_id, cos DESC, b_id""",
    "knn_label_vote" ->
      """WITH v AS (SELECT vec_id, label, transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
pairs AS (
  SELECT a.vec_id AS a_id, b.label AS b_label,
         aggregate(zip_with(a.e, b.e, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (s, x) -> s + x)
         / (SQRT(aggregate(a.e, CAST(0.0 AS DOUBLE), (s, x) -> s + x * x))
            * SQRT(aggregate(b.e, CAST(0.0 AS DOUBLE), (s, x) -> s + x * x))) AS cos,
         b.vec_id AS b_id
  FROM v a JOIN v b ON a.vec_id <> b.vec_id WHERE a.vec_id < 100),
knn AS (
  SELECT a_id, b_label FROM (
    SELECT a_id, b_label, ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY cos DESC, b_id) AS rn
    FROM pairs) t WHERE rn <= 5)
SELECT a_id, b_label AS pred, COUNT(*) AS votes
FROM knn GROUP BY a_id, b_label
ORDER BY a_id, votes DESC, pred""",
    "udf_slugify" ->
      """SELECT p_partkey, LOWER(REGEXP_REPLACE(p_name, '[^a-zA-Z0-9]+', '-')) AS slug
FROM part ORDER BY p_partkey LIMIT 500""",
    "udaf_weighted_avg" ->
      """SELECT l_returnflag,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS wavg_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "udtf_bigrams" ->
      """WITH toks AS (
  SELECT doc_id, pos, token
  FROM (SELECT doc_id, posexplode(split(text, ' ')) AS (pos, token) FROM documents WHERE doc_id < 10) t
  WHERE token <> ''),
big AS (
  SELECT doc_id, CONCAT(token, ' ', LEAD(token) OVER (PARTITION BY doc_id ORDER BY pos)) AS bigram
  FROM toks)
SELECT doc_id, bigram, COUNT(*) AS cnt FROM big WHERE bigram IS NOT NULL
GROUP BY doc_id, bigram ORDER BY doc_id, cnt DESC, bigram""",
    "subq_scalar" ->
      """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS p
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) * 2.0 FROM orders)
ORDER BY o_orderkey""",
    "subq_in" ->
      """SELECT o_orderkey FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
  AND o_orderstatus = 'F'
ORDER BY o_orderkey LIMIT 2000""",
    "subq_correlated" ->
      """SELECT c_custkey,
       (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0) AS big_orders
FROM customer c
WHERE c_custkey <= 300
ORDER BY c_custkey""",
  )

  val duck: Map[String, String] = Map(
    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500""",
    "scan_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS d
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-03-01 00:00:00'
ORDER BY l_orderkey, l_linenumber""",
    "project_compute" ->
      """SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1000""",
    "filter_compound" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders
WHERE (o_orderstatus = 'F' OR o_totalprice > 200000.0)
  AND o_orderpriority IN ('1-URGENT','2-HIGH')
  AND o_orderkey BETWEEN 100 AND 12000
ORDER BY o_orderkey""",
    "filter_like_null" ->
      """SELECT p_partkey, p_name, NULLIF(p_brand, 'Brand#1') AS b
FROM part
WHERE p_name LIKE '%green%' AND p_type NOT LIKE 'SMALL%'
ORDER BY p_partkey""",
    "distinct_rows" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority
FROM orders ORDER BY o_orderstatus, o_orderpriority""",
    "join_inner" ->
      """SELECT o.o_orderkey, c.c_name, CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS p
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
ORDER BY o.o_orderkey LIMIT 2000""",
    "join_broadcast" ->
      """SELECT l.l_orderkey, l.l_linenumber, p.p_brand
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size <= 5
ORDER BY l.l_orderkey, l.l_linenumber LIMIT 2000""",
    "join_left" ->
      """SELECT c.c_custkey, COUNT(o.o_orderkey) AS n
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey ORDER BY c.c_custkey""",
    "join_full_outer" ->
      """SELECT COALESCE(a.k, b.k) AS k, a.na, b.nb
FROM (SELECT c_nationkey AS k, COUNT(*) AS na FROM customer GROUP BY c_nationkey) a
FULL OUTER JOIN (SELECT s_nationkey AS k, COUNT(*) AS nb FROM supplier GROUP BY s_nationkey) b
ON a.k = b.k
ORDER BY k""",
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
ORDER BY c_custkey""",
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey""",
    "join_theta" ->
      """SELECT s.s_suppkey, c.c_custkey
FROM supplier s JOIN customer c
  ON s.s_nationkey = c.c_nationkey AND s.s_acctbal < c.c_acctbal
ORDER BY s.s_suppkey, c.c_custkey LIMIT 5000""",
    "join_cross" ->
      """SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
ORDER BY r.r_name, n.n_name""",
    "join_multiway" ->
      """SELECT n.n_name, COUNT(*) AS cnt,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name ORDER BY n.n_name""",
    // Windowed form rather than DuckDB's ASOF JOIN: ASOF cannot express the
    // deterministic equal-ts tie-break (signup event_id DESC) that all three
    // engine implementations now apply.
    "join_asof" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     s AS (SELECT event_id AS s_event_id, user_id, ts AS s_ts, value AS s_value
           FROM events WHERE event_type = 'signup')
SELECT event_id, user_id, s_ts, CAST(CAST(s_value AS DECIMAL(18,2)) AS DOUBLE) AS s_value FROM (
  SELECT p.event_id, p.user_id, s.s_ts, s.s_value,
         ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY s.s_ts DESC, s.s_event_id DESC) AS rn
  FROM p JOIN s ON p.user_id = s.user_id AND p.ts >= s.s_ts
) t WHERE rn = 1
ORDER BY event_id""",
    "join_interval" ->
      """SELECT a.event_id AS click_id, b.event_id AS purchase_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '30' MINUTE
ORDER BY click_id, purchase_id""",
    "agg_hash_q1" ->
      """SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc,
       COUNT(*) AS cnt
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",
    "agg_avg" ->
      """SELECT c_mktsegment,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_bal,
       COUNT(*) AS n
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "agg_minmax" ->
      """SELECT o_orderpriority,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mn,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mx,
       MIN(CAST(o_orderdate AS DATE)) AS dmn,
       MAX(CAST(o_orderdate AS DATE)) AS dmx
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "agg_count_distinct" ->
      """SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS nations,
       COUNT(DISTINCT c_nationkey / 5) AS regions_approx
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "agg_having" ->
      """SELECT o_custkey, COUNT(*) AS n
FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 20
ORDER BY o_custkey""",
    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS q
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "agg_stddev" ->
      """SELECT c_mktsegment, ROUND(STDDEV_SAMP(c_acctbal), 2) AS sd, ROUND(VAR_SAMP(c_acctbal), 1) AS vr
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "agg_collect_list" ->
      """SELECT l_orderkey, array_to_string(list_sort(list(l_linenumber)), ',') AS lines
FROM lineitem WHERE l_orderkey < 200
GROUP BY l_orderkey ORDER BY l_orderkey""",
    "win_row_number" ->
      """SELECT c_custkey, c_mktsegment, rn FROM (
  SELECT c_custkey, c_mktsegment,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey) AS rn
  FROM customer) t
WHERE rn <= 10 ORDER BY c_mktsegment, rn""",
    "win_rank_dense" ->
      """SELECT p_brand, p_size,
       RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS rk,
       DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS drk
FROM part ORDER BY p_brand, p_size, rk LIMIT 1000""",
    "win_lag_lead" ->
      """SELECT user_id, event_id,
       LAG(event_id) OVER w AS prev_id,
       LEAD(event_id) OVER w AS next_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id LIMIT 3000""",
    "win_running_sum" ->
      """SELECT o_custkey, o_orderkey,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS DOUBLE) AS run
FROM orders ORDER BY o_custkey, o_orderkey LIMIT 3000""",
    "win_sliding_avg" ->
      """SELECT o_custkey, o_orderkey,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / COUNT(*) OVER w, 4) AS mavg
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey LIMIT 3000""",
    "win_range_frame" ->
      """SELECT o_orderkey,
       COUNT(*) OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2))
                      RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS near_cnt
FROM orders ORDER BY o_orderkey LIMIT 2000""",
    "win_ntile_cume" ->
      """SELECT c_custkey, NTILE(4) OVER w AS quart,
       ROUND(CUME_DIST() OVER w, 6) AS cd,
       ROUND(PERCENT_RANK() OVER w, 6) AS pr
FROM customer WINDOW w AS (ORDER BY c_custkey)
ORDER BY c_custkey LIMIT 1000""",
    "win_first_last" ->
      """SELECT user_id, event_id,
       FIRST_VALUE(event_type) OVER w AS first_ev,
       LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id LIMIT 3000""",
    "topk_per_group" ->
      """SELECT c_nationkey, c_custkey, bal FROM (
  SELECT c_nationkey, c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey) AS rn
  FROM customer) t
WHERE rn <= 3 ORDER BY c_nationkey, bal DESC, c_custkey""",
    "sort_multi" ->
      """SELECT s_suppkey, s_nationkey, CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
FROM supplier
ORDER BY s_nationkey ASC, bal DESC, s_suppkey ASC""",
    "limit_offset" ->
      """SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100""",
    "topk_global" ->
      """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS p
FROM orders ORDER BY p DESC, o_orderkey LIMIT 25""",
    "set_union_all" ->
      """SELECT k, v FROM (
  SELECT c_custkey AS k, 'c' AS v FROM customer WHERE c_nationkey = 1
  UNION ALL
  SELECT s_suppkey AS k, 's' AS v FROM supplier WHERE s_nationkey = 1) t
ORDER BY k, v""",
    "set_union_distinct" ->
      """SELECT k FROM (
  SELECT c_nationkey AS k FROM customer
  UNION
  SELECT s_nationkey AS k FROM supplier) t
ORDER BY k""",
    "set_intersect" ->
      """SELECT c_nationkey AS k FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
ORDER BY k""",
    "set_except" ->
      """SELECT c_nationkey AS k FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
ORDER BY k""",
    "fn_string" ->
      """SELECT p_partkey,
       UPPER(p_brand) AS u, LOWER(p_type) AS lo,
       SUBSTRING(p_name, 1, 8) AS sub,
       TRIM(CONCAT('  ', p_brand, '  ')) AS tr,
       REPLACE(p_type, ' ', '_') AS rep,
       LENGTH(p_name) AS len,
       LPAD(CAST(p_size AS STRING), 4, '0') AS pad
FROM part ORDER BY p_partkey LIMIT 500""",
    "fn_regexp" ->
      """SELECT p_partkey, REGEXP_REPLACE(p_name, '[aeiou]', '*', 'g') AS starred
FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""",
    "fn_date" ->
      """SELECT o_orderkey,
       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mon,
       EXTRACT(YEAR FROM o_orderdate) AS y,
       EXTRACT(MONTH FROM o_orderdate) AS m,
       EXTRACT(DAY FROM o_orderdate) AS d,
       CAST(o_orderdate + INTERVAL '90' DAY AS DATE) AS due
FROM orders ORDER BY o_orderkey LIMIT 2000""",
    "fn_math" ->
      """SELECT o_orderkey,
       CAST(ABS(CAST(o_totalprice AS DECIMAL(18,2)) - 150000.00) AS DOUBLE) AS dist,
       CAST(CEIL(o_totalprice / 1000.0) AS BIGINT) AS ceil_k,
       CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT) AS floor_k,
       MOD(o_orderkey, 7) AS m7,
       ROUND(SQRT(o_orderkey), 6) AS rt
FROM orders ORDER BY o_orderkey LIMIT 2000""",
    "fn_case_coalesce" ->
      """SELECT o_orderkey,
       CASE WHEN o_totalprice > 250000.0 THEN 'big'
            WHEN o_totalprice > 100000.0 THEN 'mid'
            ELSE 'small' END AS bucket,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS st,
       GREATEST(o_orderkey, o_custkey) AS g,
       LEAST(o_orderkey, o_custkey) AS l
FROM orders ORDER BY o_orderkey LIMIT 2000""",
    "fn_cast" ->
      """SELECT c_custkey,
       CAST(c_custkey AS STRING) AS s,
       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS STRING) AS bal_s,
       CAST(SUBSTRING(CAST(c_custkey AS STRING), 1, 2) AS INT) AS pre
FROM customer ORDER BY c_custkey LIMIT 500""",
    "fn_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events ORDER BY event_id LIMIT 3000""",
    "fn_array" ->
      """SELECT vec_id, len(embedding) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_el,
       ROUND(list_sum(CAST(embedding AS DOUBLE[])), 4) AS vsum
FROM embeddings ORDER BY vec_id""",
    "stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS ws, event_type, COUNT(*) AS cnt,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sv
FROM events GROUP BY 1, 2 ORDER BY ws, event_type""",
    "stream_sliding" ->
      """WITH shifted AS (
  SELECT e.ts, time_bucket(INTERVAL '15 minutes', CAST(e.ts AS TIMESTAMP)) - (g.o * INTERVAL '15 minutes') AS ws
  FROM events e CROSS JOIN (SELECT UNNEST(range(0, 4)) AS o) g)
SELECT ws, COUNT(*) AS cnt FROM shifted
WHERE ts >= ws AND ts < ws + INTERVAL '1 hour'
GROUP BY ws ORDER BY ws""",
    "stream_session" ->
      """WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30' MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS new_s
  FROM events),
sess AS (
  SELECT user_id, ts, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged)
SELECT user_id, MIN(ts) AS ss, COUNT(*) AS cnt
FROM sess GROUP BY user_id, sid ORDER BY user_id, ss""",
    "stream_dedup" ->
      """SELECT user_id, event_type, MIN(event_id) AS first_id
FROM events GROUP BY user_id, event_type
ORDER BY user_id, event_type""",
    "text_tokenize" ->
      """SELECT token, COUNT(*) AS cnt
FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents WHERE lang = 'en') t
WHERE token <> ''
GROUP BY token ORDER BY cnt DESC, token LIMIT 50""",
    "text_stats" ->
      """SELECT lang, COUNT(*) AS docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars,
       MIN(n_chars) AS mn, MAX(n_chars) AS mx
FROM documents GROUP BY lang ORDER BY lang""",
    "text_tfidf" ->
      """WITH tokens AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents) t WHERE token <> ''),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tokens GROUP BY doc_id, token),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY token),
n AS (SELECT COUNT(*) AS n FROM documents)
SELECT tf.doc_id, tf.token, ROUND(tf.tf * LN(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
WHERE tf.doc_id < 20
ORDER BY tf.doc_id, tfidf DESC, tf.token""",
    "dedup_exact" ->
      """SELECT text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS dupes
FROM (SELECT doc_id, MD5(text) AS text_hash FROM documents) t
GROUP BY text_hash HAVING COUNT(*) >= 1
ORDER BY keep_id""",
    "dedup_keep_latest" ->
      """SELECT user_id, event_type, event_id, ts FROM (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1 ORDER BY user_id, event_type""",
    "sim_jaccard" ->
      """WITH toks AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS s
  FROM documents WHERE doc_id < 30)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))), 6) AS jac
FROM toks a JOIN toks b ON a.doc_id < b.doc_id
ORDER BY a_id, b_id""",
    "sim_cosine_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         list_dot_product(a.e, b.e)
         / (SQRT(list_dot_product(a.e, a.e)) * SQRT(list_dot_product(b.e, b.e))) AS cos
  FROM v a JOIN v b ON a.vec_id <> b.vec_id WHERE a.vec_id < 50)
SELECT a_id, b_id, ROUND(cos, 6) AS cos FROM (
  SELECT a_id, b_id, cos, ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY cos DESC, b_id) AS rn
  FROM pairs) t
WHERE rn <= 5 ORDER BY a_id, cos DESC, b_id""",
    "knn_label_vote" ->
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
pairs AS (
  SELECT a.vec_id AS a_id, b.label AS b_label,
         list_dot_product(a.e, b.e)
         / (SQRT(list_dot_product(a.e, a.e)) * SQRT(list_dot_product(b.e, b.e))) AS cos,
         b.vec_id AS b_id
  FROM v a JOIN v b ON a.vec_id <> b.vec_id WHERE a.vec_id < 100),
knn AS (
  SELECT a_id, b_label FROM (
    SELECT a_id, b_label, ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY cos DESC, b_id) AS rn
    FROM pairs) t WHERE rn <= 5)
SELECT a_id, b_label AS pred, COUNT(*) AS votes
FROM knn GROUP BY a_id, b_label
ORDER BY a_id, votes DESC, pred""",
    "udf_slugify" ->
      """SELECT p_partkey, LOWER(REGEXP_REPLACE(p_name, '[^a-zA-Z0-9]+', '-')) AS slug
FROM part ORDER BY p_partkey LIMIT 500""",
    "udaf_weighted_avg" ->
      """SELECT l_returnflag,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS wavg_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "udtf_bigrams" ->
      """WITH toks AS (
  SELECT doc_id, g.o AS pos, s[g.o + 1] AS token
  FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents WHERE doc_id < 10) d
  CROSS JOIN (SELECT UNNEST(range(0, 500)) AS o) g
  WHERE g.o < len(s) AND s[g.o + 1] <> ''),
big AS (
  SELECT doc_id, token || ' ' || LEAD(token) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
  FROM toks)
SELECT doc_id, bigram, COUNT(*) AS cnt FROM big WHERE bigram IS NOT NULL
GROUP BY doc_id, bigram ORDER BY doc_id, cnt DESC, bigram""",
    "subq_scalar" ->
      """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS p
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) * 2.0 FROM orders)
ORDER BY o_orderkey""",
    "subq_in" ->
      """SELECT o_orderkey FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
  AND o_orderstatus = 'F'
ORDER BY o_orderkey LIMIT 2000""",
    "subq_correlated" ->
      """SELECT c_custkey,
       (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0) AS big_orders
FROM customer c
WHERE c_custkey <= 300
ORDER BY c_custkey""",
  )
}
