package graft.oracle

import OracleCtes._

/** DuckDB oracle SQL — relational core: TPC-H-ish aggregates, joins, windows, set ops, layout (z-order/bucketed), DQ profiles. One entry per SparkEntry.queries
  * key in this family; strings byte-identical to the pre-split
  * SparkEntry registry (round-9 reviewability split).
  */
private[graft] object CoreOracles {
  val sql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_top_nations" ->
      """SELECT n_name, count(*) AS order_cnt,
         round(sum(o_totalprice), 2) AS total_spend
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY order_cnt DESC, n_name LIMIT 5""",
    "q03_union_all" ->
      """SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity), 2) AS qty
         FROM (
           SELECT l_returnflag, l_quantity FROM lineitem WHERE l_orderkey % 2 = 0
           UNION ALL
           SELECT l_returnflag, l_quantity FROM lineitem WHERE l_orderkey % 2 = 1
         ) GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q04_union_by_name" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
         round(sum(l_extendedprice), 2) AS price
         FROM (
           SELECT l_returnflag, l_linestatus, l_extendedprice FROM lineitem WHERE l_linenumber <= 3
           UNION ALL
           SELECT l_returnflag, l_linestatus, l_extendedprice FROM lineitem WHERE l_linenumber > 3
         ) GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q05_project_cast" ->
      """SELECT CAST(CAST(o_orderkey AS INT) AS VARCHAR) AS order_id,
         CAST(CAST(o_orderkey * 1000000 + o_custkey AS BIGINT) AS VARCHAR) AS admission_id,
         CAST(trunc(o_totalprice) AS INT) AS price_int,
         CAST(o_orderdate AS DATE) AS order_date
         FROM orders ORDER BY CAST(order_id AS BIGINT)""",
    "q06_filter_notnull" ->
      """SELECT event_type, count(*) AS cnt, round(sum(maybe_value), 2) AS sum_value
         FROM (SELECT event_type,
                 CASE WHEN value >= 1.0 THEN value END AS maybe_value
               FROM events)
         WHERE maybe_value IS NOT NULL AND event_type <> 'error'
         GROUP BY event_type ORDER BY event_type""",
    "q07_filter_eq" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
         FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""",
    "q08_case_like_split" ->
      """SELECT c_custkey,
         CASE WHEN c_name LIKE 'Customer#%' THEN split_part(c_name, '#', 2) END AS name_digits
         FROM customer ORDER BY c_custkey""",
    "q09_dates_dim" ->
      """SELECT order_date,
         CAST(year(order_date) AS INT) AS year,
         CAST(month(order_date) AS INT) AS month,
         CAST(day(order_date) AS INT) AS day,
         CAST(dayofweek(order_date) + 1 AS INT) AS dayofweek,
         CASE WHEN dayofweek(order_date) + 1 IN (1, 7) THEN 'weekend' ELSE 'weekday' END AS is_weekend
         FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS order_date FROM orders)
         ORDER BY order_date""",
    "q10_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "q11_dedup_rows" ->
      """SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem
         ORDER BY l_returnflag, l_linestatus, l_quantity""",
    "q12_minmax" ->
      """SELECT CAST(min(o_orderdate) AS DATE) AS min_date,
         CAST(max(o_orderdate) AS DATE) AS max_date,
         round(min(o_totalprice), 2) AS min_price,
         round(max(o_totalprice), 2) AS max_price,
         count(*) AS n FROM orders""",
    "q13_null_counts" ->
      """SELECT count(CASE WHEN v IS NULL OR isnan(v) THEN 1 END) AS null_v,
         count(CASE WHEN p IS NULL THEN 1 END) AS null_p,
         count(CASE WHEN user_id IS NULL THEN 1 END) AS null_user,
         count(*) AS total
         FROM (SELECT user_id,
                 CASE WHEN value < 2.0 THEN NULL ELSE value END AS v,
                 CASE WHEN event_type = 'error' THEN NULL ELSE props END AS p
               FROM events)""",
    "q14_topk_freq" ->
      """SELECT event_type, count(*) AS cnt FROM events
         GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 3""",
    "q15_count_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS n_custs,
         count(DISTINCT o_orderpriority) AS n_priorities,
         count(*) AS n_orders FROM orders""",
    "q16_null_rate" ->
      """SELECT round(count(CASE WHEN v IS NULL THEN 1 END) * 100.0 / count(*), 4) AS pct_v,
         round(count(CASE WHEN props IS NULL THEN 1 END) * 100.0 / count(*), 4) AS pct_props
         FROM (SELECT props,
                 CASE WHEN value < 5.0 THEN NULL ELSE value END AS v
               FROM events)""",
    "q17_join_left" ->
      """SELECT n_name, count(c_custkey) AS n_customers,
         round(sum(coalesce(c_acctbal, 0.0)), 2) AS total_bal
         FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q18_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q19_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q20_window_rank" ->
      """SELECT c_nationkey, c_custkey, spend, rk FROM (
           SELECT c_nationkey, c_custkey, spend,
             CAST(row_number() OVER (PARTITION BY c_nationkey
                  ORDER BY spend DESC, c_custkey) AS INT) AS rk
           FROM (SELECT c_nationkey, c_custkey,
                   round(sum(o_totalprice), 2) AS spend
                 FROM orders JOIN customer ON o_custkey = c_custkey
                 GROUP BY c_nationkey, c_custkey))
         WHERE rk <= 3 ORDER BY c_nationkey, rk""",
    "q21_row_number" ->
      """SELECT o_orderkey, price, CAST(row_number() OVER (ORDER BY o_orderkey) AS INT) AS trip_id
         FROM (SELECT o_orderkey, round(o_totalprice, 2) AS price
               FROM orders WHERE o_totalprice > 490000.0)
         ORDER BY o_orderkey""",
    "q22_sas_date" ->
      """SELECT sas_date, count(*) AS cnt
         FROM (SELECT DATE '1960-01-01' + CAST(l_orderkey % 20000 AS INT) AS sas_date
               FROM lineitem)
         GROUP BY sas_date ORDER BY sas_date LIMIT 100""",
    "q23_flex_date" ->
      """SELECT parsed, count(*) AS cnt FROM (
           SELECT CAST(coalesce(try_strptime(s, '%Y%m%d'), try_strptime(s, '%m%d%Y')) AS DATE) AS parsed
           FROM (SELECT CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y%m%d')
                             WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%m%d%Y')
                             ELSE 'D/S' END AS s
                 FROM orders))
         GROUP BY parsed ORDER BY parsed ASC NULLS FIRST""",
    "q24_port_split" ->
      """SELECT upper(trim(regexp_replace(port, ',[^,]*$', ''))) AS city,
         upper(trim(regexp_extract(port, '([^,]+)$', 1))) AS state
         FROM (SELECT n_name || ', ' || r_name AS port
               FROM nation JOIN region ON n_regionkey = r_regionkey)
         ORDER BY city, state""",
    "q25_events_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         count(*) AS cnt, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY day, event_type""",
    "q26_avg_delay" ->
      """SELECT o_orderpriority,
         round(avg(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))), 4) AS avg_delay_days,
         count(*) AS n_lines
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // --- extensions. Norm = lower/trim/collapse-whitespace, identical on
    // both sides (DuckDB regexp_replace needs the 'g' flag to match
    // Spark's replace-all).
    "q42_approx_distinct" ->
      """SELECT count(DISTINCT l_orderkey) AS exact_orders,
           count(DISTINCT l_partkey) AS exact_parts,
           count(*) AS n_rows,
           CAST(1 AS INT) AS orders_within_bound,
           CAST(1 AS INT) AS parts_within_bound
         FROM lineitem""",
    "q47_json_extract" ->
      """SELECT event_type, count(k) AS n_with_k,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(min(k) AS INT) AS min_k, CAST(max(k) AS INT) AS max_k
         FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS INT) AS k
               FROM events)
         GROUP BY event_type ORDER BY event_type""",
    "q48_running_total" ->
      """SELECT o_custkey, o_orderkey, order_date, price,
           round(sum(price) OVER (PARTITION BY o_custkey
             ORDER BY order_date, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           CAST(date_diff('day',
             lag(order_date, 1) OVER (PARTITION BY o_custkey
               ORDER BY order_date, o_orderkey),
             order_date) AS INT) AS days_since_prev
         FROM (SELECT o_custkey, o_orderkey,
                 CAST(o_orderdate AS DATE) AS order_date,
                 round(o_totalprice, 2) AS price
               FROM orders WHERE o_custkey % 100 = 0)
         ORDER BY o_custkey, order_date, o_orderkey""",
    "q49_asof_join" ->
      """WITH e AS (SELECT event_id, user_id AS k,
             CAST(DATE '1995-01-01' + CAST(event_id % 2400 AS INT) AS TIMESTAMP) AS t
           FROM events WHERE user_id < 20),
         o AS (SELECT o_custkey AS k, o_orderdate AS t, max(o_orderkey) AS o_orderkey
           FROM orders WHERE o_custkey < 20 GROUP BY 1, 2)
         SELECT e.event_id, e.k AS user_id, CAST(e.t AS DATE) AS event_date,
           o.o_orderkey
         FROM e ASOF LEFT JOIN o ON e.k = o.k AND e.t >= o.t
         ORDER BY event_id""",
    "q50_range_join" ->
      """WITH e AS (SELECT event_id, user_id AS k,
             CAST(DATE '1995-01-01' + CAST(event_id % 2400 AS INT) AS TIMESTAMP) AS t
           FROM events WHERE user_id < 20),
         o AS (SELECT o_custkey AS k, o_orderkey,
             o_orderdate - INTERVAL 3 DAY AS w_start,
             o_orderdate + INTERVAL 3 DAY AS w_end
           FROM orders WHERE o_custkey < 20)
         SELECT e.k AS user_id, count(*) AS n_pairs,
           count(DISTINCT o_orderkey) AS n_orders
         FROM e JOIN o ON e.k = o.k AND e.t BETWEEN o.w_start AND o.w_end
         GROUP BY e.k ORDER BY user_id""",
    "q52_key_skew" ->
      """WITH pk AS (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1),
         tot AS (SELECT sum(n) * 1.0 / count(*) AS avg_n FROM pk)
         SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_key_rows,
           round(any_value(avg_n), 4) AS avg_key_rows,
           count(CASE WHEN n > 2 * avg_n THEN 1 END) AS n_hot_keys,
           round(max(n) / any_value(avg_n), 4) AS max_over_avg
         FROM pk, tot""",
    "q54_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
           round(sum(l_quantity), 2) AS qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q55_pivot" ->
      """SELECT o_orderpriority,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q56_percentiles" ->
      """SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 2) AS p99,
           count(*) AS n
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q58_sessions_batch" ->
      ("WITH " + sessionsCte + """
         SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           session_start, session_end, n_events
         FROM sess ORDER BY user_id, session_seq"""),
    // q74: discrete percentiles (element at rank ceil(p*n), ties broken
    // by doc_id like the Spark window) are engine-portable; the sketch
    // equality flag is pinned at 1 (accuracy >= group size => zero rank
    // error)
    "q74_quantile_sketch" ->
      """WITH ranked AS (
           SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang
               ORDER BY n_chars, doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
           FROM documents)
         SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
           CAST(max(CASE WHEN rk = CAST(ceil(0.25 * n) AS INT)
             THEN n_chars END) AS BIGINT) AS p25,
           CAST(max(CASE WHEN rk = CAST(ceil(0.50 * n) AS INT)
             THEN n_chars END) AS BIGINT) AS p50,
           CAST(max(CASE WHEN rk = CAST(ceil(0.75 * n) AS INT)
             THEN n_chars END) AS BIGINT) AS p75,
           CAST(1 AS INT) AS approx_ok
         FROM ranked GROUP BY lang ORDER BY lang""",
    // q108: TPC-H Q3 shape — revenue summed as exact cent·percent
    // BIGINTs (price is cents-precision, discount percent-precision),
    // FP only at the final /1e4; (revenue DESC, orderkey) total order
    "q108_ship_priority" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
           o_orderpriority,
           round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
             AS DOUBLE) / 10000.0, 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate > TIMESTAMP '1998-01-01'
         GROUP BY 1, 2, 3
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    // q109: TPC-H Q5 shape — supplier-local revenue per nation in one
    // region/year; same exact integer revenue quantization
    "q109_regional_revenue" ->
      """SELECT n_name,
           round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
             AS DOUBLE) / 10000.0, 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
           AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY 1 ORDER BY revenue DESC, n_name""",
    // q125: the whole-star FK sweep — one row per edge, orphan counts
    // via NOT EXISTS; integers only
    "q125_ri_profile" ->
      """SELECT * FROM (
           SELECT 'customer->nation' AS edge,
             (SELECT count(*) FROM customer) AS n_child,
             (SELECT count(*) FROM customer c WHERE NOT EXISTS
               (SELECT 1 FROM nation n WHERE c.c_nationkey = n.n_nationkey))
               AS n_orphans
           UNION ALL SELECT 'lineitem->orders',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
               (SELECT 1 FROM orders o WHERE l.l_orderkey = o.o_orderkey))
           UNION ALL SELECT 'lineitem->part',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
               (SELECT 1 FROM part p WHERE l.l_partkey = p.p_partkey))
           UNION ALL SELECT 'lineitem->supplier',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
               (SELECT 1 FROM supplier s WHERE l.l_suppkey = s.s_suppkey))
           UNION ALL SELECT 'nation->region',
             (SELECT count(*) FROM nation),
             (SELECT count(*) FROM nation n WHERE NOT EXISTS
               (SELECT 1 FROM region r WHERE n.n_regionkey = r.r_regionkey))
           UNION ALL SELECT 'orders->customer',
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders o WHERE NOT EXISTS
               (SELECT 1 FROM customer c WHERE o.o_custkey = c.c_custkey))
           UNION ALL SELECT 'supplier->nation',
             (SELECT count(*) FROM supplier),
             (SELECT count(*) FROM supplier s WHERE NOT EXISTS
               (SELECT 1 FROM nation n WHERE s.s_nationkey = n.n_nationkey))
         ) ORDER BY edge""",
    // q130: the oracle is the NAIVE global row_number — the Spark side's
    // two-phase bucket/offset formulation must equal it exactly
    "q130_dense_ids" ->
      """SELECT vec_id,
           CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS dense_id
         FROM embeddings ORDER BY vec_id""",
    // q131: six exact HUGEINT moments (cents fixed-point), closed forms
    // with one cast/sqrt/division/round per output; `+ 0.0` normalizes
    // any negative-tiny rounding to +0.0 (PARITY.md hazard 2)
    "q131_exact_ols" ->
      """WITH b AS (SELECT l_returnflag,
             CAST(round(l_quantity * 100) AS HUGEINT) AS x,
             CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
           FROM lineitem),
         m AS (SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
             sum(x*x) AS sxx, sum(y*y) AS syy
           FROM b GROUP BY 1)
         SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           round((n*sxy - sx*sy)::DOUBLE / (n*sxx - sx*sx)::DOUBLE, 6) + 0.0
             AS slope,
           round((sy*sxx - sx*sxy)::DOUBLE / (n*sxx - sx*sx)::DOUBLE, 6) + 0.0
             AS intercept,
           round((n*sxy - sx*sy)::DOUBLE /
             (sqrt((n*sxx - sx*sx)::DOUBLE) * sqrt((n*syy - sy*sy)::DOUBLE)),
             6) + 0.0 AS r
         FROM m ORDER BY l_returnflag""",
    // q132: Morton interleave in pure bit arithmetic (62 shift/mask
    // terms, generated; 31 bits/dim so 2^31-1 keys never alias);
    // coarse z-ranges profiled by 2-D key bounds
    "q132_zorder_layout" ->
      s"""WITH z AS (SELECT l_partkey, l_suppkey,
             ($mortonSql) AS z
           FROM lineitem)
         SELECT z // 16384 AS zrange, count(*) AS n_rows,
           CAST(min(l_partkey) AS BIGINT) AS min_part,
           CAST(max(l_partkey) AS BIGINT) AS max_part,
           CAST(min(l_suppkey) AS BIGINT) AS min_supp,
           CAST(max(l_suppkey) AS BIGINT) AS max_supp
         FROM z GROUP BY 1 ORDER BY zrange""",
    // q133: customer -> orders -> lineitem cascade counts via IN-chains
    // (the semi-join shape); integers only
    "q133_delete_cascade" ->
      """SELECT * FROM (
           SELECT 'customer' AS tbl, count(*) AS n_rows,
             count(DISTINCT c_custkey) AS n_keys
           FROM customer WHERE c_custkey % 97 = 0
           UNION ALL
           SELECT 'lineitem', count(*), count(DISTINCT l_orderkey)
           FROM lineitem WHERE l_orderkey IN
             (SELECT o_orderkey FROM orders WHERE o_custkey IN
               (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0))
           UNION ALL
           SELECT 'orders', count(*), count(DISTINCT o_custkey)
           FROM orders WHERE o_custkey IN
             (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0)
         ) ORDER BY tbl""",
    // q143: interval-intersection file-skip test against the q132
    // manifest — integers plus one division/round per row
    "q143_zorder_pruning" ->
      (s"""WITH z AS (SELECT l_partkey, l_suppkey,
             ($mortonSql) AS z
           FROM lineitem),
         pr AS (SELECT z // 16384 AS zrange,
             min(l_partkey) AS min_part, max(l_partkey) AS max_part,
             min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
           FROM z GROUP BY 1),
         f AS (SELECT
             NOT (max_part < 100 OR min_part > 159) AS tp,
             NOT (max_supp < 10 OR min_supp > 19) AS ts
           FROM pr)
         SELECT * FROM (
           SELECT 'part_100_159' AS predicate, count(*) AS n_ranges,
             CAST(sum(CASE WHEN tp THEN 1 ELSE 0 END) AS BIGINT)
               AS n_touched,
             round(sum(CASE WHEN tp THEN 1 ELSE 0 END)::DOUBLE /
               count(*), 4) AS selectivity
           FROM f
           UNION ALL SELECT 'part_and_supp', count(*),
             CAST(sum(CASE WHEN tp AND ts THEN 1 ELSE 0 END) AS BIGINT),
             round(sum(CASE WHEN tp AND ts THEN 1 ELSE 0 END)::DOUBLE /
               count(*), 4)
           FROM f
           UNION ALL SELECT 'supp_10_19', count(*),
             CAST(sum(CASE WHEN ts THEN 1 ELSE 0 END) AS BIGINT),
             round(sum(CASE WHEN ts THEN 1 ELSE 0 END)::DOUBLE /
               count(*), 4)
           FROM f
         ) ORDER BY predicate"""),
    // q148: the bucketed co-located join — bucketing is physical layout,
    // so the oracle is the plain join+rollup (BucketingSpec pins the
    // Exchange-free plan; this gate pins the answer)
    "q148_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // q158: TPC-H Q8 shape — yearly NATION_2 supplier share of
    // ASIA-customer revenue; exact cents·pct integer sums, FP only in
    // the final share division (6dp)
    "q158_market_share" ->
      """WITH asia_cust AS (
           SELECT c_custkey FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA'),
         f AS (SELECT year(o_orderdate) AS o_year,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS rev_cp,
             sn.n_name AS supp_nation
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN asia_cust ON o_custkey = c_custkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation sn ON s_nationkey = sn.n_nationkey)
         SELECT o_year,
           round(CAST(sum(rev_cp) AS DOUBLE) / 10000.0, 2) AS total_revenue,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN rev_cp
               ELSE 0 END) AS DOUBLE) / CAST(sum(rev_cp) AS DOUBLE), 6)
             AS mkt_share
         FROM f GROUP BY o_year ORDER BY o_year""",
    // q159: TPC-H Q10 shape — top-20 customers by returned revenue in
    // order-year 1997; aggregate before the dim joins
    "q159_returned_rev" ->
      """WITH pc AS (SELECT o_custkey,
             sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS rev_cp,
             count(*) AS n_lines
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           WHERE l_returnflag = 'R'
             AND o_orderdate >= TIMESTAMP '1997-01-01'
             AND o_orderdate < TIMESTAMP '1998-01-01'
           GROUP BY o_custkey)
         SELECT c_custkey, c_name, n_name, n_lines,
           round(CAST(rev_cp AS DOUBLE) / 10000.0, 2) AS returned_revenue
         FROM pc
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         ORDER BY returned_revenue DESC, c_custkey LIMIT 20""",
    // q160: TPC-H Q14 shape — monthly PROMO revenue percentage over
    // ship-year 1997; one aggregate carries both sums
    "q160_promo_share" ->
      """WITH f AS (SELECT month(l_shipdate) AS ship_month,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS rev_cp,
             CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1998-01-01')
         SELECT ship_month,
           round(CAST(sum(CASE WHEN is_promo = 1 THEN rev_cp ELSE 0 END)
               AS DOUBLE) * 100.0 / CAST(sum(rev_cp) AS DOUBLE), 4)
             AS promo_pct
         FROM f GROUP BY ship_month ORDER BY ship_month""",
    // q161: TPC-H Q17 shape — per-brand revenue of lines under 20% of
    // the part's average quantity; integer cross-multiplied threshold
    // (5·qty·cnt < sum_qty) so no float boundary
    "q161_small_qty" ->
      """WITH li AS (SELECT l_partkey,
             CAST(round(l_quantity, 0) AS BIGINT) AS qty_i,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS rev_cp
           FROM lineitem),
         st AS (SELECT l_partkey AS sp_partkey, sum(qty_i) AS sum_qty,
             count(*) AS cnt_qty
           FROM li GROUP BY 1)
         SELECT p_brand, count(*) AS n_small_lines,
           round(CAST(sum(rev_cp) AS DOUBLE) / 10000.0, 2)
             AS small_qty_revenue
         FROM li
         JOIN st ON l_partkey = sp_partkey
         JOIN part ON l_partkey = p_partkey
         WHERE qty_i * 5 * cnt_qty < sum_qty
         GROUP BY p_brand ORDER BY p_brand""",
    // q169: lines-per-order bands — per-order rollup then a band rollup;
    // exact cents·pct integer revenue
    "q169_basket_bands" ->
      """WITH po AS (SELECT l_orderkey, count(*) AS n_lines,
             sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
               AS rev_cp
           FROM lineitem GROUP BY 1)
         SELECT n_lines, count(*) AS n_orders,
           round(CAST(sum(rev_cp) AS DOUBLE) / 10000.0, 2) AS revenue
         FROM po GROUP BY n_lines ORDER BY n_lines""",
    // q174: session-length profile over the shared q58 sessionization —
    // integer micros durations, one mirrored division chain
    "q174_session_stats" ->
      ("WITH " + sessionsCte + """
         SELECT n_events, count(*) AS n_sessions,
           CAST(sum(epoch_us(session_end) - epoch_us(session_start))
             AS BIGINT) AS sum_duration_us,
           round(CAST(sum(epoch_us(session_end) - epoch_us(session_start))
               AS DOUBLE) / count(*) / 1000000.0, 6) AS avg_duration_s
         FROM sess GROUP BY n_events ORDER BY n_events"""),
    // q175: exact integer median/MAD per segment — doubled-unit rank
    // picks on the value HISTOGRAM, outliers via 2·dev > 3·mad4
    "q175_mad_outliers" ->
      """WITH seg AS (SELECT c_mktsegment AS seg,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
           FROM orders JOIN customer ON o_custkey = c_custkey),
         h AS (SELECT seg, cents, count(*) AS cnt FROM seg GROUP BY 1, 2),
         c AS (SELECT seg, cents, cnt,
             sum(cnt) OVER (PARTITION BY seg ORDER BY cents) AS cum,
             sum(cnt) OVER (PARTITION BY seg) AS n FROM h),
         m AS (SELECT seg, min(n) AS n,
             CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN cents END) +
               min(CASE WHEN cum >= (n + 2) // 2 THEN cents END)
               AS BIGINT) AS med2
           FROM c GROUP BY seg),
         dv AS (SELECT s.seg, abs(2 * s.cents - m.med2) AS dev
           FROM seg s JOIN m ON s.seg = m.seg),
         dh AS (SELECT seg, dev, count(*) AS cnt FROM dv GROUP BY 1, 2),
         dc AS (SELECT seg, dev, cnt,
             sum(cnt) OVER (PARTITION BY seg ORDER BY dev) AS cum,
             sum(cnt) OVER (PARTITION BY seg) AS n FROM dh),
         dm AS (SELECT seg,
             CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN dev END) +
               min(CASE WHEN cum >= (n + 2) // 2 THEN dev END)
               AS BIGINT) AS mad4
           FROM dc GROUP BY seg),
         o AS (SELECT dv.seg,
             CAST(sum(CASE WHEN 2 * dv.dev > 3 * dm.mad4 THEN 1 ELSE 0
               END) AS BIGINT) AS n_outliers
           FROM dv JOIN dm ON dv.seg = dm.seg GROUP BY dv.seg)
         SELECT m.seg AS segment, CAST(m.n AS BIGINT) AS n_orders,
           round(CAST(m.med2 AS DOUBLE) / 200.0, 4) AS median_price,
           round(CAST(dm.mad4 AS DOUBLE) / 400.0, 4) AS mad,
           o.n_outliers
         FROM m JOIN dm ON m.seg = dm.seg JOIN o ON m.seg = o.seg
         ORDER BY segment""",
    // q177: ship-latency week bands per priority — integer day diff,
    // integer div-7 banding
    "q177_latency_bands" ->
      """SELECT o_orderpriority,
           CAST(datediff('day', CAST(o_orderdate AS DATE),
             CAST(l_shipdate AS DATE)) AS BIGINT) // 7 AS week_band,
           count(*) AS n_lines
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // q178: top-decile-by-nation suppliers with percent_rank/cume_dist
    // over the total (acctbal, suppkey) order
    "q178_percent_rank" ->
      """WITH r AS (SELECT c_nationkey, c_custkey, c_acctbal,
             percent_rank() OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal, c_custkey) AS pr,
             cume_dist() OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal, c_custkey) AS cd
           FROM customer)
         SELECT n_name, c_custkey, c_acctbal,
           round(pr, 6) AS pct_rank, round(cd, 6) AS cume_dist
         FROM r JOIN nation ON c_nationkey = n_nationkey
         WHERE pr >= 0.9
         ORDER BY n_name, c_custkey""",
    // q179: exact F2 vs the CMS inner-product estimate (same md5 bucket
    // decode as q90, w=1024); integer everywhere but the inflation
    "q179_selfjoin_sketch" ->
      """WITH t AS (SELECT CAST(l_partkey AS VARCHAR) AS tok FROM lineitem),
         tc AS (SELECT tok, count(*) AS n FROM t GROUP BY 1),
         b AS (SELECT tok, n, i.range AS i,
                 ((instr('0123456789abcdef',
                     substr(md5(tok || '_' || i.range), 1, 1)) - 1) * 256
                  + (instr('0123456789abcdef',
                      substr(md5(tok || '_' || i.range), 2, 1)) - 1) * 16
                  + (instr('0123456789abcdef',
                      substr(md5(tok || '_' || i.range), 3, 1)) - 1)) % 1024
                   AS bkt
               FROM tc, range(0, 4) i),
         cells AS (SELECT i, bkt, CAST(sum(n) AS BIGINT) AS cnt
                   FROM b GROUP BY 1, 2),
         ests AS (SELECT i, CAST(sum(cnt * cnt) AS BIGINT) AS e
                  FROM cells GROUP BY 1),
         est AS (SELECT CAST(min(e) AS BIGINT) AS est_f2 FROM ests),
         ex AS (SELECT count(*) AS n_keys,
                  CAST(sum(n * n) AS BIGINT) AS exact_f2 FROM tc)
         SELECT n_keys, exact_f2, est_f2,
           CAST(est_f2 >= exact_f2 AS INT) AS overest_ok,
           round(CAST(est_f2 AS DOUBLE) / CAST(exact_f2 AS DOUBLE), 4)
             AS inflation
         FROM ex, est""",
    // q181: CUBE over (returnflag, linestatus) — q54's ROLLUP completed
    // to the grouping power set
    "q181_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
           round(sum(l_quantity), 2) AS qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    // q185: FULL OUTER day reconciliation of two independent daily
    // summaries, status-tagged
    "q185_daily_reconcile" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS day,
             count(*) AS n_orders FROM orders GROUP BY 1),
         s AS (SELECT CAST(l_shipdate AS DATE) AS day,
             sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
               AS rev_cp
           FROM lineitem GROUP BY 1)
         SELECT coalesce(o.day, s.day) AS day,
           coalesce(o.n_orders, 0) AS n_orders,
           CAST(coalesce(s.rev_cp, 0) // 100 AS DOUBLE) / 100.0
             AS shipped_revenue,
           CASE WHEN o.n_orders IS NULL THEN 'ship_only'
                WHEN s.rev_cp IS NULL THEN 'orders_only'
                ELSE 'both' END AS status
         FROM o FULL OUTER JOIN s ON o.day = s.day
         ORDER BY day""",
    // q186: INTERSECT/EXCEPT churn cohorts over 1996 vs 1997 buyers
    "q186_churn_setops" ->
      """WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1997-01-01'),
         y97 AS (SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             AND o_orderdate < TIMESTAMP '1998-01-01')
         SELECT 'acquired' AS cohort, CAST(count(*) AS BIGINT)
           AS n_customers
         FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y96)
         UNION ALL
         SELECT 'churned', CAST(count(*) AS BIGINT)
         FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
         UNION ALL
         SELECT 'retained', CAST(count(*) AS BIGINT)
         FROM (SELECT o_custkey FROM y96
               INTERSECT SELECT o_custkey FROM y97)
         ORDER BY cohort""",
    // q187: trailing 7-day revenue via a RANGE frame over the integer
    // day number; the bounded daily frame carries the window
    "q187_rolling_revenue" ->
      """WITH d AS (SELECT CAST(l_shipdate AS DATE) AS day,
             sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
               AS rev_cp
           FROM lineitem GROUP BY 1),
         n AS (SELECT day, rev_cp,
             CAST(datediff('day', DATE '1995-01-01', day) AS BIGINT)
               AS day_num FROM d)
         SELECT day,
           CAST(rev_cp // 100 AS DOUBLE) / 100.0 AS revenue,
           CAST(sum(rev_cp) OVER w // 100 AS DOUBLE) / 100.0
             AS revenue_7d,
           count(*) OVER w AS n_days_in_window
         FROM n
         WINDOW w AS (ORDER BY day_num
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
         ORDER BY day""",
    // q188: describe-style column profile — one stacked (column, value)
    // frame, single distinct shuffle, |columns| rollup
    "q188_column_profile" ->
      """WITH st AS (
           SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR)
             AS val FROM orders
           UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR)
             FROM orders
           UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
           UNION ALL SELECT 'o_orderdate', CAST(o_orderdate AS VARCHAR)
             FROM orders
           UNION ALL SELECT 'o_orderpriority', o_orderpriority
             FROM orders),
         h AS (SELECT col_name, val, count(*) AS cnt FROM st
           GROUP BY 1, 2)
         SELECT col_name, CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN val IS NULL THEN cnt ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(sum(CASE WHEN val IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_distinct,
           min(val) AS min_val, max(val) AS max_val
         FROM h GROUP BY col_name ORDER BY col_name""",
    // q189: per-edge FK cardinality class from the child-side key
    // histogram only
    "q189_fk_cardinality" ->
      """WITH
         e1 AS (SELECT l_orderkey AS k FROM lineitem),
         e2 AS (SELECT l_partkey AS k FROM lineitem),
         e3 AS (SELECT l_suppkey AS k FROM lineitem),
         e4 AS (SELECT o_custkey AS k FROM orders),
         sh AS (
           SELECT 'lineitem->orders' AS edge, k FROM e1
           UNION ALL SELECT 'lineitem->part', k FROM e2
           UNION ALL SELECT 'lineitem->supplier', k FROM e3
           UNION ALL SELECT 'orders->customer', k FROM e4),
         h AS (SELECT edge, k, count(*) AS per_key FROM sh GROUP BY 1, 2)
         SELECT edge, CAST(sum(per_key) AS BIGINT) AS n_child,
           count(*) AS n_keys,
           CAST(max(per_key) AS BIGINT) AS max_per_key,
           CASE WHEN max(per_key) = 1 THEN '1:1' ELSE 'N:1' END AS class
         FROM h GROUP BY edge ORDER BY edge""",
    // q197: brand-pair lift — integer products inside one division
    // (the q107 PMI contract without the log)
    "q197_basket_lift" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey, p_brand
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         n AS (SELECT count(*) AS n_orders FROM orders),
         marg AS (SELECT p_brand, count(*) AS n_b FROM ob GROUP BY 1),
         pairs AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             count(*) AS n_ab
           FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
             AND a.p_brand < b.p_brand
           GROUP BY 1, 2 HAVING count(*) >= 20)
         SELECT brand_a, brand_b, n_ab,
           round(CAST(n_ab * n_orders AS DOUBLE) /
             CAST(ma.n_b * mb.n_b AS DOUBLE), 6) AS lift
         FROM pairs
         JOIN marg ma ON brand_a = ma.p_brand
         JOIN marg mb ON brand_b = mb.p_brand
         CROSS JOIN n
         ORDER BY lift DESC, brand_a, brand_b LIMIT 20""",
    // q199: supplier-concentration bands — integer (10·top) div total
    "q199_supply_conc" ->
      """WITH h AS (SELECT l_partkey, l_suppkey, count(*) AS cnt
           FROM lineitem GROUP BY 1, 2),
         p AS (SELECT l_partkey, CAST(sum(cnt) AS BIGINT) AS n_lines,
             CAST(max(cnt) AS BIGINT) AS top FROM h GROUP BY 1)
         SELECT (10 * top) // n_lines AS conc_band, count(*) AS n_parts,
           CAST(sum(n_lines) AS BIGINT) AS n_lines
         FROM p GROUP BY 1 ORDER BY 1""",
    // q203: order fulfillment-span week bands — integer day span per
    // order, div-7 banding
    "q203_fulfillment_span" ->
      """WITH s AS (SELECT l_orderkey,
             CAST(datediff('day', CAST(min(l_shipdate) AS DATE),
               CAST(max(l_shipdate) AS DATE)) AS BIGINT) AS span_days
           FROM lineitem GROUP BY 1)
         SELECT span_days // 7 AS span_weeks, count(*) AS n_orders
         FROM s GROUP BY 1 ORDER BY 1""",
    // q213: TPC-H Q22 shape — integer-cents balances, cross-multiplied
    // positive-average threshold (no FP compare), NOT EXISTS on the
    // date-filtered orders (dormant = no orders since the cutoff)
    "q213_dormant_balance" ->
      """WITH cust AS (SELECT c_custkey, c_nationkey % 5 AS cntry,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_c
           FROM customer),
         pa AS (SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c,
                  count(*) AS cnt_c
                FROM cust WHERE bal_c > 0),
         cand AS (SELECT c.cntry, c.bal_c FROM cust c CROSS JOIN pa
                  WHERE c.bal_c * pa.cnt_c > pa.sum_c
                    AND NOT EXISTS (SELECT 1 FROM orders o
                                    WHERE o.o_custkey = c.c_custkey
                                      AND o.o_orderdate >=
                                        TIMESTAMP '1998-06-01'))
         SELECT cntry, count(*) AS n_cust,
           round(CAST(sum(bal_c) AS DOUBLE) / 100.0, 2) AS total_bal
         FROM cand GROUP BY 1 ORDER BY 1""",
    // q214: TPC-H Q15 shape — per-supplier quarterly revenue on the
    // exact cents·pct grid, suppliers matching the scalar max (ties
    // kept, so the equality join is deterministic)
    "q214_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
               AS BIGINT) AS rev_cp
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY 1),
         top AS (SELECT max(rev_cp) AS max_cp FROM rev)
         SELECT s_suppkey, s_name,
           round(CAST(rev_cp AS DOUBLE) / 10000.0, 2) AS revenue
         FROM rev CROSS JOIN top
         JOIN supplier ON l_suppkey = s_suppkey
         WHERE rev_cp = max_cp
         ORDER BY s_suppkey""",
    // q215: TPC-H Q13 shape — the filter must live in the ON clause so
    // zero-order customers survive the outer join
    "q215_custdist" ->
      """WITH co AS (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           GROUP BY c_custkey)
         SELECT c_count, count(*) AS custdist
         FROM co GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC""",
    // q216: TPC-H Q18 shape — HAVING relation as a join input; money
    // compared and displayed via integer cents (boundary-free)
    "q216_big_orders" ->
      """WITH heavy AS (
           SELECT l_orderkey,
             CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
               AS sum_qty
           FROM lineitem GROUP BY 1
           HAVING sum(CAST(round(l_quantity, 0) AS BIGINT)) > 250)
         SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(price_c AS DOUBLE) / 100.0 AS total_price, sum_qty
         FROM (
           SELECT c_custkey, c_name, o_orderkey, o_orderdate,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_c,
             sum_qty
           FROM orders
           JOIN heavy ON o_orderkey = l_orderkey
           JOIN customer ON o_custkey = c_custkey
           ORDER BY price_c DESC, o_orderkey LIMIT 10)
         ORDER BY price_c DESC, o_orderkey""",
    // q220: between-session gaps on the shared q58 session assembly —
    // integer microsecond diffs floored to days
    "q220_session_gaps" ->
      ("WITH " + sessionsCte + """,
         g AS (SELECT user_id, session_seq, session_start,
                 lag(session_end, 1) OVER (PARTITION BY user_id
                   ORDER BY session_seq) AS prev_end
               FROM sess)
         SELECT (epoch_us(session_start) - epoch_us(prev_end))
             // 86400000000 AS gap_days,
           count(*) AS n_gaps
         FROM g WHERE prev_end IS NOT NULL
         GROUP BY 1 ORDER BY 1"""),
    // q223: TPC-H Q21 shape — the only-late-supplier multi-exists over
    // one shared flagged relation ("late" = shipped > 90 days after a
    // finished order's date; the synthetic schema has no commit/receipt
    // dates)
    "q223_wait_suppliers" ->
      """WITH L AS (
           SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderstatus = 'F'),
         w AS (SELECT * FROM L WHERE late),
         c AS (
           SELECT w.l_orderkey, w.l_suppkey FROM w
           WHERE EXISTS (SELECT 1 FROM L l2
                         WHERE l2.l_orderkey = w.l_orderkey
                           AND l2.l_suppkey <> w.l_suppkey)
             AND NOT EXISTS (SELECT 1 FROM w w2
                             WHERE w2.l_orderkey = w.l_orderkey
                               AND w2.l_suppkey <> w.l_suppkey))
         SELECT s_suppkey, s_name, count(*) AS n_wait
         FROM c JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY 1, 2
         ORDER BY n_wait DESC, s_suppkey LIMIT 10""",
    // q224: TPC-H Q19 shape — three OR'd brand/size/quantity blocks;
    // revenue on the exact cents·pct grid
    "q224_disjunctive_revenue" ->
      """SELECT count(*) AS n_lines,
           round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
             AS DOUBLE) / 10000.0, 2) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                AND CAST(round(l_quantity, 0) AS BIGINT) BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                AND CAST(round(l_quantity, 0) AS BIGINT) BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                AND CAST(round(l_quantity, 0) AS BIGINT) BETWEEN 20 AND 30)""",
    // q227: TPC-H Q4 shape — EXISTS with a date window ("late" = any
    // line shipped > 30 days after the order date)
    "q227_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
         FROM orders o
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-04-01'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
         GROUP BY 1 ORDER BY 1""",
    // q228: TPC-H Q12 shape — two-branch conditional agg by return flag
    // (the synthetic schema has no l_shipmode)
    "q228_priority_shipmix" ->
      """SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY 1 ORDER BY 1""",
    // q229: TPC-H Q2 shape — correlated per-part min rejoined on
    // equality (ties kept); supply relation derived from lineitem
    // (no partsupp in the synthetic schema); whole-cent display
    "q229_min_cost_supplier" ->
      """WITH ps AS (
           SELECT l_partkey, l_suppkey,
             min(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
               AS supply_cost_c
           FROM lineitem GROUP BY 1, 2),
         mc AS (SELECT l_partkey, min(supply_cost_c) AS min_cost_c
                FROM ps GROUP BY 1)
         SELECT p_partkey, s_suppkey, s_name, n_name,
           CAST(supply_cost_c AS DOUBLE) / 100.0 AS supply_cost
         FROM ps JOIN mc USING (l_partkey)
         JOIN part ON l_partkey = p_partkey AND p_size <= 10
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE supply_cost_c = min_cost_c
         ORDER BY p_partkey, s_suppkey LIMIT 25""",
    // q230: TPC-H Q11 shape — per-part value vs 3/2× the mean part
    // value, cross-multiplied on the integer grid (scale-free where an
    // absolute fraction would zero out as part count grows); share
    // reported as an exact integer floor, value as whole cents
    "q230_important_parts" ->
      """WITH pp AS (
           SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
               AS BIGINT) AS value_c
           FROM lineitem GROUP BY 1),
         t AS (SELECT CAST(sum(value_c) AS BIGINT) AS total_c,
                 count(*) AS n_parts FROM pp)
         SELECT l_partkey, CAST(value_c AS DOUBLE) / 100.0 AS part_value,
           CAST((value_c * 10000) // total_c AS BIGINT) AS share_bp
         FROM pp CROSS JOIN t
         WHERE CAST(value_c AS HUGEINT) * n_parts * 2
             > CAST(total_c AS HUGEINT) * 3
         ORDER BY part_value DESC, l_partkey LIMIT 25""",
    // q236: TPC-H Q20 shape — nested semi chain with the correlated
    // half-of-total threshold cross-multiplied on the integer grid
    "q236_dominant_suppliers" ->
      """WITH sm AS (SELECT p_partkey FROM part
                     WHERE p_name LIKE 'small%'),
         ps AS (
           SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
               AS qty
           FROM lineitem JOIN sm ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1998-01-01'
           GROUP BY 1, 2),
         pt AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS total
                FROM ps GROUP BY 1),
         dom AS (SELECT ps.l_suppkey FROM ps JOIN pt USING (l_partkey)
                 WHERE ps.qty * 2 > pt.total),
         agg AS (SELECT l_suppkey, count(*) AS n_dominated
                 FROM dom GROUP BY 1)
         SELECT s_suppkey, s_name, n_dominated
         FROM agg JOIN supplier ON l_suppkey = s_suppkey
         WHERE n_dominated >= 2
         ORDER BY s_suppkey""",
    // q237: TPC-H Q9 shape — many-join margin rollup on the cent·pct
    // grid (unit cost = retail price; no ps_supplycost in the schema)
    "q237_nation_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           count(*) AS n_lines,
           round(CAST(sum(
             CAST(round(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
             - CAST(round(l_quantity, 0) AS BIGINT)
               * CAST(round(p_retailprice * 100, 0) AS BIGINT) * 100
           ) AS DOUBLE) / 10000.0, 2) AS profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY 1, 2 ORDER BY nation, o_year DESC""",
    // q231: TPC-H Q7 shape — supplier-nation × customer-nation revenue
    // by ship year, cross-nation only, first-5 nations each side
    "q231_nation_volume" ->
      """SELECT s_nationkey AS supp_nation, c_nationkey AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           count(*) AS n_lines,
           round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
             AS DOUBLE) / 10000.0, 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey AND c_nationkey < 5
         JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey < 5
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND s_nationkey <> c_nationkey
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    // q241: TPC-H Q6 shape — discount-band what-if revenue; bands on
    // the data's own 2dp integer grid, revenue exact cents·pct, the
    // one display division left unrounded (boundary-free)
    "q241_discount_revenue" ->
      """SELECT count(*) AS n_lines,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(round(l_discount * 100, 0) AS BIGINT)) AS DOUBLE)
             / 10000.0 AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND CAST(round(l_discount * 100, 0) AS BIGINT) BETWEEN 5 AND 7
           AND CAST(round(l_quantity, 0) AS BIGINT) < 24""",
    // q242: TPC-H Q16 shape — distinct-supplier rollup per (brand,
    // size) with a NOT-IN blocklist (negative-balance suppliers; the
    // schema has no partsupp/s_comment)
    "q242_supplier_diversity" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
           AND p_brand <> 'Brand#45'
           AND l_suppkey NOT IN (
             SELECT s_suppkey FROM supplier
             WHERE CAST(round(s_acctbal * 100, 0) AS BIGINT) < 0)
         GROUP BY 1, 2
         ORDER BY supplier_cnt DESC, p_brand, p_size""",
    // q244: System-R join-cardinality estimation (global + bucketed
    // histogram) audited against the executed join — exact BIGINT,
    // arithmetic key buckets (k mod B; engine hashes differ), error
    // magnitude abs()'d BEFORE the integer division (floor-vs-truncate
    // on negatives differs between engines)
    "q244_join_card_est" ->
      """WITH a AS (SELECT user_id AS k FROM events),
           b AS (SELECT o_custkey AS k FROM orders),
           sa AS (SELECT count(*) AS n_a, count(DISTINCT k) AS v_a FROM a),
           sb AS (SELECT count(*) AS n_b, count(DISTINCT k) AS v_b FROM b),
           act AS (SELECT count(*) AS actual_rows FROM a JOIN b USING (k)),
           ga AS (SELECT k % 64 AS bk, count(*) AS n_ab,
                    count(DISTINCT k) AS v_ab FROM a GROUP BY 1),
           gb AS (SELECT k % 64 AS bk, count(*) AS n_bb,
                    count(DISTINCT k) AS v_bb FROM b GROUP BY 1),
           est AS (
             SELECT 'global' AS method,
               CAST(CAST(n_a AS HUGEINT) * n_b // greatest(v_a, v_b)
                 AS BIGINT) AS est_rows
             FROM sa CROSS JOIN sb
             UNION ALL
             SELECT 'bucketed' AS method,
               CAST(sum(CAST(n_ab AS HUGEINT) * n_bb
                 // greatest(v_ab, v_bb)) AS BIGINT)
             FROM ga JOIN gb USING (bk))
         SELECT method, est_rows, actual_rows,
           est_rows - actual_rows AS diff_rows,
           CAST(abs(est_rows - actual_rows) * 10000 // actual_rows
             AS BIGINT) AS abs_err_bp
         FROM est CROSS JOIN act ORDER BY method""",
    // q250: right-to-be-forgotten propagation audit — per-table direct
    // and transitive reference counts for the deletion cohort, with
    // the integer basis-point purge share
    "q250_delete_audit" ->
      """WITH del AS (SELECT c_custkey FROM customer
                      WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) < 0),
         o AS (SELECT count(*) AS n_rows,
                 CAST(sum(CASE WHEN o_custkey IN
                   (SELECT c_custkey FROM del) THEN 1 ELSE 0 END)
                   AS BIGINT) AS nr
               FROM orders),
         e AS (SELECT count(*) AS n_rows,
                 CAST(sum(CASE WHEN user_id IN
                   (SELECT c_custkey FROM del) THEN 1 ELSE 0 END)
                   AS BIGINT) AS nr
               FROM events),
         delo AS (SELECT o_orderkey FROM orders
                  WHERE o_custkey IN (SELECT c_custkey FROM del)),
         l AS (SELECT count(*) AS n_rows,
                 CAST(sum(CASE WHEN l_orderkey IN
                   (SELECT o_orderkey FROM delo) THEN 1 ELSE 0 END)
                   AS BIGINT) AS nr
               FROM lineitem)
         SELECT * FROM (
           SELECT 'events' AS table_name, n_rows, nr AS n_referencing,
             CAST(nr * 10000 // n_rows AS BIGINT) AS ref_bp FROM e
           UNION ALL
           SELECT 'lineitem', n_rows, nr,
             CAST(nr * 10000 // n_rows AS BIGINT) FROM l
           UNION ALL
           SELECT 'orders', n_rows, nr,
             CAST(nr * 10000 // n_rows AS BIGINT) FROM o)
         ORDER BY table_name""",
    // q254: Benford first-digit screen — integer-exact digit (cents
    // BIGINT → decimal string → first char), literal milli-probability
    // table (PARITY rule 9), absent digits kept at 0 via the LEFT join
    "q254_benford" ->
      """WITH v AS (
           SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0)
             AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
           FROM orders WHERE o_totalprice > 0),
         exp AS (SELECT * FROM (VALUES (1, 301), (2, 176), (3, 125),
           (4, 97), (5, 79), (6, 67), (7, 58), (8, 51), (9, 46))
           AS t(digit, exp_milli)),
         obs AS (SELECT digit, count(*) AS n_obs FROM v GROUP BY 1),
         tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs)
         SELECT e.digit, CAST(coalesce(n_obs, 0) AS BIGINT) AS n_obs,
           CAST(coalesce(n_obs, 0) * 10000 // n AS BIGINT) AS share_bp,
           CAST(e.exp_milli * 10 AS BIGINT) AS exp_bp,
           CAST(abs(CAST(coalesce(n_obs, 0) * 10000 // n AS BIGINT)
             - e.exp_milli * 10) AS BIGINT) AS dev_bp
         FROM exp e LEFT JOIN obs ON e.digit = obs.digit CROSS JOIN tot
         ORDER BY e.digit""",
    // q270: functional-dependency audit over documents — LHS values
    // with >1 RHS value + minimum repair rows (rows outside each LHS's
    // majority RHS); verdict as INT 0/1 (DataQuality.fdAudit)
    "q270_fd_audit" ->
      """WITH pairs AS (
           SELECT 'source->lang' AS fd, source AS a, lang AS b
           FROM documents
           UNION ALL SELECT 'lang->source', lang, source FROM documents
           UNION ALL SELECT 'doc_id->source', CAST(doc_id AS VARCHAR),
             source FROM documents),
         per_a AS (
           SELECT fd, a, CAST(sum(cnt_b) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_b,
             CAST(max(cnt_b) AS BIGINT) AS max_b
           FROM (SELECT fd, a, b, count(*) AS cnt_b FROM pairs
             GROUP BY 1, 2, 3)
           GROUP BY 1, 2)
         SELECT fd, CAST(count(*) AS BIGINT) AS n_lhs,
           CAST(sum(CASE WHEN n_b > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS viol_lhs,
           CAST(sum(n_rows) AS BIGINT) AS total_rows,
           CAST(sum(n_rows - max_b) AS BIGINT) AS viol_rows,
           CAST(CASE WHEN sum(CASE WHEN n_b > 1 THEN 1 ELSE 0 END) = 0
             THEN 1 ELSE 0 END AS INT) AS holds
         FROM per_a GROUP BY fd ORDER BY fd""",
    // q303: whale-dependence trend — monthly revenue share from the
    // lifetime top-decile spenders (CoreQueries.q303WhaleShareTrend)
    "q303_whale_trend" ->
      """WITH cs AS (SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
               AS BIGINT) AS spend_c
           FROM orders GROUP BY 1),
         rk AS (SELECT o_custkey,
             row_number() OVER (ORDER BY spend_c DESC, o_custkey) AS r,
             (SELECT CAST(count(*) AS BIGINT) FROM cs) AS n FROM cs),
         whales AS (SELECT o_custkey FROM rk WHERE r * 10 <= n),
         m AS (SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE)
               AS mth,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
               AS BIGINT) AS rev_c,
             CAST(sum(CASE WHEN w.o_custkey IS NOT NULL
               THEN CAST(round(o.o_totalprice * 100, 0) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS whale_c
           FROM orders o LEFT JOIN whales w
             ON o.o_custkey = w.o_custkey
           GROUP BY 1)
         SELECT mth, rev_c, whale_c,
           CAST(CAST(whale_c AS HUGEINT) * 10000 // rev_c AS BIGINT)
             AS whale_share_bp
         FROM m ORDER BY mth""",
    // q300: daily bounce rate on the shared session CTE
    // (CoreQueries.q300BounceRate)
    "q300_bounce_rate" ->
      ("WITH " + sessionsCte + """
         SELECT CAST(date_trunc('day', session_start) AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_bounces,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 10000
             // count(*) AS BIGINT) AS bounce_bp
         FROM sess GROUP BY 1 ORDER BY 1"""),
    // q301: demand-spike screen — peak monthly quantity > 2× own mean
    // on cross-multiplied integers (CoreQueries.q301DemandSpikes)
    "q301_demand_spikes" ->
      """WITH d AS (SELECT l_partkey AS pk,
             CAST(date_trunc('month', l_shipdate) AS DATE) AS mth,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
           FROM lineitem GROUP BY 1, 2),
         s AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_months,
             CAST(sum(q) AS HUGEINT) AS sq, CAST(max(q) AS BIGINT)
               AS maxq
           FROM d GROUP BY 1)
         SELECT CAST(pk AS BIGINT) AS partkey, n_months,
           CAST(sq AS BIGINT) AS total_qty, maxq,
           CAST(CAST(maxq AS HUGEINT) * n_months * 1000000 // sq
             AS BIGINT) AS peak_over_mean_ppm
         FROM s WHERE n_months >= 6
           AND CAST(maxq AS HUGEINT) * n_months > 2 * sq
         ORDER BY peak_over_mean_ppm DESC, partkey LIMIT 25""",
    // q302: unshipped-order aging report — left_anti the shipped keys,
    // age buckets at the last-ship-date snapshot
    // (CoreQueries.q302AgingReport)
    "q302_aging_report" ->
      """WITH snap AS (SELECT CAST(max(CAST(l_shipdate AS DATE))
             AS DATE) AS asof FROM lineitem),
         shipped AS (SELECT DISTINCT l_orderkey AS ok FROM lineitem),
         open_orders AS (
           SELECT o.o_orderpriority,
             CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS price_c,
             datediff('day', CAST(o.o_orderdate AS DATE), s.asof)
               AS age_d
           FROM orders o CROSS JOIN snap s
           WHERE NOT EXISTS (SELECT 1 FROM shipped
             WHERE shipped.ok = o.o_orderkey)),
         b AS (SELECT o_orderpriority,
             CASE WHEN age_d <= 30 THEN '0-30'
                  WHEN age_d <= 90 THEN '31-90'
                  WHEN age_d <= 365 THEN '91-365'
                  ELSE '365+' END AS age_bucket,
             price_c FROM open_orders)
         SELECT o_orderpriority, age_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(price_c) AS BIGINT) AS open_value_c
         FROM b GROUP BY 1, 2 ORDER BY 1, 2""",
    // q295: nation revenue with share-of-region and share-of-total
    // (CoreQueries.q295RegionNationShare)
    "q295_region_share" ->
      """WITH nr AS (
           SELECT n.n_regionkey AS rk, n.n_name AS nation,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
               AS BIGINT) AS rev_c
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           GROUP BY 1, 2),
         rr AS (SELECT rk, CAST(sum(CAST(rev_c AS HUGEINT)) AS HUGEINT)
             AS region_c FROM nr GROUP BY 1),
         tt AS (SELECT CAST(sum(CAST(rev_c AS HUGEINT)) AS HUGEINT)
             AS total_c FROM nr)
         SELECT r.r_name AS region, nr.nation, nr.rev_c,
           CAST(CAST(nr.rev_c AS HUGEINT) * 10000 // rr.region_c
             AS BIGINT) AS share_of_region_bp,
           CAST(CAST(nr.rev_c AS HUGEINT) * 10000 // tt.total_c
             AS BIGINT) AS share_of_total_bp
         FROM nr JOIN rr ON nr.rk = rr.rk
         JOIN region r ON nr.rk = r.r_regionkey, tt
         ORDER BY region, nation""",
    // q296: supplier-lateness Pareto — cum share of >90-day-late lines
    // with the 80%-band flag (CoreQueries.q296LatenessPareto)
    "q296_lateness_pareto" ->
      """WITH late AS (
           SELECT l.l_suppkey AS sk, CAST(count(*) AS BIGINT) AS n_late
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           WHERE datediff('day', CAST(o.o_orderdate AS DATE),
             CAST(l.l_shipdate AS DATE)) > 90
           GROUP BY 1),
         rk AS (SELECT sk, n_late,
             CAST(sum(CAST(n_late AS HUGEINT)) OVER (
               ORDER BY n_late DESC, sk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS HUGEINT) AS cum,
             row_number() OVER (ORDER BY n_late DESC, sk) AS r,
             (SELECT CAST(sum(CAST(n_late AS HUGEINT)) AS HUGEINT)
               FROM late) AS tot,
             (SELECT CAST(count(*) AS BIGINT) FROM late) AS n_sup
           FROM late)
         SELECT CAST(sk AS BIGINT) AS suppkey, n_late,
           CAST(cum * 10000 // tot AS BIGINT) AS cum_share_bp,
           CAST(CAST(r AS HUGEINT) * 10000 // n_sup AS BIGINT)
             AS supplier_pctl_bp,
           CAST(CASE WHEN cum * 10 <= tot * 8 THEN 1 ELSE 0 END AS INT)
             AS in_top80
         FROM rk ORDER BY n_late DESC, suppkey LIMIT 25""",
    // q289: month-of-year seasonality over the 7-year orders history
    // — shares floored to bp on HUGEINT (CoreQueries.q289MonthSeasonality)
    "q289_month_seasonality" ->
      """WITH m AS (SELECT CAST(month(CAST(o_orderdate AS DATE)) AS INT)
             AS moy,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             AS BIGINT) AS rev_c
           FROM orders GROUP BY 1),
         t AS (SELECT CAST(sum(n_orders) AS HUGEINT) AS tot_n,
             CAST(sum(CAST(rev_c AS HUGEINT)) AS HUGEINT) AS tot_r
           FROM m)
         SELECT moy, n_orders, rev_c,
           CAST(CAST(n_orders AS HUGEINT) * 10000 // tot_n AS BIGINT)
             AS order_share_bp,
           CAST(CAST(rev_c AS HUGEINT) * 10000 // tot_r AS BIGINT)
             AS rev_share_bp
         FROM m, t ORDER BY moy""",
    // q291: ABC × XYZ planning matrix — Pareto revenue cut × integer
    // CV² variability cut on exact monthly-demand moments
    // (CoreQueries.q291AbcXyz)
    "q291_abc_xyz" ->
      """WITH d AS (SELECT l_partkey AS pk,
             CAST(date_trunc('month', l_shipdate) AS DATE) AS mth,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
           FROM lineitem GROUP BY 1, 2),
         stats AS (SELECT pk, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(q) AS HUGEINT) AS s1,
             CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS s2
           FROM d GROUP BY 1),
         rev AS (SELECT l_partkey AS pk,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
               AS BIGINT) AS rev_c
           FROM lineitem GROUP BY 1),
         rk AS (SELECT pk, rev_c,
             CAST(sum(CAST(rev_c AS HUGEINT)) OVER (
               ORDER BY rev_c DESC, pk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS HUGEINT) AS cum_c,
             (SELECT CAST(sum(CAST(rev_c AS HUGEINT)) AS HUGEINT)
               FROM rev) AS tot_c
           FROM rev),
         abc AS (SELECT pk, CASE WHEN cum_c * 10 <= tot_c * 8 THEN 'A'
             WHEN cum_c * 100 <= tot_c * 95 THEN 'B' ELSE 'C' END
             AS abc_class FROM rk),
         xyz AS (SELECT pk, CASE
             WHEN (n * s2 - s1 * s1) * 4 <= s1 * s1 THEN 'X'
             WHEN n * s2 - s1 * s1 <= s1 * s1 THEN 'Y' ELSE 'Z' END
             AS xyz_class FROM stats)
         SELECT abc.abc_class, xyz.xyz_class,
           CAST(count(*) AS BIGINT) AS n_parts
         FROM abc JOIN xyz ON abc.pk = xyz.pk
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // q285: argmax-by-struct top supplier per nation — max over the
    // (rev, suppkey) total order, cent·pct revenue grid
    // (CoreQueries.q285TopSupplier)
    "q285_top_supplier" ->
      """WITH sr AS (
           SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
             CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
               AS BIGINT) AS rev_cp
           FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
           GROUP BY 1, 2),
         am AS (
           SELECT nationkey,
             max({'rev_cp': rev_cp, 'suppkey': suppkey}) AS top,
             CAST(count(*) AS BIGINT) AS n_suppliers
           FROM sr GROUP BY 1)
         SELECT n.n_name AS nation,
           CAST(am.top.suppkey AS BIGINT) AS top_suppkey,
           CAST(am.top.rev_cp AS BIGINT) AS top_rev_cp, am.n_suppliers
         FROM am JOIN nation n ON am.nationkey = n.n_nationkey
         ORDER BY 1""",
    // q284: customer-spend Lorenz deciles — exact-rank deciles over
    // the (spend, custkey) total order, shares floored to bp on
    // HUGEINT (CoreQueries.q284LorenzDeciles)
    "q284_lorenz_deciles" ->
      """WITH cs AS (SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
               AS BIGINT) AS spend_c
           FROM orders GROUP BY 1),
         rk AS (SELECT spend_c,
             row_number() OVER (ORDER BY spend_c, o_custkey) AS r,
             (SELECT CAST(count(*) AS BIGINT) FROM cs) AS n,
             (SELECT CAST(sum(CAST(spend_c AS HUGEINT)) AS HUGEINT)
               FROM cs) AS tot
           FROM cs),
         d AS (SELECT least(((r - 1) * 10) // n, 9) AS decile,
             spend_c, tot FROM rk)
         SELECT CAST(decile AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(spend_c) AS BIGINT) AS spend_c,
           CAST(CAST(sum(CAST(spend_c AS HUGEINT)) * 10000 AS HUGEINT)
             // max(tot) AS BIGINT) AS share_bp
         FROM d GROUP BY 1 ORDER BY 1""",
    // q275: GROUPING SETS four-cut revenue panel with per-column
    // grouping flags (CoreQueries.q275GroupingSets)
    "q275_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
             AS BIGINT) AS rev_c
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
           (l_returnflag, l_linestatus), ())
         ORDER BY g_flag, g_status, l_returnflag, l_linestatus""",
    // q278: daily open-order backlog ledger — cumulative opened minus
    // completed (last line shipped) over the calendar-bounded day grid
    // (CoreQueries.q278BacklogLedger)
    "q278_backlog_ledger" ->
      """WITH opened AS (
           SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_opened
           FROM orders GROUP BY 1),
         closed_d AS (
           SELECT day, CAST(count(*) AS BIGINT) AS n_closed FROM (
             SELECT CAST(max(CAST(l_shipdate AS DATE)) AS DATE) AS day
             FROM lineitem GROUP BY l_orderkey)
           GROUP BY 1),
         grid AS (
           SELECT coalesce(o.day, c.day) AS day,
             coalesce(o.n_opened, 0) AS n_opened,
             coalesce(c.n_closed, 0) AS n_closed
           FROM opened o FULL OUTER JOIN closed_d c ON o.day = c.day)
         SELECT day, n_opened, n_closed,
           CAST(sum(n_opened - n_closed) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS backlog
         FROM grid ORDER BY day""",
    // q271: k-anonymity / l-diversity audit on the (nation, segment)
    // quasi-identifier with the acctbal band sensitive attribute
    // (DataQuality.kAnonymityOn)
    "q271_k_anonymity" ->
      """WITH qi AS (
           SELECT c_nationkey AS nation, c_mktsegment AS seg,
             CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 5000 THEN 'low'
                  ELSE 'high' END AS sens
           FROM customer),
         grp AS (
           SELECT nation, seg, CAST(count(*) AS BIGINT) AS k_size,
             CAST(count(DISTINCT sens) AS BIGINT) AS l_div
           FROM qi GROUP BY 1, 2)
         SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(k_size) AS BIGINT) AS k_anonymity,
           CAST(min(l_div) AS BIGINT) AS l_diversity,
           CAST(sum(CASE WHEN k_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_k5,
           CAST(sum(CASE WHEN k_size < 5 THEN k_size ELSE 0 END)
             AS BIGINT) AS rows_at_risk_k5,
           CAST(sum(CASE WHEN l_div < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_l2,
           CAST(sum(CASE WHEN l_div < 2 THEN k_size ELSE 0 END)
             AS BIGINT) AS rows_at_risk_l2
         FROM grp""",
    // q273: the correlated scalar-subquery form — the oracle states
    // the correlation; the Spark side ships the decorrelated
    // one-exchange plan (CoreQueries.q273AboveCustomerAvg)
    "q273_above_cust_avg" ->
      """WITH o AS (
           SELECT o_custkey,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_c
           FROM orders)
         SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_above,
           CAST(max(price_c) AS BIGINT) AS max_price_c
         FROM o
         -- price > floor(mean) === price*n > sum for integers (proof:
         -- write sum = q*n + r, 0 <= r < n; both sides reduce to
         -- price > q), so the correlated floor-div form is EXACTLY the
         -- Spark side's cross-multiplied comparison — no FP mean
         WHERE CAST(price_c AS HUGEINT) >
           (SELECT sum(CAST(o2.price_c AS HUGEINT)) // count(*)
            FROM o o2 WHERE o2.o_custkey = o.o_custkey)
         GROUP BY 1 HAVING count(*) >= 3 ORDER BY custkey""",
    // q260: perfect-order rate — order-level max-flag fold (one bad
    // line fails the whole order), 5-key priority rollup, bp share
    "q260_perfect_orders" ->
      """WITH flags AS (
           SELECT o_orderkey, o_orderpriority,
             max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS any_return,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                 THEN 1 ELSE 0 END) AS any_late
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           GROUP BY 1, 2)
         SELECT o_orderpriority AS priority, count(*) AS n_orders,
           CAST(sum(CASE WHEN any_return = 0 AND any_late = 0
             THEN 1 ELSE 0 END) AS BIGINT) AS n_perfect,
           CAST(sum(CASE WHEN any_return = 0 AND any_late = 0
             THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT)
             AS perfect_bp
         FROM flags GROUP BY 1 ORDER BY 1""",
    // q262: per-brand ABC Pareto classes — cross-multiplied integer
    // boundaries, cumulative/total on HUGEINT (rule 13 at design time)
    "q262_abc_classes" ->
      """WITH pr AS (
           SELECT p_brand, l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
               AS BIGINT) AS rev_cp
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY 1, 2),
         c AS (
           SELECT p_brand, l_partkey, rev_cp,
             CAST(sum(rev_cp) OVER (PARTITION BY p_brand
               ORDER BY rev_cp DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS HUGEINT) AS cum_cp,
             CAST(sum(rev_cp) OVER (PARTITION BY p_brand) AS HUGEINT)
               AS tot_cp
           FROM pr),
         cls AS (
           SELECT p_brand, rev_cp,
             CASE WHEN cum_cp * 100 <= tot_cp * 80 THEN 'A'
                  WHEN cum_cp * 100 <= tot_cp * 95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             tot_cp
           FROM c)
         SELECT p_brand, abc_class, count(*) AS n_parts,
           CAST(CAST(sum(rev_cp) AS HUGEINT) * 10000 // max(tot_cp)
             AS BIGINT) AS share_bp
         FROM cls GROUP BY 1, 2 ORDER BY 1, 2""",
    // q330: declarative DQ expectation panel — one row per check
    // (not-null / enum / range via conditional aggregates, uniqueness
    // via surplus copies, FK via orphan counts); the lineitem
    // uniqueness expectation genuinely fails on the synthetic data
    "q330_dq_suite" ->
      """WITH rows_o AS (
           SELECT count(*)::BIGINT AS n,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS nn,
             CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P')
                            OR o_orderstatus IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS en,
             CAST(sum(CASE WHEN o_totalprice <= 0.0
                            OR o_totalprice > 1000000.0
                      THEN 1 ELSE 0 END) AS BIGINT) AS rg
           FROM orders),
         rows_l AS (
           SELECT count(*)::BIGINT AS n,
             CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS nn,
             CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R')
                            OR l_returnflag IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS av,
             CAST(sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0
                      THEN 1 ELSE 0 END) AS BIGINT) AS rg
           FROM lineitem),
         rows_e AS (
           SELECT count(*)::BIGINT AS n,
             CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS nn,
             CAST(sum(CASE WHEN event_type NOT IN
                       ('click','error','purchase','signup','view')
                            OR event_type IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS en
           FROM events),
         uq_o AS (SELECT count(*)::BIGINT AS n,
             CAST(sum(c - 1) AS BIGINT) AS v FROM
           (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)),
         uq_l AS (SELECT count(*)::BIGINT AS n,
             CAST(sum(c - 1) AS BIGINT) AS v FROM
           (SELECT count(*) AS c FROM lineitem
            GROUP BY l_orderkey, l_linenumber)),
         uq_e AS (SELECT count(*)::BIGINT AS n,
             CAST(sum(c - 1) AS BIGINT) AS v FROM
           (SELECT count(*) AS c FROM events GROUP BY event_id)),
         fr_e AS (SELECT count(*)::BIGINT AS n,
             CAST(sum(CASE WHEN
                 epoch_us((SELECT max(ts) FROM events)) - epoch_us(mx)
                   > 24 * 3600 * 1000000::BIGINT
               THEN 1 ELSE 0 END) AS BIGINT) AS v
           FROM (SELECT event_type, max(ts) AS mx FROM events
                 GROUP BY 1)),
         fk_o AS (SELECT (SELECT count(*) FROM orders)::BIGINT AS n,
           (SELECT count(*) FROM orders o LEFT JOIN customer c
              ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL)::BIGINT AS v),
         fk_l AS (SELECT (SELECT count(*) FROM lineitem)::BIGINT AS n,
           (SELECT count(*) FROM lineitem l LEFT JOIN
              (SELECT DISTINCT o_orderkey FROM orders) o
              ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL)::BIGINT AS v),
         panel AS (
           SELECT 'orders' AS tbl, 'not_null_o_orderkey' AS chk,
             n AS n_checked, nn AS n_violations FROM rows_o
           UNION ALL SELECT 'orders', 'enum_o_orderstatus', n, en FROM rows_o
           UNION ALL SELECT 'orders', 'range_o_totalprice', n, rg FROM rows_o
           UNION ALL SELECT 'orders', 'unique_o_orderkey', n, v FROM uq_o
           UNION ALL SELECT 'orders', 'fk_o_custkey_to_c_custkey', n, v
             FROM fk_o
           UNION ALL SELECT 'lineitem', 'not_null_l_orderkey', n, nn
             FROM rows_l
           UNION ALL SELECT 'lineitem', 'accepted_l_returnflag', n, av
             FROM rows_l
           UNION ALL SELECT 'lineitem', 'range_l_quantity', n, rg FROM rows_l
           UNION ALL SELECT 'lineitem', 'unique_l_orderkey_l_linenumber',
             n, v FROM uq_l
           UNION ALL SELECT 'lineitem', 'fk_l_orderkey_to_o_orderkey', n, v
             FROM fk_l
           UNION ALL SELECT 'events', 'not_null_event_id', n, nn FROM rows_e
           UNION ALL SELECT 'events', 'enum_event_type', n, en FROM rows_e
           UNION ALL SELECT 'events', 'unique_event_id', n, v FROM uq_e
           UNION ALL SELECT 'events', 'fresh_event_type_ts', n, v
             FROM fr_e)
         SELECT tbl, chk, n_checked, n_violations,
           CAST(n_violations = 0 AS INT) AS pass
         FROM panel ORDER BY tbl, chk""",
    // q355: quarantine round-trip — the engine WRITES the clean table
    // + the __quarantine partition through Sinks and reads the files
    // back; the oracle replays the first-failing-check split
    // relationally. Any misrouted/doubled/lost row flips the XOR
    "q355_quarantine_audit" ->
      """WITH m AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS nc,
             CASE WHEN n_chars < 200 THEN 'short_text'
                  WHEN lang = 'zh' THEN 'lang_zh_holdout'
                  ELSE 'kept' END AS bucket
           FROM documents)
         SELECT bucket, count(*)::BIGINT AS n_docs,
           CAST(sum(nc) AS BIGINT) AS total_chars,
           CAST(bit_xor(doc_id) AS BIGINT) AS id_xor
         FROM m GROUP BY 1 ORDER BY 1""",
    // q342: calendar densification + LOCF forward fill — dense per-brand
    // daily mean-price series (per-brand calendar spine, last-observed
    // fill), monthly rollup with observed/filled counts
    "q342_gap_fill" ->
      """WITH daily AS MATERIALIZED (
           SELECT p.p_brand AS brand, CAST(l.l_shipdate AS DATE) AS day,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
               // count(*) AS BIGINT) AS price_c
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           GROUP BY 1, 2),
         top3 AS (SELECT brand, min(day) AS d0, max(day) AS d1
           FROM daily GROUP BY 1
           ORDER BY sum(price_c) DESC, brand LIMIT 3),
         cal AS (SELECT brand,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
               AS DATE) AS day
           FROM top3),
         filled AS (SELECT c.brand, c.day,
             CASE WHEN d.price_c IS NOT NULL THEN 1 ELSE 0 END AS obs,
             last_value(d.price_c IGNORE NULLS) OVER (
               PARTITION BY c.brand ORDER BY c.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS fill_c
           FROM cal c LEFT JOIN daily d USING (brand, day))
         SELECT brand, date_trunc('month', day) AS month,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(obs) AS BIGINT) AS n_obs,
           CAST(count(*) - sum(obs) AS BIGINT) AS n_filled,
           max_by(fill_c, day) AS eom_price_c,
           CAST(sum(fill_c) // count(*) AS BIGINT) AS mean_price_c
         FROM filled GROUP BY 1, 2 ORDER BY 1, 2""",
    // q350: column-entropy storage panel — value-distribution Shannon
    // entropy vs the uniform dictionary bound per candidate column,
    // engine-stable casts only (q67 float-log device, 4dp)
    "q350_column_entropy" ->
      """WITH u AS (
           SELECT 'linestatus' AS col_name, l_linestatus AS v
             FROM lineitem
           UNION ALL SELECT 'partkey', CAST(l_partkey AS VARCHAR)
             FROM lineitem
           UNION ALL SELECT 'quantity',
             CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) FROM lineitem
           UNION ALL SELECT 'returnflag', l_returnflag FROM lineitem
           UNION ALL SELECT 'shipdate',
             CAST(CAST(l_shipdate AS DATE) AS VARCHAR) FROM lineitem),
         c AS (SELECT col_name, v, count(*) AS c FROM u GROUP BY 1, 2),
         n AS (SELECT col_name, CAST(sum(c) AS BIGINT) AS n FROM c
           GROUP BY 1)
         SELECT c.col_name, max(n.n) AS n_values,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(-sum((c.c * 1.0 / n.n) * log2(c.c * 1.0 / n.n))
             + 0.0, 4) AS entropy_bits,
           round(log2(count(*)), 4) AS uniform_bits
         FROM c JOIN n USING (col_name) GROUP BY 1 ORDER BY 1""",
    // q343: gaps-and-islands interval merge — per-supplier ordered
    // sweep (running-max end, new-island flag, island-id running sum),
    // then island and supplier rollups
    "q343_interval_islands" ->
      """WITH iv AS (SELECT l.l_suppkey AS suppkey,
             CAST(o.o_orderdate AS DATE) AS s,
             CAST(l.l_shipdate AS DATE) AS e,
             l.l_orderkey * 10 + l.l_linenumber AS tie
           FROM lineitem l JOIN orders o
             ON l.l_orderkey = o.o_orderkey),
         flagged AS (SELECT suppkey, s, e,
             CASE WHEN max(e) OVER (PARTITION BY suppkey
                 ORDER BY s, e, tie
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               IS NULL OR s > max(e) OVER (PARTITION BY suppkey
                 ORDER BY s, e, tie
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS new_island,
             tie
           FROM iv),
         isl AS (SELECT suppkey, s, e,
             sum(new_island) OVER (PARTITION BY suppkey
               ORDER BY s, e, tie
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
           FROM flagged),
         per_isl AS (SELECT suppkey, island,
             CAST(count(*) AS BIGINT) AS n_iv,
             CAST(date_diff('day', min(s), max(e)) + 1 AS BIGINT)
               AS days
           FROM isl GROUP BY 1, 2)
         SELECT suppkey, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(days) AS BIGINT) AS covered_days,
           CAST(max(days) AS BIGINT) AS max_island_days
         FROM per_isl GROUP BY 1 ORDER BY 1""",
  )
}
