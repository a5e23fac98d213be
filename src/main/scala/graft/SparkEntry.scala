package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.CoreQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator row from SURVEY.md §2,
  * re-expressed Spark-first over the testdata star schema; [[oracleSql]]
  * holds the DuckDB-ANSI equivalent the driver hash-compares against at
  * sf0.01. Column names and ordering are aligned on both sides
  * (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q02TopNations(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (CoreQueries.q01PricingSummary _),
    "q02_top_nations"     -> (CoreQueries.q02TopNations _),
    "q03_union_all"       -> (CoreQueries.q03UnionAll _),
    "q04_union_by_name"   -> (CoreQueries.q04UnionByName _),
    "q05_project_cast"    -> (CoreQueries.q05ProjectCast _),
    "q06_filter_notnull"  -> (CoreQueries.q06FilterNotNull _),
    "q07_filter_eq"       -> (CoreQueries.q07FilterEq _),
    "q08_case_like_split" -> (CoreQueries.q08CaseLikeSplit _),
    "q09_dates_dim"       -> (CoreQueries.q09DatesDim _),
    "q10_distinct"        -> (CoreQueries.q10Distinct _),
    "q11_dedup_rows"      -> (CoreQueries.q11DedupRows _),
    "q12_minmax"          -> (CoreQueries.q12MinMax _),
    "q13_null_counts"     -> (CoreQueries.q13NullCounts _),
    "q14_topk_freq"       -> (CoreQueries.q14TopkFreq _),
    "q15_count_distinct"  -> (CoreQueries.q15CountDistinct _),
    "q16_null_rate"       -> (CoreQueries.q16NullRate _),
    "q17_join_left"       -> (CoreQueries.q17JoinLeft _),
    "q18_semi_join"       -> (CoreQueries.q18SemiJoin _),
    "q19_anti_join"       -> (CoreQueries.q19AntiJoin _),
    "q20_window_rank"     -> (CoreQueries.q20WindowRank _),
    "q21_row_number"      -> (CoreQueries.q21RowNumber _),
    "q22_sas_date"        -> (CoreQueries.q22SasDate _),
    "q23_flex_date"       -> (CoreQueries.q23FlexDate _),
    "q24_port_split"      -> (CoreQueries.q24PortSplit _),
    "q25_events_daily"    -> (CoreQueries.q25EventsDaily _),
    "q26_avg_delay"       -> (CoreQueries.q26AvgDelay _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
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
  )
}
