package graft.oracle

import OracleCtes._

/** DuckDB oracle SQL — events + graph: funnels, sessions, cohorts, OHLC, PMI/PageRank/triangles/k-core. One entry per SparkEntry.queries
  * key in this family; strings byte-identical to the pre-split
  * SparkEntry registry (round-9 reviewability split).
  */
private[graft] object EventOracles {

  /** The q286 power iteration as `iters` generated MATERIALIZED CTE
    * rounds (the q173 rule — rounds cannot be hand-mistyped), each
    * applying the identical per-term floor `(m·c) // tot` on HUGEINT
    * that the Spark side takes on decimal(38,0).
    */
  private def markovStationarySql(iters: Int): String = {
    val head = """WITH tr AS MATERIALIZED (
           SELECT prev_t AS i, event_type AS j,
             CAST(count(*) AS BIGINT) AS c
           FROM (SELECT event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS prev_t
                 FROM events)
           WHERE prev_t IS NOT NULL GROUP BY 1, 2),
         rt AS MATERIALIZED (SELECT i, CAST(sum(c) AS BIGINT) AS tot
           FROM tr GROUP BY 1),
         v0 AS (SELECT DISTINCT event_type AS t,
           CAST(200000 AS BIGINT) AS m FROM events)"""
    val rounds = (1 to iters).map { r =>
      s""",
         v$r AS MATERIALIZED (
           SELECT tr.j AS t,
             CAST(sum((CAST(v${r - 1}.m AS HUGEINT) * tr.c) // rt.tot)
               AS BIGINT) AS m
           FROM v${r - 1} JOIN tr ON v${r - 1}.t = tr.i
             JOIN rt ON tr.i = rt.i
           GROUP BY 1)"""
    }.mkString
    head + rounds + s"""
         SELECT t AS event_type, m AS stationary_ppm FROM v$iters
         ORDER BY t"""
  }

  val sql: Map[String, String] = Map(
    // q103: ordered conversion funnel — stage n = earliest stage-n event
    // strictly after the user's stage-(n-1) time; integer counts, one
    // 4dp division by the stage-1 count
    "q103_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                     WHERE event_type = 'signup' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
         s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1),
         s4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                JOIN s3 ON e.user_id = s3.user_id
                WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1),
         c AS (
           SELECT 1 AS stage, 'signup' AS event_type, count(*) AS n_users
             FROM s1
           UNION ALL SELECT 2, 'view', count(*) FROM s2
           UNION ALL SELECT 3, 'click', count(*) FROM s3
           UNION ALL SELECT 4, 'purchase', count(*) FROM s4)
         SELECT CAST(stage AS INT) AS stage, event_type, n_users,
           round(CAST(n_users AS DOUBLE) / t.n_top, 4) AS pct_of_top
         FROM c CROSS JOIN
           (SELECT n_users AS n_top FROM c WHERE stage = 1) t
         ORDER BY stage""",
    // q104: weekly cohort retention — day arithmetic on DATEs, integer
    // floor-div weeks (non-negative), one 4dp division per cell
    "q104_cohort_retention" ->
      """WITH wk AS (SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
               // 7 AS INT) AS week
           FROM events),
         co AS (SELECT user_id, min(week) AS cohort_week
                FROM wk GROUP BY 1),
         sz AS (SELECT cohort_week, count(*) AS cohort_users
                FROM co GROUP BY 1),
         act AS (SELECT co.cohort_week,
                   CAST(wk.week - co.cohort_week AS INT) AS week_offset,
                   count(*) AS n_active
                 FROM wk JOIN co ON wk.user_id = co.user_id GROUP BY 1, 2)
         SELECT act.cohort_week, act.week_offset, act.n_active,
           round(CAST(act.n_active AS DOUBLE) / sz.cohort_users, 4)
             AS retention
         FROM act JOIN sz ON act.cohort_week = sz.cohort_week
         ORDER BY 1, 2""",
    // q106: last-touch attribution — running last-click window per user
    // ((ts, event_id) total order), µs-epoch integer latency, null
    // attribution kept for click-less purchases
    "q106_attribution" ->
      """SELECT event_id AS purchase_id, user_id, click_id,
           epoch_us(ts) - epoch_us(click_ts) AS latency_us
         FROM (
           SELECT event_id, user_id, event_type, ts,
             last_value(CASE WHEN event_type = 'click' THEN event_id END
               IGNORE NULLS) OVER w AS click_id,
             last_value(CASE WHEN event_type = 'click' THEN ts END
               IGNORE NULLS) OVER w AS click_ts
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         WHERE event_type = 'purchase' ORDER BY purchase_id""",
    // q107: item co-occurrence PMI — integer user-set counts, ln of an
    // integer-valued double ratio rounded 6dp, total (pmi, i, j) order.
    // The grid replays the engine's deterministic per-user top-500 item
    // cap (rank by event count DESC, item ASC — lossless here: sf0.1
    // max per-user activity is 67)
    "q107_item_pmi" ->
      """WITH grid AS (SELECT user_id,
             CAST(json_extract_string(props, '$.k') AS INT) AS item,
             count(*) AS n_ev
           FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
           GROUP BY 1, 2),
         ui AS (SELECT user_id, item FROM (
             SELECT user_id, item, row_number() OVER (PARTITION BY user_id
               ORDER BY n_ev DESC, item) AS rk FROM grid)
           WHERE rk <= 500),
         pairs AS (SELECT a.item AS item_i, b.item AS item_j,
             count(*) AS n_ij
           FROM ui a JOIN ui b ON a.user_id = b.user_id
             AND a.item < b.item
           GROUP BY 1, 2 HAVING count(*) >= 5),
         marg AS (SELECT item, count(*) AS n_u FROM ui GROUP BY 1),
         st AS (SELECT count(DISTINCT user_id) AS n_users FROM ui)
         SELECT item_i, item_j, n_ij,
           round(ln((CAST(n_ij AS DOUBLE) * CAST(st.n_users AS DOUBLE)) /
             (CAST(mi.n_u AS DOUBLE) * CAST(mj.n_u AS DOUBLE))), 6) + 0.0
             AS pmi
         FROM pairs
         JOIN marg mi ON pairs.item_i = mi.item
         JOIN marg mj ON pairs.item_j = mj.item
         CROSS JOIN st
         ORDER BY pmi DESC, item_i, item_j LIMIT 25""",
    // q110: rolling 7-day active users — the sliding DISTINCT expressed
    // as a ≤7-day fan-out then plain per-day distinct counts; integer
    // day arithmetic, one 4dp division
    "q110_rolling_active" ->
      """WITH act AS (SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS INT) AS day
           FROM events),
         con AS (SELECT user_id,
             CAST(unnest(range(day, day + 7)) AS INT) AS wday FROM act),
         wau AS (SELECT wday, count(DISTINCT user_id) AS wau7
                 FROM con GROUP BY 1),
         dau AS (SELECT day, count(DISTINCT user_id) AS dau
                 FROM act GROUP BY 1)
         SELECT dau.day, dau.dau, wau.wau7,
           round(CAST(dau.dau AS DOUBLE) / wau.wau7, 4) AS stickiness
         FROM dau JOIN wau ON dau.day = wau.wday ORDER BY 1""",
    // q112: daily-volume anomaly z-scores — integer window sums only
    // (order-free), closed-form mean/variance, correctly-rounded sqrt,
    // 4dp round with the signed-zero normalization; null z on
    // zero-variance baselines
    "q112_daily_anomaly" ->
      """WITH daily AS (SELECT
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS INT) AS day, count(*) AS n
           FROM events GROUP BY 1),
         w AS (SELECT day, n,
             count(n) OVER win AS cnt7,
             CAST(sum(n) OVER win AS BIGINT) AS sum7,
             CAST(sum(n * n) OVER win AS BIGINT) AS sumsq7
           FROM daily
           WINDOW win AS (ORDER BY day
             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
         SELECT day, n, z,
           CASE WHEN z IS NULL THEN CAST(NULL AS INT)
                WHEN abs(z) > 2.0 THEN 1 ELSE 0 END AS is_anomaly
         FROM (
           SELECT day, n,
             CASE WHEN 7 * sumsq7 - sum7 * sum7 = 0 THEN NULL
               ELSE round((CAST(n AS DOUBLE) - CAST(sum7 AS DOUBLE) / 7.0) /
                 sqrt(CAST(7 * sumsq7 - sum7 * sum7 AS DOUBLE) / 42.0), 4)
                 + 0.0 END AS z
           FROM w WHERE cnt7 = 7)
         ORDER BY day""",
    // q113: fixed-point integer PageRank, 3 unrolled damped iterations —
    // floor-division billionths everywhere, so every cell is exact
    // integer math on both engines; (rank_q DESC, item) total order
    "q113_pagerank" -> {
      def iter(prev: String, cur: String) =
        s"""$cur AS (SELECT n.item, n.n_nodes,
             CAST((15 * (1000000000 // n.n_nodes)) // 100
               + (85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS r
           FROM nn n LEFT JOIN (
             SELECT e.dst AS item,
               CAST(sum($prev.r // deg.d) AS BIGINT) AS c
             FROM edges e JOIN $prev ON e.src = $prev.item
             JOIN deg ON e.src = deg.src GROUP BY 1) s
           ON n.item = s.item)"""
      s"""WITH grid AS (SELECT user_id,
             CAST(json_extract_string(props, '$$.k') AS INT) AS item,
             count(*) AS n_ev
           FROM events WHERE json_extract_string(props, '$$.k') IS NOT NULL
           GROUP BY 1, 2),
         ui AS (SELECT user_id, item FROM (
             SELECT user_id, item, row_number() OVER (PARTITION BY user_id
               ORDER BY n_ev DESC, item) AS rk FROM grid)
           WHERE rk <= 500),
         pairs AS (SELECT a.item AS i, b.item AS j FROM ui a JOIN ui b
           ON a.user_id = b.user_id AND a.item < b.item
           GROUP BY 1, 2 HAVING count(*) >= 5),
         edges AS (SELECT i AS src, j AS dst FROM pairs
           UNION ALL SELECT j, i FROM pairs),
         deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
         nodes AS (SELECT DISTINCT src AS item FROM edges),
         st AS (SELECT count(*) AS n_nodes FROM nodes),
         nn AS (SELECT item, n_nodes FROM nodes CROSS JOIN st),
         r0 AS (SELECT item, n_nodes,
           CAST(1000000000 // n_nodes AS BIGINT) AS r FROM nn),
         ${iter("r0", "r1")},
         ${iter("r1", "r2")},
         ${iter("r2", "r3")}
         SELECT item, r AS rank_q,
           round(CAST(r AS DOUBLE) / 1000000000.0, 6) AS rank
         FROM r3 ORDER BY rank_q DESC, item"""
    },
    // q126: per-user lag under the (ts, event_id) total order, then the
    // |types|² transition rollup; p = exact integer ratio, 6dp round
    "q126_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type
           FROM events),
         c AS (SELECT prev_type, event_type, count(*) AS n
           FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2)
         SELECT prev_type, event_type, n,
           round(n::DOUBLE / sum(n) OVER (PARTITION BY prev_type), 6) AS p
         FROM c ORDER BY prev_type, event_type""",
    // q134: per-user ordered path signature (string_agg under the
    // (ts, event_id) total order ≙ Spark's sort_array'd struct list),
    // then the top-k journeys with a total tie order
    "q134_user_paths" ->
      """WITH p AS (SELECT user_id,
             string_agg(event_type, '->' ORDER BY ts, event_id) AS path
           FROM events GROUP BY 1)
         SELECT path, count(*) AS n_users FROM p
         GROUP BY 1 ORDER BY n_users DESC, path LIMIT 10""",
    // q138: per-day manifest row — counts, key bounds, type cardinality
    "q138_partition_stats" ->
      """WITH g AS (SELECT CAST(ts AS DATE) AS day, event_type,
             count(*) AS n, min(user_id) AS mnu, max(user_id) AS mxu
           FROM events GROUP BY 1, 2)
         SELECT day, CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(min(mnu) AS BIGINT) AS min_user,
           CAST(max(mxu) AS BIGINT) AS max_user,
           count(*) AS n_types
         FROM g GROUP BY day ORDER BY day""",
    // q149: RFM log2 bands — integer cents, bin()-length bands, one
    // user-keyed agg + 1-row corpus max
    "q149_rfm_segments" ->
      """WITH pu AS (SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
             count(*) AS freq,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
           FROM events GROUP BY 1),
         mx AS (SELECT max(CAST(ts AS DATE)) AS corpus_max_day FROM events)
         SELECT CAST(length(bin(datediff('day', last_day, corpus_max_day)
             + 1)) - 1 AS INT) AS r_band,
           CAST(length(bin(freq)) - 1 AS INT) AS f_band,
           CAST(length(bin(coalesce(cents, 0) + 1)) - 1 AS INT) AS m_band,
           count(*) AS n_users
         FROM pu, mx GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    // q150: consecutive-event gaps in integer microseconds; the later
    // event's type claims the gap; one float division per output row
    "q150_interarrival" ->
      """WITH g AS (SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS gap_us
           FROM events)
         SELECT event_type, count(*) AS n_gaps, min(gap_us) AS min_gap_us,
           max(gap_us) AS max_gap_us,
           round(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1000000.0, 3)
             AS avg_gap_s
         FROM g WHERE gap_us IS NOT NULL GROUP BY 1 ORDER BY 1""",
    // q151: dyadic 16-term EWMA (α = 1/2) — generated term list so the
    // exact weights and addition order mirror the engine's expression
    // tree term for term (all arithmetic exact; no decimal ties exist)
    "q151_ewma_daily" ->
      s"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             count(*) AS cnt FROM events GROUP BY 1, 2)
         SELECT event_type, day, cnt, round($ewmaTermsSql, 6) AS ewma16
         FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)
         ORDER BY event_type, day""",
    // q152: weekday via pure integer epoch-day arithmetic (0 = Sunday)
    // — no engine dayofweek() convention in play
    "q152_dow_profile" ->
      """WITH c AS (SELECT event_type,
             CAST((datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
               + 4) % 7 AS INT) AS dow,
             count(*) AS n_events
           FROM events GROUP BY 1, 2)
         SELECT event_type, dow, n_events,
           round(CAST(n_events AS DOUBLE) /
             sum(n_events) OVER (PARTITION BY event_type), 6) AS share
         FROM c ORDER BY event_type, dow""",
    // q153: triangle participation — the oracle uses the SIMPLE
    // id-ordered formulation (a<b, b<c wedges closed by (a,c)); the
    // engine's degree-ordered orientation must yield the identical
    // triangle set (orientation is a physical choice, like q148's
    // bucketing)
    "q153_triangles" ->
      ("WITH " + coPairsCte + """,
         tri AS (SELECT e1.i AS a, e1.j AS b, e2.j AS c
           FROM cpairs e1 JOIN cpairs e2 ON e1.j = e2.i
           JOIN cpairs e3 ON e3.i = e1.i AND e3.j = e2.j),
         pn AS (SELECT item, count(*) AS n_triangles FROM (
             SELECT a AS item FROM tri UNION ALL SELECT b AS item FROM tri
             UNION ALL SELECT c AS item FROM tri)
           GROUP BY 1)
         SELECT d.item, d.degree, coalesce(pn.n_triangles, 0) AS n_triangles
         FROM cdeg d LEFT JOIN pn USING (item)
         ORDER BY n_triangles DESC, item LIMIT 20"""),
    // q154: log2-banded degree histogram over the same capped graph
    "q154_degree_hist" ->
      ("WITH " + coPairsCte + """
         SELECT CAST(length(bin(degree)) - 1 AS INT) AS log2_degree,
           count(*) AS n_items, min(degree) AS min_degree,
           max(degree) AS max_degree
         FROM cdeg GROUP BY 1 ORDER BY 1"""),
    // q173: 4 unrolled k-core peels (k=3) over the capped co-occurrence
    // edges; generated chain, pure integer counting
    "q173_kcore" ->
      ("WITH " + coPairsCte + """,
         e0 AS MATERIALIZED (SELECT i, j FROM cpairs),
         """ + kCorePeelSql(k = 3, peels = 4) + """
         SELECT item, count(*) AS core_degree FROM (
           SELECT i AS item FROM e4 UNION ALL SELECT j FROM e4)
         GROUP BY item ORDER BY item"""),
    // q176: OHLC bars — open/close SELECTED by lexicographic struct
    // min/max on (ts, event_id, value); no float accumulates
    "q176_daily_ohlc" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           (min(struct_pack(ts := ts, eid := event_id, v := value))).v
             AS open,
           (max(struct_pack(ts := ts, eid := event_id, v := value))).v
             AS close,
           min(value) AS low, max(value) AS high, count(*) AS n_events
         FROM events GROUP BY event_type, day
         ORDER BY event_type, day""",
    // q180: daily peak concurrency — oracle uses the naive GLOBAL
    // running sum (provably equal to the engine's two-phase form);
    // starts sort before ends at an instant (delta DESC)
    "q180_peak_concurrency" ->
      ("WITH " + sessionsCte + """,
         b AS (SELECT user_id, session_seq,
             epoch_us(session_start) AS ts_us, 1 AS delta FROM sess
           UNION ALL SELECT user_id, session_seq,
             epoch_us(session_end), -1 FROM sess),
         r AS (SELECT CAST(make_timestamp(ts_us) AS DATE) AS day, delta,
             sum(delta) OVER (ORDER BY ts_us, delta DESC, user_id,
               session_seq ROWS BETWEEN UNBOUNDED PRECEDING AND
               CURRENT ROW) AS run
           FROM b)
         SELECT day, CAST(max(run) AS BIGINT) AS peak_concurrency,
           CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_starts,
           CAST(sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ends
         FROM r GROUP BY day ORDER BY day"""),
    // q196: exact p25/p50/p75 per event type via histogram rank picks
    // in doubled units (the q175 med2 rule generalized)
    "q196_value_quartiles" ->
      """WITH h AS (SELECT event_type,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             count(*) AS cnt
           FROM events GROUP BY 1, 2),
         c AS (SELECT event_type, cents, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY cents)
               AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS n FROM h),
         a AS (SELECT event_type, min(n) AS n,
             min(CASE WHEN cum * 4 >= n * 1 THEN cents END) AS lo1,
             min(CASE WHEN cum * 4 >= n * 1 + 4 THEN cents END) AS hi1,
             min(CASE WHEN cum * 4 >= n * 2 THEN cents END) AS lo2,
             min(CASE WHEN cum * 4 >= n * 2 + 4 THEN cents END) AS hi2,
             min(CASE WHEN cum * 4 >= n * 3 THEN cents END) AS lo3,
             min(CASE WHEN cum * 4 >= n * 3 + 4 THEN cents END) AS hi3
           FROM c GROUP BY event_type)
         SELECT event_type, CAST(n AS BIGINT) AS n_events,
           round(CAST(CASE WHEN (n * 1) % 4 = 0
             THEN lo1 + coalesce(hi1, lo1) ELSE lo1 * 2 END AS DOUBLE)
             / 200.0, 4) AS p25,
           round(CAST(CASE WHEN (n * 2) % 4 = 0
             THEN lo2 + coalesce(hi2, lo2) ELSE lo2 * 2 END AS DOUBLE)
             / 200.0, 4) AS p50,
           round(CAST(CASE WHEN (n * 3) % 4 = 0
             THEN lo3 + coalesce(hi3, lo3) ELSE lo3 * 2 END AS DOUBLE)
             / 200.0, 4) AS p75
         FROM a ORDER BY event_type""",
    // q200: Shannon entropy of the full path distribution (q134's
    // assembly; the q67 sum-then-round contract)
    "q200_journey_entropy" ->
      """WITH p AS (SELECT user_id,
             string_agg(event_type, '->' ORDER BY ts, event_id) AS path
           FROM events GROUP BY 1),
         pc AS (SELECT path, count(*) AS c FROM p GROUP BY 1),
         t AS (SELECT CAST(sum(c) AS DOUBLE) AS nd,
             CAST(sum(c) AS BIGINT) AS nb FROM pc)
         SELECT t.nb AS n_users, count(*) AS n_paths,
           round(-sum((c / t.nd) * log2(c / t.nd)) + 0.0, 4)
             AS entropy_bits
         FROM pc CROSS JOIN t GROUP BY t.nb, t.nd""",
    // q201: in-session conversion over the shared sessev assignment —
    // purchase strictly after the session's first click
    "q201_session_conversion" ->
      ("WITH " + sessionsCte + """,
         per AS (SELECT user_id, session_seq,
             min(CASE WHEN event_type = 'click' THEN ts END)
               AS first_click
           FROM sessev GROUP BY 1, 2),
         conv AS (SELECT s.user_id, s.session_seq,
             max(CASE WHEN p.first_click IS NOT NULL THEN 1 ELSE 0 END)
               AS has_click,
             max(CASE WHEN s.event_type = 'purchase'
               AND s.ts > p.first_click THEN 1 ELSE 0 END) AS converted
           FROM sessev s JOIN per p
             ON s.user_id = p.user_id AND s.session_seq = p.session_seq
           GROUP BY 1, 2)
         SELECT count(*) AS n_sessions,
           CAST(sum(has_click) AS BIGINT) AS n_with_click,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           round(CAST(sum(converted) AS DOUBLE) /
             CAST(sum(has_click) AS DOUBLE), 4) AS conversion_rate
         FROM conv"""),
    // q202: item-age activity profile — first week per item, events
    // and active items per age-in-weeks (two-level distinct)
    "q202_item_adoption" ->
      """WITH grid AS (SELECT
             CAST(json_extract_string(props, '$.k') AS INT) AS item,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS INT) // 7 AS week
           FROM events
           WHERE json_extract_string(props, '$.k') IS NOT NULL),
         f AS (SELECT item, min(week) AS first_week FROM grid
           GROUP BY 1),
         a AS (SELECT g.week - f.first_week AS age_weeks, g.item,
             count(*) AS c
           FROM grid g JOIN f ON g.item = f.item GROUP BY 1, 2)
         SELECT CAST(age_weeks AS INT) AS age_weeks,
           CAST(sum(c) AS BIGINT) AS n_events,
           count(*) AS n_items_active
         FROM a GROUP BY 1 ORDER BY 1""",
    // q210: rolling 10-minute burst peaks — RANGE frame on epoch
    // seconds per user (tie-stable: peers at a second all included),
    // integer counts, fixed band edges
    "q210_bot_burst" ->
      """WITH s AS (SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
         w AS (SELECT user_id, count(*) OVER (PARTITION BY user_id
                 ORDER BY sec RANGE BETWEEN CURRENT ROW AND 600 FOLLOWING)
                 AS in_win
               FROM s),
         p AS (SELECT user_id, max(in_win) AS peak FROM w GROUP BY 1),
         b AS (SELECT user_id, peak,
                 CASE WHEN peak <= 2 THEN 0 WHEN peak <= 5 THEN 1
                      WHEN peak <= 10 THEN 2 WHEN peak <= 20 THEN 3
                      ELSE 4 END AS burst_band
               FROM p)
         SELECT burst_band, count(*) AS n_users,
           CAST(max(peak) AS BIGINT) AS max_peak
         FROM b GROUP BY 1 ORDER BY 1""",
    // q212: 10-min/5-min sliding windows — each event maps to exactly
    // two epoch-aligned starts (b*300, b*300-300); make_timestamp
    // rebuilds Spark's window.start under the UTC session
    "q212_sliding_load" ->
      """WITH s AS (SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
         w AS (SELECT user_id, unnest([(sec // 300) * 300,
                 (sec // 300) * 300 - 300]) AS ws
               FROM s),
         c AS (SELECT user_id, ws, count(*) AS n_events
               FROM w GROUP BY 1, 2)
         SELECT user_id, make_timestamp(ws * 1000000) AS win_start,
           n_events
         FROM c ORDER BY n_events DESC, user_id, ws LIMIT 10""",
    // q219: Newman degree assortativity over the capped co-occurrence
    // graph — exact integer moments, one final sqrt division (zero-
    // variance guard pinned to 0.0)
    "q219_assortativity" ->
      ("WITH " + coPairsCte + """,
         dir2 AS (SELECT i AS src, j AS dst FROM cpairs
                  UNION ALL SELECT j AS src, i AS dst FROM cpairs),
         xy AS (SELECT a.degree AS x, b.degree AS y
                FROM dir2 JOIN cdeg a ON dir2.src = a.item
                          JOIN cdeg b ON dir2.dst = b.item),
         s AS (SELECT count(*) AS m,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
               FROM xy)
         SELECT m,
           CASE WHEN m * sxx - sx * sx = 0 OR m * syy - sy * sy = 0
                THEN 0.0
                ELSE round((m * sxy - sx * sy) /
                  (sqrt(m * sxx - sx * sx) * sqrt(m * syy - sy * sy)), 6)
           END AS assortativity
         FROM s"""),
    // q232: the salted two-phase distinct count gated against the plain
    // count(DISTINCT) — proves the value-space salt is exact end-to-end
    "q232_salted_distinct" ->
      """SELECT event_type,
           CAST(count(DISTINCT props) AS BIGINT) AS n_distinct
         FROM events GROUP BY 1 ORDER BY 1""",
    // q239: daily-load autocorrelation at lags 1..7 — exact integer
    // moments (the q219 pattern), FP only at the final division
    "q239_daily_autocorr" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1),
         lags AS (SELECT CAST(unnest(generate_series(1, 7)) AS INT)
                    AS lag),
         p AS (SELECT l.lag, d.n AS x, e.n AS y
               FROM daily d CROSS JOIN lags l
               JOIN daily e ON e.day = d.day - l.lag * INTERVAL 1 DAY),
         s AS (SELECT lag, count(*) AS m,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
               FROM p GROUP BY 1)
         SELECT lag, m AS n_pairs,
           CASE WHEN m * sxx - sx * sx = 0 OR m * syy - sy * sy = 0
                THEN 0.0
                ELSE round((m * sxy - sx * sy) /
                  (sqrt(m * sxx - sx * sx) * sqrt(m * syy - sy * sy)), 6)
           END AS autocorr
         FROM s ORDER BY lag""",
    // q240: daily lead-lag cross-correlation, clicks at t−lag vs
    // purchases at t — same exact-moment machinery as q239
    "q240_cross_corr" ->
      """WITH dx AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
           FROM events WHERE event_type = 'click' GROUP BY 1),
         dy AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         lags AS (SELECT CAST(unnest(generate_series(0, 7)) AS INT)
                    AS lag),
         p AS (SELECT l.lag, x.n AS x, y.n AS y
               FROM dy y CROSS JOIN lags l
               JOIN dx x ON x.day = y.day - l.lag * INTERVAL 1 DAY),
         s AS (SELECT lag, count(*) AS m,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
               FROM p GROUP BY 1)
         SELECT lag, m AS n_pairs,
           CASE WHEN m * sxx - sx * sx = 0 OR m * syy - sy * sy = 0
                THEN 0.0
                ELSE round((m * sxy - sx * sy) /
                  (sqrt(m * sxx - sx * sx) * sqrt(m * syy - sy * sy)), 6)
           END AS crosscorr
         FROM s ORDER BY lag""",
    // q235: z-cell occupancy — the SAME Morton bit-interleave formula
    // as the engine (interpolated from ZOrder.zValueSql, so the two
    // cannot drift), pure integer arithmetic
    "q235_zorder_cells" ->
      (s"""WITH g AS (
           SELECT CAST(user_id % 256 AS BIGINT) AS ucell,
             CAST(day(ts) AS BIGINT) AS dcell
           FROM events),
         zz AS (SELECT ucell, dcell,
             CAST(${graft.operators.ZOrder.zValueSql("ucell", "dcell")}
               AS BIGINT) AS z
           FROM g)
         SELECT CAST(z // 64 AS BIGINT) AS zcell, count(*) AS n_events,
           CAST(count(DISTINCT ucell) AS BIGINT) AS n_users,
           CAST(count(DISTINCT dcell) AS BIGINT) AS n_days,
           min(z) AS min_z, max(z) AS max_z
         FROM zz GROUP BY 1 ORDER BY 1"""),
    // q233: batch twin of the stream-stream interval join — every
    // (purchase, prior click ≤ 6 h) pair, integer µs latency
    "q233_interval_pairs" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
           c.event_id AS click_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS latency_us
         FROM events p JOIN events c
           ON c.user_id = p.user_id
           AND p.event_type = 'purchase' AND c.event_type = 'click'
           AND c.ts >= p.ts - INTERVAL 6 HOUR AND c.ts < p.ts
         ORDER BY purchase_id, click_id""",
    // q245: SCD Type-2 spend-band history — run-length-compressed
    // validity ranges, integer-cent band thresholds, (ts, event_id)
    // total order; is_current as INT (no boolean in the gate)
    "q245_scd2_bands" ->
      """WITH p AS (
           SELECT user_id, ts, event_id,
             CASE WHEN CAST(round(value * 100, 0) AS BIGINT) >= 10000
                    THEN 'high'
                  WHEN CAST(round(value * 100, 0) AS BIGINT) >= 2500
                    THEN 'mid'
                  ELSE 'low' END AS band
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT *, lag(band) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev FROM p),
         ch AS (SELECT user_id, ts, event_id, band FROM c
                WHERE prev IS NULL OR band <> prev)
         SELECT user_id, band, epoch_us(ts) AS valid_from_us,
           epoch_us(lead(ts) OVER (PARTITION BY user_id
             ORDER BY ts, event_id)) AS valid_to_us,
           CAST(row_number() OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS INT) AS version,
           CASE WHEN lead(ts) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END
             AS is_current
         FROM ch ORDER BY user_id, version""",
    // q247: tiered 15-min → hourly rollup (the chained-stateful
    // streaming tree's batch twin) recomputed from raw events with
    // pure integer epoch-floor buckets — engine-neutral origin (Spark
    // windows and this floor both align to the 1970 epoch); proves the
    // tiering is lossless (associative integer folds)
    "q247_tiered_rollup" ->
      """WITH b AS (
           SELECT epoch_us(ts) // 3600000000 AS h,
                  epoch_us(ts) // 900000000 AS q,
                  event_type,
                  CAST(round(value * 100, 0) AS BIGINT) AS vc
           FROM events)
         SELECT h * 3600000000 AS bucket_start_us, event_type,
           count(*) AS cnt, CAST(sum(vc) AS BIGINT) AS value_c,
           count(DISTINCT q) AS n_buckets
         FROM b GROUP BY 1, 2 ORDER BY 1, 2""",
    // q248: point-in-time join of clicks against the q245 SCD2 history
    // (same change CTE, event_id tiebreak) as a relational interval
    // join — the Spark side folds it as-of style in one window pass;
    // half-open [from, to) validity, pre-history clicks → 'none'
    "q248_pit_band_mix" ->
      """WITH p AS (
           SELECT user_id, ts, event_id,
             CASE WHEN CAST(round(value * 100, 0) AS BIGINT) >= 10000
                    THEN 'high'
                  WHEN CAST(round(value * 100, 0) AS BIGINT) >= 2500
                    THEN 'mid'
                  ELSE 'low' END AS band
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT *, lag(band) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev FROM p),
         ch AS (SELECT user_id, ts, event_id, band FROM c
                WHERE prev IS NULL OR band <> prev),
         dim AS (SELECT user_id, band, epoch_us(ts) AS f_us,
                   epoch_us(lead(ts) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id)) AS t_us
                 FROM ch),
         clicks AS (SELECT user_id, epoch_us(ts) AS c_us FROM events
                    WHERE event_type = 'click')
         SELECT coalesce(d.band, 'none') AS band,
           count(*) AS n_clicks, count(DISTINCT clicks.user_id) AS n_users
         FROM clicks LEFT JOIN dim d
           ON clicks.user_id = d.user_id AND clicks.c_us >= d.f_us
           AND (d.t_us IS NULL OR clicks.c_us < d.t_us)
         GROUP BY 1 ORDER BY 1""",
    // q255: per-user item first-seen feed (the MapState streaming
    // tracker's batch twin, bounded to users < 20) — first occurrence
    // per (user, item) then the per-user novelty ordinal, both on the
    // (ts, event_id) total order; epoch-micros timestamps (rule 14)
    "q255_item_novelty" ->
      """WITH base AS (
           SELECT user_id,
             CAST(json_extract(props, '$.k') AS BIGINT) AS item,
             epoch_us(ts) AS ts_us, event_id
           FROM events WHERE json_extract(props, '$.k') IS NOT NULL),
         firsts AS (
           SELECT user_id, item, ts_us, event_id FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id, item
               ORDER BY ts_us, event_id) AS rn FROM base)
           WHERE rn = 1)
         SELECT user_id, item, ts_us AS first_ts_us,
           CAST(row_number() OVER (PARTITION BY user_id
             ORDER BY ts_us, event_id) AS BIGINT) AS item_index
         FROM firsts WHERE user_id < 20
         ORDER BY user_id, item_index""",
    // q256: last-touch revenue attribution — most recent non-purchase
    // event within the 6 h lookback (ties: same-instant touch counts,
    // max event_id wins), else 'direct'; integer-cent revenue
    "q256_last_touch" ->
      """WITH p AS (SELECT event_id, user_id, ts,
                      CAST(round(value * 100, 0) AS BIGINT) AS rev_c
                    FROM events WHERE event_type = 'purchase'),
         t AS (SELECT p.event_id, e.event_type,
                 row_number() OVER (PARTITION BY p.event_id
                   ORDER BY e.ts DESC, e.event_id DESC) AS rn
               FROM p JOIN events e
                 ON e.user_id = p.user_id AND e.event_type <> 'purchase'
                 AND e.ts <= p.ts AND e.ts > p.ts - INTERVAL 6 HOUR),
         last AS (SELECT event_id, event_type FROM t WHERE rn = 1)
         SELECT coalesce(last.event_type, 'direct') AS channel,
           count(*) AS n_purchases, CAST(sum(rev_c) AS BIGINT) AS revenue_c
         FROM p LEFT JOIN last USING (event_id)
         GROUP BY 1 ORDER BY 1""",
    // q257: A/B readout — mod-2 arm assignment, big-ticket conversion,
    // exact integer rates; the pooled z is the one float, written as
    // the SAME literal IEEE tree as the Spark side, rounded 6dp
    "q257_ab_test" ->
      """WITH u AS (SELECT user_id, user_id % 2 AS arm,
                      max(CASE WHEN event_type = 'purchase'
                            AND CAST(round(value * 100, 0) AS BIGINT)
                              >= 20000
                          THEN 1 ELSE 0 END) AS converted
                    FROM events GROUP BY 1),
         a AS (SELECT arm, count(*) AS n_users,
                 CAST(sum(converted) AS BIGINT) AS n_converted
               FROM u GROUP BY 1),
         s AS (SELECT
                 max(CASE WHEN arm = 0 THEN n_users END) AS n0,
                 max(CASE WHEN arm = 0 THEN n_converted END) AS c0,
                 max(CASE WHEN arm = 1 THEN n_users END) AS n1,
                 max(CASE WHEN arm = 1 THEN n_converted END) AS c1
               FROM a),
         zc AS (SELECT round(
                  (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                   - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                  / sqrt((CAST(c0 + c1 AS DOUBLE)
                            / CAST(n0 + n1 AS DOUBLE))
                     * (1.0 - CAST(c0 + c1 AS DOUBLE)
                            / CAST(n0 + n1 AS DOUBLE))
                     * (1.0 / CAST(n0 AS DOUBLE)
                        + 1.0 / CAST(n1 AS DOUBLE))), 6) AS z_score
                FROM s)
         SELECT arm, n_users, n_converted,
           CAST(n_converted * 10000 // n_users AS BIGINT) AS rate_bp,
           z_score
         FROM a CROSS JOIN zc ORDER BY arm""",
    // q258: U-shaped multi-touch attribution on the integer millionths
    // grid — last touch absorbs the middle-split remainder so credit
    // per purchase sums to exactly 1e6; touchless purchases → 'direct'
    "q258_position_attribution" ->
      """WITH base AS (SELECT event_id, user_id, epoch_us(ts) AS t_us,
                        event_type FROM events),
         p AS (SELECT event_id AS p_id, user_id, t_us AS p_us
               FROM base WHERE event_type = 'purchase'),
         t AS (SELECT user_id, event_id AS t_id, t_us,
                 event_type AS channel
               FROM base WHERE event_type <> 'purchase'),
         pairs AS (
           SELECT p.p_id, t.t_id, t.t_us, t.channel
           FROM p JOIN t USING (user_id)
           WHERE t.t_us <= p.p_us AND t.t_us > p.p_us - 21600000000),
         ranked AS (
           SELECT *, row_number() OVER (PARTITION BY p_id
               ORDER BY t_us, t_id) AS rk,
             count(*) OVER (PARTITION BY p_id) AS n_t
           FROM pairs),
         credited AS (
           SELECT channel,
             CASE WHEN n_t = 1 THEN 1000000
                  WHEN n_t = 2 THEN 500000
                  WHEN rk = 1 THEN 400000
                  WHEN rk = n_t THEN 400000 + 200000
                    - (200000 // (n_t - 2)) * (n_t - 2)
                  ELSE 200000 // (n_t - 2) END AS credit_e6
           FROM ranked),
         touched AS (
           SELECT channel, count(*) AS n_touch_rows,
             CAST(sum(credit_e6) AS BIGINT) AS credit_e6
           FROM credited GROUP BY 1),
         direct AS (
           SELECT 'direct' AS channel, count(*) AS n_touch_rows,
             CAST(count(*) * 1000000 AS BIGINT) AS credit_e6
           FROM p WHERE p_id NOT IN (SELECT p_id FROM pairs))
         SELECT * FROM (SELECT * FROM touched
           UNION ALL SELECT * FROM direct WHERE n_touch_rows > 0)
         ORDER BY channel""",
    // q259: Theil–Sen daily-load trend — median of pairwise slopes
    // via explicit rank picks over the calendar-bounded pair frame,
    // beside the exact-integer-moment OLS slope
    "q259_theil_sen" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) - DATE '1970-01-01' AS x,
             CAST(count(*) AS BIGINT) AS y
           FROM events GROUP BY 1),
         slopes AS (
           SELECT a.x AS xi, b.x AS xj,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS s
           FROM daily a JOIN daily b ON a.x < b.x),
         n AS (SELECT count(*) AS n_pairs FROM slopes),
         ranked AS (SELECT s, row_number() OVER (ORDER BY s, xi, xj)
                      AS rn FROM slopes),
         med AS (SELECT round(avg(s), 6) AS theil_sen
                 FROM ranked CROSS JOIN n
                 WHERE rn IN ((n_pairs + 1) // 2, (n_pairs + 2) // 2)),
         m AS (SELECT count(*) AS n_days, CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx
               FROM daily)
         SELECT n_days, (SELECT n_pairs FROM n) AS n_pairs,
           (SELECT theil_sen FROM med) AS theil_sen,
           round(CAST(CAST(n_days AS HUGEINT) * sxy
               - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / CAST(CAST(n_days AS HUGEINT) * sxx
               - CAST(sx AS HUGEINT) * sx AS DOUBLE), 6) AS ols_slope
         FROM m""",
    // q261: daily view→purchase latency p50/p90 — as-of union fold for
    // the last view within 24 h, then EXPLICIT rank picks over
    // day-partitioned windows (lower median, ceil-rank p90) — selected
    // integer values, never interpolation
    "q261_conversion_latency" ->
      """WITH u AS (
           SELECT user_id, epoch_us(ts) AS t_us, 0 AS kind, event_id,
             epoch_us(ts) AS v_us, NULL AS p_day
           FROM events WHERE event_type = 'view'
           UNION ALL
           SELECT user_id, epoch_us(ts) AS t_us, 1 AS kind, event_id,
             NULL AS v_us, CAST(CAST(ts AS DATE) AS VARCHAR) AS p_day
           FROM events WHERE event_type = 'purchase'),
         f AS (
           SELECT *, last_value(v_us IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t_us, kind, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv
           FROM u),
         lat AS (
           SELECT p_day AS day, t_us - lv AS latency_us FROM f
           WHERE kind = 1 AND lv IS NOT NULL
             AND t_us - lv <= 86400000000),
         ranked AS (
           SELECT day, latency_us,
             row_number() OVER (PARTITION BY day
               ORDER BY latency_us) AS rk,
             count(*) OVER (PARTITION BY day) AS n
           FROM lat)
         SELECT day, CAST(max(n) AS BIGINT) AS n_conversions,
           CAST(max(CASE WHEN rk = (n + 1) // 2 THEN latency_us END)
             AS BIGINT) AS p50_us,
           CAST(max(CASE WHEN rk = (9 * n + 9) // 10 THEN latency_us END)
             AS BIGINT) AS p90_us
         FROM ranked GROUP BY 1 ORDER BY 1""",
    // q263: CUSUM mean-shift changepoint — the cross-multiplied
    // |n·cum − idx·total| statistic on HUGEINT, argmax per type with
    // earliest-day tiebreak (EventOps.cusumChangepointOn)
    "q263_cusum_changepoint" ->
      """WITH daily AS (
           SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
         cum AS (
           SELECT event_type, day,
             CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY day) AS HUGEINT) AS idx,
             CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS HUGEINT) AS cum_cnt,
             CAST(count(*) OVER (PARTITION BY event_type) AS HUGEINT)
               AS n_days,
             CAST(sum(cnt) OVER (PARTITION BY event_type) AS HUGEINT)
               AS total
           FROM daily),
         pick AS (
           SELECT event_type, day, n_days,
             abs(n_days * cum_cnt - idx * total) AS adev,
             row_number() OVER (PARTITION BY event_type
               ORDER BY abs(n_days * cum_cnt - idx * total) DESC, day)
               AS rk
           FROM cum)
         SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           day AS cp_day, CAST(adev AS BIGINT) AS max_abs_dev_nd
         FROM pick WHERE rk = 1 ORDER BY event_type""",
    // q264: compaction planner — greedy cum-bytes div target binning in
    // fixed file order, per-source before/after small-file summary
    // (IncrementalOps.compactionPlanOn, target 2048 / small 1024)
    "q264_compaction_plan" ->
      """WITH files AS (
           SELECT source, doc_id % 64 AS fid,
             CAST(sum(n_chars) AS BIGINT) AS bytes
           FROM documents GROUP BY 1, 2),
         planned AS (
           SELECT source, fid, bytes,
             CAST(coalesce(sum(bytes) OVER (PARTITION BY source
               ORDER BY fid ROWS BETWEEN UNBOUNDED PRECEDING AND
               1 PRECEDING), 0) AS BIGINT) // 2048 AS bin
           FROM files),
         bins AS (
           SELECT source, bin, CAST(sum(bytes) AS BIGINT) AS bin_bytes
           FROM planned GROUP BY 1, 2),
         bsum AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_bins,
             CAST(max(bin_bytes) AS BIGINT) AS max_bin_bytes,
             CAST(sum(CASE WHEN bin_bytes < 1024 THEN 1 ELSE 0 END)
               AS BIGINT) AS small_after
           FROM bins GROUP BY 1)
         SELECT f.source, CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(f.bytes) AS BIGINT) AS total_bytes,
           CAST(sum(CASE WHEN f.bytes < 1024 THEN 1 ELSE 0 END)
             AS BIGINT) AS small_before,
           max(b.n_bins) AS n_bins, max(b.max_bin_bytes) AS max_bin_bytes,
           max(b.small_after) AS small_after
         FROM files f JOIN bsum b ON f.source = b.source
         GROUP BY f.source ORDER BY f.source""",
    // q265: item-item CF recommendations — cosine² ppm on the capped
    // co-occurrence grid, top-3 per item (GraphOps.itemRecsOnPairs);
    // replays the q107/q113 cap rule
    "q265_item_recs" ->
      """WITH grid AS (SELECT user_id,
             CAST(json_extract_string(props, '$.k') AS INT) AS item,
             count(*) AS n_ev
           FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
           GROUP BY 1, 2),
         ui AS (SELECT user_id, item FROM (
             SELECT user_id, item, row_number() OVER (PARTITION BY user_id
               ORDER BY n_ev DESC, item) AS rk FROM grid)
           WHERE rk <= 500),
         ic AS (SELECT item, CAST(count(*) AS HUGEINT) AS n_i
           FROM ui GROUP BY 1),
         pairs AS (SELECT a.item AS i, b.item AS j,
             CAST(count(*) AS HUGEINT) AS n_ij
           FROM ui a JOIN ui b ON a.user_id = b.user_id
             AND a.item < b.item
           GROUP BY 1, 2 HAVING count(*) >= 5),
         sym AS (SELECT i AS item, j AS nbr, n_ij FROM pairs
           UNION ALL SELECT j, i, n_ij FROM pairs),
         scored AS (
           SELECT s.item, s.nbr, s.n_ij,
             (s.n_ij * s.n_ij * 1000000) // (a.n_i * b.n_i) AS cos2_ppm
           FROM sym s JOIN ic a ON s.item = a.item
             JOIN ic b ON s.nbr = b.item),
         ranked AS (
           SELECT item, nbr, n_ij, cos2_ppm,
             row_number() OVER (PARTITION BY item
               ORDER BY cos2_ppm DESC, nbr ASC) AS rec_rank
           FROM scored)
         SELECT CAST(item AS INT) AS item, CAST(rec_rank AS INT)
             AS rec_rank, CAST(nbr AS INT) AS rec_item,
           CAST(n_ij AS BIGINT) AS n_common_users,
           CAST(cos2_ppm AS BIGINT) AS cos2_ppm
         FROM ranked WHERE rec_rank <= 3 ORDER BY item, rec_rank""",
    // q266: common-neighbor link prediction on the part co-order graph
    // — capped neighbor lists, wedge count, Jaccard ppm, top-20
    // (GraphOps.coOrderLinkPredOn)
    "q266_link_prediction" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem),
         edges AS (SELECT a.pk AS i, b.pk AS j,
             CAST(count(*) AS BIGINT) AS n_ij
           FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY 1, 2 HAVING count(*) >= 2),
         sym AS (SELECT i AS item, j AS nbr, n_ij FROM edges
           UNION ALL SELECT j, i, n_ij FROM edges),
         capped AS (SELECT item, nbr FROM (
             SELECT item, nbr, row_number() OVER (PARTITION BY item
               ORDER BY n_ij DESC, nbr ASC) AS nrk FROM sym)
           WHERE nrk <= 50),
         cdeg AS (SELECT item, CAST(count(*) AS BIGINT) AS deg
           FROM capped GROUP BY 1),
         wedges AS (SELECT a.nbr AS i, b.nbr AS j,
             CAST(count(*) AS BIGINT) AS cn
           FROM capped a JOIN capped b ON a.item = b.item
             AND a.nbr < b.nbr
           GROUP BY 1, 2),
         cand AS (SELECT w.i, w.j, w.cn FROM wedges w
           WHERE NOT EXISTS (SELECT 1 FROM edges e
             WHERE e.i = w.i AND e.j = w.j))
         SELECT CAST(c.i AS BIGINT) AS part_i,
           CAST(c.j AS BIGINT) AS part_j,
           CAST(c.cn AS BIGINT) AS common_nbrs,
           CAST(c.cn * 1000000 // (da.deg + db.deg - c.cn) AS BIGINT)
             AS jac_ppm
         FROM cand c JOIN cdeg da ON c.i = da.item
           JOIN cdeg db ON c.j = db.item
         ORDER BY jac_ppm DESC, common_nbrs DESC, part_i, part_j
         LIMIT 20""",
    // q267: propensity calibration — first-half click share (milli)
    // vs second-half big-ticket purchase; reliability panel + exact
    // Brier (EventOps.propensityCalibrationOn, threshold 10000c)
    "q267_calibration" ->
      """WITH firsthalf AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_click
           FROM events
           WHERE CAST(date_trunc('day', ts) AS DATE) < DATE '2024-01-16'
           GROUP BY 1),
         outcome AS (
           SELECT DISTINCT user_id FROM events
           WHERE CAST(date_trunc('day', ts) AS DATE) >= DATE '2024-01-16'
             AND event_type = 'purchase'
             AND CAST(round(value * 100, 0) AS BIGINT) >= 10000),
         scored AS (
           SELECT f.user_id, f.n_click * 1000 // f.n_ev AS p_milli,
             CASE WHEN o.user_id IS NOT NULL THEN 1000 ELSE 0 END
               AS y_milli
           FROM firsthalf f LEFT JOIN outcome o
             ON f.user_id = o.user_id),
         b AS (SELECT least(p_milli // 50, 9) AS bucket, p_milli,
             y_milli FROM scored)
         SELECT CAST(bucket AS INT) AS bucket,
           count(*) AS n_users,
           CAST(sum(CASE WHEN y_milli = 1000 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_pos,
           CAST(sum(p_milli) // count(*) AS BIGINT) AS mean_pred_milli,
           CAST(sum(CASE WHEN y_milli = 1000 THEN 1 ELSE 0 END) * 1000
             // count(*) AS BIGINT) AS emp_rate_milli,
           CAST(sum(CAST((p_milli - y_milli) AS HUGEINT)
             * (p_milli - y_milli)) // (count(*) * 1000) AS BIGINT)
             AS brier_milli
         FROM b GROUP BY 1 ORDER BY 1""",
    // q268: seasonal-naive MASE per type — lag-7 MAE vs lag-1 naive
    // MAE, cross-multiplied onto the ppm grid on HUGEINT
    // (EventOps.seasonalNaiveMaseOn)
    "q268_forecast_mase" ->
      """WITH daily AS (
           SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
         lagd AS (
           SELECT event_type, cnt,
             lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY day)
               AS l7,
             lag(cnt, 1) OVER (PARTITION BY event_type ORDER BY day)
               AS l1
           FROM daily),
         m AS (
           SELECT event_type,
             CAST(sum(CASE WHEN l7 IS NOT NULL THEN abs(cnt - l7) END)
               AS HUGEINT) AS mae7_sum,
             CAST(count(l7) AS HUGEINT) AS n7,
             CAST(sum(CASE WHEN l1 IS NOT NULL THEN abs(cnt - l1) END)
               AS HUGEINT) AS mae1_sum,
             CAST(count(l1) AS HUGEINT) AS n1
           FROM lagd GROUP BY 1)
         SELECT event_type, CAST(n7 AS BIGINT) AS n_eval_days,
           CAST(mae7_sum AS BIGINT) AS mae7_sum,
           CAST(mae1_sum AS BIGINT) AS mae1_sum,
           CAST(CASE WHEN mae1_sum > 0
             THEN mae7_sum * n1 * 1000000 // (mae1_sum * n7) END
             AS BIGINT) AS mase_ppm
         FROM m ORDER BY event_type""",
    // q281: the SessionReplayStream batch twin — gap-session summaries
    // with purchase rollups on the shared session CTE, bounded slice
    // (SessionReplayStream.sessionsBatch; stream ≡ batch spec-pinned)
    "q281_session_replay" ->
      ("WITH " + sessionsCte + """
         SELECT user_id,
           CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
           CAST(max(epoch_us(ts)) AS BIGINT) AS end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_purchases,
           CAST(sum(coalesce(CAST(round(value * 100, 0) AS BIGINT), 0))
             AS BIGINT) AS total_c
         FROM sessev WHERE user_id < 20
         GROUP BY user_id, session_seq
         ORDER BY user_id, start_us"""),
    // q298: exact Mann–Whitney AUC of the q267 propensity score —
    // doubled-grid midranks, one ppm floor (EventOps.exactAucOn)
    "q298_exact_auc" ->
      """WITH firsthalf AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_click
           FROM events
           WHERE CAST(date_trunc('day', ts) AS DATE) < DATE '2024-01-16'
           GROUP BY 1),
         outcome AS (
           SELECT DISTINCT user_id FROM events
           WHERE CAST(date_trunc('day', ts) AS DATE) >= DATE '2024-01-16'
             AND event_type = 'purchase'
             AND CAST(round(value * 100, 0) AS BIGINT) >= 10000),
         scored AS (
           SELECT f.n_click * 1000 // f.n_ev AS p,
             CASE WHEN o.user_id IS NOT NULL THEN 1 ELSE 0 END AS y
           FROM firsthalf f LEFT JOIN outcome o
             ON f.user_id = o.user_id),
         g AS (SELECT p, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos FROM scored GROUP BY 1),
         b AS (SELECT p, n, n_pos,
             CAST(coalesce(sum(n) OVER (ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS below
           FROM g),
         agg AS (SELECT
             CAST(sum(n_pos * (2 * below + n + 1)) AS HUGEINT)
               AS sum2r_pos,
             CAST(sum(n_pos) AS HUGEINT) AS npos,
             CAST(sum(n - n_pos) AS HUGEINT) AS nneg
           FROM b)
         SELECT CAST(npos AS BIGINT) AS n_pos,
           CAST(nneg AS BIGINT) AS n_neg,
           CAST((sum2r_pos - npos * (npos + 1)) * 1000000
             // (2 * npos * nneg) AS BIGINT) AS auc_ppm
         FROM agg""",
    // q304: frequent item triples — per-user cap 12 (C(cap,3) bound),
    // support ≥ 2 pre-filter, top-25 (GraphOps.frequentTriplesOn)
    "q304_frequent_triples" ->
      """WITH grid AS (SELECT user_id,
             CAST(json_extract_string(props, '$.k') AS INT) AS item,
             count(*) AS n_ev
           FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
           GROUP BY 1, 2),
         ui AS (SELECT user_id, item FROM (
             SELECT user_id, item, row_number() OVER (PARTITION BY user_id
               ORDER BY n_ev DESC, item) AS rk FROM grid)
           WHERE rk <= 12),
         t AS (SELECT a.item AS i, b.item AS j, c.item AS k,
             CAST(count(*) AS BIGINT) AS n_ijk
           FROM ui a JOIN ui b ON a.user_id = b.user_id
             AND a.item < b.item
           JOIN ui c ON b.user_id = c.user_id AND b.item < c.item
           GROUP BY 1, 2, 3 HAVING count(*) >= 2)
         SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST(k AS INT) AS k, n_ijk
         FROM t ORDER BY n_ijk DESC, i, j, k LIMIT 25""",
    // q305: funnel stage-gap p50/p90 matrix on the shared ordered
    // funnel stage times (EventOps.stageGapQuantilesOn)
    "q305_stage_gaps" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'signup' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
           JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
         s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
           JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'click' AND e.ts > s2.t2 GROUP BY 1),
         s4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM events e
           JOIN s3 ON e.user_id = s3.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s3.t3 GROUP BY 1),
         gaps AS (
           SELECT 'signup->view' AS stage,
             epoch_us(s2.t2) - epoch_us(s1.t1) AS gap_us
           FROM s1 JOIN s2 ON s1.user_id = s2.user_id
           UNION ALL SELECT 'view->click',
             epoch_us(s3.t3) - epoch_us(s2.t2)
           FROM s2 JOIN s3 ON s2.user_id = s3.user_id
           UNION ALL SELECT 'click->purchase',
             epoch_us(s4.t4) - epoch_us(s3.t3)
           FROM s3 JOIN s4 ON s3.user_id = s4.user_id),
         rk AS (SELECT stage, gap_us,
             row_number() OVER (PARTITION BY stage ORDER BY gap_us)
               AS r,
             count(*) OVER (PARTITION BY stage) AS n FROM gaps)
         SELECT stage, CAST(max(n) AS BIGINT) AS n_users,
           CAST(max(CASE WHEN r = (n + 1) // 2 THEN gap_us END)
             AS BIGINT) AS p50_gap_us,
           CAST(max(CASE WHEN r = (9 * n + 9) // 10 THEN gap_us END)
             AS BIGINT) AS p90_gap_us
         FROM rk GROUP BY stage ORDER BY stage""",
    // q292: daily net drawdown panel — cumsum → running max →
    // difference, exact cents (EventOps.drawdownPanelOn)
    "q292_drawdown" ->
      """WITH daily AS (
           SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = 'purchase'
               THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
               AS BIGINT)
             - CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
               END) AS BIGINT) * 5000 AS net_c
           FROM events GROUP BY 1),
         cum AS (SELECT day, net_c,
             CAST(sum(net_c) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_c
           FROM daily),
         dd AS (SELECT day, net_c, cum_c,
             CAST(max(cum_c) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS peak_c
           FROM cum)
         SELECT day, net_c, cum_c, peak_c,
           CAST(peak_c - cum_c AS BIGINT) AS drawdown_c
         FROM dd ORDER BY day""",
    // q293: conversion path trigrams — the two event types preceding
    // each purchase, top-15 (EventOps.conversionPathsOn)
    "q293_conversion_paths" ->
      """WITH seq AS (SELECT event_type,
             lag(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS p1,
             lag(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS p2
           FROM events)
         SELECT p2, p1, CAST(count(*) AS BIGINT) AS n_paths
         FROM seq WHERE event_type = 'purchase'
           AND p1 IS NOT NULL AND p2 IS NOT NULL
         GROUP BY 1, 2 ORDER BY n_paths DESC, p2, p1 LIMIT 15""",
    // q294: purchase-velocity screen — (user, day) cells at >= 3
    // purchases (DataQuality.velocityScreenOn)
    "q294_velocity_screen" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS total_c
         FROM events WHERE event_type = 'purchase'
         GROUP BY 1, 2 HAVING count(*) >= 3 ORDER BY day, user_id""",
    // q290: weekly-cohort cumulative LTV — cents exact, per-user LTV
    // one floor division, arithmetic week index both engines
    // (EventOps.cohortLtvOn)
    "q290_cohort_ltv" ->
      """WITH first_w AS (SELECT user_id,
             CAST(datediff('day', DATE '2024-01-01',
               CAST(min(ts) AS DATE)) // 7 AS INT) AS cohort_w
           FROM events GROUP BY 1),
         cell AS (SELECT f.cohort_w,
             CAST(datediff('day', DATE '2024-01-01',
               CAST(e.ts AS DATE)) // 7 AS INT) - f.cohort_w AS w_since,
             CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT))
               AS BIGINT) AS rev_c
           FROM events e JOIN first_w f ON e.user_id = f.user_id
           WHERE e.event_type = 'purchase' GROUP BY 1, 2),
         sz AS (SELECT cohort_w, CAST(count(*) AS BIGINT) AS n_users
           FROM first_w GROUP BY 1)
         SELECT c.cohort_w, CAST(c.w_since AS INT) AS w_since,
           s.n_users,
           CAST(sum(c.rev_c) OVER (PARTITION BY c.cohort_w
             ORDER BY c.w_since
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_rev_c,
           CAST(sum(c.rev_c) OVER (PARTITION BY c.cohort_w
             ORDER BY c.w_since
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             // s.n_users AS BIGINT) AS ltv_c_per_user
         FROM cell c JOIN sz s ON c.cohort_w = s.cohort_w
         ORDER BY c.cohort_w, c.w_since""",
    // q286: Markov stationary distribution — 8 generated power-
    // iteration rounds (the q173 MATERIALIZED-rounds rule), per-term
    // floor division on HUGEINT (EventOps.markovStationaryOn)
    "q286_markov_stationary" -> markovStationarySql(8),
    // q287: Wilson 95% bounds per A/B arm — exact counts, the two
    // bounds are the only floats, identical literal tree both engines
    // (EventOps.wilsonIntervalsOn)
    "q287_wilson_interval" ->
      """WITH u AS (SELECT user_id, user_id % 2 AS arm,
             max(CASE WHEN event_type = 'purchase'
                   AND CAST(round(value * 100, 0) AS BIGINT) >= 10000
                 THEN 1 ELSE 0 END) AS converted
           FROM events GROUP BY 1),
         a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(converted) AS BIGINT) AS n_converted
           FROM u GROUP BY 1)
         SELECT CAST(arm AS INT) AS arm, n_users, n_converted,
           round(((CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE))
              + 1.96 * 1.96 / (2.0 * CAST(n_users AS DOUBLE))
              - 1.96 * sqrt((CAST(n_converted AS DOUBLE)
                   / CAST(n_users AS DOUBLE))
                 * (1.0 - CAST(n_converted AS DOUBLE)
                   / CAST(n_users AS DOUBLE))
                 / CAST(n_users AS DOUBLE)
                 + 1.96 * 1.96 / (4.0 * CAST(n_users AS DOUBLE)
                   * CAST(n_users AS DOUBLE))))
            / (1.0 + 1.96 * 1.96 / CAST(n_users AS DOUBLE)), 6)
             AS wilson_lo,
           round(((CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE))
              + 1.96 * 1.96 / (2.0 * CAST(n_users AS DOUBLE))
              + 1.96 * sqrt((CAST(n_converted AS DOUBLE)
                   / CAST(n_users AS DOUBLE))
                 * (1.0 - CAST(n_converted AS DOUBLE)
                   / CAST(n_users AS DOUBLE))
                 / CAST(n_users AS DOUBLE)
                 + 1.96 * 1.96 / (4.0 * CAST(n_users AS DOUBLE)
                   * CAST(n_users AS DOUBLE))))
            / (1.0 + 1.96 * 1.96 / CAST(n_users AS DOUBLE)), 6)
             AS wilson_hi
         FROM a ORDER BY arm""",
    // q283: time-to-first-purchase hazard table — at-risk / converted /
    // censored per day-since-first-activity, hazard on the ppm grid
    // (EventOps.conversionHazardOn; censor day = dataset last day)
    "q283_conversion_hazard" ->
      """WITH first_ev AS (
           SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS d0
           FROM events GROUP BY 1),
         first_p AS (
           SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS dp
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         u AS (
           SELECT datediff('day', f.d0,
               coalesce(p.dp, DATE '2024-01-30')) AS t_day,
             CASE WHEN p.dp IS NOT NULL THEN 1 ELSE 0 END AS converted
           FROM first_ev f LEFT JOIN first_p p
             ON f.user_id = p.user_id),
         byday AS (
           SELECT t_day, CAST(count(*) AS BIGINT) AS n_at_day,
             CAST(sum(converted) AS BIGINT) AS n_convert,
             CAST(sum(1 - converted) AS BIGINT) AS n_censored
           FROM u GROUP BY 1)
         SELECT CAST(t_day AS INT) AS t_day,
           CAST(sum(n_at_day) OVER (ORDER BY t_day DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS at_risk,
           n_convert, n_censored,
           CAST(n_convert * 1000000 // sum(n_at_day) OVER (
             ORDER BY t_day DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS hazard_ppm
         FROM byday ORDER BY t_day""",
    // q272: directional association rules on the capped pair grid —
    // confidence and lift in ppm, top-25 (GraphOps.assocRulesOnPairs)
    "q272_assoc_rules" ->
      """WITH grid AS (SELECT user_id,
             CAST(json_extract_string(props, '$.k') AS INT) AS item,
             count(*) AS n_ev
           FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
           GROUP BY 1, 2),
         ui AS (SELECT user_id, item FROM (
             SELECT user_id, item, row_number() OVER (PARTITION BY user_id
               ORDER BY n_ev DESC, item) AS rk FROM grid)
           WHERE rk <= 500),
         nu AS (SELECT CAST(count(DISTINCT user_id) AS HUGEINT) AS n_users
           FROM ui),
         ic AS (SELECT item, CAST(count(*) AS HUGEINT) AS n_i
           FROM ui GROUP BY 1),
         pairs AS (SELECT a.item AS i, b.item AS j,
             CAST(count(*) AS HUGEINT) AS n_ij
           FROM ui a JOIN ui b ON a.user_id = b.user_id
             AND a.item < b.item
           GROUP BY 1, 2 HAVING count(*) >= 5),
         rules AS (SELECT i AS ante, j AS cons, n_ij FROM pairs
           UNION ALL SELECT j, i, n_ij FROM pairs),
         scored AS (
           SELECT r.ante, r.cons, CAST(r.n_ij AS BIGINT) AS n_both,
             CAST(r.n_ij * 1000000 // a.n_i AS BIGINT) AS conf_ppm,
             CAST(r.n_ij * n_users * 1000000 // (a.n_i * c.n_i)
               AS BIGINT) AS lift_ppm
           FROM rules r JOIN ic a ON r.ante = a.item
             JOIN ic c ON r.cons = c.item CROSS JOIN nu)
         SELECT CAST(ante AS INT) AS ante, CAST(cons AS INT) AS cons,
           n_both, conf_ppm, lift_ppm
         FROM scored
         ORDER BY conf_ppm DESC, lift_ppm DESC, ante, cons LIMIT 25""",
    // q274: seasonality-adjusted anomaly top-10 — deviation from the
    // own-dow mean, cross-multiplied milli grid, (epoch+4)%7 weekday
    // (EventOps.seasonalAnomalyOn)
    "q274_seasonal_anomaly" ->
      """WITH daily AS (
           SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1),
         dd AS (
           SELECT day, CAST((datediff('day', DATE '1970-01-01', day)
             + 4) % 7 AS INT) AS dow, cnt
           FROM daily),
         dowm AS (
           SELECT dow, CAST(count(*) AS BIGINT) AS n_dow,
             CAST(sum(cnt) AS HUGEINT) AS sum_dow
           FROM dd GROUP BY 1)
         SELECT d.day, d.dow, d.cnt,
           CAST(m.sum_dow * 1000 // m.n_dow AS BIGINT)
             AS dow_mean_milli,
           CAST(abs(CAST(d.cnt AS HUGEINT) * m.n_dow - m.sum_dow)
             * 1000 // m.n_dow AS BIGINT) AS dev_milli
         FROM dd d JOIN dowm m ON d.dow = m.dow
         ORDER BY dev_milli DESC, d.day LIMIT 10""",
    // q310: CDC log compaction — last-writer-wins per (user, k) on the
    // (ts, event_id) total order via row_number DESC (Spark rides the
    // map-side argmax struct instead); errors are tombstones; rollup
    // to the bounded item grid
    "q310_cdc_compaction" ->
      """WITH cdc AS (SELECT
           CAST(json_extract_string(props, '$.k') AS INT) AS k, user_id,
           CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_del,
           CAST(round(value * 100, 0) AS BIGINT) AS v_c,
           epoch_us(ts) AS us, event_id
         FROM events),
         latest AS (SELECT * FROM cdc
           QUALIFY row_number() OVER (PARTITION BY user_id, k
             ORDER BY us DESC, event_id DESC) = 1)
         SELECT k, count(*)::BIGINT AS n_keys,
           CAST(sum(1 - is_del) AS BIGINT) AS n_live,
           CAST(sum(is_del) AS BIGINT) AS n_tombstoned,
           CAST(sum(CASE WHEN is_del = 0 THEN v_c ELSE 0 END) AS BIGINT)
             AS live_value_c
         FROM latest GROUP BY k ORDER BY k""",
    // q315: time-decayed item popularity — exponential half-life as a
    // binary shift (integer-exact halving per 7 elapsed days, fixed
    // anchor), so no float decay can straddle a rounding boundary
    "q315_decayed_popularity" ->
      """WITH log AS (SELECT
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(round(value * 100, 0) AS BIGINT) AS v_c,
           greatest(0, least(62,
             datediff('day', CAST(ts AS DATE), DATE '2024-02-15') // 7))
             AS sh
         FROM events),
         dec AS (SELECT k, v_c,
           CASE WHEN v_c >= 0 THEN v_c >> sh ELSE -((-v_c) >> sh) END AS dv
         FROM log)
         SELECT k, CAST(sum(v_c) AS BIGINT) AS raw_c,
           CAST(sum(dv) AS BIGINT) AS decayed_c,
           CASE WHEN sum(v_c) <> 0 THEN
             CAST(sum(dv)::HUGEINT * 1000000 // sum(v_c) AS BIGINT)
           ELSE 0 END AS retained_ppm
         FROM dec GROUP BY k ORDER BY k""",
    // q317: watermark-delay tuning panel — repeat-key inter-arrival
    // CDF at the candidate delay grid; within_ppm at delay d is the
    // duplicate-catch rate dropDuplicatesWithinWatermark(d) achieves
    "q317_dedup_delay_panel" ->
      """WITH log AS (SELECT user_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           epoch_us(ts) AS us, event_id FROM events),
         gaps AS (SELECT (us - lag(us) OVER (PARTITION BY user_id, k
             ORDER BY us, event_id)) // 1000000 AS gap_s FROM log),
         rep AS (SELECT gap_s FROM gaps WHERE gap_s IS NOT NULL),
         agg AS (SELECT count(*)::BIGINT AS n_repeats,
           CAST(sum(CASE WHEN gap_s <= 3600 THEN 1 ELSE 0 END) AS BIGINT) AS w1,
           CAST(sum(CASE WHEN gap_s <= 86400 THEN 1 ELSE 0 END) AS BIGINT) AS w2,
           CAST(sum(CASE WHEN gap_s <= 259200 THEN 1 ELSE 0 END) AS BIGINT) AS w3,
           CAST(sum(CASE WHEN gap_s <= 604800 THEN 1 ELSE 0 END) AS BIGINT) AS w4
         FROM rep),
         panel AS (
           SELECT CAST(3600 AS BIGINT) AS delay_s, n_repeats, w1 AS n_within FROM agg
           UNION ALL SELECT 86400, n_repeats, w2 FROM agg
           UNION ALL SELECT 259200, n_repeats, w3 FROM agg
           UNION ALL SELECT 604800, n_repeats, w4 FROM agg)
         SELECT delay_s, n_repeats, n_within,
           CASE WHEN n_repeats > 0 THEN
             CAST(n_within::HUGEINT * 1000000 // n_repeats AS BIGINT)
           ELSE 0 END AS within_ppm
         FROM panel ORDER BY delay_s""",
    // q319: value order-of-magnitude histogram — floor(log2(cents))
    // via length(bin(v)) - 1, integer-exact on both engines (a float
    // log2 can straddle a power-of-two boundary)
    "q319_value_magnitude" ->
      """WITH log AS (SELECT event_type,
           CAST(round(value * 100, 0) AS BIGINT) AS v_c FROM events),
         tot AS (SELECT event_type, sum(v_c)::HUGEINT AS tot_c
           FROM log GROUP BY 1)
         SELECT l.event_type,
           CAST(CASE WHEN l.v_c < 0 THEN -1 ELSE 1 END AS INT) AS sgn,
           CAST(length(bin(abs(l.v_c))) - 1 AS INT) AS log2_bucket,
           count(*)::BIGINT AS n_events,
           CAST(sum(l.v_c) AS BIGINT) AS cents,
           CASE WHEN t.tot_c <> 0 THEN
             CAST(sum(l.v_c)::HUGEINT * 1000000 // t.tot_c AS BIGINT)
           ELSE 0 END AS mass_ppm
         FROM log l JOIN tot t USING (event_type)
         GROUP BY 1, 2, 3, t.tot_c ORDER BY 1, 2, 3""",
    // q320: sessionization gap tuning panel — session counts under the
    // candidate gap grid; first events are exactly the NULL-lag rows
    "q320_session_gap_panel" ->
      """WITH g AS (SELECT
           (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
              ORDER BY ts, event_id)) // 1000000 AS gap_s FROM events),
         agg AS (SELECT
           CAST(sum(CASE WHEN gap_s IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_users,
           count(*)::BIGINT AS n_events,
           CAST(sum(CASE WHEN gap_s > 600 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
           CAST(sum(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
           CAST(sum(CASE WHEN gap_s > 3600 THEN 1 ELSE 0 END) AS BIGINT) AS b3
         FROM g),
         panel AS (
           SELECT CAST(600 AS BIGINT) AS gap_s,
             CAST(n_users + b1 AS BIGINT) AS n_sessions, n_events FROM agg
           UNION ALL SELECT 1800, n_users + b2, n_events FROM agg
           UNION ALL SELECT 3600, n_users + b3, n_events FROM agg)
         SELECT gap_s, n_sessions,
           CAST(n_events::HUGEINT * 1000 // n_sessions AS BIGINT)
             AS events_per_ksession
         FROM panel ORDER BY gap_s""",
    // q321: half-period share shift — per-item ppm mass share in each
    // half of the window, shift as a difference of ROUNDED shares
    "q321_share_shift" ->
      """WITH log AS (SELECT
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(round(value * 100, 0) AS BIGINT) AS v_c,
           CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
             THEN 0 ELSE 1 END AS h
         FROM events),
         per AS (SELECT k,
           CAST(sum(CASE WHEN h = 0 THEN v_c ELSE 0 END) AS BIGINT) AS c1,
           CAST(sum(CASE WHEN h = 1 THEN v_c ELSE 0 END) AS BIGINT) AS c2
         FROM log GROUP BY k),
         tot AS (SELECT sum(c1)::HUGEINT AS t1, sum(c2)::HUGEINT AS t2
           FROM per)
         SELECT k, c1, c2,
           CAST(c1::HUGEINT * 1000000 // t.t1 AS BIGINT) AS share1_ppm,
           CAST(c2::HUGEINT * 1000000 // t.t2 AS BIGINT) AS share2_ppm,
           CAST(c2::HUGEINT * 1000000 // t.t2 AS BIGINT)
             - CAST(c1::HUGEINT * 1000000 // t.t1 AS BIGINT) AS shift_ppm
         FROM per, tot t ORDER BY k""",
    // q326: priority reservoir sample + the min-k merge law — the
    // global top-k and the merged 8-shard top-ks must emit IDENTICAL
    // profiles (commutative idempotent monoid; the gate sees it as
    // row equality)
    "q326_reservoir_sample" ->
      """WITH base AS (SELECT event_id, event_type,
           CAST(round(value * 100, 0) AS BIGINT) AS v_c,
           md5(event_id || '_rs7') AS pri,
           event_id % 8 AS shard
         FROM events),
         g AS (SELECT * FROM base QUALIFY
             row_number() OVER (ORDER BY pri, event_id) <= 100),
         persh AS (SELECT * FROM base QUALIFY
             row_number() OVER (PARTITION BY shard
               ORDER BY pri, event_id) <= 100),
         m AS (SELECT * FROM persh QUALIFY
             row_number() OVER (ORDER BY pri, event_id) <= 100),
         ga AS (SELECT 'global' AS method, count(*)::BIGINT AS n,
             count(DISTINCT event_type)::BIGINT AS n_types,
             CAST(sum(v_c) AS BIGINT) AS sum_c,
             CAST(bit_xor(event_id) AS BIGINT) AS id_fp FROM g),
         ma AS (SELECT 'sharded_merge', count(*)::BIGINT,
             count(DISTINCT event_type)::BIGINT,
             CAST(sum(v_c) AS BIGINT), CAST(bit_xor(event_id) AS BIGINT)
           FROM m)
         SELECT * FROM ga UNION ALL SELECT * FROM ma ORDER BY method""",
    // q327: mergeable rank-strided quantile sketch — per-shard weighted
    // coreset, weighted-union merge, rank lookup; the measured rank
    // error must sit inside the sum-of-strides bound
    "q327_quantile_sketch" ->
      """WITH base AS (SELECT event_id,
           CAST(round(value * 100, 0) AS BIGINT) AS v_c,
           event_id % 16 AS shard
         FROM events),
         tot AS (SELECT count(*)::BIGINT AS n FROM base),
         ranked AS (SELECT v_c, shard, event_id,
             row_number() OVER (PARTITION BY shard
               ORDER BY v_c, event_id) AS rn,
             count(*) OVER (PARTITION BY shard) AS sn
           FROM base),
         rt AS (SELECT *, greatest(100, sn // 1000) AS t FROM ranked),
         kept AS (SELECT shard, v_c, rn,
             CAST(least(t, sn - rn + 1) AS BIGINT) AS w
           FROM rt WHERE (rn - 1) % t = 0),
         merged AS (SELECT v_c, w,
             sum(w) OVER (ORDER BY v_c, shard, rn) AS cw
           FROM kept),
         grid AS (SELECT v_c, count(*)::BIGINT AS c FROM base GROUP BY 1),
         ecdf AS (SELECT v_c, sum(c) OVER (ORDER BY v_c) AS cum FROM grid),
         bound AS (SELECT CAST(sum(t) AS BIGINT) AS err_bound FROM
           (SELECT DISTINCT shard, t FROM rt)),
         ps AS (SELECT unnest([50, 90, 99]) AS p),
         tgt AS (SELECT p, (p * n + 99) // 100 AS target_rank FROM ps, tot),
         exact AS (SELECT p, target_rank, min(v_c) AS exact_v_c
           FROM tgt JOIN ecdf ON ecdf.cum >= tgt.target_rank GROUP BY 1, 2),
         est AS (SELECT p, target_rank, min(v_c) AS sketch_v_c
           FROM tgt JOIN merged ON merged.cw >= tgt.target_rank
           GROUP BY 1, 2),
         estr AS (SELECT e.p, e.target_rank, e.sketch_v_c,
             coalesce(max(ec.cum), 0) AS sketch_rank
           FROM est e LEFT JOIN ecdf ec ON ec.v_c <= e.sketch_v_c
           GROUP BY 1, 2, 3)
         SELECT x.p, x.target_rank, x.exact_v_c, r.sketch_v_c,
           CAST(abs(r.sketch_rank - x.target_rank) AS BIGINT) AS rank_err,
           (SELECT err_bound FROM bound) AS err_bound
         FROM exact x JOIN estr r USING (p, target_rank) ORDER BY p""",
    // q331: synchronous label propagation, 4 unrolled mode-label rounds
    // over the capped co-occurrence graph; the trace (labels, largest
    // community, sum fingerprint) doubles as an effective-diameter
    // measurement
    "q331_label_prop" -> {
      def rnd(r: Int) =
        s"""l$r AS MATERIALIZED (SELECT node, label FROM (
             SELECT s.src AS node, p.label, count(*) AS c
             FROM sym s JOIN l${r - 1} p ON s.dst = p.node GROUP BY 1, 2)
           QUALIFY row_number() OVER (PARTITION BY node
             ORDER BY c DESC, label) = 1)"""
      def trace(r: Int) =
        s"""SELECT $r AS round, count(*)::BIGINT AS n_labels,
             CAST(max(sz) AS BIGINT) AS largest_community,
             CAST(sum(fp) AS BIGINT) AS assign_fp
           FROM (SELECT label, count(*) AS sz, sum(node * label) AS fp
                 FROM l$r GROUP BY 1)"""
      "WITH " + coPairsCte + s""",
         sym AS (SELECT i AS src, j AS dst FROM cpairs
           UNION ALL SELECT j, i FROM cpairs),
         l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
         ${rnd(1)},
         ${rnd(2)},
         ${rnd(3)},
         ${rnd(4)}
         ${trace(0)} UNION ALL ${trace(1)} UNION ALL ${trace(2)}
         UNION ALL ${trace(3)} UNION ALL ${trace(4)} ORDER BY round"""
    },
    // q332: HITS hubs & authorities on the bipartite customer→part
    // purchase graph — 3 unrolled mutual-recursion rounds, each
    // half-round max-normalized to ppm by floor division (the q113
    // fixed-point device); top-15 per side, ties → node id
    "q332_hits_scores" -> {
      def half(prev: String, cur: String, inKey: String, outKey: String,
          inCol: String, outCol: String) =
        s"""${cur}r AS MATERIALIZED (SELECT $outKey,
             CAST(sum($inCol) AS HUGEINT) AS raw
           FROM edges JOIN $prev USING ($inKey) GROUP BY 1),
         $cur AS MATERIALIZED (SELECT $outKey,
             CAST(raw * 1000000 // (SELECT max(raw) FROM ${cur}r)
               AS BIGINT) AS $outCol
           FROM ${cur}r)"""
      def round(r: Int) =
        half(s"h${r - 1}", s"a$r", "cust", "part", "hub", "auth") + ",\n" +
          half(s"a$r", s"h$r", "part", "cust", "auth", "hub")
      s"""WITH edges AS MATERIALIZED (
           SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         h0 AS (SELECT DISTINCT cust, CAST(1000000 AS BIGINT) AS hub
           FROM edges),
         ${round(1)},
         ${round(2)},
         ${round(3)},
         ta AS (SELECT 'auth' AS side, part AS node_id, auth AS score_ppm
           FROM a3 ORDER BY auth DESC, part LIMIT 15),
         th AS (SELECT 'hub' AS side, cust AS node_id, hub AS score_ppm
           FROM h3 ORDER BY hub DESC, cust LIMIT 15),
         u AS (SELECT * FROM ta UNION ALL SELECT * FROM th)
         SELECT side, node_id, score_ppm,
           row_number() OVER (PARTITION BY side
             ORDER BY score_ppm DESC, node_id) AS rk
         FROM u ORDER BY side, rk"""
    },
    // q336: personalized PageRank — q113's fixed-point integer kernel
    // with teleport mass restricted to the 4 highest-degree seeds;
    // 3 unrolled rounds on the billionths grid, top-20
    "q336_personalized_pagerank" -> {
      def iter(prev: String, cur: String) =
        s"""$cur AS (SELECT n.item, n.is_seed,
             CAST((15 * (CASE WHEN n.is_seed = 1
                 THEN CAST(1000000000 AS BIGINT) // 4 ELSE 0 END)) // 100
               + (85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS r
           FROM sn n LEFT JOIN (
             SELECT e.dst AS item,
               CAST(sum($prev.r // deg.d) AS BIGINT) AS c
             FROM edges e JOIN $prev ON e.src = $prev.item
             JOIN deg ON e.src = deg.src GROUP BY 1) s
           ON n.item = s.item)"""
      "WITH " + coPairsCte + s""",
         edges AS (SELECT i AS src, j AS dst FROM cpairs
           UNION ALL SELECT j, i FROM cpairs),
         deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
         nodes AS (SELECT DISTINCT src AS item FROM edges),
         seeds AS (SELECT src AS item FROM deg
           ORDER BY d DESC, src LIMIT 4),
         sn AS (SELECT n.item,
             CASE WHEN s.item IS NULL THEN 0 ELSE 1 END AS is_seed
           FROM nodes n LEFT JOIN seeds s ON n.item = s.item),
         p0 AS (SELECT item, is_seed,
             CAST(CASE WHEN is_seed = 1
                 THEN CAST(1000000000 AS BIGINT) // 4 ELSE 0 END
               AS BIGINT) AS r
           FROM sn),
         ${iter("p0", "p1")},
         ${iter("p1", "p2")},
         ${iter("p2", "p3")}
         SELECT item, is_seed, r AS ppr_q,
           round(CAST(r AS DOUBLE) / 1000000000.0, 6) AS ppr
         FROM p3 ORDER BY ppr_q DESC, item LIMIT 20"""
    },
    // q344: Markov removal-effect attribution — absorbing-chain
    // journeys (START -> channels -> CONV/NULL), 10 unrolled ppm
    // absorption rounds per scenario (base + one per channel with the
    // channel's inbound edges redirected to NULL), effects clamped at
    // 0 and normalized to shares
    "q344_removal_attribution" -> {
      // channels = every generator event type except the absorbing
      // conversion event; sourced from the shared enum so a generator
      // change diverges HERE (compile-visible) instead of silently
      // emitting a different row set than the engine's data-derived set
      val chans = graft.Tables.EventTypes.filterNot(_ == "purchase")
      val iters = 10
      def scen(tag: String, removed: Option[String]): String = {
        val red = removed match {
          case Some(r) =>
            s"""red$tag AS (SELECT src,
                 CASE WHEN dst = '$r' THEN 'NULL' ELSE dst END AS dst,
                 CAST(sum(c) AS BIGINT) AS c
               FROM counts WHERE src <> '$r' GROUP BY 1, 2)"""
          case None =>
            s"red$tag AS (SELECT src, dst, c FROM counts)"
        }
        val rounds = (1 to iters).map { k =>
          s"""p$tag$k AS (SELECT st.src,
               CAST(coalesce(cv.conv_ppm, 0) + coalesce(j.acc, 0)
                 AS BIGINT) AS p
             FROM states$tag st
             LEFT JOIN conv$tag cv ON cv.src = st.src
             LEFT JOIN (SELECT t.src,
                 CAST(sum(t.ppm * pp.p) // 1000000 AS BIGINT) AS acc
               FROM chan$tag t JOIN p$tag${k - 1} pp ON t.dst = pp.src
               GROUP BY 1) j ON j.src = st.src)"""
        }.mkString(",\n         ")
        s"""$red,
         tot$tag AS (SELECT src, CAST(sum(c) AS BIGINT) AS tot
           FROM red$tag GROUP BY 1),
         t$tag AS MATERIALIZED (SELECT r.src, r.dst,
             CAST(r.c * 1000000 // t.tot AS BIGINT) AS ppm
           FROM red$tag r JOIN tot$tag t ON r.src = t.src),
         conv$tag AS (SELECT src, ppm AS conv_ppm FROM t$tag
           WHERE dst = 'CONV'),
         chan$tag AS (SELECT src, dst, ppm FROM t$tag
           WHERE dst <> 'CONV' AND dst <> 'NULL'),
         states$tag AS (SELECT DISTINCT src FROM t$tag),
         p${tag}0 AS (SELECT src, CAST(0 AS BIGINT) AS p
           FROM states$tag),
         $rounds,
         r$tag AS (SELECT p FROM p$tag$iters WHERE src = 'START')"""
      }
      val scens = scen("b", None) + ",\n         " +
        chans.zipWithIndex.map { case (c, i) =>
          scen(s"x$i", Some(c))
        }.mkString(",\n         ")
      val effRows = chans.zipWithIndex.map { case (c, i) =>
        s"""SELECT '$c' AS channel, (SELECT p FROM rb) AS base_ppm,
           (SELECT p FROM rx$i) AS removed_ppm"""
      }.mkString(" UNION ALL ")
      s"""WITH seq0 AS (SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn
           FROM events),
         fp AS (SELECT user_id, min(rn) AS fp_rn FROM seq0
           WHERE event_type = 'purchase' GROUP BY 1),
         k0 AS (SELECT s.user_id, s.rn, s.event_type, f.fp_rn
           FROM seq0 s LEFT JOIN fp f USING (user_id)
           WHERE f.fp_rn IS NULL OR s.rn <= f.fp_rn),
         k1 AS (SELECT user_id, rn, fp_rn,
             CASE WHEN event_type = 'purchase' THEN 'CONV'
               ELSE event_type END AS dst0,
             coalesce(lag(CASE WHEN event_type = 'purchase' THEN 'CONV'
               ELSE event_type END) OVER (PARTITION BY user_id
               ORDER BY rn), 'START') AS src,
             max(rn) OVER (PARTITION BY user_id) AS last_rn
           FROM k0),
         hops AS (SELECT src, dst0 AS dst FROM k1 WHERE src <> 'CONV'
           UNION ALL
           SELECT dst0, 'NULL' FROM k1
           WHERE fp_rn IS NULL AND rn = last_rn),
         counts AS MATERIALIZED (SELECT src, dst,
             CAST(count(*) AS BIGINT) AS c
           FROM hops GROUP BY 1, 2),
         $scens,
         eff AS (SELECT channel, base_ppm, removed_ppm,
             greatest(base_ppm - removed_ppm, 0) AS effect_ppm
           FROM ($effRows)),
         se AS (SELECT CAST(sum(effect_ppm) AS BIGINT) AS sum_eff
           FROM eff)
         SELECT e.channel, e.base_ppm, e.removed_ppm, e.effect_ppm,
           CASE WHEN s.sum_eff > 0
             THEN CAST(e.effect_ppm * 1000000 // s.sum_eff AS BIGINT)
             ELSE 0 END AS share_ppm
         FROM eff e, se s ORDER BY channel"""
    },
  )
}
