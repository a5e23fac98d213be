package graft.oracle

import graft.operators.{CoreQueries, DedupOps, EventOps, TextAnalysisOps}
/** Shared DuckDB-oracle CTE builders: the SQL fragments several family
  * oracle maps interpolate (quality/lang/session/graph/prefix/IVF/
  * Lloyd/PCA chains), kept in ONE place so a fragment's rounding
  * stages, tie orders, and caps cannot drift between the queries that
  * share them. Split out of SparkEntry in round 9 purely for
  * reviewability — every string is byte-identical to the pre-split
  * registry (the oracle gate replays all 204).
  */
private[graft] object OracleCtes {
  /** Shared shingle→df-capped-postings CTE body for every exact-Jaccard
    * oracle (q28/q29/q30/q53/q59). The df cap is corpus-relative with an
    * absolute floor, mirroring DedupOps.DfCapFloor/DfCapFrac — one copy so
    * threshold/cap tuning cannot silently diverge between the oracle
    * entries (they all gate the same postings pipeline).
    */
  /** The q35 per-doc quality formula as a CTE chain ending at
    * `qdoc (doc_id, n_tokens INT, quality DOUBLE)` — shared by the q35
    * and q123 oracles so the banded scoring cannot drift between them.
    */
  val qualityDocCte: String =
    """q35t AS (SELECT doc_id, text, string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
           FROM documents),
         q35m AS (SELECT doc_id, len(toks) AS n_tokens,
           CASE WHEN len(toks) > 0
                THEN CAST(floor(len(list_distinct(toks)) * 3000.0 / len(toks)) AS BIGINT)
                ELSE 0 END AS diversity,
           CASE WHEN len(toks) BETWEEN 20 AND 1000 THEN 400
                WHEN len(toks) BETWEEN 5 AND 19 THEN 200 ELSE 0 END AS length_band,
           CASE WHEN len(toks) > 0
                THEN len(list_filter(toks, x -> x IN
                  ('the','a','an','of','to','in','and','is','it','that'))) * 1.0 / len(toks)
                ELSE 0.0 END AS sr,
           CASE WHEN length(regexp_replace(text, '\s', '', 'g')) > 0
                THEN length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g')) * 1.0 /
                     length(regexp_replace(text, '\s', '', 'g'))
                ELSE 0.0 END AS pr
           FROM q35t),
         qdoc AS (SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           greatest(0, (length_band +
             (CASE WHEN sr BETWEEN 0.01 AND 0.6 THEN 300 ELSE 0 END) -
             (CASE WHEN pr > 0.2 THEN 200 ELSE 0 END)) * 10 + diversity) / 10000.0 AS quality
           FROM q35m)"""

  /** The q132 Morton interleave as DuckDB bit arithmetic — generated so
    * the 62 terms cannot be hand-mistyped; mirrors the shiftleft/
    * shiftright/bitwiseAND fold in CoreQueries.q132ZorderLayout
    * (31 bits per dimension).
    */
  /** The stopword-argmax language prediction chain shared by the q34
    * and q155 oracles — mirrors TextAnalysisOps.langIdExpr (scores,
    * argmax with the en>es>fr>de>zh tiebreak, 'und' fallback), ending
    * at `p (doc_id, lang, lang_pred)`.
    */
  val langPredCte: String =
    """t AS (SELECT doc_id, lang, string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
           FROM documents),
         s AS (SELECT doc_id, lang,
           len(list_filter(toks, x -> x IN ('the','a','of','and','to','is'))) AS s_en,
           len(list_filter(toks, x -> x IN ('el','la','de','y','que','es'))) AS s_es,
           len(list_filter(toks, x -> x IN ('le','la','et','les','des','est'))) AS s_fr,
           len(list_filter(toks, x -> x IN ('der','die','und','das','ist','ein'))) AS s_de,
           len(list_filter(toks, x -> x IN ('的','是','了','在','我','有'))) AS s_zh
           FROM t),
         p AS (SELECT doc_id, lang, CASE
             WHEN greatest(s_en, s_es, s_fr, s_de, s_zh) <= 0 THEN 'und'
             WHEN s_en = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'en'
             WHEN s_es = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'es'
             WHEN s_fr = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'fr'
             WHEN s_de = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'de'
             WHEN s_zh = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'zh'
             ELSE 'und' END AS lang_pred FROM s)"""

  /** The quantize→per-label-integer-centroid CTE chain shared by the
    * q166 and q168 oracles — mirrors EmbedHealthOps.quantized/centroids
    * (2^10 grid, per-dim rounded integer mean), ending at
    * `xq (vec_id, label, q)` and `cent (label, cq)`.
    */
  val embedCentroidCte: String =
    """e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
           FROM embeddings),
       xq AS (SELECT vec_id, label, list_transform(v,
           x -> CAST(round(x * 1024) AS BIGINT)) AS q FROM e),
       mud AS (SELECT label, i.range AS d,
           CAST(round(avg(q[i.range])) AS BIGINT) AS mu
         FROM xq, range(1, 65) i GROUP BY 1, 2),
       cent AS (SELECT label, list(mu ORDER BY d) AS cq FROM mud
         GROUP BY label)"""

  /** The capped co-occurrence pair/degree CTE chain shared by the q153
    * and q154 oracles — replays EventOps.cappedUserItems (top-500 per
    * user by (n_ev DESC, item)) and GraphOps.coPairsOn (support ≥ 5)
    * exactly, ending at `cpairs (i < j)` and `cdeg (item, degree)`.
    */
  /** The q58 gap-sessionization chain (30-minute gap): `sessev` keeps
    * every event with its session assignment, `sess` is the per-session
    * rollup — shared by the q58/q174/q201 oracles so the session
    * definition cannot drift.
    */
  val sessionsCte: String =
    """sessev AS (
         SELECT user_id, ts, event_type, value,
           sum(CASE WHEN prev_ts IS NULL
                     OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
         FROM (SELECT user_id, ts, event_type, value,
                 lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
               FROM events)),
       sess AS (SELECT user_id, session_seq,
         min(ts) AS session_start, max(ts) AS session_end,
         count(*) AS n_events
       FROM sessev
       GROUP BY user_id, session_seq)"""

  /** The q173 k-core peel chain, generated so the `peels` unrolled
    * rounds cannot be hand-mistyped: e0 = the capped co-occurrence
    * edges, each round drops nodes of degree < k and their edges.
    * MATERIALIZED is load-bearing: each e_p is referenced three times
    * by round p+1, so an inlining optimizer would re-expand the chain
    * exponentially (observed as a DuckDB OOM at sf0.1) — exactly the
    * re-evaluation the Spark side prevents with per-round
    * localCheckpoint.
    */
  def kCorePeelSql(k: Int, peels: Int): String =
    (1 to peels).map { p =>
      s"""d$p AS MATERIALIZED (SELECT node, count(*) AS d FROM (
           SELECT i AS node FROM e${p - 1}
           UNION ALL SELECT j FROM e${p - 1}) GROUP BY 1),
         k$p AS MATERIALIZED (SELECT node FROM d$p WHERE d >= $k),
         e$p AS MATERIALIZED (SELECT i, j FROM e${p - 1}
           WHERE i IN (SELECT node FROM k$p)
             AND j IN (SELECT node FROM k$p))"""
    }.mkString(",\n         ")

  val coPairsCte: String =
    """grid AS (SELECT user_id,
         CAST(json_extract_string(props, '$.k') AS INT) AS item,
         count(*) AS n_ev
       FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
       GROUP BY 1, 2),
     ui AS (SELECT user_id, item FROM (
         SELECT user_id, item, row_number() OVER (PARTITION BY user_id
           ORDER BY n_ev DESC, item) AS rk FROM grid)
       WHERE rk <= 500),
     cpairs AS (SELECT a.item AS i, b.item AS j
       FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
       GROUP BY 1, 2 HAVING count(*) >= 5),
     cdeg AS (SELECT item, count(*) AS degree FROM (
         SELECT i AS item FROM cpairs UNION ALL SELECT j AS item FROM cpairs)
       GROUP BY 1)"""

  /** The q151 EWMA as a generated 16-term lag sum — exact dyadic weight
    * literals (BigDecimal 0.5^k, full decimal expansion) in the same
    * left-associated addition order as EventOps.ewmaDailyOn's expression
    * tree.
    */
  val ewmaTermsSql: String = (0 until 16).map(k =>
    s"coalesce(CAST(lag(cnt, $k) OVER w AS DOUBLE), 0.0) * " +
      java.math.BigDecimal.valueOf(0.5).pow(k + 1).toPlainString)
    .mkString(" + ")

  val mortonSql: String = (0 until 31).map(i =>
    s"(((l_partkey >> $i) & 1) << ${2 * i}) + " +
      s"(((l_suppkey >> $i) & 1) << ${2 * i + 1})").mkString(" + ")

  /** The q121 AllPairs/PPJoin chain ending at
    * `v (id_a, id_b, na, nb, inter, jaccard)`, generalized to a
    * rational prefix threshold p/q — shared by the q121/q144 (3/5) and
    * q184 (1/2) oracles so the prefix arithmetic and verification
    * cannot drift.
    */
  def prefixPairsCteFor(p: Int, q: Int): String =
    s"""ppt AS (SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
               ' ') AS toks
           FROM documents),
         ppsh AS (SELECT DISTINCT doc_id,
             md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS h
           FROM ppt, unnest(generate_series(1, len(toks) - 7, 1)) AS u(i)),
         ppdf AS (SELECT h, count(*) AS df FROM ppsh GROUP BY 1),
         pprk AS (SELECT s.doc_id, s.h,
             row_number() OVER (PARTITION BY s.doc_id
               ORDER BY ppdf.df, s.h) AS rk,
             count(*) OVER (PARTITION BY s.doc_id) AS n
           FROM ppsh s JOIN ppdf ON s.h = ppdf.h),
         pppref AS (SELECT doc_id, h FROM pprk
           WHERE rk <= n - ($p * n + ${q - 1}) // $q + 1),
         ppcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           FROM pppref a JOIN pppref b ON a.h = b.h AND a.doc_id < b.doc_id),
         ppsets AS (SELECT doc_id, list(h ORDER BY h) AS s, count(*) AS n
           FROM ppsh GROUP BY 1),
         v AS (SELECT id_a, id_b, sa.n AS na, sb.n AS nb,
             len(list_intersect(sa.s, sb.s)) AS inter,
             round(len(list_intersect(sa.s, sb.s))::DOUBLE /
               (sa.n + sb.n - len(list_intersect(sa.s, sb.s))), 4) AS jaccard
           FROM ppcand JOIN ppsets sa ON id_a = sa.doc_id
                       JOIN ppsets sb ON id_b = sb.doc_id)"""

  val prefixPairsCte: String = prefixPairsCteFor(3, 5)

  val shinglePostingsCte: String =
    """d0 AS (
         SELECT doc_id, string_split(
           regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
         FROM documents),
       docs AS (
         SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           for i in range(1, greatest(len(w) - 1, 1))]) AS toks
         FROM d0 WHERE len(w) >= 3),
       t0 AS (SELECT doc_id, unnest(toks) AS tok FROM docs),
       rare AS (SELECT tok FROM t0 GROUP BY tok HAVING count(*) <=
         least(200, greatest(50,
           ((SELECT count(*) FROM documents) * 2 + 99) // 100))),
       t1 AS (SELECT doc_id, tok FROM t0 JOIN rare USING (tok)),
       tok AS (SELECT doc_id, tok,
                 count(*) OVER (PARTITION BY doc_id) AS n FROM t1)"""

  /** Shared IVF codebook + inverted-list-assignment CTE body (e → dims →
    * cent → asg) for the IVF oracles (q70 probing, q75 semantic dedup) —
    * one copy so codebook rounding and the argmax tiebreak cannot diverge
    * between them.
    */
  val ivfAssignCte: String =
    """e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
            FROM embeddings),
       dims AS (
         SELECT label, i.range AS d, round(avg(v[i.range]), 6) AS c
         FROM e, range(1, 65) i GROUP BY 1, 2),
       cent AS (SELECT label AS clabel, list(c ORDER BY d) AS cv
                FROM dims GROUP BY 1),
       asg AS (
         SELECT vec_id, v, clabel AS ivf_list FROM (
           SELECT e.vec_id, e.v, cent.clabel,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_inner_product(e.v, cent.cv) /
                 (sqrt(list_inner_product(e.v, e.v)) *
                  sqrt(list_inner_product(cent.cv, cent.cv))), 4) DESC,
               cent.clabel) AS crk
           FROM e CROSS JOIN cent)
         WHERE crk = 1)"""

  /** Shared CTE chain for the kFor-sized, md5-sampled codebook
    * (q80/q81): `e` (double-cast corpus), `kk` (the kFor sizing formula
    * in SQL), `hs` (the md5 sampling hash), `scent` (the k lowest-hash
    * vectors, numbered 1..k) — one copy so the sizing formula, seed, and
    * tiebreaks cannot diverge between the sized gates. The gates run at
    * targetList = 100 (k = 5 lists on the 500-vector test corpora — a
    * probe/assignment structure the production default of 1000 cannot
    * exhibit at this scale: kFor would clamp to 2 lists and nProbe = 2
    * would degenerate to scanning both).
    */
  def sizedScentCte(targetList: Long): String =
    s"""e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
            FROM embeddings),
       kk AS (SELECT greatest(2, least(1048576,
                CAST(ceil(count(*) / $targetList.0) AS BIGINT))) AS k FROM e),
       hs AS (SELECT vec_id, v, md5(vec_id || '_' || 7) AS h FROM e),
       scent AS (
         SELECT CAST(row_number() OVER (ORDER BY h, vec_id) AS BIGINT)
                  AS clabel, v AS cv
         FROM hs
         QUALIFY row_number() OVER (ORDER BY h, vec_id)
           <= (SELECT k FROM kk))"""

  /** One Lloyd-chain assignment CTE: argmax-cosine (4dp, tie → smaller
    * clabel) of every `e` vector against codebook `centName` — the same
    * argmax body as [[ivfAssignCte]]'s `asg`, parameterized so the q76
    * refinement chain can unroll it per iteration without copies drifting.
    */
  def lloydAsgCte(name: String, centName: String): String =
    s"""$name AS (
         SELECT vec_id, v, clabel AS ivf_list FROM (
           SELECT e.vec_id, e.v, $centName.clabel,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_inner_product(e.v, $centName.cv) /
                 (sqrt(list_inner_product(e.v, e.v)) *
                  sqrt(list_inner_product($centName.cv, $centName.cv))), 4) DESC,
               $centName.clabel) AS crk
           FROM e CROSS JOIN $centName)
         WHERE crk = 1)"""

  /** One Lloyd-chain update CTE pair: per-dimension 6dp means of the
    * vectors assigned in `srcAsg` → codebook `centName`.
    */
  def lloydCentCte(dimsName: String, centName: String,
      srcAsg: String): String =
    s"""$dimsName AS (
         SELECT ivf_list AS clabel, i.range AS d, round(avg(v[i.range]), 6) AS c
         FROM $srcAsg, range(1, 65) i GROUP BY 1, 2),
       $centName AS (SELECT clabel, list(c ORDER BY d) AS cv
                     FROM $dimsName GROUP BY 1)"""

  /** Exact near-dup pair SQL — the oracle for q28 AND for the approximate
    * variants q29 (MinHash+LSH) / q30 (SimHash): both emit
    * exactly-verified pairs from complete-recall candidate generation, so
    * their output is the same pair set (see DedupOps scaladoc).
    */
  val exactJaccardPairsSql: String =
    "WITH " + shinglePostingsCte + """
         SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM (
           SELECT l.doc_id AS id_a, r.doc_id AS id_b,
             count(*) * 1.0 / (l.n + r.n - count(*)) AS jaccard
           FROM tok l JOIN tok r ON l.tok = r.tok AND l.doc_id < r.doc_id
           GROUP BY l.doc_id, r.doc_id, l.n, r.n)
         WHERE jaccard >= 0.5 ORDER BY id_a, id_b"""

  /** Postings + Jaccard edges + recursive min-label components — the
    * dedup-cluster oracle chain (q53/q59).
    */
  val dedupCcCte: String =
    "WITH RECURSIVE " + shinglePostingsCte + """,
       edges AS (
         SELECT id_a, id_b FROM (
           SELECT l.doc_id AS id_a, r.doc_id AS id_b,
             count(*) * 1.0 / (l.n + r.n - count(*)) AS jaccard
           FROM tok l JOIN tok r ON l.tok = r.tok AND l.doc_id < r.doc_id
           GROUP BY l.doc_id, r.doc_id, l.n, r.n)
         WHERE jaccard >= 0.5),
       sym AS (SELECT id_a AS src, id_b AS dst FROM edges
               UNION ALL SELECT id_b, id_a FROM edges),
       cc(id, label) AS (
         SELECT DISTINCT src, src FROM sym
         UNION
         SELECT s.dst, c.label FROM cc c JOIN sym s ON s.src = c.id)"""



  /** One nprobe point of the q190 probe-recall oracle: the q101
    * probes/iv chain parameterized by probe count (names suffixed so
    * the three points share one WITH).
    */
  def probeIvSql(np: Int): String =
    s"""probes$np AS (
           SELECT query_id, qv, clabel AS ivf_list FROM (
             SELECT e.vec_id AS query_id, e.v AS qv, cent.clabel,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_inner_product(e.v, cent.cv) /
                   (sqrt(list_inner_product(e.v, e.v)) *
                    sqrt(list_inner_product(cent.cv, cent.cv))), 4) DESC,
                 cent.clabel) AS crk
             FROM e CROSS JOIN cent WHERE e.vec_id < 8)
           WHERE crk <= $np),
         iv$np AS (SELECT query_id, vec_id FROM (
             SELECT p.query_id, a.vec_id,
               row_number() OVER (PARTITION BY p.query_id ORDER BY
                 round(list_inner_product(p.qv, a.v) /
                   (sqrt(list_inner_product(p.qv, p.qv)) *
                    sqrt(list_inner_product(a.v, a.v))), 4) DESC,
                 a.vec_id) AS rk
             FROM asg a JOIN probes$np p USING (ivf_list)
             WHERE a.vec_id <> p.query_id)
           WHERE rk <= 5)"""

  /** The q95 power-iteration CTE chain (quantize → center → two exact
    * fixed-point iterations), ending at `v2 (v: DOUBLE[])` — shared by
    * the q95 and q96 oracles so the grid, rounding stages, and unroll
    * cannot drift apart.
    */
  val pcaPowerCte: String =
      """e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
            FROM embeddings),
         xq AS (SELECT vec_id, list_transform(v,
                  x -> CAST(round(x * 1024) AS BIGINT)) AS q FROM e),
         mud AS (SELECT i.range AS d, CAST(round(avg(q[i.range])) AS BIGINT)
                   AS mu
                 FROM xq, range(1, 65) i GROUP BY 1),
         muv AS (SELECT list(mu ORDER BY d) AS m FROM mud),
         xc AS (SELECT vec_id, [q[i] - m[i] for i in range(1, 65)] AS c
                FROM xq CROSS JOIN muv),
         v0 AS (SELECT [CAST(128 AS BIGINT) for i in range(1, 65)] AS vq),
         s1 AS (SELECT c, CAST(list_inner_product(c::DOUBLE[],
                  vq::DOUBLE[]) AS BIGINT) AS s
                FROM xc CROSS JOIN v0),
         w1 AS (SELECT i.range AS d, CAST(sum(s * c[i.range]) AS BIGINT)
                  AS w
                FROM s1, range(1, 65) i GROUP BY 1),
         n1 AS (SELECT wv, sqrt(list_inner_product(wv::DOUBLE[],
                  wv::DOUBLE[])) AS nrm
                FROM (SELECT list(w ORDER BY d) AS wv FROM w1)),
         v1 AS (SELECT [round(wv[i] / nrm, 6) for i in range(1, 65)] AS v
                FROM n1),
         v1q AS (SELECT [CAST(round(v[i] * 1024) AS BIGINT)
                  for i in range(1, 65)] AS vq FROM v1),
         s2 AS (SELECT c, CAST(list_inner_product(c::DOUBLE[],
                  vq::DOUBLE[]) AS BIGINT) AS s
                FROM xc CROSS JOIN v1q),
         w2 AS (SELECT i.range AS d, CAST(sum(s * c[i.range]) AS BIGINT)
                  AS w
                FROM s2, range(1, 65) i GROUP BY 1),
         n2 AS (SELECT wv, sqrt(list_inner_product(wv::DOUBLE[],
                  wv::DOUBLE[])) AS nrm
                FROM (SELECT list(w ORDER BY d) AS wv FROM w2)),
         v2 AS (SELECT [round(wv[i] / nrm, 6) for i in range(1, 65)] AS v
                FROM n2)"""
}
