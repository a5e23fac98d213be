package graft.oracle

import graft.operators.DedupOps
import OracleCtes._

/** DuckDB oracle SQL — dedup family: exact/MinHash/SimHash/LSH/prefix-join near-dup, spans, contamination, linkage. One entry per SparkEntry.queries
  * key in this family; strings byte-identical to the pre-split
  * SparkEntry registry (round-9 reviewability split).
  */
private[graft] object DedupOracles {
  val sql: Map[String, String] = Map(
    "q27_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
         min(doc_id) AS canonical_id, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY canonical_id""",
    "q28_ngram_jaccard" -> exactJaccardPairsSql,
    // q29 emits exactly-verified pairs from complete-recall MinHash
    // banding — a recall loss in candidate generation is a hard row-set
    // mismatch vs the exact oracle
    "q29_minhash_neardup" -> exactJaccardPairsSql,
    // q251: q28's near-dup pairs attributed to unordered source pairs
    "q251_dup_attribution" ->
      ("WITH " + graft.oracle.OracleCtes.shinglePostingsCte + """,
         pairs AS (
           SELECT id_a, id_b FROM (
             SELECT l.doc_id AS id_a, r.doc_id AS id_b,
               count(*) * 1.0 / (l.n + r.n - count(*)) AS jaccard
             FROM tok l JOIN tok r ON l.tok = r.tok AND l.doc_id < r.doc_id
             GROUP BY l.doc_id, r.doc_id, l.n, r.n)
           WHERE jaccard >= 0.5)
         SELECT least(a.source, b.source) AS src_a,
           greatest(a.source, b.source) AS src_b,
           count(*) AS n_pairs
         FROM pairs
         JOIN documents a ON id_a = a.doc_id
         JOIN documents b ON id_b = b.doc_id
         GROUP BY 1, 2 ORDER BY 1, 2"""),
    // q30: SimHash hamming ≤ 3 only partially overlaps Jaccard ≥ 0.5
    // (see DedupOps.simhashNearDupDF), so the gate is a summary row:
    // DuckDB-exact pair count + subset-exactness + recall ≥ 0.5
    "q30_simhash_neardup" ->
      ("WITH " + shinglePostingsCte + """,
         pairs AS (
           SELECT id_a, id_b FROM (
             SELECT l.doc_id AS id_a, r.doc_id AS id_b,
               count(*) * 1.0 / (l.n + r.n - count(*)) AS jaccard
             FROM tok l JOIN tok r ON l.tok = r.tok AND l.doc_id < r.doc_id
             GROUP BY l.doc_id, r.doc_id, l.n, r.n)
           WHERE jaccard >= 0.5)
         SELECT count(*) AS n_exact_pairs,
           CAST(1 AS INT) AS subset_ok,
           CAST(1 AS INT) AS recall_ok
         FROM pairs"""),
    "q53_dedup_clusters" ->
      (dedupCcCte + """
         SELECT id AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id
         FROM cc GROUP BY id ORDER BY doc_id"""),
    "q59_dedup_keeplist" ->
      (dedupCcCte + """,
         drop_ids AS (SELECT id FROM (
             SELECT id, min(label) AS cluster_id FROM cc GROUP BY id)
           WHERE cluster_id <> id)
         SELECT lang, count(*) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS kept_chars
         FROM documents WHERE doc_id NOT IN (SELECT id FROM drop_ids)
         GROUP BY lang ORDER BY lang"""),
    "q61_contamination" ->
      """WITH d0 AS (
           SELECT doc_id, string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
           FROM documents),
         docs AS (
           SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             for i in range(1, greatest(len(w) - 1, 1))]) AS toks
           FROM d0 WHERE len(w) >= 3),
         t0 AS (SELECT doc_id, unnest(toks) AS tok FROM docs),
         bench AS (SELECT DISTINCT tok FROM t0 WHERE doc_id % 100 = 0),
         corpus AS (SELECT doc_id, tok FROM t0 WHERE doc_id % 100 <> 0),
         per AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY 1),
         hits AS (SELECT doc_id, count(*) AS n_contaminated
                  FROM corpus JOIN bench USING (tok) GROUP BY 1)
         SELECT doc_id, n_shingles, n_contaminated,
           round(n_contaminated * 1.0 / n_shingles, 4) AS ratio
         FROM per JOIN hits USING (doc_id)
         WHERE round(n_contaminated * 1.0 / n_shingles, 4) >= 0.5
         ORDER BY doc_id""",
    "q66_span_dup" ->
      """WITH d0 AS (
           SELECT doc_id, string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
           FROM documents),
         sp AS (SELECT doc_id, unnest(list_distinct(
             [array_to_string(w[i:i+9], ' ')
              for i in range(1, greatest(len(w) - 8, 1))])) AS span
           FROM d0 WHERE len(w) >= 10),
         dupset AS (SELECT span FROM sp GROUP BY span HAVING count(*) >= 2),
         per AS (SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY 1),
         dup AS (SELECT doc_id, count(*) AS n_dup_spans
                 FROM sp JOIN dupset USING (span) GROUP BY 1)
         SELECT doc_id, n_spans, n_dup_spans,
           round(n_dup_spans * 1.0 / n_spans, 4) AS dup_frac
         FROM per JOIN dup USING (doc_id)
         WHERE round(n_dup_spans * 1.0 / n_spans, 4) >= 0.3
         ORDER BY doc_id""",
    // q87: span-dedup apply — duplicated-span ownership (min doc_id),
    // covered-position explode, anti-join, per-doc rebuild ORDER BY pos.
    // All string/integer ops, no FP anywhere; list slicing replicates the
    // Spark side's lead-window span strings
    "q87_span_scrub" ->
      """WITH d AS (SELECT doc_id, string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
           FROM documents),
         tp AS (SELECT doc_id, toks, unnest(generate_series(
                  CAST(0 AS BIGINT), CAST(len(toks) AS BIGINT) - 1)) AS pos
                FROM d),
         t AS (SELECT doc_id, pos, toks[pos + 1] AS tok FROM tp),
         op AS (SELECT doc_id, toks, unnest(generate_series(
                  CAST(0 AS BIGINT), CAST(len(toks) AS BIGINT) - 10)) AS pos
                FROM d WHERE len(toks) >= 10),
         occ AS (SELECT doc_id, pos,
                   array_to_string(toks[pos + 1 : pos + 10], ' ') AS span
                 FROM op),
         own AS (SELECT span, min(doc_id) AS owner FROM occ
                 GROUP BY span HAVING count(DISTINCT doc_id) >= 2),
         cov AS (SELECT DISTINCT doc_id, pos FROM (
                   SELECT o.doc_id,
                     unnest(generate_series(o.pos, o.pos + 9)) AS pos
                   FROM occ o JOIN own ON o.span = own.span
                   WHERE o.doc_id <> own.owner)),
         kept AS (SELECT t.doc_id, t.pos, t.tok
                  FROM t ANTI JOIN cov USING (doc_id, pos)),
         reb AS (SELECT doc_id, count(*) AS n_kept,
                   string_agg(tok, ' ' ORDER BY pos) AS text_scrubbed
                 FROM kept GROUP BY doc_id)
         SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens,
           coalesce(reb.n_kept, 0) AS n_kept,
           coalesce(reb.text_scrubbed, '') AS text_scrubbed
         FROM d LEFT JOIN reb USING (doc_id) ORDER BY doc_id""",
    // q100: duplication-inflation histogram — md5 content-fingerprint
    // cluster sizes rolled up; all integers, fully order-independent
    "q100_dup_inflation" ->
      """WITH fp AS (SELECT md5(regexp_replace(lower(trim(text)),
             '\s+', ' ', 'g')) AS fp
           FROM documents),
         cl AS (SELECT fp, count(*) AS cluster_size FROM fp GROUP BY 1)
         SELECT cluster_size, count(*) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
           CAST((cluster_size - 1) * count(*) AS BIGINT) AS n_redundant
         FROM cl GROUP BY 1 ORDER BY 1""",
    // q119: distinct (source, 16-gram md5) pairs, then a self-join on the
    // hash — counts are exact integers; tokenization mirrors q114/q116
    "q119_source_overlap" ->
      """WITH t AS (SELECT source,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
               ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT source,
             md5(array_to_string(list_slice(toks, i, i + 15), ' ')) AS h
           FROM t, unnest(generate_series(1, len(toks) - 15, 1)) AS u(i)),
         p AS (SELECT a.source AS source_a, b.source AS source_b
           FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source)
         SELECT source_a, source_b, count(*) AS n_shared
         FROM p GROUP BY 1, 2 ORDER BY source_a, source_b""",
    // q120: blocked Levenshtein linkage over DISTINCT part names (block =
    // last name token); integer distances, deterministic total order
    "q120_fuzzy_linkage" ->
      """WITH n AS (SELECT p_name AS name, count(*) AS n_parts,
             string_split(p_name, ' ')[-1] AS block
           FROM part GROUP BY p_name)
         SELECT a.block AS block, a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS INT) AS dist,
           a.n_parts AS n_a, b.n_parts AS n_b
         FROM n a JOIN n b ON a.block = b.block AND a.name < b.name
         WHERE levenshtein(a.name, b.name) <= 4
         ORDER BY block, name_a, name_b""",
    // q121: lossless AllPairs/PPJoin prefix filter at t = 3/5 — prefix
    // length n - ceil(3n/5) + 1 in pure integer arithmetic; candidates
    // verified with exact list_intersect; INTEGER-exact threshold
    // (5·inter >= 3·union — no float/rounding boundary)
    "q121_prefix_join" ->
      ("WITH " + prefixPairsCte + """
         SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter, jaccard
         FROM v WHERE 5 * inter >= 3 * (na + nb - inter)
         ORDER BY id_a, id_b"""),
    // q124: lossless containment at t = 4/5 — each doc's rare-first
    // prefix (n - ceil(4n/5) + 1) joined against the FULL posting side
    // covers both directions; verify on the rounded min-side containment
    "q124_containment" ->
      """WITH t AS (SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
               ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
             md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS h
           FROM t, unnest(generate_series(1, len(toks) - 7, 1)) AS u(i)),
         dfreq AS (SELECT h, count(*) AS df FROM sh GROUP BY 1),
         rk AS (SELECT s.doc_id, s.h,
             row_number() OVER (PARTITION BY s.doc_id
               ORDER BY dfreq.df, s.h) AS rk,
             count(*) OVER (PARTITION BY s.doc_id) AS n
           FROM sh s JOIN dfreq ON s.h = dfreq.h),
         pref AS (SELECT doc_id, h FROM rk
           WHERE rk <= n - (4 * n + 4) // 5 + 1),
         cand AS (SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
             greatest(a.doc_id, b.doc_id) AS id_b
           FROM pref a JOIN sh b ON a.h = b.h AND a.doc_id <> b.doc_id),
         sets AS (SELECT doc_id, list(h ORDER BY h) AS s, count(*) AS n
           FROM sh GROUP BY 1),
         v AS (SELECT id_a, id_b, sa.n AS na, sb.n AS nb,
             len(list_intersect(sa.s, sb.s)) AS inter,
             round(len(list_intersect(sa.s, sb.s))::DOUBLE /
               least(sa.n, sb.n), 4) AS containment
           FROM cand JOIN sets sa ON id_a = sa.doc_id
                     JOIN sets sb ON id_b = sb.doc_id)
         SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter, containment
         FROM v WHERE 5 * inter >= 4 * least(na, nb)
         ORDER BY id_a, id_b""",
    // q144: q121's pairs rescored on token multisets — Σmin/Σmax over
    // occurrence counts; integers + one division/round per pair
    "q144_weighted_jaccard" ->
      ("WITH " + prefixPairsCte + """,
         pairs AS (SELECT id_a, id_b FROM v
           WHERE 5 * inter >= 3 * (na + nb - inter)),
         tc AS (SELECT doc_id, tok, count(*) AS c FROM (
             SELECT doc_id, unnest(string_split(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
               AS tok
             FROM documents) GROUP BY 1, 2),
         au AS (SELECT id_a, id_b, tok, c AS ca
           FROM pairs JOIN tc ON tc.doc_id = pairs.id_a),
         bu AS (SELECT id_a, id_b, tok, c AS cb
           FROM pairs JOIN tc ON tc.doc_id = pairs.id_b)
         SELECT id_a, id_b,
           round(sum(least(coalesce(ca, 0), coalesce(cb, 0)))::DOUBLE /
             sum(greatest(coalesce(ca, 0), coalesce(cb, 0))), 4)
             AS wjaccard
         FROM au FULL JOIN bu USING (id_a, id_b, tok)
         GROUP BY id_a, id_b ORDER BY id_a, id_b"""),
    // q147: raw vs exact-dedup canonical corpus size; per-hash min
    // aggregation first so each distinct content counts once
    "q147_dedup_savings" ->
      """WITH d AS (SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
             n_chars,
             CAST(len(string_split(regexp_replace(lower(trim(text)),
               '\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tok
           FROM documents),
         raw AS (SELECT count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM d),
         ch AS (SELECT fp, min(n_chars) AS c, min(n_tok) AS t
           FROM d GROUP BY fp),
         canon AS (SELECT count(*) AS n_docs,
             CAST(sum(c) AS BIGINT) AS n_chars,
             CAST(sum(t) AS BIGINT) AS n_tokens FROM ch)
         SELECT * FROM (
           SELECT 'exact_dedup' AS stage, canon.n_docs, canon.n_chars,
             canon.n_tokens,
             round(1.0 - CAST(canon.n_tokens AS DOUBLE) /
               CAST(raw.n_tokens AS DOUBLE), 6) AS saved_frac
           FROM canon, raw
           UNION ALL
           SELECT 'raw', raw.n_docs, raw.n_chars, raw.n_tokens,
             round(1.0 - CAST(raw.n_tokens AS DOUBLE) /
               CAST(raw.n_tokens AS DOUBLE), 6)
           FROM raw
         ) ORDER BY stage""",
    // q172: exact-dup cluster-size histogram — the q27 content-hash
    // shuffle then a multiplicity rollup
    "q172_cluster_sizes" ->
      """WITH c AS (SELECT md5(regexp_replace(lower(trim(text)), '\s+',
             ' ', 'g')) AS fp, count(*) AS cluster_size
           FROM documents GROUP BY 1)
         SELECT cluster_size, count(*) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
         FROM c GROUP BY cluster_size ORDER BY cluster_size""",
    // q184: pair counts at four thresholds from the t=1/2 lossless
    // candidate generation; integer cross-multiplied cuts on shared v
    "q184_threshold_sweep" ->
      ("WITH " + prefixPairsCteFor(1, 2) + """
         SELECT threshold, CAST(sum(hit) AS BIGINT) AS n_pairs FROM (
           SELECT '0.5' AS threshold,
             CASE WHEN inter * 2 >= (na + nb - inter) * 1 THEN 1 ELSE 0
               END AS hit FROM v
           UNION ALL SELECT '0.6',
             CASE WHEN inter * 5 >= (na + nb - inter) * 3 THEN 1 ELSE 0
               END FROM v
           UNION ALL SELECT '0.7',
             CASE WHEN inter * 10 >= (na + nb - inter) * 7 THEN 1 ELSE 0
               END FROM v
           UNION ALL SELECT '0.8',
             CASE WHEN inter * 5 >= (na + nb - inter) * 4 THEN 1 ELSE 0
               END FROM v)
         GROUP BY threshold ORDER BY threshold"""),
    // q193: log2-banded shingle df distribution (the effectiveDfCap
    // tuning diagnostic) over the 8-gram space
    "q193_shingle_df" ->
      """WITH ppt AS (SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
               ' ') AS toks
           FROM documents),
         ppsh AS (SELECT DISTINCT doc_id,
             md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS h
           FROM ppt, unnest(generate_series(1, len(toks) - 7, 1)) AS u(i)),
         df AS (SELECT h, count(*) AS df FROM ppsh GROUP BY 1)
         SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS log2_df_band,
           count(*) AS n_shingles, CAST(sum(df) AS BIGINT) AS n_postings
         FROM df GROUP BY 1 ORDER BY 1""",
    // q204: q53 cluster language purity — min-label membership (the
    // q59 reduction) joined to langs, two rollups
    "q204_cluster_purity" ->
      (dedupCcCte + """,
         mem AS (SELECT id, min(label) AS cluster_id FROM cc GROUP BY id),
         pl AS (SELECT m.cluster_id, d.lang, count(*) AS c
           FROM mem m JOIN documents d ON m.id = d.doc_id GROUP BY 1, 2),
         per AS (SELECT cluster_id, CAST(sum(c) AS BIGINT) AS n_docs,
             count(*) AS n_langs FROM pl GROUP BY 1)
         SELECT n_docs AS cluster_size, count(*) AS n_clusters,
           CAST(sum(CASE WHEN n_langs = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pure_lang
         FROM per GROUP BY 1 ORDER BY 1"""),
    // q205: winnowing (k=4 token grams, w=5 hash windows) — positional
    // grams (1-based i covers w[i..i+3], count n_g = len-3), windowed
    // min over ROWS (0, 4) frames, keep full windows plus the single
    // truncated window of a short doc (i <= max(1, n_g-4) mirrors the
    // engine's 0-based p <= max(0, n_g-5))
    "q205_winnowing" ->
      """WITH d0 AS (
           SELECT doc_id, source, string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
           FROM documents),
         g AS (
           SELECT doc_id, source, i AS pos,
             md5(array_to_string(w[i:i+3], ' ')) AS h,
             len(w) - 3 AS n_g
           FROM d0, unnest(generate_series(1, len(w) - 3, 1)) AS u(i)
           WHERE len(w) >= 4),
         sel AS (
           SELECT doc_id, source, pos, n_g,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp
           FROM g),
         keep AS (
           SELECT DISTINCT doc_id, source, fp FROM sel
           WHERE pos <= greatest(1, n_g - 4)),
         per AS (
           SELECT source, fp, count(*) AS n_docs_fp
           FROM keep GROUP BY 1, 2)
         SELECT source, CAST(sum(n_docs_fp) AS BIGINT) AS n_selected,
           count(*) AS n_distinct_fp,
           CAST(sum(CASE WHEN n_docs_fp >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_fp,
           round(CAST(sum(CASE WHEN n_docs_fp >= 2 THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*), 6) AS shared_rate
         FROM per GROUP BY source ORDER BY source""",
    // q206: first-16-token prefix groups (whole doc when shorter —
    // DuckDB list slicing clamps exactly like Spark's slice)
    "q206_prefix_boilerplate" ->
      """WITH d0 AS (
           SELECT source, string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
           FROM documents),
         g AS (SELECT source, md5(array_to_string(w[1:16], ' ')) AS pfx
               FROM d0),
         grp AS (SELECT source, pfx, count(*) AS n FROM g GROUP BY 1, 2)
         SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
           count(*) AS n_groups,
           CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
             AS n_docs_shared,
           round(CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS DOUBLE) /
             sum(n), 6) AS shared_rate
         FROM grp GROUP BY source ORDER BY source""",
    // q209: the exact-Jaccard pair oracle restricted to cross pairs
    // between the delta batch (doc_id % 10 = 7) and the base — complete
    // banding recall makes the LSH pipeline's verified output exactly
    // this set (the q29 argument)
    "q209_minhash_upsert" ->
      ("WITH " + shinglePostingsCte + """
         SELECT CASE WHEN id_a % 10 = 7 THEN id_a ELSE id_b END AS delta_id,
           CASE WHEN id_a % 10 = 7 THEN id_b ELSE id_a END AS base_id,
           round(jaccard, 4) AS jaccard FROM (
           SELECT l.doc_id AS id_a, r.doc_id AS id_b,
             count(*) * 1.0 / (l.n + r.n - count(*)) AS jaccard
           FROM tok l JOIN tok r ON l.tok = r.tok AND l.doc_id < r.doc_id
           GROUP BY l.doc_id, r.doc_id, l.n, r.n)
         WHERE jaccard >= 0.5 AND ((id_a % 10 = 7) <> (id_b % 10 = 7))
         ORDER BY delta_id, base_id"""),
    // q217: the q205 winnowed sketch self-joined on fingerprints under
    // the same effectiveDfCap clamp as the shingle postings — pairs
    // sharing >= 2 selected fingerprints
    "q217_winnow_matches" ->
      """WITH d0 AS (
           SELECT doc_id, string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
           FROM documents),
         g AS (
           SELECT doc_id, i AS pos,
             md5(array_to_string(w[i:i+3], ' ')) AS h,
             len(w) - 3 AS n_g
           FROM d0, unnest(generate_series(1, len(w) - 3, 1)) AS u(i)
           WHERE len(w) >= 4),
         sel AS (
           SELECT doc_id, pos, n_g,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp
           FROM g),
         sk AS (
           SELECT DISTINCT doc_id, fp FROM sel
           WHERE pos <= greatest(1, n_g - 4)),
         rare AS (SELECT fp FROM sk GROUP BY fp HAVING count(*) <=
           least(200, greatest(50,
             ((SELECT count(*) FROM documents) * 2 + 99) // 100))),
         p AS (SELECT doc_id, fp FROM sk JOIN rare USING (fp))
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           count(*) AS n_shared
         FROM p a JOIN p b ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 2
         ORDER BY id_a, id_b""",
    // q222: exact-dup cluster membership crossed with the q35 quality
    // band — the band comes from the integer decimillipoint score
    // (round(quality*1e4) recovers it exactly), so no FP boundary
    "q222_dup_quality" ->
      ("WITH " + qualityDocCte + """,
         f AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)),
             '\s+', ' ', 'g')) AS fp
           FROM documents),
         cl AS (SELECT fp, count(*) AS csize FROM f GROUP BY 1),
         b AS (SELECT q.doc_id,
             least(4, CAST(round(q.quality * 10000, 0) AS BIGINT) // 2000)
               AS q_band,
             c.csize
           FROM qdoc q JOIN f ON q.doc_id = f.doc_id
           JOIN cl c ON f.fp = c.fp)
         SELECT q_band, count(*) AS n_docs,
           CAST(sum(CASE WHEN csize >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           round(CAST(sum(CASE WHEN csize >= 2 THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*), 6) AS dup_rate
         FROM b GROUP BY 1 ORDER BY 1"""),
    // q238: quality-ranked keep-list — the q53 component chain plus the
    // q35 quality chain (both shared CTEs, so neither rule can drift),
    // keeper = (quality DESC, doc_id) rank 1 per cluster
    "q238_quality_keeplist" ->
      (dedupCcCte + ",\n         " + qualityDocCte + """,
         mem AS (SELECT id AS doc_id, min(label) AS cluster_id
                 FROM cc GROUP BY id),
         ranked AS (
           SELECT m.doc_id,
             row_number() OVER (PARTITION BY m.cluster_id
               ORDER BY q.quality DESC, m.doc_id) AS rk
           FROM mem m JOIN qdoc q USING (doc_id)),
         dropped AS (SELECT doc_id FROM ranked WHERE rk > 1)
         SELECT source, count(*) AS n_docs,
           CAST(count(*) FILTER (doc_id NOT IN
             (SELECT doc_id FROM dropped)) AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (doc_id IN
             (SELECT doc_id FROM dropped)) AS BIGINT) AS n_dropped,
           CAST(coalesce(sum(n_chars) FILTER (doc_id IN
             (SELECT doc_id FROM dropped)), 0) AS BIGINT) AS dropped_chars
         FROM documents GROUP BY 1 ORDER BY 1"""),
    // q354: suffix-order LCP panel — every token position opens a
    // 12-token-truncated suffix; adjacent suffixes in (first-TWO-token
    // partitioned — the Zipf-skew-capped key, lossless for minLcp >= 2)
    // sorted order yield the repeated-phrase histogram with cross-doc
    // pairs split out. Mirrors the engine's window construction exactly
    // (same truncation, same key width, same tie order)
    "q354_suffix_lcp" ->
      """WITH d0 AS (SELECT doc_id, string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')
             AS w
           FROM documents),
         sfx AS (SELECT doc_id, pos, w[pos + 1] AS t1,
             coalesce(w[pos + 2], '') AS t2,
             w[pos + 1 : pos + 12] AS s,
             array_to_string(w[pos + 1 : pos + 12], ' ') AS k
           FROM (SELECT doc_id, w, unnest(generate_series(
               CAST(0 AS BIGINT), CAST(len(w) AS BIGINT) - 1)) AS pos
             FROM d0)),
         adj AS (SELECT doc_id, s,
             lead(doc_id) OVER win AS nd, lead(s) OVER win AS ns
           FROM sfx
           WINDOW win AS (PARTITION BY t1, t2 ORDER BY k, doc_id, pos)),
         lcps AS (SELECT doc_id, nd,
             -- list_position returns 0 (not NULL) when absent in this
             -- DuckDB — nullif maps "no mismatch" to the full min-length
             CAST(coalesce(nullif(list_position(
                 [coalesce(s[i] = ns[i], false)
                  for i in range(1, least(len(s), len(ns)) + 1)],
                 false), 0) - 1,
               least(len(s), len(ns))) AS BIGINT) AS lcp
           FROM adj WHERE nd IS NOT NULL)
         SELECT lcp, count(*)::BIGINT AS n_pairs,
           CAST(sum(CASE WHEN doc_id <> nd THEN 1 ELSE 0 END)
             AS BIGINT) AS n_cross_pairs
         FROM lcps WHERE lcp >= 3 GROUP BY 1 ORDER BY 1""",
    // q356: boilerplate-divergence report — q206's head-prefix groups
    // joined against q87's span scrub at doc grain, split per source
    // into head-shared vs body-only scrubbed docs (the class the
    // prefix heuristic misses — the q354 referee's verdict as a
    // per-source action readout). Same tokenization, same 16-token
    // prefix, same 10-token span CTEs as the parent oracles
    "q356_boilerplate_divergence" ->
      """WITH d AS (SELECT doc_id, string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')
             AS toks
           FROM documents),
         op AS (SELECT doc_id, toks, unnest(generate_series(
                  CAST(0 AS BIGINT), CAST(len(toks) AS BIGINT) - 10)) AS pos
                FROM d WHERE len(toks) >= 10),
         occ AS (SELECT doc_id, pos,
                   array_to_string(toks[pos + 1 : pos + 10], ' ') AS span
                 FROM op),
         own AS (SELECT span, min(doc_id) AS owner FROM occ
                 GROUP BY span HAVING count(DISTINCT doc_id) >= 2),
         cov AS (SELECT DISTINCT doc_id, pos FROM (
                   SELECT o.doc_id,
                     unnest(generate_series(o.pos, o.pos + 9)) AS pos
                   FROM occ o JOIN own ON o.span = own.span
                   WHERE o.doc_id <> own.owner)),
         scr AS (SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens,
                   CAST(len(d.toks) AS BIGINT) - coalesce(c.n_cov, 0)
                     AS n_kept
                 FROM d LEFT JOIN (SELECT doc_id, count(*) AS n_cov
                                   FROM cov GROUP BY 1) c USING (doc_id)),
         pfx AS (SELECT dd.doc_id, dd.source,
                   md5(array_to_string(d.toks[1:16], ' ')) AS pfx
                 FROM documents dd JOIN d USING (doc_id)),
         shared AS (SELECT source, pfx FROM pfx
                    GROUP BY source, pfx HAVING count(*) >= 2),
         marked AS (SELECT p.doc_id, p.source,
                     (s.pfx IS NOT NULL) AS head_shared
                   FROM pfx p LEFT JOIN shared s
                     ON p.source = s.source AND p.pfx = s.pfx)
         SELECT m.source,
           count(*)::BIGINT AS n_docs,
           CAST(sum(CASE WHEN m.head_shared THEN 1 ELSE 0 END) AS BIGINT)
             AS n_head_shared,
           CAST(sum(CASE WHEN scr.n_kept < scr.n_tokens THEN 1 ELSE 0 END)
             AS BIGINT) AS n_scrubbed,
           CAST(sum(CASE WHEN scr.n_kept < scr.n_tokens
             AND NOT m.head_shared THEN 1 ELSE 0 END) AS BIGINT)
             AS n_body_only,
           CAST(sum(scr.n_tokens - scr.n_kept) AS BIGINT)
             AS tokens_scrubbed
         FROM marked m JOIN scr USING (doc_id)
         GROUP BY 1 ORDER BY 1""",
    // q353: source-collision keeper matrix — the q238 keeper rule at
    // the q328 cluster grain: per (keep_source, drop_source) cell,
    // dropped docs and distinct clusters, diagonal included
    "q353_keeper_matrix" ->
      (dedupCcCte + ",\n         " + qualityDocCte + """,
         mem AS (SELECT id AS doc_id, CAST(min(label) AS BIGINT)
             AS cluster_id FROM cc GROUP BY id),
         ranked AS (
           SELECT m.doc_id, m.cluster_id, d.source,
             row_number() OVER (PARTITION BY m.cluster_id
               ORDER BY q.quality DESC, m.doc_id) AS rk
           FROM mem m JOIN qdoc q USING (doc_id)
           JOIN documents d USING (doc_id)),
         keepr AS (SELECT cluster_id, source AS keep_source
           FROM ranked WHERE rk = 1),
         droppr AS (SELECT cluster_id, source AS drop_source
           FROM ranked WHERE rk > 1)
         SELECT k.keep_source, dr.drop_source,
           count(*)::BIGINT AS n_dropped,
           count(DISTINCT dr.cluster_id)::BIGINT AS n_clusters
         FROM droppr dr JOIN keepr k USING (cluster_id)
         GROUP BY 1, 2 ORDER BY 1, 2"""),
    // q328: cluster-grain cross-source contamination — q53 clusters
    // spanning source pairs (the cluster-level view q251's pairwise
    // attribution blurs)
    "q328_cluster_contamination" ->
      (dedupCcCte + """,
         mem AS (SELECT id AS doc_id, CAST(min(label) AS BIGINT)
             AS cluster_id FROM cc GROUP BY id),
         cs AS (SELECT DISTINCT m.cluster_id, d.source
           FROM mem m JOIN documents d ON d.doc_id = m.doc_id),
         px AS (SELECT a.source AS src_a, b.source AS src_b
           FROM cs a JOIN cs b ON a.cluster_id = b.cluster_id
             AND a.source < b.source)
         SELECT src_a, src_b, count(*)::BIGINT AS n_clusters
         FROM px GROUP BY 1, 2 ORDER BY 1, 2"""),
    // q334: greedy max-coverage selection — k unrolled rounds, each
    // picking the doc with the largest marginal distinct-shingle gain
    // (ties -> smaller doc_id) over the shared df-capped postings,
    // then folding its new shingles into the covered set
    "q334_greedy_coverage" -> {
      val k = 8
      def selSoFar(r: Int) =
        (1 until r).map(i => s"SELECT doc_id FROM s$i").mkString(" UNION ALL ")
      def round(r: Int): String = {
        val base =
          if (r == 1) "p"
          else s"""(SELECT p.doc_id, p.tok FROM p
             ANTI JOIN c${r - 1} USING (tok)
             WHERE p.doc_id NOT IN (${selSoFar(r)}))"""
        val cov =
          if (r == 1)
            s"""c1 AS MATERIALIZED (SELECT DISTINCT tok
               FROM p SEMI JOIN s1 USING (doc_id))"""
          else
            s"""c$r AS MATERIALIZED (SELECT tok FROM c${r - 1}
               UNION SELECT tok FROM p SEMI JOIN s$r USING (doc_id))"""
        s"""s$r AS MATERIALIZED (
             SELECT $r AS round, doc_id, CAST(count(*) AS BIGINT) AS gain
             FROM $base t GROUP BY 2
             ORDER BY gain DESC, doc_id LIMIT 1),
           $cov"""
      }
      "WITH " + shinglePostingsCte + s""",
         p AS MATERIALIZED (SELECT doc_id, tok FROM tok),
         ${(1 to k).map(round).mkString(",\n         ")},
         sel AS (${(1 to k).map(i => s"SELECT * FROM s$i")
        .mkString(" UNION ALL ")})
         SELECT round, doc_id, gain,
           CAST(sum(gain) OVER (ORDER BY round) AS BIGINT)
             AS covered_total
         FROM sel ORDER BY round"""
    },
    // q337: cross-source distinct-shingle overlap — exact counts and
    // Jaccard replayed relationally; the HLL-union sketch path is the
    // engine's and gates as a literal (the q42 contract). Rides the
    // UNCAPPED t0 relation of the shared shingle CTE.
    "q337_sketch_overlap" ->
      ("WITH " + graft.oracle.OracleCtes.shinglePostingsCte + """,
         st AS MATERIALIZED (SELECT DISTINCT d.source, t.tok
           FROM t0 t JOIN documents d USING (doc_id)),
         per AS MATERIALIZED (SELECT source,
             CAST(count(*) AS BIGINT) AS nd
           FROM st GROUP BY 1),
         ov AS MATERIALIZED (SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS overlap
           FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
           GROUP BY 1, 2),
         grid AS (SELECT a.source AS src_a, b.source AS src_b,
             a.nd AS exact_a, b.nd AS exact_b
           FROM per a JOIN per b ON a.source < b.source)
         SELECT g.src_a, g.src_b, g.exact_a, g.exact_b,
           coalesce(o.overlap, 0) AS overlap,
           CAST(coalesce(o.overlap, 0) * 1000000
             // (g.exact_a + g.exact_b - coalesce(o.overlap, 0))
             AS BIGINT) AS jaccard_ppm,
           CAST(1 AS INT) AS union_within_bound
         FROM grid g LEFT JOIN ov o USING (src_a, src_b)
         ORDER BY src_a, src_b"""),
    // q346: Chapman capture-recapture vocabulary estimate per source
    // pair, ratioed against the observed global distinct count
    "q346_chapman_estimate" ->
      ("WITH " + graft.oracle.OracleCtes.shinglePostingsCte + """,
         st AS MATERIALIZED (SELECT DISTINCT d.source, t.tok
           FROM t0 t JOIN documents d USING (doc_id)),
         per AS MATERIALIZED (SELECT source,
             CAST(count(*) AS BIGINT) AS nd
           FROM st GROUP BY 1),
         ov AS MATERIALIZED (SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS overlap
           FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
           GROUP BY 1, 2),
         tt AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS t_all
           FROM st),
         grid AS (SELECT a.source AS src_a, b.source AS src_b,
             a.nd AS n_a, b.nd AS n_b
           FROM per a JOIN per b ON a.source < b.source),
         base AS (SELECT g.src_a, g.src_b, g.n_a, g.n_b,
             coalesce(o.overlap, 0) AS overlap, t.t_all
           FROM grid g LEFT JOIN ov o USING (src_a, src_b), tt t)
         SELECT src_a, src_b, n_a, n_b, overlap,
           CAST((n_a + 1) * (n_b + 1) // (overlap + 1) - 1 AS BIGINT)
             AS chapman_est,
           t_all,
           CAST(((n_a + 1) * (n_b + 1) // (overlap + 1) - 1) * 1000000
             // t_all AS BIGINT) AS est_ratio_ppm
         FROM base ORDER BY src_a, src_b"""),
    // q359: URL canonicalization + host-grain dedup rollup — the messy
    // URLs are constructed deterministically from (source, doc_id) in
    // both engines; the canonical form strips fragment/scheme/default
    // port/www./trailing slash, lowercases the host, drops utm_*
    // params and sorts the survivors. Docs 4m/4m+1 canonicalize
    // together (the planted dup class); 4m+2/4m+3 stay distinct.
    ("q359_host_canonicalize",
      """WITH d AS (SELECT source, doc_id,
             CASE WHEN (doc_id // 20) % 4 = 0
                 THEN 'HTTPS://WWW.' || source ||
                 '.EXAMPLE.COM:443/d/' || (doc_id // 40) ||
                 '?utm_source=feed#sec2'
               WHEN (doc_id // 20) % 4 = 1 THEN 'http://' || source ||
                 '.example.com:80/d/' || (doc_id // 40)
               WHEN (doc_id // 20) % 4 = 2 THEN 'https://' || source ||
                 '.Example.Com/d/' || (doc_id // 40) || '/'
               ELSE 'https://' || source || '.example.com/d/' ||
                 (doc_id // 40) || '?b=2&utm_medium=m&a=1' END AS url
           FROM documents),
         s1 AS (SELECT *, regexp_replace(
             regexp_replace(url, '#.*$', ''), '^[A-Za-z]+://', '')
             AS bare FROM d),
         s2 AS (SELECT *, regexp_extract(bare, '^([^/]*)', 1)
               AS hostport,
             substr(bare,
               length(regexp_extract(bare, '^([^/]*)', 1)) + 1)
               AS rest FROM s1),
         s3 AS (SELECT *, regexp_replace(regexp_replace(
               lower(hostport), '^www\.', ''), ':(80|443)$', '')
               AS host,
             regexp_replace(regexp_extract(rest, '^([^?]*)', 1),
               '/$', '') AS path,
             CASE WHEN instr(rest, '?') = 0 THEN ''
               ELSE substr(rest, instr(rest, '?') + 1) END AS query
           FROM s2),
         s4 AS (SELECT *, coalesce(array_to_string(list_sort(
             list_filter(string_split(query, '&'),
               x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&'), '')
             AS cq FROM s3),
         s5 AS (SELECT host, host || path ||
             (CASE WHEN cq = '' THEN '' ELSE '?' || cq END)
             AS canonical FROM s4)
         SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT canonical) AS BIGINT) AS n_canonical,
           CAST(count(*) - count(DISTINCT canonical) AS BIGINT)
             AS n_dup,
           min(canonical) AS first_canonical
         FROM s5 GROUP BY host ORDER BY host"""),
  )
}
