package graft.oracle

import OracleCtes._

/** DuckDB oracle SQL — pipeline ops: packing, sampling, folds, budgets, incremental/table-format, multimodal. One entry per SparkEntry.queries
  * key in this family; strings byte-identical to the pre-split
  * SparkEntry registry (round-9 reviewability split).
  */
private[graft] object PipelineOracles {
  val sql: Map[String, String] = Map(
    // q276: largest-remainder (Hamilton) apportionment of 1000 slots
    // by source doc count — Σ alloc == slots exactly
    // (PipelineOps.apportionBudgetOn)
    "q276_apportionment" ->
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY 1),
         t AS (SELECT CAST(sum(n_docs) AS HUGEINT) AS tot FROM s),
         q AS (SELECT source, n_docs,
             CAST(CAST(n_docs AS HUGEINT) * 1000 // tot AS BIGINT)
               AS quota,
             CAST(CAST(n_docs AS HUGEINT) * 1000 % tot AS BIGINT)
               AS rem
           FROM s, t),
         l AS (SELECT CAST(1000 - sum(quota) AS BIGINT) AS leftover
           FROM q),
         r AS (SELECT source, n_docs, quota, rem,
             row_number() OVER (ORDER BY rem DESC, source) AS rk
           FROM q)
         SELECT r.source, r.n_docs, r.quota,
           CAST(CASE WHEN r.rk <= l.leftover THEN 1 ELSE 0 END AS INT)
             AS extra,
           CAST(r.quota + CASE WHEN r.rk <= l.leftover THEN 1 ELSE 0 END
             AS BIGINT) AS alloc
         FROM r, l ORDER BY source""",
    // q282: stratified hash-systematic sample EXECUTING the q276
    // Hamilton plan — per source the alloc lowest-md5(doc_id) docs;
    // membership pinned via id checksums
    // (PipelineOps.stratifiedHashSampleOn)
    "q282_hash_sample" ->
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY 1),
         t AS (SELECT CAST(sum(n_docs) AS HUGEINT) AS tot FROM s),
         q AS (SELECT source, n_docs,
             CAST(CAST(n_docs AS HUGEINT) * 100 // tot AS BIGINT)
               AS quota,
             CAST(CAST(n_docs AS HUGEINT) * 100 % tot AS BIGINT) AS rem
           FROM s, t),
         l AS (SELECT CAST(100 - sum(quota) AS BIGINT) AS leftover
           FROM q),
         r AS (SELECT source, quota,
             row_number() OVER (ORDER BY rem DESC, source) AS rk FROM q),
         alloc AS (SELECT r.source,
             CAST(r.quota + CASE WHEN r.rk <= l.leftover
               THEN 1 ELSE 0 END AS BIGINT) AS alloc
           FROM r, l),
         ranked AS (SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS srk
           FROM documents),
         sampled AS (SELECT ranked.source, ranked.doc_id
           FROM ranked JOIN alloc ON ranked.source = alloc.source
           WHERE ranked.srk <= alloc.alloc)
         SELECT source, CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc
         FROM sampled GROUP BY 1 ORDER BY 1""",
    "q40_media_features" ->
      """SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(list_sum([CAST(('0x' || substr(h, 2*i-1, 2)) AS INT)
             for i in range(1, octet_length(encode(text)) + 1)]) AS BIGINT) AS byte_sum,
           round(CAST(('0x' || substr(h, 1, 2)) AS INT) / 255.0, 4) AS f0
         FROM (SELECT doc_id, text, hex(encode(text)) AS h FROM documents)
         ORDER BY doc_id""",
    "q39_media_meta" ->
      """SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS format,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
         FROM documents ORDER BY doc_id""",
    "q44_stratified_sample" ->
      """SELECT lang, count(*) AS n_sampled, CAST(sum(n_chars) AS BIGINT) AS chars
         FROM (SELECT lang, n_chars,
                 substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 2) AS bucket
               FROM documents)
         WHERE bucket < '40'
         GROUP BY lang ORDER BY lang""",
    "q45_shard_packing" ->
      """SELECT doc_id, source, n_tokens, cum_tokens,
           CAST(floor((cum_tokens - 1) / 5000.0) AS INT) AS shard_id
         FROM (SELECT doc_id, source, n_tokens,
                 CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
               FROM (SELECT doc_id, source,
                       CAST(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tokens
                     FROM documents))
         ORDER BY source, doc_id""",
    "q46_pii_scrub" ->
      """SELECT doc_id,
           md5(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '[0-9]{7,}', '<PHONE>', 'g')) AS scrubbed_fp,
           CAST(length(t) - length(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '[0-9]{7,}', '<PHONE>', 'g')) AS BIGINT) AS chars_removed
         FROM (SELECT doc_id,
                 text || ' contact user' || doc_id || '@example.com or call 5551234567' AS t
               FROM documents)
         ORDER BY doc_id""",
    "q60_weighted_mix" ->
      """SELECT source, count(*) AS n_kept
         FROM (SELECT source,
                 substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 2) AS bucket
               FROM documents)
         WHERE bucket < CASE WHEN source = 'src0' THEN 'e0'
                             WHEN source IN ('src1', 'src2') THEN '80'
                             ELSE '40' END
         GROUP BY source ORDER BY source""",
    // q65: the full curation composition — keep-list minus contamination
    // minus low quality, per-source doc/token counts
    "q65_curated_corpus" ->
      (dedupCcCte + """,
         drop_ids AS (SELECT id FROM (
             SELECT id, min(label) AS cluster_id FROM cc GROUP BY id)
           WHERE cluster_id <> id),
         bench AS (SELECT DISTINCT tok FROM t0 WHERE doc_id % 100 = 0),
         corpus AS (SELECT doc_id, tok FROM t0 WHERE doc_id % 100 <> 0),
         per AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY 1),
         hits AS (SELECT doc_id, count(*) AS n_contaminated
                  FROM corpus JOIN bench USING (tok) GROUP BY 1),
         contaminated AS (SELECT doc_id FROM per JOIN hits USING (doc_id)
           WHERE round(n_contaminated * 1.0 / n_shingles, 4) >= 0.5),
         qt AS (SELECT doc_id, text, string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
           FROM documents),
         qm AS (SELECT doc_id, len(toks) AS n_tokens,
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
           FROM qt),
         qual AS (SELECT doc_id, n_tokens,
           greatest(0, (length_band +
             (CASE WHEN sr BETWEEN 0.01 AND 0.6 THEN 300 ELSE 0 END) -
             (CASE WHEN pr > 0.2 THEN 200 ELSE 0 END)) * 10 + diversity) / 10000.0 AS quality
           FROM qm),
         kept AS (
           SELECT d.source, q.n_tokens
           FROM documents d JOIN qual q USING (doc_id)
           WHERE d.doc_id % 100 <> 0
             AND d.doc_id NOT IN (SELECT id FROM drop_ids)
             AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
             AND q.quality >= 0.5)
         SELECT source, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         FROM kept GROUP BY source ORDER BY source"""),
    // q68: cluster-canonical split keys make cross-split near-dup pairs
    // structurally zero — gated AT zero, so leakage regressions hash-fail
    "q68_split_leakage" ->
      (dedupCcCte + """,
         canon AS (
           SELECT d.doc_id,
             coalesce((SELECT CAST(min(label) AS BIGINT) FROM cc
                       WHERE cc.id = d.doc_id), d.doc_id) AS canonical
           FROM documents d),
         assigned AS (
           SELECT doc_id,
             CASE WHEN substr(md5(CAST(canonical AS VARCHAR)), 1, 2) < '1a'
                  THEN 'val' ELSE 'train' END AS split
           FROM canon)
         SELECT split, count(*) AS n_docs,
           CAST(0 AS BIGINT) AS cross_split_pairs
         FROM assigned GROUP BY split ORDER BY split"""),
    // q43 shares q31's semantics (different physical operator: typed
    // Aggregator instead of window sort) → same oracle
    "q41_frame_sample" ->
      """SELECT doc_id, format, CAST(i AS INT) AS frame_no,
           CAST(greatest(0, least(frame_len, n_bytes - i * frame_len)) AS BIGINT) AS frame_bytes
         FROM (SELECT doc_id,
                 CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS format,
                 octet_length(encode(text)) AS n_bytes,
                 greatest(CAST(trunc(octet_length(encode(text)) / 4.0) AS INT), 1) AS frame_len
               FROM documents)
         CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i)
         WHERE greatest(0, least(frame_len, n_bytes - i * frame_len)) > 0
         ORDER BY doc_id, frame_no""",
    // q84: sequence packing — per-shard token cumsum, fixed-256 chunk
    // cuts, one provenance row per (doc, chunk) span. Pure integer
    // arithmetic end to end; generate_series mirrors Spark's sequence()
    // (both inclusive), // is BIGINT floor division on the non-negative
    // offsets
    "q84_sequence_packing" ->
      """WITH d AS (SELECT doc_id, CAST(len(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
             AS BIGINT) AS n_tokens
           FROM documents),
         s AS (SELECT doc_id, n_tokens, CAST(doc_id % 8 AS INT) AS shard
               FROM d WHERE n_tokens > 0),
         c AS (SELECT doc_id, n_tokens, shard,
                 CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS end_tok
               FROM s),
         spans AS (SELECT shard, doc_id, end_tok - n_tokens AS start_tok,
                     end_tok FROM c),
         x AS (SELECT shard, doc_id, start_tok, end_tok,
                 unnest(generate_series(CAST(start_tok // 256 AS BIGINT),
                   CAST((end_tok - 1) // 256 AS BIGINT))) AS chunk_id
               FROM spans)
         SELECT shard, chunk_id, doc_id,
           greatest(start_tok, chunk_id * 256) - start_tok AS doc_off,
           greatest(start_tok, chunk_id * 256) - chunk_id * 256 AS chunk_off,
           least(end_tok, (chunk_id + 1) * 256)
             - greatest(start_tok, chunk_id * 256) AS len
         FROM x ORDER BY shard, chunk_id, doc_id""",
    // q72: bloom-novelty gate — n_shingles/n_exact_hits are DuckDB-exact
    // from the same distinct-shingle CTE the postings oracles use (t0,
    // pre-df-cap); no_false_neg/fp_ok are structural/bounded claims the
    // Spark side must prove, so the oracle pins them at 1 (the q42
    // error-bound gate pattern: approximate machinery, exact envelope)
    "q72_bloom_novelty" ->
      ("WITH " + shinglePostingsCte + """,
         hist AS (SELECT DISTINCT tok FROM t0 WHERE doc_id % 5 <> 0),
         batch AS (SELECT doc_id, tok FROM t0 WHERE doc_id % 5 = 0)
         SELECT doc_id, count(*) AS n_shingles,
           CAST(sum(CASE WHEN hist.tok IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_exact_hits,
           CAST(1 AS INT) AS no_false_neg,
           CAST(1 AS INT) AS fp_ok
         FROM batch LEFT JOIN hist ON batch.tok = hist.tok
         GROUP BY doc_id ORDER BY doc_id"""),
    // q91: snapshot diff — v2 derived by a deterministic edit script,
    // manifest is pure md5-string/int comparison (no FP anywhere); the
    // unchanged mass never leaves the join
    "q91_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
         v2 AS (
           SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN text || ' [rev2]'
                  ELSE text END AS text
           FROM v1 WHERE doc_id % 13 <> 0
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text
           FROM v1 WHERE doc_id % 17 = 0),
         j AS (
           SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             CASE WHEN b.doc_id IS NULL THEN 'removed'
                  WHEN a.doc_id IS NULL THEN 'added'
                  WHEN md5(a.text) <> md5(b.text) THEN 'changed'
             END AS status,
             CAST(coalesce(length(b.text), length(a.text)) AS BIGINT)
               AS n_chars
           FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
         SELECT doc_id, status, n_chars FROM j
         WHERE status IS NOT NULL
         ORDER BY doc_id, status""",
    // q93: incremental aggregate refresh — the oracle is the FULL
    // RECOMPUTE over v2, so the gate is self-verifying: any error in the
    // Spark-side delta fold (missed status, sign flip, dropped group) is
    // a hard mismatch against the recomputed truth
    "q93_incr_agg" ->
      """WITH v1 AS (SELECT doc_id, source, text FROM documents),
         v2 AS (
           SELECT doc_id, source,
             CASE WHEN doc_id % 10 = 0 THEN text || ' [rev2]'
                  ELSE text END AS text
           FROM v1 WHERE doc_id % 13 <> 0
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, source, text
           FROM v1 WHERE doc_id % 17 = 0)
         SELECT source, count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars
         FROM v2 GROUP BY 1 ORDER BY 1""",
    // q97: temperature mixture weights at alpha = 1/2 — sqrt is
    // correctly rounded (bit-identical cross-engine), counts are exact
    // ints, and the normalizer is an index-ordered fold over the
    // source-sorted weight list on both sides
    "q97_mix_weights" ->
      """WITH t AS (
           SELECT source, CAST(sum(len(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')))
             AS BIGINT) AS n_tokens
           FROM documents GROUP BY 1),
         w AS (SELECT source, n_tokens,
                 round(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS w FROM t),
         z AS (SELECT list_inner_product(ws,
                 list_transform(ws, x -> 1.0)) AS z
               FROM (SELECT list(w ORDER BY source) AS ws FROM w))
         SELECT source, n_tokens, round(w / z, 6) AS weight
         FROM w CROSS JOIN z ORDER BY source""",
    // q105: DSIR importance weights — md5-bucket counts, add-one
    // smoothed log-ratio rounded 6dp then quantized to integer
    // millionths (exact any-order sums; the q83/q95 playbook), FP only
    // at the final divide
    "q105_importance_weights" ->
      """WITH t AS (SELECT doc_id, source, unnest(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
           FROM documents),
         b AS (SELECT doc_id, source,
             ((instr('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 256
              + (instr('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 16
              + (instr('0123456789abcdef', substr(md5(tok), 3, 1)) - 1))
             % 256 AS bucket
           FROM t),
         r AS (SELECT bucket, count(*) AS cnt_r FROM b GROUP BY 1),
         g AS (SELECT bucket, count(*) AS cnt_t FROM b
               WHERE source IN ('src0', 'src1', 'src2', 'src3') GROUP BY 1),
         st AS (SELECT count(*) AS n_r,
                  sum(CASE WHEN source IN ('src0', 'src1', 'src2', 'src3')
                      THEN 1 ELSE 0 END) AS n_t
                FROM b),
         lam AS (SELECT r.bucket,
             CAST(round(round(ln(
                 ((coalesce(g.cnt_t, 0) + 1.0) / (st.n_t + 256.0)) /
                 ((r.cnt_r + 1.0) / (st.n_r + 256.0))), 6) * 1000000.0, 0)
               AS BIGINT) AS lam_q
           FROM r LEFT JOIN g ON r.bucket = g.bucket CROSS JOIN st)
         SELECT b.doc_id, count(*) AS n_tokens,
           round(CAST(sum(lam.lam_q) AS DOUBLE) / 1000000.0, 6)
             AS log_weight
         FROM b JOIN lam ON b.bucket = lam.bucket
         GROUP BY 1 ORDER BY 1""",
    // q111: SCD2 merge delta over the q91 edit script — close rows for
    // removed/changed keys, open rows for added/changed keys, unchanged
    // mass never materialized; md5 content fingerprints, integer
    // versions, null valid_to only on still-current opens
    "q111_scd2_delta" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
         v2 AS (
           SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN text || ' [rev2]'
                  ELSE text END AS text
           FROM v1 WHERE doc_id % 13 <> 0
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text
           FROM v1 WHERE doc_id % 17 = 0),
         j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                 md5(a.text) AS fp1, md5(b.text) AS fp2,
                 a.doc_id IS NOT NULL AS in1, b.doc_id IS NOT NULL AS in2
               FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
         SELECT doc_id, fp1 AS fp, CAST(1 AS INT) AS valid_from,
           CAST(2 AS INT) AS valid_to, CAST(0 AS INT) AS is_current,
           'close' AS action
         FROM j WHERE in1 AND (NOT in2 OR fp1 <> fp2)
         UNION ALL
         SELECT doc_id, fp2 AS fp, CAST(2 AS INT) AS valid_from,
           CAST(NULL AS INT) AS valid_to, CAST(1 AS INT) AS is_current,
           'open' AS action
         FROM j WHERE in2 AND (NOT in1 OR fp1 <> fp2)
         ORDER BY doc_id, action""",
    // q114: sliding-window chunking — start lattice 0,48,96… < n_tok,
    // 64-token windows, md5 of the space-joined slice (list_slice is
    // 1-based inclusive, matching Spark's slice(start+1, len))
    "q114_doc_chunks" ->
      """WITH t AS (SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
               ' ') AS toks
           FROM documents),
         s AS (SELECT doc_id, toks, len(toks) AS n_tok FROM t)
         SELECT doc_id,
           CAST(gs // 48 AS INT) AS chunk_idx,
           CAST(gs AS INT) AS start_tok,
           CAST(least(64, n_tok - gs) AS INT) AS n_chunk_toks,
           md5(array_to_string(
             list_slice(toks, gs + 1, least(gs + 64, n_tok)), ' ')) AS chunk_md5
         FROM s, unnest(generate_series(0, n_tok - 1, 48)) AS u(gs)
         ORDER BY doc_id, chunk_idx""",
    // q117: per-source quota — longest-first rank, tie on doc_id; the
    // grouped CASE sums are exact integers
    "q117_domain_cap" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
               ORDER BY n_chars DESC, doc_id) AS rk
           FROM documents)
         SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN rk <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rk <= 50 THEN n_chars END) AS BIGINT) AS chars_kept
         FROM r GROUP BY source ORDER BY source""",
    // q118: 60-bit row digest = low 15 hex digits of the payload md5
    // (big-endian positional fold), XOR-folded per group — XOR is
    // order-independent, so both engines agree under any plan
    "q118_table_fingerprint" ->
      """WITH p AS (SELECT l_returnflag,
             md5(concat_ws('|', l_orderkey, l_partkey, l_suppkey,
               l_linenumber, CAST(CAST(l_shipdate AS DATE) AS VARCHAR))) AS h
           FROM lineitem),
         f AS (SELECT l_returnflag,
             list_sum([(strpos('0123456789abcdef', h[17+i]) - 1)::BIGINT
                        * (1::BIGINT << (4*(15-i))) for i in range(1, 16)]) AS fp
           FROM p)
         SELECT l_returnflag, count(*) AS n_rows,
           CAST(bit_xor(fp) AS BIGINT) AS fingerprint
         FROM f GROUP BY l_returnflag ORDER BY l_returnflag""",
    // q122: fold = first-8-hex-digit fold of md5(canonical_id) mod 5;
    // canonical = min doc_id per content hash, so dup clusters co-assign
    "q122_fold_assign" ->
      """WITH d AS (SELECT doc_id, n_chars,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
           FROM documents),
         c AS (SELECT fp, min(doc_id) AS canonical_id FROM d GROUP BY 1),
         f AS (SELECT d.doc_id, d.n_chars, d.fp,
             CAST(list_sum([(strpos('0123456789abcdef',
                 md5(CAST(c.canonical_id AS VARCHAR))[i]) - 1)::BIGINT
                 * (1::BIGINT << (4 * (8 - i))) for i in range(1, 9)]) % 5
               AS INT) AS fold
           FROM d JOIN c ON d.fp = c.fp),
         g AS (SELECT fold, fp, count(*) AS nd, sum(n_chars) AS ch
           FROM f GROUP BY 1, 2)
         SELECT fold, CAST(sum(nd) AS BIGINT) AS n_docs,
           count(*) AS n_clusters, CAST(sum(ch) AS BIGINT) AS chars
         FROM g GROUP BY fold ORDER BY fold""",
    // q128: per-bucket XOR fingerprints of v1 vs the q91 v2 mutation;
    // only differing buckets survive — the repair manifest
    "q128_fp_diff" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
         v2 AS (
           SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN text || ' [rev2]'
                  ELSE text END AS text
           FROM v1 WHERE doc_id % 13 <> 0
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text
           FROM v1 WHERE doc_id % 17 = 0),
         f1 AS (SELECT CAST(doc_id % 64 AS INT) AS bucket,
             count(*) AS n1, bit_xor(list_sum([
               (strpos('0123456789abcdef',
                  md5(concat_ws('|', doc_id, text))[17 + i]) - 1)::BIGINT
               * (1::BIGINT << (4 * (15 - i))) for i in range(1, 16)])) AS fp1
           FROM v1 GROUP BY 1),
         f2 AS (SELECT CAST(doc_id % 64 AS INT) AS bucket,
             count(*) AS n2, bit_xor(list_sum([
               (strpos('0123456789abcdef',
                  md5(concat_ws('|', doc_id, text))[17 + i]) - 1)::BIGINT
               * (1::BIGINT << (4 * (15 - i))) for i in range(1, 16)])) AS fp2
           FROM v2 GROUP BY 1)
         SELECT coalesce(f1.bucket, f2.bucket) AS bucket,
           CAST(coalesce(n1, 0) AS BIGINT) AS n1,
           CAST(coalesce(n2, 0) AS BIGINT) AS n2,
           CAST(coalesce(fp1, 0) AS BIGINT) AS fp1,
           CAST(coalesce(fp2, 0) AS BIGINT) AS fp2
         FROM f1 FULL OUTER JOIN f2 ON f1.bucket = f2.bucket
         WHERE coalesce(fp1, 0) <> coalesce(fp2, 0)
            OR coalesce(n1, 0) <> coalesce(n2, 0)
         ORDER BY bucket""",
    // q135: md5 of the UTF-8 payload bytes == md5 of the text on both
    // engines; wasted bytes are exact integers
    "q135_media_dedup" ->
      """WITH m AS (SELECT
             CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
                  ELSE 'mp4' END AS format,
             md5(text) AS fp,
             octet_length(encode(text)) AS n_bytes
           FROM documents),
         g AS (SELECT format, fp, count(*) AS n_copies,
             min(n_bytes) AS n_bytes
           FROM m GROUP BY 1, 2)
         SELECT format, count(*) AS n_distinct,
           CAST(sum(n_copies) AS BIGINT) AS n_total,
           CAST(sum((n_copies - 1) * n_bytes) AS BIGINT) AS wasted_bytes
         FROM g GROUP BY format ORDER BY format""",
    // q325: dHash-style perceptual media near-dup — 63 strided-byte
    // gradient bits (hex-pair byte decode, integer compares, shifted
    // sum), 16-bit Hamming bands for candidates, XOR+popcount verify
    // at <=6; the planted one-byte-variant pair must surface with
    // hamming 2 (md5/q135 cannot see it)
    "q325_media_neardup" ->
      """WITH m AS (
           SELECT doc_id, encode(text) AS media FROM documents
           UNION ALL SELECT 9000001, encode(repeat('abcdefgh', 32))
           UNION ALL SELECT 9000002,
             encode(substr(repeat('abcdefgh', 32), 1, 129) || 'z'
               || substr(repeat('abcdefgh', 32), 131))),
         hx AS (SELECT doc_id, octet_length(media)::BIGINT AS n,
             hex(media) AS h FROM m),
         coded AS (SELECT doc_id,
             CAST(list_sum([CASE WHEN
                 (16*(strpos('0123456789ABCDEF', substr(h,
                     CAST((i*(n-1)) // 63 AS BIGINT)*2 + 1, 1)) - 1)
                  + strpos('0123456789ABCDEF', substr(h,
                     CAST((i*(n-1)) // 63 AS BIGINT)*2 + 2, 1)) - 1)
               > (16*(strpos('0123456789ABCDEF', substr(h,
                     CAST(((i+1)*(n-1)) // 63 AS BIGINT)*2 + 1, 1)) - 1)
                  + strpos('0123456789ABCDEF', substr(h,
                     CAST(((i+1)*(n-1)) // 63 AS BIGINT)*2 + 2, 1)) - 1)
               THEN (1::BIGINT << i) ELSE 0::BIGINT END
               for i in range(0, 63)]) AS BIGINT) AS code
           FROM hx WHERE n >= 2),
         bands AS (SELECT doc_id, code, b.range AS b,
             (code >> CAST(b.range * 16 AS INT)) & 65535 AS band
           FROM coded, range(0, 4) b),
         pairs AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
             x.code AS ca, y.code AS cb
           FROM bands x JOIN bands y ON x.b = y.b AND x.band = y.band
             AND x.doc_id < y.doc_id)
         SELECT id_a, id_b, CAST(bit_count(xor(ca, cb)) AS INT) AS hamming
         FROM pairs WHERE bit_count(xor(ca, cb)) <= 6
         ORDER BY id_a, id_b""",
    // q136: the oracle profiles v1/v2 DIRECTLY — a hash match proves the
    // Spark side's SCD2-history reconstruction equals the materialized
    // snapshots
    "q136_time_travel" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
         v2 AS (
           SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN text || ' [rev2]'
                  ELSE text END AS text
           FROM v1 WHERE doc_id % 13 <> 0
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text
           FROM v1 WHERE doc_id % 17 = 0)
         SELECT * FROM (
           SELECT 1 AS version, count(*) AS n_docs,
             CAST(sum(length(text)) AS BIGINT) AS n_chars FROM v1
           UNION ALL
           SELECT 2, count(*), CAST(sum(length(text)) AS BIGINT) FROM v2
         ) ORDER BY version""",
    // q137: integer band edges on both axes — (k*4)//10000 quality
    // quarters, log2-of-quantized-norm² via length(bin(x))-1
    "q137_fusion_bands" ->
      ("WITH " + qualityDocCte + """,
         k AS (SELECT doc_id,
             CAST(round(quality * 10000) AS BIGINT) AS k FROM qdoc),
         nm AS (SELECT vec_id AS doc_id,
             list_sum(list_transform(embedding::DOUBLE[],
               x -> CAST(round(x * 1024) AS BIGINT)
                    * CAST(round(x * 1024) AS BIGINT))) AS norm2q
           FROM embeddings)
         SELECT CAST(k * 4 // 10000 AS INT) AS quality_band,
           CAST(length(bin(norm2q)) - 1 AS INT) AS norm_band,
           count(*) AS n_docs
         FROM k JOIN nm ON k.doc_id = nm.doc_id
         GROUP BY 1, 2 ORDER BY quality_band, norm_band"""),
    // q140: the oracle is the NAIVE global budget window — the Spark
    // side's two-phase bucket/offset cut must equal it exactly
    "q140_budget_select" ->
      ("WITH " + qualityDocCte + """,
         qk AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(round(quality * 10000) AS BIGINT) AS k FROM qdoc),
         r AS (SELECT doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (ORDER BY k DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_excl
           FROM qk)
         SELECT d.source, count(*) AS n_kept,
           CAST(sum(r.n_tokens) AS BIGINT) AS tokens_kept
         FROM r JOIN documents d ON r.doc_id = d.doc_id
         WHERE r.cum_excl < 100000
         GROUP BY d.source ORDER BY d.source"""),
    // q141: per-metric v1/v2 column profiles with drift flags; integers
    // only
    "q141_drift_report" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
         v2 AS (
           SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN text || ' [rev2]'
                  ELSE text END AS text
           FROM v1 WHERE doc_id % 13 <> 0
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text
           FROM v1 WHERE doc_id % 17 = 0),
         p1 AS (SELECT count(*) AS n_rows,
             CAST(sum(length(text)) AS BIGINT) AS chars,
             count(DISTINCT md5(text)) AS nd FROM v1),
         p2 AS (SELECT count(*) AS n_rows,
             CAST(sum(length(text)) AS BIGINT) AS chars,
             count(DISTINCT md5(text)) AS nd FROM v2)
         SELECT * FROM (
           SELECT 'chars' AS metric, p1.chars AS v1_value,
             p2.chars AS v2_value,
             CAST(CASE WHEN p1.chars <> p2.chars THEN 1 ELSE 0 END AS INT)
               AS drifted
           FROM p1, p2
           UNION ALL SELECT 'distinct_texts', p1.nd, p2.nd,
             CAST(CASE WHEN p1.nd <> p2.nd THEN 1 ELSE 0 END AS INT)
           FROM p1, p2
           UNION ALL SELECT 'n_rows', p1.n_rows, p2.n_rows,
             CAST(CASE WHEN p1.n_rows <> p2.n_rows THEN 1 ELSE 0 END AS INT)
           FROM p1, p2
         ) ORDER BY metric""",
    // q146: Gini over source char mass — rank asc by (chars, source),
    // G = 2·Σi·x / (n·Σx) − (n+1)/n; integers until the closed form
    "q146_source_gini" ->
      """WITH per AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS x
           FROM documents GROUP BY source),
         r AS (SELECT x, row_number() OVER (ORDER BY x, source) AS i
           FROM per)
         SELECT CAST(count(*) AS INT) AS n_sources,
           CAST(sum(x) AS BIGINT) AS total_chars,
           round((2.0 * CAST(sum(i * x) AS DOUBLE)) /
             (CAST(count(*) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) -
             CAST(count(*) + 1 AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS gini
         FROM r""",
    // q170: truncation loss at three context lengths — one aggregate
    // carries every length's kept/over sums; the oracle unpivots by
    // UNION ALL over the same single-row aggregate
    "q170_truncation_loss" ->
      """WITH m AS (SELECT CAST(len(string_split(regexp_replace(
             lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS BIGINT)
             AS n_tok FROM documents),
         a AS (SELECT count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
             CAST(sum(least(n_tok, 128)) AS BIGINT) AS k128,
             CAST(sum(CASE WHEN n_tok > 128 THEN 1 ELSE 0 END) AS BIGINT)
               AS o128,
             CAST(sum(least(n_tok, 512)) AS BIGINT) AS k512,
             CAST(sum(CASE WHEN n_tok > 512 THEN 1 ELSE 0 END) AS BIGINT)
               AS o512,
             CAST(sum(least(n_tok, 2048)) AS BIGINT) AS k2048,
             CAST(sum(CASE WHEN n_tok > 2048 THEN 1 ELSE 0 END) AS BIGINT)
               AS o2048
           FROM m)
         SELECT 128 AS max_len, n_docs, o128 AS n_docs_over, sum_tokens,
           k128 AS sum_kept, round(1.0 - CAST(k128 AS DOUBLE) /
             CAST(sum_tokens AS DOUBLE), 6) AS trunc_frac FROM a
         UNION ALL
         SELECT 512, n_docs, o512, sum_tokens, k512,
           round(1.0 - CAST(k512 AS DOUBLE) /
             CAST(sum_tokens AS DOUBLE), 6) FROM a
         UNION ALL
         SELECT 2048, n_docs, o2048, sum_tokens, k2048,
           round(1.0 - CAST(k2048 AS DOUBLE) /
             CAST(sum_tokens AS DOUBLE), 6) FROM a
         ORDER BY max_len""",
    // q171: token survival per distinct quality score (descending) —
    // the cumulative window runs on the bounded distinct-score frame
    "q171_quality_curve" ->
      ("WITH " + qualityDocCte + """,
         qk AS (SELECT CAST(round(quality * 10000) AS BIGINT) AS k,
             CAST(n_tokens AS BIGINT) AS n_tok FROM qdoc),
         ps AS (SELECT k, count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM qk GROUP BY 1),
         c AS (SELECT k, n_docs, n_tokens,
             CAST(sum(n_docs) OVER (ORDER BY k DESC) AS BIGINT)
               AS cum_docs,
             CAST(sum(n_tokens) OVER (ORDER BY k DESC) AS BIGINT)
               AS cum_tokens FROM ps),
         t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens
           FROM ps)
         SELECT CAST(k AS DOUBLE) / 10000.0 AS quality, n_docs, n_tokens,
           cum_docs, cum_tokens,
           round(CAST(cum_tokens AS DOUBLE) /
             CAST(total_tokens AS DOUBLE), 6) AS cum_token_frac
         FROM c, t ORDER BY quality DESC"""),
    // q191: per-source PII hit density over the q46 planted convention
    "q191_pii_density" ->
      """WITH m AS (SELECT source,
             text || ' contact user' || doc_id ||
               '@example.com or call 5551234567' AS t
           FROM documents),
         c AS (SELECT source, CAST(length(t) AS BIGINT) AS n_chars_t,
             CAST(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(t, '[0-9]{7,}')) AS BIGINT)
               AS n_digitruns
           FROM m)
         SELECT source, count(*) AS n_docs,
           CAST(sum(n_emails) AS BIGINT) AS n_emails,
           CAST(sum(n_digitruns) AS BIGINT) AS n_digitruns,
           round(CAST(sum(n_emails) + sum(n_digitruns) AS DOUBLE)
             * 10000.0 / CAST(sum(n_chars_t) AS DOUBLE), 6)
             AS hits_per_10k_chars
         FROM c GROUP BY source ORDER BY source""",
    // q249: IVM join-view delta — the ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB rule on
    // per-user counting aggregates, with the independent full recount
    // and agreement flag hash-pinned alongside
    "q249_ivm_join_delta" ->
      """WITH ev AS (
           SELECT user_id, event_type, (event_id % 10 = 7) AS is_delta
           FROM events WHERE event_type IN ('click', 'purchase')),
         base AS (
           SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS cb,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS pb
           FROM ev WHERE NOT is_delta GROUP BY 1),
         delta AS (
           SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS cd,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS pd
           FROM ev WHERE is_delta GROUP BY 1),
         j AS (
           SELECT coalesce(base.user_id, delta.user_id) AS user_id,
             coalesce(cb, 0) AS cb, coalesce(pb, 0) AS pb,
             coalesce(cd, 0) AS cd, coalesce(pd, 0) AS pd
           FROM base FULL OUTER JOIN delta ON base.user_id = delta.user_id)
         SELECT user_id, cb * pb AS base_pairs,
           cd * pb + cb * pd + cd * pd AS delta_pairs,
           cb * pb + cd * pb + cb * pd + cd * pd AS total_pairs,
           (cb + cd) * (pb + pd) AS recount_pairs,
           CASE WHEN cb * pb + cd * pb + cb * pd + cd * pd
                = (cb + cd) * (pb + pd) THEN 1 ELSE 0 END AS consistent
         FROM j ORDER BY user_id""",
    // q306: MERGE INTO replayed as the classic decomposition — kept
    // (matched, non-D) with U payloads applied, UNION ALL the inserted
    // (unmatched, non-D) — then the q118 XOR fingerprint per source.
    // A wrong arm (applied matched-I, surviving delete, dropped no-op)
    // flips a fingerprint.
    "q306_merge_into" ->
      """WITH base AS (SELECT doc_id, text, source FROM documents),
         changes AS (
           SELECT doc_id, 'D' AS op, CAST(NULL AS VARCHAR) AS text,
                  CAST(NULL AS VARCHAR) AS source FROM base
             WHERE doc_id % 13 = 0
           UNION ALL SELECT doc_id, 'U', text || ' [merged]', source
             FROM base WHERE doc_id % 13 <> 0 AND doc_id % 10 = 0
           UNION ALL SELECT doc_id + 10000000, 'U', text || ' [new]',
             source FROM base WHERE doc_id % 17 = 0
           UNION ALL SELECT doc_id + 20000000, 'I', text, source
             FROM base WHERE doc_id % 11 = 0
           UNION ALL SELECT doc_id, 'I', 'SHOULD NOT APPLY', 'zz'
             FROM base WHERE doc_id % 19 = 0 AND doc_id % 13 <> 0
               AND doc_id % 10 <> 0),
         merged AS (
           SELECT t.doc_id,
             CASE WHEN c.doc_id IS NOT NULL AND c.op = 'U' THEN c.text
                  ELSE t.text END AS text,
             CASE WHEN c.doc_id IS NOT NULL AND c.op = 'U' THEN c.source
                  ELSE t.source END AS source
           FROM base t LEFT JOIN changes c USING (doc_id)
           WHERE c.doc_id IS NULL OR c.op <> 'D'
           UNION ALL
           SELECT c.doc_id, c.text, c.source
           FROM changes c LEFT JOIN base t USING (doc_id)
           WHERE t.doc_id IS NULL AND c.op <> 'D'),
         h AS (SELECT source, length(text)::BIGINT AS len,
                 md5(concat_ws('|', doc_id, text)) AS hh FROM merged),
         f AS (SELECT source, len,
                 list_sum([(strpos('0123456789abcdef', hh[17+i]) - 1)::BIGINT
                            * (1::BIGINT << (4*(15-i))) for i in range(1, 16)])
                   AS fp
               FROM h)
         SELECT source, count(*) AS n_docs,
           CAST(sum(len) AS BIGINT) AS total_chars,
           CAST(bit_xor(fp) AS BIGINT) AS fingerprint
         FROM f GROUP BY source ORDER BY source""",
    // q311: write-amplification planner — one batch-1-confined
    // changeset replayed against three write strategies; affected
    // partitions per the Sinks.mergeInto rule (matched D/U target
    // batches ∪ insert batches ∪ matched-U change batches)
    "q311_write_amplification" ->
      """WITH base AS (SELECT doc_id, text, doc_id // 100 AS batch
           FROM documents),
         b1 AS (SELECT * FROM base WHERE batch = 1),
         changes AS (
           SELECT doc_id, 'D' AS op, CAST(NULL AS VARCHAR) AS text,
                  CAST(NULL AS BIGINT) AS batch FROM b1
             WHERE doc_id % 13 = 0
           UNION ALL SELECT doc_id, 'U', text || ' [merged]', batch
             FROM b1 WHERE doc_id % 13 <> 0 AND doc_id % 10 = 0
           UNION ALL SELECT doc_id + 10000000, 'U', text || ' [new]',
             (doc_id + 10000000) // 100 FROM b1 WHERE doc_id % 17 = 0
           UNION ALL SELECT doc_id + 20000000, 'I', text,
             (doc_id + 20000000) // 100 FROM b1 WHERE doc_id % 11 = 0
           UNION ALL SELECT doc_id, 'I', 'SHOULD NOT APPLY', batch
             FROM b1 WHERE doc_id % 19 = 0 AND doc_id % 13 <> 0
               AND doc_id % 10 <> 0),
         matched_du AS (SELECT c.doc_id, c.op, c.batch AS c_batch,
             t.batch AS t_batch
           FROM changes c JOIN base t USING (doc_id) WHERE c.op <> 'I'),
         inserts AS (SELECT c.doc_id, c.op, c.batch
           FROM changes c LEFT JOIN base t USING (doc_id)
           WHERE t.doc_id IS NULL AND c.op <> 'D'),
         parts AS (SELECT t_batch AS batch FROM matched_du
           UNION SELECT batch FROM inserts
           UNION SELECT c_batch FROM matched_du WHERE op = 'U'),
         merged AS (
           SELECT t.doc_id,
             CASE WHEN c.doc_id IS NOT NULL AND c.op = 'U' THEN c.batch
                  ELSE t.batch END AS batch
           FROM base t LEFT JOIN changes c USING (doc_id)
           WHERE c.doc_id IS NULL OR c.op <> 'D'
           UNION ALL
           SELECT c.doc_id, c.batch
           FROM changes c LEFT JOIN base t USING (doc_id)
           WHERE t.doc_id IS NULL AND c.op <> 'D'),
         fullr AS (SELECT count(*)::BIGINT AS n FROM merged),
         scoped AS (SELECT count(*)::BIGINT AS n FROM merged
           WHERE batch IN (SELECT batch FROM parts)),
         scd2 AS (SELECT (coalesce(sum(CASE WHEN op = 'U' THEN 2
               ELSE 1 END), 0))::BIGINT
             + (SELECT count(*) FROM inserts)::BIGINT AS n
           FROM matched_du)
         SELECT * FROM (
           SELECT 'full_rewrite' AS strategy, n AS rows_written,
             CAST(n::HUGEINT * 10000 // (SELECT n FROM fullr) AS BIGINT)
               AS share_bp FROM fullr
           UNION ALL SELECT 'merge_partition_scoped', n,
             CAST(n::HUGEINT * 10000 // (SELECT n FROM fullr) AS BIGINT)
             FROM scoped
           UNION ALL SELECT 'scd2_append', n,
             CAST(n::HUGEINT * 10000 // (SELECT n FROM fullr) AS BIGINT)
             FROM scd2)
         ORDER BY strategy""",
    // q323: schema-evolution MERGE — the engine runs a REAL
    // write→evolve(add quality_bp)→mergeSchema-read-back cycle through
    // Sinks; the oracle replays the evolution relationally: kept rows
    // NULL-scored, U/I rows carry the new column. Any wrong null-fill
    // on an untouched old-schema partition breaks n_scored/sum.
    "q323_schema_evolution" ->
      """WITH base AS (SELECT doc_id, text, source FROM documents),
         changes AS (
           SELECT doc_id, 'U' AS op, text || ' [v2]' AS text, source,
                  doc_id % 10000 AS quality_bp
           FROM base WHERE doc_id % 10 = 0
           UNION ALL
           SELECT doc_id + 20000000, 'I', text, source,
                  (doc_id + 20000000) % 10000
           FROM base WHERE doc_id % 23 = 0 AND doc_id % 20 = 3),
         merged AS (
           SELECT t.doc_id,
             CASE WHEN c.doc_id IS NOT NULL AND c.op = 'U' THEN c.text
                  ELSE t.text END AS text,
             CASE WHEN c.doc_id IS NOT NULL AND c.op = 'U' THEN c.source
                  ELSE t.source END AS source,
             CASE WHEN c.doc_id IS NOT NULL AND c.op = 'U'
                  THEN c.quality_bp ELSE NULL END AS quality_bp
           FROM base t LEFT JOIN changes c USING (doc_id)
           UNION ALL
           SELECT c.doc_id, c.text, c.source, c.quality_bp
           FROM changes c LEFT JOIN base t USING (doc_id)
           WHERE t.doc_id IS NULL AND c.op <> 'D')
         SELECT source, count(*)::BIGINT AS n_docs,
           CAST(sum(CASE WHEN quality_bp IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_scored,
           CAST(sum(COALESCE(quality_bp, 0)) AS BIGINT) AS sum_quality_bp,
           CAST(sum(length(text)) AS BIGINT) AS total_chars
         FROM merged GROUP BY source ORDER BY source""",
    // q329: bin-packing v2 audit — next-fit-in-id-order vs
    // largest-first round-robin over exactly lower-bound-many bins,
    // both vs the LP bound; naive global windows replay the two-phase
    // ranks (the established rider contract)
    "q329_bin_packing" ->
      """WITH d AS (SELECT doc_id,
           CAST(len(string_split(regexp_replace(lower(trim(text)),
             '\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tokens
         FROM documents),
         tot AS (SELECT CAST((sum(n_tokens) + 4999) // 5000 AS BIGINT)
             AS lb FROM d),
         nf AS (SELECT (cum - 1) // 5000 AS bin, n_tokens FROM (
             SELECT n_tokens, CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum FROM d)),
         lpt AS (SELECT (r - 1) % (SELECT lb FROM tot) AS bin, n_tokens
           FROM (SELECT n_tokens, CAST(row_number() OVER (
               ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS r FROM d)),
         nfb AS (SELECT bin, CAST(sum(n_tokens) AS BIGINT) AS fill
           FROM nf GROUP BY 1),
         lptb AS (SELECT bin, CAST(sum(n_tokens) AS BIGINT) AS fill
           FROM lpt GROUP BY 1),
         prof AS (
           SELECT 'nextfit_id' AS packer, count(*)::BIGINT AS n_bins,
             CAST(max(fill) AS BIGINT) AS max_tokens,
             CAST(min(fill) AS BIGINT) AS min_tokens,
             CAST(sum(CASE WHEN fill > 5000 THEN 1 ELSE 0 END) AS BIGINT)
               AS overflow_bins,
             CAST((max(fill) - min(fill))::HUGEINT * count(*) * 1000000
               // sum(fill) AS BIGINT) AS spread_ppm
           FROM nfb
           UNION ALL
           SELECT 'lpt_roundrobin', count(*)::BIGINT,
             CAST(max(fill) AS BIGINT), CAST(min(fill) AS BIGINT),
             CAST(sum(CASE WHEN fill > 5000 THEN 1 ELSE 0 END) AS BIGINT),
             CAST((max(fill) - min(fill))::HUGEINT * count(*) * 1000000
               // sum(fill) AS BIGINT)
           FROM lptb)
         SELECT packer, n_bins, (SELECT lb FROM tot) AS lower_bound_bins,
           max_tokens, min_tokens, overflow_bins, spread_ppm
         FROM prof ORDER BY packer""",
    // q333: Bradley-Terry source preference ranking — deterministic
    // duel table (per (lang, rank) the source pair's docs duel, longer
    // wins, ties void), then 4 unrolled minorization rounds of
    // p_i <- W_i / sum_j n_ij/(p_i+p_j) on 1e12/ppm floor-division
    // grids, max-normalized per round (the q332 device)
    "q333_bradley_terry" -> {
      def round(r: Int) =
        s"""den$r AS (SELECT m.si AS source,
             CAST(sum(m.n_ij * 1000000000000
               // greatest(pi.p + pj.p, 1)) AS BIGINT) AS den
           FROM mat m JOIN p${r - 1} pi ON m.si = pi.source
             JOIN p${r - 1} pj ON m.sj = pj.source GROUP BY 1),
         raw$r AS MATERIALIZED (SELECT w.source,
             CASE WHEN d.den > 0
               THEN CAST(w.wins * 1000000000000 // d.den AS BIGINT)
               ELSE 0 END AS raw
           FROM wins w JOIN den$r d USING (source)),
         p$r AS MATERIALIZED (SELECT source,
             CAST(raw * 1000000 // greatest(
               (SELECT max(raw) FROM raw$r), 1) AS BIGINT) AS p
           FROM raw$r)"""
      s"""WITH ranked AS (SELECT lang, source, n_chars, doc_id,
             row_number() OVER (PARTITION BY source, lang
               ORDER BY n_chars DESC, doc_id) AS rk
           FROM documents),
         mat AS MATERIALIZED (
           SELECT a.source AS si, b.source AS sj,
             CAST(count(*) AS BIGINT) AS n_ij,
             CAST(sum(CASE WHEN a.n_chars > b.n_chars THEN 1 ELSE 0 END)
               AS BIGINT) AS w_ij
           FROM ranked a JOIN ranked b
             ON a.lang = b.lang AND a.rk = b.rk
               AND a.source <> b.source AND a.n_chars <> b.n_chars
           GROUP BY 1, 2),
         wins AS MATERIALIZED (SELECT si AS source,
             CAST(sum(w_ij) AS BIGINT) AS wins,
             CAST(sum(n_ij) AS BIGINT) AS duels
           FROM mat GROUP BY 1),
         p0 AS (SELECT source, CAST(1000000 AS BIGINT) AS p FROM wins),
         ${round(1)},
         ${round(2)},
         ${round(3)},
         ${round(4)}
         SELECT w.source, w.duels, w.wins, p.p AS bt_ppm
         FROM wins w JOIN p4 p USING (source)
         ORDER BY bt_ppm DESC, source"""
    },
    // q338: Poisson-bootstrap CI — 64 deterministic replicas (md5-ppm
    // coins cut at the Poisson(1) CDF), integer-milli replica means,
    // exact rank picks at ceil(.05 L)/ceil(.95 L) of the live replicas
    "q338_bootstrap_ci" ->
      """WITH base AS (SELECT doc_id, source,
             CAST(n_chars AS BIGINT) AS x
           FROM documents),
         full_m AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(x) * 1000 // count(*) AS BIGINT) AS mean_milli
           FROM base GROUP BY 1),
         draws AS (SELECT b.source, b.x, r.range AS r,
             (CAST(list_sum([(strpos('0123456789abcdef',
                  substr(md5(b.doc_id || '_bs' || r.range), i, 1))
                - 1)::BIGINT * (1::BIGINT << (4*(12-i)))
                for i in range(1, 13)]) AS BIGINT) % 1000000) AS u
           FROM base b, range(1, 65) r),
         rep AS MATERIALIZED (SELECT source, r,
             CAST(sum(w) AS BIGINT) AS sw,
             CAST(sum(w * x) AS BIGINT) AS swx
           FROM (SELECT source, x, r,
               CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
                 WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
                 ELSE 4 END AS w
             FROM draws)
           GROUP BY 1, 2),
         repm AS MATERIALIZED (SELECT source, r,
             CAST(swx * 1000 // sw AS BIGINT) AS m
           FROM rep WHERE sw > 0),
         ranked AS (SELECT source, r, m,
             row_number() OVER (PARTITION BY source ORDER BY m, r) AS rk
           FROM repm),
         live AS (SELECT source, CAST(count(*) AS BIGINT) AS n_live,
             (count(*) * 5 + 99) // 100 AS lo_rk,
             (count(*) * 95 + 99) // 100 AS hi_rk
           FROM repm GROUP BY 1),
         picks AS (SELECT ra.source,
             max(CASE WHEN ra.rk = l.lo_rk THEN ra.m END)
               AS ci_lo_milli,
             max(CASE WHEN ra.rk = l.hi_rk THEN ra.m END)
               AS ci_hi_milli,
             max(l.n_live) AS n_live
           FROM ranked ra JOIN live l USING (source) GROUP BY 1)
         SELECT f.source, f.n_docs, f.mean_milli, p.n_live,
           p.ci_lo_milli, p.ci_hi_milli
         FROM full_m f JOIN picks p USING (source) ORDER BY source""",
    // q339: consistent-hash reshard plan — 60-bit md5 ring, 16 vnodes
    // per shard, successor-vnode ownership; move matrix for 8 -> 9
    // shards plus the '*' total row. Every moved doc must land on the
    // NEW shard (the minimal-movement contract, measured).
    "q339_reshard_plan" -> {
      def hx(arg: String) =
        s"""(CAST(list_sum([(strpos('0123456789abcdef',
              substr(md5($arg), i, 1)) - 1)::BIGINT
            * (1::BIGINT << (4*(15-i))) for i in range(1, 16)])
          AS BIGINT))"""
      def ring(name: String, n: Int) =
        s"""$name AS MATERIALIZED (SELECT 's' || s.range AS shard,
             ${hx("'s' || s.range || '_v' || v.range")} AS vpos
           FROM range(0, $n) s, range(0, 16) v)"""
      def asg(name: String, ringName: String, out: String) =
        s"""$name AS MATERIALIZED (SELECT doc_id, shard AS $out FROM (
             SELECT d.doc_id, r.shard,
               row_number() OVER (PARTITION BY d.doc_id
                 ORDER BY (r.vpos < d.pos), r.vpos, r.shard) AS rn
             FROM docs d CROSS JOIN $ringName r) WHERE rn = 1)"""
      s"""WITH docs AS MATERIALIZED (SELECT doc_id,
             ${hx("doc_id::VARCHAR")} AS pos
           FROM documents),
         ${ring("ring8", 8)},
         ${ring("ring9", 9)},
         ${asg("asgb", "ring8", "from_shard")},
         ${asg("asga", "ring9", "to_shard")},
         plan AS MATERIALIZED (SELECT b.doc_id, b.from_shard, a.to_shard
           FROM asgb b JOIN asga a USING (doc_id)),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
             CAST(sum(CASE WHEN from_shard <> to_shard THEN 1 ELSE 0
               END) AS BIGINT) AS n_moved
           FROM plan),
         moves AS (SELECT from_shard, to_shard,
             CAST(count(*) AS BIGINT) AS n_docs
           FROM plan WHERE from_shard <> to_shard GROUP BY 1, 2)
         SELECT m.from_shard, m.to_shard, m.n_docs,
           CAST(m.n_docs * 1000000 // t.n_all AS BIGINT) AS share_ppm
         FROM moves m, tot t
         UNION ALL
         SELECT '*', '*', n_moved,
           CAST(n_moved * 1000000 // n_all AS BIGINT)
         FROM tot
         ORDER BY from_shard, to_shard"""
    },
    // q348: deterministic randomization test — per source vs rest,
    // 64 md5-coin random relabelings at the observed marginal,
    // integer-milli mean-difference statistic, add-one p-value
    "q348_randomization_test" ->
      """WITH base AS (SELECT doc_id, source,
             CAST(n_chars AS BIGINT) AS x
           FROM documents),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
             CAST(sum(x) AS BIGINT) AS sx
           FROM base),
         obs AS (SELECT b.source, CAST(count(*) AS BIGINT) AS na,
             CAST(sum(x) AS BIGINT) AS sa, t.n_all, t.sx
           FROM base b, tot t GROUP BY 1, 4, 5),
         obsd AS MATERIALIZED (SELECT source, na AS n_docs, na, n_all,
             CASE WHEN na > 0 AND n_all - na > 0
               THEN CAST(sa * 1000 // na
                 - (sx - sa) * 1000 // (n_all - na) AS BIGINT)
               ELSE 0 END AS obs_diff_milli
           FROM obs),
         coins AS MATERIALIZED (SELECT b.doc_id, b.x, r.range AS r,
             (CAST(list_sum([(strpos('0123456789abcdef',
                  substr(md5(b.doc_id || '_rt_' || r.range), i, 1))
                - 1)::BIGINT * (1::BIGINT << (4*(12-i)))
                for i in range(1, 13)]) AS BIGINT) % 1000000) AS u
           FROM base b, range(1, 65) r),
         draws AS (SELECT o.source AS scen, c.x, c.r,
             CASE WHEN c.u * o.n_all < o.na * 1000000
               THEN 1 ELSE 0 END AS in_a
           FROM coins c CROSS JOIN obsd o),
         rep AS MATERIALIZED (SELECT scen, r,
             CAST(sum(in_a) AS BIGINT) AS pna,
             CAST(sum(in_a * x) AS BIGINT) AS psa,
             CAST(count(*) AS BIGINT) AS pn,
             CAST(sum(x) AS BIGINT) AS ps
           FROM draws GROUP BY 1, 2),
         ad AS (SELECT scen, CASE WHEN pna > 0 AND pn - pna > 0
               THEN CAST(abs(psa * 1000 // pna
                 - (ps - psa) * 1000 // (pn - pna)) AS BIGINT)
               ELSE 0 END AS ad
           FROM rep),
         ex AS (SELECT o.source, CAST(sum(CASE WHEN a.ad >=
               abs(o.obs_diff_milli) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_extreme
           FROM ad a JOIN obsd o ON a.scen = o.source GROUP BY 1)
         SELECT o.source, o.n_docs, o.obs_diff_milli, e.n_extreme,
           CAST((e.n_extreme + 1) * 1000000 // 65 AS BIGINT) AS p_ppm
         FROM obsd o JOIN ex e USING (source) ORDER BY source""",
    // q345: Neyman labeling-budget allocation — integer sample SD per
    // stratum, then proportional and N_h*sigma_h weights through the
    // same Hamilton largest-remainder machinery (both sum to budget)
    "q345_neyman_alloc" -> {
      def hamilton(tag: String, w: String) =
        s"""w$tag AS (SELECT source, $w AS w FROM v),
         t$tag AS (SELECT greatest(CAST(sum(w) AS HUGEINT), 1) AS tot
           FROM w$tag),
         q$tag AS (SELECT source,
             CAST(w::HUGEINT * 1000 // tot AS BIGINT) AS quota,
             CAST(w::HUGEINT * 1000 % tot AS BIGINT) AS rem
           FROM w$tag, t$tag),
         l$tag AS (SELECT 1000 - CAST(sum(quota) AS BIGINT) AS leftover
           FROM q$tag),
         a$tag AS (SELECT source, quota + CASE WHEN
             row_number() OVER (ORDER BY rem DESC, source)
               <= (SELECT leftover FROM l$tag) THEN 1 ELSE 0 END
             AS alloc
           FROM q$tag)"""
      s"""WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sx,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
           FROM documents GROUP BY 1),
         v AS MATERIALIZED (SELECT source, n_docs,
             CASE WHEN n_docs >= 2 THEN CAST(floor(sqrt(CAST(
               (n_docs * sxx - sx * sx) // (n_docs * (n_docs - 1))
               AS DOUBLE))) AS BIGINT) ELSE 0 END AS sigma
           FROM s),
         ${hamilton("p", "n_docs")},
         ${hamilton("n", "n_docs * sigma")}
         SELECT v.source, v.n_docs, v.sigma,
           ap.alloc AS prop_alloc, an.alloc AS neyman_alloc,
           an.alloc - ap.alloc AS shift
         FROM v JOIN ap USING (source) JOIN an USING (source)
         ORDER BY source"""
    },
    // q341: sort-key pruning planner — rows laid into 4000-row files
    // under each candidate total order, per-file min/max zone maps,
    // files-scanned per workload interval
    "q341_sort_pruning" -> {
      def files(tag: String, key: String) =
        s"""f$tag AS MATERIALIZED (SELECT
             ((row_number() OVER (ORDER BY $key, tie)) - 1) // 4000
               AS file_id,
             l_shipdate, l_partkey, l_orderkey
           FROM li),
         st$tag AS (SELECT '$key' AS sort_key, file_id,
             min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
             min(l_partkey) AS min_part, max(l_partkey) AS max_part,
             min(l_orderkey) AS min_ord, max(l_orderkey) AS max_ord
           FROM f$tag GROUP BY 2)"""
      s"""WITH li AS (SELECT l_orderkey, l_partkey, l_shipdate,
             l_orderkey * 10 + l_linenumber AS tie
           FROM lineitem),
         ${files("a", "l_shipdate")},
         ${files("b", "l_partkey")},
         ${files("c", "l_orderkey")},
         stats AS (SELECT * FROM sta UNION ALL SELECT * FROM stb
           UNION ALL SELECT * FROM stc),
         scans AS (SELECT sort_key,
             CAST(count(*) AS BIGINT) AS n_files,
             CAST(sum(CASE WHEN min_ship <= TIMESTAMP '1995-06-30'
               AND max_ship >= TIMESTAMP '1995-03-01' THEN 1 ELSE 0
               END) AS BIGINT) AS s_ship,
             CAST(sum(CASE WHEN min_part <= 199 AND max_part >= 100
               THEN 1 ELSE 0 END) AS BIGINT) AS s_part,
             CAST(sum(CASE WHEN min_ord <= 3999 AND max_ord >= 1000
               THEN 1 ELSE 0 END) AS BIGINT) AS s_ord
           FROM stats GROUP BY 1),
         up AS (
           SELECT sort_key, 'ship_window' AS workload, n_files,
             s_ship AS files_scanned FROM scans
           UNION ALL
           SELECT sort_key, 'part_range', n_files, s_part FROM scans
           UNION ALL
           SELECT sort_key, 'order_range', n_files, s_ord FROM scans)
         SELECT sort_key, workload, n_files, files_scanned,
           CAST(files_scanned * 1000000 // n_files AS BIGINT)
             AS scan_ppm
         FROM up ORDER BY sort_key, workload"""
    },
    // q351: REAL layout pruning — the engine writes lineitem sorted by
    // ship_day into explicit 4000-row file_id partitions and measures
    // pruning from the physical parquet footers; the oracle replays
    // the layout relationally (rank -> partition ranges). Divergence
    // means the write path did not produce the planned zone maps.
    "q351_layout_pruning" ->
      """WITH li AS (SELECT
             datediff('day', DATE '1992-01-01',
               CAST(l_shipdate AS DATE))::BIGINT AS ship_day,
             l_orderkey * 10 + l_linenumber AS tie
           FROM lineitem),
         f AS MATERIALIZED (SELECT
             ((row_number() OVER (ORDER BY ship_day, tie)) - 1) // 4000
               AS part_id,
             ship_day
           FROM li),
         z AS (SELECT part_id, CAST(count(*) AS BIGINT) AS n_rows,
             min(ship_day) AS mn, max(ship_day) AS mx
           FROM f GROUP BY 1),
         wl(workload, lo, hi) AS (VALUES
           ('ship_point',
             datediff('day', DATE '1992-01-01', DATE '1995-06-15'),
             datediff('day', DATE '1992-01-01', DATE '1995-06-15')),
           ('ship_week',
             datediff('day', DATE '1992-01-01', DATE '1995-06-01'),
             datediff('day', DATE '1992-01-01', DATE '1995-06-07')),
           ('ship_window',
             datediff('day', DATE '1992-01-01', DATE '1995-03-01'),
             datediff('day', DATE '1992-01-01', DATE '1995-06-30'))),
         scans AS (SELECT w.workload,
             CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(CASE WHEN z.mn <= w.hi AND z.mx >= w.lo
               THEN 1 ELSE 0 END) AS BIGINT) AS parts_scanned,
             CAST(sum(CASE WHEN z.mn <= w.hi AND z.mx >= w.lo
               THEN z.n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
           FROM wl w CROSS JOIN z GROUP BY 1),
         truth AS (SELECT w.workload,
             CAST(sum(CASE WHEN l.ship_day BETWEEN w.lo AND w.hi
               THEN 1 ELSE 0 END) AS BIGINT) AS rows_matching
           FROM wl w CROSS JOIN li l GROUP BY 1)
         SELECT s.workload, s.n_parts, s.parts_scanned, s.rows_scanned,
           t.rows_matching,
           CAST(s.parts_scanned * 1000000 // s.n_parts AS BIGINT)
             AS scan_ppm
         FROM scans s JOIN truth t USING (workload)
         ORDER BY workload""",
    // q352: knob auto-sizing advisor — the documented 100 TB formulas
    // (df cap, LSH planes/bucket cap, IVF k, skew salts) replayed in
    // pure integer math over the same three corpus aggregates
    "q352_knob_advisor" ->
      """WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs
             FROM documents),
         nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs
             FROM embeddings),
         us AS (SELECT CAST(max(c) AS BIGINT) AS max_user_rows,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(c) AS BIGINT) AS n_events
           FROM (SELECT user_id, count(*) AS c FROM events GROUP BY 1)),
         s AS (SELECT *,
             CASE WHEN (n_vecs + 31) // 32 <= 1 THEN 0
               ELSE length(bin((n_vecs + 31) // 32 - 1)) END AS praw
           FROM nd, nv, us),
         s2 AS (SELECT *,
             greatest(4, least(62, praw))::BIGINT AS rec_planes FROM s)
         SELECT knob, input_stat, stat_value, recommended FROM (
           SELECT 'dedup_df_cap' AS knob, 'n_docs' AS input_stat,
             n_docs AS stat_value,
             least(200, greatest(50,
               (n_docs * 2 + 99) // 100))::BIGINT
               AS recommended
           FROM s2
           UNION ALL
           SELECT 'lsh_n_planes', 'n_vecs', n_vecs, rec_planes FROM s2
           UNION ALL
           SELECT 'lsh_bucket_cap', 'n_vecs', n_vecs,
             greatest(32, (n_vecs * 4 + (1::BIGINT << rec_planes) - 1)
               // (1::BIGINT << rec_planes))::BIGINT
           FROM s2
           UNION ALL
           SELECT 'ivf_k_lists', 'n_vecs', n_vecs,
             least(1048576, greatest(2, (n_vecs + 999) // 1000))::BIGINT
           FROM s2
           UNION ALL
           SELECT 'skew_n_salts', 'max_user_rows',
             coalesce(max_user_rows, 0),
             (CASE WHEN n_events IS NULL OR n_events = 0 THEN 1
               ELSE least(64, greatest(1,
                 (max_user_rows * n_users + n_events - 1)
                   // n_events)) END)::BIGINT
           FROM s2)
         ORDER BY knob""",
    // q357: executed z-order box read — the engine writes lineitem
    // Morton-ordered into block-ALIGNED z-range partitions (each is
    // exactly one 128x128 square of the (a, b) grid, and z div 2^14
    // is a bijection of (a//128, b//128), so the oracle replays
    // partition membership by grouping on the square — no bit math),
    // measures pruning from the physical footers at partition grain,
    // and serves rows/checksums through the PRUNED reads. Divergence
    // means the reader dropped a needed file or the layout leaked.
    "q357_zorder_box_read" ->
      """WITH li AS (SELECT (l_partkey * 48271) % 1024 AS a,
             (l_suppkey * 69621) % 1024 AS b,
             l_orderkey * 10 + l_linenumber AS payload FROM lineitem),
         sq AS (SELECT a // 128 AS sa, b // 128 AS sb,
             CAST(count(*) AS BIGINT) AS n_rows,
             min(a) AS mna, max(a) AS mxa,
             min(b) AS mnb, max(b) AS mxb
           FROM li GROUP BY 1, 2),
         wl(workload, loa, hia, lob, hib) AS (VALUES
           ('box', 100, 160, 200, 260),
           ('a_slab', 100, 160, 0, 1023),
           ('b_slab', 0, 1023, 200, 260)),
         scans AS (SELECT w.workload,
             CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(CASE WHEN mna <= hia AND mxa >= loa
                 AND mnb <= hib AND mxb >= lob
               THEN 1 ELSE 0 END) AS BIGINT) AS parts_scanned,
             CAST(sum(CASE WHEN mna <= hia AND mxa >= loa
                 AND mnb <= hib AND mxb >= lob
               THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
           FROM wl w CROSS JOIN sq GROUP BY 1),
         truth AS (SELECT w.workload,
             CAST(sum(CASE WHEN a BETWEEN loa AND hia
                 AND b BETWEEN lob AND hib
               THEN 1 ELSE 0 END) AS BIGINT) AS rows_matching,
             CAST(sum(CASE WHEN a BETWEEN loa AND hia
                 AND b BETWEEN lob AND hib
               THEN payload END) AS BIGINT) AS sum_payload
           FROM wl w CROSS JOIN li GROUP BY 1)
         SELECT s.workload, s.n_parts, s.parts_scanned, s.rows_scanned,
           t.rows_matching, t.sum_payload,
           CAST(s.parts_scanned * 1000000 // s.n_parts AS BIGINT)
             AS scan_ppm
         FROM scans s JOIN truth t USING (workload)
         ORDER BY workload""",
    // q358: host-sorted string-key pruned read — documents laid out
    // sorted by reversed host into 150-row file_id partitions (q351's
    // rank -> partition device); the oracle replays the layout
    // relationally and the string hulls/windows compare bytewise in
    // both engines (DuckDB binary collation == Spark UTF8 order).
    "q358_host_sorted_read" ->
      """WITH d AS (SELECT 'com.example.' || source AS rhost,
             doc_id AS tie, n_chars FROM documents),
         f AS MATERIALIZED (SELECT
             ((row_number() OVER (ORDER BY rhost, tie)) - 1) // 150
               AS part_id,
             rhost, n_chars FROM d),
         z AS (SELECT part_id, CAST(count(*) AS BIGINT) AS n_rows,
             min(rhost) AS mn, max(rhost) AS mx FROM f GROUP BY 1),
         wl(workload, lo, hi) AS (VALUES
           ('host_point', 'com.example.src3', 'com.example.src3'),
           ('host_prefix', 'com.example.src1', 'com.example.src1zzz'),
           ('host_range', 'com.example.src0', 'com.example.src2zzz')),
         scans AS (SELECT w.workload,
             CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(CASE WHEN z.mn <= w.hi AND z.mx >= w.lo
               THEN 1 ELSE 0 END) AS BIGINT) AS parts_scanned,
             CAST(sum(CASE WHEN z.mn <= w.hi AND z.mx >= w.lo
               THEN z.n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
           FROM wl w CROSS JOIN z GROUP BY 1),
         truth AS (SELECT w.workload,
             CAST(sum(CASE WHEN d.rhost BETWEEN w.lo AND w.hi
               THEN 1 ELSE 0 END) AS BIGINT) AS rows_matching,
             CAST(sum(CASE WHEN d.rhost BETWEEN w.lo AND w.hi
               THEN d.n_chars END) AS BIGINT) AS sum_chars
           FROM wl w CROSS JOIN d GROUP BY 1)
         SELECT s.workload, s.n_parts, s.parts_scanned, s.rows_scanned,
           t.rows_matching, t.sum_chars,
           CAST(s.parts_scanned * 1000000 // s.n_parts AS BIGINT)
             AS scan_ppm
         FROM scans s JOIN truth t USING (workload)
         ORDER BY workload""",
    // q360: incremental zone-map maintenance — base build writes the
    // first floor(4/5 * nFiles) rank partitions, the rest append, and
    // ONLY the new files' footers are probed into the manifest. The
    // oracle replays the whole layout relationally; a missed delta
    // file, a double-probed base file, or a phase leak flips
    // rows/hulls.
    "q360_incremental_zonemap" ->
      """WITH li AS (SELECT
             datediff('day', DATE '1992-01-01',
               CAST(l_shipdate AS DATE))::BIGINT AS ship_day,
             l_orderkey * 10 + l_linenumber AS tie
           FROM lineitem),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM li),
         p AS (SELECT (((n + 3999) // 4000) * 4 // 5)::BIGINT
             AS base_files FROM n),
         f AS MATERIALIZED (SELECT
             ((row_number() OVER (ORDER BY ship_day, tie)) - 1) // 4000
               AS part_id,
             ship_day FROM li)
         SELECT f.part_id,
           CASE WHEN f.part_id < p.base_files THEN 'base'
             ELSE 'delta' END AS phase,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(f.ship_day) AS min_day, max(f.ship_day) AS max_day
         FROM f CROSS JOIN p
         GROUP BY 1, 2
         ORDER BY 1""",
  )
}
