package graft.oracle

import OracleCtes._

/** DuckDB oracle SQL — text analysis: lang-id, quality, tokens, TF-IDF/BM25, LM, sketches, corpus economics. One entry per SparkEntry.queries
  * key in this family; strings byte-identical to the pre-split
  * SparkEntry registry (round-9 reviewability split).
  */
private[graft] object TextOracles {

  /** The q225 training rounds (3 MATERIALIZED merge rounds over the
    * word-frequency dict, framed two-space symbol encoding) — shared
    * verbatim by the q225 trainer gate and the q234 encoder gate so
    * the two oracles cannot drift on merge semantics.
    */
  private val bpeRoundsCte: String =
    """w0 AS MATERIALIZED (
           SELECT ' ' || rtrim(regexp_replace(w, '(.)', '\1  ', 'g'))
               || ' ' AS syms,
             count(*) AS n
           FROM (SELECT unnest(string_split(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
             FROM documents)
           GROUP BY 1),
         p1 AS (SELECT a[i] AS s1, a[i+1] AS s2,
             CAST(sum(n) AS BIGINT) AS cnt
           FROM (SELECT string_split(trim(syms), '  ') AS a, n FROM w0) s,
             unnest(generate_series(1, len(a) - 1)) AS u(i)
           GROUP BY 1, 2),
         t1 AS MATERIALIZED (
           SELECT * FROM p1 ORDER BY cnt DESC, s1, s2 LIMIT 1),
         w1 AS MATERIALIZED (
           SELECT replace(syms, ' ' || s1 || '  ' || s2 || ' ',
               ' ' || s1 || s2 || ' ') AS syms, n
           FROM w0 CROSS JOIN t1),
         p2 AS (SELECT a[i] AS s1, a[i+1] AS s2,
             CAST(sum(n) AS BIGINT) AS cnt
           FROM (SELECT string_split(trim(syms), '  ') AS a, n FROM w1) s,
             unnest(generate_series(1, len(a) - 1)) AS u(i)
           GROUP BY 1, 2),
         t2 AS MATERIALIZED (
           SELECT * FROM p2 ORDER BY cnt DESC, s1, s2 LIMIT 1),
         w2 AS MATERIALIZED (
           SELECT replace(syms, ' ' || s1 || '  ' || s2 || ' ',
               ' ' || s1 || s2 || ' ') AS syms, n
           FROM w1 CROSS JOIN t2),
         p3 AS (SELECT a[i] AS s1, a[i+1] AS s2,
             CAST(sum(n) AS BIGINT) AS cnt
           FROM (SELECT string_split(trim(syms), '  ') AS a, n FROM w2) s,
             unnest(generate_series(1, len(a) - 1)) AS u(i)
           GROUP BY 1, 2),
         t3 AS MATERIALIZED (
           SELECT * FROM p3 ORDER BY cnt DESC, s1, s2 LIMIT 1)"""

  /** N-round BPE training chain with `b`-prefixed CTE names (b0, bpR,
    * btR, bR) — same semantics as [[bpeRoundsCte]] (which stays the
    * verbatim 3-round chain for q225/q234), generated so the q318
    * 8-round overlap audit can coexist with the unigram chain in one
    * query without name collisions.
    */
  private def bpeRoundsCteN(rounds: Int): String = {
    val seed = """b0 AS MATERIALIZED (
           SELECT ' ' || rtrim(regexp_replace(w, '(.)', '\1  ', 'g'))
               || ' ' AS syms,
             count(*) AS n
           FROM (SELECT unnest(string_split(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
             FROM documents)
           GROUP BY 1)"""
    val per = (1 to rounds).map { r =>
      s"""bp$r AS (SELECT a[i] AS s1, a[i+1] AS s2,
             CAST(sum(n) AS BIGINT) AS cnt
           FROM (SELECT string_split(trim(syms), '  ') AS a, n FROM b${r - 1}) s,
             unnest(generate_series(1, len(a) - 1)) AS u(i)
           GROUP BY 1, 2),
         bt$r AS MATERIALIZED (
           SELECT * FROM bp$r ORDER BY cnt DESC, s1, s2 LIMIT 1),
         b$r AS MATERIALIZED (
           SELECT replace(syms, ' ' || s1 || '  ' || s2 || ' ',
               ' ' || s1 || s2 || ' ') AS syms, n
           FROM b${r - 1} CROSS JOIN bt$r)"""
    }
    (seed +: per).mkString(",\n         ")
  }

  val sql: Map[String, String] = Map(
    // q277: keyword-in-context — ±2-token windows around each 'merge'
    // occurrence, 1-based positions, first 30 in (doc, pos) order
    // (TextAnalysisOps.kwicOn)
    "q277_kwic" ->
      """WITH toks AS (
           SELECT doc_id, string_split(regexp_replace(lower(trim(
             coalesce(text, ''))), '\s+', ' ', 'g'), ' ') AS w
           FROM documents),
         pos AS (
           SELECT doc_id, CAST(u.s.p AS BIGINT) AS p, len(w) AS n, w
           FROM toks, unnest(list_transform(range(1, len(w) + 1),
             i -> {'tok': w[i], 'p': i})) AS u(s)
           WHERE u.s.tok = 'merge')
         SELECT doc_id, p AS pos,
           array_to_string(w[greatest(p - 2, 1):least(p + 2, n)], ' ')
             AS context
         FROM pos ORDER BY doc_id, pos LIMIT 30""",
    // q288: per-class precision/recall/F1 of the lang-id predictor —
    // tp/fp/fn from the q155 prediction CTE, ppm-exact harmonic F1
    // (TextAnalysisOps.langIdPrfOn)
    "q288_langid_prf" ->
      ("WITH " + langPredCte + """,
         cls AS (SELECT lang AS label FROM p
           UNION SELECT lang_pred FROM p),
         m AS (SELECT label,
             (SELECT CAST(count(*) AS BIGINT) FROM p
              WHERE lang = label AND lang_pred = label) AS tp,
             (SELECT CAST(count(*) AS BIGINT) FROM p
              WHERE lang <> label AND lang_pred = label) AS fp,
             (SELECT CAST(count(*) AS BIGINT) FROM p
              WHERE lang = label AND lang_pred <> label) AS fn
           FROM cls)
         SELECT label, tp, fp, fn,
           CAST(CASE WHEN tp + fp > 0
             THEN CAST(tp AS HUGEINT) * 1000000 // (tp + fp) END
             AS BIGINT) AS precision_ppm,
           CAST(CASE WHEN tp + fn > 0
             THEN CAST(tp AS HUGEINT) * 1000000 // (tp + fn) END
             AS BIGINT) AS recall_ppm,
           CAST(CASE WHEN 2 * tp + fp + fn > 0
             THEN CAST(tp AS HUGEINT) * 2000000 // (2 * tp + fp + fn)
             END AS BIGINT) AS f1_ppm
         FROM m ORDER BY label"""),
    "q38_rolling_fp" ->
      """SELECT count(*) AS n_docs,
           count(DISTINCT f) AS n_md5_classes,
           count(DISTINCT f) AS n_rolling_classes,
           count(DISTINCT f) AS n_joint_classes
         FROM (SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
               FROM documents)""",
    "q34_lang_id" ->
      ("WITH " + langPredCte + """
         SELECT lang_pred, count(*) AS n_docs FROM p
         GROUP BY lang_pred ORDER BY lang_pred"""),
    // q349: Good-Turing ladder — per-source frequency-of-frequencies,
    // unseen mass n1/N in ppm, Turing-discounted r* in milli
    "q349_good_turing" ->
      """WITH t AS (SELECT source, unnest(string_split(regexp_replace(
             lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
           FROM documents),
         c AS (SELECT source, tok, count(*) AS n_occ FROM t
           GROUP BY 1, 2),
         g AS (SELECT source, CAST(sum(n_occ) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_vocab,
             CAST(sum(CASE WHEN n_occ = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(sum(CASE WHEN n_occ = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2,
             CAST(sum(CASE WHEN n_occ = 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n3,
             CAST(sum(CASE WHEN n_occ = 4 THEN 1 ELSE 0 END) AS BIGINT)
               AS n4
           FROM c GROUP BY 1)
         SELECT source, n_tokens, n_vocab, n1, n2, n3,
           CAST(n1 * 1000000 // n_tokens AS BIGINT) AS p0_ppm,
           CASE WHEN n1 > 0 THEN CAST(2 * n2 * 1000 // n1 AS BIGINT)
             ELSE 0 END AS rstar1_milli,
           CASE WHEN n2 > 0 THEN CAST(3 * n3 * 1000 // n2 AS BIGINT)
             ELSE 0 END AS rstar2_milli,
           CASE WHEN n3 > 0 THEN CAST(4 * n4 * 1000 // n3 AS BIGINT)
             ELSE 0 END AS rstar3_milli
         FROM g ORDER BY source""",
    // q347: Dawid-Skene-lite label model — three integer weak voters
    // from one tokenize pass, 3 unrolled EM rounds on the ppm grid
    // (accuracies clamped to [1, 999999]; likelihood products <= 1e18)
    "q347_label_model" -> {
      val rounds = 3
      def round(r: Int) = {
        def accOf(v: String) =
          s"""greatest(least(CAST(sum(CASE WHEN $v = 1 THEN post
               ELSE 1000000 - post END) // count(*) AS BIGINT),
             999999), 1)"""
        s"""a$r AS MATERIALIZED (SELECT ${accOf("v1")} AS a1,
             ${accOf("v2")} AS a2, ${accOf("v3")} AS a3
           FROM p${r - 1}),
         p$r AS MATERIALIZED (SELECT doc_id, v1, v2, v3,
             CAST(CAST(n1 AS HUGEINT) * 1000000 // (n1 + n0)
               AS BIGINT) AS post
           FROM (SELECT p.doc_id, p.v1, p.v2, p.v3,
               (CASE WHEN p.v1 = 1 THEN a.a1 ELSE 1000000 - a.a1 END)
               * (CASE WHEN p.v2 = 1 THEN a.a2 ELSE 1000000 - a.a2 END)
               * (CASE WHEN p.v3 = 1 THEN a.a3 ELSE 1000000 - a.a3 END)
                 AS n1,
               (CASE WHEN p.v1 = 1 THEN 1000000 - a.a1 ELSE a.a1 END)
               * (CASE WHEN p.v2 = 1 THEN 1000000 - a.a2 ELSE a.a2 END)
               * (CASE WHEN p.v3 = 1 THEN 1000000 - a.a3 ELSE a.a3 END)
                 AS n0
             FROM p${r - 1} p, a$r a))"""
      }
      def tr(r: Int) =
        s"""SELECT $r AS round, 'len_band' AS labeler,
             (SELECT a1 FROM a$r) AS acc_ppm, np$r.n_pos
           FROM np$r
           UNION ALL SELECT $r, 'diversity', (SELECT a2 FROM a$r),
             np$r.n_pos FROM np$r
           UNION ALL SELECT $r, 'stopword', (SELECT a3 FROM a$r),
             np$r.n_pos FROM np$r"""
      def np(r: Int) =
        s"""np$r AS (SELECT CAST(count(*) FILTER (post >= 500000)
             AS BIGINT) AS n_pos FROM p$r)"""
      s"""WITH t AS (SELECT doc_id, string_split(
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
             AS toks
           FROM documents),
         m AS (SELECT doc_id, len(toks) AS n_tok,
             len(list_distinct(toks)) AS n_distinct,
             len(list_filter(toks, x -> x IN ('the','a','an','of','to',
               'in','and','is','it','that'))) AS n_stop
           FROM t),
         v AS MATERIALIZED (SELECT doc_id,
             CASE WHEN n_tok BETWEEN 20 AND 1000 THEN 1 ELSE 0 END
               AS v1,
             CASE WHEN n_distinct * 3000 // n_tok >= 2400 THEN 1 ELSE 0
               END AS v2,
             CASE WHEN n_stop * 100 >= n_tok AND n_stop * 10 <= n_tok * 6
               THEN 1 ELSE 0 END AS v3
           FROM m),
         p0 AS (SELECT doc_id, v1, v2, v3,
             CAST((v1 + v2 + v3) * 1000000 // 3 AS BIGINT) AS post
           FROM v),
         ${(1 to rounds).map(round).mkString(",\n         ")},
         ${(1 to rounds).map(np).mkString(",\n         ")}
         ${(1 to rounds).map(tr).mkString(" UNION ALL ")}
         ORDER BY round, labeler"""
    },
    "q35_quality_score" ->
      ("WITH " + qualityDocCte + """
         SELECT doc_id, n_tokens, quality FROM qdoc ORDER BY doc_id"""),
    "q36_token_stats" ->
      """SELECT source,
         CAST(sum(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))) AS BIGINT) AS total_ws_tokens,
         CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_bpe_tokens,
         count(*) AS n_docs
         FROM documents GROUP BY source ORDER BY source""",
    "q37_fingerprints" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
         FROM documents ORDER BY doc_id""",
    "q51_top_ngrams" ->
      """WITH d0 AS (SELECT lang, string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
           FROM documents),
         sh AS (SELECT lang, unnest(list_distinct([w[i] || ' ' || w[i+1]
             for i in range(1, greatest(len(w), 1))])) AS bigram
           FROM d0 WHERE len(w) >= 2),
         c AS (SELECT lang, bigram, count(*) AS n FROM sh GROUP BY 1, 2)
         SELECT lang, bigram, n, rk FROM (
           SELECT lang, bigram, n,
             CAST(row_number() OVER (PARTITION BY lang
                  ORDER BY n DESC, bigram) AS INT) AS rk
           FROM c)
         WHERE rk <= 5 ORDER BY lang, rk""",
    "q62_repetition" ->
      """WITH d0 AS (
           SELECT doc_id, string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
           FROM documents),
         sh AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
             for i in range(1, greatest(len(w), 1))]) AS bigram
           FROM d0 WHERE len(w) >= 2)
         SELECT doc_id, count(*) AS n_bigrams,
           count(DISTINCT bigram) AS n_distinct,
           round(1.0 - count(DISTINCT bigram) * 1.0 / count(*), 4) AS rep_ratio
         FROM sh GROUP BY doc_id ORDER BY doc_id""",
    "q63_word_length" ->
      """SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(length(tok)) AS BIGINT) AS n_chars,
           round(sum(length(tok)) * 1.0 / count(*), 4) AS mean_len,
           CAST(CASE WHEN round(sum(length(tok)) * 1.0 / count(*), 4) < 3.0
                       OR round(sum(length(tok)) * 1.0 / count(*), 4) > 10.0
                     THEN 1 ELSE 0 END AS INT) AS flagged
         FROM (SELECT doc_id, unnest(string_split(
                 regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
               FROM documents)
         GROUP BY doc_id ORDER BY doc_id""",
    "q67_token_entropy" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
           FROM documents),
         c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
         n AS (SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM c)
         SELECT doc_id, CAST(max(n) AS INT) AS n_tokens,
           round(-sum((c * 1.0 / n) * log2(c * 1.0 / n)) + 0.0, 4) AS entropy_bits
         FROM n GROUP BY doc_id ORDER BY doc_id""",
    // q78: Misra-Gries heavy hitters — the emitted cells are EXACT
    // recounts of the sketch's candidate set (estimates are merge-order
    // dependent and never emitted), and at capacity 64 ≥ the corpus's 31
    // distinct tokens the candidate set provably contains every token, so
    // the oracle is the true top-k with the bound verdict pinned at 1.
    // The approximation regime (capacity ≪ distinct) is spec-gated
    // adversarially — this vocabulary cannot exhibit it
    "q78_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
           FROM documents)
         SELECT tok, count(*) AS n, CAST(1 AS INT) AS within_bound
         FROM t GROUP BY tok ORDER BY n DESC, tok LIMIT 10""",
    // q83: hashed-linear classifier scoring — the md5 feature hash and
    // the instr() hex decode are identical in both engines, and the
    // dyadic weights make every per-doc sum exact (order-independent by
    // construction), so the logit is cell-exact with rounding only at
    // the final 6dp
    "q83_quality_classifier" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
           FROM documents),
         w AS (SELECT doc_id,
                 ((instr('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 256
                  + (instr('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 16
                  + (instr('0123456789abcdef', substr(md5(tok), 3, 1)) - 1)
                  - 2048) / 4096.0 AS wt
               FROM t)
         SELECT doc_id, count(*) AS n_tokens,
           round(sum(wt) / count(*), 6) AS logit,
           CAST(CASE WHEN round(sum(wt) / count(*), 6) > 0
             THEN 1 ELSE 0 END AS INT) AS label
         FROM w GROUP BY doc_id ORDER BY doc_id""",
    // q71: Gopher word-statistics rules — thresholds compared on the
    // rounded values, exactly as the Spark side computes them
    "q71_gopher_rules" ->
      """SELECT doc_id, count(*) AS n_words,
           round(sum(length(tok)) * 1.0 / count(*), 4) AS mean_word_len,
           CAST(sum(CASE WHEN tok IN
             ('the','be','to','of','and','that','have','with')
             THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits,
           round(sum(CASE WHEN regexp_matches(tok, '[a-z]')
             THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS alpha_frac,
           CAST(CASE WHEN count(*) BETWEEN 50 AND 100000
             AND round(sum(length(tok)) * 1.0 / count(*), 4)
                 BETWEEN 3.0 AND 10.0
             AND sum(CASE WHEN tok IN
               ('the','be','to','of','and','that','have','with')
               THEN 1 ELSE 0 END) >= 2
             AND round(sum(CASE WHEN regexp_matches(tok, '[a-z]')
               THEN 1 ELSE 0 END) * 1.0 / count(*), 4) >= 0.8
             THEN 1 ELSE 0 END AS INT) AS passes
         FROM (SELECT doc_id, unnest(string_split(
                 regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
               FROM documents)
         GROUP BY doc_id ORDER BY doc_id""",
    // q73: add-one-smoothed corpus bigram LM, per-doc cross-entropy.
    // Bigrams carried as "w1 w2" strings (tokens cannot contain spaces);
    // prefix counts come from the same bigram rows grouped on w1
    "q73_lm_perplexity" ->
      """WITH d0 AS (
           SELECT doc_id, string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
           FROM documents),
         bg AS (
           SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
             for i in range(1, greatest(len(w), 1))]) AS b
           FROM d0 WHERE len(w) >= 2),
         bgc AS (SELECT b, count(*) AS c12 FROM bg GROUP BY 1),
         pfx AS (SELECT split_part(b, ' ', 1) AS w1, count(*) AS c1
                 FROM bg GROUP BY 1),
         v AS (SELECT count(DISTINCT tok) AS v
               FROM (SELECT unnest(w) AS tok FROM d0))
         SELECT doc_id, count(*) AS n_bigrams,
           round(-sum(log2((c12 + 1) * 1.0 / (c1 + v.v))) / count(*), 4)
             AS cross_entropy_bits
         FROM bg JOIN bgc USING (b)
           JOIN pfx ON split_part(bg.b, ' ', 1) = pfx.w1
           CROSS JOIN v
         GROUP BY doc_id ORDER BY doc_id""",
    // q90: Count-Min sketch — cells are order-independent integer sums
    // and the md5 bucket decode is the q83 instr pattern, so the sketch
    // the typed Aggregator builds is replayed relationally cell-exact:
    // RAW estimates hash-gate (deterministic, unlike Misra-Gries q78)
    "q90_cms_profile" ->
      """WITH t AS (SELECT unnest(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
           FROM documents),
         tc AS (SELECT tok, count(*) AS n FROM t GROUP BY 1),
         b AS (SELECT tok, n, i.range AS i,
                 ((instr('0123456789abcdef',
                     substr(md5(tok || '_' || i.range), 1, 1)) - 1) * 256
                  + (instr('0123456789abcdef',
                      substr(md5(tok || '_' || i.range), 2, 1)) - 1) * 16
                  + (instr('0123456789abcdef',
                      substr(md5(tok || '_' || i.range), 3, 1)) - 1)) % 64
                   AS bkt
               FROM tc, range(0, 4) i),
         cells AS (SELECT i, bkt, CAST(sum(n) AS BIGINT) AS cnt
                   FROM b GROUP BY 1, 2),
         est AS (SELECT b.tok, min(c.cnt) AS est
                 FROM b JOIN cells c ON b.i = c.i AND b.bkt = c.bkt
                 GROUP BY 1)
         SELECT tok, n, est, CAST(est >= n AS INT) AS overest_ok
         FROM tc JOIN est USING (tok)
         ORDER BY n DESC, tok LIMIT 10""",
    // q98: one BPE merge step — adjacent char-pair counts over every
    // word occurrence; pure integer counts and a TOTAL (n DESC, pair)
    // order, so LIMIT k is deterministic on both engines
    "q98_bpe_merge" ->
      """WITH w AS (SELECT unnest(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
           FROM documents),
         p AS (SELECT substr(w, CAST(unnest(range(1, len(w))) AS INT), 2)
                 AS pair
               FROM w WHERE len(w) >= 2)
         SELECT pair, count(*) AS n FROM p
         GROUP BY 1 ORDER BY n DESC, pair LIMIT 10""",
    // q99: per-doc TF-IDF keywords — idf = ln(N/df) rounds 6dp at its
    // stage boundary, then ONE multiply by the integer tf (no sum
    // anywhere); rank over (score DESC, tok) is total within a doc
    "q99_tfidf_terms" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
           FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
         dfc AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         st AS (SELECT count(*) AS n_docs FROM documents)
         SELECT doc_id, tok, score, rk FROM (
           SELECT tf.doc_id, tf.tok,
             round(CAST(tf.tf AS DOUBLE) *
               round(ln(CAST(st.n_docs AS DOUBLE) /
                 CAST(dfc.df AS DOUBLE)), 6), 6) AS score,
             CAST(row_number() OVER (PARTITION BY tf.doc_id ORDER BY
               round(CAST(tf.tf AS DOUBLE) *
                 round(ln(CAST(st.n_docs AS DOUBLE) /
                   CAST(dfc.df AS DOUBLE)), 6), 6) DESC,
               tf.tok) AS INT) AS rk
           FROM tf JOIN dfc USING (tok) CROSS JOIN st
           WHERE tf.doc_id < 20)
         WHERE rk <= 3 ORDER BY doc_id, rk""",
    // q116: top-1000 vocab (cnt desc, tok asc — total order at the V-th
    // slot), per-source OOV profile; single division then 6dp round
    "q116_vocab_coverage" ->
      """WITH tk AS (SELECT source,
             unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
               ' ')) AS tok
           FROM documents),
         v AS (SELECT tok, 1 AS in_v FROM (
             SELECT tok, count(*) AS cnt FROM tk GROUP BY 1
             ORDER BY cnt DESC, tok LIMIT 1000))
         SELECT source,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.in_v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           round(CAST(sum(CASE WHEN v.in_v IS NULL THEN 1 ELSE 0 END) AS DOUBLE) /
             CAST(count(*) AS DOUBLE), 6) AS oov_rate
         FROM tk LEFT JOIN v ON tk.tok = v.tok
         GROUP BY source ORDER BY source""",
    // q123: per-source decile of the q35 quality score — integer-exact
    // bucket arithmetic ((rk-1)*10 // n); min/max are order-independent
    "q123_score_deciles" ->
      ("WITH " + qualityDocCte + """,
         j AS (SELECT q.doc_id, q.quality, d.source
           FROM qdoc q JOIN documents d ON q.doc_id = d.doc_id),
         r AS (SELECT source, quality, doc_id,
             row_number() OVER (PARTITION BY source
               ORDER BY quality, doc_id) AS rk,
             count(*) OVER (PARTITION BY source) AS n
           FROM j)
         SELECT source, CAST((rk - 1) * 10 // n AS INT) AS decile,
           count(*) AS n_docs, min(quality) AS min_q, max(quality) AS max_q
         FROM r GROUP BY 1, 2 ORDER BY source, decile"""),
    // q127: Heaps-law growth — first-occurrence doc of each distinct
    // 8-gram per source, bucketed by integer-exact ingest quartile
    "q127_vocab_growth" ->
      """WITH t AS (SELECT source, doc_id,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
               ' ') AS toks
           FROM documents),
         raw AS (SELECT source, doc_id,
             md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS h
           FROM t, unnest(generate_series(1, len(toks) - 7, 1)) AS u(i)),
         fo AS (SELECT source, h, min(doc_id) AS first_doc
           FROM raw GROUP BY 1, 2),
         r AS (SELECT source, doc_id AS first_doc,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk,
             count(*) OVER (PARTITION BY source) AS nd
           FROM documents),
         g AS (SELECT fo.source,
             CAST((r.rk - 1) * 4 // r.nd AS INT) AS quartile,
             count(*) AS n_new
           FROM fo JOIN r ON fo.source = r.source
             AND fo.first_doc = r.first_doc
           GROUP BY 1, 2)
         SELECT source, quartile, n_new,
           CAST(sum(n_new) OVER (PARTITION BY source ORDER BY quartile
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_distinct
         FROM g ORDER BY source, quartile""",
    // q129: integer-exact log2 length bands — length(bin(x)) - 1, no
    // float log at the power-of-two boundary
    "q129_length_hist" ->
      """SELECT lang, CAST(length(bin(n_chars)) - 1 AS INT) AS log2_bucket,
           count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
         FROM documents GROUP BY 1, 2 ORDER BY lang, log2_bucket""",
    // q139: Kneser-Ney d=0.75 — integer counts, ONE fixed float
    // expression tree per row (mirrored exactly on the Spark side)
    "q139_kn_bigram" ->
      """WITH t AS (SELECT
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
               ' ') AS toks
           FROM documents),
         raw AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
           FROM t, unnest(generate_series(1, len(toks) - 1, 1)) AS u(i)),
         c12 AS (SELECT w1, w2, count(*) AS c12 FROM raw GROUP BY 1, 2),
         c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
             count(*) AS nfw FROM c12 GROUP BY 1),
         nb AS (SELECT w2, count(*) AS nbw FROM c12 GROUP BY 1),
         nt AS (SELECT count(*) AS ntot FROM c12)
         SELECT w1, w2, c12,
           round((greatest(c12::DOUBLE - 0.75, 0.0) / c1::DOUBLE) +
             ((0.75 * nfw::DOUBLE) / c1::DOUBLE) *
             (nbw::DOUBLE / ntot::DOUBLE), 6) AS pkn
         FROM c12 JOIN c1 USING (w1) JOIN nb USING (w2) CROSS JOIN nt
         ORDER BY c12 DESC, w1, w2 LIMIT 20""",
    // q142: smallest |logit| — margin sampling over the q83 classifier;
    // abs of an already-rounded value, total (margin, doc_id) order
    "q142_uncertainty" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
           FROM documents),
         w AS (SELECT doc_id,
                 ((instr('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 256
                  + (instr('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 16
                  + (instr('0123456789abcdef', substr(md5(tok), 3, 1)) - 1)
                  - 2048) / 4096.0 AS wt
               FROM t),
         lg AS (SELECT doc_id, round(sum(wt) / count(*), 6) + 0.0 AS logit
           FROM w GROUP BY doc_id)
         SELECT doc_id, logit, abs(logit) AS margin
         FROM lg ORDER BY margin, doc_id LIMIT 25""",
    // q155: declared × predicted language confusion — same prediction
    // chain as q34 (shared CTE)
    "q155_lang_confusion" ->
      ("WITH " + langPredCte + """
         SELECT lang, lang_pred, count(*) AS n_docs FROM p
         GROUP BY lang, lang_pred ORDER BY lang, lang_pred"""),
    // q156: replacement-char / control-byte / non-ASCII scan; integer
    // counts, one division per source
    "q156_encoding_scan" ->
      """WITH m AS (SELECT source, length(text) AS n_chars_t,
             length(text) - length(regexp_replace(text, '[^\x00-\x7F]',
               '', 'g')) AS n_nonascii,
             CASE WHEN contains(text, chr(65533)) THEN 1 ELSE 0 END
               AS has_repl,
             CASE WHEN regexp_matches(text, '[\x00-\x08\x0e-\x1f]')
               THEN 1 ELSE 0 END AS has_ctrl
           FROM documents)
         SELECT source, count(*) AS n_docs,
           CAST(sum(has_repl) AS BIGINT) AS n_repl_docs,
           CAST(sum(has_ctrl) AS BIGINT) AS n_ctrl_docs,
           CAST(sum(n_nonascii) AS BIGINT) AS n_nonascii_chars,
           round(1.0 - CAST(sum(n_nonascii) AS DOUBLE) /
             CAST(sum(n_chars_t) AS DOUBLE), 6) AS ascii_ratio
         FROM m GROUP BY 1 ORDER BY 1""",
    // q157: top-V-vocabulary collocation PMI — integer products inside
    // ONE division then ln + 6dp round (the q107 contract)
    "q157_collocations" ->
      """WITH pres AS (SELECT DISTINCT doc_id, tok FROM (
             SELECT doc_id, unnest(string_split(regexp_replace(
               lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
             FROM documents)),
         vocab AS (SELECT tok, count(*) AS df FROM pres GROUP BY 1
           ORDER BY df DESC, tok LIMIT 200),
         nd AS (SELECT count(*) AS n_corpus FROM documents),
         iv AS (SELECT p.doc_id, p.tok, v.df FROM pres p
           JOIN vocab v USING (tok)),
         pairs AS (SELECT a.tok AS ta, b.tok AS tb, a.df AS df_a,
             b.df AS df_b, count(*) AS n_ab
           FROM iv a JOIN iv b ON a.doc_id = b.doc_id AND a.tok < b.tok
           GROUP BY 1, 2, 3, 4 HAVING count(*) >= 5)
         SELECT ta, tb, n_ab,
           round(ln(CAST(n_ab * n_corpus AS DOUBLE) /
             CAST(df_a * df_b AS DOUBLE)), 6) AS pmi
         FROM pairs, nd ORDER BY pmi DESC, ta, tb LIMIT 25""",
    // q162: TTR bands — integer band rule min(9, 10·d/t), micro-avg
    // ratio from exact integer sums
    "q162_ttr_bands" ->
      """WITH t AS (SELECT string_split(regexp_replace(lower(trim(text)),
             '\s+', ' ', 'g'), ' ') AS toks FROM documents),
         c AS (SELECT CAST(len(toks) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
           FROM t),
         b AS (SELECT least(9, (n_distinct * 10) // n_tok) AS ttr_band,
             n_tok, n_distinct FROM c)
         SELECT ttr_band, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
           CAST(sum(n_distinct) AS BIGINT) AS sum_distinct,
           round(CAST(sum(n_distinct) AS DOUBLE) /
             CAST(sum(n_tok) AS DOUBLE), 4) AS micro_ttr
         FROM b GROUP BY ttr_band ORDER BY ttr_band""",
    // q163: Flesch-style reading ease per source — integer corpus sums,
    // one mirrored float expression tree
    "q163_readability" ->
      """WITH m AS (SELECT source,
             CAST(len(string_split(regexp_replace(lower(trim(text)),
               '\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_words,
             greatest(CAST(1 AS BIGINT),
               CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
               AS n_sents,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS BIGINT) AS n_syll
           FROM documents)
         SELECT source, count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS sum_words,
           CAST(sum(n_sents) AS BIGINT) AS sum_sents,
           CAST(sum(n_syll) AS BIGINT) AS sum_syll,
           round(206.835 -
             1.015 * (CAST(sum(n_words) AS DOUBLE) /
               CAST(sum(n_sents) AS DOUBLE)) -
             84.6 * (CAST(sum(n_syll) AS DOUBLE) /
               CAST(sum(n_words) AS DOUBLE)), 4) AS reading_ease
         FROM m GROUP BY source ORDER BY source""",
    // q164: casing profile — integer letter/upper masses, SHOUTING via
    // the integer rule 10·upper > 3·letters
    "q164_case_profile" ->
      """WITH m AS (SELECT source,
             CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
               AS BIGINT) AS n_letters,
             CAST(length(regexp_replace(text, '[^A-Z]', '', 'g'))
               AS BIGINT) AS n_upper
           FROM documents)
         SELECT source, count(*) AS n_docs,
           CAST(sum(n_letters) AS BIGINT) AS n_letters,
           CAST(sum(n_upper) AS BIGINT) AS n_upper,
           CAST(sum(CASE WHEN n_upper * 10 > n_letters * 3 THEN 1
             ELSE 0 END) AS BIGINT) AS n_shouting_docs,
           CAST(sum(CASE WHEN n_upper = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nocase_docs,
           round(CAST(sum(n_upper) AS DOUBLE) /
             CAST(sum(n_letters) AS DOUBLE), 6) AS upper_ratio
         FROM m GROUP BY source ORDER BY source""",
    // q165: hapax-legomena rate per source — (source, token) counts
    // then a two-integer rollup
    "q165_hapax_rate" ->
      """WITH t AS (SELECT source, unnest(string_split(regexp_replace(
             lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
           FROM documents),
         c AS (SELECT source, tok, count(*) AS n_occ FROM t GROUP BY 1, 2)
         SELECT source, count(*) AS n_vocab,
           CAST(sum(CASE WHEN n_occ = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           round(CAST(sum(CASE WHEN n_occ = 1 THEN 1 ELSE 0 END)
             AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS hapax_rate
         FROM c GROUP BY source ORDER BY source""",
    // q182: OOV rate per vocab budget — rank over the vocabulary frame,
    // all budgets in one aggregate, UNION-ALL unpivot
    "q182_vocab_budget" ->
      """WITH t AS (SELECT unnest(string_split(regexp_replace(
             lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
           FROM documents),
         tc AS (SELECT tok, count(*) AS cnt FROM t GROUP BY 1),
         r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok)
             AS rk FROM tc),
         a AS (SELECT count(*) AS n_vocab,
             CAST(sum(cnt) AS BIGINT) AS total_occ,
             CAST(sum(CASE WHEN rk <= 100 THEN cnt ELSE 0 END) AS BIGINT)
               AS c100,
             CAST(sum(CASE WHEN rk <= 500 THEN cnt ELSE 0 END) AS BIGINT)
               AS c500,
             CAST(sum(CASE WHEN rk <= 2000 THEN cnt ELSE 0 END) AS BIGINT)
               AS c2000
           FROM r)
         SELECT 100 AS vocab_budget, n_vocab, total_occ,
           c100 AS covered_occ, round(1.0 - CAST(c100 AS DOUBLE) /
             CAST(total_occ AS DOUBLE), 6) AS oov_rate FROM a
         UNION ALL
         SELECT 500, n_vocab, total_occ, c500,
           round(1.0 - CAST(c500 AS DOUBLE) /
             CAST(total_occ AS DOUBLE), 6) FROM a
         UNION ALL
         SELECT 2000, n_vocab, total_occ, c2000,
           round(1.0 - CAST(c2000 AS DOUBLE) /
             CAST(total_occ AS DOUBLE), 6) FROM a
         ORDER BY vocab_budget""",
    // q183: per-source unique-3-gram fraction — DISTINCT (source, gram)
    // postings, gram-keyed source counts, |sources| rollup
    "q183_source_novelty" ->
      """WITH d0 AS (SELECT source, string_split(regexp_replace(
             lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
           FROM documents),
         sg AS (SELECT DISTINCT source,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
           FROM d0, unnest(generate_series(1, len(w) - 2, 1)) AS u(i)
           WHERE len(w) >= 3),
         gs AS (SELECT g, count(*) AS n_sources FROM sg GROUP BY 1)
         SELECT source, count(*) AS n_grams,
           CAST(sum(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           round(CAST(sum(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END)
             AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS novelty
         FROM sg JOIN gs USING (g) GROUP BY source ORDER BY source""",
    // q192: best-vs-second language score margin bands over the shared
    // q34/q155 prediction chain
    "q192_langid_margin" ->
      ("WITH " + langPredCte + """,
         m AS (SELECT p.lang_pred,
             CASE WHEN greatest(s.s_en, s.s_es, s.s_fr, s.s_de, s.s_zh)
                 <= 0 THEN 0
               ELSE least(4,
                 greatest(s.s_en, s.s_es, s.s_fr, s.s_de, s.s_zh) -
                 list_sort([s.s_en, s.s_es, s.s_fr, s.s_de, s.s_zh])[4])
               END AS margin_band
           FROM s JOIN p USING (doc_id))
         SELECT lang_pred, CAST(margin_band AS BIGINT) AS margin_band,
           count(*) AS n_docs
         FROM m GROUP BY 1, 2 ORDER BY 1, 2"""),
    // q195: quality bands × declared language with token mass — the
    // per-language threshold calibration matrix (q137's band rule)
    "q195_quality_by_lang" ->
      ("WITH " + qualityDocCte + """,
         j AS (SELECT d.lang,
             (CAST(round(q.quality * 10000) AS BIGINT) * 4) // 10000
               AS quality_band,
             CAST(q.n_tokens AS BIGINT) AS n_tok
           FROM qdoc q JOIN documents d ON q.doc_id = d.doc_id)
         SELECT lang, quality_band, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
         FROM j GROUP BY 1, 2 ORDER BY 1, 2"""),
    // q208: code-syntax character density on the raw text, banded on
    // the q137 integer grid ((codey*10000) div nc div 50, capped 4)
    "q208_code_detect" ->
      """WITH d AS (SELECT source,
             length(regexp_replace(text, '[^;{}()=<>\[\]]', '', 'g'))
               AS codey,
             length(text) AS nc
           FROM documents WHERE length(text) > 0)
         SELECT source,
           least(4, (codey * 10000) // nc // 50) AS band,
           count(*) AS n_docs,
           CAST(sum(codey) AS BIGINT) AS n_codey,
           round(CAST(sum(codey) AS DOUBLE) / sum(nc), 6) AS codey_rate
         FROM d GROUP BY 1, 2 ORDER BY 1, 2""",
    // q211: df drift between even/odd corpus halves — integer ratio
    // (df_b*1e6) div df_a, both-halves df >= 5 floor, total tie order
    "q211_idf_drift" ->
      """WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')))
             AS tok
           FROM documents),
         d AS (SELECT tok,
             CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS df_a,
             CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END)
               AS BIGINT) AS df_b
           FROM t GROUP BY tok
           HAVING df_a >= 5 AND df_b >= 5)
         SELECT tok, df_a, df_b, (df_b * 1000000) // df_a AS ratio_e6
         FROM d ORDER BY ratio_e6 DESC, tok LIMIT 10""",
    // q221: per-source bigram distribution entropy — integer counts,
    // the q67/q200 sum-then-round contract with the +0.0 guard
    "q221_bigram_entropy" ->
      """WITH d0 AS (
           SELECT source, string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
           FROM documents),
         bg AS (SELECT source, unnest([w[i] || ' ' || w[i+1]
             for i in range(1, greatest(len(w), 1))]) AS b
           FROM d0 WHERE len(w) >= 2),
         c AS (SELECT source, b, count(*) AS c FROM bg GROUP BY 1, 2),
         t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
               FROM c GROUP BY 1)
         SELECT source, max(n) AS n_bigrams, count(*) AS n_distinct,
           round(-sum((c * 1.0 / n) * log2(c * 1.0 / n)) + 0.0, 4)
             AS entropy_bits
         FROM c JOIN t USING (source)
         GROUP BY source ORDER BY source""",
    // q225: iterated BPE trainer — 3 MATERIALIZED merge rounds over the
    // word-frequency dict (the q173 fixed-iteration replay rule).
    // Symbols ride the framed two-space encoding so replace() merges
    // whole adjacent symbols only; replace is left-to-right
    // non-overlapping in both engines, so the rounds are semantics-
    // identical. Argmax order (cnt DESC, s1, s2) is total.
    "q225_bpe_train" ->
      ("WITH " + bpeRoundsCte + """
         SELECT 1 AS merge_rank, s1, s2, cnt AS n_merge FROM t1
         UNION ALL SELECT 2, s1, s2, cnt FROM t2
         UNION ALL SELECT 3, s1, s2, cnt FROM t3
         ORDER BY merge_rank"""),
    // q234: BPE encoder — replay the q225 training rounds, then apply
    // the three learned rules IN ORDER to every word occurrence (the
    // same framed-encoding replace), rolling up per-source subword
    // stats; compression is an exact integer floor
    "q234_bpe_encode" ->
      ("WITH " + bpeRoundsCte + """,
         tok AS (SELECT source, w FROM (
             SELECT source, unnest(string_split(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
               AS w
             FROM documents)
           WHERE len(w) > 0),
         enc AS (SELECT source, w,
             replace(replace(replace(
               ' ' || rtrim(regexp_replace(w, '(.)', '\1  ', 'g')) || ' ',
               ' ' || t1.s1 || '  ' || t1.s2 || ' ',
               ' ' || t1.s1 || t1.s2 || ' '),
               ' ' || t2.s1 || '  ' || t2.s2 || ' ',
               ' ' || t2.s1 || t2.s2 || ' '),
               ' ' || t3.s1 || '  ' || t3.s2 || ' ',
               ' ' || t3.s1 || t3.s2 || ' ') AS syms
           FROM tok CROSS JOIN t1 CROSS JOIN t2 CROSS JOIN t3)
         SELECT source, count(*) AS n_words,
           CAST(sum(len(w)) AS BIGINT) AS n_chars,
           CAST(sum(len(string_split(trim(syms), '  '))) AS BIGINT)
             AS n_subwords,
           CAST((CAST(sum(len(w)) AS BIGINT) * 1000) //
             CAST(sum(len(string_split(trim(syms), '  '))) AS BIGINT)
             AS BIGINT) AS compression_milli
         FROM enc GROUP BY 1 ORDER BY 1"""),
    // q243: per-source two-sample KS drift vs rest-of-corpus — exact
    // BIGINT cross-multiplied ECDF numerator, one display division,
    // argmax location tie-broken on min x
    ("q243_ks_drift" ->
      """WITH counts AS (
           SELECT n_chars AS x, source, count(*) AS c
           FROM documents GROUP BY 1, 2),
         dom AS (SELECT x, CAST(sum(c) AS BIGINT) AS c_tot
                 FROM counts GROUP BY 1),
         srcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s
                  FROM counts GROUP BY 1),
         grid AS (
           SELECT s.source, s.n_s, d.x, d.c_tot,
             CAST(coalesce(c.c, 0) AS BIGINT) AS c_s
           FROM srcs s CROSS JOIN dom d
           LEFT JOIN counts c ON c.source = s.source AND c.x = d.x),
         tot AS (SELECT CAST(sum(c_tot) AS BIGINT) AS n FROM dom),
         cum AS (
           SELECT source, n_s, x,
             CAST(sum(c_s) OVER (PARTITION BY source ORDER BY x)
               AS BIGINT) AS f_s,
             CAST(sum(c_tot) OVER (PARTITION BY source ORDER BY x)
               AS BIGINT) AS f_t
           FROM grid),
         scored AS (
           SELECT source, n_s, x, n,
             abs(CAST(f_s AS HUGEINT) * (n - n_s)
               - CAST(f_t - f_s AS HUGEINT) * n_s) AS num
           FROM cum CROSS JOIN tot)
         SELECT source, n_s AS n_docs, CAST(num AS BIGINT) AS ks_num,
           CAST(num AS DOUBLE)
             / (CAST(n_s AS DOUBLE) * CAST(n - n_s AS DOUBLE)) AS ks,
           x AS at_x
         FROM (SELECT *, row_number() OVER (PARTITION BY source
                 ORDER BY num DESC, x) AS rk FROM scored)
         WHERE rk = 1 ORDER BY source"""),
    // q252: Pareto frontier over (n_chars, quality) — the relational
    // NOT-EXISTS domination form; the Spark side computes it as
    // distributive per-source frontiers + a merge pass (never O(n²))
    "q252_quality_skyline" ->
      ("WITH " + qualityDocCte + """,
         j AS (SELECT q.doc_id, d.source, d.n_chars,
                 CAST(round(q.quality * 10000, 0) AS BIGINT) AS quality_m
               FROM qdoc q JOIN documents d ON q.doc_id = d.doc_id)
         SELECT doc_id, source, n_chars, quality_m FROM j p
         WHERE NOT EXISTS (SELECT 1 FROM j o
           WHERE o.n_chars >= p.n_chars AND o.quality_m >= p.quality_m
             AND (o.n_chars > p.n_chars OR o.quality_m > p.quality_m))
         ORDER BY n_chars DESC, doc_id"""),
    // q307: unigram-LM hard-EM count step — seed substring likelihoods
    // on the ppm grid, 12 MATERIALIZED MaxMatch decode rounds (longest
    // candidate first, p0 then piece as tie-breaks — mirroring Spark's
    // max(struct(l, p0_ppm, piece))), then the M-step re-estimate.
    // Integer throughout; HUGEINT for the cross-multiplied ppm.
    "q307_unigram_lm" -> ("WITH " + unigramCoreCtes + """,
         picks AS (""" +
      (1 to 12).map(r => s"SELECT piece, n FROM s$r")
        .mkString(" UNION ALL ") + """),
         counts AS MATERIALIZED (SELECT piece, CAST(sum(n) AS BIGINT) AS cnt
           FROM picks GROUP BY piece)
         SELECT c.piece, cnt, ca.p0_ppm,
           CAST(cnt::HUGEINT * 1000000 // tot1 AS BIGINT) AS p1_ppm
         FROM counts c
         JOIN cands ca ON ca.piece = c.piece,
              (SELECT sum(cnt)::HUGEINT AS tot1 FROM counts) t
         ORDER BY cnt DESC, c.piece LIMIT 30"""),
    // q308: the q307 decode applied to every word OCCURRENCE —
    // per-source fertility rollup, integer-floor compression (q234
    // convention); words past the 12-char cap excluded on both sides
    "q308_unigram_encode" -> ("WITH " + unigramCoreCtes + """,
         wp AS (SELECT w, count(*)::BIGINT AS n_pieces FROM (""" +
      (1 to 12).map(r => s"SELECT w FROM s$r")
        .mkString(" UNION ALL ") + """) GROUP BY w),
         stok AS (SELECT source, w FROM tok WHERE len(w) BETWEEN 1 AND 12)
         SELECT source, count(*)::BIGINT AS n_words,
           CAST(sum(len(w)) AS BIGINT) AS n_chars,
           CAST(sum(n_pieces) AS BIGINT) AS n_subwords,
           CAST(sum(len(w))::HUGEINT * 1000 // sum(n_pieces) AS BIGINT)
             AS chars_per_ksubword
         FROM stok JOIN wp USING (w)
         GROUP BY source ORDER BY source"""),
    // q312: one unigram-LM pruning round — multi-char pieces below
    // 50 ppm of the q307 round's re-estimated mass drop (single chars
    // always survive: coverage), the word dict re-decodes under the
    // pruned vocabulary with the re-estimated mass as the pick
    // likelihood, and the report rolls up per piece length. The pruned
    // rounds are the SAME MaxMatch replay (p1..p12 MATERIALIZED) over
    // `surv` instead of `cands`.
    "q312_unigram_prune" -> ("WITH " + unigramCoreCtes + """,
         picks AS (""" +
      (1 to 12).map(r => s"SELECT piece, n FROM s$r")
        .mkString(" UNION ALL ") + """),
         p1c AS MATERIALIZED (SELECT piece, CAST(sum(n) AS BIGINT) AS cnt
           FROM picks GROUP BY piece),
         t1 AS (SELECT sum(cnt)::HUGEINT AS tot1 FROM p1c),
         surv AS MATERIALIZED (SELECT c.piece,
             COALESCE(CAST(p.cnt::HUGEINT * 1000000 // t.tot1 AS BIGINT), 0) AS lik
           FROM cands c LEFT JOIN p1c p USING (piece), t1 t
           WHERE len(c.piece) = 1
              OR COALESCE(CAST(p.cnt::HUGEINT * 1000000 // t.tot1 AS BIGINT), 0) >= 50),
         q0 AS (SELECT w, n, 1 AS pos FROM words),""" +
      prunedRoundsCte + """,
         pick2 AS (""" +
      (1 to 12).map(r => s"SELECT piece, n FROM p$r")
        .mkString(" UNION ALL ") + """),
         c2 AS MATERIALIZED (SELECT piece, CAST(sum(n) AS BIGINT) AS cnt
           FROM pick2 GROUP BY piece),
         t2 AS (SELECT sum(cnt)::HUGEINT AS tot2 FROM c2)
         SELECT cl.piece_len, cl.n_cand,
           COALESCE(kl.n_kept, 0) AS n_kept,
           COALESCE(pl.picks, 0) AS picks,
           COALESCE(CAST(pl.picks::HUGEINT * 1000000 // t2.tot2 AS BIGINT), 0)
             AS mass_ppm
         FROM (SELECT CAST(len(piece) AS INT) AS piece_len,
                 count(*)::BIGINT AS n_cand FROM cands GROUP BY 1) cl
         LEFT JOIN (SELECT CAST(len(piece) AS INT) AS piece_len,
                 count(*)::BIGINT AS n_kept FROM surv GROUP BY 1) kl
           USING (piece_len)
         LEFT JOIN (SELECT CAST(len(piece) AS INT) AS piece_len,
                 CAST(sum(cnt) AS BIGINT) AS picks FROM c2 GROUP BY 1) pl
           USING (piece_len),
              t2
         ORDER BY cl.piece_len"""),
    // q313: Cohen's kappa between the length and stopword-density
    // classifiers — mean-relative cross-multiplied thresholds, kappa
    // from the ROUNDED ppm po/pe (both engines walk one integer grid)
    "q313_cohens_kappa" ->
      """WITH base AS (SELECT n_chars,
           len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS n_toks,
           len(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
             x -> x IN ('the','a','an','of','to','in','and','is','it','that'))) AS n_stop
         FROM documents),
         tot AS (SELECT count(*)::BIGINT AS n, sum(n_chars)::HUGEINT AS tot_chars,
           sum(n_toks)::HUGEINT AS tot_toks, sum(n_stop)::HUGEINT AS tot_stop FROM base),
         flags AS (SELECT
           CASE WHEN n_chars::HUGEINT * t.n >= t.tot_chars THEN 1 ELSE 0 END AS a,
           CASE WHEN n_toks > 0 AND n_stop::HUGEINT * t.tot_toks >= t.tot_stop * n_toks
             THEN 1 ELSE 0 END AS b
           FROM base, tot t),
         cells AS (SELECT count(*)::BIGINT AS n,
           CAST(sum(a*b) AS BIGINT) AS n11, CAST(sum(a*(1-b)) AS BIGINT) AS n10,
           CAST(sum((1-a)*b) AS BIGINT) AS n01, CAST(sum((1-a)*(1-b)) AS BIGINT) AS n00
           FROM flags),
         ppm AS (SELECT n, n11, n10, n01, n00,
           CAST((n11+n00)::HUGEINT * 1000000 // n AS BIGINT) AS po_ppm,
           CAST(((n11+n10)::HUGEINT*(n11+n01) + ((n01+n00)::HUGEINT*(n10+n00)))
             * 1000000 // (n::HUGEINT * n) AS BIGINT) AS pe_ppm
           FROM cells)
         SELECT n, n11, n10, n01, n00, po_ppm, pe_ppm,
           CASE WHEN pe_ppm < 1000000 THEN
             CAST((po_ppm - pe_ppm)::HUGEINT * 1000000 // (1000000 - pe_ppm)
               AS BIGINT)
           ELSE 0 END AS kappa_ppm
         FROM ppm""",
    // q314: Mann-Whitney rank-sum drift (en vs zh doc lengths) — the
    // tie-aware 2U fold over the merged length-count grid; window is
    // value-domain-bounded (the q243 ECDF class)
    "q314_rank_sum" ->
      """WITH ga AS (SELECT n_chars AS len, count(*)::BIGINT AS ca
           FROM documents WHERE lang = 'en' GROUP BY 1),
         gb AS (SELECT n_chars AS len, count(*)::BIGINT AS cb
           FROM documents WHERE lang = 'zh' GROUP BY 1),
         grid AS (SELECT COALESCE(ga.len, gb.len) AS len,
             COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
           FROM ga FULL OUTER JOIN gb ON ga.len = gb.len),
         cum AS (SELECT len, ca, cb,
             COALESCE(sum(cb) OVER (ORDER BY len
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
           FROM grid)
         SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
           CAST(sum(ca::HUGEINT * (2*cumb + cb)) AS BIGINT) AS u2,
           CAST(sum(ca::HUGEINT * (2*cumb + cb)) * 1000000
             // (2::HUGEINT * sum(ca) * sum(cb)) AS BIGINT) AS auc_ppm
         FROM cum""",
    // q316: BPE round-trip audit — replay the q225 rounds, encode every
    // word occurrence, UNDO the merges in reverse order, count exact
    // reconstructions per source (the tokenizer losslessness audit)
    "q316_bpe_roundtrip" ->
      ("WITH " + bpeRoundsCte + """,
         tok AS (SELECT source, w FROM (
             SELECT source, unnest(string_split(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
               AS w
             FROM documents)
           WHERE len(w) > 0),
         enc AS (SELECT source,
             ' ' || rtrim(regexp_replace(w, '(.)', '\1  ', 'g')) || ' '
               AS orig,
             replace(replace(replace(
               ' ' || rtrim(regexp_replace(w, '(.)', '\1  ', 'g')) || ' ',
               ' ' || t1.s1 || '  ' || t1.s2 || ' ',
               ' ' || t1.s1 || t1.s2 || ' '),
               ' ' || t2.s1 || '  ' || t2.s2 || ' ',
               ' ' || t2.s1 || t2.s2 || ' '),
               ' ' || t3.s1 || '  ' || t3.s2 || ' ',
               ' ' || t3.s1 || t3.s2 || ' ') AS syms
           FROM tok CROSS JOIN t1 CROSS JOIN t2 CROSS JOIN t3),
         dec AS (SELECT source, orig,
             replace(replace(replace(syms,
               ' ' || t3.s1 || t3.s2 || ' ',
               ' ' || t3.s1 || '  ' || t3.s2 || ' '),
               ' ' || t2.s1 || t2.s2 || ' ',
               ' ' || t2.s1 || '  ' || t2.s2 || ' '),
               ' ' || t1.s1 || t1.s2 || ' ',
               ' ' || t1.s1 || '  ' || t1.s2 || ' ') AS back
           FROM enc CROSS JOIN t1 CROSS JOIN t2 CROSS JOIN t3)
         SELECT source, count(*)::BIGINT AS n_words,
           CAST(sum(CASE WHEN back = orig THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ok,
           CAST(count(*) - sum(CASE WHEN back = orig THEN 1 ELSE 0 END)
             AS BIGINT) AS n_bad,
           CAST(sum(CASE WHEN back = orig THEN 1 ELSE 0 END)::HUGEINT
             * 1000000 // count(*) AS BIGINT) AS ok_ppm
         FROM dec GROUP BY 1 ORDER BY 1"""),
    // q318: trainer vocabulary overlap — 8-round BPE merge
    // concatenations vs the q312 unigram multi-char survivors,
    // Jaccard on the ppm grid
    "q318_trainer_overlap" -> ("WITH " + bpeRoundsCteN(8) + """,
         """ + unigramCoreCtes + """,
         upicks AS (""" +
      (1 to 12).map(r => s"SELECT piece, n FROM s$r")
        .mkString(" UNION ALL ") + """),
         uc1 AS MATERIALIZED (SELECT piece, CAST(sum(n) AS BIGINT) AS cnt
           FROM upicks GROUP BY piece),
         ut1 AS (SELECT sum(cnt)::HUGEINT AS tot1 FROM uc1),
         usurv AS (SELECT c.piece
           FROM cands c LEFT JOIN uc1 p USING (piece), ut1 t
           WHERE len(c.piece) >= 2
             AND COALESCE(CAST(p.cnt::HUGEINT * 1000000 // t.tot1
               AS BIGINT), 0) >= 50),
         bvocab AS (""" +
      (1 to 8).map(r => s"SELECT s1 || s2 AS piece FROM bt$r")
        .mkString(" UNION ") + """),
         j AS (SELECT
             CASE WHEN b.piece IS NULL THEN 0 ELSE 1 END AS b,
             CASE WHEN u.piece IS NULL THEN 0 ELSE 1 END AS u
           FROM bvocab b FULL OUTER JOIN usurv u ON b.piece = u.piece)
         SELECT CAST(sum(b) AS BIGINT) AS n_bpe,
           CAST(sum(u) AS BIGINT) AS n_uni,
           CAST(sum(b*u) AS BIGINT) AS n_common,
           CAST(sum(b*u)::HUGEINT * 1000000
             // (sum(b) + sum(u) - sum(b*u)) AS BIGINT) AS jaccard_ppm
         FROM j"""),
    // q322: corpus data card — one-row snapshot fingerprint; dedup on
    // md5 fingerprints (the q27 rule), shares once onto the ppm grid
    "q322_corpus_card" ->
      """WITH base AS (SELECT count(*)::BIGINT AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           count(DISTINCT md5(text))::BIGINT AS n_distinct_text,
           count(DISTINCT source)::BIGINT AS n_sources FROM documents),
         tok AS (SELECT unnest(string_split(
           regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
           FROM documents),
         v AS (SELECT count(*)::BIGINT AS n_tokens,
           count(DISTINCT w)::BIGINT AS n_distinct_words FROM tok),
         lt AS (SELECT count(*)::BIGINT AS n_langs,
           CAST(max(c) AS BIGINT) AS top_c
           FROM (SELECT lang, count(*) AS c FROM documents GROUP BY 1))
         SELECT n_docs, n_chars, n_tokens, n_distinct_words, n_sources,
           n_langs,
           CAST((n_docs - n_distinct_text)::HUGEINT * 1000000 // n_docs
             AS BIGINT) AS exact_dup_ppm,
           CAST(top_c::HUGEINT * 1000000 // n_docs AS BIGINT)
             AS top_lang_share_ppm
         FROM base, v, lt"""
  )

  /** The q307/q308 shared chain: tokenizer → word dict (≤12 chars) →
    * substring candidates with ppm seed likelihoods → 12 MaxMatch
    * decode rounds ([[unigramRoundsCte]]). ONE source of truth ending
    * at `tok`, `words`, `cands`, and `s1..s12`.
    */
  private def unigramCoreCtes: String = """
         tok AS (SELECT source, unnest(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
           FROM documents),
         words AS MATERIALIZED (SELECT w, count(*)::BIGINT AS n FROM tok
           WHERE len(w) BETWEEN 1 AND 12 GROUP BY w),
         sub AS (SELECT substring(w, ps.p, ls.l) AS piece, n
           FROM words, (SELECT unnest(range(1, 13)) AS p) ps,
                (SELECT unnest(range(1, 5)) AS l) ls
           WHERE ps.p <= len(w) AND ps.p + ls.l - 1 <= len(w)),
         cfreq AS MATERIALIZED (SELECT piece, CAST(sum(n) AS BIGINT) AS freq
           FROM sub GROUP BY piece HAVING sum(n) >= 5 OR len(piece) = 1),
         cands AS MATERIALIZED (SELECT piece, freq,
             CAST(freq::HUGEINT * 1000000 // tot0 AS BIGINT) AS p0_ppm
           FROM cfreq, (SELECT sum(freq)::HUGEINT AS tot0 FROM cfreq) t),
         s0 AS (SELECT w, n, 1 AS pos FROM words),""" + unigramRoundsCte

  /** The 12 q307 MaxMatch decode rounds, one MATERIALIZED CTE each
    * (the q173/q225 fixed-iteration replay rule): candidates explode
    * per active (word, pos) as ≤4 substrings and EQUI-join the piece
    * table; the pick order (l DESC, p0 DESC, piece DESC) is the total
    * order Spark's struct max implements.
    */
  private def unigramRoundsCte: String = (1 to 12).map { r =>
    val prev = if (r == 1) "s0" else s"n${r - 1}"
    s"""
         ax$r AS (SELECT a.w, a.n, a.pos,
             substring(a.w, a.pos, ls.l) AS piece, ls.l
           FROM (SELECT w, n, pos FROM $prev WHERE pos <= len(w)) a,
                (SELECT unnest(range(1, 5)) AS l) ls
           WHERE a.pos + ls.l - 1 <= len(a.w)),
         s$r AS MATERIALIZED (SELECT w, n, pos, piece, l FROM (
             SELECT ax$r.*, row_number() OVER (PARTITION BY w, pos
               ORDER BY ax$r.l DESC, c.p0_ppm DESC, ax$r.piece DESC) AS rk
             FROM ax$r JOIN cands c USING (piece)) t WHERE rk = 1),
         n$r AS (SELECT w, n, pos + l AS pos FROM s$r)"""
  }.mkString(",")

  /** The q312 re-decode rounds: identical MaxMatch replay shape to
    * [[unigramRoundsCte]] but over the PRUNED `surv(piece, lik)`
    * vocabulary with the re-estimated mass as the likelihood tie-break
    * — mirroring Spark's `max(struct(l, lik, piece))`.
    */
  private def prunedRoundsCte: String = (1 to 12).map { r =>
    val prev = if (r == 1) "q0" else s"m${r - 1}"
    s"""
         bx$r AS (SELECT a.w, a.n, a.pos,
             substring(a.w, a.pos, ls.l) AS piece, ls.l
           FROM (SELECT w, n, pos FROM $prev WHERE pos <= len(w)) a,
                (SELECT unnest(range(1, 5)) AS l) ls
           WHERE a.pos + ls.l - 1 <= len(a.w)),
         p$r AS MATERIALIZED (SELECT w, n, pos, piece, l FROM (
             SELECT bx$r.*, row_number() OVER (PARTITION BY w, pos
               ORDER BY bx$r.l DESC, c.lik DESC, bx$r.piece DESC) AS rk
             FROM bx$r JOIN surv c USING (piece)) t WHERE rk = 1),
         m$r AS (SELECT w, n, pos + l AS pos FROM p$r)"""
  }.mkString(",")
}
