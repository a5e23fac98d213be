package graft.oracle

import graft.operators.{RetrievalOps, SimilarityOps}
import OracleCtes._

/** DuckDB oracle SQL — embedding family: brute/LSH/IVF/PQ/SQ ANN, k-means, PCA, recall/eval, embed health. One entry per SparkEntry.queries
  * key in this family; strings byte-identical to the pre-split
  * SparkEntry registry (round-9 reviewability split).
  */
private[graft] object SimilarityOracles {
  /** The BM25 chain (postings → query terms → candidate scoring) shared
    * by the q89 gate and the q279 PRF expansion — one source of truth
    * ending at `tfp`, `qt`, and `contrib`.
    */
  private val bm25CoreCtes: String =
    raw"""d0 AS (
           SELECT doc_id, string_split(
             regexp_replace(lower(trim(coalesce(text, ''))), '\s+', ' ',
               'g'), ' ') AS w
           FROM documents),
         post AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
                    unnest(w) AS tok FROM d0),
         tfp AS (SELECT doc_id, dl, tok, count(*) AS tf
                 FROM post GROUP BY 1, 2, 3),
         st AS (SELECT count(*) AS n_docs,
                  sum(CAST(len(w) AS BIGINT)) AS sum_dl FROM d0),
         qt AS (
           SELECT doc_id AS qid, tok,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY tf DESC, tok) AS INT) AS t_rank
           FROM tfp WHERE doc_id < ${RetrievalOps.DefaultNQueries}
           QUALIFY row_number() OVER (PARTITION BY doc_id
             ORDER BY tf DESC, tok) <= ${RetrievalOps.DefaultNTerms}),
         cand AS (SELECT qt.qid, qt.t_rank, tfp.doc_id, tfp.dl,
                    tfp.tok, tfp.tf
                  FROM tfp JOIN qt USING (tok)),
         dfc AS (SELECT tok, count(*) AS df FROM
                   (SELECT DISTINCT tok, doc_id FROM cand) GROUP BY 1),
         contrib AS (
           SELECT cand.qid, cand.doc_id, cand.t_rank,
             round(
               round(ln((CAST(st.n_docs AS DOUBLE) - CAST(dfc.df AS DOUBLE)
                   + 0.5) / (CAST(dfc.df AS DOUBLE) + 0.5) + 1.0), 6)
               * (CAST(cand.tf AS DOUBLE) * (1.2 + 1.0) /
                  (CAST(cand.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 *
                    (CAST(cand.dl * st.n_docs AS DOUBLE) /
                     CAST(st.sum_dl AS DOUBLE))))), 6) AS c
           FROM cand JOIN dfc USING (tok) CROSS JOIN st)"""

  /** The per-query ranked hit list over `contrib` (no trailing rank
    * filter — callers bound `rk` themselves).
    */
  private val bm25RankedSql: String =
    raw"""SELECT qid, doc_id AS hit_id, score,
             CAST(row_number() OVER (PARTITION BY qid
               ORDER BY score DESC, doc_id) AS INT) AS rk
           FROM (SELECT qid, doc_id,
                   round(${RetrievalOps.oracleSlotSql(RetrievalOps.DefaultNTerms)},
                     4) AS score
                 FROM contrib GROUP BY 1, 2)"""

  val sql: Map[String, String] = Map(
    // q309: Dirichlet query-likelihood top-k — integer end-to-end:
    // collection model in ppm, per-term ratios floored to ppb, score =
    // exact HUGEINT product over term-rank slots (neutral 1e9 for a
    // missing slot), reported floored to score_e18; rank on the full
    // product with doc_id tie-break
    "q309_qlm_topk" ->
      raw"""WITH d0 AS (
           SELECT doc_id, string_split(
             regexp_replace(lower(trim(coalesce(text, ''))), '\s+', ' ',
               'g'), ' ') AS w
           FROM documents),
         post AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
                    unnest(w) AS tok FROM d0),
         tfp AS (SELECT doc_id, dl, tok, count(*) AS tf
                 FROM post GROUP BY 1, 2, 3),
         st AS (SELECT sum(CAST(len(w) AS BIGINT)) AS sum_dl FROM d0),
         qt AS (
           SELECT doc_id AS qid, tok,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY tf DESC, tok) AS INT) AS t_rank
           FROM tfp WHERE doc_id < ${RetrievalOps.DefaultNQueries}
           QUALIFY row_number() OVER (PARTITION BY doc_id
             ORDER BY tf DESC, tok) <= ${RetrievalOps.DefaultNTerms}),
         cfp AS (SELECT tok,
             CAST(sum(tf)::HUGEINT * 1000000 // (SELECT sum_dl FROM st)
               AS BIGINT) AS cfppm
           FROM tfp WHERE tok IN (SELECT tok FROM qt) GROUP BY tok),
         cdocs AS (SELECT DISTINCT qt.qid, tfp.doc_id, tfp.dl
           FROM tfp JOIN qt USING (tok)),
         grid AS (SELECT c.qid, c.doc_id, c.dl, q.tok, q.t_rank
           FROM cdocs c JOIN qt q ON q.qid = c.qid),
         cells AS (SELECT g.qid, g.doc_id, g.t_rank,
             CAST(((coalesce(tfp.tf, 0)::HUGEINT * 1000000
               + 1000 * cfp.cfppm) * 1000000000)
               // ((g.dl + 1000)::HUGEINT * 1000000) AS BIGINT) AS r
           FROM grid g
           JOIN cfp ON cfp.tok = g.tok
           LEFT JOIN tfp ON tfp.doc_id = g.doc_id AND tfp.tok = g.tok),
         scored AS (SELECT qid, doc_id,
             coalesce(max(CASE WHEN t_rank = 1 THEN r END),
               1000000000)::HUGEINT
           * coalesce(max(CASE WHEN t_rank = 2 THEN r END),
               1000000000)::HUGEINT
           * coalesce(max(CASE WHEN t_rank = 3 THEN r END),
               1000000000)::HUGEINT AS s
           FROM cells GROUP BY 1, 2)
         SELECT qid, doc_id AS hit_id,
           CAST(s // 1000000000 AS BIGINT) AS score_e18,
           CAST(row_number() OVER (PARTITION BY qid
             ORDER BY s DESC, doc_id) AS INT) AS rk
         FROM scored
         QUALIFY row_number() OVER (PARTITION BY qid
           ORDER BY s DESC, doc_id) <= ${RetrievalOps.DefaultK}
         ORDER BY qid, rk""",
    // q269: positional proximity search (NEAR/3) — per-doc band join of
    // the two query-term position slices (RetrievalOps.proximitySearch);
    // positions are 1-based over the normalized whitespace tokens
    "q269_proximity_search" ->
      """WITH toks AS (
           SELECT doc_id, string_split(regexp_replace(lower(trim(
             coalesce(text, ''))), '\s+', ' ', 'g'), ' ') AS w
           FROM documents),
         pos AS (
           SELECT doc_id, u.s.tok AS term, CAST(u.s.p AS BIGINT) AS p
           FROM toks, unnest(list_transform(range(1, len(w) + 1),
             i -> {'tok': w[i], 'p': i})) AS u(s)
           WHERE u.s.tok IN ('table', 'scan')),
         hits AS (
           SELECT a.doc_id, count(*) AS n_matches,
             CAST(min(a.p) AS BIGINT) AS first_pos
           FROM pos a JOIN pos b ON a.doc_id = b.doc_id
             AND a.term = 'table' AND b.term = 'scan'
             AND abs(a.p - b.p) <= 3
           GROUP BY 1)
         SELECT doc_id, n_matches, first_pos FROM hits
         ORDER BY n_matches DESC, doc_id LIMIT 25""",
    // q299: silhouette-lite per label — exact sums of the floor-div
    // row score (Spark side floors explicitly via pmod; `//` here)
    // (EmbedHealthOps.silhouetteLiteOn)
    "q299_silhouette" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
           FROM embeddings),
         xq AS (SELECT vec_id, label, list_transform(v,
             x -> CAST(round(x * 1024) AS BIGINT)) AS q FROM e),
         mud AS (SELECT label, i.range AS d,
             CAST(round(avg(q[i.range])) AS BIGINT) AS mu
           FROM xq, range(1, 65) i GROUP BY 1, 2),
         cent AS (SELECT label AS clabel, list(mu ORDER BY d) AS cq
           FROM mud GROUP BY 1),
         dist AS (SELECT x.vec_id, x.label, c.clabel,
             CAST(list_sum(list_transform(range(1, 65),
               i -> (x.q[i] - c.cq[i]) * (x.q[i] - c.cq[i])))
               AS HUGEINT) AS d2
           FROM xq x CROSS JOIN cent c),
         ab AS (SELECT vec_id, label,
             max(CASE WHEN label = clabel THEN d2 END) AS a2,
             min(CASE WHEN label <> clabel THEN d2 END) AS b2
           FROM dist GROUP BY 1, 2),
         s AS (SELECT vec_id, label,
             CAST((b2 - a2) * 1000000 // greatest(a2, b2) AS BIGINT)
               AS sil_ppm
           FROM ab WHERE greatest(a2, b2) > 0)
         SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(sil_ppm) AS BIGINT) AS sum_sil_ppm,
           CAST(sum(CASE WHEN sil_ppm < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_negative
         FROM s GROUP BY 1 ORDER BY 1""",
    // q297: TwoNN intrinsic-dimension ratio panel — 2nd/1st NN squared
    // distance ratio ppm for 32 probes, rank-pick median
    // (EmbedHealthOps.twoNnRatioOn)
    "q297_twonn_ratio" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding::DOUBLE[],
             x -> CAST(round(x * 1024) AS BIGINT)) AS q
           FROM embeddings),
         probes AS (SELECT vec_id AS pid, q AS pq FROM e
           WHERE vec_id < 32),
         d AS (SELECT p.pid, c.vec_id AS cid,
             CAST(list_sum(list_transform(range(1, len(p.pq) + 1),
               i -> (p.pq[i] - c.q[i]) * (p.pq[i] - c.q[i])))
               AS HUGEINT) AS d2
           FROM probes p JOIN e c ON p.pid <> c.vec_id),
         nn AS (SELECT pid, d2, row_number() OVER (PARTITION BY pid
             ORDER BY d2, cid) AS rnk FROM d),
         pair AS (SELECT pid,
             max(CASE WHEN rnk = 1 THEN d2 END) AS d1,
             max(CASE WHEN rnk = 2 THEN d2 END) AS d2n
           FROM nn WHERE rnk <= 2 GROUP BY pid),
         ratio AS (SELECT pid, CAST(d2n * 1000000 // d1 AS BIGINT)
             AS ratio2_ppm
           FROM pair WHERE d1 > 0),
         med AS (SELECT pid, ratio2_ppm,
             row_number() OVER (ORDER BY ratio2_ppm, pid) AS r,
             (SELECT count(*) FROM ratio) AS n FROM ratio)
         SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(max(CASE WHEN r = (n + 1) // 2 THEN ratio2_ppm END)
             AS BIGINT) AS median_ratio2_ppm,
           CAST(min(ratio2_ppm) AS BIGINT) AS min_ratio2_ppm,
           CAST(max(ratio2_ppm) AS BIGINT) AS max_ratio2_ppm
         FROM med""",
    // q280: embedding split drift — cosine between the EXACT integer
    // sum vectors of the even/odd halves per label (scale-invariance
    // makes the mean division unnecessary); one 6dp float per row
    // through the identical literal tree (EmbedHealthOps.splitDriftOn)
    "q280_split_drift" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
           FROM embeddings),
         xq AS (SELECT vec_id, label, vec_id % 2 AS half,
           list_transform(v, x -> CAST(round(x * 1024) AS BIGINT)) AS q
           FROM e),
         sums AS (SELECT label, half, i.range AS d,
             CAST(sum(q[i.range]) AS BIGINT) AS s
           FROM xq, range(1, 65) i GROUP BY 1, 2, 3),
         sv AS (SELECT label, half, list(s ORDER BY d) AS sv
           FROM sums GROUP BY 1, 2),
         cnt AS (SELECT label, half, CAST(count(*) AS BIGINT) AS n
           FROM xq GROUP BY 1, 2),
         h AS (SELECT s.label, s.half, s.sv, c.n
           FROM sv s JOIN cnt c ON s.label = c.label AND s.half = c.half)
         SELECT a.label, a.n AS n_even, b.n AS n_odd,
           round(CAST(list_inner_product(a.sv, b.sv) AS DOUBLE) /
             (sqrt(CAST(list_inner_product(a.sv, a.sv) AS DOUBLE)) *
              sqrt(CAST(list_inner_product(b.sv, b.sv) AS DOUBLE))), 6)
             AS drift_cos
         FROM h a JOIN h b ON a.label = b.label
           AND a.half = 0 AND b.half = 1
         ORDER BY a.label""",
    "q33_lsh_topk" ->
      """SELECT vec_id AS query_id, CAST(1 AS INT) AS recall_ok
         FROM embeddings WHERE vec_id < 8 ORDER BY query_id""",
    "q31_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                    FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         scored AS (
           SELECT query_id, vec_id,
             round(list_inner_product(qv, v) /
               (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(v, v))), 4) AS cos
           FROM q CROSS JOIN c WHERE vec_id <> query_id)
         SELECT query_id, vec_id AS neighbor_id, cos, rk FROM (
           SELECT query_id, vec_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, vec_id) AS INT) AS rk
           FROM scored)
         WHERE rk <= 5 ORDER BY query_id, rk""",
    "q32_cosine_neardup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                    FROM embeddings WHERE vec_id < 200)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_inner_product(a.v, b.v) /
             (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 4) AS cos
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE round(list_inner_product(a.v, b.v) /
             (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 4) >= 0.35
         ORDER BY id_a, id_b""",
    // q64 emits exactly-verified pairs from complete-recall multi-table
    // LSH bucketing (64 tables x 4 planes; per-pair miss ~5e-5 at the
    // 0.35 threshold) -- same oracle as the exact q32
    "q64_lsh_neardup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                    FROM embeddings WHERE vec_id < 200)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_inner_product(a.v, b.v) /
             (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 4) AS cos
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE round(list_inner_product(a.v, b.v) /
             (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 4) >= 0.35
         ORDER BY id_a, id_b""",
    // q335: DBSCAN in cosine space — exact eps-graph replay of the
    // engine's complete-recall LSH candidates (96 tables x 3 planes at
    // cos 0.30 -> per-pair miss ~1e-10, the q64 contract), recursive-CTE
    // CC over core-core edges, min-label border attachment, noise row
    "q335_dbscan_clusters" ->
      """WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v
             FROM embeddings WHERE vec_id < 200),
         p AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib
           FROM e a JOIN e b ON a.vec_id < b.vec_id
           WHERE round(list_inner_product(a.v, b.v) /
             (sqrt(list_inner_product(a.v, a.v)) *
              sqrt(list_inner_product(b.v, b.v))), 4) >= 0.30),
         s AS (SELECT ia AS v, ib AS n FROM p
           UNION ALL SELECT ib, ia FROM p),
         core AS MATERIALIZED (SELECT v FROM s GROUP BY v
           HAVING count(*) + 1 >= 3),
         ce AS MATERIALIZED (SELECT ia, ib FROM p
           WHERE ia IN (SELECT v FROM core)
             AND ib IN (SELECT v FROM core)),
         csym AS (SELECT ia AS src, ib AS dst FROM ce
           UNION ALL SELECT ib, ia FROM ce),
         cc(id, label) AS (
           SELECT DISTINCT src, src FROM csym
           UNION
           SELECT s2.dst, c.label FROM cc c JOIN csym s2 ON s2.src = c.id),
         lab AS (SELECT id, min(label) AS label FROM cc GROUP BY 1),
         corelab AS MATERIALIZED (SELECT core.v,
             CAST(coalesce(lab.label, core.v) AS BIGINT) AS cluster_id,
             1 AS is_core
           FROM core LEFT JOIN lab ON lab.id = core.v),
         borderlab AS (SELECT s.v,
             CAST(min(cl.cluster_id) AS BIGINT) AS cluster_id,
             0 AS is_core
           FROM s JOIN corelab cl ON s.n = cl.v
           WHERE s.v NOT IN (SELECT v FROM core) GROUP BY s.v),
         asg AS MATERIALIZED (SELECT * FROM corelab
           UNION ALL SELECT * FROM borderlab),
         cl AS (SELECT cluster_id,
             CAST(sum(is_core) AS BIGINT) AS n_core,
             CAST(count(*) - sum(is_core) AS BIGINT) AS n_border,
             CAST(count(*) AS BIGINT) AS n_total
           FROM asg GROUP BY 1)
         SELECT * FROM cl
         UNION ALL
         SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
           CAST((SELECT count(*) FROM e) - (SELECT count(*) FROM asg)
             AS BIGINT)
         ORDER BY cluster_id""",
    // q340: epsilon-percolation sweep — exact eps-graph at each grid
    // threshold (one pair CTE at the loosest cut, cos retained), one
    // recursive CC per cut, giant-component share vs all 200 vectors
    "q340_eps_percolation" -> {
      val grid = Seq(3000, 3300, 3500, 4000)
      def block(bp: Int) =
        s"""p$bp AS MATERIALIZED (SELECT ia, ib FROM p
             WHERE c >= ${bp / 10000.0}),
         s$bp AS (SELECT ia AS src, ib AS dst FROM p$bp
           UNION ALL SELECT ib, ia FROM p$bp),
         cc$bp(id, label) AS (
           SELECT DISTINCT src, src FROM s$bp
           UNION
           SELECT s2.dst, c.label FROM cc$bp c
             JOIN s$bp s2 ON s2.src = c.id),
         lab$bp AS MATERIALIZED (SELECT id, min(label) AS label
           FROM cc$bp GROUP BY 1),
         comp$bp AS (SELECT label, count(*) AS sz FROM lab$bp
           GROUP BY 1)"""
      def row(bp: Int) =
        s"""SELECT $bp AS t_bp,
           (SELECT count(*) FROM p$bp)::BIGINT AS n_edges,
           (SELECT count(*) FROM lab$bp)::BIGINT AS n_nodes,
           (SELECT count(*) FROM comp$bp)::BIGINT AS n_components,
           CAST(coalesce((SELECT max(sz) FROM comp$bp), 0) * 1000000
             // (SELECT count(*) FROM e) AS BIGINT) AS giant_ppm"""
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v
             FROM embeddings WHERE vec_id < 200),
         p AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib,
             round(list_inner_product(a.v, b.v) /
               (sqrt(list_inner_product(a.v, a.v)) *
                sqrt(list_inner_product(b.v, b.v))), 4) AS c
           FROM e a JOIN e b ON a.vec_id < b.vec_id
           WHERE round(list_inner_product(a.v, b.v) /
             (sqrt(list_inner_product(a.v, a.v)) *
              sqrt(list_inner_product(b.v, b.v))), 4) >= 0.30),
         ${grid.map(block).mkString(",\n         ")}
         ${grid.map(row).mkString(" UNION ALL ")}
         ORDER BY t_bp"""
    },
    "q57_centroid_assign" ->
      """WITH dims AS (
           SELECT label, vec_id,
             generate_subscripts(embedding, 1) AS d,
             unnest(embedding::DOUBLE[]) AS x
           FROM embeddings),
         cent AS (SELECT label, d, round(avg(x), 6) AS c
                  FROM dims GROUP BY label, d),
         cvec AS (SELECT label AS clabel, list(c ORDER BY d) AS cv
                  FROM cent GROUP BY label),
         scored AS (
           SELECT e.vec_id, e.label, c.clabel,
             round(list_inner_product(e.embedding::DOUBLE[], c.cv) /
               (sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                sqrt(list_inner_product(c.cv, c.cv))), 4) AS cos
           FROM embeddings e CROSS JOIN cvec c),
         best AS (SELECT vec_id, label, clabel,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY cos DESC, clabel) AS rk
           FROM scored)
         SELECT label, clabel AS assigned_label, count(*) AS n
         FROM best WHERE rk = 1
         GROUP BY label, clabel ORDER BY label, assigned_label""",
    "q43_topk_aggregator" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                    FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         scored AS (
           SELECT query_id, vec_id,
             round(list_inner_product(qv, v) /
               (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(v, v))), 4) AS cos
           FROM q CROSS JOIN c WHERE vec_id <> query_id)
         SELECT query_id, vec_id AS neighbor_id, cos, rk FROM (
           SELECT query_id, vec_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, vec_id) AS INT) AS rk
           FROM scored)
         WHERE rk <= 5 ORDER BY query_id, rk""",
    // q69: exact-duplicate vector collapse — group by the embedding value
    // itself (float lists group bitwise-exact in both engines); the
    // linear-cost backstop behind the embedding-LSH bucket caps
    "q69_vector_dedup" ->
      """SELECT min(vec_id) AS canonical_id, count(*) AS n_copies
         FROM embeddings GROUP BY embedding ORDER BY canonical_id""",
    // q70: the ENTIRE IVF pipeline replicated in SQL — per-label centroid
    // codebook (6dp), argmax-cosine list assignment (tie -> smaller
    // label), top-2 probe lists per query, exact top-5 within the probed
    // lists. Cell-exact, not a recall gate: these embeddings have no
    // label-cosine structure, so a recall claim would gate a property the
    // data cannot exhibit (see SimilarityOps.ivfTopK scaladoc).
    // The codebook + assignment CTEs are shared with q75 via ivfAssignCte.
    "q70_ivf_topk" ->
      ("WITH " + ivfAssignCte + """,
         probes AS (
           SELECT query_id, qv, clabel AS ivf_list FROM (
             SELECT e.vec_id AS query_id, e.v AS qv, cent.clabel,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_inner_product(e.v, cent.cv) /
                   (sqrt(list_inner_product(e.v, e.v)) *
                    sqrt(list_inner_product(cent.cv, cent.cv))), 4) DESC,
                 cent.clabel) AS crk
             FROM e CROSS JOIN cent WHERE e.vec_id < 8)
           WHERE crk <= 2),
         scored AS (
           SELECT p.query_id, a.vec_id,
             round(list_inner_product(p.qv, a.v) /
               (sqrt(list_inner_product(p.qv, p.qv)) *
                sqrt(list_inner_product(a.v, a.v))), 4) AS cos
           FROM asg a JOIN probes p USING (ivf_list)
           WHERE a.vec_id <> p.query_id)
         SELECT query_id, vec_id AS neighbor_id, cos, rk FROM (
           SELECT query_id, vec_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, vec_id) AS INT) AS rk
           FROM scored)
         WHERE rk <= 5 ORDER BY query_id, rk"""),
    // q75: SemDeDup replication — same assignment CTE, within-list pairs,
    // drop = any smaller-id neighbor at cos >= 0.35 in the same list
    "q75_semantic_dedup" ->
      ("WITH " + ivfAssignCte + """,
         drops AS (
           SELECT DISTINCT b.vec_id FROM asg a JOIN asg b USING (ivf_list)
           WHERE a.vec_id < b.vec_id AND
             round(list_inner_product(a.v, b.v) /
               (sqrt(list_inner_product(a.v, a.v)) *
                sqrt(list_inner_product(b.v, b.v))), 4) >= 0.35)
         SELECT vec_id, ivf_list,
           CAST(CASE WHEN vec_id IN (SELECT vec_id FROM drops)
             THEN 0 ELSE 1 END AS INT) AS kept
         FROM asg ORDER BY vec_id"""),
    // q76: the ENTIRE 2-iteration Lloyd chain replicated in SQL — label
    // init codebook, twice (argmax re-assignment at 4dp + 6dp per-dim
    // mean update), final assignment and the per-cluster spherical
    // objective. The unrolled CTEs come from ONE parameterized body
    // (lloydAsgCte/lloydCentCte), so a rounding or tiebreak tweak cannot
    // diverge between iterations or from the q70/q75 assignment
    "q76_kmeans_refine" ->
      ("WITH " + ivfAssignCte + s""",
         ${lloydCentCte("dims1", "cent1", "asg")},
         ${lloydAsgCte("a2", "cent1")},
         ${lloydCentCte("dims2", "cent2", "a2")},
         ${lloydAsgCte("a3", "cent2")}
         SELECT a3.ivf_list, count(*) AS n_members,
           round(avg(round(list_inner_product(a3.v, cent2.cv) /
             (sqrt(list_inner_product(a3.v, a3.v)) *
              sqrt(list_inner_product(cent2.cv, cent2.cv))), 4)), 4) AS avg_cos
         FROM a3 JOIN cent2 ON a3.ivf_list = cent2.clabel
         GROUP BY 1 ORDER BY 1"""),
    // q77: product quantization replicated end-to-end — subspace split,
    // 6dp per-(subspace, label) codebooks, argmin-L2 encode (expanded-form
    // distance, 6dp, code tiebreak — term-for-term the Spark expression),
    // ADC lookup-table scoring at 4dp. Cell-exact like q70/q76, no recall
    // claim on structure-free embeddings
    "q77_pq_topk" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                    FROM embeddings),
         sub AS (SELECT vec_id, label, s.range AS s,
                   v[s.range*8+1 : s.range*8+8] AS sv
                 FROM e, range(0, 8) s),
         cbd AS (SELECT label, s, i.range AS d, round(avg(sv[i.range]), 6) AS c
                 FROM sub, range(1, 9) i GROUP BY 1, 2, 3),
         cbn AS (SELECT s, code, cv, list_inner_product(cv, cv) AS cnorm2
                 FROM (SELECT s, label AS code, list(c ORDER BY d) AS cv
                       FROM cbd GROUP BY 1, 2)),
         codes AS (
           SELECT vec_id, s, code, cnorm2 FROM (
             SELECT sub.vec_id, sub.s, cbn.code, cbn.cnorm2,
               row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
                 round(list_inner_product(sub.sv, sub.sv)
                   - 2.0 * list_inner_product(sub.sv, cbn.cv)
                   + cbn.cnorm2, 6), cbn.code) AS rk
             FROM sub JOIN cbn ON sub.s = cbn.s)
           WHERE rk = 1),
         lut AS (SELECT sub.vec_id AS query_id, sub.s, cbn.code,
                   list_inner_product(sub.sv, cbn.cv) AS qdot
                 FROM sub JOIN cbn ON sub.s = cbn.s WHERE sub.vec_id < 8),
         qn AS (SELECT vec_id AS query_id, sqrt(list_inner_product(v, v)) AS qnorm
                FROM e WHERE vec_id < 8),
         sc AS (SELECT l.query_id, c.vec_id,
                  sum(l.qdot) AS adc, sum(c.cnorm2) AS vnorm2
                FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.code
                GROUP BY 1, 2)
         SELECT query_id, vec_id AS neighbor_id, score, rk FROM (
           SELECT sc.query_id, sc.vec_id,
             round(sc.adc / (qn.qnorm * sqrt(sc.vnorm2)), 4) AS score,
             CAST(row_number() OVER (PARTITION BY sc.query_id
                  ORDER BY round(sc.adc / (qn.qnorm * sqrt(sc.vnorm2)), 4)
                    DESC, sc.vec_id) AS INT) AS rk
           FROM sc JOIN qn USING (query_id)
           WHERE sc.vec_id <> sc.query_id)
         WHERE rk <= 5 ORDER BY query_id, rk""",
    // q85: SIZED product quantization — q77's full ADC chain (subspace
    // split, argmin encode with 6dp expanded-form distance + code
    // tiebreak, LUT scoring at 4dp) over the self-sized md5-sampled
    // codebook's subvector slices instead of the label means. Completes
    // the oracle coverage of all three sized ANN families (q80/q81/q85)
    "q85_pq_sized" ->
      ("WITH " + sizedScentCte(100L) + """,
         sub AS (SELECT vec_id, s.range AS s,
                   v[s.range*8+1 : s.range*8+8] AS sv
                 FROM e, range(0, 8) s),
         cbn AS (SELECT s.range AS s, scent.clabel AS code,
                   scent.cv[s.range*8+1 : s.range*8+8] AS cv,
                   list_inner_product(scent.cv[s.range*8+1 : s.range*8+8],
                     scent.cv[s.range*8+1 : s.range*8+8]) AS cnorm2
                 FROM scent, range(0, 8) s),
         codes AS (
           SELECT vec_id, s, code, cnorm2 FROM (
             SELECT sub.vec_id, sub.s, cbn.code, cbn.cnorm2,
               row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
                 round(list_inner_product(sub.sv, sub.sv)
                   - 2.0 * list_inner_product(sub.sv, cbn.cv)
                   + cbn.cnorm2, 6), cbn.code) AS rk
             FROM sub JOIN cbn ON sub.s = cbn.s)
           WHERE rk = 1),
         lut AS (SELECT sub.vec_id AS query_id, sub.s, cbn.code,
                   list_inner_product(sub.sv, cbn.cv) AS qdot
                 FROM sub JOIN cbn ON sub.s = cbn.s WHERE sub.vec_id < 8),
         qn AS (SELECT vec_id AS query_id, sqrt(list_inner_product(v, v)) AS qnorm
                FROM e WHERE vec_id < 8),
         sc AS (SELECT l.query_id, c.vec_id,
                  sum(l.qdot) AS adc, sum(c.cnorm2) AS vnorm2
                FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.code
                GROUP BY 1, 2)
         SELECT query_id, vec_id AS neighbor_id, score, rk FROM (
           SELECT sc.query_id, sc.vec_id,
             round(sc.adc / (qn.qnorm * sqrt(sc.vnorm2)), 4) AS score,
             CAST(row_number() OVER (PARTITION BY sc.query_id
                  ORDER BY round(sc.adc / (qn.qnorm * sqrt(sc.vnorm2)), 4)
                    DESC, sc.vec_id) AS INT) AS rk
           FROM sc JOIN qn USING (query_id)
           WHERE sc.vec_id <> sc.query_id)
         WHERE rk <= 5 ORDER BY query_id, rk"""),
    // q86: the fused PQ scorer — same codebook/encode/LUT semantics as
    // q77, but the ADC accumulation is INDEX-ORDERED on both engines
    // (Spark: the fused expression's s-ascending loop; here: each
    // (query, vec) group's terms collected ORDER BY s and dotted with a
    // ones vector — list_inner_product sums in list order), so the
    // shuffled-sum rounding hazard is designed out rather than survived
    "q86_pq_fused" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                    FROM embeddings),
         sub AS (SELECT vec_id, label, s.range AS s,
                   v[s.range*8+1 : s.range*8+8] AS sv
                 FROM e, range(0, 8) s),
         cbd AS (SELECT label, s, i.range AS d, round(avg(sv[i.range]), 6) AS c
                 FROM sub, range(1, 9) i GROUP BY 1, 2, 3),
         cbn AS (SELECT s, code, cv, list_inner_product(cv, cv) AS cnorm2
                 FROM (SELECT s, label AS code, list(c ORDER BY d) AS cv
                       FROM cbd GROUP BY 1, 2)),
         codes AS (
           SELECT vec_id, s, code, cnorm2 FROM (
             SELECT sub.vec_id, sub.s, cbn.code, cbn.cnorm2,
               row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
                 round(list_inner_product(sub.sv, sub.sv)
                   - 2.0 * list_inner_product(sub.sv, cbn.cv)
                   + cbn.cnorm2, 6), cbn.code) AS rk
             FROM sub JOIN cbn ON sub.s = cbn.s)
           WHERE rk = 1),
         lut AS (SELECT sub.vec_id AS query_id, sub.s, cbn.code,
                   list_inner_product(sub.sv, cbn.cv) AS qdot
                 FROM sub JOIN cbn ON sub.s = cbn.s WHERE sub.vec_id < 8),
         qn AS (SELECT vec_id AS query_id, sqrt(list_inner_product(v, v)) AS qnorm
                FROM e WHERE vec_id < 8),
         sc AS (SELECT l.query_id, c.vec_id,
                  list_inner_product(list(l.qdot ORDER BY l.s),
                    [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]) AS adc,
                  list_inner_product(list(c.cnorm2 ORDER BY c.s),
                    [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]) AS vnorm2
                FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.code
                GROUP BY 1, 2)
         SELECT query_id, vec_id AS neighbor_id, score, rk FROM (
           SELECT sc.query_id, sc.vec_id,
             round(sc.adc / (qn.qnorm * sqrt(sc.vnorm2)), 4) AS score,
             CAST(row_number() OVER (PARTITION BY sc.query_id
                  ORDER BY round(sc.adc / (qn.qnorm * sqrt(sc.vnorm2)), 4)
                    DESC, sc.vec_id) AS INT) AS rk
           FROM sc JOIN qn USING (query_id)
           WHERE sc.vec_id <> sc.query_id)
         WHERE rk <= 5 ORDER BY query_id, rk""",
    // q88: IVF-PQ — the full production index replayed: coarse
    // assignment (q70's CTEs), residuals per dimension, residual PQ
    // codebook + argmin encode (q77's recipe on residuals), probe
    // selection, and the corrected ADC cosine
    // (qc + adcq) / (qnorm · sqrt(|c|² + 2·adcc + |r̂|²)) with every
    // multi-term sum in the ordered-list formulation (the q86 contract)
    "q88_ivfpq_topk" ->
      ("WITH " + ivfAssignCte + """,
         rdim AS (SELECT a.vec_id, a.ivf_list, i.range AS d,
                    a.v[i.range] - cent.cv[i.range] AS x
                  FROM asg a JOIN cent ON a.ivf_list = cent.clabel,
                    range(1, 65) i),
         r AS (SELECT vec_id, ivf_list, list(x ORDER BY d) AS rv
               FROM rdim GROUP BY 1, 2),
         rsub AS (SELECT vec_id, s.range AS s,
                    rv[s.range*8+1 : s.range*8+8] AS sv
                  FROM r, range(0, 8) s),
         rcbd AS (SELECT e.label, rs.s, i.range AS d,
                    round(avg(rs.sv[i.range]), 6) AS c
                  FROM rsub rs JOIN e ON rs.vec_id = e.vec_id,
                    range(1, 9) i GROUP BY 1, 2, 3),
         rcbn AS (SELECT s, code, cv, list_inner_product(cv, cv) AS cnorm2
                  FROM (SELECT s, label AS code, list(c ORDER BY d) AS cv
                        FROM rcbd GROUP BY 1, 2)),
         codes AS (
           SELECT vec_id, s, code, cnorm2 FROM (
             SELECT rs.vec_id, rs.s, rcbn.code, rcbn.cnorm2,
               row_number() OVER (PARTITION BY rs.vec_id, rs.s ORDER BY
                 round(list_inner_product(rs.sv, rs.sv)
                   - 2.0 * list_inner_product(rs.sv, rcbn.cv)
                   + rcbn.cnorm2, 6), rcbn.code) AS rk
             FROM rsub rs JOIN rcbn ON rs.s = rcbn.s)
           WHERE rk = 1),
         qsub AS (SELECT vec_id, s.range AS s,
                    v[s.range*8+1 : s.range*8+8] AS qsv
                  FROM e, range(0, 8) s WHERE vec_id < 8),
         lutq AS (SELECT q.vec_id AS query_id, rcbn.s, rcbn.code,
                    list_inner_product(q.qsv, rcbn.cv) AS qdot
                  FROM qsub q JOIN rcbn ON q.s = rcbn.s),
         csub AS (SELECT cent.clabel, s.range AS s,
                    cent.cv[s.range*8+1 : s.range*8+8] AS csv
                  FROM cent, range(0, 8) s),
         lutc AS (SELECT c.clabel, rcbn.s, rcbn.code,
                    list_inner_product(c.csv, rcbn.cv) AS cdot
                  FROM csub c JOIN rcbn ON c.s = rcbn.s),
         scq AS (SELECT l.query_id, c.vec_id,
                   list_inner_product(list(l.qdot ORDER BY l.s),
                     [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]) AS adcq
                 FROM codes c JOIN lutq l ON c.s = l.s AND c.code = l.code
                 GROUP BY 1, 2),
         scc AS (SELECT l.clabel, c.vec_id,
                   list_inner_product(list(l.cdot ORDER BY l.s),
                     [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]) AS adcc
                 FROM codes c JOIN lutc l ON c.s = l.s AND c.code = l.code
                 GROUP BY 1, 2),
         rn AS (SELECT vec_id,
                  list_inner_product(list(cnorm2 ORDER BY s),
                    [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]) AS rnorm2
                FROM codes GROUP BY 1),
         probes AS (
           SELECT query_id, ivf_list, qc, cnorm2l, qnorm FROM (
             SELECT e.vec_id AS query_id, cent.clabel AS ivf_list,
               list_inner_product(e.v, cent.cv) AS qc,
               list_inner_product(cent.cv, cent.cv) AS cnorm2l,
               sqrt(list_inner_product(e.v, e.v)) AS qnorm,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_inner_product(e.v, cent.cv) /
                   (sqrt(list_inner_product(e.v, e.v)) *
                    sqrt(list_inner_product(cent.cv, cent.cv))), 4) DESC,
                 cent.clabel) AS crk
             FROM e CROSS JOIN cent WHERE e.vec_id < 8)
           WHERE crk <= 2),
         scored AS (
           SELECT p.query_id, a.vec_id,
             round((p.qc + scq.adcq) /
               (p.qnorm * sqrt(p.cnorm2l + 2.0 * scc.adcc + rn.rnorm2)),
               4) AS score
           FROM asg a
             JOIN probes p ON a.ivf_list = p.ivf_list
               AND a.vec_id <> p.query_id
             JOIN scq ON scq.query_id = p.query_id AND scq.vec_id = a.vec_id
             JOIN scc ON scc.clabel = a.ivf_list AND scc.vec_id = a.vec_id
             JOIN rn ON rn.vec_id = a.vec_id)
         SELECT query_id, vec_id AS neighbor_id, score, rk FROM (
           SELECT query_id, vec_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id) AS INT) AS rk
           FROM scored)
         WHERE rk <= 5 ORDER BY query_id, rk"""),
    // q79: random projection replicated end-to-end — the ±1 sign matrix
    // comes from md5(i_j) (the one hash both engines share bit-for-bit),
    // projection rounded 6dp, both cosines 4dp. Cell-exact: each
    // projected coordinate is list_inner_product over the i-ordered sign
    // row — the same index-ordered double accumulation as the Spark
    // side's codegen fused-loop dot (a shuffled groupBy sum is NOT
    // order-stable; that was r5's one hash mismatch). No JL tolerance
    // gate (probabilistic per matrix — with a fixed matrix the
    // distortion is a measured fact, pinned in the spec instead).
    // Both cosines are `round(...) + 0.0`: DuckDB's round preserves IEEE
    // -0.0 (one sf0.01 cos_orig cell rounds to zero from below) while
    // Spark's Catalyst Round goes through BigDecimal, which has no
    // negative zero — `+ 0.0` canonicalizes (-0.0 + 0.0 == +0.0) so the
    // driver's value hash agrees bit-for-bit (r6's one hash mismatch)
    "q79_random_projection" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                    FROM embeddings WHERE vec_id < 40),
         s AS (SELECT i.range AS i, j.range AS j,
                 CASE WHEN substr(md5(i.range || '_' || j.range), 1, 1) < '8'
                   THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE)
                 END AS sgn
               FROM range(0, 64) i, range(0, 16) j),
         srows AS (SELECT j, list(sgn ORDER BY i) AS srow
                   FROM s GROUP BY j),
         proj AS (SELECT e.vec_id, sr.j,
                    round(list_inner_product(e.v, sr.srow) / sqrt(16.0), 6) AS p
                  FROM e CROSS JOIN srows sr),
         pv AS (SELECT vec_id, list(p ORDER BY j) AS pv FROM proj GROUP BY 1)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_inner_product(a.v, b.v) /
             (sqrt(list_inner_product(a.v, a.v)) *
              sqrt(list_inner_product(b.v, b.v))), 4) + 0.0 AS cos_orig,
           round(list_inner_product(pa.pv, pb.pv) /
             (sqrt(list_inner_product(pa.pv, pa.pv)) *
              sqrt(list_inner_product(pb.pv, pb.pv))), 4) + 0.0 AS cos_proj
         FROM e a JOIN e b ON a.vec_id < b.vec_id
           JOIN pv pa ON pa.vec_id = a.vec_id
           JOIN pv pb ON pb.vec_id = b.vec_id
         ORDER BY id_a, id_b""",
    // q80: the SIZED IVF pipeline — the configuration that actually runs
    // at scale (kFor-sized, md5-seeded sampled codebook instead of the
    // label one) replicated end-to-end like q70: the SQL sizes its own
    // codebook with the same greatest(2, ceil(n/1000)) formula,
    // regenerates the md5(vec_id || '_' || 7) sample, and replays
    // assignment, probe selection, and the probed top-5 cell-exact
    "q80_ivf_sized_topk" ->
      ("WITH " + sizedScentCte(100L) + ",\n         " +
        lloydAsgCte("sasg", "scent") + """,
         probes AS (
           SELECT query_id, qv, clabel AS ivf_list FROM (
             SELECT e.vec_id AS query_id, e.v AS qv, scent.clabel,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_inner_product(e.v, scent.cv) /
                   (sqrt(list_inner_product(e.v, e.v)) *
                    sqrt(list_inner_product(scent.cv, scent.cv))), 4) DESC,
                 scent.clabel) AS crk
             FROM e CROSS JOIN scent WHERE e.vec_id < 8)
           WHERE crk <= 2),
         scored AS (
           SELECT p.query_id, a.vec_id,
             round(list_inner_product(p.qv, a.v) /
               (sqrt(list_inner_product(p.qv, p.qv)) *
                sqrt(list_inner_product(a.v, a.v))), 4) AS cos
           FROM sasg a JOIN probes p USING (ivf_list)
           WHERE a.vec_id <> p.query_id)
         SELECT query_id, vec_id AS neighbor_id, cos, rk FROM (
           SELECT query_id, vec_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, vec_id) AS INT) AS rk
           FROM scored)
         WHERE rk <= 5 ORDER BY query_id, rk"""),
    // q81: the SIZED k-means build — q76's unrolled 2-iteration Lloyd
    // chain seeded with q80's self-sized md5 sample instead of the label
    // codebook (the codebook build that actually runs at scale, where
    // labels don't exist). Same parameterized CTE bodies as q76, so a
    // rounding or tiebreak tweak cannot diverge between the two gates
    "q81_kmeans_sized" ->
      ("WITH " + sizedScentCte(100L) + s""",
         ${lloydAsgCte("a1", "scent")},
         ${lloydCentCte("dims1", "cent1", "a1")},
         ${lloydAsgCte("a2", "cent1")},
         ${lloydCentCte("dims2", "cent2", "a2")},
         ${lloydAsgCte("a3", "cent2")}
         SELECT a3.ivf_list, count(*) AS n_members,
           round(avg(round(list_inner_product(a3.v, cent2.cv) /
             (sqrt(list_inner_product(a3.v, a3.v)) *
              sqrt(list_inner_product(cent2.cv, cent2.cv))), 4)), 4) AS avg_cos
         FROM a3 JOIN cent2 ON a3.ivf_list = cent2.clabel
         GROUP BY 1 ORDER BY 1"""),
    // q82: int8 scalar quantization replicated end-to-end — per-dim
    // min/max (ORDER-INDEPENDENT, so no accumulation hazard anywhere),
    // affine encode with round-to-code + clamp, dequantized asymmetric
    // cosine at 4dp. No intermediate rounding: every pre-score step is
    // element-wise exact double arithmetic identical on both engines
    "q82_sq_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                    FROM embeddings),
         dims AS (SELECT vec_id, i.range AS d, v[i.range + 1] AS x
                  FROM e, range(0, 64) i),
         st AS (SELECT d, min(x) AS mn, (max(x) - min(x)) / 255.0 AS s
                FROM dims GROUP BY d),
         codes AS (SELECT vec_id, d,
                     CASE WHEN s = 0 THEN 0.0
                       ELSE least(255.0, round((x - mn) / s, 0)) END AS c
                   FROM dims JOIN st USING (d)),
         deq AS (SELECT vec_id, list(mn + c * s ORDER BY d) AS vq
                 FROM codes JOIN st USING (d) GROUP BY vec_id),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         scored AS (
           SELECT query_id, vec_id,
             round(list_inner_product(qv, vq) /
               (sqrt(list_inner_product(qv, qv)) *
                sqrt(list_inner_product(vq, vq))), 4) AS score
           FROM q CROSS JOIN deq WHERE vec_id <> query_id)
         SELECT query_id, vec_id AS neighbor_id, score, rk FROM (
           SELECT query_id, vec_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id) AS INT) AS rk
           FROM scored)
         WHERE rk <= 5 ORDER BY query_id, rk""",
    // q89: BM25 retrieval — corpus stats are exact ints (avgdl enters as
    // one deterministic division), every FP constant appears as the SAME
    // literal expression both engines constant-fold identically
    // (1.2 + 1.0, 1.0 - 0.75 + 0.75 * norm), idf rounds 6dp at its stage
    // boundary, and the per-(query, doc) score is a fixed-order
    // c1 + c2 + … fold over term-rank slots — never a shuffled float
    // sum. The operating point (nQueries/nTerms/k) and the slot list are
    // interpolated from RetrievalOps' constants — the SAME values that
    // parameterize bm25TopK's defaults — so implementation and oracle
    // cannot silently diverge on nTerms (raw interpolator: \s must
    // survive verbatim).
    "q89_bm25_topk" ->
      (raw"""WITH """ + bm25CoreCtes + raw"""
         SELECT qid, hit_id, score, rk FROM (""" + bm25RankedSql + raw""")
         WHERE rk <= ${RetrievalOps.DefaultK} ORDER BY qid, rk"""),
    // q279: pseudo-relevance-feedback expansion — top-3 summed-TF
    // terms across each query's BM25 top-5 feedback docs, own terms
    // excluded; shares the q89 CTE chain so the feedback ranking
    // cannot drift from the gate (RetrievalOps.prfExpansion)
    "q279_prf_expansion" ->
      (raw"""WITH """ + bm25CoreCtes + raw""",
         bm AS (SELECT qid, hit_id FROM (""" + bm25RankedSql + raw""")
           WHERE rk <= ${RetrievalOps.DefaultK}),
         fb AS (SELECT b.qid, t.tok, CAST(sum(t.tf) AS BIGINT) AS sum_tf
                FROM tfp t JOIN bm b ON t.doc_id = b.hit_id
                WHERE NOT EXISTS (SELECT 1 FROM qt
                  WHERE qt.qid = b.qid AND qt.tok = t.tok)
                GROUP BY 1, 2),
         ranked AS (SELECT qid, tok, sum_tf,
             CAST(row_number() OVER (PARTITION BY qid
               ORDER BY sum_tf DESC, tok) AS INT) AS exp_rank
           FROM fb)
         SELECT qid, exp_rank, tok AS exp_term, sum_tf
         FROM ranked WHERE exp_rank <= 3 ORDER BY qid, exp_rank"""),
    // q92: IVF upsert — codebook trained on the base partition only,
    // batch assigned against the frozen codebook; min/max over the
    // 4dp-rounded assignment cosines are order-independent and growth is
    // one exact-int division, so the report is cell-exact (q70 contract)
    "q92_ivf_upsert" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
            FROM embeddings),
         eb AS (SELECT * FROM e WHERE vec_id % 5 <> 0),
         en AS (SELECT * FROM e WHERE vec_id % 5 = 0),
         dims AS (
           SELECT label, i.range AS d, round(avg(v[i.range]), 6) AS c
           FROM eb, range(1, 65) i GROUP BY 1, 2),
         cent AS (SELECT label AS clabel, list(c ORDER BY d) AS cv
                  FROM dims GROUP BY 1),
         basg AS (
           SELECT vec_id, clabel AS ivf_list FROM (
             SELECT eb.vec_id, cent.clabel,
               row_number() OVER (PARTITION BY eb.vec_id ORDER BY
                 round(list_inner_product(eb.v, cent.cv) /
                   (sqrt(list_inner_product(eb.v, eb.v)) *
                    sqrt(list_inner_product(cent.cv, cent.cv))), 4) DESC,
                 cent.clabel) AS crk
             FROM eb CROSS JOIN cent)
           WHERE crk = 1),
         nasg AS (
           SELECT vec_id, clabel AS ivf_list, ccos FROM (
             SELECT en.vec_id, cent.clabel,
               round(list_inner_product(en.v, cent.cv) /
                 (sqrt(list_inner_product(en.v, en.v)) *
                  sqrt(list_inner_product(cent.cv, cent.cv))), 4) AS ccos,
               row_number() OVER (PARTITION BY en.vec_id ORDER BY
                 round(list_inner_product(en.v, cent.cv) /
                   (sqrt(list_inner_product(en.v, en.v)) *
                    sqrt(list_inner_product(cent.cv, cent.cv))), 4) DESC,
                 cent.clabel) AS crk
             FROM en CROSS JOIN cent)
           WHERE crk = 1),
         bc AS (SELECT ivf_list, count(*) AS n_base FROM basg GROUP BY 1),
         nc AS (SELECT ivf_list, count(*) AS n_new,
                  min(ccos) AS min_cos_new, max(ccos) AS max_cos_new
                FROM nasg GROUP BY 1)
         SELECT coalesce(bc.ivf_list, nc.ivf_list) AS ivf_list,
           coalesce(n_base, 0) AS n_base, coalesce(n_new, 0) AS n_new,
           min_cos_new, max_cos_new,
           round(CAST(coalesce(n_new, 0) AS DOUBLE) /
             CAST(coalesce(n_base, 0) + coalesce(n_new, 0) AS DOUBLE), 4)
             AS growth
         FROM bc FULL OUTER JOIN nc ON bc.ivf_list = nc.ivf_list
         ORDER BY 1""",
    // q94: truncated-prefix rerank — the funnel (prefix coarse scan →
    // shortlist → exact rerank) is replayed stage-for-stage; prefix
    // slices are float→double exact on both engines, both cosines round
    // 4dp with the standard vec_id tiebreaks
    "q94_prefix_rerank" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
            FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e
               WHERE vec_id < 8),
         coarse AS (
           SELECT q.query_id, e.vec_id, e.v, q.qv,
             round(list_inner_product(qv[1:16], v[1:16]) /
               (sqrt(list_inner_product(qv[1:16], qv[1:16])) *
                sqrt(list_inner_product(v[1:16], v[1:16]))), 4) AS pcos
           FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
         cand AS (
           SELECT query_id, vec_id, v, qv FROM (
             SELECT query_id, vec_id, v, qv,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY pcos DESC, vec_id) AS prk
             FROM coarse)
           WHERE prk <= 20),
         scored AS (
           SELECT query_id, vec_id,
             round(list_inner_product(qv, v) /
               (sqrt(list_inner_product(qv, qv)) *
                sqrt(list_inner_product(v, v))), 4) AS cos
           FROM cand)
         SELECT query_id, vec_id AS neighbor_id, cos, rk FROM (
           SELECT query_id, vec_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, vec_id) AS INT) AS rk
           FROM scored)
         WHERE rk <= 5 ORDER BY query_id, rk""",
    // q95: PCA power iteration — the fixed-point corpus-sum device:
    // quantized centered coordinates and direction make s, s·x_d, and
    // every per-dim corpus sum exact BIGINT/HUGEINT arithmetic
    // (order-independent); FP only at the two normalization boundaries
    // (index-ordered norm dot, 6dp components), both replayed here
    "q95_pca_power" ->
      ("WITH " + pcaPowerCte + """
         SELECT CAST(i.range AS BIGINT) AS d, v[i.range] AS loading
         FROM v2, range(1, 65) i ORDER BY 1"""),
    // q96: common-component removal — the q95 chain feeds a row-local
    // projection x' = x - (x·v)v; per-label min/max corrected norms are
    // order-independent over a deterministic row-local op sequence
    "q96_abtt_removal" ->
      ("WITH " + pcaPowerCte + """,
         corr AS (
           SELECT e.label,
             round(sqrt(list_inner_product(
               [e.v[i] - list_inner_product(e.v, v2.v) * v2.v[i]
                  for i in range(1, 65)],
               [e.v[i] - list_inner_product(e.v, v2.v) * v2.v[i]
                  for i in range(1, 65)])), 4) AS nrm
           FROM e CROSS JOIN v2)
         SELECT label, count(*) AS n, min(nrm) AS min_norm,
           max(nrm) AS max_norm
         FROM corr GROUP BY 1 ORDER BY 1"""),
    // q101: ANN recall@5 of the probed IVF index vs exact brute force —
    // both top-k pipelines replicated via the shared assignment CTE
    // (the q70/q31 formulations verbatim), then an integer intersection
    // count and ONE division by the constant k
    "q101_ann_recall" ->
      ("WITH " + ivfAssignCte + """,
         probes AS (
           SELECT query_id, qv, clabel AS ivf_list FROM (
             SELECT e.vec_id AS query_id, e.v AS qv, cent.clabel,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_inner_product(e.v, cent.cv) /
                   (sqrt(list_inner_product(e.v, e.v)) *
                    sqrt(list_inner_product(cent.cv, cent.cv))), 4) DESC,
                 cent.clabel) AS crk
             FROM e CROSS JOIN cent WHERE e.vec_id < 8)
           WHERE crk <= 2),
         iv AS (SELECT query_id, vec_id FROM (
             SELECT p.query_id, a.vec_id,
               row_number() OVER (PARTITION BY p.query_id ORDER BY
                 round(list_inner_product(p.qv, a.v) /
                   (sqrt(list_inner_product(p.qv, p.qv)) *
                    sqrt(list_inner_product(a.v, a.v))), 4) DESC,
                 a.vec_id) AS rk
             FROM asg a JOIN probes p USING (ivf_list)
             WHERE a.vec_id <> p.query_id)
           WHERE rk <= 5),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         bf AS (SELECT query_id, vec_id FROM (
             SELECT q.query_id, e.vec_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 round(list_inner_product(q.qv, e.v) /
                   (sqrt(list_inner_product(q.qv, q.qv)) *
                    sqrt(list_inner_product(e.v, e.v))), 4) DESC,
                 e.vec_id) AS rk
             FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id)
           WHERE rk <= 5),
         hits AS (SELECT query_id, count(*) AS n_hits
                  FROM iv JOIN bf USING (query_id, vec_id) GROUP BY 1)
         SELECT qq.query_id, CAST(coalesce(h.n_hits, 0) AS BIGINT)
             AS n_hits,
           round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 5.0, 4) AS recall
         FROM (SELECT DISTINCT query_id FROM bf) qq
         LEFT JOIN hits h USING (query_id) ORDER BY query_id"""),
    // q102: binary-quantization Hamming top-k — sign bits packed into
    // two BIGINT words (distinct powers of two, so list_sum == bit-or),
    // XOR + popcount distance; pure integers, total (hamming, vec_id)
    // order
    "q102_hamming_topk" ->
      """WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
         c AS (SELECT vec_id,
             CAST(list_sum([CASE WHEN v[i + 1] > 0
                 THEN (1::BIGINT << i) ELSE 0::BIGINT END
               for i in range(0, 32)]) AS BIGINT) AS b_lo,
             CAST(list_sum([CASE WHEN v[i + 33] > 0
                 THEN (1::BIGINT << i) ELSE 0::BIGINT END
               for i in range(0, 32)]) AS BIGINT) AS b_hi
           FROM e),
         q AS (SELECT vec_id AS query_id, b_lo AS q_lo, b_hi AS q_hi
               FROM c WHERE vec_id < 8)
         SELECT query_id, neighbor_id, hamming, rk FROM (
           SELECT q.query_id, c.vec_id AS neighbor_id,
             CAST(bit_count(xor(c.b_lo, q.q_lo))
                + bit_count(xor(c.b_hi, q.q_hi)) AS INT) AS hamming,
             CAST(row_number() OVER (PARTITION BY q.query_id ORDER BY
                 bit_count(xor(c.b_lo, q.q_lo))
                 + bit_count(xor(c.b_hi, q.q_hi)), c.vec_id) AS INT) AS rk
           FROM c CROSS JOIN q WHERE c.vec_id <> q.query_id)
         WHERE rk <= 5 ORDER BY query_id, rk""",
    // q115: hard negatives — q31's brute cosine with the band filter on
    // the ROUNDED score (the q32 threshold rule)
    "q115_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                    FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         scored AS (
           SELECT query_id, vec_id,
             round(list_inner_product(qv, v) /
               (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(v, v))), 4) AS cos
           FROM q CROSS JOIN c WHERE vec_id <> query_id)
         SELECT query_id, vec_id AS neighbor_id, cos, rk FROM (
           SELECT query_id, vec_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, vec_id) AS INT) AS rk
           FROM scored WHERE cos >= 0.20 AND cos < 0.45)
         WHERE rk <= 5 ORDER BY query_id, rk""",
    // q145: Kendall tau over the COMMON neighbors of the exact-cosine
    // and Hamming-sketch top-20 rankings — integer pair counts, one
    // division/round per query
    "q145_rank_corr" ->
      """WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
         c AS (SELECT vec_id,
             CAST(list_sum([CASE WHEN v[i + 1] > 0
                 THEN (1::BIGINT << i) ELSE 0::BIGINT END
               for i in range(0, 32)]) AS BIGINT) AS b_lo,
             CAST(list_sum([CASE WHEN v[i + 33] > 0
                 THEN (1::BIGINT << i) ELSE 0::BIGINT END
               for i in range(0, 32)]) AS BIGINT) AS b_hi
           FROM e),
         q AS (SELECT vec_id AS query_id, b_lo AS q_lo, b_hi AS q_hi
               FROM c WHERE vec_id < 8),
         hb AS (SELECT query_id, neighbor_id, rk AS rb FROM (
           SELECT q.query_id, c.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.query_id ORDER BY
               bit_count(xor(c.b_lo, q.q_lo))
                 + bit_count(xor(c.b_hi, q.q_hi)), c.vec_id) AS rk
           FROM c JOIN q ON c.vec_id <> q.query_id) WHERE rk <= 20),
         qa AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                FROM embeddings WHERE vec_id < 8),
         ca2 AS (SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings),
         ea AS (SELECT query_id, neighbor_id, rk AS ra FROM (
           SELECT query_id, vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY
               round(list_inner_product(qv, vv) /
                 (sqrt(list_inner_product(qv, qv)) *
                  sqrt(list_inner_product(vv, vv))), 4) DESC, vec_id) AS rk
           FROM qa CROSS JOIN ca2 WHERE vec_id <> query_id) WHERE rk <= 20),
         com AS (SELECT ea.query_id, ea.neighbor_id, ra, rb
           FROM ea JOIN hb USING (query_id, neighbor_id)),
         p AS (SELECT x.query_id,
             ((x.ra - y.ra) * (x.rb - y.rb) > 0) AS conc
           FROM com x JOIN com y ON x.query_id = y.query_id
             AND x.neighbor_id < y.neighbor_id),
         ag AS (SELECT query_id,
             CAST(sum(CASE WHEN conc THEN 1 ELSE 0 END) AS BIGINT)
               AS concordant,
             CAST(sum(CASE WHEN conc THEN 0 ELSE 1 END) AS BIGINT)
               AS discordant
           FROM p GROUP BY 1),
         nc AS (SELECT query_id, count(*) AS n_common FROM com GROUP BY 1)
         SELECT ag.query_id, nc.n_common, ag.concordant, ag.discordant,
           round((ag.concordant - ag.discordant)::DOUBLE /
             (nc.n_common * (nc.n_common - 1) / 2), 4) AS tau
         FROM ag JOIN nc USING (query_id) WHERE nc.n_common >= 2
         ORDER BY query_id""",
    // q166: pairwise label-centroid L2 on the 2^10 integer grid (the
    // q95 quantize/centroid contract); d2 exact BIGINT, one sqrt/÷2^10
    "q166_centroid_dists" ->
      ("WITH " + embedCentroidCte + """
         SELECT a.label AS label_a, b.label AS label_b,
           CAST(list_sum([(a.cq[i] - b.cq[i]) * (a.cq[i] - b.cq[i])
             for i in range(1, 65)]) AS BIGINT) AS d2,
           round(sqrt(CAST(list_sum([(a.cq[i] - b.cq[i]) *
             (a.cq[i] - b.cq[i]) for i in range(1, 65)]) AS DOUBLE))
             / 1024.0, 4) AS dist
         FROM cent a JOIN cent b ON a.label < b.label
         ORDER BY label_a, label_b"""),
    // q167: log2 histogram of exact integer squared norms per label
    // (the q129 bin-length band)
    "q167_norm_bands" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
             FROM embeddings),
         xq AS (SELECT vec_id, label, list_transform(v,
             x -> CAST(round(x * 1024) AS BIGINT)) AS q FROM e),
         n2 AS (SELECT label, CAST(list_sum([q[i] * q[i]
             for i in range(1, 65)]) AS BIGINT) AS q2 FROM xq)
         SELECT label,
           CAST(CASE WHEN q2 <= 0 THEN 0
             ELSE length(bin(q2)) - 1 END AS BIGINT) AS norm2_band,
           count(*) AS n_vecs
         FROM n2 GROUP BY label, norm2_band
         ORDER BY label, norm2_band""",
    // q168: intra-label cohesion with NO floats — cos ≥ 0.5 via
    // 4·dot² ≥ |q|²·|c|² ∧ dot ≥ 0; cos < 0 via dot < 0
    "q168_label_cohesion" ->
      ("WITH " + embedCentroidCte + """,
         j AS (SELECT x.label,
             CAST(list_sum([x.q[i] * c.cq[i] for i in range(1, 65)])
               AS BIGINT) AS dp,
             CAST(list_sum([x.q[i] * x.q[i] for i in range(1, 65)])
               AS BIGINT) AS q2,
             CAST(list_sum([c.cq[i] * c.cq[i] for i in range(1, 65)])
               AS BIGINT) AS c2
           FROM xq x JOIN cent c ON x.label = c.label)
         SELECT label, count(*) AS n_vecs,
           CAST(sum(CASE WHEN dp >= 0 AND dp * dp * 4 >= q2 * c2
             THEN 1 ELSE 0 END) AS BIGINT) AS n_close,
           CAST(sum(CASE WHEN dp < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_neg
         FROM j GROUP BY label ORDER BY label"""),
    // q190: recall@k at nprobe 1/2/4 vs brute force — the q101 chain
    // swept over the probe knob; one shared assignment + bf
    "q190_probe_curve" ->
      ("WITH " + ivfAssignCte + ",\n         " +
        Seq(1, 2, 4).map(probeIvSql).mkString(",\n         ") + """,
         q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         bf AS (SELECT query_id, vec_id FROM (
             SELECT q.query_id, e.vec_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 round(list_inner_product(q.qv, e.v) /
                   (sqrt(list_inner_product(q.qv, q.qv)) *
                    sqrt(list_inner_product(e.v, e.v))), 4) DESC,
                 e.vec_id) AS rk
             FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id)
           WHERE rk <= 5)
         SELECT nprobe, n_hits,
           round(CAST(n_hits AS DOUBLE) / 40.0, 4) AS recall_at_k
         FROM (
           SELECT 1 AS nprobe, CAST(count(*) AS BIGINT) AS n_hits
           FROM iv1 JOIN bf USING (query_id, vec_id)
           UNION ALL
           SELECT 2, CAST(count(*) AS BIGINT)
           FROM iv2 JOIN bf USING (query_id, vec_id)
           UNION ALL
           SELECT 4, CAST(count(*) AS BIGINT)
           FROM iv4 JOIN bf USING (query_id, vec_id))
         ORDER BY nprobe"""),
    // q324: k-means|| init vs md5-uniform sample — the full ||-chain
    // (seed, 3 d²-sampling rounds on the integer grid, weighted top-k
    // reduction) unrolled CTE-for-CTE, then each codebook profiled on
    // the q194 balance ratio and the q101 recall protocol
    "q324_init_compare" -> kppCompareSql,
    // q194: IVF inverted-list balance from the shared assignment chain;
    // integer imbalance = 1000·max/mean
    "q194_ivf_balance" ->
      ("WITH " + ivfAssignCte + """,
         sz AS (SELECT ivf_list, count(*) AS sz FROM asg GROUP BY 1)
         SELECT count(*) AS n_lists, CAST(sum(sz) AS BIGINT) AS n_vecs,
           CAST(min(sz) AS BIGINT) AS min_size,
           CAST(max(sz) AS BIGINT) AS max_size,
           CAST((max(sz) * count(*) * 1000) // sum(sz) AS BIGINT)
             AS imbalance_x1000
         FROM sz"""),
    // q198: Rayleigh quotient of the q95 component over total centered
    // variance — exact integer/HUGEINT sums, one mirrored division
    "q198_pca_variance" ->
      ("WITH " + pcaPowerCte + """,
         vqf AS (SELECT list_transform(v,
             x -> CAST(round(x * 1024) AS BIGINT)) AS vq FROM v2),
         sc AS (SELECT
             CAST(list_inner_product(xc.c::DOUBLE[], vqf.vq::DOUBLE[])
               AS BIGINT) AS s,
             CAST(list_inner_product(xc.c::DOUBLE[], xc.c::DOUBLE[])
               AS BIGINT) AS c2
           FROM xc CROSS JOIN vqf),
         st AS (SELECT count(*) AS n,
             CAST(sum(CAST(s AS HUGEINT) * s) AS HUGEINT) AS s2,
             CAST(sum(CAST(c2 AS HUGEINT)) AS HUGEINT) AS xc2 FROM sc),
         vn AS (SELECT CAST(list_inner_product(vq::DOUBLE[], vq::DOUBLE[])
             AS BIGINT) AS vq2 FROM vqf)
         SELECT CAST(n AS BIGINT) AS n_vecs,
           round(CAST(s2 AS DOUBLE) /
             (CAST(vq2 AS DOUBLE) * CAST(xc2 AS DOUBLE)), 6)
             AS var_explained
         FROM st, vn"""),
    // q207: label-relevance nDCG@10 — discounts are the literal
    // millionths table 1e6/log2(rk+1) on BOTH engines (no cross-engine
    // log); DCG/IDCG integer sums, one 6dp division; IDCG truncates at
    // min(10, n_rel) via the cumulative table
    "q207_ndcg_label" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                    FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel
               FROM e WHERE vec_id < 8),
         sc AS (SELECT q.query_id, q.qlabel, e.vec_id, e.label,
             round(list_inner_product(q.qv, e.v) /
               (sqrt(list_inner_product(q.qv, q.qv)) *
                sqrt(list_inner_product(e.v, e.v))), 4) AS cos
           FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
         rk AS (SELECT query_id, qlabel, label,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, vec_id) AS rnk
           FROM sc),
         dt AS (SELECT * FROM (VALUES (1, 1000000), (2, 630930),
             (3, 500000), (4, 430677), (5, 386853), (6, 356207),
             (7, 333333), (8, 315465), (9, 301030), (10, 289065))
           AS t(rnk, d)),
         ic AS (SELECT * FROM (VALUES (1, 1000000), (2, 1630930),
             (3, 2130930), (4, 2561607), (5, 2948460), (6, 3304667),
             (7, 3638000), (8, 3953465), (9, 4254495), (10, 4543560))
           AS t(j, cum)),
         dcg AS (SELECT query_id,
             CAST(sum(CASE WHEN label = qlabel THEN d ELSE 0 END)
               AS BIGINT) AS dcg_e6
           FROM rk JOIN dt USING (rnk) WHERE rnk <= 10 GROUP BY 1),
         lc AS (SELECT label, count(*) AS n_lab FROM e GROUP BY 1),
         base AS (SELECT q.query_id,
             CAST(coalesce(lc.n_lab, 1) - 1 AS BIGINT) AS n_rel
           FROM q LEFT JOIN lc ON q.qlabel = lc.label)
         SELECT b.query_id, b.n_rel,
           coalesce(dcg.dcg_e6, 0) AS dcg_e6,
           CASE WHEN b.n_rel <= 0 THEN 0.0
                ELSE round(CAST(coalesce(dcg.dcg_e6, 0) AS DOUBLE) /
                  (SELECT cum FROM ic WHERE j = least(b.n_rel, 10)), 6)
           END AS ndcg
         FROM base b LEFT JOIN dcg USING (query_id) ORDER BY query_id""",
    // q218: first-relevant rank + integer-millionths reciprocal (floor
    // division — no FP); rank over the full exact ordering, 0 when no
    // relevant neighbor exists
    "q218_mrr_label" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                    FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel
               FROM e WHERE vec_id < 8),
         sc AS (SELECT q.query_id, q.qlabel, e.vec_id, e.label,
             round(list_inner_product(q.qv, e.v) /
               (sqrt(list_inner_product(q.qv, q.qv)) *
                sqrt(list_inner_product(e.v, e.v))), 4) AS cos
           FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
         rk AS (SELECT query_id, qlabel, label,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, vec_id) AS rnk
           FROM sc),
         fr AS (SELECT query_id, CAST(min(rnk) AS BIGINT)
                  AS first_rel_rank
                FROM rk WHERE label = qlabel GROUP BY 1)
         SELECT q.query_id,
           coalesce(fr.first_rel_rank, 0) AS first_rel_rank,
           CASE WHEN fr.first_rel_rank IS NULL THEN 0
                ELSE 1000000 // fr.first_rel_rank END AS recip_e6
         FROM q LEFT JOIN fr USING (query_id) ORDER BY query_id""",
    // q226: reciprocal-rank fusion — BM25 top-25 (the q89 chain at
    // k=25) fused with dense cosine top-25 (the q31 chain) via
    // RRF = Σ 1000000 // (60 + rank): only integer RANKS cross the
    // fusion boundary, never either list's float scores, so the fused
    // order is exact on both engines
    "q226_rrf_fusion" ->
      raw"""WITH d0 AS (
           SELECT doc_id, string_split(
             regexp_replace(lower(trim(coalesce(text, ''))), '\s+', ' ',
               'g'), ' ') AS w
           FROM documents),
         post AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
                    unnest(w) AS tok FROM d0),
         tfp AS (SELECT doc_id, dl, tok, count(*) AS tf
                 FROM post GROUP BY 1, 2, 3),
         st AS (SELECT count(*) AS n_docs,
                  sum(CAST(len(w) AS BIGINT)) AS sum_dl FROM d0),
         qt AS (
           SELECT doc_id AS qid, tok,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY tf DESC, tok) AS INT) AS t_rank
           FROM tfp WHERE doc_id < ${RetrievalOps.DefaultNQueries}
           QUALIFY row_number() OVER (PARTITION BY doc_id
             ORDER BY tf DESC, tok) <= ${RetrievalOps.DefaultNTerms}),
         cand AS (SELECT qt.qid, qt.t_rank, tfp.doc_id, tfp.dl,
                    tfp.tok, tfp.tf
                  FROM tfp JOIN qt USING (tok)),
         dfc AS (SELECT tok, count(*) AS df FROM
                   (SELECT DISTINCT tok, doc_id FROM cand) GROUP BY 1),
         contrib AS (
           SELECT cand.qid, cand.doc_id, cand.t_rank,
             round(
               round(ln((CAST(st.n_docs AS DOUBLE) - CAST(dfc.df AS DOUBLE)
                   + 0.5) / (CAST(dfc.df AS DOUBLE) + 0.5) + 1.0), 6)
               * (CAST(cand.tf AS DOUBLE) * (1.2 + 1.0) /
                  (CAST(cand.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 *
                    (CAST(cand.dl * st.n_docs AS DOUBLE) /
                     CAST(st.sum_dl AS DOUBLE))))), 6) AS c
           FROM cand JOIN dfc USING (tok) CROSS JOIN st),
         bm AS (
           SELECT qid, hit_id, rk FROM (
             SELECT qid, doc_id AS hit_id,
               CAST(row_number() OVER (PARTITION BY qid
                 ORDER BY score DESC, doc_id) AS INT) AS rk
             FROM (SELECT qid, doc_id,
                     round(${RetrievalOps.oracleSlotSql(
                       RetrievalOps.DefaultNTerms)},
                       4) AS score
                   FROM contrib GROUP BY 1, 2))
           WHERE rk <= 25),
         q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings
               WHERE vec_id < ${RetrievalOps.DefaultNQueries}),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         dn AS (
           SELECT query_id AS qid, vec_id AS hit_id, rk FROM (
             SELECT query_id, vec_id,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, vec_id) AS INT) AS rk
             FROM (SELECT query_id, vec_id,
                     round(list_inner_product(qv, v) /
                       (sqrt(list_inner_product(qv, qv)) *
                        sqrt(list_inner_product(v, v))), 4) AS cos
                   FROM q CROSS JOIN c WHERE vec_id <> query_id))
           WHERE rk <= 25),
         u AS (
           SELECT coalesce(bm.qid, dn.qid) AS qid,
             coalesce(bm.hit_id, dn.hit_id) AS hit_id,
             CAST(coalesce(bm.rk, 0) AS INT) AS rk_sparse,
             CAST(coalesce(dn.rk, 0) AS INT) AS rk_dense,
             CAST(coalesce(1000000 // (60 + bm.rk), 0) +
                  coalesce(1000000 // (60 + dn.rk), 0) AS BIGINT) AS rrf_e6
           FROM bm FULL OUTER JOIN dn
             ON bm.qid = dn.qid AND bm.hit_id = dn.hit_id)
         SELECT qid, hit_id, rk_sparse, rk_dense, rrf_e6, rk FROM (
           SELECT u.*, CAST(row_number() OVER (PARTITION BY qid
             ORDER BY rrf_e6 DESC, hit_id) AS INT) AS rk FROM u)
         WHERE rk <= 10 ORDER BY qid, rk""",
    // q246: MMR diversified rerank — greedy rounds replayed as
    // MATERIALIZED CTEs (the q173/q225 rule), every score an integer
    // (4dp cosine scaled to ten-thousandths, λ as the 7/3 pair); the
    // round chain is GENERATED from SimilarityOps' own operating point
    // so the engines cannot diverge on k or λ
    "q246_mmr_rerank" -> mmrSql,
    // q253: hardest positive/negative per anchor on the 4dp→integer
    // grid; min-vec_id ties; negative margins are the expected result
    // on these structureless synthetic labels (the q207-family finding)
    "q253_triplet_mine" ->
      """WITH a AS (SELECT vec_id AS anchor_id, label AS a_label,
                      embedding::DOUBLE[] AS av
                    FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
         s AS (SELECT anchor_id, a_label, vec_id, label,
                 CAST(round(round(list_inner_product(av, v) /
                   (sqrt(list_inner_product(av, av)) *
                    sqrt(list_inner_product(v, v))), 4) * 10000, 0)
                   AS BIGINT) AS m
               FROM a CROSS JOIN c WHERE vec_id <> anchor_id),
         pos AS (SELECT anchor_id, a_label AS label, vec_id AS pos_id,
                   m AS pos_m
                 FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                         ORDER BY m DESC, vec_id) AS rn
                       FROM s WHERE label = a_label) WHERE rn = 1),
         neg AS (SELECT anchor_id, vec_id AS neg_id, m AS neg_m
                 FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                         ORDER BY m DESC, vec_id) AS rn
                       FROM s WHERE label <> a_label) WHERE rn = 1)
         SELECT pos.anchor_id, label, pos_id, pos_m, neg_id, neg_m,
           pos_m - neg_m AS margin_m,
           CASE WHEN pos_m > neg_m THEN 1 ELSE 0 END AS separated
         FROM pos JOIN neg ON pos.anchor_id = neg.anchor_id
         ORDER BY pos.anchor_id"""
  )

  /** Generated q246 oracle: one `s{r}`/`a{r}` CTE pair per greedy
    * round, parameterized by [[graft.operators.SimilarityOps]]'
    * q246 constants.
    */
  private def mmrSql: String = {
    import graft.operators.SimilarityOps.{MmrK, MmrLamX10, MmrNCand, MmrNQueries}
    val lamC = 10L - MmrLamX10
    val cosSql = (a: String, b: String) =>
      s"round(list_inner_product($a, $b) / " +
        s"(sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b))), 4)"
    val head =
      s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id < $MmrNQueries),
          c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          cand AS MATERIALIZED (
            SELECT query_id, vec_id, v, qm FROM (
              SELECT query_id, vec_id, v,
                CAST(round(${cosSql("qv", "v")} * 10000, 0) AS BIGINT) AS qm,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY ${cosSql("qv", "v")} DESC, vec_id) AS rk
              FROM q CROSS JOIN c WHERE vec_id <> query_id)
            WHERE rk <= $MmrNCand),
          pair AS MATERIALIZED (
            SELECT a.query_id, a.vec_id AS ca, b.vec_id AS cb,
              CAST(round(${cosSql("a.v", "b.v")} * 10000, 0) AS BIGINT) AS pm
            FROM cand a JOIN cand b
              ON a.query_id = b.query_id AND a.vec_id <> b.vec_id),
          s1 AS MATERIALIZED (
            SELECT query_id, vec_id, qm, CAST(0 AS BIGINT) AS ms,
              1 AS mmr_rank
            FROM (SELECT query_id, vec_id, qm,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY qm DESC, vec_id) AS rn FROM cand)
            WHERE rn = 1),
          a1 AS (SELECT * FROM s1)"""
    val rounds = (2 to MmrK).map { r =>
      val p = r - 1
      s""",
          s$r AS MATERIALIZED (
            SELECT query_id, vec_id, qm, ms, $r AS mmr_rank FROM (
              SELECT c.query_id, c.vec_id, c.qm, m.ms,
                row_number() OVER (PARTITION BY c.query_id
                  ORDER BY $MmrLamX10 * c.qm - $lamC * m.ms DESC,
                    c.vec_id) AS rn
              FROM cand c
              JOIN (SELECT p.query_id, p.ca AS vec_id, max(p.pm) AS ms
                    FROM pair p JOIN a$p s
                      ON p.query_id = s.query_id AND p.cb = s.vec_id
                    GROUP BY 1, 2) m
                ON c.query_id = m.query_id AND c.vec_id = m.vec_id
              WHERE NOT EXISTS (SELECT 1 FROM a$p s
                WHERE s.query_id = c.query_id AND s.vec_id = c.vec_id))
            WHERE rn = 1),
          a$r AS (SELECT * FROM a$p UNION ALL SELECT * FROM s$r)"""
    }.mkString
    val tail =
      s"""
          SELECT query_id, vec_id, mmr_rank, qm AS relevance_m,
            ms AS penalty_m,
            $MmrLamX10 * qm - $lamC * ms AS mmr_m
          FROM a$MmrK ORDER BY query_id, mmr_rank"""
    head + rounds + tail
  }

  /** The 4dp-grid cosine (scaled to the 10⁴ integer grid) — shared by
    * every q324 CTE so the distance/ordering grid cannot drift within
    * the chain.
    */
  private def kCos(a: String, b: String): String =
    s"round(list_inner_product($a, $b) / (sqrt(list_inner_product($a, $a))" +
      s" * sqrt(list_inner_product($b, $b))) * 10000, 0)"

  /** One k-means|| round: min-d² per vector against `prev`, φ, the
    * cross-multiplied md5-coin Bernoulli sample, candidate union
    * (dedup by cid). Mirrors SimilarityOps.kMeansParallelInit round r.
    */
  private def kppRoundCte(r: Int, prev: String): String =
    s"""
 a$r AS (SELECT vec_id, v, min(dbp * dbp) AS d2 FROM (
     SELECT e.vec_id, e.v,
       10000 - CAST(${kCos("e.v", "c.cv")} AS BIGINT) AS dbp
     FROM e CROSS JOIN $prev c)
   GROUP BY vec_id, v),
 p$r AS (SELECT sum(d2)::HUGEINT AS phi FROM a$r),
 s$r AS (SELECT vec_id AS cid, v AS cv FROM a$r, p$r, kk
   WHERE (CAST(list_sum([(strpos('0123456789abcdef',
              substr(md5(vec_id || '_r${r}_7'), i, 1)) - 1)::BIGINT
            * (1::BIGINT << (4*(5-i))) for i in range(1, 6)]) AS BIGINT)
          % 1000000)::HUGEINT * phi
     < (2 * k)::HUGEINT * d2 * 1000000),
 c$r AS (SELECT cid, cv FROM (
     SELECT cid, cv, row_number() OVER (PARTITION BY cid ORDER BY cid) AS rn
     FROM (SELECT * FROM $prev UNION ALL SELECT * FROM s$r)) WHERE rn = 1)"""

  /** Argmax-cosine assignment of the corpus to codebook `cent`. */
  private def kppAsgCte(name: String, cent: String): String =
    s"""
 $name AS (SELECT vec_id, clabel AS ivf_list FROM (
     SELECT e.vec_id, $cent.clabel,
       row_number() OVER (PARTITION BY e.vec_id ORDER BY
         ${kCos("e.v", cent + ".cv")} DESC, $cent.clabel) AS crk
     FROM e CROSS JOIN $cent) WHERE crk = 1)"""

  /** q194-style balance rollup over an assignment. */
  private def kppBalCte(name: String, asg: String): String =
    s"""
 $name AS (SELECT count(*)::BIGINT AS n_lists,
     CAST(sum(sz) AS BIGINT) AS n_vecs, CAST(max(sz) AS BIGINT) AS max_size,
     CAST((max(sz) * count(*) * 1000) // sum(sz) AS BIGINT)
       AS imbalance_x1000
   FROM (SELECT ivf_list, count(*) AS sz FROM $asg GROUP BY 1))"""

  /** q101-protocol recall: nProbe=2 probe lists, probed top-5, summed
    * hits against the shared brute-force panel `bf`.
    */
  private def kppRecallCte(tag: String, cent: String, asg: String): String =
    s"""
 probes$tag AS (SELECT query_id, qv, clabel AS ivf_list FROM (
     SELECT e.vec_id AS query_id, e.v AS qv, $cent.clabel,
       row_number() OVER (PARTITION BY e.vec_id ORDER BY
         ${kCos("e.v", cent + ".cv")} DESC, $cent.clabel) AS crk
     FROM e CROSS JOIN $cent WHERE e.vec_id < 8) WHERE crk <= 2),
 iv$tag AS (SELECT query_id, vec_id FROM (
     SELECT p.query_id, a.vec_id,
       row_number() OVER (PARTITION BY p.query_id ORDER BY
         ${kCos("p.qv", "ev.v")} DESC, a.vec_id) AS rk
     FROM $asg a JOIN e ev USING (vec_id) JOIN probes$tag p USING (ivf_list)
     WHERE a.vec_id <> p.query_id) WHERE rk <= 5),
 hits$tag AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS sum_hits FROM (
     SELECT count(*) AS n FROM iv$tag JOIN bf USING (query_id, vec_id)
     GROUP BY query_id))"""

  /** The full q324 oracle: sampled codebook (q80's scent chain),
    * ||-init codebook (seed + 3 rounds + weighted top-k), both
    * balance- and recall-profiled.
    */
  private def kppCompareSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 kk AS (SELECT greatest(2, least(1048576,
     CAST(ceil(count(*) / 100.0) AS BIGINT))) AS k FROM e),
 hs AS (SELECT vec_id, v, md5(vec_id || '_' || 7) AS h FROM e),
 scent AS (SELECT CAST(row_number() OVER (ORDER BY h, vec_id) AS BIGINT)
       AS clabel, v AS cv
   FROM hs QUALIFY row_number() OVER (ORDER BY h, vec_id)
     <= (SELECT k FROM kk)),
 c0 AS (SELECT vec_id AS cid, v AS cv FROM (
     SELECT vec_id, v, md5(vec_id || '_kpp_7') AS h FROM e
     ORDER BY h, vec_id LIMIT 1)),
${kppRoundCte(1, "c0")},${kppRoundCte(2, "c1")},${kppRoundCte(3, "c2")},
 wasg AS (SELECT cid FROM (
     SELECT e.vec_id, c.cid,
       row_number() OVER (PARTITION BY e.vec_id ORDER BY
         ${kCos("e.v", "c.cv")} DESC, c.cid) AS crk
     FROM e CROSS JOIN c3 c) WHERE crk = 1),
 votes AS (SELECT cid, count(*)::BIGINT AS wt FROM wasg GROUP BY 1),
 pcent AS (SELECT CAST(row_number() OVER (ORDER BY coalesce(wt, 0) DESC,
       cid) AS BIGINT) AS clabel, cv
   FROM c3 LEFT JOIN votes USING (cid)
   QUALIFY row_number() OVER (ORDER BY coalesce(wt, 0) DESC, cid)
     <= (SELECT k FROM kk)),
 ${OracleCtes.lloydAsgCte("sa1", "scent")},
 ${OracleCtes.lloydCentCte("sdims1", "scent1", "sa1")},
 ${OracleCtes.lloydAsgCte("sa2", "scent1")},
 ${OracleCtes.lloydCentCte("sdims2", "scent2", "sa2")},
 ${OracleCtes.lloydAsgCte("pa1", "pcent")},
 ${OracleCtes.lloydCentCte("pdims1", "pcent1", "pa1")},
 ${OracleCtes.lloydAsgCte("pa2", "pcent1")},
 ${OracleCtes.lloydCentCte("pdims2", "pcent2", "pa2")},
${kppAsgCte("asgS", "scent2")},${kppAsgCte("asgP", "pcent2")},
${kppBalCte("balS", "asgS")},${kppBalCte("balP", "asgP")},
 q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
 bf AS (SELECT query_id, vec_id FROM (
     SELECT q.query_id, e.vec_id,
       row_number() OVER (PARTITION BY q.query_id ORDER BY
         ${kCos("q.qv", "e.v")} DESC, e.vec_id) AS rk
     FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id) WHERE rk <= 5),
${kppRecallCte("S", "scent2", "asgS")},${kppRecallCte("P", "pcent2", "asgP")}
 SELECT 'kmeans_par' AS init, n_lists, n_vecs, max_size, imbalance_x1000,
     sum_hits
   FROM balP, hitsP
 UNION ALL
 SELECT 'sampled', n_lists, n_vecs, max_size, imbalance_x1000, sum_hits
   FROM balS, hitsS
 ORDER BY init"""
}
