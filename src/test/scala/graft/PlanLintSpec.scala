package graft

/** Registry-WIDE plan lint: walks the pre-AQE physical plan of every
  * `SparkEntry.queries` entry on sf0.001 and bans the scale-killer
  * shapes outside explicit, rationale-carrying allowlists. Round 11
  * proved per-query pins don't prevent re-introduction at 305-query
  * scale (q284/q296/q303 brought the single-partition global window
  * back two rounds after it was eliminated; this round's first scan
  * also caught q291) — a registry invariant does, because every NEW
  * query is linted the moment it registers (VERDICT r11 item 2).
  *
  * Shapes and rules:
  *   - partitionless `WindowExec`/`WindowGroupLimitExec`: moves the
  *     whole frame through ONE task — allowed only over frames that
  *     are provably bounded by a CONSTANT, the CALENDAR, or an
  *     enumerable key set, never by data cardinality. The allowlist
  *     names the query AND the window's lead order column, so a new
  *     global window in an allowlisted query still fails.
  *   - `CartesianProductExec`: never (all-pairs with no broadcast).
  *   - `BroadcastNestedLoopJoinExec`: only in queries that document
  *     the broadcast side as bounded by construction (1-row cap/stat
  *     aggregates crossed in, constant probe/query sets, codebooks,
  *     calendar pair frames). Membership is exact — a new BNLJ query
  *     must consciously join the list.
  *   - `ScalaUDF`/`PythonUDF`: never (codegen-opaque; the library's
  *     contract is native expressions only).
  *
  * The allowlists are STRICT both ways: an entry whose query no longer
  * exhibits the shape fails too, so the lists cannot rot into blanket
  * permissions. Allowlist rationale is kept next to each entry; the
  * same inventory is documented in PARITY.md.
  */
class PlanLintSpec extends SparkSpecBase {

  /** query -> lead ORDER BY column names of its sanctioned
    * partitionless windows, each with the bound that justifies it.
    */
  private val globalWindowAllow: Map[String, Set[String]] = Map(
    // calendar-bounded day panels (≤ days rows; a century is ~37k)
    "q112_daily_anomaly"   -> Set("day"),
    "q180_peak_concurrency" -> Set("day"),
    "q187_rolling_revenue" -> Set("day_num"),
    "q278_backlog_ledger"  -> Set("day"),
    "q283_conversion_hazard" -> Set("t_day"),
    "q292_drawdown"        -> Set("day"),
    // calendar² pair frame (≤ days² slopes, volume-independent)
    "q259_theil_sen"       -> Set("s"),
    // two-phase bucket-offset frames: ≤ nBuckets rows by construction
    // (TwoPhaseRank for q284/q291/q296/q303; q130's inline form)
    "q130_dense_ids"       -> Set("bucket"),
    "q284_lorenz_deciles"  -> Set("_bkt"),
    "q291_abc_xyz"         -> Set("_bkt"),
    "q296_lateness_pareto" -> Set("_bkt"),
    "q303_whale_trend"     -> Set("_bkt"),
    "q329_bin_packing"     -> Set("_bkt"), // two rankBy rides
    "q341_sort_pruning"    -> Set("_bkt"), // three rankBy layouts
    // (q351's rankBy windows and 3-row workload BNLJ all execute
    // before its localCheckpoint — the returned plan is a bare scan)
    // constant-sized grids: budget/threshold stacks, probe sets,
    // score grids, top-constant vocab cuts
    "q140_budget_select"   -> Set("k"),   // #budgets × stack rows
    "q171_quality_curve"   -> Set("k"),   // constant threshold grid
    "q182_vocab_budget"    -> Set("cnt"), // top-max(budgets) via limit
    "q297_twonn_ratio"     -> Set("ratio2_ppm"), // 32-probe panel
    "q298_exact_auc"       -> Set("p"),   // ≤1001-key score grid
    // enumerable key sets (metadata-cardinality, not row-cardinality)
    "q146_source_gini"     -> Set("x"),   // documents.source enum
    "q276_apportionment"   -> Set("rem"), // class frame
    "q282_hash_sample"     -> Set("rem"), // class frame
    "q345_neyman_alloc"    -> Set("rem"), // two class frames
    // filtered-to-bounded order keys
    "q21_row_number"       -> Set("o_orderkey"), // 1-day order slice
    // bounded ANN frames: histogram/codebook/query-set cardinality
    "q80_ivf_sized_topk"   -> Set("h"),
    "q88_ivfpq_topk"       -> Set("qv_id", "clabel"),
    // (q324's candidate-frame windows — O(rounds·2k) rows — run inside
    // the init builders' eager localCheckpoints and never reach the
    // final executed plan, so no entry is needed here)
    // value-domain-bounded grids (the q243 ECDF class): the rank-sum
    // fold windows over the merged LENGTH-count grid — rows bounded by
    // distinct n_chars values, never document cardinality
    "q314_rank_sum"        -> Set("len"),
    // q327's partitionless windows run over the SKETCH (adaptive
    // stride caps it at shards × ~1000 weighted rows, whatever the
    // corpus) and the v_c value-domain ECDF grid (q243 class)
    "q327_quantile_sketch" -> Set("v_c"),
    // q334's cumulative-coverage fold runs over the ≤k-round selection
    // trace (k = 8 by construction — the constant-grid class)
    "q334_greedy_coverage" -> Set("round"))

  /** Queries whose BroadcastNestedLoopJoins are sanctioned: every BNLJ
    * here crosses in a frame bounded by construction — 1-row cap/stat
    * aggregates (`df <= cap`, Benford/skyline/threshold scalars),
    * constant probe/query sets (`NOT (vec_id = query_id)` brute-force
    * baselines), codebooks/label grids, budget stacks, or calendar
    * pair frames. Per-query PlanSpec pins tighten several of these
    * further (q29/q70/q72/q75/q77).
    */
  private val bnljAllow: Set[String] = Set(
    // (r17: q31/q115/q89/q226/q279's sanctioned BNLJs — the brute-force
    // `vec_id != query_id` cross and BM25's 1-row stats crosses — now
    // cross inside the session-cached scored grids and no longer reach
    // this walk; removed per the strict-both-ways rule)
    "q101_ann_recall", "q102_hamming_topk", "q103_funnel",
    "q105_importance_weights", "q107_item_pmi",
    "q125_ri_profile", "q139_kn_bigram", "q141_drift_report",
    // (q145's calendar-pair BNLJ crosses inside the common-neighbor
    // frame's r17 localCheckpoint materialization and no longer
    // reaches the lint's plan — same situation as q332's normalizers)
    "q147_dedup_savings", "q149_rfm_segments",
    "q157_collocations", "q166_centroid_dists", "q171_quality_curve",
    "q179_selfjoin_sketch", "q182_vocab_budget", "q190_probe_curve",
    "q194_ivf_balance", "q197_basket_lift", "q198_pca_variance",
    "q200_journey_entropy", "q207_ndcg_label", "q209_minhash_upsert",
    "q213_dormant_balance", "q217_winnow_matches", "q218_mrr_label",
    "q230_important_parts", "q234_bpe_encode",
    "q239_daily_autocorr", "q240_cross_corr", "q243_ks_drift",
    "q244_join_card_est", "q250_delete_audit", "q252_quality_skyline",
    "q253_triplet_mine", "q254_benford", "q257_ab_test",
    "q259_theil_sen", "q272_assoc_rules", "q276_apportionment",
    "q282_hash_sample", "q284_lorenz_deciles",
    "q289_month_seasonality", "q291_abc_xyz", "q295_region_share",
    "q296_lateness_pareto", "q297_twonn_ratio", "q299_silhouette",
    "q29_minhash_neardup", "q302_aging_report", "q303_whale_trend",
    "q307_unigram_lm", "q309_qlm_topk", "q311_write_amplification",
    "q312_unigram_prune", "q313_cohens_kappa", "q316_bpe_roundtrip",
    "q321_share_shift", "q322_corpus_card", "q324_init_compare",
    "q327_quantile_sketch", "q329_bin_packing", "q330_dq_suite",
    // (q332's 1-row max normalizers cross inside each half-round's
    // localCheckpoint materialization and never reach the final
    // executed plan — same situation as q324's candidate windows)

    "q335_dbscan_clusters", // two 1-row stat aggs crossed for the noise row
    "q337_sketch_overlap", // source-enum² sketch grid (20-row sides)
    "q339_reshard_plan", // broadcast vnode ring grid + 1-row total
    "q340_eps_percolation", // 1-row stat aggs per constant grid point
    // (q344's fixed point runs on the collected enum² matrix — its
    // executed plan is the one corpus aggregation, no BNLJ)
    "q345_neyman_alloc", // 1-row budget totals (two Hamilton runs)
    "q346_chapman_estimate", // sketch grid + 1-row global distinct
    "q347_label_model", // 1-row accuracy/positives frames per EM round
    "q348_randomization_test", // source-enum scenario fan-out + 1-row totals
    "q352_knob_advisor", // three 1-row corpus aggregates crossed into one stats row
    "q30_simhash_neardup", "q32_cosine_neardup",
    "q33_lsh_topk", "q42_approx_distinct", "q43_topk_aggregator",
    // (q64's bucket-cap BNLJ crosses inside lshNearDupCandidates' r17
    // lazy checkpoint — hidden from the pre-execution plan like q332)
    "q52_key_skew", "q57_centroid_assign",
    "q68_split_leakage", "q70_ivf_topk", "q72_bloom_novelty",
    "q73_lm_perplexity", "q75_semantic_dedup", "q76_kmeans_refine",
    "q79_random_projection", "q80_ivf_sized_topk", "q81_kmeans_sized",
    "q82_sq_topk", "q86_pq_fused", "q88_ivfpq_topk",
    "q90_cms_profile", "q92_ivf_upsert", "q94_prefix_rerank",
    "q95_pca_power", "q96_abtt_removal", "q97_mix_weights",
    "q99_tfidf_terms")

  test("registry-wide: no scale-killer plan shapes outside the documented allowlists") {
    // cold-cache the lint: a registry frame session-cached by an EARLIER
    // suite in the same JVM (QueriesSpec/PlanSpec execute queries)
    // appears as an InMemoryTableScan and swallows the subtree whose
    // shape this walks — q194's sanctioned BNLJ then looks "gone" and
    // the stale-allowlist assert fires on suite ORDER, not on code
    graft.operators.SessionCaches.clear(spark)
    val violations = Seq.newBuilder[String]
    val usedWin = Set.newBuilder[String]
    val usedBnlj = Set.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p = PlanLint.physical(fn(spark, sf0001))
      val wins = PlanLint.partitionlessWindows(p)
      if (wins.nonEmpty) {
        usedWin += name
        val allowed = globalWindowAllow.getOrElse(name, Set.empty[String])
        wins.filterNot { case (_, c) => allowed.contains(c) }
          .foreach { case (k, c) =>
            violations += s"$name: partitionless $k over order=$c" }
      }
      PlanLint.cartesians(p)
        .foreach(c => violations += s"$name: CartesianProduct ($c)")
      val bnlj = PlanLint.nestedLoopJoins(p)
      if (bnlj.nonEmpty) {
        usedBnlj += name
        if (!bnljAllow.contains(name))
          violations += s"$name: unsanctioned BNLJ ${bnlj.mkString("; ")}"
      }
      PlanLint.udfs(p).foreach(u => violations += s"$name: UDF node $u")
    }
    val v = violations.result()
    assert(v.isEmpty, s"${v.size} plan-lint violations:\n${v.mkString("\n")}")
    // strict both ways: allowlist entries must still be exercised, so
    // the lists cannot rot into blanket permissions
    val staleWin = globalWindowAllow.keySet -- usedWin.result()
    assert(staleWin.isEmpty,
      s"stale globalWindowAllow entries (shape gone — remove): $staleWin")
    val staleBnlj = bnljAllow -- usedBnlj.result()
    assert(staleBnlj.isEmpty,
      s"stale bnljAllow entries (shape gone — remove): $staleBnlj")
  }
}
