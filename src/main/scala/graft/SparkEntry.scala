package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Bucketing, CoreQueries, DedupOps, EventOps, MultimodalOps, PipelineOps, RetrievalOps, SimilarityOps, TextAnalysisOps}

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
    // training-data pipeline extensions (dedup / similarity / text / multimodal)
    "q27_dedup_exact"     -> ((s, d) => DedupOps.exactDedup(s, d)),
    "q28_ngram_jaccard"   -> ((s, d) => DedupOps.ngramJaccardPairs(s, d)),
    "q29_minhash_neardup" -> ((s, d) => DedupOps.minhashNearDup(s, d)),
    "q30_simhash_neardup" -> ((s, d) => DedupOps.simhashRecallGate(s, d)),
    "q31_cosine_topk"     -> ((s, d) => SimilarityOps.bruteForceTopK(s, d)),
    "q32_cosine_neardup"  -> ((s, d) => SimilarityOps.cosineNearDup(s, d)),
    "q33_lsh_topk"        -> ((s, d) => SimilarityOps.lshRecallGate(s, d)),
    "q34_lang_id"         -> ((s, d) => TextAnalysisOps.langId(s, d)),
    "q35_quality_score"   -> ((s, d) => TextAnalysisOps.qualityScore(s, d)),
    "q36_token_stats"     -> ((s, d) => TextAnalysisOps.tokenStats(s, d)),
    "q37_fingerprints"    -> ((s, d) => TextAnalysisOps.fingerprints(s, d)),
    "q38_rolling_fp"      -> ((s, d) => TextAnalysisOps.rollingFpGate(s, d)),
    "q39_media_meta"      -> ((s, d) => MultimodalOps.mediaMeta(s, d)),
    "q40_media_features"  -> ((s, d) => MultimodalOps.featureSummary(s, d)),
    "q41_frame_sample"    -> ((s, d) => MultimodalOps.frameSample(s, d)),
    "q42_approx_distinct" -> (CoreQueries.q42ApproxDistinct _),
    "q43_topk_aggregator" -> ((s, d) => SimilarityOps.topKViaAggregator(s, d)),
    "q44_stratified_sample" -> ((s, d) => PipelineOps.stratifiedSample(s, d)),
    "q45_shard_packing"   -> ((s, d) => PipelineOps.shardPacking(s, d)),
    "q46_pii_scrub"       -> ((s, d) => PipelineOps.piiScrub(s, d)),
    "q47_json_extract"    -> (CoreQueries.q47JsonExtract _),
    "q48_running_total"   -> (CoreQueries.q48RunningTotal _),
    "q49_asof_join"       -> (graft.operators.AsOfJoin.q49EventsAsOfOrders _),
    "q50_range_join"      -> (graft.operators.RangeJoin.q50RangeJoin _),
    "q51_top_ngrams"      -> ((s, d) => TextAnalysisOps.topNgrams(s, d)),
    "q52_key_skew"        -> (CoreQueries.q52KeySkew _),
    "q53_dedup_clusters"  -> ((s, d) => DedupOps.nearDupClusters(s, d)),
    "q54_rollup"          -> (CoreQueries.q54Rollup _),
    "q55_pivot"           -> (CoreQueries.q55Pivot _),
    "q56_percentiles"     -> (CoreQueries.q56Percentiles _),
    "q57_centroid_assign" -> ((s, d) => SimilarityOps.centroidAssign(s, d)),
    "q58_sessions_batch"  -> ((s, d) => CoreQueries.q58SessionsBatch(s, d)),
    "q59_dedup_keeplist"  -> ((s, d) => DedupOps.dedupKeepList(s, d)),
    "q60_weighted_mix"    -> ((s, d) => PipelineOps.weightedMix(s, d)),
    "q61_contamination"   -> ((s, d) => graft.operators.ContaminationOps.contamination(s, d)),
    "q62_repetition"      -> ((s, d) => TextAnalysisOps.repetitionRatio(s, d)),
    "q63_word_length"     -> ((s, d) => TextAnalysisOps.wordLengthProfile(s, d)),
    "q64_lsh_neardup"     -> ((s, d) => SimilarityOps.lshNearDup(s, d)),
    "q65_curated_corpus"  -> ((s, d) => PipelineOps.curatedCorpus(s, d)),
    "q66_span_dup"        -> ((s, d) => DedupOps.spanDupStats(s, d)),
    "q67_token_entropy"   -> ((s, d) => TextAnalysisOps.tokenEntropy(s, d)),
    "q68_split_leakage"   -> ((s, d) => PipelineOps.trainValSplit(s, d)),
    "q69_vector_dedup"    -> ((s, d) => SimilarityOps.vectorExactDedup(s, d)),
    "q70_ivf_topk"        -> ((s, d) => SimilarityOps.ivfTopK(s, d)),
    "q71_gopher_rules"    -> ((s, d) => TextAnalysisOps.gopherRules(s, d)),
    "q72_bloom_novelty"   -> ((s, d) => PipelineOps.bloomNovelty(s, d)),
    "q73_lm_perplexity"   -> ((s, d) => TextAnalysisOps.lmPerplexity(s, d)),
    "q74_quantile_sketch" -> ((s, d) => CoreQueries.q74QuantileSketch(s, d)),
    "q75_semantic_dedup"  -> ((s, d) => SimilarityOps.semanticDedup(s, d)),
    "q76_kmeans_refine"   -> ((s, d) => SimilarityOps.kMeansRefine(s, d)),
    "q77_pq_topk"         -> ((s, d) => SimilarityOps.pqTopK(s, d)),
    "q78_heavy_hitters"   -> ((s, d) => TextAnalysisOps.heavyHitters(s, d)),
    "q79_random_projection" -> ((s, d) => SimilarityOps.rpCosinePairs(s, d)),
    "q80_ivf_sized_topk"  -> ((s, d) => SimilarityOps.ivfTopKAuto(s, d, targetList = 100L)),
    "q81_kmeans_sized"    -> ((s, d) => SimilarityOps.kMeansRefineSized(s, d, targetList = 100L)),
    "q82_sq_topk"         -> ((s, d) => SimilarityOps.sqTopK(s, d)),
    "q83_quality_classifier" -> ((s, d) => TextAnalysisOps.qualityClassifier(s, d)),
    "q84_sequence_packing" -> ((s, d) => PipelineOps.sequencePacking(s, d)),
    "q85_pq_sized"        -> ((s, d) => SimilarityOps.pqTopKAuto(s, d, targetList = 100L)),
    "q86_pq_fused"        -> ((s, d) => SimilarityOps.pqTopKFused(s, d)),
    "q87_span_scrub"      -> ((s, d) => DedupOps.spanScrub(s, d)),
    "q88_ivfpq_topk"      -> ((s, d) => SimilarityOps.ivfPqTopK(s, d)),
    "q89_bm25_topk"       -> ((s, d) => RetrievalOps.bm25TopK(s, d)),
    "q90_cms_profile"     -> ((s, d) => TextAnalysisOps.cmsProfile(s, d)),
    "q91_snapshot_diff"   -> ((s, d) => graft.operators.IncrementalOps.q91SnapshotDiff(s, d)),
    "q92_ivf_upsert"      -> ((s, d) => SimilarityOps.ivfUpsert(s, d)),
    "q93_incr_agg"        -> ((s, d) => graft.operators.IncrementalOps.q93IncrAggRefresh(s, d)),
    "q94_prefix_rerank"   -> ((s, d) => SimilarityOps.truncatedRerank(s, d)),
    "q95_pca_power"       -> ((s, d) => graft.operators.PcaOps.powerIteration(s, d)),
    "q96_abtt_removal"    -> ((s, d) => graft.operators.PcaOps.commonComponentRemoved(s, d)),
    "q97_mix_weights"     -> ((s, d) => PipelineOps.mixtureWeights(s, d)),
    "q98_bpe_merge"       -> ((s, d) => TextAnalysisOps.bpePairMerge(s, d)),
    "q99_tfidf_terms"     -> ((s, d) => TextAnalysisOps.tfidfTerms(s, d)),
    "q100_dup_inflation"  -> ((s, d) => DedupOps.dupInflation(s, d)),
    "q101_ann_recall"     -> ((s, d) => SimilarityOps.annRecall(s, d)),
    "q102_hamming_topk"   -> ((s, d) => SimilarityOps.binaryHammingTopK(s, d)),
    "q103_funnel"         -> ((s, d) => graft.operators.EventOps.funnel(s, d)),
    "q104_cohort_retention" -> ((s, d) =>
      graft.operators.EventOps.cohortRetention(s, d)),
    "q105_importance_weights" -> ((s, d) =>
      PipelineOps.importanceWeights(s, d)),
    "q106_attribution"    -> ((s, d) =>
      graft.operators.EventOps.lastTouchAttribution(s, d)),
    "q107_item_pmi"       -> ((s, d) =>
      graft.operators.EventOps.itemCooccurrence(s, d)),
    "q108_ship_priority"  -> (CoreQueries.q108ShipPriority _),
    "q109_regional_revenue" -> (CoreQueries.q109RegionalRevenue _),
    "q110_rolling_active" -> ((s, d) =>
      graft.operators.EventOps.rollingActiveUsers(s, d)),
    "q111_scd2_delta"     -> ((s, d) =>
      graft.operators.IncrementalOps.q111Scd2(s, d)),
    "q112_daily_anomaly"  -> ((s, d) =>
      graft.operators.EventOps.dailyAnomalies(s, d)),
    "q113_pagerank"       -> ((s, d) =>
      graft.operators.GraphOps.pageRank(s, d)),
    "q114_doc_chunks"     -> ((s, d) =>
      graft.operators.PipelineOps.docChunks(s, d)),
    "q115_hard_negatives" -> ((s, d) =>
      graft.operators.SimilarityOps.hardNegatives(s, d)),
    "q116_vocab_coverage" -> ((s, d) =>
      graft.operators.TextAnalysisOps.vocabCoverage(s, d)),
    "q117_domain_cap"     -> ((s, d) => PipelineOps.domainCap(s, d)),
    "q118_table_fingerprint" -> ((s, d) =>
      graft.operators.IncrementalOps.tableFingerprint(s, d)),
    "q119_source_overlap" -> ((s, d) => DedupOps.sourceSpanOverlap(s, d)),
    "q120_fuzzy_linkage"  -> ((s, d) =>
      graft.operators.LinkageOps.nameLinkage(s, d)),
    "q121_prefix_join"    -> ((s, d) => DedupOps.prefixJaccardJoin(s, d)),
    "q122_fold_assign"    -> ((s, d) => PipelineOps.leakageSafeFolds(s, d)),
    "q123_score_deciles"  -> ((s, d) =>
      TextAnalysisOps.scoreCalibration(s, d)),
    "q124_containment"    -> ((s, d) => DedupOps.containmentJoin(s, d)),
    "q125_ri_profile"     -> ((s, d) => graft.dq.DataQuality.riProfile(s, d)),
    "q126_transitions"    -> ((s, d) =>
      graft.operators.EventOps.eventTransitions(s, d)),
    "q127_vocab_growth"   -> ((s, d) => TextAnalysisOps.vocabGrowth(s, d)),
    "q128_fp_diff"        -> ((s, d) =>
      graft.operators.IncrementalOps.fingerprintDiff(s, d)),
    "q129_length_hist"    -> ((s, d) =>
      TextAnalysisOps.lengthHistogram(s, d)),
    "q130_dense_ids"      -> (CoreQueries.q130DenseIds(_, _)),
    "q131_exact_ols"      -> (CoreQueries.q131ExactOls _),
    "q132_zorder_layout"  -> (CoreQueries.q132ZorderLayout(_, _)),
    "q133_delete_cascade" -> (CoreQueries.q133DeleteCascade(_, _)),
    "q134_user_paths"     -> ((s, d) =>
      graft.operators.EventOps.userPaths(s, d)),
    "q135_media_dedup"    -> ((s, d) => MultimodalOps.mediaDedup(s, d)),
    "q136_time_travel"    -> ((s, d) =>
      graft.operators.IncrementalOps.q136TimeTravel(s, d)),
    "q137_fusion_bands"   -> ((s, d) => PipelineOps.fusionBands(s, d)),
    "q138_partition_stats" -> ((s, d) =>
      graft.operators.EventOps.partitionStats(s, d)),
    "q139_kn_bigram"      -> ((s, d) => TextAnalysisOps.knBigramLm(s, d)),
    "q140_budget_select"  -> ((s, d) => PipelineOps.budgetSelect(s, d)),
    "q141_drift_report"   -> ((s, d) =>
      graft.operators.IncrementalOps.q141DriftReport(s, d)),
    "q142_uncertainty"    -> ((s, d) =>
      TextAnalysisOps.uncertaintySample(s, d)),
    "q143_zorder_pruning" -> (CoreQueries.q143ZorderPruning _),
    "q144_weighted_jaccard" -> ((s, d) => DedupOps.weightedJaccard(s, d)),
    "q145_rank_corr"      -> ((s, d) => SimilarityOps.rankCorrelation(s, d)),
    "q146_source_gini"    -> ((s, d) => PipelineOps.sourceGini(s, d)),
    "q147_dedup_savings"  -> ((s, d) => DedupOps.dedupSavings(s, d)),
    "q148_bucketed_join"  -> ((s, d) => Bucketing.q148BucketedJoin(s, d)),
    "q149_rfm_segments"   -> ((s, d) => EventOps.rfmSegments(s, d)),
    "q150_interarrival"   -> ((s, d) => EventOps.interArrival(s, d)),
    "q151_ewma_daily"     -> ((s, d) => EventOps.ewmaDaily(s, d)),
    "q152_dow_profile"    -> ((s, d) => EventOps.dowProfile(s, d)),
    "q153_triangles"      -> ((s, d) => graft.operators.GraphOps.triangleCount(s, d)),
    "q154_degree_hist"    -> ((s, d) => graft.operators.GraphOps.degreeHistogram(s, d)),
    "q155_lang_confusion" -> ((s, d) => TextAnalysisOps.langConfusion(s, d)),
    "q156_encoding_scan"  -> ((s, d) => TextAnalysisOps.encodingScan(s, d)),
    "q157_collocations"   -> ((s, d) => TextAnalysisOps.collocations(s, d)),
    "q158_market_share"   -> (CoreQueries.q158MarketShare _),
    "q159_returned_rev"   -> (CoreQueries.q159ReturnedRevenue _),
    "q160_promo_share"    -> (CoreQueries.q160PromoShare _),
    "q161_small_qty"      -> (CoreQueries.q161SmallQtyRevenue _),
    "q162_ttr_bands"      -> ((s, d) => TextAnalysisOps.ttrBands(s, d)),
    "q163_readability"    -> ((s, d) => TextAnalysisOps.readability(s, d)),
    "q164_case_profile"   -> ((s, d) => TextAnalysisOps.caseProfile(s, d)),
    "q165_hapax_rate"     -> ((s, d) => TextAnalysisOps.hapaxRate(s, d)),
    "q166_centroid_dists" -> ((s, d) =>
      graft.operators.EmbedHealthOps.centroidDistances(s, d)),
    "q167_norm_bands"     -> ((s, d) =>
      graft.operators.EmbedHealthOps.normBands(s, d)),
    "q168_label_cohesion" -> ((s, d) =>
      graft.operators.EmbedHealthOps.labelCohesion(s, d)),
    "q169_basket_bands"   -> (CoreQueries.q169BasketBands _),
    "q170_truncation_loss" -> ((s, d) => PipelineOps.truncationLoss(s, d)),
    "q171_quality_curve"  -> ((s, d) => PipelineOps.qualityTokenCurve(s, d)),
    "q172_cluster_sizes"  -> ((s, d) => DedupOps.clusterSizeHist(s, d)),
    "q173_kcore"          -> ((s, d) => graft.operators.GraphOps.kCore(s, d)),
    "q174_session_stats"  -> ((s, d) => CoreQueries.q174SessionStats(s, d)),
    "q175_mad_outliers"   -> (CoreQueries.q175MadOutliers _),
    "q176_daily_ohlc"     -> ((s, d) =>
      graft.operators.EventOps.dailyOhlc(s, d)),
    "q177_latency_bands"  -> (CoreQueries.q177LatencyBands _),
    "q178_percent_rank"   -> (CoreQueries.q178PercentRank _),
    "q179_selfjoin_sketch" -> ((s, d) => CoreQueries.q179SelfJoinSketch(s, d)),
    "q180_peak_concurrency" -> ((s, d) =>
      graft.operators.EventOps.peakConcurrency(s, d)),
    "q181_cube"           -> (CoreQueries.q181Cube _),
    "q182_vocab_budget"   -> ((s, d) => TextAnalysisOps.vocabBudgetCurve(s, d)),
    "q183_source_novelty" -> ((s, d) => TextAnalysisOps.sourceNovelty(s, d)),
    "q184_threshold_sweep" -> ((s, d) => DedupOps.thresholdSweep(s, d)),
    "q185_daily_reconcile" -> (CoreQueries.q185DailyReconcile _),
    "q186_churn_setops"   -> (CoreQueries.q186ChurnSetops _),
    "q187_rolling_revenue" -> (CoreQueries.q187RollingRevenue _),
    "q188_column_profile" -> ((s, d) =>
      graft.dq.DataQuality.columnProfile(s, d)),
    "q189_fk_cardinality" -> ((s, d) =>
      graft.dq.DataQuality.fkCardinality(s, d)),
    "q190_probe_curve"    -> ((s, d) => SimilarityOps.probeRecallCurve(s, d)),
    "q191_pii_density"    -> ((s, d) => PipelineOps.piiDensity(s, d)),
    "q192_langid_margin"  -> ((s, d) => TextAnalysisOps.langMargins(s, d)),
    "q193_shingle_df"     -> ((s, d) => DedupOps.shingleDfProfile(s, d)),
    "q194_ivf_balance"    -> ((s, d) => SimilarityOps.ivfListBalance(s, d)),
    "q195_quality_by_lang" -> ((s, d) => TextAnalysisOps.qualityByLang(s, d)),
    "q196_value_quartiles" -> ((s, d) =>
      graft.operators.EventOps.valueQuartiles(s, d)),
    "q197_basket_lift"    -> ((s, d) => CoreQueries.q197BasketLift(s, d)),
    "q198_pca_variance"   -> ((s, d) =>
      graft.operators.PcaOps.varianceExplained(s, d)),
    "q199_supply_conc"    -> (CoreQueries.q199SupplyConcentration _),
    "q200_journey_entropy" -> ((s, d) =>
      graft.operators.EventOps.journeyEntropy(s, d)),
    "q201_session_conversion" -> ((s, d) =>
      graft.operators.EventOps.sessionConversion(s, d)),
    "q202_item_adoption"  -> ((s, d) =>
      graft.operators.EventOps.itemAdoption(s, d)),
    "q203_fulfillment_span" -> (CoreQueries.q203FulfillmentSpan _),
    "q204_cluster_purity" -> ((s, d) => DedupOps.clusterPurity(s, d)),
  )

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
  private val qualityDocCte: String =
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
  private val langPredCte: String =
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
  private val embedCentroidCte: String =
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
  private val sessionsCte: String =
    """sessev AS (
         SELECT user_id, ts, event_type,
           sum(CASE WHEN prev_ts IS NULL
                     OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
         FROM (SELECT user_id, ts, event_type,
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
  private def kCorePeelSql(k: Int, peels: Int): String =
    (1 to peels).map { p =>
      s"""d$p AS MATERIALIZED (SELECT node, count(*) AS d FROM (
           SELECT i AS node FROM e${p - 1}
           UNION ALL SELECT j FROM e${p - 1}) GROUP BY 1),
         k$p AS MATERIALIZED (SELECT node FROM d$p WHERE d >= $k),
         e$p AS MATERIALIZED (SELECT i, j FROM e${p - 1}
           WHERE i IN (SELECT node FROM k$p)
             AND j IN (SELECT node FROM k$p))"""
    }.mkString(",\n         ")

  private val coPairsCte: String =
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
  private val ewmaTermsSql: String = (0 until 16).map(k =>
    s"coalesce(CAST(lag(cnt, $k) OVER w AS DOUBLE), 0.0) * " +
      java.math.BigDecimal.valueOf(0.5).pow(k + 1).toPlainString)
    .mkString(" + ")

  private val mortonSql: String = (0 until 31).map(i =>
    s"(((l_partkey >> $i) & 1) << ${2 * i}) + " +
      s"(((l_suppkey >> $i) & 1) << ${2 * i + 1})").mkString(" + ")

  /** The q121 AllPairs/PPJoin chain ending at
    * `v (id_a, id_b, na, nb, inter, jaccard)`, generalized to a
    * rational prefix threshold p/q — shared by the q121/q144 (3/5) and
    * q184 (1/2) oracles so the prefix arithmetic and verification
    * cannot drift.
    */
  private def prefixPairsCteFor(p: Int, q: Int): String =
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

  private val prefixPairsCte: String = prefixPairsCteFor(3, 5)

  private val shinglePostingsCte: String =
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
           CAST(ceil((SELECT count(*) FROM documents) * 0.02) AS BIGINT)))),
       t1 AS (SELECT doc_id, tok FROM t0 JOIN rare USING (tok)),
       tok AS (SELECT doc_id, tok,
                 count(*) OVER (PARTITION BY doc_id) AS n FROM t1)"""

  /** Shared IVF codebook + inverted-list-assignment CTE body (e → dims →
    * cent → asg) for the IVF oracles (q70 probing, q75 semantic dedup) —
    * one copy so codebook rounding and the argmax tiebreak cannot diverge
    * between them.
    */
  private val ivfAssignCte: String =
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
  private def sizedScentCte(targetList: Long): String =
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
  private def lloydAsgCte(name: String, centName: String): String =
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
  private def lloydCentCte(dimsName: String, centName: String,
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
  private val exactJaccardPairsSql: String =
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
  private val dedupCcCte: String =
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
    // --- extensions. Norm = lower/trim/collapse-whitespace, identical on
    // both sides (DuckDB regexp_replace needs the 'g' flag to match
    // Spark's replace-all).
    "q27_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
         min(doc_id) AS canonical_id, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY canonical_id""",
    "q28_ngram_jaccard" -> exactJaccardPairsSql,
    // q29 emits exactly-verified pairs from complete-recall MinHash
    // banding — a recall loss in candidate generation is a hard row-set
    // mismatch vs the exact oracle
    "q29_minhash_neardup" -> exactJaccardPairsSql,
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
    "q33_lsh_topk" ->
      """SELECT vec_id AS query_id, CAST(1 AS INT) AS recall_ok
         FROM embeddings WHERE vec_id < 8 ORDER BY query_id""",
    "q38_rolling_fp" ->
      """SELECT count(*) AS n_docs,
           count(DISTINCT f) AS n_md5_classes,
           count(DISTINCT f) AS n_rolling_classes,
           count(DISTINCT f) AS n_joint_classes
         FROM (SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
               FROM documents)""",
    "q40_media_features" ->
      """SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(list_sum([CAST(('0x' || substr(h, 2*i-1, 2)) AS INT)
             for i in range(1, octet_length(encode(text)) + 1)]) AS BIGINT) AS byte_sum,
           round(CAST(('0x' || substr(h, 1, 2)) AS INT) / 255.0, 4) AS f0
         FROM (SELECT doc_id, text, hex(encode(text)) AS h FROM documents)
         ORDER BY doc_id""",
    "q42_approx_distinct" ->
      """SELECT count(DISTINCT l_orderkey) AS exact_orders,
           count(DISTINCT l_partkey) AS exact_parts,
           count(*) AS n_rows,
           CAST(1 AS INT) AS orders_within_bound,
           CAST(1 AS INT) AS parts_within_bound
         FROM lineitem""",
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
    "q34_lang_id" ->
      ("WITH " + langPredCte + """
         SELECT lang_pred, count(*) AS n_docs FROM p
         GROUP BY lang_pred ORDER BY lang_pred"""),
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
    "q52_key_skew" ->
      """WITH pk AS (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1),
         tot AS (SELECT sum(n) * 1.0 / count(*) AS avg_n FROM pk)
         SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_key_rows,
           round(any_value(avg_n), 4) AS avg_key_rows,
           count(CASE WHEN n > 2 * avg_n THEN 1 END) AS n_hot_keys,
           round(max(n) / any_value(avg_n), 4) AS max_over_avg
         FROM pk, tot""",
    "q53_dedup_clusters" ->
      (dedupCcCte + """
         SELECT id AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id
         FROM cc GROUP BY id ORDER BY doc_id"""),
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
    "q58_sessions_batch" ->
      ("WITH " + sessionsCte + """
         SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           session_start, session_end, n_events
         FROM sess ORDER BY user_id, session_seq"""),
    "q59_dedup_keeplist" ->
      (dedupCcCte + """,
         drop_ids AS (SELECT id FROM (
             SELECT id, min(label) AS cluster_id FROM cc GROUP BY id)
           WHERE cluster_id <> id)
         SELECT lang, count(*) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS kept_chars
         FROM documents WHERE doc_id NOT IN (SELECT id FROM drop_ids)
         GROUP BY lang ORDER BY lang"""),
    "q60_weighted_mix" ->
      """SELECT source, count(*) AS n_kept
         FROM (SELECT source,
                 substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 2) AS bucket
               FROM documents)
         WHERE bucket < CASE WHEN source = 'src0' THEN 'e0'
                             WHEN source IN ('src1', 'src2') THEN '80'
                             ELSE '40' END
         GROUP BY source ORDER BY source""",
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
    "q67_token_entropy" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
           FROM documents),
         c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
         n AS (SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM c)
         SELECT doc_id, CAST(max(n) AS INT) AS n_tokens,
           round(-sum((c * 1.0 / n) * log2(c * 1.0 / n)) + 0.0, 4) AS entropy_bits
         FROM n GROUP BY doc_id ORDER BY doc_id""",
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
      raw"""WITH d0 AS (
           SELECT doc_id, string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
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
           FROM cand JOIN dfc USING (tok) CROSS JOIN st)
         SELECT qid, hit_id, score, rk FROM (
           SELECT qid, doc_id AS hit_id, score,
             CAST(row_number() OVER (PARTITION BY qid
               ORDER BY score DESC, doc_id) AS INT) AS rk
           FROM (SELECT qid, doc_id,
                   round(${RetrievalOps.oracleSlotSql(RetrievalOps.DefaultNTerms)},
                     4) AS score
                 FROM contrib GROUP BY 1, 2))
         WHERE rk <= ${RetrievalOps.DefaultK} ORDER BY qid, rk""",
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
    // q129: integer-exact log2 length bands — length(bin(x)) - 1, no
    // float log at the power-of-two boundary
    "q129_length_hist" ->
      """SELECT lang, CAST(length(bin(n_chars)) - 1 AS INT) AS log2_bucket,
           count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
         FROM documents GROUP BY 1, 2 ORDER BY lang, log2_bucket""",
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
    // q134: per-user ordered path signature (string_agg under the
    // (ts, event_id) total order ≙ Spark's sort_array'd struct list),
    // then the top-k journeys with a total tie order
    "q134_user_paths" ->
      """WITH p AS (SELECT user_id,
             string_agg(event_type, '->' ORDER BY ts, event_id) AS path
           FROM events GROUP BY 1)
         SELECT path, count(*) AS n_users FROM p
         GROUP BY 1 ORDER BY n_users DESC, path LIMIT 10""",
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
    // q148: the bucketed co-located join — bucketing is physical layout,
    // so the oracle is the plain join+rollup (BucketingSpec pins the
    // Exchange-free plan; this gate pins the answer)
    "q148_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
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
    // q172: exact-dup cluster-size histogram — the q27 content-hash
    // shuffle then a multiplicity rollup
    "q172_cluster_sizes" ->
      """WITH c AS (SELECT md5(regexp_replace(lower(trim(text)), '\s+',
             ' ', 'g')) AS fp, count(*) AS cluster_size
           FROM documents GROUP BY 1)
         SELECT cluster_size, count(*) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
         FROM c GROUP BY cluster_size ORDER BY cluster_size""",
    // q173: 4 unrolled k-core peels (k=3) over the capped co-occurrence
    // edges; generated chain, pure integer counting
    "q173_kcore" ->
      ("WITH " + coPairsCte + """,
         e0 AS MATERIALIZED (SELECT i, j FROM cpairs),
         """ + kCorePeelSql(k = 3, peels = 4) + """
         SELECT item, count(*) AS core_degree FROM (
           SELECT i AS item FROM e4 UNION ALL SELECT j FROM e4)
         GROUP BY item ORDER BY item"""),
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
    // q181: CUBE over (returnflag, linestatus) — q54's ROLLUP completed
    // to the grouping power set
    "q181_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
           round(sum(l_quantity), 2) AS qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
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
    // q199: supplier-concentration bands — integer (10·top) div total
    "q199_supply_conc" ->
      """WITH h AS (SELECT l_partkey, l_suppkey, count(*) AS cnt
           FROM lineitem GROUP BY 1, 2),
         p AS (SELECT l_partkey, CAST(sum(cnt) AS BIGINT) AS n_lines,
             CAST(max(cnt) AS BIGINT) AS top FROM h GROUP BY 1)
         SELECT (10 * top) // n_lines AS conc_band, count(*) AS n_parts,
           CAST(sum(n_lines) AS BIGINT) AS n_lines
         FROM p GROUP BY 1 ORDER BY 1""",
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
    // q203: order fulfillment-span week bands — integer day span per
    // order, div-7 banding
    "q203_fulfillment_span" ->
      """WITH s AS (SELECT l_orderkey,
             CAST(datediff('day', CAST(min(l_shipdate) AS DATE),
               CAST(max(l_shipdate) AS DATE)) AS BIGINT) AS span_days
           FROM lineitem GROUP BY 1)
         SELECT span_days // 7 AS span_weeks, count(*) AS n_orders
         FROM s GROUP BY 1 ORDER BY 1""",
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
  )

  /** One nprobe point of the q190 probe-recall oracle: the q101
    * probes/iv chain parameterized by probe count (names suffixed so
    * the three points share one WITH).
    */
  private def probeIvSql(np: Int): String =
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
  private val pcaPowerCte: String =
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
