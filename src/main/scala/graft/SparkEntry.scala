package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Bucketing, CoreQueries, CrawlOps, DedupOps, EventOps, GraphOps, IncrementalOps, KnobAdvisor, MultimodalOps, PipelineOps, RetrievalOps, SimilarityOps, TextAnalysisOps}

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
    "q205_winnowing"      -> ((s, d) => DedupOps.winnowing(s, d)),
    "q206_prefix_boilerplate" -> ((s, d) =>
      DedupOps.prefixBoilerplate(s, d)),
    "q207_ndcg_label"     -> ((s, d) => SimilarityOps.ndcgByLabel(s, d)),
    "q208_code_detect"    -> ((s, d) => TextAnalysisOps.codeDetect(s, d)),
    "q209_minhash_upsert" -> ((s, d) => DedupOps.minhashUpsert(s, d)),
    "q210_bot_burst"      -> ((s, d) =>
      graft.operators.EventOps.botBurst(s, d)),
    "q211_idf_drift"      -> ((s, d) => TextAnalysisOps.idfDrift(s, d)),
    "q212_sliding_load"   -> ((s, d) =>
      graft.operators.EventOps.slidingLoad(s, d)),
    "q213_dormant_balance" -> ((s, d) => CoreQueries.q213DormantBalance(s, d)),
    "q214_top_supplier"   -> ((s, d) => CoreQueries.q214TopSupplier(s, d)),
    "q215_custdist"       -> (CoreQueries.q215CustDist _),
    "q216_big_orders"     -> ((s, d) => CoreQueries.q216BigOrders(s, d)),
    "q217_winnow_matches" -> ((s, d) => DedupOps.winnowMatches(s, d)),
    "q218_mrr_label"      -> ((s, d) => SimilarityOps.mrrByLabel(s, d)),
    "q219_assortativity"  -> ((s, d) =>
      graft.operators.GraphOps.degreeAssortativity(s, d)),
    "q220_session_gaps"   -> ((s, d) => CoreQueries.q220SessionGaps(s, d)),
    "q221_bigram_entropy" -> ((s, d) => TextAnalysisOps.bigramEntropy(s, d)),
    "q222_dup_quality"    -> ((s, d) => DedupOps.dupQuality(s, d)),
    "q223_wait_suppliers" -> ((s, d) => CoreQueries.q223WaitSuppliers(s, d)),
    "q224_disjunctive_revenue" -> ((s, d) =>
      CoreQueries.q224DisjunctiveRevenue(s, d)),
    "q225_bpe_train"      -> ((s, d) => TextAnalysisOps.bpeTrain(s, d)),
    "q226_rrf_fusion"     -> ((s, d) => RetrievalOps.rrfFusion(s, d)),
    "q227_order_priority" -> ((s, d) => CoreQueries.q227OrderPriority(s, d)),
    "q228_priority_shipmix" -> ((s, d) =>
      CoreQueries.q228PriorityShipmix(s, d)),
    "q229_min_cost_supplier" -> ((s, d) =>
      CoreQueries.q229MinCostSupplier(s, d)),
    "q230_important_parts" -> ((s, d) => CoreQueries.q230ImportantParts(s, d)),
    "q231_nation_volume"  -> ((s, d) => CoreQueries.q231NationVolume(s, d)),
    "q232_salted_distinct" -> ((s, d) =>
      graft.operators.SkewUtils.q232SaltedDistinct(s, d)),
    "q233_interval_pairs" -> ((s, d) =>
      graft.streaming.IntervalJoinStream.q233IntervalPairs(s, d)),
    "q234_bpe_encode"     -> ((s, d) => TextAnalysisOps.bpeEncode(s, d)),
    "q235_zorder_cells"   -> ((s, d) =>
      graft.operators.ZOrder.q235ZorderCells(s, d)),
    "q236_dominant_suppliers" -> ((s, d) =>
      CoreQueries.q236DominantSuppliers(s, d)),
    "q237_nation_profit"  -> ((s, d) => CoreQueries.q237NationProfit(s, d)),
    "q238_quality_keeplist" -> ((s, d) => DedupOps.qualityKeepList(s, d)),
    "q239_daily_autocorr" -> ((s, d) => EventOps.dailyAutocorr(s, d)),
    "q240_cross_corr"     -> ((s, d) => EventOps.crossCorr(s, d)),
    "q241_discount_revenue" -> ((s, d) =>
      CoreQueries.q241DiscountRevenue(s, d)),
    "q242_supplier_diversity" -> ((s, d) =>
      CoreQueries.q242SupplierDiversity(s, d)),
    "q243_ks_drift"       -> ((s, d) => TextAnalysisOps.ksDrift(s, d)),
    "q244_join_card_est"  -> ((s, d) => CoreQueries.q244JoinCardEst(s, d)),
    "q245_scd2_bands"     -> ((s, d) => EventOps.scd2Bands(s, d)),
    "q246_mmr_rerank"     -> ((s, d) => SimilarityOps.mmrRerank(s, d)),
    "q247_tiered_rollup"  -> ((s, d) =>
      graft.streaming.TieredAggStream.tieredBatch(s, d)),
    "q248_pit_band_mix"   -> ((s, d) => EventOps.pitBandMix(s, d)),
    "q249_ivm_join_delta" -> ((s, d) =>
      graft.operators.IncrementalOps.ivmJoinDelta(s, d)),
    "q250_delete_audit"   -> ((s, d) =>
      graft.dq.DataQuality.deleteAudit(s, d)),
    "q251_dup_attribution" -> ((s, d) => DedupOps.dupAttribution(s, d)),
    "q252_quality_skyline" -> ((s, d) =>
      TextAnalysisOps.qualitySkyline(s, d)),
    "q253_triplet_mine"   -> ((s, d) => SimilarityOps.tripletMine(s, d)),
    "q254_benford"        -> ((s, d) =>
      graft.dq.DataQuality.benfordScreen(s, d)),
    "q255_item_novelty"   -> ((s, d) =>
      graft.streaming.ItemNoveltyStream.firstSeenGate(s, d)),
    "q256_last_touch"     -> ((s, d) => EventOps.lastTouch(s, d)),
    "q257_ab_test"        -> ((s, d) => EventOps.abTest(s, d)),
    "q258_position_attribution" -> ((s, d) =>
      EventOps.positionAttribution(s, d)),
    "q259_theil_sen"      -> ((s, d) => EventOps.theilSen(s, d)),
    "q260_perfect_orders" -> ((s, d) =>
      CoreQueries.q260PerfectOrders(s, d)),
    "q261_conversion_latency" -> ((s, d) =>
      EventOps.conversionLatency(s, d)),
    "q262_abc_classes"    -> ((s, d) => CoreQueries.q262AbcClasses(s, d)),
    "q263_cusum_changepoint" -> ((s, d) =>
      EventOps.cusumChangepoint(s, d)),
    "q264_compaction_plan" -> ((s, d) =>
      IncrementalOps.compactionPlan(s, d)),
    "q265_item_recs"      -> ((s, d) => GraphOps.itemRecs(s, d)),
    "q266_link_prediction" -> ((s, d) =>
      GraphOps.coOrderLinkPred(s, d)),
    "q267_calibration"    -> ((s, d) =>
      EventOps.propensityCalibration(s, d)),
    "q268_forecast_mase"  -> ((s, d) =>
      EventOps.seasonalNaiveMase(s, d)),
    "q269_proximity_search" -> ((s, d) =>
      RetrievalOps.proximitySearch(s, d)),
    "q270_fd_audit"       -> ((s, d) => graft.dq.DataQuality.fdAudit(s, d)),
    "q271_k_anonymity"    -> ((s, d) =>
      graft.dq.DataQuality.kAnonymity(s, d)),
    "q272_assoc_rules"    -> ((s, d) => GraphOps.assocRules(s, d)),
    "q273_above_cust_avg" -> ((s, d) =>
      CoreQueries.q273AboveCustomerAvg(s, d)),
    "q274_seasonal_anomaly" -> ((s, d) =>
      EventOps.seasonalAnomaly(s, d)),
    "q275_grouping_sets"  -> ((s, d) =>
      CoreQueries.q275GroupingSets(s, d)),
    "q276_apportionment"  -> ((s, d) =>
      PipelineOps.apportionBudget(s, d)),
    "q277_kwic"           -> ((s, d) => TextAnalysisOps.kwic(s, d)),
    "q278_backlog_ledger" -> ((s, d) =>
      CoreQueries.q278BacklogLedger(s, d)),
    "q279_prf_expansion"  -> ((s, d) =>
      RetrievalOps.prfExpansion(s, d)),
    "q280_split_drift"    -> ((s, d) =>
      graft.operators.EmbedHealthOps.splitDrift(s, d)),
    "q281_session_replay" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      graft.streaming.SessionReplayStream
        .sessionsBatch(graft.Tables.events(s, d))
        .filter(col("user_id") < 20)
        .orderBy(col("user_id"), col("start_us"))
    }),
    "q282_hash_sample"    -> ((s, d) =>
      PipelineOps.stratifiedHashSample(s, d)),
    "q283_conversion_hazard" -> ((s, d) =>
      EventOps.conversionHazard(s, d)),
    "q284_lorenz_deciles" -> ((s, d) =>
      CoreQueries.q284LorenzDeciles(s, d)),
    "q285_top_supplier"   -> ((s, d) =>
      CoreQueries.q285TopSupplier(s, d)),
    "q286_markov_stationary" -> ((s, d) =>
      EventOps.markovStationary(s, d)),
    "q287_wilson_interval" -> ((s, d) =>
      EventOps.wilsonIntervals(s, d)),
    "q288_langid_prf"     -> ((s, d) => TextAnalysisOps.langIdPrf(s, d)),
    "q289_month_seasonality" -> ((s, d) =>
      CoreQueries.q289MonthSeasonality(s, d)),
    "q290_cohort_ltv"     -> ((s, d) => EventOps.cohortLtv(s, d)),
    "q291_abc_xyz"        -> ((s, d) => CoreQueries.q291AbcXyz(s, d)),
    "q292_drawdown"       -> ((s, d) => EventOps.drawdownPanel(s, d)),
    "q293_conversion_paths" -> ((s, d) =>
      EventOps.conversionPaths(s, d)),
    "q294_velocity_screen" -> ((s, d) =>
      graft.dq.DataQuality.velocityScreen(s, d)),
    "q295_region_share"   -> ((s, d) =>
      CoreQueries.q295RegionNationShare(s, d)),
    "q296_lateness_pareto" -> ((s, d) =>
      CoreQueries.q296LatenessPareto(s, d)),
    "q297_twonn_ratio"    -> ((s, d) =>
      graft.operators.EmbedHealthOps.twoNnRatio(s, d)),
    "q298_exact_auc"      -> ((s, d) => EventOps.exactAuc(s, d)),
    "q299_silhouette"     -> ((s, d) =>
      graft.operators.EmbedHealthOps.silhouetteLite(s, d)),
    "q300_bounce_rate"    -> ((s, d) =>
      CoreQueries.q300BounceRate(s, d)),
    "q301_demand_spikes"  -> ((s, d) =>
      CoreQueries.q301DemandSpikes(s, d)),
    "q302_aging_report"   -> ((s, d) =>
      CoreQueries.q302AgingReport(s, d)),
    "q303_whale_trend"    -> ((s, d) =>
      CoreQueries.q303WhaleShareTrend(s, d)),
    "q304_frequent_triples" -> ((s, d) =>
      GraphOps.frequentTriples(s, d)),
    "q305_stage_gaps"     -> ((s, d) =>
      EventOps.stageGapQuantiles(s, d)),
    "q306_merge_into"     -> ((s, d) =>
      IncrementalOps.q306MergeInto(s, d)),
    "q307_unigram_lm"     -> ((s, d) =>
      TextAnalysisOps.unigramLmEm(s, d)),
    "q308_unigram_encode" -> ((s, d) =>
      TextAnalysisOps.unigramEncode(s, d)),
    "q309_qlm_topk"       -> ((s, d) => RetrievalOps.qlmTopK(s, d)),
    "q310_cdc_compaction" -> ((s, d) =>
      IncrementalOps.q310CdcCompaction(s, d)),
    "q311_write_amplification" -> ((s, d) =>
      IncrementalOps.q311WriteAmplification(s, d)),
    "q312_unigram_prune"  -> ((s, d) =>
      TextAnalysisOps.unigramPrune(s, d)),
    "q313_cohens_kappa"   -> ((s, d) =>
      TextAnalysisOps.cohensKappa(s, d)),
    "q314_rank_sum"       -> ((s, d) =>
      TextAnalysisOps.rankSumDrift(s, d)),
    "q315_decayed_popularity" -> ((s, d) =>
      EventOps.decayedPopularity(s, d)),
    "q316_bpe_roundtrip"  -> ((s, d) =>
      TextAnalysisOps.bpeRoundtrip(s, d)),
    "q317_dedup_delay_panel" -> ((s, d) =>
      EventOps.dedupDelayPanel(s, d)),
    "q318_trainer_overlap" -> ((s, d) =>
      TextAnalysisOps.trainerVocabOverlap(s, d)),
    "q319_value_magnitude" -> ((s, d) =>
      EventOps.valueMagnitudeProfile(s, d)),
    "q320_session_gap_panel" -> ((s, d) =>
      EventOps.sessionGapPanel(s, d)),
    "q321_share_shift"    -> ((s, d) =>
      EventOps.shareShift(s, d)),
    "q322_corpus_card"    -> ((s, d) =>
      TextAnalysisOps.corpusCard(s, d)),
    "q323_schema_evolution" -> ((s, d) =>
      IncrementalOps.q323SchemaEvolution(s, d)),
    "q324_init_compare"   -> ((s, d) =>
      SimilarityOps.q324InitCompare(s, d)),
    "q325_media_neardup"  -> ((s, d) =>
      MultimodalOps.mediaNearDup(s, d)),
    "q326_reservoir_sample" -> ((s, d) =>
      PipelineOps.reservoirSample(s, d)),
    "q327_quantile_sketch" -> ((s, d) =>
      EventOps.quantileSketchMerge(s, d)),
    "q328_cluster_contamination" -> ((s, d) =>
      DedupOps.clusterContamination(s, d)),
    "q329_bin_packing"    -> ((s, d) =>
      PipelineOps.binPackingReport(s, d)),
    "q330_dq_suite"       -> ((s, d) =>
      graft.dq.DqSuite.dqSuite(s, d)),
    "q331_label_prop"     -> ((s, d) =>
      GraphOps.labelPropagation(s, d)),
    "q332_hits_scores"    -> ((s, d) =>
      GraphOps.hitsScores(s, d)),
    "q333_bradley_terry"  -> ((s, d) =>
      PipelineOps.bradleyTerry(s, d)),
    "q334_greedy_coverage" -> ((s, d) =>
      DedupOps.greedyCoverage(s, d)),
    "q335_dbscan_clusters" -> ((s, d) =>
      SimilarityOps.dbscanClusters(s, d)),
    "q336_personalized_pagerank" -> ((s, d) =>
      GraphOps.personalizedPageRank(s, d)),
    "q337_sketch_overlap" -> ((s, d) =>
      DedupOps.sketchOverlap(s, d)),
    "q338_bootstrap_ci"   -> ((s, d) =>
      PipelineOps.bootstrapCi(s, d)),
    "q339_reshard_plan"   -> ((s, d) =>
      IncrementalOps.reshardPlan(s, d)),
    "q340_eps_percolation" -> ((s, d) =>
      SimilarityOps.epsPercolation(s, d)),
    "q341_sort_pruning"   -> ((s, d) =>
      IncrementalOps.sortKeyPruning(s, d)),
    "q342_gap_fill"       -> (CoreQueries.q342GapFill(_, _)),
    "q343_interval_islands" -> (CoreQueries.q343IntervalIslands _),
    "q344_removal_attribution" -> ((s, d) =>
      EventOps.removalAttribution(s, d)),
    "q345_neyman_alloc"   -> ((s, d) =>
      PipelineOps.neymanAllocation(s, d)),
    "q346_chapman_estimate" -> ((s, d) =>
      DedupOps.chapmanEstimate(s, d)),
    "q347_label_model"    -> ((s, d) =>
      TextAnalysisOps.labelModel(s, d)),
    "q348_randomization_test" -> ((s, d) =>
      PipelineOps.randomizationTest(s, d)),
    "q349_good_turing"    -> ((s, d) =>
      TextAnalysisOps.goodTuring(s, d)),
    "q350_column_entropy" -> ((s, d) =>
      graft.dq.DataQuality.columnEntropy(s, d)),
    "q351_layout_pruning" -> ((s, d) =>
      IncrementalOps.layoutPruning(s, d)),
    "q352_knob_advisor"   -> ((s, d) =>
      KnobAdvisor.knobAdvisor(s, d)),
    "q353_keeper_matrix"  -> ((s, d) =>
      DedupOps.keeperMatrix(s, d)),
    "q354_suffix_lcp"     -> ((s, d) =>
      DedupOps.suffixLcp(s, d)),
    "q355_quarantine_audit" -> ((s, d) =>
      graft.dq.DqSuite.quarantineAudit(s, d)),
    "q356_boilerplate_divergence" -> ((s, d) =>
      DedupOps.boilerplateDivergence(s, d)),
    "q357_zorder_box_read" -> ((s, d) =>
      IncrementalOps.zorderBoxRead(s, d)),
    "q358_host_sorted_read" -> ((s, d) =>
      CrawlOps.hostSortedRead(s, d)),
    "q359_host_canonicalize" -> ((s, d) =>
      CrawlOps.hostCanonicalize(s, d)),
    "q360_incremental_zonemap" -> ((s, d) =>
      IncrementalOps.incrementalZoneMap(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * Entries live in per-family objects under `graft.oracle` (round-9
    * split for reviewability); the shared CTE builders are
    * `graft.oracle.OracleCtes`.
    */
  def oracleSql: Map[String, String] =
    graft.oracle.CoreOracles.sql ++ graft.oracle.DedupOracles.sql ++
    graft.oracle.SimilarityOracles.sql ++ graft.oracle.TextOracles.sql ++
    graft.oracle.EventOracles.sql ++ graft.oracle.PipelineOracles.sql
}
