package graft

import graft.queries.{AnalyticsQueries, CoreQueries, LlmQueries, SketchQueries, SourceQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.qSupplierAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (CoreQueries.q1PricingSummary _),
    "q_mapper_clean"     -> (CoreQueries.qMapperClean _),
    "q_dedupe_rules"     -> (CoreQueries.qDedupeRules _),
    "q_supplier_agg"     -> (CoreQueries.qSupplierAgg _),
    "q3_shipping_priority" -> (AnalyticsQueries.q3ShippingPriority _),
    "q5_local_supplier"    -> (AnalyticsQueries.q5LocalSupplier _),
    "q6_forecast_revenue"  -> (AnalyticsQueries.q6ForecastRevenue _),
    "q_window_topn"        -> (AnalyticsQueries.qWindowTopn _),
    "q_topk_agg"           -> (AnalyticsQueries.qTopkAgg _),
    "q_rollup"             -> (AnalyticsQueries.qRollup _),
    "q_anti_join"          -> (AnalyticsQueries.qAntiJoin _),
    "q_semi_join"          -> (AnalyticsQueries.qSemiJoin _),
    "q_asof_join"          -> (AnalyticsQueries.qAsofJoin _),
    "q_asof_forward"       -> (AnalyticsQueries.qAsofForward _),
    "q_range_join"         -> (AnalyticsQueries.qRangeJoin _),
    "q_salted_join"        -> (AnalyticsQueries.qSaltedJoin _),
    "q_fuzzy_link"         -> (AnalyticsQueries.qFuzzyLink _),
    "q_golden_record"      -> (AnalyticsQueries.qGoldenRecord _),
    "q_small_qty_revenue"  -> (AnalyticsQueries.qSmallQtyRevenue _),
    "q_attribution"        -> (AnalyticsQueries.qAttribution _),
    "q_pareto_share"       -> (AnalyticsQueries.qParetoShare _),
    "q_sole_blame"         -> (AnalyticsQueries.qSoleBlame _),
    "q_anova_lag"          -> (AnalyticsQueries.qAnovaLag _),
    "q_dedup_sweep"        -> (LlmQueries.qDedupSweep _),
    "q_keep_sweep"         -> (LlmQueries.qKeepSweep _),
    "q_zorder_layout"      -> (AnalyticsQueries.qZorderLayout _),
    "q_gap_fill"           -> (AnalyticsQueries.qGapFill _),
    "q_skyline"            -> (AnalyticsQueries.qSkyline _),
    "q_concurrency"        -> (AnalyticsQueries.qConcurrency _),
    "q_seasonality"        -> (AnalyticsQueries.qSeasonality _),
    "q_profile_drift"      -> (SourceQueries.qProfileDrift _),
    "q_sample_exact_k"     -> (LlmQueries.qSampleExactK _),
    "q_simhash_eval"       -> (LlmQueries.qSimhashEval _),
    "q_corr_matrix"        -> (LlmQueries.qCorrMatrix _),
    "q_lang_mismatch"      -> (LlmQueries.qLangMismatch _),
    "q_kanon"              -> (SourceQueries.qKanon _),
    "q_delete_propagation" -> (SourceQueries.qDeletePropagation _),
    "q_hilbert_layout"     -> (AnalyticsQueries.qHilbertLayout _),
    "q_mv_refresh"         -> (AnalyticsQueries.qMvRefresh _),
    "q_mv_join_refresh"    -> (AnalyticsQueries.qMvJoinRefresh _),
    "q_mv_hll_refresh"     -> (AnalyticsQueries.qMvHllRefresh _),
    "q_mv_quantile_refresh" -> (AnalyticsQueries.qMvQuantileRefresh _),
    "q_quantile_sketch_read" -> (AnalyticsQueries.qQuantileSketchRead _),
    "q_range_split_plan"   -> (AnalyticsQueries.qRangeSplitPlan _),
    "q_dict_encode"        -> (AnalyticsQueries.qDictEncode _),
    "q_table_log"          -> (AnalyticsQueries.qTableLog _),
    "q_time_travel"        -> (AnalyticsQueries.qTimeTravel _),
    "q_vacuum_plan"        -> (AnalyticsQueries.qVacuumPlan _),
    "q_orc_roundtrip"      -> (SourceQueries.qOrcRoundtrip _),
    "q_ship_lag"           -> (AnalyticsQueries.qShipLag _),
    "q_skew_report"        -> (AnalyticsQueries.qSkewReport _),
    "q_pivot"              -> (AnalyticsQueries.qPivot _),
    "q_rfm"                -> (AnalyticsQueries.qRfm _),
    "q_markov_transitions" -> (AnalyticsQueries.qMarkovTransitions _),
    "q_ab_test"            -> (AnalyticsQueries.qAbTest _),
    "q_cuped"              -> (AnalyticsQueries.qCuped _),
    "q_rolling_revenue"    -> (AnalyticsQueries.qRollingRevenue _),
    "q_user_growth"        -> (AnalyticsQueries.qUserGrowth _),
    "q_trend_fit"          -> (AnalyticsQueries.qTrendFit _),
    "q_time_to_convert"    -> (AnalyticsQueries.qTimeToConvert _),
    "q_cohort_ltv"         -> (AnalyticsQueries.qCohortLtv _),
    "q_session_paths"      -> (AnalyticsQueries.qSessionPaths _),
    "q_basket_pairs"       -> (AnalyticsQueries.qBasketPairs _),
    "q_forecast_baseline"  -> (AnalyticsQueries.qForecastBaseline _),
    "q_phrase_search"      -> (LlmQueries.qPhraseSearch _),
    "q_more_like_this"     -> (LlmQueries.qMoreLikeThis _),
    "q_integrity"          -> (SourceQueries.qIntegrity _),
    "q_group_median"       -> (AnalyticsQueries.qGroupMedian _),
    "q_dp_median"          -> (AnalyticsQueries.qDpMedian _),
    "q_events_sessionize"  -> (AnalyticsQueries.qEventsSessionize _),
    "q_session_window"     -> (AnalyticsQueries.qSessionWindow _),
    "q_events_window"      -> (AnalyticsQueries.qEventsWindow _),
    "q_burst_detect"       -> (AnalyticsQueries.qBurstDetect _),
    "q_json_extract"       -> (AnalyticsQueries.qJsonExtract _),
    "q_csv_roundtrip"      -> (SourceQueries.qCsvRoundtrip _),
    "q_morris_xml"         -> (SourceQueries.qMorrisXml _),
    "q_rest_json"          -> (SourceQueries.qRestJson _),
    "q_multisource_merge"  -> (SourceQueries.qMultisourceMerge _),
    "q_config_route"       -> (SourceQueries.qConfigRoute _),
    "q_excel_range"        -> (SourceQueries.qExcelRange _),
    "q_excel_table"        -> (SourceQueries.qExcelTable _),
    "q_dedup_exact"        -> (LlmQueries.qDedupExact _),
    "q_dedup_keep"         -> (LlmQueries.qDedupKeep _),
    "q_dedup_minhash"      -> (LlmQueries.qDedupMinhash _),
    "q_dedup_minhash_banded" -> (LlmQueries.qDedupMinhashBanded _),
    "q_lsh_tuning"         -> (LlmQueries.qLshTuning _),
    "q_set_sim_join"       -> (LlmQueries.qSetSimJoin _),
    "q_dedup_near_keep"    -> (LlmQueries.qDedupNearKeep _),
    "q_soft_dedup"         -> (LlmQueries.qSoftDedup _),
    "q_effective_tokens"   -> (LlmQueries.qEffectiveTokens _),
    "q_dedup_keep_best"    -> (LlmQueries.qDedupKeepBest _),
    "q_split_leakage"      -> (LlmQueries.qSplitLeakage _),
    "q_pad_waste"          -> (LlmQueries.qPadWaste _),
    "q_length_bucket_pack" -> (LlmQueries.qLengthBucketPack _),
    "q_dp_count"           -> (LlmQueries.qDpCount _),
    "q_dp_histogram"       -> (LlmQueries.qDpHistogram _),
    "q_dp_topk"            -> (LlmQueries.qDpTopk _),
    "q_url_canon"          -> (LlmQueries.qUrlCanon _),
    "q_dedup_incremental"  -> (LlmQueries.qDedupIncremental _),
    "q_decontaminate"      -> (LlmQueries.qDecontaminate _),
    "q_dedup_embed"        -> (LlmQueries.qDedupEmbed _),
    "q_curation_pipeline"  -> (LlmQueries.qCurationPipeline _),
    "q_curation_pipeline_v2" -> (LlmQueries.qCurationPipelineV2 _),
    "q_stratified_sample"  -> (LlmQueries.qStratifiedSample _),
    "q_token_budget_mix"   -> (LlmQueries.qTokenBudgetMix _),
    "q_tfidf_topk"         -> (LlmQueries.qTfidfTopk _),
    "q_epoch_mix"          -> (LlmQueries.qEpochMix _),
    "q_seq_pack"           -> (LlmQueries.qSeqPack _),
    "q_doc_chunk"          -> (LlmQueries.qDocChunk _),
    "q_shard_assign"       -> (LlmQueries.qShardAssign _),
    "q_compaction_plan"    -> (LlmQueries.qCompactionPlan _),
    "q_ann_recall"         -> (LlmQueries.qAnnRecall _),
    "q_ann_recall_ivf"     -> (LlmQueries.qAnnRecallIvf _),
    "q_snm_dedup"          -> (LlmQueries.qSnmDedup _),
    "q_label_prop"         -> (LlmQueries.qLabelProp _),
    "q_quality_dup_rate"   -> (LlmQueries.qQualityDupRate _),
    "q_chi2_independence"  -> (LlmQueries.qChi2Independence _),
    "q_embed_norm_audit"   -> (LlmQueries.qEmbedNormAudit _),
    "q_quantile_map"       -> (LlmQueries.qQuantileMap _),
    "q_label_prop_prod"    -> (LlmQueries.qLabelPropProd _),
    "q_ngram_jaccard"      -> (LlmQueries.qNgramJaccard _),
    "q_ann_cosine"         -> (LlmQueries.qAnnCosine _),
    "q_token_count"        -> (LlmQueries.qTokenCount _),
    "q_lang_id"            -> (LlmQueries.qLangId _),
    "q_langid_calibration" -> (LlmQueries.qLangidCalibration _),
    "q_quality_score"      -> (LlmQueries.qQualityScore _),
    "q_fingerprint"        -> (LlmQueries.qFingerprint _),
    "q_hash_split"         -> (LlmQueries.qHashSplit _),
    "q_text_clean"         -> (LlmQueries.qTextClean _),
    "q_pii_redact"         -> (LlmQueries.qPiiRedact _),
    "q_rarity_score"       -> (LlmQueries.qRarityScore _),
    "q_repetition"         -> (LlmQueries.qRepetition _),
    "q_doc_entropy"        -> (LlmQueries.qDocEntropy _),
    "q_dedup_simhash"      -> (LlmQueries.qDedupSimhash _),
    "q_span_dedup"         -> (LlmQueries.qSpanDedup _),
    "q_source_gate"        -> (LlmQueries.qSourceGate _),
    "q_corpus_stats"       -> (LlmQueries.qCorpusStats _),
    "q_domain_cap"         -> (LlmQueries.qDomainCap _),
    "q_ann_lsh"            -> (LlmQueries.qAnnLsh _),
    "q_ann_lsh_multi"      -> (LlmQueries.qAnnLshMulti _),
    "q_knn_graph"          -> (LlmQueries.qKnnGraph _),
    "q_knn_graph_prod"     -> (LlmQueries.qKnnGraphProd _),
    "q_label_purity"       -> (LlmQueries.qLabelPurity _),
    "q_label_purity_prod"  -> (LlmQueries.qLabelPurityProd _),
    "q_dedup_embed_lsh"    -> (LlmQueries.qDedupEmbedLsh _),
    "q_dedup_embed_lsh_prod" -> (LlmQueries.qDedupEmbedLshProd _),
    "q_semdedup"           -> (LlmQueries.qSemdedup _),
    "q_ann_ivf"            -> (LlmQueries.qAnnIvf _),
    "q_ann_ivf_full"       -> (LlmQueries.qAnnIvfFull _),
    "q_embed_quant"        -> (LlmQueries.qEmbedQuant _),
    "q_ann_quant"          -> (LlmQueries.qAnnQuant _),
    "q_pq_codes"           -> (LlmQueries.qPqCodes _),
    "q_ann_pq"             -> (LlmQueries.qAnnPq _),
    "q_embed_binary"       -> (LlmQueries.qEmbedBinary _),
    "q_ann_hamming"        -> (LlmQueries.qAnnHamming _),
    "q_line_dedup"         -> (LlmQueries.qLineDedup _),
    "q_ivfpq_store"        -> (LlmQueries.qIvfpqStore _),
    "q_ann_ivfpq"          -> (LlmQueries.qAnnIvfpq _),
    "q_rrf_fuse"           -> (LlmQueries.qRrfFuse _),
    "q_ann_prefix"         -> (LlmQueries.qAnnPrefix _),
    "q_pair_mine"          -> (LlmQueries.qPairMine _),
    "q_quant_error"        -> (LlmQueries.qQuantError _),
    "q_vocab_coverage"     -> (LlmQueries.qVocabCoverage _),
    "q_retention"          -> (AnalyticsQueries.qRetention _),
    "q_length_percentiles" -> (LlmQueries.qLengthPercentiles _),
    "q_hll_distinct"       -> (SketchQueries.qHllDistinct _),
    "q_heavy_hitters"      -> (SketchQueries.qHeavyHitters _),
    "q_join_size_estimate" -> (SketchQueries.qJoinSizeEstimate _),
    "q_lm_score"           -> (SketchQueries.qLmScore _),
    "q_corpus_stats_v2"    -> (LlmQueries.qCorpusStatsV2 _),
    "q_bpe_count"          -> (LlmQueries.qBpeCount _),
    "q_token_budget_bpe"   -> (LlmQueries.qTokenBudgetBpe _),
    "q_seq_pack_bpe"       -> (LlmQueries.qSeqPackBpe _),
    "q_bpe_encode"         -> (LlmQueries.qBpeEncode _),
    "q_wordpiece_encode"   -> (LlmQueries.qWordpieceEncode _),
    "q_unigram_encode"     -> (LlmQueries.qUnigramEncode _),
    "q_mlm_mask"           -> (LlmQueries.qMlmMask _),
    "q_span_corrupt"       -> (LlmQueries.qSpanCorrupt _),
    "q_bpe_encode_bytes"   -> (LlmQueries.qBpeEncodeBytes _),
    "q_substr_dedup"       -> (LlmQueries.qSubstrDedup _),
    "q_bloom_prefilter"    -> (SketchQueries.qBloomPrefilter _),
    "q_events_hop"         -> (AnalyticsQueries.qEventsHop _),
    "q_embed_pool"         -> (LlmQueries.qEmbedPool _),
    "q_containment"        -> (LlmQueries.qContainment _),
    "q_temperature_mix"    -> (LlmQueries.qTemperatureMix _),
    "q_jsonl_roundtrip"    -> (SourceQueries.qJsonlRoundtrip _),
    "q_quality_percentiles" -> (LlmQueries.qQualityPercentiles _),
    "q_events_funnel"      -> (AnalyticsQueries.qEventsFunnel _),
    "q_containment_probe"  -> (LlmQueries.qContainmentProbe _),
    "q_media_probe"        -> (SourceQueries.qMediaProbe _),
    "q_profile"            -> (SourceQueries.qProfile _),
    "q_scd2"               -> (SourceQueries.qScd2 _),
    "q_temperature_mix_alpha" -> (LlmQueries.qTemperatureMixAlpha _),
    "q_winnow"             -> (LlmQueries.qWinnow _),
    "q_winnow_pairs"       -> (LlmQueries.qWinnowPairs _),
    "q_winnow_keep"        -> (LlmQueries.qWinnowKeep _),
    "q_kmeans_assign"      -> (LlmQueries.qKmeansAssign _),
    "q_kmeans_centroids"   -> (LlmQueries.qKmeansCentroids _),
    "q_cluster_report"     -> (LlmQueries.qClusterReport _),
    "q_pagerank"           -> (AnalyticsQueries.qPageRank _),
    "q_ppr"                -> (AnalyticsQueries.qPersonalizedPagerank _),
    "q_cdc_chunks"         -> (LlmQueries.qCdcChunks _),
    "q_cdc_stats"          -> (LlmQueries.qCdcStats _),
    "q_cdc_delta"          -> (LlmQueries.qCdcDelta _),
    "q_cluster_balance"    -> (LlmQueries.qClusterBalance _),
    "q_weighted_sample"    -> (LlmQueries.qWeightedSample _),
    "q_concomp"            -> (AnalyticsQueries.qConcomp _),
    "q_kcore"              -> (AnalyticsQueries.qKcore _),
    "q_bfs_hops"           -> (AnalyticsQueries.qBfsHops _),
    "q_hits"               -> (AnalyticsQueries.qHits _),
    "q_hll_intersect"      -> (SketchQueries.qHllIntersect _),
    "q_triangles"          -> (AnalyticsQueries.qTriangles _),
    "q_bm25"               -> (LlmQueries.qBm25 _),
    "q_cooccur_pmi"        -> (LlmQueries.qCooccurPmi _),
    "q_importance_score"   -> (LlmQueries.qImportanceScore _),
    "q_top_ngrams"         -> (LlmQueries.qTopNgrams _),
    "q_robust_outliers"    -> (LlmQueries.qRobustOutliers _),
    "q_pca_project"        -> (LlmQueries.qPcaProject _),
    "q_cube"               -> (AnalyticsQueries.qCube _),
    "q_vocab_gini"         -> (LlmQueries.qVocabGini _),
    "q_source_divergence"  -> (LlmQueries.qSourceDivergence _),
    "q_score_normalize"    -> (LlmQueries.qScoreNormalize _),
    "q_source_overlap"     -> (LlmQueries.qSourceOverlap _),
    "q_dedup_cluster_sizes" -> (LlmQueries.qDedupClusterSizes _),
    "q_vocab_growth"       -> (LlmQueries.qVocabGrowth _),
    "q_zipf_fit"           -> (LlmQueries.qZipfFit _),
    "q_ks_split_drift"     -> (LlmQueries.qKsSplitDrift _),
    "q_bootstrap_ci"       -> (LlmQueries.qBootstrapCi _)
  )

  /** DuckDB-runnable equivalent for each query (same column names/order-by). */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> CoreQueries.q1Sql,
    "q_mapper_clean"     -> CoreQueries.qMapperCleanSql,
    "q_dedupe_rules"     -> CoreQueries.qDedupeRulesSql,
    "q_supplier_agg"     -> CoreQueries.qSupplierAggSql,
    "q3_shipping_priority" -> AnalyticsQueries.q3Sql,
    "q5_local_supplier"    -> AnalyticsQueries.q5Sql,
    "q6_forecast_revenue"  -> AnalyticsQueries.q6Sql,
    "q_window_topn"        -> AnalyticsQueries.qWindowTopnSql,
    "q_topk_agg"           -> AnalyticsQueries.qTopkAggSql,
    "q_rollup"             -> AnalyticsQueries.qRollupSql,
    "q_anti_join"          -> AnalyticsQueries.qAntiJoinSql,
    "q_semi_join"          -> AnalyticsQueries.qSemiJoinSql,
    "q_asof_join"          -> AnalyticsQueries.qAsofJoinSql,
    "q_asof_forward"       -> AnalyticsQueries.qAsofForwardSql,
    "q_range_join"         -> AnalyticsQueries.qRangeJoinSql,
    "q_salted_join"        -> AnalyticsQueries.qSaltedJoinSql,
    // fuzzy linkage: SymSpell deletion-variant equi-join + levenshtein verify
    "q_fuzzy_link"         -> AnalyticsQueries.qFuzzyLinkSql,
    // golden record: name-grain linkage + closure + survivorship
    "q_golden_record"      -> AnalyticsQueries.qGoldenRecordSql,
    // TPC-H Q17 shape: correlated subquery decorrelated, exact-integer 0.2*avg
    "q_small_qty_revenue"  -> AnalyticsQueries.qSmallQtyRevenueSql,
    // last-touch attribution: asof via union + last(ignoreNulls) window
    "q_attribution"        -> AnalyticsQueries.qAttributionSql,
    // 80/20 concentration: two-level running sum over (rev desc, key)
    "q_pareto_share"       -> AnalyticsQueries.qParetoShareSql,
    // TPC-H Q21 shape: two correlated EXISTS as one conditional agg
    "q_sole_blame"         -> AnalyticsQueries.qSoleBlameSql,
    // one-way ANOVA F over exact moments, pinned-order 5-term sum
    "q_anova_lag"          -> AnalyticsQueries.qAnovaLagSql,
    // exact threshold-sensitivity curve off one prefix-join pass
    "q_dedup_sweep"        -> LlmQueries.qDedupSweepSql,
    // survivor counts per threshold: set-grain components vs 3 closures
    "q_keep_sweep"         -> LlmQueries.qKeepSweepSql,
    // z-order audit: Morton interleave, per-file min/max pruning stats
    "q_zorder_layout"      -> AnalyticsQueries.qZorderLayoutSql,
    // calendar gap fill: dense spine + forward fill, filled flag
    "q_gap_fill"           -> AnalyticsQueries.qGapFillSql,
    // 2-D Pareto front: ordered scan vs the oracle's O(n²) NOT EXISTS
    "q_skyline"            -> AnalyticsQueries.qSkylineSql,
    // sweep-line concurrency: distributed running sum over (ts, delta)
    "q_concurrency"        -> AnalyticsQueries.qConcurrencySql,
    // dow seasonal index: mirrored IEEE tree over four exact integers
    "q_seasonality"        -> AnalyticsQueries.qSeasonalitySql,
    // snapshot drift: per-column TV distance, one pinned division
    "q_profile_drift"      -> SourceQueries.qProfileDriftSql,
    // exact-k per-source hash-priority sample (TopKRewriteRule path)
    "q_sample_exact_k"     -> LlmQueries.qSampleExactKSql,
    // blocking-quality confusion: simhash candidates vs exact truth
    "q_simhash_eval"       -> LlmQueries.qSimhashEvalSql,
    // one-pass Pearson matrix over decimal(38,0)/HUGEINT exact moments
    "q_corr_matrix"        -> LlmQueries.qCorrMatrixSql,
    // declared-vs-detected language confusion rollup
    "q_lang_mismatch"      -> LlmQueries.qLangMismatchSql,
    // k-anonymity exposure: class sizes below k per quasi-id combo
    "q_kanon"              -> SourceQueries.qKanonSql,
    "q_delete_propagation" -> SourceQueries.qDeletePropagationSql,
    // hilbert layout audit: the xy->d walk unrolled as chained CTEs
    "q_hilbert_layout"     -> AnalyticsQueries.qHilbertLayoutSql,
    // incremental MV refresh: delta partials + full-outer merge
    "q_mv_refresh"         -> AnalyticsQueries.qMvRefreshSql,
    "q_mv_join_refresh"    -> AnalyticsQueries.qMvJoinRefreshSql,
    // sketch-MV: per-(day,bucket) HLL register max-merge
    "q_mv_hll_refresh"     -> AnalyticsQueries.qMvHllRefreshSql,
    "q_mv_quantile_refresh" -> AnalyticsQueries.qMvQuantileRefreshSql,
    "q_quantile_sketch_read" -> AnalyticsQueries.qQuantileSketchReadSql,
    "q_range_split_plan"   -> AnalyticsQueries.qRangeSplitPlanSql,
    "q_dict_encode"        -> AnalyticsQueries.qDictEncodeSql,
    // lakehouse commit-log: per-commit add/remove accounting + live totals
    "q_table_log"          -> AnalyticsQueries.qTableLogSql,
    // time-travel live-file listing at snapshots 2 (pre-compaction) and 4
    "q_time_travel"        -> AnalyticsQueries.qTimeTravelSql,
    // vacuum eligibility per retention horizon: live/retained/deletable
    "q_vacuum_plan"        -> AnalyticsQueries.qVacuumPlanSql,
    "q_orc_roundtrip"      -> SourceQueries.qOrcRoundtripSql,
    // ship-lag SLA percentiles: histogram-CDF per priority
    "q_ship_lag"           -> AnalyticsQueries.qShipLagSql,
    // skew audit: integer bit-length buckets, pinned share division
    "q_skew_report"        -> AnalyticsQueries.qSkewReportSql,
    // literal-domain pivot lowered to conditional counts
    "q_pivot"              -> AnalyticsQueries.qPivotSql,
    // RFM quintiles from histogram-CDF cuts, exact-integer base stats
    "q_rfm"                -> AnalyticsQueries.qRfmSql,
    // per-user lag on the (ts, event_id) total order; broadcast row totals
    "q_markov_transitions" -> AnalyticsQueries.qMarkovTransitionsSql,
    // md5 variant split, pooled z² on a mirrored IEEE tree
    "q_ab_test"            -> AnalyticsQueries.qAbTestSql,
    "q_cuped"              -> AnalyticsQueries.qCupedSql,
    // RANGE-framed rolling window over the daily (not row) frame
    "q_rolling_revenue"    -> AnalyticsQueries.qRollingRevenueSql,
    // per-user first-seen min, running sum over the |days| frame
    "q_user_growth"        -> AnalyticsQueries.qUserGrowthSql,
    // OLS closed form over decimal(38,0)/HUGEINT exact moment sums
    "q_trend_fit"          -> AnalyticsQueries.qTrendFitSql,
    // signup->qualified-purchase latency, histogram-CDF percentiles
    "q_time_to_convert"    -> AnalyticsQueries.qTimeToConvertSql,
    // weekly cohorts x weeks-since, exact micro-unit running LTV
    "q_cohort_ltv"         -> AnalyticsQueries.qCohortLtvSql,
    // one-window-pass position-in-session, sorted-struct path agg
    "q_session_paths"      -> AnalyticsQueries.qSessionPathsSql,
    // basket-bounded within-order self-join, division-first lift
    "q_basket_pairs"       -> AnalyticsQueries.qBasketPairsSql,
    // naive vs seasonal-naive MAE on the daily control-plane frame
    "q_forecast_baseline"  -> AnalyticsQueries.qForecastBaselineSql,
    // shifted-postings adjacency intersection, scan-stage term filter
    "q_phrase_search"      -> LlmQueries.qPhraseSearchSql,
    // exact-integer idf-weighted dot over the inverted index
    "q_more_like_this"     -> LlmQueries.qMoreLikeThisSql,
    // per-FK-edge orphan audit over distinct-key left joins
    "q_integrity"          -> SourceQueries.qIntegritySql,
    "q_group_median"       -> AnalyticsQueries.qGroupMedianSql,
    "q_dp_median"          -> AnalyticsQueries.qDpMedianSql,
    "q_events_sessionize"  -> AnalyticsQueries.qEventsSessionizeSql,
    "q_session_window"     -> AnalyticsQueries.qSessionWindowSql,
    "q_events_window"      -> AnalyticsQueries.qEventsWindowSql,
    // minute-grain Hampel burst gate over the histogram-CDF medians
    "q_burst_detect"       -> AnalyticsQueries.qBurstDetectSql,
    "q_json_extract"       -> AnalyticsQueries.qJsonExtractSql,
    "q_csv_roundtrip"      -> SourceQueries.qCsvRoundtripSql,
    "q_morris_xml"         -> SourceQueries.qMorrisXmlSql,
    "q_rest_json"          -> SourceQueries.qRestJsonSql,
    "q_multisource_merge"  -> SourceQueries.qMultisourceMergeSql,
    "q_config_route"       -> SourceQueries.qConfigRouteSql,
    "q_excel_range"        -> SourceQueries.qExcelRangeSql,
    "q_excel_table"        -> SourceQueries.qExcelTableSql,
    "q_dedup_exact"        -> LlmQueries.qDedupExactSql,
    "q_dedup_keep"         -> LlmQueries.qDedupKeepSql,
    "q_dedup_minhash"      -> LlmQueries.qDedupMinhashSql,
    "q_lsh_tuning"         -> LlmQueries.qLshTuningSql,
    "q_dedup_minhash_banded" -> LlmQueries.qDedupMinhashSql,
    // exact prefix-filter join: zero-false-negative by THEOREM, so the
    // same all-pairs oracle gates a completely different candidate path
    "q_set_sim_join"       -> LlmQueries.qDedupMinhashSql,
    "q_dedup_near_keep"    -> LlmQueries.qDedupNearKeepSql,
    "q_soft_dedup"         -> LlmQueries.qSoftDedupSql,
    "q_effective_tokens"   -> LlmQueries.qEffectiveTokensSql,
    "q_dedup_keep_best"    -> LlmQueries.qDedupKeepBestSql,
    "q_split_leakage"      -> LlmQueries.qSplitLeakageSql,
    "q_pad_waste"          -> LlmQueries.qPadWasteSql,
    "q_length_bucket_pack" -> LlmQueries.qLengthBucketPackSql,
    "q_dp_count"           -> LlmQueries.qDpCountSql,
    "q_dp_histogram"       -> LlmQueries.qDpHistogramSql,
    "q_dp_topk"            -> LlmQueries.qDpTopkSql,
    "q_url_canon"          -> LlmQueries.qUrlCanonSql,
    "q_dedup_incremental"  -> LlmQueries.qDedupIncrementalSql,
    "q_decontaminate"      -> LlmQueries.qDecontaminateSql,
    "q_dedup_embed"        -> LlmQueries.qDedupEmbedSql,
    "q_ann_lsh"            -> LlmQueries.qAnnLshSql,
    "q_ann_lsh_multi"      -> LlmQueries.qAnnLshMultiSql,
    // symmetric bucket self-join knn graph, every bucket id replayed
    "q_knn_graph"          -> LlmQueries.qKnnGraphSql,
    // production 8x16 posture: bucket-bounded as the corpus grows
    "q_knn_graph_prod"     -> LlmQueries.qKnnGraphProdSql,
    // per-label neighbor agreement over the knn edge list
    "q_label_purity"       -> LlmQueries.qLabelPuritySql,
    "q_label_purity_prod"  -> LlmQueries.qLabelPurityProdSql,
    // multi-table LSH route forced under the brute all-pairs oracle — the
    // (32 tables × 2 planes) config saturates recall on this corpus
    "q_dedup_embed_lsh"    -> LlmQueries.qDedupEmbedSql,
    // the PRODUCTION posture (8 × 16): oracle replays every table key,
    // the candidate join, and the cosine verify — hash-gated end to end
    "q_dedup_embed_lsh_prod" -> LlmQueries.qDedupEmbedLshProdSql,
    // semantic materializer: assignment + in-cell pairs + closure all
    // replayed in SQL over the pinned centroid fixture
    "q_semdedup"           -> LlmQueries.qSemdedupSql,
    "q_curation_pipeline"  -> LlmQueries.qCurationPipelineSql,
    "q_curation_pipeline_v2" -> LlmQueries.qCurationPipelineV2Sql,
    "q_stratified_sample"  -> LlmQueries.qStratifiedSampleSql,
    "q_token_budget_mix"   -> LlmQueries.qTokenBudgetMixSql,
    "q_tfidf_topk"         -> LlmQueries.qTfidfTopkSql,
    "q_epoch_mix"          -> LlmQueries.qEpochMixSql,
    "q_seq_pack"           -> LlmQueries.qSeqPackSql,
    "q_doc_chunk"          -> LlmQueries.qDocChunkSql,
    "q_shard_assign"       -> LlmQueries.qShardAssignSql,
    // compaction plan: prefix-sum bin packing over the file listing
    "q_compaction_plan"    -> LlmQueries.qCompactionPlanSql,
    // ANN recall: LSH result ∩ brute-force truth, both legs SQL-replayed
    "q_ann_recall"         -> LlmQueries.qAnnRecallSql,
    // IVF probe sweep: nprobe 2 vs 4 recall over the pinned fixture
    "q_ann_recall_ivf"     -> LlmQueries.qAnnRecallIvfSql,
    // sorted-neighborhood pass: global order + (w-1) offset equi-join
    "q_snm_dedup"          -> LlmQueries.qSnmDedupSql,
    // label propagation: per-round vote join + window, seeds pinned
    "q_label_prop"         -> LlmQueries.qLabelPropSql,
    // quality x duplication calibration: value buckets x fingerprint groups
    "q_quality_dup_rate"   -> LlmQueries.qQualityDupRateSql,
    // chi2 contingency audit: integer-pinned per-cell contributions
    "q_chi2_independence"  -> LlmQueries.qChi2IndependenceSql,
    // embedding norm QA: micro-unit norms through the histogram-CDF engine
    "q_embed_norm_audit"   -> LlmQueries.qEmbedNormAuditSql,
    // quantile mapping: CDF matching across sources, distinct-value bounded
    "q_quantile_map"       -> LlmQueries.qQuantileMapSql,
    // production 8x16 posture of the same propagation (scale twin)
    "q_label_prop_prod"    -> LlmQueries.qLabelPropProdSql,
    "q_ngram_jaccard"      -> LlmQueries.qNgramJaccardSql,
    "q_ann_cosine"         -> LlmQueries.qAnnCosineSql,
    "q_token_count"        -> LlmQueries.qTokenCountSql,
    "q_lang_id"            -> LlmQueries.qLangIdSql,
    "q_langid_calibration" -> LlmQueries.qLangidCalibrationSql,
    "q_quality_score"      -> LlmQueries.qQualityScoreSql,
    "q_fingerprint"        -> LlmQueries.qFingerprintSql,
    "q_hash_split"         -> LlmQueries.qHashSplitSql,
    "q_text_clean"         -> LlmQueries.qTextCleanSql,
    "q_pii_redact"         -> LlmQueries.qPiiRedactSql,
    "q_rarity_score"       -> LlmQueries.qRarityScoreSql,
    "q_repetition"         -> LlmQueries.qRepetitionSql,
    "q_doc_entropy"        -> LlmQueries.qDocEntropySql,
    "q_dedup_simhash"      -> LlmQueries.qDedupSimhashSql,
    "q_span_dedup"         -> LlmQueries.qSpanDedupSql,
    "q_source_gate"        -> LlmQueries.qSourceGateSql,
    "q_corpus_stats"       -> LlmQueries.qCorpusStatsSql,
    "q_domain_cap"         -> LlmQueries.qDomainCapSql,
    // exhaustive IVF == brute force for ANY centroids: same oracle as
    // q_ann_cosine, so the IVF machinery itself is oracle-gated
    "q_ann_ivf_full"       -> LlmQueries.qAnnCosineSql,
    // nprobe<nlist IVF: k-means centroids pinned as a parquet fixture at
    // query time; the oracle replays assignment+probe+search in pure SQL
    "q_ann_ivf"            -> LlmQueries.qAnnIvfSql,
    // int8 scalar quantization: ranges, every code, the integer dot, and
    // the ranking all replay in SQL — the quantized store is hash-gated
    "q_embed_quant"        -> LlmQueries.qEmbedQuantSql,
    "q_ann_quant"          -> LlmQueries.qAnnQuantSql,
    // product quantization: the ENTIRE train -> encode -> ADC-search chain
    // replays in SQL (per-subspace Lloyd rounds, no pinned fixture)
    "q_pq_codes"           -> LlmQueries.qPqCodesSql,
    "q_ann_pq"             -> LlmQueries.qAnnPqSql,
    // 1-bit sign quantization: thresholds, packed words, and the Hamming
    // ranking all replay in SQL (xor + popcount both engines)
    "q_embed_binary"       -> LlmQueries.qEmbedBinarySql,
    "q_ann_hamming"        -> LlmQueries.qAnnHammingSql,
    // line-grain dedup: winner selection, reassembly, and counts replay in
    // SQL over the same derived multi-line corpus
    "q_line_dedup"         -> LlmQueries.qLineDedupSql,
    // IVF-PQ: coarse training, residual codebooks, cell routing, and the
    // ADC ranking ALL replay in SQL — no pinned fixture
    "q_ivfpq_store"        -> LlmQueries.qIvfpqStoreSql,
    "q_ann_ivfpq"          -> LlmQueries.qAnnIvfpqSql,
    // rank fusion: both branch rankings + the pinned-division fusion
    // replay in SQL; cohort retention: integer week buckets + one division
    "q_rrf_fuse"           -> LlmQueries.qRrfFuseSql,
    // two-stage prefix-dim cascade: both stages replay in SQL
    "q_ann_prefix"         -> LlmQueries.qAnnPrefixSql,
    // contrastive pairs: positives via the zero-false-negative all-pairs
    // argument, negatives via the same md5-bucket pairing
    "q_pair_mine"          -> LlmQueries.qPairMineSql,
    // int8 error audit in exact micro-units; tokenizer-efficiency report
    // over the replayed BPE merge chain
    "q_quant_error"        -> LlmQueries.qQuantErrorSql,
    "q_vocab_coverage"     -> LlmQueries.qVocabCoverageSql,
    "q_retention"          -> AnalyticsQueries.qRetentionSql,
    // sketches: the FULL register/counter state replays in SQL (md5 hash
    // family), so approximation machinery sits under the exact hash gate
    // exact percentiles off the histogram CDF — same no-value-buffering
    // posture as q_corpus_stats' median, generalized to any percentile
    "q_length_percentiles" -> LlmQueries.qLengthPercentilesSql,
    "q_hll_distinct"       -> SketchQueries.qHllDistinctSql,
    "q_heavy_hitters"      -> SketchQueries.qHeavyHittersSql,
    "q_join_size_estimate" -> SketchQueries.qJoinSizeEstimateSql,
    "q_lm_score"           -> SketchQueries.qLmScoreSql,
    // trained-merges BPE: training pinned as a fixture (deterministic but
    // not SQL-expressible); the ENCODE replays in pure SQL — one literal
    // replace per merge rank — so model-token counts sit under the hash gate
    // bounded-memory corpus report: HLL register state replaces the exact
    // distinct shuffle; published columns are exact sketch state
    "q_corpus_stats_v2"    -> LlmQueries.qCorpusStatsV2Sql,
    "q_bpe_count"          -> LlmQueries.qBpeCountSql,
    "q_token_budget_bpe"   -> LlmQueries.qTokenBudgetBpeSql,
    "q_seq_pack_bpe"       -> LlmQueries.qSeqPackBpeSql,
    "q_bpe_encode"         -> LlmQueries.qBpeEncodeSql,
    "q_wordpiece_encode"   -> LlmQueries.qWordpieceEncodeSql,
    "q_unigram_encode"     -> LlmQueries.qUnigramEncodeSql,
    "q_mlm_mask"           -> LlmQueries.qMlmMaskSql,
    "q_span_corrupt"       -> LlmQueries.qSpanCorruptSql,
    "q_bpe_encode_bytes"   -> LlmQueries.qBpeEncodeBytesSql,
    "q_substr_dedup"       -> LlmQueries.qSubstrDedupSql,
    "q_bloom_prefilter"    -> SketchQueries.qBloomPrefilterSql,
    "q_events_hop"         -> AnalyticsQueries.qEventsHopSql,
    "q_embed_pool"         -> LlmQueries.qEmbedPoolSql,
    "q_containment"        -> LlmQueries.qContainmentSql,
    "q_temperature_mix"    -> LlmQueries.qTemperatureMixSql,
    "q_jsonl_roundtrip"    -> SourceQueries.qJsonlRoundtripSql,
    "q_quality_percentiles" -> LlmQueries.qQualityPercentilesSql,
    "q_events_funnel"      -> AnalyticsQueries.qEventsFunnelSql,
    "q_containment_probe"  -> LlmQueries.qContainmentProbeSql,
    "q_media_probe"        -> SourceQueries.qMediaProbeSql,
    // per-column feed profile: every normalization + aggregate replayed
    "q_profile"            -> SourceQueries.qProfileSql,
    // SCD2 history build: full-outer merge vs planted-churn snapshot
    "q_scd2"               -> SourceQueries.qScd2Sql,
    "q_temperature_mix_alpha" -> LlmQueries.qTemperatureMixAlphaSql,
    "q_winnow"             -> LlmQueries.qWinnowSql,
    "q_winnow_pairs"       -> LlmQueries.qWinnowPairsSql,
    "q_winnow_keep"        -> LlmQueries.qWinnowKeepSql,
    "q_kmeans_assign"      -> LlmQueries.qKmeansAssignSql,
    "q_kmeans_centroids"   -> LlmQueries.qKmeansCentroidsSql,
    // per-label tightness + nearest-centroid separation, exact integers
    "q_cluster_report"     -> LlmQueries.qClusterReportSql,
    "q_pagerank"           -> AnalyticsQueries.qPageRankSql,
    // seeded restart vector, every floor-division round replayed
    "q_ppr"                -> AnalyticsQueries.qPersonalizedPagerankSql,
    "q_cdc_chunks"         -> LlmQueries.qCdcChunksSql,
    "q_cdc_stats"          -> LlmQueries.qCdcStatsSql,
    "q_cdc_delta"          -> LlmQueries.qCdcDeltaSql,
    "q_cluster_balance"    -> LlmQueries.qClusterBalanceSql,
    "q_weighted_sample"    -> LlmQueries.qWeightedSampleSql,
    "q_concomp"            -> AnalyticsQueries.qConcompSql,
    // k-core peeling: 8 unrolled rounds (no-op past the fixed point)
    "q_kcore"              -> AnalyticsQueries.qKcoreSql,
    // bounded multi-source BFS: 3 frontier rounds unrolled
    "q_bfs_hops"           -> AnalyticsQueries.qBfsHopsSql,
    // HITS: both rounds + floor-renormalization totals replayed
    "q_hits"               -> AnalyticsQueries.qHitsSql,
    "q_hll_intersect"      -> SketchQueries.qHllIntersectSql,
    "q_triangles"          -> AnalyticsQueries.qTrianglesSql,
    "q_bm25"               -> LlmQueries.qBm25Sql,
    "q_cooccur_pmi"        -> LlmQueries.qCooccurPmiSql,
    "q_importance_score"   -> LlmQueries.qImportanceScoreSql,
    "q_top_ngrams"         -> LlmQueries.qTopNgramsSql,
    "q_robust_outliers"    -> LlmQueries.qRobustOutliersSql,
    "q_pca_project"        -> LlmQueries.qPcaProjectSql,
    "q_cube"               -> AnalyticsQueries.qCubeSql,
    "q_vocab_gini"         -> LlmQueries.qVocabGiniSql,
    // pairwise TV distance via the ln-free min-overlap identity
    "q_source_divergence"  -> LlmQueries.qSourceDivergenceSql,
    // within-source ECDF rank transform over the histogram-CDF engine
    "q_score_normalize"    -> LlmQueries.qScoreNormalizeSql,
    // cross-source near-dup matrix via the zero-false-negative replay
    "q_source_overlap"     -> LlmQueries.qSourceOverlapSql,
    // component sizes of the near-dup graph, recursive-CTE min labels
    "q_dedup_cluster_sizes" -> LlmQueries.qDedupClusterSizesSql,
    "q_vocab_growth"       -> LlmQueries.qVocabGrowthSql,
    "q_zipf_fit"           -> LlmQueries.qZipfFitSql,
    "q_ks_split_drift"     -> LlmQueries.qKsSplitDriftSql,
    "q_bootstrap_ci"       -> LlmQueries.qBootstrapCiSql
  )
}
