package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the large-scale
  * extension operators) is exposed as a named query over the driver's parquet
  * tables; each SQL-expressible query has a DuckDB oracle twin with matching
  * column names, types, and row order.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q19ProgressReport(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_grouped_sum"         -> (Relational.q01GroupedSum _),
    "q02_broadcast_join"      -> (Relational.q02BroadcastJoin _),
    "q03_fact_join"           -> (Relational.q03FactJoin _),
    "q04_anti_join"           -> (Relational.q04AntiJoin _),
    "q05_left_outer_coalesce" -> (Relational.q05LeftOuterCoalesce _),
    "q06_correlated_null"     -> (Relational.q06CorrelatedNull _),
    "q07_latest_value"        -> (Relational.q07LatestValue _),
    "q08_row_number"          -> (Relational.q08RowNumber _),
    "q09_running_total"       -> (Relational.q09RunningTotal _),
    "q10_union_header"        -> (Relational.q10UnionHeader _),
    "q11_date_parts"          -> (Relational.q11DateParts _),
    "q12_date_sequence"       -> (Relational.q12DateSequence _),
    "q13_change_detection"    -> (Relational.q13ChangeDetection _),
    "q14_upsert"              -> (Relational.q14Upsert _),
    "q15_explode_array"       -> (Relational.q15ExplodeArray _),
    "q16_json_extract"        -> (Relational.q16JsonExtract _),
    "q17_date_between"        -> (Relational.q17DateBetween _),
    "q18_topk"                -> (Relational.q18TopK _),
    "q19_progress_report"     -> (Relational.q19ProgressReport _),
    "q20_dedup_exact"         -> (Analytics.q20DedupExact _),
    "q21_ngram_jaccard"       -> (Analytics.q21NgramJaccard _),
    "q22_minhash_lsh"         -> (Analytics.q22MinhashLsh _),
    "q23_simhash_neardup"     -> (Analytics.q23SimhashNearDup _),
    "q24_knn_brute"           -> (Analytics.q24KnnBruteForce _),
    "q25_knn_lsh"             -> (Analytics.q25KnnLsh _),
    "q26_lang_id"             -> (Analytics.q26LangId _),
    "q27_text_quality"        -> (Analytics.q27TextQuality _),
    "q28_token_count"         -> (Analytics.q28TokenCount _),
    "q29_fingerprint"         -> (Analytics.q29Fingerprint _),
    "q30_event_hourly"        -> (Analytics.q30EventHourly _),
    "q31_embed_neardup"       -> (Analytics.q31EmbeddingNearDup _),
    "q32_event_dedup"         -> (Analytics.q32EventDedup _),
    "q33_multimodal"          -> (Analytics.q33Multimodal _),
    "q34_sessionize"          -> (Analytics.q34Sessionize _),
    "q35_tfidf"               -> (Analytics.q35TfIdf _),
    "q36_percentiles"         -> (Analytics.q36Percentiles _),
    "q37_rollup"              -> (Analytics.q37Rollup _),
    "q38_asof"                -> (Analytics.q38AsOf _),
    "q39_knn_ivf"             -> (Analytics.q39KnnIvf _),
    "q40_window_suite"        -> (Relational.q40WindowSuite _),
    "q41_string_suite"        -> (Relational.q41StringSuite _),
    "q42_stats_suite"         -> (Relational.q42StatsSuite _),
    "q43_null_suite"          -> (Relational.q43NullSuite _),
    "q44_cube"                -> (Analytics.q44Cube _),
    "q45_range_frame"         -> (Analytics.q45RangeFrame _),
    "q46_dedup_clusters"      -> (Analytics.q46DedupClusters _),
    "q47_funnel"              -> (Analytics.q47Funnel _),
    "q48_histogram"           -> (Analytics.q48Histogram _),
    "q49_join_suite"          -> (Relational.q49JoinSuite _),
    "q50_pivot"               -> (Analytics.q50Pivot _),
    "q51_gapfill"             -> (Analytics.q51GapFill _),
    "q52_split"               -> (Analytics.q52Split _),
    "q53_dedup_keep_best"     -> (Analytics.q53DedupKeepBest _),
    "q54_stratified_sample"   -> (Analytics.q54StratifiedSample _),
    "q55_contamination"       -> (Analytics.q55Contamination _),
    "q56_sequence_pack"       -> (Analytics.q56SequencePack _),
    "q57_frame_sample"        -> (Analytics.q57FrameSample _),
    "q58_skew_join"           -> (Relational.q58SkewJoin _),
    "q59_array_suite"         -> (Relational.q59ArraySuite _),
    "q60_regex_suite"         -> (Relational.q60RegexSuite _),
    "q61_time_suite"          -> (Relational.q61TimeSuite _),
    "q62_grouping_sets"       -> (Relational.q62GroupingSets _),
    "q63_asof_forward"        -> (Analytics.q63AsofForward _),
    "q64_scd2"                -> (Relational.q64Scd2 _),
    "q65_bucketed_join"       -> (Relational.q65BucketedJoin _),
    "q66_zorder"              -> (Relational.q66Zorder _),
    "q67_pipeline"            -> (Analytics.q67Pipeline _),
    "q68_range_join"          -> (Relational.q68RangeJoin _),
    "q69_heavy_hitters"       -> (Analytics.q69HeavyHitters _),
    "q70_approx_agg"          -> (Analytics.q70ApproxAgg _),
    "q71_setops"              -> (Relational.q71SetOps _),
    "q72_json_path"           -> (Relational.q72JsonPath _),
    "q73_knn_ivf_refined"     -> (Analytics.q73KnnIvfRefined _),
    "q74_interval_overlap"    -> (Relational.q74IntervalOverlap _),
    "q75_quantize"            -> (Analytics.q75Quantize _),
    "q76_rank_suite"          -> (Relational.q76RankSuite _),
    "q77_corr_suite"          -> (Relational.q77CorrSuite _),
    "q78_exact_distinct_pct"  -> (Analytics.q78ExactDistinctPct _),
    "q79_kmeans_step"         -> (Analytics.q79KmeansStep _),
    "q80_heavy_fallback"      -> (Analytics.q80HeavyFallback _),
    "q81_bm25"                -> (Analytics.q81Bm25 _),
    "q82_source_quota"        -> (Analytics.q82SourceQuota _),
    "q83_repetition_filter"   -> (Analytics.q83RepetitionFilter _),
    "q84_pii_redact"          -> (Analytics.q84PiiRedact _),
    "q85_chunk_dedup"         -> (Analytics.q85ChunkDedup _),
    "q86_length_buckets"      -> (Analytics.q86LengthBuckets _),
    "q87_shard_assign"        -> (Analytics.q87ShardAssign _),
    "q88_pq_adc"              -> (Analytics.q88PqAdc _),
    "q89_quality_audit"       -> (Analytics.q89QualityAudit _),
    "q90_bloom_prune"         -> (Analytics.q90BloomPrune _),
    "q91_bigram_rarity"       -> (Analytics.q91BigramRarity _),
    "q92_mixture_plan"        -> (Analytics.q92MixturePlan _),
    "q93_boilerplate"         -> (Analytics.q93Boilerplate _),
    "q94_containment"         -> (Analytics.q94Containment _),
    "q95_semantic_dedup"      -> (Analytics.q95SemanticDedup _),
    "q96_rolling_anomaly"     -> (Analytics.q96RollingAnomaly _),
    "q97_url_canonical"       -> (Analytics.q97UrlCanonical _),
    "q98_fuzzy_join"          -> (Analytics.q98FuzzyJoin _),
    "q99_inverted_index"      -> (Analytics.q99InvertedIndex _),
    "q100_retention_cohorts"  -> (Analytics.q100RetentionCohorts _),
    "q101_cdc_merge"          -> (Analytics.q101CdcMerge _),
    "q102_robust_scale"       -> (Analytics.q102RobustScale _),
    "q103_pagerank"           -> (Analytics.q103PageRank _),
    "q104_abtest"             -> (Analytics.q104AbTest _),
    "q105_cooccur_pmi"        -> (Analytics.q105CooccurPmi _),
    "q106_covariance"         -> (Analytics.q106Covariance _),
    "q107_feature_hash"       -> (Analytics.q107FeatureHash _),
    "q108_incr_agg"           -> (Analytics.q108IncrAgg _),
    "q109_triangles"          -> (Analytics.q109Triangles _),
    "q110_bpe_pairs"          -> (Analytics.q110BpePairs _),
    "q111_normalize"          -> (Analytics.q111Normalize _),
    "q112_window_dup"         -> (Analytics.q112WindowDup _),
    "q113_systematic_sample"  -> (Analytics.q113SystematicSample _),
    "q114_ols"                -> (Analytics.q114Ols _),
    "q115_tv_drift"           -> (Analytics.q115TvDrift _),
    "q116_profile"            -> (Analytics.q116Profile _),
    "q117_pctl_state_merge"   -> (Analytics.q117PctlStateMerge _),
    "q118_bpe_apply"          -> (Analytics.q118BpeApply _),
    "q119_kcore"              -> (Analytics.q119Kcore _),
    "q120_decay"              -> (Analytics.q120Decay _),
    "q121_cc_incremental"     -> (Analytics.q121CcIncremental _),
    "q122_price_bands"        -> (Analytics.q122PriceBands _),
    "q123_late_data"          -> (Analytics.q123LateData _),
    "q124_interval_coalesce"  -> (Curation.q124IntervalCoalesce _),
    "q125_knn_ivf_pq"         -> (Curation.q125KnnIvfPq _),
    "q126_bigram_lm"          -> (Curation.q126BigramLm _),
    "q127_curation_pass"      -> (Curation.q127CurationPass _),
    "q128_priority_sample"    -> (Curation.q128PrioritySample _),
    "q129_bfs"                -> (Curation.q129Bfs _),
    "q130_markov_transitions" -> (Curation.q130MarkovTransitions _),
    "q131_attribution"        -> (Curation.q131Attribution _),
    "q132_pareto_frontier"    -> (Curation.q132ParetoFrontier _),
    "q133_star_flatten"       -> (Curation.q133StarFlatten _),
    "q134_label_prop"         -> (Curation.q134LabelProp _),
    "q135_exact_quantiles"    -> (Curation.q135ExactQuantiles _),
    "q136_sparse_retrieval"   -> (Curation.q136SparseRetrieval _),
    "q137_random_walks"       -> (Curation.q137RandomWalks _),
    "q138_hybrid_rrf"         -> (Curation.q138HybridRrf _),
    "q139_hard_negatives"     -> (Curation.q139HardNegatives _),
    "q140_personalized_pagerank" -> (Curation.q140PersonalizedPagerank _),
    "q141_phash_neardup"      -> (Curation.q141PhashNearDup _),
    "q142_leakage_safe_split" -> (Curation.q142LeakageSafeSplit _),
    "q143_ivf_build_stored"   -> (Analytics.q143IvfBuildStored _),
    "q144_ivf_search_stored"  -> (Analytics.q144IvfSearchStored _),
    "q145_ivf_extend_stored"  -> (Analytics.q145IvfExtendStored _),
    "q146_ivf_pq_build_stored" -> (Curation.q146IvfPqBuildStored _),
    "q147_ivf_pq_search_stored" -> (Curation.q147IvfPqSearchStored _),
    "q148_span_coverage"      -> (Analytics.q148SpanCoverage _),
    "q149_ivf_delete_stored"  -> (Analytics.q149IvfDeleteStored _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only where the result is not
    * cross-engine reproducible: q70 (HLL/quantile-sketch internals differ
    * by engine; ApproxSpec pins |approx − exact| within the configured
    * bounds) and q73 (iterated float k-means centroids; RecallSpec pins
    * the floor). The driver records rows-only for both — and each is
    * anchored by an exact, hash-matched twin of the same shape: q78
    * computes q70's distinct/quantile columns exactly, and q79 replays
    * one k-means update in fixed-point integer arithmetic. */
  def oracleSql: Map[String, String] =
    RelationalOracles.sql ++ AnalyticsOracles.sql ++ CurationOracles.sql
}
