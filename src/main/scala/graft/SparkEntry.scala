package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Advanced, Analytics, Behavior, Completeness, MoreRelational, Relational, StreamingQueries, TrainingData}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named
  * query over the driver's parquet tables; `oracleSql` carries the
  * DuckDB-equivalent SQL (identical column names + deterministic ORDER
  * BY) for the hash-compare correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.q01PricingSummary _),
    "q02_filter_pushdown" -> (Relational.q02FilterPushdown _),
    "q03_region_revenue"  -> (Relational.q03RegionRevenue _),
    "q04_groupby_count"   -> (Relational.q04GroupbyCount _),
    "q05_minmax"          -> (Relational.q05MinMax _),
    "q06_distinct_values" -> (Relational.q06DistinctValues _),
    "q07_union_slices"    -> (Relational.q07UnionSlices _),
    "q08_descriptive_stats" -> (Relational.q08DescriptiveStats _),
    "q09_date_buckets"    -> (Relational.q09DateBuckets _),
    "q10_json_extract"    -> (Relational.q10JsonExtract _),
    "q11_case_bucket"     -> (Relational.q11CaseBucket _),
    "q12_dedup_distinct"  -> (Relational.q12DedupDistinct _),
    "q13_latest_per_key"  -> (Relational.q13LatestPerKey _),
    "q14_interval_join"   -> (Relational.q14IntervalJoin _),
    "q15_topk"            -> (Relational.q15TopK _),
    "q16_anti_join"       -> (Relational.q16AntiJoin _),
    "q17_rollup"          -> (Relational.q17Rollup _),
    "q18_concat_key"      -> (Relational.q18ConcatKey _),
    "q19_token_stats"     -> (TrainingData.q19TokenStats _),
    "q20_text_quality"    -> (TrainingData.q20TextQuality _),
    "q21_lang_predict"    -> (TrainingData.q21LangPredict _),
    "q22_fingerprint"     -> (TrainingData.q22Fingerprint _),
    "q23_exact_dedup"     -> (TrainingData.q23ExactDedup _),
    "q24_ann_topk"        -> (TrainingData.q24AnnTopK _),
    "q25_ngram_jaccard"   -> (TrainingData.q25NgramJaccard _),
    "q26_multimodal_meta" -> (TrainingData.q26MultimodalMeta _),
    "q27_minhash_dedup"   -> (TrainingData.q27MinHashDedup _),
    "q28_simhash_dedup"   -> (TrainingData.q28SimHashDedup _),
    "q29_embedding_neardup" -> (TrainingData.q29EmbeddingNearDup _),
    "q30_rolling_fingerprint" -> (TrainingData.q30RollingFingerprint _),
    "q31_asof_join"       -> (Relational.q31AsofJoin _),
    "q32_sessionization"  -> (Advanced.q32Sessionization _),
    "q33_scalar_surface"  -> (Advanced.q33ScalarSurface _),
    "q34_sketches"        -> (Advanced.q34Sketches _),
    "q35_window_suite"    -> (Advanced.q35WindowSuite _),
    "q36_pivot"           -> (Advanced.q36Pivot _),
    "q37_set_ops"         -> (Advanced.q37SetOps _),
    "q38_dedup_corpus_exact" -> (TrainingData.q38DedupCorpusExact _),
    "q39_dedup_corpus_near"  -> (TrainingData.q39DedupCorpusNear _),
    "q40_explode_dims"    -> (Advanced.q40ExplodeDims _),
    "q41_correlated_subquery" -> (MoreRelational.q41CorrelatedSubquery _),
    "q42_semi_join"       -> (MoreRelational.q42SemiJoin _),
    "q43_five_way_join"   -> (MoreRelational.q43FiveWayJoin _),
    "q44_having"          -> (MoreRelational.q44Having _),
    "q45_string_agg"      -> (MoreRelational.q45StringAgg _),
    "q46_sequence_packing" -> (TrainingData.q46SequencePacking _),
    "q47_hash_split"      -> (TrainingData.q47HashSplit _),
    "q48_cube"            -> (Completeness.q48Cube _),
    "q49_unpivot"         -> (Completeness.q49Unpivot _),
    "q50_gap_fill"        -> (Completeness.q50GapFill _),
    "q51_percentiles"     -> (Completeness.q51Percentiles _),
    "q52_array_ops"       -> (Completeness.q52ArrayOps _),
    "q53_regex_surface"   -> (Completeness.q53RegexSurface _),
    "q54_edit_distance"   -> (Completeness.q54EditDistance _),
    "q55_ivf_topk"        -> (Completeness.q55IvfTopK _),
    "q56_asof_forward"    -> (Completeness.q56AsofForward _),
    "q57_grouping_sets"   -> (Completeness.q57GroupingSets _),
    "q58_window_dist"     -> (Completeness.q58WindowDist _),
    "q59_range_correlate" -> (Completeness.q59RangeCorrelate _),
    "q60_multimodal_ann"  -> (Completeness.q60MultimodalAnn _),
    "q61_range_frame"     -> (Completeness.q61RangeFrame _),
    "q62_stream_window_counts" -> (StreamingQueries.q62StreamWindowCounts _),
    "q63_repetition"      -> (TrainingData.q63Repetition _),
    "q64_incremental_dedup" -> (TrainingData.q64IncrementalDedup _),
    "q65_ivf_trained"     -> (Completeness.q65IvfTrained _),
    "q66_text_hash_ann"   -> (TrainingData.q66TextHashAnn _),
    "q67_stream_correlate" -> (StreamingQueries.q67StreamCorrelate _),
    "q68_decontaminate"   -> (TrainingData.q68Decontaminate _),
    "q69_pii_mask"        -> (TrainingData.q69PiiMask _),
    "q70_span_dedup"      -> (TrainingData.q70SpanDedup _),
    "q71_semantic_collapse" -> (TrainingData.q71SemanticCollapse _),
    "q72_stream_neardup"  -> (StreamingQueries.q72StreamNearDup _),
    "q73_skew_salted"     -> (Completeness.q73SkewSalted _),
    "q74_lake_upsert"     -> (Completeness.q74LakeUpsert _),
    "q75_domain_quota"    -> (TrainingData.q75DomainQuota _),
    "q76_containment"     -> (TrainingData.q76Containment _),
    "q77_quality_topk"    -> (TrainingData.q77QualityTopK _),
    "q78_weighted_sample" -> (TrainingData.q78WeightedSample _),
    "q79_corpus_divergence" -> (TrainingData.q79CorpusDivergence _),
    "q80_mixture_replicate" -> (TrainingData.q80MixtureReplicate _),
    "q81_dup_matrix"      -> (TrainingData.q81DupMatrix _),
    "q82_soft_dedup"      -> (TrainingData.q82SoftDedup _),
    "q83_pipeline"        -> (TrainingData.q83Pipeline _),
    "q84_image_neardup"   -> (TrainingData.q84ImageNearDup _),
    "q85_kmv_overlap"     -> (TrainingData.q85KmvOverlap _),
    "q86_bloom_decontaminate" -> (TrainingData.q86BloomDecontaminate _),
    "q87_chunking"        -> (TrainingData.q87Chunking _),
    "q88_bm25_topk"       -> (TrainingData.q88Bm25 _),
    "q89_stream_kmv"      -> (StreamingQueries.q89StreamKmv _),
    "q90_bucketed_join"   -> (Analytics.q90BucketedJoin _),
    "q91_tfidf_terms"     -> (Analytics.q91TfidfTerms _),
    "q92_pagerank"        -> (Analytics.q92PageRank _),
    "q93_funnel"          -> (Analytics.q93Funnel _),
    "q94_pq_ann"          -> (Analytics.q94PqAnn _),
    "q95_zorder_skipping" -> (Analytics.q95ZorderSkipping _),
    "q96_profile"         -> (Analytics.q96Profile _),
    "q97_stream_funnel"   -> (StreamingQueries.q97StreamFunnel _),
    "q98_snapshot_diff"   -> (Analytics.q98SnapshotDiff _),
    "q99_hist_quantiles"  -> (Analytics.q99HistQuantiles _),
    "q100_rate_anomaly"   -> (Analytics.q100RateAnomaly _),
    "q101_group_quantiles" -> (Behavior.q101GroupQuantiles _),
    "q102_retention"      -> (Behavior.q102Retention _),
    "q103_transitions"    -> (Behavior.q103Transitions _),
    "q104_triangles"      -> (Behavior.q104Triangles _),
    "q105_trend"          -> (Behavior.q105Trend _),
    "q106_collocations"   -> (Behavior.q106Collocations _),
    "q107_twap"           -> (Behavior.q107Twap _),
    "q108_interpolate"    -> (Behavior.q108Interpolate _),
    "q109_apportion"      -> (Behavior.q109Apportion _),
    "q110_discretize"     -> (Behavior.q110Discretize _),
    "q111_rolling_corr"   -> (Behavior.q111RollingCorr _),
    "q112_stream_anomaly" -> (StreamingQueries.q112StreamAnomaly _),
    "q113_dwell_times"    -> (Behavior.q113DwellTimes _),
    "q114_dwell_quantiles" -> (Behavior.q114DwellQuantiles _),
    "q115_heavy_hitters"  -> (Behavior.q115HeavyHitters _),
    "q116_contamination_frac" -> (TrainingData.q116ContaminationFraction _),
    "q117_windowed_quantiles" -> (Behavior.q117WindowedQuantiles _),
    "q118_stream_quantiles" -> (StreamingQueries.q118StreamQuantiles _),
    "q119_leakage_safe_split" -> (TrainingData.q119LeakageSafeSplit _),
    "q120_centroid_affinity" -> (TrainingData.q120CentroidAffinity _),
    "q121_sketch_artifact_decontaminate" ->
      (TrainingData.q121SketchArtifactDecontaminate _),
    "q122_cms_artifact_heavy_hitters" ->
      (Behavior.q122CmsArtifactHeavyHitters _),
    "q123_video_neardup" -> (TrainingData.q123VideoNearDup _),
    "q124_audio_neardup" -> (TrainingData.q124AudioNearDup _),
    "q125_stream_heavy_hitters" ->
      (StreamingQueries.q125StreamHeavyHitters _),
    "q126_phrase_search"  -> (Analytics.q126PhraseSearch _),
    "q127_incremental_rollup" -> (Analytics.q127IncrementalRollup _),
    "q128_shard_manifest" -> (TrainingData.q128ShardManifest _),
    "q129_lm_surprisal"   -> (TrainingData.q129LmSurprisal _),
    "q130_mmr_select"     -> (TrainingData.q130MmrSelect _),
    "q131_domain_reweight" -> (TrainingData.q131DomainReweight _),
    "q132_winnowing_pairs" -> (TrainingData.q132WinnowingPairs _),
    "q133_bloom_index_lookup" -> (Analytics.q133BloomIndexLookup _),
    "q134_random_projection" -> (TrainingData.q134RandomProjection _),
    "q135_projected_ann"  -> (TrainingData.q135ProjectedAnn _),
    "q136_winnow_decontaminate" ->
      (TrainingData.q136WinnowDecontaminate _),
    "q137_surprisal_band" -> (TrainingData.q137SurprisalBand _),
    "q138_heldout_surprisal" -> (TrainingData.q138HeldoutSurprisal _),
    "q139_stream_global_topk" ->
      (StreamingQueries.q139StreamGlobalTopK _),
    "q140_winnow_artifact" -> (TrainingData.q140WinnowArtifact _),
    "q141_projected_ivf"  -> (TrainingData.q141ProjectedIvf _),
    "q142_stream_rollup"  -> (StreamingQueries.q142StreamRollup _),
    "q143_pipeline_curated" -> (TrainingData.q143PipelineCurated _),
    "q144_stream_decontaminate" ->
      (StreamingQueries.q144StreamDecontaminate _),
    "q145_heldout_band"   -> (TrainingData.q145HeldoutBand _),
    "q146_heldout_reweight" -> (TrainingData.q146HeldoutReweight _),
    "q147_pipeline_heldout_band" ->
      (TrainingData.q147PipelineHeldoutBand _),
    "q148_projected_ivf_trained" ->
      (TrainingData.q148ProjectedIvfTrained _),
    "q149_stream_decon_ttl" ->
      (StreamingQueries.q149StreamDeconTtl _),
    "q150_ivf_pq_ann"     -> (Analytics.q150IvfPqAnn _),
    "q151_pipeline_heldout_reweight" ->
      (TrainingData.q151PipelineHeldoutReweight _),
    "q152_exact_substring_spans" ->
      (TrainingData.q152ExactSubstringSpans _),
    "q153_exact_substring_dedup" ->
      (TrainingData.q153ExactSubstringDedup _),
    "q154_exact_substring_stats" ->
      (TrainingData.q154ExactSubstringStats _),
    "q155_exact_substring_min3" ->
      (TrainingData.q155ExactSubstringSpansMin3 _),
    "q156_ngram_novelty" -> (TrainingData.q156NgramNovelty _),
    "q157_exact_substring_n50" ->
      (TrainingData.q157ExactSubstringN50 _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> Relational.q01Sql,
    "q02_filter_pushdown" -> Relational.q02Sql,
    "q03_region_revenue"  -> Relational.q03Sql,
    "q04_groupby_count"   -> Relational.q04Sql,
    "q05_minmax"          -> Relational.q05Sql,
    "q06_distinct_values" -> Relational.q06Sql,
    "q07_union_slices"    -> Relational.q07Sql,
    "q08_descriptive_stats" -> Relational.q08Sql,
    "q09_date_buckets"    -> Relational.q09Sql,
    "q10_json_extract"    -> Relational.q10Sql,
    "q11_case_bucket"     -> Relational.q11Sql,
    "q12_dedup_distinct"  -> Relational.q12Sql,
    "q13_latest_per_key"  -> Relational.q13Sql,
    "q14_interval_join"   -> Relational.q14Sql,
    "q15_topk"            -> Relational.q15Sql,
    "q16_anti_join"       -> Relational.q16Sql,
    "q17_rollup"          -> Relational.q17Sql,
    "q18_concat_key"      -> Relational.q18Sql,
    "q19_token_stats"     -> TrainingData.q19Sql,
    "q20_text_quality"    -> TrainingData.q20Sql,
    "q21_lang_predict"    -> TrainingData.q21Sql,
    "q22_fingerprint"     -> TrainingData.q22Sql,
    "q23_exact_dedup"     -> TrainingData.q23Sql,
    "q24_ann_topk"        -> TrainingData.q24Sql,
    "q25_ngram_jaccard"   -> TrainingData.q25Sql,
    "q26_multimodal_meta" -> TrainingData.q26Sql,
    // q27/q39: LSH pipelines gated against an independent brute-force
    // exact baseline the oracle computes (all-pairs Jaccard; recursive
    // -CTE connected components) — LSH recall on this corpus is
    // provably complete (all true pairs have J ≥ 0.9, miss prob 1e-15).
    "q27_minhash_dedup"   -> TrainingData.q27Sql,
    // q28: DuckDB replays the portable SimHash-48 pipeline (md5-domain
    // feature hashes → bit votes → banding → hamming verify); the
    // xxhash64 64-bit signature stays the spec-covered fast path.
    "q28_simhash_dedup"   -> TrainingData.q28Sql,
    // q29: DuckDB replays the full hyperplane-LSH spec (normalize →
    // sign-bucket against the same embedded hyperplane constants →
    // bucket join → dot verify) — every computational step is gated.
    "q29_embedding_neardup" -> TrainingData.q29Sql,
    // q30: the md5-derived portable rolling hash, replayed in DuckDB
    // via list_reduce (xxhash64 fast path stays spec-covered).
    "q30_rolling_fingerprint" -> TrainingData.q30Sql,
    "q31_asof_join"       -> Relational.q31Sql,
    "q32_sessionization"  -> Advanced.q32Sql,
    "q33_scalar_surface"  -> Advanced.q33Sql,
    // q34: exact distinct counts hash-compared across engines; sketch
    // estimates gated as within-bound booleans the oracle pins TRUE.
    "q34_sketches"        -> Advanced.q34Sql,
    "q35_window_suite"    -> Advanced.q35Sql,
    "q36_pivot"           -> Advanced.q36Sql,
    "q37_set_ops"         -> Advanced.q37Sql,
    "q38_dedup_corpus_exact" -> TrainingData.q38Sql,
    "q39_dedup_corpus_near" -> TrainingData.q39Sql,
    "q40_explode_dims"    -> Advanced.q40Sql,
    "q41_correlated_subquery" -> MoreRelational.q41Sql,
    "q42_semi_join"       -> MoreRelational.q42Sql,
    "q43_five_way_join"   -> MoreRelational.q43Sql,
    "q44_having"          -> MoreRelational.q44Sql,
    "q45_string_agg"      -> MoreRelational.q45Sql,
    "q46_sequence_packing" -> TrainingData.q46Sql,
    "q47_hash_split"      -> TrainingData.q47Sql,
    "q48_cube"            -> Completeness.q48Sql,
    "q49_unpivot"         -> Completeness.q49Sql,
    "q50_gap_fill"        -> Completeness.q50Sql,
    "q51_percentiles"     -> Completeness.q51Sql,
    "q52_array_ops"       -> Completeness.q52Sql,
    "q53_regex_surface"   -> Completeness.q53Sql,
    "q54_edit_distance"   -> Completeness.q54Sql,
    "q55_ivf_topk"        -> Completeness.q55Sql,
    "q56_asof_forward"    -> Completeness.q56Sql,
    "q57_grouping_sets"   -> Completeness.q57Sql,
    "q58_window_dist"     -> Completeness.q58Sql,
    "q59_range_correlate" -> Completeness.q59Sql,
    // q60: PortableCodec featurize lives in the md5-48 hash domain, so
    // the whole media → embedding → cosine top-k pipeline replays in
    // DuckDB.
    "q60_multimodal_ann"  -> Completeness.q60Sql,
    "q61_range_frame"     -> Completeness.q61Sql,
    // q62 runs a REAL streaming job (file stream → watermarked dedup →
    // windowed agg → memory sink); the oracle is the batch equivalent.
    "q62_stream_window_counts" -> StreamingQueries.q62Sql,
    "q63_repetition"      -> TrainingData.q63Sql,
    "q64_incremental_dedup" -> TrainingData.q64Sql,
    // q65: trained-codebook IVF at full probe ≡ exact brute force —
    // the same q24 oracle hash-checks the whole trained-index path.
    "q65_ivf_trained"     -> Completeness.q65Sql,
    "q66_text_hash_ann"   -> TrainingData.q66Sql,
    // q67 runs a REAL stream-stream join (watermarked bin equi-join +
    // time-range condition); the oracle is the batch range join (q59).
    "q67_stream_correlate" -> StreamingQueries.q67Sql,
    "q68_decontaminate"   -> TrainingData.q68Sql,
    "q69_pii_mask"        -> TrainingData.q69Sql,
    "q70_span_dedup"      -> TrainingData.q70Sql,
    "q71_semantic_collapse" -> TrainingData.q71Sql,
    // q72: a REAL stateful stream (flatMapGroupsWithState near-dup);
    // a drained run ≡ the batch portable-SimHash pipeline (q28 oracle).
    "q72_stream_neardup"  -> StreamingQueries.q72Sql,
    // q73: salted two-phase agg must equal the plain group-by.
    "q73_skew_salted"     -> Completeness.q73Sql,
    // q74: a REAL double-upsert into a temp partitioned lake; the
    // oracle replays latest-wins over the same batches.
    "q74_lake_upsert"     -> Completeness.q74Sql,
    "q75_domain_quota"    -> TrainingData.q75Sql,
    "q76_containment"     -> TrainingData.q76Sql,
    "q77_quality_topk"    -> TrainingData.q77Sql,
    // q78: exponential-race weighted sample — the oracle replays the
    // hash/weight priority order in a window.
    "q78_weighted_sample" -> TrainingData.q78Sql,
    // q79: total-variation drift with an exact-integer numerator
    // (HUGEINT in DuckDB, decimal(38,0) in Spark — both exact).
    "q79_corpus_divergence" -> TrainingData.q79Sql,
    // q80: weighted replication — the oracle replays floor(w) + the
    // exact-quarter fractional promotion and unnests generate_series.
    "q80_mixture_replicate" -> TrainingData.q80Sql,
    // q81: exact-fingerprint provenance matrix — the oracle replays
    // the (fp, slice) aggregate self-join with an int/int fraction.
    "q81_dup_matrix"      -> TrainingData.q81Sql,
    // q82: soft dedup — the oracle replays the 1/cluster-size weight
    // and the exact-threshold hash draw row for row.
    "q82_soft_dedup"      -> TrainingData.q82Sql,
    // q83: the COMPOSED training pipeline (quality → mask → span dedup
    // → langID → corpus dedup → quota → pack → split) — the whole
    // chain replayed in DuckDB from the per-stage oracle fragments.
    "q83_pipeline"        -> TrainingData.q83Sql,
    // q84: perceptual-hash image near-dup — the portable integer-domain
    // aHash replays bit-identically (bands generated from the same
    // simHashBandSpec as the Spark side).
    "q84_image_neardup"   -> TrainingData.q84Sql,
    // q85: KMV sketched cross-slice overlap — the sketch is the k
    // smallest distinct md5-48 gram hashes, so DuckDB rebuilds it
    // bit-identically (sort + LIMIT k) and every estimate replays in
    // integer floor division.
    "q85_kmv_overlap"     -> TrainingData.q85Sql,
    // q86: Bloom-pruned decontamination — the oracle is the EXACT
    // collision gate; the Bloom prefilter must be invisible in the
    // result (no false negatives, positives verified away).
    "q86_bloom_decontaminate" -> TrainingData.q86Sql,
    // q87: overlapping context-window chunking — exact string replay
    // via DuckDB list slicing; the window count arithmetic is
    // double-exact at token magnitudes.
    "q87_chunking"        -> TrainingData.q87Sql,
    // q88: quantized-BM25 retrieval — integer-exact scores (no ln, no
    // float sums), so ranking replays hash-exact across engines.
    "q88_bm25_topk"       -> TrainingData.q88Sql,
    // q89: streaming KMV cardinality monitor — bounded sketch state in
    // the stream; the oracle rebuilds the same sketch batch-side.
    "q89_stream_kmv"      -> StreamingQueries.q89Sql,
    // q90: a REAL bucketed-table round trip (both sides written as
    // 8-bucket sorted external tables, joined exchange-free); the
    // oracle is the plain join — bucketing must be result-invisible.
    "q90_bucketed_join"   -> Analytics.q90Sql,
    // q91: TF-IDF keyword extraction in the same quantized-integer
    // idf domain as q88's BM25 — exact 64-bit scores replay directly.
    "q91_tfidf_terms"     -> Analytics.q91Sql,
    // q92: integer-exact PageRank — five floor-arithmetic iterations
    // unrolled as chained CTEs, bit-identical in any engine.
    "q92_pagerank"        -> Analytics.q92Sql,
    // q93: ordered-step funnel — greedy earliest-first subsequence
    // matching, replayed as chained min-after joins.
    "q93_funnel"          -> Analytics.q93Sql,
    // q94: PQ-ADC search at pool = corpus ≡ exact brute force (the
    // q65 full-probe convention); small-pool recall is spec-pinned.
    "q94_pq_ann"          -> Analytics.q94Sql,
    // q95: a REAL z-ordered rewrite + box-predicate read-back; the
    // oracle is the plain-table filter — layout must be result-
    // invisible (the skipping itself is metric-gated in AnalyticsSpec).
    "q95_zorder_skipping" -> Analytics.q95Sql,
    // q96: one-pass per-column profile; exact counts and type-aware
    // extremes replay directly.
    "q96_profile"         -> Analytics.q96Sql,
    // q97: a REAL stateful stream (flatMapGroupsWithState funnel);
    // a drained run ≡ the batch funnel — q93's oracle, the q72 ↔ q28
    // convention.
    "q97_stream_funnel"   -> StreamingQueries.q97Sql,
    // q98: snapshot diff — one full-outer join, classification
    // replays with IS [NOT] DISTINCT FROM semantics.
    "q98_snapshot_diff"   -> Analytics.q98Sql,
    // q99: histogram quantiles — exact integer ranks + fixed IEEE
    // parenthesization make the estimates engine-portable where
    // percentile_approx's sketch is not.
    "q99_hist_quantiles"  -> Analytics.q99Sql,
    // q100: trailing z-scores — window sums of integers exact, one
    // mirrored double formula, round(…,4) contract.
    "q100_rate_anomaly"   -> Analytics.q100Sql,
    // q101: per-key histogram quantiles — exact integer ranks + the
    // same fixed IEEE binning as q99, replayed per key.
    "q101_group_quantiles" -> Behavior.q101Sql,
    // q102: cohort retention — calendar truncations, exact month
    // offsets, one round(…,4) division.
    "q102_retention"      -> Behavior.q102Sql,
    // q103: transition matrix — a total (ts, id) order makes the
    // adjacency multiset engine-independent; counts exact.
    "q103_transitions"    -> Behavior.q103Sql,
    // q104: triangle counts — degree-ordered orientation replayed as
    // joins; exact integers end to end.
    "q104_triangles"      -> Behavior.q104Sql,
    // q105: OLS trend — floor-quantized y, exact integer moments
    // (HUGEINT ≙ decimal(38,0)), one round(…,6) division.
    "q105_trend"          -> Behavior.q105Sql,
    // q106: PMI collocations — exact integer ratio, floor-log2 via
    // bitlength, (qpmi, n_ab, a, b) tie order.
    "q106_collocations"   -> Behavior.q106Sql,
    // q107: time-weighted average — exact ns durations × quantized
    // values in HUGEINT ≙ decimal(38,0), one round(…,6) division.
    "q107_twap"           -> Behavior.q107Sql,
    // q108: as-of interpolation — DuckDB ASOF both directions + the
    // same fixed-IEEE lerp, round(…,4).
    "q108_interpolate"    -> Behavior.q108Sql,
    // q109: largest-remainder apportionment — exact integer floors /
    // modulos + the (rem DESC, key) rank, Σ quota = budget.
    "q109_apportion"      -> Behavior.q109Sql,
    // q110: equi-depth binning — q99's edge arithmetic + an identical
    // edge-comparison count per row.
    "q110_discretize"     -> Behavior.q110Sql,
    // q111: rolling correlation — integer 10⁻⁴-unit minute sums,
    // exact decimal window moments, one mirrored sqrt formula.
    "q111_rolling_corr"   -> Behavior.q111Sql,
    // q112: the drained streaming anomaly monitor ≡ the batch
    // dense-spine z-scores — q100's oracle verbatim.
    "q112_stream_anomaly" -> StreamingQueries.q112Sql,
    // q113: dwell times — exact integer-ns gaps, decimal sums, one
    // round(…,4) division to seconds.
    "q113_dwell_times"    -> Behavior.q113Sql,
    // q114: dwell QUANTILES — q113's gaps composed into the per-key
    // histogram estimator; the whole chain (lag window + binning +
    // rank selection) replayed in one oracle.
    "q114_dwell_quantiles" -> Behavior.q114Sql,
    // q115: CMS-pruned heavy hitters — the oracle is the EXACT
    // heavy-hitter SQL; one-sided estimates make the sketch provably
    // invisible (q86's Bloom discipline at the frequency level).
    "q115_heavy_hitters"  -> Behavior.q115Sql,
    // q116: contamination fraction — exact per-doc leak counts behind
    // a Bloom prune; frac is the raw IEEE quotient (un-rounded).
    "q116_contamination_frac" -> TrainingData.q116Sql,
    // q117: exact windowed rank-selection quantiles over the
    // quantized value domain — integer ranks/cums, one division last.
    "q117_windowed_quantiles" -> Behavior.q117Sql,
    // q118: the drained streaming twin ≡ q117's batch answer — the
    // oracle is q117's SQL verbatim (q112↔q100's pattern).
    "q118_stream_quantiles" -> StreamingQueries.q118Sql,
    // q119: leakage-safe split — fingerprint collapse + near-dup CC +
    // portable bucket of the cluster representative, fully replayed.
    "q119_leakage_safe_split" -> TrainingData.q119Sql,
    // q120: centroid affinity — integer sums, count terms cancel,
    // two correctly-rounded sqrts + one division.
    "q120_centroid_affinity" -> TrainingData.q120Sql,
    // q121: decontamination via a persisted stamped Bloom artifact —
    // the oracle is the EXACT mod-7/5-gram SQL (artifact-free),
    // proving the write/read round-trip is invisible in the result.
    "q121_sketch_artifact_decontaminate" -> TrainingData.q121Sql,
    // q122: heavy hitters via a persisted stamped CMS artifact — the
    // exact SQL again; a flipped grid cell would surface as a diff.
    "q122_cms_artifact_heavy_hitters" -> Behavior.q122Sql,
    // q123/q124: frame-majority video + window-majority audio near-dup
    // — per-frame fingerprints in the portable integer md5 domain;
    // the oracle replays decode, per-frame aHash, same-ordinal
    // banding (generated from simHashBandSpec), hamming verify, and
    // the integer majority test end-to-end.
    "q123_video_neardup" -> TrainingData.q123Sql,
    "q124_audio_neardup" -> TrainingData.q124Sql,
    // q125: drained streaming SpaceSaving snapshot in the exact
    // regime (capacity ≥ per-shard distinct keys ⇒ no evictions) —
    // the oracle is the EXACT heavy-hitter SQL at threshold 60.
    "q125_stream_heavy_hitters" -> StreamingQueries.q125Sql,
    // q126: positional phrase search — the anchor-set intersection
    // plan vs the textbook positional-adjacency join, same tokenizer.
    "q126_phrase_search" -> Analytics.q126Sql,
    // q127: persisted rollup + delta merge ≡ full recompute — the
    // oracle recomputes from scratch, so any merge-algebra slip diffs.
    "q127_incremental_rollup" -> Analytics.q127Sql,
    // q128: seeded deterministic shard manifest — md5 permutation
    // key, mod-N shard, within-shard row_number, replayed exactly.
    "q128_shard_manifest" -> TrainingData.q128Sql,
    // q129: self-scored bigram LM — integer ratio + bitlength
    // floor-log2, the whole train+score chain replayed exactly.
    "q129_lm_surprisal" -> TrainingData.q129Sql,
    // q130: the ENTIRE 8-step greedy MMR walk replayed in one
    // recursive CTE (round-4 cosines, smallest-id ties).
    "q130_mmr_select" -> TrainingData.q130Sql,
    // q131: LM-surprisal domain reweighting — q129's LM replay +
    // integer mean-surprisal weights + q109's remainder ranking,
    // the whole mixture composition in one statement.
    "q131_domain_reweight" -> TrainingData.q131Sql,
    // q132: MOSS winnowing — exact rightmost-min-per-window selection
    // replay (md5-derived shingle hashes, full windows only).
    "q132_winnowing_pairs" -> TrainingData.q132Sql,
    // q133: index-pruned point lookup ≡ the plain filter (Bloom has
    // no false negatives; false positives die at the exact predicate).
    "q133_bloom_index_lookup" -> Analytics.q133Sql,
    // q134: JL projection replayed exactly — same direction literals,
    // same in-order double fold, same round-4.
    "q134_random_projection" -> TrainingData.q134Sql,
    // q135: the oracle is the EXACT brute-force top-k — recall through
    // the projected candidate stage is the operator's contract.
    "q135_projected_ann" -> TrainingData.q135Sql,
    // q136: winnowing decontamination — exact selection replay on both
    // split sides, then the distinct-fingerprint overlap count.
    "q136_winnow_decontaminate" -> TrainingData.q136Sql,
    // q137: CCNet-style perplexity band — exact integer rank edges,
    // same (q_avg, doc_id) order both engines.
    "q137_surprisal_band" -> TrainingData.q137Sql,
    // q138: held-out LM scoring with add-1 OOV smoothing — train
    // counts + vocabulary + smoothed floor-log2 ratio all replayed.
    "q138_heldout_surprisal" -> TrainingData.q138Sql,
    // q139: cross-shard global top-k readout of the drained
    // SpaceSaving shards ≡ the exact global top-20 (exact regime).
    "q139_stream_global_topk" -> StreamingQueries.q139Sql,
    // q140: winnowing decon through a persisted stamped fingerprint
    // index — q136's artifact-free oracle verbatim (the q121 pattern:
    // the artifact round-trip must be invisible in the result).
    "q140_winnow_artifact" -> TrainingData.q136Sql,
    // q141: projected IVF ANN — projection + cell-argmax + probe set
    // + pool + exact re-rank, the whole composition replayed.
    "q141_projected_ivf" -> TrainingData.q141Sql,
    // q142: a REAL foreachBatch stream maintaining the lake rollup
    // (engine epoch id = batch stamp); drained ≡ q127's recompute.
    "q142_stream_rollup" -> StreamingQueries.q142Sql,
    // q143: the CURATED composed pipeline (q83 + winnow decon + LM
    // band) — the entire 11-stage chain replayed in one statement.
    "q143_pipeline_curated" -> TrainingData.q143Sql,
    // q144: a REAL stream-static join (streamed doc grams vs the
    // static benchmark gram table) + streaming per-doc leak counts;
    // drained ≡ the exact batch gram-overlap counts (q68 fragments).
    "q144_stream_decontaminate" -> StreamingQueries.q144Sql,
    // q145: held-out perplexity band — q138's smoothed model through
    // q137's exact rank-band edges, the whole composition replayed.
    "q145_heldout_band" -> TrainingData.q145Sql,
    // q146: held-out domain reweighting — q138's model + q131's
    // integer weights + largest-remainder apportionment, one replay.
    "q146_heldout_reweight" -> TrainingData.q146Sql,
    // q147: the curated pipeline with the held-out band (bandTrain) —
    // q143's chain CTEs verbatim + q138's smoothed LM block; the whole
    // 11-stage composition replays in one statement.
    "q147_pipeline_heldout_band" -> TrainingData.q147Sql,
    // q148: trained-centroid projected IVF at FULL probe — the cell
    // partition must be result-invisible, so the oracle is q135's
    // projected-pool replay verbatim (the q65/q140 stance; training
    // determinism pinned by KMeansSpec, partial-probe gains measured
    // in ScaleBench).
    "q148_projected_ivf_trained" -> TrainingData.q135Sql,
    // q149: q144's bounded-state twin — watermarked day-window leak
    // counts in append mode (closed windows emit once then EVICT);
    // drained ≡ q144's batch counts restricted to closed windows by
    // the same integer window arithmetic.
    "q149_stream_decon_ttl" -> StreamingQueries.q149Sql,
    // q150: IVF-PQ composition at full probe + pool = corpus — trained
    // cells AND code quantization must both be result-invisible, so
    // the oracle is q94's brute-force replay verbatim (the q148←q135
    // reuse pattern; partial-probe gains measured in ScaleBench).
    "q150_ivf_pq_ann"     -> Analytics.q94Sql,
    // q151: the curated pipeline with held-out domain REWEIGHTING as
    // the balancing stage — q147's chain + LM CTEs verbatim, the
    // fixed quota swapped for q146's weight/apportion fragments over
    // the band survivors + the per-source quota-prefix selection.
    "q151_pipeline_heldout_reweight" -> TrainingData.q151Sql,
    // q152/q153: exact-substring repeat spans + the Lee-et-al cut —
    // the oracle replays duplicated 10-token windows on the LITERAL
    // window strings (Spark joins on xxhash64 of the same string),
    // island-merges coverage (q152) and rebuilds survivor text (q153)
    "q152_exact_substring_spans" -> TrainingData.q152Sql,
    "q153_exact_substring_dedup" -> TrainingData.q153Sql,
    // q155: q152's replay with the repeat threshold raised to 3 —
    // gates that minCount binds (heavy boilerplate only)
    "q155_exact_substring_min3" -> TrainingData.q155Sql,
    // q156: literal-window novelty replay vs the id-split reference
    // (the Spark side joins xxhash64 of the same window strings)
    "q156_ngram_novelty" -> TrainingData.q156Sql,
    // q154: the Lee-et-al headline statistic — per-source fraction of
    // tokens inside some >=10-token exact repeat; exact integer sums,
    // one double division computed identically by both engines
    "q154_exact_substring_stats" -> TrainingData.q154Sql,
    // q157: q152's replay at the paper's 50-token operating point
    "q157_exact_substring_n50" -> TrainingData.q157Sql,
  )
}
