package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, DataPipeQueries, GraphSketchQueries, RelationalQueries, Round4Queries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to Spark
  * implementations; `oracleSql` carries the DuckDB-equivalent SQL for
  * every SQL-expressible entry. Column names are aligned pairwise (the
  * driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q2RevenueByNation(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (RelationalQueries.q1PricingSummary _),
    "q2_revenue_by_nation" -> (RelationalQueries.q2RevenueByNation _),
    "q3_top_orders" -> (RelationalQueries.q3TopOrders _),
    "q4_latest_event_per_user" -> (RelationalQueries.q4LatestEventPerUser _),
    "q5_semi_anti_join" -> (RelationalQueries.q5SemiAnti _),
    "q6_cooccurrence" -> (RelationalQueries.q6CoOccurrence _),
    "q7_rollup" -> (RelationalQueries.q7Rollup _),
    "q8_events_hourly" -> (RelationalQueries.q8EventsHourly _),
    "q9_union_distinct" -> (RelationalQueries.q9UnionDistinct _),
    "q10_avg_qty_filter" -> (RelationalQueries.q10AvgQtyFilter _),
    "q11_doc_token_stats" -> (graft.functions.TextFunctions.docTokenStats _),
    "q12_dedup_exact" -> (DataPipeQueries.dedupExact _),
    "q13_dedup_minhash" -> (DataPipeQueries.dedupMinhash _),
    "q14_dedup_simhash" -> (DataPipeQueries.dedupSimhash _),
    "q15_knn_cosine" -> (DataPipeQueries.knnCosine _),
    "q16_knn_ivf" -> (DataPipeQueries.knnIvf _),
    "q17_lang_id" -> (DataPipeQueries.langId _),
    "q18_text_quality" -> (DataPipeQueries.textQuality _),
    "q19_fingerprint" -> (DataPipeQueries.fingerprints _),
    "q20_cosine_neardup" -> (DataPipeQueries.cosineNearDup _),
    "q21_outer_join" -> (RelationalQueries.q21OuterJoin _),
    "q22_distinct_agg" -> (RelationalQueries.q22DistinctAgg _),
    "q23_exists_subquery" -> (RelationalQueries.q23ExistsSubquery _),
    "q24_cube" -> (RelationalQueries.q24Cube _),
    "q25_case_agg" -> (RelationalQueries.q25CaseAgg _),
    "q26_dictionary_join" -> (DataPipeQueries.dictionaryJoin _),
    "q27_percentile" -> (RelationalQueries.q27Percentile _),
    "q28_string_funcs" -> (RelationalQueries.q28StringFuncs _),
    "q29_date_funcs" -> (RelationalQueries.q29DateFuncs _),
    "q30_window_running" -> (RelationalQueries.q30WindowRunning _),
    "q31_rank_ntile" -> (RelationalQueries.q31RankNtile _),
    "q32_set_ops" -> (RelationalQueries.q32SetOps _),
    "q33_token_counts" -> (RelationalQueries.q33TokenCounts _),
    "q34_pivot" -> (RelationalQueries.q34Pivot _),
    "q35_grouping_sets" -> (RelationalQueries.q35GroupingSets _),
    "q36_range_join" -> (RelationalQueries.q36RangeJoin _),
    "q37_asof_prev_click" -> (RelationalQueries.q37AsofPrevClick _),
    "q38_listagg" -> (RelationalQueries.q38ListAgg _),
    "q39_json_funcs" -> (RelationalQueries.q39JsonFuncs _),
    "q40_dictionary_semi_join" -> (DataPipeQueries.dictionarySemiJoin _),
    "q41_set_ops_all" -> (RelationalQueries.q41SetOpsAll _),
    "q42_full_outer" -> (RelationalQueries.q42FullOuter _),
    "q43_posexplode" -> (RelationalQueries.q43Posexplode _),
    "q44_array_hof" -> (RelationalQueries.q44ArrayHof _),
    "q45_sessionize" -> (DataPipeQueries.sessionize _),
    "q46_scalar_subquery" -> (RelationalQueries.q46ScalarSubquery _),
    "q47_regexp_funcs" -> (RelationalQueries.q47RegexpFuncs _),
    "q48_hash_sample" -> (RelationalQueries.q48HashSample _),
    "q49_window_range_frame" -> (RelationalQueries.q49WindowRangeFrame _),
    "q50_map_funcs" -> (RelationalQueries.q50MapFuncs _),
    "q51_cross_join" -> (RelationalQueries.q51CrossJoin _),
    "q52_media_features" -> (DataPipeQueries.mediaFeatures _),
    "q53_stratified_sample" -> (DataPipeQueries.stratifiedSample _),
    "q54_curation_funnel" -> (DataPipeQueries.curationFunnel _),
    "q55_neardup_components" -> (DataPipeQueries.nearDupComponents _),
    "q56_kmv_distinct" -> (Round4Queries.kmvDistinct _),
    "q57_moment_stats" -> (Round4Queries.momentStats _),
    "q58_merge_upsert" -> (Round4Queries.mergeUpsert _),
    "q59_bpe_tokens" -> (Round4Queries.bpeTokenCounts _),
    "q60_edit_distance" -> (Round4Queries.editDistancePairs _),
    "q61_inverted_search" -> (Round4Queries.invertedSearch _),
    "q62_bm25_search" -> (Round4Queries.bm25Search _),
    "q63_salted_join" -> (Round4Queries.saltedJoinRevenue _),
    "q64_sequence_packing" -> (Round4Queries.sequencePacking _),
    "q65_mixture_schedule" -> (Round4Queries.mixtureSchedule _),
    "q66_unpivot" -> (Round4Queries.unpivotMetrics _),
    "q67_redaction" -> (Round4Queries.redaction _),
    "q68_array_set_ops" -> (Round4Queries.arraySetOps _),
    "q69_conditional_funcs" -> (Round4Queries.conditionalFuncs _),
    "q70_bitwise_agg" -> (Round4Queries.bitwiseAgg _),
    "q71_sampled_quantiles" -> (Round4Queries.sampledQuantiles _),
    "q72_resample_ffill" -> (Round4Queries.resampleFfill _),
    "q73_contamination" -> (Round4Queries.contamination _),
    "q74_audio_decode" -> (DataPipeQueries.audioDecode _),
    "q75_incremental_dedup" -> (DataPipeQueries.incrementalDedup _),
    "q76_repetition" -> (DataPipeQueries.repetition _),
    "q77_split_manifest" -> (DataPipeQueries.splitManifest _),
    "q78_weighted_sample" -> (DataPipeQueries.weightedSample _),
    "q79_topk_per_group" -> (DataPipeQueries.topkPerGroup _),
    "q80_tfidf_keywords" -> (DataPipeQueries.tfidfKeywords _),
    "q81_heavy_hitters" -> (DataPipeQueries.heavyHitters _),
    "q82_dup_spans" -> (DataPipeQueries.dupSpans _),
    "q83_token_budget" -> (DataPipeQueries.tokenBudget _),
    "q84_source_overlap" -> (DataPipeQueries.sourceOverlap _),
    "q85_exact_quantiles" -> (DataPipeQueries.exactQuantiles _),
    "q86_curated_mix" -> (DataPipeQueries.curatedMix _),
    "q87_stratified_weighted" -> (DataPipeQueries.stratifiedWeighted _),
    "q88_split_leakage" -> (DataPipeQueries.splitLeakage _),
    "q89_span_removal" -> (DataPipeQueries.spanRemoval _),
    "q90_bpe_encode" -> (DataPipeQueries.bpeEncode _),
    "q91_nonascii_minhash" -> (DataPipeQueries.nonAsciiMinhash _),
    "q92_image_neardup" -> (DataPipeQueries.imageNearDup _),
    "q93_video_meta" -> (DataPipeQueries.videoMeta _),
    "q94_bpe_budget" -> (DataPipeQueries.bpeTokenBudget _),
    "q95_kmeans" -> (DataPipeQueries.kmeans _),
    "q96_semantic_dedup" -> (DataPipeQueries.semanticDedup _),
    "q97_ngram_novelty" -> (DataPipeQueries.ngramNovelty _),
    "q98_decontaminate" -> (Round4Queries.decontaminated _),
    "q99_contamination_bloom" -> (Round4Queries.contaminationBloom _),
    "q100_rank_normalize" -> (DataPipeQueries.rankNormalized _),
    "q101_leakfree_split" -> (DataPipeQueries.leakFreeSplit _),
    "q102_dataset_card" -> (DataPipeQueries.datasetCard _),
    "q103_llm_funnel" -> (DataPipeQueries.llmFunnel _),
    "q104_bpe_merges" -> (DataPipeQueries.bpeMergeTable _),
    "q105_text_featurize" -> (DataPipeQueries.textFeaturizeKmeans _),
    "q106_pca_moments" -> (DataPipeQueries.pcaMoments _),
    "q107_lm_score" -> (DataPipeQueries.lmScore _),
    "q108_doc_chunks" -> (DataPipeQueries.docChunks _),
    "q109_pca_projection" -> (DataPipeQueries.pcaProjection _),
    "q110_int8_quantize" -> (DataPipeQueries.int8Quantized _),
    "q111_bpe_chunks" -> (DataPipeQueries.bpeChunks _),
    "q112_gopher_rules" -> (DataPipeQueries.gopherRules _),
    "q113_dedup_keepbest" -> (DataPipeQueries.dedupKeepBest _),
    "q114_tokenizer_fertility" -> (DataPipeQueries.tokenizerFertility _),
    "q115_cms_frequency" -> (DataPipeQueries.cmsFrequency _),
    "q116_canonical_dedup" -> (DataPipeQueries.canonicalDedupQ _),
    "q117_oov_score" -> (DataPipeQueries.oovScore _),
    "q118_mixture_apportion" -> (DataPipeQueries.mixtureApportion _),
    "q119_repetition_chars" -> (DataPipeQueries.repetitionChars _),
    "q120_dsir_weights" -> (DataPipeQueries.dsirWeights _),
    "q121_char_entropy" -> (DataPipeQueries.charEntropyQ _),
    "q122_epoch_shuffle" -> (DataPipeQueries.epochShuffleQ _),
    "q123_pii_redact" -> (DataPipeQueries.piiRedact _),
    "q124_curation_funnel2" -> (DataPipeQueries.curationFunnel2 _),
    "q125_backoff_lm" -> (DataPipeQueries.backoffLm _),
    "q126_sentence_dedup" -> (DataPipeQueries.sentenceDedupQ _),
    "q127_zipf_card" -> (DataPipeQueries.zipfCardQ _),
    "q128_epoch_plan" -> (DataPipeQueries.epochPlan _),
    "q129_sentence_dedup_inc" -> (DataPipeQueries.sentenceDedupIncQ _),
    "q130_span_corrupt" -> (DataPipeQueries.spanCorruptQ _),
    "q131_heaps_curve" -> (DataPipeQueries.heapsCurveQ _),
    "q132_unimax_allocate" -> (DataPipeQueries.unimaxAllocateQ _),
    "q133_zipf_card_inc" -> (DataPipeQueries.zipfCardIncQ _),
    "q134_heaps_curve_inc" -> (DataPipeQueries.heapsCurveIncQ _),
    "q135_backoff_lm_pruned" -> (DataPipeQueries.backoffLmPruned _),
    "q136_video_frames" -> (DataPipeQueries.videoFrames _),
    "q137_pca_power" -> (DataPipeQueries.pcaPower _),
    "q138_pca_power_inc" -> (DataPipeQueries.pcaPowerInc _),
    "q139_ann_index_inc" -> (DataPipeQueries.annIndexInc _),
    "q140_audio_features" -> (DataPipeQueries.audioFeatures _),
    "q141_pca_deflate" -> (DataPipeQueries.pcaDeflate _),
    "q142_audio_spectral" -> (DataPipeQueries.audioSpectral _),
    "q143_pagerank" -> (GraphSketchQueries.pageRankQ _),
    "q144_hll_distinct" -> (GraphSketchQueries.hllDistinct _),
    "q145_triangle_census" -> (GraphSketchQueries.triangleCensus _),
    "q146_kmv_setops" -> (GraphSketchQueries.kmvSetOps _),
    "q147_label_prop" -> (GraphSketchQueries.labelPropQ _),
    "q148_pmi_cooc" -> (GraphSketchQueries.pmiCooc _),
    "q149_random_walks" -> (GraphSketchQueries.randomWalksQ _),
    "q150_triangle_inc" -> (GraphSketchQueries.triangleCensusIncQ _),
    "q151_personalized_pr" -> (GraphSketchQueries.personalizedPageRankQ _),
    "q152_cohort_retention" -> (DataPipeQueries.cohortRetention _),
    "q153_hybrid_search" -> (Round4Queries.hybridSearchRrf _),
    "q154_source_simmatrix" -> (GraphSketchQueries.sourceSimilarityMatrix _),
    "q155_graph_card" -> (GraphSketchQueries.graphCard _),
    "q156_kcore" -> (GraphSketchQueries.corenessQ _),
    "q157_ppjoin_exact" -> (DataPipeQueries.ppjoinPairs _),
    "q158_lsh_tuning" -> (DataPipeQueries.lshTuningCard _),
    "q159_psi_drift" -> (DataPipeQueries.psiDrift _),
    "q162_ppjoin_inc" -> (DataPipeQueries.ppjoinIncrementalQ _),
    "q163_tokenizer_card" -> (DataPipeQueries.tokenizerCard _),
    "q164_ks_drift" -> (DataPipeQueries.ksDrift _),
    "q165_emb_drift" -> (DataPipeQueries.embDrift _),
    "q166_cluster_quality" -> (GraphSketchQueries.clusterQualityCard _),
    "q167_ann_tuning" -> (DataPipeQueries.annTuningCard _),
    "q168_unigram_pruned" -> (DataPipeQueries.unigramPrunedVocab _),
    "q169_funnel_steps" -> (DataPipeQueries.funnelSteps _),
    "q170_session_paths" -> (DataPipeQueries.sessionPaths _),
    "q171_source_dup_matrix" -> (GraphSketchQueries.sourceDupMatrix _),
    "q160_unigram_encode" -> (DataPipeQueries.unigramEncode _),
    "q161_unigram_vocab" -> (DataPipeQueries.unigramVocab _),
    "q172_itemsets" -> ((s, d) => AnalyticsQueries.itemsetRules(s, d)),
    "q173_mad_anomaly" -> ((s, d) => AnalyticsQueries.madAnomaly(s, d)),
    "q174_hits" -> (GraphSketchQueries.hitsQ _),
    "q175_bfs_dist" -> (GraphSketchQueries.bfsDistQ _),
    "q176_copurchase" -> (GraphSketchQueries.coPurchaseTopK _),
    "q177_pareto" -> (AnalyticsQueries.paretoFrontier _),
    "q178_decay" -> (AnalyticsQueries.decayedEngagement _),
    "q179_attribution" -> (AnalyticsQueries.attribution _),
    "q180_centroid_matrix" -> (AnalyticsQueries.labelCentroidMatrix _),
    "q181_dq_card" -> (AnalyticsQueries.dqCard _),
    "q182_trend" -> (AnalyticsQueries.typeTrend _),
    "q183_source_quartiles" -> (AnalyticsQueries.sourceQuartiles _),
    "q184_stickiness" -> (AnalyticsQueries.stickiness _),
    "q185_source_gini" -> (AnalyticsQueries.sourceGini _),
    "q186_gap_spectrum" -> (AnalyticsQueries.gapSpectrum _),
    "q187_rfm_segments" -> (AnalyticsQueries.rfmSegments _),
    "q188_session_trigrams" -> (AnalyticsQueries.sessionTrigrams _),
    "q189_supplier_hhi" -> (AnalyticsQueries.supplierHhi _),
    "q190_ship_latency" -> (AnalyticsQueries.shipLatencyQuartiles _),
    "q191_hourweek_entropy" -> (AnalyticsQueries.hourOfWeekEntropy _),
    "q192_benford" -> (AnalyticsQueries.benfordAudit _),
    "q193_cusum" -> (AnalyticsQueries.cusumShift _),
    "q194_join_estimate" -> (AnalyticsQueries.joinSizeEstimate _),
    "q195_markov_stationary" -> (AnalyticsQueries.markovStationary _),
    "q196_cohort_ltv" -> (AnalyticsQueries.cohortLtv _),
    "q197_session_lengths" -> (AnalyticsQueries.sessionLengthCard _),
    "q198_abc_classes" -> (AnalyticsQueries.abcClassification _),
    "q199_new_returning" -> (AnalyticsQueries.newVsReturning _),
    "q200_monitoring_card" -> (AnalyticsQueries.monitoringCard _),
    "q201_privacy_audit" -> (AnalyticsQueries.privacyAudit _),
    "q202_whales" -> (AnalyticsQueries.whaleConcentration _),
    "q203_source_term_cos" -> (AnalyticsQueries.sourceTermCosine _),
    "q204_ab_test" -> (AnalyticsQueries.abTestCard _),
    "q205_length_calibration" -> (AnalyticsQueries.lengthDiversityCalibration _),
    "q206_trending_terms" -> (AnalyticsQueries.trendingTerms _),
    "q207_pca_basis" -> (DataPipeQueries.pcaBasis _),
    "q208_quantile_summary" -> (DataPipeQueries.quantileSummary _),
    "q209_drift_gate" -> (DataPipeQueries.driftGate _),
  )

  /** Shared by q15 (brute force) and q16 (IVF with nProbe == nCells —
    * every cell probed, so the result is exactly the brute-force
    * top-k; the probe-join path is what differs). */
  private val knnOracle: String =
    """SELECT query_id, rank, neighbor_id FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
      |               c.vec_id) AS rank
      |  FROM embeddings q, embeddings c
      |  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id)
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_revenue_by_nation" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_rows
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q3_top_orders" ->
      """SELECT l_orderkey, o_orderdate,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus <> 'F'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_latest_event_per_user" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
        |FROM (SELECT user_id, event_id, event_type,
        |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q5_semi_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q6_cooccurrence" ->
      """SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS cnt
        |FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 ORDER BY cnt DESC, p1, p2 LIMIT 100""".stripMargin,
    "q7_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        | CAST(SUM(l_quantity) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q8_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q9_union_distinct" ->
      """SELECT okey FROM (
        |  SELECT o_orderkey AS okey FROM orders WHERE o_totalprice > 400000.0
        |  UNION
        |  SELECT l_orderkey AS okey FROM lineitem WHERE l_shipdate >= '1998-06-01'
        |) ORDER BY okey""".stripMargin,
    "q10_avg_qty_filter" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
        | COUNT(*) AS n
        |FROM lineitem l JOIN (
        |  SELECT l_partkey AS ap, AVG(l_quantity) * 0.2 AS thresh
        |  FROM lineitem GROUP BY 1) a
        |ON l.l_partkey = a.ap WHERE l.l_quantity < a.thresh""".stripMargin,
    "q11_doc_token_stats" ->
      """SELECT doc_id,
        | len(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS n_tokens,
        | length(text) AS text_len, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q12_dedup_exact" ->
      """SELECT md5(text) AS text_md5, MIN(doc_id) AS canonical_id,
        | COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_dedup_minhash" -> DataPipeQueries.minhashOracle,
    "q14_dedup_simhash" -> DataPipeQueries.simhashOracle(maxHamming = 3),
    "q15_knn_cosine" -> knnOracle,
    "q16_knn_ivf" -> knnOracle,
    "q17_lang_id" -> graft.datapipe.LangId.oracleSql(),
    "q18_text_quality" -> DataPipeQueries.textQualityOracle,
    "q19_fingerprint" -> DataPipeQueries.winnowOracle,
    "q20_cosine_neardup" -> DataPipeQueries.cosinePairsOracle(threshold = 0.45),
    "q21_outer_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q22_distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q23_exists_subquery" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
        |ORDER BY s_suppkey""".stripMargin,
    "q24_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q25_case_agg" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        | COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q26_dictionary_join" -> DataPipeQueries.dictionaryJoinOracle,
    "q27_percentile" ->
      """SELECT l_returnflag,
        | percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median_qty,
        | percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q28_string_funcs" ->
      """SELECT p_partkey,
        | upper(p_brand) AS brand_upper,
        | substring(p_type, 1, 5) AS type_prefix,
        | concat_ws('/', p_brand, p_type) AS brand_type,
        | CAST(length(replace(p_name, ' ', '')) AS BIGINT) AS name_len_nospace,
        | reverse(p_brand) AS brand_rev
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q29_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y,
        | CAST(quarter(o_orderdate) AS INT) AS q, COUNT(*) AS n,
        | CAST(min(day(o_orderdate)) AS INT) AS min_dom,
        | CAST(max(month(o_orderdate)) AS INT) AS max_month
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q30_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | ROW_NUMBER() OVER w AS order_seq,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS running_spend,
        | lag(o_orderkey, 1) OVER w AS prev_orderkey,
        | lead(o_orderkey, 1) OVER w AS next_orderkey
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q31_rank_ntile" ->
      """SELECT o_orderkey,
        | ntile(4) OVER wp AS price_quartile,
        | rank() OVER wr AS prio_rank,
        | dense_rank() OVER wr AS prio_dense_rank,
        | percent_rank() OVER wp AS price_pct_rank
        |FROM orders
        |WINDOW wp AS (ORDER BY o_totalprice DESC, o_orderkey),
        |       wr AS (ORDER BY o_orderpriority)
        |ORDER BY o_orderkey""".stripMargin,
    "q32_set_ops" ->
      """SELECT o_custkey FROM (
        |  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |   INTERSECT
        |   SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0)
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |) ORDER BY o_custkey""".stripMargin,
    "q33_token_counts" ->
      """SELECT tok, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |WHERE length(tok) > 0
        |GROUP BY tok ORDER BY n DESC, tok LIMIT 100""".stripMargin,
    "q34_pivot" -> RelationalQueries.q34PivotOracle,
    "q35_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        | COUNT(*) AS n, CAST(SUM(l_quantity) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |                        (l_returnflag, l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q36_range_join" ->
      """SELECT o_orderkey, COUNT(*) AS n_shipped_30d
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "q37_asof_prev_click" ->
      """SELECT event_id, user_id, prev_click_id FROM (
        |  SELECT event_id, user_id, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_id
        |  FROM events)
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q38_listagg" ->
      """SELECT o_custkey,
        | string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
        | COUNT(*) AS n
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q39_json_funcs" ->
      """SELECT event_type, COUNT(k) AS n_k,
        | CAST(SUM(k) AS BIGINT) AS sum_k,
        | CAST(MIN(k) AS BIGINT) AS min_k,
        | CAST(MAX(k) AS BIGINT) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q40_dictionary_semi_join" -> DataPipeQueries.dictionarySemiJoinOracle,
    "q41_set_ops_all" ->
      """SELECT okey, COUNT(*) AS n FROM (
        |  (SELECT l_orderkey AS okey FROM lineitem WHERE l_shipdate >= '1998-01-01'
        |   INTERSECT ALL
        |   SELECT l_orderkey AS okey FROM lineitem WHERE l_returnflag = 'R')
        |  EXCEPT ALL
        |  SELECT l_orderkey AS okey FROM lineitem WHERE l_linestatus = 'F'
        |) GROUP BY okey ORDER BY okey""".stripMargin,
    "q42_full_outer" ->
      """SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
        | COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
        |      FROM customer GROUP BY 1) cn
        |FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
        |      FROM supplier WHERE s_acctbal > 9000.0 GROUP BY 1) sn
        |ON cn.nk IS NOT DISTINCT FROM sn.nk
        |ORDER BY nationkey""".stripMargin,
    "q43_posexplode" ->
      """SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[CAST(i AS INT)] AS tok
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |CROSS JOIN (SELECT unnest(range(1, 6)) AS i) t
        |WHERE i <= len(toks)
        |ORDER BY doc_id, pos""".stripMargin,
    "q44_array_hof" ->
      """SELECT doc_id,
        | CAST(len(toks) AS BIGINT) AS n_toks,
        | CAST(len(list_filter(toks, t -> length(t) > 4)) AS BIGINT) AS n_long_toks,
        | CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS total_chars,
        | CAST(list_max(list_transform(toks, t -> length(t))) AS BIGINT) AS max_tok_len,
        | list_sort(toks)[1] AS first_tok_sorted
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q45_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, lag(ts) OVER w AS prev_ts
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, event_id, ts,
        |    SUM(CASE WHEN prev_ts IS NULL
        |             OR date_diff('second', prev_ts, ts) > 1800
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM e)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  COUNT(*) AS n_events,
        |  MIN(event_id) AS first_event_id,
        |  CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q46_scalar_subquery" ->
      """SELECT p_partkey, p_brand,
        | (SELECT COALESCE(CAST(SUM(l_quantity) AS DOUBLE), 0.0)
        |  FROM lineitem WHERE l_partkey = p_partkey) AS total_qty
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q47_regexp_funcs" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS n_vowel_runs,
        | regexp_extract(text, '^([a-z]+)', 1) AS first_word,
        | CAST(CASE WHEN regexp_matches(text, 'ing\b') THEN 1 ELSE 0 END AS BIGINT) AS has_ing
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q48_hash_sample" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sample_revenue
        |FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q49_window_range_frame" ->
      """SELECT o_orderkey,
        | COUNT(*) OVER w AS n_last_30d,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS spend_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q50_map_funcs" ->
      """SELECT event_id,
        | CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
        | array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
        | json_extract_string(props, '$.k') AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "q51_cross_join" ->
      """SELECT n_name, r_name FROM nation CROSS JOIN region
        |ORDER BY n_name, r_name""".stripMargin,
    "q52_media_features" ->
      """SELECT doc_id AS media_id,
        | CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |      WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        | CAST(16 + length(text) AS BIGINT) AS n_bytes,
        | CAST(list_sum(list_transform(range(1, length(text) + 1),
        |   i -> ord(text[i:i]))) AS BIGINT) AS sum_bytes,
        | CAST(length(text) AS BIGINT) AS n_payload
        |FROM documents ORDER BY media_id""".stripMargin,
    "q53_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
        |  CASE lang WHEN 'en' THEN '80000000'
        |            WHEN 'zh' THEN '20000000'
        |            ELSE '40000000' END
        |ORDER BY doc_id""".stripMargin,
    "q54_curation_funnel" -> DataPipeQueries.curationOracle,
    "q55_neardup_components" -> DataPipeQueries.componentsOracle,
    "q56_kmv_distinct" -> Round4Queries.kmvOracle,
    "q57_moment_stats" -> Round4Queries.momentStatsOracle,
    "q58_merge_upsert" -> Round4Queries.mergeUpsertOracle,
    "q59_bpe_tokens" -> Round4Queries.bpeOracle,
    "q60_edit_distance" -> Round4Queries.editDistanceOracle,
    "q61_inverted_search" -> Round4Queries.invertedSearchOracle,
    "q62_bm25_search" -> Round4Queries.bm25Oracle,
    "q63_salted_join" -> Round4Queries.saltedJoinOracle,
    "q64_sequence_packing" -> Round4Queries.sequencePackingOracle,
    "q65_mixture_schedule" -> Round4Queries.mixtureScheduleOracle,
    "q66_unpivot" -> Round4Queries.unpivotOracle,
    "q67_redaction" -> Round4Queries.redactionOracle,
    "q68_array_set_ops" -> Round4Queries.arraySetOpsOracle,
    "q69_conditional_funcs" -> Round4Queries.conditionalFuncsOracle,
    "q70_bitwise_agg" -> Round4Queries.bitwiseAggOracle,
    "q71_sampled_quantiles" -> Round4Queries.sampledQuantilesOracle,
    "q72_resample_ffill" -> Round4Queries.resampleOracle,
    "q73_contamination" -> Round4Queries.contaminationOracle,
    "q74_audio_decode" -> DataPipeQueries.audioDecodeOracle,
    "q75_incremental_dedup" -> DataPipeQueries.incrementalDedupOracle,
    "q76_repetition" -> DataPipeQueries.repetitionOracle,
    "q77_split_manifest" -> DataPipeQueries.splitManifestOracle,
    "q78_weighted_sample" -> DataPipeQueries.weightedSampleOracle,
    "q79_topk_per_group" -> DataPipeQueries.topkPerGroupOracle,
    "q80_tfidf_keywords" -> DataPipeQueries.tfidfKeywordsOracle,
    "q81_heavy_hitters" -> DataPipeQueries.heavyHittersOracle,
    "q82_dup_spans" -> DataPipeQueries.dupSpansOracle,
    "q83_token_budget" -> DataPipeQueries.tokenBudgetOracle,
    "q84_source_overlap" -> DataPipeQueries.sourceOverlapOracle,
    "q85_exact_quantiles" -> DataPipeQueries.exactQuantilesOracle,
    "q86_curated_mix" -> DataPipeQueries.curatedMixOracle,
    "q87_stratified_weighted" -> DataPipeQueries.stratifiedWeightedOracle,
    "q88_split_leakage" -> DataPipeQueries.splitLeakageOracle,
    "q89_span_removal" -> DataPipeQueries.spanRemovalOracle,
    "q90_bpe_encode" -> DataPipeQueries.bpeEncodeOracle,
    "q91_nonascii_minhash" -> DataPipeQueries.nonAsciiMinhashOracle,
    "q92_image_neardup" -> DataPipeQueries.imageNearDupOracle,
    "q93_video_meta" -> DataPipeQueries.videoMetaOracle,
    "q94_bpe_budget" -> DataPipeQueries.bpeTokenBudgetOracle,
    "q95_kmeans" -> DataPipeQueries.kmeansOracle,
    "q96_semantic_dedup" -> DataPipeQueries.semanticDedupOracle,
    "q97_ngram_novelty" -> DataPipeQueries.ngramNoveltyOracle,
    "q98_decontaminate" -> Round4Queries.decontaminatedOracle,
    "q99_contamination_bloom" -> Round4Queries.contaminationOracle,
    "q100_rank_normalize" -> DataPipeQueries.rankNormalizedOracle,
    "q101_leakfree_split" -> DataPipeQueries.leakFreeSplitOracle,
    "q102_dataset_card" -> DataPipeQueries.datasetCardOracle,
    "q103_llm_funnel" -> DataPipeQueries.llmFunnelOracle,
    "q104_bpe_merges" -> DataPipeQueries.bpeMergeTableOracle,
    "q105_text_featurize" -> DataPipeQueries.textFeaturizeKmeansOracle,
    "q106_pca_moments" -> DataPipeQueries.pcaMomentsOracle,
    "q107_lm_score" -> DataPipeQueries.lmScoreOracle,
    "q108_doc_chunks" -> DataPipeQueries.docChunksOracle,
    "q109_pca_projection" -> DataPipeQueries.pcaProjectionOracle,
    "q110_int8_quantize" -> DataPipeQueries.int8QuantizedOracle,
    "q111_bpe_chunks" -> DataPipeQueries.bpeChunksOracle,
    "q112_gopher_rules" -> DataPipeQueries.gopherRulesOracle,
    "q113_dedup_keepbest" -> DataPipeQueries.dedupKeepBestOracle,
    "q114_tokenizer_fertility" -> DataPipeQueries.tokenizerFertilityOracle,
    "q115_cms_frequency" -> DataPipeQueries.cmsFrequencyOracle,
    "q116_canonical_dedup" -> DataPipeQueries.canonicalDedupOracle,
    "q117_oov_score" -> DataPipeQueries.oovScoreOracle,
    "q118_mixture_apportion" -> DataPipeQueries.mixtureApportionOracle,
    "q119_repetition_chars" -> DataPipeQueries.repetitionCharsOracle,
    "q120_dsir_weights" -> DataPipeQueries.dsirWeightsOracle,
    "q121_char_entropy" -> DataPipeQueries.charEntropyOracle,
    "q122_epoch_shuffle" -> DataPipeQueries.epochShuffleOracle,
    "q123_pii_redact" -> DataPipeQueries.piiRedactOracle,
    "q124_curation_funnel2" -> DataPipeQueries.curationFunnel2Oracle,
    "q125_backoff_lm" -> DataPipeQueries.backoffLmOracle,
    "q126_sentence_dedup" -> DataPipeQueries.sentenceDedupOracle,
    "q127_zipf_card" -> DataPipeQueries.zipfCardOracle,
    "q128_epoch_plan" -> DataPipeQueries.epochPlanOracle,
    "q129_sentence_dedup_inc" -> DataPipeQueries.sentenceDedupIncOracle,
    "q130_span_corrupt" -> DataPipeQueries.spanCorruptOracle,
    "q131_heaps_curve" -> DataPipeQueries.heapsCurveOracle,
    "q132_unimax_allocate" -> DataPipeQueries.unimaxAllocateOracle,
    "q133_zipf_card_inc" -> DataPipeQueries.zipfCardIncOracle,
    "q134_heaps_curve_inc" -> DataPipeQueries.heapsCurveIncOracle,
    "q135_backoff_lm_pruned" -> DataPipeQueries.backoffLmPrunedOracle,
    "q136_video_frames" -> DataPipeQueries.videoFramesOracle,
    "q137_pca_power" -> DataPipeQueries.pcaPowerOracle,
    "q138_pca_power_inc" -> DataPipeQueries.pcaPowerIncOracle,
    "q139_ann_index_inc" -> DataPipeQueries.annIndexIncOracle,
    "q140_audio_features" -> DataPipeQueries.audioFeaturesOracle,
    "q141_pca_deflate" -> DataPipeQueries.pcaDeflateOracle,
    "q142_audio_spectral" -> DataPipeQueries.audioSpectralOracle,
    "q143_pagerank" -> GraphSketchQueries.pageRankOracle,
    "q144_hll_distinct" -> GraphSketchQueries.hllOracle,
    "q145_triangle_census" -> GraphSketchQueries.triangleOracle,
    "q146_kmv_setops" -> GraphSketchQueries.kmvSetOpsOracle,
    "q147_label_prop" -> GraphSketchQueries.labelPropOracle,
    "q148_pmi_cooc" -> GraphSketchQueries.pmiOracle,
    "q149_random_walks" -> GraphSketchQueries.randomWalksOracle,
    // batch ≡ incremental: the one-shot census SQL is the oracle
    "q150_triangle_inc" -> GraphSketchQueries.triangleOracle,
    "q151_personalized_pr" -> GraphSketchQueries.personalizedPageRankOracle,
    "q152_cohort_retention" -> DataPipeQueries.cohortRetentionOracle,
    "q153_hybrid_search" -> Round4Queries.hybridOracle,
    "q154_source_simmatrix" -> GraphSketchQueries.sourceSimilarityOracle,
    "q155_graph_card" -> GraphSketchQueries.graphCardOracle,
    "q156_kcore" -> GraphSketchQueries.corenessOracle,
    "q157_ppjoin_exact" -> DataPipeQueries.ppjoinOracle,
    "q158_lsh_tuning" -> DataPipeQueries.lshTuningCardOracle,
    "q159_psi_drift" -> DataPipeQueries.psiDriftOracle,
    "q162_ppjoin_inc" -> DataPipeQueries.ppjoinIncrementalOracle,
    "q163_tokenizer_card" -> DataPipeQueries.tokenizerCardOracle,
    "q164_ks_drift" -> DataPipeQueries.ksDriftOracle,
    "q165_emb_drift" -> DataPipeQueries.embDriftOracle,
    "q166_cluster_quality" -> GraphSketchQueries.clusterQualityOracle,
    "q167_ann_tuning" -> DataPipeQueries.annTuningCardOracle,
    "q168_unigram_pruned" -> DataPipeQueries.unigramPrunedVocabOracle,
    "q169_funnel_steps" -> DataPipeQueries.funnelStepsOracle,
    "q170_session_paths" -> DataPipeQueries.sessionPathsOracle,
    "q171_source_dup_matrix" -> GraphSketchQueries.sourceDupMatrixOracle,
    "q160_unigram_encode" -> DataPipeQueries.unigramEncodeOracle,
    "q161_unigram_vocab" -> DataPipeQueries.unigramVocabOracle,
    "q172_itemsets" -> AnalyticsQueries.itemsetRulesOracle,
    "q173_mad_anomaly" -> AnalyticsQueries.madAnomalyOracle(),
    "q174_hits" -> GraphSketchQueries.hitsOracle,
    "q175_bfs_dist" -> GraphSketchQueries.bfsDistOracle,
    "q176_copurchase" -> GraphSketchQueries.coPurchaseOracle,
    "q177_pareto" -> AnalyticsQueries.paretoFrontierOracle,
    "q178_decay" -> AnalyticsQueries.decayedEngagementOracle,
    "q179_attribution" -> AnalyticsQueries.attributionOracle,
    "q180_centroid_matrix" -> AnalyticsQueries.labelCentroidMatrixOracle,
    "q181_dq_card" -> AnalyticsQueries.dqCardOracle,
    "q182_trend" -> AnalyticsQueries.typeTrendOracle,
    "q183_source_quartiles" -> AnalyticsQueries.sourceQuartilesOracle,
    "q184_stickiness" -> AnalyticsQueries.stickinessOracle,
    "q185_source_gini" -> AnalyticsQueries.sourceGiniOracle,
    "q186_gap_spectrum" -> AnalyticsQueries.gapSpectrumOracle,
    "q187_rfm_segments" -> AnalyticsQueries.rfmSegmentsOracle,
    "q188_session_trigrams" -> AnalyticsQueries.sessionTrigramsOracle,
    "q189_supplier_hhi" -> AnalyticsQueries.supplierHhiOracle,
    "q190_ship_latency" -> AnalyticsQueries.shipLatencyQuartilesOracle,
    "q191_hourweek_entropy" -> AnalyticsQueries.hourOfWeekEntropyOracle,
    "q192_benford" -> AnalyticsQueries.benfordAuditOracle,
    "q193_cusum" -> AnalyticsQueries.cusumShiftOracle,
    "q194_join_estimate" -> AnalyticsQueries.joinSizeEstimateOracle,
    "q195_markov_stationary" -> AnalyticsQueries.markovStationaryOracle,
    "q196_cohort_ltv" -> AnalyticsQueries.cohortLtvOracle,
    "q197_session_lengths" -> AnalyticsQueries.sessionLengthCardOracle,
    "q198_abc_classes" -> AnalyticsQueries.abcClassificationOracle,
    "q199_new_returning" -> AnalyticsQueries.newVsReturningOracle,
    "q200_monitoring_card" -> AnalyticsQueries.monitoringCardOracle,
    "q201_privacy_audit" -> AnalyticsQueries.privacyAuditOracle,
    "q202_whales" -> AnalyticsQueries.whaleConcentrationOracle,
    "q203_source_term_cos" -> AnalyticsQueries.sourceTermCosineOracle,
    "q204_ab_test" -> AnalyticsQueries.abTestCardOracle,
    "q205_length_calibration" -> AnalyticsQueries.lengthDiversityCalibrationOracle,
    "q206_trending_terms" -> AnalyticsQueries.trendingTermsOracle,
    "q207_pca_basis" -> DataPipeQueries.pcaBasisOracle,
    "q208_quantile_summary" -> DataPipeQueries.quantileSummaryOracle,
    "q209_drift_gate" -> DataPipeQueries.driftGateOracle,
  )
}
