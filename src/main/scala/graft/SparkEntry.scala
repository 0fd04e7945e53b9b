package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has (where SQL-expressible) a DuckDB oracle in
  * `oracleSql` over the same parquet tables; column names are aligned on
  * both sides because the driver's compare sorts columns by name before
  * hashing. Money sums are exact-decimal on both sides (see
  * queries.Analytics) so no float nondeterminism leaks into the hash.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.ordersByMonth(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — reference parity: aggregations / filters / sorts (SURVEY §2.3, 2.6, 2.8)
    "q1_agg" -> (Reference.q1Agg(_, _)),
    "q_orders_by_month" -> (Analytics.ordersByMonth(_, _)),
    "q_filter_eq" -> (Analytics.filterEq(_, _)),
    "q_filter_range" -> (Analytics.filterRange(_, _)),
    "q_like_groupall" -> (Analytics.salesByCategoryLike(_, _)),
    "q_distinct_category" -> (Analytics.distinctCategories(_, _)),
    "q_limit_preview" -> (Analytics.limitPreview(_, _)),
    "q_union_all" -> (Analytics.unionAllLiterals(_, _)),
    "q_sql_ordinal" -> (Analytics.sqlOrdinal(_, _)),
    "q_sql_recursive" -> (Analytics.sqlRecursive(_, _)),
    "q_sql_pivot" -> (Analytics.sqlPivot(_, _)),
    "q_sql_unpivot" -> (Analytics.sqlUnpivot(_, _)),
    "q_corr_matrix" -> (Analytics.corrMatrix(_, _)),
    "q_sql_groupby_all" -> (Analytics.sqlGroupByAll(_, _)),
    "q_sql_params" -> (Analytics.sqlParams(_, _)),
    "q_sql_rollup" -> (Analytics.rollupCounts(_, _)),
    "q_sql_cube" -> (Analytics.cubeCounts(_, _)),
    "q_sql_grouping_sets" -> (Analytics.groupingSetsCounts(_, _)),
    "q_string_agg" -> (Analytics.stringAggStatuses(_, _)),
    "q_window_nav" -> (Analytics.windowNavigation(_, _)),
    "q_join_full_outer" -> (Analytics.fullOuterActivity(_, _)),
    "q_sql_correlated" -> (Analytics.sqlCorrelated(_, _)),
    "q_sql_lateral" -> (Analytics.sqlLateral(_, _)),
    "q_window_ignore_nulls" -> (Analytics.windowIgnoreNulls(_, _)),
    "q_fuzzy_match" -> (Analytics.fuzzyPartNames(_, _)),
    "q_sql_setops" -> (Analytics.setOps(_, _)),
    "q_sql_setops_all" -> (Analytics.setOpsAll(_, _)),
    "q_window_running" -> (Analytics.runningWindows(_, _)),
    // — joins (SURVEY §2.4 / testdata surface)
    "q_join_nation_region" -> (Analytics.joinNationRegion(_, _)),
    "q_join_orders_lineitem" -> (Analytics.joinOrdersLineitem(_, _)),
    "q_join_5way" -> (Analytics.revenueByNation(_, _)),
    "q_shipping_priority" -> (Analytics.shippingPriority(_, _)),
    "q_join_semi_anti" -> (Analytics.churnedCustomers(_, _)),
    "q_join_bloom_prune" -> (Analytics.bloomSemiRevenue(_, _)),
    // — windows / percentiles (extension surface, SURVEY §2.7)
    "q_window_topk" -> (Analytics.topOrdersPerPriority(_, _)),
    "q_window_ranking" -> (Analytics.rankingFamily(_, _)),
    "q_window_range_7d" -> (Events.rolling7d(_, _)),
    "q_funnel" -> (Events.funnel(_, _)),
    "q_cohort_retention" -> (Events.cohortRetention(_, _)),
    "q_engagement_coverage" -> (Events.engagementCoverage(_, _)),
    "q_event_transitions" -> (Events.eventTransitions(_, _)),
    "q_attribution" -> (Events.lastTouchAttribution(_, _)),
    "q_attribution_linear" -> (Events.linearAttribution(_, _)),
    "q_attribution_stream" -> (Events.attributionStreamMaterialize(_, _)),
    "q_trend_slope" -> (Events.trendSlope(_, _)),
    "q_anomaly_days" -> (Events.anomalyDays(_, _)),
    "q_ewma_daily" -> (Events.ewmaDaily(_, _)),
    "q_regression_multi" -> (Events.regressionMulti(_, _)),
    "q_theil_sen" -> (Events.theilSenSlope(_, _)),
    "q_event_paths" -> (Events.eventPaths(_, _)),
    "q_pagerank" -> ((s, d) => LlmOps.pagerankTopK(s, d)),
    "q_pagerank_ppr" -> ((s, d) => LlmOps.pagerankPersonalized(s, d)),
    "q_textrank" -> ((s, d) => LlmOps.textrank(s, d)),
    "q_percentiles" -> (Analytics.quantitiesQuartiles(_, _)),
    // — DV3F reshape pipeline (SURVEY §2.5, T1-T4)
    "q_unpivot" -> (Dv3fQueries.unpivotLineitem(_, _)),
    "q_pivot" -> (Dv3fQueries.pivotLineitem(_, _)),
    "q_split_cod" -> (Dv3fQueries.splitCod(_, _)),
    "q_uid_sha2" -> (Dv3fQueries.uidSha2(_, _)),
    "q_dv3f_pipeline" -> (Dv3fQueries.dv3fPipeline(_, _)),
    "q_dv3f_source" -> (Dv3fQueries.dv3fSourcePipeline(_, _)),
    "q_dv3f_agg_pushdown" -> (Dv3fQueries.dv3fAggPushdown(_, _)),
    // — connector smoke (SURVEY §2.1 S6): real round trips per format
    "q_csv_scan" -> (Connectors.csvScan(_, _)),
    "q_jdbc_scan" -> (Connectors.jdbcScan(_, _)),
    "q_dbf_scan" -> (Connectors.dbfScan(_, _)),
    "q_dbf_lookup_join" -> (Connectors.dbfLookupJoin(_, _)),
    "q_orc_scan" -> (Connectors.orcScan(_, _)),
    "q_xml_scan" -> (Connectors.xmlScan(_, _)),
    "q_json_scan" -> (Connectors.jsonScan(_, _)),
    "q_binaryfile_scan" -> (Connectors.binaryFilesScan(_, _)),
    "q_avro_scan" -> (Connectors.avroScan(_, _)),
    "q_text_scan" -> (Connectors.textScan(_, _)),
    // — physical-layout surface through the gate (skew/layout/bucketing)
    "q_skew_salted_agg" -> (Physical.saltedAgg(_, _)),
    "q_skew_salted_join" -> (Physical.saltedJoin(_, _)),
    "q_layout_pruned_scan" -> (Physical.partitionPrunedScan(_, _)),
    "q_bucketed_join" -> (Physical.bucketedJoin(_, _)),
    // — data quality (SURVEY §2.13)
    "q_quality_unique" -> (Dv3fQueries.qualityUnique(_, _)),
    "q_quality_notnull" -> (Dv3fQueries.qualityNotNull(_, _)),
    "q_quality_accepted" -> (Dv3fQueries.qualityAcceptedValues(_, _)),
    "q_quality_accepted_report" -> (Dv3fQueries.qualityAcceptedReport(_, _)),
    "q_quality_relationship" -> (Dv3fQueries.qualityRelationship(_, _)),
    "q_profile" -> (Dv3fQueries.profileOrders(_, _)),
    // — LLM-pipeline: dedup family
    "q_dedup_exact" -> (LlmOps.dedupExact(_, _)),
    "q_dedup_minhash" -> (LlmOps.minhashSignatures(_, _)),
    "q_dedup_minhash_lsh" -> (LlmOps.minhashLshDedup(_, _)),
    "q_dedup_cc" -> (LlmOps.dedupClusters(_, _)),
    "q_dedup_survivors" -> (LlmOps.dedupSurvivors(_, _)),
    "q_dedup_survivors_best" -> (LlmOps.dedupSurvivorsBest(_, _)),
    "q_curation_report" -> (LlmOps.curationReport(_, _)),
    "q_dedup_cc_incr" -> (LlmOps.dedupClustersIncremental(_, _)),
    "q_dedup_ngram_jaccard" -> (LlmOps.ngramJaccard(_, _)),
    "q_dedup_containment" -> (LlmOps.ngramContainment(_, _)),
    "q_chunk_cdc_dedup" -> (LlmOps.cdcChunkDedup(_, _)),
    "q_dedup_simhash" -> (LlmOps.simhashSignatures(_, _)),
    "q_dedup_simhash_pairs" -> (LlmOps.simhashPairs(_, _)),
    "q_corpus_clean" -> (LlmOps.corpusClean(_, _)),
    "q_prepare_corpus" -> (LlmOps.prepareCorpus(_, _)),
    "q_dedup_spans" -> (LlmOps.duplicateSpans(_, _)),
    "q_dedup_longest_span" -> ((s, d) => LlmOps.dedupLongestSpan(s, d)),
    "q_blocklist_scan" -> (LlmOps.blocklistScan(_, _)),
    "q_blocklist_mask" -> (LlmOps.blocklistMask(_, _)),
    "q_blocklist_stream" -> (LlmOps.blocklistStreamMaterialize(_, _)),
    "q_dedup_doc_coverage" -> (LlmOps.dedupDocCoverage(_, _)),
    "q_dedup_suffix_span" -> (LlmOps.dedupSuffixSpan(_, _)),
    "q_para_dedup" -> (LlmOps.paraDedup(_, _)),
    "q_para_dedup_bloom" -> (LlmOps.paraDedupBloom(_, _)),
    "q_para_dedup_incr" -> (LlmOps.paraDedupIncr(_, _)),
    "q_para_dedup_stream" -> (LlmOps.paraDedupStreamMaterialize(_, _)),
    "q_decontaminate" -> (LlmOps.decontaminate(_, _)),
    "q_decontaminate_bloom" -> (LlmOps.decontaminateBloom(_, _)),
    "q_dedup_incr_exact" -> (LlmOps.dedupIncrementalExact(_, _)),
    "q_dedup_incr_lsh" -> (LlmOps.dedupIncrementalLsh(_, _)),
    "q_ingest_gate_e2e" -> (LlmOps.ingestGateE2e(_, _)),
    "q_vocab_topk" -> (LlmOps.vocabTopK(_, _)),
    "q_tfidf_keywords" -> ((s, d) => LlmOps.tfidfKeywords(s, d)),
    "q_ssjoin_ppjoin" -> (LlmOps.ssjoinPpjoin(_, _)),
    "q_ssjoin_incr" -> (LlmOps.ssjoinIncr(_, _)),
    "q_ssjoin_stream" -> (LlmOps.ssjoinStreamMaterialize(_, _)),
    "q_lsh_tune" -> (LlmOps.lshParamSweep(_, _)),
    "q_lsh_fitted_dedup" -> ((s, d) => LlmOps.lshFittedDedup(s, d)),
    "q_vocab_richness" -> (LlmOps.vocabRichness(_, _)),
    "q_source_novelty" -> (LlmOps.sourceNovelty(_, _)),
    "q_dedup_bbit_est" -> (LlmOps.bbitMinhashEstimate(_, _)),
    "q_bpe_pairs" -> ((s, d) => LlmOps.bpePairCounts(s, d)),
    "q_bpe_merges" -> ((s, d) => graft.ops.Bpe.mergesQuery(s, d)),
    "q_bpe_bytes" -> ((s, d) => graft.ops.Bpe.bytesQuery(s, d)),
    "q_bpe_bytes_encode" -> ((s, d) => graft.ops.Bpe.encodeStatsBytes(s, d)),
    "q_bpe_encode" -> ((s, d) => graft.ops.Bpe.encodeStats(s, d)),
    "q_wordpiece_vocab" -> ((s, d) => graft.ops.WordPiece.vocabQuery(s, d)),
    "q_wordpiece_encode" -> ((s, d) => graft.ops.WordPiece.encodeStats(s, d)),
    "q_wordpiece_ids" -> ((s, d) => graft.ops.WordPiece.idsQuery(s, d)),
    "q_minpiece_encode" -> ((s, d) => graft.ops.WordPiece.minEncodeStats(s, d)),
    "q_unigram_fit" -> ((s, d) => graft.ops.Unigram.fitQuery(s, d)),
    "q_unigram_encode" -> ((s, d) => graft.ops.Unigram.encodeStats(s, d)),
    "q_unigram_bakeoff" -> ((s, d) => graft.ops.Unigram.bakeoff(s, d)),
    "q_token_blocks" -> ((s, d) => graft.ops.WordPiece.blocksQuery(s, d)),
    "q_block_provenance" -> ((s, d) => graft.ops.WordPiece.blockProvenance(s, d)),
    "q_block_decontam" -> ((s, d) => graft.ops.WordPiece.blockDecontam(s, d)),
    "q_trgm_like_scan" -> ((s, d) => graft.ops.TrigramIndex.likeScan(s, d)),
    "q_trgm_like_incr" -> ((s, d) => graft.ops.TrigramIndex.likeScanIncr(s, d)),
    "q_phrase_search" -> ((s, d) => graft.ops.InvertedIndex.phraseSearch(s, d)),
    "q_phrase_search_incr" -> ((s, d) => graft.ops.InvertedIndex.phraseSearchIncr(s, d)),
    "q_index_stats" -> ((s, d) => graft.ops.InvertedIndex.indexStats(s, d)),
    "q_span_corruption" -> (Curation.spanCorruption(_, _)),
    "q_budget_select" -> ((s, d) => Curation.budgetSelect(s, d)),
    "q_pref_pairs" -> (Curation.prefPairs(_, _)),
    "q_sft_examples" -> (Curation.sftExamples(_, _)),
    "q_session_transcript" -> (Events.sessionTranscript(_, _)),
    "q_collocations" -> ((s, d) => LlmOps.collocations(s, d)),
    "q_lang_diversity" -> (LlmOps.langDiversity(_, _)),
    "q_langid_nb" -> ((s, d) => LlmOps.langIdNbConfusion(s, d)),
    "q_code_switch" -> ((s, d) => LlmOps.codeSwitchCensus(s, d)),
    "q_code_switch_split" -> ((s, d) => LlmOps.codeSwitchSplit(s, d)),
    "q_token_drift" -> ((s, d) => LlmOps.tokenDrift(s, d)),
    "q_vocab_overlap" -> (LlmOps.vocabOverlap(_, _)),
    "q_bm25_topk" -> ((s, d) => LlmOps.bm25TopK(s, d)),
    "q_hard_negatives" -> ((s, d) => LlmOps.hardNegatives(s, d)),
    "q_retrieval_mrr" -> ((s, d) => LlmOps.retrievalMrr(s, d)),
    "q_rm3_topk" -> ((s, d) => LlmOps.rm3TopK(s, d)),
    "q_hybrid_rrf" -> ((s, d) => LlmOps.hybridRrf(s, d)),
    // — LLM-pipeline: text analysis
    "q_text_stats" -> (LlmOps.textStats(_, _)),
    "q_text_repetition" -> (LlmOps.textRepetition(_, _)),
    "q_quality_gopher" -> (LlmOps.gopherQuality(_, _)),
    "q_quality_classifier" -> (LlmOps.qualityClassifier(_, _)),
    "q_unigram_lm" -> ((s, d) => LlmOps.unigramLmTopK(s, d)),
    "q_bigram_lm" -> ((s, d) => LlmOps.bigramLmTopK(s, d)),
    "q_kn_bigram" -> ((s, d) => LlmOps.knBigramTopK(s, d)),
    "q_ppl_buckets" -> (LlmOps.pplBuckets(_, _)),
    "q_dsir_sample" -> ((s, d) => LlmOps.dsirSample(s, d)),
    "q_outlier_mad" -> ((s, d) => LlmOps.outlierMad(s, d)),
    "q_doc_fingerprints" -> (LlmOps.docFingerprints(_, _)),
    "q_winnow_pairs" -> ((s, d) => LlmOps.winnowPairs(s, d)),
    "q_winnow_incr" -> ((s, d) => LlmOps.winnowIncrPairs(s, d)),
    // — LLM-pipeline: similarity search
    "q_embed_topk" -> (LlmOps.embedTopK(_, _)),
    "q_embed_topk_i8" -> (LlmOps.embedTopKI8(_, _)),
    "q_embed_pq_topk" -> (LlmOps.embedPqTopK(_, _)),
    "q_embed_pq_rerank" -> (LlmOps.embedPqRerank(_, _)),
    "q_embed_ivfpq" -> (LlmOps.embedIvfPq(_, _)),
    "q_embed_neardup" -> (LlmOps.embedNearDup(_, _)),
    "q_embed_margin_pairs" -> ((s, d) => LlmOps.embedMarginPairs(s, d)),
    "q_embed_incr_neardup" -> (LlmOps.embedIncrNearDup(_, _)),
    "q_embed_topk_perlabel" -> (LlmOps.embedTopKPerLabel(_, _)),
    "q_embed_ann_ivf" -> (LlmOps.embedAnnIvf(_, _)),
    "q_embed_recall" -> (LlmOps.embedRecallEval(_, _)),
    "q_embed_recall_budget" -> (LlmOps.embedRecallBudget(_, _)),
    "q_embed_drift" -> (LlmOps.embedDrift(_, _)),
    "q_embed_ivf_sq8" -> (LlmOps.embedIvfSq8(_, _)),
    "q_embed_mmr" -> (LlmOps.embedMmr(_, _)),
    "q_embed_ann_ivf_indexed" -> (LlmOps.embedAnnIvfIndexed(_, _)),
    "q_embed_ivf_append" -> (LlmOps.embedIvfAppend(_, _)),
    "q_embed_ivf_sq8_append" -> ((s, d) => LlmOps.embedIvfSq8Append(s, d)),
    "q_embed_ivfpq_append" -> (LlmOps.embedIvfPqAppend(_, _)),
    "q_kmeans_step" -> (LlmOps.kmeansStep(_, _)),
    "q_dedup_semantic" -> (LlmOps.semanticDedup(_, _)),
    "q_sample_cluster_balanced" -> ((s, d) => LlmOps.sampleClusterBalanced(s, d)),
    // — LLM-pipeline: multimodal plumbing
    "q_multimodal_meta" -> (LlmOps.multimodalMeta(_, _)),
    "q_multimodal_feat" -> (LlmOps.multimodalFeatures(_, _)),
    "q_multimodal_audio_neardup" -> (LlmOps.multimodalAudioNearDup(_, _)),
    "q_multimodal_neardup" -> (LlmOps.multimodalNearDup(_, _)),
    "q_multimodal_audio" -> (LlmOps.multimodalAudio(_, _)),
    "q_multimodal_video" -> (LlmOps.multimodalVideo(_, _)),
    "q_multimodal_video_neardup" -> (LlmOps.multimodalVideoNearDup(_, _)),
    // — corpus curation: deterministic sampling / splits / PII / chunking
    "q_sample_hash" -> (Curation.sampleHash(_, _)),
    "q_train_test_split" -> (Curation.trainTestSplit(_, _)),
    "q_split_leakage_safe" -> (Curation.splitLeakageSafe(_, _)),
    "q_sample_stratified" -> (Curation.sampleStratified(_, _)),
    "q_text_pii" -> (Curation.piiMask(_, _)),
    "q_chunk_docs" -> (Curation.chunkDocs(_, _)),
    "q_chunk_docs_gen" -> (Curation.chunkDocsGen(_, _)),
    "q_pack_sequences" -> (Curation.packSequences(_, _)),
    "q_pack_sequences_sharded" -> (Curation.packSequencesSharded(_, _)),
    "q_corpus_mix" -> (Curation.corpusMix(_, _)),
    // — time-series: as-of join, resample/gap-fill, histogram
    "q_asof_join" -> (Events.asofPurchase(_, _)),
    "q_asof_join_native" -> (Events.asofPurchaseNative(_, _)),
    "q_asof_join_forward" -> (Events.asofNextPurchase(_, _)),
    "q_range_join_sessions" -> (Events.eventSessionAssign(_, _)),
    "q_resample_1d" -> (Events.resampleDaily(_, _)),
    "q_histogram" -> (Analytics.histogram(_, _)),
    // — streaming operators, batch faces (unified API; streaming runs of
    //   the same transforms are exercised in EventStreamsSpec)
    "q_events_tumbling" -> (Events.tumbling(_, _)),
    "q_events_sliding" -> (Events.sliding(_, _)),
    "q_events_sessionize" -> (Events.sessionize(_, _)),
    "q_events_session_window" -> (Events.sessionWindow(_, _)),
    "q_events_json" -> (Events.jsonProps(_, _)),
    // — table maintenance: CDC merge, incremental aggregates, zone maps
    "q_cdc_merge" -> (Maintenance.cdcMerge(_, _)),
    "q_cdc_merge_part" -> (Maintenance.cdcMergePartitioned(_, _)),
    "q_time_travel" -> (Maintenance.timeTravel(_, _)),
    "q_ivm_aggregate" -> (Maintenance.ivmAggregate(_, _)),
    "q_ivm_join" -> (Maintenance.ivmJoin(_, _)),
    "q_ivm_join_dim" -> (Maintenance.ivmJoinDim(_, _)),
    "q_ivm_minmax" -> (Maintenance.ivmMinMax(_, _)),
    "q_ivm_minmax_stream" -> (Maintenance.ivmMinMaxStreamMaterialize(_, _)),
    "q_ivm_stream" -> (Maintenance.ivmStreamMaterialize(_, _)),
    "q_ivm_topk" -> (Maintenance.ivmTopK(_, _)),
    "q_ivm_topk_stream" -> (Maintenance.ivmTopKStreamMaterialize(_, _)),
    "q_ivm_distinct" -> (Maintenance.ivmDistinct(_, _)),
    "q_scd2_history" -> (Maintenance.scd2History(_, _)),
    "q_scd2_asof" -> (Maintenance.scd2AsOf(_, _)),
    "q_scd2_stream" -> (Maintenance.scd2StreamMaterialize(_, _)),
    "q_skyline" -> ((s, d) => graft.ops.Skyline.skyline(s, d)),
    "q_skyline_grouped" -> ((s, d) => graft.ops.Skyline.skylineByBrand(s, d)),
    "q_forget_index" -> ((s, d) => graft.ops.Forget.forgetIndex(s, d)),
    "q_forget_dedup" -> ((s, d) => graft.ops.Forget.forgetDedup(s, d)),
    "q_forget_embed" -> (LlmOps.forgetEmbed(_, _)),
    "q_forget_sigs" -> ((s, d) => graft.ops.Forget.forgetSigs(s, d)),
    "q_forget_winnow" -> ((s, d) => graft.ops.Forget.forgetWinnow(s, d)),
    "q_forget_postings" -> ((s, d) => graft.ops.Forget.forgetPostings(s, d)),
    "q_forget_stream" -> ((s, d) => graft.ops.Forget.forgetStreamMaterialize(s, d)),
    "q_k_anonymity" -> (Curation.kAnonymity(_, _)),
    "q_l_diversity" -> (Curation.lDiversity(_, _)),
    "q_t_closeness" -> (Curation.tCloseness(_, _)),
    "q_dp_randomized_response" -> (Curation.dpRandomizedResponse(_, _)),
    "q_dp_histogram" -> (Curation.dpHistogram(_, _)),
    "q_dp_stream" -> (Curation.dpStreamMaterialize(_, _)),
    "q_dp_threshold" -> (Curation.dpThresholdRelease(_, _)),
    "q_dp_quantile" -> (Curation.dpQuantiles(_, _)),
    "q_sample_stream" -> (Curation.sampleStreamMaterialize(_, _)),
    "q_cdc_stream" -> (Maintenance.cdcStreamMaterialize(_, _)),
    "q_incr_agg" -> (Maintenance.incrAgg(_, _)),
    "q_incr_agg_state" -> (Maintenance.incrAggState(_, _)),
    "q_zonemap_scan" -> (Maintenance.zonemapScan(_, _)),
    // — curation: per-language gate, training-order shuffle, projection
    "q_quality_stratified" -> (Curation.qualityStratifiedGate(_, _)),
    "q_shuffle_batches" -> ((s, d) => Curation.shuffleBatches(s, d)),
    "q_shard_manifest" -> ((s, d) => Curation.shardManifest(s, d)),
    "q_embed_project" -> ((s, d) => LlmOps.embedProject(s, d)),
    "q_range_bounds" -> (Physical.rangeBounds(_, _)),
    "q_zorder_scan" -> (Maintenance.zorderScan(_, _)),
    "q_dedup_span_removal" -> ((s, d) => LlmOps.removeDuplicateSpans(s, d)),
    // — portable sketches, graph stats, weighted sampling
    "q_sketch_hll" -> (SketchOps.sketchHllTokens(_, _)),
    "q_sketch_hll_rollup" -> (SketchOps.sketchHllRollup(_, _)),
    "q_sketch_kmv_overlap" -> (SketchOps.sketchKmvOverlap(_, _)),
    "q_sketch_kmv_setops" -> (SketchOps.sketchKmvSetops(_, _)),
    "q_sketch_qdigest" -> (SketchOps.sketchQdigest(_, _)),
    "q_sketch_kmv" -> (SketchOps.sketchKmvTokens(_, _)),
    "q_sketch_cms" -> (SketchOps.sketchCmsTokens(_, _)),
    "q_sketch_builtin_bounds" -> (SketchOps.sketchBuiltinBounds(_, _)),
    "q_dedup_graph_stats" -> (SketchOps.dedupGraphStats(_, _)),
    "q_dedup_kcore" -> (SketchOps.dedupKcore(_, _)),
    "q_graph_lpa" -> (SketchOps.graphLpa(_, _)),
    "q_graph_bfs" -> (SketchOps.graphBfs(_, _)),
    "q_heavy_hitters" -> (SketchOps.heavyHitters(_, _)),
    "q_heavy_hitters_stream" -> (SketchOps.heavyHittersStreamMaterialize(_, _)),
    "q_sample_weighted" -> (SketchOps.sampleWeighted(_, _)),
    "q_sample_temperature" -> (SketchOps.sampleTemperature(_, _))
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q_orders_by_month" ->
      """SELECT date_trunc('month', o_orderdate) AS order_month,
         count(*) AS number_of_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales_usd,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS average_order_value
         FROM orders GROUP BY 1 ORDER BY 1 DESC""",
    "q_filter_eq" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_orderstatus = 'F' AND o_orderkey < 100""",
    "q_filter_range" ->
      """SELECT o_orderstatus, count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales_usd
         FROM orders WHERE o_orderdate >= '1998-06-01' GROUP BY o_orderstatus""",
    "q_like_groupall" ->
      """SELECT o_orderpriority AS category,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales_usd
         FROM orders WHERE o_orderpriority LIKE '%HIGH%'
         AND CAST(date_part('year', o_orderdate) AS VARCHAR) LIKE '19%'
         GROUP BY ALL""",
    "q_distinct_category" ->
      "SELECT o_orderpriority AS category FROM orders GROUP BY o_orderpriority",
    "q_limit_preview" ->
      "SELECT * FROM region ORDER BY r_regionkey LIMIT 10",
    "q_union_all" ->
      "SELECT 1 AS id UNION ALL SELECT NULL AS id",
    "q_sql_recursive" -> Analytics.sqlRecursiveSql,
    "q_sql_pivot" -> Analytics.sqlPivotSql,
    "q_sql_unpivot" -> Analytics.sqlUnpivotSql,
    "q_corr_matrix" -> Analytics.corrMatrixSql,
    "q_sql_ordinal" ->
      """SELECT date_trunc('month', o_orderdate) AS order_month,
         count(*) AS number_of_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales_usd
         FROM orders GROUP BY 1 ORDER BY 1 DESC""",
    "q_sql_groupby_all" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
         FROM orders GROUP BY ALL""",
    "q_sql_params" ->
      """SELECT o_orderpriority AS category,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales_usd
         FROM orders WHERE o_orderpriority LIKE '%HIGH%'
         AND CAST(date_part('year', o_orderdate) AS VARCHAR) LIKE '19%'
         GROUP BY ALL ORDER BY sales_usd DESC""",
    "q_sql_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",
    "q_sql_setops_all" -> Analytics.setOpsAllSql,
    "q_sql_setops" ->
      """SELECT o_orderpriority, 'both' AS op FROM (
           SELECT o_orderpriority FROM orders
           WHERE o_orderdate BETWEEN '1995-01-01' AND '1995-06-30'
           INTERSECT
           SELECT o_orderpriority FROM orders
           WHERE o_orderdate BETWEEN '1995-07-01' AND '1995-12-31')
         UNION ALL
         SELECT o_orderpriority, 'h1_only' AS op FROM (
           SELECT o_orderpriority FROM orders
           WHERE o_orderdate BETWEEN '1995-01-01' AND '1995-06-30'
           EXCEPT
           SELECT o_orderpriority FROM orders
           WHERE o_orderdate BETWEEN '1995-07-01' AND '1995-12-31')""",
    "q_window_running" ->
      """WITH monthly AS (
           SELECT o_orderstatus, date_trunc('month', o_orderdate) AS month,
             count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales
           FROM orders GROUP BY 1, 2)
         SELECT o_orderstatus, month, n,
           CAST(sum(n) OVER (PARTITION BY o_orderstatus ORDER BY month
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_n,
           round(avg(sales) OVER (PARTITION BY o_orderstatus ORDER BY month
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS sales_ma3
         FROM monthly""",
    "q_join_nation_region" ->
      """SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations
         FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name""",
    "q_join_orders_lineitem" ->
      """SELECT o_orderpriority,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderpriority""",
    "q_join_5way" ->
      """SELECT n_name, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM customer, orders, lineitem, supplier, nation, region
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
           AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
           AND n_regionkey = r_regionkey AND r_name = 'ASIA'
           AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
         GROUP BY n_name""",
    "q_join_semi_anti" ->
      """SELECT c_custkey FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
           AND o.o_orderdate >= DATE '1995-01-01' AND o.o_orderdate < DATE '1996-01-01')
         AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
           AND o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1997-01-01')""",
    "q_join_bloom_prune" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n_items
         FROM lineitem l
         WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
           AND o.o_orderpriority = '1-URGENT')
         GROUP BY 1""",
    "q_window_topk" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
           FROM orders) WHERE rk <= 3""",
    "q_percentiles" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.25) AS q25,
         quantile_cont(l_quantity, 0.5) AS median,
         quantile_cont(l_quantity, 0.75) AS q75
         FROM lineitem GROUP BY l_returnflag""",
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
           SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax
           FROM lineitem)
         UNPIVOT INCLUDE NULLS (value FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))""",
    "q_pivot" ->
      """SELECT l_orderkey, l_linenumber,
         max(CASE WHEN metric = 'l_quantity' THEN value END) AS l_quantity,
         max(CASE WHEN metric = 'l_extendedprice' THEN value END) AS l_extendedprice,
         max(CASE WHEN metric = 'l_discount' THEN value END) AS l_discount,
         max(CASE WHEN metric = 'l_tax' THEN value END) AS l_tax
         FROM (
           SELECT l_orderkey, l_linenumber, metric, value FROM (
             SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax
             FROM lineitem)
           UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax)))
         GROUP BY l_orderkey, l_linenumber""",
    "q_split_cod" ->
      """SELECT p_partkey,
         regexp_extract(cod_full, '^(.*)_([^_]*)$', 1) AS metric,
         regexp_replace(regexp_extract(cod_full, '^(.*)_([^_]*)$', 2), 'cod', '') AS cod
         FROM (SELECT p_partkey,
           'valeurfonc_sum_cod' || CAST(p_partkey % 10 AS VARCHAR) AS cod_full FROM part)""",
    "q_uid_sha2" ->
      """SELECT n_nationkey,
         sha256(CAST(n_nationkey AS VARCHAR) || n_name) AS uid FROM nation""",
    "q_dv3f_pipeline" -> Dv3fOracle.pipelineSql,
    "q_dv3f_source" -> Dv3fOracle.pipelineSql,
    "q_dv3f_agg_pushdown" -> Dv3fOracle.aggPushdownSql,
    "q_csv_scan" -> Connectors.csvScanSql,
    "q_jdbc_scan" -> Connectors.jdbcScanSql,
    "q_dbf_scan" -> Connectors.dbfScanSql,
    "q_dbf_lookup_join" -> Connectors.dbfLookupJoinSql,
    "q_orc_scan" -> Connectors.orcScanSql,
    "q_xml_scan" -> Connectors.xmlScanSql,
    "q_json_scan" -> Connectors.jsonScanSql,
    "q_binaryfile_scan" -> Connectors.binaryFilesScanSql,
    "q_avro_scan" -> Connectors.avroScanSql,
    "q_text_scan" -> Connectors.textScanSql,
    "q_skew_salted_agg" -> Physical.saltedAggSql,
    "q_skew_salted_join" -> Physical.saltedJoinSql,
    "q_layout_pruned_scan" -> Physical.partitionPrunedScanSql,
    "q_bucketed_join" -> Physical.bucketedJoinSql,
    "q_shipping_priority" -> Analytics.shippingPrioritySql,
    "q_sql_cube" -> Analytics.cubeCountsSql,
    "q_sql_grouping_sets" -> Analytics.groupingSetsCountsSql,
    "q_string_agg" -> Analytics.stringAggStatusesSql,
    "q_window_nav" -> Analytics.windowNavigationSql,
    "q_join_full_outer" -> Analytics.fullOuterActivitySql,
    "q_sql_correlated" -> Analytics.sqlCorrelatedSql,
    "q_sql_lateral" -> Analytics.sqlLateralSql,
    "q_window_ignore_nulls" -> Analytics.windowIgnoreNullsSql,
    "q_fuzzy_match" -> Analytics.fuzzyPartNamesSql,
    "q_quality_accepted" ->
      """SELECT count(*) AS violations,
           coalesce(min(o_orderstatus), '') AS first_bad
         FROM orders WHERE o_orderstatus IS NOT NULL
           AND o_orderstatus NOT IN ('O', 'F', 'P')""",
    "q_quality_accepted_report" ->
      """SELECT o_orderpriority AS bad_value, count(*) AS violations
         FROM orders WHERE o_orderpriority IS NOT NULL
           AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
         GROUP BY 1 ORDER BY 1""",
    "q_quality_relationship" ->
      """SELECT count(*) AS violations FROM lineitem l
         WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS (
           SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)""",
    "q_quality_unique" ->
      """SELECT count(*) AS violations FROM (
           SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)""",
    "q_quality_notnull" ->
      "SELECT CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM orders",
    "q_profile" -> Seq("o_orderstatus", "o_orderpriority", "o_custkey").map(c =>
      s"""SELECT '$c' AS "column", count(*) AS n,
          count(*) - count($c) AS n_null,
          count(DISTINCT $c) AS n_distinct,
          min($c)::VARCHAR AS min_value, max($c)::VARCHAR AS max_value
          FROM orders""").mkString(" UNION ALL "),
    "q_dedup_exact" -> LlmOps.dedupExactSql,
    "q_dedup_minhash_lsh" -> LlmOps.minhashLshSql,
    "q_dedup_cc" -> LlmOps.dedupClustersSql,
    "q_dedup_survivors" -> LlmOps.dedupSurvivorsSql,
    "q_dedup_survivors_best" -> LlmOps.dedupSurvivorsBestSql,
    "q_curation_report" -> LlmOps.curationReportSql,
    "q_dedup_cc_incr" -> LlmOps.dedupClustersIncrSql,
    "q_dedup_simhash_pairs" -> LlmOps.simhashPairsSql,
    "q_corpus_clean" -> LlmOps.corpusCleanSql,
    "q_prepare_corpus" -> LlmOps.prepareCorpusSql,
    "q_dedup_spans" -> LlmOps.duplicateSpansSql,
    "q_dedup_longest_span" -> LlmOps.dedupLongestSpanSql,
    "q_blocklist_scan" -> LlmOps.blocklistScanSql,
    "q_blocklist_mask" -> LlmOps.blocklistMaskSql,
    "q_blocklist_stream" -> LlmOps.blocklistMaskSql,
    "q_dedup_doc_coverage" -> LlmOps.dedupDocCoverageSql,
    "q_dedup_suffix_span" -> LlmOps.dedupSuffixSpanSql,
    "q_para_dedup" -> LlmOps.paraDedupSql,
    // bloom prefilter is semantically invisible: same oracle as q_para_dedup
    "q_para_dedup_bloom" -> LlmOps.paraDedupSql,
    "q_para_dedup_incr" -> LlmOps.paraDedupIncrSql,
    "q_para_dedup_stream" -> LlmOps.paraDedupStreamSql,
    "q_decontaminate" -> LlmOps.decontaminateSql,
    "q_decontaminate_bloom" -> LlmOps.decontaminateBloomSql,
    "q_dedup_incr_exact" -> LlmOps.dedupIncrementalExactSql,
    "q_dedup_incr_lsh" -> LlmOps.dedupIncrementalLshSql,
    "q_ingest_gate_e2e" -> LlmOps.ingestGateE2eSql,
    "q_vocab_topk" -> LlmOps.vocabTopKSql,
    "q_tfidf_keywords" -> LlmOps.tfidfKeywordsSql(),
    "q_ssjoin_ppjoin" -> LlmOps.ssjoinPpjoinSql,
    "q_ssjoin_incr" -> LlmOps.ssjoinIncrSql,
    "q_ssjoin_stream" -> LlmOps.ssjoinStreamSql,
    "q_lsh_tune" -> LlmOps.lshParamSweepSql,
    "q_lsh_fitted_dedup" -> LlmOps.lshFittedDedupSql(),
    "q_vocab_richness" -> LlmOps.vocabRichnessSql,
    "q_source_novelty" -> LlmOps.sourceNoveltySql,
    "q_dedup_bbit_est" -> LlmOps.bbitMinhashEstimateSql,
    "q_bpe_pairs" -> LlmOps.bpePairCountsSql,
    "q_bpe_merges" -> graft.ops.Bpe.mergesSql(),
    "q_bpe_bytes" -> graft.ops.Bpe.mergesBytesSql(),
    "q_bpe_bytes_encode" -> graft.ops.Bpe.encodeBytesSql(),
    "q_bpe_encode" -> graft.ops.Bpe.encodeSql(),
    "q_wordpiece_vocab" -> graft.ops.WordPiece.vocabSql(),
    "q_wordpiece_encode" -> graft.ops.WordPiece.encodeSql(),
    "q_wordpiece_ids" -> graft.ops.WordPiece.idsSql(),
    "q_minpiece_encode" -> graft.ops.WordPiece.minEncodeSql(),
    "q_unigram_fit" -> graft.ops.Unigram.fitSql(),
    "q_unigram_encode" -> graft.ops.Unigram.encodeSql,
    "q_unigram_bakeoff" -> graft.ops.Unigram.bakeoffSql,
    "q_token_blocks" -> graft.ops.WordPiece.blocksSql(),
    "q_block_provenance" -> graft.ops.WordPiece.blockProvenanceSql(),
    "q_block_decontam" -> graft.ops.WordPiece.blockDecontamSql,
    "q_trgm_like_scan" -> graft.ops.TrigramIndex.likeScanSql,
    "q_trgm_like_incr" -> graft.ops.TrigramIndex.likeScanSql,
    "q_phrase_search" -> graft.ops.InvertedIndex.phraseSearchSql(),
    "q_phrase_search_incr" -> graft.ops.InvertedIndex.phraseSearchSql(),
    "q_index_stats" -> graft.ops.InvertedIndex.indexStatsSql,
    "q_span_corruption" -> Curation.spanCorruptionSql,
    "q_budget_select" -> Curation.budgetSelectSql,
    "q_pref_pairs" -> Curation.prefPairsSql,
    "q_sft_examples" -> Curation.sftExamplesSql,
    "q_session_transcript" -> Events.sessionTranscriptSql,
    "q_collocations" -> LlmOps.collocationsSql,
    "q_lang_diversity" -> LlmOps.langDiversitySql,
    "q_langid_nb" -> LlmOps.langIdNbSql(),
    "q_code_switch" -> LlmOps.codeSwitchSql(),
    "q_code_switch_split" -> LlmOps.codeSwitchSplitSql(),
    "q_token_drift" -> LlmOps.tokenDriftSql,
    "q_vocab_overlap" -> LlmOps.vocabOverlapSql,
    "q_bm25_topk" -> LlmOps.bm25TopKSql,
    "q_hard_negatives" -> LlmOps.hardNegativesSql,
    "q_retrieval_mrr" -> LlmOps.retrievalMrrSql(),
    "q_rm3_topk" -> LlmOps.rm3TopKSql(),
    "q_hybrid_rrf" -> LlmOps.hybridRrfSql,
    "q_embed_ann_ivf" -> LlmOps.embedAnnIvfSql,
    "q_embed_recall" -> LlmOps.embedRecallEvalSql(),
    "q_embed_recall_budget" -> LlmOps.embedRecallBudgetSql(),
    "q_embed_drift" -> LlmOps.embedDriftSql,
    "q_embed_ivf_sq8" -> LlmOps.embedIvfSq8Sql,
    "q_embed_mmr" -> LlmOps.embedMmrSql(),
    // the persisted-index path must return byte-identical results to the
    // in-memory assignment path — same oracle
    "q_embed_ann_ivf_indexed" -> LlmOps.embedAnnIvfSql,
    // append ≡ rebuild is the incremental face's correctness contract:
    // the appended index holds the identical row set, so the oracle is
    // the same full-corpus IVF replay
    "q_embed_ivf_append" -> LlmOps.embedAnnIvfSql,
    "q_embed_ivf_sq8_append" -> LlmOps.embedIvfSq8Sql,
    "q_embed_ivfpq_append" -> LlmOps.embedIvfPqSql,
    "q_dedup_semantic" -> LlmOps.semanticDedupSql,
    "q_sample_cluster_balanced" -> LlmOps.sampleClusterBalancedSql,
    "q_dedup_minhash" -> LlmOps.minhashSql,
    "q_dedup_ngram_jaccard" -> LlmOps.ngramJaccardSql,
    "q_dedup_containment" -> LlmOps.ngramContainmentSql,
    "q_chunk_cdc_dedup" -> LlmOps.cdcChunkDedupSql,
    "q_dedup_simhash" -> LlmOps.simhashSql,
    "q_text_stats" -> LlmOps.textStatsSql,
    "q_text_repetition" -> LlmOps.textRepetitionSql,
    "q_quality_gopher" -> LlmOps.gopherQualitySql,
    "q_quality_classifier" -> LlmOps.qualityClassifierSql,
    "q_unigram_lm" -> LlmOps.unigramLmTopKSql,
    "q_bigram_lm" -> LlmOps.bigramLmTopKSql,
    "q_kn_bigram" -> LlmOps.knBigramTopKSql,
    "q_ppl_buckets" -> LlmOps.pplBucketsSql,
    "q_dsir_sample" -> LlmOps.dsirSampleSql,
    "q_outlier_mad" -> LlmOps.outlierMadSql,
    "q_doc_fingerprints" -> LlmOps.docFingerprintsSql,
    "q_winnow_pairs" -> LlmOps.winnowPairsSql,
    "q_winnow_incr" -> LlmOps.winnowIncrPairsSql,
    "q_events_tumbling" -> Events.tumblingSql,
    "q_events_sliding" -> Events.slidingSql,
    "q_events_sessionize" -> Events.sessionizeSql,
    "q_events_session_window" -> Events.sessionWindowSql,
    "q_events_json" -> Events.jsonPropsSql,
    "q_cdc_merge" -> Maintenance.cdcMergeSql,
    "q_cdc_merge_part" -> Maintenance.cdcMergePartitionedSql,
    "q_time_travel" -> Maintenance.timeTravelSql,
    "q_ivm_aggregate" -> Maintenance.ivmAggregateSql,
    "q_ivm_join" -> Maintenance.ivmJoinSql,
    "q_ivm_join_dim" -> Maintenance.ivmJoinDimSql,
    "q_ivm_minmax" -> Maintenance.ivmMinMaxSql,
    "q_ivm_minmax_stream" -> Maintenance.ivmMinMaxSql,
    "q_ivm_stream" -> Maintenance.ivmAggregateSql,
    "q_ivm_topk" -> Maintenance.ivmTopKSql,
    "q_ivm_topk_stream" -> Maintenance.ivmTopKSql,
    "q_ivm_distinct" -> Maintenance.ivmDistinctSql,
    "q_scd2_history" -> Maintenance.scd2HistorySql,
    "q_scd2_asof" -> Maintenance.scd2AsOfSql,
    "q_scd2_stream" -> Maintenance.scd2HistorySql,
    "q_skyline" -> graft.ops.Skyline.skylineSql,
    "q_skyline_grouped" -> graft.ops.Skyline.skylineByBrandSql,
    "q_forget_index" -> graft.ops.Forget.forgetIndexSql,
    "q_forget_dedup" -> graft.ops.Forget.forgetDedupSql,
    "q_forget_embed" -> LlmOps.embedAnnIvfSqlWhere("NOT (a.vec_id % 23 = 5)"),
    "q_forget_sigs" -> LlmOps.forgetSigsSql,
    "q_forget_winnow" -> LlmOps.forgetWinnowSql,
    "q_forget_postings" -> graft.ops.Forget.forgetPostingsSql,
    "q_forget_stream" -> graft.ops.Forget.forgetStreamSql,
    "q_k_anonymity" -> Curation.kAnonymitySql,
    "q_l_diversity" -> Curation.lDiversitySql,
    "q_t_closeness" -> Curation.tClosenessSql,
    "q_dp_randomized_response" -> Curation.dpRandomizedResponseSql,
    "q_dp_histogram" -> Curation.dpHistogramSql,
    "q_dp_stream" -> Curation.dpStreamSql,
    "q_dp_threshold" -> Curation.dpThresholdReleaseSql,
    "q_dp_quantile" -> Curation.dpQuantilesSql,
    "q_sample_stream" -> Curation.sampleStreamSql,
    "q_cdc_stream" -> Maintenance.cdcStreamMaterializeSql,
    "q_incr_agg" -> Maintenance.incrAggSql,
    "q_incr_agg_state" -> Maintenance.incrAggStateSql,
    "q_zonemap_scan" -> Maintenance.zonemapScanSql,
    "q_quality_stratified" -> Curation.qualityStratifiedGateSql,
    "q_shuffle_batches" -> Curation.shuffleBatchesSql,
    "q_shard_manifest" -> Curation.shardManifestSql,
    "q_embed_project" -> LlmOps.embedProjectSql,
    "q_range_bounds" -> Physical.rangeBoundsSql,
    "q_zorder_scan" -> Maintenance.zorderScanSql,
    "q_dedup_span_removal" -> LlmOps.removeDuplicateSpansSql,
    "q_sketch_hll" -> SketchOps.sketchHllTokensSql,
    "q_sketch_hll_rollup" -> SketchOps.sketchHllRollupSql,
    "q_sketch_kmv_overlap" -> SketchOps.sketchKmvOverlapSql(),
    "q_sketch_kmv_setops" -> SketchOps.sketchKmvSetopsSql(),
    "q_sketch_qdigest" -> SketchOps.sketchQdigestSql,
    "q_sketch_kmv" -> SketchOps.sketchKmvTokensSql,
    "q_sketch_cms" -> SketchOps.sketchCmsTokensSql,
    "q_sketch_builtin_bounds" -> SketchOps.sketchBuiltinBoundsSql,
    "q_dedup_graph_stats" -> SketchOps.dedupGraphStatsSql,
    "q_dedup_kcore" -> SketchOps.dedupKcoreSql,
    "q_graph_lpa" -> SketchOps.graphLpaSql,
    "q_graph_bfs" -> SketchOps.graphBfsSql,
    "q_heavy_hitters" -> SketchOps.heavyHittersSql,
    "q_heavy_hitters_stream" -> SketchOps.heavyHittersSql,
    "q_sample_weighted" -> SketchOps.sampleWeightedSql,
    "q_sample_temperature" -> SketchOps.sampleTemperatureSql,
    "q_embed_topk" -> LlmOps.embedTopKSql,
    "q_embed_topk_i8" -> LlmOps.embedTopKI8Sql,
    "q_embed_pq_topk" -> LlmOps.embedPqTopKSql,
    "q_embed_pq_rerank" -> LlmOps.embedPqRerankSql,
    "q_embed_ivfpq" -> LlmOps.embedIvfPqSql,
    "q_embed_neardup" -> LlmOps.embedNearDupSql,
    "q_embed_margin_pairs" -> LlmOps.embedMarginPairsSql(),
    "q_embed_incr_neardup" -> LlmOps.embedIncrNearDupSql,
    "q_embed_topk_perlabel" -> LlmOps.embedTopKPerLabelSql,
    "q_multimodal_meta" -> LlmOps.multimodalMetaSql,
    "q_multimodal_feat" -> LlmOps.multimodalFeaturesSql,
    "q_multimodal_audio_neardup" -> LlmOps.multimodalAudioNearDupSql,
    "q_multimodal_neardup" -> LlmOps.multimodalNearDupSql,
    "q_multimodal_audio" -> LlmOps.multimodalAudioSql,
    "q_multimodal_video" -> LlmOps.multimodalVideoSql,
    "q_multimodal_video_neardup" -> LlmOps.multimodalVideoNearDupSql,
    "q_kmeans_step" -> LlmOps.kmeansStepSql,
    "q_sample_hash" -> Curation.sampleHashSql,
    "q_train_test_split" -> Curation.trainTestSplitSql,
    "q_split_leakage_safe" -> Curation.splitLeakageSafeSql,
    "q_sample_stratified" -> Curation.sampleStratifiedSql,
    "q_text_pii" -> Curation.piiMaskSql,
    "q_chunk_docs" -> Curation.chunkDocsSql,
    "q_chunk_docs_gen" -> Curation.chunkDocsSql,
    "q_pack_sequences" -> Curation.packSequencesSql,
    "q_pack_sequences_sharded" -> Curation.packSequencesShardedSql,
    "q_corpus_mix" -> Curation.corpusMixSql,
    "q_window_ranking" -> Analytics.rankingFamilySql,
    "q_window_range_7d" -> Events.rolling7dSql,
    "q_funnel" -> Events.funnelSql,
    "q_cohort_retention" -> Events.cohortRetentionSql,
    "q_engagement_coverage" -> Events.engagementCoverageSql,
    "q_event_transitions" -> Events.eventTransitionsSql,
    "q_attribution" -> Events.lastTouchAttributionSql,
    "q_attribution_linear" -> Events.linearAttributionSql,
    "q_attribution_stream" -> Events.lastTouchAttributionSql,
    "q_trend_slope" -> Events.trendSlopeSql,
    "q_anomaly_days" -> Events.anomalyDaysSql,
    "q_ewma_daily" -> Events.ewmaDailySql,
    "q_regression_multi" -> Events.regressionMultiSql,
    "q_theil_sen" -> Events.theilSenSlopeSql,
    "q_event_paths" -> Events.eventPathsSql,
    "q_pagerank" -> LlmOps.pagerankTopKSql,
    "q_pagerank_ppr" -> LlmOps.pagerankPersonalizedSql,
    "q_textrank" -> LlmOps.textrankSql(),
    "q_asof_join" -> Events.asofPurchaseSql,
    "q_asof_join_native" -> Events.asofPurchaseSql,
    "q_asof_join_forward" -> Events.asofNextPurchaseSql,
    "q_range_join_sessions" -> Events.eventSessionAssignSql,
    "q_resample_1d" -> Events.resampleDailySql,
    "q_histogram" ->
      """SELECT CAST(floor(l_extendedprice/1000)*1000 AS BIGINT) AS bucket_lo,
         count(*) AS n FROM lineitem GROUP BY 1"""
  )
}
