package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory: one entry per implemented operator
  * from SURVEY.md §2; `oracleSql` holds the DuckDB-equivalent SQL for every
  * SQL-expressible query (same column names, bit-exact numerics — see
  * [[graft.queries.Exact]]).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q.Relational.q1Agg _),
    // reference declaration surface (SURVEY §2.1)
    "c1_projection" -> (q.CoreSurface.projection _),
    "c4_order_page" -> (q.CoreSurface.orderPage _),
    "c6_hidden_sort" -> (q.CoreSurface.hiddenSort _),
    "c8_dynamic_filter" -> (q.CoreSurface.dynamicFilter _),
    "c9_poly_derive" -> (q.CoreSurface.polyDerive _),
    "c18_default_value" -> (q.CoreSurface.defaultValue _),
    "c7_json_request" -> (q.CoreSurface.jsonRequest _),
    "c19_xlsx_roundtrip" -> (q.CoreSurface.xlsxRoundtrip _),
    // relational core (SURVEY §2.2), Spark-native
    "r_udaf_wavg" -> (q.Relational.udafWavg _),
    "r_json_extract" -> (q.Relational.jsonExtract _),
    "r_having" -> (q.Relational.havingAgg _),
    "r_asof_join" -> (q.Relational.asofJoin _),
    "r_range_join" -> (q.Relational.rangeJoin _),
    "r_percentiles" -> (q.Relational.percentiles _),
    "r_percentiles_approx" -> (q.Relational.percentilesApprox _),
    "r_explode_tokens" -> (q.Relational.explodeTokens _),
    "r_pivot" -> (q.Relational.pivotAgg _),
    "r_unpivot" -> (q.Relational.unpivotMetrics _),
    "r_sql_correlated" -> (q.Relational.sqlCorrelated _),
    "r_recursive_cte" -> (q.Relational.recursiveCte _),
    "r_join_broadcast" -> (q.Relational.joinBroadcast _),
    "r_q5_multijoin" -> (q.Relational.q5Multijoin _),
    "r_semi_join" -> (q.Relational.semiJoin _),
    "r_anti_join" -> (q.Relational.antiJoin _),
    "r_rollup_stats" -> (q.Relational.rollupStats _),
    "r_grouping_sets" -> (q.Relational.groupingSetsStats _),
    "r_distinct_agg" -> (q.Relational.distinctAgg _),
    "r_approx_distinct" -> (q.Relational.approxDistinct _),
    "r_sketch_merge" -> (q.Relational.sketchMerge _),
    "r_window_rank" -> (q.Relational.windowRank _),
    "r_window_dist" -> (q.Relational.windowDist _),
    "r_datetime_funcs" -> (q.Relational.datetimeFuncs _),
    "r_expectations" -> (q.Relational.expectations _),
    "r_outliers" -> (q.Relational.outliers _),
    "r_window_running" -> (q.Relational.windowRunning _),
    "r_window_range" -> (q.Relational.windowRange _),
    "r_topk" -> (q.Relational.topK _),
    "r_set_ops" -> (q.Relational.setOps _),
    "r_dynamic_stats" -> (q.Relational.dynamicStats _),
    "r_scalar_funcs" -> (q.Relational.scalarFuncs _),
    "r_events_window" -> (q.Relational.eventsWindow _),
    "r_sessionize" -> (q.Relational.sessionize _),
    "r_funnel" -> (q.Relational.funnel _),
    "r_cohort_retention" -> (q.Relational.cohortRetention _),
    "r_gap_fill" -> (q.Relational.gapFill _),
    "r_zorder_layout" -> (q.Relational.zorderLayout _),
    "r_events_partitioned" -> (q.Relational.eventsPartitioned _),
    // LLM-pipeline operators (SURVEY §2.3 north-star)
    "d_text_stats" -> (q.LlmOps.textStats _),
    "d_profile" -> (q.LlmOps.profileDocs _),
    "d_lang_id" -> (q.LlmOps.langId _),
    "d_lang_id_ngram" -> (q.LlmOps.langIdNgram _),
    "d_quality_repetition" -> (q.LlmOps.qualityRepetition _),
    "d_quality_gopher" -> (q.LlmOps.qualityGopher _),
    "d_dedup_exact" -> (q.LlmOps.dedupExact _),
    "d_line_dedup" -> (q.LlmOps.lineDedup _),
    "d_ngram_jaccard" -> (q.LlmOps.ngramJaccard _),
    "d_edit_distance" -> (q.LlmOps.editDistance _),
    "d_edit_clusters" -> (q.LlmOps.editClusters _),
    "d_dedup_minhash" -> (q.LlmOps.dedupMinhash _),
    "d_dedup_simhash" -> (q.LlmOps.dedupSimhash _),
    "d_dedup_clusters" -> (q.LlmOps.dedupClusters _),
    "d_dedup_clusters_reliable" -> (q.LlmOps.dedupClustersReliable _),
    "d_cluster_keep_best" -> (q.LlmOps.dedupClustersKeepBest _),
    "d_decontaminate" -> (q.LlmOps.decontaminate _),
    "d_decontaminate_spans" -> (q.LlmOps.decontaminateSpans _),
    "d_decontaminate_strip" -> (q.LlmOps.decontaminateStrip _),
    "d_decontaminate_fuzzy" -> (q.LlmOps.decontaminateFuzzy _),
    "d_importance_sample" -> (q.LlmOps.importanceSample _),
    "d_importance_resample" -> (q.LlmOps.importanceResample _),
    "d_pii_scan" -> (q.LlmOps.piiScan _),
    "d_repeated_spans" -> (q.LlmOps.repeatedSpans _),
    "d_strip_spans" -> (q.LlmOps.stripSpans _),
    "d_span_dedup_keep_one" -> (q.LlmOps.spanDedupKeepOne _),
    "d_vocab_coverage" -> (q.LlmOps.vocabCoverage _),
    "d_heavy_hitters" -> (q.LlmOps.heavyHitters _),
    "d_text_normalize" -> (q.LlmOps.textNormalize _),
    "d_html_extract" -> (q.LlmOps.htmlExtract _),
    "d_url_canonicalize" -> (q.LlmOps.urlCanonicalize _),
    "d_compact_small_files" -> (q.LlmOps.compactSmallFiles _),
    "d_host_report" -> (q.LlmOps.hostReport _),
    "d_fingerprints" -> (q.LlmOps.fingerprints _),
    "d_embed_neardup" -> (q.LlmOps.embedNearDup _),
    "d_sim_topk_brute" -> (q.LlmOps.simTopKBrute _),
    "d_sim_topk_ivf" -> (q.LlmOps.simTopKIvf _),
    "d_sim_topk_ivf_q8" -> (q.LlmOps.simTopKIvfQ8 _),
    "d_sim_topk_pq" -> (q.LlmOps.simTopKPq _),
    "d_sim_topk_ivf_pq" -> (q.LlmOps.simTopKIvfPq _),
    "d_ann_pq_rerank" -> (q.LlmOps.annPqRerank _),
    "d_ann_batch" -> (q.LlmOps.annBatch _),
    "d_ann_append" -> (q.LlmOps.annAppend _),
    "d_ann_delete" -> (q.LlmOps.annDelete _),
    "d_incremental_day" -> (q.LlmOps.incrementalDay _),
    "d_incremental_day_versioned" -> (q.LlmOps.incrementalDayVersioned _),
    "d_knn_join" -> (q.LlmOps.knnJoin _),
    "d_multimodal" -> (q.LlmOps.multimodal _),
    "d_multimodal_png" -> (q.LlmOps.multimodalPng _),
    "d_multimodal_jpeg" -> (q.LlmOps.multimodalJpeg _),
    "d_multimodal_flac" -> (q.LlmOps.multimodalFlac _),
    "d_media_parity" -> (q.LlmOps.mediaParity _),
    "d_warc_roundtrip" -> (q.LlmOps.warcRoundtrip _),
    "d_warc_mixed" -> (q.LlmOps.warcMixed _),
    "d_unicode_normalize" -> (q.LlmOps.unicodeNormalize _),
    "d_curation_reasons" -> (q.LlmOps.curationReasons _),
    "d_warc_ingest" -> (q.LlmOps.warcIngest _),
    "d_schema_evolution" -> (q.LlmOps.schemaEvolution _),
    "d_source_overlap" -> (q.LlmOps.sourceOverlap _),
    "d_curation_pipeline" -> (q.LlmOps.curationPipeline _),
    "d_curation_observed" -> (q.LlmOps.curationObserved _),
    "d_json_quarantine" -> (q.LlmOps.jsonQuarantine _),
    "d_format_matrix" -> (q.LlmOps.formatMatrix _),
    "d_corpus_export" -> (q.LlmOps.corpusExport _),
    "d_corpus_apply_delta" -> (q.LlmOps.corpusApplyDelta _),
    "d_corpus_time_travel" -> (q.LlmOps.corpusTimeTravel _),
    "d_corpus_changes" -> (q.LlmOps.corpusChanges _),
    "d_corpus_stats_prune" -> (q.LlmOps.corpusStatsPrune _),
    "d_corpus_branch_merge" -> (q.LlmOps.corpusBranchMerge _),
    "d_corpus_incr_agg" -> (q.LlmOps.corpusIncrAgg _),
    "d_corpus_dv" -> (q.LlmOps.corpusDv _),
    "d_corpus_concurrent" -> (q.LlmOps.corpusConcurrent _),
    "d_corpus_merge_into" -> (q.LlmOps.corpusMergeInto _),
    "d_corpus_restore" -> (q.LlmOps.corpusRestore _),
    "d_corpus_maintain" -> (q.LlmOps.corpusMaintain _),
    "d_corpus_docindex" -> (q.LlmOps.corpusDocIndex _),
    "d_corpus_sql_read" -> (q.LlmOps.corpusSqlRead _),
    "d_corpus_sql_write" -> (q.LlmOps.corpusSqlWrite _),
    "d_corpus_sql_delete" -> (q.LlmOps.corpusSqlDelete _),
    "d_corpus_sql_cdf" -> (q.LlmOps.corpusSqlCdf _),
    "d_corpus_vacuum_time" -> (q.LlmOps.corpusVacuumTime _),
    "d_view_ndv" -> (q.LlmOps.viewNdvIncr _),
    "d_view_ndv_remove" -> (q.LlmOps.viewNdvRemove _),
    "d_corpus_read_asof" -> (q.LlmOps.corpusReadAsOf _),
    "d_train_split" -> (q.LlmOps.trainSplit _),
    "d_tfidf_topterms" -> (q.LlmOps.tfidfTopTerms _),
    "d_sample_stratified" -> (q.LlmOps.sampleStratified _),
    "d_source_cap" -> (q.LlmOps.sourceCap _),
    "d_quality_calibrate" -> (q.LlmOps.qualityCalibrate _),
    "d_mixture_rebalance" -> (q.LlmOps.mixtureRebalance _),
    "d_topic_rebalance" -> (q.LlmOps.topicRebalance _),
    "d_pack_sequences" -> (q.LlmOps.packSequences _),
    "d_dedup_incremental" -> (q.LlmOps.dedupIncremental _),
    "d_dedup_bloom" -> (q.LlmOps.dedupBloom _),
    "d_neardup_incremental" -> (q.LlmOps.nearDupIncremental _),
    "d_doc_vector_search" -> (q.LlmOps.docVectorSearch _),
    "d_bm25_search" -> (q.LlmOps.bm25Search _),
    "d_hybrid_search" -> (q.LlmOps.hybridSearch _),
    "d_semantic_dedup" -> (q.LlmOps.semanticDedup _),
    "d_cluster_report" -> (q.LlmOps.clusterReport _),
    "d_quality_probe" -> (q.LlmOps.qualityProbe _),
    "d_source_report" -> (q.LlmOps.sourceReport _),
    "d_corpus_diff" -> (q.LlmOps.corpusDiff _),
    "d_embed_quantize" -> (q.LlmOps.embedQuantize _),
    "d_embed_pca" -> (q.LlmOps.embedPca _),
    "d_sim_topk_pca" -> (q.LlmOps.simTopKPca _),
    "d_sim_topk_pca_load" -> (q.LlmOps.simTopKPcaLoad _),
    "d_sim_topk_pca_serve" -> (q.LlmOps.simTopKPcaServe _),
    "d_bpe_train" -> (q.LlmOps.bpeTrain _),
    "d_bpe_tokenize" -> (q.LlmOps.bpeTokenize _),
    "d_bpe_tokenize_load" -> (q.LlmOps.bpeTokenizeLoad _),
    "d_bpe_tokenize_serve" -> (q.LlmOps.bpeTokenizeServe _),
    "d_lm_score" -> (q.LlmOps.lmScore _),
    "d_chunk_windows" -> (q.LlmOps.chunkWindows _),
    "d_graph_pagerank" -> (q.LlmOps.graphPagerank _),
    "d_graph_bfs" -> (q.LlmOps.graphBfs _),
    // structured streaming (run synchronously through the memory sink)
    "s_stream_window" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.windowedCountsSync(s, dir)),
    "s_stream_sessionize" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.sessionizeSync(s, dir)),
    "s_stream_session_window" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.sessionWindowSync(s, dir)),
    "s_stream_dedup" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.dedupSync(s, dir)),
    "s_stream_quality" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.curationFilterSync(s, dir)),
    "s_stream_media" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.mediaDecodeSync(s, dir)),
    "s_stream_ingest" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.nearDupIngestSync(s, dir)),
    "s_stream_bloom_ingest" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.bloomIngestSync(s, dir)),
    "s_stream_snapshot_ingest" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.snapshotIngestSync(s, dir)),
    "s_stream_snapshot_changes" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.snapshotChangesSync(s, dir)),
    "s_stream_sql_changes" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.snapshotSqlChangesSync(s, dir)),
    "s_stream_incr_agg" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.incrAggSync(s, dir)),
    "s_stream_probe" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.probeScoreSync(s, dir)),
    "s_stream_join" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.attributionJoinSync(s, dir)),
    "s_stream_join_outer" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.attributionJoinOuterSync(s, dir)),
    "s_stream_join_full" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.attributionJoinFullSync(s, dir)),
    "s_stream_ann_ingest" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.annIngestSync(s, dir)),
    "s_stream_funnel" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.funnelSync(s, dir)),
    "s_stream_line_filter" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.lineFilterSync(s, dir)),
    "s_stream_day_layout" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.dayLayoutSync(s, dir)),
    "s_stream_decontam" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.decontamSync(s, dir)),
    "s_stream_jdbc_sink" -> ((s: SparkSession, dir: String) =>
      streaming.EventPipeline.jdbcSinkSync(s, dir)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** The CDC tail of the store: v1 bootstrap adds (%3 slice), v2 adds
    * (the rest), v3 takedown removes (%7) — replayed closed-form.
    * Shared VERBATIM by the foreachBatch door
    * (`s_stream_snapshot_changes`) and the DSv2 streaming front door
    * (`s_stream_sql_changes`): both must emit the identical feed. */
  private val snapshotChangesOracle: String =
    """WITH d AS (
      |  SELECT doc_id, 's' || CAST(doc_id % 4 AS VARCHAR) AS split
      |  FROM documents),
      |ch AS (
      |  SELECT 'v1' AS version, 'add' AS change, split, doc_id FROM d
      |  WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT 'v2', 'add', split, doc_id FROM d WHERE doc_id % 3 <> 0
      |  UNION ALL
      |  SELECT 'v3', 'remove', split, doc_id FROM d WHERE doc_id % 7 = 0)
      |SELECT version, change, split, COUNT(*) AS n_docs,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
      |FROM ch GROUP BY version, change, split""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> q.Relational.q1AggSql,
    "c1_projection" -> q.CoreSurface.projectionSql,
    "c4_order_page" -> q.CoreSurface.orderPageSql,
    "c6_hidden_sort" -> q.CoreSurface.hiddenSortSql,
    "c8_dynamic_filter" -> q.CoreSurface.dynamicFilterSql,
    "c9_poly_derive" -> q.CoreSurface.polyDeriveSql,
    "c18_default_value" -> q.CoreSurface.defaultValueSql,
    "c7_json_request" -> q.CoreSurface.jsonRequestSql,
    "c19_xlsx_roundtrip" -> q.CoreSurface.xlsxRoundtripSql,
    "r_udaf_wavg" -> q.Relational.udafWavgSql,
    "r_json_extract" -> q.Relational.jsonExtractSql,
    "r_having" -> q.Relational.havingAggSql,
    "r_asof_join" -> q.Relational.asofJoinSql,
    "r_range_join" -> q.Relational.rangeJoinSql,
    "r_percentiles" -> q.Relational.percentilesSql,
    // r8: the gate verifies the GK RANK guarantee in-plan (raise_error on
    // violation) and hashes only exact columns + require-backed verdicts;
    // the sketch values live in percentilesApproxValues + SketchSpec
    "r_percentiles_approx" -> q.Relational.percentilesApproxSql,
    "r_explode_tokens" -> q.Relational.explodeTokensSql,
    "r_pivot" -> q.Relational.pivotAggSql,
    "r_unpivot" -> q.Relational.unpivotMetricsSql,
    "r_sql_correlated" -> q.Relational.sqlCorrelatedSql,
    // both engines run the same ANSI recursion and must agree on the fixpoint
    "r_recursive_cte" -> q.Relational.recursiveCteSql,
    "r_join_broadcast" -> q.Relational.joinBroadcastSql,
    "r_q5_multijoin" -> q.Relational.q5MultijoinSql,
    "r_semi_join" -> q.Relational.semiJoinSql,
    "r_anti_join" -> q.Relational.antiJoinSql,
    "r_rollup_stats" -> q.Relational.rollupStatsSql,
    "r_grouping_sets" -> q.Relational.groupingSetsStatsSql,
    "r_distinct_agg" -> q.Relational.distinctAggSql,
    // r8: HLL estimate moved out of the hashed output into
    // approxDistinctFull + SketchSpec; the gate hashes exact counts +
    // a raise_error-backed within_bound ⇒ DuckDB-exact
    "r_approx_distinct" -> q.Relational.approxDistinctSql,
    // mergeable sketch columns: the hashed output is the slice count +
    // exact distinct + raise_error-backed verdict (round-8 discipline)
    "r_sketch_merge" -> q.Relational.sketchMergeSql,
    "r_window_rank" -> q.Relational.windowRankSql,
    "r_window_dist" -> q.Relational.windowDistSql,
    "r_datetime_funcs" -> q.Relational.datetimeFuncsSql,
    "r_expectations" -> q.Relational.expectationsSql,
    "r_outliers" -> q.Relational.outliersSql,
    "r_window_running" -> q.Relational.windowRunningSql,
    "r_window_range" -> q.Relational.windowRangeSql,
    "r_topk" -> q.Relational.topKSql,
    "r_set_ops" -> q.Relational.setOpsSql,
    "r_dynamic_stats" -> q.Relational.dynamicStatsSql,
    "r_scalar_funcs" -> q.Relational.scalarFuncsSql,
    "r_events_window" -> q.Relational.eventsWindowSql,
    "r_sessionize" -> q.Relational.sessionizeSql,
    "r_funnel" -> q.Relational.funnelSql,
    // stream ≡ batch: in-order greedy stage choice equals the batch MIN
    // choice, and the sync gate's sentinels flush every in-flight user
    "s_stream_funnel" -> q.Relational.funnelSql,
    "r_cohort_retention" -> q.Relational.cohortRetentionSql,
    "r_gap_fill" -> q.Relational.gapFillSql,
    "r_zorder_layout" -> q.Relational.zorderLayoutSql,
    // partition pruning is an execution strategy: the oracle replays the
    // date-window probe as a plain filter over the flat events table
    "r_events_partitioned" -> q.Relational.eventsPartitionedSql,
    // the STREAMED layout holds the same rows day-partitioned (file-sink
    // exactly-once), so the streamed probe shares the batch gate's oracle
    "s_stream_day_layout" -> q.Relational.eventsPartitionedSql,
    // the sunk table must equal the source exactly — the gate replays
    // batch 0 through the commit path, so a broken exactly-once ledger
    // doubles every count here
    "s_stream_jdbc_sink" -> q.Relational.streamJdbcSinkSql,
    "d_text_stats" -> q.LlmOps.textStatsSql,
    "d_profile" -> q.LlmOps.profileDocsSql,
    "d_lang_id" -> q.LlmOps.langIdSql,
    "d_lang_id_ngram" -> q.LlmOps.langIdNgramSql,
    "d_quality_repetition" -> q.LlmOps.qualityRepetitionSql,
    "d_quality_gopher" -> q.LlmOps.qualityGopherSql,
    "d_dedup_exact" -> q.LlmOps.dedupExactSql,
    "d_line_dedup" -> q.LlmOps.lineDedupSql,
    // per-doc decisions vs the STATIC boilerplate set ⇒ stream ≡ batch
    "s_stream_line_filter" -> q.LlmOps.streamLineFilterSql,
    "d_ngram_jaccard" -> q.LlmOps.ngramJaccardSql,
    "d_edit_distance" -> q.LlmOps.editDistanceSql,
    "d_edit_clusters" -> q.LlmOps.editClustersSql,
    // float/hash-exact SQL twins (sequential double folds + HUGEINT FNV-1a
    // replicate the JVM kernels bitwise — see LlmOps oracle section)
    "d_fingerprints" -> q.LlmOps.fingerprintsSql,
    "d_sim_topk_brute" -> q.LlmOps.simTopKBruteSql,
    "d_sim_topk_ivf" -> q.LlmOps.simTopKIvfSql,
    "d_sim_topk_ivf_q8" -> q.LlmOps.simTopKIvfQ8Sql,
    "d_sim_topk_pq" -> q.LlmOps.simTopKPqSql,
    "d_sim_topk_ivf_pq" -> q.LlmOps.simTopKIvfPqSql,
    "d_ann_pq_rerank" -> q.LlmOps.annPqRerankSql,
    "d_ann_batch" -> q.LlmOps.annBatchSql,
    "d_ann_append" -> q.LlmOps.annAppendSql,
    "d_ann_delete" -> q.LlmOps.annDeleteSql,
    // the orchestrated day: dedup -> frozen curation -> delta -> append,
    // replayed stage-by-stage from documents + embeddings alone
    "d_incremental_day" -> q.LlmOps.incrementalDaySql,
    // the same day pipeline committed as tagged snapshot-store versions:
    // v2 = day 1 only, v3 = both days (cumulative latest read)
    "d_incremental_day_versioned" -> q.LlmOps.incrementalDayVersionedSql,
    // streamed index ingest ≡ batch append under the same frozen centroids,
    // so the stream shares the batch twin's oracle (the s_stream_ingest rule)
    "s_stream_ann_ingest" -> q.LlmOps.annAppendSql,
    "d_knn_join" -> q.LlmOps.knnJoinSql,
    "d_embed_neardup" -> q.LlmOps.embedNearDupSql,
    "d_doc_vector_search" -> q.LlmOps.docVectorSearchSql,
    "d_bm25_search" -> q.LlmOps.bm25SearchSql,
    "d_hybrid_search" -> q.LlmOps.hybridSearchSql,
    "d_semantic_dedup" -> q.LlmOps.semanticDedupSql,
    "d_cluster_report" -> q.LlmOps.clusterReportSql,
    "d_corpus_export" -> q.LlmOps.corpusExportSql,
    // apply(base + delta) must equal the from-scratch export, so the
    // lifecycle gate shares the export's oracle
    "d_corpus_apply_delta" -> q.LlmOps.corpusExportSql,
    // three versions read back AFTER all commits — snapshot isolation:
    // any commit touching an earlier version's files shifts v1/v2 here
    "d_corpus_time_travel" -> q.LlmOps.corpusTimeTravelSql,
    // row-level diff between two committed versions, closed-form replay
    "d_corpus_changes" -> q.LlmOps.corpusChangesSql,
    // split-stats data skipping: the pruned read must still be exact
    "d_corpus_stats_prune" -> q.LlmOps.corpusStatsPruneSql,
    // fork/commit/merge across chains, manifests read after the merge
    "d_corpus_branch_merge" -> q.LlmOps.corpusBranchMergeSql,
    // incremental view refresh must equal the from-scratch aggregate
    "d_corpus_incr_agg" -> q.LlmOps.corpusIncrAggSql,
    // merge-on-read takedowns: sidecar-only commits, fold-in on rewrite
    "d_corpus_dv" -> q.LlmOps.corpusDvSql,
    // two concurrent disjoint committers both land; order-free membership
    "d_corpus_concurrent" -> q.LlmOps.corpusConcurrentSql,
    // three-step MERGE INTO algebra (upsert, conditional update, delete)
    "d_corpus_merge_into" -> q.LlmOps.corpusMergeIntoSql,
    // pointer-only rollback: restore(1) over a botched takedown, then go on
    "d_corpus_restore" -> q.LlmOps.corpusRestoreSql,
    // one maintain call (DV fold + consolidate + vacuum) never changes content
    "d_corpus_maintain" -> q.LlmOps.corpusMaintainSql,
    // CDC-maintained doc_id→split index; indexed takedowns are sidecar-only
    "d_corpus_docindex" -> q.LlmOps.corpusDocIndexSql,
    "d_corpus_sql_read" -> q.LlmOps.corpusSqlReadSql,
    "d_corpus_sql_write" -> q.LlmOps.corpusSqlWriteSql,
    // SQL row-level DELETE: sidecar-only DV commit, index-routed IN-deletes
    "d_corpus_sql_delete" -> q.LlmOps.corpusSqlDeleteSql,
    // batch CDF (table_changes shape): the THIRD door on the one CDC body,
    // graded against the streaming doors' oracle VERBATIM
    "d_corpus_sql_cdf" -> snapshotChangesOracle,
    "d_corpus_vacuum_time" -> q.LlmOps.corpusVacuumTimeSql,
    // merged NDV sketches within 5σ of exact, enforced via raise_error
    "d_view_ndv" -> q.LlmOps.viewNdvIncrSql,
    // NDV view survives a takedown via touched-group rebuild, 5σ-enforced
    "d_view_ndv_remove" -> q.LlmOps.viewNdvRemoveSql,
    // wall-clock as-of reads resolve to version semantics the oracle pins
    "d_corpus_read_asof" -> q.LlmOps.corpusReadAsOfSql,
    "d_quality_probe" -> q.LlmOps.qualityProbeSql,
    "d_source_report" -> q.LlmOps.sourceReportSql,
    "d_corpus_diff" -> q.LlmOps.corpusDiffSql,
    "d_embed_quantize" -> q.LlmOps.embedQuantizeSql,
    "d_embed_pca" -> q.LlmOps.embedPcaSql,
    "d_sim_topk_pca" -> q.LlmOps.simTopKPcaSql,
    // the load-path gate shares the training-replay oracle: the persisted
    // artifact round-trips bit-exactly, so load+project ≡ train+project
    "d_sim_topk_pca_load" -> q.LlmOps.simTopKPcaSql,
    // serve lane: artifact cached per JVM, timed body = load+project+top-k
    "d_sim_topk_pca_serve" -> q.LlmOps.simTopKPcaSql,
    "d_bpe_train" -> q.LlmOps.bpeTrainSql,
    "d_bpe_tokenize" -> q.LlmOps.bpeTokenizeSql,
    // the load-path gate shares the training oracle: the persisted vocab
    // round-trips bit-exactly, so load+tokenize ≡ train+tokenize
    "d_bpe_tokenize_load" -> q.LlmOps.bpeTokenizeSql,
    // serve lane: vocab artifact cached per JVM, timed body = load+tokenize
    "d_bpe_tokenize_serve" -> q.LlmOps.bpeTokenizeSql,
    "d_lm_score" -> q.LlmOps.lmScoreSql,
    "d_chunk_windows" -> q.LlmOps.chunkWindowsSql,
    // all-integer power iteration → bit-exact across engines
    "d_graph_pagerank" -> q.LlmOps.graphPagerankSql,
    "d_graph_bfs" -> q.LlmOps.graphBfsSql,
    "d_strip_spans" -> q.LlmOps.stripSpansSql,
    "d_span_dedup_keep_one" -> q.LlmOps.spanDedupKeepOneSql,
    "d_neardup_incremental" -> q.LlmOps.nearDupIncrementalSql,
    "d_tfidf_topterms" -> q.LlmOps.tfidfTopTermsSql,
    "d_sample_stratified" -> q.LlmOps.sampleStratifiedSql,
    "d_source_cap" -> q.LlmOps.sourceCapSql,
    "d_quality_calibrate" -> q.LlmOps.qualityCalibrateSql,
    "d_mixture_rebalance" -> q.LlmOps.mixtureRebalanceSql,
    "d_topic_rebalance" -> q.LlmOps.topicRebalanceSql,
    "d_pack_sequences" -> q.LlmOps.packSequencesSql,
    "d_dedup_incremental" -> q.LlmOps.dedupIncrementalSql,
    "d_dedup_bloom" -> q.LlmOps.dedupBloomSql,
    "d_curation_pipeline" -> q.LlmOps.curationPipelineSql,
    // single-pass observed metrics (Observation API) ≡ plain SQL counts
    "d_curation_observed" -> q.LlmOps.curationObservedSql,
    // corruption planted by id ⇒ the oracle is plant arithmetic alone
    "d_json_quarantine" -> q.LlmOps.jsonQuarantineSql,
    "d_format_matrix" -> q.LlmOps.formatMatrixSql,
    "d_train_split" -> q.LlmOps.trainSplitSql,
    "d_dedup_minhash" -> q.LlmOps.dedupMinhashSql,
    "d_dedup_simhash" -> q.LlmOps.dedupSimhashSql,
    "d_dedup_clusters" -> q.LlmOps.dedupClustersSql,
    "d_dedup_clusters_reliable" -> q.LlmOps.dedupClustersSql,
    "d_cluster_keep_best" -> q.LlmOps.dedupClustersKeepBestSql,
    "d_decontaminate" -> q.LlmOps.decontaminateSql,
    // per-doc verdicts vs the STATIC eval fingerprint set ⇒ stream ≡
    // batch: the ingest filter shares the backfill's oracle verbatim
    "s_stream_decontam" -> q.LlmOps.decontaminateSql,
    "d_decontaminate_spans" -> q.LlmOps.decontaminateSpansSql,
    "d_decontaminate_strip" -> q.LlmOps.decontaminateStripSql,
    "d_decontaminate_fuzzy" -> q.LlmOps.decontaminateFuzzySql,
    "d_importance_sample" -> q.LlmOps.importanceSampleSql,
    "d_importance_resample" -> q.LlmOps.importanceResampleSql,
    "d_pii_scan" -> q.LlmOps.piiScanSql,
    "d_repeated_spans" -> q.LlmOps.repeatedSpansSql,
    "d_vocab_coverage" -> q.LlmOps.vocabCoverageSql,
    // r8: CMS estimate moved out of the hashed output into
    // heavyHittersFull + SketchSpec; the gate hashes the exact top-20 +
    // the require-backed within_bound ⇒ DuckDB-exact
    "d_heavy_hitters" -> q.LlmOps.heavyHittersSql,
    "d_text_normalize" -> q.LlmOps.textNormalizeSql,
    "d_html_extract" -> q.LlmOps.htmlExtractSql,
    "d_url_canonicalize" -> q.LlmOps.urlCanonicalizeSql,
    "d_compact_small_files" -> q.LlmOps.compactSmallFilesSql,
    "d_host_report" -> q.LlmOps.hostReportSql,
    // multimodal: integer gate shape — byte counts recomputed from header
    // arithmetic, decode exactness pinned to theory (see LlmOps.multimodalSql)
    "d_multimodal" -> q.LlmOps.multimodalSql,
    // PNG tier: pixel-side closed forms (deflated byte counts have none)
    "d_multimodal_png" -> q.LlmOps.multimodalPngSql,
    "d_multimodal_jpeg" -> q.LlmOps.multimodalJpegSql,
    "d_multimodal_flac" -> q.LlmOps.multimodalFlacSql,
    "d_media_parity" -> q.LlmOps.mediaParitySql,
    "d_warc_roundtrip" -> q.LlmOps.warcRoundtripSql,
    "d_warc_mixed" -> q.LlmOps.warcMixedSql,
    "d_unicode_normalize" -> q.LlmOps.unicodeNormalizeSql,
    "d_curation_reasons" -> q.LlmOps.curationReasonsSql,
    // the WARC round trip is byte-exact, so ingestion ≡ the quality tier
    // over the original table — shared oracle
    "d_warc_ingest" -> q.LlmOps.streamQualitySql,
    "d_schema_evolution" -> q.LlmOps.schemaEvolutionSql,
    "d_source_overlap" -> q.LlmOps.sourceOverlapSql,
    "s_stream_window" ->
      s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
         |  COUNT(*) AS n, ${q.Exact.sqlSumMoney("value")} AS total_value
         |FROM events GROUP BY 1, 2""".stripMargin,
    // stream ≡ batch: the sentinel-flushed streaming sessionizer must equal
    // the batch gap-sessionization SQL exactly
    "s_stream_sessionize" -> q.Relational.streamSessionizeSql,
    // the BUILT-IN session_window twin: session membership is a pure
    // function of event times (gap tuned +1us to the <=-rule), so it
    // shares the custom sessionizer's oracle verbatim
    "s_stream_session_window" -> q.Relational.streamSessionizeSql,
    // streaming dedup gate: all duplicates co-arrive within the watermark
    // horizon, so the surviving KEY SET equals batch DISTINCT (the gate
    // projects away the nondeterministic surviving-row identity)
    "s_stream_dedup" -> "SELECT DISTINCT user_id, event_type FROM events",
    // stateless quality tier on a document stream ≡ the batch filters
    "s_stream_quality" -> q.LlmOps.streamQualitySql,
    // stateless per-doc FLAC decode: n_samples closed-form, feat0 on theory
    "s_stream_media" ->
      """SELECT doc_id,
        |  CAST(2000 + ((doc_id % 1000) + 1000) % 1000 AS BIGINT) AS n_samples,
        |  TRUE AS feat0_exact
        |FROM documents""".stripMargin,
    // per-doc decision vs the STATIC corpus index ⇒ stream ≡ batch
    "s_stream_ingest" -> q.LlmOps.nearDupIncrementalSql,
    // the stream shares its batch twin's oracle: live ingest ≡ batch backfill
    "s_stream_bloom_ingest" -> q.LlmOps.dedupBloomSql,
    // base commit + one tagged streamed delta + an in-gate REDELIVERY
    // (skipped by the durable ledger) reassemble the whole table: the
    // latest version's manifest is just documents, split-assigned
    "s_stream_snapshot_ingest" ->
      """SELECT 's' || CAST(doc_id % 4 AS VARCHAR) AS split, lang,
        |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1, 2""".stripMargin,
    // the LIVE view after streamed commits + per-batch incremental
    // refreshes (+ an in-gate redelivery that must not double-count)
    // equals the from-scratch aggregate of the whole table — the ingest
    // gate's oracle, shared verbatim
    "s_stream_incr_agg" ->
      """SELECT 's' || CAST(doc_id % 4 AS VARCHAR) AS split, lang,
        |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1, 2""".stripMargin,
    // the CDC tail of the store: v1 bootstrap adds (%3 slice), v2 adds
    // (the rest), v3 takedown removes (%7) — each version's change feed
    // emitted by the live tail stream, replayed closed-form here
    "s_stream_snapshot_changes" -> snapshotChangesOracle,
    // the SAME oracle VERBATIM for the DSv2 streaming front door
    // (readStream.format("graft-snapshot")): one CDC body, two doors
    "s_stream_sql_changes" -> snapshotChangesOracle,
    "s_stream_probe" -> q.LlmOps.streamProbeSql,
    // stream-stream inner join: membership is set by event times alone,
    // so the streamed result equals the batch time-range join exactly
    "s_stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
        |  epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP)) AS gap_us,
        |  p.value AS purchase_value
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        | AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 30 MINUTE""".stripMargin,
    // stream-stream LEFT OUTER join: match rows emit on arrival, click-less
    // purchases emit (null click columns) at watermark close — the output
    // SET equals the batch left join; the sync gate sentinel-flushes the
    // watermark so the tail's unmatched purchases are present too
    "s_stream_join_outer" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
        |  epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP)) AS gap_us,
        |  p.value AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        | AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 30 MINUTE""".stripMargin,
    // FULL outer: unmatched rows of BOTH sides emit at watermark close —
    // the output SET equals the batch full join over the same condition
    "s_stream_join_full" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |  COALESCE(p.user_id, c.user_id) AS user_id,
        |  epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP)) AS gap_us,
        |  p.value AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        | AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 30 MINUTE""".stripMargin,
  )
}
