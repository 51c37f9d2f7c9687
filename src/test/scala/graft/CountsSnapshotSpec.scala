package graft

/** Regression lock: exact per-query row counts at sf0.001, snapshotted
  * from the round-1 green state (70/70 oracle hash-match + 43 specs).
  * A count drift here means an operator's semantics changed — re-verify
  * against the DuckDB oracle before updating a number. */
class CountsSnapshotSpec extends SparkSpec {

  private val expected: Map[String, Long] = Map(
    // round-3 additions (measured from the verified sf0.001 run)
    "q_sample_stratified" -> 17L,
    "q_split_hash" -> 500L,
    "q_agg_incremental" -> 3L,
    "q_snapshot_diff" -> 148L,
    // round-7 session-continuation additions (verified sf0.001 runs,
    // each oracle-checked at sf0.01 first)
    "q_agg_chisq" -> 5L,
    "q_agg_benford" -> 9L,
    "q_agg_seasonality" -> 167L,
    "q_agg_moments" -> 5L,
    "q_agg_winsorize" -> 5L,
    "q_ml_mutual_info" -> 2L,
    "q_dq_referential" -> 4L,
    "q_dq_skew" -> 3L,
    "q_events_load_curve" -> 5L,
    "q_feat_funnel_latency" -> 1L,
    "q_feat_cohort_ltv" -> 9L,
    "q_feat_cohort_retention" -> 9L,
    "q_text_keywords" -> 150L,
    "q_ml_kfold" -> 25L,
    "q_sample_balance" -> 940L,
    "q_agg_entropy" -> 20L,
    "q_c360_local_volume" -> 1L,
    "q_c360_shipping_priority" -> 10L,
    "q_emb_dim_stats" -> 64L,
    "q_emb_norm_hist" -> 2L,
    "q_feat_hashed_cross" -> 43L,
    "q_feat_woe" -> 10L,
    "q_privacy_kanon" -> 3L,
    "q_shard_manifest" -> 16L,
    "q_source_generated" -> 5L,
    "q_stream_generated" -> 30L,
    "q_win_drawdown" -> 15L,
    // round-7 final-session additions (each oracle-exact at sf0.01
    // before snapshotting; counts from the verified sf0.001 run)
    "q_agg_leaderboard" -> 11L,
    "q_agg_order_fanout" -> 12L,
    "q_c360_forecast_revenue" -> 1L,
    "q_scan_agg_pushdown" -> 1L,
    "q_c360_market_share" -> 7L,
    "q_agg_mannwhitney" -> 5L,
    "q_join_lateral" -> 10L,
    "q_str_collation" -> 5L,
    "q_udf_sql" -> 17L,
    "q_stream_upsert" -> 5L,
    "q_agg_new_returning" -> 5L,
    "q_agg_price_index" -> 1L,
    "q_agg_ks" -> 5L,
    "q_agg_spearman" -> 1L,
    "q_sim_ivf_sweep" -> 5L,
    // round-10 additions (q_sim_ivfpq_topk recall-law-tested in
    // OperatorGoldenSpec; the two scan ops oracle-exact at sf0.01)
    "q_sim_ivfpq_topk" -> 100L,
    // append race + disjoint targeted-delete race legs (round 13)
    "q_scan_concurrent_commit" -> 2L,
    "q_scan_partition_prune" -> 1L,
    // round-8 additions (GK quartiles: one row per returnflag;
    // learned PQ: one row per embedding vector)
    "q_agg_approx_quantile" -> 3L,
    "q_emb_pq_learned" -> 500L,
    // round-8 second wave (each oracle-exact at sf0.01 first; counts
    // from the DuckDB oracle at sf0.001)
    "q_ab_power" -> 5L,
    "q_agg_hhi" -> 5L,
    "q_agg_ratio_ci" -> 2L,
    "q_time_yoy" -> 68L,
    "q_text_zipf" -> 1L,
    "q_text_filter_funnel" -> 20L,
    "q_sample_neyman" -> 5L,
    "q_join_asof_tolerance" -> 202L,
    // round-8 third wave
    "q_c360_trade_flows" -> 4L,
    "q_c360_order_dist" -> 16L,
    "q_agg_changepoint" -> 5L,
    "q_feat_lags" -> 150L,
    "q_graph_degrees" -> 59L,
    "q_privacy_tcloseness" -> 93L,
    "q_emb_outliers" -> 10L,
    "q_ml_confusion" -> 3L,
    "q_sort_keyset" -> 50L,
    "q_privacy_erasure" -> 3L,
    "q_emb_pca" -> 64L,
    "q_join_bloom_filtered" -> 7L,
    "q_c360_top_supplier" -> 1L,
    "q_c360_big_orders" -> 20L,
    "q_c360_lost_prospects" -> 5L,
    "q_c360_small_orders" -> 1L,
    "q_feat_rfm_segments" -> 5L,
    "q_sql_recursive" -> 30L,
    "q_source_xml_col" -> 5L,
    "q_json_variant" -> 5L,
    "q_dq_uniqueness" -> 3L,
    "q_ml_labels" -> 1500L,
    "q_time_wow" -> 25L,
    "q_c360_disjunctive" -> 1L,
    "q_c360_type_share" -> 1L,
    "q_win_rolling_median" -> 150L,
    "q_event_paths" -> 10L,
    "q_dq_burstiness" -> 15L,
    "q_ml_auc" -> 1L,
    "q_c360_order_priority" -> 5L,
    "q_c360_returns" -> 20L,
    "q_dq_freshness" -> 2L,
    "q_dq_psi" -> 17L,
    "q_events_concurrency" -> 30L,
    "q_feat_cadence" -> 150L,
    "q_feat_decay_spend" -> 150L,
    "q_feat_survival" -> 40L,
    "q_feat_tier_migration" -> 15L,
    "q_graph_components" -> 1L,
    "q_ml_calibration" -> 10L,
    "q_multimodal_dedup" -> 20L,
    "q_privacy_ldiversity" -> 4L,
    "q_split_temporal" -> 3L,
    "q_stream_topk" -> 858L,
    "q_time_autocorr" -> 2L,
    "q_win_cusum" -> 5L,
    // round-7 additions (counts from the verified DuckDB oracles)
    "q_cdc_apply" -> 12L,
    "q_sketch_kmv" -> 30L,
    "q_graph_triangles" -> 200L,
    "q_graph_sparsify" -> 705L,
    "q_sample_mix" -> 248L,
    "q_text_pack" -> 500L,
    "q_ml_negatives" -> 422L,
    "q_win_ewma" -> 1451L,
    "q_dq_drift" -> 17L,
    "q_feat_attribution" -> 4L,
    "q_audience_overlap" -> 10L,
    "q_agg_distinct_rollup" -> 156L,
    "q_stream_enrich" -> 4L,
    "q_agg_mad" -> 5L,
    "q_sample_bootstrap" -> 9L,
    "q_join_asof_native" -> 202L,
    "q_join_nearest" -> 28L,
    "q_ab_test" -> 5L,
    "q_emb_matryoshka" -> 10L,
    "q_scd2_asof" -> 60L,
    "q_agg_pareto" -> 15L,
    "q_stream_join_outer" -> 191L,
    "q_multimodal_resize" -> 500L,
    "q_feat_sessions" -> 15L,
    "q_graph_pagerank" -> 5L,
    "q_layout_zorder" -> 6L,
    "q_feat_quantile_norm" -> 150L,
    "q_feat_trailing_distinct" -> 397L,
    "q_scd2_build" -> 802L,
    "q_basket_affinity" -> 159L,
    "q_feat_bin" -> 20L,
    "q_time_interp" -> 8978L,
    "q_sessionize" -> 946L,
    "q_emb_pq" -> 500L,
    "q_time_downsample" -> 951L,
    "q_event_transitions" -> 25L,
    "q_pipeline_e2e" -> 15L,
    "q_feat_target_encode" -> 150L,
    "q_dq_anomaly" -> 30L,
    "q_join_star" -> 35L,
    "q_text_lm_score" -> 108L,
    "q_dq_profile" -> 6L,
    "q_sink_compact" -> 5L,
    "q_feat_pit_join" -> 202L,
    // round-6 additions (counts from the verified DuckDB oracles)
    "q_snapshot_merge" -> 148L,
    "q_source_avro_roundtrip" -> 10L,
    "q_scan_dpp" -> 7L,
    "q_text_repetition" -> 500L,
    "q_text_chunking" -> 828L,
    "q_text_vocab_coverage" -> 5L,
    "q_source_jsonl_roundtrip" -> 99L,
    "q_er_blocking" -> 150L,
    "q_emb_centroids" -> 640L,
    "q_sim_centroid_assign" -> 10L,
    "q_sketch_cms" -> 54L,
    "q_sketch_bloom" -> 150L,
    "q_text_redact" -> 500L,
    "q_text_collocations" -> 30L,
    "q_agg_weighted" -> 3L,
    "q_agg_gini" -> 15L,
    "q_agg_ols" -> 25L,
    "q_win_streak" -> 15L,
    "q_multimodal_framesample" -> 538L,
    "q_ml_recommend" -> 450L,
    "q_text_hashing_tf" -> 1203L,
    "q_feat_funnel" -> 3L,
    "q_feat_retention" -> 5L,
    "q_join_range_binned" -> 199L,
    // native band-join engine, same oracle as the composition
    "q_join_range_native" -> 199L,
    "q_stream_stateful" -> 15L,
    "q_sketch_quantile" -> 3L,
    "q_source_schema_evolution" -> 6L,
    "q_agg_string_agg" -> 25L,
    "q_agg_corr_matrix" -> 3L,
    "q_feat_minmax_sql" -> 150L,
    "q_sample_consistent" -> 100L,
    "q_dedup_spans" -> 30L,
    "q_source_orc_roundtrip" -> 69L,
    "q_agg_approx_distinct" -> 5L,
    "q_sketch_hll" -> 14L,
    "q_c360_profile" -> 150L,
    "q_c360_scored" -> 150L,
    "q_agg_collect" -> 150L,
    "q_events_gapfill" -> 600L,
    "q_win_dist" -> 150L,
    "q_str_fuzzy" -> 200L,
    "q_agg_cube" -> 24L,
    "q_agg_distinct" -> 5L,
    "q_agg_grouping_sets" -> 9L,
    "q_agg_percentile" -> 3L,
    "q_agg_mode" -> 3L,
    "q_agg_nulls" -> 3L,
    "q_agg_histogram" -> 10L,
    "q_agg_pricing_summary" -> 6L,
    "q_agg_bool" -> 5L,
    "q_agg_argmax" -> 25L,
    "q_subquery_exists" -> 150L,
    "q_agg_rollup" -> 31L,
    "q_agg_stats" -> 25L,
    "q_array_funcs" -> 500L,
    "q_array_setops" -> 200L,
    "q_array_hof" -> 500L,
    "q_date_funcs" -> 1500L,
    "q_date_parts" -> 1500L,
    "q_str_more" -> 200L,
    "q_win_first_last" -> 1500L,
    "q_dedup_exact" -> 500L,
    "q_dedup_containment" -> 55L,
    "q_dedup_clusters" -> 45L,
    "q_dedup_survivors_near" -> 476L,
    "q_join_salted" -> 4L,
    "q_join_bucketed" -> 150L,
    "q_dedup_survivors" -> 500L,
    "q_text_ngrams" -> 30L,
    "q_dedup_minhash_lsh" -> 28L,
    "q_dedup_delta" -> 25L,
    "q_text_decontam" -> 6L,
    "q_sample_weighted" -> 347L,
    "q_dedup_minhash_sig" -> 500L,
    "q_dedup_near_embedding" -> 7L,
    "q_dedup_near_jaccard" -> 28L,
    "q_dedup_simhash" -> 500L,
    "q_dedup_simhash_cluster" -> 500L,
    "q_source_csv_roundtrip" -> 111L,
    "q_feat_pivot" -> 15L,
    "q_feat_unpivot" -> 75L,
    "q_win_time_range" -> 1500L,
    "q_feat_rfm" -> 150L,
    "q_feat_scale_sql" -> 150L,
    "q_feat_trailing_windows" -> 150L,
    "q_filter_compound" -> 967L,
    "q_filter_null_semantics" -> 2L,
    "q_join_anti" -> 0L,
    "q_join_asof" -> 202L,
    "q_join_broadcast" -> 25L,
    "q_join_cross" -> 50L,
    "q_join_full" -> 75L,
    "q_join_interval" -> 126L,
    "q_join_left" -> 150L,
    "q_join_semi" -> 15L,
    "q_join_shuffle_chain" -> 150L,
    "q_join_theta_range" -> 13914L,
    "q_json_nested" -> 1000L,
    "q_map_funcs" -> 1000L,
    "q_math_funcs" -> 6000L,
    "q_ml_feature_pipeline" -> 75L,
    "q_ml_propensity" -> 98L,
    "q_ml_segmentation" -> 5L,
    "q_multimodal_chunks" -> 839L,
    "q_multimodal_decode" -> 500L,
    "q_multimodal_features" -> 500L,
    "q_multimodal_join" -> 10L,
    "q_part_roundtrip" -> 35L,
    "q_project_case" -> 1500L,
    "q_scan_project" -> 6000L,
    "q_scan_prune_pushdown" -> 3349L,
    "q_set_except" -> 13L,
    "q_set_intersect" -> 24L,
    "q_set_union_all" -> 140L,
    "q_set_union_distinct" -> 116L,
    "q_sim_ivf_topk" -> 100L,
    "q_sim_lsh_knn" -> 4651L,
    "q_sim_topk_cosine" -> 100L,
    "q_sort_multi" -> 100L,
    "q_sort_nulls" -> 500L,
    "q_source_json_col" -> 1000L,
    "q_str_funcs" -> 200L,
    "q_subquery_scalar" -> 335L,
    "q_subquery_in" -> 93L,
    "q_str_regexp_split" -> 200L,
    "q_stream_dedup" -> 5L,
    "q_stream_join" -> 5L,
    "q_stream_session" -> 946L,
    "q_stream_sliding" -> 3457L,
    "q_stream_tumbling" -> 868L,
    "q_text_fingerprint" -> 500L,
    "q_text_langid" -> 500L,
    "q_text_quality" -> 500L,
    "q_text_quality_filter" -> 306L,
    "q_emb_quantize" -> 500L,
    "q_text_stats" -> 99L,
    "q_text_tfidf" -> 25L,
    "q_text_tokens_tf" -> 20L,
    "q_topk_per_group" -> 449L,
    "q_udaf_geomean" -> 25L,
    "q_udf_scalar" -> 1500L,
    "q_udtf_explode" -> 2832L,
    "q_win_lead_lag" -> 1000L,
    "q_win_moving_avg" -> 1500L,
    "q_win_ntile_pct" -> 150L,
    "q_win_range_frame" -> 1000L,
    "q_win_rank" -> 1500L,
    "q_win_running" -> 1500L,
    // round-9 additions: the native sessionize twin is bit-equal to
    // q_sessionize by law; the approx-RFM rollup covers the same 5
    // segment labels as the exact op at this SF
    "q_sessionize_native" -> 946L,
    "q_feat_rfm_approx" -> 5L,
    // merged KMV register: min(K=32, distinct purchase∪error users) —
    // 15 at this SF (the union is exhausted, so the register IS the set)
    "q_sketch_kmv_setops" -> 15L,
    // status × {1996, 1997}; distinct (user, event_type) state keys
    "q_sql_pipe" -> 6L,
    "q_stream_state_audit" -> 75L,
    // transformWithState twin of q_stream_stateful: one row per user
    "q_stream_tws_profile" -> 15L,
    // one observed-metrics row; one row per surviving returnflag
    "q_scan_observed" -> 1L,
    "q_sql_params" -> 3L,
    // third sessionize engine — row-equal to q_sessionize by oracle
    "q_stream_tws_sessionize" -> 946L,
    // one row per purchase (left side of the forward as-of)
    "q_join_asof_forward" -> 202L,
    // one row per declared expectation rule (SF-independent)
    "q_dq_expectations" -> 5L,
    // scripting fixpoint returns a single calibrated-threshold row
    "q_sql_script" -> 1L,
    // small / mid / large price bands
    "q_tvf_sql" -> 3L,
    // one rollup row per table version (v1, v2)
    "q_scan_timetravel" -> 2L,
    // v1, v2, rollback-v3, plus the incremental-read row (version 0)
    "q_scan_table_rollback" -> 4L,
    // one skip-witness row (scanned/total counts + pruned rollup)
    "q_scan_file_skipping" -> 1L,
    // ingested table rollup: one row per event type
    "q_stream_table_ingest" -> 5L,
    // pre/post-optimize versions (identical rollups, 12 vs 1 files)
    "q_scan_table_optimize" -> 2L,
    // pre/post-merge versions
    "q_scan_table_merge" -> 2L,
    // change-feed legs: v2 insert + v3 pre-image/post-image/insert
    "q_scan_cdc_merge" -> 4L,
    // one merge row per BPE training step
    "q_text_bpe_train" -> 8L,
    // 25 base symbols (24 letters in vocab + '_') + 8 merged tokens
    "q_text_bpe_encode" -> 33L,
    // GBT binary confusion rollup: all four cells populated
    "q_ml_gbt_propensity" -> 4L,
    // feed-maintained aggregate: one row per year 1995-1998
    "q_scan_cdc_agg" -> 4L,
    // per-doc BPE token accounting: every document has words
    "q_text_bpe_apply" -> 500L,
    // one maintained-aggregate row per year 1995-1998
    "q_scan_incr_agg" -> 4L,
    // NULL cohort (pre-evolution rows) + the 1997 evolved cohort
    "q_scan_table_evolution" -> 2L,
    // 10 probes x top-10 Hamming neighbors; same for the re-rank
    "q_sim_binary_hamming" -> 100L,
    "q_sim_binary_rerank" -> 100L,
    // timer sessionize emits only PROVEN-closed sessions: 946 total
    // minus the 2 last-sessions the final watermark never passes
    "q_stream_sessionize_timer" -> 944L,
    // full outer = inner (186) + unmatched purchases + expired
    // unmatched clicks; right outer drops the unmatched purchases
    "q_stream_join_full" -> 395L,
    "q_stream_join_right" -> 209L,
    // maximal duplicated word-spans (≥10 words) across the corpus
    "q_dedup_span_extend" -> 45L,
    // ≤10 docs per (lang, source) cell: 483 of 500 survive the cap
    "q_sample_reservoir" -> 483L,
    // 2-round LPA communities over the support-2 co-purchase graph
    "q_graph_label_prop" -> 10L,
    // one row per active (user, month); both motif outcomes present
    "q_event_regex_funnel" -> 15L,
    // pre/post-targeted-merge version rollups
    "q_scan_table_merge_targeted" -> 2L,
    // pre/post-delete snapshot rollups + the feed's delete leg
    "q_scan_table_delete" -> 3L,
    // MOR legs: pre / deleted / reinserted / optimized
    "q_scan_table_delete_mor" -> 4L,
    // band rollup on the ingest and clustered layouts
    "q_scan_table_cluster" -> 2L,
    // one consumer-poll row per drain against the growing history
    "q_scan_cdc_consume" -> 2L,
    // admitted-years rollup (1995 clean + repaired 1996)
    "q_scan_table_constraints" -> 2L,
    // one history row per commit of the six-step lifecycle
    "q_scan_table_history" -> 6L,
    // SQL surface legs: head / time-travel / change feed
    "q_scan_table_sql" -> 3L,
    // source + diverged-clone rollups
    "q_scan_table_clone" -> 2L,
    // per-year rollup after the 1996 partition re-run
    "q_part_overwrite" -> 3L,
    // round-13 additions (each oracle-exact at sf0.01 + sf0.1 first)
    "q_graph_kcore" -> 3L,       // one peel-trace row per round
    "q_graph_bfs" -> 4L,         // hop-distance histogram 0..3
    "q_agg_boxplot" -> 5L,       // one five-number row per priority
    "q_agg_lorenz" -> 10L,       // one row per spend decile
    "q_agg_decile_lift" -> 10L,  // one row per propensity decile
    "q_win_zscore" -> 1000L,     // one flag row per event
    "q_stream_anomaly" -> 1000L, // streaming twin: same grain
    "q_text_lexical" -> 500L,    // one profile row per document
    "q_dq_gaps" -> 10L,          // top-10 largest id gaps
    // errors with ≥1 purchase inside their ±1 h window (true interval join)
    "q_join_interval_events" -> 81L,
    // pre-rename / head / feed legs of the schema-evolution query
    "q_scan_table_rename" -> 3L,
    "q_scan_table_drop" -> 3L,
    "q_scan_stats_multicol" -> 3L,
    // external-log ingest rollup: one row per event type
    "q_stream_log_ingest" -> 5L,
    // loaded-artifact scoring: same (label, prediction) rollup grain
    // as q_ml_propensity (it IS that model, served from disk)
    "q_ml_score_saved" -> 98L,
    // one row per CV grid point
    "q_ml_cv_select" -> 2L,
    // graph-ANN: 10 probes × top-10; sweep = one row per beam width
    "q_sim_hnsw_topk" -> 100L,
    // the persisted-index search reproduces the in-session top-k
    // (equality law in OperatorGoldenSpec), so the same 100 rows
    "q_sim_hnsw_saved" -> 100L,
    // merged base-graph + exact-delta search: same 10×10 shape
    "q_sim_hnsw_delta" -> 100L,
    "q_sim_hnsw_sweep" -> 3L,
    // one row per year across the int→bigint widening
    "q_scan_table_widen" -> 3L,
    // catalog lifecycle: head / pushdown / time-travel legs
    "q_scan_catalog_sql" -> 3L,
    "q_catalog_merge_sql" -> 2L,
    "q_catalog_delete_sql" -> 3L,
    // refs: tag, branch pre/post promotion, head
    "q_scan_table_refs" -> 4L)

  test("snapshot covers exactly the registered queries") {
    assert(expected.keySet === SparkEntry.queries.keySet)
  }

  test("per-query row counts match the round-1 snapshot") {
    // 4-way concurrent — driver planning/codegen dominates, queries are
    // independent (see OperatorGoldenSpec "every declared query").
    import scala.collection.parallel.CollectionConverters._
    val pool = new java.util.concurrent.ForkJoinPool(4)
    try {
      val par = expected.toSeq.sortBy(_._1).par
      par.tasksupport = new scala.collection.parallel.ForkJoinTaskSupport(pool)
      val drifts = par.flatMap { case (name, want) =>
        val got = SparkEntry.queries(name)(spark, sf).count()
        if (got != want) Some(s"$name: want $want got $got") else None
      }.seq
      assert(drifts.isEmpty, drifts.mkString("; "))
    } finally pool.shutdown()
  }
}
