package graft

/** Regression lock: exact per-query row counts at sf0.001, snapshotted
  * from the round-1 green state (70/70 oracle hash-match + 43 specs).
  * A count drift here means an operator's semantics changed — re-verify
  * against the DuckDB oracle before updating a number. */
class CountsSnapshotSpec extends SparkSpec {

  private val expected: Map[String, Long] = Map(
    "q_agg_approx_distinct" -> 5L,
    "q_c360_profile" -> 150L,
    "q_c360_scored" -> 150L,
    "q_agg_collect" -> 150L,
    "q_agg_cube" -> 24L,
    "q_agg_distinct" -> 5L,
    "q_agg_grouping_sets" -> 9L,
    "q_agg_percentile" -> 3L,
    "q_agg_mode" -> 3L,
    "q_agg_nulls" -> 3L,
    "q_agg_histogram" -> 10L,
    "q_agg_pricing_summary" -> 6L,
    "q_agg_rollup" -> 31L,
    "q_agg_stats" -> 25L,
    "q_array_funcs" -> 500L,
    "q_array_hof" -> 500L,
    "q_date_funcs" -> 1500L,
    "q_date_parts" -> 1500L,
    "q_str_more" -> 200L,
    "q_win_first_last" -> 1500L,
    "q_dedup_exact" -> 500L,
    "q_dedup_containment" -> 55L,
    "q_join_salted" -> 4L,
    "q_dedup_survivors" -> 500L,
    "q_text_ngrams" -> 30L,
    "q_dedup_minhash_lsh" -> 28L,
    "q_dedup_minhash_sig" -> 500L,
    "q_dedup_near_embedding" -> 7L,
    "q_dedup_near_jaccard" -> 28L,
    "q_dedup_simhash" -> 500L,
    "q_dedup_simhash_cluster" -> 500L,
    "q_source_csv_roundtrip" -> 111L,
    "q_feat_pivot" -> 15L,
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
    "q_win_running" -> 1500L)

  test("snapshot covers exactly the registered queries") {
    assert(expected.keySet === SparkEntry.queries.keySet)
  }

  test("per-query row counts match the round-1 snapshot") {
    val drifts = expected.toSeq.sortBy(_._1).flatMap { case (name, want) =>
      val got = SparkEntry.queries(name)(spark, sf).count()
      if (got != want) Some(s"$name: want $want got $got") else None
    }
    assert(drifts.isEmpty, drifts.mkString("; "))
  }
}
