"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` maps
every implemented operator (SURVEY.md §2) to a (spark, sf_dir) →
DataFrame callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL the
driver hash-compares against at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from formula1_dataengineering_spark.plans import ORACLE_SQL, QUERIES

#: Names that already earned a fully-green (rows+schema+hash) driver
#: CORRECTNESS row in round 1. The driver checks the first 50 entries of
#: ``queries()`` in registration order, so entries NOT yet hard-verified
#: are registered first; previously-green ones rotate to the back where
#: the local DuckDB harness (tests/test_queries_oracle.py) still guards
#: them every round. New queries land in the front block automatically.
_DRIVER_GREEN = {
    "pricing_summary", "revenue_by_nation", "order_priority_buckets",
    "distinct_flag_status", "rollup_priority_status",
    "pivot_returnflag_status", "unpivot_part_measures",
    "cheapest_order_per_customer", "top5_orders_per_segment",
    "priority_grid", "running_revenue_per_supplier", "value_delta_per_user",
    "sessionize_events", "interval_join_user_cohort",
    "asof_backward_purchase", "asof_nearest_error",
    "customers_without_orders", "segment_active_customers",
    "customer_has_big_order", "union_hot_cold_items", "format_order_runtime",
    "events_tumbling_5min", "dedup_exact_docs", "minhash_signatures_docs",
    "minhash_lsh_docs", "simhash_docs", "ngram_jaccard_docs",
    "knn_bruteforce", "knn_ivf_label", "srp_lsh_buckets", "knn_srp_bucket",
    "knn_srp_multiprobe", "embedding_neardup", "doc_quality",
    "doc_language_id", "doc_fingerprint", "token_stats_by_source",
    "tfidf_top_terms", "deterministic_event_sample", "neardup_clusters",
    "label_centroids", "value_percentiles_by_type", "events_sliding_10m_5m",
    "salted_user_event_totals", "cube_flag_status", "ntile_price_quartiles",
    "parts_above_brand_avg", "props_json_stats",
    # round-2 green rows (CORRECTNESS_r02.json, 50/50 hash-match).
    "pii_scrub_stats", "span_dedup_stats", "bloom_decontamination_stats",
    "token_budget_sample_docs", "source_similarity_matrix",
    "media_feature_stats", "normalized_embeddings", "sql_top_revenue_nations",
    "regex_token_stats", "quantized_embeddings", "shipping_priority_top10",
    "nation_market_share", "grouping_sets_revenue",
    "nation_activity_full_outer", "supplier_balance_distribution",
    "hourly_moving_value", "user_event_type_profile", "monthly_revenue_trend",
    "decile_value_spread", "media_decode_stats", "video_frame_sample",
    "part_segment_set_ops", "supplier_rank_tiers", "order_value_histogram",
    "corpus_selection", "asof_forward_error", "supplier_ship_span",
    "price_stats_by_flag", "promo_revenue_share", "segment_top_customer",
    "qualifying_grid_events", "race_positions_events",
    "events_tumbling_5min_streamed", "minhash_lsh_fast_dup_recall",
    "media_real_decode_stats", "media_thumbnail_stats",
    "tire_assignment_events", "asof_tolerance_purchase",
    "stratified_event_sample", "order_percentile_rank",
    "neardup_clusters_distributed", "doc_repetition_stats", "doc_rarity_score",
    "events_stream_dedup", "events_stream_attribution",
    "events_stateful_running_totals", "events_sessionized_streamed",
    "doc_chunking", "sequence_packing", "decontamination_overlap",
    # round-3 green rows (CORRECTNESS_r03.json, 47/50 hash-match).
    "language_quota_sample", "stopword_scrub_stats", "sequence_packing_global",
    "kmeans_ivf_training", "incremental_corpus_merge", "media_png_decode_stats",
    "sketch_profile_by_type", "quality_quantile_filter_docs",
    "heavy_hitter_terms_by_source", "source_term_drift",
    "embedding_label_outliers", "events_stream_static_enrich",
    "disjunctive_part_revenue", "idle_rich_customers",
    "event_funnel_conversion", "user_cohort_retention", "fuzzy_neardup_pairs",
    "embedding_top_pc", "clipped_value_stats", "pq_encode_embeddings",
    "pq_adc_topk", "hourly_gap_filled_activity", "hourly_anomaly_flags",
    "source_mixing_order", "bpe_merge_symbol_stats", "ivf_pq_topk",
    "filter_cascade_stats", "domain_filter_stats", "packing_efficiency_stats",
    "hard_negative_topk", "end_to_end_curation_stats", "source_term_entropy",
    "doc_bigram_surprisal",
}


#: Front-of-line queries for this round's driver sweep. The three
#: round-3 driver-red rows (VERDICT r3 item 1: oracle SQL emitted an
#: un-cast DuckDB HUGEINT → Arrow decimal128 vs Spark int64) are fixed
#: by CASTing the hash output columns to BIGINT; register them first so
#: the driver re-hashes them and the catalog reaches 134/134 green.
_PRIORITY = [
    "cross_source_leakage",
    "normalized_dedup_docs",
    "dedup_keep_best_docs",
    # round-4 additions (never driver-hashed yet).
    "pricing_summary_partitioned",
    "semantic_dedup_embeddings",
    "dsir_importance_weights",
    "supplier_pagerank",
    "join_key_skew_profile",
    "weighted_ares_sample",
    "source_kl_divergence",
    "events_stream_hourly_users",
    "cms_term_frequency_estimates",
    "ppjoin_exact_jaccard_pairs",
    "snapshot_cdc_diff",
    "token_pmi_top_pairs",
    "cdc_chunk_dedup_stats",
    "langid_confusion_matrix",
    "bucketed_colocated_revenue",
    "events_stream_unattributed_views",
    "table_profile_stats",
    "value_mad_outliers",
    "value_psi_drift",
]


def _ordered(mapping):
    prio = {k: mapping[k] for k in _PRIORITY if k in mapping}
    front = {
        k: v
        for k, v in mapping.items()
        if k not in _DRIVER_GREEN and k not in prio
    }
    back = {k: v for k, v in mapping.items() if k in _DRIVER_GREEN}
    return {**prio, **front, **back}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's qualifying-classification lifecycle
    (bucket → clean → best-per-driver-per-Q → Q3⊕Q2⊕Q1 grid) end to
    end through the f1 operator stack."""
    return QUERIES["qualifying_grid_events"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(ORACLE_SQL)
