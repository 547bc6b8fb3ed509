"""Distributed-determinism guard: results must be a pure function of
the DATA, not of the partition layout. Each sensitive query runs under
two different shuffle-partition settings and must produce identical
canonical results — this catches partition-order-dependent float
reductions, unquantized iterative state, and rank ties without total
orders (the #1 distributed-correctness trap this engine designs
against: every such site quantizes or adds a tie-break key)."""

from __future__ import annotations

import math

import pytest

from formula1_dataengineering_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

#: Queries whose plans contain the partition-sensitive shapes: unrolled
#: iterative state (kmeans/PC/PQ/BPE), quantized float sums, two-phase
#: prefix arithmetic, sketch top-k, and rank windows.
SENSITIVE = [
    "kmeans_ivf_training",
    "embedding_top_pc",
    "pq_encode_embeddings",
    "bpe_merge_symbol_stats",
    "sketch_profile_by_type",
    "sequence_packing_global",
    "source_mixing_order",
    "token_budget_sample_docs",
    "supplier_ship_span",
    "source_term_drift",
    "source_term_entropy",
    "doc_bigram_surprisal",
    "end_to_end_curation_stats",
    # VERDICT r3 item 7: the three driver-red-then-fixed dedup/leakage
    # queries are groupBy-deterministic by construction — pin it.
    "normalized_dedup_docs",
    "dedup_keep_best_docs",
    "cross_source_leakage",
    # Round-4 additions with unquantized intermediate float sums or
    # iterative state: DSIR log-ratio sums, KL sums, PageRank rounds,
    # k-means-bucketed semantic dedup, hash-keyed weighted sampling.
    "dsir_importance_weights",
    "source_kl_divergence",
    "supplier_pagerank",
    "semantic_dedup_embeddings",
    "weighted_ares_sample",
    "cms_term_frequency_estimates",
    "ppjoin_exact_jaccard_pairs",
    "snapshot_cdc_diff",
    "token_pmi_top_pairs",
    "cdc_chunk_dedup_stats",
    "langid_confusion_matrix",
    "bucketed_colocated_revenue",
    "table_profile_stats",
    "value_mad_outliers",
    "value_psi_drift",
    # Round-5 additions: PSI float sums over exploded bin spines, GK
    # sketch + rank verdicts, HLL verdicts, Gopher ratio thresholds,
    # recall overlap counts. (Streaming gates pin their own state
    # partitioning inside run_to_completion; the batch-side PSI/MAD
    # arithmetic is covered via their shared _timeline_halves path in
    # value_psi_drift above.)
    "table_profile_approx",
    "value_quantiles_approx",
    "gopher_quality_flags",
    "ivf_recall_at_k",
    "leakage_safe_split",
    "jsonl_ingest_stats",
    "zorder_box_scan",
    "bm25_topk_docs",
    "source_temperature_mix",
    "hybrid_rrf_fusion",
    "k_anonymity_profile",
    "hourly_ewma_top_residuals",
    "audio_feature_stats",
    "l_diversity_profile",
    "doc_skyline_frontier",
    "mergeable_profile_check",
    # Round-7 additions with partition-sensitive shapes: per-cell GEMM
    # top-k + float rank ties (triangles), whole-group UDAF float
    # reduction (gini), zero-copy Arrow segment sums (norms), and the
    # partition-planned Python source (generation split across
    # InputPartitions must not leak into results).
    "embedding_knn_triangles",
    "value_gini_by_type",
    "arrow_embedding_norms",
    "python_datasource_scan",
    "udtf_window_chunks",
    # Round-8 additions: the substring family's df-cap anti-join and
    # islands windows, and the TABLE-argument UDTF (partition routing
    # must not depend on the physical shuffle layout).
    "substring_dedup_pairs",
    "substring_dup_coverage",
    "udtf_table_arg_stats",
    "udtf_analyze_parse",
    # Round-9 additions: HRW argmax must be layout-independent (pure
    # column arithmetic), and the incremental-dedup semi-join ladder
    # must not depend on how batch/corpus rows are partitioned.
    "rendezvous_shard_stats",
    "incremental_dedup_new_batch",
]


def _canon(df):
    cols = sorted(df.columns)
    rows = []
    for r in df.collect():
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = None if math.isnan(v) else round(v, 9)
            vals.append(v)
        rows.append(tuple(vals))
    rows.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return cols, rows


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_shuffle_partitioning(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _canon(QUERIES[name](spark, SF))
        # drop caches between runs: queries that persist a shared frame
        # (hybrid_rrf_fusion's BM25 leg, surprisal/DSIR/KL) would
        # otherwise serve run 1's cached subtree to run 2 (CacheManager
        # dedups on the analyzed plan, which does not include the
        # shuffle-partition conf) — making the second partitioning
        # vacuous for exactly the subtree the test exists to stress.
        spark.catalog.clearCache()
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _canon(QUERIES[name](spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.clearCache()
    assert a == b
