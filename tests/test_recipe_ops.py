"""Round-3 recipe operators: quantile quality gate, heavy hitters,
distribution drift, cross-source leakage semantics, embedding outliers,
and the oracle-portable KMV sketch profile."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_quality_quantile_filter_threshold_semantics(spark):
    from formula1_dataengineering_spark.operators.curation import (
        quality_quantile_filter,
    )

    docs = spark.createDataFrame(
        [(i, "a", None) for i in range(1, 9)], "doc_id long, source string, text string"
    ).withColumn("score_src", F.col("doc_id") * 10)
    out = quality_quantile_filter(
        docs, score=F.col("score_src"), part_col="source", quantile=0.25
    ).toPandas()
    # scores 10..80 -> p25 = 27.5 (linear interpolation); keep 30..80
    assert sorted(out["doc_id"]) == [3, 4, 5, 6, 7, 8]
    assert set(out["threshold"]) == {27.5}


def test_heavy_hitters_exact_counts_and_tiebreak(spark):
    from formula1_dataengineering_spark.functions.text import heavy_hitter_terms

    docs = spark.createDataFrame(
        [
            (1, "s", "b b b a a c"),
            (2, "s", "a z"),
            (3, "t", "q q"),
        ],
        "doc_id long, source string, text string",
    )
    out = heavy_hitter_terms(docs, k=2).toPandas()
    s = out[out["source"] == "s"].sort_values("rk")
    # a and b tie at 3 -> term asc breaks the tie
    assert list(s["term"]) == ["a", "b"]
    assert list(s["term_count"]) == [3, 3]
    t = out[out["source"] == "t"]
    assert list(t["term"]) == ["q"] and list(t["term_count"]) == [2]


def test_source_term_drift_bounds(spark):
    from formula1_dataengineering_spark.functions.text import source_term_drift

    # two sources with IDENTICAL term mixes -> tvd 0 for both;
    # a third with a disjoint vocabulary -> tvd approaches the
    # disjoint bound (its mass + unseen corpus mass) / 2
    docs = spark.createDataFrame(
        [
            (1, "a", "x y"),
            (2, "b", "x y"),
            (3, "c", "zz zz"),
        ],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r["tvd"] for r in source_term_drift(docs).collect()}
    # corpus: x:2 y:2 zz:2 -> p=1/3 each. a: px=py=1/2.
    # tvd(a) = (|1/2-1/3|*2 + (1 - 2/3)) / 2 = (1/3 + 1/3)/2 = 1/3
    assert out["a"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["b"] == pytest.approx(1 / 3, abs=1e-6)
    # c: pzz=1 vs 1/3 -> (2/3 + (1 - 1/3))/2 = 2/3
    assert out["c"] == pytest.approx(2 / 3, abs=1e-6)


def test_label_distance_outlier_flagging(spark):
    from formula1_dataengineering_spark.operators.clustering import (
        label_distance_outliers,
    )

    rows = [(i, [0.0, 0.0], 0) for i in range(30)] + [(99, [10.0, 10.0], 0)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = label_distance_outliers(emb).toPandas()
    flagged = set(out[out["is_outlier"]]["vec_id"])
    assert flagged == {99}
    # centered mass has near-zero distance, the outlier dominates
    assert out[out["vec_id"] == 99]["sq_dist"].iloc[0] > 100


def test_kmv_distinct_estimate_accuracy_and_exactness(spark):
    from formula1_dataengineering_spark.operators.sampling import (
        kmv_sketch_profile,
    )

    rows = [(i, "big", i % 500, float(i % 97)) for i in range(2000)] + [
        (10_000 + i, "small", i, float(i)) for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "row_id long, g string, uid long, value double"
    )
    out = {
        r["g"]: r
        for r in kmv_sketch_profile(
            df, "g", "value", id_col="uid", row_id_col="row_id", k=64
        ).collect()
    }
    # below k distinct -> exact
    assert out["small"]["kmv_distinct_ids"] == 20.0
    # above k -> estimate within 25% of the true 500 (k=64 -> ~12% rsd)
    est = out["big"]["kmv_distinct_ids"]
    assert 375 <= est <= 625
    assert out["big"]["n_rows"] == 2000


def test_mixing_order_weight_proportional_interleave(spark):
    """In the ascending mix_key order, a weight-2 source appears ~2x as
    often as a weight-1 source in every prefix (within rounding), and
    src_rank is a dense per-source permutation."""
    from formula1_dataengineering_spark.operators.curation import mixing_order

    docs = spark.createDataFrame(
        [(i, "heavy" if i % 3 != 2 else "light", None) for i in range(90)],
        "doc_id long, source string, text string",
    )
    out = (
        mixing_order(docs, weights={"heavy": 2.0})
        .orderBy("mix_key", "source")
        .toPandas()
    )
    for src, n in (("heavy", 60), ("light", 30)):
        ranks = sorted(out[out["source"] == src]["src_rank"])
        assert ranks == list(range(1, n + 1))
    # prefix proportionality: first 30 mixed docs ≈ 20 heavy / 10 light
    head = out.head(30)
    n_heavy = (head["source"] == "heavy").sum()
    assert 18 <= n_heavy <= 22


def test_bpe_merges_follow_greedy_pair_counts(spark):
    """Hand-checked 3-round BPE on {banana x3, bandana x1}: merges are
    (a,n) -> (an,a) -> (b,an), leaving symbols ana:4, ban:4, d:1 —
    exercises weighted overlapping pair counts, lexicographic
    tie-breaks, and left-to-right non-overlapping merge order."""
    from formula1_dataengineering_spark.functions.text import (
        bpe_merge_symbol_stats,
    )

    docs = spark.createDataFrame(
        [(1, "banana banana"), (2, "banana bandana")],
        "doc_id long, text string",
    )
    out = [
        (r["symbol"], r["total_count"])
        for r in bpe_merge_symbol_stats(docs, n_merges=3, top_k=10).collect()
    ]
    assert out == [("ana", 4), ("ban", 4), ("d", 1)]


def test_bpe_dry_round_keeps_symbols(spark):
    """A corpus of single-character words has no pairs: the merge loop
    runs dry and the symbol table is the unmerged character counts —
    not empty (code-review fix; the oracle's LEFT JOIN mirrors this)."""
    from formula1_dataengineering_spark.functions.text import (
        bpe_merge_symbol_stats,
    )

    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "b a")], "doc_id long, text string"
    )
    out = {
        r["symbol"]: r["total_count"]
        for r in bpe_merge_symbol_stats(docs, n_merges=3, top_k=10).collect()
    }
    assert out == {"a": 3, "b": 2, "c": 1}
