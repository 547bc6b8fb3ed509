"""PPJoin exactness at non-binary thresholds + candidate-budget guard.

Round-4 advice: ``F.ceil(lit(τ) * sz)`` is over-strict when the double
product lands a few ulps above an exact integer (0.55·20 →
11.000000000000002 → ceil 12), turning the lossless length/prefix
filters into ones that drop true pairs. These tests pin the fix
(`_ceil_tight`, epsilon before ceil) with the exact boundary corpus
that the unfixed operator fails, plus a randomized brute-force
differential and the quadratic-regime budget guard.
"""

from __future__ import annotations

import itertools
import random

from formula1_dataengineering_spark.operators.dedup import (
    ppjoin_exact_jaccard,
)


def _docs_df(spark, word_sets):
    rows = [
        (i, " ".join(sorted(ws))) for i, ws in enumerate(word_sets)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _brute_pairs(word_sets, threshold):
    out = {}
    for (ia, a), (ib, b) in itertools.combinations(
        enumerate(word_sets), 2
    ):
        inter = len(a & b)
        jac = inter / (len(a) + len(b) - inter)
        if jac >= threshold:
            out[(ia, ib)] = jac
    return out


def test_tau_055_exact_integer_boundary_pair_kept(spark):
    """|A|=11 ⊂ |B|=20 has Jaccard exactly 11/20 = 0.55; the unfixed
    float-ceil length filter (ceil(0.55·20)=12) drops it."""
    a = {f"shared_{i:02d}" for i in range(11)}
    b = a | {f"only_b_{i:02d}" for i in range(9)}
    got = ppjoin_exact_jaccard(
        _docs_df(spark, [a, b]), threshold=0.55, shingle_k=1
    ).collect()
    assert len(got) == 1
    (row,) = got
    assert (row["id_a"], row["id_b"]) == (0, 1)
    assert abs(row["jaccard"] - 0.55) < 1e-9


def test_tau_055_matches_bruteforce_random_corpus(spark):
    rng = random.Random(55)
    vocab = [f"w{i:03d}" for i in range(60)]
    word_sets = [
        set(rng.sample(vocab, rng.choice([10, 15, 16, 20])))
        for _ in range(30)
    ]
    expect = _brute_pairs(word_sets, 0.55)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ppjoin_exact_jaccard(
            _docs_df(spark, word_sets), threshold=0.55, shingle_k=1
        ).collect()
    }
    assert set(got) == set(expect)
    for k, jac in expect.items():
        assert abs(got[k] - jac) < 1e-6


def test_candidate_budget_guard_trips_on_dense_corpus(spark):
    # every doc shares the same tokens: prefix-token counts are the
    # corpus size, candidate bound ~ n^2/2 >> budget.
    base = {f"t{i}" for i in range(6)}
    word_sets = [base | {f"u{i}"} for i in range(30)]
    try:
        ppjoin_exact_jaccard(
            _docs_df(spark, word_sets),
            threshold=0.5,
            shingle_k=1,
            candidate_budget=10,
        )
    except ValueError as e:
        assert "candidate_budget" in str(e)
        assert "minhash_lsh" in str(e)
    else:
        raise AssertionError("budget guard did not trip")


def test_candidate_budget_guard_passes_within_budget(spark):
    word_sets = [
        {f"a{i}", f"b{i}", f"c{i}", f"d{i}"} for i in range(10)
    ]
    out = ppjoin_exact_jaccard(
        _docs_df(spark, word_sets),
        threshold=0.5,
        shingle_k=1,
        candidate_budget=1_000_000,
    ).collect()
    assert out == []  # disjoint sets: no pairs, but no guard trip
