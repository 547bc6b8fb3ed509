"""Differential tests: asof_join vs pandas ``merge_asof`` — the
reference's own implementation (src/session_object.py:62, :248) used as
a randomized oracle across directions × strategies × seeds.

Right (by, on) pairs are made unique (pandas' winner among exact
duplicates is sort-order-dependent, ours is tie-break-deterministic),
and left/right on-grids are interleaved even/odd so "nearest" never
sees an exact distance tie (pandas and this engine both prefer
backward, but staying off the boundary keeps the test sharp).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from formula1_dataengineering_spark.operators.asof import asof_join


def _frames(seed: int, with_by: bool):
    rng = np.random.default_rng(seed)
    n_left, n_right = 60, 40
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 4, n_left) if with_by else np.zeros(n_left, dtype="int64"),
            "on": (rng.integers(0, 500, n_left) * 2).astype("int64"),
            "lid": np.arange(n_left, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 4, n_right) if with_by else np.zeros(n_right, dtype="int64"),
            "on": (rng.integers(0, 500, n_right) * 2 + 1).astype("int64"),
            "val": rng.integers(0, 100, n_right).astype("int64"),
        }
    )
    right = right.drop_duplicates(subset=["k", "on"], keep="first").reset_index(drop=True)
    return left, right


def _pandas_asof(left, right, direction, with_by, tolerance=None):
    kwargs = dict(on="on", direction=direction)
    if with_by:
        kwargs["by"] = "k"
    if tolerance is not None:
        kwargs["tolerance"] = tolerance
    out = pd.merge_asof(
        left.sort_values("on", kind="stable"),
        right.sort_values("on", kind="stable"),
        **kwargs,
    )
    return dict(zip(out["lid"], out["val"]))


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("strategy", ["union", "broadcast"])
@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("with_by", [True, False])
def test_asof_join_matches_pandas(spark, direction, strategy, seed, with_by):
    left, right = _frames(seed, with_by)
    want = _pandas_asof(left, right, direction, with_by)

    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    got_rows = asof_join(
        sl,
        sr,
        on="on",
        by="k" if with_by else None,
        direction=direction,
        right_cols=["val"],
        strategy=strategy,
    ).collect()
    assert len(got_rows) == len(left)  # every left row exactly once
    got = {r["lid"]: r["val"] for r in got_rows}
    for lid, w in want.items():
        g = got[lid]
        if pd.isna(w):
            assert g is None, f"lid={lid}: expected no match, got {g}"
        else:
            assert g == w, f"lid={lid}: expected {w}, got {g}"


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_tied_on_right_rows_same_winner_both_strategies(spark, direction):
    """Multiple right rows sharing the same (by, on): both physical
    strategies must pick the SAME winner (greatest carried payload) —
    round 1's union strategy picked the smallest in the forward
    direction, so strategy choice silently changed results on tied
    keys."""
    left = pd.DataFrame({"k": [1, 1, 2], "on": [10, 20, 10], "lid": [0, 1, 2]})
    right = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2],
            "on": [15, 15, 15, 5, 5],
            "val": [7, 3, 9, 2, 8],
        }
    )
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
    results = {}
    for strategy in ("union", "broadcast"):
        rows = asof_join(
            sl, sr, on="on", by="k", direction=direction,
            right_cols=["val"], strategy=strategy,
        ).collect()
        results[strategy] = {r["lid"]: (r["on_right"], r["val"]) for r in rows}
    assert results["union"] == results["broadcast"]
    # the documented winner among ties: greatest payload
    matched = [v for v in results["union"].values() if v[1] is not None]
    assert all(val == 9 or val == 8 for _, val in matched)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_tolerance_matches_pandas(spark, direction):
    from pyspark.sql import functions as F

    left, right = _frames(7, True)
    tol = 50
    want = _pandas_asof(left, right, direction, True, tolerance=tol)
    got = {
        r["lid"]: r["val"]
        for r in asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="on",
            by="k",
            direction=direction,
            tolerance=F.lit(tol),
            right_cols=["val"],
        ).collect()
    }
    for lid, w in want.items():
        g = got[lid]
        if pd.isna(w):
            assert g is None
        else:
            assert g == w


def test_null_keys_agree_across_strategies(spark):
    """Null `on`/`by` keys: no match given, no match received — both
    strategies, all directions (pandas merge_asof drops NaN keys; the
    broadcast range predicate propagates null to no-match; the union
    sort must not hand a null-key row a neighbor's payload)."""
    from formula1_dataengineering_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (2, None, 200), (3, 30, None), (4, 40, 400)],
        "lid int, t int, g int",
    )
    right = spark.createDataFrame(
        [(5, 8, 100), (6, None, 100), (7, 35, None), (8, 39, 400)],
        "rid int, t int, g int",
    )
    for direction in ("backward", "forward", "nearest"):
        results = {}
        for strategy in ("union", "broadcast"):
            rows = asof_join(
                left, right, on="t", by="g",
                direction=direction, strategy=strategy,
            ).collect()
            results[strategy] = sorted(
                (r.lid, r.rid, r.t_right) for r in rows
            )
        assert results["union"] == results["broadcast"], (
            direction, results,
        )
        # null-key left rows never matched
        by_lid = {r[0]: r for r in results["union"]}
        assert by_lid[2][1] is None and by_lid[3][1] is None
