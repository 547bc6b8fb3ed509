"""Unit tests: connected components (min-label propagation) and the
salted skew join's semantic transparency."""

from __future__ import annotations

from pyspark.sql import functions as F

from formula1_dataengineering_spark.operators.graph import connected_components
from formula1_dataengineering_spark.operators.skew import salted_join


import pytest


# small_graph_edges=0 forces the distributed iterative path; the default
# takes the driver-side union-find path. Both must agree exactly.
@pytest.mark.parametrize("small", [0, None])
def test_connected_components_chain_and_islands(spark, small):
    # chain 1-2-3-4, island 10-11, self-contained 20-20 (self loop)
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 20)], ["src", "dst"]
    )
    kw = {} if small is None else {"small_graph_edges": small}
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, **kw).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


@pytest.mark.parametrize("small", [0, None])
def test_connected_components_long_path_converges(spark, small):
    # a 12-node path needs multiple propagation rounds end to end
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["src", "dst"]
    )
    kw = {} if small is None else {"small_graph_edges": small}
    comp = connected_components(edges, **kw)
    assert comp.select("component").distinct().count() == 1
    assert comp.agg(F.min("component")).first()[0] == 0
    assert comp.count() == 13


def test_connected_components_paths_agree_on_random_graph(spark):
    # differential: both strategies produce identical labelings
    import random

    rng = random.Random(7)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    small = sorted(connected_components(edges).collect())
    big = sorted(connected_components(edges, small_graph_edges=0).collect())
    assert small == big


def test_salted_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(k, v) for k in ("hot", "hot", "hot", "cold") for v in range(5)],
        ["k", "v"],
    )
    dim = spark.createDataFrame(
        [("hot", 1), ("cold", 2), ("absent", 3)], ["k", "grp"]
    )
    got = sorted(salted_join(fact, dim, ["k"], n_salt=4).collect())
    want = sorted(fact.join(dim, ["k"]).collect())
    assert got == want
    # every salt value is exercised on the dim side
    salted_dim_rows = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(3)).cast("array<bigint>")),
    ).count()
    assert salted_dim_rows == 12


def test_salted_join_left_keeps_unmatched(spark):
    fact = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    dim = spark.createDataFrame([("a", 10)], ["k", "grp"])
    rows = sorted(
        salted_join(fact, dim, ["k"], n_salt=2, how="left").collect()
    )
    assert [(r["k"], r["grp"]) for r in rows] == [("a", 10), ("b", None)]


def test_minhash_fast_mode_invariants(spark):
    """The xxhash64 (dictionary-free) id path — the 100 TB scale mode.
    No SQL oracle can reproduce xxhash64, so invariants stand in:
    exact-duplicate texts must collide on full signatures and surface
    as LSH candidates with est_jaccard = 1."""
    from formula1_dataengineering_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),   # exact dup of 1
            (3, "epsilon zeta eta theta"),
            (4, "completely different words here"),
        ],
        ["doc_id", "text"],
    )
    sig = minhash_signatures(docs, num_hashes=8, shingle_k=2, mode="fast")
    rows = {r["doc_id"]: tuple(r[f"sig_{i}"] for i in range(8)) for r in sig.collect()}
    assert len(rows) == 4
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]

    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(
            docs, num_hashes=8, bands=4, shingle_k=2, mode="fast"
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0


def test_connected_components_empty_edges(spark):
    """Degenerate input must not crash convergence detection (the max
    over zero rows is NULL)."""
    from pyspark.sql import types as T

    empty = spark.createDataFrame(
        [],
        T.StructType(
            [T.StructField("src", T.LongType()), T.StructField("dst", T.LongType())]
        ),
    )
    assert connected_components(empty).count() == 0


def test_small_path_type_faithful_for_string_ids(spark):
    """The driver union-find path must honor any node type, not just
    dense ints — same contract as the distributed path."""
    from formula1_dataengineering_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    out = {r.node: r.component for r in connected_components(edges).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_null_edge_endpoints_dropped_identically(spark):
    """Null endpoints are defined out of the graph before strategy
    dispatch, so both paths agree on them."""
    from formula1_dataengineering_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None), (5, 6)], "src long, dst long"
    )
    for small in (10**6, 0):  # driver path, then distributed path
        out = {
            r.node: r.component
            for r in connected_components(
                edges, small_graph_edges=small
            ).collect()
        }
        assert out == {1: 1, 2: 1, 5: 5, 6: 5}, (small, out)
