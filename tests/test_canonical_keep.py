"""canonical_keep (operators/dedup.py) — dedicated contract tests
(VERDICT r10 items 1/3): quality ties, the missing-quality-row LEFT
join (no silent drops from an executable keep/drop list), and the
one-window plan shape."""

from __future__ import annotations


def _keep(spark, clusters, quality):
    from formula1_dataengineering_spark.operators.dedup import canonical_keep

    c = spark.createDataFrame(clusters, "doc_id long, cluster_id long")
    q = spark.createDataFrame(quality, "doc_id long, n_chars long")
    return sorted(
        (r["doc_id"], r["cluster_id"], r["canonical_id"], r["keep"])
        for r in canonical_keep(c, q).collect()
    )


def test_exactly_one_keep_per_cluster_highest_quality_wins(spark):
    got = _keep(
        spark,
        [(1, 10), (2, 10), (3, 10), (4, 20)],
        [(1, 100), (2, 300), (3, 200), (4, 50)],
    )
    assert got == [
        (1, 10, 2, False),
        (2, 10, 2, True),
        (3, 10, 2, False),
        (4, 20, 4, True),
    ]


def test_quality_ties_break_to_smallest_id(spark):
    """Equal quality: the smallest doc_id is canonical — the W1
    deterministic tie rule, never partition-order-dependent."""
    got = _keep(
        spark,
        [(5, 1), (3, 1), (9, 1)],
        [(5, 100), (3, 100), (9, 100)],
    )
    assert got == [(3, 1, 3, True), (5, 1, 3, False), (9, 1, 3, False)]


def test_missing_quality_row_stays_in_list_and_sorts_last(spark):
    """A clustered doc with NO quality row must still appear (dropping
    it is indistinguishable from 'drop' in an executable list —
    VERDICT r10 §3); null quality loses to any scored doc."""
    got = _keep(
        spark,
        [(1, 10), (2, 10), (3, 10)],
        [(1, 5), (3, 7)],  # doc 2 has no quality row
    )
    assert got == [
        (1, 10, 3, False),
        (2, 10, 3, False),  # present, not canonical
        (3, 10, 3, True),
    ]


def test_all_unscored_cluster_keeps_smallest_id(spark):
    """Every doc missing its quality row: null==null ties, smallest id
    is canonical — the list never comes back empty for a cluster."""
    got = _keep(spark, [(8, 1), (4, 1)], [(99, 1)])
    assert got == [(4, 1, 4, True), (8, 1, 4, False)]


def test_plan_is_single_cluster_window_no_join_back(spark):
    """One window over the cluster key, no rank-filter-join-back: the
    executed plan contains exactly one Window node and no self-join of
    the cluster table."""
    from formula1_dataengineering_spark.operators.dedup import canonical_keep

    c = spark.createDataFrame([(1, 1), (2, 1)], "doc_id long, cluster_id long")
    q = spark.createDataFrame([(1, 3), (2, 4)], "doc_id long, n_chars long")
    plan = (
        canonical_keep(c, q)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Window") == 1
    # The only join is the left quality attach.
    assert plan.lower().count("join") <= 1
