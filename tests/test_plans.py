"""Physical-plan regression tests — the scale properties the 100 TB
target depends on, asserted so a refactor can't silently lose them:
predicate pushdown into parquet, column pruning, broadcast dim joins,
and single-shuffle as-of joins."""

from __future__ import annotations

import pytest

from formula1_dataengineering_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def formatted_plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = formatted_plan(spark, "pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # filter reached the scan
    # column pruning: orderkey/partkey never read
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    # map-side partial aggregation (two HashAggregates around the exchange)
    assert plan.count("HashAggregate") >= 2


def _tree(plan: str) -> str:
    """Just the operator tree (the detail section re-lists operators)."""
    return plan.split("\n(1)")[0]


def test_revenue_by_nation_broadcasts_all_dims(spark):
    plan = formatted_plan(spark, "revenue_by_nation")
    assert _tree(plan).count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_asof_union_single_shuffle(spark):
    plan = formatted_plan(spark, "asof_backward_purchase")
    # the sort-based as-of: exactly one exchange feeding one window
    body = _tree(plan)
    assert body.count("Exchange") == 1
    assert body.count("Window") == 1
    # event_type filters pushed to both scans
    assert "EqualTo(event_type,view)" in plan
    assert "EqualTo(event_type,purchase)" in plan


def test_interval_join_is_broadcast_not_nested_loop(spark):
    plan = formatted_plan(spark, "interval_join_user_cohort")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_knn_gemm_scan_no_join_no_shuffle(spark):
    """Brute-force kNN scores in the scan stage: the query matrix is
    closure-broadcast into mapInPandas, so there is NO join operator at
    all, and the corpus reaches scoring without any exchange — the only
    shuffle in the query is the final tiny top-k ranking window."""
    plan = formatted_plan(spark, "knn_bruteforce")
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "MapInPandas" in plan
    pre_window = plan.split("Window")[0]
    assert "Exchange hashpartitioning" not in pre_window


def test_tire_assignment_broadcast_strategy(spark):
    """The stint as-of uses the broadcast range-join strategy — the
    small-dimension path (SURVEY §2.3 J2 at laps×stints shape)."""
    import tests.f1_fixtures as fx
    from formula1_dataengineering_spark.f1.analytics import (
        assign_tire_information,
        with_actual_lap_time,
    )

    tables = fx.build_tables(spark)
    out = assign_tire_information(with_actual_lap_time(tables["laps"]), tables["stints"])
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_salted_join_no_nested_loop(spark):
    plan = formatted_plan(spark, "salted_user_event_totals")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # salt expansion stays on the dim side: fact scans only its 3 cols
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert any("o_custkey" in r and "o_orderdate" not in r for r in reads)


def test_sliding_window_single_agg_shuffle(spark):
    plan = formatted_plan(spark, "events_sliding_10m_5m")
    body = _tree(plan)
    # window explode feeds ONE exchange (the aggregate); AQE may add a
    # read stage but never a second hash partitioning
    assert body.count("Exchange hashpartitioning") <= 1


def test_cube_partial_aggregation(spark):
    plan = formatted_plan(spark, "cube_flag_status")
    assert "Expand" in plan
    assert plan.count("HashAggregate") >= 2  # map-side partial + final


def test_centroids_pushdown(spark):
    plan = formatted_plan(spark, "label_centroids")
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "vec_id" not in read  # only label + embedding are scanned


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unbounded_join_strategy_anywhere(spark, name):
    """Catalog-wide plan hygiene: no query may compile to a cartesian
    product or broadcast nested-loop join — the two strategies whose
    cost explodes with input size. Guards every future catalog entry,
    not just the ones with dedicated plan tests."""
    plan = formatted_plan(spark, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "name", ["minhash_signatures_docs", "minhash_lsh_docs", "simhash_docs"]
)
def test_dedup_term_ids_are_inline_no_global_sort(spark, name):
    """Term ids are inline hash expressions: the plan may contain NO
    single-partition exchange and no dictionary join/sort. (Round 1
    benched a row_number-over-all-distinct-terms dictionary — a global
    sort that would serialize the whole vocabulary onto one task at
    100 TB; this pins its removal.)"""
    plan = formatted_plan(spark, name)
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    tree = _tree(plan)
    if name == "minhash_signatures_docs":
        assert "Join" not in tree  # explode -> hash -> groupBy only
        assert tree.count("Exchange") == 1
    if name == "simhash_docs":
        assert "Join" not in tree
        assert tree.count("Exchange") == 1


@pytest.mark.parametrize("name", ["ngram_jaccard_docs", "corpus_selection"])
def test_exact_jaccard_is_lsh_bounded_no_block_gemm(spark, name):
    """Exact near-dup scoring must run over LSH candidate pairs, never
    a per-block all-pairs stage: round 1 grouped by `source` and ran an
    O(B²) GEMM per block — block size grows linearly with the corpus,
    so that plan dies at 100×. The LSH plan has no applyInPandas
    (FlatMapGroupsInPandas) stage at all; scoring is array_intersect
    in codegen."""
    plan = formatted_plan(spark, name)
    assert "FlatMapGroupsInPandas" not in plan
    assert "Exchange SinglePartition" not in plan


def test_shipping_priority_topk_never_full_sorts(spark):
    """Q3-shaped global top-10 must run as TakeOrderedAndProject (per-
    partition heap of 10), never a full Sort — at 100 TB the revenue
    relation is huge and a global sort of it would be the bottleneck."""
    plan = formatted_plan(spark, "shipping_priority_top10")
    assert "TakeOrderedAndProject" in plan
    # filters reached both fact scans
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan


def test_hourly_moving_value_single_shuffle_pruned_scan(spark):
    """RANGE-frame window: exactly one exchange (hash on user_id) and a
    scan pruned to the four referenced columns — no self-join, no extra
    sort beyond the window's own."""
    plan = formatted_plan(spark, "hourly_moving_value")
    tree = _tree(plan)
    assert tree.count("Exchange") == 1
    assert "Join" not in tree
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "props" not in read_schema and "event_type" not in read_schema


def test_grouping_sets_single_aggregate_pass(spark):
    """GROUPING SETS compiles to Expand + one hash-aggregate pair, not
    one aggregation job per set."""
    plan = formatted_plan(spark, "grouping_sets_revenue")
    tree = _tree(plan)
    assert "Expand" in tree
    assert tree.count("Exchange") == 1


def test_global_packing_has_no_corpus_wide_window(spark):
    """The two-phase global cumsum: the only unpartitioned Window runs
    over the per-source aggregate (one row per source), never the
    corpus; the offsets come back via broadcast."""
    plan = formatted_plan(spark, "sequence_packing_global")
    body = _tree(plan)
    assert "BroadcastHashJoin" in body
    # Two Window nodes total: the per-source running sum (partitioned)
    # and the tiny cross-source prefix (unpartitioned, post-aggregate).
    assert body.count("Window") == 2
    # The unpartitioned window consumes an aggregated input: in the
    # detail section its child chain must contain the HashAggregate of
    # per-source totals, so no raw-scan rows reach a global sort.
    detail = plan.split("\n(1)")[1] if "\n(1)" in plan else plan
    assert "HashAggregate" in detail


@pytest.mark.parametrize(
    "name,expect",
    [
        ("doc_chunking", "struct<doc_id:bigint,text:string>"),
        ("language_quota_sample", "struct<doc_id:bigint,lang:string>"),
        ("stopword_scrub_stats", "struct<text:string,source:string>"),
        ("kmeans_ivf_training", "struct<vec_id:bigint,embedding:array<float>>"),
    ],
)
def test_curation_scans_prune_to_needed_columns(spark, name, expect):
    """Column pruning reaches the parquet scan for the curation /
    clustering queries: a documents scan that drags `text` into a
    query that only needs counts (or vice versa) is wrong at 100 TB."""
    plan = formatted_plan(spark, name)
    schemas = {
        l.strip().removeprefix("ReadSchema:").strip()
        for l in plan.splitlines()
        if "ReadSchema" in l
    }
    assert expect in schemas and len(schemas) == 1, schemas


def test_pii_scrub_stats_no_shuffle_before_aggregate(spark):
    """The scrub is pure scan-stage codegen: exactly one exchange (the
    final per-source aggregate) and a pruned documents scan."""
    plan = formatted_plan(spark, "pii_scrub_stats")
    body = _tree(plan)
    assert body.count("Exchange") == 1
    assert "Window" not in body and "SortMergeJoin" not in body
    schemas = {
        l.strip().removeprefix("ReadSchema:").strip()
        for l in plan.splitlines()
        if "ReadSchema" in l
    }
    assert schemas == {"struct<doc_id:bigint,text:string,source:string>"}
    # map-side partial aggregation around the exchange
    assert body.count("HashAggregate") >= 2


def test_span_dedup_stats_single_span_pipeline_keyed_shuffles(spark):
    """Span dedup runs the expensive span pipeline ONCE (exactly one
    Generate/explode in the plan), selects first occurrences with a
    map-side-combinable min(struct) aggregate — NO window at all, so
    even a corpus-dominating boilerplate span cannot pin one task
    (round-2 VERDICT skew note, closed) — and never resorts to a
    corpus-wide sort or an unbounded join."""
    plan = formatted_plan(spark, "span_dedup_stats")
    body = _tree(plan)
    assert body.count("Generate") == 1
    assert "Window" not in body
    assert "CartesianProduct" not in body
    assert "BroadcastNestedLoopJoin" not in body
    # map-side partial aggregation around the fingerprint exchange
    assert body.count("HashAggregate") >= 2
    schemas = {
        l.strip().removeprefix("ReadSchema:").strip()
        for l in plan.splitlines()
        if "ReadSchema" in l
    }
    # every scan pruned to exactly what its branch needs: the span
    # pipeline (id+text), and the outer doc spine (id+source+text —
    # text feeds the arithmetic n_spans and already flowed through the
    # rebuild join; only winner spans ship in the fingerprint shuffle)
    assert schemas == {
        "struct<doc_id:bigint,text:string>",
        "struct<doc_id:bigint,text:string,source:string>",
    }


def test_token_budget_sample_two_phase_no_global_sort(spark):
    """Token-budget sampling never sorts a whole language on one task:
    phase-1 window keyed (lang, md5-prefix shard), phase-2 prefix over
    the bounded shard-totals table, offsets broadcast back."""
    plan = formatted_plan(spark, "token_budget_sample_docs")
    body = _tree(plan)
    assert body.count("Window") == 2
    assert "BroadcastHashJoin" in body
    detail = plan.split("\n(1)")[1] if "\n(1)" in plan else plan
    # phase-1 partitions by the shard column, not bare lang
    assert "__shard" in detail


def test_nation_market_share_fact_fact_degrades_to_smj(spark):
    """Join-strategy contract at size (VERDICT r2 #6): the dim sides
    (supplier, nation) carry EXPLICIT broadcast hints, so they stay
    BroadcastHashJoin even when the auto-broadcast threshold is off;
    the lineitem⋈orders fact-fact join carries NO hint, so it must
    degrade to a shuffled SortMergeJoin — a hard-coded fact broadcast
    would OOM the executors at 100 TB. sf0.001 auto-broadcasts
    everything, so the threshold flip is what exposes the contract."""
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(spark, "nation_market_share")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    tree = _tree(plan)
    assert tree.count("BroadcastHashJoin") == 2  # the two hinted dims
    assert "SortMergeJoin" in tree or "ShuffledHashJoin" in tree


def test_supplier_ship_span_has_no_window_sort(spark):
    """Locks in the round-2 agg+join rewrite: first/last-of-ordered-
    frame via min_by/max_by aggregation, never a Window whose
    partition-local sort orders every supplier's lineitems on one task
    per supplier."""
    plan = formatted_plan(spark, "supplier_ship_span")
    assert "Window" not in _tree(plan)


def test_kmv_sketch_two_phase_topk_sharded(spark):
    """The KMV distinct sketch prunes per (group, hash-shard) before
    the per-group top-k re-rank: the first window must partition by the
    shard expression, and no single-partition exchange may appear (one
    group's full distinct-id set never sorts on one task)."""
    plan = formatted_plan(spark, "sketch_profile_by_type")
    body = _tree(plan)
    assert "Exchange SinglePartition" not in body
    detail = plan.split("\n(1)")[1] if "\n(1)" in plan else plan
    assert "pmod" in detail  # shard key reaches the phase-1 partitioning


def test_disjunctive_predicates_push_to_both_scans(spark):
    """Q19-shaped OR-of-ANDs: the part-only OR branch and the
    lineitem-only quantity OR branch must each reach their parquet scan
    as pushed filters — evaluating the disjunction post-join would drag
    every lineitem row through the join at 100 TB."""
    plan = formatted_plan(spark, "disjunctive_part_revenue")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert len(pushed) == 2
    li_push = next(l for l in pushed if "l_quantity" in l)
    part_push = next(l for l in pushed if "p_brand" in l)
    assert "Or(" in li_push and "Or(" in part_push


def test_partitioned_layout_prunes_directories(spark):
    """pricing_summary_partitioned (VERDICT r3 item 8): the one-year
    predicate on the hive-partitioned rewrite must resolve as
    DIRECTORY-level pruning — it appears under PartitionFilters on the
    scan, never as a post-scan data Filter, and the scan reads only the
    projected measure columns."""
    plan = formatted_plan(spark, "pricing_summary_partitioned")
    scan_lines = [
        l for l in plan.splitlines() if "PartitionFilters" in l
    ]
    assert scan_lines, "scan reports no PartitionFilters section"
    assert any("ship_year" in l and "1995" in l for l in scan_lines)
    # the partition predicate must NOT survive as a data filter (a
    # fully-pruned scan may omit the PushedFilters section entirely)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert all("ship_year" not in l for l in pushed)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema and "l_shipdate" not in read_schema
    # still a two-phase aggregate over the pruned scan
    assert plan.count("HashAggregate") >= 2


def test_cms_sketch_is_broadcast_joined(spark):
    """CMS (round 4): the d·w counter table must attach via ONE
    broadcast hash join (it is corpus-size-independent) and the plan
    needs no sort-merge join or window anywhere."""
    plan = formatted_plan(spark, "cms_term_frequency_estimates")
    tree = _tree(plan)
    assert tree.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in tree
    assert "Window" not in tree


def test_semantic_dedup_single_gemm_stage(spark):
    """SemDeDup (round 4): within-cluster scoring is exactly ONE
    applyInPandas GEMM stage — vectors shuffle once into clusters,
    pairs never materialize JVM-side."""
    plan = formatted_plan(spark, "semantic_dedup_embeddings")
    tree = _tree(plan)
    assert tree.count("InPandas") == 1
    assert "CartesianProduct" not in plan


def test_pagerank_no_window_no_cartesian(spark):
    """PageRank (round 4): three unrolled iterations of join+aggregate;
    no window, no cartesian, and the 1-row node-count frames attach as
    broadcast hash joins (the single-valued-key trick)."""
    plan = formatted_plan(spark, "supplier_pagerank")
    tree = _tree(plan)
    assert "Window" not in tree
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert tree.count("BroadcastHashJoin") >= 4


def test_bucketed_colocated_revenue_joins_without_exchange(spark):
    """bucketed_colocated_revenue (round 4): with broadcast disabled
    (the 100 TB regime — at test scale the optimizer rightly broadcasts
    the tiny customer side), the sort-merge join must consume the
    bucketed scans DIRECTLY: no Exchange between scan and join, the
    write-time shuffle having paid for it. Only the final segment
    aggregate may exchange."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    except Exception:
        prev_aqe = None
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        plan = formatted_plan(spark, "bucketed_colocated_revenue")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    tree = _tree(plan)
    assert "SortMergeJoin" in tree
    # the tree prints root-first: everything BELOW the join (its two
    # bucketed scan inputs) must be exchange-free
    below_join = tree.split("SortMergeJoin")[1]
    assert "Exchange" not in below_join
    assert tree.count("Exchange") <= 1


def test_table_profile_approx_single_scan_profile(spark):
    """table_profile_approx (round 5): the HLL profile itself must be
    ONE scan with no Expand — the sketches fold into a single partial
    aggregate. (On this Spark the exact twin's multi-countDistinct is
    rewritten into 6 per-column re-aggregations = 6 scans rather than
    an Expand; either way the exact default is a multi-pass/multiplied
    shape at 100 TB.) The gate's full plan = 1 profile scan + 6
    exact-verification side scans (gate-only, documented), broadcast-
    joined by column name; nothing Expands and nothing goes
    nested-loop."""
    plan = formatted_plan(spark, "table_profile_approx")
    tree = _tree(plan)
    assert "Expand" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert tree.count("Scan parquet") == 7
    exact_tree = _tree(formatted_plan(spark, "table_profile_stats"))
    assert exact_tree.count("Scan parquet") >= 6


def test_skyline_window_runs_over_length_summary_only(spark):
    """doc_skyline_frontier (round-6 rewrite, VERDICT r5 item 1): the
    suffix-max window must consume the per-length AGGREGATE (one row
    per distinct n_tokens), never the raw document table — an
    unpartitioned window over the corpus moves every row through a
    single task at 100 TB. Pin the two-phase shape: exactly one Window,
    fed by a HashAggregate keyed on n_tokens, joined back by broadcast."""
    plan = formatted_plan(spark, "doc_skyline_frontier")
    tree = _tree(plan)
    assert "BroadcastHashJoin" in tree
    assert tree.count("Window") == 1
    # Root-first tree: the lines below "Window" are its input chain —
    # an aggregation must appear there BEFORE the branch's parquet
    # scan, so only summary rows ever reach the single-partition sort.
    below_window = tree.split("Window")[1]
    agg_pos = below_window.find("HashAggregate")
    scan_pos = below_window.find("Scan parquet")
    assert agg_pos != -1 and scan_pos != -1 and agg_pos < scan_pos, tree
    # And the summary branch's scan is pruned to the one needed column.
    assert "ReadSchema: struct<text:string>" in plan


def test_variant_null_field_round_trip(spark):
    """to_json drops NULL struct fields; variant_get of the omitted
    path must come back NULL (not 0), and try_variant_get of a
    never-present path is NULL on every row — the null contract the
    variant gate's aggregate relies on."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 2.5), (2, None)], "uid long, value double"
    )
    payload = F.to_json(
        F.struct(F.struct(F.col("value").alias("v")).alias("m"))
    )
    out = df.select(
        "uid",
        F.variant_get(F.parse_json(payload), "$.m.v", "double").alias("v"),
        F.try_variant_get(
            F.parse_json(payload), "$.nope", "int"
        ).alias("miss"),
    ).collect()
    got = {r["uid"]: (r["v"], r["miss"]) for r in out}
    assert got == {1: (2.5, None), 2: (None, None)}


def test_python_datasource_pushdown_consumed_and_correct(spark):
    """Python Data Source API: pushed filters vanish from the
    post-optimization Filter node (the source consumed them), the
    unsupported residue (isnotnull) stays Spark-side, and the scan
    yields exactly the pushed-down row set."""
    from pyspark.sql import functions as F

    from formula1_dataengineering_spark.sources.pydatasource import (
        SyntheticEventsDataSource,
    )

    from formula1_dataengineering_spark.session import scoped_conf

    spark.dataSource.register(SyntheticEventsDataSource)
    with scoped_conf(
        spark, {"spark.sql.python.filterPushdown.enabled": "true"}
    ):
        df = (
            spark.read.format("synthetic_events")
            .option("n_rows", 100)
            .option("n_partitions", 3)
            .load()
            .where((F.col("typ") == "view") & (F.col("id") >= 10))
        )
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "view" not in opt and ">= 10" not in opt  # consumed
        assert "isnotnull" in opt  # unsupported residue re-applied
        rows = sorted(r["id"] for r in df.collect())
    assert rows == [i for i in range(10, 100) if i % 5 == 1]


def test_python_datasource_reader_filter_logic():
    """Reader-level pushdown unit: id bounds tighten, contradictory
    type equalities empty the scan, unsupported filters are yielded
    back untouched."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        IsNotNull,
        LessThan,
    )

    from formula1_dataengineering_spark.sources.pydatasource import (
        SyntheticEventsReader,
    )

    r = SyntheticEventsReader({"n_rows": "1000"})
    residual = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("id",), 100),
                GreaterThanOrEqual(("id",), 50),  # weaker, ignored
                LessThan(("id",), 800),
                EqualTo(("typ",), "click"),
                IsNotNull(("typ",)),  # unsupported -> back to Spark
            ]
        )
    )
    assert (r.id_lo, r.id_hi, r.typ) == (100, 800, "click")
    assert len(residual) == 1 and isinstance(residual[0], IsNotNull)
    r2 = SyntheticEventsReader({"n_rows": "10"})
    list(r2.pushFilters([EqualTo(("typ",), "a"), EqualTo(("typ",), "b")]))
    assert r2.id_hi <= r2.id_lo  # contradictory equality: empty scan


def test_python_sink_commit_protocol_atomicity(spark, tmp_path):
    """Custom Python sink two-phase commit: a successful job publishes
    part files + manifest whose counts equal the data; a job with an
    injected task failure leaves NO manifest and no part files (abort
    removed the staged temps) — readers keyed on the manifest never
    observe partial output. Staged-temp residue after an abort is NOT
    asserted zero: Spark kills a failed job's still-running tasks
    asynchronously, so a straggler can stage its temp AFTER abort()'s
    sweep (a real flake before the job-setup sweep existed). The
    recovery contract asserted below — the next write job's setup
    removes stale temps, ending with exactly manifest + parts — still
    needs job-1 zombies gone before job 2 PLANS, so the test polls
    the directory to quiescence first (zombies here raise on their
    first row, so the window is milliseconds; the poll makes it
    practically zero rather than theoretically zero)."""
    import json
    import os

    from formula1_dataengineering_spark.sources.pydatasource import (
        JsonlManifestDataSource,
    )

    spark.dataSource.register(JsonlManifestDataSource)
    ok_dir = str(tmp_path / "ok")
    df = spark.range(100).selectExpr("id", "id % 3 AS k")
    df.write.format("jsonl_manifest").option("path", ok_dir).mode(
        "append"
    ).save()
    manifest = json.load(open(os.path.join(ok_dir, "_MANIFEST.json")))
    assert sum(p["rows"] for p in manifest["parts"]) == 100
    for p in manifest["parts"]:
        n = sum(1 for _ in open(os.path.join(ok_dir, p["file"])))
        assert n == p["rows"]
    # A clean job never leaves temps: every committed temp was
    # renamed away, and commit() sweeps failed-ATTEMPT residue (task
    # retries under spark.task.maxFailures>1 stage a temp, die, and
    # the retry succeeds — the job never aborts, so only commit can
    # clean it). Simulate that residue directly:
    open(os.path.join(ok_dir, "_tmp-failedattempt.jsonl"), "w").close()
    df.write.format("jsonl_manifest").option("path", ok_dir).mode(
        "append"
    ).save()
    assert not [
        f for f in os.listdir(ok_dir) if f.startswith("_tmp-")
    ]

    bad_dir = str(tmp_path / "bad")
    import pytest

    with pytest.raises(Exception):
        df.write.format("jsonl_manifest").option("path", bad_dir).option(
            "fail_in_write", "true"
        ).mode("append").save()
    left = os.listdir(bad_dir) if os.path.isdir(bad_dir) else []
    # The atomicity contract: nothing a reader keys on exists.
    assert "_MANIFEST.json" not in left
    assert not [f for f in left if f.startswith("part-")]

    # Wait out job-1 zombie stragglers: the directory listing must be
    # stable for a beat before the recovery job plans (a zombie that
    # staged its temp after abort's sweep has then already done so).
    import time

    prev = None
    for _ in range(20):
        cur = sorted(os.listdir(bad_dir)) if os.path.isdir(bad_dir) else []
        if cur == prev:
            break
        prev = cur
        time.sleep(0.25)

    # Recovery contract: writing the same directory again first sweeps
    # any zombie-task residue (job-setup sweep), then publishes — the
    # final state is exactly the manifest plus its part files.
    df.write.format("jsonl_manifest").option("path", bad_dir).mode(
        "append"
    ).save()
    after = sorted(os.listdir(bad_dir))
    manifest = json.load(open(os.path.join(bad_dir, "_MANIFEST.json")))
    assert sum(p["rows"] for p in manifest["parts"]) == 100
    assert after == sorted(
        ["_MANIFEST.json"] + [p["file"] for p in manifest["parts"]]
    )


def test_map_in_arrow_norms_handles_empty_rows(spark):
    """mapInArrow norm kernel: empty embedding rows get norm 0 (the
    reduceat repeated-offset hazard), values upcast before squaring."""
    from pyspark.sql import functions as F

    from formula1_dataengineering_spark.functions.vectors import (
        norms_map_in_arrow,
    )

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, []), (3, [0.5])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: r["norm"]
        for r in norms_map_in_arrow(df)
        .select("vec_id", F.round("norm", 6).alias("norm"))
        .collect()
    }
    assert got == {1: 5.0, 2: 0.0, 3: 0.5}


def test_jsonl_corrupt_record_handling(spark, tmp_path):
    """Ingest robustness: PERMISSIVE mode surfaces corrupt JSONL lines
    in _corrupt_record (good rows parse, bad rows null-fill),
    DROPMALFORMED silently drops them, FAILFAST raises — the three
    contracts a 100 TB dirty-dump ingest chooses between."""
    import pytest

    p = tmp_path / "dirty.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok one"}\n'
        "{not json at all\n"
        '{"doc_id": 2, "text": "ok two"}\n'
        '{"doc_id": "NaN-ish", "text": 3}\n'
    )
    schema = (
        "doc_id long, text string, _corrupt_record string"
    )
    df = spark.read.schema(schema).json(str(p))
    rows = df.collect()
    good = {r["doc_id"] for r in rows if r["_corrupt_record"] is None}
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert good == {1, 2}
    assert len(bad) == 2  # the unparseable line and the type mismatch
    dropped = (
        spark.read.schema("doc_id long, text string")
        .option("mode", "DROPMALFORMED")
        .json(str(p))
    )
    assert {r["doc_id"] for r in dropped.collect()} == {1, 2}
    with pytest.raises(Exception):
        spark.read.schema("doc_id long, text string").option(
            "mode", "FAILFAST"
        ).json(str(p)).collect()
