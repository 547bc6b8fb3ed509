"""Bucketed-layout plan regression: the write-once shuffle actually
removes the per-query Exchange (the 100 TB co-located-join contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_dataengineering_spark.sources.bucketing import (
    colocated_join,
    write_bucketed,
)
from formula1_dataengineering_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    write_bucketed(
        load(spark, SF, "orders"),
        "b_orders",
        ["o_custkey"],
        n_buckets=4,
        path=str(wh / "b_orders"),
    )
    write_bucketed(
        load(spark, SF, "customer").withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        ["o_custkey"],
        n_buckets=4,
        path=str(wh / "b_customer"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    # force the sort-merge path (broadcast would hide the exchange question)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "b_orders", "b_customer", ["o_custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_join_correct(spark, bucketed_tables):
    joined = colocated_join(spark, "b_orders", "b_customer", ["o_custkey"])
    plain = load(spark, SF, "orders").join(
        load(spark, SF, "customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    assert joined.count() == plain.count()


def test_partitioned_write_prunes_directories(spark, tmp_path):
    from formula1_dataengineering_spark.sources.bucketing import write_partitioned
    from formula1_dataengineering_spark.sources.catalog import load
    from pyspark.sql import functions as F

    ev = load(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(ev, path, ["event_type"])

    back = spark.read.parquet(path)
    q = back.where(F.col("event_type") == "click")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the filter must become a PartitionFilter (directory pruning),
    # not a data Filter evaluated per row
    assert "PartitionFilters: [" in plan and "event_type" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0]
    # pruned read returns exactly the partition's rows
    want = ev.where(F.col("event_type") == "click").count()
    assert q.count() == want
