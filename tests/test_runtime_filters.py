"""Runtime scan-reduction plan evidence: dynamic partition pruning and
bloom-filter runtime joins — the two Catalyst features that cut a
100 TB fact scan at RUNTIME using the dim side's actual rows, where
static pushdown can't (the selective predicate lives on non-join dim
columns).

Both are plan-pinned the way the layout trilogy is: the feature must
appear in the formatted plan, not just be enabled in conf.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F

from formula1_dataengineering_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"


@contextlib.contextmanager
def _confs(spark, kv):
    old = {}
    for k, v in kv.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _formatted(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_dynamic_partition_pruning_injects_runtime_subquery(spark, tmp_path):
    """A join between the ship_year-partitioned fact and a dim filtered
    on a NON-join column (so no static year constant can be inferred)
    must inject a dynamicpruning subquery on the partition column —
    the fact directories are chosen at runtime from the dim's actual
    years."""
    path = str(tmp_path / "li_by_year")
    li = load(spark, SF, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    li.write.mode("overwrite").partitionBy("ship_year").parquet(path)
    part = spark.read.parquet(path)
    dim = (
        load(spark, SF, "orders")
        .select(
            F.year("o_orderdate").alias("ship_year"), "o_orderpriority"
        )
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("ship_year")
        .distinct()
    )
    with _confs(
        spark,
        {
            "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
            # at fixture scale the stats-based benefit estimate says
            # "not worth it"; disable stats so the structural decision
            # (partition col joined to a filtered dim) drives injection
            "spark.sql.optimizer.dynamicPartitionPruning.useStats": "false",
            "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio": "10.0",
        },
    ):
        j = part.join(dim, "ship_year").groupBy().agg(
            F.sum("l_quantity").alias("q")
        )
        plan = _formatted(j)
        assert "dynamicpruning" in plan.lower(), plan[:1500]
        # and it executes correctly under the runtime filter
        got = j.first()["q"]
    want = (
        li.join(dim, "ship_year").groupBy().agg(F.sum("l_quantity")).first()[0]
    )
    assert got == want


def test_bloom_runtime_filter_guards_fact_scan(spark):
    """With the dim too big to broadcast (forced SMJ), Catalyst must
    build a bloom filter from the dim's join keys and guard the fact
    scan with might_contain — rows whose keys can't match never reach
    the shuffle. This is THE runtime defense for selective dim joins
    at 100 TB when the dim outgrows broadcast."""
    li = load(spark, SF, "lineitem")
    dim = load(spark, SF, "part").where(F.col("p_brand") == "Brand#1")
    with _confs(
        spark,
        {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            # fixture-scale thresholds: any application side qualifies,
            # creation side must still be bounded
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        j = li.join(dim, li.l_partkey == dim.p_partkey).groupBy().agg(
            F.round(F.sum("l_extendedprice"), 2).alias("rev")
        )
        plan = _formatted(j)
        assert "might_contain" in plan.lower(), plan[:1500]
        assert "bloom_filter_agg" in plan.lower()
        got = j.first()["rev"]
    want = (
        li.join(F.broadcast(dim), li.l_partkey == dim.p_partkey)
        .groupBy()
        .agg(F.round(F.sum("l_extendedprice"), 2))
        .first()[0]
    )
    assert got == want
