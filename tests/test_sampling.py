"""Sampling determinism and sketch-aggregate accuracy bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from formula1_dataengineering_spark.operators.sampling import (
    deterministic_sample_per_group,
    sketch_profile,
    stratified_sample,
)
from formula1_dataengineering_spark.sources.catalog import load

SF = "/root/testdata/sf0.01"


def test_stratified_sample_fractions_and_determinism(spark):
    e = load(spark, SF, "events")
    fr = {"view": 0.2, "click": 0.5}
    s1 = stratified_sample(e, "event_type", fr, seed=7)
    s2 = stratified_sample(e, "event_type", fr, seed=7)
    ids1 = sorted(r["event_id"] for r in s1.select("event_id").collect())
    ids2 = sorted(r["event_id"] for r in s2.select("event_id").collect())
    assert ids1 == ids2  # same seed -> same membership
    counts = {
        r["event_type"]: r["n"]
        for r in s1.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) <= {"view", "click"}  # unlisted strata excluded
    for t, frac in fr.items():
        assert abs(counts.get(t, 0) / totals[t] - frac) < 0.1


def test_deterministic_sample_per_group(spark):
    e = load(spark, SF, "events")
    s1 = deterministic_sample_per_group(e, "event_type", "event_id", k=10)
    s2 = deterministic_sample_per_group(
        e.repartition(7), "event_type", "event_id", k=10
    )
    g1 = sorted((r["event_type"], r["event_id"]) for r in s1.collect())
    g2 = sorted((r["event_type"], r["event_id"]) for r in s2.collect())
    assert g1 == g2  # partitioning-independent membership
    per_group = {
        r["event_type"]: r["n"]
        for r in s1.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert all(n == 10 for n in per_group.values())


def test_sketch_profile_bounds(spark):
    e = load(spark, SF, "events")
    prof = {r["event_type"]: r for r in sketch_profile(e, "event_type", "value", "user_id").collect()}
    exact = {
        r["event_type"]: r
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("ids"),
            F.percentile("value", F.lit(0.5)).alias("p50"),
        )
        .collect()
    }
    for t, row in prof.items():
        assert abs(row["approx_ids"] - exact[t]["ids"]) <= max(3, 0.15 * exact[t]["ids"])
        p50_lo, p50_hi = (
            exact[t]["p50"] - abs(exact[t]["p50"]) * 0.1 - 1,
            exact[t]["p50"] + abs(exact[t]["p50"]) * 0.1 + 1,
        )
        assert p50_lo <= row["approx_p50_p95"][0] <= p50_hi
