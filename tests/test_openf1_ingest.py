"""Ingestion layer: retry policy, schema-bound JSON decode, partitioned
write → readable by the query layer."""

from __future__ import annotations

import json

import pytest

from formula1_dataengineering_spark.sources.openf1 import (
    TransientError,
    fetch_with_retry,
    ingest_json_records,
    write_partitioned,
)


def test_retry_then_success():
    calls = {"n": 0}
    sleeps = []

    def flaky(url, params):
        calls["n"] += 1
        if calls["n"] < 3:
            raise TransientError("429")
        return b'[{"x": 1}]'

    out = fetch_with_retry(flaky, "http://api/v1/laps", {}, sleeper=sleeps.append)
    assert out == b'[{"x": 1}]'
    assert calls["n"] == 3 and sleeps == [5.0, 5.0]


def test_retry_gives_up():
    def always_429(url, params):
        raise TransientError("429")

    with pytest.raises(TimeoutError, match="gave up"):
        fetch_with_retry(always_429, "u", {}, max_retries=2, sleeper=lambda s: None)


def test_empty_payload_raises():
    with pytest.raises(ValueError, match="empty payload"):
        fetch_with_retry(lambda u, p: b"[]", "u", {}, sleeper=lambda s: None)


def test_ingest_schema_contract(spark):
    payload = json.dumps(
        [
            # extra field dropped; missing fields → null
            {"session_key": 9001, "driver_number": 1, "name_acronym": "VER",
             "team_colour": "123456", "bogus_field": "ignored"},
            {"session_key": 9001, "driver_number": 2},
        ]
    ).encode()
    df = ingest_json_records(spark, "drivers", [payload])
    rows = {r["driver_number"]: r for r in df.collect()}
    assert rows[1]["name_acronym"] == "VER"
    assert rows[2]["name_acronym"] is None
    assert "bogus_field" not in df.columns


def test_partitioned_roundtrip(spark, tmp_path):
    payload = json.dumps(
        [
            {"session_key": 9001, "driver_number": 1, "lap_number": 1,
             "duration_sector_1": 30.0, "duration_sector_2": 30.0,
             "duration_sector_3": 32.5, "is_pit_out_lap": False},
            {"session_key": 9002, "driver_number": 1, "lap_number": 1,
             "duration_sector_1": 31.0, "duration_sector_2": 29.0,
             "duration_sector_3": 30.0, "is_pit_out_lap": True},
        ]
    ).encode()
    df = ingest_json_records(spark, "laps", [payload])
    write_partitioned(df, "laps", str(tmp_path))
    back = spark.read.parquet(str(tmp_path / "laps.parquet"))
    assert back.count() == 2
    # partition pruning works on the layout
    pruned = back.where(back.session_key == 9001)
    assert pruned.count() == 1
    assert "session_key=9001" in str(
        (tmp_path / "laps.parquet").iterdir().__next__().name
    ) or any("session_key=" in p.name for p in (tmp_path / "laps.parquet").iterdir())


def test_partition_pruning_visible_in_plan(spark, tmp_path):
    """The session_key filter must prune PARTITIONS (directory level),
    not just rows — the 100 TB telemetry-layout contract."""
    payload = json.dumps(
        [
            {"session_key": k, "driver_number": d, "lap_number": 1,
             "duration_sector_1": 30.0, "duration_sector_2": 30.0,
             "duration_sector_3": 32.5, "is_pit_out_lap": False}
            for k in (9001, 9002, 9003)
            for d in (1, 2)
        ]
    ).encode()
    write_partitioned(ingest_json_records(spark, "laps", [payload]), "laps", str(tmp_path))
    pruned = spark.read.parquet(str(tmp_path / "laps.parquet")).where(
        "session_key = 9002"
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "session_key" in plan.split("PartitionFilters", 1)[1][:120]
    assert pruned.count() == 2
