"""Versioned-manifest snapshot layer (operators/snapshot.py, round 16
— VERDICT r15 item 2): COW commits publish a new manifest instead of
swapping partition dirs in place, so readers NEVER hit a marker
outage — a snapshot resolved before a commit stays exactly readable
after it, until vacuum retires it."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from formula1_dataengineering_spark.operators import snapshot
from formula1_dataengineering_spark.operators.deletion import (
    delete_scd2_feed_keys,
)
from formula1_dataengineering_spark.operators.scd import (
    read_scd2_feed,
    write_scd2_feed,
)
from formula1_dataengineering_spark.operators.vacuum import vacuum_layout


def _feed(spark, path, n_shards=2):
    rows = [(i % 4, 1000 + i, "x") for i in range(32)]
    feed = spark.createDataFrame(rows, "k long, ts long, v string")
    write_scd2_feed(feed, path, "k", "ts", "v", n_shards=n_shards)


def _keys(spark, *ks):
    return spark.createDataFrame([(k,) for k in ks], "k long")


def test_cow_commit_never_touches_marker_and_bumps_version(
    spark, tmp_path
):
    path = str(tmp_path / "feed")
    _feed(spark, path)
    assert snapshot.current_version(spark, path) == 0
    marker = os.path.join(path, "_SUCCESS")
    mtime = os.path.getmtime(marker)
    info = delete_scd2_feed_keys(spark, path, _keys(spark, 1))
    assert info["rows_deleted"] == 8
    assert os.path.getmtime(marker) == mtime  # marker never rewritten
    assert snapshot.current_version(spark, path) == 1
    after, _ = read_scd2_feed(spark, path)
    assert after.where("k = 1").count() == 0
    assert after.count() == 24


def test_time_travel_reads_each_snapshot_exactly(spark, tmp_path):
    """Reader resolved 'before the swap' = an older snapshot version:
    still byte-readable after later commits; version 0 is the
    original base."""
    path = str(tmp_path / "feed")
    _feed(spark, path)
    delete_scd2_feed_keys(spark, path, _keys(spark, 1))  # -> v1
    delete_scd2_feed_keys(spark, path, _keys(spark, 2))  # -> v2
    cur, _ = read_scd2_feed(spark, path)
    assert sorted(
        r.k for r in cur.select("k").distinct().collect()
    ) == [0, 3]
    v1, _ = read_scd2_feed(spark, path, snapshot_version=1)
    assert sorted(
        r.k for r in v1.select("k").distinct().collect()
    ) == [0, 2, 3]
    v0, _ = read_scd2_feed(spark, path, snapshot_version=0)
    assert sorted(
        r.k for r in v0.select("k").distinct().collect()
    ) == [0, 1, 2, 3]
    assert v0.count() == 32 and v1.count() == 24 and cur.count() == 16


def test_vacuum_class5_retires_old_snapshots_only(spark, tmp_path):
    path = str(tmp_path / "feed")
    _feed(spark, path)
    delete_scd2_feed_keys(spark, path, _keys(spark, 1))  # -> v1
    delete_scd2_feed_keys(spark, path, _keys(spark, 2))  # -> v2
    want = sorted(
        map(
            tuple,
            read_scd2_feed(spark, path)[0]
            .select("k", "ts", "v")
            .collect(),
        )
    )
    info = vacuum_layout(spark, path)
    assert info["snapshots_retired"] == 1  # v1 manifest gone
    assert info["version_dirs_removed"] >= 1
    assert snapshot.current_version(spark, path) == 2
    # Current snapshot byte-identical after the sweep.
    got = sorted(
        map(
            tuple,
            read_scd2_feed(spark, path)[0]
            .select("k", "ts", "v")
            .collect(),
        )
    )
    assert got == want
    # Old snapshots are retired — exactly "readable until vacuumed".
    with pytest.raises(ValueError, match="no snapshot manifest v1"):
        read_scd2_feed(spark, path, snapshot_version=1)
    # Idempotent: a second sweep finds nothing of class 5.
    info2 = vacuum_layout(spark, path)
    assert info2["snapshots_retired"] == 0
    assert info2["version_dirs_removed"] == 0


def test_collapse_folds_versions_into_plain_dirs(spark, tmp_path):
    path = str(tmp_path / "feed")
    _feed(spark, path)
    delete_scd2_feed_keys(spark, path, _keys(spark, 1))
    want = sorted(
        map(
            tuple,
            read_scd2_feed(spark, path)[0]
            .select("k", "ts", "v")
            .collect(),
        )
    )
    assert snapshot.collapse_snapshot(spark, path)
    assert snapshot.current_version(spark, path) == 0
    # Plain directories now hold the whole truth.
    names = os.listdir(os.path.join(path, "feed_rows"))
    assert not any(
        n.startswith(snapshot.VERSION_DIR_PREFIX) for n in names
    )
    got = sorted(
        map(
            tuple,
            read_scd2_feed(spark, path)[0]
            .select("k", "ts", "v")
            .collect(),
        )
    )
    assert got == want
    # Idempotent re-run: nothing to fold.
    assert not snapshot.collapse_snapshot(spark, path)


def test_collapse_resumes_after_mid_fold_crash(
    spark, tmp_path, monkeypatch
):
    """State-driven resume: a kill between delete-base and
    rename-version leaves the version copy in place (the pending
    marker), so a re-run finishes the fold with identical rows."""
    path = str(tmp_path / "feed")
    _feed(spark, path, n_shards=2)
    delete_scd2_feed_keys(spark, path, _keys(spark, 1))
    want = sorted(
        map(
            tuple,
            read_scd2_feed(spark, path)[0]
            .select("k", "ts", "v")
            .collect(),
        )
    )
    real_rename = snapshot.fsutil.rename
    state = {"fired": False}

    def dying_rename(spark_, src, dst):
        if not state["fired"] and snapshot.VERSION_DIR_PREFIX in src:
            state["fired"] = True
            raise RuntimeError("simulated kill mid-fold")
        return real_rename(spark_, src, dst)

    monkeypatch.setattr(snapshot.fsutil, "rename", dying_rename)
    with pytest.raises(RuntimeError, match="simulated kill"):
        snapshot.collapse_snapshot(spark, path)
    monkeypatch.setattr(snapshot.fsutil, "rename", real_rename)
    assert snapshot.collapse_snapshot(spark, path)
    got = sorted(
        map(
            tuple,
            read_scd2_feed(spark, path)[0]
            .select("k", "ts", "v")
            .collect(),
        )
    )
    assert got == want


def test_read_snapshot_raises_on_vacuumed_version(spark, tmp_path):
    path = str(tmp_path / "feed")
    _feed(spark, path)
    with pytest.raises(ValueError, match="no snapshot manifest v7"):
        snapshot.read_snapshot(spark, path, 7)


def test_publish_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "feed")
    _feed(spark, path)
    body = {"version": 1, "dirs": {}}
    snapshot.publish_snapshot(spark, path, body)
    snapshot.publish_snapshot(spark, path, {"version": 1, "dirs": {"x": 1}})
    assert snapshot.read_snapshot(spark, path, 1) == body


def test_null_partition_rows_survive_versioning(spark, tmp_path):
    """The NULL shard arm: rows in the default partition keep reading
    when OTHER partitions are versioned, and a versioned rewrite OF
    the default partition resolves to the version copy."""
    from formula1_dataengineering_spark.operators.cow import (
        run_cow_swap,
        stage_partition_rewrite,
    )

    path = str(tmp_path / "lay")
    rows = [(i, i % 2 if i % 5 else None, 10 * i) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, shard int, val long")
    df.repartition("shard").write.partitionBy("shard").parquet(
        os.path.join(path, "t")
    )
    open(os.path.join(path, "_SUCCESS"), "w").close()
    snap0 = snapshot.read_snapshot(spark, path)
    base = snapshot.snapshot_dir_read(spark, path, "t", snap0)
    assert base.count() == 20
    # COW-rewrite shard 0 (all even ids), keeping multiples of 4.
    keep = base.where(
        (F.col("shard") == 0) & (F.col("id") % 4 == 0)
    )
    job = stage_partition_rewrite(
        spark, path, os.path.join(path, "t"), keep, "shard", [0]
    )
    run_cow_swap(spark, path, [job], None)
    snap1 = snapshot.read_snapshot(spark, path)
    out = snapshot.snapshot_dir_read(spark, path, "t", snap1)
    assert out.where("shard is null").count() == 4  # untouched NULLs
    assert out.where("shard = 0").count() == 4  # ids 4,8,12,16
    assert out.where("shard = 1").count() == 8  # untouched
