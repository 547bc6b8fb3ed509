"""Maintainer lease (operators/lease.py, round 16 — VERDICT r15 item
3): the single-maintainer contract enforced with an atomic
exclusive-create lock file, fencing tokens, and expiry steal."""

from __future__ import annotations

import json
import os
import time

import pytest

from formula1_dataengineering_spark.operators import lease
from formula1_dataengineering_spark.operators.deletion import (
    delete_scd2_feed_keys,
)
from formula1_dataengineering_spark.operators.maintenance import (
    maintain_scd2_feed,
)
from formula1_dataengineering_spark.operators.scd import write_scd2_feed
from formula1_dataengineering_spark.operators.vacuum import vacuum_layout


def _feed(spark, path):
    rows = [(i % 4, 1000 + i, "x") for i in range(32)]
    write_scd2_feed(
        spark.createDataFrame(rows, "k long, ts long, v string"),
        path,
        "k",
        "ts",
        "v",
        n_shards=2,
    )


def _foreign_lease(path, expires_in, token=7):
    with open(os.path.join(path, lease.LEASE_FILE), "w") as fh:
        json.dump(
            {
                "holder": "other-maintainer",
                "token": token,
                "acquired_unix": time.time(),
                "expires_unix": time.time() + expires_in,
            },
            fh,
        )


def test_second_maintainer_refused_mid_work(spark, tmp_path):
    """A live foreign lease refuses every maintenance-family verb
    loudly — delete (mid-STAGE would race the manifest), vacuum, and
    the maintenance tick."""
    path = str(tmp_path / "feed")
    _feed(spark, path)
    _foreign_lease(path, expires_in=3600)
    erased = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(RuntimeError, match="held by maintainer"):
        delete_scd2_feed_keys(spark, path, erased)
    with pytest.raises(RuntimeError, match="held by maintainer"):
        vacuum_layout(spark, path)
    with pytest.raises(RuntimeError, match="held by maintainer"):
        maintain_scd2_feed(spark, path)
    # The refused verbs touched nothing: the foreign lease survives.
    assert lease.read_lease(spark, path)["holder"] == "other-maintainer"


def test_crashed_lease_stolen_after_expiry(spark, tmp_path):
    """An EXPIRED foreign lease is a crashed maintainer: the next
    verb steals it (fencing token advances past the dead one's),
    completes, and releases."""
    path = str(tmp_path / "feed")
    _feed(spark, path)
    _foreign_lease(path, expires_in=-5, token=7)
    erased = spark.createDataFrame([(1,)], "k long")
    info = delete_scd2_feed_keys(spark, path, erased)
    assert info["rows_deleted"] == 8
    # The verb released to a tombstone that preserves the fencing
    # chain; a fresh acquire fences PAST the dead maintainer's 7.
    tomb = lease.read_lease(spark, path)
    assert tomb["released"] and tomb["token"] >= 8
    got = lease.acquire_lease(spark, path)
    try:
        assert got["token"] >= 9
    finally:
        lease.release_lease(spark, path)


def test_reentrant_nesting_keeps_one_lease(spark, tmp_path):
    """The umbrella shape: outer scope + nested verb = ONE on-disk
    lease; only the outermost release removes it."""
    path = str(tmp_path / "feed")
    _feed(spark, path)
    with lease.maintenance_lease(spark, path) as outer:
        # Nested maintenance verb re-enters instead of deadlocking.
        r = maintain_scd2_feed(spark, path)
        assert r["decision"] == "hold"
        inner = lease.read_lease(spark, path)
        assert inner["token"] == outer["token"]  # no re-acquire
        assert os.path.exists(os.path.join(path, lease.LEASE_FILE))
    assert lease.read_lease(spark, path)["released"]


def test_verbs_leave_no_lease_residue_and_outputs_unmoved(
    spark, tmp_path
):
    """Gates-unchanged contract: a verb's output is identical with
    the lease layer in place, and only a released tombstone (the
    fencing-chain record) survives it."""
    from formula1_dataengineering_spark.operators.scd import (
        read_scd2_feed,
    )

    path = str(tmp_path / "feed")
    _feed(spark, path)
    erased = spark.createDataFrame([(1,)], "k long")
    info = delete_scd2_feed_keys(spark, path, erased)
    assert info == {"rows_deleted": 8, "partitions_rewritten": 1}
    assert lease.read_lease(spark, path)["released"]  # no LIVE lease
    feed, _ = read_scd2_feed(spark, path)
    assert feed.count() == 24
