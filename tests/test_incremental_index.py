"""Index-based incremental dedup (VERDICT r9 item 4): the stored
(content_hashes, band_rows) probe path must be value-identical to the
recompute path, the writer must be idempotent, and the sharded layout
must round-trip through parquet."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

TEXT = [
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
    "alpha bravo charlie delta echo foxtrot golf hotel india kilo",
    "lima mike november oscar papa quebec romeo sierra tango uniform",
    "whiskey xray yankee zulu one two three four five six seven",
    "completely different content with no overlap at all here now",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXT)], "doc_id long, text string"
    )


def _flags(df):
    return sorted(
        (r["doc_id"], r["exact_dup"], r["near_dup"], r["action"])
        for r in df.collect()
    )


def test_index_path_equals_recompute_path(spark):
    """incremental_dedup_from_index over build_dedup_index frames
    returns exactly incremental_dedup_flags' output (per-doc MinHash
    signatures are corpus-independent)."""
    from formula1_dataengineering_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup_flags,
        incremental_dedup_from_index,
    )

    d = _docs(spark)
    is_batch = F.col("doc_id") % 2 == 0
    want = _flags(incremental_dedup_flags(d, is_batch))
    hashes, bands = build_dedup_index(d.where(~is_batch))
    got = _flags(
        incremental_dedup_from_index(d.where(is_batch), hashes, bands)
    )
    assert got == want
    assert got  # non-vacuous: the batch split produced rows


def test_written_index_round_trips_with_shard_pruning_join(spark, tmp_path):
    """The sharded on-disk index probes to the same flags, and the
    probe plan joins on the shard partition column (the pruning
    contract)."""
    from formula1_dataengineering_spark.operators.dedup import (
        incremental_dedup_flags,
        incremental_dedup_from_index,
        write_dedup_index,
    )

    d = _docs(spark)
    is_batch = F.col("doc_id") % 2 == 0
    path = str(tmp_path / "idx")
    write_dedup_index(d.where(~is_batch), path, n_shards=4)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    hashes = spark.read.parquet(os.path.join(path, "content_hashes"))
    bands = spark.read.parquet(os.path.join(path, "band_rows"))
    assert "shard" in hashes.columns and "shard" in bands.columns
    out = incremental_dedup_from_index(
        d.where(is_batch), hashes, bands, n_shards=4
    )
    assert _flags(out) == _flags(incremental_dedup_flags(d, is_batch))
    # The exact-probe join condition includes the partition column.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "shard" in plan


def test_writer_rerun_is_idempotent(spark, tmp_path):
    """Re-running write_dedup_index over the same corpus leaves an
    identical index (overwrite semantics — the daily-maintenance
    re-run cannot duplicate rows)."""
    from formula1_dataengineering_spark.operators.dedup import (
        write_dedup_index,
    )

    d = _docs(spark).where(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "idx")
    write_dedup_index(d, path, n_shards=4)
    first_h = sorted(
        map(tuple, spark.read.parquet(path + "/content_hashes").collect())
    )
    first_b = sorted(
        map(tuple, spark.read.parquet(path + "/band_rows").collect())
    )
    write_dedup_index(d, path, n_shards=4)
    assert (
        sorted(
            map(
                tuple, spark.read.parquet(path + "/content_hashes").collect()
            )
        )
        == first_h
    )
    assert (
        sorted(map(tuple, spark.read.parquet(path + "/band_rows").collect()))
        == first_b
    )
    assert len(first_h) == 3  # one hash row per corpus doc


def test_incremental_index_appends_match_scratch_build(spark):
    """Building the index incrementally (corpus A, then union with
    yesterday's ingested batch B) equals building from scratch over
    A ∪ B — the maintenance property that lets the index live across
    ingests without full rebuilds."""
    from formula1_dataengineering_spark.operators.dedup import (
        build_dedup_index,
    )

    d = _docs(spark)
    a = d.where(F.col("doc_id") < 3)
    b = d.where(F.col("doc_id") >= 3)
    ha, ba = build_dedup_index(a)
    hb, bb = build_dedup_index(b)
    h_all, b_all = build_dedup_index(d)
    assert sorted(map(tuple, ha.unionByName(hb).collect())) == sorted(
        map(tuple, h_all.collect())
    )
    assert sorted(map(tuple, ba.unionByName(bb).collect())) == sorted(
        map(tuple, b_all.collect())
    )
