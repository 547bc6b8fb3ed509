"""End-to-end daily-ingest chain (VERDICT r10 item 2): flags →
keep/drop → index refresh → re-probe → membership, on a tiny corpus
where every branch is exercised; plus re-run idempotence of the whole
chain (the crash-retry contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

# corpus: docs 0-2; batch: docs 10-13.
#  - 10 duplicates corpus doc 0 exactly        -> skip_exact
#  - 11 near-duplicates corpus doc 1           -> review_near
#  - 12 is novel                               -> ingest
#  - 13 duplicates 12 exactly (intra-batch)    -> ingest on first
#    probe (nothing in the day-N−1 index), but reprobe sees accepted
#    12's hash in the refreshed index -> skip_exact
_CORPUS = [
    (0, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    (1, "kilo lima mike november oscar papa quebec romeo sierra tango"),
    (2, "uniform victor whiskey xray yankee zulu one two three four"),
]
_BATCH = [
    (10, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    (11, "kilo lima mike november oscar papa quebec romeo sierra banjo"),
    (12, "five six seven eight nine ten eleven twelve thirteen fourteen"),
    (13, "five six seven eight nine ten eleven twelve thirteen fourteen"),
]

_DAY1_US = 1704153600000000


def _run_chain(spark, path):
    from formula1_dataengineering_spark.operators.dedup import (
        incremental_dedup_from_index,
        read_dedup_index,
        refresh_dedup_index,
    )

    batch = spark.createDataFrame(_BATCH, "doc_id long, text string")
    hashes, bands, meta = read_dedup_index(
        spark, path, include_deltas=False
    )
    flags = incremental_dedup_from_index(
        batch, hashes, bands, n_shards=int(meta["n_shards"]), index_meta=meta
    )
    accepted = batch.join(
        flags.where(F.col("action") == "ingest").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    refresh_dedup_index(accepted, path, batch_id="day1")
    h2, b2, meta2 = read_dedup_index(spark, path)
    reflags = incremental_dedup_from_index(
        batch, h2, b2, n_shards=int(meta2["n_shards"]), index_meta=meta2
    )
    return (
        sorted((r["doc_id"], r["action"]) for r in flags.collect()),
        sorted((r["doc_id"], r["action"]) for r in reflags.collect()),
    )


def test_chain_branches_and_reprobe_invariant(spark, tmp_path):
    from formula1_dataengineering_spark.operators.dedup import (
        write_dedup_index,
    )

    corpus = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    path = str(tmp_path / "idx")
    write_dedup_index(corpus, path, n_shards=4)
    flags, reflags = _run_chain(spark, path)
    assert flags == [
        (10, "skip_exact"),
        (11, "review_near"),
        (12, "ingest"),
        (13, "ingest"),
    ]
    # Every accepted doc hits itself in the refreshed index; the
    # intra-batch duplicate (13) now collides with accepted 12 too.
    assert reflags == [
        (10, "skip_exact"),
        (11, "review_near"),
        (12, "skip_exact"),
        (13, "skip_exact"),
    ]


def test_chain_rerun_is_idempotent(spark, tmp_path):
    """Retrying day-N's ingest (same batch_id) probes the BASE index
    state, overwrites its own delta, and returns identical flags —
    crash-retry cannot double-ingest or self-reject."""
    from formula1_dataengineering_spark.operators.dedup import (
        write_dedup_index,
    )

    corpus = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    path = str(tmp_path / "idx")
    write_dedup_index(corpus, path, n_shards=4)
    first = _run_chain(spark, path)
    second = _run_chain(spark, path)
    assert first == second


def test_membership_interval_for_accepted_docs(spark, tmp_path):
    """scd2_history over the accepted-docs feed emits one open
    interval per accepted doc starting at the ingest instant."""
    from formula1_dataengineering_spark.operators.scd import scd2_history

    accepted = spark.createDataFrame(
        [(12,), (13,)], "doc_id long"
    ).select(
        "doc_id",
        F.timestamp_seconds(F.lit(1704153600)).alias("ts"),
        F.lit("member").alias("status"),
    )
    hist = scd2_history(accepted, "doc_id", "ts", "status")
    got = sorted(
        (
            r["doc_id"],
            r["effective_from_us"],
            r["effective_to_us"],
            r["is_current"],
        )
        for r in hist.collect()
    )
    assert got == [
        (12, _DAY1_US, None, True),
        (13, _DAY1_US, None, True),
    ]
