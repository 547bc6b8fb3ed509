"""Targeted deletion (retraction) from stored layouts — the
right-to-be-forgotten verb (round 14, beyond-reference extension).

A 100 TB corpus gets retraction requests: a licensing takedown, a
GDPR erasure, a poisoned-document purge. Rebuilding the world per
request is the one answer that cannot work; these verbs remove the
named ids' rows COPY-ON-WRITE from a stored layout — base AND every
committed delta — rewriting only the partitions that actually hold
the ids' rows:

- :func:`delete_from_dedup_index` — drop ``doc_ids`` from
  ``content_hashes`` + ``band_rows``. Both tables shard by HRW of a
  CONTENT key (hash / band:key), not the doc id, so touched shards
  are found by one column-pruned id scan per table (the doc_id
  column only — parquet reads nothing else), then rewritten.
- :func:`delete_from_ann_index` — drop ``vec_ids`` from the
  ``codes`` table (base + deltas). Cells are distance-assigned, so
  the touched-cell set again comes from an id-column scan. The
  codebook / coarse centroids are untouched (they are statistics of
  the training corpus, not per-row state; the recall-drift contract
  already prices training-set divergence — a deletion-heavy layout
  retrains via the maintenance loop's rebuild arm).
- :func:`delete_scd2_feed_keys` — drop all of ``keys``' rows from a
  feed layout. The feed shards BY the key, so the touched-shard set
  is computed from the keys alone (static HRW pruning — no scan at
  all); only those shard directories are read or written.

Shared discipline (:func:`_delete_where`): per table directory, find
touched partitions (bounded driver collect, ≤ n_shards / #cells),
rewrite them via dynamic partition overwrite MINUS the ids' rows
(broadcast anti-join), delete any partition directory the rewrite
emptied, and count the removed rows for the accounting the gates
hash. Untouched partitions are never read and never written — their
part files stay byte-identical (tests pin this).

Crash contract: the layout's ``_SUCCESS`` drops before the first
rewrite and returns after the last; external readers refuse the
window; the verb itself opens metadata marker-tolerantly (the COW
refresher's rule) and re-running the same delete is idempotent — a
partition already rewritten simply has no matching rows left.

Replay caveat (documented, by design): deltas are rewritten in
place, so a crashed INGEST of batch N replayed AFTER a delete of ids
that rode in batch N resurrects them — sequence deletes after ingest
settles (the single-maintainer window), or re-issue the delete; the
verb is idempotent and cheap.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsutil


def _open_meta(spark: SparkSession, path: str, what: str) -> dict:
    """Marker-tolerant metadata open: deletes must be re-runnable
    through their own crash window (marker dropped mid-rewrite), so
    only ``_META.json`` is required here; external READERS keep
    refusing marker-less layouts."""
    fsutil.validate_layout_path(path, what)
    meta_path = os.path.join(path, "_META.json")
    if not fsutil.exists(spark, meta_path):
        raise ValueError(
            f"{what} at {path!r} has no _META.json — not a stored "
            "layout this build wrote; nothing to delete from"
        )
    return json.loads(fsutil.read_text(spark, meta_path))


def _table_dirs(spark: SparkSession, path: str, table: str) -> list[str]:
    """The base table directory + every COMMITTED delta's directory
    for ``table`` (marker-discovered, the readers' rule)."""
    return [os.path.join(path, table)] + [
        os.path.join(path, f"{table}_delta_{bid}")
        for bid in fsutil.committed_delta_batches(spark, path)
    ]


def _delete_where(
    spark: SparkSession,
    d: str,
    ids: DataFrame,
    id_col: str,
    partition_col: str,
    sort_cols: tuple[str, ...] = (),
    touched: list | None = None,
) -> tuple[int, int]:
    """COW-delete ``ids``' rows from one table directory. Returns
    (rows_deleted, partitions_rewritten). ``touched`` statically
    prunes the discovery scan when the caller can bound the partition
    set from the ids alone (the key-sharded feed) — the scan then
    reads only those partitions, and its result keeps the rewrite and
    the accounting exact per directory."""
    if not fsutil.has_parquet(spark, d):
        return 0, 0
    rows = spark.read.parquet(d)
    bids = F.broadcast(ids.select(id_col).distinct())

    def _part_filter(values: list) -> F.Column:
        # isin() never matches NULL (three-valued logic): a NULL
        # partition value (the __HIVE_DEFAULT_PARTITION__ directory a
        # null-key row lands in — the same trap compaction's merge
        # handles with an explicit isNull arm) needs its own branch,
        # or null-partition rows silently survive the delete while
        # the emptied-directory sweep below destroys their WHOLE
        # default partition (round-14 review, the one data-loss
        # finding).
        part = F.col(partition_col)
        non_null = [v for v in values if v is not None]
        cond = part.isin(non_null) if non_null else F.lit(False)
        if len(non_null) != len(values):
            cond = cond | part.isNull()
        return cond

    if touched is not None:
        # A caller-computed hint (the key-sharded feed) prunes the
        # discovery scan statically, but the hint is GLOBAL: refine
        # to the partitions that actually hold matching rows in THIS
        # directory, so the rewrite and the accounting stay exact
        # per directory (round-14 review).
        rows_scope = rows.where(_part_filter(touched))
    else:
        rows_scope = rows
    # One column-pruned pass: only (id, partition) columns decode.
    touched = [
        r[0]
        for r in rows_scope.join(bids, id_col, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
    ]
    if not touched:
        return 0, 0
    slice_ = rows.where(_part_filter(touched))
    n_del = slice_.join(bids, id_col, "left_semi").count()
    if n_del == 0:
        return 0, 0
    keep = slice_.join(bids, id_col, "left_anti")
    # Collected BEFORE the overwrite: keep's plan reads the files the
    # overwrite is about to replace — executing it afterwards fails
    # with FILE_NOT_EXIST against the captured listing. Bounded: ≤
    # the touched set.
    kept_parts = {
        r[0] for r in keep.select(partition_col).distinct().collect()
    }
    out = keep.repartition(partition_col)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy(partition_col).parquet(d)
    # Dynamic overwrite replaces only partitions PRESENT in the
    # output: a partition whose every row was deleted keeps its old
    # files — remove those directories explicitly.
    for v in touched:
        if v not in kept_parts:
            name = (
                f"{partition_col}=__HIVE_DEFAULT_PARTITION__"
                if v is None
                else f"{partition_col}={v}"
            )
            fsutil.delete(spark, os.path.join(d, name))
    return n_del, len(touched)


def _run_delete(
    spark: SparkSession,
    path: str,
    jobs: list[tuple[str, DataFrame, str, str, tuple, list | None]],
) -> dict:
    """Marker-bracketed multi-table delete; jobs are
    (dir, ids, id_col, partition_col, sort_cols, touched)."""
    rows_deleted = 0
    partitions_rewritten = 0
    fsutil.delete(spark, os.path.join(path, "_SUCCESS"))
    for d, ids, id_col, pcol, sort_cols, touched in jobs:
        n, p = _delete_where(spark, d, ids, id_col, pcol, sort_cols, touched)
        rows_deleted += n
        partitions_rewritten += p
    spark.catalog.refreshByPath(path)
    fsutil.touch(spark, os.path.join(path, "_SUCCESS"))
    return {
        "rows_deleted": rows_deleted,
        "partitions_rewritten": partitions_rewritten,
    }


def delete_from_dedup_index(
    spark: SparkSession,
    path: str,
    doc_ids: DataFrame,
    id_col: str = "doc_id",
) -> dict:
    """Remove ``doc_ids``' rows from a stored dedup index — base and
    every committed delta, both tables — so later probes no longer
    match against the retracted docs (the gate pins the flag flips).
    Returns ``{"rows_deleted", "partitions_rewritten"}`` summed over
    content_hashes + band_rows."""
    _open_meta(spark, path, "dedup index")
    # Materialized once: every (table × directory) job re-executes the
    # ids plan 3-4 times (discovery, count, kept-parts, write) — for a
    # computed id set (the retraction gate's corpus-wide twin join)
    # that re-run would dominate the delete (round-14 review).
    doc_ids = doc_ids.select(id_col).distinct().localCheckpoint(eager=True)
    jobs = []
    for table in ("content_hashes", "band_rows"):
        for d in _table_dirs(spark, path, table):
            jobs.append((d, doc_ids, id_col, "shard", (), None))
    return _run_delete(spark, path, jobs)


def delete_from_ann_index(
    spark: SparkSession,
    path: str,
    vec_ids: DataFrame,
    id_col: str = "vec_id",
) -> dict:
    """Remove ``vec_ids``' code rows from a stored IVF-PQ index —
    base and every committed delta. Codebook and coarse centroids
    stay (training statistics, not per-row state); a deletion-heavy
    layout retrains through the maintenance loop's rebuild arm."""
    meta = _open_meta(spark, path, "ANN index")
    cell_col = meta.get("cell_col")
    if not cell_col:
        raise ValueError(
            f"ANN index at {path!r}: _META.json records no cell_col — "
            "rebuild with write_ann_index before deleting"
        )
    vec_ids = vec_ids.select(id_col).distinct().localCheckpoint(eager=True)
    jobs = [
        (d, vec_ids, id_col, cell_col, (), None)
        for d in _table_dirs(spark, path, "codes")
    ]
    return _run_delete(spark, path, jobs)


def delete_scd2_feed_keys(
    spark: SparkSession, path: str, keys: DataFrame
) -> dict:
    """Remove every row of ``keys`` from a stored SCD2 feed — base
    and every committed daily delta. The feed shards BY the key, so
    the candidate-shard set comes from the keys alone (static HRW
    pruning): a handful of erasure requests against a 100 TB feed
    reads only the shards those keys live in, in every directory
    generation."""
    from .scd import _feed_shard

    meta = _open_meta(spark, path, "scd2 feed layout")
    key_col = meta["key_col"]
    n_shards = int(meta["n_shards"])
    keys = (
        keys.select(key_col)
        .where(F.col(key_col).isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    touched = sorted(
        r[0]
        for r in keys.withColumn(
            "shard", _feed_shard(F.col(key_col), n_shards)
        )
        .select("shard")
        .distinct()
        .collect()
    )
    jobs = [
        (
            d,
            keys,
            key_col,
            "shard",
            (key_col, meta["ts_col"]),
            touched,
        )
        for d in _table_dirs(spark, path, "feed_rows")
    ]
    return _run_delete(spark, path, jobs)


__all__ = [
    "delete_from_ann_index",
    "delete_from_dedup_index",
    "delete_scd2_feed_keys",
]
