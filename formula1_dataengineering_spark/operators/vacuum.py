"""Retention / vacuum — the last lifecycle verb (VERDICT r13
item 2): a year-long deployment accumulates garbage no other verb
reclaims — staging left by crashed writers, compaction staging whose
run died before its manifest, delta directories whose refresh died
before the commit marker — plus, for the SCD2 history layout,
superseded closed versions that retention policy says to expire.

Two verbs:

- :func:`vacuum_layout` removes PHYSICAL garbage only — the layout's
  logical content (what any reader returns) is before==after by
  contract, because everything swept is already invisible: readers
  union deltas via commit markers (an unmarked delta dir is a crashed
  refresh), ``_staging`` belongs to a writer that will recreate it,
  and ``_compact`` without a manifest is a compaction that never
  reached its resume point. A ``_COMPACT_MANIFEST.json`` PINS its
  staging: that staging is a committed-to fold mid-recovery, and
  sweeping it would break the crash-resume contract — vacuum refuses
  (reported as ``pinned``), finish the compaction first.
- :func:`expire_scd2_history` changes logical content BY POLICY:
  per key it keeps the current row plus the ``retain_versions`` most
  recent closed versions and deletes older ones, copy-on-write over
  touched shards only (the ``scd2_refresh_in_place`` discipline:
  marker dropped before the dynamic overwrite, restored after;
  idempotent — a crashed expiry re-runs, already-swept shards have
  nothing left to expire).

Concurrency: single maintainer, same as ``operators.compaction``.
Concurrent INGEST during :func:`vacuum_layout` is NOT safe for the
unmarked-delta sweep (a refresh mid-write looks exactly like a
crashed one) — run vacuum in the maintenance window, after the
ingest tick. All IO through the Hadoop FileSystem API (``fsutil``).

100 TB story: the sweep is pure filesystem metadata (list + content
summaries + recursive deletes — no data read); history expiry reads
one full history scan to FIND expirable keys and rewrites only the
shards holding them.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from .. import fsutil

_MANIFEST = "_COMPACT_MANIFEST.json"


def vacuum_layout(
    spark: SparkSession, path: str, what: str = "stored layout"
) -> dict:
    """Sweep a delta-bearing stored layout's physical garbage. Only
    three classes are removed — anything else under the root
    (committed deltas and their markers, base tables, metadata,
    gate sentinels, cached "_"-prefixed siblings like a stream
    source) is left untouched, deliberately: vacuum deletes only
    what the layout's own protocols define as dead.

    1. ``_staging/`` — a crashed base rebuild's residue (the next
       writer would sweep it anyway; vacuum reclaims it now);
    2. ``_compact/`` — a compaction that died during STAGE, iff no
       manifest exists (a manifest pins its staging for resume:
       reported via ``pinned=True``, nothing of ``_compact`` is
       touched);
    3. ``<table>_delta_<bid>/`` directories whose
       ``_DELTA_<bid>._SUCCESS`` commit marker is missing — a
       refresh that died between the delta write and the marker
       (readers already ignore them).

    Requires a readable layout (``_SUCCESS`` present): vacuuming
    under a writer's commit window would race the swap. Returns
    ``{"files_removed", "bytes_reclaimed", "orphan_deltas_removed",
    "staging_removed", "pinned"}``."""
    fsutil.validate_layout_path(path, what)
    if not fsutil.exists(spark, os.path.join(path, "_SUCCESS")):
        raise ValueError(
            f"{what} at {path!r} has no _SUCCESS marker — a crashed "
            "or in-flight write; recover it (re-run the writer or "
            "resume the compaction) before vacuuming"
        )
    committed = set(fsutil.committed_delta_batches(spark, path))
    pinned = fsutil.exists(spark, os.path.join(path, _MANIFEST))
    files_removed = 0
    bytes_reclaimed = 0
    orphan_deltas = 0
    staging_removed = 0

    def sweep(name: str) -> tuple[int, int]:
        d = os.path.join(path, name)
        n, b = fsutil.du(spark, d)
        fsutil.delete(spark, d)
        return n, b

    for name in fsutil.list_names(spark, path):
        if name == "_staging" or (name == "_compact" and not pinned):
            n, b = sweep(name)
            files_removed += n
            bytes_reclaimed += b
            staging_removed += 1
        elif "_delta_" in name:
            bid = name.split("_delta_", 1)[1]
            if bid not in committed:
                n, b = sweep(name)
                files_removed += n
                bytes_reclaimed += b
                orphan_deltas += 1
    if files_removed:
        spark.catalog.refreshByPath(path)
    return {
        "files_removed": files_removed,
        "bytes_reclaimed": bytes_reclaimed,
        "orphan_deltas_removed": orphan_deltas,
        "staging_removed": staging_removed,
        "pinned": pinned,
    }


def expire_scd2_history(
    spark: SparkSession, path: str, retain_versions: int
) -> dict:
    """RETENTION over a stored SCD2 history layout: per key, keep the
    current row plus the ``retain_versions`` most recent CLOSED
    versions (by ``effective_from_us`` descending — unique per key by
    the :func:`operators.scd.scd2_history` tie contract) and delete
    everything older. Copy-on-write: only shards holding at least one
    expirable row are rewritten (dynamic partition overwrite,
    untouched shards never read or written); the touched-shard set is
    a bounded driver collect (≤ n_shards), the same static-pruning
    discipline as the COW refresh.

    Crash contract = the refresher's: ``_SUCCESS`` drops before the
    non-atomic overwrite and returns after; external readers refuse
    the marker-less window; recovery is RE-RUNNING the same expiry
    (idempotent — a shard already rewritten has no expirable rows
    left and is not touched again), which opens the layout through
    the refresher's marker-tolerant path.

    Returns ``{"rows_expired", "shards_rewritten"}`` (both 0 = clean
    no-op, marker untouched)."""
    from .scd import _open_history_for_refresh

    if retain_versions < 0:
        raise ValueError(
            f"expire_scd2_history: retain_versions={retain_versions} "
            "must be >= 0 (0 keeps only each key's current row)"
        )
    hist, meta = _open_history_for_refresh(spark, path)
    key_col = meta["key_col"]
    w = Window.partitionBy(key_col).orderBy(
        F.col("effective_from_us").desc()
    )
    closed = hist.where(~F.col("is_current")).withColumn(
        "__rk", F.row_number().over(w)
    )
    expirable = closed.where(F.col("__rk") > retain_versions)
    # ONE aggregated pass yields both the touched-shard set and the
    # expired-row count (bounded: ≤ n_shards rows) — the find phase
    # is the dominant read of this verb's 100 TB story, so it runs
    # the full window plan exactly once (round-14 review).
    per_shard = expirable.groupBy("shard").count().collect()
    touched = sorted(r["shard"] for r in per_shard)
    if not touched:
        return {"rows_expired": 0, "shards_rewritten": 0}
    rows_expired = sum(r["count"] for r in per_shard)
    slice_ = hist.where(F.col("shard").isin(touched))
    keep_current = slice_.where(F.col("is_current"))
    keep_closed = (
        slice_.where(~F.col("is_current"))
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= retain_versions)
        .drop("__rk")
    )
    out = keep_current.unionByName(keep_closed)
    fsutil.delete(spark, os.path.join(path, "_SUCCESS"))
    out.repartition("shard").sortWithinPartitions(
        key_col, "effective_from_us"
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("shard").parquet(os.path.join(path, "history_rows"))
    spark.catalog.refreshByPath(path)
    fsutil.touch(spark, os.path.join(path, "_SUCCESS"))
    return {
        "rows_expired": rows_expired,
        "shards_rewritten": len(touched),
    }


__all__ = ["expire_scd2_history", "vacuum_layout"]
