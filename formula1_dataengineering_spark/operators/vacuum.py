"""Retention / vacuum — the reclamation verbs: a year-long deployment
accumulates garbage no other verb reclaims — staging left by crashed
writers, compaction staging whose run died before its manifest, delta
directories whose refresh died before the commit marker — plus, for
the SCD2 history layout, superseded closed versions that retention
policy says to expire.

Two verbs:

- :func:`vacuum_layout` removes PHYSICAL garbage only — the layout's
  logical content (what any reader returns) is before==after by
  contract, because everything swept is already invisible: readers
  union deltas via commit markers (an unmarked delta dir is a crashed
  refresh), ``_staging`` belongs to a writer that will recreate it,
  ``_compact`` / ``_cow_staging`` without their manifest are a
  compaction / COW swap that never reached its resume point, and
  ``.spark-staging-*`` residue is a killed Spark write job's own
  scratch. A manifest PINS its staging (``_COMPACT_MANIFEST.json`` →
  ``_compact``, ``_COW_MANIFEST.json`` → ``_cow_staging``): that
  staging is a committed-to rewrite mid-recovery, and sweeping it
  would break the crash-resume contract — vacuum refuses (reported
  as ``pinned``), finish the pending commit first.
- :func:`expire_scd2_history` changes logical content BY POLICY:
  per key it keeps the current row plus the ``retain_versions`` most
  recent closed versions and deletes older ones, copy-on-write over
  touched shards only — via the staged manifest swap of
  :mod:`operators.cow` (round 15: the round-14 in-place dynamic
  overwrite shared the deletion verbs' survivor-loss crash window,
  ADVICE r14 medium).

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

import json
import os

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from .. import fsutil
from . import snapshot
from .cow import (
    COW_MANIFEST,
    COW_STAGING,
    partition_filter,
    resume_pending_cow,
    run_cow_swap,
    stage_partition_rewrite,
)

_MANIFEST = "_COMPACT_MANIFEST.json"



def vacuum_layout(spark, path, *args, **kwargs):
    """Public verb — runs :func:`_vacuum_layout_impl` under the maintainer
    lease (round 16, VERDICT r15 item 3): one live maintainer per
    layout; a concurrent second is refused loudly, a crashed one is
    stolen after its TTL. See the impl for the verb's own contract."""
    from .lease import maintenance_lease

    with maintenance_lease(spark, path):
        return _vacuum_layout_impl(spark, path, *args, **kwargs)

def _vacuum_layout_impl(
    spark: SparkSession, path: str, what: str = "stored layout"
) -> dict:
    """Sweep a delta-bearing stored layout's physical garbage. Only
    five classes are removed — anything else under the root
    (committed deltas and their markers, base tables, metadata,
    gate sentinels, cached "_"-prefixed siblings like a stream
    source) is left untouched, deliberately: vacuum deletes only
    what the layout's own protocols define as dead.

    1. ``_staging/`` — a crashed base rebuild's residue (the next
       writer would sweep it anyway; vacuum reclaims it now);
    2. ``_compact/`` / ``_cow_staging/`` — a compaction or COW swap
       that died during STAGE, iff no matching manifest exists (a
       manifest pins its staging for resume: reported via
       ``pinned=True``, nothing of that staging is touched);
    3. ``<table>_delta_<bid>/`` directories whose
       ``_DELTA_<bid>._SUCCESS`` commit marker is missing — a
       refresh that died between the delta write and the marker
       (readers already ignore them). The ``<table>`` prefix must
       name an existing table directory of THIS layout (ADVICE r14:
       the round-14 substring match would have destroyed an
       unrelated sibling like ``notes_delta_old``);
    4. ``.spark-staging-*`` residue — a killed Spark write job's own
       scratch, at the layout root and one level down inside each
       table/delta directory (where partitioned writers put it);
    5. superseded SNAPSHOT state (round 16): manifests below the
       current version, ``__v*`` version directories neither the
       current snapshot nor a pending COW commit references, and base
       partition copies the current snapshot shadows. Time-travel
       reads of old snapshots work until this sweep, never after.

    Requires a readable layout (``_SUCCESS`` present): vacuuming
    under a writer's commit window would race the swap. Returns
    ``{"files_removed", "bytes_reclaimed", "orphan_deltas_removed",
    "staging_removed", "spark_staging_removed", "snapshots_retired",
    "version_dirs_removed", "pinned"}``."""
    fsutil.validate_layout_path(path, what)
    if not fsutil.exists(spark, os.path.join(path, "_SUCCESS")):
        raise ValueError(
            f"{what} at {path!r} has no _SUCCESS marker — a crashed "
            "or in-flight write; recover it (re-run the writer or "
            "resume the compaction) before vacuuming"
        )
    committed = set(fsutil.committed_delta_batches(spark, path))
    pins = {
        "_compact": fsutil.exists(spark, os.path.join(path, _MANIFEST)),
        COW_STAGING: fsutil.exists(spark, os.path.join(path, COW_MANIFEST)),
    }
    names = fsutil.list_names(spark, path)

    def _spark_written(d: str) -> bool:
        # A directory belongs to the layout only if its DIRECT
        # children look like a Spark-written table: its own _SUCCESS
        # marker, a *.parquet part file, or an '='-partition dir
        # (ADVICE r15: the bare name heuristic treated user scratch
        # like notes/ as a table, so the class-4 sweep descended into
        # it and the class-3 prefix match could reclaim its deltas).
        # A hidden child (.spark-staging residue INSIDE scratch) is
        # deliberately not evidence of ownership.
        return any(
            c == "_SUCCESS" or c.endswith(".parquet") or "=" in c
            for c in fsutil.list_names(spark, d)
            if not c.startswith(".")
        )

    # The layout's own table directories: non-hidden dirs that are
    # neither deltas nor partition dirs AND carry Spark-written
    # content — the anchor classes 3 and 4 require.
    tables = {
        n
        for n in names
        if not n.startswith(("_", "."))
        and "_delta_" not in n
        and "=" not in n
        and fsutil.is_dir(spark, os.path.join(path, n))
        and _spark_written(os.path.join(path, n))
    }
    files_removed = 0
    bytes_reclaimed = 0
    orphan_deltas = 0
    staging_removed = 0
    spark_staging = 0

    def sweep(d: str) -> tuple[int, int]:
        n, b = fsutil.du(spark, d)
        fsutil.delete(spark, d)
        return n, b

    for name in names:
        if name == "_staging" or (
            name in pins and not pins[name]
        ):
            n, b = sweep(os.path.join(path, name))
            files_removed += n
            bytes_reclaimed += b
            staging_removed += 1
        elif name.startswith(".spark-staging"):
            n, b = sweep(os.path.join(path, name))
            files_removed += n
            bytes_reclaimed += b
            spark_staging += 1
        elif "_delta_" in name:
            table, _, bid = name.partition("_delta_")
            if table in tables and bid not in committed:
                n, b = sweep(os.path.join(path, name))
                files_removed += n
                bytes_reclaimed += b
                orphan_deltas += 1
    # Class 4, one level down: partitioned writers create their job
    # scratch INSIDE the output directory. Same anchor as class 3
    # (round-15 review): descend only into the layout's OWN table and
    # delta directories — never into user scratch whose name merely
    # contains '_delta_'.
    own_deltas = {
        n
        for n in names
        if "_delta_" in n and n.partition("_delta_")[0] in tables
    }
    for name in sorted(tables | own_deltas):
        d = os.path.join(path, name)
        if not fsutil.is_dir(spark, d):
            continue
        for child in fsutil.list_names(spark, d):
            if child.startswith(".spark-staging"):
                n, b = sweep(os.path.join(d, child))
                files_removed += n
                bytes_reclaimed += b
                spark_staging += 1
    # Class 5 (round 16, VERDICT r15 item 2): retire superseded
    # snapshot state. Keep-set = everything the CURRENT snapshot
    # references plus everything a PENDING COW commit will reference;
    # everything older — manifests below the current version, version
    # directories no manifest-of-record names, and base partition
    # copies the current snapshot shadows (assigned elsewhere or
    # dropped) — is reclaimable garbage. This is exactly "old
    # snapshots readable until vacuumed": time-travel reads work up
    # to this sweep, never after it.
    versions = snapshot.manifest_versions(spark, path)
    snap = (
        snapshot.read_snapshot(spark, path, versions[-1])
        if versions
        else {"version": 0, "dirs": {}}
    )
    pending_snap: dict = {"version": 0, "dirs": {}}
    cow_mp = os.path.join(path, COW_MANIFEST)
    if fsutil.exists(spark, cow_mp):
        pending_snap = json.loads(fsutil.read_text(spark, cow_mp)).get(
            "snap"
        ) or {"version": 0, "dirs": {}}
    snapshots_retired = 0
    version_dirs_removed = 0
    for v in versions[:-1]:
        n, b = sweep(
            os.path.join(path, f"{snapshot.MANIFEST_PREFIX}{v}.json")
        )
        files_removed += n
        bytes_reclaimed += b
        snapshots_retired += 1
    for rel in sorted(tables | own_deltas):
        d = os.path.join(path, rel)
        if not fsutil.is_dir(spark, d):
            continue
        keep_tags = snapshot.referenced_tags(
            snap, rel
        ) | snapshot.referenced_tags(pending_snap, rel)
        entry = snap.get("dirs", {}).get(rel, {})
        shadowed = set(entry.get("assign", {})) | set(
            entry.get("dropped", [])
        )
        for child in fsutil.list_names(spark, d):
            if child.startswith(snapshot.VERSION_DIR_PREFIX):
                try:
                    tag = int(child[len(snapshot.VERSION_DIR_PREFIX):])
                except ValueError:
                    continue  # not a version dir of this protocol
                if tag not in keep_tags:
                    n, b = sweep(os.path.join(d, child))
                    files_removed += n
                    bytes_reclaimed += b
                    version_dirs_removed += 1
            elif child in shadowed:
                n, b = sweep(os.path.join(d, child))
                files_removed += n
                bytes_reclaimed += b
                version_dirs_removed += 1
    if files_removed:
        spark.catalog.refreshByPath(path)
    return {
        "files_removed": files_removed,
        "bytes_reclaimed": bytes_reclaimed,
        "orphan_deltas_removed": orphan_deltas,
        "staging_removed": staging_removed,
        "spark_staging_removed": spark_staging,
        "snapshots_retired": snapshots_retired,
        "version_dirs_removed": version_dirs_removed,
        "pinned": any(pins.values()),
    }



def expire_scd2_history(spark, path, *args, **kwargs):
    """Public verb — runs :func:`_expire_scd2_history_impl` under the maintainer
    lease (round 16, VERDICT r15 item 3): one live maintainer per
    layout; a concurrent second is refused loudly, a crashed one is
    stolen after its TTL. See the impl for the verb's own contract."""
    from .lease import maintenance_lease

    with maintenance_lease(spark, path):
        return _expire_scd2_history_impl(spark, path, *args, **kwargs)

def _expire_scd2_history_impl(
    spark: SparkSession, path: str, retain_versions: int
) -> dict:
    """RETENTION over a stored SCD2 history layout: per key, keep the
    current row plus the ``retain_versions`` most recent CLOSED
    versions (by ``effective_from_us`` descending — unique per key by
    the :func:`operators.scd.scd2_history` tie contract) and delete
    everything older. Copy-on-write: only shards holding at least one
    expirable row are rewritten, through the staged manifest swap of
    :mod:`operators.cow` (untouched shards never read or written);
    the touched-shard set is a bounded driver collect (≤ n_shards),
    the same static-pruning discipline as the COW refresh.

    Crash contract = the COW swap's: the live layout stays readable
    through STAGE; from the manifest on, the commit is idempotent
    metadata ops that ANY family verb (or re-running this expiry)
    resumes to completion first. A re-run after full commit is a
    clean no-op (already-swept shards have nothing left to expire).

    Returns ``{"rows_expired", "shards_rewritten"}`` (both 0 = clean
    no-op, marker untouched)."""
    from .scd import _open_history_for_refresh

    if retain_versions < 0:
        raise ValueError(
            f"expire_scd2_history: retain_versions={retain_versions} "
            "must be >= 0 (0 keeps only each key's current row)"
        )
    resume_pending_cow(spark, path)
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
    touched = sorted(
        (r["shard"] for r in per_shard), key=lambda v: (v is None, v)
    )
    if not touched:
        return {"rows_expired": 0, "shards_rewritten": 0}
    rows_expired = sum(r["count"] for r in per_shard)
    slice_ = hist.where(partition_filter("shard", touched))
    keep_current = slice_.where(F.col("is_current"))
    keep_closed = (
        slice_.where(~F.col("is_current"))
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= retain_versions)
        .drop("__rk")
    )
    out = keep_current.unionByName(keep_closed)
    fsutil.delete(spark, os.path.join(path, COW_STAGING))
    job = stage_partition_rewrite(
        spark,
        path,
        os.path.join(path, "history_rows"),
        out,
        "shard",
        touched,
        (key_col, "effective_from_us"),
    )
    run_cow_swap(spark, path, [job], None)
    return {
        "rows_expired": rows_expired,
        "shards_rewritten": len(touched),
    }


__all__ = ["expire_scd2_history", "vacuum_layout"]
