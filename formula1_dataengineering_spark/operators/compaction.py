"""Delta compaction for the three delta-bearing stored layouts —
the closing arc of the index lifecycle (VERDICT r12 item 1): the
dedup index (``content_hashes_delta_*`` / ``band_rows_delta_*``), the
ANN index (``codes_delta_*``), and the SCD2 feed
(``feed_rows_delta_*``) all grow a delta directory per ingest and,
before this module, shed them only on a FULL rebuild. A 100 TB
pipeline cannot retrain the world to reclaim a year of daily deltas;
it folds them into the base partitions.

Compaction here is a pure partition-wise merge — NO retraining, NO
re-windowing: every delta row already carries the partition value the
base layout shards by (HRW shard for dedup/feed rows, frozen-centroid
IVF cell for ANN codes — all assigned at ingest time with the
layout's own ``_META.json`` params), so folding batch N's rows into
the base is exactly ``base[touched partitions] ∪ deltas`` rewritten
per partition. Untouched base partitions are never read and never
written — their part files stay byte-identical (tests pin this).

Protocol (shared engine, :func:`_compact_layout`):

1. STAGE (layout stays fully readable, ``_SUCCESS`` intact): per
   table, the committed deltas' rows are unioned, their touched
   partition values collected (bounded by n_shards / #cells — the
   same bounded-driver-materialization rule as the SCD2 refresh),
   and ``base[touched] ∪ deltas`` is written under
   ``<path>/_compact/<table>/`` with the base writer's own
   one-file-per-partition discipline.
2. MANIFEST: ``_COMPACT_MANIFEST.json`` (the folded batch_ids + table
   names) lands only after ALL staging completed — its existence
   means every staged partition directory is complete.
3. COMMIT (the only unreadable window, pure filesystem metadata ops):
   drop ``_SUCCESS``; per staged partition directory, delete the base
   partition and rename the staged one in; delete the folded deltas'
   directories and commit markers; sweep staging + manifest; restore
   ``_SUCCESS``.

Crash contract — strictly stronger than the rebuild path's: a crash
during STAGE leaves the old layout valid (stale staging swept by the
next run); a crash during COMMIT leaves a marker-less layout every
reader refuses, and RE-RUNNING the same ``compact_*`` call detects
the manifest and RESUMES the commit — each swap is idempotent (a
partition already renamed in has no staged directory left and is
skipped), delta/marker deletes are idempotent, and the manifest names
exactly the batches being folded so an unrelated delta landed before
the crash survives. This is the recovery the COW refresher only
approximates: compaction never needs a rebuild to recover.

All filesystem IO goes through the Hadoop FileSystem API
(``fsutil``), so the same lifecycle serves a local path, a ``file:/``
URI, or a cluster filesystem.

Concurrency contract (round-14, per ADVICE r13): compaction assumes a
SINGLE MAINTAINER — one process runs ``compact_*`` / ``write_*`` /
``vacuum`` on a layout at a time, the same assumption the COW
refresher documents. Concurrent INGEST is the one interleave that is
supported and proven: a ``refresh_*`` delta landing at any point
during compaction survives, because the manifest names exactly the
batches being folded and the commit deletes only those — a delta
committed after the listing is untouched by the swap and stays
probe-able (the ``on_staged`` hook exists so tests and the
``compaction_ingest_interleave`` gate can land a delta inside the
STAGE→COMMIT window and hash the post-state). Two concurrent
``compact_*`` calls, or a compaction racing a base REBUILD, are NOT
supported — serialize maintenance.
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .. import fsutil

_MANIFEST = "_COMPACT_MANIFEST.json"
_STAGING = "_compact"


class _TableSpec(NamedTuple):
    table: str  # base directory name (and delta prefix)
    partition_col: str
    sort_cols: tuple[str, ...]  # () = keep the writer's plain layout
    schema_key: str  # _META.json key holding the table schema


def _is_partition_dir(name: str) -> bool:
    """A parquet partition directory is ``col=value`` — including the
    null-key default partition, which materializes as
    ``col=__HIVE_DEFAULT_PARTITION__`` (so the "=" test covers it;
    null-ROW handling lives in the merge's explicit isNull arm)."""
    return "=" in name


def _open_base(
    spark: SparkSession, path: str, spec: _TableSpec, meta: dict, what: str
) -> DataFrame:
    from . import snapshot

    d = os.path.join(path, spec.table)
    if not fsutil.is_dir(spark, d):
        raise ValueError(
            f"{what} at {path!r} is corrupt: {spec.table!r} is missing "
            "although the layout's _SUCCESS marker exists — rebuild it"
        )
    if fsutil.has_parquet(spark, d):
        # Snapshot-aware (round 16): the fold must merge against the
        # CURRENT rows, which a COW erasure may own via version dirs.
        df = snapshot.snapshot_dir_read(
            spark, path, spec.table, snapshot.read_snapshot(spark, path)
        )
        if df is not None:
            return df
    schema = meta.get(spec.schema_key)
    if schema is None:
        raise ValueError(
            f"{what} at {path!r}: {spec.table} holds no rows and its "
            "_META.json predates recorded schemas — rebuild it"
        )
    return spark.createDataFrame([], StructType.fromJson(schema))


def _commit(spark: SparkSession, path: str, manifest: dict) -> None:
    """The metadata-only commit/resume phase: swap staged partition
    directories in, drop the folded deltas, restore the marker. Every
    step is idempotent, so a crashed commit re-runs to completion."""
    from . import snapshot

    fsutil.delete(spark, os.path.join(path, "_SUCCESS"))
    # Fold any COW snapshot state into plain base dirs first (round
    # 16): the swap below writes BASE partition dirs, so a live
    # version assignment would shadow the fold's output. Runs inside
    # this commit's marker-dropped window; state-driven idempotent,
    # so the resume path re-runs it safely.
    snapshot.collapse_snapshot(spark, path)
    staging_root = os.path.join(path, _STAGING)
    for table in manifest["tables"]:
        staged = os.path.join(staging_root, table)
        if not fsutil.is_dir(spark, staged):
            continue  # already fully swapped by a prior (crashed) run
        for name in fsutil.list_names(spark, staged):
            if not _is_partition_dir(name):
                continue  # the staged write's own _SUCCESS marker
            fsutil.delete(spark, os.path.join(path, table, name))
            fsutil.rename(
                spark,
                os.path.join(staged, name),
                os.path.join(path, table, name),
            )
    for bid in manifest["batch_ids"]:
        for table in manifest["tables"]:
            fsutil.delete(
                spark, os.path.join(path, f"{table}_delta_{bid}")
            )
        fsutil.delete(spark, os.path.join(path, f"_DELTA_{bid}._SUCCESS"))
    fsutil.delete(spark, staging_root)
    spark.catalog.refreshByPath(path)
    # Marker BEFORE manifest delete: a crash between the two leaves a
    # readable layout plus a spent manifest, and the next compact_*
    # call re-enters this (idempotent) commit and finishes the sweep.
    # The reverse order would leave a marker-less AND manifest-less
    # layout — bricked until a rebuild, contradicting the module's
    # resume contract (round-13 review).
    fsutil.touch(spark, os.path.join(path, "_SUCCESS"))
    fsutil.delete(spark, os.path.join(path, _MANIFEST))


def _compact_layout(spark, path, *args, **kwargs):
    """Shared engine entry — runs :func:`_compact_layout_impl` under
    the maintainer lease (round 16, VERDICT r15 item 3): one live
    maintainer per layout; a concurrent second is refused loudly, a
    crashed one is stolen after its TTL."""
    from .lease import maintenance_lease

    with maintenance_lease(spark, path):
        return _compact_layout_impl(spark, path, *args, **kwargs)


def _compact_layout_impl(
    spark: SparkSession,
    path: str,
    what: str,
    writer_name: str,
    specs: list[_TableSpec],
    meta: dict | None = None,
    on_staged=None,
) -> dict:
    """Shared engine — see the module docstring for the protocol.
    Returns a summary dict: ``n_deltas_folded``, ``batch_ids``,
    ``touched_partitions`` per table, and ``resumed`` (True when this
    call completed a crashed commit instead of folding new deltas).

    ``on_staged`` (None in production) is called between MANIFEST and
    COMMIT — the widest concurrent-ingest window. Tests and the
    interleave gate use it to land a delta mid-compaction (the
    manifest pins exactly the batches being folded, so the injected
    delta must survive the commit) or to raise and simulate a crash
    whose re-run resumes the commit."""
    from .cow import resume_pending_cow

    fsutil.validate_layout_path(path, what)
    # Complete a pending COW (deletion-family) commit first: the fold
    # rewrites base partitions a stale _COW_MANIFEST.json may still
    # name, and a later resume would rename pre-fold staged
    # partitions over them (round-15 review).
    resume_pending_cow(spark, path)
    manifest_path = os.path.join(path, _MANIFEST)
    if fsutil.exists(spark, manifest_path):
        # A prior compaction crashed mid-commit (or between manifest
        # and commit): the manifest guarantees staging is complete,
        # so finish the commit it describes. Nothing is re-merged.
        manifest = json.loads(fsutil.read_text(spark, manifest_path))
        _commit(spark, path, manifest)
        return {
            "n_deltas_folded": len(manifest["batch_ids"]),
            "batch_ids": list(manifest["batch_ids"]),
            "touched_partitions": manifest.get("touched_partitions", {}),
            "resumed": True,
        }
    if meta is None:
        meta = fsutil.require_layout_meta(spark, path, what, writer_name)
    committed = sorted(
        name[len("_DELTA_") : -len("._SUCCESS")]
        for name in fsutil.list_names(spark, path)
        if name.startswith("_DELTA_") and name.endswith("._SUCCESS")
    )
    if not committed:
        return {
            "n_deltas_folded": 0,
            "batch_ids": [],
            "touched_partitions": {s.table: [] for s in specs},
            "resumed": False,
        }
    staging_root = os.path.join(path, _STAGING)
    fsutil.delete(spark, staging_root)
    touched_values: dict[str, list] = {}
    for spec in specs:
        delta_dirs = [
            os.path.join(path, f"{spec.table}_delta_{bid}")
            for bid in committed
        ]
        for d in delta_dirs:
            if not fsutil.is_dir(spark, d):
                raise ValueError(
                    f"{what} at {path!r} is corrupt: "
                    f"{os.path.basename(d)!r} is missing although its "
                    "commit marker exists — rebuild the layout"
                )
        from . import snapshot as _snapshot

        _snap = _snapshot.read_snapshot(spark, path)
        frames = [
            df
            for d in delta_dirs
            if fsutil.has_parquet(spark, d)
            if (
                df := _snapshot.snapshot_dir_read(
                    spark, path, os.path.relpath(d, path), _snap
                )
            )
            is not None
        ]
        if not frames:
            # Every delta of this table was a zero-row day: nothing
            # to merge; the commit still removes the empty dirs.
            touched_values[spec.table] = []
            continue
        deltas = frames[0]
        for f in frames[1:]:
            deltas = deltas.unionByName(f)
        part = F.col(spec.partition_col)
        # Bounded driver-side materialization: distinct PARTITION
        # values of the deltas only (≤ n_shards / #cells rows).
        touched = [
            r[0]
            for r in deltas.select(spec.partition_col).distinct().collect()
        ]
        touched_values[spec.table] = sorted(
            touched, key=lambda v: (v is None, v)
        )
        non_null = [v for v in touched if v is not None]
        cond = part.isin(non_null) if non_null else F.lit(False)
        if len(non_null) != len(touched):
            # isin() never matches NULL (three-valued logic): include
            # the base's default partition explicitly or its rows
            # would be dropped by the swap of that partition.
            cond = cond | part.isNull()
        base = _open_base(spark, path, spec, meta, what)
        merged = base.where(cond).unionByName(deltas)
        # The base writer's layout discipline: one file per partition
        # (repartition before partitionBy), writer-declared sort.
        merged = merged.repartition(spec.partition_col)
        if spec.sort_cols:
            merged = merged.sortWithinPartitions(*spec.sort_cols)
        merged.write.mode("overwrite").partitionBy(
            spec.partition_col
        ).parquet(os.path.join(staging_root, spec.table))
    manifest = {
        "batch_ids": committed,
        "tables": [s.table for s in specs],
        "touched_partitions": touched_values,
    }
    # Manifest lands ONLY after all staging completed: its existence
    # is the resume guarantee.
    fsutil.write_text(spark, manifest_path, json.dumps(manifest))
    if on_staged is not None:
        on_staged()
    _commit(spark, path, manifest)
    return {
        "n_deltas_folded": len(committed),
        "batch_ids": committed,
        "touched_partitions": touched_values,
        "resumed": False,
    }


def compact_dedup_index(
    spark: SparkSession, path: str, on_staged=None
) -> dict:
    """Fold every committed ingest delta of a ``write_dedup_index``
    layout into its base tables — partition-wise, no re-hashing, no
    re-shingling (delta rows were sharded at ingest time with the
    layout's own HRW params, so the merge is a pure union per touched
    shard). After a successful compaction the layout is
    indistinguishable from one whose base was written over the grown
    corpus: ``read_dedup_index`` returns the identical row set, probes
    prune identically, and the per-ingest union fan-in (a year of
    daily deltas = 365 extra scans per probe) is gone."""
    return _compact_layout(
        spark,
        path,
        "dedup index",
        "write_dedup_index",
        [
            _TableSpec("content_hashes", "shard", (), "hashes_schema"),
            _TableSpec("band_rows", "shard", (), "bands_schema"),
        ],
        on_staged=on_staged,
    )


def compact_ann_index(
    spark: SparkSession, path: str, on_staged=None
) -> dict:
    """Fold every committed ingest delta of a ``write_ann_index``
    layout into the base ``codes`` table — partition-wise per IVF
    cell, codebook and coarse centroids untouched (they are frozen
    between REBUILDS by the recall-drift contract; compaction is
    maintenance of the code layout, not retraining, so it does NOT
    reset ``ann_delta_recall``'s drift accounting — see
    ``write_ann_index`` for the retrain path)."""
    if fsutil.exists(spark, os.path.join(path, _MANIFEST)):
        # Resume path: the commit operates on staged dir listings and
        # manifest-recorded names only — no metadata needed (and the
        # crash window it recovers has no _SUCCESS for
        # require_layout_meta to accept).
        return _compact_layout(
            spark, path, "ANN index", "write_ann_index", []
        )
    meta = fsutil.require_layout_meta(
        spark, path, "ANN index", "write_ann_index"
    )
    cell_col = meta.get("cell_col")
    if not cell_col:
        raise ValueError(
            f"ANN index at {path!r}: _META.json records no cell_col — "
            "compacting with a guessed partition column would fold "
            "codes into the wrong directories; rebuild with "
            "write_ann_index"
        )
    return _compact_layout(
        spark,
        path,
        "ANN index",
        "write_ann_index",
        [_TableSpec("codes", cell_col, (), "codes_schema")],
        meta=meta,
        on_staged=on_staged,
    )


def compact_scd2_feed(
    spark: SparkSession, path: str, on_staged=None
) -> dict:
    """Fold every committed daily append of a ``write_scd2_feed``
    layout into the base ``feed_rows`` table — partition-wise per HRW
    shard, preserving the writer's (key, ts) within-partition sort so
    the pruned refresh keeps decoding tight key-contiguous row
    groups. The stored history layout needs no compaction twin: it is
    maintained copy-on-write (``scd2_refresh_in_place``) and never
    grows deltas."""
    if fsutil.exists(spark, os.path.join(path, _MANIFEST)):
        return _compact_layout(
            spark, path, "scd2 feed layout", "write_scd2_feed", []
        )
    meta = fsutil.require_layout_meta(
        spark, path, "scd2 feed layout", "write_scd2_feed"
    )
    return _compact_layout(
        spark,
        path,
        "scd2 feed layout",
        "write_scd2_feed",
        [
            _TableSpec(
                "feed_rows",
                "shard",
                (meta["key_col"], meta["ts_col"]),
                "feed_schema",
            )
        ],
        meta=meta,
        on_staged=on_staged,
    )
