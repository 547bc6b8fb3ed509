"""Staged copy-on-write partition swap — the shared crash-safe
rewrite protocol behind targeted deletion (:mod:`operators.deletion`)
and history retention (:func:`operators.vacuum.expire_scd2_history`).

Why it exists (ADVICE r14, medium): the round-14 COW verbs rewrote
touched partitions with Spark's dynamic partition overwrite IN PLACE.
That commit has a per-partition delete-old → rename-staged window; a
kill inside it leaves a touched partition with its KEPT rows gone,
and re-running the "idempotent" verb then finds no matching rows,
does nothing, and restores ``_SUCCESS`` — silently losing survivors.
The compaction module never had this hole because its fold stages
beside the layout and swaps via a manifest; this module gives the
deletion-family verbs the same protocol:

1. **STAGE** — the kept rows of every touched partition are written
   under ``<layout>/_cow_staging/<table-dir>/`` (one staged partition
   dir per surviving partition). The live layout is untouched and
   fully readable throughout.
2. **MANIFEST** — ``_COW_MANIFEST.json`` lands only after ALL staging
   completed. It names, per table directory, the partitions to SWAP
   (staged replacement exists) and the partitions to DROP (every row
   deleted), plus the post-commit ``_META.json`` body when the verb
   updates metadata (deletion accounting). Its existence is the
   resume guarantee: everything after it is idempotent metadata ops.
3. **COMMIT** — marker drops; per partition: swap = delete old dir +
   rename staged in (skipped when the staged dir is already gone — a
   prior crashed commit swapped it), drop = delete old dir (plain
   re-runnable delete). Then metadata, staging-root sweep, marker,
   manifest delete — the compaction ``_commit`` ordering, including
   marker-BEFORE-manifest-delete so no crash window is both
   marker-less and manifest-less.

Recovery from ANY crash: call :func:`resume_pending_cow` (every verb
in the family does, first thing) — a manifest-less crash left only
dead staging (the next STAGE clears it; vacuum sweeps it too), a
manifested crash replays the commit to completion. Single maintainer,
as everywhere in the stored-layout family.

Partition-name contract: directory names are derived from partition
VALUES, so only types whose ``str()`` round-trips through Spark's
partition-path encoding are accepted — integers and NULL (ADVICE r14:
string values would need Hive path escaping to match on-disk names;
every in-tree layout partitions by an int shard/cell, so this raises
on anything else rather than risking a silent name mismatch).

No reference analog: the reference (eager in-memory pandas) has no
stored layouts; this is the engine's training-data-pipeline surface.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsutil
from . import snapshot

COW_MANIFEST = "_COW_MANIFEST.json"
COW_STAGING = "_cow_staging"


def partition_dir_name(partition_col: str, value) -> str:
    """The on-disk directory name Spark's partitioned writer gives
    ``partition_col=value`` — integers and NULL only (see module
    docstring)."""
    if value is None:
        return f"{partition_col}=__HIVE_DEFAULT_PARTITION__"
    if isinstance(value, bool) or not isinstance(value, int):
        raise ValueError(
            f"staged COW swap: partition value {value!r} of column "
            f"{partition_col!r} is not an integer — deriving its "
            "directory name would need Hive path escaping; rebuild "
            "the layout with an integral partition column"
        )
    return f"{partition_col}={value}"


def partition_filter(partition_col: str, values: list) -> F.Column:
    """Membership predicate over partition values with an explicit
    NULL arm: ``isin()`` never matches NULL (three-valued logic), so
    a NULL partition value — the ``__HIVE_DEFAULT_PARTITION__``
    directory a null-key row lands in — needs its own branch or
    null-partition rows silently escape the rewrite (the round-14
    data-loss finding)."""
    part = F.col(partition_col)
    non_null = [v for v in values if v is not None]
    cond = part.isin(non_null) if non_null else F.lit(False)
    if len(non_null) != len(values):
        cond = cond | part.isNull()
    return cond


def stage_partition_rewrite(
    spark: SparkSession,
    layout_path: str,
    table_dir: str,
    keep: DataFrame,
    partition_col: str,
    touched: list,
    sort_cols: tuple[str, ...] = (),
) -> dict:
    """STAGE one table directory's rewrite: write ``keep`` (the
    surviving rows of the ``touched`` partitions) under the staging
    root and return the manifest job entry. The live directory is not
    modified. ``touched`` partitions with no surviving rows get no
    staged dir and land on the job's ``drop`` list."""
    rel = os.path.relpath(table_dir, layout_path)
    staged = os.path.join(layout_path, COW_STAGING, rel)
    out = keep.repartition(partition_col)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").partitionBy(partition_col).parquet(staged)
    staged_names = {
        n for n in fsutil.list_names(spark, staged) if "=" in n
    }
    touched_names = {partition_dir_name(partition_col, v) for v in touched}
    stray = staged_names - touched_names
    if stray:
        raise AssertionError(
            f"staged COW swap of {rel!r}: staged partitions {stray} "
            "are outside the touched set — keep frame wider than the "
            "touched slice"
        )
    return {
        "dir": rel,
        "partition_col": partition_col,
        "swap": sorted(touched_names & staged_names),
        "drop": sorted(touched_names - staged_names),
    }


def commit_cow(spark: SparkSession, path: str, manifest: dict) -> None:
    """The metadata-only commit/resume phase (idempotent end to end).

    Versioned protocol (round 16, VERDICT r15 item 2): staged
    partition copies RENAME BESIDE the live ones — into the hidden
    ``<dir>/__v{N}`` version directory — and the commit point is the
    atomic publish of ``_MANIFEST_v{N}.json``. ``_SUCCESS`` is never
    touched: readers that resolved the previous snapshot keep reading
    their (untouched) directories, readers that resolve after the
    publish see the new version — no outage, old snapshots readable
    until vacuumed (operators/snapshot.py has the full argument).
    Dropped partitions are purely logical (named in the manifest's
    ``dropped`` set); their bytes are reclaimed by vacuum or folded
    away by :func:`snapshot.collapse_snapshot`.

    A pre-round-16 pending manifest (no ``snap`` body — a crashed
    commit from the in-place protocol) replays with the ORIGINAL
    delete-old → rename-staged → marker-restore sequence, so old
    crash states still resume exactly."""
    staging_root = os.path.join(path, COW_STAGING)
    snap = manifest.get("snap")
    if snap is None:
        # Legacy in-place replay (round-15 manifests).
        fsutil.delete(spark, os.path.join(path, "_SUCCESS"))
        for job in manifest["jobs"]:
            d = os.path.join(path, job["dir"])
            staged = os.path.join(staging_root, job["dir"])
            for name in job["swap"]:
                src = os.path.join(staged, name)
                if not fsutil.is_dir(spark, src):
                    continue  # already swapped by a prior crashed run
                fsutil.delete(spark, os.path.join(d, name))
                fsutil.rename(spark, src, os.path.join(d, name))
            for name in job["drop"]:
                fsutil.delete(spark, os.path.join(d, name))
        if manifest.get("meta") is not None:
            fsutil.write_text(
                spark,
                os.path.join(path, "_META.json"),
                json.dumps(manifest["meta"]),
            )
        fsutil.delete(spark, staging_root)
        spark.catalog.refreshByPath(path)
        fsutil.touch(spark, os.path.join(path, "_SUCCESS"))
        fsutil.delete(spark, os.path.join(path, COW_MANIFEST))
        return
    version = int(snap["version"])
    for job in manifest["jobs"]:
        d = os.path.join(path, job["dir"])
        vd = os.path.join(d, f"{snapshot.VERSION_DIR_PREFIX}{version}")
        staged = os.path.join(staging_root, job["dir"])
        for name in job["swap"]:
            src = os.path.join(staged, name)
            if not fsutil.is_dir(spark, src):
                continue  # already renamed by a prior (crashed) run
            fsutil.mkdirs(spark, vd)
            dst = os.path.join(vd, name)
            fsutil.delete(spark, dst)  # torn prior rename, if any
            fsutil.rename(spark, src, dst)
        # job["drop"] entries are logical-only under versioning.
    if manifest.get("meta") is not None:
        fsutil.write_text(
            spark,
            os.path.join(path, "_META.json"),
            json.dumps(manifest["meta"]),
        )
    snapshot.publish_snapshot(spark, path, snap)  # THE commit point
    fsutil.delete(spark, staging_root)
    spark.catalog.refreshByPath(path)
    fsutil.delete(spark, os.path.join(path, COW_MANIFEST))


def run_cow_swap(
    spark: SparkSession, path: str, jobs: list[dict], meta: dict | None
) -> None:
    """MANIFEST + COMMIT over already-staged ``jobs``. ``meta`` is
    the full post-commit ``_META.json`` body (None = leave metadata
    untouched). The pending ``_COW_MANIFEST`` embeds the complete
    next-snapshot body, so a resume replays the identical commit."""
    snap = snapshot.apply_cow_jobs(
        snapshot.read_snapshot(spark, path),
        jobs,
        snapshot.current_version(spark, path) + 1,
    )
    manifest = {"jobs": jobs, "meta": meta, "snap": snap}
    fsutil.write_text(
        spark, os.path.join(path, COW_MANIFEST), json.dumps(manifest)
    )
    commit_cow(spark, path, manifest)


def resume_pending_cow(spark: SparkSession, path: str) -> bool:
    """Finish a crashed COW swap's commit if ``path`` carries a
    manifest (True when one was replayed). Every verb in the family
    calls this first; callers that READ ``_META.json`` must do so
    only AFTER this, since a pending commit may rewrite it."""
    mp = os.path.join(path, COW_MANIFEST)
    if not fsutil.exists(spark, mp):
        return False
    commit_cow(spark, path, json.loads(fsutil.read_text(spark, mp)))
    return True


__all__ = [
    "COW_MANIFEST",
    "COW_STAGING",
    "commit_cow",
    "partition_dir_name",
    "partition_filter",
    "resume_pending_cow",
    "run_cow_swap",
    "stage_partition_rewrite",
]
