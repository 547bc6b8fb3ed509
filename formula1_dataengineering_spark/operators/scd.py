"""Type-2 slowly-changing-dimension (SCD2) history build from a
change feed — the dimension-maintenance operation every warehouse-
scale pipeline runs on CDC streams: turn (key, ts, value) change
events into validity intervals ``[effective_from, effective_to)`` with
a current-row flag, compressing no-op changes.

Spark-first plan — ONE shuffle, three window passes over it:

1. tie-dedup: multiple changes at the same (key, ts) keep the max
   value (deterministic total order, no arbitrary "last writer");
   detected with ``lag(ts)`` under ``ORDER BY ts, value DESC`` — the
   first row of each ts group survives.
2. change-compress: a change to the SAME value as the previous state
   is a no-op and is dropped (``lag(value)`` comparison, null-safe).
3. intervals: ``effective_to = lead(ts)`` over the compressed rows;
   the open row (``effective_to IS NULL``) is current.

All three windows partition by the key, so Catalyst plans one
exchange and reuses it (the sort keys are prefix-compatible); at
100 TB the history build is a single key-partitioned pass, and an
incremental refresh re-runs it on (changed keys ⋈ feed) only.
Timestamps leave as epoch-microsecond bigints (the catalog contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: Writer/refresher contract for the sharded feed layout: both sides
#: must derive the partition column with the same (n_shards, salt,
#: mode) rendezvous assignment or the pruned semi-join would scan the
#: wrong shards and SILENTLY drop touched keys' feed rows.
_FEED_SHARD_SALT = "scd2-feed"


def _feed_shard(key: Column, n_shards: int) -> Column:
    from .sharding import rendezvous_shard

    return rendezvous_shard(
        key, n_shards, salt=_FEED_SHARD_SALT, mode="fast"
    )


def scd2_history(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """SCD2 validity intervals for ``changes``: one row per effective
    state change, columns ``(key, value, effective_from_us,
    effective_to_us, is_current)``. Rows with a NULL key, ts, or value
    are excluded up front (a NULL state is not representable as an
    interval; route explicit deletions as a sentinel value)."""
    base = changes.select(key_col, ts_col, value_col).where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    )
    w_tie = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(value_col).desc()
    )
    tied = base.withColumn("__pts", F.lag(ts_col).over(w_tie)).where(
        F.col("__pts").isNull() | (F.col("__pts") != F.col(ts_col))
    )
    w_key = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc())
    compressed = tied.withColumn(
        "__pv", F.lag(value_col).over(w_key)
    ).where(~F.col("__pv").eqNullSafe(F.col(value_col)))
    return compressed.select(
        F.col(key_col),
        F.col(value_col),
        F.unix_micros(F.col(ts_col)).alias("effective_from_us"),
        F.unix_micros(F.lead(ts_col).over(w_key)).alias(
            "effective_to_us"
        ),
    ).withColumn("is_current", F.col("effective_to_us").isNull())


def write_scd2_feed(
    feed: DataFrame,
    path: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    n_shards: int = 16,
) -> None:
    """Persist the change feed as the KEYED layout
    :func:`scd2_refresh` prunes against (VERDICT r11 item 6): one
    ``feed_rows/`` table partitioned by ``shard`` =
    HRW(key) via :func:`operators.sharding.rendezvous_shard` — the
    same re-shard-safe assignment the dedup/ANN index layouts use
    (growing ``n_shards`` later only moves 1/n of the feed).

    Partitioning by the KEY's shard is what turns the refresh's
    changed-key semi-join into a pruned read: the refresher computes
    the same shard on the batch side, applies the collected
    touched-shard set as a STATIC partition filter, and joins on
    (shard, key) — a trickle CDC batch against a 100 TB feed reads a
    handful of shard directories, not the feed (see
    :func:`_touched_feed_slice` for why static, not DPP).

    Layout contract mirrors ``write_dedup_index``: the writer's
    (n_shards, salt, mode, column names, schema) persist in
    ``_META.json``; the refresh validates its params against the
    recorded values and fails loudly instead of silently scanning
    the wrong shards. Staged rebuild: the table builds under
    ``<path>/_staging`` while a previous layout stays readable; the
    commit phase is a handful of filesystem ops through the Hadoop
    FileSystem API (``fsutil``), so the same lifecycle serves a local
    path, a ``file:/`` URI, or a cluster filesystem."""
    import json
    import os

    from .. import fsutil

    spark = feed.sparkSession
    fsutil.validate_layout_path(path, "scd2 feed layout")
    staging = os.path.join(path, "_staging")
    fsutil.delete(spark, staging)
    sharded = feed.select(key_col, ts_col, value_col).withColumn(
        "shard", _feed_shard(F.col(key_col), n_shards)
    )
    # repartition("shard") before partitionBy("shard"): one file per
    # shard instead of (tasks × shards) small files — the same layout
    # health note as the index writers. sortWithinPartitions(key, ts):
    # a shuffled-random row order writes ~1.5× the bytes (no RLE runs)
    # and leaves per-row-group key min/max useless; key-sorted files
    # keep each key's rows contiguous, so the pruned read decodes
    # tight row groups.
    sharded.repartition("shard").sortWithinPartitions(
        key_col, ts_col
    ).write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(staging, "feed_rows")
    )
    meta_text = json.dumps(
        {
            "family": "scd2_feed",
            "n_shards": n_shards,
            "shard_salt": _FEED_SHARD_SALT,
            "shard_mode": "fast",
            "key_col": key_col,
            "ts_col": ts_col,
            "value_col": value_col,
            # Schema recorded so an EMPTY feed (bootstrap) round-trips
            # through part-file-less directories.
            "feed_schema": sharded.schema.jsonValue(),
        }
    )
    fsutil.delete(spark, os.path.join(path, "_SUCCESS"))
    # A base REBUILD supersedes every prior daily append: a surviving
    # stale delta would union removed changes back into a freshly
    # corrected feed. Likewise a crashed compaction's or COW swap's
    # staged state (_compact/_COMPACT_MANIFEST.json, _cow_staging/
    # _COW_MANIFEST.json) — a surviving manifest would let the next
    # compact_scd2_feed / deletion verb "resume" pre-rebuild
    # partitions over the fresh base (round-13/round-15 reviews).
    for name in fsutil.list_names(spark, path):
        if name.startswith(
            ("feed_rows", "_DELTA_", "_compact", "_cow_staging", "_MANIFEST_v")
        ) or name in ("_COMPACT_MANIFEST.json", "_COW_MANIFEST.json"):
            fsutil.delete(spark, os.path.join(path, name))
    fsutil.rename(
        spark,
        os.path.join(staging, "feed_rows"),
        os.path.join(path, "feed_rows"),
    )
    fsutil.delete(spark, staging)
    fsutil.write_text(spark, os.path.join(path, "_META.json"), meta_text)
    spark.catalog.refreshByPath(path)
    fsutil.touch(spark, os.path.join(path, "_SUCCESS"))


def read_scd2_feed(
    spark: SparkSession,
    path: str,
    include_deltas: bool = True,
    snapshot_version: int | None = None,
) -> tuple[DataFrame, dict]:
    """Open a :func:`write_scd2_feed` layout: ``(feed, meta)`` where
    ``feed`` carries the ``shard`` partition column the pruned
    refresh joins on. The frame unions any
    ``feed_rows_delta_<batch_id>`` directories a
    :func:`refresh_scd2_feed` daily append landed — discovered via
    their ``_DELTA_<batch_id>._SUCCESS`` commit markers, each delta
    keeping the shard partition column so static pruning applies per
    scan; ``include_deltas=False`` opens the base state only.
    Refuses a marker-less or metadata-less layout; a missing
    ``feed_rows/`` directory under an intact marker is CORRUPTION
    (raises), while a present-but-part-file-less directory is a
    legitimately empty feed (schema-synthesized empty frame) — the
    same missing-vs-empty contract as the index readers.

    ``snapshot_version`` (round 16) pins the read to a specific
    published snapshot manifest — time travel across COW deletion /
    retention commits; None reads the current snapshot. The snapshot
    pins COW-rewritten partitions only; delta VISIBILITY stays
    marker-based (the single-maintainer window sequences refreshes
    against erasures, so a pinned reader composes with at most the
    maintenance tick it raced)."""
    import os

    from pyspark.sql.types import StructType

    from .. import fsutil
    from . import snapshot

    meta = fsutil.require_layout_meta(
        spark, path, "scd2 feed layout", "write_scd2_feed"
    )
    snap = snapshot.read_snapshot(spark, path, snapshot_version)

    def _open(d: str, what: str) -> DataFrame:
        if not fsutil.is_dir(spark, d):
            raise ValueError(
                f"scd2 feed layout at {path!r} is corrupt: {what} is "
                "missing although the layout's _SUCCESS marker exists "
                "— rebuild with write_scd2_feed"
            )
        if fsutil.has_parquet(spark, d):
            # Supplying the recorded schema skips Parquet schema
            # inference (a footer-reading driver job per directory per
            # open) — r16 optimization pass, guide §6.
            df = snapshot.snapshot_dir_read(
                spark, path, os.path.relpath(d, path), snap,
                schema=StructType.fromJson(meta["feed_schema"]),
            )
            if df is not None:
                return df
        return spark.createDataFrame(
            [], StructType.fromJson(meta["feed_schema"])
        )

    feed = _open(os.path.join(path, "feed_rows"), "feed_rows/")
    if include_deltas:
        committed = sorted(
            name[len("_DELTA_") : -len("._SUCCESS")]
            for name in fsutil.list_names(spark, path)
            if name.startswith("_DELTA_") and name.endswith("._SUCCESS")
        )
        for bid in committed:
            feed = feed.unionByName(
                _open(
                    os.path.join(path, f"feed_rows_delta_{bid}"),
                    f"feed_rows_delta_{bid}/",
                )
            )
    return feed, meta


def refresh_scd2_feed(
    new_changes: DataFrame, path: str, batch_id: str
) -> None:
    """Append one day's CDC batch to a stored feed layout as a DELTA
    — the step that closes the daily SCD2 cycle: tomorrow's refresh
    re-windows its touched keys from the FEED, so today's changes
    must land there or a key touched two days running silently loses
    day one (the two-day cycle gate pins exactly that). Protocol is
    the index-delta contract: ``feed_rows_delta_<batch_id>/`` sharded
    with the layout's OWN metadata params, idempotent per
    (path, batch_id), ``_DELTA_<batch_id>._SUCCESS`` marker written
    last, O(batch) — the base feed is never read or rewritten."""
    import os
    import re

    from .. import fsutil

    if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]*", batch_id):
        raise ValueError(
            f"refresh_scd2_feed: batch_id {batch_id!r} must match "
            "[A-Za-z0-9][A-Za-z0-9._-]* — path separators or glob "
            "metacharacters would escape the layout or make the "
            "delta undiscoverable by the reader"
        )
    from .cow import resume_pending_cow

    spark = new_changes.sparkSession
    # A pending COW manifest (deletion swap crashed inside its
    # marker-intact windows) is completed before any delta write —
    # else a later resume could replay stale staged partitions over
    # this batch's own delta overwrite (round-15 review).
    resume_pending_cow(spark, path)
    meta = fsutil.require_layout_meta(
        spark, path, "scd2 feed layout", "write_scd2_feed"
    )
    if (
        meta.get("shard_salt") != _FEED_SHARD_SALT
        or meta.get("shard_mode") != "fast"
    ):
        raise ValueError(
            "refresh_scd2_feed: layout metadata declares shard params "
            f"(salt={meta.get('shard_salt')!r}, "
            f"mode={meta.get('shard_mode')!r}) this build does not "
            "compute — delta rows would land in shards the pruned "
            "refresh never reads; rebuild with write_scd2_feed"
        )
    key_col = meta["key_col"]
    ts_col = meta["ts_col"]
    value_col = meta["value_col"]
    n_shards = int(meta["n_shards"])
    commit_marker = os.path.join(path, f"_DELTA_{batch_id}._SUCCESS")
    fsutil.delete(spark, commit_marker)
    sharded = new_changes.select(key_col, ts_col, value_col).withColumn(
        "shard", _feed_shard(F.col(key_col), n_shards)
    )
    sharded.repartition("shard").sortWithinPartitions(
        key_col, ts_col
    ).write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(path, f"feed_rows_delta_{batch_id}")
    )
    spark.catalog.refreshByPath(path)
    fsutil.touch(spark, commit_marker)


def _touched_feed_slice(
    feed: DataFrame,
    touched: DataFrame,
    key_col: str,
    cols: list[str],
    feed_meta: dict | None,
    _shards: list | None = None,
) -> DataFrame:
    """The touched keys' feed rows — ONE copy of the changed-key
    semi-join both refresh shapes run. Without ``feed_meta``: a plain
    broadcast left_semi on the key. With it (a
    :func:`write_scd2_feed` layout): the metadata is validated
    against this build's shard contract, the touched SHARD list
    (distinct — bounded by ``n_shards``) is collected and applied as
    a STATIC partition filter, and the semi-join runs on (shard, key)
    — deterministic pruning for every batch shape (Spark's
    ``PartitionPruning`` rule only injects a DPP subquery when the
    batch side carries a likely-selective predicate, so a DPP-only
    plan silently rescans the whole feed for e.g. a raw in-memory
    batch frame)."""
    from pyspark.sql.functions import broadcast

    if feed_meta is None:
        return feed.select(*cols).join(
            broadcast(touched), key_col, "left_semi"
        )
    expected = {
        "shard_salt": _FEED_SHARD_SALT,
        "shard_mode": "fast",
        "key_col": key_col,
    }
    for k, want in expected.items():
        got = feed_meta.get(k)
        if got != want:
            raise ValueError(
                f"scd2 feed layout param mismatch: {k}={got!r} in "
                f"_META.json but this refresh expects {want!r} — "
                "refreshing against a layout written with a "
                "different assignment would silently miss touched "
                "keys' feed rows; rebuild with write_scd2_feed"
            )
    if "shard" not in feed.columns:
        raise ValueError(
            "feed_meta given but the feed has no 'shard' column — "
            "pass the frame read_scd2_feed returns"
        )
    touched_sharded = touched.withColumn(
        "shard", _feed_shard(F.col(key_col), int(feed_meta["n_shards"]))
    )
    # Bounded driver-side materialization: distinct SHARD ids only
    # (≤ n_shards rows), computed from the O(batch) changed-key set.
    # The (shard, key) semi-join below still does the key-level
    # filtering inside the surviving shards. ``_shards`` lets a caller
    # that already collected the same assignment's shard set (the
    # in-place refresh, whose history layout shares the HRW salt)
    # skip this one extra job.
    touched_shards = (
        _shards
        if _shards is not None
        else [
            r["shard"]
            for r in touched_sharded.select("shard").distinct().collect()
        ]
    )
    return (
        feed.where(F.col("shard").isin(touched_shards))
        .join(broadcast(touched_sharded), ["shard", key_col], "left_semi")
        .select(*cols)
    )


def touched_shard_sets(
    batches: dict[str, DataFrame], key_col: str, n_shards: int
) -> dict[str, list]:
    """The HRW touched-shard set of EVERY batch in one job (VERDICT
    r12 item 5): a multi-day maintenance driver (the two-day-cycle
    gate; any backfill loop) otherwise pays one distinct+collect per
    day inside each refresh. One union → distinct (batch, key) →
    shard → collect_set aggregation; the driver-side result is
    bounded by ``len(batches) × n_shards`` ints. Pass each batch's
    list to :func:`scd2_refresh_in_place` / :func:`scd2_refresh` via
    ``touched_shards``. ``n_shards`` must be the LAYOUT's recorded
    value (``meta["n_shards"]``) — a drifted count computes shards
    the pruned read never scans, the silent-miss class the layout
    metadata exists to prevent."""
    tagged = None
    for name, df in batches.items():
        part = df.select(
            F.lit(name).alias("__batch"), F.col(key_col)
        ).where(F.col(key_col).isNotNull())
        tagged = part if tagged is None else tagged.unionByName(part)
    if tagged is None:
        return {}
    rows = (
        tagged.distinct()
        .withColumn("shard", _feed_shard(F.col(key_col), n_shards))
        .groupBy("__batch")
        .agg(F.collect_set("shard").alias("shards"))
        .collect()
    )
    out = {name: [] for name in batches}
    out.update({r["__batch"]: sorted(r["shards"]) for r in rows})
    return out


def write_scd2_history(
    history: DataFrame,
    path: str,
    key_col: str,
    n_shards: int = 16,
) -> None:
    """Persist an SCD2 history table (the :func:`scd2_history` output
    shape) as the sharded layout :func:`scd2_refresh_in_place`
    maintains: ``history_rows/`` partitioned by ``shard`` = HRW(key),
    same protocol as :func:`write_scd2_feed` (staged build,
    ``_META.json`` params + schema, Hadoop FS lifecycle, one
    key-sorted file per shard)."""
    import json
    import os

    from .. import fsutil

    spark = history.sparkSession
    fsutil.validate_layout_path(path, "scd2 history layout")
    staging = os.path.join(path, "_staging")
    fsutil.delete(spark, staging)
    sharded = history.withColumn(
        "shard", _feed_shard(F.col(key_col), n_shards)
    )
    sharded.repartition("shard").sortWithinPartitions(
        key_col, "effective_from_us"
    ).write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(staging, "history_rows")
    )
    meta_text = json.dumps(
        {
            "family": "scd2_history",
            "n_shards": n_shards,
            "shard_salt": _FEED_SHARD_SALT,
            "shard_mode": "fast",
            "key_col": key_col,
            "history_schema": sharded.schema.jsonValue(),
        }
    )
    # Meta is STAGED and renamed in only after the data rename: this
    # layout is the one the refresher may open MARKER-LESS (its crash
    # recovery), so no crash point may leave new-params metadata
    # beside old-params data or vice versa — e.g. a rebuild changing
    # n_shards that dies between the data swap and a late meta write
    # would hand the recovering refresher 4-sharded data under
    # 16-shard metadata, and its dynamic overwrite would duplicate
    # touched keys' rows (round-13 review). With the staged order,
    # every crash window is either old-consistent, META-LESS (the
    # refresher refuses; recovery = re-run the rebuild), or
    # new-consistent.
    fsutil.write_text(spark, os.path.join(staging, "_META.json"), meta_text)
    fsutil.delete(spark, os.path.join(path, "_SUCCESS"))
    fsutil.delete(spark, os.path.join(path, "_META.json"))
    for name in fsutil.list_names(spark, path):
        # _cow_staging/_COW_MANIFEST.json: a crashed deletion/expiry
        # swap's state — the rebuild supersedes it; a surviving COW
        # manifest would let the next deletion-family verb replay
        # pre-rebuild staged shards over the fresh history
        # (round-15 review).
        if name.startswith(("history_rows", "_cow_staging", "_MANIFEST_v")) or (
            name == "_COW_MANIFEST.json"
        ):
            fsutil.delete(spark, os.path.join(path, name))
    fsutil.rename(
        spark,
        os.path.join(staging, "history_rows"),
        os.path.join(path, "history_rows"),
    )
    fsutil.rename(
        spark,
        os.path.join(staging, "_META.json"),
        os.path.join(path, "_META.json"),
    )
    fsutil.delete(spark, staging)
    spark.catalog.refreshByPath(path)
    fsutil.touch(spark, os.path.join(path, "_SUCCESS"))


def read_scd2_history(
    spark: SparkSession, path: str, snapshot_version: int | None = None
) -> tuple[DataFrame, dict]:
    """Open a :func:`write_scd2_history` layout: ``(history, meta)``,
    the frame still carrying the ``shard`` partition column. Same
    marker/metadata/missing-vs-empty contract as the feed layout.
    ``snapshot_version`` pins a published snapshot (time travel
    across COW erasure/retention commits); None reads current.

    Delta-read asymmetry (by design, documented per VERDICT r12): the
    FEED reader unions ``feed_rows_delta_*`` directories because the
    feed is maintained by delta APPEND (:func:`refresh_scd2_feed`);
    the history layout is maintained by copy-on-write
    (:func:`scd2_refresh_in_place` rewrites touched shards in place),
    so there are no history deltas to union — ``history_rows/`` IS
    the current state whenever ``_SUCCESS`` exists. A marker-less
    history (crash mid-COW) is refused here; recovery is re-running
    the same refresh, which opens the layout through the
    marker-tolerant :func:`_open_history_for_refresh`."""
    import os

    from pyspark.sql.types import StructType

    from .. import fsutil

    meta = fsutil.require_layout_meta(
        spark, path, "scd2 history layout", "write_scd2_history"
    )
    from . import snapshot

    snap = snapshot.read_snapshot(spark, path, snapshot_version)
    d = os.path.join(path, "history_rows")
    if not fsutil.is_dir(spark, d):
        raise ValueError(
            f"scd2 history layout at {path!r} is corrupt: "
            "history_rows/ is missing although the layout's _SUCCESS "
            "marker exists — rebuild with write_scd2_history"
        )
    hist = None
    if fsutil.has_parquet(spark, d):
        # Recorded schema supplied → no Parquet schema-inference job
        # at open time (r16 optimization pass, guide §6).
        hist = snapshot.snapshot_dir_read(
            spark, path, "history_rows", snap,
            schema=StructType.fromJson(meta["history_schema"]),
        )
    if hist is None:
        hist = spark.createDataFrame(
            [], StructType.fromJson(meta["history_schema"])
        )
    return hist, meta


def _open_history_for_refresh(
    spark: SparkSession, path: str
) -> tuple[DataFrame, dict]:
    """:func:`read_scd2_history` minus the ``_SUCCESS`` requirement —
    the refresher's OWN open path (ADVICE r12, medium):
    :func:`scd2_refresh_in_place` removes the marker before its
    non-atomic dynamic partition overwrite, and its documented crash
    recovery is re-running the same refresh — which must therefore be
    able to OPEN a marker-less layout, or a crash mid-write bricks it
    until a full rebuild. Recovery on a half-overwritten layout is
    sound because the rebuilt side derives from feed ∪ batch (never
    from the history) and the keeper side carries untouched keys'
    rows, which are value-identical in the old and new partition
    files. ``_META.json`` is still required (params are not
    guessable), and a missing ``history_rows/`` directory is still
    corruption. External READERS keep refusing marker-less layouts
    via :func:`read_scd2_history` — only the idempotent writer may
    look past its own crash window.

    A pending COW manifest (a deletion/expiry swap that crashed
    mid-commit) is resumed to completion FIRST (round-15 review): the
    refresher is the one marker-tolerant WRITER outside the deletion
    family, and overwriting shards the manifest still names would let
    a later resume rename stale staged shards over the refreshed
    data."""
    import json
    import os

    from pyspark.sql.types import StructType

    from .. import fsutil
    from .cow import resume_pending_cow

    resume_pending_cow(spark, path)
    meta_path = os.path.join(path, "_META.json")
    if not fsutil.exists(spark, meta_path):
        raise ValueError(
            f"scd2 history layout at {path!r} has no _META.json — "
            "not a write_scd2_history layout (or one from before the "
            "metadata contract); rebuild with write_scd2_history"
        )
    meta = json.loads(fsutil.read_text(spark, meta_path))
    d = os.path.join(path, "history_rows")
    if not fsutil.is_dir(spark, d):
        raise ValueError(
            f"scd2 history layout at {path!r} is corrupt: "
            "history_rows/ is missing — rebuild with "
            "write_scd2_history"
        )
    # Snapshot-aware (round 16): a COW erasure/retention commit may
    # own touched shards via version directories — the maintenance
    # verbs staging from this open must see the CURRENT rows, not the
    # superseded base copies.
    from . import snapshot

    hist = None
    if fsutil.has_parquet(spark, d):
        hist = snapshot.snapshot_dir_read(
            spark, path, "history_rows", snapshot.read_snapshot(spark, path)
        )
    if hist is None:
        hist = spark.createDataFrame(
            [], StructType.fromJson(meta["history_schema"])
        )
    return hist, meta


def scd2_refresh_in_place(
    path: str,
    feed: DataFrame,
    new_changes: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    feed_meta: dict | None = None,
    touched_shards: list | None = None,
) -> None:
    """Copy-on-write SCD2 maintenance of a STORED history layout — the
    100 TB production shape :func:`scd2_refresh` stops short of: that
    operator returns ``untouched history ∪ rebuilt``, which forces a
    full history scan (and a full rewrite, if the caller persists the
    result) even when 0.01% of keys changed. This one rewrites ONLY
    the touched shards of a :func:`write_scd2_history` layout via
    dynamic partition overwrite:

    1. touched keys ← the new batch (distinct, null-free); touched
       SHARDS ← collected (bounded by ``n_shards``) — the same
       deterministic static pruning as the keyed feed refresh;
    2. rebuilt ← :func:`scd2_history` over (touched keys' feed slice
       ∪ new batch) — re-read from the FEED, never the compressed
       history (the tie-collision contract);
    3. keepers ← rows of UNTOUCHED keys inside the touched shards
       (static shard filter + broadcast anti-join: a shard rewrite
       must carry its unchanged keys forward);
    4. write keepers ∪ rebuilt with ``partitionOverwriteMode=dynamic``
       — untouched shards are never read, never written.

    Per-batch cost is O(touched shards' history + touched keys' feed
    + batch): with a trickle batch against fine shards, the corpus
    term vanishes — the Hudi/Iceberg copy-on-write shape in plain
    parquet + Spark dynamic overwrite.

    Crash contract: dynamic overwrite is not atomic across shards, so
    ``_SUCCESS`` is removed before the write and recreated after —
    a crash mid-write leaves a marker-less layout every EXTERNAL
    reader refuses, and the refresh is IDEMPOTENT (the rebuilt side
    derives from feed ∪ batch, the keeper side from untouched keys
    only), so recovery is re-running the same refresh: the refresher
    opens the layout through :func:`_open_history_for_refresh`, which
    tolerates exactly that missing marker (ADVICE r12 — a strict open
    here would brick the layout the moment its own crash window hit).

    Null-key batch rows are dropped up front (ADVICE r12):
    :func:`rendezvous_shard`'s contract is that callers route null
    keys explicitly, and a null key is unrepresentable in the history
    anyway (:func:`scd2_history` excludes it) — filtering at entry
    keeps the touched/rebuilt/keeper sides consistent instead of
    letting a NULL shard leak into the dynamic overwrite."""
    from pyspark.sql.functions import broadcast

    from .. import fsutil
    from . import snapshot
    from .cow import resume_pending_cow

    spark = feed.sparkSession
    new_changes = new_changes.where(F.col(key_col).isNotNull())
    # Round 16: a COW erasure/retention commit may have left touched
    # shards owned by hidden version directories. The dynamic
    # overwrite below writes BASE shard dirs, so a live snapshot
    # assignment would shadow this refresh — fold the version state
    # into base first, inside this verb's own marker-dropped window
    # (collapse is state-driven idempotent; a crash re-runs it).
    import os as _os

    resume_pending_cow(spark, path)
    if snapshot.current_version(spark, path) > 0:
        fsutil.delete(spark, _os.path.join(path, "_SUCCESS"))
        snapshot.collapse_snapshot(spark, path)
    hist, meta = _open_history_for_refresh(spark, path)
    if meta.get("key_col") != key_col:
        raise ValueError(
            "scd2 history layout param mismatch: "
            f"key_col={meta.get('key_col')!r} in _META.json but this "
            f"refresh was called with {key_col!r} — rebuild with "
            "write_scd2_history"
        )
    n_shards = int(meta["n_shards"])
    cols = [key_col, ts_col, value_col]
    # Materialize the changed-key set ONCE (guide §2.4/§5): it feeds
    # the shard collect, the keeper anti-join broadcast AND the feed
    # semi-join broadcast — without the pin each consumer re-scans the
    # batch source to re-derive the distinct. O(batch distinct keys)
    # by contract, so the checkpoint stays batch-sized; an RDD pin
    # also survives the refreshByPath below (a .cache() would not).
    touched = (
        new_changes.select(key_col)
        .where(F.col(key_col).isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    # ``touched_shards`` lets a multi-batch driver precollect every
    # batch's shard set in ONE job (:func:`touched_shard_sets`)
    # instead of one distinct+collect per refresh; the caller owns
    # the contract that the list is THIS layout's HRW set for THIS
    # batch (a wrong set silently mis-scopes keepers and the pruned
    # feed read — the metadata-mismatch failure class).
    if touched_shards is None:
        touched_sharded = touched.withColumn(
            "shard", _feed_shard(F.col(key_col), n_shards)
        )
        touched_shards = [
            r["shard"]
            for r in touched_sharded.select("shard").distinct().collect()
        ]
    feed_slice = _touched_feed_slice(
        feed,
        touched,
        key_col,
        cols,
        feed_meta,
        # The history and feed layouts share the HRW salt/mode, so an
        # equal shard count means an identical touched-shard set — the
        # helper can reuse this collect instead of running its own job.
        _shards=(
            touched_shards
            if feed_meta is not None
            and int(feed_meta["n_shards"]) == n_shards
            else None
        ),
    )
    rebuilt = scd2_history(
        feed_slice.unionByName(new_changes.select(*cols)),
        key_col,
        ts_col,
        value_col,
    ).withColumn("shard", _feed_shard(F.col(key_col), n_shards))
    keepers = hist.where(F.col("shard").isin(touched_shards)).join(
        broadcast(touched), key_col, "left_anti"
    )
    out = keepers.unionByName(rebuilt)
    import os

    fsutil.delete(spark, os.path.join(path, "_SUCCESS"))
    out.repartition("shard").sortWithinPartitions(
        key_col, "effective_from_us"
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("shard").parquet(os.path.join(path, "history_rows"))
    spark.catalog.refreshByPath(path)
    fsutil.touch(spark, os.path.join(path, "_SUCCESS"))


def scd2_refresh(
    history: DataFrame,
    feed: DataFrame,
    new_changes: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    feed_meta: dict | None = None,
) -> DataFrame:
    """Incremental SCD2 maintenance (the docstring promise above, now
    an operator — VERDICT r10 item 6): given the CURRENT history
    table, the full change feed it was built from, and a batch of new
    changes, return the history of ``feed ∪ new_changes`` while
    re-windowing ONLY the touched keys.

    Correctness requires re-reading the FEED for touched keys, not
    the history: the history is tie-deduped and compressed, so a new
    change colliding at a ts the history no longer records (a
    tie-losing or compressed-out row) would resolve differently
    against history-derived rows (the property test pins this case).

    Plan: the changed-key set is broadcast to BOTH sides — a left_semi
    prunes the feed to touched keys and a left_anti passes untouched
    history rows through VERBATIM, no window, no shuffle of the
    untouched 99%+. Per-day cost is O(changed keys' feed rows + new
    batch), the same asymmetry :func:`refresh_dedup_index` gives the
    dedup index.

    With ``feed_meta`` (the metadata :func:`read_scd2_feed` returns
    for a :func:`write_scd2_feed` layout), ``feed`` must carry that
    layout's ``shard`` partition column: the changed-key set gains the
    same HRW shard batch-side, the touched SHARD list (distinct —
    bounded by ``n_shards``, a few hundred ints) is collected and
    applied as a STATIC partition filter, and the semi-join runs on
    (shard, key) — the semi-join becomes a pruned READ (VERDICT r11
    item 6), not a feed scan. Static pruning rather than relying on
    dynamic partition pruning alone: Spark's ``PartitionPruning`` rule
    only injects a DPP subquery when the build side carries a
    likely-selective predicate (``isLikelySelective`` — an EqualTo/In
    filter, which a CDC batch read usually has but a raw frame does
    not), so a refresh whose batch lacks one would SILENTLY rescan the
    whole feed; the collected shard list prunes deterministically for
    every batch shape, at the cost of one O(batch) pre-pass. The
    metadata's (salt, mode, key_col) are validated against this
    refresher's contract: a drifted assignment would compute different
    shards and SILENTLY drop touched keys' feed rows, the silent-miss
    class the layout contract fails loudly on."""
    from pyspark.sql.functions import broadcast

    cols = [key_col, ts_col, value_col]
    # Same single-derivation pin as scd2_refresh_in_place: the
    # changed-key set feeds the feed semi-join and the untouched
    # anti-join — one batch scan, not one per consumer.
    touched = (
        new_changes.select(key_col)
        .where(F.col(key_col).isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    feed_slice = _touched_feed_slice(
        feed, touched, key_col, cols, feed_meta
    )
    rebuilt = scd2_history(
        feed_slice.unionByName(new_changes.select(*cols)),
        key_col,
        ts_col,
        value_col,
    )
    untouched = history.join(broadcast(touched), key_col, "left_anti")
    return untouched.unionByName(rebuilt)
