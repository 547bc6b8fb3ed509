#!/usr/bin/env python
"""Compaction decade study (round 13): what a year of daily deltas
COSTS a stored dedup index, and what folding them back buys — the
measured claim behind compact_dedup_index (VERDICT r12 item 1).

For each corpus decade:
  - build + write the HRW-sharded index (one-time);
  - land N fixed-size daily deltas (refresh_dedup_index — O(batch));
  - probe a fixed batch against base ∪ N deltas (the accumulated
    state a never-compacted pipeline pays on EVERY ingest), reporting
    wall and the layout's file count;
  - compact_dedup_index (reported: fold wall, partitions rewritten);
  - probe again against the folded base (wall + file count), and
    assert the flags are value-identical across the fold.

The scaling claims this prints evidence for:
  - probe wall grows with DELTA COUNT, not corpus size (each delta is
    an extra pruned scan unioned into every probe — 365 ingests = 365
    extra scans);
  - compaction cost is bounded by the TOUCHED partitions' bytes (the
    fold is a partition-wise merge, untouched shards byte-identical);
  - the post-fold probe returns to the fresh-index wall.

Decades (documents does not grow between sf0.001 and sf0.01, so the
replica dirs carry the upper decades — same set as ingest_probe):
  1x    /root/testdata/sf0.01       (~6k docs)
  10x   /tmp/graft_rep10x_sf001    (~60k)
  100x  /tmp/graft_rep100x_sf001   (~600k)

Usage: python scripts/compaction_probe.py [--deltas 12] [--shards 64]
Prints one row per decade; paste the table into BASELINE.md.
Never run concurrently with bench/other probes (they saturate cores).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from formula1_dataengineering_spark.caching import cache_scope  # noqa: E402
from formula1_dataengineering_spark.operators.compaction import (  # noqa: E402
    compact_dedup_index,
)
from formula1_dataengineering_spark.operators.dedup import (  # noqa: E402
    incremental_dedup_from_index,
    read_dedup_index,
    refresh_dedup_index,
    write_dedup_index,
)
from formula1_dataengineering_spark.session import get_spark  # noqa: E402
from formula1_dataengineering_spark.sources.catalog import load  # noqa: E402

DECADES = [
    ("1x", "/root/testdata/sf0.01"),
    ("10x", "/tmp/graft_rep10x_sf001"),
    ("100x", "/tmp/graft_rep100x_sf001"),
]


def _count_files(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def _probe(spark, path, batch, label):
    with cache_scope():
        hashes, bands, meta = read_dedup_index(spark, path)
        t = time.time()
        flags = sorted(
            map(
                tuple,
                incremental_dedup_from_index(
                    batch,
                    hashes,
                    bands,
                    n_shards=int(meta["n_shards"]),
                    index_meta=meta,
                ).collect(),
            )
        )
        wall = time.time() - t
    return wall, flags


def main() -> None:
    n_deltas = 12
    n_shards = 64
    args = sys.argv[1:]
    if "--deltas" in args:
        n_deltas = int(args[args.index("--deltas") + 1])
    if "--shards" in args:
        n_shards = int(args[args.index("--shards") + 1])
    if "--ann" in args:
        ann_mode(n_deltas)
        return
    spark = get_spark()
    print(
        f"decade  build_s  deltas  probe_deltas_s  files_before  "
        f"compact_s  parts_folded  probe_folded_s  files_after  flags_eq"
    )
    for label, sf_dir in DECADES:
        if not os.path.isdir(sf_dir):
            print(f"{label:6s}  SKIP (missing {sf_dir})")
            continue
        d = load(spark, sf_dir, "documents")
        # Held-out pool split into N fixed daily batches; a disjoint
        # 4-doc probe batch plays the day-N+1 ingest.
        pool = d.where(F.col("doc_id") % 7 == 0)
        corpus = d.where(
            (F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 11 != 1)
        )
        probe_batch = d.where(F.col("doc_id") % 11 == 1).limit(4)
        path = f"/tmp/graft_compact_probe_{label}"
        t = time.time()
        with cache_scope():
            write_dedup_index(corpus, path, n_shards=n_shards)
        build_s = time.time() - t
        for i in range(n_deltas):
            day = pool.where(F.expr("doc_id div 7") % n_deltas == i)
            with cache_scope():
                refresh_dedup_index(day, path, f"day{i:03d}")
        files_before = _count_files(path)
        w1, flags1 = _probe(spark, path, probe_batch, label)
        t = time.time()
        summary = compact_dedup_index(spark, path)
        compact_s = time.time() - t
        parts = sum(
            len(v) for v in summary["touched_partitions"].values()
        )
        files_after = _count_files(path)
        w2, flags2 = _probe(spark, path, probe_batch, label)
        print(
            f"{label:6s}  {build_s:7.2f}  {summary['n_deltas_folded']:6d}"
            f"  {w1:14.2f}  {files_before:12d}  {compact_s:9.2f}"
            f"  {parts:12d}  {w2:14.2f}  {files_after:11d}"
            f"  {flags1 == flags2!s:8s}"
        )


# --------------------------------------------------------------------------
# --ann mode: the same study for the stored IVF-PQ index, at the
# vector scales of scripts/ann_index_probe.py (2k / 2M / 5M). Works on
# a COPY of the persisted probe indices (compaction folds deltas into
# the base, and ann_index_probe's --refresh expects its layouts
# unfolded — the new insert-only guard would refuse re-appends of
# folded ids). Deltas carry synthetic fresh ids (disjoint by
# construction), so the guard's O(index-ids) pass is skipped via
# check_disjoint=False — exactly the opt-out's intended use.
# --------------------------------------------------------------------------

ANN_CORPORA = [
    ("2k", "/root/testdata/sf0.1"),
    ("2M", "/tmp/graft_emb1000x_sf01"),
    ("5M", "/tmp/graft_emb2500x_sf01"),
]


def ann_mode(n_deltas: int) -> None:
    import shutil

    from formula1_dataengineering_spark.operators.clustering import (
        ivf_pq_topk_from_index,
        read_ann_index,
        refresh_ann_index,
    )
    from formula1_dataengineering_spark.operators.compaction import (
        compact_ann_index,
    )

    spark = get_spark()
    print(
        "corpus  vectors     deltas  probe_deltas_s  files_before  "
        "compact_s  probe_folded_s  files_after  topk_eq"
    )
    for tag, sf_dir in ANN_CORPORA:
        src = f"/tmp/graft_ann_probe_{tag}"
        if not os.path.isdir(src) or not os.path.isdir(sf_dir):
            print(f"{tag:6s}  SKIP (missing {src} or {sf_dir})")
            continue
        emb = load(spark, sf_dir, "embeddings")
        n = emb.count()
        q = emb.where(F.col("vec_id") < 10).select("vec_id", "embedding")
        work = f"/tmp/graft_ann_compact_probe_{tag}"
        shutil.rmtree(work, ignore_errors=True)
        shutil.copytree(src, work)
        for i in range(n_deltas):
            batch = q.select(
                (F.col("vec_id") + F.lit(n + i * 100)).alias("vec_id"),
                "embedding",
            )
            with cache_scope():
                refresh_ann_index(
                    batch, work, f"day{i:03d}", check_disjoint=False
                )

        def probe():
            with cache_scope():
                codes, codebook, cells, meta = read_ann_index(spark, work)
                t = time.time()
                rows = sorted(
                    map(
                        tuple,
                        ivf_pq_topk_from_index(
                            q, codes, codebook, m=8, k=4, iters=2,
                            topk=5, index_meta=meta, cells=cells,
                            nprobe=2,
                        ).collect(),
                    )
                )
            return time.time() - t, rows

        w1a, rows1 = probe()
        w1b, _ = probe()
        files_before = _count_files(work)
        t = time.time()
        compact_ann_index(spark, work)
        compact_s = time.time() - t
        files_after = _count_files(work)
        w2a, rows2 = probe()
        w2b, _ = probe()
        print(
            f"{tag:6s}  {n:>10,}  {n_deltas:6d}  {min(w1a, w1b):14.2f}"
            f"  {files_before:12d}  {compact_s:9.2f}"
            f"  {min(w2a, w2b):14.2f}  {files_after:11d}"
            f"  {rows1 == rows2!s:7s}"
        )


if __name__ == "__main__":
    main()
