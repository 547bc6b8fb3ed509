#!/usr/bin/env python
"""Stored-ANN-index decade study (round 11): query cost of
ivf_pq_topk_from_index against a PERSISTED index vs the recompute
path (ivf_pq_topk retrains PQ per call) as the corpus grows — the
claim behind ivf_pq_topk_indexed is "queries pay LUT + pruned code
scan, never a training pass", measured here.

For each corpus size: build+write the index once (reported), then
time (fresh cache scope each run):
  indexed   — read_ann_index + ivf_pq_topk_from_index (10 queries),
              best-of-3
  recompute — ivf_pq_topk (trains m·k codebooks per call), ONE cold
              run: it is the baseline being beaten, its run-to-run
              noise is irrelevant at the observed gap, and a
              best-of-3 at 2M+ vectors costs ~3× a multi-minute
              training pass per extra run

Corpora: sf0.1 embeddings (2,000 vectors), the 1000x replica (2M),
and the 2500x replica (5M) — built by scripts/ann_candidate_probe.py.

Usage: python scripts/ann_index_probe.py [--build-only] [--refresh]
  --build-only: remove each probe index and time a fresh
  write_ann_index (fills the build_s column when the probe indices
  already exist from a prior run); skips the query timings.
  --refresh (round 12): time refresh_ann_index of a FIXED 10-vector
  batch (fresh ids above the corpus range, encoded with the STORED
  codebook) against each corpus's index — the O(batch) claim behind
  ann_index_delta_topk: per-ingest wall must stay FLAT across corpus
  decades because the refresh touches the codebook (m·k rows), the
  cell centroids (#cells rows), and the batch — never the base codes.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from formula1_dataengineering_spark.caching import cache_scope  # noqa: E402
from formula1_dataengineering_spark.operators.clustering import (  # noqa: E402
    ivf_pq_topk,
    ivf_pq_topk_from_index,
    read_ann_index,
    refresh_ann_index,
    write_ann_index,
)
from formula1_dataengineering_spark.session import get_spark  # noqa: E402
from formula1_dataengineering_spark.sources.catalog import load  # noqa: E402

CORPORA = [
    ("2k", "/root/testdata/sf0.1"),
    ("2M", "/tmp/graft_emb1000x_sf01"),
    ("5M", "/tmp/graft_emb2500x_sf01"),
]


def main() -> None:
    build_only = "--build-only" in sys.argv[1:]
    spark = get_spark(app_name="ann-index-probe")
    print(
        f"{'corpus':>7} {'vectors':>10} {'build_s':>8} {'indexed_s':>10} "
        f"{'recompute_s':>12}"
    )
    for tag, sf_dir in CORPORA:
        if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
            print(f"{tag:>7} SKIP (missing {sf_dir})")
            continue
        emb = load(spark, sf_dir, "embeddings")
        n = emb.count()
        q = emb.where(F.col("vec_id") < 10)
        path = f"/tmp/graft_ann_probe_{tag}"
        if build_only and os.path.exists(path):
            shutil.rmtree(path)
        t0 = time.perf_counter()
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            write_ann_index(emb, path, m=8, k=4, iters=2)
            build_s = time.perf_counter() - t0
        else:
            build_s = float("nan")
        if build_only:
            print(f"{tag:>7} {n:>10,} {build_s:>8.1f} {'-':>10} {'-':>12}")
            continue
        if "--refresh" in sys.argv[1:]:
            # Fixed 10-vector batch with fresh ids above the corpus
            # range; idempotent per batch_id, so best-of-3 is valid.
            batch = q.select(
                (F.col("vec_id") + F.lit(n)).alias("vec_id"), "embedding"
            )
            b = float("inf")
            for _ in range(3):
                t = time.perf_counter()
                refresh_ann_index(batch, path, "probe1")
                b = min(b, time.perf_counter() - t)
            # Leave the index as found: drop the probe delta so a
            # later indexed/recompute run times the base state.
            os.remove(os.path.join(path, "_DELTA_probe1._SUCCESS"))
            shutil.rmtree(os.path.join(path, "codes_delta_probe1"))
            print(f"{tag:>7} {n:>10,} refresh_s {b:>8.2f}")
            continue

        def best(fn, runs=3):
            b = float("inf")
            for _ in range(runs):
                t = time.perf_counter()
                with cache_scope():
                    fn().collect()
                b = min(b, time.perf_counter() - t)
            return b

        codes, codebook, cells, meta = read_ann_index(spark, path)
        indexed = best(
            lambda: ivf_pq_topk_from_index(
                q, codes, codebook, m=8, k=4, iters=2, topk=5,
                index_meta=meta,
            )
        )
        recompute = best(
            lambda: ivf_pq_topk(emb, q, m=8, k=4, iters=2, topk=5),
            runs=1,
        )
        print(
            f"{tag:>7} {n:>10,} {build_s:>8.1f} {indexed:>10.2f} "
            f"{recompute:>12.2f}"
        )


if __name__ == "__main__":
    main()
