#!/usr/bin/env python
"""Maintenance-tick decade study (round 14): what ONE policy tick of
the unified maintenance loop (operators/maintenance.py) costs at
each corpus decade, per decision arm — the measured claim behind
"the nightly tick is O(probe); rebuild is the only corpus-sized
verb, and it runs exactly when the measured drift says so".

For each documents decade this measures, on a fresh HRW-sharded
dedup-index layout with two landed daily deltas:

  - HOLD tick wall  (maintain with thresholds that hold: the cost is
    the measurement alone — two columnar count scans + marker
    listing);
  - COMPACT tick wall (maintain with compact_after=2: measurement +
    the partition-wise fold of the two deltas);
  - REBUILD tick wall (maintain with rebuild_rows_over=0.0 and the
    raw corpus supplied: measurement + full re-shingle/re-shard) —
    the corpus-sized verb, expected to scale ~linearly with docs
    while hold/compact stay probe-bounded.

Decades (documents does not grow between sf0.001 and sf0.01, so the
replica dirs carry the upper decades — the compaction_probe set):
  1x    /root/testdata/sf0.01      (~500 docs)
  10x   /tmp/graft_rep10x_sf001    (~5k)
  100x  /tmp/graft_rep100x_sf001   (~50k)

Usage: python scripts/maintenance_probe.py [--shards 64]

Round 15 adds ``--ann-sampled`` (VERDICT r14 item 5): the ANN
family's HOLD tick pays an exact referee of O(|queries| · corpus)
dot products — the one corpus-sized nightly read the dedup/feed
ticks don't have. The sampled referee (deterministic hash-sample,
oracle-replayable) with keep/mod chosen per decade as
sample_budget / corpus_rows keeps the tick's referee cost FLAT
across corpus decades; this mode measures the full vs sampled tick
wall at each decade on a fixed 6-query probe set.

Prints one row per decade; paste the table into BASELINE.md.
Never run concurrently with bench/other probes (they saturate cores).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from formula1_dataengineering_spark.caching import cache_scope  # noqa: E402
from formula1_dataengineering_spark.operators.dedup import (  # noqa: E402
    refresh_dedup_index,
    write_dedup_index,
)
from formula1_dataengineering_spark.operators.maintenance import (  # noqa: E402
    maintain_dedup_index,
)
from formula1_dataengineering_spark.session import get_spark  # noqa: E402
from formula1_dataengineering_spark.sources.catalog import load  # noqa: E402

DECADES = [
    ("1x", "/root/testdata/sf0.01"),
    ("10x", "/tmp/graft_rep10x_sf001"),
    ("100x", "/tmp/graft_rep100x_sf001"),
]


def ann_sampled_main() -> None:
    """Full vs sampled HOLD-tick referee wall per embeddings decade,
    fixed query set (replica 0's batch ids), sample budget ~256."""
    from formula1_dataengineering_spark.operators.clustering import (
        refresh_ann_index,
        write_ann_index,
    )
    from formula1_dataengineering_spark.operators.maintenance import (
        ann_recall_at_k,
    )

    spark = get_spark(app_name="maintenance-probe-ann-sampled")
    budget = 256
    print(
        "| decade | vectors | sample (keep/mod) | full-referee tick "
        "| sampled tick | recall full | recall sampled |"
    )
    print("| --- | --- | --- | --- | --- | --- | --- |")
    for tag, sf_dir in DECADES:
        if not os.path.isdir(sf_dir):
            print(f"| {tag} | MISSING {sf_dir} | | | | | |")
            continue
        e = load(spark, sf_dir, "embeddings")
        corpus = e.where(F.col("vec_id") % 97 != 0)
        batch = e.where(F.col("vec_id") % 97 == 0)
        # Fixed probe set at every decade: replica 0's batch ids.
        q = batch.where(F.col("vec_id") < 500).select(
            "vec_id", "embedding"
        )
        n_vec = e.count()
        mod = max(2, n_vec // budget)
        work = tempfile.mkdtemp(prefix="graft_maint_ann_")
        path = os.path.join(work, "ann")
        try:
            with cache_scope():
                write_ann_index(corpus, path, m=8, k=4, iters=2)
            refresh_ann_index(batch, path, "d1")

            def measure(sample):
                t0 = time.perf_counter()
                row = ann_recall_at_k(
                    spark, path, q, e, sample=sample
                ).collect()[0]
                return time.perf_counter() - t0, row["recall_at_k"]

            measure(None)  # warm the layout read once
            t_full, r_full = measure(None)
            t_samp, r_samp = measure((1, mod))
            print(
                f"| {tag} | {n_vec} | 1/{mod} | {t_full:.2f} s "
                f"| {t_samp:.2f} s | {r_full} | {r_samp} |"
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


def ann_sampled_big_main() -> None:
    """Full vs sampled HOLD-tick referee wall on the PERSISTED
    multi-million-vector probe indices (scripts/ann_index_probe.py
    builds them at /tmp/graft_ann_probe_{2k,2M,5M} over the
    /tmp/graft_emb{1000,2500}x_sf01 replicas) — the corpus decade
    where the exact referee's O(|queries| · corpus) scan actually
    dominates the tick. Fixed 21-query probe set (replica 0 batch
    ids), sample budget ~20k vectors."""
    from formula1_dataengineering_spark.operators.maintenance import (
        ann_recall_at_k,
    )

    spark = get_spark(app_name="maintenance-probe-ann-sampled-big")
    budget = 20_000
    big = [
        ("2k", "/tmp/graft_ann_probe_2k", f"{os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')}/embeddings.parquet"),
        ("2M", "/tmp/graft_ann_probe_2M", "/tmp/graft_emb1000x_sf01/embeddings.parquet"),
        ("5M", "/tmp/graft_ann_probe_5M", "/tmp/graft_emb2500x_sf01/embeddings.parquet"),
    ]
    print(
        "| corpus | vectors | sample (keep/mod) | full-referee tick "
        "| sampled tick | recall full | recall sampled |"
    )
    print("| --- | --- | --- | --- | --- | --- | --- |")
    for tag, path, emb in big:
        if not os.path.isdir(path) or not os.path.exists(emb):
            print(f"| {tag} | MISSING {path} / {emb} | | | | | |")
            continue
        e = spark.read.parquet(emb)
        q = e.where(
            (F.col("vec_id") % 97 == 0) & (F.col("vec_id") < 2000)
        ).select("vec_id", "embedding")
        n_vec = e.count()
        mod = max(2, n_vec // budget)

        def measure(sample):
            t0 = time.perf_counter()
            row = ann_recall_at_k(
                spark, path, q, e, sample=sample
            ).collect()[0]
            return time.perf_counter() - t0, row["recall_at_k"]

        measure(None)  # warm the layout/codebook reads once
        t_full, r_full = measure(None)
        t_samp, r_samp = measure((1, mod))
        print(
            f"| {tag} | {n_vec} | 1/{mod} | {t_full:.2f} s "
            f"| {t_samp:.2f} s | {r_full} | {r_samp} |"
        )


def main() -> None:
    if "--ann-sampled-big" in sys.argv:
        ann_sampled_big_main()
        return
    if "--ann-sampled" in sys.argv:
        ann_sampled_main()
        return
    shards = 64
    if "--shards" in sys.argv:
        shards = int(sys.argv[sys.argv.index("--shards") + 1])
    spark = get_spark(app_name="maintenance-probe")
    print(
        f"| decade | docs | hold tick | compact tick | rebuild tick |"
        f" (shards={shards})"
    )
    print("| --- | --- | --- | --- | --- |")
    for tag, sf_dir in DECADES:
        if not os.path.isdir(sf_dir):
            print(f"| {tag} | MISSING {sf_dir} | | | |")
            continue
        d = load(spark, sf_dir, "documents")
        corpus = d.where(F.col("doc_id") % 97 != 0)
        batch = d.where(F.col("doc_id") % 97 == 0)
        n_docs = d.count()
        work = tempfile.mkdtemp(prefix="graft_maint_probe_")
        path = os.path.join(work, "idx")
        try:
            with cache_scope():
                write_dedup_index(corpus, path, n_shards=shards)
            refresh_dedup_index(
                batch.where(F.expr("doc_id div 97") % 2 == 0), path, "d1"
            )
            refresh_dedup_index(
                batch.where(F.expr("doc_id div 97") % 2 == 1), path, "d2"
            )

            def tick(**kw) -> tuple[float, str]:
                t0 = time.perf_counter()
                r = maintain_dedup_index(spark, path, **kw)
                return time.perf_counter() - t0, r["decision"]

            t_hold, dec_h = tick(compact_after=99)
            assert dec_h == "hold", dec_h
            t_comp, dec_c = tick(compact_after=2)
            assert dec_c == "compact", dec_c
            # One fresh delta so the rebuild arm has rows to act on.
            refresh_dedup_index(
                batch.where(F.expr("doc_id div 97") % 2 == 0), path, "d3"
            )
            with cache_scope():
                t_reb, dec_r = tick(
                    corpus=d, rebuild_rows_over=0.0, compact_after=99
                )
            assert dec_r == "rebuild", dec_r
            print(
                f"| {tag} | {n_docs} | {t_hold:.2f} s | {t_comp:.2f} s "
                f"| {t_reb:.2f} s |"
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
