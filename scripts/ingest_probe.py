#!/usr/bin/env python
"""Ingest-probe decade study (round 11): per-ingest PROBE cost of the
stored dedup index as the corpus grows 1x → 1000x with a FIXED batch —
the production claim behind incremental_dedup_indexed /
end_to_end_incremental_ingest is that daily cost is O(batch + touched
shards), not O(corpus), and this measures it.

For each corpus decade:
  - build + write the HRW-sharded index (one-time, reported);
  - probe a fixed 4-doc batch twice:
      pruned   — the real path: shard partition column computed
                 batch-side joins into the (shard, key) semi-join, so
                 the scan reads only the shards the batch touches
                 (4 content-hash shards + ≤16 band shards of 256);
      unpruned — the same index frames with the shard column dropped,
                 forcing a full-index scan per probe (the shape a
                 naive layout would pay).

Decades (all synthetic catalog tables; documents does not grow
between sf0.001 and sf0.01, so replicas carry the upper decades):
  1x    /root/testdata/sf0.001      (500 docs)
  10x   /tmp/graft_rep10x_g_sf001   (5,000)
  100x  /tmp/graft_rep100x_g_sf001  (50,000)
  1000x /tmp/graft_docs1000x_sf001  (500,000)

Usage: python scripts/ingest_probe.py [--shards 256]
Prints one row per decade; paste the table into BASELINE.md.
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
from formula1_dataengineering_spark.operators.dedup import (  # noqa: E402
    incremental_dedup_from_index,
    read_dedup_index,
    write_dedup_index,
)
from formula1_dataengineering_spark.session import get_spark  # noqa: E402
from formula1_dataengineering_spark.sources.catalog import load  # noqa: E402

DECADES = [
    ("1x", "/root/testdata/sf0.001"),
    ("10x", "/tmp/graft_rep10x_g_sf001"),
    ("100x", "/tmp/graft_rep100x_g_sf001"),
    ("1000x", "/tmp/graft_docs1000x_sf001"),
]


def main() -> None:
    n_shards = 256
    if "--shards" in sys.argv:
        n_shards = int(sys.argv[sys.argv.index("--shards") + 1])
    spark = get_spark(app_name="ingest-probe")
    # Fixed batch: 4 docs from the 1x corpus, constant across decades
    # (the daily ingest does not grow because the corpus did).
    batch = (
        load(spark, DECADES[0][1], "documents")
        .where(F.col("doc_id").isin(0, 97, 194, 291))
        .select("doc_id", "text")
    )
    batch = spark.createDataFrame(batch.collect(), "doc_id long, text string")

    print(
        f"{'decade':>6} {'corpus':>9} {'band_rows':>10} {'build_s':>8} "
        f"{'probe_pruned_s':>14} {'probe_full_s':>13}"
    )
    for tag, sf_dir in DECADES:
        if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
            print(f"{tag:>6} SKIP (missing {sf_dir})")
            continue
        corpus = load(spark, sf_dir, "documents").select("doc_id", "text")
        n_corpus = corpus.count()
        path = f"/tmp/graft_ingest_probe_{tag}_{n_shards}"
        t0 = time.perf_counter()
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            write_dedup_index(corpus, path, n_shards=n_shards)
            build_s = time.perf_counter() - t0
        else:
            build_s = float("nan")  # cached from a previous run
        hashes, bands, meta = read_dedup_index(spark, path)
        n_band = bands.count()

        def probe(h, b, label):
            best = float("inf")
            for _ in range(3):
                t = time.perf_counter()
                with cache_scope():
                    incremental_dedup_from_index(
                        batch,
                        h,
                        b,
                        n_shards=n_shards,
                        index_meta=meta if label == "pruned" else None,
                    ).collect()
                best = min(best, time.perf_counter() - t)
            return best

        pruned = probe(hashes, bands, "pruned")
        full = probe(
            hashes.drop("shard"), bands.drop("shard"), "full"
        )

        # Deterministic pruning accounting: bytes in the shard
        # directories the batch's probe keys touch vs the whole index
        # — the quantity partition pruning saves, independent of
        # toy-size wall noise (at these sizes opening 256 small files
        # costs more than scanning them; at 100 TB the touched-bytes
        # fraction IS the probe cost).
        from formula1_dataengineering_spark.operators.dedup import (
            _band_rows,
            _index_shard,
            minhash_signatures,
            portable_hash48,
        )

        h_shards = {
            r[0]
            for r in batch.select(
                _index_shard(
                    portable_hash48(F.col("text")), n_shards
                ).alias("s")
            )
            .distinct()
            .collect()
        }
        b_shards = {
            r[0]
            for r in _band_rows(
                minhash_signatures(batch, "doc_id", "text", 12, 3, "portable"),
                "doc_id",
                12,
                4,
            )
            .select(
                _index_shard(
                    F.concat_ws(":", F.col("band"), F.col("key")), n_shards
                ).alias("s")
            )
            .distinct()
            .collect()
        }

        def _bytes(base, touched):
            tot = tch = 0
            root = os.path.join(path, base)
            for d in os.listdir(root):
                if not d.startswith("shard="):
                    continue
                sz = sum(
                    os.path.getsize(os.path.join(root, d, f))
                    for f in os.listdir(os.path.join(root, d))
                    if f.endswith(".parquet")
                )
                tot += sz
                if int(d.split("=")[1]) in touched:
                    tch += sz
            return tch, tot

        th, toth = _bytes("content_hashes", h_shards)
        tb, totb = _bytes("band_rows", b_shards)
        frac = (th + tb) / max(1, toth + totb)
        print(
            f"{tag:>6} {n_corpus:>9,} {n_band:>10,} {build_s:>8.1f} "
            f"{pruned:>14.2f} {full:>13.2f}   touched "
            f"{len(h_shards)}h+{len(b_shards)}b/{n_shards} shards = "
            f"{frac:.1%} of index bytes"
        )


if __name__ == "__main__":
    main()
