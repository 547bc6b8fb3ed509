"""1000x candidate-accounting probe for the ANN ladder (VERDICT r9
item 6): the dedup family has 1000x postings/bucket probes; this gives
the similarity ladder the same one-decade-past-100x evidence. No full
top-k runs — the scale argument for `knn_srp_bucket`,
`knn_srp_multiprobe`, and `ivf_pq_topk` lives entirely in their
CANDIDATE stages (bucket/cell membership and the PQ LUT fan-out), so
the probe measures exactly those:

1. SRP bucket occupancy at ~5M vectors (8 seeded planes → 256
   buckets): corpus rows per bucket (min/p50/p99/max). The per-query
   GEMM batch is bounded by its bucket — the number recorded is the
   real candidate count a single-bucket probe scores vs the 5M-row
   brute-force scan.
2. Multi-probe fan-out: each query probes its bucket + 8 one-bit
   flips; candidates = Σ of 9 bucket sizes — the recall lever's cost,
   still a ~9/256 slice of the corpus.
3. IVF cell sizes (the gate's coarse partition, `label`): rows per
   cell; a query scores only its own cell.
4. PQ ADC accounting at the gate's (m=8, k=4): LUT entries per query
   = m*k = 32 (independent of corpus size — the point of ADC), scored
   candidate rows = Σ probed-cell sizes, ADC adds = candidates × m.

Replica construction mirrors scripts/substring_postings_probe.py:
crossJoin against spark.range(N) with a disjoint vec_id stride,
vectors and labels unchanged (exact replicas scale every bucket/cell
by N — the occupancy TOPOLOGY at 5M rows is the object of proof; the
queries stay the 10 original vec_id < 10 rows in replica 0).

Usage: python scripts/ann_candidate_probe.py [--replicas N]
(default N=1000 over sf0.1's 5,000 vectors → 5M; the replica parquet
is cached at /tmp/graft_emb{N}x_sf01/ and reused).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np
from pyspark.sql import functions as F

from formula1_dataengineering_spark.caching import cache_scope, managed_cache
from formula1_dataengineering_spark.operators.similarity import (
    default_srp_planes,
    srp_buckets,
)
from formula1_dataengineering_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
ID_STRIDE = 1_000_000  # far above any base vec_id
M, KCODE = 8, 4  # the ivf_pq_topk gate's PQ parameters


def build_replica(spark, n: int) -> str:
    path = f"/tmp/graft_emb{n}x_sf01"
    marker = os.path.join(path, "_SUCCESS_PROBE")
    if os.path.exists(marker):
        return path
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    rep = (
        base.crossJoin(F.broadcast(spark.range(n).select(F.col("id").alias("__r"))))
        .select(
            (F.col("vec_id") + F.col("__r") * ID_STRIDE).alias("vec_id"),
            "embedding",
            "label",
        )
    )
    rep.write.mode("overwrite").parquet(os.path.join(path, "embeddings.parquet"))
    open(marker, "w").close()
    return path


def pct(rows: list[int], q: float) -> int:
    s = sorted(rows)
    return s[min(len(s) - 1, int(q * len(s)))]


def main() -> None:
    n = 1000
    if "--replicas" in sys.argv:
        n = int(sys.argv[sys.argv.index("--replicas") + 1])
    spark = get_spark(app_name="ann-candidate-probe")
    path = build_replica(spark, n)
    emb = spark.read.parquet(os.path.join(path, "embeddings.parquet"))
    out: dict = {"replicas": n, "sf_dir": SF_DIR}

    with cache_scope():
        t0 = time.time()
        n_corpus = emb.count()
        out["n_corpus"] = n_corpus

        # -- 1. SRP bucket occupancy --------------------------------
        planes = default_srp_planes()
        buckets = managed_cache(
            srp_buckets(emb, planes).groupBy("bucket").agg(
                F.count("*").alias("sz")
            )
        )
        sizes = [r["sz"] for r in buckets.collect()]
        out["srp"] = {
            "n_planes": int(planes.shape[0]),
            "n_buckets_occupied": len(sizes),
            "bucket_min": min(sizes),
            "bucket_p50": pct(sizes, 0.50),
            "bucket_p99": pct(sizes, 0.99),
            "bucket_max": max(sizes),
        }

        # -- 2. per-query candidates, single- and multi-probe -------
        qrows = emb.where(F.col("vec_id") < 10).select(
            "vec_id", "embedding"
        ).collect()
        P = np.asarray(planes, dtype=np.float64)
        weights = 1 << np.arange(P.shape[0], dtype=np.int64)
        Q = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
        qb = ((Q @ P.T) > 0) @ weights
        size_of = {r["bucket"]: r["sz"] for r in buckets.collect()}
        single = [int(size_of.get(int(b), 0)) for b in qb]
        multi = [
            int(
                sum(
                    size_of.get(int(b) ^ int(w), 0)
                    for w in (0, *weights)
                )
            )
            for b in qb
        ]
        bf = len(qrows) * n_corpus
        out["knn_srp_bucket"] = {
            "n_queries": len(qrows),
            "candidates_total": sum(single),
            "candidates_max_per_query": max(single),
            "bruteforce_pairs": bf,
            "reduction_x": round(bf / max(1, sum(single)), 1),
        }
        out["knn_srp_multiprobe"] = {
            "probes_per_query": int(P.shape[0]) + 1,
            "candidates_total": sum(multi),
            "candidates_max_per_query": max(multi),
            "reduction_x": round(bf / max(1, sum(multi)), 1),
        }

        # -- 3 + 4. IVF cells and PQ ADC fan-out --------------------
        cells = emb.groupBy("label").agg(F.count("*").alias("sz")).collect()
        csizes = [r["sz"] for r in cells]
        cell_of_q = {
            r["vec_id"]: r["label"]
            for r in emb.where(F.col("vec_id") < 10)
            .select("vec_id", "label")
            .collect()
        }
        cell_sz = {r["label"]: r["sz"] for r in cells}
        ivf_cand = [int(cell_sz[c]) for c in cell_of_q.values()]
        out["ivf_cells"] = {
            "n_cells": len(csizes),
            "cell_min": min(csizes),
            "cell_p50": pct(csizes, 0.50),
            "cell_max": max(csizes),
        }
        out["ivf_pq_topk"] = {
            "n_queries": len(cell_of_q),
            "candidates_total": sum(ivf_cand),
            "lut_entries_per_query": M * KCODE,
            "adc_add_rows": sum(ivf_cand) * M,
            "bruteforce_float_muls": len(cell_of_q) * n_corpus * 64,
            "reduction_x": round(
                (len(cell_of_q) * n_corpus) / max(1, sum(ivf_cand)), 1
            ),
        }
        out["probe_wall_s"] = round(time.time() - t0, 1)

    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
