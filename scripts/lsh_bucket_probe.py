"""1000x LSH bucket-topology probe for the MinHash dedup family.

Companion to substring_postings_probe.py (VERDICT r8 item 6 extended
to the OTHER dedup family): at 1000 near-duplicate replicas of the
sf0.01 corpus (500k docs — the trigram shingle sets shift by one
token per replica, the worst case short of exact duplication), what do
the LSH band buckets look like, and what would each candidate
formulation cost?

Two formulations of "bucket → duplicate evidence":

- ALL-PAIRS (what minhash_lsh_pairs computes, and what a naive dedup
  always computes): Σ C(size, 2) candidate rows over buckets — grows
  QUADRATICALLY in bucket size, i.e. in replica count here.
- STAR (what minhash_lsh_clusters ships for clustering at scale):
  Σ (size − 1) edges (member → bucket-min) — LINEAR in bucket size,
  same connected components by construction.

The probe prints both numbers plus the bucket-size distribution so
the pairs-vs-clusters scale trade in operators/dedup.py's docstrings
is backed by a measured row: the pairs gate is the right tool for
REPORTING near-dup pairs at bounded duplication, the star/cluster
operator is the right tool when duplication itself is unbounded.

Term ids use the ``fast`` (xxhash64) mode: the probe measures BUCKET
TOPOLOGY, which is term-id-distribution-invariant; the portable md5
mode exists for oracle replay, not for probes (~75M md5 expressions
at this scale for no added information).

Usage: python scripts/lsh_bucket_probe.py [--replicas N]
(reuses the documents replica cached by substring_postings_probe.py)
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from formula1_dataengineering_spark.operators.dedup import (
    _band_rows,
    minhash_signatures,
)
from formula1_dataengineering_spark.session import get_spark
from scripts.substring_postings_probe import build_docs_replica

NUM_HASHES = 12
BANDS = 4


def main() -> None:
    n = 1000
    if "--replicas" in sys.argv:
        i = sys.argv.index("--replicas")
        if i + 1 >= len(sys.argv):
            sys.exit("--replicas needs a value, e.g. --replicas 100")
        n = int(sys.argv[i + 1])
    spark = get_spark(app_name="lsh-bucket-probe")
    path = build_docs_replica(spark, n, f"/tmp/graft_docs{n}x_sf001")
    docs = spark.read.parquet(path)

    t0 = time.perf_counter()
    sig = minhash_signatures(
        docs, num_hashes=NUM_HASHES, shingle_k=3, mode="fast"
    ).persist()
    n_docs = sig.count()
    t_sig = time.perf_counter() - t0

    t0 = time.perf_counter()
    buckets = (
        _band_rows(sig, "doc_id", NUM_HASHES, BANDS)
        .groupBy("band", "key")
        .agg(F.count("*").alias("s"))
        .persist()
    )
    if n_docs == 0:
        sys.exit(f"empty corpus at {path} — rebuild the replica")
    stats = buckets.agg(
        F.count("*").alias("n_buckets"),
        F.sum("s").alias("n_band_rows"),
        F.max("s").alias("max_bucket"),
        F.expr("percentile_approx(s, 0.99)").alias("p99_bucket"),
        F.sum(F.expr("s * (s - 1) / 2")).cast("long").alias("allpairs_candidates"),
        F.sum(F.col("s") - 1).cast("long").alias("star_edges"),
    ).collect()[0]
    t_buckets = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "replicas": n,
                "num_hashes": NUM_HASHES,
                "bands": BANDS,
                "n_docs": n_docs,
                "n_band_rows": int(stats["n_band_rows"]),
                "n_buckets": int(stats["n_buckets"]),
                "max_bucket": int(stats["max_bucket"]),
                "p99_bucket": int(stats["p99_bucket"]),
                "allpairs_candidates": int(stats["allpairs_candidates"]),
                "star_edges": int(stats["star_edges"]),
                "allpairs_vs_star": round(
                    stats["allpairs_candidates"] / max(stats["star_edges"], 1),
                    1,
                ),
                "wall_s": {
                    "signatures": round(t_sig, 1),
                    "buckets": round(t_buckets, 1),
                },
            }
        )
    )
    sig.unpersist()
    buckets.unpersist()


if __name__ == "__main__":
    main()
