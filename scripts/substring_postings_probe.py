"""1000x postings/anchor probe for the exact-substring dedup family.

VERDICT r8 item 6: the df-cap's "never quadratic" claim is proven by
full hash-exact runs at 100x; this probe pushes the POSTINGS → ANCHOR
CAP → CANDIDATE JOIN stages one decade further (1000x documents) with
explicit candidate-count accounting — no full gaps-and-islands run
needed, the bound lives entirely in the match stage.

Replica construction mirrors scripts/scale_probe.py build_10x for
documents (disjoint doc_id stride, per-replica "r{r} " token prefix so
replicas are NEAR-duplicates: positions shift by one, k-gram sets stay
maximally overlapping — the worst case for a naive all-pairs join and
exactly what the df cap exists to bound), but built with a crossJoin
against spark.range(N) instead of an N-way union (a 1000-branch union
is a plan-size problem, not a data problem).

What the accounting shows (and BASELINE.md records): with every
original k-gram now occurring in ≥1000 documents (>> max_df=50), the
broadcast anti-join drops ALL cross-replica hub anchors BEFORE the
candidate join — surviving candidates come only from grams kept under
the cap, so the candidate row count is bounded by cap², never by
replicas². A quadratic plan would face ~(500k)²/2 candidate doc pairs;
the capped plan's candidate MATCH-ROW count is printed for the record.

Usage: python scripts/substring_postings_probe.py [--replicas N]
(default N=1000 over sf0.01; the replica parquet is cached at
/tmp/graft_docs{N}x_sf001/documents.parquet and reused.)
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
    _KGRAM_H2_SALT,
    _substring_tokens,
)
from formula1_dataengineering_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
K = 12  # the gate's parameters (plans/queries.py substring_dedup_pairs)
MAX_DF = 50


def build_docs_replica(spark, n: int, out_dir: str) -> str:
    path = f"{out_dir}/documents.parquet"
    # _SUCCESS gates the cache: a bare exists() would reuse a partial
    # directory left by an interrupted write and silently compute the
    # accounting over a truncated corpus (code-review r9).
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    stride = docs.agg(F.max("doc_id")).first()[0] + 1
    reps = spark.range(n).select(F.col("id").alias("__r"))
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("__r") * stride).alias("doc_id"),
        *[c for c in docs.columns if c not in ("doc_id", "text")],
        F.concat(
            F.lit("r"), F.col("__r").cast("string"), F.lit(" "), F.col("text")
        ).alias("text"),
    )
    big.repartition(32).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    n = 1000
    if "--replicas" in sys.argv:
        i = sys.argv.index("--replicas")
        if i + 1 >= len(sys.argv):
            sys.exit("--replicas needs a value, e.g. --replicas 100")
        n = int(sys.argv[i + 1])
    spark = get_spark(app_name="substring-postings-probe")
    out_dir = f"/tmp/graft_docs{n}x_sf001"
    t0 = time.perf_counter()
    path = build_docs_replica(spark, n, out_dir)
    t_build = time.perf_counter() - t0
    docs = spark.read.parquet(path)

    # Stages 1-3 of operators/dedup._substring_kgram_matches, with a
    # counter at each stage boundary (the operator itself fuses them;
    # the probe needs the intermediate cardinalities).
    base = _substring_tokens(docs, K, "doc_id", "text")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("ts")) - (K - 1)),
        lambda i: F.concat_ws(" ", F.slice(F.col("ts"), i, K)),
    )
    kg = base.select(
        "doc_id",
        F.posexplode(grams).alias("pos0", "g"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        F.xxhash64("g").alias("h"),
        F.xxhash64(F.lit(_KGRAM_H2_SALT), F.col("g")).alias("h2"),
    )
    kg = kg.persist()
    t0 = time.perf_counter()
    n_docs = docs.count()
    n_postings = kg.count()
    t_postings = time.perf_counter() - t0

    t0 = time.perf_counter()
    df_stats = kg.groupBy("h", "h2").agg(
        F.countDistinct("doc_id").alias("df")
    )
    hot = df_stats.where(F.col("df") > MAX_DF).select("h", "h2")
    hot = hot.persist()
    n_hot = hot.count()
    n_grams = df_stats.count()
    t_cap = time.perf_counter() - t0

    t0 = time.perf_counter()
    cold = kg.join(F.broadcast(hot), ["h", "h2"], "left_anti").persist()
    n_cold_postings = cold.count()
    a, b = cold.alias("a"), cold.alias("b")
    # Both counts in ONE aggregation over one execution of the join —
    # separate count()/distinct().count() actions would run the
    # probe's slowest stage twice and double-report t_join
    # (code-review r9).
    row = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.h2") == F.col("b.h2"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("da", "db").alias("n_pairs"),
        )
        .collect()[0]
    )
    n_candidates, n_cand_pairs = row["n_rows"], row["n_pairs"]
    t_join = time.perf_counter() - t0

    naive_pairs = n_docs * (n_docs - 1) // 2
    print(
        json.dumps(
            {
                "replicas": n,
                "k": K,
                "max_df": MAX_DF,
                "n_docs": n_docs,
                "n_postings": n_postings,
                "n_distinct_grams": n_grams,
                "n_hot_anchors_dropped": n_hot,
                "n_postings_surviving_cap": n_cold_postings,
                "n_candidate_match_rows": n_candidates,
                "n_candidate_doc_pairs": n_cand_pairs,
                "naive_all_doc_pairs": naive_pairs,
                "candidate_vs_naive": (
                    round(n_cand_pairs / naive_pairs, 10) if naive_pairs else None
                ),
                "wall_s": {
                    "replica_build": round(t_build, 1),
                    "postings": round(t_postings, 1),
                    "df_cap": round(t_cap, 1),
                    "candidate_join": round(t_join, 1),
                },
            }
        )
    )
    kg.unpersist()
    hot.unpersist()
    cold.unpersist()


if __name__ == "__main__":
    main()
