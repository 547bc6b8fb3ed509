"""10x scale-sensitivity probe for documents-table queries.

Methodology (BASELINE.md "Scale sensitivity" sections): replicate the
sf0.1 documents table 10x — disjoint doc_id ranges per replica and a
per-replica token PREFIX so replicas are NEAR-duplicates (shingles
shift; exact-dup plans can't shortcut) — then run each named query
best-of-2 at sf0.1 and at 10x on the same session and report the ratio.

Usage: python scripts/scale_probe.py [query ...]   (default: the
round-3 probe set)
"""

import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
DEFAULT = [
    "pii_scrub_stats",
    "span_dedup_stats",
    "bloom_decontamination_stats",
    "token_budget_sample_docs",
    "source_similarity_matrix",
]


def build_10x(spark: SparkSession, out_dir: str) -> None:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    max_id = docs.agg(F.max("doc_id")).first()[0] + 1
    replicas = [
        docs.select(
            (F.col("doc_id") + r * max_id).alias("doc_id"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
            F.concat(F.lit(f"r{r} "), F.col("text")).alias("text"),
        )
        for r in range(10)
    ]
    big = replicas[0]
    for rep in replicas[1:]:
        big = big.unionByName(rep)
    big.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    # embeddings: disjoint vec_id ranges, values unchanged (the
    # distribution — and therefore centroid/percentile work — scales
    # with row count, which is what the probe measures).
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emax = emb.agg(F.max("vec_id")).first()[0] + 1
    ereps = [
        emb.select(
            (F.col("vec_id") + r * emax).alias("vec_id"),
            *[c for c in emb.columns if c != "vec_id"],
        )
        for r in range(10)
    ]
    ebig = ereps[0]
    for rep in ereps[1:]:
        ebig = ebig.unionByName(rep)
    ebig.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    # events: disjoint event_id ranges, same users/timestamps — per-user
    # and per-hour densities grow 10x, which is what funnel/retention/
    # gap-fill/anomaly plans are sensitive to. Written via catalog.load
    # so nanos timestamps normalize identically to the source table.
    from formula1_dataengineering_spark.sources.catalog import load

    ev = load(spark, SF_DIR, "events")
    vmax = ev.agg(F.max("event_id")).first()[0] + 1
    vreps = [
        ev.select(
            (F.col("event_id") + r * vmax).alias("event_id"),
            *[c for c in ev.columns if c != "event_id"],
        )
        for r in range(10)
    ]
    vbig = vreps[0]
    for rep in vreps[1:]:
        vbig = vbig.unionByName(rep)
    # The streaming source globs for a FILE named events.parquet (the
    # testdata layout); a Spark-written directory would match nothing
    # and stream 0 rows, so write single-part and move the part file.
    import glob as _glob

    staging = f"{out_dir}/_events_staging"
    vbig.coalesce(1).write.mode("overwrite").parquet(staging)
    part = _glob.glob(f"{staging}/part-*.parquet")[0]
    shutil.move(part, f"{out_dir}/events.parquet")
    shutil.rmtree(staging, ignore_errors=True)
    for t in TABLES:
        if t not in ("documents", "embeddings", "events"):
            os.symlink(f"{SF_DIR}/{t}.parquet", f"{out_dir}/{t}.parquet")


def timed(fn, *a):
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn(*a).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    names = sys.argv[1:] or DEFAULT
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    sys.path.insert(0, "/root/repo")
    from formula1_dataengineering_spark.plans import QUERIES

    tmp = tempfile.mkdtemp(prefix="scale10x_")
    try:
        t0 = time.perf_counter()
        build_10x(spark, tmp)
        print(f"built 10x documents in {time.perf_counter() - t0:.1f}s")
        for name in names:
            q = QUERIES[name]
            base = timed(q, spark, SF_DIR)
            big = timed(q, spark, tmp)
            print(
                f"{name}: sf0.1 {base:.2f}s  10x {big:.2f}s  "
                f"ratio {big / base:.1f}x"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
