"""Nx scale-sensitivity probe (default 10x) for catalog queries.

Methodology (BASELINE.md "Scale sensitivity" sections): replicate the
sf0.1 documents table Nx — disjoint doc_id ranges per replica and a
per-replica token PREFIX so replicas are NEAR-duplicates (shingles
shift; exact-dup plans can't shortcut) — then run each named query
best-of-2 at sf0.1 and at Nx on the same session and report the ratio.

Also replicates orders+lineitem with disjoint (orderkey, custkey,
suppkey) ranges — N disjoint copies of the trade graph — so the
graph-query axis (supplier_pagerank's edge list, CC edge sets) gets
real scale evidence instead of a fixed-graph blind spot (round-4
verdict item 5). Other dims (customer/supplier/part) stay symlinked:
the replicated keys are OUT of dim range by construction, which only
the graph queries (which never join the dims) tolerate — don't probe
dim-joining queries with this script beyond 1x baselines.

Usage: python scripts/scale_probe.py [--replicas N] [query ...]
(default: the round-3 probe set, N=10)
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


GRAPH_QUERIES = {
    "supplier_pagerank",
    "neardup_clusters_distributed",
    # lineitem-only profile (never joins the dims) — needs the
    # replicated fact table, tolerates out-of-dim-range keys.
    "mergeable_profile_check",
}
# customer-only profiles (QI-group aggregates, no fact join):
# replicate customer with disjoint custkey ranges so group SIZES
# grow nx while the QI-group count stays fixed — the axis the
# k-anonymity/l-diversity plans are sensitive to.
CUSTOMER_QUERIES = {"l_diversity_profile", "k_anonymity_profile"}


def build_10x(
    spark: SparkSession,
    out_dir: str,
    n: int = 10,
    graph: bool = False,
    customer: bool = False,
) -> None:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    # ONE shared id stride for documents AND embeddings (round-6
    # verdict item 5): the fixtures guarantee vec_id == doc_id, and
    # queries that look a document's embedding up by id (hybrid RRF's
    # pseudo-relevance-feedback seeds) silently drop or remap seeds if
    # the two tables replicate on different strides. Same stride →
    # replica doc r*stride+d maps to replica embedding r*stride+d and
    # the id contract survives replication.
    max_id = max(
        docs.agg(F.max("doc_id")).first()[0],
        emb.agg(F.max("vec_id")).first()[0],
    ) + 1
    replicas = [
        docs.select(
            (F.col("doc_id") + r * max_id).alias("doc_id"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
            F.concat(F.lit(f"r{r} "), F.col("text")).alias("text"),
        )
        for r in range(n)
    ]
    big = replicas[0]
    for rep in replicas[1:]:
        big = big.unionByName(rep)
    big.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    # embeddings: disjoint vec_id ranges in lockstep with doc_id
    # (shared stride above), values unchanged (the distribution — and
    # therefore centroid/percentile work — scales with row count,
    # which is what the probe measures).
    ereps = [
        emb.select(
            (F.col("vec_id") + r * max_id).alias("vec_id"),
            *[c for c in emb.columns if c != "vec_id"],
        )
        for r in range(n)
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
        for r in range(n)
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
    # orders + lineitem: n disjoint copies of the trade graph — built
    # only when a graph query is being probed (a 100x lineitem write is
    # pure waste for a documents-only probe); symlinked otherwise.
    graph_tables = ("orders", "lineitem") if graph else ()
    built = {"documents", "embeddings", "events", *graph_tables}
    if customer:
        cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        ckmax = cust.agg(F.max("c_custkey")).first()[0] + 1
        creps = [
            cust.select(
                (F.col("c_custkey") + r * ckmax).alias("c_custkey"),
                *[c for c in cust.columns if c != "c_custkey"],
            )
            for r in range(n)
        ]
        cbig = creps[0]
        for rep in creps[1:]:
            cbig = cbig.unionByName(rep)
        cbig.write.mode("overwrite").parquet(f"{out_dir}/customer.parquet")
        built.add("customer")
    if not graph:
        for t in TABLES:
            if t not in built:
                os.symlink(f"{SF_DIR}/{t}.parquet", f"{out_dir}/{t}.parquet")
        return
    # Shifting o_orderkey/l_orderkey by the same stride keeps the
    # order->items join intact inside each replica; shifting
    # custkey/suppkey makes the replica subgraphs node-disjoint, so
    # edges AND nodes grow nx (the pagerank/CC axis).
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    omax = orders.agg(F.max("o_orderkey")).first()[0] + 1
    cmax = orders.agg(F.max("o_custkey")).first()[0] + 1
    smax = li.agg(F.max("l_suppkey")).first()[0] + 1
    oreps = [
        orders.select(
            (F.col("o_orderkey") + r * omax).alias("o_orderkey"),
            (F.col("o_custkey") + r * cmax).alias("o_custkey"),
            *[c for c in orders.columns if c not in ("o_orderkey", "o_custkey")],
        )
        for r in range(n)
    ]
    obig = oreps[0]
    for rep in oreps[1:]:
        obig = obig.unionByName(rep)
    obig.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    lreps = [
        li.select(
            (F.col("l_orderkey") + r * omax).alias("l_orderkey"),
            (F.col("l_suppkey") + r * smax).alias("l_suppkey"),
            *[c for c in li.columns if c not in ("l_orderkey", "l_suppkey")],
        )
        for r in range(n)
    ]
    lbig = lreps[0]
    for rep in lreps[1:]:
        lbig = lbig.unionByName(rep)
    lbig.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    for t in TABLES:
        if t not in built:
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
    args = sys.argv[1:]
    n = 10
    if "--replicas" in args:
        i = args.index("--replicas")
        if i + 1 >= len(args):
            sys.exit("--replicas needs a value, e.g. --replicas 100")
        n = int(args[i + 1])
        del args[i : i + 2]
    names = args or DEFAULT
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
        build_10x(
            spark,
            tmp,
            n,
            graph=bool(GRAPH_QUERIES & set(names)),
            customer=bool(CUSTOMER_QUERIES & set(names)),
        )
        print(f"built {n}x tables in {time.perf_counter() - t0:.1f}s")
        for name in names:
            q = QUERIES[name]
            base = timed(q, spark, SF_DIR)
            big = timed(q, spark, tmp)
            print(
                f"{name}: sf0.1 {base:.2f}s  {n}x {big:.2f}s  "
                f"ratio {big / base:.1f}x"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
