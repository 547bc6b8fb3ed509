"""Fixed-iteration k-means over embedding columns — the training step
for the IVF coarse quantizer (``operators/similarity.ivf_topk`` probes
the cells this produces).

Iterative algorithms are usually the "non-SQL-expressible" bucket, but
a FIXED iteration count unrolls into a deterministic dataflow both
engines can evaluate, which keeps the operator inside the hash-matched
correctness gate. The determinism recipe:

- distances are an ORDERED left fold over the dimension array
  (``F.aggregate`` / DuckDB ``list_reduce``) in double precision —
  bit-identical across engines, unlike a groupBy-sum over exploded
  dims whose accumulation order is partition-dependent;
- assignment ties break on cluster id (total order on (dist, cluster));
- centroid updates quantize to ``round_decimals`` decimals, so the one
  unavoidable partition-order-dependent reduction (the per-cluster
  mean) re-enters the next iteration as an identical literal in both
  engines.

Scale: per iteration, the k-row centroid table broadcasts into the
corpus scan (k-fold fan-out, map-side ``min_by`` partial aggregation
collapses it back to one row per vector before the only shuffle), and
the update is a (k × dims)-group aggregate. Nothing is ever collected;
iterations chain lazily. Empty clusters drop out (documented
semantics; both engines agree because assignments agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec: str, cent: str):
    """Ordered-fold squared L2 distance — bit-exact across engines."""
    return F.aggregate(
        F.zip_with(vec, cent, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assignments(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 4,
) -> DataFrame:
    """Cluster assignment after ``iters`` Lloyd iterations seeded with
    the ``k`` smallest-id vectors (TakeOrderedAndProject — k rows to
    the driver side of the broadcast, valid for ANY id space, not just
    dense 0-based ids). Cluster labels are the seed ids. Returns
    (id, cluster, sq_dist)."""
    if k < 1 or iters < 1:
        raise ValueError(f"k and iters must be >= 1, got k={k} iters={iters}")
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col), vec_d.alias("__v"))
    cents = (
        base.orderBy(id_col)
        .limit(k)
        .select(
            F.col(id_col).cast("long").alias("__cluster"),
            F.col("__v").alias("__c"),
        )
    )
    assign = None
    for i in range(iters):
        # Single-valued-key broadcast hash join = the k-fold fan-out
        # stated as an equi-join (the catalog bans nested-loop join
        # shapes; this one is bounded by construction — build side is
        # k rows). The key must be column-derived: a literal would
        # constant-fold back into a cross join.
        scored = (
            base.withColumn("__k", F.pmod(F.col(id_col), F.lit(1)).cast("int"))
            .join(
                F.broadcast(
                    cents.withColumn(
                        "__k", F.pmod(F.col("__cluster"), F.lit(1)).cast("int")
                    )
                ),
                "__k",
            )
            .select(
                id_col,
                "__v",
                "__cluster",
                _sq_dist("__v", "__c").alias("__dist"),
            )
        )
        # min_by over a (dist, cluster) total order: a hash aggregate
        # with map-side partials — cheaper than a window, which would
        # shuffle all k candidate rows per vector. The final iteration
        # has no centroid update after it, so its payload drops the
        # embedding — the d-dim array would ride the largest shuffle
        # only to be discarded by the closing select.
        last = i == iters - 1
        payload = (
            F.struct("__cluster", "__dist")
            if last
            else F.struct("__cluster", "__dist", "__v")
        )
        m = F.min_by(payload, F.struct("__dist", "__cluster"))
        assign = (
            scored.groupBy(id_col)
            .agg(m.alias("__m"))
            .select(
                id_col,
                F.col("__m.__cluster").alias("__cluster"),
                F.col("__m.__dist").alias("__dist"),
                *([] if last else [F.col("__m.__v").alias("__v")]),
            )
        )
        if i < iters - 1:
            # Quantized centroid update; array_sort on (dim, value)
            # structs rebuilds the dimension order deterministically
            # (collect_list alone has no order guarantee).
            cents = (
                assign.select(
                    "__cluster", F.posexplode("__v").alias("__dim", "__val")
                )
                .groupBy("__cluster", "__dim")
                .agg(F.round(F.avg("__val"), round_decimals).alias("__cv"))
                .groupBy("__cluster")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("__dim", "__cv"))),
                        lambda s: s.getField("__cv"),
                    ).alias("__c")
                )
            )
    return assign.select(
        id_col,
        # labels are seed IDS (long): ids above 2^31 must not wrap
        F.col("__cluster").alias("cluster"),
        F.round("__dist", 6).alias("sq_dist"),
    )


def label_distance_outliers(
    embeddings: DataFrame,
    quantile: float = 0.95,
    round_decimals: int = 6,
) -> DataFrame:
    """Embedding-QA outlier flags: squared distance of every vector to
    its label's centroid, flagged when above the label's ``quantile``
    distance — the mislabeled/degenerate-embedding detector run before
    training on labeled corpora.

    Determinism: centroids are rounded to ``round_decimals`` BEFORE
    the distance (so both engines measure against identical centroids),
    distances rounded likewise, and the flag compares rounded distance
    to the rounded per-label quantile — every comparison happens on
    identically-rounded values.

    Scale: posexplode → (label, dim) centroid aggregate (tiny:
    #labels × dims rows, broadcast back) → per-vector distance
    aggregate keyed by vec_id (high-cardinality) → #labels-row
    quantile table broadcast for the flag. The corpus shuffles once,
    on vec_id.
    """
    dims = embeddings.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim_idx", "v")
    )
    cents = dims.groupBy("label", "dim_idx").agg(
        F.round(F.avg("v"), round_decimals).alias("c")
    )
    sq = (
        dims.join(F.broadcast(cents), ["label", "dim_idx"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))),
                round_decimals,
            ).alias("sq_dist")
        )
    )
    thr = sq.groupBy("label").agg(
        F.round(F.percentile("sq_dist", F.lit(quantile)), round_decimals).alias(
            "label_p95"
        )
    )
    return sq.join(F.broadcast(thr), "label").select(
        "vec_id",
        "label",
        "sq_dist",
        "label_p95",
        (F.col("sq_dist") > F.col("label_p95")).alias("is_outlier"),
    )
