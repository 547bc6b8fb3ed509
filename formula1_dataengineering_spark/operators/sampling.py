"""Sampling + sketch aggregates for corpus accounting at scale.

At 100 TB you sample before you look: stratified fractions per source,
fixed-size per-group samples for inspection, and sketch aggregates
(HLL distinct counts, t-digest-ish percentiles) where exact answers
would shuffle the world for a dashboard number. All built-ins —
``sampleBy``/``approx_count_distinct``/``approx_percentile`` run
JVM-side with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample (``sampleBy``): one pass, no
    shuffle, deterministic under a fixed seed."""
    return df.sampleBy(strata_col, fractions, seed=seed)


#: Knuth's multiplicative constant, used by the portable sample hash.
SAMPLE_HASH_A = 2654435761
SAMPLE_HASH_P = 2147483647


def deterministic_sample_per_group(
    df: DataFrame, group_col: str, id_col: str, k: int, seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Exactly-k-per-group sample, reproducible across runs/partitioning.

    Rank rows inside each group by a salted hash of their id and keep
    the first k — a reservoir-style fixed-size sample whose membership
    is a pure function of (id, seed), unlike ``rand()``-based sampling
    which varies with partition layout. One window shuffle on the
    group key.

    ``portable=True`` swaps xxhash64 for a multiplicative-mod hash
    ``(A·id + seed) mod P`` that any SQL engine reproduces exactly —
    the oracle-testable mode (ids must keep ``A·id + seed`` within
    int64, true for any id < 2^31).
    """
    if portable:
        h = (F.lit(SAMPLE_HASH_A) * F.col(id_col) + F.lit(seed)) % SAMPLE_HASH_P
    else:
        h = F.xxhash64(F.col(id_col), F.lit(seed))
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def sketch_profile(
    df: DataFrame, group_col: str, value_col: str, id_col: str, rsd: float = 0.05
) -> DataFrame:
    """Per-group sketch profile: approximate distinct ids (HLL++ with
    relative std dev ``rsd``) + approximate p50/p95 (with accuracy
    10000) + exact count, in ONE aggregation pass."""
    return df.groupBy(group_col).agg(
        F.count("*").alias("n_rows"),
        F.approx_count_distinct(id_col, rsd).alias("approx_ids"),
        F.percentile_approx(value_col, [0.5, 0.95], 10000).alias("approx_p50_p95"),
    )


#: 2^48 — range of :func:`~..operators.dedup.portable_hash48`.
_M48 = 281474976710656


def kmv_sketch_profile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    row_id_col: str,
    k: int = 64,
    sample_mod: int = 4,
) -> DataFrame:
    """Per-group ORACLE-PORTABLE sketch profile: KMV (k-minimum-values)
    approximate distinct ids + hash-sampled p50/p95 + exact count.

    Unlike :func:`sketch_profile` (HLL++/t-digest — engine-internal
    state, only rows-only-checkable), every number here is a pure
    function of the data under a fixed seed, so any SQL engine replays
    it exactly:

    - **KMV distinct**: hash ids with the portable 48-bit MD5 hash,
      keep each group's ``k`` smallest DISTINCT hash values; estimate
      ``(k-1) / (h_k / 2^48)`` (Bar-Yossef et al. 2002), exact when a
      group has fewer than ``k`` distinct ids. Top-k is the lossless
      two-phase shard prune (any global top-k row is in its shard's
      top-k), so no group ever sorts its full distinct-id set on one
      task — the same scale shape as ``quota_sample``.
    - **Sampled quantiles**: linear-interpolation percentile over the
      deterministic ``hash(row_id) % sample_mod == 0`` row sample —
      sampling happens in the scan stage; only the sample shuffles.
    - **Exact count**: map-side-combined ``count(*)``.

    Three #groups-row aggregates, left-joined (a group may be empty on
    the sample side). Reference parity: the profile numbers the
    dashboard summarises (dashboard.py headline stats), re-expressed as
    engine-checkable sketches.
    """
    from .dedup import portable_hash48

    g = group_col
    h_id = portable_hash48(F.col(id_col).cast("string"))
    h_row = portable_hash48(F.col(row_id_col).cast("string"))

    counts = df.groupBy(g).agg(F.count("*").alias("n_rows"))

    from .ranking import sharded_topk_per_group

    dist = df.select(F.col(g), h_id.alias("__h")).distinct()
    topk = sharded_topk_per_group(
        dist, g, [F.col("__h")], k, shard_by=F.col("__h")
    )
    kmv = topk.groupBy(g).agg(
        F.count("*").alias("__d"), F.max("__h").alias("__hk")
    )
    # (k-1)·2^48 is exact in a double for any sane k; __hk < 2^48 is
    # exact too — both engines perform the identical IEEE division.
    est = F.when(
        F.col("__d") < k, F.col("__d").cast("double")
    ).otherwise(F.lit(float((k - 1) * _M48)) / F.col("__hk"))
    kmv = kmv.select(g, F.round(est, 4).alias("kmv_distinct_ids"))

    pct = F.percentile(value_col, F.lit([0.5, 0.95]))
    q = (
        df.where(F.pmod(h_row, F.lit(sample_mod)) == 0)
        .groupBy(g)
        .agg(pct.alias("__p"))
        .select(
            g,
            F.round(F.element_at("__p", 1), 4).alias("sample_p50"),
            F.round(F.element_at("__p", 2), 4).alias("sample_p95"),
        )
    )
    return counts.join(kmv, g, "left").join(q, g, "left")
