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
