"""Deterministic per-group ranking operators.

The reference expresses "best row per driver" as either ``idxmin()``
(reference: src/data_processing.py:102-116, src/session_object.py:156-165)
or sort + ``drop_duplicates`` (reference: src/data_processing.py:283-284)
— both order-dependent. In Spark, sort-then-dropDuplicates keeps a
nondeterministic row, so the ONLY correct mapping is an explicit
``row_number`` window with a total ordering (SURVEY §2.5 W1). These
helpers centralize that.

Scale: one hash shuffle on the partition keys; with AQE the window runs
map-side-partial-free but skewed groups are handled by the skew-join /
coalesce machinery. For top-k over a *global* ordering prefer
``orderBy().limit(k)`` (TakeOrderedAndProject — no full sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank1_per_group(
    df: DataFrame,
    partition_by: str | Sequence[str],
    order_by: Sequence[Column | str],
    keep_rank: str | None = None,
) -> DataFrame:
    """The single best row per group under a total order.

    ``order_by`` must be a total order (include a unique tie-break key)
    for deterministic, hash-stable output.
    """
    return topk_per_group(df, partition_by, order_by, 1, keep_rank)


def topk_per_group(
    df: DataFrame,
    partition_by: str | Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    keep_rank: str | None = None,
) -> DataFrame:
    """Top-k rows per group; ``keep_rank`` optionally emits the rank."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    rank_col = keep_rank or "__rank"
    out = df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def sharded_topk_per_group(
    df: DataFrame,
    partition_by: str | Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    shard_by: Column,
    n_shards: int = 64,
    keep_rank: str | None = None,
) -> DataFrame:
    """Lossless two-phase top-k for LOW-cardinality groups at corpus
    scale: phase 1 ranks inside (group, ``shard_by`` mod ``n_shards``)
    and prunes to ``k`` — any row in the global top-k is necessarily in
    its shard's top-k, so the prune loses nothing — phase 2 re-ranks
    the ≤ k·n_shards survivors per group. A plain per-group window
    would sort one group's entire row set on a single task; this caps
    every sort at shard granularity (and Spark's WindowGroupLimit caps
    each sort's input at k).

    ``order_by`` must be a total order; ``shard_by`` any well-spread
    column expression (a hash of the ranked entity). Shared engine for
    the quota-sample / heavy-hitter / KMV top-k family (code-review
    consolidation).
    """
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    shard = F.pmod(shard_by, F.lit(n_shards))
    w1 = Window.partitionBy(*keys, shard).orderBy(*order_by)
    pruned = df.withColumn("__r1", F.row_number().over(w1)).where(
        F.col("__r1") <= k
    ).drop("__r1")
    return topk_per_group(pruned, keys, order_by, k, keep_rank)
