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
