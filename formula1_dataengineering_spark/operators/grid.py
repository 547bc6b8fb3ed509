"""Ordered-group position assembly (the qualifying-grid operator).

The reference builds the starting grid by *physically concatenating*
DataFrames in a meaningful order — Q3 order ⊕ Q2-eliminated ⊕
Q1-eliminated (reference: src/data_processing.py:287-290). Union order
is undefined in a distributed engine, so the semantic redesign (SURVEY
§2.6 O4) is an explicit position column: rank within each group, plus a
per-group offset, then an ordinary ORDER BY.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ordered_group_position(
    df: DataFrame,
    group_col: str,
    group_order: Sequence[str],
    order_by: Sequence[Column | str],
    position_col: str = "position",
    group_sizes: Sequence[int] | None = None,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Emit a deterministic ``position`` across ordered groups.

    ``group_order`` lists group values from best to worst; rows rank
    within their group by ``order_by`` and groups stack in order. When
    ``group_sizes`` is given, offsets are the fixed cumulative sizes
    (e.g. qualifying's 10/5/5 split); otherwise offsets are the actual
    group counts (computed with one tiny aggregate, broadcast back).

    ``partition_cols`` scopes the whole position space (ranks AND
    offsets) per partition — e.g. per session_key — so multi-session
    input yields one independent grid per session instead of mixing
    sessions into one nondeterministic ordering.
    """
    parts = list(partition_cols)
    rank_w = Window.partitionBy(*parts, group_col).orderBy(*order_by)
    ranked = df.withColumn("__grp_rank", F.row_number().over(rank_w))

    if group_sizes is not None:
        offsets = {}
        acc = 0
        for g, size in zip(group_order, group_sizes):
            offsets[g] = acc
            acc += size
        offset_col = F.lit(None).cast("int")
        for g, off in offsets.items():
            offset_col = F.when(F.col(group_col) == g, F.lit(off)).otherwise(offset_col)
        out = ranked.withColumn(
            position_col, (offset_col + F.col("__grp_rank")).cast("int")
        ).drop("__grp_rank")
    else:
        counts = df.groupBy(*parts, group_col).count().withColumnRenamed(
            "count", "__grp_n"
        )
        order_map = {g: i for i, g in enumerate(group_order)}
        rank_expr = F.lit(None).cast("int")
        for g, i in order_map.items():
            rank_expr = F.when(F.col(group_col) == g, F.lit(i)).otherwise(rank_expr)
        offsets_df = (
            counts.withColumn("__grp_ord", rank_expr)
            .withColumn(
                "__grp_off",
                F.coalesce(
                    F.sum("__grp_n").over(
                        Window.partitionBy(*parts)
                        .orderBy("__grp_ord")
                        .rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ),
            )
            .select(*parts, group_col, "__grp_off")
        )
        ranked = ranked.join(
            F.broadcast(offsets_df), [*parts, group_col], "left"
        )
        out = ranked.withColumn(
            position_col, (F.col("__grp_off") + F.col("__grp_rank")).cast("int")
        ).drop("__grp_rank", "__grp_off")
    return out.orderBy(*parts, position_col)
