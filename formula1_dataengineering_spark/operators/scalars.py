"""Broadcast-scalar attachment: join a 1-row aggregate frame onto a
big frame without a nested-loop shape.

The naive ``big.crossJoin(F.broadcast(one_row))`` compiles to
``BroadcastNestedLoopJoin`` — banned by the catalog-wide plan-hygiene
gate (tests/test_plans.py) because its cost model explodes with input
size. The fix is an equi-join on a single-valued key derived FROM A
COLUMN on each side (``pmod(col, 1)`` = 0 for every non-null row): a
literal key would constant-fold back into a cross join, which is the
non-obvious detail this helper exists to centralize (previously
re-derived inline at five call sites; provenance:
clustering.kmeans_assignments' k-fold fan-out join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KEY = "__scalar_join_key"


def _keyed(df: DataFrame, from_col: str | Column) -> DataFrame:
    col = F.col(from_col) if isinstance(from_col, str) else from_col
    return df.withColumn(_KEY, F.pmod(col, F.lit(1)).cast("int"))


def broadcast_scalars(
    big: DataFrame,
    scalars: DataFrame,
    big_key_col: str | Column,
    scalars_key_col: str | Column,
) -> DataFrame:
    """Attach every column of the 1-row ``scalars`` frame to ``big``.

    ``big_key_col`` / ``scalars_key_col`` must be NON-NULL numeric
    columns on their respective frames (any will do — only
    ``pmod(x, 1) = 0`` is used). Compiles to a BroadcastHashJoin.
    """
    return _keyed(big, big_key_col).join(
        F.broadcast(_keyed(scalars, scalars_key_col)), _KEY
    ).drop(_KEY)
