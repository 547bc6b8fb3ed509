"""Interval (range) join: point-in-range enrichment.

The reference hand-rolls this as an O(stints × laps) nested loop with
per-cell writes (``assign_tire_information_to_lap``, reference:
src/data_processing.py:144-183). Spark-first it is a single declarative
join: equi keys (driver, session) + a ``BETWEEN`` residual — Catalyst
executes it as broadcast-hash (small right) or sort-merge (large right)
with the range as a post-join filter, never a nested loop over the fact
table.

Scale rule (SURVEY §4.3): ALWAYS supply the equi keys. Without them the
plan degenerates to BroadcastNestedLoopJoin, which is O(n·m) at 100 TB.
The function raises if no equi key is given unless the caller opts in.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lo: str,
    hi: str,
    on: str | Sequence[str] | None = None,
    how: str = "left",
    broadcast_right: bool = True,
    allow_cartesian: bool = False,
) -> DataFrame:
    """Join each left row to right rows where ``lo <= point <= hi``.

    ``on`` are equi-join keys present on both sides. ``broadcast_right``
    hints the dimension side (stint-like tables are tiny relative to the
    fact side).
    """
    keys = [on] if isinstance(on, str) else list(on or [])
    if not keys and not allow_cartesian:
        raise ValueError(
            "interval_join without equi keys degenerates to a nested-loop "
            "join; pass on=[...] or allow_cartesian=True"
        )
    cond = F.col(point).between(F.col(lo), F.col(hi))
    for k in keys:
        cond = (left[k] == right[k]) & cond
    r = F.broadcast(right) if broadcast_right else right
    joined = left.join(r, cond, how)
    # Drop the duplicated equi-key columns coming from the right side.
    for k in keys:
        joined = joined.drop(right[k])
    return joined
