"""Lap-time formatting as a pure column expression.

The reference defines this formatter three times as Python scalar
functions (reference: src/data_processing.py:314-318,
src/helper_functions.py:55-59, classes.py:29-36). Here it compiles to
JVM-side expressions inside whole-stage codegen — no UDF, no Python
round-trip (SURVEY §2.8 F2/F3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def format_lap_time(seconds: Column) -> Column:
    """``seconds (double) → "M:SS.mmm"`` e.g. 92.3456 → ``1:32.346``.

    Built from floor/lpad/concat (portable to the DuckDB oracle —
    ``printf``-style float formatting differs across engines, integer
    composition does not). Null-safe: null seconds → null string.
    """
    total_ms = F.round(seconds * 1000).cast("long")
    minutes = F.floor(total_ms / 60000).cast("long")
    rem_s = F.floor((total_ms % 60000) / 1000).cast("long")
    ms = (total_ms % 1000).cast("long")
    return F.when(
        seconds.isNotNull(),
        F.concat(
            minutes.cast("string"),
            F.lit(":"),
            F.lpad(rem_s.cast("string"), 2, "0"),
            F.lit("."),
            F.lpad(ms.cast("string"), 3, "0"),
        ),
    )
