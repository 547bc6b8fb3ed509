"""Grouped-aggregate (UDAF) kernels — the Series→scalar pandas_udf
form, completing the Python-execution inventory next to scalar
pandas_udf, mapInPandas, applyInPandas(WithState) and the UDTF.

A GROUPED_AGG pandas_udf receives each group's column as one pandas
Series and returns a scalar; Spark plans it as a real aggregate
(partial/final split is NOT available — grouped-agg UDFs are
whole-group, so each group's values ship to one task). That makes the
contract explicit: use these for group-bounded statistics Spark lacks
as built-ins, never for unbounded-group reductions (those belong in
built-in aggregates, which combine map-side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F


@F.pandas_udf("double")
def gini_pandas(v: pd.Series) -> float:
    """Gini coefficient of a group's values (inequality of the value
    mass): G = Σᵢ (2i − n − 1)·x₍ᵢ₎ / (n·Σx) over ascending-sorted x,
    1-based i. Tie-insensitive (equal values contribute equally under
    any permutation), NULLs dropped, and 0 for empty/zero-sum groups.

    No Spark built-in computes this; the sorted-index formula is exact
    and mirrors 1:1 in SQL (row_number window), so the oracle can
    hash-verify it.
    """
    x = np.sort(v.dropna().to_numpy(dtype=np.float64))
    n = x.size
    s = x.sum()
    if n == 0 or s == 0:
        return 0.0
    i = np.arange(1, n + 1, dtype=np.float64)
    return float(((2 * i - n - 1) @ x) / (n * s))
