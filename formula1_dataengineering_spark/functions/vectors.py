"""Vector math over ``array<float/double>`` embedding columns.

Two tiers:

- Column-expression forms (``dot`` / ``l2_norm`` / ``cosine_similarity``)
  built on higher-order functions — zero Python, fine for per-row use.
  Caveat measured on this engine: Catalyst interprets HOF lambdas (they
  do not enter whole-stage codegen), so at millions of *pairs* they
  dominate runtime.
- ``dot_pandas`` — Arrow-vectorized pandas UDF doing one batched NumPy
  ``einsum`` per Arrow batch. This is the bulk-scoring path the
  similarity operators use: BLAS-grade throughput, one Python round
  trip per ~10k rows, not per row.

All results are double; float32 inputs are upcast before accumulating
so results match a float64 oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product of two equal-length numeric arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; null/zero-norm safe (returns null)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


@F.pandas_udf(T.DoubleType())
def dot_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batched row-wise dot product: one ``einsum`` per Arrow batch."""
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    A = np.stack(a.to_numpy()).astype(np.float64, copy=False)
    B = np.stack(b.to_numpy()).astype(np.float64, copy=False)
    return pd.Series(np.einsum("ij,ij->i", A, B))


@F.pandas_udf(T.DoubleType())
def l2_norm_pandas(a: pd.Series) -> pd.Series:
    """Batched L2 norm (vectorized companion to ``l2_norm``)."""
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    A = np.stack(a.to_numpy()).astype(np.float64, copy=False)
    return pd.Series(np.sqrt(np.einsum("ij,ij->i", A, A)))


def norms_map_in_arrow(df, id_col: str = "vec_id", vec_col: str = "embedding"):
    """L2 norms via ``mapInArrow`` — the pyarrow-native batch mode
    (no pandas materialization at all): each RecordBatch's list column
    is reduced with zero-copy numpy over the Arrow value/offset
    buffers. Completes the Arrow execution inventory next to
    pandas_udf / Arrow UDF / UDTF / applyInPandas.

    Elements upcast to float64 BEFORE squaring (float32 arithmetic
    would diverge from the double oracle); per-row segment sums via
    ``np.add.reduceat`` (sequential within segment, matching a SQL
    fold), with a loop fallback when any row is empty (reduceat
    returns the element at a repeated offset instead of 0).
    """
    import numpy as np
    import pyarrow as pa

    def kernel(batches):
        for b in batches:
            ids = b.column(0)
            emb = b.column(1)
            off = emb.offsets.to_numpy()
            vals = emb.values.to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            sq = vals * vals
            if len(off) <= 1:
                sums = np.array([], dtype=np.float64)
            elif (off[1:] == off[:-1]).any():
                sums = np.array(
                    [sq[a:z].sum() for a, z in zip(off[:-1], off[1:])]
                )
            else:
                sums = np.add.reduceat(sq, off[:-1])
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(np.sqrt(sums), type=pa.float64())],
                ["vec_id", "norm"],
            )

    return df.select(id_col, vec_col).mapInArrow(
        kernel, "vec_id long, norm double"
    )
