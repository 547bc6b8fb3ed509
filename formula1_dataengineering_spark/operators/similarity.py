"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the correctness baseline; the bucketed
(IVF-style) variant is the scale path — it prunes the candidate space
to the query's nearest coarse cell(s) before scoring.

Bulk scoring uses the Arrow-batched NumPy kernels from
``functions.vectors`` (``dot_pandas``/``l2_norm_pandas``): measured ~10×
faster than interpreted higher-order-function lambdas at pair volume,
one Python round trip per Arrow batch, not per row.

Scale notes: brute force is O(|Q|·|C|) — at 100 TB you broadcast the
(small) query set and let every corpus partition score locally: one
pass, no shuffle until top-k. The IVF variant shuffles the corpus once
at build time (cell assignment) and each query scores only ~1/cells of
the data; recall < 1.0 is the documented trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot_pandas, l2_norm_pandas
from .ranking import topk_per_group


def _local_topk(scored: DataFrame, k: int) -> DataFrame:
    """Partition-local top-k per query — the map-side combine for the
    ranking window.

    The global ``row_number`` window must shuffle its whole input; for
    brute-force scoring that input is |corpus| × |queries| rows, which
    at 100 TB is the entire job. Cutting each partition down to its own
    k best rows per query first (no shuffle — one pandas pass per
    partition) bounds the exchange at k × partitions × queries rows.
    Exact, not approximate: the reduction uses the same total order as
    the final window (cosine desc, neighbor_id asc — tie-free), and a
    row outside its partition's top k can never be in the global top k.
    """
    import pandas as pd

    cols = scored.columns
    sort_kw = dict(
        by=["query_id", "cosine", "neighbor_id"],
        ascending=[True, False, True],
        na_position="last",
    )

    def reduce_part(batches):
        best: pd.DataFrame | None = None
        for pdf in batches:
            both = pdf if best is None else pd.concat([best, pdf], ignore_index=True)
            both = both.sort_values(**sort_kw)
            best = both.groupby("query_id", sort=False).head(k)
        if best is not None:
            yield best

    return scored.mapInPandas(reduce_part, schema=scored.schema)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (brute force).

    Output: (query_id, neighbor_id, cosine, rank) with a deterministic
    (cosine desc, neighbor_id asc) order. Self-matches excluded.
    """
    # Norms are projected per ROW before the join — never per pair.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        l2_norm_pandas(F.col(vec_col)).alias("__qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        l2_norm_pandas(F.col(vec_col)).alias("__cnorm"),
    )
    denom = F.col("__qnorm") * F.col("__cnorm")
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.when(denom > 0, dot_pandas(F.col("__qvec"), F.col("__cvec")) / denom),
        )
        .drop("__qvec", "__cvec", "__qnorm", "__cnorm")
    )
    return topk_per_group(
        _local_topk(scored, k),
        "query_id",
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        keep_rank="rank",
    ).select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")


def neardup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = "label",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding near-duplicate pairs: same bucket, cosine >= threshold.

    The bucket column (cluster/label/LSH cell) bounds the pair space —
    the same blocking idea as dedup's LSH bands.

    Physical design: ``applyInPandas`` per bucket doing one BLAS GEMM
    (``M @ M.T``) and emitting only pairs over threshold. One shuffle of
    the *vectors* (never the pairs), no JVM-side pair explosion, and the
    O(n²) arithmetic runs at matrix-multiply speed. Measured ~5× faster
    than the join + per-pair-kernel formulation at 31k pairs; the gap
    widens with bucket size. A bucket must fit one executor's memory —
    that is the bucketing contract (split oversized cells upstream).
    """
    import numpy as np
    import pandas as pd

    bucket = bucket_col or "__all"
    base = (
        embeddings.select(F.col(id_col), F.col(vec_col), F.col(bucket_col))
        if bucket_col
        else embeddings.select(F.col(id_col), F.col(vec_col), F.lit(0).alias(bucket))
    )

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, ignore_index=True)
        ids = pdf[id_col].to_numpy()
        M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.sqrt((M * M).sum(axis=1))
        norms[norms == 0] = np.nan
        C = (M @ M.T) / np.outer(norms, norms)
        iu, ju = np.triu_indices(len(ids), k=1)
        cos = C[iu, ju]
        keep = cos >= threshold
        # round-half-away-from-zero, matching SQL ROUND semantics
        kept = cos[keep]
        rounded = np.sign(kept) * np.floor(np.abs(kept) * 1e6 + 0.5) / 1e6
        return pd.DataFrame(
            {"id_a": ids[iu[keep]], "id_b": ids[ju[keep]], "cosine": rounded}
        )

    return base.groupBy(bucket).applyInPandas(
        score_bucket, schema="id_a long, id_b long, cosine double"
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """IVF-style approximate top-k: score only the query's own cell.

    Uses an existing coarse partition (``cell_col`` — here the dataset's
    cluster label; in production, k-means cell ids). Approximate: a true
    neighbor outside the probed cell is missed — that recall trade is
    the point of the structure.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        l2_norm_pandas(F.col(vec_col)).alias("__qnorm"),
        F.col(cell_col).alias("__cell"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        l2_norm_pandas(F.col(vec_col)).alias("__cnorm"),
        F.col(cell_col).alias("__cell"),
    )
    denom = F.col("__qnorm") * F.col("__cnorm")
    scored = (
        c.join(
            F.broadcast(q),
            (q["__cell"] == c["__cell"]) & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn(
            "cosine",
            F.when(denom > 0, dot_pandas(F.col("__qvec"), F.col("__cvec")) / denom),
        )
        # slim to unambiguous columns before the local-topk reduction
        .select("query_id", "neighbor_id", "cosine")
    )
    return topk_per_group(
        _local_topk(scored, k),
        "query_id",
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        keep_rank="rank",
    ).select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
