"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the correctness baseline; the bucketed
(IVF-style) variant is the scale path — it prunes the candidate space
to the query's nearest coarse cell(s) before scoring.

All arithmetic runs JVM-side via higher-order functions
(``functions.vectors``); Python never touches a vector.

Scale notes: brute force is O(|Q|·|C|) — at 100 TB you broadcast the
(small) query set and let every corpus partition score locally: one
pass, no shuffle until top-k. The IVF variant shuffles the corpus once
at build time (cell assignment) and each query scores only ~1/cells of
the data; recall < 1.0 is the documented trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity
from .ranking import topk_per_group


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
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", cosine_similarity(F.col("__qvec"), F.col("__cvec"))
        )
        .drop("__qvec", "__cvec")
    )
    return topk_per_group(
        scored,
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
    """
    cols = [F.col(id_col), F.col(vec_col)] + (
        [F.col(bucket_col)] if bucket_col else []
    )
    base = embeddings.select(*cols)
    a = base.alias("a")
    b = base.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if bucket_col:
        cond = cond & (F.col(f"a.{bucket_col}") == F.col(f"b.{bucket_col}"))
    pairs = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("__cos"),
    )
    return pairs.where(F.col("__cos") >= threshold).select(
        "id_a", "id_b", F.round("__cos", 6).alias("cosine")
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
        F.col(cell_col).alias("__cell"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.col(cell_col).alias("__cell"),
    )
    scored = (
        c.join(
            F.broadcast(q),
            (q["__cell"] == c["__cell"]) & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn("cosine", cosine_similarity(F.col("__qvec"), F.col("__cvec")))
    )
    return topk_per_group(
        scored,
        "query_id",
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        keep_rank="rank",
    ).select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
