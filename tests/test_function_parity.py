"""Dual-implementation parity: every function with a canonical
column-expression form and an Arrow-batched fast path must agree
bit-for-bit on randomized inputs — the fast path is what the catalog
runs, the column form is what the oracles mirror."""

from __future__ import annotations

import random
import string

import pytest
from pyspark.sql import functions as F

from formula1_dataengineering_spark.functions.text import (
    weighted_char_fingerprint,
    weighted_char_fingerprint_fast,
)
from formula1_dataengineering_spark.functions.vectors import (
    cosine_similarity,
    dot,
    dot_pandas,
    l2_norm,
    l2_norm_pandas,
)
from formula1_dataengineering_spark.operators.dedup import (
    word_shingles,
    word_shingles_pandas,
)


def _random_texts(seed: int, n: int = 60):
    rng = random.Random(seed)
    alphabet = string.ascii_letters + string.digits + " .,;:!?"
    texts = []
    for _ in range(n):
        words = [
            "".join(rng.choices(alphabet.replace(" ", ""), k=rng.randint(1, 8)))
            for _ in range(rng.randint(0, 12))
        ]
        texts.append(" ".join(words))
    # edge cases: empty, single word, unicode codepoints beyond ascii
    texts += ["", "one", "héllo wörld ünïcode", "a b", "ccc ccc ccc"]
    return texts


@pytest.mark.parametrize("seed", [1, 2])
def test_fingerprint_fast_equals_column_form(spark, seed):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_random_texts(seed))], ["id", "text"]
    )
    rows = df.select(
        "id",
        weighted_char_fingerprint(F.col("text")).alias("slow"),
        weighted_char_fingerprint_fast(F.col("text")).alias("fast"),
    ).collect()
    for r in rows:
        assert r["slow"] == r["fast"], r


@pytest.mark.parametrize("k", [1, 2, 3])
def test_shingles_pandas_equals_hof(spark, k):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_random_texts(3)) if t], ["id", "text"]
    )
    rows = df.select(
        "id",
        word_shingles(F.col("text"), k).alias("hof"),
        word_shingles_pandas(k)(F.col("text")).alias("fast"),
    ).collect()
    for r in rows:
        # same SET (order irrelevant — consumers explode + aggregate)
        assert sorted(r["hof"]) == sorted(r["fast"]), r


def test_vector_kernels_equal_hof_forms(spark):
    rng = random.Random(5)
    data = [
        (i, [rng.uniform(-1, 1) for _ in range(16)], [rng.uniform(-1, 1) for _ in range(16)])
        for i in range(50)
    ]
    df = spark.createDataFrame(data, ["id", "a", "b"])
    rows = df.select(
        dot(F.col("a"), F.col("b")).alias("d_hof"),
        dot_pandas(F.col("a"), F.col("b")).alias("d_np"),
        l2_norm(F.col("a")).alias("n_hof"),
        l2_norm_pandas(F.col("a")).alias("n_np"),
    ).collect()
    for r in rows:
        assert abs(r["d_hof"] - r["d_np"]) < 1e-9
        assert abs(r["n_hof"] - r["n_np"]) < 1e-9
