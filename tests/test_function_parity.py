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
    weighted_char_fingerprint_arrow,
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


def test_quality_metrics_match_duckdb_on_dirty_text(spark):
    """Engine vs oracle token semantics on text the synthetic fixtures
    never produce: empty strings, leading/trailing/double whitespace.
    Both sides must drop empty tokens after the \\s+ split (ADVICE r1:
    the oracle counted raw split elements including empties)."""
    import duckdb

    from formula1_dataengineering_spark.functions.text import quality_metrics

    texts = [
        "  leading and trailing  ",
        "double  space of the",
        "\tthe a of\nand to ",
        "single",
        "a",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    m = quality_metrics(F.col("text"))
    got = {
        r["doc_id"]: (r["n_tokens"], r["stop"])
        for r in df.select(
            "doc_id",
            m["n_tokens"].alias("n_tokens"),
            F.round(m["stopword_ratio"], 4).alias("stop"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts)).replace("\t", "' || chr(9) || '").replace("\n", "' || chr(10) || '")
        + ") t(doc_id, text)"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            """
            SELECT doc_id,
                   len(list_filter(string_split_regex(text, '\\s+'), t -> t != '')),
                   round(len(list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t IN ('the', 'a', 'of', 'and', 'to'))) * 1.0
                     / len(list_filter(string_split_regex(text, '\\s+'), t -> t != '')), 4)
            FROM d
            """
        ).fetchall()
    }
    assert got == want


def test_salted_join_rejects_dim_preserving_how(spark):
    from formula1_dataengineering_spark.operators.skew import salted_join

    f = spark.range(10).withColumnRenamed("id", "k")
    d = spark.range(3).withColumnRenamed("id", "k")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(f, d, ["k"], n_salt=4, how=how)
    assert salted_join(f, d, ["k"], n_salt=4, how="left").count() == 10


def test_knn_query_budget_guard(spark):
    from formula1_dataengineering_spark.operators.similarity import cosine_topk

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="row budget"):
        cosine_topk(vecs, vecs, k=2, max_query_rows=5)
    # within budget still works
    assert cosine_topk(vecs.where("vec_id < 3"), vecs, k=2, max_query_rows=5).count() == 6


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
        weighted_char_fingerprint_arrow(F.col("text")).alias("arrow"),
    ).collect()
    for r in rows:
        # three execution modes, one value: interpreted HOF expression,
        # Arrow-batched pandas_udf, Arrow-optimized per-row Python UDF
        # (useArrow=True) — the measured trade-off is in BASELINE.md.
        assert r["slow"] == r["fast"] == r["arrow"], r


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


def test_gini_udaf_known_values(spark):
    """Grouped-agg pandas UDF (Python UDAF): Gini of known
    distributions — perfect equality -> 0, one-holder -> (n-1)/n,
    NULLs dropped, zero-sum group -> 0."""
    from formula1_dataengineering_spark.functions.stats import gini_pandas

    rows = (
        [("eq", 5.0)] * 4
        + [("one", 0.0)] * 3 + [("one", 10.0)]
        + [("nul", 2.0), ("nul", None), ("nul", 2.0)]
        + [("zero", 0.0)] * 3
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: r["gini"]
        for r in df.groupBy("g")
        .agg(F.round(gini_pandas(F.col("v")), 6).alias("gini"))
        .collect()
    }
    assert got["eq"] == 0.0
    assert got["one"] == 0.75  # (n-1)/n with n=4
    assert got["nul"] == 0.0
    assert got["zero"] == 0.0
