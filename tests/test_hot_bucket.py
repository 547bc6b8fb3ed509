"""Hot-bucket guard for the LSH pair generators (VERDICT r15 item 5,
operators/dedup.exact_dup_stars): exact-duplicate texts collapse to a
representative BEFORE the band self-join, so duplicate-spam corpora
cost linear star pairs instead of a quadratic bucket, while dup-free
corpora get byte-identical output to the unguarded join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_dataengineering_spark.operators.dedup import (
    _band_rows,
    exact_dup_stars,
    lsh_candidates,
    minhash_lsh_pairs,
    minhash_signatures,
)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _distinct_docs(spark, n=30):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = [
        (
            i,
            " ".join(
                words[(i * 7 + j * 3) % len(words)] for j in range(10)
            )
            + f" tail{i}",
        )
        for i in range(n)
    ]
    return _corpus(spark, rows)


def test_exact_dup_stars_partitions_corpus(spark):
    rows = [(0, "a b c d"), (1, "a b c d"), (2, "x y z w"), (3, "a b c d")]
    reps, stars = exact_dup_stars(
        _corpus(spark, rows), "doc_id", "text"
    )
    assert sorted(r.doc_id for r in reps.collect()) == [0, 2]
    assert sorted(map(tuple, stars.collect())) == [(0, 1), (0, 3)]


def test_null_text_is_never_a_duplicate(spark):
    rows = [(0, None), (1, None), (2, "a b c d")]
    reps, stars = exact_dup_stars(
        _corpus(spark, rows), "doc_id", "text"
    )
    # NULL is not a duplicate of NULL: both null docs stay their own
    # representative, no stars between them.
    assert sorted(r.doc_id for r in reps.collect()) == [0, 1, 2]
    assert stars.count() == 0


def test_guard_output_identical_on_dup_free_corpus(spark):
    """On a corpus with no exact-duplicate texts the guarded
    generator equals the UNGUARDED band self-join, pair for pair —
    rebuilt here from the module's own primitives."""
    d = _distinct_docs(spark)
    guarded = sorted(
        map(tuple, lsh_candidates(d, num_hashes=8, bands=4).collect())
    )
    sig = minhash_signatures(d, "doc_id", "text", 8, 3, "portable")
    br = _band_rows(sig, "doc_id", 8, 4)
    a, b = br.alias("a"), br.alias("b")
    unguarded = sorted(
        map(
            tuple,
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
            )
            .distinct()
            .collect(),
        )
    )
    assert guarded == unguarded


def test_spam_bucket_stays_linear(spark):
    """1,000 identical docs beside a distinct corpus: the unguarded
    join would emit ~499,500 intra-bucket pairs; the guard emits 999
    stars (est 1.0) plus the corpus's own few candidates."""
    base = _distinct_docs(spark, n=20)
    spam = spark.range(1000).select(
        (F.col("id") + 100_000).alias("doc_id"),
        F.lit("spam spam wonderful spam lovely spam baked beans").alias(
            "text"
        ),
    )
    pairs = minhash_lsh_pairs(
        base.unionByName(spam), num_hashes=8, bands=4
    ).collect()
    spam_pairs = [p for p in pairs if p.id_b >= 100_000]
    stars = [p for p in spam_pairs if p.id_a == 100_000]
    assert len(stars) == 999
    assert all(p.est_jaccard == 1.0 for p in stars)
    # Nothing quadratic leaked: spam rows are the stars plus at most
    # the rep's own band collisions with the 20-doc corpus.
    assert len(spam_pairs) <= 999 + 20
    assert len(pairs) <= 999 + 20 + (20 * 19) // 2


def test_member_candidates_flow_through_rep_only(spark):
    """A duplicate group of 3 emits exactly 2 stars; member↔member
    reachability is THROUGH the rep (canopy contract), never direct."""
    rows = [
        (0, "p q r s t u"),
        (5, "p q r s t u"),
        (9, "p q r s t u"),
        (3, "completely different words here entirely"),
    ]
    got = sorted(
        map(
            tuple,
            lsh_candidates(_corpus(spark, rows), num_hashes=8, bands=4)
            .select("id_a", "id_b")
            .collect(),
        )
    )
    assert (0, 5) in got and (0, 9) in got
    assert (5, 9) not in got


@pytest.mark.parametrize("n_hashes,bands", [(12, 4)])
def test_guard_est_jaccard_matches_sig_agreement(spark, n_hashes, bands):
    """Rep-level pairs still carry the signature-agreement estimate;
    only stars use the constructive 1.0."""
    d = _distinct_docs(spark, n=25)
    for p in minhash_lsh_pairs(d, num_hashes=n_hashes, bands=bands).collect():
        assert 0.0 <= p.est_jaccard <= 1.0
