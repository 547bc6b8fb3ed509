"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference surface (task brief): exact dedup, MinHash+LSH,
SimHash, and n-gram Jaccard — all expressed as compositions of
Catalyst-optimizable primitives (split/slice/explode/groupBy/join), no
Python in the hot path.

Hashing modes:
- ``portable`` (default in tests): shingle/token ids come from a sorted
  dictionary (``row_number`` over distinct terms), and the hash family
  is ``(a_i·id + b_i) mod P`` — mechanically reproducible in the DuckDB
  oracle, so signatures and candidate pairs hash-match exactly.
- ``fast``: ids come from ``xxhash64`` (JVM-side, no dictionary join,
  no global sort) — the 100 TB path. Same topology, cheaper ids; the
  oracle then only checks invariants, not exact signatures.

Scale notes: the dictionary mode's global ``row_number`` is a single-
partition sort of the *distinct-term* set — fine for test oracles, a
bottleneck at web scale; that is exactly why ``fast`` exists. The LSH
band join shuffles on (band, key) which is uniformly distributed by
construction; the candidate-pair space never materializes beyond
matching buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MERSENNE_P = 2147483647  # 2^31 - 1


def _hash_a(i: int) -> int:
    return 2 * i + 1


def _hash_b(i: int) -> int:
    return 7 + 3 * i


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact duplicate groups: representative (min id) + copy count."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies")
    )


def word_shingles(text: Column, k: int) -> Column:
    """Distinct word k-shingles of a single-space-tokenized text."""
    toks = F.split(text, " ")
    nsh = F.size(toks) - F.lit(k) + 1
    shingles = F.transform(
        F.sequence(F.lit(1), nsh),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    # sequence(1, n) with n < 1 counts DOWN — guard with an empty array.
    return F.when(nsh >= 1, F.array_distinct(shingles)).otherwise(
        F.array().cast("array<string>")
    )


def _term_ids(
    terms: DataFrame, term_col: str, mode: str
) -> DataFrame:
    """(term → id) mapping: sorted-dictionary (portable) or xxhash64."""
    if mode == "portable":
        w = Window.orderBy(term_col)
        return (
            terms.select(term_col)
            .distinct()
            .withColumn("term_id", F.row_number().over(w).cast("long"))
        )
    return terms.select(term_col).distinct().withColumn(
        "term_id", F.abs(F.xxhash64(term_col)) % F.lit(MERSENNE_P)
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_k: int = 3,
    mode: str = "portable",
) -> DataFrame:
    """Per-document MinHash signature: columns ``sig_0..sig_{H-1}``."""
    ds = docs.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_k)).alias("shingle")
    )
    dict_df = _term_ids(ds, "shingle", mode)
    ids = ds.join(dict_df, "shingle").select(id_col, "term_id")
    aggs = [
        F.min((F.lit(_hash_a(i)) * F.col("term_id") + F.lit(_hash_b(i))) % MERSENNE_P)
        .cast("long")
        .alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return ids.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    mode: str = "portable",
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b) + estimated Jaccard.

    Docs sharing any band (r = H/bands consecutive signature slots)
    become candidates; ``est_jaccard`` is the fraction of agreeing
    signature components.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    r = num_hashes // bands
    # Cache the signatures: the band self-join consumes them twice, and
    # without the cache the whole dictionary+explode pipeline runs twice.
    sig = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_k, mode).cache()

    band_rows = sig.select(
        F.col(id_col),
        *[F.col(f"sig_{i}") for i in range(num_hashes)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_", *[F.col(f"sig_{b * r + j}") for j in range(r)]
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, *[f"sig_{i}" for i in range(num_hashes)], "bk.band", "bk.key")

    a = band_rows.alias("a")
    b = band_rows.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col(f"a.key") == F.col(f"b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            *[
                (F.col(f"a.sig_{i}") == F.col(f"b.sig_{i}")).cast("int").alias(f"eq_{i}")
                for i in range(num_hashes)
            ],
        )
        .distinct()
    )
    est = sum(F.col(f"eq_{i}") for i in range(num_hashes)) / F.lit(float(num_hashes))
    return pairs.select(
        "id_a", "id_b", F.round(est, 4).alias("est_jaccard")
    )


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bits: int = 32,
    mode: str = "portable",
) -> DataFrame:
    """Per-document SimHash (``num_bits``-bit, as bigint).

    Token-frequency-weighted: bit j is set iff the count-weighted sum
    of ±1 contributions from each distinct token's hash bit j is > 0.
    """
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    counts = toks.groupBy(id_col, "token").agg(F.count("*").alias("cnt"))
    dict_df = _term_ids(toks, "token", mode)
    h = (F.lit(1103515245) * F.col("term_id") + F.lit(12345)) % MERSENNE_P
    withh = counts.join(dict_df, "token").withColumn("h", h)
    bit_sums = withh.groupBy(id_col).agg(
        *[
            F.sum(
                F.col("cnt")
                * (2 * ((F.col("h") / F.lit(1 << j)).cast("long") % 2) - 1)
            ).alias(f"s_{j}")
            for j in range(num_bits)
        ]
    )
    sim = sum(
        F.when(F.col(f"s_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(num_bits)
    )
    return bit_sums.select(F.col(id_col), sim.cast("long").alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
    n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram-set Jaccard over candidate pairs.

    ``block_col`` bounds the pair space (same-block pairs only) — the
    blocking key is the scale lever; without one this is quadratic.
    """
    base = docs.select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        F.explode(word_shingles(F.col(text_col), n)).alias("gram"),
    )
    sizes = base.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    join_keys = ["gram"] + ([block_col] if block_col else [])
    a = base.alias("a")
    b = base.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for kcol in join_keys:
        cond = cond & (F.col(f"a.{kcol}") == F.col(f"b.{kcol}"))
    inter = (
        a.join(b, cond)
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("n_b"))
    jacc = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(jacc >= threshold)
        .select("id_a", "id_b", F.round(jacc, 4).alias("jaccard"))
    )
