"""Deterministic shard assignment for 100 TB corpus layouts.

Rendezvous (highest-random-weight, HRW) hashing: each key is assigned
to the shard with the maximum ``hash(key, shard)`` weight. The property
that matters for petabyte re-runs — and that plain ``hash(key) % N``
lacks — is MINIMAL REMAPPING: removing (or adding) one shard only
moves the keys that lived on that shard, because every other shard's
weight for every key is unchanged and argmax over a superset that
dropped a non-winner picks the same winner. With mod-N sharding,
changing N remaps ~(N-1)/N of ALL keys — at 100 TB that is a full
corpus rewrite vs. touching 1/N of it (tests/test_sharding.py pins the
property exactly).

Spark-first: the weight list is a ``transform`` over
``sequence(0, n_shards-1)`` of (hash, shard) structs and the winner is
``array_max`` (struct comparison is lexicographic: max weight, then
max shard id as the deterministic tie-break) — all JVM higher-order
functions inside whole-stage codegen, zero Python, ZERO SHUFFLE: shard
assignment is scan-stage column arithmetic, so a 100 TB assignment
pass is embarrassingly parallel and pipelines straight into a
partitioned write.

Hash modes mirror operators/dedup.py: ``portable`` (default) is the
48-bit little-endian MD5 prefix with an exact DuckDB twin
(oracle-replayable — the gate uses it); ``fast`` is ``xxhash64`` for
production assignments where cross-engine replay is not needed
(~16 hashes/row at n_shards=16 makes the hash the dominant scan cost,
and xxhash64 is the cheapest hash Spark has).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash48


def rendezvous_shard(
    key: Column, n_shards: int, salt: str = "hrw", mode: str = "portable"
) -> Column:
    """HRW shard id (int in [0, n_shards)) for ``key``.

    Weight = hash("{salt}:{key}:{shard}"); winner = max (weight,
    shard) struct, so ties (astronomically unlikely with 48/64-bit
    weights) break toward the larger shard id deterministically.

    A NULL key yields a NULL shard (no silent placement: concat_ws
    would otherwise SKIP the null component and hash the degenerate
    tag "{salt}:{shard}", assigning every null key one arbitrary but
    real shard while SQL twins with null-propagating ``||`` disagree —
    code-review r9). Callers route null keys explicitly.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")

    def weigh(s: Column) -> Column:
        tag = F.concat_ws(
            ":", F.lit(salt), key.cast("string"), s.cast("string")
        )
        if mode == "portable":
            w = portable_hash48(tag)
        elif mode == "fast":
            w = F.xxhash64(tag)
        else:
            raise ValueError(f"unknown hash mode: {mode!r}")
        return F.struct(w.alias("w"), s.cast("int").alias("shard"))

    scores = F.transform(
        F.sequence(F.lit(0), F.lit(n_shards - 1)), weigh
    )
    return F.when(key.isNotNull(), F.array_max(scores)["shard"])


def shard_accounting(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "hrw",
    mode: str = "portable",
    size_col: str | None = None,
) -> DataFrame:
    """Per-shard placement accounting (the layout-audit view a corpus
    re-shard ships with): shard id, key count, optional byte/char
    total, and the key range — one row per non-empty shard.

    NULL keys are excluded up front: ``rendezvous_shard`` maps them to
    a NULL shard by contract (callers route null keys explicitly), so
    a null-keyed row would otherwise surface as a ``shard = NULL``
    accounting row — contradicting "one row per non-empty shard" and
    diverging from oracles that count only keyed rows (ADVICE r9)."""
    df = df.where(F.col(key_col).isNotNull())
    shard = rendezvous_shard(F.col(key_col), n_shards, salt, mode)
    aggs = [
        F.count("*").alias("n_keys"),
        F.min(key_col).alias("min_key"),
        F.max(key_col).alias("max_key"),
    ]
    if size_col is not None:
        aggs.insert(1, F.sum(size_col).cast("bigint").alias("total_size"))
    return df.withColumn("shard", shard).groupBy("shard").agg(*aggs)
