"""Skew-aware join: explicit key salting.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin``) splits
oversized sort-merge partitions at runtime and is the first line of
defense. Salting is the explicit fallback for the cases AQE can't fix —
a broadcast-ineligible dimension joined on a key where one value
dominates (e.g. a null-heavy foreign key or a celebrity user id).

Mechanics: the fact side gets a uniform random-but-deterministic salt
in ``[0, n)`` derived by hashing the whole row; the dimension side is
exploded ``n``× (one copy per salt value). The join key becomes
(key, salt), splitting each hot key's rows across ``n`` shuffle
partitions. Semantics are identical to the unsalted equi-join — the
oracle for the demo query is the plain SQL join.

When salting beats AQE (and vice versa) — the decision rule, with the
measured halves in tests/test_skew_plan.py (AQE's splitter firing on a
hot-key SMJ; salting bounding per-partition rows where AQE cannot):

- AQE skew-join only rewrites JOINS, and only sort-merge /
  shuffled-hash ones: it splits an oversized fact partition and
  REPLICATES the matching other-side partition. Prefer it (i.e. do
  nothing) for fact-fact equi-joins — zero code, runtime-sized.
- Salting wins when the hot key hurts a stage AQE won't rewrite:
  a skewed ``groupBy`` feeding further per-key work (AQE can coalesce
  small post-shuffle partitions but cannot SPLIT one hot group), a
  hot key REUSED across several downstream joins/aggregations (salt
  once, amortize; AQE re-splits per join), window functions
  partitioned on the hot key, or an outer-side skew pattern AQE's
  replication rule declines. It also gives a deterministic layout
  where AQE's split count varies run-to-run with observed sizes.
- Both lose to ``broadcast()`` when the other side fits — check that
  first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with an ``n_salt``-way salt.

    ``dim`` is replicated ``n_salt``× — keep it the (much) smaller
    side. Output matches ``fact.join(dim, on, how)`` — which is also
    why ``how`` is restricted to inner/left/left_semi/left_anti: for
    right/full outer joins every unmatched dim row would surface once
    per salt copy, breaking that contract.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "the dim side is replicated per salt, so outer-preserving the dim "
            "side would emit unmatched dim rows n_salt times"
        )
    fact_cols = fact.columns
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact_cols]), F.lit(n_salt))
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<bigint>"))
    )
    return salted_fact.join(salted_dim, on + ["__salt"], how).drop("__salt")
