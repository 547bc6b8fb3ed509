"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` maps
every implemented operator (SURVEY.md §2) to a (spark, sf_dir) →
DataFrame callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL the
driver hash-compares against at sf0.01.

Registration ORDER is the driver-verification rotation policy: the
driver hashes the first 50 entries each round, so we order by
staleness, computed at import time from the recorded
``CORRECTNESS_r*.json`` files — (1) ``_PRIORITY``: queries REWRITTEN
this round whose old green hash no longer covers the current plan,
(2) queries that have never earned a green driver row (new this round),
(3) everything else, oldest green row first. The local DuckDB harness
(tests/test_queries_oracle.py) still guards the full catalog every round.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from formula1_dataengineering_spark.plans import ORACLE_SQL, QUERIES

#: Queries substantially rewritten THIS round: their existing green
#: driver row hashed the pre-rewrite plan, so they jump the staleness
#: queue (per round-4 advice). Keep this list current — add any query
#: whose Spark plan or oracle changed since its last green row.
_PRIORITY: list[str] = [
    # round 16 — gates whose plans or oracles changed this round, so
    # their old green rows hashed pre-change behavior:
    # - the four LSH pair-generator gates: the hot-bucket guard
    #   (operators/dedup.exact_dup_stars — VERDICT r15 item 5) moved
    #   the band self-join onto exact-duplicate representatives and
    #   added star pairs; identical values at dup-free sf0.01, but
    #   the plan AND the oracle text both changed.
    # - minhash_lsh_fast_dup_recall: output restated as the star set
    #   (same rows at 1x, oracle rewritten).
    # - scd2_feed_deletion_drift: erosion boundary standardized to >=
    #   (ADVICE r15) — operator and oracle moved together.
    # - layout_maintenance_umbrella / layout_vacuum_sweep: the
    #   umbrella now resumes pending COW swaps before the marker
    #   check and vacuum's table anchor tightened to Spark-written
    #   dirs (ADVICE r15) — same values, changed verbs.
    # The round-16 never-green gates (lsh_hot_bucket_guard + later
    # additions) sort ahead automatically; the ~35 remaining slots
    # drain the r11-stale queue (VERDICT r15 item 1: freshness floor
    # moves from r11 toward r12).
    # - the deletion/retraction/erasure family: their COW commits
    #   moved from in-place swaps to the versioned snapshot protocol
    #   (operators/snapshot.py) — identical values, changed execution
    #   path and changed on-disk shape.
    "minhash_lsh_docs",
    "ngram_jaccard_docs",
    "fuzzy_neardup_pairs",
    "corpus_selection",
    "minhash_lsh_fast_dup_recall",
    "scd2_feed_deletion_drift",
    "layout_maintenance_umbrella",
    "layout_vacuum_sweep",
    "scd2_erasure_end_to_end",
    "dedup_index_retraction",
    "ann_index_retraction",
    "scd2_feed_key_deletion",
    "scd2_history_key_deletion",
    "scd2_history_retention",
]


def _latest_green_round() -> dict[str, int]:
    """name → newest round with a hash-green driver CORRECTNESS row."""
    base = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(base, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if isinstance(row, dict) and row.get("hash_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _ordered(mapping):
    latest = _latest_green_round()
    prio = [k for k in _PRIORITY if k in mapping]
    in_prio = set(prio)
    # never-green sorts first (latest defaults to 0 < any round), then
    # ascending by the round of the newest green row; name breaks ties
    # so the order is deterministic.
    rest = sorted(
        (k for k in mapping if k not in in_prio),
        key=lambda k: (latest.get(k, 0), k),
    )
    return {k: mapping[k] for k in [*prio, *rest]}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's qualifying-classification lifecycle
    (bucket → clean → best-per-driver-per-Q → Q3⊕Q2⊕Q1 grid) end to
    end through the f1 operator stack."""
    return QUERIES["qualifying_grid_events"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(ORACLE_SQL)
