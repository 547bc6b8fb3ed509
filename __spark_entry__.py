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
    # round 15 — gates whose VERBS or plans changed this round, so
    # their old green rows hashed pre-change behavior:
    # - stream_dedup_ingest_probe: full redesign (replica-robust
    #   id-salted streamed docs + self-probe — VERDICT r14 item 3);
    #   new oracle, new columns.
    # - layout_vacuum_sweep: vacuum gained two sweep classes
    #   (.spark-staging residue, anchored orphan match) and the gate
    #   now plants a decoy + residue and hashes two new columns.
    # - the three deletion/retraction gates + scd2_history_retention:
    #   their verbs moved from in-place dynamic overwrite to the
    #   staged _COW_MANIFEST swap (ADVICE r14, medium) — identical
    #   values, changed execution path.
    # - the three maintenance-policy gates: the family verbs gained
    #   deletion-drift / sampled-referee arms (defaults off — same
    #   values, changed conditional structure).
    # The five round-15 never-green gates (scd2_history_key_deletion,
    # dedup_maintenance_deletion_drift, scd2_feed_deletion_drift,
    # ann_sampled_recall_referee, layout_maintenance_umbrella) sort
    # ahead automatically; the ~36 remaining slots drain the stale
    # queue — all 29 r10 rows (VERDICT r14 item 4: freshness floor
    # moves to r11), then the oldest r11 block.
    "stream_dedup_ingest_probe",
    "layout_vacuum_sweep",
    "dedup_index_retraction",
    "ann_index_retraction",
    "scd2_feed_key_deletion",
    "scd2_history_retention",
    "ann_maintenance_policy",
    "dedup_index_maintenance",
    "scd2_feed_maintenance",
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
