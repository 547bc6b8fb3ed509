#!/usr/bin/env python
"""Benchmark runner: every catalog query at $SPARK_GRAFT_SF_DIR
(default sf0.1), one JSON line to stdout.

Each query is forced end-to-end with the ``noop`` sink so Catalyst
cannot prune work the way ``count()`` would allow. Per query we run
twice and report the best: the first execution of a heavy expression
tree pays one-time whole-stage-codegen (janino) compilation measured
at 1.5-3 s for the regex-heavy queries — best-of-2 reports the
steady-state cost a production job sees.

``--cold`` reports the other honest number: one run per query with a
fresh cache scope, so operators that cache internal intermediates pay
their one-time materialization inside the measured run (artifact:
bench_per_query_cold.json beside the warm bench_per_query.json).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from formula1_dataengineering_spark.caching import cache_scope
from formula1_dataengineering_spark.plans import QUERIES
from formula1_dataengineering_spark.session import get_spark


def main() -> None:
    # --cold: single run per query, internal caches built inside the
    # measured run (fresh scope per run) — the machine-readable cold
    # counterpart to the default warm best-of-2 (VERDICT r9 item 4:
    # the warm/cold delta was prose-only). Artifact goes to
    # bench_per_query_cold.json; stdout contract is unchanged.
    cold = "--cold" in sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="f1spark-bench")

    timings: dict[str, float] = {}
    # Warm the JVM + parquet footers AND the Python worker pool once so
    # per-query numbers measure the query, not session/worker startup
    # (the first pandas-UDF stage otherwise pays worker spawn).
    QUERIES["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    QUERIES["doc_fingerprint"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # The Python DATA SOURCE runner is a separate worker entry point
    # with its own spin-up (~3-4 s measured at r11); initialize it with
    # an 8-row read so python_datasource_scan's cold number measures
    # the query, not one-per-session machinery — the same principle as
    # the pandas-UDF warmup above (VERDICT r10 item 5).
    from formula1_dataengineering_spark.sources.pydatasource import (
        SyntheticEventsDataSource,
    )

    spark.dataSource.register(SyntheticEventsDataSource)
    spark.read.format("synthetic_events").option("n_rows", 8).option(
        "n_partitions", 1
    ).load().write.format("noop").mode("overwrite").save()

    # Box-state calibration (VERDICT r11 item 8): a FIXED 5-query
    # subset, run at a fixed point in the session lifecycle (right
    # after warmup), same queries and order every round, best-of-2
    # in BOTH modes (it measures the box, not cache policy). The
    # round-over-round catalog comparison divides by this control to
    # separate shared-box drift from catalog drift — the five span
    # the cost spectrum (scan-agg, window shuffle, pandas-UDF LSH,
    # GEMM mapInPandas, iterative joins).
    #
    # Round 17 (VERDICT r16 items 5-6, calibration decontamination):
    # the control now runs plans/calibration.py — FROZEN snapshots of
    # the minhash-LSH and pagerank entries at their round-16 code
    # (the same code r16's calibration timed, so r16→r17 stays
    # comparable) plus the three genuinely untouched live queries.
    # Optimization rounds may move operators/dedup.py or graph.py
    # freely without the drift control absorbing the change. Timing
    # methodology (order, best-of-2, scopes) is byte-identical.
    from formula1_dataengineering_spark.plans.calibration import (
        calibration_queries,
    )

    calibration: dict[str, float] = {}
    for name, cal_fn in calibration_queries().items():
        with cache_scope():
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                cal_fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
        calibration[name] = round(min(runs), 3)
        spark.catalog.clearCache()
        gc.collect()

    total = 0.0
    for name, fn in QUERIES.items():
        runs: list[float] = []
        # One cache_scope per QUERY, spanning both runs: run 2 reuses
        # run 1's internal caches (best-of-2 stays the documented WARM
        # steady-state number), and scope exit releases them through
        # the caching.py contract. --cold instead scopes each single
        # run individually, so every cached intermediate is built
        # inside the measured run — the one-time materialization cost
        # the warm number amortizes away (VERDICT r9 item 3).
        with cache_scope():
            for _ in range(1 if cold else 2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            best = min(runs)
            # One extra run when the first two disagree badly: GC
            # pauses and Python-worker respawns inject multi-second
            # spikes on this shared box, and a spiked "best"
            # misreports the steady state. (Warm mode only: cold is
            # single-run by definition.)
            if not cold and best >= 0.8 and max(runs) / best > 1.6:
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        total += best
        # Backstop slate-cleaner for session-scoped managed caches
        # (f1 facade memos register scope="session", released by
        # release_caches/owner, not by query scopes) + ContextCleaner
        # nudge for
        # orphaned localCheckpoint RDDs, so each query is measured
        # from a clean executor-memory state instead of under 180
        # runs of accumulated cache+GC pressure.
        spark.catalog.clearCache()
        gc.collect()

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    payload = {
        "metric": "catalog_total_runtime",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "calibration": {
            "total_s": round(sum(calibration.values()), 3),
            "queries": calibration,
        },
    }
    if cold:
        # Marked only in cold mode so the default stdout contract the
        # driver tail-parses is byte-identical to prior rounds.
        payload["mode"] = "cold_single_run"
    # Durable per-query artifact: the driver's stdout capture keeps only
    # a bounded tail, which truncates the full per-query line below to
    # ~63 entries (VERDICT r7 item 5) — round-over-round per-query
    # diffs need the complete map, so persist it beside the repo.
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "bench_per_query_cold.json" if cold else "bench_per_query.json",
            ),
            "w",
        ) as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only checkout: stdout line still carries the data
    print(json.dumps(payload))
    # Compact summary printed LAST: the full per-query line above is
    # ~5 KiB and the driver's stdout capture keeps only a bounded tail,
    # so rounds 1-4 recorded "parsed": null. A short final line always
    # survives a tail capture and parses.
    import statistics

    median = statistics.median(timings.values()) if timings else 0.0
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "n_queries": len(timings),
                "median_s": round(median, 3),
                "calibration_s": round(sum(calibration.values()), 3),
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
