"""Interleaved A/B timing for candidate optimizations.

Usage: python scripts/ab_bench.py REPS name [name ...]

Runs each named catalog query REPS times (bench methodology: one
cache_scope per rep-pair, noop sink) in ONE session, interleaved so
box drift hits variants equally when you flip code between runs via
env var dispatch inside the operators under test. Reports min/median.

This harness measures the CURRENT code; to A/B two implementations,
run it once per variant (same session order), or use the env-flag
pattern: the operator reads SPARK_GRAFT_VARIANT at call time.
"""

from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from formula1_dataengineering_spark.caching import cache_scope
from formula1_dataengineering_spark.plans import QUERIES
from formula1_dataengineering_spark.session import get_spark


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="f1spark-ab")
    QUERIES["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    QUERIES["doc_fingerprint"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    results: dict[str, list[float]] = {n: [] for n in names}
    for r in range(reps):
        for name in names:
            with cache_scope():
                runs = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    QUERIES[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    runs.append(time.perf_counter() - t0)
            results[name].append(min(runs))
            spark.catalog.clearCache()
            gc.collect()
    for name in names:
        xs = results[name]
        print(
            f"{name:40s} min {min(xs):7.3f}  med {statistics.median(xs):7.3f}"
            f"  all {[round(x, 3) for x in xs]}"
        )


if __name__ == "__main__":
    main()
