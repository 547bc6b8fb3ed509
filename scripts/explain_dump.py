"""Dump ``explain("formatted")`` for named catalog queries to files.

Usage: python scripts/explain_dump.py OUTDIR SUFFIX [name ...]

Writes ``OUTDIR/<name>_<SUFFIX>.txt`` for each named query (all
queries when none are named). Building a lifecycle gate's frame runs
its side-effect jobs (index writes/refreshes) exactly like the bench
does; the captured plan is the final returned frame's plan.

Streaming gates execute a complete stream run during frame
construction; their returned frame is the batch readback, which is
still the plan the bench's noop sink executes, so capturing it is
honest — the streaming work itself is not visible in the plan and is
profiled separately.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from formula1_dataengineering_spark.caching import cache_scope
from formula1_dataengineering_spark.plans import QUERIES
from formula1_dataengineering_spark.session import get_spark


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or list(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="f1spark-explain")
    for name in names:
        if name not in QUERIES:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        try:
            with cache_scope():
                df = QUERIES[name](spark, sf_dir)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain(mode="formatted")
        except Exception as exc:  # noqa: BLE001 — record, keep going
            print(f"ERR {name}: {exc}", file=sys.stderr)
            continue
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt")


if __name__ == "__main__":
    main()
