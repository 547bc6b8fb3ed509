"""Driver-style correctness drive: every queries() entry vs its DuckDB
oracle at sf0.01, on a PLAIN SparkSession (mirrors the external
driver contract of __spark_entry__.py).

Usage: python scripts/verify_drive.py [--changed-only] [sf_dir] [name ...]

``--changed-only`` (round-5 verdict item 7 — keeps iteration time
bounded as the catalog grows): drive only the queries whose coverage
is actually in question this round — the ``_PRIORITY`` rewrites, any
query with no green driver row yet, and every query whose plan source
(its function body in queries.py, or its ORACLE_SQL entry) changed
since the last driver round-close commit. Edits OUTSIDE queries.py /
oracles.py (operators, sources, streaming) are reported as a warning:
their blast radius needs the full drive, which remains the round-close
gate.
"""
import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession

ARGS = sys.argv[1:]
CHANGED_ONLY = "--changed-only" in ARGS
if CHANGED_ONLY:
    ARGS.remove("--changed-only")
SF_DIR = ARGS[0] if ARGS else "/root/testdata/sf0.01"
ONLY = set(ARGS[1:])
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    return v


def frame_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return [cols[i] for i in order], out


def _changed_query_names(E, queries, oracles) -> set[str]:
    """Names needing re-verification: _PRIORITY, never-driver-green,
    and queries whose function body or oracle SQL changed since the
    last driver round-close commit (message 'round N: verdict...')."""
    import inspect
    import re
    import subprocess

    repo = "/root/repo"
    names: set[str] = set(getattr(E, "_PRIORITY", ()))
    latest = E._latest_green_round()
    names |= {n for n in queries if latest.get(n, 0) == 0}

    out = subprocess.run(
        ["git", "log", "--format=%H %s", "-200"],
        cwd=repo, capture_output=True, text=True,
    ).stdout
    base = None
    for line in out.splitlines():
        sha, _, msg = line.partition(" ")
        if re.match(r"round \d+: verdict", msg):
            base = sha
            break
    if base is None:
        print("changed-only: no round-close commit found; driving all")
        return set(queries)

    # Diff base against the WORKTREE (no ..HEAD): uncommitted edits to
    # queries.py/oracles.py must be driven too, and worktree hunk line
    # numbers live in the same coordinate system as inspect's
    # getsourcelines (round-6 advice: `{base}..HEAD` made in-flight
    # edits invisible and drifted line numbers on a dirty tree).
    diff = subprocess.run(
        ["git", "diff", "--unified=0", base, "--", "*.py"],
        cwd=repo, capture_output=True, text=True,
    ).stdout
    changed: dict[str, list[tuple[int, int]]] = {}
    cur_file = None
    for line in diff.splitlines():
        if line.startswith("+++ b/"):
            cur_file = line[6:]
        elif line.startswith("@@") and cur_file:
            m = re.search(r"\+(\d+)(?:,(\d+))?", line)
            if m:
                start = int(m.group(1))
                n = int(m.group(2)) if m.group(2) else 1
                changed.setdefault(cur_file, []).append(
                    (start, start + max(n, 1) - 1)
                )

    def overlaps(path, lo, hi):
        return any(
            not (b < lo or a > hi) for a, b in changed.get(path, ())
        )

    qpath = "formula1_dataengineering_spark/plans/queries.py"
    for name, fn in queries.items():
        try:
            real = inspect.unwrap(fn)
            lines, start = inspect.getsourcelines(real)
        except (TypeError, OSError):
            names.add(name)
            continue
        if overlaps(qpath, start, start + len(lines) - 1):
            names.add(name)

    opath = "formula1_dataengineering_spark/plans/oracles.py"
    if opath in changed:
        src = open(f"{repo}/{opath}").read().splitlines()
        spans, cur_name, cur_start = [], None, None
        first_span_line = None
        for i, line in enumerate(src, 1):
            m = re.match(r'ORACLE_SQL\["([\w]+)"\]', line)
            if m:
                if first_span_line is None:
                    first_span_line = i
                if cur_name:
                    spans.append((cur_name, cur_start, i - 1))
                cur_name, cur_start = m.group(1), i
        if cur_name:
            spans.append((cur_name, cur_start, len(src)))
        # Shared-fragment hazard (round-6 advice): module-level
        # fragments (_TOKS, _COS, _SIG_EXPRS, ...) feed many oracles
        # via f-strings and are interleaved between spans, so a hunk
        # BEFORE the first ORACLE_SQL span, or one overlapping any
        # `_name = ...` / `def _name` top-level statement's full
        # extent (def line through the last continuation line before
        # the next column-0 statement), has untracked blast radius —
        # drive every oracle-bearing query rather than mis-attribute
        # it to one neighbor span.
        frag_spans = []
        frag_start = None
        for i, line in enumerate(src, 1):
            if line and not line[0].isspace():
                if frag_start is not None:
                    frag_spans.append((frag_start, i - 1))
                    frag_start = None
                if re.match(r"(_\w+\s*=|def _)", line):
                    frag_start = i
        if frag_start is not None:
            frag_spans.append((frag_start, len(src)))

        def is_fragment_hunk(lo, hi):
            if first_span_line is not None and lo < first_span_line:
                return True
            return any(not (b < lo or a > hi) for a, b in frag_spans)

        if any(is_fragment_hunk(lo, hi) for lo, hi in changed[opath]):
            print(
                "changed-only WARNING: oracles.py shared fragment "
                "changed — consumers are untracked; driving ALL "
                "oracle-bearing queries."
            )
            names |= set(oracles)
        else:
            for n, lo, hi in spans:
                if overlaps(opath, lo, hi):
                    names.add(n)

    other = sorted(
        f for f in changed
        if f not in (qpath, opath)
        and f.startswith("formula1_dataengineering_spark/")
    )
    if other:
        print(
            "changed-only WARNING: shared modules changed "
            f"({', '.join(other)}) — their blast radius is not tracked; "
            "run the full drive before round close."
        )
    return names & set(queries)


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    from formula1_dataengineering_spark.caching import cache_scope

    con = duckdb.connect()
    import os

    for t in TABLES:
        # testdata ships single files; Spark-built replica dirs (the
        # 10x correctness drives) are DIRECTORIES of part files.
        p = f"{SF_DIR}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )

    queries = E.queries()
    oracles = E.oracle_sql()
    names = [n for n in queries if not ONLY or n in ONLY]
    if CHANGED_ONLY:
        keep = _changed_query_names(E, queries, oracles)
        names = [n for n in names if n in keep]
        print(f"changed-only: driving {len(names)} of {len(queries)}")

    n_pass = n_fail = n_noracle = 0
    t_all = time.time()
    for name in names:
        t0 = time.time()
        try:
            # cache_scope is the API contract for operator-internal
            # caches (caching.py): build+collect one query inside a
            # scope and its cached intermediates (postings, shingles,
            # edge lists) release on exit — a 190-query drive on one
            # session stays cache-clean by contract, not by the
            # clearCache workaround VERDICT r9 flagged.
            with cache_scope():
                sdf = queries[name](spark, SF_DIR)
                scols = list(sdf.columns)
                srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        finally:
            # Backstop for scope="session" managed caches (the f1
            # facade memoizes per instance by design; those release
            # via release_caches/owner, not query scopes).
            spark.catalog.clearCache()
        sql = oracles.get(name)
        if sql is None:
            print(f"noor {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_noracle += 1
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            # Driver-faithful typing probe: the external driver compares
            # Arrow-typed results, so a DuckDB HUGEINT/DECIMAL output
            # column hash-mismatches Spark int64/float64 even when the
            # fetchall values above are equal (VERDICT r3 item 1).
            import pyarrow as pa

            oschema = con.execute(f"SELECT * FROM ({sql}) LIMIT 0").arrow().schema
            dec = [(f.name, str(f.type)) for f in oschema if pa.types.is_decimal(f.type)]
            if dec:
                print(f"FAIL {name}: oracle Arrow schema has decimal cols {dec}")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sc, sr = frame_rows(scols, srows)
        oc, orr = frame_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: schema {sc} vs {oc}")
            n_fail += 1
        elif len(sr) != len(orr):
            print(f"FAIL {name}: rows {len(sr)} vs {len(orr)}")
            n_fail += 1
        elif sr != orr:
            bad = next(i for i in range(len(sr)) if sr[i] != orr[i])
            print(f"FAIL {name}: values differ at sorted row {bad}:")
            print(f"  spark : {sr[bad]}")
            print(f"  oracle: {orr[bad]}")
            n_fail += 1
        else:
            print(f"ok   {name}: {len(sr)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(
        f"== {n_pass} pass, {n_fail} fail, {n_noracle} no-oracle "
        f"of {len(names)} in {time.time()-t_all:.0f}s =="
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
