"""Driver-style correctness drive: every queries() entry vs its DuckDB
oracle at sf0.01, on a PLAIN SparkSession (mirrors the external driver;
see .claude/skills/verify/SKILL.md).

Usage: python scripts/verify_drive.py [sf_dir] [name_filter ...]
"""
import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
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

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = E.queries()
    oracles = E.oracle_sql()
    names = [n for n in queries if not ONLY or n in ONLY]

    n_pass = n_fail = n_noracle = 0
    t_all = time.time()
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
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
