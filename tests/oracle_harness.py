"""Local mirror of the driver's oracle comparison (BASELINE.md t2).

Runs a Spark query and its DuckDB oracle SQL over the same parquet
tables, canonicalizes both results (columns sorted by name, rows sorted
by all columns), and diffs values. Catches name/type/value mismatches
before the driver does.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from formula1_dataengineering_spark.sources.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con.execute(sql).fetchdf()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    out = out.sort_values(by=list(out.columns), ignore_index=True, na_position="last")
    return out


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, float_tol: float = 0.0) -> None:
    got = canonicalize(spark_df.toPandas())
    want = canonicalize(run_oracle(sql, sf_dir))
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        for i, (a, b) in enumerate(zip(g, w)):
            if _is_nan(a) and _is_nan(b):
                continue
            if isinstance(a, float) and isinstance(b, float):
                ok = a == b or abs(a - b) <= float_tol
            else:
                ok = a == b
            assert ok, f"value mismatch col={col} row={i}: spark={a!r} oracle={b!r}"


def _is_nan(x) -> bool:
    if x is None:
        return True
    try:
        return isinstance(x, float) and math.isnan(x)
    except TypeError:
        return False
