"""Every query in the catalog hash-matches its DuckDB oracle (t2 gate,
run locally at sf0.001 for speed; the driver re-runs at sf0.01)."""

from __future__ import annotations

import pytest

from formula1_dataengineering_spark.plans import ORACLE_SQL, QUERIES

from .oracle_harness import assert_matches_oracle


def test_every_query_has_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLE_SQL)
    # Non-SQL-expressible ops may omit an oracle, but must be explicit.
    from formula1_dataengineering_spark.plans.queries import NO_ORACLE

    assert missing == set(NO_ORACLE), f"queries lacking oracle SQL: {missing}"
    dangling = set(ORACLE_SQL) - set(QUERIES)
    assert not dangling, f"oracles without queries: {dangling}"


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ORACLE_SQL[name], sf_dir)


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_arrow_schema_is_portable(sf_dir, name):
    """No oracle output column may surface as a DuckDB-only Arrow type.

    Regression for VERDICT r3 item 1: DuckDB's HUGEINT arithmetic (e.g.
    ``md5_number(...) % 2^48``) and bare DECIMAL literals (``1.0``)
    reach the driver's Arrow-based comparator as ``decimal128``, which
    hash-mismatches Spark's ``int64``/``float64`` even when every value
    is equal. Every oracle must CAST such expressions (BIGINT/DOUBLE)
    so its Arrow schema contains only portable primitive types.
    """
    import os

    import duckdb
    import pyarrow as pa

    from formula1_dataengineering_spark.sources.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    schema = con.execute(ORACLE_SQL[name]).arrow().schema
    bad = [
        (f.name, f.type)
        for f in schema
        if pa.types.is_decimal(f.type)
    ]
    assert not bad, (
        f"oracle {name!r} emits non-portable Arrow column(s) {bad}; "
        "CAST the expression to BIGINT/DOUBLE in the oracle SQL"
    )
