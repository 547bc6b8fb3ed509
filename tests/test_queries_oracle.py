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
