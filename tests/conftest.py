from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from formula1_dataengineering_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Core count deliberately left to $SPARK_GRAFT_CPUS (default 32):
    # an r17 A/B pinned local[8] after two modules measured ~15%
    # faster at 8 cores, but the FULL suite came out a wash
    # (32c 19:10 vs 8c 19:57, within box noise) — per-test Spark job
    # latency, not task scheduling, is the floor. Recorded so the
    # experiment isn't re-run every round.
    s = get_spark(app_name="f1spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_CORRECTNESS
