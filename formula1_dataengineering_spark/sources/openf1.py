"""OpenF1-style ingestion: REST JSON → schema-bound DataFrames → Parquet.

The reference interleaves HTTP with analytics — ~60 sequential GETs per
session with an inline 429-retry loop (reference:
src/helper_functions.py:7-31 and duplicated variants at
src/data_processing.py:64-76, :127-139, :297-307). In the new engine
ingestion is a separate batch job (SURVEY §2.1 S11 row): fetch JSON
payloads (driver-side, with bounded retry), parallelize into a
DataFrame under the declared schema, write Parquet partitioned for the
query layer.

No network calls happen in this environment — the transport is
injectable (``fetcher``), tested with fakes; the retry policy is pure
logic.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..f1.schemas import F1_SCHEMAS

#: endpoint name → (path template, target table)
ENDPOINTS = {
    "drivers": "/v1/drivers",
    "laps": "/v1/laps",
    "stints": "/v1/stints",
    "sessions": "/v1/sessions",
    "meetings": "/v1/meetings",
    "car_data": "/v1/car_data",
    "location": "/v1/location",
    "pit": "/v1/pit",
}


class TransientError(Exception):
    """Retryable transport condition (the reference's HTTP 429 path)."""


def fetch_with_retry(
    fetcher: Callable[[str, dict], bytes],
    url: str,
    params: dict,
    max_retries: int = 5,
    backoff_s: float = 5.0,
    sleeper: Callable[[float], None] = time.sleep,
) -> bytes:
    """Bounded-retry fetch (S11). The reference retries 429s forever
    with a fixed 5 s sleep (hf:11-12); unbounded retry in a distributed
    ingestion job is a hang, so this caps attempts and raises."""
    last: Exception | None = None
    for _ in range(max_retries):
        try:
            body = fetcher(url, params)
            if not body or body == b"[]":
                raise ValueError(f"empty payload from {url} {params}")
            return body
        except TransientError as e:
            last = e
            sleeper(backoff_s)
    raise TimeoutError(f"gave up after {max_retries} retries: {url}") from last


def ingest_json_records(
    spark: SparkSession,
    table: str,
    payloads: Sequence[bytes],
) -> DataFrame:
    """JSON array payloads → one DataFrame under the declared schema.

    Unknown fields are dropped, missing fields become nulls — the
    schema is the contract, not the API response shape (the reference's
    schema drift check at dp:45-47 becomes a non-event).
    """
    schema = F1_SCHEMAS[table]
    names = [f.name for f in schema.fields]
    rows = []
    for body in payloads:
        for rec in json.loads(body.decode("utf-8")):
            rows.append(tuple(rec.get(n) for n in names))
    return spark.createDataFrame(rows, schema=schema)


def write_partitioned(df: DataFrame, table: str, out_dir: str) -> None:
    """Query-layer layout: facts partitioned by session_key (at 100 TB:
    by (year, session_key)), dims plain. Bucketing by driver_number
    would additionally co-locate the per-driver joins (SURVEY §4.3)."""
    writer = df.write.mode("overwrite")
    if "session_key" in df.columns and table in ("laps", "car_data", "location", "stints", "pit"):
        writer = writer.partitionBy("session_key")
    writer.parquet(f"{out_dir}/{table}.parquet")
