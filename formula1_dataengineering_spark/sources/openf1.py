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
import socket
import time
from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

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


def http_fetcher(url: str, params: dict, timeout_s: float = 30.0) -> bytes:
    """stdlib urllib transport: GET ``url?params``; HTTP 429 becomes
    :class:`TransientError` (the reference's retry trigger, hf:11-12),
    every other HTTP error propagates. A connect/read ``timeout_s``
    bounds stalled connections — without it one hung socket defeats
    the bounded-retry design and hangs the whole ingest pool
    (code-review finding)."""
    from urllib import error, parse, request

    full = url + ("?" + parse.urlencode(params) if params else "")
    try:
        with request.urlopen(full, timeout=timeout_s) as resp:  # noqa: S310
            return resp.read()
    except error.HTTPError as e:
        if e.code == 429:
            raise TransientError("429") from e
        raise
    except TimeoutError as e:
        raise TransientError(f"timeout after {timeout_s}s") from e
    except error.URLError as e:
        # A connect-phase timeout is wrapped by urllib into
        # URLError(reason=timeout) rather than raised bare; without
        # this arm connect stalls would never be retried.
        if isinstance(e.reason, (TimeoutError, socket.timeout)):
            raise TransientError(f"connect timeout after {timeout_s}s") from e
        raise


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
    is_ts = [isinstance(f.dataType, T.TimestampType) for f in schema.fields]
    rows = []
    for body in payloads:
        for rec in json.loads(body.decode("utf-8")):
            rows.append(
                tuple(
                    _parse_ts(rec.get(n)) if ts else rec.get(n)
                    for n, ts in zip(names, is_ts)
                )
            )
    return spark.createDataFrame(rows, schema=schema)


def _parse_ts(v: object) -> datetime | None:
    """ISO8601 string → datetime (F5 at the ingestion edge — the API
    emits e.g. ``2023-09-16T13:00:00+00:00``); passthrough otherwise."""
    if isinstance(v, str):
        return datetime.fromisoformat(v.replace("Z", "+00:00"))
    return v  # already datetime or None


#: Endpoints fetched once per session vs once per (session, driver) —
#: the reference's ~60-request pattern (laps/stints per driver in
#: get_session_laps_data, so:135-154; car_data/location per driver lap
#: in telemetry, so:176-218; here one bulk request per driver).
SESSION_SCOPED = ("sessions", "drivers", "pit")
DRIVER_SCOPED = ("laps", "stints", "car_data", "location")


def ingest_session(
    spark: SparkSession,
    session_key: int,
    out_dir: str,
    fetcher: Callable[[str, dict], bytes],
    base_url: str = "",
    max_workers: int = 8,
    max_retries: int = 5,
    backoff_s: float = 5.0,
    sleeper: Callable[[float], None] = time.sleep,
) -> dict[str, int]:
    """Assembled ingestion driver (round-2 VERDICT item 5): fetch every
    entity table for one session, decode under the declared schemas,
    write the partitioned query-layer layout. Returns per-table row
    counts.

    The reference interleaves ~60 SEQUENTIAL per-driver GETs with
    analytics (so:105-154's nested loops, each with its own inline
    429 loop); here the per-(driver, endpoint) fetches run CONCURRENTLY
    on a bounded driver-side pool — ingestion is I/O-bound, and the
    payload volume for one session is MBs, far below driver memory, so
    a driver-side gather (then ``createDataFrame`` → partitioned
    parquet) is the right shape; the 100 TB path is many sessions
    ingested as independent jobs, not one giant session.

    Failure policy: ``sessions`` must be non-empty (unknown session =
    operator error, reference raises too); every other fetch tolerates
    an empty payload — a driver with no pit stops or a session with no
    telemetry is data, not an error (the reference logs a warning for
    incomplete stints, so:152-154). 429s retry with bounded backoff via
    :func:`fetch_with_retry`.
    """

    def grab(table: str, params: dict, required: bool = False) -> list[bytes]:
        url = base_url + ENDPOINTS[table]
        try:
            return [
                fetch_with_retry(
                    fetcher, url, params,
                    max_retries=max_retries, backoff_s=backoff_s,
                    sleeper=sleeper,
                )
            ]
        except ValueError:
            if required:
                raise
            return []

    session_payloads = grab(
        "sessions", {"session_key": session_key}, required=True
    )
    payloads: dict[str, list[bytes]] = {"sessions": session_payloads}

    meeting_keys = {
        rec.get("meeting_key")
        for body in session_payloads
        for rec in json.loads(body.decode("utf-8"))
        if rec.get("meeting_key") is not None
    }
    driver_payloads = grab("drivers", {"session_key": session_key})
    payloads["drivers"] = driver_payloads
    payloads["pit"] = grab("pit", {"session_key": session_key})
    driver_numbers = sorted(
        {
            rec["driver_number"]
            for body in driver_payloads
            for rec in json.loads(body.decode("utf-8"))
            if rec.get("driver_number") is not None
        }
    )

    jobs = [
        (table, {"session_key": session_key, "driver_number": d})
        for table in DRIVER_SCOPED
        for d in driver_numbers
    ] + [("meetings", {"meeting_key": mk}) for mk in sorted(meeting_keys)]
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        results = list(pool.map(lambda j: (j[0], grab(*j)), jobs))
    for table, got in results:
        payloads.setdefault(table, []).extend(got)

    counts: dict[str, int] = {}
    for table in ENDPOINTS:
        df = ingest_json_records(spark, table, payloads.get(table, []))
        write_partitioned(df, table, out_dir)
        counts[table] = df.count()
    return counts


def write_partitioned(df: DataFrame, table: str, out_dir: str) -> None:
    """Query-layer layout: facts partitioned by session_key (at 100 TB:
    by (year, session_key)), dims plain. Bucketing by driver_number
    would additionally co-locate the per-driver joins (SURVEY §4.3)."""
    writer = df.write.mode("overwrite")
    if (
        "session_key" in df.columns
        and table in ("laps", "car_data", "location", "stints", "pit")
        # A partitioned write of 0 rows emits no files at all, leaving
        # an unreadable (schema-less) table; empty tables go flat so
        # the parquet footer preserves the declared schema.
        and not df.isEmpty()
    ):
        writer = writer.partitionBy("session_key")
    writer.parquet(f"{out_dir}/{table}.parquet")
