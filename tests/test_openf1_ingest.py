"""Ingestion layer: retry policy, schema-bound JSON decode, partitioned
write → readable by the query layer."""

from __future__ import annotations

import json

import pytest

from formula1_dataengineering_spark.sources.openf1 import (
    TransientError,
    fetch_with_retry,
    http_fetcher,
    ingest_json_records,
    ingest_session,
    write_partitioned,
)


def test_retry_then_success():
    calls = {"n": 0}
    sleeps = []

    def flaky(url, params):
        calls["n"] += 1
        if calls["n"] < 3:
            raise TransientError("429")
        return b'[{"x": 1}]'

    out = fetch_with_retry(flaky, "http://api/v1/laps", {}, sleeper=sleeps.append)
    assert out == b'[{"x": 1}]'
    assert calls["n"] == 3 and sleeps == [5.0, 5.0]


def test_retry_gives_up():
    def always_429(url, params):
        raise TransientError("429")

    with pytest.raises(TimeoutError, match="gave up"):
        fetch_with_retry(always_429, "u", {}, max_retries=2, sleeper=lambda s: None)


def test_empty_payload_raises():
    with pytest.raises(ValueError, match="empty payload"):
        fetch_with_retry(lambda u, p: b"[]", "u", {}, sleeper=lambda s: None)


def test_ingest_schema_contract(spark):
    payload = json.dumps(
        [
            # extra field dropped; missing fields → null
            {"session_key": 9001, "driver_number": 1, "name_acronym": "VER",
             "team_colour": "123456", "bogus_field": "ignored"},
            {"session_key": 9001, "driver_number": 2},
        ]
    ).encode()
    df = ingest_json_records(spark, "drivers", [payload])
    rows = {r["driver_number"]: r for r in df.collect()}
    assert rows[1]["name_acronym"] == "VER"
    assert rows[2]["name_acronym"] is None
    assert "bogus_field" not in df.columns


def test_partitioned_roundtrip(spark, tmp_path):
    payload = json.dumps(
        [
            {"session_key": 9001, "driver_number": 1, "lap_number": 1,
             "duration_sector_1": 30.0, "duration_sector_2": 30.0,
             "duration_sector_3": 32.5, "is_pit_out_lap": False},
            {"session_key": 9002, "driver_number": 1, "lap_number": 1,
             "duration_sector_1": 31.0, "duration_sector_2": 29.0,
             "duration_sector_3": 30.0, "is_pit_out_lap": True},
        ]
    ).encode()
    df = ingest_json_records(spark, "laps", [payload])
    write_partitioned(df, "laps", str(tmp_path))
    back = spark.read.parquet(str(tmp_path / "laps.parquet"))
    assert back.count() == 2
    # partition pruning works on the layout
    pruned = back.where(back.session_key == 9001)
    assert pruned.count() == 1
    assert "session_key=9001" in str(
        (tmp_path / "laps.parquet").iterdir().__next__().name
    ) or any("session_key=" in p.name for p in (tmp_path / "laps.parquet").iterdir())


def test_partition_pruning_visible_in_plan(spark, tmp_path):
    """The session_key filter must prune PARTITIONS (directory level),
    not just rows — the 100 TB telemetry-layout contract."""
    payload = json.dumps(
        [
            {"session_key": k, "driver_number": d, "lap_number": 1,
             "duration_sector_1": 30.0, "duration_sector_2": 30.0,
             "duration_sector_3": 32.5, "is_pit_out_lap": False}
            for k in (9001, 9002, 9003)
            for d in (1, 2)
        ]
    ).encode()
    write_partitioned(ingest_json_records(spark, "laps", [payload]), "laps", str(tmp_path))
    pruned = spark.read.parquet(str(tmp_path / "laps.parquet")).where(
        "session_key = 9002"
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "session_key" in plan.split("PartitionFilters", 1)[1][:120]
    assert pruned.count() == 2


# ---------------------------------------------------------------------------
# Assembled ingestion driver against a stub HTTP server (VERDICT r2 #5)
# ---------------------------------------------------------------------------

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

SESSION = 9001
_CANNED = {
    "/v1/sessions": [
        {"session_key": SESSION, "meeting_key": 77, "session_name": "Race",
         "session_type": "Race", "circuit_short_name": "Spa",
         "date_start": "2023-07-30T13:00:00+00:00",
         "date_end": "2023-07-30T15:00:00+00:00"}
    ],
    "/v1/meetings": [
        {"meeting_key": 77, "meeting_official_name": "GP", "year": 2023}
    ],
    "/v1/drivers": [
        {"session_key": SESSION, "driver_number": 1, "name_acronym": "VER"},
        {"session_key": SESSION, "driver_number": 44, "name_acronym": "HAM"},
    ],
    "/v1/pit": [],  # no pit stops: empty payload must be tolerated
}


def _driver_rows(path, d):
    if path == "/v1/laps":
        return [
            {"session_key": SESSION, "driver_number": d, "lap_number": n,
             "date_start": f"2023-07-30T13:{n:02d}:00+00:00",
             "duration_sector_1": 30.0, "duration_sector_2": 30.0,
             "duration_sector_3": 30.0 + d / 10, "is_pit_out_lap": n == 1}
            for n in (1, 2)
        ]
    if path == "/v1/stints":
        return [{"session_key": SESSION, "driver_number": d,
                 "stint_number": 1, "lap_start": 1, "lap_end": 2,
                 "compound": "SOFT", "tyre_age_at_start": 0}]
    if path == "/v1/car_data":
        return [{"session_key": SESSION, "driver_number": d,
                 "date": "2023-07-30T13:00:01+00:00", "speed": 280.0,
                 "throttle": 99.0, "brake": 0.0, "n_gear": 8, "rpm": 11000}]
    return []  # location: empty


class _StubHandler(BaseHTTPRequestHandler):
    """Canned OpenF1 responses; the FIRST laps request for driver 1
    gets a 429 to prove the retry path end-to-end."""

    throttled = {"n": 0}

    def do_GET(self):
        u = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        if (
            u.path == "/v1/laps"
            and q.get("driver_number") == "1"
            and self.throttled["n"] == 0
        ):
            self.throttled["n"] += 1
            self.send_response(429)
            self.end_headers()
            return
        if "driver_number" in q:
            rows = _driver_rows(u.path, int(q["driver_number"]))
        else:
            rows = _CANNED.get(u.path, [])
        body = json.dumps(rows).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet test output
        pass


def test_ingest_session_end_to_end(spark, tmp_path):
    """Full driver: stub HTTP server → retry-on-429 → schema decode →
    partitioned layout, with empty payloads (pit, location) tolerated."""
    _StubHandler.throttled["n"] = 0
    srv = HTTPServer(("127.0.0.1", 0), _StubHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        sleeps = []
        counts = ingest_session(
            spark, SESSION, str(tmp_path), http_fetcher, base_url=base,
            max_workers=4, sleeper=sleeps.append,
        )
    finally:
        srv.shutdown()
        srv.server_close()
    assert counts == {
        "sessions": 1, "meetings": 1, "drivers": 2, "laps": 4,
        "stints": 2, "car_data": 2, "location": 0, "pit": 0,
    }
    assert sleeps == [5.0]  # exactly one 429 → one backoff
    # partitioned layout: laps under session_key= directories, prunable
    laps = spark.read.parquet(str(tmp_path / "laps.parquet"))
    assert any(
        "session_key=" in p.name for p in (tmp_path / "laps.parquet").iterdir()
    )
    rows = laps.where("driver_number = 44").collect()
    assert {r["lap_number"] for r in rows} == {1, 2}
    # ISO timestamps parsed at the edge
    assert rows[0]["date_start"].year == 2023
    # empty tables still written with their declared schema
    pit = spark.read.parquet(str(tmp_path / "pit.parquet"))
    assert pit.count() == 0 and "pit_duration" in pit.columns


def test_http_fetcher_raises_transient_on_429():
    class _Always429(BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(429)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), _Always429)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/v1/laps"
        with pytest.raises(TransientError):
            http_fetcher(url, {"session_key": 1})
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_fetcher_retries_connect_phase_timeouts(monkeypatch):
    """A connect-phase stall surfaces as URLError(reason=timeout), not a
    bare TimeoutError; it must still map to TransientError so the
    bounded-retry loop fires (code-review finding, round 4)."""
    import socket
    from urllib import error, request

    def _stall(*a, **k):
        raise error.URLError(socket.timeout("connect timed out"))

    monkeypatch.setattr(request, "urlopen", _stall)
    with pytest.raises(TransientError):
        http_fetcher("http://203.0.113.1/v1/laps", {}, timeout_s=0.01)


def test_http_fetcher_propagates_non_timeout_urlerror(monkeypatch):
    """Connection refused (and other non-timeout URLErrors) are NOT
    transient — they must propagate, not burn retries."""
    from urllib import error, request

    def _refused(*a, **k):
        raise error.URLError(ConnectionRefusedError(111, "refused"))

    monkeypatch.setattr(request, "urlopen", _refused)
    with pytest.raises(error.URLError):
        http_fetcher("http://203.0.113.1/v1/laps", {}, timeout_s=0.01)
