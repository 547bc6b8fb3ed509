"""F1 analytics as standalone lazy-DataFrame transformations.

Each function re-expresses one reference pipeline (SURVEY §3) as a
single Catalyst plan. The ``F1Session`` facade wraps these with cached
per-session state; these free functions are the testable core.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.grid import ordered_group_position
from ..operators.ranking import rank1_per_group


def with_actual_lap_time(laps: DataFrame) -> DataFrame:
    """Derived ``actual_lap_time`` = round(s1+s2+s3, 3) (P1 —
    reference: src/data_processing.py:88, src/session_object.py:144).
    Null when any sector is null (out-laps), matching pandas NaN
    propagation."""
    return laps.withColumn(
        "actual_lap_time",
        F.round(
            F.col("duration_sector_1")
            + F.col("duration_sector_2")
            + F.col("duration_sector_3"),
            3,
        ),
    )


def assign_tire_information(laps: DataFrame, stints: DataFrame) -> DataFrame:
    """Tire compound / age / stint per lap — as-of backward + validity
    window (J2 — reference: src/session_object.py:55-80).

    The as-of match picks the latest stint with ``lap_start <=
    lap_number``; laps past the stint's ``lap_end`` (gaps between
    stints) get nulls (P16); ``tire_age`` = lap_number − lap_start +
    tyre_age_at_start (W4 arithmetic form — O(1), no extra shuffle).
    """
    st = stints.select(
        "session_key",
        "driver_number",
        F.col("lap_start").cast("int").alias("lap_start"),
        "lap_end",
        "compound",
        "stint_number",
        "tyre_age_at_start",
    )
    joined = asof_join(
        laps.withColumn("__on", F.col("lap_number").cast("int")),
        st.withColumn("__on", F.col("lap_start")),
        on="__on",
        by=["session_key", "driver_number"],
        direction="backward",
        right_cols=["lap_end", "compound", "stint_number", "tyre_age_at_start"],
        strategy="broadcast",
    ).drop("__on")
    # ``__on_right`` is the matched stint's lap_start.
    valid = F.col("lap_number") <= F.col("lap_end")
    return (
        joined.withColumn("compound", F.when(valid, F.col("compound")))
        .withColumn("stint_number", F.when(valid, F.col("stint_number")))
        .withColumn(
            "tire_age",
            F.when(
                valid,
                F.col("lap_number") - F.col("__on_right") + F.col("tyre_age_at_start"),
            ),
        )
        .drop("lap_end", "__on_right", "tyre_age_at_start")
    )


def fastest_lap_per_driver(laps_with_time: DataFrame) -> DataFrame:
    """Best lap row per driver, (actual_lap_time, date_start) tie-break
    (A1/W1 — reference: src/session_object.py:156-165,
    src/data_processing.py:283-284; the window form is the only
    deterministic mapping, SURVEY §2.5 W1)."""
    return rank1_per_group(
        laps_with_time.where(F.col("actual_lap_time").isNotNull()),
        ["session_key", "driver_number"],
        [
            F.col("actual_lap_time").asc(),
            F.col("date_start").asc(),
            F.col("lap_number").asc(),
        ],
    )


def session_position_order(laps_with_time: DataFrame) -> DataFrame:
    """Provisional classification: per-driver bests ordered, with an
    explicit ``position`` (W3 — reference: src/session_object.py:167-174)."""
    best = fastest_lap_per_driver(laps_with_time)
    w = Window.partitionBy("session_key").orderBy(
        F.col("actual_lap_time").asc(), F.col("date_start").asc(), F.col("driver_number").asc()
    )
    return best.withColumn("position", F.row_number().over(w))


def bucket_qualifying_laps(
    laps: DataFrame, sessions: DataFrame, red_flag_limit_min: int = 70
) -> DataFrame:
    """Label each qualifying lap Q1/Q2/Q3 from official segment
    durations (P15 — reference: src/data_processing.py:199-241).

    Q1 = 18 min, Q2 = 15 min, Q3 = 12 min with 7/8-min breaks; the
    boundaries come from the session's ``date_start``. The reference's
    red-flag guard (dp:218-220) raises when the session exceeds
    ``red_flag_limit_min``; here over-long sessions are flagged with a
    boolean column so the distributed job never throws mid-stage —
    callers assert on the flag driver-side.
    """
    s = sessions.select(
        "session_key",
        F.col("date_start").alias("__s_start"),
        F.col("date_end").alias("__s_end"),
    )
    q2_offset = (18 + 7) * 60  # Q1 18 min + 7 min break
    q3_offset = q2_offset + (15 + 8) * 60  # + Q2 15 min + 8 min break
    j = laps.join(F.broadcast(s), "session_key")
    start_us = F.unix_micros(F.col("__s_start"))
    lap_us = F.unix_micros(F.col("date_start"))
    qualifying = (
        F.when(lap_us < start_us + q2_offset * 1_000_000, "Q1")
        .when(lap_us < start_us + q3_offset * 1_000_000, "Q2")
        .otherwise("Q3")
    )
    over_limit = (
        F.unix_micros(F.col("__s_end")) - start_us
    ) > red_flag_limit_min * 60 * 1_000_000
    return (
        j.withColumn("qualifying", qualifying)
        .withColumn("red_flag_suspect", over_limit)
        .drop("__s_start", "__s_end")
    )


def qualifying_classification(
    laps: DataFrame,
    sessions: DataFrame,
) -> DataFrame:
    """Full qualifying grid (§3.2 lifecycle): bucket → filter pit-out
    laps (P8) → best lap per driver per Q (W1) → grid = Q3 order ⊕
    Q2-eliminated ⊕ Q1-eliminated with explicit positions (O4 redesign
    — reference: src/data_processing.py:269-291).

    A driver classifies ONCE, in the last segment they set a time in:
    every Q3 participant ranks in the Q3 block (no rank cutoff — a
    degenerate 11-car Q3 yields 11 Q3 positions rather than silently
    dropping a driver), Q2-eliminated = ranked in Q2 with no Q3 time,
    Q1-eliminated = ranked in Q1 with no Q2 time. On a clean full
    field this is exactly the reference's iloc[:10]/iloc[10:15]/
    iloc[15:20] slicing; unlike a rank cutoff it cannot double-place
    or lose a driver when the field is irregular. The output carries
    ``session_red_flag`` so over-long (red-flagged) sessions are
    signalled, not silently mis-bucketed.
    """
    bucketed = bucket_qualifying_laps(laps, sessions)
    with_time = with_actual_lap_time(bucketed)
    clean = with_time.where(
        (~F.col("is_pit_out_lap")) & F.col("actual_lap_time").isNotNull()
    )
    # Best lap per driver within each Q segment.
    best = rank1_per_group(
        clean,
        ["session_key", "qualifying", "driver_number"],
        [F.col("actual_lap_time").asc(), F.col("date_start").asc(), F.col("lap_number").asc()],
    )
    # Rank drivers within each segment.
    seg_rank = Window.partitionBy("session_key", "qualifying").orderBy(
        F.col("actual_lap_time").asc(), F.col("date_start").asc(), F.col("driver_number").asc()
    )
    ranked = best.withColumn("segment_rank", F.row_number().over(seg_rank))
    # Segment-presence flags via ONE extra window keyed (session,
    # driver) — a semi/anti-join formulation would branch the ranked
    # pipeline and re-run the lap scan per branch. Then a single
    # disjunctive filter assembles the grid.
    w_drv = Window.partitionBy("session_key", "driver_number")
    in_q3 = F.max((F.col("qualifying") == "Q3").cast("int")).over(w_drv) == 1
    in_q2 = F.max((F.col("qualifying") == "Q2").cast("int")).over(w_drv) == 1
    assembled = (
        ranked.withColumn("__in_q3", in_q3)
        .withColumn("__in_q2", in_q2)
        .where(
            (F.col("qualifying") == "Q3")
            | ((F.col("qualifying") == "Q2") & ~F.col("__in_q3"))
            # Q1 must exclude BOTH later segments: a driver with Q3 and
            # Q1 times but no Q2 time (irregular field) would otherwise
            # double-place in the Q3 and Q1 blocks (round-2 ADVICE).
            | (
                (F.col("qualifying") == "Q1")
                & ~F.col("__in_q2")
                & ~F.col("__in_q3")
            )
        )
        .select(
            "session_key", "driver_number", "qualifying", "actual_lap_time", "segment_rank"
        )
    )
    # Session-level red-flag signal (reference raises mid-pipeline,
    # dp:218-220; the engine carries the flag so callers can assert or
    # route) — OR over every bucketed lap, broadcast onto the grid.
    flags = bucketed.groupBy("session_key").agg(
        F.max(F.coalesce("red_flag_suspect", F.lit(False))).alias(
            "session_red_flag"
        )
    )
    grid = ordered_group_position(
        assembled,
        "qualifying",
        ["Q3", "Q2", "Q1"],
        [F.col("segment_rank").asc()],
        position_col="grid_position",
        partition_cols=["session_key"],
    )
    return grid.join(F.broadcast(flags), "session_key", "left")


def avg_lap_time_by_driver_compound(
    laps_with_tires: DataFrame,
    ignored_compounds: tuple[str, ...] = ("UNKNOWN", "TEST_UNKNOWN"),
) -> DataFrame:
    """Driver × compound average lap time, long form (A2 + P9/P10 —
    reference: classes.py:77-95; the pivot→melt round-trip disappears
    because groupBy already emits long form, SURVEY §2.7 U3)."""
    return (
        laps_with_tires.where(F.col("actual_lap_time").isNotNull())
        .where(F.col("compound").isNotNull())
        .where(~F.col("compound").isin(*ignored_compounds))
        .groupBy("session_key", "driver_number", "compound")
        .agg(
            F.round(F.avg("actual_lap_time"), 3).alias("avg_lap_time"),
            F.count("*").alias("n_laps"),
        )
    )


def race_positions_by_lap(laps_with_time: DataFrame) -> DataFrame:
    """Race-position development per lap — the reference's own TODO
    (src/session_object.py:318-320: "race position changes, lap-time
    development"), realized with lag/lead windows the reference never
    got to.

    For every (session, driver, lap): cumulative race time, provisional
    position (rank of cumulative time within the lap, driver_number
    tie-break for determinism), and position_change vs the previous lap
    (positive = places gained).

    A lap with null ``actual_lap_time`` (out-lap with missing sectors)
    makes the driver's cumulative time UNKNOWN from that lap onward:
    race_time and position go null rather than silently omitting the
    missing lap's time, which would rank the driver ahead of cars
    genuinely in front for the rest of the race. Defined rows rank
    1..k within each lap; unknown rows carry null position.

    Scale: two window shuffles — one partitioned by (session, driver)
    for the running sum / known-flag / lag, one by (session, lap) for
    the rank.
    """
    w_cum = (
        Window.partitionBy("session_key", "driver_number")
        .orderBy("lap_number")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    known = F.min(F.col("actual_lap_time").isNotNull()).over(w_cum)
    cum = laps_with_time.withColumn(
        "race_time",
        F.when(
            known, F.round(F.sum("actual_lap_time").over(w_cum), 3)
        ),
    )
    w_rank = Window.partitionBy("session_key", "lap_number").orderBy(
        F.col("race_time").asc_nulls_last(), F.col("driver_number").asc()
    )
    pos = cum.withColumn(
        "position",
        F.when(
            F.col("race_time").isNotNull(), F.row_number().over(w_rank)
        ),
    )
    w_prev = Window.partitionBy("session_key", "driver_number").orderBy("lap_number")
    return pos.select(
        "session_key",
        "driver_number",
        "lap_number",
        "race_time",
        "position",
        (F.lag("position").over(w_prev) - F.col("position")).alias("position_change"),
    )


def incomplete_tire_data_flags(laps_with_tires: DataFrame) -> DataFrame:
    """Per-driver data-quality flag: any lap missing compound /
    tire_age / stint_number after tire assignment (P17/A6 — reference:
    src/session_object.py:78 warns per driver; here one exists-style
    aggregate over the whole session instead of a per-partition loop).
    """
    missing = (
        F.col("compound").isNull()
        | F.col("tire_age").isNull()
        | F.col("stint_number").isNull()
    )
    return laps_with_tires.groupBy("session_key", "driver_number").agg(
        (F.count(F.when(missing, 1)) > 0).alias("incomplete_tire_data")
    )
