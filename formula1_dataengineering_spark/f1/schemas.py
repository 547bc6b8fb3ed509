"""Explicit StructType schemas for the F1 entity tables.

The reference never declares schemas — every table's shape is whatever
JSON the OpenF1 API returned that day (``pd.DataFrame(resp.json())``,
reference: src/data_processing.py:83). Schema-on-read is a correctness
hazard at scale, so the engine declares them (FIXTURES.md is the
field-by-field derivation citing every reference read site).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Compound → hex chart color (reference: src/data_processing.py:15-21,
#: src/session_object.py:16-22, classes.py:19-25). A literal map at the
#: presentation edge; a broadcast dim table when joined at scale.
COMPOUND_COLORS = {
    "SOFT": "#e10600",
    "MEDIUM": "#f5c518",
    "HARD": "#f0f0ec",
    "INTERMEDIATE": "#43b02a",
    "WET": "#0067ad",
}


def _st(fields: list[tuple[str, T.DataType]]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


F1_SCHEMAS: dict[str, T.StructType] = {
    "sessions": _st(
        [
            ("session_key", T.IntegerType()),
            ("meeting_key", T.IntegerType()),
            ("session_name", T.StringType()),
            ("session_type", T.StringType()),
            ("circuit_short_name", T.StringType()),
            ("date_start", T.TimestampType()),
            ("date_end", T.TimestampType()),
        ]
    ),
    "meetings": _st(
        [
            ("meeting_key", T.IntegerType()),
            ("meeting_official_name", T.StringType()),
            ("year", T.IntegerType()),
        ]
    ),
    "drivers": _st(
        [
            ("session_key", T.IntegerType()),
            ("driver_number", T.IntegerType()),
            ("name_acronym", T.StringType()),
            ("team_colour", T.StringType()),
            ("driver_color", T.StringType()),
        ]
    ),
    "laps": _st(
        [
            ("session_key", T.IntegerType()),
            ("driver_number", T.IntegerType()),
            ("lap_number", T.IntegerType()),
            ("date_start", T.TimestampType()),
            ("lap_duration", T.DoubleType()),
            ("duration_sector_1", T.DoubleType()),
            ("duration_sector_2", T.DoubleType()),
            ("duration_sector_3", T.DoubleType()),
            ("is_pit_out_lap", T.BooleanType()),
        ]
    ),
    "stints": _st(
        [
            ("session_key", T.IntegerType()),
            ("driver_number", T.IntegerType()),
            ("stint_number", T.IntegerType()),
            ("lap_start", T.IntegerType()),
            ("lap_end", T.IntegerType()),
            ("compound", T.StringType()),
            ("tyre_age_at_start", T.IntegerType()),
        ]
    ),
    "car_data": _st(
        [
            ("session_key", T.IntegerType()),
            ("driver_number", T.IntegerType()),
            ("date", T.TimestampType()),
            ("speed", T.DoubleType()),
            ("throttle", T.DoubleType()),
            ("brake", T.DoubleType()),
            ("n_gear", T.IntegerType()),
            ("rpm", T.IntegerType()),
        ]
    ),
    "location": _st(
        [
            ("session_key", T.IntegerType()),
            ("driver_number", T.IntegerType()),
            ("date", T.TimestampType()),
            ("x", T.DoubleType()),
            ("y", T.DoubleType()),
            ("z", T.DoubleType()),
        ]
    ),
    "pit": _st(
        [
            ("session_key", T.IntegerType()),
            ("meeting_key", T.IntegerType()),
            ("driver_number", T.IntegerType()),
            ("lap_number", T.IntegerType()),
            ("pit_duration", T.DoubleType()),
        ]
    ),
}
