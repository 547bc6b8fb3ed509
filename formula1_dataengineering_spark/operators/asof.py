"""As-of joins (backward / forward / nearest) as Catalyst-optimizable
compositions of built-in operators.

The reference implements these with ``pd.merge_asof``:

- backward + validity window: ``Session.assign_tire_information_to_lap``
  (reference: src/session_object.py:55-80) — match each lap to the
  latest stint whose ``lap_start`` <= ``lap_number``.
- nearest: ``Session.match_track_position_and_gear``
  (reference: src/session_object.py:240-250) — match each telemetry
  sample to the nearest location ping by timestamp.

Spark has no native as-of join, so this module provides one with two
physical strategies:

``strategy="union"`` (default — the 100 TB path)
    Tag left and right rows, union them on the (by, on) key space, and
    run a single ``last(..., ignorenulls=True)`` window sorted by
    (on, side). One shuffle, O(n log n), **no row explosion** no matter
    how many right rows precede each left row. This is the plan you
    want when both sides are large (telemetry × location).

``strategy="broadcast"``
    Range join (equi on ``by`` + inequality on ``on``) followed by a
    deterministic rank-1 window. The range join explodes to
    O(|matches|) intermediate rows, so use it only when the right side
    is small (stints: ~5 rows/driver) — then Catalyst executes it as a
    broadcast hash join with a range residual and it is cheaper than
    the union shuffle.

Determinism: when several right rows share the same ``on`` value the
winner is the one with the greatest tie-break tuple (the carried right
payload), so repeated runs and distributed re-orderings give identical
results — required for oracle hash-matching (SURVEY §5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PAYLOAD = "__asof_payload"
_SIDE = "__asof_side"
_ON = "__asof_on"
_LID = "__asof_lid"


def _as_list(x: str | Sequence[str] | None) -> list[str]:
    if x is None:
        return []
    return [x] if isinstance(x, str) else list(x)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    strategy: str = "union",
) -> DataFrame:
    """Left as-of join: every left row, enriched with the matching right
    row's columns (or nulls when no match).

    Parameters mirror ``pd.merge_asof`` (reference usage:
    src/session_object.py:62, :248): ``on`` is the ordered key (same
    name both sides), ``by`` the equi-key(s), ``direction`` one of
    backward | forward | nearest, ``tolerance`` an optional Column
    literal (same type as the difference of ``on``) limiting the match
    distance.

    ``right_cols`` selects which right columns to carry (default: all
    non-key columns). Carried columns that collide with left names get
    ``suffix``. The matched right ``on`` value is always carried as
    ``{on}{suffix}``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if strategy not in ("union", "broadcast"):
        raise ValueError(f"strategy must be union|broadcast, got {strategy!r}")
    by = _as_list(by)
    value_cols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c != on and c not in by
    ]
    out_names = {c: (c + suffix if c in left.columns else c) for c in value_cols}
    on_out = on + suffix

    if direction == "nearest":
        return _asof_nearest(left, right, on, by, tolerance, value_cols, out_names, on_out, strategy)

    if strategy == "broadcast":
        return _asof_rangejoin(
            left, right, on, by, direction, tolerance, value_cols, out_names, on_out
        )
    return _asof_union(left, right, on, by, direction, tolerance, value_cols, out_names, on_out)


def _asof_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    direction: str,
    tolerance: Column | None,
    value_cols: list[str],
    out_names: dict[str, str],
    on_out: str,
) -> DataFrame:
    """Sort-based as-of: union + ordered window, single shuffle.

    Null-key semantics match the broadcast strategy (and pandas
    merge_asof): a null ``on`` or ``by`` on the right can never be a
    match source; a null ``on``/``by`` on the left never receives a
    match. Without this, the (on, side) sort would hand nulls-first/
    nulls-last rows a neighbor's payload.
    """
    null_key = F.lit(False)
    for c in [on, *by]:
        null_key = null_key | F.col(c).isNull()
    right = right.where(~null_key)
    # Pack the right payload (including its `on`) into one struct so the
    # window carries a single column.
    payload = F.struct(F.col(on).alias(on_out), *[F.col(c) for c in value_cols])
    r = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias(_ON),
        payload.alias(_PAYLOAD),
        F.lit(0).alias(_SIDE),
    )
    l_cols = left.columns
    l = left.select(
        "*",
        F.col(on).alias(_ON),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        F.lit(1).alias(_SIDE),
    )
    # Align schemas for the union: right rows keep their `by` keys (the
    # window partitions on them) and get nulls for all other left cols.
    r_aligned = r.select(
        *[
            (F.col(c) if c in by else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in l_cols
        ],
        _ON,
        _PAYLOAD,
        _SIDE,
    )
    unioned = l.unionByName(r_aligned)

    if direction == "backward":
        # Right rows sort before left rows at equal `on` (inclusive
        # match); among equal right rows the payload struct breaks ties.
        order = [F.col(_ON).asc(), F.col(_SIDE).asc(), F.col(_PAYLOAD).asc_nulls_first()]
    else:  # forward
        # Payload ASC so `last` picks the GREATEST payload among right
        # rows tied on `on` — the same winner as the range-join
        # strategy's desc/rank-1 (they must agree row-for-row).
        order = [F.col(_ON).desc(), F.col(_SIDE).asc(), F.col(_PAYLOAD).asc_nulls_first()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    left_null_key = F.lit(False)
    for c in [_ON, *by]:
        left_null_key = left_null_key | F.col(c).isNull()
    matched = (
        unioned.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
        .withColumn(
            _PAYLOAD,
            F.when(~left_null_key, F.col(_PAYLOAD)),
        )
        .where(F.col(_SIDE) == 1)
    )
    if tolerance is not None:
        dist = (
            F.col(_ON) - F.col(f"{_PAYLOAD}.{on_out}")
            if direction == "backward"
            else F.col(f"{_PAYLOAD}.{on_out}") - F.col(_ON)
        )
        matched = matched.withColumn(
            _PAYLOAD, F.when(dist <= tolerance, F.col(_PAYLOAD))
        )
    return matched.select(
        *l_cols,
        F.col(f"{_PAYLOAD}.{on_out}").alias(on_out),
        *[F.col(f"{_PAYLOAD}.{c}").alias(out_names[c]) for c in value_cols],
    )


def _asof_rangejoin(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    direction: str,
    tolerance: Column | None,
    value_cols: list[str],
    out_names: dict[str, str],
    on_out: str,
) -> DataFrame:
    """Broadcast range join + deterministic rank-1 dedup.

    Right side is broadcast; the equi keys keep the join a hash join
    with a range residual (never a cartesian BNLJ) — the same shape the
    reference's interval join needs at scale (SURVEY §2.3 J1 note).
    """
    lid = F.monotonically_increasing_id()
    l = left.withColumn(_LID, lid)
    r = right.select(
        *[F.col(c).alias(f"__by_{c}") for c in by],
        F.col(on).alias(on_out),
        *[F.col(c).alias(out_names[c]) for c in value_cols],
    )
    if direction == "backward":
        rng = F.col(on) >= F.col(on_out)
        if tolerance is not None:
            rng = rng & ((F.col(on) - F.col(on_out)) <= tolerance)
        order = [F.col(on_out).desc()]
    else:
        rng = F.col(on) <= F.col(on_out)
        if tolerance is not None:
            rng = rng & ((F.col(on_out) - F.col(on)) <= tolerance)
        order = [F.col(on_out).asc()]
    cond = rng
    for c in by:
        cond = cond & (F.col(c) == F.col(f"__by_{c}"))
    joined = l.join(F.broadcast(r), cond, "left")
    order += [F.struct(*[F.col(out_names[c]) for c in value_cols]).desc_nulls_last()] if value_cols else []
    w = Window.partitionBy(_LID).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", _LID, *[f"__by_{c}" for c in by])
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    tolerance: Column | None,
    value_cols: list[str],
    out_names: dict[str, str],
    on_out: str,
    strategy: str,
) -> DataFrame:
    """Nearest = backward ∧ forward candidates, argmin |distance|.

    Tie (equidistant) resolves to the backward (earlier) candidate —
    deterministic, documented engine semantics (pandas' tie behavior is
    an implementation detail we do not chase; SURVEY §7 hard-part #1).
    """
    l_cols = left.columns
    bwd = asof_join(
        left, right, on, by, "backward", tolerance, value_cols, "__b", strategy
    )
    fwd = asof_join(
        bwd, right, on, by, "forward", tolerance, value_cols, "__f", strategy
    )
    b_on, f_on = on + "__b", on + "__f"
    b_dist = F.col(on) - F.col(b_on)
    f_dist = F.col(f_on) - F.col(on)
    use_bwd = F.when(
        F.col(b_on).isNotNull() & (F.col(f_on).isNull() | (b_dist <= f_dist)), F.lit(True)
    ).otherwise(F.lit(False))
    out_b = {c: (c + "__b" if (c + "__b") in fwd.columns else c) for c in value_cols}
    out_f = {c: (c + "__f" if (c + "__f") in fwd.columns else c) for c in value_cols}
    sel = [F.col(c) for c in l_cols]
    sel.append(F.when(use_bwd, F.col(b_on)).otherwise(F.col(f_on)).alias(on_out))
    for c in value_cols:
        sel.append(
            F.when(use_bwd, F.col(out_b[c])).otherwise(F.col(out_f[c])).alias(out_names[c])
        )
    return fwd.select(*sel)
