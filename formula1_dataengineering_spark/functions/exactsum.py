"""Order-independent money sums (the round-7 cent-flip rule).

``round(sum(double), 2)`` over a large corpus is NOT cross-engine
deterministic: once the running sum crosses ~1e9, a single double ulp
(≈2.4e-7 at 1e9) is within reach of a cent boundary, and Spark's
partial-aggregate tree and DuckDB's sequential fold add the same values
in different orders (observed: one cent flipped in pricing_summary at a
2.7e9-magnitude group sum during the round-7 100x replica drive,
BASELINE.md round-7 notes).

The fix codified here (VERDICT r7 item 6): money inputs are fixed-point
decimals stored as doubles, so quantize each ROW to its exact integer
unit count (cents for a 2-dp column, 1e-4 units for a price×discount
product, 1e-6 for price×discount×tax), sum the integers — exact in any
order, in any engine — and divide back once at the end. Both the Spark
plan and the DuckDB oracle (plans/oracles.py ``_qsum``) apply the SAME
per-row quantization, so the hashed value is identical by construction
at every scale, not merely with high probability at small scale.

Per-row exactness argument: a d-dp money value x has x·10^d an integer;
the double product of up-to-three such factors is within half an ulp of
the true (d₁+d₂+d₃)-dp value while |x|·10^Σd < 2^53, so ``round``
recovers the exact integer on both engines (IEEE multiplication is
deterministic given identical operand order — keep the SQL and the
DataFrame expression textually parallel).

Capacity: the integer sum accumulates Spark-side in ``long`` for ≤4-dp
units (2^63 units ≈ 9.2e16 dollars at cents — measured 2.5× faster
than decimal, see :func:`quantize`) and in ``decimal(27,0)`` for 6-dp
units (long would overflow at ~9.2e12 dollars, inside 100 TB range);
the oracle side is HUGEINT always. Plain ``sum(double)`` of INTEGRAL
columns (l_quantity) stays exact without quantization while the total
< 2^53 and is left alone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(col: Column, in_dp: int) -> Column:
    """Exact per-row integer unit count of a fixed-point money column
    (or product of such columns) carrying ``in_dp`` decimal places.

    Accumulator type is chosen from the overflow budget, measured on
    the TPC-H Q1 shape at sf0.1 (noop sink, steady state): ``long``
    sums 0.41 s vs ``decimal(27,0)`` 1.03 s vs unquantized double
    0.29 s — decimal aggregation leaves whole-stage codegen, so use it
    only when the unit scale demands 128-bit headroom. ``long``
    capacity is 2^63 ≈ 9.2e18 units: at cents (2 dp) that is 9.2e16
    dollars and at 4-dp units 9.2e14 dollars — both far past a 100 TB
    TPC-H's ~2e14-dollar total revenue. 6-dp units (price × discount ×
    tax) would overflow long at ~9.2e12 dollars, inside 100 TB range,
    so those accumulate in decimal (oracle side is HUGEINT always).
    """
    scale = float(10**in_dp)
    acc = "long" if in_dp <= 4 else "decimal(27,0)"
    return F.round(col * F.lit(scale), 0).cast(acc)


def dequantize(sum_col: Column, in_dp: int, out_dp: int = 2) -> Column:
    """Exact integer sum → presentation double rounded to ``out_dp``.

    Presentation-precision ceiling (ADVICE r8): the cast to double is
    exact only while the integer unit sum is < 2^53 (~$9e13 at cents) —
    above that the double nearest-rounds the integer, so the PRINTED
    value can drift from the true total even though the accumulated sum
    itself is exact. Cross-engine hash identity is unaffected (both
    engines nearest-round the same exact integer to the same double);
    callers needing end-to-end exactness past 2^53 units should emit
    the integer unit sum itself (or a decimal division) instead.
    """
    scale = float(10**in_dp)
    return F.round(sum_col.cast("double") / F.lit(scale), out_dp)


def qsum_sql(
    expr: str, in_dp: int, out_dp: int = 2, acc: str = "BIGINT"
) -> str:
    """SQL-text twin of :func:`quantized_sum` — the single source of
    truth for every string-inlined quantized sum: the catalog's
    Spark-SQL gates use the default ``BIGINT`` accumulator and the
    DuckDB oracles delegate here with ``HUGEINT``
    (plans.oracles._qsum), so a scale/accumulator policy change
    propagates everywhere at once. Keep ``expr`` textually parallel to
    the DataFrame expression (module docstring)."""
    s = 10**in_dp
    return (
        f"round(CAST(sum(CAST(round(({expr}) * {s}) AS {acc})) "
        f"AS DOUBLE) / {s}, {out_dp})"
    )


def quantized_sum(col: Column, in_dp: int, out_dp: int = 2) -> Column:
    """``round(sum(col), out_dp)`` computed order-independently: see the
    module docstring. Use inside ``agg``; for window sums compose
    ``dequantize(F.sum(quantize(col, d)).over(w), d)`` instead."""
    return dequantize(F.sum(quantize(col, in_dp)), in_dp, out_dp)
