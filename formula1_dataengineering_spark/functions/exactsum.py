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

Capacity: the integer sum accumulates in ``decimal(27,0)``→sum
``decimal(37,0)`` Spark-side and HUGEINT oracle-side — no overflow
until ~1e37 units (≈1e31 dollars at 6 dp), far past 100 TB. Plain
``sum(double)`` of INTEGRAL columns (l_quantity) stays exact without
quantization while the total < 2^53 and is left alone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(col: Column, in_dp: int) -> Column:
    """Exact per-row integer unit count of a fixed-point money column
    (or product of such columns) carrying ``in_dp`` decimal places."""
    scale = float(10**in_dp)
    return F.round(col * F.lit(scale), 0).cast("decimal(27,0)")


def dequantize(sum_col: Column, in_dp: int, out_dp: int = 2) -> Column:
    """Exact integer sum → presentation double rounded to ``out_dp``."""
    scale = float(10**in_dp)
    return F.round(sum_col.cast("double") / F.lit(scale), out_dp)


def quantized_sum(col: Column, in_dp: int, out_dp: int = 2) -> Column:
    """``round(sum(col), out_dp)`` computed order-independently: see the
    module docstring. Use inside ``agg``; for window sums compose
    ``dequantize(F.sum(quantize(col, d)).over(w), d)`` instead."""
    return dequantize(F.sum(quantize(col, in_dp)), in_dp, out_dp)
