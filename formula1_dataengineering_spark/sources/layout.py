"""Write-path data layout (sink-side scan efficiency).

Every read-side win in this engine — partition pruning, row-group
min/max skipping, pushed filters — is only as good as the layout the
writer produced. This module is the writer half: hive-partitioned,
sort-clustered, optionally Z-ordered parquet with bounded file sizes.

At 100 TB the layout decisions here are the difference between a query
that lists 400 files and one that lists 4 million: low-cardinality
routing keys become hive partitions (directory pruning, no footer
reads), high-cardinality range keys become the within-file sort
(row-group min/max skipping), and two correlated range dimensions
become one interleaved Z-key so a 2-D box predicate touches
O(perimeter) files instead of O(area).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` of each column's non-negative int
    rank into one Z-order (Morton) key — a pure JVM bit expression.

    Callers map each dimension to a bounded non-negative integer first
    (bucket ids, epoch-minutes, ntile ranks …); values above
    ``2^bits - 1`` clamp, preserving order at the range's top end.
    With ``d`` columns the key uses ``d * bits`` bits and must fit a
    long: ``d * bits <= 63`` is enforced.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    d = len(cs)
    if d == 0:
        raise ValueError("zorder_key needs at least one column")
    if d * bits > 63:
        raise ValueError(
            f"{d} cols x {bits} bits = {d * bits} key bits; must be <= 63"
        )
    cap = (1 << bits) - 1
    clamped = [F.least(F.greatest(c.cast("long"), F.lit(0)), F.lit(cap)) for c in cs]
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(clamped):
            key = key + F.shiftleft(
                F.shiftright(c, b).bitwiseAND(F.lit(1)), b * d + i
            )
    return key


def write_clustered(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    cluster_by: Sequence[Column | str] = (),
    zorder_by: Sequence[Column | str] = (),
    zorder_bits: int = 16,
    max_records_per_file: int = 0,
    mode: str = "overwrite",
) -> None:
    """Write parquet laid out for reading: hive partitions on
    ``partition_by``, rows inside each output task sorted by
    ``cluster_by`` (or by the Z-key of ``zorder_by``) so parquet
    row-group min/max stats actually prune.

    The pre-write exchange is a RANGE repartition over (partition
    keys, cluster key): tasks own disjoint key ranges, so the files
    they write have disjoint min/max stats — which is what makes the
    footer-level skipping effective (a hash exchange would overlap
    every file's range with every other's). Followed by a sort WITHIN
    partitions — never a global sort. ``max_records_per_file`` bounds
    file size so stats stay fine-grained and a skewed partition still
    splits across files.
    """
    if cluster_by and zorder_by:
        raise ValueError("pass cluster_by or zorder_by, not both")
    out = df
    sort_cols: list[Column] = [
        F.col(c) if isinstance(c, str) else c for c in cluster_by
    ]
    if zorder_by:
        out = out.withColumn("__zkey", zorder_key(zorder_by, zorder_bits))
        sort_cols = [F.col("__zkey")]
    range_keys = [F.col(c) for c in partition_by] + sort_cols[:1]
    if sort_cols:
        out = out.repartitionByRange(*range_keys)
        out = out.sortWithinPartitions(
            *[F.col(c) for c in partition_by], *sort_cols
        )
    elif partition_by:
        out = out.repartition(*[F.col(c) for c in partition_by])
    if zorder_by:
        out = out.drop("__zkey")  # layout key only; not part of the data
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_mixed_corpus(
    docs_with_key,
    out_dir: str,
    key_col: str = "mix_key",
    n_shards: int = 8,
    tiebreak_cols: tuple[str, str] = ("source", "doc_id"),
):
    """Materialize a curriculum order (``operators.curation.mixing_order``
    keys) as globally-ordered training shards: range-partition on the
    mix key (shard i's keys all precede shard i+1's), sort within each
    shard, write one parquet per shard — a reader consuming shards in
    partition order streams the exact weighted-interleave curriculum.

    ``mix_key`` alone is not a total order — cross-source ties are
    guaranteed (rank 2 at weight 2.0 and rank 1 at weight 1.0 both key
    to 1.0) — so the within-shard sort adds the ``(source, id)``
    tie-break that ``mixing_order`` already emits, making the written
    order a pure function of the data regardless of partition layout.

    Scale: repartitionByRange samples the key distribution, so shards
    balance regardless of skew; the sort is per-shard (no global
    single-task sort anywhere).
    """
    from pyspark.sql import functions as F

    order = [key_col] + [c for c in tiebreak_cols if c in docs_with_key.columns]
    # Range-partition on the SAME total order: with mix_key alone, tied
    # keys straddling a shard boundary could land on either side.
    (
        docs_with_key.repartitionByRange(n_shards, *[F.col(c) for c in order])
        .sortWithinPartitions(*order)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
