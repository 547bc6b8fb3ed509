"""Bucketed-table layout: the co-located-join story for 100 TB.

Repeated big-to-big equi-joins (laps ⋈ stints ⋈ telemetry on
(session_key, driver_number); orders ⋈ customer on custkey) shuffle
both sides every query. Writing the tables bucketed by the join key
moves that shuffle to WRITE time, once: bucketed scans report a
``HashPartitioning`` output that satisfies the join's distribution
requirement, so the per-query Exchange disappears (and with ``sortBy``
the sort does too).

Rules of thumb encoded here:
- bucket count is a layout contract — both sides of a co-located join
  need the SAME count (Spark can coalesce mismatched counts only when
  one divides the other);
- pick buckets so one bucket ≈ one task's comfortable input
  (128-512 MB post-compression) at the TARGET scale, not test scale;
- always ``sortBy`` the join key inside buckets: sort-merge then reads
  pre-sorted runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed, bucket-sorted parquet table in the
    session catalog (or as an external table at ``path`` — the
    warehouse dir is a static conf, so tests point tables at temp
    dirs this way)."""
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        n_buckets, *bucket_cols
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket specs this plans as an exchange-free
    sort-merge join — verified by the plan-regression test
    (``tests/test_bucketing.py``).
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int | None = None,
) -> None:
    """Persist ``df`` as a hive-partitioned parquet directory.

    Partitioning is the PRUNING story (bucketing above is the JOIN
    story): a filter on a partition column turns into directory-level
    pruning — at 100 TB a day-partitioned events table makes a 1-day
    query touch 1/365th of the files before a single row group is
    opened. Rules of thumb:
    - partition on low-cardinality, always-filtered columns (date,
      region, event_type); NEVER on high-cardinality keys (a
      directory per user id is a metadata explosion);
    - target partitions ≥ ~1 GB; finer grains belong to row-group
      statistics (min/max pruning), not directories;
    - cap file sizes via ``max_records_per_file`` so a hot partition
      still splits across tasks.
    """
    writer = df.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_cols).parquet(path)
