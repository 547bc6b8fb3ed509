"""formula1_dataengineering_spark — a PySpark-native analytics engine.

A brand-new, idiomatic Spark (DataFrame / Spark SQL / Catalyst) engine
with the query and data-processing capabilities of the reference repo
LewisSchmidtke/Formula1_DataEngineering (pandas + OpenF1 REST), re-
designed Spark-first for 100 TB scale:

- ``session``    — SparkSession factory (AQE, Arrow, UTC, tuned shuffle).
- ``sources``    — schema-bound Parquet/JSON readers and the table catalog.
- ``operators``  — relational operators the reference implements that
  Spark lacks natively (as-of joins, interval join, deterministic
  rank-1-per-group, ordered-group grid assembly) plus large-scale
  training-data-pipeline operators (dedup, similarity search, text
  analysis) built from Catalyst-optimizable primitives.
- ``functions``  — pure column-expression scalar functions (lap-time
  formatting, vector math, text metrics). No row-at-a-time UDFs.
- ``plans``      — the named query catalog and the DuckDB oracle SQL
  used by the correctness harness.
- ``streaming``  — Structured Streaming analogs (tumbling/sliding
  windows, watermarks, sessionization) over the events stream table.
- ``f1``         — the lazy F1Session facade mirroring the reference's
  ``Session`` API (reference: src/session_object.py:24-257).
"""

__version__ = "0.1.0"
