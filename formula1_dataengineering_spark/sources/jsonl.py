"""JSONL (newline-delimited JSON) corpus ingestion.

Parquet is this engine's resident format, but the corpora a training
pipeline INGESTS overwhelmingly arrive as (gzipped) JSONL dumps —
Common-Crawl derivatives, API exports, eval sets. The two rules that
matter at 100 TB:

- **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a FULL extra pass over the data just to infer types
  (and infers them from whatever subset it samples — unstable across
  drops). Every reader here takes a declared ``StructType``.
- **gzip is non-splittable.** One .json.gz file = one task regardless
  of size; a 100 TB drop must arrive as many files (the standard
  sharded layout) or be re-compressed splittable (zstd/bzip2). The
  writer here shards via Spark's normal partitioned write.

Reference analog: the OpenF1 path ingests JSON arrays over HTTP
(src/helper_functions.py:7-31); this is the same concern
batch-shaped — files instead of endpoints, schema declared instead of
``pd.DataFrame(response.json())`` inference (src/data_processing.py:83).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Declared schema for the documents corpus as JSONL — the exact
#: column types the parquet table carries, so a round trip is
#: lossless. Field ORDER is irrelevant (JSON is keyed), types are not.
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def write_jsonl(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """Shard ``df`` to JSONL at ``path`` (one file per partition —
    the multi-file layout that keeps compressed JSONL parallelizable)."""
    df.write.mode("overwrite").option("compression", compression).json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Read JSONL with a DECLARED schema — no inference pass, no
    sampled-type drift; corrupt lines surface in the standard
    ``_corrupt_record`` handling (PERMISSIVE default) instead of
    failing the job."""
    return spark.read.schema(schema).json(path)
