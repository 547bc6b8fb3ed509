"""Write-path layout (sources/layout.py): Z-order key correctness and
the read-side payoff of clustered writes — partition pruning in the
plan, and fewer files touched by selective predicates."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from formula1_dataengineering_spark.sources.layout import (
    write_clustered,
    zorder_key,
)


def _py_zkey(vals, bits):
    key = 0
    cap = (1 << bits) - 1
    vals = [min(max(v, 0), cap) for v in vals]
    d = len(vals)
    for b in range(bits):
        for i, v in enumerate(vals):
            key |= ((v >> b) & 1) << (b * d + i)
    return key


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 1), (65535, 65535), (70000, -3)]
    df = spark.createDataFrame(rows, "x int, y int").withColumn(
        "z", zorder_key(["x", "y"], bits=16)
    )
    for r in df.collect():
        assert r.z == _py_zkey([r.x, r.y], 16), (r.x, r.y)
    # locality: an aligned 2^k x 2^k block is one contiguous z range
    assert _py_zkey([15, 15], 16) == 255  # the 16x16 origin block is z<256


def test_zorder_key_validation(spark):
    with pytest.raises(ValueError, match="at least one"):
        zorder_key([])
    with pytest.raises(ValueError, match="<= 63"):
        zorder_key(["a", "b", "c", "d"], bits=16)


def test_write_clustered_roundtrip_and_partition_pruning(spark):
    from formula1_dataengineering_spark.sources.catalog import load

    ev = load(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "event_type", "value"
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/events_clustered"
        write_clustered(
            ev, path, partition_by=["event_type"], cluster_by=["value"],
            max_records_per_file=500,
        )
        back = spark.read.parquet(path)
        # lossless roundtrip
        assert back.count() == ev.count()
        assert back.agg(F.sum("value")).first()[0] == pytest.approx(
            ev.agg(F.sum("value")).first()[0]
        )
        # a type predicate prunes DIRECTORIES (visible as PartitionFilters)
        q = back.where(F.col("event_type") == "click")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "event_type" in plan.split(
            "PartitionFilters:"
        )[1].split("]")[0]
        # range clustering: a narrow value slice lives in few files
        total_files = back.select(
            F.input_file_name()
        ).distinct().count()
        lo = back.agg(F.expr("percentile(value, 0.5)")).first()[0]
        touched = (
            back.where(F.col("value").between(lo, lo * 1.001))
            .select(F.input_file_name())
            .distinct()
            .count()
        )
        assert touched < total_files / 2, (touched, total_files)


def test_zorder_layout_beats_linear_on_box_queries(spark):
    """64x64 grid, 256 rows/file: Z-order puts each 16x16 block in ONE
    file, so the origin box touches 1 file; an x-sorted layout smears
    the same box over 4 files."""
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).cast("int").alias("x"),
        (F.col("id") / 64).cast("int").alias("y"),
    )

    def files_touched(path):
        back = spark.read.parquet(path)
        box = back.where((F.col("x") < 16) & (F.col("y") < 16))
        assert box.count() == 256
        return box.select(F.input_file_name()).distinct().count()

    with tempfile.TemporaryDirectory() as d:
        zpath, lpath = f"{d}/z", f"{d}/linear"
        write_clustered(
            grid.coalesce(1), zpath, zorder_by=["x", "y"], zorder_bits=6,
            max_records_per_file=256,
        )
        write_clustered(
            grid.coalesce(1), lpath, cluster_by=["x"], max_records_per_file=256,
        )
        zback = spark.read.parquet(zpath)
        assert set(zback.columns) == {"x", "y"}  # layout key not persisted
        assert zback.count() == 4096
        z_touched, l_touched = files_touched(zpath), files_touched(lpath)
        assert z_touched == 1, z_touched
        assert l_touched == 4, l_touched


def test_schema_evolution_merge_read(spark, tmp_path):
    """Schema evolution across parquet batches: a later batch adds a
    column; mergeSchema reads the union schema with NULLs for the old
    batch — the append-only ingest evolution path."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "doc_id long, text string"
    ).write.mode("append").parquet(p)
    spark.createDataFrame(
        [(2, "b", "en")], "doc_id long, text string, lang string"
    ).write.mode("append").parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: r for r in merged.collect()}
    assert rows[1]["lang"] is None and rows[2]["lang"] == "en"


def test_mixed_corpus_shards_are_globally_ordered(spark, tmp_path):
    """Range-partitioned curriculum write: files read in partition
    order yield the exact ascending mix-key order — within-file sorted
    AND file boundaries non-overlapping."""
    from formula1_dataengineering_spark.operators.curation import mixing_order
    from formula1_dataengineering_spark.sources.layout import write_mixed_corpus

    docs = spark.createDataFrame(
        [(i, "a" if i % 3 else "b", None) for i in range(300)],
        "doc_id long, source string, text string",
    )
    keyed = mixing_order(docs, weights={"a": 2.0})
    out = str(tmp_path / "mixed")
    write_mixed_corpus(keyed, out, n_shards=4)

    import glob

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) >= 2
    prev_max = None
    total = 0
    for f in files:
        pdf = spark.read.parquet(f).toPandas()
        total += len(pdf)
        if len(pdf) == 0:
            continue
        keys = list(pdf["mix_key"])
        assert keys == sorted(keys)  # within-shard order
        if prev_max is not None:
            assert keys[0] >= prev_max  # shard boundaries don't overlap
        prev_max = keys[-1]
    assert total == 300


def test_jsonl_roundtrip_and_declared_schema(spark, tmp_path):
    """JSONL writer/reader: round trip preserves values and types
    under the DECLARED schema (no inference), and a corrupt line
    surfaces as nulls (PERMISSIVE) instead of failing the job."""
    from pyspark.sql import types as T

    from formula1_dataengineering_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, "hello\nworld"), (2, None), (3, 'quote " and \\ slash')],
        schema,
    )
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(df, path, compression="gzip")
    back = read_jsonl(spark, path, schema)
    assert back.schema == schema
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == {1: "hello\nworld", 2: None, 3: 'quote " and \\ slash'}

    bad = tmp_path / "bad_jsonl"
    bad.mkdir()
    (bad / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok"}\nNOT JSON AT ALL\n'
    )
    rows = read_jsonl(spark, str(bad), schema).collect()
    assert len(rows) == 2  # corrupt line kept as nulls, job survives
    assert {r["doc_id"] for r in rows} == {1, None}


def test_max_records_per_file_bounds_file_sizes(spark, tmp_path):
    """Small-files control: maxRecordsPerFile splits a partition's
    output into bounded files (the knob that keeps 100 TB writes from
    emitting multi-GB part files), and the rows round-trip exactly."""
    import glob

    out = str(tmp_path / "bounded")
    df = spark.range(1000).repartition(2)
    df.write.option("maxRecordsPerFile", 100).mode("overwrite").parquet(out)
    parts = glob.glob(out + "/part-*.parquet")
    assert len(parts) >= 10  # 1000 rows / 100 cap
    for p in parts:
        n = spark.read.parquet(p).count()
        assert n <= 100
    assert spark.read.parquet(out).count() == 1000


def test_merge_schema_still_prunes_columns(spark, tmp_path):
    """mergeSchema unions file schemas at planning, but a projection
    over the merged schema must still PRUNE to the requested columns
    in the scan (ReadSchema) — schema evolution doesn't forfeit
    column pruning."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    spark.range(10).selectExpr("id", "id * 2 AS x").write.parquet(a)
    spark.range(10, 20).selectExpr(
        "id", "id * 2 AS x", "id * 3 AS y"
    ).write.parquet(b)
    df = (
        spark.read.option("mergeSchema", "true")
        .parquet(a, b)
        .select("id")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs
    schema = rs[0].split("ReadSchema:")[1]
    assert "x" not in schema and "y" not in schema
    assert "id" in schema
    assert df.count() == 20
