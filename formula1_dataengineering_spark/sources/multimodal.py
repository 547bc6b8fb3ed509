"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched pandas iterators.

Container constraint (task brief): no image/audio codecs are installed,
so the *decode* step is stubbed — ``decode_media`` raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic byte-level pseudo-decode. Everything around the stub —
schemas, ``mapInPandas`` signatures, batch iteration, partition
behavior — is real and tested; swapping in PIL/ffmpeg changes only the
body of one function.

Scale notes: payloads stay in executor memory one Arrow batch at a
time (``mapInPandas`` streams batches — no collect); feature columns
come back as ``array<float>`` ready for the similarity operators.
Partition by a content-hash bucket on write so hot shards spread.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

DECODED_SCHEMA = T.StructType(
    list(MEDIA_SCHEMA.fields)
    + [
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

_FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a codec: byte stats + pseudo dims."""
    payloads = pdf["payload"]
    pdf = pdf.copy()
    pdf["n_bytes"] = payloads.map(lambda b: len(b) if b is not None else 0).astype("int32")
    pdf["checksum"] = payloads.map(
        lambda b: sum(b) % 1_000_000_007 if b is not None else 0
    ).astype("int64")
    pdf["width"] = (pdf["checksum"] % 640 + 1).astype("int32")
    pdf["height"] = (pdf["checksum"] % 480 + 1).astype("int32")
    return pdf


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads → per-item dimensions/stats via ``mapInPandas``.

    Real codecs are NOT in this environment: with ``fake=False`` the
    stage raises ``NotImplementedError`` at execution time. ``fake=True``
    runs the deterministic pseudo-decode so the full distributed
    plumbing is exercised.
    """

    # The closure must be self-contained (no references to this module's
    # globals): the consuming SparkSession may run workers without this
    # package on sys.path, and cloudpickle serializes module-level
    # functions by reference, not by value.
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg) are not installed in this "
                    "environment; pass fake=True for the deterministic stub"
                )
            payloads = pdf["payload"]
            pdf = pdf.copy()
            pdf["n_bytes"] = payloads.map(
                lambda b: len(b) if b is not None else 0
            ).astype("int32")
            pdf["checksum"] = payloads.map(
                lambda b: sum(b) % 1_000_000_007 if b is not None else 0
            ).astype("int64")
            pdf["width"] = (pdf["checksum"] % 640 + 1).astype("int32")
            pdf["height"] = (pdf["checksum"] % 480 + 1).astype("int32")
            yield pdf

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = _FEATURE_DIM, fake: bool = True) -> DataFrame:
    """Payload → ``array<float>`` feature vector (fake: rolling byte
    histogram), ready for the ANN/similarity operators."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real feature extractors not installed")
            out = []
            for b in pdf["payload"]:
                vec = [0.0] * dim
                if b:
                    for i, byte in enumerate(b):
                        vec[i % dim] += float(byte)
                    # No rounding: slot sums are integer-valued float64
                    # (exact), so norm/divide/float32-cast are pure IEEE
                    # ops — bit-identical in any engine (DuckDB oracle
                    # reproduces the vectors exactly).
                    norm = sum(v * v for v in vec) ** 0.5 or 1.0
                    vec = [v / norm for v in vec]
                out.append(vec)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": out}
            )

    return media.mapInPandas(feats, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 256, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video payloads: slice every ``n``-th chunk.

    Fake frame extraction (real: ffmpeg keyframes) — but the explode
    shape (one row in → k rows out via ``mapInPandas``) is the real
    distributed pattern.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, chunks = [], [], []
            for mid, kind, b in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "video" or not b:
                    continue
                for j in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(j)
                    chunks.append(bytes(b[j * every_n_bytes : (j + 1) * every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame_payload": pd.Series(chunks, dtype=object)}
            )

    return media.mapInPandas(frames, schema=FRAMES_SCHEMA)


def demo_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from the documents table: text
    bytes become payloads with rotating kinds — deterministic input for
    the multimodal plumbing tests."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


THUMBS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
    ]
)


def resize_images(
    media: DataFrame, width: int = 8, height: int = 8, fake: bool = True
) -> DataFrame:
    """Image resize → fixed-size thumbnail payload.

    Real implementation needs PIL/opencv (not in this container) — the
    non-fake path raises ``NotImplementedError``. The fake path emits a
    deterministic byte-subsampled pseudo-thumbnail of exactly
    ``width*height`` bytes (zero-padded), keeping the Spark-side
    contract real: binary-in/binary-out schema, Arrow batching, and
    per-row size invariants the tests pin down. Non-image rows are
    dropped (filter, not null-fill — downstream ops want image-only).
    """
    n_out = width * height

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("image codecs not installed; use fake=True")
            ids, thumbs = [], []
            for mid, kind, b in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "image" or not b:
                    continue
                step = max(1, len(b) // n_out)
                sampled = bytes(b[::step][:n_out])
                ids.append(mid)
                thumbs.append(sampled.ljust(n_out, b"\x00"))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "thumb": pd.Series(thumbs, dtype=object),
                    "thumb_w": pd.Series([width] * len(ids), dtype="int32"),
                    "thumb_h": pd.Series([height] * len(ids), dtype="int32"),
                }
            )

    return media.mapInPandas(rs, schema=THUMBS_SCHEMA)
