"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched pandas iterators.

Decode is REAL for uncompressed containers: ``parse_media_header``
reads BMP / PPM / PGM / BITMAPINFOHEADER and walks RIFF/WAVE chunks in
pure Python (``decode_media(fake=False)``). Compressed codecs
(PNG/JPEG/MP3/MP4) need libraries this environment doesn't ship —
those payloads raise a ``ValueError`` naming the magic bytes; swapping
in PIL/ffmpeg extends only that one function. ``fake=True`` keeps the
deterministic byte-stat pseudo-decode for text-derived payloads.

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


def _make_media_header_parser():
    """Build the header parser inside a factory: a ``<locals>``
    qualname makes cloudpickle serialize the function BY VALUE into
    UDF closures, so Spark workers never need this package importable
    (a module-level function — even captured via a local alias — is
    pickled by reference and forces a worker-side import)."""

    def parse_media_header(b: bytes | None) -> tuple[int, int] | None:
        """REAL header decode for uncompressed containers, pure Python.

        Returns (width, height) for images — for WAV audio, (sample_rate,
        n_samples_per_channel) in the same two slots. Understands:

        - BMP (``BM`` + BITMAPINFOHEADER): width/height at offsets 18/22,
          little-endian int32 (height may be negative = top-down rows).
        - PPM/PGM binary (``P6``/``P5``): ASCII header with #-comments.
        - WAV (``RIFF....WAVE``): walks RIFF chunks to ``fmt ``/``data``.
        - PNG (8-byte signature + IHDR): width/height at offsets 16/20,
          big-endian uint32 — the header needs no codec; only PIXEL
          data needs zlib (stdlib, see the PNG builder).

        Other compressed formats (JPEG/MP3/MP4...) genuinely need codec
        libraries this environment doesn't ship — for those the caller
        falls back or raises. Keeping the parser separate from the Spark
        stage makes it unit-testable without a session.
        """
        if not b or len(b) < 14:
            return None
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
            w = int.from_bytes(b[16:20], "big")
            h = int.from_bytes(b[20:24], "big")
            return (w, h)
        if b[:2] == b"BM" and len(b) >= 26:
            w = int.from_bytes(b[18:22], "little", signed=True)
            h = int.from_bytes(b[22:26], "little", signed=True)
            return (abs(w), abs(h))
        if b[:2] in (b"P5", b"P6"):
            # ASCII fields: magic, width, height, maxval; '#' starts a comment.
            fields: list[int] = []
            i = 2
            while i < len(b) and len(fields) < 2:
                c = b[i : i + 1]
                if c == b"#":
                    while i < len(b) and b[i : i + 1] != b"\n":
                        i += 1
                elif c.isdigit():
                    j = i
                    while j < len(b) and b[j : j + 1].isdigit():
                        j += 1
                    fields.append(int(b[i:j]))
                    i = j
                else:
                    i += 1
            if len(fields) == 2:
                return (fields[0], fields[1])
            return None
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            sample_rate = None
            block_align = None
            data_len = None
            i = 12
            while i + 8 <= len(b):
                cid = b[i : i + 4]
                clen = int.from_bytes(b[i + 4 : i + 8], "little")
                if cid == b"fmt " and i + 16 <= len(b):
                    sample_rate = int.from_bytes(b[i + 12 : i + 16], "little")
                    block_align = int.from_bytes(b[i + 20 : i + 22], "little")
                elif cid == b"data":
                    data_len = clen
                i += 8 + clen + (clen & 1)  # chunks are word-aligned
            if sample_rate and block_align and data_len is not None:
                return (sample_rate, data_len // block_align)
        return None

    return parse_media_header


parse_media_header = _make_media_header_parser()


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads → per-item dimensions/stats via ``mapInPandas``.

    ``fake=False`` runs :func:`parse_media_header` — REAL pure-Python
    decoding of uncompressed containers (BMP / PPM / PGM / WAV); a
    payload none of those parsers recognize raises ``ValueError``
    naming the magic bytes (compressed codecs like PNG/JPEG need
    libraries this environment doesn't ship). ``fake=True`` runs the
    deterministic byte-stat pseudo-decode used by the synthetic-corpus
    gate queries.
    """

    # Safe to capture: the parser is factory-built (see
    # _make_media_header_parser), so cloudpickle ships it by value and
    # workers never import this package.
    parse = parse_media_header

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            pdf = pdf.copy()
            pdf["n_bytes"] = payloads.map(
                lambda b: len(b) if b is not None else 0
            ).astype("int32")
            pdf["checksum"] = payloads.map(
                lambda b: sum(b) % 1_000_000_007 if b is not None else 0
            ).astype("int64")
            if fake:
                pdf["width"] = (pdf["checksum"] % 640 + 1).astype("int32")
                pdf["height"] = (pdf["checksum"] % 480 + 1).astype("int32")
            else:
                dims = []
                for b in payloads:
                    d = parse(bytes(b) if b is not None else None)
                    if d is None:
                        magic = bytes(b[:4]).hex() if b else ""
                        raise ValueError(
                            "unsupported media container (magic "
                            f"0x{magic}): only BMP/PPM/PGM/WAV/PNG "
                            "containers decode without codec libraries"
                        )
                    dims.append(d)
                pdf["width"] = pd.Series(
                    [d[0] for d in dims], index=pdf.index
                ).astype("int32")
                pdf["height"] = pd.Series(
                    [d[1] for d in dims], index=pdf.index
                ).astype("int32")
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


def demo_binary_media_from_documents(docs: DataFrame) -> DataFrame:
    """Real container payloads (BMP / PPM / WAV), built per row from
    the documents table's (doc_id, n_chars) — deterministic input for
    the REAL decode path. doc_id%3 picks the container; dimensions are
    simple functions of (doc_id, n_chars) an oracle can recompute.

    Payloads are genuine files: a BMP here opens in any image viewer
    (solid-byte pixel rows, 4-byte-aligned), the WAV in any player.
    """

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def bmp(w: int, h: int) -> bytes:
            row = ((w * 3 + 3) // 4) * 4
            pix = b"\x7f" * (row * h)
            info = (
                (40).to_bytes(4, "little")
                + w.to_bytes(4, "little", signed=True)
                + h.to_bytes(4, "little", signed=True)
                + (1).to_bytes(2, "little")
                + (24).to_bytes(2, "little")
                + (0).to_bytes(4, "little")
                + len(pix).to_bytes(4, "little")
                + (2835).to_bytes(4, "little") * 2
                + (0).to_bytes(4, "little") * 2
            )
            off = 14 + len(info)
            head = (
                b"BM"
                + (off + len(pix)).to_bytes(4, "little")
                + (0).to_bytes(4, "little")
                + off.to_bytes(4, "little")
            )
            return head + info + pix

        def ppm(w: int, h: int) -> bytes:
            return (
                f"P6\n# synthetic\n{w} {h}\n255\n".encode() + b"\x40" * (w * h * 3)
            )

        def wav(rate: int, n_samples: int) -> bytes:
            block_align = 2
            # deterministic square wave (period 8, amplitude 1000,
            # int16 LE) instead of silence: gives the audio feature
            # gate real DSP to verify (RMS exactly 1000, crossings
            # (n-1)//4) while every payload SIZE stays identical, so
            # the container-math oracles are untouched.
            pattern = b"\xe8\x03" * 4 + b"\x18\xfc" * 4
            data = (pattern * (n_samples // 8 + 1))[: n_samples * block_align]
            fmt = (
                (1).to_bytes(2, "little")
                + (1).to_bytes(2, "little")
                + rate.to_bytes(4, "little")
                + (rate * block_align).to_bytes(4, "little")
                + block_align.to_bytes(2, "little")
                + (16).to_bytes(2, "little")
            )
            chunks = (
                b"fmt " + len(fmt).to_bytes(4, "little") + fmt
                + b"data" + len(data).to_bytes(4, "little") + data
            )
            return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks

        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for did, nch in zip(pdf["doc_id"], pdf["n_chars"]):
                did, nch = int(did), int(nch)
                m = did % 3
                if m == 0:
                    kinds.append("image")
                    payloads.append(bmp(nch % 64 + 1, did % 48 + 1))
                elif m == 1:
                    kinds.append("image")
                    payloads.append(ppm(nch % 32 + 1, did % 24 + 1))
                else:
                    kinds.append("audio")
                    payloads.append(wav(8000 + did % 8 * 500, nch))
                ids.append(did)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "kind": pd.Series(kinds, dtype=object),
                    "payload": pd.Series(payloads, dtype=object),
                    "meta": pd.Series([{}] * len(ids), dtype=object),
                }
            )

    return docs.select("doc_id", "n_chars").mapInPandas(build, schema=MEDIA_SCHEMA)


def demo_png_media_from_documents(docs: DataFrame) -> DataFrame:
    """REAL PNG payloads (signature + IHDR/IDAT/IEND, CRC-correct,
    zlib-compressed 8-bit grayscale pixels — stdlib only) built per row
    from (doc_id, n_chars). Any PNG viewer opens these. Dimensions are
    simple (doc_id, n_chars) functions an oracle can recompute; the
    BYTE SIZE is not oracle-expressible (zlib output length), which is
    why the PNG gate aggregates dimensions only.
    """

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        def chunk(tag: bytes, body: bytes) -> bytes:
            return (
                struct.pack(">I", len(body))
                + tag
                + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        def png(w: int, h: int, shade: int) -> bytes:
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
            raw = b"".join(
                b"\x00" + bytes([shade]) * w for _ in range(h)
            )  # filter 0 per row
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw, 6))
                + chunk(b"IEND", b"")
            )

        for pdf in batches:
            ids, payloads = [], []
            for did, nch in zip(pdf["doc_id"], pdf["n_chars"]):
                did, nch = int(did), int(nch)
                ids.append(did)
                payloads.append(png(nch % 40 + 1, did % 30 + 1, did % 256))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "kind": pd.Series(["image"] * len(ids)),
                    "payload": pd.Series(payloads, dtype=object),
                    "meta": pd.Series([{}] * len(ids), dtype=object),
                }
            )

    return docs.select("doc_id", "n_chars").mapInPandas(
        build, "media_id long, kind string, payload binary, meta map<string,string>"
    )


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio DSP over WAV payloads via ``mapInPandas``: walk the
    RIFF chunks to the ``data`` chunk, reinterpret as int16 PCM
    (numpy, zero-copy), and emit per-clip RMS and strict
    zero-crossing count (sign products < 0) plus the fmt-chunk sample
    rate. Non-audio rows pass through with NULL features rather than
    erroring — the mixed-modality corpus contract.

    Scale: payloads never shuffle (one fused scan-stage pass);
    features are 3 numbers per clip; the numpy kernel is O(samples)
    per Arrow batch."""
    import numpy as np

    out_schema = (
        "media_id long, rate int, n_samples long, rms double, "
        "n_crossings long"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def wav_pcm(p: bytes):
            if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
                return None
            off, rate = 12, None
            while off + 8 <= len(p):
                tag = p[off : off + 4]
                ln = int.from_bytes(p[off + 4 : off + 8], "little")
                body = p[off + 8 : off + 8 + ln]
                if tag == b"fmt " and ln >= 8:
                    rate = int.from_bytes(body[4:8], "little")
                elif tag == b"data":
                    n = len(body) // 2
                    return rate, np.frombuffer(
                        body[: n * 2], dtype="<i2"
                    )
                off += 8 + ln + (ln & 1)
            return None

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "audio":
                    rows.append((int(mid), None, None, None, None))
                    continue
                parsed = wav_pcm(bytes(payload))
                if parsed is None:
                    rows.append((int(mid), None, None, None, None))
                    continue
                rate, pcm = parsed
                n = int(pcm.shape[0])
                if n == 0:
                    rows.append((int(mid), rate, 0, None, 0))
                    continue
                x = pcm.astype(np.float64)
                rms = float(np.sqrt(np.mean(x * x)))
                ncross = int(np.sum(x[1:] * x[:-1] < 0))
                rows.append((int(mid), rate, n, rms, ncross))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "rate",
                    "n_samples",
                    "rms",
                    "n_crossings",
                ],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        extract, schema=out_schema
    )
