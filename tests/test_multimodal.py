"""Multimodal plumbing: binary payload columns through mapInPandas —
decode stub, feature extraction, frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_dataengineering_spark.sources.catalog import load
from formula1_dataengineering_spark.sources.multimodal import (
    decode_media,
    demo_media_from_documents,
    extract_features,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return demo_media_from_documents(load(spark, SF, "documents")).cache()


def test_decode_real_rejects_non_container_payloads(media):
    # the demo media payloads are raw text bytes — not a parseable
    # container, so the REAL decode path must refuse loudly, not guess
    with pytest.raises(Exception, match="unsupported media container"):
        decode_media(media, fake=False).collect()


def test_fake_decode_deterministic(media):
    a = decode_media(media, fake=True).orderBy("media_id").toPandas()
    b = decode_media(media, fake=True).orderBy("media_id").toPandas()
    assert a.equals(b)
    assert (a["n_bytes"] > 0).all()
    # checksum consistent with payload bytes
    row = a.iloc[0]
    assert row["checksum"] == sum(bytes(row["payload"])) % 1_000_000_007


def test_features_are_unit_vectors(media):
    feats = extract_features(media).toPandas()
    assert len(feats) == media.count()
    import math

    for v in feats["features"].head(20):
        assert len(v) == 16
        norm = math.sqrt(sum(x * x for x in v))
        assert abs(norm - 1.0) < 1e-3


def test_frame_sampling_only_video(media):
    frames = sample_frames(media)
    out = frames.toPandas()
    video_ids = set(
        media.where(F.col("kind") == "video").select("media_id").toPandas()["media_id"]
    )
    assert set(out["media_id"]) <= video_ids
    assert len(set(out["media_id"])) == len(video_ids)
    # frame indexes dense from 0 per media
    g = out.groupby("media_id")["frame_idx"]
    assert (g.min() == 0).all()
    # payload slices reassemble into a prefix of the original
    one = out[out.media_id == out.media_id.iloc[0]].sort_values("frame_idx")
    joined = b"".join(one["frame_payload"])
    orig = media.where(F.col("media_id") == int(one["media_id"].iloc[0])).first()["payload"]
    assert bytes(orig).startswith(joined)


def test_resize_images_fixed_size_and_deterministic(media):
    from formula1_dataengineering_spark.sources.multimodal import resize_images

    t1 = resize_images(media, width=8, height=8).collect()
    t2 = resize_images(media, width=8, height=8).collect()
    assert sorted(r["media_id"] for r in t1) == sorted(r["media_id"] for r in t2)
    by_id1 = {r["media_id"]: bytes(r["thumb"]) for r in t1}
    by_id2 = {r["media_id"]: bytes(r["thumb"]) for r in t2}
    assert by_id1 == by_id2  # deterministic
    assert all(len(v) == 64 for v in by_id1.values())  # exactly w*h bytes
    # image rows only
    kinds = {r["media_id"]: r["kind"] for r in media.collect()}
    assert all(kinds[i] == "image" for i in by_id1)


def test_resize_images_real_path_gated(media):
    import pytest
    from formula1_dataengineering_spark.sources.multimodal import resize_images

    with pytest.raises(Exception):
        resize_images(media, fake=False).collect()


def test_parse_media_header_real_containers():
    from formula1_dataengineering_spark.sources.multimodal import parse_media_header

    # BMP, negative height = top-down row order
    bmp = (
        b"BM" + (0).to_bytes(8, "little") + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (17).to_bytes(4, "little", signed=True)
        + (-9).to_bytes(4, "little", signed=True) + b"\x00" * 20
    )
    assert parse_media_header(bmp) == (17, 9)
    # PPM with a comment line between magic and dimensions
    assert parse_media_header(b"P6\n# c 9 9\n12 34\n255\n" + b"\x00" * 8) == (12, 34)
    # WAV: an odd-length chunk precedes fmt (word alignment must hold)
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (44100).to_bytes(4, "little") + (88200).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    wav = (
        b"RIFF" + (100).to_bytes(4, "little") + b"WAVE"
        + b"LIST" + (3).to_bytes(4, "little") + b"abc\x00"
        + b"fmt " + (16).to_bytes(4, "little") + fmt
        + b"data" + (200).to_bytes(4, "little")
    )
    assert parse_media_header(wav) == (44100, 100)
    # compressed containers are honestly unsupported
    assert parse_media_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40) is None
    assert parse_media_header(None) is None


def test_real_decode_roundtrip(spark):
    from formula1_dataengineering_spark.sources.multimodal import (
        decode_media,
        demo_binary_media_from_documents,
    )
    from formula1_dataengineering_spark.sources.catalog import load

    docs = load(spark, "/root/testdata/sf0.001", "documents").limit(30)
    decoded = decode_media(demo_binary_media_from_documents(docs), fake=False)
    rows = {r["media_id"]: r for r in decoded.collect()}
    for r in docs.select("doc_id", "n_chars").collect():
        d = rows[r["doc_id"]]
        m = r["doc_id"] % 3
        if m == 0:
            assert (d["width"], d["height"]) == (
                r["n_chars"] % 64 + 1, r["doc_id"] % 48 + 1)
        elif m == 1:
            assert (d["width"], d["height"]) == (
                r["n_chars"] % 32 + 1, r["doc_id"] % 24 + 1)
        else:
            assert d["width"] == 8000 + r["doc_id"] % 8 * 500
            assert d["height"] == r["n_chars"]


def test_real_decode_rejects_unknown_container(spark):
    import pandas as pd
    import pyspark.errors

    from formula1_dataengineering_spark.sources.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
    )

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1],
                "kind": ["image"],
                "payload": [b"\x89PNG\r\n\x1a\n" + b"\x00" * 40],
                "meta": [{}],
            }
        ),
        schema=MEDIA_SCHEMA,
    )
    with pytest.raises(pyspark.errors.PySparkException, match="unsupported media container"):
        decode_media(media, fake=False).collect()


def test_container_roundtrip_property():
    """Property: any container the generator can build, the parser
    decodes to the exact dimensions — across degenerate sizes (1×1,
    single-sample audio) and row alignments."""
    from hypothesis import given, settings, strategies as st

    from formula1_dataengineering_spark.sources.multimodal import parse_media_header

    def bmp(w, h):
        row = ((w * 3 + 3) // 4) * 4
        pix = b"\x7f" * (row * h)
        info = (
            (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little") + len(pix).to_bytes(4, "little")
            + (2835).to_bytes(4, "little") * 2 + (0).to_bytes(4, "little") * 2
        )
        off = 14 + len(info)
        return (b"BM" + (off + len(pix)).to_bytes(4, "little")
                + (0).to_bytes(4, "little") + off.to_bytes(4, "little")
                + info + pix)

    def ppm(w, h):
        return f"P6\n{w} {h}\n255\n".encode() + b"\x40" * (w * h * 3)

    def wav(rate, n):
        fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
               + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
               + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
        data = b"\x00" * (n * 2)
        chunks = (b"fmt " + (16).to_bytes(4, "little") + fmt
                  + b"data" + len(data).to_bytes(4, "little") + data)
        return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks

    @settings(max_examples=120, deadline=None)
    @given(
        kind=st.sampled_from(["bmp", "ppm", "wav"]),
        a=st.integers(min_value=1, max_value=300),
        b=st.integers(min_value=1, max_value=200),
    )
    def check(kind, a, b):
        if kind == "bmp":
            assert parse_media_header(bmp(a, b)) == (a, b)
        elif kind == "ppm":
            assert parse_media_header(ppm(a, b)) == (a, b)
        else:
            rate = 4000 + a
            assert parse_media_header(wav(rate, b)) == (rate, b)

    check()


def test_png_builder_emits_valid_decodable_pngs(spark):
    """The PNG payloads are REAL: signature, CRC-correct chunks, and
    zlib-decompressible pixel data matching the declared dimensions —
    not just parser-compatible headers."""
    import struct
    import zlib

    from formula1_dataengineering_spark.sources.multimodal import (
        demo_png_media_from_documents,
        parse_media_header,
    )

    docs = spark.createDataFrame(
        [(5, 123), (29, 40), (0, 1)], "doc_id long, n_chars long"
    )
    rows = demo_png_media_from_documents(docs).collect()
    assert len(rows) == 3
    for r in rows:
        b = bytes(r.payload)
        assert b[:8] == b"\x89PNG\r\n\x1a\n"
        w_exp = (dict((d, n) for d, n in [(5, 123), (29, 40), (0, 1)])[r.media_id] % 40) + 1
        h_exp = r.media_id % 30 + 1
        assert parse_media_header(b) == (w_exp, h_exp)
        # walk chunks, verify CRCs, decompress IDAT
        i, idat = 8, b""
        while i < len(b):
            ln = struct.unpack(">I", b[i : i + 4])[0]
            tag = b[i + 4 : i + 8]
            body = b[i + 8 : i + 8 + ln]
            crc = struct.unpack(">I", b[i + 8 + ln : i + 12 + ln])[0]
            assert crc == (zlib.crc32(tag + body) & 0xFFFFFFFF), tag
            if tag == b"IDAT":
                idat += body
            i += 12 + ln
        raw = zlib.decompress(idat)
        assert len(raw) == (w_exp + 1) * h_exp  # filter byte + pixels per row
        assert all(raw[j * (w_exp + 1)] == 0 for j in range(h_exp))  # filter 0
