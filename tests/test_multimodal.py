"""Multimodal plumbing: payload-preserving transforms and fan-out shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_20251_steam_spark.operators import multimodal as mm
from bigdata_20251_steam_spark.sources.batch import load_table

from .conftest import SF_SMOKE


def _media(spark):
    return mm.to_media_frame(load_table(spark, SF_SMOKE, "documents"))


def test_resize_shapes(spark):
    media = _media(spark)
    out = mm.resize_media(media, width=8, height=8)
    assert out.count() == media.count()  # 1:1
    lens = out.select(F.octet_length("payload").alias("n")).distinct().collect()
    assert [r["n"] for r in lens] == [64]  # every payload exactly w*h bytes
    # content is a prefix of the original payload
    joined = out.alias("o").join(media.alias("m"), "doc_id").select(
        F.expr("substring(m.payload, 1, least(octet_length(m.payload), 64))").alias("pre"),
        F.expr("substring(o.payload, 1, least(octet_length(m.payload), 64))").alias("got"),
    )
    assert joined.filter(F.col("pre") != F.col("got")).count() == 0


def test_sample_frames_fanout(spark):
    media = _media(spark)
    frames = mm.sample_frames(media, every_n_bytes=256)
    expected = media.select(
        "doc_id",
        ((F.col("meta.n_bytes") - 1) / 256 + 1).cast("long").alias("n_frames"),
    )
    got = frames.groupBy("doc_id").count()
    diff = got.join(expected, "doc_id").filter(F.col("count") != F.col("n_frames"))
    assert diff.count() == 0
    # frame 0 holds the payload's first 16 bytes
    f0 = frames.filter(F.col("frame_idx") == 0).join(media, "doc_id").select(
        F.expr("substring(payload, 1, 16)").alias("pre"), "frame"
    )
    assert f0.filter(F.col("pre") != F.col("frame")).count() == 0


def test_real_decoder_contract(spark):
    media = _media(spark).limit(1)
    with pytest.raises(Exception, match="NotImplementedError|real image resize"):
        mm.resize_media(media, fake=False).collect()


# ---------------------------------------------------------------------------
# Real pixel decode: golden-pixel tests for the pure-Python PPM/BMP branch
# ---------------------------------------------------------------------------

GOLD_PX = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30), (0, 0, 0), (255, 255, 255)]


def _ppm_p6(w, h, px):
    return (f"P6\n# comment\n{w} {h}\n255\n").encode() + b"".join(
        bytes(p) for p in px
    )


def _ppm_p3(w, h, px):
    body = "\n".join(f"{r} {g} {b}" for r, g, b in px)
    return f"P3\n{w} {h}\n255\n{body}\n".encode()


def _bmp24(w, h, px, top_down=False):
    """Minimal BITMAPINFOHEADER 24bpp BMP; px is row-major top-down RGB."""
    import struct

    stride = (w * 3 + 3) & ~3
    rows = [px[r * w : (r + 1) * w] for r in range(h)]
    if not top_down:
        rows = rows[::-1]  # positive height stores bottom-up
    body = b"".join(
        b"".join(bytes((b, g, r)) for r, g, b in row).ljust(stride, b"\0")
        for row in rows
    )
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h if not top_down else -h, 1, 24, 0,
        len(body), 2835, 2835, 0, 0,
    )
    return hdr + body


@pytest.mark.parametrize(
    "enc",
    [_ppm_p6, _ppm_p3, _bmp24, lambda w, h, px: _bmp24(w, h, px, top_down=True)],
    ids=["ppm_p6", "ppm_p3", "bmp_bottom_up", "bmp_top_down"],
)
def test_decode_image_golden_pixels(enc):
    w, h = 3, 2  # width 3 forces BMP row padding (9 -> 12 bytes)
    got_w, got_h, got_px = mm.decode_image(enc(w, h, GOLD_PX))
    assert (got_w, got_h) == (w, h)
    assert got_px == GOLD_PX


def test_decode_real_feature_vector():
    feats = mm.decode_real(_ppm_p6(3, 2, GOLD_PX), "image/x-portable-pixmap")
    lumas = [(299 * r + 587 * g + 114 * b) // 1000 for r, g, b in GOLD_PX]
    assert feats == [
        3.0, 2.0, 6.0,
        sum(p[0] for p in GOLD_PX) / 6,
        sum(p[1] for p in GOLD_PX) / 6,
        sum(p[2] for p in GOLD_PX) / 6,
        float(min(lumas)), float(max(lumas)),
    ]
    with pytest.raises(NotImplementedError):
        mm.decode_real(b"\x89PNG....", "image/png")


def test_decode_features_routes_real_and_fake(spark):
    """End-to-end mapInPandas run: PPM/BMP payloads take the REAL pixel
    branch, other payloads the deterministic fake — in one batch."""
    rows = [
        (1, _ppm_p6(3, 2, GOLD_PX), "image/x-portable-pixmap"),
        (2, _bmp24(3, 2, GOLD_PX), "image/bmp"),
        (3, b"just some text", "text/plain"),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    )
    got = {r["doc_id"]: r for r in mm.decode_features(media).collect()}
    assert got[1]["decoder"] == "ppm-bmp-pixel"
    assert got[2]["decoder"] == "ppm-bmp-pixel"
    assert got[3]["decoder"] == "fake-moments"
    # PPM and BMP encode the same image -> identical pixel features
    assert got[1]["feature"] == got[2]["feature"]
    assert got[1]["feature"][:3] == [3.0, 2.0, 6.0]
    assert got[3]["n_bytes"] == len(b"just some text")
