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
