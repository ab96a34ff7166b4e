"""Source/ingest adapters: multiline CSV fixtures (A7), Kafka wire shape
(A9), raw appdetails flatten (B15/B16/F2), appid validation (B17).

The CSV tests replay the reference's own captured fixtures
(``/root/reference/inputs/`` — read-only) through ``read_review_csv``,
the deterministic batch stand-in for the review stream.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bigdata_20251_steam_spark.operators.ingest import (
    flatten_app_details,
    valid_appids,
)
from bigdata_20251_steam_spark.sources.batch import parse_json_records, read_review_csv
from bigdata_20251_steam_spark.sources.kafka import to_kafka_records

_REVIEWS_DIR = "/root/reference/inputs/reviews"
_CHARTS_CSV = "/root/reference/inputs/charts/steamcharts_24h.csv"

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(_REVIEWS_DIR), reason="reference fixtures not present"
)


@needs_fixtures
def test_review_csv_multiline(spark):
    # steam_reviews_730.csv embeds newlines/Unicode inside quoted review
    # text (SURVEY.md §7 risk #4): row count must match logical records
    # (500/148/500 per app), not physical lines.
    df = read_review_csv(spark, f"{_REVIEWS_DIR}/steam_reviews_730.csv")
    assert df.count() == 500
    all3 = read_review_csv(spark, _REVIEWS_DIR)
    assert all3.count() == 1148
    # multiline reviews survive as single fields
    assert all3.filter(F.col("review").contains("\n")).count() > 0
    # recommended arrives as "True"/"False" strings -> boolean cast works
    flags = all3.select(F.col("recommended").cast("boolean").alias("r"))
    assert flags.filter(F.col("r").isNull()).count() == 0


@needs_fixtures
def test_charts_csv(spark):
    df = (
        spark.read.option("header", True)
        .csv(_CHARTS_CSV)
        .select(
            F.col("appid").cast("int").alias("appid"),
            F.col("player_count").cast("int").alias("player_count"),
        )
    )
    assert df.count() == 2578
    assert df.filter(F.col("player_count").isNull()).count() == 0


def test_kafka_roundtrip(spark):
    # to_kafka_records (A9) must invert through parse_json_records (A2+A3)
    src = spark.createDataFrame(
        [(730, "CS2", 1500000), (570, "Dota 2", 800000)],
        "appid int, name string, player_count int",
    )
    wire = to_kafka_records(src, key_col="appid")
    assert wire.columns == ["key", "value"]
    rows = {r["key"]: json.loads(r["value"]) for r in wire.collect()}
    assert rows["730"] == {"name": "CS2", "player_count": 1500000}
    parsed = parse_json_records(
        wire, spark.createDataFrame([], "name string, player_count int").schema
    )
    assert {r["name"] for r in parsed.collect()} == {"CS2", "Dota 2"}


def test_flatten_app_details(spark):
    full = {
        "name": "Half-Life 3",
        "type": "game",
        "release_date": {"coming_soon": False, "date": "1 Jan, 2030"},
        "is_free": False,
        "short_description": "finally",
        "developers": ["Valve"],
        "publishers": ["Valve"],
        "genres": [
            {"id": "1", "description": "Action"},
            {"id": "37", "description": "FPS"},
        ],
        "categories": [{"id": "2", "description": "Single-player"}],
        "price_overview": {
            "currency": "USD", "initial": 5999, "final": 2999,
            "discount_percent": 50,
        },
        "metacritic": {"score": 99},
        "recommendations": {"total": 123456},
        "achievements": {"total": 42},
    }
    sparse = {"type": "demo"}  # exercises every default (B15)
    raw = spark.createDataFrame(
        [(10, json.dumps(full)), (20, json.dumps(sparse))],
        "appid int, raw_json string",
    )
    out = {r["appid"]: r.asDict() for r in flatten_app_details(raw).collect()}
    assert out[10]["name"] == "Half-Life 3"
    assert out[10]["genres"] == ["Action", "FPS"]  # F2 list-of-struct -> str
    assert out[10]["primary_genre"] == "Action"
    assert out[10]["release_date"] == "1 Jan, 2030"
    assert out[10]["metacritic"] == 99
    assert out[10]["price_overview"]["final"] == 2999
    assert out[10]["achievements_count"] == 42
    assert out[20]["name"] == "App 20"  # fallback name (steam_utils.py:185)
    assert out[20]["genres"] == []
    assert out[20]["primary_genre"] is None
    assert out[20]["is_free"] is False
    assert out[20]["achievements_count"] == 0


def test_valid_appids(spark):
    lines = spark.createDataFrame(
        [("730",), (" 570 ",), ("",), ("# comment",), ("12ab",), ("440",)],
        "value string",
    )
    got = sorted(r["appid"] for r in valid_appids(lines).collect())
    assert got == [440, 570, 730]


def test_jsonl_round_trip_with_split_partitioning(spark, tmp_path):
    """JSONL delivery: hash-split docs -> partitioned gzip shards -> read
    back schema-first with full fidelity (incl. multiline-unsafe text)."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from bigdata_20251_steam_spark.operators.sampling import hash_split
    from bigdata_20251_steam_spark.sources.batch import read_jsonl, write_jsonl

    docs = spark.createDataFrame(
        [
            (1, 'text with "quotes" and\ttabs'),
            (2, "unicode: привет 你好"),
            (3, "newline\\n literal backslash"),
        ] + [(i, f"doc {i}") for i in range(10, 40)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "delivery")
    write_jsonl(
        hash_split(docs, "doc_id").repartition(2),
        out,
        partition_cols=("split",),
    )
    import glob

    shards = glob.glob(f"{out}/split=*/part-*.json.gz")
    assert shards, "expected partitioned gzip shards"

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    back = read_jsonl(spark, out, schema)
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    want = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got == want
    # malformed line degrades to nulls, never fails the read (PERMISSIVE)
    bad = tmp_path / "bad.jsonl"
    bad.write_text('{"doc_id": 1, "text": "ok"}\n{broken json\n')
    parsed = read_jsonl(spark, str(bad), schema).collect()
    assert len(parsed) == 2
    assert sorted([r["doc_id"] for r in parsed], key=lambda x: (x is None, x)) \
        == [1, None]
