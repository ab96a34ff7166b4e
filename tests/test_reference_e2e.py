"""End-to-end: the reference's own captured fixtures through the FULL
streaming pipeline (VERDICT r1 "Next round" #7).

Replays ``inputs/reviews/steam_reviews_*.csv`` exactly the way the
reference's system does end-to-end:

    CSV fixture -> producer record (steam_utils.py:156-169 shape)
    -> Kafka wire (key, JSON value)          [to_kafka_records, A9]
    -> streaming source, multiple micro-batches [file_stream stand-in, A1]
    -> parse with REVIEW_SCHEMA              [reviews_pipeline, A2/A3]
    -> dual sink: bronze append + hot snapshot  [dual_sink_writer, A4/A5/G8]
    -> serving tables queried in demo-queries.js shapes

Golden assertions: the streamed serving tables must equal the same
aggregates computed directly over the batch CSVs — full-pipeline
batch/stream parity on the reference's real data, not synthetic rows.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_20251_steam_spark.operators.core import review_bomb, sentiment_windows
from bigdata_20251_steam_spark.schemas import REVIEW_SCHEMA
from bigdata_20251_steam_spark.sources.batch import read_review_csv
from bigdata_20251_steam_spark.sources.kafka import to_kafka_records
from bigdata_20251_steam_spark.streaming.engine import (
    DualSinkPaths,
    dual_sink_writer,
    file_stream,
)
from bigdata_20251_steam_spark.streaming.pipelines import reviews_pipeline

_REVIEWS_DIR = "/root/reference/inputs/reviews"
_APP_IDS = (730, 3948510, 3949040)

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(_REVIEWS_DIR), reason="reference fixtures not present"
)


def _producer_records(spark: SparkSession) -> DataFrame:
    """CSV fixtures -> the producer's per-review record shape.

    The reference's producer reads these CSVs and emits one JSON message
    per review keyed by appid (producers/steam_utils.py:156-169,
    RUNNING_PRODUCERS.md); the app id comes from the filename, not the
    CSV columns.
    """
    frames = []
    for app_id in _APP_IDS:
        csv = read_review_csv(
            spark, f"{_REVIEWS_DIR}/steam_reviews_{app_id}.csv"
        )
        frames.append(
            csv.select(
                F.lit(str(app_id)).alias("app_id"),
                F.col("review_id").cast("string").alias("review_id"),
                F.col("author").alias("author_steamid"),
                F.lit(None).cast("long").alias("playtime_at_review"),
                F.lit(None).cast("long").alias("playtime_forever"),
                "language",
                F.col("recommended").cast("boolean").alias("voted_up"),
                F.col("votes_up").cast("int").alias("votes_up"),
                F.col("weighted_vote_score").cast("float").alias(
                    "weighted_vote_score"
                ),
                F.unix_timestamp("timestamp").cast("int").alias(
                    "timestamp_created"
                ),
                F.col("review").alias("review_text"),
                F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss")
                .alias("scraped_at"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


@needs_fixtures
def test_reference_fixtures_full_streaming_round_trip(spark, tmp_path):
    # --- produce: CSV -> Kafka wire shape, staged as a file stream ------
    # keyed by appid (steam_utils.py:90-97) with app_id ALSO in the JSON
    # body, which is what REVIEW_SCHEMA's consumer parse expects
    records = _producer_records(spark).withColumn("kafka_key", F.col("app_id"))
    wire = to_kafka_records(records, key_col="kafka_key")
    staging = str(tmp_path / "wire")
    # several files => several micro-batches under maxFilesPerTrigger=1:
    # the snapshot-overwrite semantics get exercised across epochs, not
    # just once
    wire.repartition(4).write.mode("overwrite").parquet(staging)

    # --- consume: stream -> parse -> dual sink --------------------------
    stream = file_stream(
        spark,
        staging,
        wire.schema,
        max_files_per_trigger=1,
    )
    bronze_stream = reviews_pipeline(stream)["bronze"]
    paths = DualSinkPaths(
        bronze_dir=str(tmp_path / "bronze"),
        serving_dir=str(tmp_path / "steam_reviews"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    def serving_agg(bronze: DataFrame) -> DataFrame:
        return sentiment_windows(
            bronze,
            ts_col="timestamp",
            flag_col=F.col("recommended"),
            quality_col="weighted_vote_score",
            window_duration="1 hour",
        )

    q = dual_sink_writer(bronze_stream, paths, serving_agg)
    q.awaitTermination()

    # --- bronze (cold store): every fixture record survived -------------
    bronze = spark.read.parquet(paths.bronze_dir)
    assert bronze.count() == 1148  # 500 + 148 + 500 logical CSV records
    assert {r["app_id"] for r in bronze.select("app_id").distinct().collect()} \
        == {str(a) for a in _APP_IDS}
    # multiline review text survived CSV -> JSON -> stream -> parquet
    assert bronze.filter(F.col("review_id") == "208961474").count() == 1

    # --- serving table == batch golden (stream/batch parity) ------------
    golden_bronze = reviews_pipeline(wire)["bronze"]  # same plan, batch input
    golden = sorted(
        map(tuple, serving_agg(golden_bronze).collect())
    )
    served = sorted(map(tuple, spark.read.parquet(paths.serving_dir).collect()))
    assert served == golden
    assert len(served) > 0

    # --- demo-queries.js query 1 shape: latest 10 review windows --------
    serving = spark.read.parquet(paths.serving_dir)
    latest10 = (
        serving.orderBy(F.col("window_start").desc())
        .limit(10)
        .select(
            F.concat(
                F.date_format("window_start", "yyyy-MM-dd HH:mm"),
                F.lit(" -> "),
                F.date_format("window_end", "HH:mm"),
            ).alias("time_window"),
            F.when(F.col("recommended"), "Positive").otherwise("Negative")
            .alias("sentiment"),
            "total_reviews",
            F.round("avg_quality", 3).alias("avg_quality"),
        )
        .collect()
    )
    assert len(latest10) == 10
    assert all(r["sentiment"] in ("Positive", "Negative") for r in latest10)

    # --- demo-queries.js query 4 shape: sentiment distribution ----------
    dist = {
        r["recommended"]: r
        for r in serving.groupBy("recommended")
        .agg(
            F.count("*").alias("total_windows"),
            F.sum("total_reviews").alias("total_reviews"),
        )
        .collect()
    }
    assert set(dist) == {True, False}
    assert sum(r["total_reviews"] for r in dist.values()) == 1148

    # --- review-bomb serving table from the same bronze ------------------
    def bombs(df: DataFrame) -> DataFrame:
        return review_bomb(
            df,
            key_col="app_id",
            negative_col=~F.col("recommended"),
            quality_col="weighted_vote_score",
        )

    got_bombs = sorted(map(tuple, bombs(bronze).collect()))
    want_bombs = sorted(map(tuple, bombs(golden_bronze).collect()))
    assert got_bombs == want_bombs
    assert len(got_bombs) == len(_APP_IDS)
    bomb_cols = [f.name for f in bombs(bronze).schema.fields]
    assert bomb_cols == [
        "app_id", "total_reviews", "negative_count", "positive_count",
        "avg_quality", "negative_ratio", "positive_ratio", "is_review_bomb",
    ]


_CHARTS_CSV = "/root/reference/inputs/charts/steamcharts_24h.csv"


@needs_fixtures
def test_charts_fixture_through_players_pipeline(spark, tmp_path):
    """The players app path on the real charts fixture: CSV -> producer
    JSON (producer_players.py shape: appid/player_count/timestamp) ->
    wire -> players_pipeline -> activity windows (stream/batch parity)."""
    import datetime as dt

    from bigdata_20251_steam_spark.streaming.engine import run_available_now
    from bigdata_20251_steam_spark.streaming.pipelines import players_pipeline

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    charts = (
        spark.read.option("header", True).csv(_CHARTS_CSV)
        .select(
            F.col("appid").cast("int").alias("appid"),
            F.col("player_count").cast("int").alias("player_count"),
        )
        # the producer samples every ~5 min and stamps scrape time; spread
        # rows across two 10-minute windows deterministically by row hash
        .withColumn(
            "timestamp",
            F.date_format(
                F.lit(base)
                + F.make_interval(
                    mins=(F.crc32(F.col("appid").cast("string")) % 20).cast("int")
                ),
                "yyyy-MM-dd'T'HH:mm:ss",
            ),
        )
    )
    wire = to_kafka_records(
        charts.withColumn("kafka_key", F.col("appid")), key_col="kafka_key"
    )
    staged = str(tmp_path / "charts_wire")
    wire.write.parquet(staged)

    stream = file_stream(spark, staged, wire.schema)
    streamed = players_pipeline(stream)
    got_bronze = run_available_now(streamed["bronze"], output_mode="append")
    assert got_bronze.count() == 2578  # every fixture row parsed
    got_windows = run_available_now(streamed["activity"], output_mode="complete")

    batch = players_pipeline(wire, watermark=None)
    want_windows = batch["activity"]
    assert sorted(map(tuple, got_windows.collect())) == sorted(
        map(tuple, want_windows.collect())
    )
    # demo-queries.js query 3 shape: per-app rollup of the windows table
    trends = (
        got_windows.groupBy("appid")
        .agg(
            F.count("*").alias("total_windows"),
            F.max("max_players").alias("peak_players"),
            F.round(F.avg("avg_players"), 6).alias("overall_avg_players"),
            F.max("window_end").alias("latest_window"),
        )
        .orderBy(F.col("peak_players").desc(), F.col("appid").asc())
        .limit(10)
    )
    rows = trends.collect()
    assert len(rows) == 10
    assert rows[0]["peak_players"] == charts.agg(F.max("player_count")).collect()[0][0]
