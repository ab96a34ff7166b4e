"""The reference's three streaming applications, as library functions.

Each pipeline takes a Kafka-shaped DataFrame — a ``value`` column holding
JSON (binary or string), batch or streaming — and returns the derived
DataFrames the reference materializes.  The caller picks sinks
(``engine.dual_sink_writer`` for the dual cold/hot pattern, or
``run_available_now`` in tests).

Pipeline -> reference app mapping (SURVEY.md §3):

- ``reviews_pipeline``  ~ process_reviews.py (kafka-spark-configmap.yaml:10-123)
- ``charts_pipeline``   ~ process_charts.py  (:129-206)
- ``players_pipeline``  ~ process_players.py (:212-286)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.core import explode_counts, review_bomb, sentiment_windows
from ..schemas import GAME_INFO_SCHEMA, PLAYER_COUNT_SCHEMA, REVIEW_SCHEMA
from ..sources.batch import parse_json_records


def reviews_pipeline(
    raw: DataFrame,
    watermark: str = "10 minutes",
    window: str = "1 hour",
    bomb_threshold: float = 0.8,
    bomb_min_reviews: int = 10,
) -> dict[str, DataFrame]:
    """game_comments topic -> parsed bronze + hourly sentiment + review bombs.

    Parse (A2/A3) -> project/rename/cast (B1/B2) -> three derived plans
    (kafka-spark-configmap.yaml:58-92).  ``analytics`` carries the reference
    watermark (G1, :69); ``review_bomb`` is the deliberately-unwatermarked
    all-time aggregate (G5, :76-92).
    """
    parsed = parse_json_records(raw, REVIEW_SCHEMA).select(
        "app_id",
        "review_id",
        F.col("voted_up").alias("recommended"),
        F.col("votes_up"),
        F.col("weighted_vote_score"),
        F.col("timestamp_created").cast("timestamp").alias("timestamp"),
    )
    analytics_src = parsed
    if watermark:
        analytics_src = parsed.withWatermark("timestamp", watermark)
    analytics = sentiment_windows(
        analytics_src,
        ts_col="timestamp",
        flag_col=F.col("recommended"),
        quality_col="weighted_vote_score",
        window_duration=window,
    )
    bombs = review_bomb(
        parsed,
        key_col="app_id",
        negative_col=~F.col("recommended"),
        quality_col="weighted_vote_score",
        ratio_threshold=bomb_threshold,
        min_reviews=bomb_min_reviews,
    )
    return {"bronze": parsed, "analytics": analytics, "review_bomb": bombs}


def charts_pipeline(raw: DataFrame) -> dict[str, DataFrame]:
    """game_info topic -> parsed bronze + genre distribution.

    Parse with array schema (:148-154) -> ISO-string->timestamp cast (B3,
    :175) -> explode(genres) + grouped count (F1/C6, :179-185).  No
    watermark/window in the reference — a running global aggregate.
    """
    parsed = parse_json_records(raw, GAME_INFO_SCHEMA).select(
        "appid",
        "name",
        "type",
        "genres",
        F.col("timestamp_scraped").cast("timestamp").alias("timestamp"),
    )
    genres = explode_counts(parsed, F.col("genres"), "genre")
    return {"bronze": parsed, "genre_counts": genres}


def players_pipeline(
    raw: DataFrame,
    watermark: str = "5 minutes",
    window: str = "10 minutes",
) -> dict[str, DataFrame]:
    """game_player_count topic -> parsed bronze + 10-min activity windows.

    3-field parse (:231-235) -> cast (:254) -> watermark 5m (G1, :260) ->
    window(10m) x appid with max/avg (C2, :259-265).
    """
    parsed = parse_json_records(raw, PLAYER_COUNT_SCHEMA).select(
        "appid",
        "player_count",
        F.col("timestamp").cast("timestamp").alias("timestamp"),
    )
    src = parsed.withWatermark("timestamp", watermark) if watermark else parsed
    windows = (
        src.groupBy(F.window("timestamp", window).alias("w"), "appid")
        .agg(
            F.max("player_count").alias("max_players"),
            F.avg("player_count").alias("avg_players"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "appid",
            "max_players",
            F.round("avg_players", 6).alias("avg_players"),
        )
    )
    return {"bronze": parsed, "activity": windows}
