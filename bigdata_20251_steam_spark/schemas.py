"""Explicit schemas for every record shape the engine handles.

The reference declares fixed ``StructType`` schemas at JSON-parse time and
never infers (``k8s/spark-apps/kafka-spark-configmap.yaml:29-40,148-154,
231-235``).  We keep that discipline: schema-on-read with explicit types,
projection happens in queries, never silently at parse.

Two families:

1. **Reference-domain schemas** — the Steam pipeline's three stream record
   shapes.  REVIEW_SCHEMA / GAME_INFO_SCHEMA / PLAYER_COUNT_SCHEMA model the
   *full producer-side* schema (``producers/steam_utils.py:156-200``), which
   is richer than what the reference's consumers project down to; our
   engine models the full shape and projects in queries (SURVEY.md §1.2).

2. **Testdata schemas** — the driver-generated TPC-H-ish tables at
   ``/root/testdata/sf*/`` that the correctness oracle runs against.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Reference-domain record schemas (SURVEY.md §1.3)
# ---------------------------------------------------------------------------

#: One message per review — Kafka topic ``game_comments``.
#: Producer dict: steam_utils.py:156-169; consumer StructType:
#: kafka-spark-configmap.yaml:29-40 (consumer drops playtime_* fields —
#: we keep them; queries project).
REVIEW_SCHEMA = StructType(
    [
        StructField("app_id", StringType(), False),
        StructField("review_id", StringType(), False),
        StructField("author_steamid", StringType(), True),
        StructField("playtime_at_review", LongType(), True),
        StructField("playtime_forever", LongType(), True),
        StructField("language", StringType(), True),
        StructField("voted_up", BooleanType(), True),
        StructField("votes_up", IntegerType(), True),
        StructField("weighted_vote_score", FloatType(), True),
        StructField("timestamp_created", IntegerType(), True),  # epoch seconds
        StructField("review_text", StringType(), True),
        StructField("scraped_at", StringType(), True),  # ISO-8601
    ]
)

#: One message per app — Kafka topic ``game_info``.
#: Full producer shape (steam_utils.py:183-200) including the nested
#: price_overview struct and array columns the reference's consumer drops
#: (kafka-spark-configmap.yaml:148-154 keeps only 5 fields).
PRICE_OVERVIEW_SCHEMA = StructType(
    [
        StructField("currency", StringType(), True),
        StructField("initial", IntegerType(), True),
        StructField("final", IntegerType(), True),
        StructField("discount_percent", IntegerType(), True),
    ]
)

GAME_INFO_SCHEMA = StructType(
    [
        StructField("appid", IntegerType(), False),
        StructField("name", StringType(), True),
        StructField("primary_genre", StringType(), True),
        StructField("type", StringType(), True),
        StructField("release_date", StringType(), True),
        StructField("is_free", BooleanType(), True),
        StructField("short_description", StringType(), True),
        StructField("developers", ArrayType(StringType()), True),
        StructField("publishers", ArrayType(StringType()), True),
        StructField("genres", ArrayType(StringType()), True),
        StructField("price_overview", PRICE_OVERVIEW_SCHEMA, True),
        StructField("categories", ArrayType(StringType()), True),
        StructField("metacritic", IntegerType(), True),
        StructField("recommendations", IntegerType(), True),
        StructField("achievements_count", IntegerType(), True),
        StructField("timestamp_scraped", StringType(), True),  # ISO-8601
    ]
)

#: One sample per (app, ~5 min) — Kafka topic ``game_player_count``.
#: producer_players.py:31-35 / kafka-spark-configmap.yaml:231-235.
PLAYER_COUNT_SCHEMA = StructType(
    [
        StructField("appid", IntegerType(), False),
        StructField("player_count", IntegerType(), False),
        StructField("timestamp", StringType(), False),  # ISO-8601
    ]
)

#: CSV fixture shape (inputs/reviews/steam_reviews_*.csv:1) — the batch
#: variant of the review stream; quoted multiline review text.
REVIEW_CSV_SCHEMA = StructType(
    [
        StructField("review_id", StringType(), False),
        StructField("author", StringType(), True),
        StructField("language", StringType(), True),
        StructField("recommended", StringType(), True),  # "True"/"False" strings
        StructField("steam_purchase", StringType(), True),
        StructField("votes_up", IntegerType(), True),
        StructField("weighted_vote_score", DoubleType(), True),
        StructField("timestamp", StringType(), True),  # "YYYY-MM-DD HH:MM:SS"
        StructField("review", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Serving-table (output) schemas (SURVEY.md §1.4)
# ---------------------------------------------------------------------------

WINDOW_SCHEMA = StructType(
    [
        StructField("start", TimestampType(), True),
        StructField("end", TimestampType(), True),
    ]
)

#: steam_reviews hot table: kafka-spark-configmap.yaml:68-74
SENTIMENT_WINDOW_SCHEMA = StructType(
    [
        StructField("window", WINDOW_SCHEMA, False),
        StructField("recommended", BooleanType(), True),
        StructField("total_reviews", LongType(), False),
        StructField("avg_quality", DoubleType(), True),
    ]
)

#: review_bomb_alerts hot table: kafka-spark-configmap.yaml:79-92
REVIEW_BOMB_SCHEMA = StructType(
    [
        StructField("app_id", StringType(), False),
        StructField("total_reviews", LongType(), False),
        StructField("negative_count", LongType(), False),
        StructField("positive_count", LongType(), False),
        StructField("avg_quality", DoubleType(), True),
        StructField("negative_ratio", DoubleType(), True),
        StructField("positive_ratio", DoubleType(), True),
        StructField("is_review_bomb", BooleanType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata schemas (/root/testdata/sf*/, see TESTDATA.md)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: events.props is a JSON string like '{"k": 87}' — parsed with this schema
#: (the A3 "JSON parse with explicit schema" operator).
EVENT_PROPS_SCHEMA = StructType([StructField("k", IntegerType(), True)])
