"""Ingest-side ETL operators: the reference's producer-side Python
re-expressed as DataFrame transforms (SURVEY.md §2.B: B14-B17, F2).

The reference flattens raw Steam ``appdetails`` API JSON driver-side in
plain Python (``producers/steam_utils.py:175-200``): nested structs are
projected (``release_date.date``, ``metacritic.score``), list-of-dict
columns become list-of-string (``[g["description"] for g in genres]``),
and missing values get defaults.  Here the same shape runs distributed —
``from_json`` with an explicit nested schema, struct-field access,
``transform`` lambdas, and ``coalesce`` defaults, all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..schemas import PRICE_OVERVIEW_SCHEMA

#: Raw Steam appdetails API shape BEFORE flattening — what the producer's
#: ``data`` dict holds (steam_utils.py:175-200 reads these paths).
_ID_DESC = ArrayType(
    StructType(
        [
            StructField("id", StringType(), True),
            StructField("description", StringType(), True),
        ]
    )
)

RAW_APPDETAILS_SCHEMA = StructType(
    [
        StructField("name", StringType(), True),
        StructField("type", StringType(), True),
        StructField(
            "release_date",
            StructType(
                [
                    StructField("coming_soon", BooleanType(), True),
                    StructField("date", StringType(), True),
                ]
            ),
            True,
        ),
        StructField("is_free", BooleanType(), True),
        StructField("short_description", StringType(), True),
        StructField("developers", ArrayType(StringType()), True),
        StructField("publishers", ArrayType(StringType()), True),
        StructField("genres", _ID_DESC, True),
        StructField("categories", _ID_DESC, True),
        StructField("price_overview", PRICE_OVERVIEW_SCHEMA, True),
        StructField(
            "metacritic",
            StructType([StructField("score", IntegerType(), True)]),
            True,
        ),
        StructField(
            "recommendations",
            StructType([StructField("total", IntegerType(), True)]),
            True,
        ),
        StructField(
            "achievements",
            StructType([StructField("total", IntegerType(), True)]),
            True,
        ),
    ]
)


def _descriptions(col: Column) -> Column:
    """List-of-struct -> list-of-description (F2: steam_utils.py:193,195)."""
    return F.coalesce(
        F.transform(col, lambda g: g["description"]),
        F.array().cast("array<string>"),
    )


def flatten_app_details(
    raw: DataFrame, appid_col: str = "appid", json_col: str = "raw_json"
) -> DataFrame:
    """Raw appdetails JSON string -> the flat GAME_INFO record (B15/B16).

    Distributed twin of ``steam_utils.flatten_app_data``
    (steam_utils.py:175-200) including its defaults: fallback name
    ``App <appid>``, empty arrays for missing lists, ``primary_genre`` =
    first genre description or null.
    """
    d = F.from_json(F.col(json_col), RAW_APPDETAILS_SCHEMA)
    return raw.select(
        F.col(appid_col).cast("int").alias("appid"),
        F.coalesce(d["name"], F.concat(F.lit("App "), F.col(appid_col))).alias("name"),
        # try_element_at: null (not an ANSI error) for apps with no genres
        F.try_element_at(_descriptions(d["genres"]), F.lit(1)).alias("primary_genre"),
        F.coalesce(d["type"], F.lit("unknown")).alias("type"),
        d["release_date"]["date"].alias("release_date"),
        F.coalesce(d["is_free"], F.lit(False)).alias("is_free"),
        d["short_description"].alias("short_description"),
        F.coalesce(d["developers"], F.array().cast("array<string>")).alias("developers"),
        F.coalesce(d["publishers"], F.array().cast("array<string>")).alias("publishers"),
        _descriptions(d["genres"]).alias("genres"),
        d["price_overview"].alias("price_overview"),
        d["metacritic"]["score"].alias("metacritic"),
        d["recommendations"]["total"].alias("recommendations"),
        F.coalesce(d["achievements"]["total"], F.lit(0)).alias("achievements_count"),
    )


def valid_appids(lines: DataFrame, col: str = "value") -> DataFrame:
    """Digit-line validation (B17: steam_utils.py:50-56) — trim, keep
    all-digit lines, cast to int."""
    trimmed = F.trim(F.col(col))
    return (
        lines.select(trimmed.alias("raw"))
        .filter(F.col("raw").rlike("^[0-9]+$"))
        .select(F.col("raw").cast("int").alias("appid"))
    )


def quarantine_invalid(df, rules):
    """Split rows into (valid, quarantined) by named data-quality rules.

    ``rules`` maps rule name -> boolean Column that is True for GOOD
    rows.  Valid rows pass every rule; quarantined rows carry a
    ``failed_rules`` array naming each violated rule, which is what an
    operator actually needs to triage a bad batch (vs a bare filter
    that silently drops).  The classic serving-layer gate: bronze stays
    raw, only validated rows reach the hot store, rejects land in a
    quarantine table with reasons.

    A rule evaluating to NULL (e.g. ``col > 0`` on a null column) counts
    as FAILED, not passed: ``~cond`` on NULL is NULL, which ``when``
    treats as no-match, so the naive form silently admits indeterminate
    rows to ``valid`` — the null-safe ``<=> TRUE`` comparison makes
    anything other than an affirmative pass a violation.

    Single pass, no shuffle: both outputs are filters over the same
    projection, and Spark reuses the scan across the two writes when
    persisted by the caller.
    """
    from pyspark.sql import functions as F

    failed = F.array_compact(
        F.array(
            *[
                F.when(~cond.eqNullSafe(F.lit(True)), F.lit(name)).otherwise(
                    F.lit(None)
                )
                for name, cond in sorted(rules.items())
            ]
        )
    )
    tagged = df.withColumn("failed_rules", failed)
    valid = tagged.filter(F.size("failed_rules") == 0).drop("failed_rules")
    quarantined = tagged.filter(F.size("failed_rules") > 0)
    return valid, quarantined
