"""Core reference-parity operators.

Each function is a pure ``DataFrame -> DataFrame`` transform, generic over
column names so the same operator serves the Steam-domain schemas
(SURVEY.md §1.3) and the driver testdata (``events`` etc.).  All logic is
built-in ``pyspark.sql.functions`` — zero Python UDFs — so every operator
stays inside whole-stage codegen and Catalyst can push projections/filters
into the scan.  These work identically on batch and streaming inputs; the
streaming layer adds watermarks and sinks around them.

Scale notes (100 TB posture):

- Every operator here is a single ``groupBy().agg()`` => exactly one
  shuffle, with map-side partial aggregation (``HashAggregateExec``
  partial/final pair).  Group keys are low-cardinality (windows x apps,
  genres), so the reduced side is tiny regardless of input size.
- ``explode_counts`` explodes *after* projecting down to the single array
  column, so the shuffle carries ``(token)`` rows, not whole records.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sentiment_windows(
    df: DataFrame,
    ts_col: str,
    flag_col: Column,
    quality_col: str,
    window_duration: str = "1 hour",
) -> DataFrame:
    """Tumbling-window sentiment aggregation.

    Re-expresses the reference's hourly review analytics
    (``kafka-spark-configmap.yaml:68-74``): group by tumbling window +
    recommended flag, emit count + avg quality.  The window struct is
    flattened to ``window_start`` / ``window_end`` columns so results are
    plain-SQL comparable.
    """
    return (
        df.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            flag_col.alias("recommended"),
        )
        .agg(
            F.count("*").alias("total_reviews"),
            F.avg(quality_col).alias("avg_quality"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "recommended",
            "total_reviews",
            F.round("avg_quality", 6).alias("avg_quality"),
        )
    )


def review_bomb(
    df: DataFrame,
    key_col: str,
    negative_col: Column,
    quality_col: str,
    ratio_threshold: float = 0.8,
    min_reviews: int = 10,
) -> DataFrame:
    """Per-key review-bomb detection (unbounded, non-windowed aggregate).

    Re-expresses ``kafka-spark-configmap.yaml:79-92``: per app_id totals,
    conditional positive/negative counts (C4: ``sum(when(...))``), derived
    ratio columns (B4) and the conjunctive boolean flag (B5).  Reference
    defaults: negative_ratio > 0.8 AND total > 10.
    """
    neg = negative_col
    out = (
        df.groupBy(F.col(key_col).alias("app_id"))
        .agg(
            F.count("*").alias("total_reviews"),
            F.sum(F.when(neg, 1).otherwise(0)).alias("negative_count"),
            F.sum(F.when(~neg, 1).otherwise(0)).alias("positive_count"),
            F.avg(quality_col).alias("avg_quality_raw"),
        )
        .withColumn(
            "negative_ratio", F.col("negative_count") / F.col("total_reviews")
        )
        .withColumn(
            "positive_ratio", F.col("positive_count") / F.col("total_reviews")
        )
        .withColumn(
            "is_review_bomb",
            F.when(
                (F.col("negative_ratio") > ratio_threshold)
                & (F.col("total_reviews") > min_reviews),
                True,
            ).otherwise(False),
        )
    )
    return out.select(
        "app_id",
        "total_reviews",
        "negative_count",
        "positive_count",
        F.round("avg_quality_raw", 6).alias("avg_quality"),
        F.round("negative_ratio", 6).alias("negative_ratio"),
        F.round("positive_ratio", 6).alias("positive_ratio"),
        "is_review_bomb",
    )


def explode_counts(df: DataFrame, array_col: Column, out_name: str) -> DataFrame:
    """Explode an array column and count occurrences per element.

    The reference's flagship array op: ``explode(genres)`` then
    ``groupBy("genre").count()`` (``kafka-spark-configmap.yaml:179-185``).
    Projection happens before the explode so the generator (and the
    following shuffle) only carries the array elements.
    """
    return (
        df.select(F.explode(array_col).alias(out_name))
        .groupBy(out_name)
        .agg(F.count("*").alias("total"))
    )


def activity_windows(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    window_duration: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window per-key max/avg activity.

    Re-expresses the player-count app (``kafka-spark-configmap.yaml:
    259-265``): 10-minute windows per appid with max + avg player count.
    """
    return (
        df.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            F.col(key_col),
        )
        .agg(
            F.max(value_col).alias("max_value"),
            F.avg(value_col).alias("avg_value"),
            F.count("*").alias("n_samples"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            F.round("max_value", 6).alias("max_value"),
            F.round("avg_value", 6).alias("avg_value"),
            "n_samples",
        )
    )


def evaluation_barrier(df: DataFrame) -> DataFrame:
    """Force every current column to be evaluated exactly once per row.

    Catalyst's filter pushdown and project collapse SUBSTITUTE producer
    expressions into consumers: a filter on a frame whose column is an
    expensive derived expression (e.g. the reconstructed ``text_clean``
    of the span-dedup operators — a chain of sorted-array lambdas) gets
    pushed below the projection with the full expression inlined at
    EVERY reference, and the substitution recurses through each
    intermediate projection column — re-triggering, across operator
    boundaries, the per-element re-evaluation trap the operators
    guard against internally (measured: the curation v2 capstone went
    ~100x slower than the sum of its stages before this barrier).

    The barrier is a 1:1 ``explode(array(struct(*)))`` — a Generate
    node, which predicates do not push through and projections do not
    collapse across, evaluated once per row with no shuffle and no
    materialization.  Insert it between an operator producing expensive
    derived columns and a consumer that FILTERS or re-derives on them;
    plans that consume each column once (the registered single-operator
    queries) do not need it.
    """
    cols = df.columns
    return df.select(
        F.explode(F.array(F.struct(*cols))).alias("_row")
    ).select(*[F.col(f"_row.{c}").alias(c) for c in cols])
