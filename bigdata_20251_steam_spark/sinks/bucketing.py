"""Bucketed tables: pre-shuffled storage for co-located, exchange-free joins.

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle.  If
both tables are written bucketed (and sorted) by the join key with the
same bucket count, Spark's scan exposes the bucketing as an output
partitioning and the join planner elides both Exchanges — the join runs
bucket-by-bucket, co-located.  This is the at-rest analogue of the
reference's Mongo compound indexes (SURVEY.md §2.I I2): pay the
organization cost once at write, amortize over every downstream join.

Bucketed writes require a table catalog (``saveAsTable``) because the
bucketing metadata lives in the catalog, not the parquet footers; the
default in-memory/derby catalog works locally — no Hive service needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and sorted) by key.

    ``n_buckets`` should be sized so one bucket of the LARGEST co-bucketed
    table fits an executor's memory during the join (at 100 TB that means
    thousands of buckets; both sides must agree on the count).
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key.

    With matching bucketing this plans as SortMergeJoin over the scans'
    native partitioning — zero Exchange operators (assert via
    ``df.explain``; tests do).
    """
    return spark.table(left_table).join(spark.table(right_table), on)
