"""bigdata_20251_steam_spark — a PySpark-native analytics engine.

A clean-room, Spark-first rebuild of the query and data-processing
capabilities of the reference pipeline ``buinguyenkhai/bigdata-20251-steam``
(a Kappa-architecture Steam analytics stack: Kafka -> 3 PySpark Structured
Streaming apps -> HDFS parquet cold store + MongoDB hot store -> Mongo
aggregation queries).  See SURVEY.md at the repo root for the full reference
analysis; every module cites the reference behavior it re-expresses.

Layout
------
- ``session``    : SparkSession factory tuned for scale (AQE, UTC, Arrow).
- ``schemas``    : explicit StructTypes for every reference record shape.
- ``sources``    : batch + streaming source/sink adapters (parquet, CSV,
                   JSON-over-binary "kafka-shaped" frames).
- ``operators``  : reusable DataFrame -> DataFrame operators (windowed
                   aggregation, review-bomb detection, dedup, similarity,
                   text analysis, multimodal plumbing).
- ``plans``      : the named query library — each query is a
                   ``(spark, sf_dir) -> DataFrame`` callable paired with an
                   ANSI-SQL oracle string (DuckDB-runnable) for correctness.
- ``streaming``  : Structured Streaming layer (watermarks, tumbling /
                   sliding / session windows, foreachBatch dual-sink).
"""

__version__ = "0.1.0"
