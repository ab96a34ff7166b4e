"""Timestamp helpers that are safe under Spark 4's TIMESTAMP_NTZ inference.

Since Spark 3.4, parquet timestamp columns written without the UTC-adjusted
flag (``timestamp[us]`` with ``isAdjustedToUTC=false``) can surface as
``TIMESTAMP_NTZ`` when ``spark.sql.parquet.inferTimestampNTZ.enabled`` is on
(the default in some 4.x builds).  Two things break silently-looking code:

- ``CAST(ntz AS BIGINT)`` is an AnalysisException
  (``DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION``) — NTZ has no epoch
  without a zone.
- ``withWatermark`` on an NTZ column raises
  ``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE``.

The engine's policy: **normalize at the source boundary**.  Every batch and
streaming source adapter casts NTZ columns to ``TimestampType`` on the way
in; with the session timezone pinned to UTC (``session.py``) the wall-clock
reinterpretation is the identity, so semantics match the DuckDB oracle's
``epoch()`` exactly.  Operators that must be robust to *arbitrary* caller
DataFrames (e.g. ``range_join``) use :func:`epoch_seconds`, whose
``cast(timestamp)`` hop is a no-op on already-zoned columns and a legal
conversion on NTZ ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def epoch_seconds(col: Column | str) -> Column:
    """Epoch seconds (truncating) from TIMESTAMP *or* TIMESTAMP_NTZ.

    ``cast(ts as long)`` alone rejects NTZ; the extra ``cast(timestamp)``
    hop is the identity for zoned timestamps and reinterprets NTZ wall
    clock in the session timezone (pinned UTC engine-wide).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(TimestampType()).cast("long")


def epoch_seconds_sql(col_expr: str) -> str:
    """SQL-string form of :func:`epoch_seconds` for ``F.expr`` call sites."""
    return f"cast(cast({col_expr} as timestamp) as long)"


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast every top-level TIMESTAMP_NTZ column to TIMESTAMP.

    Applied by every source adapter so downstream plans (epoch casts,
    watermarks, window()) see only zoned timestamps.  A no-op (returns the
    same plan, no projection added) when nothing needs casting, so it never
    blocks column pruning on the common path.
    """
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if not ntz:
        return df
    return df.withColumns(
        {c: F.col(c).cast(TimestampType()) for c in ntz}
    )
