"""Relational operators Spark lacks as built-ins: as-of join, range join.

Both are implemented as compositions of existing DataFrame ops (the brief's
preferred tier (a)) — no Pandas UDFs, no per-key collects — with plan
shapes that survive scale:

- ``asof_join``: the union-and-carry-forward formulation.  One shuffle on
  the join key (the window partition), state per row is O(1); contrast
  with the naive ``ts_r <= ts`` theta-join whose candidate set is
  O(rows_per_key^2) and with per-key ``collect_list`` which caps a key's
  history at executor memory.
- ``range_join``: the binned (bucketed) formulation of point-in-interval
  joins.  A raw inequality join plans as BroadcastNestedLoopJoin
  (O(points x intervals) comparisons); binning turns it into an equi-join
  on the bucket id — each interval explodes into the few buckets it
  overlaps, each point probes exactly one bucket — then an exact residual
  filter.  Candidate volume is O(points + interval-bucket overlaps),
  tunable via ``bucket``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: tuple[str, ...],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row at-or-before it.

    The time-series join Spark has no operator for (pandas ``merge_asof``,
    DuckDB/QuestDB ``ASOF JOIN``).  ``direction="backward"`` (the only
    mode implemented) matches the latest right row with
    ``right_ts <= left_ts`` per key; unmatched left rows keep nulls.

    Mechanics: tag and union both sides, then a single per-key window
    ordered by (ts, side) carries the right side's values forward with
    ``last(..., ignorenulls=True)``; right rows sort BEFORE left rows at
    equal timestamps so ties count as matches.  Requires right (key, ts)
    uniqueness for deterministic output — pre-aggregate duplicates away
    (the query layer does; an assertion here would force an extra pass).

    At 100 TB: one hash shuffle of left+right on ``key``, sorted once;
    no state beyond the window's running ``last`` — the plan is the same
    sort-merge shape as a co-partitioned join.  Skewed keys salt exactly
    like any other window (split the key's timeline, carry the boundary
    row between salts).
    """
    if direction != "backward":
        raise ValueError("asof_join implements direction='backward' only")
    lcols = left.columns
    side_l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    side_r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = side_l.unionByName(side_r).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in value_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_m_ts"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"_m_{c}").alias(f"matched_{c}") for c in value_cols],
        F.col("_m_ts").alias("matched_ts"),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: str = "7 days",
) -> DataFrame:
    """Point-in-interval join: rows where ``start <= point < end``.

    Binned equi-join formulation (how Databricks' range-join hint and
    DuckDB's IEJoin avoid the nested loop): both sides map time to
    ``floor(epoch / bucket_seconds)`` bucket ids, intervals explode into
    every bucket they overlap via ``sequence()``, the join is a plain
    equi-join on the bucket id, and the exact inequality runs as a
    residual filter.  Pick ``bucket`` near the typical interval length:
    much smaller multiplies the interval side, much larger widens the
    candidate set.

    Output: all point columns + all interval columns (callers project).
    """
    n, unit = bucket.split()
    mult = {
        "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    }[unit]
    secs = int(n) * mult
    p = points.withColumn(
        "_b", F.expr(f"cast({point_ts} as long) div {secs}")
    )
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.expr(f"cast({start_ts} as long) div {secs}"),
                # end is exclusive, but timestamp->long truncates to whole
                # seconds, so subtracting 1 here could drop the bucket a
                # sub-second point sits in; include the end bucket and let
                # the exact residual filter trim — candidates must be a
                # superset, never a subset
                F.expr(f"cast({end_ts} as long) div {secs}"),
            )
        ),
    )
    joined = p.join(iv, "_b").filter(
        (F.col(start_ts) <= F.col(point_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop("_b")
