"""Mergeable sketch operators (Apache DataSketches HLL via Spark built-ins).

``approx_count_distinct`` (see ``approx_stats``) answers one query; what a
100 TB pipeline actually needs is the *mergeable sketch object*: build a
per-partition/per-day HLL once, persist the binary sketch, and answer any
later rollup (per-group, cross-group, cross-day) by unioning sketches —
never rescanning the raw data.  Spark 3.5+ exposes exactly this as
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``.

Scale shape: the sketch is a fixed <= 2^lg_k-register buffer, so the
groupBy shuffles O(groups × 2^lg_k) bytes regardless of row count, with
full map-side partial aggregation — the canonical replacement for exact
``countDistinct`` whose shuffle carries every distinct value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_sketches(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """(group, sketch, estimate) — one mergeable HLL sketch per group.

    The ``sketch`` binary column is the persistable artifact: store it in
    a summary table and later rollups union it instead of rescanning.
    """
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"),
    ).withColumn("estimate", F.hll_sketch_estimate("sketch"))


def hll_distinct_rollup(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lg_k: int = 14,
    tolerance: float = 0.05,
) -> DataFrame:
    """Self-auditing HLL distinct-count rollup.

    Per group, emits the exact distinct count plus two invariant flags a
    healthy sketch pipeline always satisfies:

    - ``est_ok``: the HLL estimate is within ``tolerance`` (relative) of
      the exact count — catches sketch misconfiguration/regression;
    - ``merge_consistent``: unioning the per-group sketches
      (``hll_union_agg``) yields the same global estimate as sketching
      the whole column directly — the *mergeability* property that makes
      sketches composable across partitions, days, and clusters.

    The estimates themselves are engine-specific (DataSketches HLL), so
    the driver-checkable surface is (group, n_exact, est_ok,
    merge_consistent): any estimate drift or merge inconsistency flips a
    flag and hash-mismatches the oracle.  The exact count exists only for
    the audit — production rollups use :func:`hll_sketches` alone.
    """
    sketches = df.groupBy(group_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"),
        F.countDistinct(value_col).alias("n_exact"),
    )
    per_group = sketches.withColumn(
        "est", F.hll_sketch_estimate("sketch")
    ).withColumn(
        "est_ok",
        (F.abs(F.col("est") - F.col("n_exact"))
         <= F.lit(tolerance) * F.col("n_exact")),
    )
    merged = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_merged")
    )
    direct = df.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(value_col, F.lit(lg_k))
        ).alias("est_direct")
    )
    flags = merged.crossJoin(direct).select(
        (F.col("est_merged") == F.col("est_direct")).alias("merge_consistent")
    )
    return per_group.crossJoin(F.broadcast(flags)).select(
        group_col, "n_exact", "est_ok", "merge_consistent"
    )
