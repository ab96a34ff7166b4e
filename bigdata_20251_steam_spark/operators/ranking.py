"""Range-banded exact per-group ranking — the hot-group window splitter.

``percent_rank() OVER (PARTITION BY group ORDER BY ...)`` funnels every
row of a group through ONE window task.  At 100 TB a pathological group
(one source contributing billions of documents) turns that task into the
job's straggler or an outright spill-death.  The samplers'
hash-prefix prefilter (``sampling.sample_n_per_group``) does not
transfer to quality ranking — quality is not uniform, so no analytic
key-prefix bound exists — but the *rank decomposition* below does, and
it is exact regardless of sketch accuracy:

1. estimate ``n_bands - 1`` per-group quantile EDGES of the order value
   with ``percentile_approx`` (one aggregate; only ~bands doubles per
   group leave the map side);
2. assign each row a band by VALUE comparison against the broadcast
   edges — all ties share a band, so bands are contiguous runs of the
   (value DESC, id ASC) total order;
3. count rows per (group, band) (tiny aggregate) and prefix-sum the
   counts into band OFFSETS (window over the tiny frame);
4. rank within each (group, band) window — per-task rows drop from
   ``|group|`` to ``~|group| / n_bands`` — and add the band offset:
   ``offset + row_number`` IS the exact global rank, because bands
   partition the total order contiguously.

Accuracy of ``percentile_approx`` affects only band BALANCE, never
correctness — a skewed sketch gives lopsided bands, the ranks are still
exact.  The degenerate worst case (every row the same value) collapses
to one band, i.e. the original single-window behaviour: tie mass is
irreducible for exact ranking.

Cost: the input is scanned for the edges aggregate, the band counts,
and the ranking pass (3 scans / the band-count exchange is bounded by
``groups × bands``), versus 1 scan for the single-window plan — which
is why callers gate this behind an eager hot-group count
(``hot_threshold``), the same guard protocol as the samplers: a healthy
corpus pays one cheap count, the decomposition engages only when the
skew it defends against is actually present.

No reference counterpart (the reference has no ranking operators at
all); this backs the hot-group posture of
``text_analysis.quality_quantile_filter``,
``text_analysis.quality_threshold_filter`` and
``sampling.curriculum_order``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def banded_percent_rank(
    base: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_bands: int = 64,
    accuracy: int = 10_000,
    persist_input: bool = False,
    broadcast_edges: bool | None = None,
    n_groups: int | None = None,
    broadcast_cell_limit: int = 2_000_000,
    cache_tracker: list | None = None,
) -> DataFrame:
    """Exact rank under ``(value DESC, id ASC)`` within each group.

    Returns ``base``'s columns plus:

      _rank — 1-based exact rank of the row in its group under
              ``(value_col DESC NULLS LAST, id_col ASC)``; with a
              unique ``id_col`` tie-break this equals both ``rank()``
              and ``row_number()`` over the single-partition window.
      _n    — the group's row count (for percent_rank denominators:
              ``percent_rank == (_rank - 1) / (_n - 1)``, 0.0 when
              ``_n == 1`` — Spark's own single-row convention).

    NULL values sort last (one extra band past the edges), matching the
    ``DESC`` default NULLS LAST ordering of the single-window form.

    ``persist_input`` (default False — r8 advice: persist-by-default
    silently leaked disk-tier cache for any long-lived caller using
    the default): the decomposition scans ``base`` three times (edges
    aggregate, band counts, ranking pass).  Spark does not share
    subtrees across those scans — without a persist the whole ``base``
    lineage (at worst a corpus read plus the quality projection)
    re-executes per scan, and a lineage containing its own joins
    multiplies (the r7 two-phase filter compiled to a 40-scan plan
    this way).  Callers whose ``base`` carries a nontrivial lineage
    should either persist it themselves around this call (the pattern
    every in-repo hot path uses: persist the narrow score frame, let
    the eager hot-detection count double as cache population,
    unpersist after consuming) or opt in with ``persist_input=True``
    AND pass ``cache_tracker``.  When this function persists, the
    returned frame is backed by that cache and there is no safe point
    inside this function to release it — Spark's LRU evicts only the
    MEMORY tier of ``MEMORY_AND_DISK``; disk blocks are freed solely
    by ``unpersist`` (consume the result, then unpersist the tracked
    frame).

    ``broadcast_edges`` (default None = self-sizing, r8 verdict #4):
    the per-group edges and offsets frames are ``groups × n_bands``
    doubles.  ``None`` broadcasts them only while ``n_groups *
    n_bands <= broadcast_cell_limit`` (default 2M cells ≈ 16 MB of
    edge doubles — comfortably under Spark's 8 GB broadcast hard cap
    and a sane driver/executor memory bite at any cluster size) and
    otherwise routes both joins through a hash shuffle.  ``n_groups``
    feeds that decision: every in-repo hot path already counts groups
    in its eager hot-detection job and passes it for free; when auto
    mode must decide WITHOUT a caller-supplied count, it runs ONE
    eager ``edges.count()`` job at construction time (documented
    eager-job contract — the same class as the callers' hot-detection
    counts; pass ``n_groups`` or an explicit ``broadcast_edges`` to
    keep construction fully lazy).  Explicit True/False still forces
    the route either way.
    """
    if n_bands < 2:
        raise ValueError("banded_percent_rank: n_bands must be >= 2")
    from pyspark.sql.window import Window

    if persist_input:
        from pyspark import StorageLevel

        base = base.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_tracker is not None:
            cache_tracker.append(base)

    probs = F.array(
        *[F.lit(i / n_bands) for i in range(1, n_bands)]
    )
    edges = base.groupBy(group_col).agg(
        F.percentile_approx(value_col, probs, F.lit(accuracy)).alias("_edges"),
        F.count(F.lit(1)).alias("_n"),
    )
    if broadcast_edges is None:
        if n_groups is None:
            # documented eager-job contract (see docstring): one
            # count over the edges aggregate decides the route
            n_groups = edges.count()
        broadcast_edges = n_groups * n_bands <= broadcast_cell_limit

    def _small(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_edges else df
    v = F.col(value_col)
    # band index = number of ascending edges STRICTLY above the value:
    # the max values get band 0, ties share a band, and band is monotone
    # non-decreasing as the value descends — bands are contiguous runs
    # of the DESC total order, which is what makes offset + local rank
    # exact.  NULL values (and the all-NULL-group NULL edges array) get
    # the final band, mirroring DESC NULLS LAST.
    band = F.when(v.isNull(), F.lit(n_bands)).otherwise(
        F.coalesce(
            F.size(F.filter(F.col("_edges"), lambda e: e > v)),
            F.lit(n_bands),
        )
    )
    banded = base.join(_small(edges), group_col).withColumn(
        "_band", band
    )
    band_counts = banded.groupBy(group_col, "_band").agg(
        F.count(F.lit(1)).alias("_bc")
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("_band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = band_counts.select(
        group_col,
        "_band",
        F.coalesce(F.sum("_bc").over(w_off), F.lit(0)).alias("_off"),
    )
    w_band = Window.partitionBy(group_col, "_band").orderBy(
        v.desc(), F.col(id_col).asc()
    )
    return (
        banded.join(_small(offsets), [group_col, "_band"])
        .withColumn("_rank", F.col("_off") + F.row_number().over(w_band))
        .drop("_edges", "_band", "_off")
    )


def percent_rank_expr(rank_col: Column, n_col: Column) -> Column:
    """``(rank - 1) / (n - 1)`` with Spark's single-row 0.0 convention.

    The same double arithmetic ``percent_rank()`` performs, so a rank
    from :func:`banded_percent_rank` reproduces the window function's
    value bit-for-bit.
    """
    return F.when(n_col > 1, (rank_col - 1).cast("double") / (n_col - 1)).otherwise(
        F.lit(0.0)
    )
