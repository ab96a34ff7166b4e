"""Single-pass exact column profiling — the "know your data" audit step.

A 100-TB ingest needs a per-column census BEFORE any curation decision:
null rates (broken upstream extract), distinct cardinality (is this a
key? an enum? free text?), min/max (range drift), and byte mass (who
pays the storage bill).  The reference pipeline has no profiling
operator (its schemas are hand-declared in
``k8s/spark-apps/kafka-spark-configmap.yaml`` and never audited); this
is part of the commissioned large-scale-pipeline extension surface,
sibling to the sketch-based ``approx_stats`` monitor.

Scale shape (the reason this is NOT one ``groupBy().agg(countDistinct,
...)`` call): mixing distinct and plain aggregates in a single agg makes
Catalyst plan an ``Expand`` that multiplies every input row by the
number of distinct-aggregate groups.  Instead the frame is melted once
(``stack`` — a narrow projection, one scan) to ``(col_name, val)`` rows
and aggregated twice:

1. ``groupBy(col_name, val).count()`` — partial map-side combine
   collapses duplicate values BEFORE the exchange, so the shuffle
   carries one row per distinct ``(column, value)`` pair, not per input
   row.  For enum-ish columns that is a few rows per partition.
2. ``groupBy(col_name)`` over the distinct pairs — a second exchange
   bounded by the distinct cardinality, producing one output row per
   column.

Exact distinct counting on a free-text column inherently shuffles every
distinct value once; that is the price of EXACT.  The bounded-state
alternative at full scale is the HLL/KLL monitor (``approx_stats``,
``operators/sketches.py``) — this operator is the exact auditor you run
on a sampled slice or on the bounded columns.

Values are canonicalized to strings so one long-format result covers
heterogeneous columns.  Only types whose string form is byte-identical
across engines (integers, strings) are safe for the cross-engine
oracle; doubles/timestamps render differently (Java vs C formatting)
and belong in ``approx_stats`` instead — callers may still profile
them, the registered query just does not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Exact per-column profile: one row per column in ``columns``.

    Output schema (all counts exact):
      col_name   — the profiled column
      n_rows     — total rows (identical for every column; kept per-row
                   so the frame is self-describing after a filter)
      n_nulls    — NULL count
      n_distinct — exact distinct count of NON-NULL values
      min_val / max_val — lexicographic extremes of the string form
                   (UTF-8 binary order == codepoint order, so Spark and
                   DuckDB agree byte-for-byte)
      total_len  — sum of string-form lengths over non-null values
    """
    if not columns:
        raise ValueError("profile_columns: need at least one column")
    if len(set(columns)) != len(columns):
        # stack would emit the duplicate twice and the groupBy would
        # silently merge them, doubling n_rows/total_len for that column.
        dupes = sorted({c for c in columns if list(columns).count(c) > 1})
        raise ValueError(f"profile_columns: duplicate columns {dupes}")
    stack_args: list = [F.lit(len(columns))]
    for c in columns:
        stack_args.append(F.lit(c))
        stack_args.append(F.col(c).cast("string"))
    melted = df.select(F.stack(*stack_args).alias("col_name", "val"))
    per_val = melted.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    zero = F.lit(0).cast("bigint")
    return (
        per_val.groupBy("col_name")
        .agg(
            F.sum("_cnt").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("val").isNull(), F.col("_cnt"))), zero
            ).alias("n_nulls"),
            # per_val rows are distinct (col, val) pairs, so a plain
            # non-null count IS the exact distinct count — no Expand.
            F.count("val").alias("n_distinct"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
            F.coalesce(
                F.sum(F.length("val").cast("bigint") * F.col("_cnt")), zero
            ).alias("total_len"),
        )
        .orderBy("col_name")
    )


def value_histogram(
    df: DataFrame, col: str, bins: int = 20
) -> DataFrame:
    """Exact equi-width histogram of a numeric column.

    The distribution-shape companion to :func:`profile_columns` (which
    deliberately excludes doubles — their string forms differ across
    engines) and to the ``approx_stats`` quantile sketches (which give
    rank points, not shape).  Two scans by construction: one global
    min/max aggregate, then the bucketing pass — the bounds frame is a
    single row broadcast onto the scan, so the only data exchange is
    the final ``groupBy(bucket)``, bounded by ``bins`` rows per
    partition regardless of input size.

    Cross-engine exactness: bucket index is
    ``least(floor((v - lo) / ((hi - lo) / bins)), bins - 1)`` — the
    same IEEE-double operations in the same order on both engines, so
    even the float bucket bounds reproduce bit-for-bit (rounded to 6dp
    in the registered query per repo convention).  NULLs and NaNs are
    excluded from bucketing (a NaN row would poison max/width on the
    Spark side and crash DuckDB's floor→BIGINT cast on the oracle
    side); a degenerate column (``hi == lo``) lands entirely in
    bucket 0 instead of dividing by zero.
    """
    if bins < 1:
        raise ValueError("value_histogram: bins must be >= 1")
    v = F.col(col)
    # NaN must be excluded along with NULL: a NaN row would poison max()
    # (width becomes NaN → garbage bucket) in Spark while DuckDB's
    # CAST(floor(NaN) AS BIGINT) raises — a cross-engine divergence.
    # isnan() is evaluated on the double cast so the predicate is valid
    # for every numeric input type, not just float/double columns; the
    # registered oracle mirrors it as NOT isnan(CAST(... AS DOUBLE)).
    clean = df.filter(v.isNotNull() & ~F.isnan(v.cast("double")))
    stats = clean.agg(
        F.min(v).cast("double").alias("_lo"),
        F.max(v).cast("double").alias("_hi"),
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))
    idx = F.when(F.col("_hi") == F.col("_lo"), F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.floor((v.cast("double") - F.col("_lo")) / width),
            F.lit(bins - 1).cast("bigint"),
        )
    )
    return (
        clean
        .crossJoin(F.broadcast(stats))
        .withColumn("bucket", idx)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_lo").alias("_lo"),
            F.min("_hi").alias("_hi"),
        )
        .select(
            "bucket",
            (
                F.col("_lo")
                + F.col("bucket").cast("double")
                * ((F.col("_hi") - F.col("_lo")) / F.lit(float(bins)))
            ).alias("bucket_lo"),
            "n",
        )
        .orderBy("bucket")
    )


def dataset_card(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-source dataset card — the summary a curation run
    publishes next to its shards.

    Output per source: ``(source, n_docs, n_null_text, total_tokens,
    avg_quality, n_langs, top_lang)`` — doc count, NULL-text count,
    whitespace-token mass, mean heuristic quality, language cardinality
    and the modal language (deterministic lexicographic tie-break).

    Cross-engine exactness: the quality mean sums 6dp-rounded per-doc
    scores as INTEGER micro-units (order-free exact arithmetic — the
    unigram-LM / NB-classifier convention), dividing once at the end.

    Scale shape — ONE aggregation chain, zero joins: stats roll up
    through a (source, lang) pre-aggregate and re-aggregate to source
    level, with the modal language picked by ``min_by`` over
    ``(-count, lang)`` (deterministic lexicographic tie-break) from the
    same pre-aggregate.  The naive formulation — separate per-source
    and per-language branches joined at the end — re-expands the whole
    input lineage per branch (ruinous when the input is itself a
    pipeline, e.g. the curation capstone feeding survivors in); this
    shape expands it once.
    """
    from .text_analysis import quality_column

    t = F.col(text_col)
    toks = F.array_remove(F.split(F.trim(t), r"\s+"), "")
    n_toks = F.when(t.isNull(), F.lit(0)).otherwise(F.size(toks))
    q_micro = F.round(quality_column(t) * 1_000_000).cast("long")
    base = docs.select(
        "source",
        "lang",
        n_toks.alias("_nt"),
        q_micro.alias("_qm"),
        # counted directly: quality_column clamps through greatest(),
        # which IGNORES nulls on both engines, so a NULL text scores
        # 0.0 rather than NULL — a null-count via _qm would always be 0
        t.isNull().alias("_tnull"),
    )
    per_sl = base.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.when(F.col("_tnull"), 1).otherwise(0))
        .cast("long")
        .alias("_nulls"),
        F.sum("_nt").cast("long").alias("_toks"),
        F.sum(F.coalesce(F.col("_qm"), F.lit(0))).cast("long").alias("_qs"),
        F.count("_qm").alias("_qn"),
    )
    lang_ok = F.col("lang").isNotNull()
    per_source = per_sl.groupBy("source").agg(
        F.sum("_n").cast("long").alias("n_docs"),
        F.sum("_nulls").cast("long").alias("n_null_text"),
        F.sum("_toks").cast("long").alias("total_tokens"),
        F.sum("_qs").cast("long").alias("_qs"),
        F.sum("_qn").cast("long").alias("_qn"),
        F.sum(F.when(lang_ok, 1).otherwise(0)).cast("long").alias("n_langs"),
        # null ordering value => row ignored by min_by, so null-lang
        # rows never become the mode and an all-null source yields NULL
        F.min_by(
            "lang",
            F.when(lang_ok, F.struct((-F.col("_n")).alias("nc"), F.col("lang"))),
        ).alias("top_lang"),
    )
    avg_q = F.when(
        F.col("_qn") > 0,
        F.round(F.col("_qs") / F.lit(1_000_000.0) / F.col("_qn"), 6),
    )
    return per_source.select(
        "source",
        "n_docs",
        "n_null_text",
        "total_tokens",
        avg_q.alias("avg_quality"),
        "n_langs",
        "top_lang",
    )


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    thresholds: list[float],
    weight_col: str | None = None,
) -> DataFrame:
    """Keep-rate curve over candidate filter thresholds — policy tuning.

    Choosing a quality/classifier cutoff is a data decision: operators
    ship the score, this reports what each candidate threshold would
    KEEP — ``(threshold, n_total, n_keep, frac_keep, kept_weight)``,
    with ``keep = score >= threshold`` (NULL scores never keep) and
    ``kept_weight`` summing ``weight_col`` (e.g. token counts — the
    axis a mix budget actually cares about; rows count when omitted).

    One pass: each row fans out once per threshold (a handful of
    literals), then a thresholds-bounded aggregate — the exchange
    carries |thresholds| groups regardless of corpus size.  All
    arithmetic is integer counts plus one rounded division, exact
    cross-engine.
    """
    if not thresholds:
        raise ValueError("threshold_sweep: thresholds must be non-empty")
    if len(thresholds) > 1000:
        raise ValueError(
            "threshold_sweep fans every row out per threshold; "
            f"{len(thresholds)} thresholds is past the 1000 bound"
        )
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    base = df.select(
        F.col(score_col).alias("_s"),
        F.coalesce(w, F.lit(0)).alias("_w"),
        F.explode(
            F.array(*[F.lit(float(t)) for t in sorted(set(thresholds))])
        ).alias("threshold"),
    )
    keep = F.col("_s").isNotNull() & (F.col("_s") >= F.col("threshold"))
    return (
        base.groupBy("threshold")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_keep"),
            F.sum(F.when(keep, F.col("_w")).otherwise(0))
            .cast("long")
            .alias("kept_weight"),
        )
        .select(
            "threshold",
            "n_total",
            "n_keep",
            F.round(F.col("n_keep") / F.col("n_total"), 6).alias("frac_keep"),
            "kept_weight",
        )
    )
