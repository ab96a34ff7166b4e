"""Deterministic sampling / dataset-split operators for training pipelines.

Training-data plumbing that must be *reproducible across engines and
re-runs*: every assignment derives from a content hash (``md5_long``, the
repo's cross-engine hash), never from ``rand()`` — so the same row lands
in the same split on Spark, in the DuckDB oracle, and on a re-run after a
lost executor.  All JVM built-ins, zero shuffles: split assignment is a
narrow projection, so at 100 TB it fuses into whatever scan or write
surrounds it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long


def split_bucket(id_col: Column, n_buckets: int = 100, salt: str = "split") -> Column:
    """Stable bucket in [0, n_buckets) from a row id — the split primitive.

    Salted so independent splits (e.g. a later 5-fold CV over the same
    corpus) decorrelate from this one.
    """
    return md5_long(F.concat(F.lit(salt + ":"), id_col.cast("string"))) % n_buckets


def hash_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Assign train/val/test by hashed id — deterministic dataset split.

    The remaining ``100 - train_pct - val_pct`` percent is test.  Because
    the bucket is a pure function of the id, the split is stable under
    re-partitioning, engine changes, and incremental corpus growth
    (existing docs never migrate between splits when new docs arrive —
    the property random splits lack).
    """
    b = split_bucket(F.col(id_col), 100, salt)
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsampling (``sampleBy`` without RNG).

    Keeps a row iff its hash bucket (of 1e6) falls under the stratum's
    fraction — e.g. rebalancing languages or sources in a pretraining
    mix.  Unlike ``DataFrame.sampleBy``, re-runs and different partition
    layouts keep exactly the same rows, and the oracle can reproduce the
    selection bit-for-bit.
    """
    b = split_bucket(F.col(id_col), 1_000_000, salt)
    frac = None
    for k, v in sorted(fractions.items()):
        cond = F.col(stratum_col) == k
        frac = F.when(cond, v) if frac is None else frac.when(cond, v)
    frac = (
        frac.otherwise(default_fraction)
        if frac is not None
        else F.lit(default_fraction)
    )
    # round, don't truncate: a bare cast truncates toward zero while SQL
    # CAST(x AS BIGINT) rounds to nearest, so sub-1e-6 fractions would
    # keep different boundary buckets across engines
    return df.filter(b < F.round(frac * 1_000_000).cast("long"))


def epoch_shuffle_key(id_col: Column, epoch: int, salt: str = "shuffle") -> Column:
    """Stable 60-bit sort key for training-order shuffling, one per epoch.

    Different epochs decorrelate (the epoch number is inside the hash
    input), while within an epoch the order is a pure function of the row
    id — reproducible across re-runs, engines, partition layouts, and
    resumption after preemption (the property ``orderBy(rand())`` lacks).
    """
    return md5_long(
        F.concat(F.lit(f"{salt}:{epoch}:"), id_col.cast("string"))
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    n_shards: int | None = None,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global shuffle of the corpus for training epoch ``e``.

    Adds ``shuffle_key`` and, when ``n_shards`` is given, range-partitions
    on it and sorts within partitions — so writing the result yields
    ``n_shards`` files that concatenate into a total deterministic order
    (the layout a data loader streams sequentially).  Range partitioning
    samples the key distribution to build balanced bounds; since the key
    is a 60-bit hash it is uniform by construction, so shard sizes are
    even regardless of input skew.  No global sort ever materializes on
    one node: this is the standard distributed sort shape (sampled range
    exchange + local sort).
    """
    out = df.withColumn(
        "shuffle_key", epoch_shuffle_key(F.col(id_col), epoch, salt)
    )
    if n_shards is not None:
        out = out.repartitionByRange(n_shards, "shuffle_key", id_col)
        out = out.sortWithinPartitions("shuffle_key", id_col)
    return out


#: md5_long yields a uniform value in [0, 2^60) — the hash-threshold
#: prefilters below scale against this range.
_HASH_RANGE = float(1 << 60)


def sample_n_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n: int,
    salt: str = "groupsample",
    hot_threshold: int | None = None,
    safety: float = 4.0,
) -> DataFrame:
    """Deterministic n-rows-per-group cap (source/domain capping).

    The pretraining-mix primitive "no single source may contribute more
    than N documents": rows rank within their group by salted content
    hash (uniform, engine-reproducible) and the first ``n`` survive —
    a deterministic uniform sample without RNG, stable under re-runs,
    repartitioning, and engine changes.

    Scale shape: one hash-partition exchange on the group key plus a
    per-group sort.  **Hot-group two-phase prefilter** (r6, verdict #3;
    pass ``hot_threshold``): at 100 TB one pathological group can funnel
    billions of rows through a single window task.  Because the window
    orders by the uniform hash key, the n survivors are exactly the n
    SMALLEST keys — a prefix of the key order — so a group counted above
    ``hot_threshold`` is pre-filtered to ``key < R * safety * n / |group|``
    (expected ~``safety * n`` candidates) before the sort, and the exact
    rank trims the margin.  Exactness is unconditional, not probabilistic:
    the prefilter keeps a PREFIX of the sort order, so if at least ``n``
    candidates survive it, the top-n of candidates IS the top-n of the
    group; any hot group left with fewer than ``n`` candidates (possible
    only at tiny safety factors) falls back to full-group ranking.
    Parity with the single-phase form is pinned by a pathological
    one-group fixture test.  Default ``hot_threshold=None`` keeps the
    single-phase plan — optimal at tested corpus sizes.

    **Eager hot-group detection**: the two-phase plan re-reads the
    corpus for its stats/candidate/fallback subtrees, so paying it when
    NO group is hot would make the guard a constant tax.  With
    ``hot_threshold`` set, one cheap pre-aggregate job first checks
    whether any group actually exceeds the threshold (and the cap); a
    healthy corpus takes the single-phase plan plus that one count —
    the guard costs nothing until the skew it defends against appears.
    """
    from pyspark.sql.window import Window

    key = md5_long(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    single_phase = (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= n)
        .drop("_rank")
    )
    if hot_threshold is None:
        return single_phase

    keyed = df.withColumn("_key", key)
    counts = keyed.groupBy(group_col).agg(F.count(F.lit(1)).alias("_cnt"))
    any_hot = (
        counts.filter((F.col("_cnt") > hot_threshold) & (F.col("_cnt") > n))
        .limit(1)
        .count()
    )
    if any_hot == 0:
        return single_phase
    # hash threshold per group: keep everything for cold groups (and for
    # groups where the cap doesn't bind — cnt <= n must keep ALL rows),
    # a ~safety*n expected-size key prefix for hot ones; the fraction is
    # capped at 1.0 so the long cast cannot overflow past 2^63
    thr = F.when(
        (F.col("_cnt") > hot_threshold) & (F.col("_cnt") > n),
        (
            F.least(F.lit(1.0), F.lit(safety * n) / F.col("_cnt"))
            * _HASH_RANGE
        ).cast("long"),
    ).otherwise(F.lit(1 << 62))
    cand = keyed.join(counts.withColumn("_thr", thr), group_col).filter(
        F.col("_key") < F.col("_thr")
    )
    # guard: a hot group whose candidate prefix came up short of n rows
    # must rank its FULL rows (rare — only at small safety factors).
    # Derived from counts LEFT JOIN the candidate counts — NOT from cand
    # alone: a hot group whose prefilter dropped every row has no cand
    # rows at all, and a cand-side aggregation would silently lose it
    # instead of falling back (r6 review catch; zero-candidate fixture
    # pins it)
    cand_counts = cand.groupBy(group_col).agg(F.count(F.lit(1)).alias("_m"))
    short = (
        counts.filter((F.col("_cnt") > hot_threshold) & (F.col("_cnt") > n))
        .join(cand_counts, group_col, "left")
        .filter(F.coalesce(F.col("_m"), F.lit(0)) < n)
        .select(group_col)
    )
    full_rows = keyed.join(F.broadcast(short), group_col, "left_semi")
    pool = cand.join(
        F.broadcast(short), group_col, "left_anti"
    ).drop("_cnt", "_thr").unionByName(full_rows)
    w2 = Window.partitionBy(group_col).orderBy("_key", F.col(id_col))
    return (
        pool.withColumn("_rank", F.row_number().over(w2))
        .filter(F.col("_rank") <= n)
        .select(*df.columns)  # joins reorder columns; pin df's order
    )


def token_budget_sample(
    docs: DataFrame,
    group_col: str,
    id_col: str,
    budget_tokens: int,
    text_col: str = "text",
    salt: str = "tokbudget",
    hot_threshold: int | None = None,
    safety: float = 4.0,
    tokens_col: str | None = None,
) -> DataFrame:
    """Deterministic per-group TOKEN-budget sampling.

    Pretraining mixes are specified in tokens, not documents — "at most
    B tokens from this source".  Rows order within their group by salted
    hash (uniform, engine-reproducible), a running token prefix-sum is
    taken in that order, and a row survives iff its cumulative total
    stays within ``budget_tokens`` — so the kept set is a deterministic
    uniform sample whose token mass is the largest hash-prefix under the
    budget (the first over-budget doc and everything after it in hash
    order is dropped; no cherry-picking smaller later docs, which would
    bias survivors toward short documents).

    One hash-partition exchange on the group key + per-group sort
    (running-sum window); token counting is a JVM split, fused into the
    scan.  Output adds ``n_tokens`` (the doc's own count) and
    ``cum_tokens`` (its prefix total) for audit.

    **Hot-group two-phase prefilter** (r6, verdict #3; pass
    ``hot_threshold``): survivors are the maximal hash-order PREFIX whose
    token mass fits the budget, so a group counted above
    ``hot_threshold`` rows is prefiltered to the key prefix whose
    EXPECTED token mass is ``safety * budget_tokens`` (from the group's
    total token count — same cheap pre-aggregate as the row count)
    before the running-sum window sorts it.  Exactness guard: if a hot
    group's candidate prefix fits entirely within the budget, the true
    cutoff may lie beyond the prefilter (or the whole group may fit) —
    those groups fall back to the full-group window.  Candidate mass
    exceeding the budget proves the cutoff is inside the candidate set,
    so the result is exact, not approximate.  Default
    ``hot_threshold=None`` keeps the single-phase plan.

    **Eager hot-group detection** (see :func:`sample_n_per_group`): one
    cheap pre-aggregate job checks whether any group is both over the
    row threshold and over budget; if none is, the single-phase plan
    runs — the guard costs one count until real skew appears.

    **Pluggable token accounting** (r7, r6 verdict #3): pass
    ``tokens_col`` naming a precomputed per-row token count (e.g.
    ``bpe.bpe_piece_count_column`` for learned-subword budgeting) and
    it replaces the whitespace split as ``n_tokens`` — the budget then
    denominates in the deployed tokenizer's pieces, which is how real
    mixes are specified.  Everything else (hash order, prefix rule,
    hot-group prefilter) is token-definition-agnostic.
    """
    from pyspark.sql.window import Window

    key = md5_long(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(key, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # default whitespace count stays INTEGER (the registered oracle's
    # declared type); a pluggable tokens_col passes through unchanged
    toks = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.size(F.split(F.trim(F.col(text_col)), "\\s+"))
    )
    counted = docs.withColumn("n_tokens", toks)
    single_phase = counted.withColumn(
        "cum_tokens", F.sum("n_tokens").over(w)
    ).filter(F.col("cum_tokens") <= budget_tokens)
    if hot_threshold is None:
        return single_phase

    keyed = counted.withColumn("_key", key)
    stats = keyed.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_cnt"), F.sum("n_tokens").alias("_mass")
    )
    any_hot = (
        stats.filter(
            (F.col("_cnt") > hot_threshold)
            & (F.col("_mass") > budget_tokens)
        )
        .limit(1)
        .count()
    )
    if any_hot == 0:
        return single_phase
    # key prefix sized so its expected token mass is safety * budget;
    # only when the budget binds (mass > budget) — a group that fits
    # entirely must keep all rows without relying on the fallback guard
    thr = F.when(
        (F.col("_cnt") > hot_threshold) & (F.col("_mass") > budget_tokens),
        (
            F.least(
                F.lit(1.0), F.lit(safety * budget_tokens) / F.col("_mass")
            )
            * _HASH_RANGE
        ).cast("long"),
    ).otherwise(F.lit(1 << 62))
    cand = keyed.join(stats.withColumn("_thr", thr), group_col).filter(
        F.col("_key") < F.col("_thr")
    )
    # guard: candidate mass <= budget means the cutoff was NOT proven to
    # lie inside the candidate prefix -> rank those groups in full.
    # Derived from stats LEFT JOIN the candidate mass so a hot group
    # whose prefilter dropped every row (candidate mass 0) still falls
    # back instead of silently vanishing (r6 review catch)
    cand_mass = cand.groupBy(group_col).agg(F.sum("n_tokens").alias("_cmass"))
    short = (
        stats.filter(
            (F.col("_cnt") > hot_threshold)
            & (F.col("_mass") > budget_tokens)
        )
        .join(cand_mass, group_col, "left")
        .filter(
            (F.coalesce(F.col("_cmass"), F.lit(0)) <= budget_tokens)
            & (F.coalesce(F.col("_cmass"), F.lit(0)) < F.col("_mass"))
        )
        .select(group_col)
    )
    full_rows = keyed.join(F.broadcast(short), group_col, "left_semi")
    pool = cand.join(
        F.broadcast(short), group_col, "left_anti"
    ).drop("_cnt", "_mass", "_thr").unionByName(full_rows)
    w2 = (
        Window.partitionBy(group_col)
        .orderBy("_key", F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pool.withColumn("cum_tokens", F.sum("n_tokens").over(w2))
        .filter(F.col("cum_tokens") <= budget_tokens)
        # joins reorder columns; pin the single-phase output order
        .select(*docs.columns, "n_tokens", "cum_tokens")
    )


def temperature_resample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    target_rows: int,
    alpha: float = 0.5,
    salt: str = "temper",
) -> DataFrame:
    """Temperature-weighted source rebalancing (the multinomial-α mix).

    The standard pretraining-mix reweighting (mBERT/XLM-R/Gopher family):
    source ``i`` with ``n_i`` rows gets sampling weight ``n_i^alpha``
    normalized across sources, so ``alpha=1`` preserves the natural mix,
    ``alpha=0`` equalizes sources, and the usual ``0.2–0.7`` range
    up-samples small sources without letting any giant source dominate.
    Each source keeps rows at rate ``min(1, target_rows * w_i / Σw / n_i)``
    via the deterministic salted-hash threshold (``md5_long(id) < rate *
    2^60``), so the selection is reproducible across engines, re-runs,
    and partition layouts, and incremental corpus growth never flips
    previously-kept rows (only rates move).

    Scale shape: one tiny per-group count aggregate (groups = sources,
    bounded), rate arithmetic on that tiny frame, then a broadcast join
    back and a narrow filter — the corpus itself never shuffles and the
    filter fuses into its scan.  Rates stay distributed (no driver
    collect); the float weight sum is partition-order-sensitive only in
    the last ulp, which moves each threshold by ~2^60·1e-16 ≈ 100 units
    of a 2^60 key space — a per-row flip probability of ~1e-16, below
    any observable effect.
    """
    from pyspark.sql.window import Window

    if target_rows <= 0:
        raise ValueError("target_rows must be positive")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    weighted = counts.withColumn(
        "_w", F.pow(F.col("_n").cast("double"), F.lit(float(alpha)))
    )
    # total weight via a single-partition window over the TINY counts
    # frame — an agg + crossJoin would recompute the counts subtree
    # (and its corpus scan) a second time
    rates = weighted.withColumn(
        "_tw", F.sum("_w").over(Window.partitionBy())
    ).select(
        group_col,
        F.floor(
            F.least(
                F.lit(1.0),
                F.lit(float(target_rows))
                * F.col("_w")
                / F.col("_tw")
                / F.col("_n"),
            )
            * _HASH_RANGE
        )
        .cast("long")
        .alias("_thr"),
    )
    key = md5_long(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(key < F.col("_thr"))
        .select(*df.columns)
    )


def curriculum_order(
    docs: DataFrame,
    n_bins: int = 10,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "curriculum",
    epoch: int = 0,
    hot_threshold: int | None = None,
    n_bands: int = 64,
    accuracy: int = 10_000,
    cache_tracker: list | None = None,
) -> DataFrame:
    """Curriculum training order: quality-binned stages, shuffled within.

    Curriculum / annealing schedules train on cleaner data first (or
    last): documents are binned by heuristic quality QUANTILE within
    their source (bin 0 = cleanest decile; per-source binning keeps the
    mix's source composition inside every stage, the
    :func:`~.text_analysis.quality_quantile_filter` argument), then the
    global training order is ``(bin ASC, shuffle_key)`` — stages are
    consumed in quality order while documents inside a stage stream in
    deterministic salted-hash order (the :func:`epoch_shuffle` key, so
    re-runs and engine changes reproduce the exact order and ``epoch``
    reshuffles within stages without re-binning).

    Output: ``(doc_id, <group_col>, quality, bin, shuffle_key)`` — the
    two order columns are data, not an imposed sort, so the driver's
    order-insensitive hashing checks them and a shard writer
    (:func:`~..sinks.storage.write_training_shards`-style range
    partition on ``(bin, shuffle_key)``) materializes the order without
    a single-node sort.

    Scale shape: quality metrics fuse into the scan; binning is one
    group-key exchange + per-group sort.  **Hot-group banded ranking**
    (r7, r6 verdict #2; pass ``hot_threshold``): binning assigns a bin
    to EVERY row, so no prefilter can shrink the window — instead the
    rank itself decomposes through
    :func:`~.ranking.banded_percent_rank`: approx-quantile band edges
    split each group into ``n_bands`` contiguous quality ranges and
    ``band offset + within-band row_number`` reproduces
    ``percent_rank`` bit-for-bit with per-task rows bounded at
    ``~|group| / n_bands`` (exact regardless of sketch accuracy).
    Gated by the samplers' eager hot-detection count, so a healthy
    corpus keeps the single-window plan plus one cheap count; the
    shuffle key is a narrow projection either way.
    """
    from ..operators.text_analysis import quality_column
    from ..operators.ranking import banded_percent_rank, percent_rank_expr
    from pyspark.sql.window import Window

    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    # quality inline, no self-join (see quality_quantile_filter)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        group_col,
        quality_column(F.col(text_col)).alias("quality"),
    )
    key = md5_long(
        F.concat(
            F.lit(f"{salt}:{epoch}:"), F.col("doc_id").cast("string")
        )
    )

    def _bin(pct: Column) -> Column:
        return F.least(
            F.floor(pct * n_bins).cast("int"), F.lit(n_bins - 1)
        )

    if hot_threshold is not None:
        # persist-around-the-count: the eager hot-detection job doubles
        # as cache population, so the banded ranker's three passes read
        # the narrow cached frame and the corpus text is scanned once
        # (see quality_quantile_filter); cold branch leaves nothing
        # resident.
        from pyspark import StorageLevel

        base = base.persist(StorageLevel.MEMORY_AND_DISK)
        # one eager job: hot presence + group cardinality (feeds the
        # ranker's self-sizing edge broadcast — r8 verdict #4)
        hot_stats = (
            base.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .agg(
                F.sum(
                    (F.col("_cnt") > hot_threshold).cast("int")
                ).alias("_nhot"),
                F.count(F.lit(1)).alias("_ngroups"),
            )
            .collect()[0]
        )
        any_hot = hot_stats["_nhot"] or 0
        if not any_hot:
            base.unpersist()
        if any_hot:
            # returned frame reads this cache; see banded_percent_rank
            if cache_tracker is not None:
                cache_tracker.append(base)
            ranked = banded_percent_rank(
                base, group_col, "quality", "doc_id",
                n_bands=n_bands, accuracy=accuracy, persist_input=False,
                n_groups=hot_stats["_ngroups"],
            )
            return ranked.select(
                "doc_id",
                group_col,
                "quality",
                _bin(
                    percent_rank_expr(F.col("_rank"), F.col("_n"))
                ).alias("bin"),
                key.alias("shuffle_key"),
            )
    w = Window.partitionBy(group_col).orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return base.select(
        "doc_id",
        group_col,
        "quality",
        _bin(F.percent_rank().over(w)).alias("bin"),
        key.alias("shuffle_key"),
    )


def temperature_mix_report(
    df: DataFrame,
    group_col: str,
    id_col: str,
    target_rows: int,
    alpha: float = 0.5,
    salt: str = "temper",
) -> DataFrame:
    """Achieved-vs-target audit for :func:`temperature_resample`.

    A mix is a POLICY with a promise — each source keeps rows at rate
    ``min(1, target · n^alpha / Σn^alpha / n)`` — and the hash-threshold
    mechanism only approximates that rate on any finite source, so a
    real run publishes the achieved rates next to the shards.  Per
    source: ``(n_docs, n_kept, target_rate, achieved_rate)`` under the
    exact thresholds the sampler uses, so the report IS the audit of
    what :func:`temperature_resample` with the same parameters kept.

    Scale shape (the sampler's): one tiny per-source count, rate
    arithmetic on that frame, broadcast join back, one conditional
    aggregate — the corpus never shuffles and the final exchange
    carries one row per source.
    """
    from pyspark.sql.window import Window

    if target_rows <= 0:
        raise ValueError("target_rows must be positive")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    weighted = counts.withColumn(
        "_w", F.pow(F.col("_n").cast("double"), F.lit(float(alpha)))
    )
    rate = F.least(
        F.lit(1.0),
        F.lit(float(target_rows)) * F.col("_w") / F.col("_tw") / F.col("_n"),
    )
    rates = weighted.withColumn(
        "_tw", F.sum("_w").over(Window.partitionBy())
    ).select(
        group_col,
        F.col("_n"),
        F.round(rate, 6).alias("_rate"),
        F.floor(rate * _HASH_RANGE).cast("long").alias("_thr"),
    )
    key = md5_long(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    keyed = df.select(group_col, id_col).join(F.broadcast(rates), group_col)
    return (
        keyed.groupBy(group_col)
        .agg(
            F.min("_n").alias("n_docs"),
            F.sum(F.when(key < F.col("_thr"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.min("_rate").alias("target_rate"),
        )
        .select(
            group_col,
            "n_docs",
            "n_kept",
            "target_rate",
            F.round(F.col("n_kept") / F.col("n_docs"), 6).alias(
                "achieved_rate"
            ),
        )
    )
