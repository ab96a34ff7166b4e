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


def sample_n_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n: int,
    salt: str = "groupsample",
) -> DataFrame:
    """Deterministic n-rows-per-group cap (source/domain capping).

    The pretraining-mix primitive "no single source may contribute more
    than N documents": rows rank within their group by salted content
    hash (uniform, engine-reproducible) and the first ``n`` survive —
    a deterministic uniform sample without RNG, stable under re-runs,
    repartitioning, and engine changes.

    Scale shape: one hash-partition exchange on the group key plus a
    per-group sort.  For a pathologically hot group at 100 TB, pre-filter
    with a hash threshold (keep ``hash < c * n / |group|`` for a safety
    factor c, one cheap count-per-group pass) so the window sorts only
    ~c*n candidate rows per group instead of the full group — the same
    two-phase trick as the ANN top-k; the exact rank then trims the
    margin.  At the corpus sizes tested the single-phase form is optimal.
    """
    from pyspark.sql.window import Window

    key = md5_long(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= n)
        .drop("_rank")
    )


def token_budget_sample(
    docs: DataFrame,
    group_col: str,
    id_col: str,
    budget_tokens: int,
    text_col: str = "text",
    salt: str = "tokbudget",
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
    toks = F.size(F.split(F.trim(F.col(text_col)), "\\s+"))
    return (
        docs.withColumn("n_tokens", toks)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
    )
