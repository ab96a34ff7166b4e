"""Join helpers for skew beyond what AQE handles automatically.

AQE's skew-join split (enabled in session.py) handles most skew by
splitting oversized shuffle partitions, but it only works for sort-merge
joins after stats exist.  ``salted_join`` is the explicit form for known
pathological keys (the classic: one hot entity owning 10% of a 100 TB
fact table): the skewed side spreads each key across ``n_salts``
sub-partitions, the other side replicates its rows to every salt, and the
join key becomes (key, salt) — hot keys now occupy n_salts tasks instead
of one straggler.

Replication multiplies the right side by n_salts, so use this when the
right side is too big to broadcast but much smaller than the skewed left
(the broadcast join already solves the small-dim case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to heavy key skew on the ``skewed`` side.

    The salt on the skewed side is derived from a row hash (spreads a hot
    key's rows uniformly); the other side explodes a salt array.  Output
    matches ``skewed.join(other, on, how)`` for left-preserving joins only
    (inner / left / left_semi / left_anti): because each ``other`` row is
    replicated once per salt, a right or full outer join would emit every
    unmatched right row ``n_salts`` times — those modes are rejected.
    """
    allowed = {
        "inner", "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi",
        "anti", "leftanti", "left_anti",
    }
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins only {sorted(allowed)}; "
            f"got how={how!r} (right/full outer would duplicate unmatched "
            "right rows n_salts times)"
        )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)
    ).cast("int")
    left = skewed.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    out = left.join(right, [on, "_salt"], how)
    return out.drop("_salt")


def key_skew_stats(df: DataFrame, key_col: str, top_k: int = 20) -> DataFrame:
    """Top-k heavy keys with their share of all rows — the skew monitor.

    Every skew mitigation in this engine (``salted_join``, the samplers'
    ``hot_threshold``, the LSH ``max_bucket`` star policy) needs to know
    WHICH keys are hot and how hot; this is the companion diagnostic (the
    ``lsh_bucket_stats`` pattern generalized to any key): per heavy key,
    its row count, share of the table, and rank.  Run it on a join key
    before sizing salts, or schedule it as the health check that catches
    a 100 TB key distribution drifting toward a mitigation threshold.

    Scale shape: one count aggregate on the key (map-side partials), a
    tiny global-total broadcast, and a distributed partial top-k
    (``orderBy().limit()`` plans as TakeOrdered — per-partition heaps
    merged at the driver, NO single-task global sort even with millions
    of distinct keys); only the <=k survivors pass through the ranking
    window.  The table itself is scanned once; nothing quadratic,
    nothing collected.  Deterministic: ties rank by key order.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(
        F.sum("n").alias("_tot"), F.count(F.lit(1)).alias("n_keys")
    )
    top = counts.orderBy(F.col("n").desc(), F.col(key_col).asc()).limit(
        top_k
    )
    w = Window.orderBy(F.col("n").desc(), F.col(key_col).asc())
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .select(
            key_col,
            "n",
            F.round(F.col("n") / F.col("_tot"), 6).alias("share"),
            "rank",
            "n_keys",
        )
    )
