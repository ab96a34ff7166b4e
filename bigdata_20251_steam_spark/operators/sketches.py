"""Mergeable sketch operators (HLL via Spark built-ins; Bloom as a table).

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

The Bloom-filter half of this module represents the filter as a
DataFrame of ``(word_idx, bits)`` 63-bit machine words rather than one
driver-side byte buffer (``DataFrame.stat.bloomFilter`` collects to the
driver; ``bloom_filter_agg`` is not public SQL).  The table form keeps
every step distributed *and* mergeable (union = groupBy ``bit_or``),
and — because every probe position is the repo's deterministic
``md5_long`` — a SQL oracle can rebuild the exact same filter
bit-for-bit, so membership answers are exactly checkable, not just
invariant-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long, md5_long_sql


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


# ---------------------------------------------------------------------------
# Blocked Bloom filter as a (word_idx, bits) table
# ---------------------------------------------------------------------------

#: Bits used per machine word.  63, not 64: the mask is ``1 << bit`` and
#: DuckDB raises on the ``1 << 63`` BIGINT overflow that the JVM silently
#: wraps — bit 63 is therefore unusable in a cross-engine-exact filter.
BLOOM_WORD_BITS = 63


def _bloom_positions(value: Column, m_bits: int, k: int, salt: str) -> list[Column]:
    """The ``k`` salted-hash bit positions of a value, each in [0, m_bits)."""
    return [
        md5_long(F.concat(F.lit(f"{salt}:{i}:"), value.cast("string"))) % m_bits
        for i in range(k)
    ]


def bloom_positions_sql(expr: str, m_bits: int, k: int, salt: str) -> list[str]:
    """DuckDB SQL twins of :func:`_bloom_positions` (for oracles)."""
    return [
        f"({md5_long_sql(f'''('{salt}:{i}:' || CAST({expr} AS VARCHAR))''')} % {m_bits})"
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
    salt: str = "bloom",
) -> DataFrame:
    """Build a Bloom filter over a column as a ``(word_idx, bits)`` table.

    Each value sets ``k`` md5-salted bit positions in an ``m_bits``-bit
    array stored as 63-bit words; only words with at least one set bit
    materialize as rows, so a sparse filter is also storage-sparse.
    Standard guarantees: a member is ALWAYS flagged (no false negatives);
    a non-member is flagged with probability ~``(1 - e^(-k*n/m))^k``.

    Scale shape: one narrow projection + explode (×k) fused into the
    scan, then a groupBy on ``word_idx`` whose output is bounded by
    ``m_bits/63`` rows regardless of input size, with full map-side
    ``bit_or`` partials — the shuffle carries at most the filter itself,
    never the corpus.  The result is persistable (a tiny parquet table)
    and mergeable across days/shards/clusters via :func:`bloom_merge` —
    the membership artifact for ingest-time dedup and benchmark
    decontamination where the exact key set (100 TB of text or 3-gram
    hashes) is too large to keep, but ~1.2 GB of filter bits covers 1e9
    keys at ~1% false positives.
    """
    if m_bits < 1 or k < 1:
        raise ValueError("bloom_build: m_bits and k must be >= 1")
    pos = F.explode(
        F.array(*_bloom_positions(F.col(value_col), m_bits, k, salt))
    ).alias("_pos")
    return (
        df.select(pos)
        .select(
            F.floor(F.col("_pos") / BLOOM_WORD_BITS).cast("long").alias("word_idx"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("_pos") % BLOOM_WORD_BITS).cast("int"),
            ).alias("_mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Union Bloom filters built with identical (m_bits, k, salt).

    Bitwise-OR is the native merge of Bloom filters: the result answers
    membership for the union of the inserted sets.  This is what makes
    the table form fleet-composable — 1000 executors (or 30 daily jobs)
    each build a partial filter and one ``bit_or`` groupBy combines them
    losslessly.
    """
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


#: Auto-inline bound for :func:`bloom_might_contain`: filters at or
#: below this many bits (≈2 k words, ~32 KB) collect to the driver and
#: ride the probe plan as a map literal instead of k joins.
BLOOM_INLINE_MAX_BITS = 1 << 17


def cms_build(
    df: DataFrame,
    value_col: str,
    width: int = 1 << 12,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch over a column as a ``(d, col, cnt)`` table.

    The frequency sibling of :func:`bloom_build` (membership) and
    :func:`hll_sketches` (distinct): each occurrence increments one
    counter per depth row at ``md5_long(salt:d:value) % width``, and a
    value's estimated frequency is the MINIMUM of its ``depth``
    counters — a one-sided estimate (never under the true count, over
    by at most ``e·N/width`` with probability ``1 - e^-depth``).  The
    standard primitive for heavy-hitter / frequent-token detection
    when the distinct domain (tokens, URLs, n-grams) is too large to
    count exactly.

    Scale shape: explode (×depth) fused into the scan, then a groupBy
    whose output is bounded by ``depth × width`` rows regardless of
    input size, with map-side partial counts — like the Bloom build,
    the shuffle carries at most the sketch itself.  Mergeable across
    shards/days by summing counters (:func:`cms_merge`); deterministic
    md5 positions mean a SQL oracle reproduces every counter exactly.
    """
    if width < 1 or depth < 1:
        raise ValueError("cms_build: width and depth must be >= 1")
    pos = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    (
                        md5_long(
                            F.concat(
                                F.lit(f"{salt}:{d}:"),
                                F.col(value_col).cast("string"),
                            )
                        )
                        % width
                    ).alias("col"),
                )
                for d in range(depth)
            ]
        )
    ).alias("_p")
    return (
        df.select(pos)
        .select("_p.d", "_p.col")
        .groupBy("d", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sum count-min sketches built with identical (width, depth, salt)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch_df: DataFrame,
    probes: DataFrame,
    value_col: str,
    width: int,
    depth: int,
    salt: str = "cms",
    est_col: str = "est_count",
) -> DataFrame:
    """Append each probe value's count-min frequency estimate.

    The sketch is ``depth × width`` counters by construction — small
    enough to collect (the IVF centroid-pull idiom) and inline as a
    literal map keyed ``d·width + col``, so estimation is a zero-join,
    zero-shuffle projection over the probes.  For sketches sized
    beyond literal-map range, the Bloom join-path shape applies
    (``depth`` broadcast joins on ``(d, col)``).
    """
    rows = sketch_df.collect()
    # lit(list) — drops the per-element .cast py4j calls (~2x fewer
    # round-trips; ConstantFolding folds both forms identically —
    # ADVICE r17 corrected the single-Literal claim for classic mode)
    counters = F.map_from_arrays(
        F.lit([int(r["d"]) * width + int(r["col"]) for r in rows]).cast(
            "array<long>"
        ),
        F.lit([int(r["cnt"]) for r in rows]).cast("array<long>"),
    ) if rows else None
    ests = []
    for d in range(depth):
        key = (
            md5_long(
                F.concat(F.lit(f"{salt}:{d}:"), F.col(value_col).cast("string"))
            )
            % width
            + d * width
        )
        ests.append(
            F.coalesce(F.element_at(counters, key), F.lit(0).cast("long"))
            if counters is not None
            else F.lit(0).cast("long")
        )
    return probes.withColumn(
        est_col, ests[0] if len(ests) == 1 else F.least(*ests)
    )


def bloom_might_contain(
    filter_df: DataFrame,
    probes: DataFrame,
    value_col: str,
    m_bits: int,
    k: int,
    salt: str = "bloom",
    flag_col: str = "might_contain",
    inline: bool | None = None,
) -> DataFrame:
    """Append a membership flag column to ``probes``.

    ``flag_col`` is true iff ALL ``k`` probe bits are set in the filter —
    so false means *definitely not inserted* and true means *inserted, or
    a false positive* (rate set by m/k/n; no false negatives ever).

    Scale shape, two regimes:

    - **inline** (default for ``m_bits <= BLOOM_INLINE_MAX_BITS``): the
      filter — tiny by construction — collects to the driver (the IVF
      centroid-pull idiom) and rides the probe plan as a word→bits map
      literal, so the probe side is a single narrow projection: zero
      joins, zero shuffles, and the filter subtree is computed exactly
      once rather than once per probe position.
    - **join** (large filters): ``k`` broadcast hash joins against the
      filter table (a 1e9-key / 1%-FP filter is ~150 MB of words,
      inside broadcast range), so the probe corpus still never
      shuffles.  The filter subtree feeds k broadcasts — persist or
      materialize it first (it is a persistable artifact; real
      pipelines build it once and probe it for months).  For filters
      too big even to broadcast, drop the hint: the same plan becomes
      ``k`` shuffle joins co-partitioned on ``word_idx``.
    """
    if m_bits < 1 or k < 1:
        raise ValueError("bloom_might_contain: m_bits and k must be >= 1")
    if inline is None:
        inline = m_bits <= BLOOM_INLINE_MAX_BITS
    positions = _bloom_positions(F.col(value_col), m_bits, k, salt)
    if inline:
        rows = filter_df.collect()
        if not rows:
            return probes.withColumn(
                flag_col,
                F.when(F.col(value_col).isNull(), F.lit(None).cast("boolean"))
                .otherwise(F.lit(False)),
            )
        # lit(list) — drops the per-element .cast py4j calls (see the
        # CMS counter-map note above; ADVICE r17)
        words = F.map_from_arrays(
            F.lit([int(r["word_idx"]) for r in rows]).cast("array<long>"),
            F.lit([int(r["bits"]) for r in rows]).cast("array<long>"),
        )
        present = None
        for p in positions:
            w = F.floor(p / BLOOM_WORD_BITS).cast("long")
            mask = F.call_function(
                "shiftleft", F.lit(1).cast("long"),
                (p % BLOOM_WORD_BITS).cast("int"),
            )
            hit = (
                F.coalesce(F.element_at(words, w), F.lit(0).cast("long"))
                .bitwiseAND(mask)
                == mask
            )
            present = hit if present is None else (present & hit)
        return probes.withColumn(flag_col, present)
    out = probes
    present = None
    for i, p in enumerate(positions):
        w = F.floor(p / BLOOM_WORD_BITS).cast("long")
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % BLOOM_WORD_BITS).cast("int")
        )
        f_i = filter_df.select(
            F.col("word_idx").alias(f"_w{i}"), F.col("bits").alias(f"_b{i}")
        )
        out = out.join(F.broadcast(f_i), w == F.col(f"_w{i}"), "left")
        hit = (
            F.coalesce(F.col(f"_b{i}"), F.lit(0).cast("long")).bitwiseAND(mask)
            == mask
        )
        present = hit if present is None else (present & hit)
    return out.withColumn(flag_col, present).drop(
        *[c for i in range(k) for c in (f"_w{i}", f"_b{i}")]
    )
