"""Target-distribution data selection — DSIR importance resampling.

The classifier tier (:mod:`.classifier`) answers "does this document
look like the reference corpus?" with a discriminative score; DSIR —
Data Selection via Importance Resampling (Xie et al., NeurIPS 2023) —
is the *generative* counterpart that became the standard recipe for
domain-targeted pretraining subsets: fit hashed n-gram unigram models
of the TARGET distribution and of the RAW corpus, weight every raw
document by its log importance ratio

    log w(x) = Σ_f  c_f(x) · ( ln p_target[f] − ln p_raw[f] )

(``c_f(x)`` = occurrences of hashed feature ``f`` in ``x``), then
sample a fixed budget WITHOUT replacement proportionally to the
weights via the Gumbel-top-k trick (key = log w + Gumbel noise; the
top-``budget`` keys are exactly a weighted sample without
replacement).  Selecting on the ratio rather than a threshold keeps
diversity: low-ratio documents still enter with nonzero probability,
which is the paper's point versus hard classifier gates.

Cross-engine posture (the NB-weights / BM25 / bigram-LM artifact
convention):

- **Features** are lowercase alphabetic unigrams plus adjacent-word
  bigrams (the paper's hashed n-gram space), md5-bucketed into
  ``n_buckets`` — the engine's deterministic 60-bit hash, identical
  in DuckDB.
- **The model is a pinned integer artifact**: ``train_dsir_model``
  runs ONE bucket-bounded aggregate (shuffle ≤ ``n_buckets`` rows —
  the CMS posture) and a driver-side ``math.log`` pass, emitting the
  per-bucket log-ratio λ_b quantized to integer micro-nats for EVERY
  bucket (unseen buckets get the smoothing-floor ratio — a generative
  model assigns mass everywhere, unlike the NB default-0 lookup).
  Scoring never touches libm.
- **The Gumbel noise is a pinned quantile table**: stratum =
  md5('dsir:' || doc_id) mod ``n_strata``; noise = the Gumbel inverse
  CDF at the stratum midpoint, precomputed into integer micro-nats by
  :func:`gumbel_micro_table` (driver-side, once).  Stratified-Gumbel
  rather than continuous — documented quantization, deterministic,
  and exactly replayable by the oracle.  Collisions (≈ n/n_strata
  docs share a stratum) are broken by weight then doc_id.

Scale shape: scoring is a zero-shuffle scan-fused projection (map
literal + integer array ``aggregate``); the budget cut goes through
:func:`..operators.ranking.banded_percent_rank`'s exact global rank
(constant group, per-task rows ~n/64) instead of a single-task global
window or a driver-side top-k collect, so the selection survives a
corpus where ``budget`` itself is billions of rows.

No reference counterpart (the reference has no data-selection
operators); part of the commissioned LLM-pipeline extension surface.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

#: Driver-side bucket cap — one λ row per bucket comes back at train
#: time and rides every plan as a literal (the classifier's cap).
MAX_BUCKETS = 65_536

#: Default Gumbel quantile strata (table is pinned as literals in both
#: engines; 1024 ints ≈ 8 KB of plan).
GUMBEL_STRATA = 1024

#: Feature-extraction regex — the classifier tier's word convention.
WORD_RE = "[a-z]+"


def _unigrams(text_col: Column) -> Column:
    return F.regexp_extract_all(F.lower(text_col), F.lit(WORD_RE), F.lit(0))


def feature_column(text_col: Column) -> Column:
    """Hashed-n-gram feature array: unigrams ++ adjacent bigrams.

    Bigrams are ``w_i || '_' || w_{i+1}`` — the join character cannot
    appear in a ``[a-z]+`` token, so the bigram space cannot collide
    with the unigram space except through the md5 bucketing itself.
    Zero-shuffle array lambdas; NULL text yields NULL (callers filter).
    """
    w = _unigrams(text_col)
    n1 = F.greatest(F.size(w) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(w, 1, n1),
        F.slice(w, 2, n1),
        lambda a, b: F.concat(a, F.lit("_"), b),
    )
    return F.concat(w, bigrams)


def feature_sql(text_expr: str) -> str:
    """DuckDB SQL twin of :func:`feature_column`."""
    toks = f"regexp_extract_all(lower({text_expr}), '{WORD_RE}')"
    return (
        f"list_concat({toks}, list_transform(range(2, len({toks}) + 1), "
        f"i -> {toks}[i-1] || '_' || {toks}[i]))"
    )


def train_dsir_model(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 512,
    alpha: float = 0.5,
    text_col: str = "text",
) -> list[tuple[int, int]]:
    """Fit the per-bucket importance log-ratio λ_b in integer micro-nats.

    ``target`` is a boolean Column marking target-distribution rows (a
    trusted subset, a domain label); NULL reads false.  The RAW model
    is the WHOLE corpus — target rows included, per the paper: the
    importance ratio is target-vs-raw, not target-vs-rest (contrast
    ``classifier.train_nb_weights``'s disjoint pos/neg).

    λ_b = ln((t_b + α)/(T + αB)) − ln((r_b + α)/(R + αB)),  quantized
    to round(λ·1e6).  Returns ALL ``n_buckets`` entries ``(bucket,
    lambda_micro)`` in bucket order — a generative ratio assigns every
    bucket the smoothing-floor mass, so there is no default-0 escape
    hatch for unseen features.

    ONE aggregate job; the exchange carries ≤ ``n_buckets`` count rows
    (map-side partials collapse hot buckets), then a driver-side
    ``math.log`` pass over those rows.  Deterministic: exact integer
    counts, one IEEE-double log per bucket, 1e-6 quantization — the
    pinned-artifact provenance test re-derives it bit-for-bit.
    """
    if not 1 <= n_buckets <= MAX_BUCKETS:
        raise ValueError(
            f"train_dsir_model: n_buckets must be in [1, {MAX_BUCKETS}] — "
            "one λ row per bucket is collected to the driver and inlined "
            "into every scoring plan; raise MAX_BUCKETS consciously"
        )
    occ = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.coalesce(target, F.lit(False)).alias("_t"),
            F.explode(feature_column(F.col(text_col))).alias("_f"),
        )
        .select("_t", F.pmod(md5_long(F.col("_f")), F.lit(n_buckets)).alias("_b"))
    )
    rows = (
        occ.groupBy("_b")
        .agg(
            F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("_tc"),
            F.count(F.lit(1)).alias("_rc"),
        )
        .collect()
    )
    tc = {int(r["_b"]): int(r["_tc"]) for r in rows}
    rc = {int(r["_b"]): int(r["_rc"]) for r in rows}
    tt, rt = sum(tc.values()), sum(rc.values())
    d = float(n_buckets)
    out = []
    for b in range(n_buckets):
        lam = math.log((tc.get(b, 0) + alpha) / (tt + alpha * d)) - math.log(
            (rc.get(b, 0) + alpha) / (rt + alpha * d)
        )
        out.append((b, round(lam * 1_000_000)))
    return out


def gumbel_micro_table(n_strata: int = GUMBEL_STRATA) -> list[int]:
    """Pinned Gumbel quantile table in integer micro-units.

    Entry ``s`` is ``round(−ln(−ln((s + 0.5)/n_strata)) · 1e6)`` — the
    standard-Gumbel inverse CDF at the stratum midpoint (midpoints
    dodge the u∈{0,1} poles).  Driver-side libm, once; both engines
    consume only the integers.
    """
    if n_strata < 2:
        raise ValueError("gumbel_micro_table: n_strata must be >= 2")
    return [
        round(-math.log(-math.log((s + 0.5) / n_strata)) * 1_000_000)
        for s in range(n_strata)
    ]


def dsir_weight_column(
    model: list[tuple[int, int]], n_buckets: int, text_col: Column
) -> tuple[Column, Column]:
    """``(n_feats, weight_micro)`` inline columns under a pinned model.

    The λ table rides as one ``map()`` literal; each feature costs one
    md5 + one map lookup, summed left-to-right in exact integer
    arithmetic (order-free — cross-engine aggregation order cannot
    diverge).  The model is dense, so the lookup cannot miss; the
    coalesce guards only the empty-feature NULL.
    """
    lmap = F.map_from_arrays(
        F.array(*[F.lit(b) for b, _ in model]),
        F.array(*[F.lit(v).cast("long") for _, v in model]),
    )
    feats = feature_column(text_col)
    n_feats = F.coalesce(F.size(feats), F.lit(0))
    total = F.coalesce(
        F.aggregate(
            feats,
            F.lit(0).cast("long"),
            lambda acc, w: acc
            + F.element_at(lmap, F.pmod(md5_long(w), F.lit(n_buckets))),
        ),
        F.lit(0).cast("long"),
    )
    return n_feats, total


def dsir_oracle_weight_sql(
    model: list[tuple[int, int]], n_buckets: int, text_expr: str = "text"
) -> str:
    """DuckDB SQL twin of :func:`dsir_weight_column`'s micro-nat sum."""
    dense = [0] * n_buckets
    for b, v in model:
        dense[b] = v
    lst = "[" + ", ".join(str(v) for v in dense) + "]"
    bucket = (
        f"CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % {n_buckets}"
    )
    return (
        "COALESCE(CAST(list_sum(list_transform("
        f"{feature_sql(text_expr)}, w -> ({lst})[{bucket} + 1])) "
        "AS BIGINT), 0)"
    )


def dsir_importance_weights(
    docs: DataFrame,
    model: list[tuple[int, int]],
    n_buckets: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR log importance weights under a pinned model.

    Output ``(doc_id, n_feats, logw)`` — ``logw`` the 6dp log ratio in
    nats (``weight_micro / 1e6``).  NULL-text rows are excluded: a
    selection operator has nothing to resample from an empty document.
    Zero shuffles; the scan is the only stage.
    """
    n_feats, total = dsir_weight_column(model, n_buckets, F.col(text_col))
    return docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        n_feats.alias("n_feats"),
        F.round(total / F.lit(1_000_000.0), 6).alias("logw"),
    )


def dsir_select(
    docs: DataFrame,
    model: list[tuple[int, int]],
    budget: int,
    n_buckets: int = 512,
    gumbel: list[int] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 64,
) -> DataFrame:
    """Resample ``budget`` documents ∝ importance weight (Gumbel-top-k).

    key = weight_micro + gumbel[md5('dsir:' || doc_id) mod strata]; the
    top-``budget`` keys under ``(key DESC, doc_id ASC)`` are the
    selected sample.  Output ``(doc_id, n_feats, logw, key_micro,
    sel_rank)``, ``sel_rank`` the 1-based selection order.

    The cut is an exact banded global rank (constant group) — NOT a
    ``LIMIT``/``TakeOrderedAndProject``, which would funnel ``budget``
    rows through the driver, nor a partition-less window, which would
    sort the corpus in one task.  Cost: three scans of the narrow score
    projection (edges / band counts / rank — the
    ``banded_percent_rank`` contract); the per-task row bound is
    ~n/``n_bands`` at any corpus size.
    """
    if budget < 1:
        raise ValueError("dsir_select: budget must be >= 1")
    g = gumbel if gumbel is not None else gumbel_micro_table()
    n_strata = len(g)
    gmap = F.array(*[F.lit(v).cast("long") for v in g])
    n_feats, total = dsir_weight_column(model, n_buckets, F.col(text_col))
    stratum = F.pmod(
        md5_long(F.concat(F.lit("dsir:"), F.col(id_col).cast("string"))),
        F.lit(n_strata),
    )
    scored = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        n_feats.alias("n_feats"),
        F.round(total / F.lit(1_000_000.0), 6).alias("logw"),
        (total + F.element_at(gmap, (stratum + 1).cast("int"))).alias(
            "key_micro"
        ),
    )
    from .ranking import banded_percent_rank

    ranked = banded_percent_rank(
        scored.withColumn("_g", F.lit(1)),
        "_g",
        "key_micro",
        "doc_id",
        n_bands=n_bands,
        n_groups=1,
    )
    return (
        ranked.filter(F.col("_rank") <= budget)
        .select(
            "doc_id",
            "n_feats",
            "logw",
            F.col("key_micro").cast("long").alias("key_micro"),
            F.col("_rank").cast("long").alias("sel_rank"),
        )
    )
