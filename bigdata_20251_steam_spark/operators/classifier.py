"""Model-based quality classification — hashed Naive-Bayes log-odds.

The heuristic quality scores (`text_analysis.quality_scores`) cover the
length/punctuation/stopword tier; real curation pipelines additionally
filter on a LEARNED classifier — "does this document look like the
reference corpus?" (the CCNet / LLaMA Wikipedia-reference shape, and the
fastText quality classifiers used for CommonCrawl filtering).  This
module supplies that tier in the engine's cross-engine-exact style:

**Training** (:func:`train_nb_weights`): features are lowercase
alphabetic words hashed into ``n_buckets`` via the engine's md5 bucket
hash (the hashing trick — vocabulary never grows the model); per-bucket
occurrence counts for positive (reference) vs negative documents
collapse through ONE bounded aggregate (map-side partials, the shuffle
carries at most ``n_buckets`` rows — the CMS/HLL posture), and the
Naive-Bayes log-odds weight per bucket

    w_b = ln((pos_b + a) / (pos_total + a*D)) -
          ln((neg_b + a) / (neg_total + a*D))

is computed driver-side over those <= D rows (bounded like the BPE
vocabulary pull; a loud cap guards it).  Weights are quantized to
INTEGER micro-nats (round(1e6 * w_b)) — this is what makes scoring
bit-exact across engines: per-document sums of integers are
order-independent, so the oracle's arbitrary aggregation order cannot
diverge from Spark's, and the only floating-point ops left (one
division, one 6dp round) are exactly reproducible.

**Scoring** (:func:`nb_score_column` / :func:`nb_quality_scores`)
applies a FIXED weights table — the production posture: classifiers are
artifacts, trained once and shipped (like the BPE merges table), so the
registered query pins its weights as a constant and the DuckDB oracle
replays scoring exactly via a list-literal lookup.  The weights ride
the plan as a ``map()`` literal (kilobytes, broadcast with the plan);
the pass is a zero-shuffle narrow projection fused into the scan —
scan-bound at any corpus size, no Python anywhere.

score = (sum of word-bucket weights in micro-nats) / 1e6 / n_words —
mean log-odds per token; > 0 reads "more reference-like than not".

No reference counterpart (the reference has no ML scoring); part of the
commissioned LLM-pipeline extension surface.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

#: Driver-side bucket cap: one count row per bucket comes back to the
#: driver at train time.
MAX_BUCKETS = 65_536


def _bucket(word: Column, n_buckets: int) -> Column:
    """md5-derived feature bucket (0..n_buckets-1), JVM-side, no UDF."""
    return F.pmod(md5_long(word), F.lit(n_buckets))


def train_nb_weights(
    docs: DataFrame,
    positive: Column,
    n_buckets: int = 256,
    alpha: float = 0.5,
    text_col: str = "text",
) -> list[tuple[int, int]]:
    """Learn integer micro-nat log-odds weights per feature bucket.

    ``positive`` is a boolean Column marking reference documents — the
    label is POLICY (a curated subset, a trusted source), not engine;
    rows where it is NULL are excluded from training.  Returns sorted
    ``(bucket, weight_micro_nats)`` pairs for every bucket with at
    least one occurrence; unseen buckets are unreachable when scoring
    the training corpus and score 0 via the lookup default otherwise.

    Determinism: bucket counts are exact integers, the log-odds are
    computed in one pass of IEEE-double ``math.log`` per bucket, and the
    1e-6 quantization makes every downstream consumer integer-exact —
    the pinned-artifact provenance test re-derives the table
    bit-for-bit.
    """
    if not 1 <= n_buckets <= MAX_BUCKETS:
        raise ValueError(
            f"train_nb_weights: n_buckets must be in [1, {MAX_BUCKETS}] — "
            "one count row per bucket is collected to the driver; raise "
            "MAX_BUCKETS consciously if a bigger feature space is required"
        )
    words = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z]+"), F.lit(0)
    )
    occ = (
        docs.filter(positive.isNotNull())
        .select(positive.alias("_pos"), F.explode(words).alias("_w"))
        .select("_pos", _bucket(F.col("_w"), n_buckets).alias("_b"))
    )
    rows = (
        occ.groupBy("_b")
        .agg(
            F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("_pc"),
            F.sum(F.when(~F.col("_pos"), 1).otherwise(0)).alias("_nc"),
        )
        .collect()
    )
    pt = sum(int(r["_pc"]) for r in rows)
    nt = sum(int(r["_nc"]) for r in rows)
    d = float(n_buckets)
    out = []
    for r in sorted(rows, key=lambda r: int(r["_b"])):
        w = math.log((int(r["_pc"]) + alpha) / (pt + alpha * d)) - math.log(
            (int(r["_nc"]) + alpha) / (nt + alpha * d)
        )
        out.append((int(r["_b"]), round(w * 1_000_000)))
    return out


def nb_score_column(
    weights: list[tuple[int, int]], n_buckets: int, text_col: Column
) -> tuple[Column, Column]:
    """``(n_words, micro_nat_sum)`` inline columns under a fixed table.

    The weights ride as one ``map()`` literal; each word costs one md5 +
    one map lookup, summed by a left-to-right array ``aggregate`` in
    exact integer arithmetic.
    """
    wmap = F.map_from_arrays(
        F.array(*[F.lit(b) for b, _ in weights]),
        F.array(*[F.lit(w).cast("long") for _, w in weights]),
    )
    words = F.regexp_extract_all(F.lower(text_col), F.lit("[a-z]+"), F.lit(0))
    n_words = F.coalesce(F.size(words), F.lit(0))
    total = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.coalesce(
            F.element_at(wmap, F.pmod(md5_long(w), F.lit(n_buckets))),
            F.lit(0).cast("long"),
        ),
    )
    return n_words, total


def nb_quality_scores(
    docs: DataFrame,
    weights: list[tuple[int, int]],
    n_buckets: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Per-document classifier scores under a fixed weights table.

    Output: ``(doc_id, n_words, score, pred)`` — ``score`` is the 6dp
    mean log-odds per token (NULL for wordless documents), ``pred`` the
    ``score > 0`` reference-likeness flag.  Zero shuffles; the scan is
    the only stage.
    """
    n_words, total = nb_score_column(weights, n_buckets, F.col(text_col))
    score = F.when(
        n_words > 0,
        F.round(total / F.lit(1_000_000.0) / n_words, 6),
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        score.alias("score"),
        (score > 0).alias("pred"),
    )


def nb_oracle_score_sql(
    weights: list[tuple[int, int]], n_buckets: int, text_expr: str = "text"
) -> str:
    """DuckDB SQL twin of :func:`nb_score_column`'s micro-nat sum.

    The weights become a dense list literal indexed by bucket (missing
    buckets 0) — integer sums are order-free, so any aggregation order
    matches Spark bit-for-bit.
    """
    dense = [0] * n_buckets
    for b, w in weights:
        dense[b] = w
    lst = "[" + ", ".join(str(w) for w in dense) + "]"
    bucket = (
        f"CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % {n_buckets}"
    )
    return (
        "COALESCE(list_sum(list_transform("
        f"regexp_extract_all(lower({text_expr}), '[a-z]+'), "
        f"w -> ({lst})[{bucket} + 1])), 0)"
    )
