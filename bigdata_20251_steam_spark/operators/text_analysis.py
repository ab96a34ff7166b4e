"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All JVM built-ins (regex, array lambdas, md5-derived hashes) — the per-doc
cost is linear in text length with zero Python in the path, so throughput
scales with cores regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import HASH_PRIME, md5_long
from ..functions.text import STOPWORDS
from .dedup import spread_partitions

#: BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens, n_chars_measured) token accounting."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(t), "\\s+")).alias("ws_tokens"),
        F.regexp_count(t, F.lit(TOKEN_REGEX)).alias("bpe_tokens"),
        F.length(t).alias("n_chars_measured"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit heuristic language identifier.

    Scores each language by |tokens ∩ stopwords(lang)|; argmax with
    alphabetical tie-break (deterministic).  A real system would use
    character n-gram profiles; the operator shape (per-doc array ops +
    scores + argmax) is identical.
    """
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), "\\s+"))
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias(
            f"score_{lang}"
        )
        for lang, ws in sorted(STOPWORDS.items())
    ]
    scored = docs.select("doc_id", F.col("lang").alias("labeled_lang"), *scores)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    # reverse order => earlier (alphabetical) languages win ties
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        "doc_id",
        "labeled_lang",
        pred.alias("pred_lang"),
        best.alias("best_score"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality metrics: length, punctuation ratio, stopword ratio.

    quality = clamp(0, 1, 0.5*stopword_ratio + 0.5*(1 - punct_ratio))
    scaled by a length factor — the standard cheap pre-filter shape for
    training-data pipelines (exact weights are policy, not engine).
    """
    t = F.col(text_col)
    toks = F.split(F.lower(F.trim(t)), "\\s+")
    n_toks = F.size(toks)
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda w: F.array_contains(en_stop, w)))
    punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    n_chars = F.length(t)
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits / F.greatest(n_toks, F.lit(1))
    len_factor = F.least(n_toks / F.lit(20.0), F.lit(1.0))
    quality = F.least(
        F.greatest(
            (F.lit(0.5) * stop_ratio + F.lit(0.5) * (1 - punct_ratio)) * len_factor,
            F.lit(0.0),
        ),
        F.lit(1.0),
    )
    return docs.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Position-weighted rolling hash fingerprint per document.

    FP = ( Σ_i  i * (H(token_i) mod P) ) mod P  over 1-based positions —
    order-sensitive (unlike a bag-of-words hash) with bounded intermediate
    magnitude: the modulo is applied inside the aggregate merge step, so
    the accumulator stays < P < 2^31 and each (acc + term) stays < 2^52 —
    no int64 wrap at ANY document length (a raw running sum would silently
    overflow past ~65k tokens and diverge from oracles that sum in
    arbitrary precision).

    One ``aggregate`` pass over the per-doc token array (the (w, i)
    two-arg ``transform`` lambda supplies positions) — zero shuffles, vs
    the posexplode+groupBy formulation that shuffled every token.
    Positions index the *raw* split (empty tokens keep their slot but
    contribute 0), matching the oracle's ``generate_subscripts``.
    """
    toks = spread_partitions(docs, "doc_id").select(
        "doc_id", F.split(F.trim(F.col(text_col)), "\\s+").alias("ws")
    ).filter(F.size(F.array_remove("ws", "")) > 0)
    terms = F.transform(
        "ws",
        lambda w, i: F.when(
            w != "", (i + 1).cast("long") * (md5_long(w) % HASH_PRIME)
        ).otherwise(F.lit(0).cast("long")),
    )
    fp = F.aggregate(
        terms, F.lit(0).cast("long"), lambda acc, x: (acc + x) % HASH_PRIME
    )
    return toks.select("doc_id", fp.alias("fingerprint"))
