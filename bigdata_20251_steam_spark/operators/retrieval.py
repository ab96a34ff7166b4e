"""Lexical retrieval scoring — BM25 over the documents corpus.

The lexical complement to the embedding ANN tier
(:mod:`.similarity`): given a bag of query terms, score every
document by Okapi BM25 (Robertson & Zaragoza 2009) — the ranking
function behind classic search engines and the standard lexical
baseline next to dense retrieval.  A training-data pipeline uses it
for targeted corpus slicing ("pull the documents about X"), weak
supervision, and retrieval-augmented dataset construction.

Cross-engine posture (the NB-weights / bigram-LM artifact
convention): the corpus-dependent half of BM25 — per-term inverse
document frequencies and the average document length — is TRAINED
once into integer micro-units by :func:`train_bm25_stats` (driver-side
``math.log``, bounded by the query-term count) and shipped as a
pinned literal artifact.  Scoring is then a zero-shuffle narrow
projection whose only float operations are IEEE-identical
divisions/multiplications of pinned literals, so the DuckDB oracle
replays scores bit-for-bit without sharing a libm.

No reference counterpart (the reference has no retrieval operators);
extends SURVEY.md §2's similarity-search tier on the lexical axis.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _toks(text_col: Column) -> Column:
    """The corpus tokenization convention (lower, trim, whitespace)."""
    return F.array_remove(F.split(F.lower(F.trim(text_col)), r"\s+"), "")


def train_bm25_stats(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
) -> dict:
    """Fit the corpus-dependent BM25 statistics for ``terms``.

    Returns ``{"n_docs", "avgdl_micro", "idf_micro": {term: int}}``:

    - ``idf_micro[t]`` = ``round(ln((N - df_t + 0.5) / (df_t + 0.5)
      + 1) * 1e6)`` — the Robertson/Sparck-Jones idf with the +1 floor
      (never negative), quantized to integer micro-nats at train time
      so no engine ever evaluates a log;
    - ``avgdl_micro`` = mean token count over non-null docs × 1e6,
      rounded — the only other corpus scalar BM25 needs.

    ONE aggregate job bounded by ``len(terms)`` (term presence flags
    fold map-side; the exchange carries a single row).  The kilobyte
    result is plain data — pin it as a literal artifact next to the
    query that ships it (provenance-tested, like the NB weights).
    """
    if not terms:
        raise ValueError("train_bm25_stats: terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError("train_bm25_stats: duplicate terms")
    toks = _toks(F.col(text_col))
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.size(toks)).alias("_dl_sum"),
    ] + [
        F.sum(F.array_contains(toks, t).cast("long")).alias(f"_df_{i}")
        for i, t in enumerate(terms)
    ]
    row = docs.filter(F.col(text_col).isNotNull()).agg(*aggs).collect()[0]
    n = int(row["_n"])
    if n == 0:
        raise ValueError("train_bm25_stats: corpus has no non-null docs")
    avgdl = int(row["_dl_sum"]) / n
    idf = {
        t: round(
            math.log((n - int(row[f"_df_{i}"]) + 0.5)
                     / (int(row[f"_df_{i}"]) + 0.5) + 1.0) * 1e6
        )
        for i, t in enumerate(terms)
    }
    return {
        "n_docs": n,
        "avgdl_micro": round(avgdl * 1e6),
        "idf_micro": idf,
    }


def bm25_scores(
    docs: DataFrame,
    model: dict,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document against the pinned BM25 model.

    ``score = Σ_t idf(t) · tf_t·(k1+1) / (tf_t + k1·(1−b+b·dl/avgdl))``
    summed in the model's term order (fixed association, so the float
    result is engine-independent); 6dp-rounded.  Output ``(doc_id,
    n_tokens, bm25)``; NULL text scores ``(0, 0.0)``.

    Plan shape: a single-scan zero-shuffle projection — term
    frequencies are ``size(filter(tokens, == t))`` array lambdas, the
    idf table rides as integer literals, and nothing aggregates, so
    the operator composes into any pipeline without an exchange (the
    NB-scoring contract, plan-asserted by the plan-quality suite).
    """
    toks = _toks(F.col(text_col))
    step = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("_toks")
    )
    tk = F.col("_toks")
    dl = F.size(tk)
    avgdl = float(model["avgdl_micro"]) / 1e6
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * dl.cast("double") / F.lit(avgdl)
    )
    score = None
    for t, idf_u in model["idf_micro"].items():
        tf = F.size(F.filter(tk, lambda w: w == F.lit(t))).cast("double")
        part = (
            F.lit(float(idf_u) / 1e6)
            * (tf * F.lit(k1 + 1.0))
            / (tf + norm)
        )
        score = part if score is None else score + part
    n_tokens = F.when(tk.isNull(), F.lit(0)).otherwise(dl)
    return step.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.when(tk.isNull() | (dl == 0), F.lit(0.0))
        .otherwise(F.round(score, 6))
        .alias("bm25"),
    )
