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


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of per-query rankings (Cormack et al. 2009).

    The standard hybrid-retrieval combiner: each input frame is
    ``(query_id, doc_id, rank)`` from one retrieval tier (lexical BM25,
    dense ANN, ...); a document's fused score is

        ``rrf_micro = sum over tiers of (1_000_000_000 DIV (c + rank))``

    — the classic ``1/(c+rank)`` in integer micro-units (64-bit DIV),
    so the fused ordering and the output column are engine-exact with
    no float summation-order concerns.  A document missing from a tier
    contributes 0 (the rank-list convention).  Returns the fused
    ``(query_id, doc_id, rrf_micro, rank)`` top-``k`` per query,
    ties broken by ``doc_id``.

    Plan shape: tiers are unioned (no join — missing-doc handling falls
    out of the groupBy), summed per ``(query_id, doc_id)``, then
    top-k'd.  Input ranks come from per-tier top-N prunes, so every
    frame here is O(|queries| x N) — the fusion never touches a corpus;
    at 100 TB the expensive part is the tiers, and they prune before
    this operator sees a row.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    contribs = [
        r.select(
            "query_id",
            "doc_id",
            F.expr(f"CAST(1000000000 DIV ({c} + rank) AS BIGINT)").alias(
                "_rrf"
            ),
        )
        for r in rankings
    ]
    allc = contribs[0]
    for r in contribs[1:]:
        allc = allc.unionByName(r)
    fused = allc.groupBy("query_id", "doc_id").agg(
        F.sum("_rrf").alias("rrf_micro")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rrf_micro", "rank")
    )
