"""Byte-pair-encoding subword tokenization — learned-token accounting.

Every token-denominated operator in this engine (``token_budget_sample``,
``chunk_documents``, ``pack_documents``, ``unigram_lm_scores``) counts
whitespace tokens by default, but real training pipelines budget in
LEARNED subword tokens: a 100-token whitespace document can be 130 BPE
pieces of one tokenizer and 180 of another, and mix budgets / packing
lengths / LM perplexities are all specified against the deployed
tokenizer.  This module supplies the deterministic BPE pair (train +
encode) in the engine's cross-engine-exact style.

**Training** (:func:`train_bpe_merges`) is the classic Sennrich et al.
2016 word-frequency algorithm with the same distributed shape real
tokenizer trainers use: the corpus collapses to a (word, count) table
with ONE vocabulary-bounded aggregate (map-side partials, the shuffle
carries distinct words only — the ``unigram_lm_scores`` posture), the
top ``max_words`` rows come to the driver (bounded like the IVF
centroid pull; a loud error guards the cap), and the merge loop runs
driver-side over that tiny dict — at 100 TB the corpus is scanned once,
and the driver holds kilobytes.  Determinism: ties in pair frequency
break lexicographically, so the merges table is a pure function of the
word-frequency table.

**Encoding** (:func:`bpe_piece_counts`) applies a FIXED merges table —
the production posture: tokenizers are artifacts trained once and
shipped (GPT-2's ``vocab.json`` outlives the corpus it was trained on),
so the registered query pins its merges as a constant and the DuckDB
oracle can replay encoding EXACTLY via :func:`bpe_oracle_expr`'s
generated nested-``replace`` expression.  Merges apply in rank order,
each exhaustively left-to-right — bit-identical to the oracle's
sequential ``replace`` semantics by construction, and identical to
classic best-pair-first BPE whenever merge outputs are distinct strings
(always true of a table trained by :func:`train_bpe_merges`, which
never re-creates an existing symbol pair... a new merge's output symbol
did not exist before its creation round).

Python appears only inside an Arrow-batched ``pandas_udf`` (the
``normalize_text`` tier): whole record batches cross the boundary, the
plan stays a narrow map stage, zero shuffles — scan-bound at any
corpus size.

Pre-tokenization is lowercase alphabetic runs (``[a-z]+``): it keeps
the merge alphabet disjoint from the ``<``/``>`` boundary markers the
oracle serialization uses, so a merge pattern can never straddle a
token boundary in the SQL replay.

No reference counterpart (the reference has no tokenizer); part of the
commissioned LLM-pipeline extension surface.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Driver-side word-frequency cap for training (the unigram-LM bound).
MAX_TRAIN_WORDS = 50_000

_WORD_RE = re.compile(r"[a-z]+")


def merge_pass(tokens: list[str], a: str, b: str) -> list[str]:
    """One exhaustive left-to-right merge of adjacent ``(a, b)`` pairs.

    Scanning resumes AFTER each merged pair (no rescan of the merged
    output) — exactly the semantics of SQL ``replace()`` on the
    bracket-serialized form, which is what makes the oracle replay
    bit-exact.
    """
    out: list[str] = []
    i = 0
    n = len(tokens)
    while i < n:
        if i + 1 < n and tokens[i] == a and tokens[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one word: start from characters, apply merges in rank order."""
    toks = list(word)
    for a, b in merges:
        if len(toks) < 2:
            break
        toks = merge_pass(toks, a, b)
    return toks


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 40,
    text_col: str = "text",
    max_words: int = 5_000,
) -> list[tuple[str, str]]:
    """Learn a deterministic merges table from the corpus.

    One vocabulary-bounded aggregate collapses the corpus to (word,
    count); the top ``max_words`` by (count DESC, word ASC) train the
    classic merge loop driver-side.  Ties in pair frequency break
    lexicographically, so the result is a pure function of the word
    frequencies — stable across partitionings, re-runs and engines.
    """
    if n_merges < 1:
        raise ValueError("train_bpe_merges: n_merges must be >= 1")
    if max_words < 1 or max_words > MAX_TRAIN_WORDS:
        raise ValueError(
            "train_bpe_merges: max_words must be in [1, "
            f"{MAX_TRAIN_WORDS}] — the driver holds one row per distinct "
            "word; raise MAX_TRAIN_WORDS consciously if a bigger "
            "training vocabulary is required"
        )
    words = F.expr(
        f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)"
    )
    freq = (
        docs.select(F.explode(words).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["w"]): int(r["c"]) for r in freq
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for toks, c in vocab.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {
            tuple(merge_pass(list(toks), *best)): c
            for toks, c in vocab.items()
        }
    return merges


def bpe_piece_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE piece accounting under a fixed merges table.

    Output: ``(doc_id, n_words, bpe_pieces, pieces_per_word)`` —
    ``n_words`` counts the lowercase alphabetic pre-tokens,
    ``bpe_pieces`` the total subword pieces they encode to, and
    ``pieces_per_word`` their 6dp ratio (NULL for wordless documents).
    NULL text yields ``(0, 0, NULL)`` like the whitespace counters.

    The merges ride into the Arrow-batched ``pandas_udf`` as a closure
    constant (broadcast once per executor, kilobytes); the plan is a
    narrow map stage with zero shuffles.
    """
    from pyspark.sql.pandas.functions import pandas_udf

    frozen = [(a, b) for a, b in merges]
    # word -> piece-count memo (optimization r18, guide §4.2/§4.5):
    # encode_word is a pure function of (word, frozen merges), and
    # natural-language corpora repeat words heavily, so each Python
    # worker encodes every DISTINCT word once instead of once per
    # occurrence.  Living in the UDF CLOSURE, the dict is unpickled
    # fresh per task and shared across that task's Arrow batches —
    # bounded by the task's distinct words, never persisted across
    # runs (each query construction builds a fresh UDF).
    memo: dict[str, int] = {}

    @pandas_udf("long")
    def _pieces(s: pd.Series) -> pd.Series:
        def count(t):
            if not isinstance(t, str):
                return 0
            total = 0
            for w in _WORD_RE.findall(t.lower()):
                n = memo.get(w)
                if n is None:
                    n = len(encode_word(w, frozen))
                    memo[w] = n
                total += n
            return total

        return s.map(count)

    words = F.expr(
        f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)"
    )
    n_words = F.coalesce(F.size(words), F.lit(0))
    pieces = F.coalesce(_pieces(F.col(text_col)), F.lit(0))
    # a small corpus arrives as one scan task; Python encoding is the
    # whole cost here, so spread rows across cores before the UDF (at
    # real scale the scan already has many input splits and the
    # repartition coalesces away under AQE)
    from .dedup import spread_partitions

    docs = spread_partitions(docs, "doc_id")
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        pieces.alias("bpe_pieces"),
        F.when(
            n_words > 0, F.round(pieces / n_words, 6)
        ).alias("pieces_per_word"),
    )


def bpe_piece_count_column(
    merges: list[tuple[str, str]], text_col: Column
) -> Column:
    """``bpe_pieces`` as an inline column — the pluggable ``tokens_col``
    feed for token-denominated operators (``token_budget_sample``,
    ``pack_documents``): precompute this next to the text, then budget
    in learned-subword tokens instead of whitespace tokens."""
    from pyspark.sql.pandas.functions import pandas_udf

    frozen = [(a, b) for a, b in merges]
    # per-task distinct-word memo — see bpe_piece_counts (r18)
    memo: dict[str, int] = {}

    @pandas_udf("long")
    def _pieces(s: pd.Series) -> pd.Series:
        def count(t):
            if not isinstance(t, str):
                return 0
            total = 0
            for w in _WORD_RE.findall(t.lower()):
                n = memo.get(w)
                if n is None:
                    n = len(encode_word(w, frozen))
                    memo[w] = n
                total += n
            return total

        return s.map(count)

    return F.coalesce(_pieces(text_col), F.lit(0))


def bpe_oracle_word_expr(merges: list[tuple[str, str]], var: str = "w") -> str:
    """DuckDB SQL expression: BPE piece count of one word variable.

    Serializes the character sequence as ``<c1><c2>...`` (the brackets
    cannot appear in ``[a-z]+`` pre-tokens, so merge patterns never
    straddle token boundaries), applies each merge as a nested
    ``replace(s, '<a><b>', '<ab>')`` in rank order — sequential
    left-to-right with scan resumption after the substitution, the
    exact :func:`merge_pass` semantics — and counts pieces as the
    number of ``<`` markers left.
    """
    expr = f"'<' || array_to_string(regexp_extract_all({var}, '.'), '><') || '>'"
    for a, b in merges:
        expr = f"replace({expr}, '<{a}><{b}>', '<{a}{b}>')"
    return f"length({expr}) - length(replace({expr}, '<', ''))"
