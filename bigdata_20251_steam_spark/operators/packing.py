"""Sequence packing: batch documents into fixed token-budget packs.

Pretraining consumes fixed-length context windows; feeding one short doc
per window wastes most of it.  Packing concatenates docs until a token
budget fills, then starts the next pack.  The exact greedy bin-pack is
inherently sequential; the scalable relaxation used here (and by real
pipelines) is **offset packing**: order docs by a deterministic key, take
a running token-count prefix sum, and assign ``pack_id = floor(offset /
budget)``.  Packs are contiguous in the chosen order, sized within one
document of the budget, and the whole assignment is two window functions
— no driver loop, no UDF.

Scale note: a single global ``Window.orderBy`` serializes into one task.
``pack_documents`` therefore partitions by a hash shard first (each shard
packs independently — exactly how a 1000-executor job writes 1000
independent pack streams) and only the oracle-parity single-shard form
(``n_shards=1``) pays the global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import md5_long


def pack_documents(
    docs: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int = 2048,
    n_shards: int = 1,
) -> DataFrame:
    """Assign each doc a ``(shard, pack_id, pack_offset)``.

    ``pack_offset`` is the doc's starting token offset inside its shard's
    concatenated stream; ``pack_id = pack_offset div budget``.  Docs
    longer than ``budget`` own one-plus packs (downstream splits them).
    Deterministic: ordering is by ``id_col`` within a hash shard.
    """
    shard = (md5_long(F.col(id_col).cast("string")) % n_shards).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("shard", shard)
        .withColumn(
            "pack_offset",
            F.sum(token_count_col).over(w) - F.col(token_count_col),
        )
        .withColumn("pack_id", F.expr(f"pack_offset div {budget}"))
    )


def materialize_packs(
    docs: DataFrame,
    id_col: str,
    token_count_col: str,
    text_col: str,
    budget: int = 2048,
    n_shards: int = 1,
    sep: str = "<|doc|>",
) -> DataFrame:
    """Materialize packed training sequences: one row per (shard, pack).

    Completes :func:`pack_documents` — that assigns docs to packs; this
    builds the actual concatenated text each context window trains on:
    docs of a pack joined with ``sep`` in deterministic ``id_col``
    order, plus the doc count and token total.  Ordering inside the
    group is enforced by sorting an array of (id, text) structs —
    ``collect_list`` alone has NO ordering guarantee under shuffles.

    One shuffle on (shard, pack_id); the concat is an array fold over
    each group's few documents.
    """
    assigned = pack_documents(
        docs, id_col=id_col, token_count_col=token_count_col,
        budget=budget, n_shards=n_shards,
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(id_col).alias("i"), F.col(text_col).alias("t")))
    )
    return (
        assigned.groupBy("shard", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count_col).alias("total_tokens"),
            F.concat_ws(sep, F.transform(ordered, lambda s: s["t"])).alias(
                "packed_text"
            ),
        )
    )
