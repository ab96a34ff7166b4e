"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame compositions of JVM built-ins — no Python
UDFs — so they scale with partition count and stay in whole-stage codegen.

Scale design (100 TB corpus posture):

- **exact**: one shuffle on a 60-bit content hash; group keys are
  fixed-width longs, not full documents — the shuffle carries (hash,
  doc_id), never text.
- **minhash/LSH**: per-doc work is linear in shingle count; the candidate
  join shuffles on (band_id, band_signature) buckets, which is the whole
  point of LSH — candidate pairs ~ O(true-dups), not O(n^2).  At 100 TB you
  additionally salt mega-buckets (a near-empty-text bucket can explode);
  ``explode`` before the bucket join keeps rows narrow.
- **simhash**: signature is a single long per doc; Hamming-ball search
  blocks on signature prefixes (here: language) to avoid n^2.
- **ngram_jaccard**: exact verifier — always run it *after* a candidate
  generator (LSH buckets or blocking keys), never standalone at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import HASH_PRIME, MINHASH_PARAMS, md5_long


def normalized_text(col: Column) -> Column:
    """Canonical form for exact dedup: lowercase, strip punctuation,
    collapse whitespace."""
    out = F.lower(col)
    out = F.regexp_replace(out, r"[^\p{L}\p{N}\s]", " ")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def exact_dedup_stats(docs: DataFrame, text_col: str = "text", group_col: str = "source") -> DataFrame:
    """Per-group exact-duplicate accounting over normalized text.

    The dedup itself is ``dropDuplicates`` on the content hash; this
    operator reports (n_docs, n_distinct, n_dup_docs) per group so a
    pipeline can monitor dup rates.  Hashing first means the distinct
    aggregation shuffles 8-byte longs, not document text.
    """
    h = md5_long(normalized_text(F.col(text_col))).alias("content_hash")
    return (
        docs.select(F.col(group_col), h)
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("content_hash").alias("n_distinct"),
            (F.count("*") - F.countDistinct("content_hash")).alias("n_dup_docs"),
        )
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (JVM lambda ops).

    Guarded for short docs: Spark's ``sequence(0, -1)`` would *descend*
    (step inferred as -1), so docs with < n tokens explicitly yield an
    empty array instead.
    """
    toks = F.split(F.trim(col), "\\s+")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + k + 1).cast("int")) for k in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_n: int = 3
) -> DataFrame:
    """(doc_id, h_idx, minhash) — the k-row-per-doc MinHash signature.

    shingle -> 60-bit md5 hash -> k universal hashes -> min per function.
    Entirely explode+groupBy: one shuffle keyed by (doc_id, h_idx).
    Documents with < shingle_n tokens produce no rows (no shingles).
    """
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("s"),
    ).filter(F.col("s") != "")
    hashed = sh.select("doc_id", (md5_long(F.col("s")) % HASH_PRIME).alias("h"))
    params = F.array(
        *[
            F.struct(F.lit(j).alias("h_idx"), F.lit(a).alias("a"), F.lit(b).alias("b"))
            for j, a, b in MINHASH_PARAMS
        ]
    )
    per_fn = hashed.select(
        "doc_id", "h", F.explode(params).alias("p")
    ).select(
        "doc_id",
        F.col("p.h_idx").alias("h_idx"),
        ((F.col("p.a") * F.col("h") + F.col("p.b")) % HASH_PRIME).alias("hv"),
    )
    return per_fn.groupBy("doc_id", "h_idx").agg(F.min("hv").alias("minhash"))


def minhash_candidate_pairs(
    signatures: DataFrame, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: (doc_a, doc_b) pairs sharing >=1 band signature.

    Band signature = ordered concat of the band's minhashes; the self-join
    shuffles on (band_id, band_sig) — bucket-local work only.
    """
    banded = (
        signatures.withColumn("band_id", (F.col("h_idx") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band_id")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("h_idx", "minhash"))
                    ),
                    lambda s: s["minhash"].cast("string"),
                ),
            ).alias("band_sig")
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 56
) -> DataFrame:
    """(doc_id, simhash) — frequency-weighted SimHash fingerprint.

    Each token votes ±1 per bit position of its 60-bit hash; the signature
    sets bit i where the vote sum is positive.  ``bits`` stays < 63 so the
    signature fits a signed long in every engine.  explode(tokens) x
    explode(bit positions) keeps it all in codegen; the groupBy shuffles
    (doc_id, bit) pairs — fine because bits is a small constant.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), "\\s+")).alias("w"),
    ).filter(F.col("w") != "")
    hashed = toks.select("doc_id", md5_long(F.col("w")).alias("h"))
    bits_arr = F.sequence(F.lit(0), F.lit(bits - 1))
    # expr() because the pyspark shiftright/shiftleft wrappers only accept a
    # Python int for numBits; the SQL functions take any expression.
    votes = hashed.select(
        "doc_id", "h", F.explode(bits_arr).alias("i")
    ).select(
        "doc_id",
        "i",
        (F.expr("shiftright(h, i)").bitwiseAND(F.lit(1)) * 2 - 1).alias("vote"),
    )
    return (
        votes.groupBy("doc_id", "i")
        .agg(F.sum("vote").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(1L, cast(i as int))")).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("simhash")
        )
    )


def simhash_near_pairs(
    docs: DataFrame,
    block_col: str = "lang",
    max_hamming: int = 16,
    bits: int = 56,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance within blocking groups."""
    sig = simhash_signatures(docs, bits=bits).join(
        docs.select(F.col("doc_id"), F.col(block_col).alias("blk")), "doc_id"
    )
    a, b = sig.alias("a"), sig.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    block_col: str = "lang",
    shingle_n: int = 3,
    min_jaccard: float = 0.1,
) -> DataFrame:
    """Exact n-gram Jaccard similarity over blocked pairs.

    J = |A ∩ B| / |A ∪ B| on distinct word n-gram sets, via
    array_intersect/array_union — the exact verifier stage after LSH
    candidate generation (or small blocked groups, as here).
    """
    sh = docs.select(
        F.col("doc_id"),
        F.col(block_col).alias("blk"),
        F.array_sort(word_shingles(F.col("text"), shingle_n)).alias("sh"),
    ).filter(F.size("sh") > 0)
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = inter / union
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
