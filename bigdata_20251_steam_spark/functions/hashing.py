"""Deterministic cross-engine hashing primitives.

The dedup / fingerprint / LSH operators need a hash function that produces
the *same value* in Spark and in the DuckDB oracle.  Spark's builtin
``hash()`` (murmur3) and ``xxhash64`` have no DuckDB twins, so we derive a
60-bit integer from the md5 hex digest — md5 is identical everywhere:

- Spark : ``conv(substring(md5(s), 1, 15), 16, 10)`` cast to long
- DuckDB : ``CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)``

15 hex chars = 60 bits, comfortably inside a signed 64-bit integer, so both
engines parse it without overflow.  Verified byte-identical for ASCII,
UTF-8 multibyte, and empty strings.

MinHash uses the classic universal-hash family h_j(x) = (a_j*x + b_j) mod P
with P = 2^31 - 1 (Mersenne prime).  With x reduced mod P first, a_j*x <
2^62: no 64-bit overflow in either engine.  The (a_j, b_j) table is a fixed
deterministic sequence (Knuth multiplicative constants), inlined into both
the Spark plan and the oracle SQL.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1 — the modulus for all minhash/fingerprint math.
HASH_PRIME = 2_147_483_647

#: Number of minhash functions (16 = 4 bands x 4 rows; S-curve
#: inflection (1/4)^(1/4) ~ 0.707 — strong pairs are near-certain
#: candidates, J~0.5 pairs surface with ~23% per-banding probability.
#: Derive (bands, rows) for a different target with :func:`lsh_params`).
MINHASH_K = 16

# Deterministic (a, b) parameters — Knuth multiplicative hashing constants,
# reduced mod P, 'a' forced odd/nonzero.  NOT runtime-random: correctness
# oracles and resumability need identical values every run.
MINHASH_PARAMS: list[tuple[int, int, int]] = [
    (
        j,
        ((2 * j + 1) * 2_654_435_761) % HASH_PRIME,
        (j * 40_503 + 17) % HASH_PRIME,
    )
    for j in range(MINHASH_K)
]


def md5_long(col: Column) -> Column:
    """60-bit deterministic hash of a string column (JVM-side, no UDF)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`md5_long`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def md5_long_lo(col: Column) -> Column:
    """The OTHER 60 bits of the md5 (hex chars 17-31).

    Paired with :func:`md5_long` this gives a 120-bit content key: a
    single 60-bit key starts colliding near 2^30 rows (birthday bound) —
    real risk for a 100 TB corpus — while the pair is safe past 2^55.
    Two longs on the wire is still 16 bytes/row, far cheaper than
    shuffling text.
    """
    return F.conv(F.substring(F.md5(col), 17, 15), 16, 10).cast("long")


def md5_long_lo_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`md5_long_lo`."""
    return f"CAST(('0x' || substr(md5({expr}), 17, 15)) AS BIGINT)"


def rademacher_planes(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes for sign-LSH over embeddings.

    Entry (j, i) is +1 iff the low bit of md5(f"plane_{j}_{i}") is set.
    Generated driver-side (tiny: n_planes x dim ints) and inlined as
    literals into both the Spark plan and the oracle SQL, so both engines
    see the exact same planes with zero runtime randomness.
    """
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            digest = hashlib.md5(f"plane_{j}_{i}".encode()).digest()
            row.append(1 if digest[-1] & 1 else -1)
        planes.append(row)
    return planes


def lsh_params(threshold: float, n_hashes: int = MINHASH_K) -> tuple[int, int]:
    """Pick (bands, rows_per_band) for a target Jaccard threshold.

    The LSH S-curve detects a pair of Jaccard similarity ``s`` with
    probability ``1 - (1 - s^r)^b``; its inflection sits near
    ``(1/b)^(1/r)``.  This returns the (b, r) with ``b * r <= n_hashes``
    whose inflection is closest to ``threshold`` — the standard tuning
    rule (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets §3.4),
    so callers express dedup POLICY ("catch near-dups above J=0.5") and
    derive the banding mechanically instead of hand-picking.  Driver-side
    pure math; feed the result to ``minhash_candidate_pairs(
    rows_per_band=r)`` with ``MINHASH_K >= b * r`` signatures.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    if n_hashes < 1:
        raise ValueError("n_hashes must be >= 1")
    best: tuple[float, int, int] | None = None
    for r in range(1, n_hashes + 1):
        b = n_hashes // r
        if b < 1:
            break
        inflection = (1.0 / b) ** (1.0 / r)
        err = abs(inflection - threshold)
        if best is None or err < best[0]:
            best = (err, b, r)
    assert best is not None
    return best[1], best[2]
