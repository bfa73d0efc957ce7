"""Engine-portable hash family for the MinHash/SimHash/OPH dedup tier.

The r1-r5 signatures used ``xxhash64`` seed families — fast, but
engine-SPECIFIC: DuckDB cannot reproduce them, so the four raw
near-dup-pair queries (``dedup_minhash_lsh``, ``dedup_simhash``,
``dedup_minhash_oph``, ``dedup_minhash_incremental``) were stuck on the
driver's weaker rows-only gate (VERDICT r5 item 4).  This module swaps
the base hash for an md5-derived 60-bit integer that BOTH engines
compute bit-identically:

- Spark:  ``CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)``
- DuckDB: ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``

(15 hex chars = 60 bits, always non-negative, no signed-overflow edge in
either engine; md5 hex output is standardized lowercase in both.)

MinHash then needs ``num_hashes`` independent families.  Instead of 64
string re-hashes per shingle, hash the shingle ONCE and derive each
family by the classic 2-universal affine permutation over the Mersenne
prime P = 2^31 - 1:

    h_i(s) = (A[i] * (h60(s) % P) + B[i]) % P

``A[i]*h`` stays < 2^62, so the arithmetic is exact in int64 on both
engines — the whole signature pipeline is pure integer algebra that a
DuckDB oracle replays literally.  A/B vs the xxhash64 family at sf0.1:
same pair sets on the fixtures, and the signature stage does LESS hash
work (one md5 + 64 multiply-adds per shingle vs 1 + 64 xxhash64 calls).

The A/B constants are deterministic literals from an explicit 64-bit
LCG (below) — no RNG library, no run-to-run variation, and the SAME
tuples feed both the Spark expression builders and the DuckDB oracle
SQL generators, so the two engines cannot drift.

Scale note (100 TB): md5 on a short shingle is ~2-3x an xxhash64 call,
but it is evaluated once per DISTINCT shingle in a narrow map stage that
pipelines with the scan; the corpus-wide shuffle (the LSH band join) is
unchanged.  The band key is the md5-60 of the band's signature slice —
an 8-byte join key, same width as before.
"""

from __future__ import annotations

#: Mersenne prime 2^31 - 1: modulus of the affine MinHash permutations.
MERSENNE_P = 2_147_483_647

_LCG_MUL = 6364136223846793005
_LCG_INC = 1442695040888963407
_M64 = 1 << 64


def _lcg_stream(seed: int, n: int, lo: int, hi: int) -> tuple[int, ...]:
    """Deterministic integers in [lo, hi) from a 64-bit LCG (Knuth
    MMIX constants).  Explicit on purpose: no dependency on any RNG
    library's stability guarantees across versions."""
    x = seed % _M64
    out = []
    for _ in range(n):
        x = (_LCG_MUL * x + _LCG_INC) % _M64
        out.append(lo + ((x >> 16) % (hi - lo)))
    return tuple(out)


#: 64 affine-permutation coefficient pairs; A is never 0 (mod P) so each
#: permutation is a bijection on [0, P).
MINHASH_A = _lcg_stream(0xA11CE, 64, 1, MERSENNE_P)
MINHASH_B = _lcg_stream(0xB0B42, 64, 0, MERSENNE_P)

#: Position coefficients for the k-gram SHINGLE hash: instead of
#: building each 3-word shingle STRING and md5-ing it (md5 cost scales
#: with input length, and the concat allocates per gram), hash each
#: TOKEN once and combine the k positional token-hashes with integer
#: algebra:
#:
#:     sh(i) = (C[0]*t_i + C[1]*t_{i+1} + C[2]*t_{i+2}) % P
#:
#: (each product reduced mod P before the sum so nothing exceeds 2^62).
#: This cuts md5 work ~3x per shingle — measured at sf0.1 it returns the
#: signature stage to xxhash64-era cost — and stays a pure-integer
#: expression both engines evaluate identically.  Position-distinct
#: coefficients keep the combine order-sensitive ("a b c" != "c b a").
SHINGLE_C = _lcg_stream(0xC0EF5, 3, 1, MERSENNE_P)

#: Position coefficients for the duplicated-SPAN gram hash (8-token
#: grams — operators/dedup.duplicated_spans).  Same construction and
#: overflow invariant as SHINGLE_C: each ``C[j] * (h60(tok) % P)``
#: product stays below 2^62, so the positional combine is exact int64
#: algebra in both engines.  A distinct seed keeps the 8-gram family
#: independent of the 3-gram shingle family (a doc whose 3-gram shingle
#: collides with another's cannot drag the span detector along).
SPAN_C = _lcg_stream(0x5BA7C, 8, 1, MERSENNE_P)


# ---------------------------------------------------------------------------
# expression builders — Spark SQL (for F.expr) and DuckDB SQL share the
# same constants so the two engines agree by construction
# ---------------------------------------------------------------------------


def h60_spark(col_sql: str) -> str:
    """Spark SQL: md5-derived 60-bit non-negative BIGINT of a string."""
    return f"CAST(conv(substr(md5({col_sql}), 1, 15), 16, 10) AS BIGINT)"


def h60_duck(col_sql: str) -> str:
    """DuckDB SQL: the identical 60-bit integer (hex-literal cast)."""
    return f"CAST('0x' || substr(md5({col_sql}), 1, 15) AS BIGINT)"


def minhash_perm_spark(i: int, h_sql: str) -> str:
    """Spark SQL for permutation family i over an ALREADY mod-P hash."""
    return f"pmod({MINHASH_A[i]} * {h_sql} + {MINHASH_B[i]}, {MERSENNE_P})"


def minhash_perm_duck(i: int, h_sql: str) -> str:
    """DuckDB SQL for the same permutation (operands non-negative, so
    ``%`` equals pmod)."""
    return f"({MINHASH_A[i]} * {h_sql} + {MINHASH_B[i]}) % {MERSENNE_P}"


__all__ = [
    "MERSENNE_P",
    "MINHASH_A",
    "MINHASH_B",
    "h60_spark",
    "h60_duck",
    "minhash_perm_spark",
    "minhash_perm_duck",
]
