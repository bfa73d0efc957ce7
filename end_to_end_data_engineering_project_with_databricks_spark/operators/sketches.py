"""Count-Min sketch (Cormode & Muthukrishnan, J.Algorithms'05) as pure
two-engine integer algebra — the frequency member of the mergeable-
sketch family (HLL = distinct counts, KLL = quantiles, theta = set
algebra, Misra-Gries = heavy hitters; VERDICT r9 item 4 closed the
quantile gap, this closes the point-frequency one).

Unlike Spark's built-in ``count_min_sketch`` aggregate (whose binary
blob exposes no SQL-side point query and whose xxhash seeds DuckDB
cannot replay), this CMS is hand-rolled from the repo's engine-portable
hash family (functions/hashfamily.py):

    u(x)        = h60(x) % P                 (md5-60, P = 2^31 - 1)
    bucket_i(x) = ((A[i] * u + B[i]) % P) % w,   i in [0, d)

so the ENTIRE sketch — build, merge, point query, inner product — is
deterministic integer arithmetic both engines evaluate bit-identically,
and the DuckDB oracle replays it literally: the driver hash-compares
the actual ESTIMATES, not a weaker bounded check.

Sketch algebra used by the registry queries:

- build:  one corpus pass; each item lands in d = |rows| buckets, the
  counter relation is ``(i, bucket) -> count`` with at most d*w rows —
  a hash aggregate with map-side partial combine (the 100 TB shape:
  every executor folds its partition into a d*w array before the one
  tiny shuffle).
- merge:  counter-wise SUM — per-group sketches roll up to the global
  sketch exactly like HLL register-max or KLL compaction, with
  fixed-size state per rollup level.
- point query:  est(x) = min_i sk[i][bucket_i(x)] — an equi-join of
  the probe's d derived buckets against the counter relation;
  guarantees est >= true and E[est - true] <= N/w per row.
- inner product:  |A join B on key| = sum_k fA(k)*fB(k) is estimated
  by min_i sum_b skA[i][b]*skB[i][b] — an equi-join of two d*w-row
  relations; guarantees est >= true and
  E[est - true] <= |A|*|B|/w (size w to the row-count product you
  care about).  This is the classic sketch-based JOIN-SIZE estimator
  a planner consults before choosing a join strategy at 100 TB.
"""

from __future__ import annotations

from end_to_end_data_engineering_project_with_databricks_spark.functions.hashfamily import (
    MERSENNE_P,
    MINHASH_A,
    MINHASH_B,
    h60_duck,
    h60_spark,
)

#: Depth (number of independent hash rows).  P(overcount > 2N/w on all
#: rows) <= 2^-d; 4 rows is the standard accuracy/space point.
CMS_D = 4

#: Width of the token-frequency sketch: expected per-probe overcount is
#: N/w, and the fixture corpora keep N/w well under the interesting
#: count scale.
CMS_W_FREQ = 512

#: Width of the join-size sketch: the inner-product overcount scales as
#: |A|*|B|/w, so join estimation wants a much wider (still fixed-size:
#: d*w = 64Ki counters) sketch than point frequency does.
CMS_W_JOIN = 16384


def cms_u_spark(col_sql: str) -> str:
    """Spark SQL: the base hash u(x) in [0, P) of a string expression."""
    return f"pmod({h60_spark(col_sql)}, {MERSENNE_P})"


def cms_u_duck(col_sql: str) -> str:
    """DuckDB SQL: the identical base hash (operands non-negative)."""
    return f"({h60_duck(col_sql)} % {MERSENNE_P})"


def cms_bucket_spark(i: int, u_sql: str, w: int) -> str:
    """Spark SQL: bucket of hash row ``i`` for an already-reduced u."""
    return f"pmod(pmod({MINHASH_A[i]} * {u_sql} + {MINHASH_B[i]}, {MERSENNE_P}), {w})"


def cms_bucket_duck(i: int, u_sql: str, w: int) -> str:
    """DuckDB SQL: the identical bucket (non-negative operands)."""
    return f"((({MINHASH_A[i]} * {u_sql} + {MINHASH_B[i]}) % {MERSENNE_P}) % {w})"


def cms_stack_spark(u_sql: str, w: int, d: int = CMS_D) -> str:
    """Spark SQL ``stack`` generator expanding one item row into its
    ``d`` (hash-row, bucket) pairs — aliased ``(i, bkt)`` by the caller."""
    pairs = ", ".join(
        f"{i}, {cms_bucket_spark(i, u_sql, w)}" for i in range(d)
    )
    return f"stack({d}, {pairs})"


def cms_arms_duck(
    select_prefix: str, u_sql: str, from_sql: str, w: int, d: int = CMS_D
) -> str:
    """DuckDB replay of :func:`cms_stack_spark`: one UNION ALL arm per
    hash row (DuckDB has no ``stack``).  ``select_prefix`` carries the
    passenger columns (may be empty), e.g. ``"scope, b, exact_cnt,"``."""
    return "\n      UNION ALL\n      ".join(
        f"SELECT {select_prefix} {i} AS i, "
        f"{cms_bucket_duck(i, u_sql, w)} AS bkt FROM {from_sql}"
        for i in range(d)
    )


__all__ = [
    "CMS_D",
    "CMS_W_FREQ",
    "CMS_W_JOIN",
    "cms_u_spark",
    "cms_u_duck",
    "cms_bucket_spark",
    "cms_bucket_duck",
    "cms_stack_spark",
    "cms_arms_duck",
]
