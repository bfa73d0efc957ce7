"""Order-independent numeric aggregation helpers.

Floating-point SUM/AVG are order-dependent; Spark and the DuckDB oracle
aggregate in different orders, so raw double sums differ in the last ulps
and fail the driver's exact value-hash.  The fix is exact fixed-point
arithmetic, engineered for BOTH bit-equality and codegen speed:

1. quantize: ``x = ROUND(value * 1e6)`` as a 64-bit integer — the same
   double multiply and the same ties-away-from-zero rounding in Spark and
   DuckDB, so the per-row integers are identical across engines;
2. split: ``hi = x >> 20`` (floor), ``lo = x - hi * 2^20`` (in [0, 2^20));
   the two's-complement identity ``x = hi * 2^20 + lo`` holds exactly for
   negatives too;
3. sum ``hi`` and ``lo`` as plain longs — vectorized, whole-stage-codegen
   hash aggregation, ~2.7x faster than a decimal accumulator (measured on
   q1: 7 aggregates 2.1s -> 0.8s at sf0.1);
4. recombine once per group in DECIMAL(38,0) / int128 (exact), then one
   cast to double and one division by 1e6 — the identical two IEEE ops in
   both engines, hence bit-equal results.

Overflow headroom is the reason for the split: a single long sum of
``x`` caps at a value-sum of ~9.2e12, which a global money sum at 100 TB
exceeds.  After the split, ``sum(lo)`` <= n * 2^20 and ``sum(hi)`` <=
n * |value| * 1e6 / 2^20, so the per-group row headroom of :func:`dsum`
SCALES WITH THE VALUE MAGNITUDE:

    rows/group before sum(hi) overflows ~= 2^63 / (|value| * 1e6 / 2^20)

    |value| <= 1e6  (money, quantity)   ~6e15 rows/group  -> dsum
    |value| <= 1e10 (squared money)     ~1e9  rows/group  -> dsum_wide
    |value| <= 9.2e12                   per-row quantize cap (long x)

A 100 TB lineitem is ~6e11 rows, so plain :func:`dsum` is four orders
of magnitude clear for raw measures but would overflow ``sum(hi)`` for
SQUARED terms in a global group — squared/product aggregates (corr,
regression sxx/syy/sxy) must use :func:`dsum_wide`, which sums ``hi``
directly in DECIMAL(38,0): exact at any magnitude, at the cost of a
decimal accumulator for the hi half only (``lo`` keeps the long fast
path; sum(lo) <= n * 2^20 overflows only past ~8.8e12 rows/group).
The recombination is exact integer math at any scale.

Mirrored SQL-text builders keep the oracle strings in lockstep (DuckDB
``//`` is floor division, matching Spark's arithmetic ``shiftright``;
DuckDB sums BIGINT into HUGEINT, which is exact like the DECIMAL(38,0)
recombination).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: fixed-point scale: 6 decimal digits (money/quantity/discount fixtures
#: carry <= 6 significant decimals; quantization is identical cross-engine
#: either way)
SCALE = 1_000_000.0
_SHIFT = 20
_L = 1 << _SHIFT

#: exact decimal type for windowed prefix sums (running totals), where the
#: per-row accumulation must be order-independent but the frame sizes are
#: small enough that a decimal accumulator is not the bottleneck
DEC = "decimal(27,6)"
SQL_DEC = "DECIMAL(27,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _scaled(col: Column | str) -> Column:
    """``ROUND(value * 1e6)`` as a 64-bit integer, spelled as pure
    floating-point ops: ``sign(y) * floor(abs(y) + 0.5)``.

    Spark's ``round()`` on DoubleType routes every evaluation through
    ``java.math.BigDecimal`` (valueOf + setScale + allocation), which
    made the quantize the dominant per-row cost of every dsum/davg
    aggregate — measured at sf0.1, a 4-measure groupBy dropped 0.60 s
    -> 0.26 s with the floor form (r13 optimization round).  The value
    is the same ties-away-from-zero rounding for every input either
    engine produces here.  Two edge classes are handled:

    - ``|y| >= 2^52``: doubles are already integral there and the
      ``+ 0.5`` add hits an exact FP tie that rounds-to-even (flipping
      odd integers up — caught by the full-registry sweep on
      agg_exact_corr_regression's ``price*price`` moment, the one
      quantized measure that crosses 2^52 at fixture scale), so the
      value passes through unrounded — identical to ROUND on an
      integer-valued double.
    - below 2^52, floor is unaffected by the at-most-half-ulp error of
      the ``+ 0.5`` add for every |y| >= 1 (sums crossing a binade can
      be inexact, but the rounding error is < 1/2 ulp and the true sum
      is >= 1/2 ulp away from the next integer except AT a tie, where
      the sum is exact), so floor gives true ties-away-from-zero.  The
      abstract divergence class — |y| < 1 within one ulp below .5,
      where the add lands on 1.0 — is UNREACHABLE through this
      function at SCALE=1e6: no double input maps onto the edge
      product (pinned, with the boundary cases above, by
      tests/test_numeric_properties.py).

    Verified per-row on EVERY fixture: all base double columns and
    every derived measure expression (including the squared/product
    moments) quantize bit-identically under both spellings at
    sf0.001/0.01/0.1 (0 mismatches), and the DuckDB oracles — whose
    SQL text keeps ``ROUND`` — stayed hash-green across the full
    registry."""
    y = _c(col) * F.lit(SCALE)
    half_away = F.signum(y) * F.floor(F.abs(y) + F.lit(0.5))
    return (
        F.when(F.abs(y) < F.lit(2.0**52), half_away).otherwise(y).cast("long")
    )


def dsum(col: Column | str) -> Column:
    """Exact (order-independent) sum of a double column, returned as double.

    Expands to two long sums (codegen fast path) recombined exactly in
    DECIMAL(38,0); see module docstring for the overflow analysis.
    """
    x = _scaled(col)
    hi = F.shiftright(x, _SHIFT)
    lo = x - hi * F.lit(_L)
    total = F.sum(hi).cast("decimal(38,0)") * F.lit(_L) + F.sum(lo)
    return (total.cast("double") / F.lit(SCALE))


def dsum_wide(col: Column | str) -> Column:
    """Exact sum for LARGE-magnitude doubles (squared/product terms):
    ``hi`` accumulates in DECIMAL(38,0) (exact for any value magnitude
    the per-row long quantize can represent, |value| <= ~9.2e12), ``lo``
    keeps the long codegen path.  Use for corr/regression moment sums
    where |value| can reach ~1e10 and :func:`dsum`'s long ``sum(hi)``
    would overflow past ~1e9 rows/group (module docstring table)."""
    x = _scaled(col)
    hi = F.shiftright(x, _SHIFT)
    lo = x - hi * F.lit(_L)
    total = F.sum(hi.cast("decimal(38,0)")) * F.lit(_L) + F.sum(lo)
    return (total.cast("double") / F.lit(SCALE))


def dsum_partial_hi(col: Column | str) -> Column:
    """Stage-1 (salted/partial) sum of the hi split — a plain long sum,
    mergeable by further summing.  Pair with :func:`dsum_partial_lo` and
    finish with :func:`dsum_merge` for explicit two-stage aggregation
    (operators/scaling.py)."""
    x = _scaled(col)
    return F.sum(F.shiftright(x, _SHIFT))


def dsum_partial_lo(col: Column | str) -> Column:
    x = _scaled(col)
    return F.sum(x - F.shiftright(x, _SHIFT) * F.lit(_L))


def dsum_merge(hi_sum: Column | str, lo_sum: Column | str) -> Column:
    """Merge summed partials into the exact double total (same final two
    IEEE ops as :func:`dsum`, so two-stage results equal one-stage)."""
    total = F.sum(_c(hi_sum)).cast("decimal(38,0)") * F.lit(_L) + F.sum(_c(lo_sum))
    return (total.cast("double") / F.lit(SCALE))


def davg(col: Column | str) -> Column:
    """Exact-sum average: exact fixed-point sum -> double, divided by count.

    The division is a single IEEE-754 op on identical operands in Spark
    and DuckDB, so the result is bit-equal across engines.
    """
    c = _c(col)
    return dsum(c) / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB mirror for BOTH :func:`dsum` and :func:`dsum_wide`: DuckDB
    sums BIGINT into HUGEINT (int128), which is exact at any magnitude —
    the wide/narrow split only exists on the Spark side."""
    x = f"CAST(ROUND(({expr}) * {SCALE}, 0) AS BIGINT)"
    hi = f"(({x}) // {_L})"
    lo = f"(({x}) - {hi} * {_L})"
    return f"(CAST(SUM({hi}) * {_L} + SUM({lo}) AS DOUBLE) / {SCALE})"


def sql_davg(expr: str) -> str:
    return f"({sql_dsum(expr)} / COUNT({expr}))"


def spark_sql_dsum(expr: str) -> str:
    """Spark-SQL spelling of :func:`sql_dsum` (Spark has no ``//`` floor
    division; ``shiftright`` is the arithmetic = floor shift).  The hi/lo
    decomposition differs from the DuckDB text only in which exact
    identity it uses — both recombine to the same exact integer total,
    so results stay bit-equal."""
    x = f"CAST(ROUND(({expr}) * {SCALE}, 0) AS BIGINT)"
    hi = f"SHIFTRIGHT({x}, {_SHIFT})"
    lo = f"(({x}) - {hi} * {_L})"
    return (
        f"(CAST(CAST(SUM({hi}) AS DECIMAL(38,0)) * {_L} + SUM({lo}) AS DOUBLE)"
        f" / {SCALE})"
    )
