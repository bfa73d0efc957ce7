"""Order-independent numeric aggregation helpers.

Floating-point SUM/AVG are order-dependent; Spark and the DuckDB oracle
aggregate in different orders, so raw double sums differ in the last ulps and
fail the driver's exact value-hash.  The fix is exact arithmetic: cast each
element to DECIMAL(27,6) (exact, associative), sum the decimals, then cast
the single exact result back to DOUBLE.  Both engines perform the identical
double->decimal rounding per element and the identical final decimal->double
conversion, so the results are bit-equal — and the aggregation stays fully
parallel / partial-aggregatable (map-side combine still applies), which is
what we need at 100 TB.

Mirrored SQL-text builders keep the oracle strings in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(27,6)"
SQL_DEC = "DECIMAL(27,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str) -> Column:
    """Exact (order-independent) sum of a double column, returned as double."""
    return F.sum(_c(col).cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Exact-sum average: exact decimal sum -> double, divided by count.

    Both divisions are single IEEE-754 ops on identical operands in Spark
    and DuckDB, so the result is bit-equal across engines.
    """
    c = _c(col)
    return dsum(c) / F.count(c)


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"({sql_dsum(expr)} / COUNT({expr}))"
