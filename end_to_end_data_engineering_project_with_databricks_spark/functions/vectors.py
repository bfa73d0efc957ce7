"""Embedding-vector math over native ``array<float>`` columns.

JVM-side higher-order functions (``zip_with`` + ``aggregate``) — no Python
UDF in the hot path, so the whole similarity plan stays inside whole-stage
codegen.  The fold is sequential left-to-right over the 64 elements in index
order; DuckDB's ``list_dot_product`` iterates the same way, so double math
is reproducible across engines (validated by the oracle harness).

At 100 TB the dominant cost is the pairwise join, not this arithmetic —
see operators/similarity.py for the blocking strategies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _dbl(col: Column | str) -> Column:
    return _c(col).cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<float|double> columns (fold in double)."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def sql_cosine(a: str, b: str) -> str:
    """DuckDB oracle text for :func:`cosine_similarity` (same fold order)."""
    ad, bd = f"CAST({a} AS DOUBLE[])", f"CAST({b} AS DOUBLE[])"
    return (
        f"(list_dot_product({ad}, {bd}) / "
        f"(sqrt(list_dot_product({ad}, {ad})) * sqrt(list_dot_product({bd}, {bd}))))"
    )
