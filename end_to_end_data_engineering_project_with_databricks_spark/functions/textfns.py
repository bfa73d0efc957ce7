"""Text scalar helpers shared by the text-analysis and dedup operators.

All JVM-side built-ins (split/regexp/md5) — the 100 TB hot path never
drops into Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; fixture text is single-space separated."""
    return F.split(_c(col), " ")


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 over lowercased text.

    md5 hex output is identical in Spark and DuckDB, making fingerprints
    oracle-checkable (unlike xxhash64, whose seed/variant differs).
    """
    return F.md5(F.lower(_c(col)))
