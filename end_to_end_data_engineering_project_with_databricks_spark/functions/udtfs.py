"""Python user-defined table functions (Spark 4 UDTF API).

UDTFs complete the UDF/UDAF/UDTF triad from SURVEY.md §2.2 (the
reference has none of the three; these are engine extensions).  A UDTF
is the escape hatch for row-to-many-rows logic that higher-order
expressions can't express — here a character n-gram generator, the
canonical text-pipeline example.

Scale rules: UDTFs cross the Python boundary per row group — keep them
OFF the hot path (built-in generators like explode/posexplode cover the
common cases JVM-side; see queries/relational_extra.py).  When a UDTF is
genuinely needed, ``useArrow=True`` batches the transfer.
"""

from __future__ import annotations

import sys

from pyspark.sql.functions import udtf

try:  # ship function bodies by value (same rationale as pandas_fns.py)
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


@udtf(returnType="pos int, ngram string")
class CharNgrams:
    """Character n-grams with 1-based positions.

    ``eval`` yields one row per n-gram; empty/short inputs yield no
    rows (matching the lateral-join-drops-empty semantics the oracle
    mirrors with ``generate_series``)."""

    def eval(self, text: str, n: int):  # noqa: D102 - contract method
        if text is None or n is None or n <= 0:
            return
        for i in range(len(text) - n + 1):
            yield i + 1, text[i : i + n]


def register_udtfs(spark) -> None:
    """Register all UDTFs for SQL/lateral use on this session."""
    spark.udtf.register("char_ngrams", CharNgrams)
