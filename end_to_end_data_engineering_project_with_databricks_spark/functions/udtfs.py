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
    spark.udtf.register("parse_delimited", ParseDelimited)
    spark.udtf.register("user_event_summary", UserEventSummary)


@udtf(returnType="user_id bigint, n_events bigint, n_purchases bigint, max_value double")
class UserEventSummary:
    """TABLE-argument UDTF (Spark 4 ``TABLE(...) PARTITION BY`` calling
    convention): consumes one whole relation partition per instance —
    ``eval`` folds per-partition state row by row, ``terminate`` emits
    the one summary row.  This is the UDTF-side twin of
    ``applyInPandas``: same shuffle-by-key physical shape, but the
    per-group logic lives in a stateful class instead of a pandas
    callback, which is the natural form for streaming-style accumulators
    that never need the whole group materialized at once."""

    def __init__(self) -> None:
        self._user_id = None
        self._n = 0
        self._purchases = 0
        self._max_value = None

    def eval(self, row):  # noqa: D102 - contract method
        self._user_id = row["user_id"]
        self._n += 1
        if row["event_type"] == "purchase":
            self._purchases += 1
        v = row["value"]
        if v is not None and (self._max_value is None or v > self._max_value):
            self._max_value = v

    def terminate(self):  # noqa: D102 - contract method
        if self._n:
            yield self._user_id, self._n, self._purchases, self._max_value


@udtf
class ParseDelimited:
    """POLYMORPHIC UDTF (Spark 4 ``analyze`` API): splits a delimited
    line into ``n_cols`` string columns ``c1..cN`` — the output SCHEMA
    is derived at plan time from the constant ``n_cols`` argument, the
    capability static ``returnType`` UDTFs lack.  Rows shorter than
    ``n_cols`` null-pad; longer rows spill the remainder into the last
    column (classic fixed-width CSV landing semantics)."""

    @staticmethod
    def analyze(line, n_cols):
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if not n_cols.isConstantExpression or not isinstance(n_cols.value, int):
            raise ValueError("ParseDelimited(n_cols) must be a constant int")
        if not 1 <= n_cols.value <= 100:
            raise ValueError("n_cols must be in [1, 100]")
        st = StructType()
        for i in range(n_cols.value):
            st = st.add(f"c{i + 1}", StringType())
        return AnalyzeResult(schema=st)

    def eval(self, line: str, n_cols: int):  # noqa: D102 - contract method
        if line is None:
            return
        parts = line.split(",")
        if len(parts) > n_cols:
            parts = parts[: n_cols - 1] + [",".join(parts[n_cols - 1 :])]
        parts = parts + [None] * (n_cols - len(parts))
        yield tuple(parts)
