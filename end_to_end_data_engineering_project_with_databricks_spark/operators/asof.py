"""As-of (point-in-time) join.

Not in the reference (its only join is the left-anti dedup,
ETL_pipeline_countries.py:137); listed as a standard extension in
SURVEY.md §2.2 (joins row: "as-of via window-or-ASOF-pattern").

Semantics: for every left row, attach the latest right row of the same
key whose event time is <= the left row's event time (backward as-of,
the market-data/point-in-time-feature standard).

Spark-first implementation — the *union + running last_value* pattern:

    tag left/right -> unionByName -> window over (key, ORDER BY ts,
    right-before-left) -> last(right_payload, ignorenulls) -> keep left

One shuffle on the key, sort within partitions, zero row amplification.
The naive alternative (range theta-join + per-left-row max) explodes to
O(|L| x matching-range) rows and shuffles twice; this form scales
linearly and AQE-skew-splits hot keys like any other window.

DuckDB's native ``ASOF JOIN`` provides the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    right_payload: list[str],
    how: str = "left",
    tolerance: int | None = None,
) -> DataFrame:
    """Backward as-of join: latest right row with ``right.ts <= left.ts``
    per key.

    ``right_payload`` columns arrive on the output (null when no right
    row precedes the left row and ``how='left'``; such rows are dropped
    for ``how='inner'``).  ``tolerance`` (same unit as ``ts_col``) drops
    matches older than ``left.ts - tolerance``.

    Right rows must be unique per (keys, ts) — pre-aggregate if not, or
    which row wins is nondeterministic.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")

    payload = F.struct(
        F.col(ts_col).alias("_rts"), *[F.col(c) for c in right_payload]
    )
    r = right.select(
        *keys,
        F.col(ts_col),
        payload.alias("_rv"),
        F.lit(0).alias("_side"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns if c not in keys and c != ts_col],
    )
    l_extra = [c for c in left.columns if c not in keys and c != ts_col]
    l = left.select(
        *keys,
        F.col(ts_col),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in l_extra],
    )
    # right rows sort before left rows at equal ts so ties match (<=)
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l.unionByName(r).withColumn(
        "_match", F.last("_rv", ignorenulls=True).over(w)
    )
    out = u.filter(F.col("_side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "_match",
            F.when(
                F.col(ts_col) - F.col("_match._rts") <= F.lit(tolerance),
                F.col("_match"),
            ),
        )
    if how == "inner":
        out = out.filter(F.col("_match").isNotNull())
    return out.select(
        *keys,
        F.col(ts_col),
        *[F.col(f"_l_{c}").alias(c) for c in l_extra],
        F.col("_match._rts").alias(f"matched_{ts_col}"),
        *[F.col(f"_match.{c}").alias(c) for c in right_payload],
    )
