"""As-of (point-in-time) join.

Not in the reference (its only join is the left-anti dedup,
ETL_pipeline_countries.py:137); listed as a standard extension in
SURVEY.md §2.2 (joins row: "as-of via window-or-ASOF-pattern").

Semantics: for every left row, attach the right row of the same key that
is closest in event time under the chosen ``direction`` —

- ``backward`` (default): latest right with ``rts <= lts`` (the
  market-data/point-in-time-feature standard);
- ``forward``: earliest right with ``rts >= lts`` (next-event
  attribution);
- ``nearest``: whichever of the two is closer in absolute time
  (backward wins exact ties) — pandas ``merge_asof`` direction parity.

Spark-first implementation — the *union + running last/first_value*
pattern:

    tag left/right -> unionByName -> window over (key, ORDER BY ts,
    side) -> last(right_payload, ignorenulls) backward / first(...)
    forward -> keep left

One shuffle on the key, sort within partitions, zero row amplification
(nearest evaluates both window frames over the SAME sorted exchange —
still one shuffle).  The naive alternative (range theta-join +
per-left-row extremum) explodes to O(|L| x matching-range) rows and
shuffles twice; this form scales linearly and AQE-skew-splits hot keys
like any other window.

DuckDB's native ``ASOF JOIN`` (which accepts >=, <=, >, < conditions)
provides the oracle for backward and forward; nearest is oracled as the
tie-broken least-absolute-gap over both candidates.
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
    direction: str = "backward",
) -> DataFrame:
    """As-of join per ``direction`` (see module docstring).

    ``right_payload`` columns arrive on the output (null when no right
    row qualifies and ``how='left'``; such rows are dropped for
    ``how='inner'``).  ``tolerance`` (same unit as ``ts_col``) drops
    matches further than ``tolerance`` from the left timestamp, in the
    direction's sense (both directions for ``nearest``).

    Right rows must be unique per (keys, ts) — pre-aggregate if not, or
    which row wins is nondeterministic.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )

    payload = F.struct(
        F.col(ts_col).alias("_rts"), *[F.col(c) for c in right_payload]
    )
    r = right.select(
        *keys,
        F.col(ts_col),
        payload.alias("_rv"),
        F.lit(0).alias("_side"),
        *[
            F.lit(None).alias(f"_l_{c}")
            for c in left.columns
            if c not in keys and c != ts_col
        ],
    )
    l_extra = [c for c in left.columns if c not in keys and c != ts_col]
    l = left.select(
        *keys,
        F.col(ts_col),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in l_extra],
    )
    # tie handling at equal ts is encoded in the sort order: backward
    # sorts rights (side 0) BEFORE lefts so the preceding frame catches
    # a same-instant right; forward sorts rights AFTER lefts so the
    # following frame does.  Same key shuffle either way — nearest pays
    # one extra in-partition re-sort, never a second exchange.
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col), F.col("_side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    u = l.unionByName(r)
    back = F.last("_rv", ignorenulls=True).over(wb)
    fwd = F.first("_rv", ignorenulls=True).over(wf)
    if direction == "backward":
        u = u.withColumn("_mb", back).withColumn("_match", F.col("_mb"))
    elif direction == "forward":
        u = u.withColumn("_mf", fwd).withColumn("_match", F.col("_mf"))
    else:
        u = u.withColumn("_mb", back).withColumn("_mf", fwd)

    out = u.filter(F.col("_side") == 1)

    def _within(match, signed_gap):
        if tolerance is None:
            return match
        return F.when(signed_gap <= F.lit(tolerance), match)

    if direction == "backward":
        out = out.withColumn(
            "_match", _within(F.col("_mb"), F.col(ts_col) - F.col("_mb._rts"))
        )
    elif direction == "forward":
        out = out.withColumn(
            "_match", _within(F.col("_mf"), F.col("_mf._rts") - F.col(ts_col))
        )
    else:
        b = _within(F.col("_mb"), F.col(ts_col) - F.col("_mb._rts"))
        f = _within(F.col("_mf"), F.col("_mf._rts") - F.col(ts_col))
        gap_b = F.col(ts_col) - F.col("_mb._rts")
        gap_f = F.col("_mf._rts") - F.col(ts_col)
        out = out.withColumn(
            "_match",
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(gap_b <= gap_f, b)  # backward wins exact ties
            .otherwise(f),
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
